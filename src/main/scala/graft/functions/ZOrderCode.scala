package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) code: interleave the low `bits` bits of two long
  * keys — bit `b` of x lands at position 2b, bit `b` of y at 2b+1 — as a
  * native codegen expression.
  *
  * This is the data-LAYOUT lever for multi-dimensional locality at
  * 100 TB: range-partitioning and sorting files by the Z-code clusters
  * rows that are close in BOTH dimensions into the same files, so
  * min/max file statistics prune scans filtered on either key (the
  * standard OPTIMIZE ZORDER technique). The code itself is a pure
  * per-row function — cheap, shuffle-free, and reproducible — which is
  * also what makes it oracle-checkable bit-for-bit.
  *
  * Callers mask inputs to `bits` beforehand if the domain exceeds it
  * (the expression itself uses only the low `bits` of each key, so
  * higher bits are ignored rather than corrupting the interleave).
  */
case class ZOrderCode(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder_code expects (bigint, bigint), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderCode.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"${ev.value} = graft.functions.ZOrderCode.interleave($x, $y, $bits);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderCode {

  /** Bit interleave shared by interpreted and generated code. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  /** Column form: `ZOrderCode(x, y, bits)`; inputs cast to long. */
  def apply(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(ZOrderCode(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), bits))
}
