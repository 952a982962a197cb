package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Micro-unit squared L2 distance `round(1e6 · ||a−b||²)` as a native
  * codegen expression — the PQ hot kernel (`SimilaritySearch.pqTopK`
  * evaluates it corpus×codebook and query×codebook).
  *
  * Semantics are EXACTLY the composed form
  * `round((dot(a,a) − 2·dot(a,b) + dot(b,b)) · 1e6).cast("long")` with
  * [[VectorFunctions.dot]]'s left-to-right double folds: the three
  * accumulators here are independent sequential folds over the same
  * elements, the combine is the same double arithmetic, and the final
  * rounding goes through the same `BigDecimal` HALF_UP path as Spark's
  * `round` — so results are bit-identical to the composed form and to
  * DuckDB's `list_dot_product` equivalent, while running in ONE fused
  * loop inside whole-stage codegen instead of three CodegenFallback
  * higher-order-function folds.
  *
  * Malformed input contract (matches the composed form): mismatched
  * lengths or null elements yield NULL.
  */
case class L2SqMicro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2sq_micro expects array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    L2SqMicro.finish(dot, nx, ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val yGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $x.$xGet($i);
         |    double $yv = (double) $y.$yGet($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = graft.functions.L2SqMicro.finish($dot, $nx, $ny);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2SqMicro {
  /** Combine + round, shared by interpreted and generated code. The
    * `BigDecimal.valueOf(...).setScale(0, HALF_UP)` is Spark `Round`'s
    * exact double path (and DuckDB's half-away-from-zero agrees for the
    * non-negative distances this produces).
    */
  def finish(dot: Double, nx: Double, ny: Double): Long =
    java.math.BigDecimal.valueOf((nx - 2.0 * dot + ny) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP)
      .doubleValue().toLong

  /** Column form: `L2SqMicro(a, b)`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(L2SqMicro(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
