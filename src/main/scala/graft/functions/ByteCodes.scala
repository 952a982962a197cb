package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** u8 code packing — the physical side of a quantized vector store's
  * memory knob: an SQ8 code is one byte of information, and storing it
  * as a parquet INT32 array spends 4-5 bytes plus per-element overhead
  * on it. Packing the code array into ONE BinaryType cell makes the
  * 4 -> 1 bytes/dim claim physically real on disk and in the scan
  * (FAISS's SQ8 layout). Round-trip is exact by construction
  * (values are [0, 255] — enforced loudly at pack time, a code
  * outside the byte range is a quantizer bug, never a wrap).
  * Both directions are codegen'd unary expressions, so the
  * pack/unpack projections ride inside whole-stage codegen with the
  * quantize/dequantize arithmetic around them.
  */
object ByteCodesUtil {

  def pack(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"pack_u8: null code at index $i — a quantizer must mint a code " +
          "for every dimension")
      val v = arr.getInt(i)
      if (v < 0 || v > 255) throw new IllegalArgumentException(
        s"pack_u8: code $v at index $i outside [0, 255] — refusing a " +
          "silent byte wrap")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  def unpack(bytes: Array[Byte]): ArrayData = {
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
    ArrayData.toArrayData(out)
  }
}

/** array<int> in [0,255] -> binary, one byte per element. */
case class PackU8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pack_u8 expects array<int>, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    ByteCodesUtil.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteCodesUtil.pack($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** binary -> array<int>, each byte read unsigned. */
case class UnpackU8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unpack_u8 expects binary, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    ByteCodesUtil.unpack(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteCodesUtil.unpack($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object ByteCodes {
  def packU8(codes: Column): Column =
    ColumnBridge.column(PackU8(ColumnBridge.expression(codes)))
  def unpackU8(bytes: Column): Column =
    ColumnBridge.column(UnpackU8(ColumnBridge.expression(bytes)))
}
