package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** gzip a BINARY payload — the sink-side twin of [[GunzipText]]'s
  * inflate: what an HTTP fixture or sink needs to store a
  * `Content-Encoding: gzip` body the way a real crawl archives it
  * (the fetched representation rides the WARC block VERBATIM, still
  * encoded — [[graft.sources.HttpMessage.decodeBody]] is the read
  * half). Pure-JVM (`java.util.zip.GZIPOutputStream`, deterministic
  * at the default level), scan-stage whole-stage codegen via the
  * static kernel.
  */
case class GzipBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"gzip_bytes expects a binary column, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(t: Any): Any =
    GzipBytes.gzip(t.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GzipBytes.gzip($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GzipBytes {
  def apply(payload: Column): Column =
    ColumnBridge.column(GzipBytes(ColumnBridge.expression(payload)))

  /** One gzip member over the input bytes. */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(
      math.max(bytes.length / 2, 64))
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.finish(); g.close()
    bos.toByteArray
  }
}
