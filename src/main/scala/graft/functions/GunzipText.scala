package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** gunzip a BINARY payload to its UTF-8 text — the fetch-side decode
  * the sitemap layer needs: real sites publish their `<sitemapindex>`
  * and child sitemaps GZIPPED (the sitemaps.org convention), so the
  * bytes the fetcher lands are a gzip member, not XML. Pure-JVM
  * (`java.util.zip.GZIPInputStream` — in the JDK, zero new
  * dependencies), scan-stage whole-stage codegen via the static
  * kernel ([[SimHashUtil]] pattern).
  *
  * Decompression is BOUNDED: output larger than `MaxOut` (64 MiB —
  * above the 50 MB uncompressed sitemap spec limit) raises loudly. A
  * tiny gzip member can legally inflate a thousandfold (the zip-bomb
  * shape), and an unbounded inflate is how a fetch pipeline's executor
  * dies at the one hostile domain; the cap makes that a per-row loud
  * error instead.
  */
case class GunzipText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"gunzip_text expects a binary column, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(t: Any): Any =
    GunzipUtil.gunzipUtf8(t.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GunzipUtil.gunzipUtf8($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GunzipText {
  def apply(payload: Column): Column =
    ColumnBridge.column(GunzipText(ColumnBridge.expression(payload)))
}

object GunzipUtil {
  /** The sitemap spec caps uncompressed files at 50 MB; anything above
    * this bound is hostile or corrupt, never a sitemap.
    */
  val MaxOut: Int = 64 << 20

  def gunzipUtf8(bytes: Array[Byte]): UTF8String =
    UTF8String.fromBytes(gunzip(bytes, MaxOut))

  /** Bounded inflate: loud on overflow and on non-gzip bytes (the
    * GZIPInputStream magic check), exact output size.
    */
  def gunzip(bytes: Array[Byte], maxOut: Int): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size > maxOut)
          throw new IllegalArgumentException(
            s"gunzip_text: output exceeds the $maxOut-byte bound — a " +
              "gzip member inflating past the sitemap spec limit is a " +
              "bomb or corruption, not data")
        n = in.read(buf)
      }
      out.toByteArray
    } finally in.close()
  }
}
