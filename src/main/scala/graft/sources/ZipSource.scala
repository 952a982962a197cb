package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zip-archive extraction over Spark's binaryFile source.
  *
  * Capability of the reference's `ZipInputStreamSource`
  * (`ZipInputStreamSource.scala:49-56` in akka/akka-stream-contrib):
  * stream (entry metadata, content chunk) pairs out of a zip, recursing
  * into nested zips, materializing total bytes read.
  *
  * Spark-first design: `spark.read.format("binaryFile")` distributes the
  * archives (one task per archive — at 100 TB the parallelism unit is the
  * archive, which is how zip's central-directory format wants to be
  * read), then a typed flatMap unzips each archive in one pass, emitting
  * chunked entries. Nested zips are plain recursion inside the flatMap.
  * The materialized bytes-read of the reference becomes an `observe`
  * metric on the output.
  */
object ZipSource {

  case class ZipEntryChunk(archive: String, entry: String, nested: Boolean,
                           chunkOffset: Long, data: Array[Byte])

  /** Read all zip archives matching `pathGlob`, emitting chunked entry
    * contents. `chunkSize` mirrors the reference's default 8192.
    */
  def read(spark: SparkSession, pathGlob: String, chunkSize: Int = 8192,
           nestedExtensions: Seq[String] = Seq(".zip")): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    bin.flatMap { case (path, bytes) =>
      extract(path, bytes, chunkSize, nestedExtensions, nested = false)
    }.toDF()
      .observe("zip_bytes_read", sum(length(col("data"))).as("bytes_read"))
  }

  /** Unzip one archive to (entry, chunk) records, recursing into nested
    * archives (the reference's `nextEntry` recursion,
    * `ZipInputStreamSource.scala:169-184`).
    */
  private[sources] def extract(archive: String, bytes: Array[Byte], chunkSize: Int,
                               nestedExts: Seq[String], nested: Boolean): Seq[ZipEntryChunk] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[ZipEntryChunk]
    var entry = zin.getNextEntry
    while (entry != null) {
      if (!entry.isDirectory) {
        val content = zin.readAllBytes()
        if (nestedExts.exists(e => entry.getName.toLowerCase.endsWith(e))) {
          out ++= extract(s"$archive!${entry.getName}", content, chunkSize,
            nestedExts, nested = true)
        } else {
          var off = 0L
          content.grouped(chunkSize).foreach { chunk =>
            out += ZipEntryChunk(archive, entry.getName, nested, off, chunk)
            off += chunk.length
          }
          if (content.isEmpty)
            out += ZipEntryChunk(archive, entry.getName, nested, 0L, Array.empty)
        }
      }
      entry = zin.getNextEntry
    }
    out.result()
  }
}
