package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) container ingestion — the byte layer every real
  * LLM data pipeline starts from: crawls interchange fetched content
  * as WARC files (Common Crawl's .warc/.wet are the canonical corpus
  * source), so the extract step (p130's htmlExtract and everything
  * after it) needs records OUT of the container first.
  *
  * Parsing is a REAL byte walk, per the public spec: each record is a
  * `WARC/<ver>` version line, header lines to an empty line, then
  * exactly `Content-Length` BYTES of block, then two newlines. The
  * byte framing is the point — a character-based split breaks the
  * moment a body holds multi-byte UTF-8 (spec-pinned) — which is why
  * this is a per-partition JVM kernel (the
  * [[graft.multimodal.ImageCodec]] contract: a container codec has no
  * `functions._` equivalent) and not a regex program. GZIP payloads
  * (whole-file or the per-record concatenated members Common Crawl
  * actually ships) inflate through the same bounded
  * [[graft.functions.GunzipUtil]] as the sitemap layer.
  *
  * Malformed framing RAISES loudly with the file and byte offset — a
  * crawl archive that silently drops records under a truncation is
  * the wrong failure mode for provenance-bearing ingest (the
  * quarantine path for EXPECTED dirt is [[JsonlIngest]]'s; a broken
  * container is transport corruption, not dirty data).
  *
  * Scale shape: one file row → its records, flatMap in the scan
  * stage; nothing shuffles until the caller aggregates. Headers
  * surface as typed columns (warc_type, target_uri, content_length) —
  * pruned-friendly — with the body as one string column.
  */
object Warc {

  final case class WarcRecord(file_id: Long, record_idx: Long,
                              warc_type: String, target_uri: String,
                              content_length: Long, body: String)

  /** Parse a (id, payload) frame of WARC files into one row per
    * record. Accepts plain bytes, a gzipped file, or concatenated
    * per-record gzip members (GZIPInputStream reads across member
    * boundaries, so both gz layouts are the same inflate).
    */
  def parseWarc(df: DataFrame, id: Column, payload: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("file_id"),
        payload.cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (fid, bytes) =>
          val raw =
            if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
                (bytes(1) & 0xff) == 0x8b)
              graft.functions.GunzipUtil.gunzip(bytes,
                graft.functions.GunzipUtil.MaxOut)
            else bytes
          parseRecords(fid, raw)
        }
      }
      .toDF()
  }

  /** The SINK half — serialize a records frame back to WARC bytes,
    * one output row per file: `df` is (file, idx, warc_type,
    * target_uri nullable, body), rendered in idx order with exact
    * `Content-Length = octet_length(body)` framing and CRLF line ends.
    * `parseWarc ∘ writeWarc` is identity on any records frame
    * (spec-pinned round trip), which makes re-sharding an archive a
    * parse → re-key → write pipeline with no bespoke byte code.
    * Assembly is one per-file aggregation (sort_array over the
    * collected record structs — a WARC file is MB-bounded by the
    * archive convention, the ZipSource contract).
    */
  def writeWarc(df: DataFrame, file: Column, idx: Column, warcType: Column,
                targetUri: Column, body: Column): DataFrame = {
    val rendered = concat(
      lit("WARC/1.0\r\nWARC-Type: "), warcType,
      when(targetUri.isNotNull,
        concat(lit("\r\nWARC-Target-URI: "), targetUri)).otherwise(lit("")),
      lit("\r\nContent-Length: "), octet_length(body).cast("string"),
      lit("\r\n\r\n"), body, lit("\r\n\r\n"))
    df.select(file.as("file_id"), struct(idx.as("i"), rendered.as("rec")).as("s"))
      .groupBy(col("file_id"))
      .agg(array_join(transform(sort_array(collect_list(col("s"))),
        x => x.getField("rec")), "").as("txt"))
      .select(col("file_id"), col("txt").cast("binary").as("payload"))
  }

  /** The byte walk. CRLF per spec, bare LF tolerated (real archives
    * mix them); header names case-insensitive; Content-Length
    * REQUIRED and exact.
    */
  private[sources] def parseRecords(fid: Long,
                                    b: Array[Byte]): Iterator[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var p = 0
    var idx = 0L
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"parseWarc: file $fid byte $p: $msg — a silently dropped record " +
          "is the wrong failure mode for crawl provenance")
    def readLine(): String = {
      val start = p
      while (p < b.length && b(p) != '\n') p += 1
      if (p >= b.length) fail("unterminated header line")
      val end = if (p > start && b(p - 1) == '\r') p - 1 else p
      p += 1 // past \n
      new String(b, start, end - start, "UTF-8")
    }
    while (p < b.length) {
      // skip inter-record newlines
      while (p < b.length && (b(p) == '\r' || b(p) == '\n')) p += 1
      if (p < b.length) {
        val version = readLine()
        if (!version.startsWith("WARC/")) fail(s"expected a WARC/ version line, got '$version'")
        var warcType: String = null
        var uri: String = null
        var len = -1L
        var line = readLine()
        while (line.nonEmpty) {
          val colon = line.indexOf(':')
          if (colon < 0) fail(s"header line without ':': '$line'")
          val name = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          name match {
            case "warc-type" => warcType = value
            case "warc-target-uri" => uri = value
            case "content-length" =>
              len = try value.toLong catch {
                case _: NumberFormatException => fail(s"bad Content-Length '$value'")
              }
            case _ => () // other headers pass; typed columns carry the 3 core ones
          }
          line = readLine()
        }
        if (len < 0) fail("record without Content-Length")
        if (p + len > b.length) fail(
          s"Content-Length $len overruns the file (have ${b.length - p} bytes)")
        val body = new String(b, p, len.toInt, "UTF-8")
        p += len.toInt
        out += WarcRecord(fid, idx, warcType, uri, len, body)
        idx += 1
      }
    }
    out.result().iterator
  }
}
