package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{HttpMessage, Warc}

/** The HTTP message layer inside WARC response blocks: head parse,
  * chunked/gzip decoding, charset resolution, and the splitHttp
  * operator's typed projection — plus the loud contracts (a block
  * that does not parse is transport corruption, and undecoded bytes
  * must never reach the text projection silently).
  */
class HttpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def msg(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("parseHead: status, headers in order, payload offset; obs-fold joins; lookup is case-insensitive") {
    val m = msg("HTTP/1.1 301 Moved Permanently\r\n" +
      "Location: https://example.org/\r\n" +
      "X-Long: part one\r\n  and two\r\n" +
      "content-TYPE: text/html; charset=UTF-8\r\n" +
      "\r\nPAYLOAD")
    val h = HttpMessage.parseHead(m, "t")
    assert(h.status == 301)
    assert(HttpMessage.header(h.headers, "Content-Type")
      .contains("text/html; charset=UTF-8"))
    assert(HttpMessage.header(h.headers, "x-long")
      .contains("part one and two"))
    assert(new String(m, h.payloadStart, m.length - h.payloadStart,
      "ISO-8859-1") == "PAYLOAD")
  }

  test("parseHead: bare-LF lines tolerated (real archives mix them)") {
    val h = HttpMessage.parseHead(
      msg("HTTP/1.0 200 OK\nContent-Type: text/plain\n\nx"), "t")
    assert(h.status == 200)
    assert(HttpMessage.header(h.headers, "content-type")
      .contains("text/plain"))
  }

  test("parseHead raises loudly on non-HTTP blocks, colon-less headers, truncation") {
    val bads = Seq(
      "GET /p/1 HTTP/1.1\r\nHost: x\r\n\r\n", // a REQUEST, not a response
      "HTTP/1.1 20x OK\r\n\r\n",
      "HTTP/1.1 200 OK\r\nbroken header line\r\n\r\n",
      "HTTP/1.1 200 OK\r\nNever: terminated")
    bads.foreach { b =>
      val e = intercept[IllegalArgumentException](
        HttpMessage.parseHead(msg(b), "t"))
      assert(e.getMessage.contains("transport corruption"), e.getMessage)
    }
  }

  test("dechunk: hex sizes (both cases), extensions, trailers; loud on bad size / overrun / missing CRLF") {
    val body = "a" * 10 + "b" * 15
    val chunked = msg("a;ext=1\r\n" + "a" * 10 + "\r\nF\r\n" + "b" * 15 +
      "\r\n0\r\nTrailer: x\r\n\r\n")
    assert(new String(HttpMessage.dechunk(chunked, "t"), "ISO-8859-1") == body)
    intercept[IllegalArgumentException](
      HttpMessage.dechunk(msg("zz\r\nx\r\n0\r\n\r\n"), "t"))
    intercept[IllegalArgumentException](
      HttpMessage.dechunk(msg("ff\r\nshort\r\n0\r\n\r\n"), "t"))
    intercept[IllegalArgumentException](
      HttpMessage.dechunk(msg("2\r\nabNOCRLF3\r\nxyz\r\n0\r\n\r\n"), "t"))
  }

  test("decodeBody: identity, gzip, chunked, and chunked-then-gzip compose in RFC order; unknown encodings raise") {
    val payload = ("the payload é " * 20).getBytes("UTF-8")
    def headOf(extra: String) = HttpMessage.parseHead(
      msg(s"HTTP/1.1 200 OK\r\nContent-Type: text/plain$extra\r\n\r\n"), "t")
    def chunkOf(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      b.grouped(7).foreach { c =>
        bos.write(msg(c.length.toHexString + "\r\n")); bos.write(c)
        bos.write(msg("\r\n"))
      }
      bos.write(msg("0\r\n\r\n")); bos.toByteArray
    }
    def whole(head: HttpMessage.Head, body: Array[Byte], raw: String) = {
      val full = new java.io.ByteArrayOutputStream()
      full.write(msg(raw)); full.write(body)
      HttpMessage.decodeBody(full.toByteArray,
        HttpMessage.parseHead(full.toByteArray, "t"), "t")
    }
    val gz = graft.functions.GzipBytes.gzip(payload)
    assert(java.util.Arrays.equals(
      whole(null, payload, "HTTP/1.1 200 OK\r\nA: b\r\n\r\n"), payload))
    assert(java.util.Arrays.equals(
      whole(null, gz,
        "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"), payload))
    assert(java.util.Arrays.equals(
      whole(null, chunkOf(payload),
        "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"), payload))
    // chunked frames the MESSAGE, gzip coded the representation —
    // chunked must undo first (RFC 9110/9112 layering)
    assert(java.util.Arrays.equals(
      whole(null, chunkOf(gz),
        "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
          "Content-Encoding: gzip\r\n\r\n"), payload))
    val e1 = intercept[IllegalArgumentException](
      whole(null, payload,
        "HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n"))
    assert(e1.getMessage.contains("unsupported Content-Encoding"))
    val e2 = intercept[IllegalArgumentException](
      whole(null, payload,
        "HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip\r\n\r\n"))
    assert(e2.getMessage.contains("unsupported Transfer-Encoding"))
    // REPEATED field lines fold into one token list (RFC 9110): a
    // second Content-Encoding line must not slip past a first-line
    // match and hand still-gzipped bytes to the text projection
    val e3 = intercept[IllegalArgumentException](
      whole(null, gz, "HTTP/1.1 200 OK\r\nContent-Encoding: identity\r\n" +
        "Content-Encoding: gzip\r\nContent-Encoding: gzip\r\n\r\n"))
    assert(e3.getMessage.contains("unsupported Content-Encoding"))
    // ...but identity tokens among the lines are transparent
    assert(java.util.Arrays.equals(
      whole(null, gz, "HTTP/1.1 200 OK\r\nContent-Encoding: identity\r\n" +
        "Content-Encoding: gzip\r\n\r\n"), payload))
    assert(java.util.Arrays.equals(
      whole(null, gz,
        "HTTP/1.1 200 OK\r\nContent-Encoding: gzip, identity\r\n\r\n"),
      payload))
  }

  test("charset precedence: header param (quoted too) > html meta prescan > utf-8; meta only sniffs text/html") {
    val metaPage = "<html><head><meta charset='iso-8859-1'></head></html>"
      .getBytes("ISO-8859-1")
    val equivPage = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\"></head></html>")
      .getBytes("ISO-8859-1")
    assert(HttpMessage.resolveCharset(
      "text/html; charset=\"UTF-16BE\"", metaPage) == "utf-16be")
    assert(HttpMessage.resolveCharset("text/html", metaPage) == "iso-8859-1")
    assert(HttpMessage.resolveCharset("text/html", equivPage) ==
      "windows-1252")
    // a plain-text payload that HAPPENS to contain meta markup is not
    // sniffed — the prescan is an HTML rule
    assert(HttpMessage.resolveCharset("text/plain", metaPage) == "utf-8")
    assert(HttpMessage.resolveCharset(null, metaPage) == "utf-8")
    val e = intercept[IllegalArgumentException](
      HttpMessage.decodeText("x".getBytes, "no-such-charset", "t"))
    assert(e.getMessage.contains("not supported"), e.getMessage)
  }

  test("BOM beats every declaration (WHATWG) and strips from the decoded text") {
    val content = "über text"
    val bom8 = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      content.getBytes("UTF-8")
    val bom16be = content.getBytes("UTF-16") // Java UTF-16 writes FE FF
    // the byte reality wins over a WRONG header declaration
    assert(HttpMessage.resolveCharset(
      "text/plain; charset=iso-8859-1", bom8) == "utf-8")
    assert(HttpMessage.resolveCharset(
      "text/plain; charset=iso-8859-1", bom16be) == "utf-16be")
    // and the mark itself is framing, not content
    assert(HttpMessage.decodeText(bom8, "utf-8", "t") == content)
    assert(HttpMessage.decodeText(bom16be, "utf-16be", "t") == content)
    // no BOM → header declaration holds
    assert(HttpMessage.resolveCharset("text/plain; charset=iso-8859-1",
      content.getBytes("ISO-8859-1")) == "iso-8859-1")
  }

  test("splitHttp: text payloads decode via their charset; binary payloads keep text null and bytes verbatim") {
    val latin = "café nº 7".getBytes("ISO-8859-1")
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0xff.toByte,
      0xfe.toByte, 0x00, 0x7f)
    def respond(ct: String, body: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(msg(s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n"))
      bos.write(body); bos.toByteArray
    }
    val recs = Seq(
      (1L, 0L, respond("text/plain; charset=iso-8859-1", latin)),
      (1L, 1L, respond("image/png", png)))
      .toDF("f", "i", "b")
    val warcs = Warc.writeWarcBin(recs, col("f"), col("i"),
      lit("response"), concat(lit("https://h.com/r/"), col("i")), col("b"),
      lit(null).cast("string"), lit("application/http; msgtype=response"))
    val out = Warc.splitHttp(Warc.parseWarcBinary(warcs, col("file_id"),
        col("payload")))
      .orderBy(col("record_idx"))
      .select(col("mime_type"), col("charset"), col("text"), col("payload"))
      .collect()
    assert(out(0).getString(0) == "text/plain")
    assert(out(0).getString(1) == "iso-8859-1")
    assert(out(0).getString(2) == "café nº 7")
    // the header MAP: lowercased names, first value per name — the
    // long-tail surface (Location, ETag, ...) WAT and the scheduler read
    val hm = Warc.splitHttp(Warc.parseWarcBinary(warcs, col("file_id"),
        col("payload")))
      .orderBy(col("record_idx"))
      .select(col("http_headers")).collect()(0)
      .getAs[Map[String, String]](0)
    assert(hm("content-type") == "text/plain; charset=iso-8859-1", hm)
    assert(hm("content-length") == latin.length.toString, hm)
    assert(out(1).getString(0) == "image/png")
    assert(out(1).isNullAt(2), "binary payloads must not decode to text")
    assert(java.util.Arrays.equals(out(1).getAs[Array[Byte]](3), png),
      "payload bytes must ride verbatim")
    // WARC-level routing is the caller's job; a non-HTTP block in the
    // input is loud, with the record's provenance in the message
    val bad = Warc.writeWarcBin(Seq((2L, 0L, msg("GET / HTTP/1.1\r\n\r\n")))
        .toDF("f", "i", "b"),
      col("f"), col("i"), lit("request"), lit(null).cast("string"),
      col("b"))
    val e = intercept[org.apache.spark.SparkException](
      Warc.splitHttp(Warc.parseWarcBinary(bad, col("file_id"),
        col("payload"))).collect())
    assert(e.getCause.getMessage.contains("splitHttp: file 2 record 0"),
      e.getCause.getMessage)
  }

  test("splitHttp header map: repeated list-valued headers '\\n'-join, repeated singleton headers keep the FIRST line") {
    val body = "ok".getBytes("US-ASCII")
    val head = "HTTP/1.1 301 Moved\r\n" +
      "Location: https://good.example/\r\n" +
      "Location: https://dup.example/\r\n" +           // server bug: first wins
      "ETag: \"v1\"\r\n" +
      "ETag: \"v2\"\r\n" +
      "X-Robots-Tag: googlebot: noindex\r\n" +
      "X-Robots-Tag: nofollow\r\n" +                   // list-valued: both lines survive
      s"Content-Length: ${body.length}\r\n\r\n"
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(msg(head)); bos.write(body)
    val warcs = Warc.writeWarcBin(
      Seq((1L, 0L, bos.toByteArray)).toDF("f", "i", "b"),
      col("f"), col("i"), lit("response"), lit("https://h.com/r"),
      col("b"), lit(null).cast("string"),
      lit("application/http; msgtype=response"))
    val hm = Warc.splitHttp(Warc.parseWarcBinary(warcs, col("file_id"),
        col("payload")))
      .select(col("http_headers")).collect()(0)
      .getAs[Map[String, String]](0)
    // singleton semantics: a duplicate Location/ETag must not become a
    // multiline value that corrupts surt keys / conditional fetches
    assert(hm("location") == "https://good.example/", hm)
    assert(hm("etag") == "\"v1\"", hm)
    // list-valued: per-line scoping must survive (a scoped first line
    // must not swallow an unscoped second one)
    assert(hm("x-robots-tag") == "googlebot: noindex\nnofollow", hm)
  }

  test("GzipBytes column: gunzip(gzip(x)) is identity, nulls pass through") {
    val df = Seq(Some("round trip payload é"), None).toDF("s")
      .select(col("s"), graft.functions.GzipBytes(encode(col("s"), "UTF-8"))
        .as("gz"))
      .select(col("s"),
        graft.functions.GunzipText(col("gz")).as("back"))
    val rows = df.collect()
    assert(rows.exists(r => !r.isNullAt(0) &&
      r.getString(0) == r.getString(1)))
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("fetchRecords: a lookup naming more files than maxFiles is refused loudly") {
    val recs = (0L until 6L).map(i => (i, i, s"body $i"))
      .toDF("f", "i", "b")
    val files = Warc.writeWarc(recs, col("f"), col("i"),
      lit("conversion"), concat(lit("https://h.com/p/"), col("i")),
      col("b"))
    val extents = Warc.parseWarc(files, col("file_id"), col("payload"))
      .select(col("file_id"), col("record_idx"), col("offset"),
        col("record_bytes"))
    val e = intercept[IllegalArgumentException](
      Warc.fetchRecords(files, col("file_id"), col("payload"), extents,
        maxFiles = 3).collect())
    assert(e.getMessage.contains("more than 3 distinct files"),
      e.getMessage)
  }

  test("MimeSniff: the signature table routes on first bytes") {
    import graft.functions.MimeSniffUtil.sniff
    def s(b: Array[Byte]) = sniff(b).toString
    assert(s(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0x00)
      .map(_.toByte)) == "image/png")
    assert(s(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)) == "image/jpeg")
    assert(s(msg("GIF89a.....")) == "image/gif")
    assert(s(msg("GIF87a.....")) == "image/gif")
    assert(s(msg("BM......")) == "image/bmp")
    assert(s(msg("RIFF1234WEBP")) == "image/webp")
    assert(s(msg("RIFF1234WAVE")) == "audio/wav")
    assert(s(graft.functions.GzipBytes.gzip(msg("x"))) == "application/gzip")
    assert(s(msg("PK") ++ Array[Byte](0x03, 0x04) ++ msg("rest"))
      == "application/zip")
    assert(s(msg("%PDF-1.7\n")) == "application/pdf")
    assert(s(msg("<?xml version=\"1.0\"?>")) == "text/xml")
    // a REAL encoded PNG, not just the magic
    val codec = new graft.multimodal.ImageCodec.Codec
    assert(s(codec.encodeGrayPng(4, 4, _ % 256)) == "image/png")
  }

  test("MimeSniff: HTML tag prescan — whitespace-tolerant, case-insensitive, terminator-checked") {
    import graft.functions.MimeSniffUtil.sniff
    def s(b: Array[Byte]) = sniff(b).toString
    assert(s(msg("<html><head>")) == "text/html")
    assert(s(msg("\n  \t<!DOCTYPE HTML PUBLIC>")) == "text/html")
    assert(s(msg("<HtMl lang=\"en\">")) == "text/html")
    assert(s(msg("<!-- comment first -->")) == "text/html")
    assert(s(msg("<p>para</p>")) == "text/html")
    // an unterminated tag name is NOT html
    assert(s(msg("<htmlfoo>")) == "text/plain")
    assert(s(msg("a < b and c > d")) == "text/plain")
  }

  test("MimeSniff: binary-byte fallback, BOM text, null passthrough") {
    import graft.functions.MimeSniffUtil.sniff
    assert(sniff(msg("just ordinary text\nwith lines")).toString
      == "text/plain")
    assert(sniff(Array[Byte](0x41, 0x00, 0x42)).toString
      == "application/octet-stream")
    assert(sniff(Array(0xef, 0xbb, 0xbf, 0x00).map(_.toByte)).toString
      == "text/plain") // BOM wins over the binary byte behind it
    assert(sniff(Array.empty[Byte]).toString == "text/plain")
    val rows = Seq(Some("<html>x"), None).toDF("s")
      .select(graft.functions.MimeSniff(encode(col("s"), "UTF-8"))
        .as("m")).collect()
    assert(rows.exists(r => !r.isNullAt(0) && r.getString(0) == "text/html"))
    assert(rows.exists(_.isNullAt(0)))
  }

  test("conditionalRequests: latest-record election, non-200 and validator-less rows drop") {
    import graft.graph.CrawlOps
    val stored = Seq(
      // u1: two stored copies — the LATER etag must win
      ("u1", "2026-01-01T00:00:00Z", 200L, Map("etag" -> "\"a\"")),
      ("u1", "2026-01-02T00:00:00Z", 200L,
        Map("etag" -> "\"b\"", "last-modified" -> "lm-b")),
      // u2: stored copy is a 404 — nothing to revalidate
      ("u2", "2026-01-01T00:00:00Z", 404L, Map("etag" -> "\"c\"")),
      // u3: a 200 with NO validators — drops from the plan
      ("u3", "2026-01-01T00:00:00Z", 200L, Map("server" -> "x")),
      // u4: last-modified only
      ("u4", "2026-01-01T00:00:00Z", 200L, Map("last-modified" -> "lm-d")))
      .toDF("target_uri", "warc_date", "http_status", "http_headers")
    val plan = CrawlOps.conditionalRequests(stored)
      .collect().map(r => (r.getString(0),
        Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(plan == Set(
      ("u1", Some("\"b\""), Some("lm-b")),
      ("u4", None, Some("lm-d"))))
  }

  test("soft404Score: integer weights and the >=3 flag boundary") {
    import graft.graph.CrawlOps
    val long = ("w " * 25).trim
    val df = Seq(
      ("404 Page Not Found", "The page does not exist."), // 2+1+1 = 4
      ("404 Page Not Found", long),                       // 2+0+0 = 2
      ("Doc 7", "this article was not found here " + long), // 0+1+0 = 1
      ("Doc 7", "tiny"),                                  // 0+0+1 = 1
      ("Gone", "it is no longer available"),              // 0+1+1 = 2
      ("Error 404", "tiny"))                              // 2+0+1 = 3
      .toDF("title", "body")
    val got = df.select(CrawlOps.soft404Score(col("title"), col("body"))
        .as("s"),
      (CrawlOps.soft404Score(col("title"), col("body"))
        >= CrawlOps.Soft404Threshold).as("f"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(got == Seq((4L, true), (2L, false), (1L, false), (1L, false),
      (2L, false), (3L, true)))
  }

  test("inflate decodes both deflate wire forms and fails loudly on the rest") {
    import graft.functions.{DeflateBytes, GunzipUtil}
    val text = ("café résumé " * 50).getBytes("UTF-8")
    val zlib = DeflateBytes.deflate(text, raw = false)
    val raw = DeflateBytes.deflate(text, raw = true)
    // the two wire forms differ on the wire but sniff-decode alike
    assert(!java.util.Arrays.equals(zlib, raw))
    assert(java.util.Arrays.equals(
      GunzipUtil.inflate(zlib, 1 << 20, "t"), text))
    assert(java.util.Arrays.equals(
      GunzipUtil.inflate(raw, 1 << 20, "t"), text))
    // truncated stream: loud, with input context
    val e1 = intercept[IllegalArgumentException](
      GunzipUtil.inflate(java.util.Arrays.copyOf(zlib, zlib.length - 4),
        1 << 20, "t"))
    assert(e1.getMessage.contains("truncated"))
    // trailing garbage after the stream end: loud, never silently kept
    val e2 = intercept[IllegalArgumentException](
      GunzipUtil.inflate(zlib ++ Array[Byte](1, 2, 3), 1 << 20, "t"))
    assert(e2.getMessage.contains("trailing"))
    // output bound: loud overflow, not a truncated document
    val e3 = intercept[IllegalArgumentException](
      GunzipUtil.inflate(zlib, 16, "t"))
    assert(e3.getMessage.contains("bound"))
    // corrupt bytes that sniff as NEITHER form still fail with context
    val e4 = intercept[IllegalArgumentException](
      GunzipUtil.inflate(Array[Byte](0x78, 0x01.toByte, 99, 98, 97),
        1 << 20, "t"))
    assert(e4.getMessage.contains("deflate"))
  }

  test("inflate: raw stream whose first bytes coincidentally sniff zlib decodes via the fallback") {
    import graft.functions.GunzipUtil
    // hand-built RAW rfc1951 stream: stored block (BFINAL=0, LEN=1,
    // payload 'A') + empty final fixed-Huffman block. Its first two
    // bytes are 0x78 0x01 — a byte-valid zlib header (CMF low nibble
    // 8, (CMF·256+FLG)%31 == 0) — so the sniff commits to zlib, the
    // zlib inflate hits a DataFormatException, and the browser
    // fallback must retry raw instead of raising
    val raw = Array[Byte](0x78, 0x01, 0x00, 0xFE.toByte, 0xFF.toByte,
      'A'.toByte, 0x03, 0x00)
    assert((raw(0) & 0x0f) == 8 &&
      ((raw(0) & 0xff) * 256 + (raw(1) & 0xff)) % 31 == 0) // sniffs zlib
    assert(java.util.Arrays.equals(
      GunzipUtil.inflate(raw, 1 << 20, "t"), Array('A'.toByte)))
  }

  test("zstdInflate round-trips, stays bounded, and fails loudly on corruption") {
    import graft.functions.{GunzipUtil, ZstdBytes}
    val text = ("zstd body κείμενο " * 40).getBytes("UTF-8")
    val z = ZstdBytes.zstd(text)
    assert(java.util.Arrays.equals(
      GunzipUtil.zstdInflate(z, 1 << 20, "t"), text))
    // concatenated frames decode in sequence (the gzip-member rule)
    assert(java.util.Arrays.equals(
      GunzipUtil.zstdInflate(z ++ z, 1 << 20, "t"), text ++ text))
    val eb = intercept[IllegalArgumentException](
      GunzipUtil.zstdInflate(z, 16, "t"))
    assert(eb.getMessage.contains("bound"))
    val ec = intercept[IllegalArgumentException](
      GunzipUtil.zstdInflate("not a zstd frame at all".getBytes, 1 << 20,
        "t"))
    assert(ec.getMessage.contains("zstd"))
    val et = intercept[IllegalArgumentException](
      GunzipUtil.zstdInflate(java.util.Arrays.copyOf(z, z.length - 3),
        1 << 20, "t"))
    assert(et.getMessage.contains("zstd"))
  }

  test("decodeBody routes Content-Encoding: deflate and zstd; br still raises") {
    import graft.functions.DeflateBytes
    import graft.sources.HttpMessage
    val body = "hello deflate body".getBytes("UTF-8")
    def msg(enc: String, payload: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Encoding: $enc\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
        payload
    for (raw <- Seq(false, true)) {
      val m = msg("deflate", DeflateBytes.deflate(body, raw))
      val head = HttpMessage.parseHead(m, "t")
      assert(java.util.Arrays.equals(
        HttpMessage.decodeBody(m, head, "t"), body))
    }
    val mz = msg("zstd", graft.functions.ZstdBytes.zstd(body))
    assert(java.util.Arrays.equals(
      HttpMessage.decodeBody(mz, HttpMessage.parseHead(mz, "t"), "t"), body))
    val br = msg("br", Array[Byte](1, 2, 3))
    val e = intercept[IllegalArgumentException](
      HttpMessage.decodeBody(br, HttpMessage.parseHead(br, "t"), "t"))
    assert(e.getMessage.contains("unsupported Content-Encoding"))
  }
}
