package graft.sources

/** HTTP/1.x message parsing for WARC `response` blocks — the layer a
  * real Common Crawl archive forces before any text work: a response
  * record's block is a FULL HTTP message (`Content-Type:
  * application/http` at the WARC level — status line, headers, then
  * the payload), so feeding the block straight to an HTML extract
  * prepends `HTTP/1.1 200 OK\r\n...` to every document. This kernel
  * splits the message (status code, headers, payload bytes), undoes
  * the transfer/content encodings real crawls store verbatim
  * (`Transfer-Encoding: chunked`, `Content-Encoding: gzip` through
  * the bounded [[graft.functions.GunzipUtil]]), and resolves the
  * payload's CHARSET (Content-Type `charset=` parameter, then an
  * HTML `<meta charset>` sniff, then the UTF-8 default) so the text
  * projection decodes the bytes the page actually used — an
  * ISO-8859-1 page read as UTF-8 silently corrupts every accented
  * byte.
  *
  * Like the WARC walk it sits on ([[Warc.walkRecords]]), this is a
  * byte-domain JVM kernel: headers are ASCII by spec but the payload
  * is arbitrary bytes, so a string-level split would corrupt the
  * payload before the charset decision is ever made. Malformed
  * messages RAISE with the offending byte offset — transport
  * corruption, not dirty data (the [[Warc]] rule).
  */
object HttpMessage {

  /** A parsed message head: status code, headers in arrival order
    * (name, value), and the byte offset where the payload starts.
    */
  final case class Head(status: Int, headers: Vector[(String, String)],
                        payloadStart: Int)

  /** How many payload bytes the `<meta charset>` sniff may scan: the
    * public-parser convention (browsers prescan ~1 KiB; 4 KiB is the
    * conservative end) — charset declarations legally belong in the
    * head, and an unbounded scan of a multi-MB page buys nothing.
    */
  val MetaSniffBytes: Int = 4096

  /** Parse the status line + header block of an HTTP message. CRLF
    * per spec, bare LF tolerated (the WARC walk's rule — real
    * archives mix them); header names case-insensitive at lookup;
    * obs-fold continuation lines (leading SP/HT) append to the prior
    * header's value.
    */
  def parseHead(b: Array[Byte], label: String): Head = {
    val cur = new ByteCursor(b, "ISO-8859-1",
      pos => s"$label: byte $pos: ",
      " — an HTTP block that does not parse is transport corruption, " +
        "not dirty data")
    def fail(msg: String): Nothing = cur.fail(msg)
    def readLine(): String = cur.readLine("HTTP header line")
    val statusLine = readLine()
    if (!statusLine.startsWith("HTTP/"))
      fail(s"expected an HTTP status line, got '$statusLine'")
    val sp = statusLine.indexOf(' ')
    if (sp < 0 || statusLine.length < sp + 4)
      fail(s"status line without a status code: '$statusLine'")
    val codeStr = statusLine.substring(sp + 1, sp + 4)
    val status =
      try codeStr.toInt
      catch { case _: NumberFormatException =>
        fail(s"bad status code '$codeStr' in '$statusLine'") }
    if (statusLine.length > sp + 4 && statusLine.charAt(sp + 4) != ' ')
      fail(s"status code not 3 digits in '$statusLine'")
    val headers = Vector.newBuilder[(String, String)]
    var last: (String, String) = null
    var line = readLine()
    while (line.nonEmpty) {
      if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
        if (last == null) fail("continuation line before any header")
        last = (last._1, last._2 + " " + line.trim)
      } else {
        if (last != null) headers += last
        val colon = line.indexOf(':')
        if (colon < 0) fail(s"HTTP header line without ':': '$line'")
        last = (line.substring(0, colon).trim,
          line.substring(colon + 1).trim)
      }
      line = readLine()
    }
    if (last != null) headers += last
    Head(status, headers.result(), cur.p)
  }

  /** First header with the given name, case-insensitive. */
  def header(hs: Vector[(String, String)], name: String): Option[String] =
    hs.collectFirst { case (n, v) if n.equalsIgnoreCase(name) => v }

  /** EVERY value of a header, as the token list RFC 9110 defines:
    * repeated field lines are equivalent to one comma-joined list, so
    * both `Content-Encoding: identity` + `Content-Encoding: gzip` on
    * two lines and `Content-Encoding: identity, gzip` on one line
    * yield Seq(identity, gzip) here. The encoding decisions must see
    * the WHOLE list — matching only the first line is how a
    * still-gzipped body slips through to the text projection.
    */
  def headerTokens(hs: Vector[(String, String)],
                   name: String): Seq[String] =
    hs.collect { case (n, v) if n.equalsIgnoreCase(name) => v }
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  /** Undo `Transfer-Encoding: chunked` — hex-size lines (extensions
    * after ';' ignored per RFC 9112), each chunk's exact bytes, a CRLF
    * after every chunk, the 0-size terminator, then trailer fields to
    * a blank line. Anything else raises: a chunked body that does not
    * frame is a truncated fetch.
    */
  def dechunk(b: Array[Byte], label: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(b.length, 64))
    val cur = new ByteCursor(b, "ISO-8859-1",
      pos => s"$label: chunked byte $pos: ")
    def fail(msg: String): Nothing = cur.fail(msg)
    def readLine(): String = cur.readLine("chunk line")
    var done = false
    while (!done) {
      val sizeLine = readLine()
      val hexPart = {
        val semi = sizeLine.indexOf(';')
        (if (semi >= 0) sizeLine.substring(0, semi) else sizeLine).trim
      }
      val size =
        try java.lang.Long.parseLong(hexPart, 16)
        catch { case _: NumberFormatException =>
          fail(s"bad chunk size '$hexPart'") }
      if (size < 0 || size > Int.MaxValue) fail(s"chunk size $size out of range")
      if (size == 0L) {
        // trailer fields until the blank line that ends the body
        var t = readLine()
        while (t.nonEmpty) t = readLine()
        done = true
      } else {
        if (cur.p + size > b.length) fail(
          s"chunk of $size bytes overruns the body (${b.length - cur.p} left)")
        out.write(b, cur.p, size.toInt)
        cur.p += size.toInt
        val crlf = readLine()
        if (crlf.nonEmpty) fail(s"chunk not followed by CRLF, got '$crlf'")
      }
    }
    out.toByteArray
  }

  /** The payload bytes with transfer/content encodings undone, in RFC
    * order: `Transfer-Encoding: chunked` first (the message framing),
    * then `Content-Encoding: gzip`/`x-gzip` (the representation
    * coding, through the bounded loud member walk — the WARC payload
    * bound, since the payload rode a WARC record to get here) or
    * `deflate` (both zlib-wrapped and raw wire forms, sniffed —
    * [[graft.functions.GunzipUtil.inflate]]) or `zstd` (RFC 8878 via
    * the zstd-jni Spark ships). `identity` and absent encodings pass
    * bytes verbatim; any OTHER token (br) raises — silently
    * returning still-encoded bytes would feed compressed garbage to
    * the extract chain.
    *
    * DECISION (round 12, recorded): brotli stays a loud refusal. The
    * JDK ships no RFC 7932 codec and Spark's classpath carries none;
    * a from-scratch pure-Java decoder means the full bit-level format
    * — context-modeled Huffman trees, a 120 KiB static dictionary
    * with 121 word transforms, sliding-window backrefs — an
    * error-prone ~2k-line codec whose miscoded corner silently
    * corrupts documents (the worst failure class this module exists
    * to prevent). Against that, br is rare on ARCHIVED wire payloads
    * (Common Crawl stores identity/gzip bodies; br appears on live
    * CDN fetches, where the fetcher can send `Accept-Encoding:
    * gzip`). If the dependency policy ever admits a vetted decoder
    * (e.g. the Brotli org's pure-Java artifact), route it through
    * this same case arm with the same loud bound; until then the
    * refusal names the gap at the exact row that hits it.
    */
  def decodeBody(b: Array[Byte], head: Head, label: String): Array[Byte] = {
    val raw = java.util.Arrays.copyOfRange(b, head.payloadStart, b.length)
    // the FULL token lists (repeated lines fold in per RFC 9110) — a
    // first-line-only match would pass 'identity' + 'gzip' on two
    // lines straight to the text projection still compressed
    val te = headerTokens(head.headers, "Transfer-Encoding")
    val deChunked = te.map(_.toLowerCase) match {
      case Seq() => raw
      case Seq("chunked") => dechunk(raw, label)
      case other => throw new IllegalArgumentException(
        s"$label: unsupported Transfer-Encoding '${other.mkString(", ")}'" +
          " — only chunked is in scope, and passing the bytes through " +
          "undecoded would be silent corruption")
    }
    val ce = headerTokens(head.headers, "Content-Encoding")
      .map(_.toLowerCase).filterNot(_ == "identity")
    ce match {
      case Seq() => deChunked
      case Seq("gzip") | Seq("x-gzip") =>
        graft.functions.GunzipUtil.gunzip(deChunked,
          graft.functions.GunzipUtil.MaxWarcOut)
      case Seq("deflate") =>
        // both wire forms (zlib-wrapped per RFC 9110, raw per the
        // servers that ship RFC 1951 bare) — GunzipUtil.inflate sniffs
        graft.functions.GunzipUtil.inflate(deChunked,
          graft.functions.GunzipUtil.MaxWarcOut, label)
      case Seq("zstd") =>
        graft.functions.GunzipUtil.zstdInflate(deChunked,
          graft.functions.GunzipUtil.MaxWarcOut, label)
      case other => throw new IllegalArgumentException(
        s"$label: unsupported Content-Encoding '${other.mkString(", ")}'" +
          " — gzip/deflate/zstd/identity are in scope; undecoded bytes " +
          "must not reach the text projection (br is not implemented)")
    }
  }

  /** The media type of a Content-Type value: the token before any
    * parameter, trimmed and lowercased (`text/HTML; charset=X` →
    * `text/html`).
    */
  def mimeType(ct: String): String = {
    val semi = ct.indexOf(';')
    (if (semi >= 0) ct.substring(0, semi) else ct).trim.toLowerCase
  }

  /** The `charset=` parameter of a Content-Type value, trimmed of
    * optional quotes and lowercased; None when absent.
    */
  def charsetParam(ct: String): Option[String] = {
    val m = CharsetParam.matcher(ct)
    if (m.find()) Some(m.group(1).toLowerCase) else None
  }

  private val CharsetParam = java.util.regex.Pattern.compile(
    "(?i);\\s*charset\\s*=\\s*\"?([A-Za-z0-9_.:\\-]+)\"?")

  /** Sniff an HTML `<meta charset=...>` or
    * `<meta http-equiv=Content-Type content="...charset=...">`
    * declaration from the first [[MetaSniffBytes]] payload bytes,
    * scanned as ISO-8859-1 (an ASCII superset, so the scan itself
    * cannot throw on arbitrary bytes — exactly why browsers prescan
    * this way).
    */
  def sniffMetaCharset(payload: Array[Byte]): Option[String] = {
    val n = math.min(payload.length, MetaSniffBytes)
    val head = new String(payload, 0, n, "ISO-8859-1")
    val m1 = MetaCharset.matcher(head)
    if (m1.find()) Some(m1.group(1).toLowerCase)
    else {
      val m2 = MetaHttpEquiv.matcher(head)
      if (m2.find()) Some(m2.group(1).toLowerCase) else None
    }
  }

  private val MetaCharset = java.util.regex.Pattern.compile(
    "(?i)<meta\\s+charset\\s*=\\s*[\"']?([A-Za-z0-9_.:\\-]+)")
  private val MetaHttpEquiv = java.util.regex.Pattern.compile(
    "(?i)<meta\\s+http-equiv\\s*=\\s*[\"']?content-type[\"']?" +
      "[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9_.:\\-]+)")

  /** A byte-order mark at the payload's start names its encoding with
    * certainty — WHATWG gives it precedence over EVERY declaration
    * (a page saved with a BOM then mislabeled by its server is common
    * enough that browsers trust the bytes): EF BB BF → utf-8,
    * FE FF → utf-16be, FF FE → utf-16le.
    */
  def sniffBom(payload: Array[Byte]): Option[String] =
    if (payload.length >= 3 && (payload(0) & 0xff) == 0xef &&
        (payload(1) & 0xff) == 0xbb && (payload(2) & 0xff) == 0xbf)
      Some("utf-8")
    else if (payload.length >= 2 && (payload(0) & 0xff) == 0xfe &&
        (payload(1) & 0xff) == 0xff) Some("utf-16be")
    else if (payload.length >= 2 && (payload(0) & 0xff) == 0xff &&
        (payload(1) & 0xff) == 0xfe) Some("utf-16le")
    else None

  /** The charset the text projection decodes with, by the public
    * precedence (WHATWG): a byte-order mark wins outright, then the
    * Content-Type header's `charset=` parameter, then the `<meta>`
    * prescan for HTML payloads, then the UTF-8 default (for the web
    * corpus this engine ingests). Returned lowercased AS DECLARED —
    * canonicalization happens at decode time, so the column stays an
    * honest record of what the page said.
    */
  def resolveCharset(contentType: String, payload: Array[Byte]): String = {
    val fromHeader = Option(contentType).flatMap(charsetParam)
    val mime = Option(contentType).map(mimeType)
    sniffBom(payload)
      .orElse(fromHeader)
      .orElse(if (mime.contains("text/html")) sniffMetaCharset(payload)
              else None)
      .getOrElse("utf-8")
  }

  /** Decode payload bytes with a declared charset, loud on a charset
    * the JVM does not know — decoding with a silent UTF-8 fallback
    * would corrupt exactly the pages that bothered to declare. A
    * leading U+FEFF strips after the decode (it is the byte-order
    * MARK, not content — the rule every text consumer downstream
    * would otherwise have to re-learn; Java only auto-strips it for
    * the "UTF-16" pseudo-charset, not utf-8/utf-16be/utf-16le).
    */
  def decodeText(payload: Array[Byte], charset: String,
                 label: String): String =
    try {
      val s = new String(payload, java.nio.charset.Charset.forName(charset))
      if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s
    } catch {
      case e: java.nio.charset.UnsupportedCharsetException =>
        throw new IllegalArgumentException(
          s"$label: declared charset '$charset' is not supported — a " +
            "silent UTF-8 fallback would corrupt the declaring page", e)
      case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"$label: declared charset '$charset' is not a legal charset " +
            "name", e)
    }
}
