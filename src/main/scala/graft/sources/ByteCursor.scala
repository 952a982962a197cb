package graft.sources

/** THE byte-domain line reader the container kernels share
  * ([[Warc.walkRecords]]'s WARC header walk, [[HttpMessage.parseHead]],
  * [[HttpMessage.dechunk]]): header-style lines terminated by CRLF per
  * the specs, bare LF tolerated (real archives mix them), decoded with
  * the caller's header charset (WARC headers are UTF-8 by ISO 28500;
  * HTTP field lines read as ISO-8859-1). One definition so a framing
  * tweak cannot silently diverge the three walks — the round-9 rule
  * that de-triplicated the inflate kernels, applied to line framing.
  *
  * `p` is the cursor and is deliberately public: the callers interleave
  * line reads with raw byte slices (record bodies, chunk payloads) on
  * the same position.
  */
private[sources] final class ByteCursor(val b: Array[Byte],
                                        charset: String,
                                        prefix: Int => String,
                                        suffix: String = "") {
  var p: Int = 0

  def fail(msg: String): Nothing =
    throw new IllegalArgumentException(prefix(p) + msg + suffix)

  def readLine(what: String): String = {
    val start = p
    while (p < b.length && b(p) != '\n') p += 1
    if (p >= b.length) fail(s"unterminated $what")
    val end = if (p > start && b(p - 1) == '\r') p - 1 else p
    p += 1
    new String(b, start, end - start, charset)
  }
}
