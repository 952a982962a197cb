package graft.functions

/** The byte ↔ printable-unicode alphabet of BYTE-LEVEL BPE — the
  * GPT-2 `bytes_to_unicode` table every production tokenizer since
  * has shipped (Radford et al. 2019, public `encoder.py`): each of
  * the 256 byte values gets exactly one printable character, so a
  * merge table over "characters" is really a merge table over raw
  * UTF-8 bytes and NO input byte sequence is ever unrepresentable
  * (char-level BPE stumbles on unseen code points; byte-level cannot,
  * by construction).
  *
  * The mapping: bytes that are already printable Latin-1
  * (`!`..`~`, `¡`..`¬`, `®`..`ÿ`) map to THEMSELVES; the 68
  * remaining bytes (controls, space, DEL, 0x7F..0xA0, 0xAD) map to
  * U+0100 + n in byte order. Printable ASCII mapping to itself is
  * what makes byte-level and char-level BPE agree exactly on
  * printable-ASCII corpora — the equivalence CorpusOpsSpec pins.
  *
  * Everything here is driver/executor-side JVM code; the DuckDB
  * oracle gets the SAME table rendered as a 256-entry SQL list
  * literal ([[sqlList]]) so the two engines share one alphabet
  * definition with no drift surface.
  */
object ByteAlphabet {

  /** byte value (0..255) → its 1-character symbol string. */
  val chars: Array[String] = {
    val out = new Array[String](256)
    var n = 0
    var b = 0
    while (b < 256) {
      val printable =
        (b >= '!' && b <= '~') || (b >= 0xA1 && b <= 0xAC) || (b >= 0xAE && b <= 0xFF)
      if (printable) out(b) = String.valueOf(b.toChar)
      else { out(b) = String.valueOf((256 + n).toChar); n += 1 }
      b += 1
    }
    out
  }

  /** mapped char → byte value; total inverse (the mapping is a
    * bijection into chars < U+0144, all single UTF-16 chars).
    */
  private val inverse: Array[Int] = {
    val inv = Array.fill(0x144)(-1)
    var b = 0
    while (b < 256) { inv(chars(b).charAt(0)) = b; b += 1 }
    inv
  }

  /** One word as byte symbols: UTF-8 encode, then map each byte
    * through the alphabet — the byte-level twin of
    * [[BpeKernel.seed]]'s code-point seeding.
    */
  def seed(w: String): Array[String] = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val syms = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      syms(i) = chars(bytes(i) & 0xFF)
      i += 1
    }
    syms
  }

  /** A symbol (one or more mapped chars, e.g. a merged "Ã©") back to
    * the UTF-8 text it encodes — the detokenization direction; the
    * seed → decode round trip is identity on any string (spec-pinned).
    * Fails loudly on a char outside the alphabet: decoding a symbol
    * that never came from [[seed]] is caller error, not data.
    */
  def decode(sym: String): String = {
    val bytes = new Array[Byte](sym.length)
    var i = 0
    while (i < sym.length) {
      val c = sym.charAt(i)
      val b = if (c < 0x144) inverse(c) else -1
      require(b >= 0, s"char U+${c.toInt.toHexString} is not in the byte alphabet")
      bytes(i) = b.toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The alphabet as a DuckDB 256-entry list literal (1-indexed by
    * byte value + 1) — the oracle's copy of the table, generated from
    * the same `chars` array the JVM kernel reads.
    */
  lazy val sqlList: String =
    chars.map(c => "'" + c.replace("'", "''") + "'").mkString("[", ",", "]")

  /** The alphabet as ONE 256-character string literal: byte b's symbol
    * is `substr(<this>, b + 1, 1)` (DuckDB substr is character-
    * indexed). The oracle's hot-path form — a shared string constant
    * per query instead of a per-element list build.
    */
  lazy val sqlString: String =
    "'" + chars.map(_.replace("'", "''")).mkString + "'"
}
