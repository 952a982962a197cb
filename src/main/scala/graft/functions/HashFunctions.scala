package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable hashing primitives for dedup.
  *
  * Everything is md5-based: md5 is bit-identical across engines, so the
  * DuckDB oracle can verify MinHash/SimHash results exactly. A md5 hex
  * string compared lexicographically is an unbiased uniform hash order —
  * taking the MIN hex string per salt IS MinHash (each salt defines an
  * independent random permutation of shingle space).
  *
  * At 100 TB scale: md5 over short shingles is codegen'd
  * (`org.apache.spark.sql.catalyst.expressions.Md5`), the per-document
  * signature is computed in one projection (no explode for minhash), and
  * the LSH band join shuffles only (band_key, doc_id) pairs.
  */
object HashFunctions {

  /** MinHash signature: for each salt i in 0..k-1, the minimum over
    * shingles of md5(i || ':' || shingle). Returns array of k hex strings.
    */
  def minhashSignature(shinglesCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shinglesCol,
        s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** LSH band keys: concatenate `rowsPerBand` consecutive signature
    * entries into one band key per band. Docs sharing any band key are
    * candidate duplicates.
    */
  def bandKeys(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => concat(b.cast("string"), lit("|"),
        array_join(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)), "|")))

  /** Value of hex nibble `pos` (1-based) of md5(s), as int 0..15 —
    * portable to SQL as strpos('0123456789abcdef', substr(md5(s),pos,1))-1.
    */
  def md5Nibble(s: Column, pos: Int): Column =
    (instr(lit("0123456789abcdef"), substring(md5(s), pos, 1)) - 1).cast("int")

  /** Bit `b` (0..3) of an int nibble, via integer arithmetic (portable —
    * no engine-specific bit ops): floor(nibble / 2^b) % 2.
    */
  def nibbleBit(nibble: Column, b: Int): Column =
    floor(nibble / math.pow(2, b).toInt.toDouble).cast("long") % 2
}
