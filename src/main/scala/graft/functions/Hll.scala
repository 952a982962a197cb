package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct counting — the cardinality sketch
  * beside [[Aggregators.CountMin]]'s frequency sketch (Flajolet et al.
  * 2007, "HyperLogLog: the analysis of a near-optimal cardinality
  * estimation algorithm").
  *
  * Spark-first: the sketch IS a groupBy — register index and rank are
  * pure codegen projections of `md5(key)` (no UDAF, no custom state),
  * `max(rank)` per (group, register) is an ordinary partial-aggregating
  * HashAggregate, and the estimate folds the dense register array with
  * a HOF. At 100 TB the shuffle moves at most `groups × m` register
  * rows — the map-side max has already collapsed everything else.
  *
  * Engine-reproducible by construction (unlike the engine-private
  * `approx_count_distinct` HLL++): the hash is the first 60 bits of
  * md5, the rank is `remBits + 1 - length(bin(rem))` — string-exact
  * integer arithmetic any SQL engine can replay, so the DuckDB oracle
  * rebuilds the registers bit-for-bit (the CountMin oracle rule).
  *
  * `p` index bits → m = 2^p registers (default 6 → 64 registers,
  * ~13% standard error); the remaining 60−p bits feed the rank. Small-
  * range correction applies below 2.5·m with empty registers (linear
  * counting), matching the published estimator.
  */
object Hll {

  /** Approximate distinct `key` count per `group`:
    * (group, approx_distinct, exact-free — pair with a countDistinct
    * column when auditing accuracy). Estimate rounded to 2 dp.
    */
  def distinctPerGroup(df: DataFrame, group: Column, key: Column,
                       p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val m = 1 << p
    val remBits = 60 - p
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    val rem = h.bitwiseAND(lit((1L << remBits) - 1))
    val rank = when(rem === 0, lit(remBits + 1))
      .otherwise(lit(remBits + 1) - length(bin(rem)))
    val regs = df
      .select(group.as("grp"), shiftright(h, remBits).as("idx"), rank.as("rank"))
      .groupBy(col("grp"), col("idx")).agg(max(col("rank")).as("r"))
    // dense m-register array in index order, absent registers = 0 — the
    // fold order is fixed so the double sum is engine-reproducible
    val dense = regs.groupBy(col("grp"))
      .agg(map_from_entries(collect_list(struct(col("idx"), col("r")))).as("mp"))
      .select(col("grp"),
        transform(sequence(lit(0L), lit((m - 1).toLong)),
          i => coalesce(element_at(col("mp"), i), lit(0))).as("dense"))
    dense.select(col("grp").as("group"),
      round(estimate(col("dense"), p), 2).as("approx_distinct"))
  }

  /** The published estimator over a dense m-register array column —
    * harmonic mean with small-range linear counting. Fold order is the
    * array order, so the double arithmetic is engine-reproducible.
    * SHARED by the declarative batch path and the streaming Aggregator
    * twin, so their estimates cannot drift.
    */
  private[graft] def estimate(dense: Column, p: Int): Column = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val s = aggregate(dense, lit(0.0d),
      (acc, r) => acc + pow(lit(2.0d), -r.cast("double")))
    val zeros = size(filter(dense, r => r === 0)).cast("double")
    val raw = lit(alpha * m * m) / s
    when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(raw)
  }

  /** Register buffer for the streaming twin. */
  case class HllBuf(regs: Array[Int])

  /** The 60-bit md5 value the SQL side computes as
    * `conv(substring(md5(key), 1, 15), 16, 10)`: the first 15 hex chars
    * are the first 60 bits of the digest, i.e. the big-endian long of
    * the first 8 bytes shifted right 4 — direct byte arithmetic, no
    * hex-string formatting (the CountMin.bucket rule: ThreadLocal
    * digest, zero per-row allocation beyond the digest's own buffer).
    */
  private val digests = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))
  private[graft] def hash60(key: String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** HLL registers as a typed Aggregator — the STREAMING form: one
    * fixed m-int buffer per group as streaming state (the CountMin q50
    * state shape), elementwise-max merge so results are independent of
    * micro-batch slicing and identical to the declarative batch
    * registers (same md5-derived integer arithmetic, JVM-side).
    *
    * Hot-path contract: `reduce` does ONE ThreadLocal digest per token
    * and mutates the register array in place (the
    * [[KlDrift.CountsAgg]] rule) — no per-row digest instantiation, no
    * hex formatting, no buffer copy. ~100 ns/token vs ~1.5 µs for the
    * naive getInstance + "%02x"-format form it replaced.
    */
  class RegisterAgg(p: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, HllBuf, HllBuf] {
    private val m = 1 << p
    private val remBits = 60 - p

    override def zero: HllBuf = HllBuf(new Array[Int](m))
    override def reduce(b: HllBuf, key: String): HllBuf = {
      if (key == null) return b // SQL md5(NULL) -> NULL propagation
      val v = hash60(key)
      val idx = (v >>> remBits).toInt
      val rem = v & ((1L << remBits) - 1)
      val rank =
        if (rem == 0L) remBits + 1
        // length(bin(rem)) = 64 - numberOfLeadingZeros(rem) for rem > 0
        else remBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rank > b.regs(idx)) b.regs(idx) = rank
      b
    }
    override def merge(a: HllBuf, b: HllBuf): HllBuf = {
      var i = 0
      while (i < m) { if (b.regs(i) > a.regs(i)) a.regs(i) = b.regs(i); i += 1 }
      a
    }
    override def finish(r: HllBuf): HllBuf = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[HllBuf] =
      org.apache.spark.sql.Encoders.product[HllBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[HllBuf] =
      org.apache.spark.sql.Encoders.product[HllBuf]
  }
}
