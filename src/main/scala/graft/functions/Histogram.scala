package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-bin histogram quantile sketch — the rank statistic beside
  * [[Aggregators.CountMin]]'s frequencies and [[Hll]]'s cardinalities:
  * per-group approximate quantiles from an equi-width histogram over a
  * configured [lo, hi) range, in FIXED memory (`bins` longs per group)
  * where an exact quantile needs a per-group sort of every value.
  *
  * Spark-first: the sketch IS a groupBy — the bin index is a pure
  * codegen projection (`clamp(floor((v − lo) / w))`), per-(group, bin)
  * counts are an ordinary partial-aggregating HashAggregate (shuffle
  * ≤ groups × bins rows at any corpus size), and the estimate
  * interpolates inside the bin the target rank lands in. Out-of-range
  * values clamp to the edge bins, so the sketch degrades loudly (edge
  * quantiles pile at lo/hi) instead of dropping data.
  *
  * Engine-reproducible by construction (the CountMin/Hll oracle rule):
  * binning and rank targets are integer arithmetic plus single double
  * op chains any SQL engine replays bit-for-bit — no engine-private
  * t-digest. Estimate: with `target = max(1, ceil(q·n))` and the
  * crossing bin b (cumBefore < target ≤ cum),
  * `est = lo + w · (b + (target − cumBefore) / c_b)`.
  */
object Histogram {

  /** Clamped equi-width bin index of `value` — a codegen projection;
    * null values produce a null bin (callers filter them).
    */
  private[graft] def binCol(value: Column, lo: Double, hi: Double,
                            bins: Int): Column =
    least(greatest(floor((value - lit(lo)) / lit((hi - lo) / bins)).cast("long"),
      lit(0L)), lit((bins - 1).toLong))

  /** Per-group approximate quantiles of `value`:
    * (group, quantile, n, est) rows, one per requested quantile, est
    * rounded to 4 dp. Null values are ignored.
    */
  def quantilesPerGroup(df: DataFrame, group: Column, value: Column,
                        quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99),
                        lo: Double = 0.0, hi: Double = 512.0,
                        bins: Int = 64): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo: $bins, [$lo, $hi)")
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1),
      s"quantiles must lie in (0, 1]: $quantiles")
    val counts = df
      .where(value.isNotNull)
      .select(group.as("grp"), binCol(value, lo, hi, bins).as("bin"))
      .groupBy(col("grp"), col("bin")).agg(count(lit(1)).as("c"))
    // dense bin array in index order — same shape the streaming
    // aggregator's buffer arrives in, so the estimator is shared
    val dense = counts.groupBy(col("grp"))
      .agg(map_from_entries(collect_list(struct(col("bin"), col("c")))).as("mp"))
      .select(col("grp"),
        transform(sequence(lit(0L), lit((bins - 1).toLong)),
          i => coalesce(element_at(col("mp"), i), lit(0L))).as("dense"))
    estimateQuantiles(dense, quantiles, lo, hi, bins)
  }

  /** Quantile estimates from (grp, dense) rows — SHARED by the
    * declarative batch sketch and the streaming aggregator twin so the
    * interpolation cannot drift. The per-bin window is bounded by
    * construction (≤ `bins` rows per group).
    */
  private[graft] def estimateQuantiles(dense: DataFrame, quantiles: Seq[Double],
                                       lo: Double, hi: Double,
                                       bins: Int): DataFrame = {
    val w = (hi - lo) / bins
    val rows = dense
      .select(col("grp"), aggregate(col("dense"), lit(0L), _ + _).as("n"),
        posexplode(col("dense")).as(Seq("idx", "c")))
    val win = Window.partitionBy(col("grp")).orderBy(col("idx"))
    val cum = rows.withColumn("cum", sum(col("c")).over(win))
      .where(col("c") > 0)
      .select(col("grp"), col("n"), col("idx"), col("c"), col("cum"),
        explode(array(quantiles.map(lit(_)): _*)).as("q"))
    val target = greatest(ceil(col("q") * col("n")).cast("long"), lit(1L))
    cum
      .where(col("cum") >= target && col("cum") - col("c") < target)
      .select(col("grp").as("group"), col("q").as("quantile"), col("n"),
        round(lit(lo) + lit(w) * (col("idx") +
          (target - (col("cum") - col("c"))).cast("double") /
            col("c").cast("double")), 4).as("est"))
  }

  /** Histogram bin counts for the streaming twin. */
  case class HistBuf(bins: Seq[Long])

  /** The sketch as a typed Aggregator — the STREAMING form: one fixed
    * `bins`-long buffer per group as streaming state, elementwise-add
    * merge so results are independent of micro-batch slicing and
    * identical to the declarative batch counts (same clamped-floor
    * binning, JVM-side). Callers must filter null values first (the
    * primitive Double input would silently unbox a null to 0.0 and bin
    * it at `lo` — q61 filters, matching the batch form's isNotNull).
    */
  class HistAgg(lo: Double, hi: Double, nbins: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Double, HistBuf, HistBuf] {
    private val w = (hi - lo) / nbins

    override def zero: HistBuf = HistBuf(Seq.fill(nbins)(0L))
    override def reduce(b: HistBuf, v: Double): HistBuf = {
      val bin = math.min(math.max(math.floor((v - lo) / w).toLong, 0L),
        (nbins - 1).toLong).toInt
      HistBuf(b.bins.updated(bin, b.bins(bin) + 1L))
    }
    override def merge(a: HistBuf, b: HistBuf): HistBuf =
      HistBuf(a.bins.lazyZip(b.bins).map(_ + _))
    override def finish(r: HistBuf): HistBuf = r
    override def bufferEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
    override def outputEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
  }
}
