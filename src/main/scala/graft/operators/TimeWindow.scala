package graft.operators

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** Time-window aggregation (batch form; streaming in graft.streaming).
  *
  * Capability of the reference's `TimeWindow` (`TimeWindow.scala:33` in
  * akka/akka-stream-contrib): aggregate elements per fixed time period and
  * emit one result per period — and of `Pulse` (`Pulse.scala:24`): at most
  * one element per interval.
  *
  * Spark-first mapping: event-time buckets. `window(ts, d)` (or its
  * `date_trunc` special cases) is epoch-aligned, shuffles once on
  * (bucket, keys), and Catalyst does partial aggregation map-side — the
  * distributed generalization of conflate-then-pulse.
  */
object TimeWindow {

  /** Tumbling window grouped dataset: group by the epoch-aligned bucket of
    * `ts` (window start) plus extra keys. `windowStartName` column holds
    * the bucket start timestamp.
    */
  def tumbling(df: DataFrame, ts: Column, duration: String, keys: Seq[Column],
               windowStartName: String = "window_start"): RelationalGroupedDataset =
    df.withColumn(windowStartName, window(ts, duration).getField("start"))
      .groupBy((col(windowStartName) +: keys): _*)

  /** Sliding window grouped dataset. */
  def sliding(df: DataFrame, ts: Column, duration: String, slide: String, keys: Seq[Column],
              windowStartName: String = "window_start"): RelationalGroupedDataset =
    df.withColumn(windowStartName, window(ts, duration, slide).getField("start"))
      .groupBy((col(windowStartName) +: keys): _*)

  /** Pulse: at most one element per interval per key — the earliest row in
    * each bucket (ties broken by `tiebreak`). One aggregate, no window
    * function: min(struct(order, payload)) has full map-side combine.
    */
  def pulse(df: DataFrame, ts: Column, duration: String, keys: Seq[Column],
            tiebreak: Column, payload: Seq[(String, Column)]): DataFrame = {
    val bucket = window(ts, duration).getField("start").as("bucket_start")
    val named = payload.map { case (n, c) => c.as(n) }
    val packed = struct((Seq(ts.as("__ts"), tiebreak.as("__tb")) ++ named): _*)
    val agg0 = df.groupBy((bucket +: keys): _*).agg(min(packed).as("__first"))
    payload.foldLeft(agg0) { case (d, (n, _)) =>
      d.withColumn(n, col("__first").getField(n))
    }.drop("__first")
  }

  /** Per-(hour, key) event counts on an INTEGER hour index (epoch
    * seconds div 3600) — the associative half of trailing-baseline
    * anomaly detection, SHARED by the batch entry and the streaming
    * twin (counts sum, so the stream folds this grid with state bounded
    * by distinct (hour, key) pairs — never by events). One map-combined
    * aggregation collapses the raw log to the grid.
    */
  def hourlyCounts(df: DataFrame, ts: Column, key: Column): DataFrame =
    df.groupBy(
        (unix_timestamp(date_trunc("hour", ts)) / 3600).cast("long").as("hour_idx"),
        key.as("key"))
      .agg(count(lit(1)).as("n"))

  /** The flag half: a grid row is anomalous when its count exceeds
    * (`factorNum`/`factorDen`)× its trailing-`baselineHours` mean with
    * at least `minBaseline` baseline hours observed — pure INTEGER
    * arithmetic (n·hours·den > num·sum: the rational factor never
    * divides), so any engine recomputing it agrees exactly. The
    * baseline is a RANGE frame over the integer hour index: absent
    * hours cost nothing and cannot mis-slide the frame the way a ROWS
    * frame would. Runs over the already-tiny grid. Default 3/2 = 1.5×
    * the trailing mean — flags real bursts at both sparse and dense
    * traffic (a 2× bar goes silent once hourly counts grow: relative
    * Poisson noise shrinks as 1/√mean).
    */
  /** Distinct (day, user) activity grid on an INTEGER day index — the
    * associative half of rolling-active-user reporting, SHARED by the
    * batch entry and the streaming twin (distinct-ness merges: the
    * stream's state is bounded by user-days, never events).
    */
  def dailyUsers(df: DataFrame, ts: Column, user: Column): DataFrame =
    df.select(
        (unix_timestamp(date_trunc("day", ts)) / 86400).cast("long").as("day"),
        user.as("user_id"))
      .distinct()

  /** DAU / trailing-7-day WAU / stickiness from a [[dailyUsers]] grid.
    * Each user-day contributes map-side to the 7 report days it is
    * "active within" (a bounded ×7 `sequence` explode — no range
    * self-join), restricted to OBSERVED days via a semi-join so the
    * report never invents days the log doesn't contain. Stickiness is
    * the integer micro-ratio dau·10⁶ div wau — exact in any engine.
    * Scale: the grid is users×days (already tiny next to the log);
    * the explode is 7× that, collapsed by one distinct-count exchange.
    */
  def rollingActive(du: DataFrame): DataFrame = {
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val contrib = du.select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("rday"))
      .join(du.select(col("day").as("rday")).distinct(), Seq("rday"), "left_semi")
    val wau = contrib.groupBy(col("rday").as("day"))
      .agg(count_distinct(col("user_id")).as("wau"))
    dau.join(wau, "day")
      .withColumn("stickiness_micro",
        expr("dau * 1000000L div wau"))
  }

  /** Integer fixed-point EWMA over an hourly grid — the order-dependent
    * recurrence `e_t = (num·e_{t-1} + (den−num)·10⁶·x_t) div den` (per
    * key, in hour order, seeded e_0 = 10⁶·x_0), entirely in integer
    * micro-units so the fold is bit-exact in any engine that replays
    * the same order. Per-key series are TIME-bounded (hours), so the
    * in-partition fold over a collected series is config-sized by
    * construction — the grid itself was already one map-combined
    * aggregation over the raw log.
    */
  def ewma(hourly: DataFrame, num: Int = 3, den: Int = 4): DataFrame = {
    require(num > 0 && den > num,
      s"ewma: need 0 < num < den, got $num/$den")
    val packed = hourly.groupBy(col("key"))
      .agg(array_sort(collect_list(struct(col("hour_idx"), col("n"))))
        .as("series"))
    val folded = packed.withColumn("out",
      expr(s"""
        aggregate(series,
          CAST(array() AS ARRAY<STRUCT<hour_idx: BIGINT, n: BIGINT, e: BIGINT>>),
          (acc, x) -> array_append(acc,
            named_struct('hour_idx', x.hour_idx, 'n', x.n, 'e',
              CASE WHEN size(acc) = 0 THEN 1000000L * x.n
                   ELSE (${num}L * element_at(acc, -1).e
                         + ${den - num}L * 1000000L * x.n) div ${den}L
              END)))"""))
    folded.select(col("key"), explode(col("out")).as("r"))
      .select(col("r.hour_idx").as("hour_idx"), col("key"),
        col("r.n").as("n"), col("r.e").as("ewma_micro"))
  }

  /** Per-key least-squares trend over an hourly grid, as EXACT integer
    * numerators: slope = slope_num / slope_den with
    * `slope_num = c·Σxy − Σx·Σy`, `slope_den = c·Σx² − (Σx)²` — no
    * division (integer division of a possibly-NEGATIVE numerator is
    * where engines disagree: Spark `div` truncates, DuckDB `//`
    * floors), so the emitted pair is bit-exact everywhere and the
    * caller divides in whatever arithmetic it wants. x is the hour
    * index RE-BASED per key to its first hour — slope-invariant, and
    * it keeps every sum far from long overflow (x ≤ series length, not
    * an epoch hour). One extra min() aggregation on the already-tiny
    * grid; both aggregations share the key exchange.
    */
  def trendSlopes(hourly: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    val t = hourly
      .withColumn("x", col("hour_idx") - min(col("hour_idx")).over(w))
      .withColumn("y", col("n"))
    // Loud-overflow convention (same intent as EmbeddingStats'
    // addExact/multiplyExact): the ~L⁴ final products are computed in
    // DECIMAL(38,0) and raise if the result leaves long range, instead
    // of wrapping silently. The documented HEADROOM CONTRACT covers the
    // internal long sums, which Spark's non-ANSI sum() would wrap
    // silently: callers must keep L²·y_max < 2⁶³ (L = re-based series
    // length in hours; a decade of hourly rows gives L² ≈ 7.7e9, so
    // y_max up to ~1.2e9 is safe). Within that contract the decimal
    // final products are exact and the raise below is the only
    // overflow surface.
    val dec = (c: Column) => c.cast("decimal(38,0)")
    def toLongLoud(c: Column, name: String): Column =
      when(c.between(lit(Long.MinValue), lit(Long.MaxValue)), c.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"trendSlopes: $name overflows long for key "), col("key"))))
    t.groupBy(col("key"))
      .agg(count(lit(1)).as("c"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("key"), col("c").as("n_hours"),
        toLongLoud(dec(col("c")) * dec(col("sxy"))
          - dec(col("sx")) * dec(col("sy")), "slope_num").as("slope_num"),
        toLongLoud(dec(col("c")) * dec(col("sxx"))
          - dec(col("sx")) * dec(col("sx")), "slope_den").as("slope_den"))
  }

  def trailingAnomaly(hourly: DataFrame, baselineHours: Int = 24,
                      minBaseline: Int = 12, factorNum: Int = 3,
                      factorDen: Int = 2): DataFrame = {
    require(factorNum > 0 && factorDen > 0,
      s"trailingAnomaly: factor must be positive, got $factorNum/$factorDen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("hour_idx"))
      .rangeBetween(-baselineHours.toLong, -1L)
    hourly
      .withColumn("base_sum", sum(col("n")).over(w))
      .withColumn("base_hours", count(lit(1)).over(w))
      .filter(col("base_hours") >= minBaseline &&
        col("n") * col("base_hours") * lit(factorDen.toLong) >
          lit(factorNum.toLong) * col("base_sum"))
  }
}
