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
