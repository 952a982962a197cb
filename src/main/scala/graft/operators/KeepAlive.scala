package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-filling / heartbeat.
  *
  * Capability of the reference's `KeepAliveConcat`
  * (`KeepAliveConcat.scala:34` in akka/akka-stream-contrib): when a stream
  * goes idle past an interval, inject extrapolated elements so downstream
  * keeps a base rate.
  *
  * Spark-first mapping (batch analog): dense per-key time grids — generate
  * the complete bucket sequence per key with `sequence()` + `explode`
  * (distributed, no driver loop), left-join observed aggregates, fill the
  * holes. The streaming analog (processing-time timeout emitting
  * synthetic rows) is [[graft.streaming.StatefulOps.keepAlive]].
  */
object KeepAlive {

  /** Per key: every `stepSeconds`-aligned bucket between the key's min and
    * max bucket, with `fill` values where the key had no data.
    * `aggs` are (name, aggExpr) computed per (key, bucket).
    */
  def gapFill(df: DataFrame, keys: Seq[String], ts: Column, stepSeconds: Int,
              aggs: Seq[(String, Column)], fill: Map[String, Any]): DataFrame = {
    val step = lit(stepSeconds.toLong)
    val bucket = (floor(unix_timestamp(ts) / step) * step).cast("long")
    val keyed = df.withColumn("bucket", bucket)
    val observed = keyed.groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    val span = keyed.groupBy(keys.map(col): _*)
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
    val grid = span.select(
      (keys.map(col) :+ explode(sequence(col("__lo"), col("__hi"), step)).as("bucket")): _*)
    grid.join(observed, keys :+ "bucket", "left").na.fill(fill)
  }
}
