package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Observability operators.
  *
  * Capabilities of the reference's `Timed` / `timedIntervalBetween` /
  * `LatencyTimer` (`Timed.scala:28-37,71-86`, `latencyTimer.scala:180` in
  * akka/akka-stream-contrib): wall-clock a section of a pipeline, measure
  * intervals between matching elements, and observe per-element latency.
  *
  * Spark-first mapping: `Dataset.observe` named metrics (accumulated
  * per-action, no extra pass) + `QueryExecutionListener` for query wall
  * time. Per-element latency has no honest equivalent under vectorized
  * execution; the supported granularity is per-batch/per-query, which we
  * expose instead of pretending otherwise.
  */
object Timed {

  /** Listener recording (name, wallMillis) per completed action. */
  final class TimingListener extends QueryExecutionListener {
    private val results = new ConcurrentLinkedQueue[(String, Long)]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      results.add((funcName, durationNs / 1000000L))
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
      results.add((funcName + ":failed", -1L))
    def timings: Seq[(String, Long)] = results.asScala.toSeq
  }

  def withTimingListener(spark: SparkSession): TimingListener = {
    val l = new TimingListener
    spark.listenerManager.register(l)
    l
  }

  /** `timed(section)`: run `action` over the DataFrame, returning
    * (result, wallMillis) — the materialized-value analog.
    */
  def timed[A](df: DataFrame)(action: DataFrame => A): (A, Long) = {
    val t0 = System.nanoTime()
    val r = action(df)
    (r, (System.nanoTime() - t0) / 1000000L)
  }

  /** `timedIntervalBetween`: event-time interval between consecutive rows
    * matching `predicate`, per key — `lag` on the matching subset.
    * Emits `interval_ms` (null for each key's first match).
    */
  def intervalBetween(df: DataFrame, predicate: Column, keys: Seq[Column],
                      ts: Column, orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(orderCols: _*)
    df.filter(predicate)
      .withColumn("interval_ms",
        (unix_millis(ts) - lag(unix_millis(ts), 1).over(w)))
  }

  /** Named observe metrics (count + per-column aggregates) attached to the
    * plan — collected via `QueryExecutionListener` or
    * `StreamingQueryProgress.observedMetrics`.
    */
  def observed(df: DataFrame, name: String, metrics: Seq[Column]): DataFrame =
    df.observe(name, metrics.head, metrics.tail: _*)
}
