package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-way ordered merge by a monotonic index.
  *
  * Capability of the reference's `MergeByIndex`
  * (`MergeByIndex.scala:41,51` in akka/akka-stream-contrib): merge N
  * streams of `(T, Long)` into one stream ordered by the Long index,
  * tolerating gaps, failing on non-monotonic input.
  *
  * Spark-first mapping: `union` then a range-partitioned sort — Spark's
  * sort IS a distributed k-way merge (each range partition merge-sorts its
  * runs; TimSort detects the pre-sorted runs), so no custom operator is
  * needed and the plan scales with the number of range partitions instead
  * of being a single-threaded merge like the reference.
  */
object MergeByIndex {

  /** Union all inputs (by name, so column order may differ) and order by
    * `idx`. Inputs must share a schema.
    */
  def apply(dfs: Seq[DataFrame], idx: Column): DataFrame = {
    require(dfs.nonEmpty, "mergeByIndex needs at least one input")
    dfs.reduce(_.unionByName(_)).orderBy(idx)
  }

  /** The reference errors on non-monotonic indices within one input
    * (`MergeByIndex.scala:139-143`). Distributed check: count violations
    * of the order within each input; returns the number of offending rows
    * (0 == monotonic). Kept separate so the hot path pays nothing.
    */
  def monotonicViolations(df: DataFrame, idx: Column, orderCols: Seq[Column]): Long = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(orderCols: _*)
    df.withColumn("__prev", lag(idx, 1).over(w))
      .filter(col("__prev").isNotNull && col("__prev") >= idx)
      .count()
  }
}
