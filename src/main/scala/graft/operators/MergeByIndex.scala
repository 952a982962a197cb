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
    * (`MergeByIndex.scala:139-143`). Distributed check: count rows whose
    * index does not strictly increase under the total order given by
    * `orderCols` (0 == monotonic). Kept separate so the hot path pays
    * nothing.
    *
    * Scale: the naive `lag(idx).over(Window.orderBy(...))` funnels the
    * whole input into ONE task. Instead: prune to the order + idx
    * columns, range-repartition and sort within partitions (same
    * distributed sort as [[GlobalIndex.withRowIndex]]), then a single
    * streaming pass per partition counting in-partition violations plus
    * each partition's first/last index — only one tiny row per partition
    * reaches the driver, where adjacent-partition boundaries are checked.
    * Null indices are skipped, matching the lag form (a null on either
    * side of `>=` never counted).
    */
  def monotonicViolations(df: DataFrame, idx: Column, orderCols: Seq[Column]): Long = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val pruned = df.select(orderCols :+ idx.cast("long").as("__idx"): _*)
    val sorted = pruned.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val iIdx = sorted.schema.fieldIndex("__idx")
    val stats = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var first: java.lang.Long = null
      var last: java.lang.Long = null
      var viol = 0L
      it.foreach { r =>
        if (!r.isNullAt(iIdx)) {
          val v = r.getLong(iIdx)
          if (last != null && last >= v) viol += 1
          if (first == null) first = v
          last = v
        }
      }
      Iterator.single((pid, viol, Option(first).map(_.toLong), Option(last).map(_.toLong)))
    }.collect().sortBy(_._1)
    var total = stats.map(_._2).sum
    // boundary check: last non-null index seen so far vs next partition's
    // first (partitions with no non-null index carry the previous last)
    var carry: Option[Long] = None
    stats.foreach { case (_, _, first, lastOpt) =>
      for (c <- carry; f <- first) if (c >= f) total += 1
      if (lastOpt.isDefined) carry = lastOpt
    }
    total
  }
}
