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
    * each partition's first/last row index — only one tiny row per
    * partition reaches the driver, where adjacent-partition boundaries
    * are checked. Exactly the lag form's null semantics: only ADJACENT
    * rows are compared, and a pair with a null index on either side is
    * never a violation (a null row breaks the chain rather than carrying
    * the previous value forward).
    */
  def monotonicViolations(df: DataFrame, idx: Column, orderCols: Seq[Column]): Long = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val pruned = df.select(orderCols :+ idx.cast("long").as("__idx"): _*)
    val sorted = pruned.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val iIdx = sorted.schema.fieldIndex("__idx")
    // per partition: (pid, in-partition violations, first-row idx,
    // last-row idx, nonEmpty) — first/last are the partition's literal
    // boundary rows (null-valued if that row's index is null), so the
    // driver can check exactly the one adjacent pair per boundary.
    val stats = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var first: java.lang.Long = null
      var last: java.lang.Long = null // previous ROW's index, null if null-valued
      var nonEmpty = false
      var viol = 0L
      it.foreach { r =>
        val v: java.lang.Long =
          if (r.isNullAt(iIdx)) null else java.lang.Long.valueOf(r.getLong(iIdx))
        if (!nonEmpty) first = v
        if (nonEmpty && last != null && v != null && last >= v) viol += 1
        last = v
        nonEmpty = true
      }
      Iterator.single((pid, viol, first, last, nonEmpty))
    }.collect().sortBy(_._1)
    var total = stats.map(_._2).sum
    // boundary pairs: previous non-empty partition's LAST row vs this
    // partition's FIRST row (empty partitions don't interrupt adjacency;
    // a null boundary row never counts, same as lag)
    var carry: java.lang.Long = null
    var haveCarry = false
    stats.foreach { case (_, _, first, last, nonEmpty) =>
      if (nonEmpty) {
        if (haveCarry && carry != null && first != null && carry >= first) total += 1
        carry = last
        haveCarry = true
      }
    }
    total
  }
}
