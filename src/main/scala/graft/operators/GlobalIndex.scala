package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scalable global row indexing.
  *
  * Several reference operators (`MergeByIndex.scala:41`, `Sample.scala:22`
  * in akka/akka-stream-contrib) assume a total element order. In Spark a
  * naive `row_number().over(Window.orderBy(...))` collapses the data onto a
  * single task — fine at 60k rows, fatal at 100 TB.
  *
  * `withRowIndex` produces the identical 1-based index with a scalable
  * plan: range-repartition by the order columns, sort within partitions,
  * then add per-partition offsets computed from partition counts (two
  * passes, no global shuffle to one task).
  */
object GlobalIndex {

  /** Adds `idxName` = 1-based global row index under the total order given
    * by `orderCols` (which must be a total order for determinism — include
    * a unique tiebreaker column).
    *
    * Implementation note: the offsets and the rows MUST come from the
    * same physical execution — `repartitionByRange` samples its range
    * boundaries per execution, so two separate plans over the same
    * lineage can disagree on partition assignment. `zipWithIndex` runs
    * its count job and its indexing pass over the one sorted RDD (the
    * shuffle output is reused between the two jobs), which makes the
    * index exact and deterministic without caching.
    */
  def withRowIndex(df: DataFrame, orderCols: Seq[Column], idxName: String = "row_idx"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.repartitionByRange(n, orderCols: _*).sortWithinPartitions(orderCols: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(idxName, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(indexed, schema)
  }
}
