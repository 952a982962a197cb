package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Last-element extraction.
  *
  * Capability of the reference's `LastElement` (`LastElement.scala:22,39`
  * in akka/akka-stream-contrib): pass elements through, materializing the
  * last one seen.
  *
  * Spark-first mapping: `max_by`-style aggregation — take the row whose
  * order key is maximal, per group. `max(struct(orderCols..., payload))`
  * is a single partial+final hash aggregate: map-side combine keeps only
  * one struct per key per task, so the shuffle moves one row per key per
  * task regardless of input size.
  */
object LastElement {

  /** Per `keys`, the payload of the row maximal under `orderCols`
    * (lexicographic; include a unique tiebreaker for determinism).
    * Output: keys ++ payload columns.
    */
  def perKey(df: DataFrame, keys: Seq[Column], orderCols: Seq[Column],
             payload: Seq[(String, Column)]): DataFrame = {
    val ordered = orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }
    val named = payload.map { case (name, c) => c.as(name) }
    val packed = struct((ordered ++ named): _*)
    val agg0 = df.groupBy(keys: _*).agg(max(packed).as("__last"))
    payload.foldLeft(agg0) { case (d, (name, _)) =>
      d.withColumn(name, col("__last").getField(name))
    }.drop("__last")
  }
}
