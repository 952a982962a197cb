package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Running-fold operators.
  *
  * Capability of the reference's `Accumulate` stage
  * (`Accumulate.scala:26` in akka/akka-stream-contrib): emit every
  * intermediate accumulator of a fold ("scan then drop the seed").
  *
  * Spark-first mapping: a running aggregate window frame
  * `rowsBetween(unboundedPreceding, currentRow)`. Partitioned by key the
  * shuffle is by key (scales); an unpartitioned global scan would be a
  * single task and is deliberately not offered.
  */
object Accumulate {

  /** Running aggregate of `agg(valueCol)` per `partitionCols`, ordered by
    * `orderCols`, as new column `outName`.
    */
  def running(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column],
              aggExpr: Column, outName: String): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outName, aggExpr.over(w))
  }

  /** Running sum — the most common fold. */
  def runningSum(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column],
                 valueCol: Column, outName: String = "running_sum"): DataFrame =
    running(df, partitionCols, orderCols, sum(valueCol), outName)
}
