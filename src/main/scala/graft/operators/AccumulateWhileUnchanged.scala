package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Change-detection grouping ("sessionize by property change").
  *
  * Capability of the reference's `AccumulateWhileUnchanged`
  * (`AccumulateWhileUnchanged.scala:26-29` in akka/akka-stream-contrib):
  * buffer consecutive elements while an extracted property stays equal,
  * flush the group when it changes.
  *
  * Spark-first mapping (batch): the classic gaps-and-islands rewrite —
  * `lag` detects property changes, a running sum of change flags assigns a
  * group id, then any group-level aggregation applies. One shuffle on the
  * partition key; window + aggregate both stay in whole-stage codegen.
  * The streaming equivalent lives in
  * [[graft.streaming.StatefulOps.accumulateWhileUnchanged]].
  */
object AccumulateWhileUnchanged {

  /** Adds `gidName` = 1-based group id per `partitionCols`, where a new
    * group starts whenever `property` differs from the previous row's
    * (under `orderCols`, which must be a total order within a partition).
    */
  def changeGroups(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column],
                   property: Column, gidName: String = "group_id"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    val changed = when(lag(property, 1).over(w).isNull ||
      lag(property, 1).over(w) =!= property, 1).otherwise(0)
    df.withColumn(gidName,
      sum(changed).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Full reference semantics: collect each unchanged-run into an array
    * column (the reference emits `Seq[Element]`), with the run's property
    * and bounds. `maxElements` splits runs longer than the cap, mirroring
    * the reference's `maxElements` flush (`AccumulateWhileUnchanged.scala:27`).
    */
  def groups(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column],
             property: Column, payload: Column, maxElements: Option[Int] = None): DataFrame = {
    val withGid = changeGroups(df, partitionCols, orderCols, property)
    val w = Window.partitionBy((partitionCols :+ col("group_id")): _*).orderBy(orderCols: _*)
    val capped = maxElements match {
      case Some(cap) => withGid
        .withColumn("__sub", ((row_number().over(w) - 1) / cap).cast("long"))
      case None => withGid.withColumn("__sub", lit(0L))
    }
    capped
      .groupBy((partitionCols ++ Seq(col("group_id"), col("__sub"))): _*)
      .agg(first(property).as("property"),
        count(lit(1)).as("n"),
        collect_list(payload).as("elements"))
      .drop("__sub")
  }
}
