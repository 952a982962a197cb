package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Routing / fan-out / pass-through operators.
  *
  * - `PartitionWith` (`PartitionWith.scala:28` in akka/akka-stream-contrib):
  *   route each element to one of two outputs via `In => Either[O0, O1]`.
  * - `PassThroughFlow` (`PassThroughFlow.scala:91-94`): keep the original
  *   element alongside a transformation's result.
  *
  * Spark-first mapping: routing is a tagged projection — one pass, one
  * `CASE WHEN`, no broadcast/zip machinery. The two-sink physical form is
  * `write.partitionBy(sideCol)` (each side lands in its own directory) or
  * two filters over a cached upstream when the sides need different plans.
  * Pass-through is trivial in a relational model: `withColumn` keeps the
  * input columns; there is nothing to re-zip.
  */
object Routing {

  /** One-pass variant of PartitionWith: adds `sideName` = `left`/`right`
    * from `isLeft`, and per-side projections as struct columns. Downstream
    * either filters on the side tag or `write.partitionBy(sideName)`.
    */
  def partitionWith(df: DataFrame, isLeft: Column, leftProj: Column, rightProj: Column,
                    sideName: String = "side"): DataFrame =
    df.withColumn(sideName, when(isLeft, lit("left")).otherwise(lit("right")))
      .withColumn("out", when(isLeft, leftProj).otherwise(rightProj))

  /** Both sides as separate DataFrames (the reference's two outlets).
    * Caller should `.cache()` upstream if both sides are consumed, to
    * mirror the reference's single-pass behavior.
    */
  def partitionWith2(df: DataFrame, isLeft: Column): (DataFrame, DataFrame) =
    (df.filter(isLeft), df.filter(!isLeft))

  /** PassThroughFlow: original columns retained, transformation appended. */
  def passThrough(df: DataFrame, out: Column, outName: String = "out"): DataFrame =
    df.withColumn(outName, out)
}
