package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators.
  *
  * Capability of the reference's `Sample` stage (`Sample.scala:22,32-35,44`
  * in akka/akka-stream-contrib): emit every n-th element, or elements at a
  * random step.
  *
  * Spark-first mapping:
  *  - every-nth needs a total order; we derive a scalable global index
  *    (see [[GlobalIndex]]) and filter `idx % n == 0` — a narrow filter
  *    that whole-stage-codegens, instead of a single-task window.
  *  - random sampling maps to `rand(seed) < p` (codegen'd, no shuffle) or
  *    `df.sample` for exact Bernoulli semantics.
  */
object Sample {

  /** Every n-th element under the total order `orderCols` (1-based: rows
    * n, 2n, 3n, ...), like `Sample(nth)` in the reference.
    */
  def everyNth(df: DataFrame, n: Int, orderCols: Seq[Column]): DataFrame = {
    require(n > 0, s"sample step must be positive, got $n")
    GlobalIndex.withRowIndex(df, orderCols, "__idx")
      .filter(col("__idx") % n === 0)
      .drop("__idx")
  }

  /** Random sample with expected step `maxStep/2` — the reference's
    * `Sample.random(maxStep)` keeps ~1/(maxStep/2) of elements; we expose
    * the equivalent keep-fraction directly. Deterministic under `seed`.
    */
  def random(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.filter(rand(seed) < fraction)
}
