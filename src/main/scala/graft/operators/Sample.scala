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

  /** Random sample at an equivalent keep-fraction — the rate-matched
    * mapping of the reference's `Sample.random(maxStep)` (mean step
    * (maxStep+1)/2 → keep ≈ 2/(maxStep+1)). Deterministic under `seed`.
    *
    * SEMANTIC DELTA, deliberate: the reference draws each gap uniformly
    * from [1, maxStep] (`Sample.scala:32-35`), so any `maxStep`
    * consecutive elements contain ≥1 emission; Bernoulli matches the
    * RATE but not that gap bound (a long dry stretch has positive
    * probability). Use [[randomStep]] when the per-window guarantee
    * matters.
    */
  def random(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.filter(rand(seed) < fraction)

  /** Step-exact random sample: EXACTLY one element from every aligned
    * window of `maxStep` consecutive elements (under the total order
    * `orderCols`), at a seeded pseudo-random in-window offset — the
    * distributed form of the reference's bounded-gap guarantee
    * (`Sample.scala:32-35`: step ∈ [1, maxStep] ⇒ ≥1 emission per
    * maxStep elements). Each window's offset is the md5 dice roll of
    * (window, seed) — same key, same decision everywhere, and plain SQL
    * (`conv(substr(md5(...)))`), so an oracle recomputes it exactly.
    *
    * Deltas vs the reference, documented: emission positions are
    * per-window independent draws, so consecutive emissions are
    * [1, 2·maxStep−1] apart (the reference's sequential walk bounds gaps
    * at maxStep); keep rate is exactly 1/maxStep (reference ≈
    * 2/(maxStep+1)). A trailing partial window emits iff its drawn
    * offset lands inside it.
    *
    * Scale shape: one [[GlobalIndex]] pass, then a map-side codegen
    * filter — no extra shuffle, no per-element state.
    */
  def randomStep(df: DataFrame, maxStep: Int, orderCols: Seq[Column],
                 seed: Long = 42L): DataFrame = {
    require(maxStep > 0, s"max step for a random sampling must be > 0, got $maxStep")
    val w = expr(s"(__idx - 1) div $maxStep")
    val offset = conv(substring(md5(concat_ws(":", w, lit(seed))), 1, 6), 16, 10)
      .cast("long") % maxStep
    GlobalIndex.withRowIndex(df, orderCols, "__idx")
      .filter((col("__idx") - 1) % maxStep === offset)
      .drop("__idx")
  }
}
