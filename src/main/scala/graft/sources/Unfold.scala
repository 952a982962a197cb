package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side unfold — the DAG-shaped answer to the reference's cyclic
  * generators.
  *
  * `SourceGen.unfoldFlow` (`SourceGen.scala:35,70` in
  * akka/akka-stream-contrib) and `FeedbackLoop` (`FeedbackLoop.scala:
  * 18-20`) wire a flow's output back to its input. Spark plans are DAGs,
  * so the cycle becomes a bounded driver loop: each step runs a full
  * distributed job; the state `S` lives on the driver (like the
  * reference's single seed), while the emitted DataFrames are
  * distributed. This is the GraphX/Pregel iteration pattern.
  *
  * `SourceRepeatEval` (`SourceRepeatEval.scala:39`) is the special case
  * `unfold(0)(i => Some((i+1, gen())))` — or, streaming, the `rate`
  * source mapped through the generator (see tests).
  */
object Unfold {

  /** SourceRepeatEval (`SourceRepeatEval.scala:39` in the reference): an
    * infinite source evaluating a generator per element. Spark-first:
    * the `rate` streaming source provides the demand clock; the generator
    * runs as a projection over it. Stop via `StreamingQuery.stop()` —
    * the materialized `Cancellable`.
    */
  def repeatEval(spark: SparkSession, rowsPerSecond: Int = 10): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load() // columns: timestamp, value — map value through the generator


  /** Unfold a state into a sequence of DataFrames and union them.
    * `step` returns (nextState, batch) or None to stop. `maxSteps`
    * bounds the loop like the reference bounds its buffers.
    */
  def unfold[S](spark: SparkSession, seed: S, maxSteps: Int)
               (step: S => Option[(S, DataFrame)]): DataFrame = {
    var state = seed
    var i = 0
    val batches = Seq.newBuilder[DataFrame]
    var done = false
    while (!done && i < maxSteps) {
      step(state) match {
        case Some((next, batch)) =>
          // localCheckpoint keeps lineage linear across iterations
          batches += batch.localCheckpoint(eager = false)
          state = next
        case None => done = true
      }
      i += 1
    }
    batches.result().reduceOption(_.unionByName(_))
      .getOrElse(spark.emptyDataFrame)
  }
}
