package graft.operators

import org.apache.spark.sql.DataFrame

/** Feedback-loop iteration — bounded driver-side cycles.
  *
  * Capability of the reference's `FeedbackLoop` (`FeedbackLoop.scala:
  * 18-20` in akka/akka-stream-contrib): wire part of a stage's output
  * back to its input. Spark plans are DAGs; the honest distributed
  * equivalent is Pregel-style driver iteration, where each round is a
  * full cluster job and the "feedback arc" is the DataFrame handed to the
  * next round. The reference bounds its feedback buffer and fails on
  * overflow (`FeedbackLoop.scala:34`); we bound rounds the same way.
  */
object FeedbackLoop {

  /** Iterate `step` from `init`: each round returns (emitted, feedback);
    * the loop ends when feedback is empty or after `maxRounds` (throws if
    * still non-empty then and `failOnOverflow`, like the reference's
    * OverflowStrategy.fail). Returns the union of all emitted frames.
    */
  def iterate(init: DataFrame, maxRounds: Int, failOnOverflow: Boolean = false)
             (step: DataFrame => (DataFrame, DataFrame)): DataFrame = {
    var feedback = init.localCheckpoint(eager = false)
    val emitted = Seq.newBuilder[DataFrame]
    var rounds = 0
    var drained = false
    while (!drained && rounds < maxRounds) {
      val (out, fb) = step(feedback)
      emitted += out.localCheckpoint(eager = false)
      feedback = fb.localCheckpoint(eager = false)
      drained = feedback.isEmpty
      rounds += 1
    }
    if (!drained && failOnOverflow)
      throw new IllegalStateException(
        s"feedback not drained after $maxRounds rounds (overflow)")
    emitted.result().reduceOption(_.unionByName(_))
      .getOrElse(init.sparkSession.emptyDataFrame)
  }
}
