package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s — the engine's surface for the reference's
  * user-supplied `(seed, aggregate)` folds (`TimeWindow.scala:33`,
  * `Accumulate.scala:26` in akka/akka-stream-contrib take arbitrary
  * aggregate lambdas; Spark's equivalent contract is
  * `Aggregator[IN, BUF, OUT]` registered via `functions.udaf`).
  *
  * Buffers must be commutative-mergeable (Spark merges partial buffers in
  * shuffle order). `SumSqCents` folds in exact integer cents so results
  * are bit-stable regardless of merge order — the pattern to follow for
  * oracle-verifiable custom folds over doubles.
  */
object Aggregators {

  /** Sum of squared cent-values: sum(round(x*100)^2) as Long. */
  object SumSqCents extends Aggregator[Double, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Double): Long = {
      val cents = math.round(a * 100)
      b + cents * cents
    }
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
