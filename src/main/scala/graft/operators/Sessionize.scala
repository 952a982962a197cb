package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization (batch form).
  *
  * The time-gap variant of the reference's `AccumulateWhileUnchanged`
  * capability (`AccumulateWhileUnchanged.scala:26-29` maxDuration flush in
  * akka/akka-stream-contrib) and the batch analog of Spark's
  * `session_window`.
  *
  * Gaps-and-islands: a row starts a new session when it is `gapMicros` or
  * more after its predecessor (matching `session_window`'s half-open interval
  * semantics: a row at exactly last+gap is a new session). One shuffle on
  * the keys; both windows share one sort.
  */
object Sessionize {

  /** Adds `session_id` (1-based per key) under gap-based sessionization. */
  def byGap(df: DataFrame, keys: Seq[Column], ts: Column, tiebreak: Column,
            gapMicros: Long, sessionIdName: String = "session_id"): DataFrame = {
    val us = unix_micros(ts)
    val w = Window.partitionBy(keys: _*).orderBy(us, tiebreak)
    val prev = lag(us, 1).over(w)
    val newSession = when(prev.isNull || (us - prev) >= gapMicros, 1).otherwise(0)
    df.withColumn(sessionIdName,
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
