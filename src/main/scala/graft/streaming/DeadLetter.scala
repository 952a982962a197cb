package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming dead-letter routing — the reference Retry's give-up path
  * (`Retry.scala:42-53`: exhausted elements are EMITTED as failures, not
  * dropped) mapped to Structured Streaming: each micro-batch runs the
  * attempt, successes append to the output table, failures append to a
  * dead-letter table with provenance (batch id, ingest time), and a
  * batch [[replay]] later re-drives the dead letters through
  * [[graft.operators.Retry.fixpoint]].
  *
  * `attempt` follows the engine-wide Try-as-data contract
  * (nullable `value` / `error` columns, never throws) — the same
  * function slots into the streaming path here and the batch fixpoint,
  * so retry semantics cannot drift between the two.
  *
  * Scale notes: the batch is persisted once and both splits read the
  * cached result (no double evaluation, no success/failure race);
  * appends are idempotent per epoch via the streaming checkpoint.
  */
object DeadLetter {

  /** Start the streaming query. Output rows land in `outPath` (parquet,
    * append), failed rows in `dlqPath` with `batch_id`.
    */
  def run(input: DataFrame, attempt: DataFrame => DataFrame,
          outPath: String, dlqPath: String, checkpoint: String): StreamingQuery =
    input.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        val res = attempt(batch).persist()
        try {
          res.filter(col("error").isNull)
            .write.mode("append").parquet(outPath)
          res.filter(col("error").isNotNull).withColumn("batch_id", lit(id))
            .write.mode("append").parquet(dlqPath)
        } finally { res.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Re-drive accumulated dead letters through the bounded batch
    * fixpoint. Returns the fixpoint result (successes + still-failing
    * rows after `maxRetries`, per [[graft.operators.Retry.fixpoint]]).
    */
  def replay(spark: SparkSession, dlqPath: String,
             attempt: DataFrame => DataFrame,
             retryWith: DataFrame => DataFrame,
             maxRetries: Int): DataFrame =
    graft.operators.Retry.fixpoint(
      spark.read.parquet(dlqPath).drop("value", "error", "attempt", "batch_id"),
      attempt, retryWith, maxRetries)
}
