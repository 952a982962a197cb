package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming executions of engine queries.
  *
  * These run a REAL streaming query (file source → agg → memory sink,
  * `Trigger.AvailableNow`) and return the result as a DataFrame, so the
  * driver's DuckDB oracle verifies the streaming engine too — same
  * result as the batch plan, different execution path.
  */
object StreamingQueries {

  private val counter = new AtomicInteger(0)

  /** events schema as stored (ts is TIMESTAMP(NANOS) → read as Long). */
  private val rawEventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private val rawDocumentsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming read of the events table (nanos → microsecond timestamps,
    * same truncation as [[graft.Tables.events]]).
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // glob form: FileStreamSource force-sets basePath to the (file) path
    // for non-glob paths, which then fails directory validation.
    spark.readStream.schema(rawEventsSchema)
      .option("basePath", sfDir)
      .parquet(s"$sfDir/events.parque[t]")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def documentsStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream.schema(rawDocumentsSchema)
      .option("basePath", sfDir)
      .parquet(s"$sfDir/documents.parque[t]")

  /** Run a streaming aggregation to a memory sink and return the final
    * table. AvailableNow processes the whole input then stops — the
    * deterministic replay mode.
    */
  def runToMemory(agg: DataFrame, mode: String = "complete"): DataFrame = {
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    agg.sparkSession.table(name)
  }

  /** q21's tumbling-window aggregation, executed via Structured
    * Streaming. Oracle: identical SQL to q21.
    */
  def tumblingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventsStream(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    runToMemory(agg).orderBy(col("window_start"), col("event_type"))
  }

  /** p01's exact-dedup grouping, executed via Structured Streaming. */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val agg = documentsStream(spark, sfDir)
      .groupBy(TextFunctions.fingerprint(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("group_size"))
    runToMemory(agg).orderBy(col("fingerprint"))
  }
}
