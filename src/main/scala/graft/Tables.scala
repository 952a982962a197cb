package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All tables are single parquet files per scale factor. At 100 TB these
  * would be partitioned directories; the loaders take a directory and a
  * logical name so nothing else in the engine cares about layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame  = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame    = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame  = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame    = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame    = table(spark, d, "region")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's TimestampType
    * (microseconds) does not accept. We read nanos as Long
    * (`spark.sql.legacy.parquet.nanosAsLong`, set in the session builders)
    * and truncate to microseconds — exactly what DuckDB's parquet reader
    * does, so oracle comparisons line up.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
