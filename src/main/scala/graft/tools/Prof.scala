package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, d)
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n%-30s ${(System.nanoTime()-t0)/1e9}%.2f s  (rows=$r)")
    }
    time("warmup")(docs.count())
    time("fingerprint proj")(docs.select(TextFunctions.fingerprint(col("text")).as("f")).count())
    time("group only")(docs.groupBy(TextFunctions.fingerprint(col("text")).as("f")).agg(count(lit(1))).count())
    time("p01 full (with orderBy)")(graft.SparkEntry.queries("p01_dedup_exact")(spark, d).count())
    time("p01 again")(graft.SparkEntry.queries("p01_dedup_exact")(spark, d).count())
    spark.stop()
  }
}
