package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{MinHashSignature, TextFunctions}
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
    val sig = docs.select(col("doc_id"), MinHashSignature(col("text"), 3, 8).as("sig"))
      .filter(col("sig").isNotNull)
    time("signature only")(sig.count())
    time("signature only (again)")(sig.count())
    time("tokenize only")(docs.select(TextFunctions.tokenCount(col("text")).as("n")).agg(sum("n")).count())
    time("p05 full")(graft.SparkEntry.queries("p05_minhash_pairs")(spark, d).count())
    time("p05 again")(graft.SparkEntry.queries("p05_minhash_pairs")(spark, d).count())
    spark.stop()
  }
}
