package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s  (rows=$r)")
    }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("p12_ann_ivf", "p13_simhash_candidates", "p14_bpe_tokens",
        "p15_winnow_fingerprints", "q36_salted_revenue", "q37_stream_stream_join")
    time("warmup")(graft.Tables.documents(spark, d).count())
    names.foreach { n =>
      time(n)(graft.SparkEntry.queries(n)(spark, d).count())
      time(s"$n (warm)")(graft.SparkEntry.queries(n)(spark, d).count())
    }
    spark.stop()
  }
}
