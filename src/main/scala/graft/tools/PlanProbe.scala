package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print executed plans for the query names given as args
  * (defaults to the newest pipeline queries) at sf0.001.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("p22_repetition_filter", "p23_decontam", "p25_scrub", "p21_ann_pq_rerank")
    for (n <- names) {
      val p = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"===== $n =====")
      println(p.linesIterator.map(_.take(150)).mkString("\n").take(4000))
    }
    spark.stop()
  }
}
