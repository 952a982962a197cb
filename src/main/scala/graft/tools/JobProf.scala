package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev harness: run ONE query at the bench layout and print a per-JOB
  * time table (job id, duration, callsite) — the where-do-the-seconds-go
  * view for multi-job lifecycle entries whose cost the SQL plan alone
  * can't attribute. Warm pass first (codegen + JVM), then the profiled
  * pass. Run:
  *   sbt "runMain graft.tools.JobProf p218_sq8_lifecycle"
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "JobProf: pass one query name")
    val name = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.files.maxPartitionBytes", (512L << 10).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val benchDir = graft.Bench.rematerialize(spark, sfDir, cpus.toInt)
    materialize(graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
    materialize(graft.SparkEntry.queries(name)(spark, benchDir)) // warm
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, site) =>
          rows.add((je.jobId, (je.time - t0) / 1e3, site))
        }
      }
    })
    val t0 = System.nanoTime()
    materialize(graft.SparkEntry.queries(name)(spark, benchDir))
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(_._1)
    println(f"== $name total=$total%.3f s, ${all.size} jobs ==")
    all.foreach { case (id, s, site) => println(f"job $id%3d  $s%7.3f s  $site") }
    println(f"sum-of-jobs ${all.map(_._2).sum}%.3f s (gaps = driver work)")
    spark.stop()
  }
}
