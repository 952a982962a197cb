package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev harness for the core-scaling blind spot: at bench SF every query
  * is 0.2-3 s and per-job scheduling/planning overhead dominates, so
  * wall-clock core-scaling ratios measure the scheduler, not the
  * engine. This main runs the WHOLE bench suite once (after the bench's
  * own warmup) and reports, per query, wall seconds alongside
  * sum-of-job seconds — the in-job share is the part that scales with
  * cores; the gap is driver work (planning, commits, collects) that no
  * core count removes. One JSON line + sidecar
  * (SPARK_GRAFT_JOBTIME_OUT, default jobtime_report.json).
  * Same env contract as Bench; NOT part of the driver surface.
  */
object JobTimes {
  def main(args: Array[String]): Unit = {
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
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.benchQueries
    names.foreach { n =>
      try materialize(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    // single-threaded suite: every job between a query's start and end
    // belongs to that query, so a plain accumulator attributes exactly
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobMillis = new java.util.concurrent.atomic.AtomicLong()
    val jobCount = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, js.time)
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        Option(starts.remove(je.jobId)).foreach { t0 =>
          jobMillis.addAndGet(je.time - t0)
          jobCount.incrementAndGet()
        }
    })
    // failure-honest like Bench: one bad name or throwing query must
    // not lose the whole report — it appears with wall = -1
    val rows = names.map { n =>
      jobMillis.set(0L); jobCount.set(0L)
      val t0 = System.nanoTime()
      val ok = try { materialize(graft.SparkEntry.queries(n)(spark, benchDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[jobtimes] $n FAILED: ${e.getMessage}"); false }
      val wall = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      Thread.sleep(50) // let the last JobEnd event drain
      (n, wall, jobMillis.get() / 1e3, jobCount.get())
    }
    val body = rows.map { case (n, w, j, c) =>
      f"""\"$n\":{\"wall\":$w%.3f,\"in_jobs\":$j%.3f,\"n_jobs\":$c}"""
    }.mkString("{", ",", "}")
    val totalWall = rows.filter(_._2 >= 0).map(_._2).sum
    val totalJobs = rows.map(_._3).sum
    val json = f"""{"metric":"jobtime","wall_total":$totalWall%.3f,"in_jobs_total":$totalJobs%.3f,"cpus":$cpus,"sf":"$sfDir","queries":$body}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_JOBTIME_OUT", "jobtime_report.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"jobtime write failed: $e") }
    spark.stop()
  }
}
