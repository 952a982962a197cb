package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: Bench's exact methodology (rematerialized multi-file
  * layout, sf0.001 warmup, min-of-3 noop-sink timing) over a NAMED
  * subset of queries — the per-query iteration loop for optimization
  * work, so a change to one operator re-measures in seconds instead of
  * a full suite pass. Run:
  *   sbt "runMain graft.tools.MiniBench p218_sq8_lifecycle p225_ivf_sq8"
  * Extra reps via SPARK_GRAFT_MINI_REPS (default 3).
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "MiniBench: pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_MINI_REPS", "3").toInt
    // config experiments: SPARK_GRAFT_MINI_CONF="k=v;k=v" — applied
    // LAST so an experiment on a key the harness also sets (e.g.
    // spark.sql.adaptive.enabled=false) wins over the defaults
    val extra = sys.env.getOrElse("SPARK_GRAFT_MINI_CONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val spark = extra.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.files.maxPartitionBytes", (512L << 10).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)) {
        case (b, (k, v)) => b.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val benchDir = graft.Bench.rematerialize(spark, sfDir, cpus.toInt)
    args.foreach { n =>
      materialize(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
    }
    val samples = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    for (_ <- 1 to reps; n <- args) {
      val t0 = System.nanoTime()
      materialize(graft.SparkEntry.queries(n)(spark, benchDir))
      samples(n) = samples.getOrElse(n, Vector.empty) :+
        (System.nanoTime() - t0) / 1e9
    }
    args.foreach { n =>
      val ts = samples(n)
      println(f"[mini] $n%-34s min=${ts.min}%.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
