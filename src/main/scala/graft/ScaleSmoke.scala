package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-growth smoke: the 600 k-row bench cannot catch a quadratic
  * term or a driver bottleneck that a 100× corpus would expose, so this
  * main synthesizes a seeded ~`factor`× (default 10×) copy of the bench
  * tables IN THE SAME SCHEMA, runs every headline query once at 1× and
  * once at `factor`×, and flags any query whose runtime grew more than
  * ~linearly (`scaled > slack · factor · base`, with an absolute floor
  * so fixed per-query overhead on sub-second queries can't false-flag).
  *
  * The synthesis replicates each table `factor` times with key columns
  * offset by `k · 10⁹` per copy — foreign keys stay consistent because
  * every key family shifts by the same stride, and `10⁹ % 25 = 0` keeps
  * the stride-sampled quantizer/centroid populations growing WITH the
  * corpus (at 100 TB one scales the model config with the data; a fixed
  * 80-centroid IVF over 100 TB is a config bug, not an engine property).
  * Document text gets a per-copy token suffix so copies are NOT
  * near-duplicates of each other (cross-copy minhash/simhash collisions
  * would manufacture a quadratic pair blow-up the real corpus doesn't
  * have); embeddings get a small per-copy additive jitter for the same
  * reason. Query panels keyed `id < 20` / `% 97 = 0` keep their
  * intended density by construction.
  *
  * Output: one JSON line (and a sidecar file, SPARK_GRAFT_SCALE_OUT,
  * default `scaling_report.json`) with per-query base/scaled/ratio and
  * a `superlinear` list; exits nonzero if any query outside the
  * documented expected set flags.
  */
object ScaleSmoke {

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Per-copy key offset: one stride for every key family keeps FKs
    * aligned; divisible by the quantizer strides (25, 5, 7, 9, 10, 97
    * need not divide — only densities matter for those panels).
    */
  private val Off = 1000000000L

  /** Queries whose growth is EXPECTED to exceed linear at fixed config,
    * each with the reason — reported, never silently skipped.
    */
  private val expectedSuperlinear: Map[String, String] = Map(
    // banded pigeonhole over DISTINCT codes is O(n²/2^bandBits) by
    // construction — exact Hamming near-dup recall at maxDist < bands
    // REQUIRES the all-pairs check on band collisions; at 100 TB the
    // config answer is longer codes / more bands, not a different plan
    "p80_phash_near_dedup" ->
      "pigeonhole candidate pairs grow ~n²/2^8 over distinct codes at fixed 8-band config"
  )

  private def scaleUp(spark: SparkSession, sfDir: String, factor: Int,
                      cpus: Int): String = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_").toString
    val copies = spark.range(factor.toLong).select(col("id").as("k"))
    def src(t: String) = spark.read.parquet(s"$sfDir/$t.parquet")
    def write(t: String, df: DataFrame): Unit =
      df.repartition(cpus).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    def off(c: String): Column = col(c) + col("k") * lit(Off)

    // dimension tables small enough that replication adds nothing
    Seq("region", "nation").foreach(t => write(t, src(t)))
    write("customer", src("customer").crossJoin(copies).select(
      off("c_custkey").as("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")))
    write("supplier", src("supplier").crossJoin(copies).select(
      off("s_suppkey").as("s_suppkey"), col("s_name"), col("s_nationkey"),
      col("s_acctbal")))
    write("part", src("part").crossJoin(copies).select(
      off("p_partkey").as("p_partkey"), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")))
    write("orders", src("orders").crossJoin(copies).select(
      off("o_orderkey").as("o_orderkey"), off("o_custkey").as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")))
    write("lineitem", src("lineitem").crossJoin(copies).select(
      off("l_orderkey").as("l_orderkey"), off("l_partkey").as("l_partkey"),
      off("l_suppkey").as("l_suppkey"), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate")))
    write("events", src("events").crossJoin(copies).select(
      off("event_id").as("event_id"), col("ts"),
      off("user_id").as("user_id"), col("event_type"), col("value"),
      col("props")))
    // per-copy token suffix: copies share ZERO shingles with each other
    val scaledText = when(col("k") === 0, col("text")).otherwise(
      regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1c"), col("k").cast("string"))))
    write("documents", src("documents").crossJoin(copies).select(
      off("doc_id").as("doc_id"), scaledText.as("text"), col("lang"),
      col("source"), length(scaledText).cast("long").as("n_chars")))
    write("embeddings", src("embeddings").crossJoin(copies).select(
      off("vec_id").as("vec_id"),
      transform(col("embedding"),
        x => (x + col("k").cast("float") * lit(0.0009f)).cast("float"))
        .as("embedding"),
      col("label")))
    dir
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val slack = 3.0
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
    val baseDir = Bench.rematerialize(spark, sfDir, cpus.toInt)
    val scaledDir = scaleUp(spark, sfDir, factor, cpus.toInt)
    // warm codegen/JIT once per plan shape at the smallest SF
    SparkEntry.benchQueries.foreach { name =>
      try materialize(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    def timeOne(name: String, dir: String): Option[Double] =
      try {
        val t0 = System.nanoTime()
        materialize(SparkEntry.queries(name)(spark, dir))
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[scale] $name at $dir FAILED: ${e.getMessage}")
        None
      }
    val rows = SparkEntry.benchQueries.flatMap { name =>
      for (b <- timeOne(name, baseDir); s <- timeOne(name, scaledDir))
        yield (name, b, s, s / math.max(b, 1e-9))
    }
    // superlinear = grew past slack·factor AND costs real absolute time
    // at the scaled SF (fixed overhead on a 0.05 s query is not growth)
    val flagged = rows.filter { case (_, _, s, r) =>
      r > slack * factor && s > 2.0
    }
    val unexpected = flagged.filterNot(f => expectedSuperlinear.contains(f._1))
    val qs = rows.map { case (n, b, s, r) =>
      f""""$n":{"base":$b%.3f,"scaled":$s%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val flaggedJson = flagged.map(f => "\"" + f._1 + "\"").mkString("[", ",", "]")
    val expectedJson = expectedSuperlinear.map { case (n, why) =>
      s""""$n":${Jsons.str(why)}""" }.mkString("{", ",", "}")
    val json = s"""{"metric":"scale_smoke","factor":$factor,"slack":$slack,""" +
      s""""sf":"$sfDir","queries":$qs,"superlinear":$flaggedJson,""" +
      s""""expected_superlinear":$expectedJson}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "scaling_report.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"scale_out write failed: $e") }
    spark.stop()
    if (unexpected.nonEmpty) {
      System.err.println(s"[scale] UNEXPECTED superlinear growth: " +
        unexpected.map(_._1).mkString(", "))
      sys.exit(1)
    }
  }
}
