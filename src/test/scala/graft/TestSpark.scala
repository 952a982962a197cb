package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse_").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"

  /** Run `body` with Spark logging OFF, restoring WARN after. Two
    * benign-but-noisy cases log ERROR stack traces into an otherwise
    * green suite's output: (a) negative tests that intentionally fail
    * executor tasks (loud-guard `raise_error` expressions under
    * `intercept[]` — the task abort is the EXPECTED outcome), and
    * (b) `query.stop()` racing an in-flight no-data micro-batch
    * commit (CANNOT_WRITE_STATE_STORE.CANNOT_COMMIT task aborts after
    * `processAllAvailable()` has already quiesced the data — the
    * watermark-advance batch is interruptible by design). A log that
    * trains readers to ignore ERROR lines is worse than a quiet one;
    * real failures still fail assertions. Toggling the global level is
    * safe here: the forked test JVM runs suites sequentially.
    */
  def quietly[A](body: => A): A = {
    spark.sparkContext.setLogLevel("OFF")
    try body finally spark.sparkContext.setLogLevel("WARN")
  }

  /** Stop a streaming query with the stop-window noise suppressed —
    * callers quiesce with `processAllAvailable()` first, so everything
    * the test asserts is already materialized when this runs. The OFF
    * window holds briefly PAST the stop: an interrupted in-flight task
    * logs its abort asynchronously on an executor thread, after
    * `stop()` has already returned.
    */
  def quietStop(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    quietly { q.stop(); Thread.sleep(300) }
}
