package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retry with state evolution — driver-side iterative fixpoint.
  *
  * Capability of the reference's `Retry` / `Retry.concat`
  * (`Retry.scala:42-53,84-95` in akka/akka-stream-contrib): wrap a flow
  * `(in, state) => (Try[out], state)`; on failure compute new
  * `(in, state)` attempts (possibly several) and re-inject, bounded by
  * retry limits.
  *
  * Spark plans are DAGs, so the cycle becomes a bounded driver loop over
  * DataFrames — the same pattern GraphX/Pregel uses. Each iteration is a
  * full distributed job over only the still-failing rows; `attempt` must
  * be a deterministic column transform producing nullable `value` /
  * `error` columns (a UDF that never throws), exactly the reference's
  * `Try[O]` as data. The result unions all successes plus rows exhausted
  * after `maxRetries` (the reference's give-up passthrough).
  */
object Retry {

  /** @param input     rows with at least the attempt-input columns
    * @param attempt   adds/overwrites `value` (nullable) and `error`
    *                  (null == success) for the current attempt
    * @param retryWith transforms a failed row into its next attempt input
    *                  (return fewer/more rows for drop/split semantics —
    *                  the reference's `Retry.concat`)
    * @param maxRetries bound on iterations (reference bounds buffers)
    * @param delay     optional pacing between retry rounds — the
    *                  reference's documented DelayFlow use ("delay the
    *                  retries", `DelayFlow.scala:36-47`); consulted once
    *                  per round with failed=true, so
    *                  `LinearIncreasingDelay` yields linear backoff
    * @param retriesLimit cap on CUMULATIVE retried rows across rounds —
    *                  the reference's `Retry.concat` retriesLimit, which
    *                  fails the stage on overflow
    *                  (`Retry.scala:234-239,263-268`) rather than
    *                  silently degrading
    * @param bufferLimit cap on accumulated SUCCESS rows awaiting
    *                  emission — the analogue of the reference's
    *                  `Retry.concat` bufferLimit (elements queued for
    *                  downstream, `Retry.scala:263-268`); fails on
    *                  overflow. Semantic delta, deliberate: fixpoint
    *                  emits NOTHING until it returns, so every success
    *                  from round 0 onward counts toward the cap — where
    *                  the reference only counts elements downstream has
    *                  not yet consumed. A caller mapping the reference
    *                  knob 1:1 must size it for TOTAL successes, not
    *                  in-flight backlog (3 immediate successes trip
    *                  limit 2 — pinned in ControlSpec). Checked per round
    *                  from the same counting job economics as
    *                  retriesLimit (only when set)
    * @param roundTimeoutMs wall-clock watchdog per retry round — the
    *                  reference's `akka.stream.contrib.retry-timeout`
    *                  (`Retry.scala:192-193`, default 5 s,
    *                  `reference.conf:8-14`), which fails a stuck retry
    *                  cycle instead of hanging forever. When set, each
    *                  round's driver actions (existence probe, attempt
    *                  jobs, counts, the inter-round delay) run under a
    *                  deadline; on overrun the round's Spark job group is
    *                  cancelled and the fixpoint fails loudly, like the
    *                  volume limits
    * @param sleep     injectable for tests; defaults to Thread.sleep
    *
    * Early exit needs only "any rows still failing?", so each round runs
    * a short-circuit existence probe (`isEmpty` = take(1), touches ~one
    * partition). Only `retriesLimit` accounting needs an exact count; the
    * full count job runs per round only when that limit is set.
    */
  def fixpoint(input: DataFrame,
               attempt: DataFrame => DataFrame,
               retryWith: DataFrame => DataFrame,
               maxRetries: Int,
               delay: Option[Control.DelayStrategy] = None,
               retriesLimit: Option[Long] = None,
               bufferLimit: Option[Long] = None,
               roundTimeoutMs: Option[Long] = None,
               sleep: Long => Unit = ms => if (ms > 0) Thread.sleep(ms)): DataFrame = {
    // Watchdog: run one round's blocking work under a deadline. The body
    // executes on a separate thread carrying its own job group, so a
    // timeout can cancel exactly this round's Spark jobs (a hung
    // executor/task keeps the driver action blocked forever otherwise)
    // and fail the fixpoint instead of hanging it.
    def withRoundTimeout[A](body: => A): A = roundTimeoutMs match {
      case None => body
      case Some(ms) =>
        val sc = input.sparkSession.sparkContext
        val group = s"graft-retry-watchdog-${java.util.UUID.randomUUID()}"
        import scala.concurrent.{Await, Future, ExecutionContext}
        import scala.concurrent.duration._
        implicit val ec: ExecutionContext = ExecutionContext.global
        val fut = Future {
          sc.setJobGroup(group, "Retry.fixpoint round", interruptOnCancel = true)
          try body finally sc.clearJobGroup()
        }
        try Await.result(fut, ms.millis)
        catch {
          case _: java.util.concurrent.TimeoutException =>
            sc.cancelJobGroup(group)
            throw new IllegalStateException(
              s"Retry.fixpoint: retry round exceeded roundTimeoutMs=$ms — " +
                "a stuck attempt job was cancelled (reference retry-timeout semantics)")
        }
    }
    var pending = attempt(input.withColumn("attempt", lit(0)))
    var done = pending.filter(col("error").isNull)
    // driver-side running tally: each round counts only ITS successes
    // (recounting the accumulated union would re-scan every prior round)
    var buffered = 0L
    def checkBuffer(roundSuccesses: DataFrame): Unit = bufferLimit.foreach { lim =>
      buffered += roundSuccesses.count()
      if (buffered > lim) throw new IllegalStateException(
        s"Retry.fixpoint: buffered successes $buffered exceed bufferLimit $lim")
    }
    // round 0's buffer count is a Spark action too — a hung first
    // attempt must hit the same watchdog as every later round
    withRoundTimeout(checkBuffer(done))
    var retriedTotal = 0L
    var i = 0
    var drained = false
    while (i < maxRetries && !drained) withRoundTimeout {
      val failed = pending.filter(col("error").isNotNull)
      val anyFailed = retriesLimit match {
        case Some(lim) =>
          val n = failed.count()
          retriedTotal += n
          if (retriedTotal > lim) throw new IllegalStateException(
            s"Retry.fixpoint: cumulative retries $retriedTotal exceed retriesLimit $lim")
          n > 0
        case None => !failed.isEmpty
      }
      if (!anyFailed) {
        drained = true // fixpoint reached: nothing left to retry
      } else {
        delay.foreach(d => sleep(d.nextDelayMs(failed = true)))
        // localCheckpoint truncates lineage: without it iteration i re-runs
        // all previous attempts' plans (exponential at scale). It sits
        // AFTER attempt so the next round's existence probe and the final
        // union both read the materialized attempt instead of re-running
        // it (attempt is the expensive side; the checkpointed set is only
        // the failing subset, so block-manager footprint stays small —
        // round 0 is deliberately NOT checkpointed because it spans the
        // full input).
        val next = retryWith(failed).withColumn("attempt", lit(i + 1))
        pending = attempt(next).localCheckpoint(eager = false)
        val roundDone = pending.filter(col("error").isNull)
        done = done.unionByName(roundDone)
        checkBuffer(roundDone)
        i += 1
      }
    }
    if (drained) done
    else done.unionByName(pending.filter(col("error").isNotNull))
  }
}
