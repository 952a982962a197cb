package graft.operators

import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter, StreamingQuery, Trigger}
import java.util.concurrent.atomic.AtomicBoolean

/** Flow-control operators: valve, token-throttle, delay, interval-based
  * rate limiting.
  *
  * Reference capabilities (akka/akka-stream-contrib):
  *  - `Valve` (`Valve.scala:40-58`): externally pause/resume a stream.
  *  - `TokenThrottle` (`TokenThrottle.scala:42-48`): admit elements only
  *    while tokens are available.
  *  - `IntervalBasedRateLimiter` (`IntervalBasedRateLimiter.scala:28`):
  *    batches of ≤ maxBatchSize no more often than minInterval.
  *  - `DelayFlow` (`DelayFlow.scala:21,51`): per-element delay with
  *    fixed/linear-backoff strategies.
  *
  * In Spark these are control-plane, not data-plane: micro-batch triggers
  * and admission control ARE the rate-limiting machinery, so the honest
  * mapping configures them rather than delaying rows individually.
  */
object Control {

  /** Valve: pause stops the query (state lives in the checkpoint) and
    * resume restarts from the same checkpoint. Exactly-once sources make
    * this lossless — the Spark analog of a closed valve backpressuring.
    */
  final class Valve(start: () => StreamingQuery) {
    private var current: Option[StreamingQuery] = None
    private val open = new AtomicBoolean(false)
    def flipOpen(): StreamingQuery = synchronized {
      if (!open.getAndSet(true)) current = Some(start())
      current.get
    }
    def flipClosed(): Unit = synchronized {
      if (open.getAndSet(false)) { current.foreach(_.stop()); current = None }
    }
    def mode: String = if (open.get) "open" else "closed"
  }

  /** IntervalBasedRateLimiter: micro-batches of at most `maxBatch` units
    * no more often than `minIntervalMs`. `maxFilesPerTrigger` /
    * `maxOffsetsPerTrigger` are the per-source admission keys.
    */
  def intervalRateLimit[T](w: DataStreamWriter[T], minIntervalMs: Long): DataStreamWriter[T] =
    w.trigger(Trigger.ProcessingTime(minIntervalMs))

  def throttleFiles(r: DataStreamReader, maxFilesPerTrigger: Int): DataStreamReader =
    r.option("maxFilesPerTrigger", maxFilesPerTrigger)

  /** DelayFlow strategies for driver-side retry pacing (the reference's
    * documented use is backoff between retries, `DelayFlow.scala:36-47`).
    */
  trait DelayStrategy { def nextDelayMs(failed: Boolean): Long }
  final class FixedDelay(ms: Long) extends DelayStrategy {
    def nextDelayMs(failed: Boolean): Long = ms
  }
  /** Grows by `stepMs` per consecutive failure, resets on success — the
    * reference's `linearIncreasingDelay` (`DelayFlow.scala:74-102`).
    */
  final class LinearIncreasingDelay(stepMs: Long, maxMs: Long) extends DelayStrategy {
    private var n = 0L
    def nextDelayMs(failed: Boolean): Long = {
      n = if (failed) n + 1 else 0
      math.min(n * stepMs, maxMs)
    }
  }
}
