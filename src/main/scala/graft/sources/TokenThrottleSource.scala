package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Dynamic token-bucket throttled source (DSv2).
  *
  * Capability of the reference's `TokenThrottle`
  * (`TokenThrottle.scala:42-48,79-91` in akka/akka-stream-contrib): an
  * element is emitted only when the bucket holds at least
  * `costCalculation(elem)` tokens, and tokens arrive DYNAMICALLY on a
  * second stream — not a static per-trigger cap.
  *
  * Spark-first mapping: the token stream becomes a driver-side
  * [[TokenThrottleSource.TokenFeed]] consulted by
  * `SupportsAdmissionControl.latestOffset(start, limit)` — Spark's
  * admission-control hook IS the token gate. Each batch-planning call
  * walks the pending items from the committed offset and admits an item
  * only while the feed can pay its cost; the offset advances exactly as
  * far as tokens allow, so per-trigger admitted counts track the feed.
  * The arbitration runs on the driver, which is faithful to the
  * reference: its token inlet is a single coordination point too — the
  * PARALLELISM is downstream of admission, not in it.
  *
  * Fault tolerance: a replayed batch re-reads the offset range from the
  * checkpoint WAL without calling `latestOffset`, so tokens are consumed
  * exactly once per admitted item. Tokens live in driver memory (like the
  * reference's in-flight token count); on restart, unconsumed tokens must
  * be re-fed by the producer, matching the reference where an unread
  * token stream is replayed from its source.
  *
  * Schema: `idx LONG, item STRING`.
  */
class TokenThrottleSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TokenThrottleSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TokenThrottleTable(properties.get("items"), properties.get("tokens"))
}

object TokenThrottleSource {
  val schema: StructType = StructType(Seq(
    StructField("idx", LongType, nullable = false),
    StructField("item", StringType, nullable = false)))

  /** A runtime-updatable token bucket. `add` is called by the
    * token-producing side (the reference's token source); the stream
    * drains it at batch-planning time.
    */
  final class TokenFeed {
    private var tokens = 0L
    def add(n: Long): Unit = synchronized { tokens += n }
    def available: Long = synchronized { tokens }
    private[sources] def tryTake(n: Long): Boolean = synchronized {
      if (tokens >= n) { tokens -= n; true } else false
    }
  }

  private val items = new ConcurrentHashMap[String, IndexedSeq[String]]()
  private val feeds = new ConcurrentHashMap[String, TokenFeed]()
  private val costs = new ConcurrentHashMap[String, String => Long]()

  /** Register the item sequence the stream emits, its token feed, and
    * (optionally) the reference's `costCalculation` — tokens consumed per
    * item (default 1).
    */
  def register(name: String, elems: IndexedSeq[String],
               cost: String => Long = _ => 1L): TokenFeed = {
    items.put(name, elems)
    costs.put(name, cost)
    val feed = new TokenFeed
    feeds.put(name, feed)
    feed
  }

  private[sources] def itemsFor(name: String): IndexedSeq[String] = {
    val xs = items.get(name); require(xs != null, s"no items registered under '$name'"); xs
  }
  private[sources] def feedFor(name: String): TokenFeed = {
    val f = feeds.get(name); require(f != null, s"no token feed registered under '$name'"); f
  }
  private[sources] def costFor(name: String): String => Long = costs.get(name)
}

private[sources] class TokenThrottleTable(itemsName: String, feedName: String)
    extends Table with SupportsRead {
  require(itemsName != null, "option 'items' is required")
  require(feedName != null, "option 'tokens' is required")
  override def name(): String = s"tokenThrottle($itemsName)"
  override def schema(): StructType = TokenThrottleSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = TokenThrottleSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new TokenThrottleStream(itemsName, feedName)
    }
}

/** Offset: number of items admitted so far. */
private[sources] case class ItemIndex(idx: Long) extends Offset {
  override def json(): String = idx.toString
}

private[sources] class TokenThrottleStream(itemsName: String, feedName: String)
    extends MicroBatchStream with SupportsAdmissionControl {
  private def elems = TokenThrottleSource.itemsFor(itemsName)
  private def feed = TokenThrottleSource.feedFor(feedName)
  private def cost = TokenThrottleSource.costFor(itemsName)

  override def initialOffset(): Offset = ItemIndex(0L)

  // The token gate: admit items from the committed start while the feed
  // can pay each item's cost. Element order is preserved (the reference
  // blocks on the FIRST unaffordable element; it does not skip ahead).
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val xs = elems
    var i = startOffset.asInstanceOf[ItemIndex].idx
    while (i < xs.length && feed.tryTake(cost(xs(i.toInt)))) i += 1
    ItemIndex(i)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used via SupportsAdmissionControl")

  override def commit(end: Offset): Unit = ()
  override def deserializeOffset(json: String): Offset = ItemIndex(json.toLong)
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ItemIndex].idx
    val e = end.asInstanceOf[ItemIndex].idx
    if (e <= s) return Array.empty
    Array(ItemSlice(elems.slice(s.toInt, e.toInt).zipWithIndex
      .map { case (x, j) => (s + j, x) }))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition.asInstanceOf[ItemSlice].rows
      new PartitionReader[InternalRow] {
        private val it = rows.iterator
        private var current: InternalRow = _
        override def next(): Boolean = {
          if (!it.hasNext) return false
          val (i, x) = it.next()
          current = InternalRow(i, UTF8String.fromString(x))
          true
        }
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
}

private[sources] case class ItemSlice(rows: IndexedSeq[(Long, String)])
  extends InputPartition
