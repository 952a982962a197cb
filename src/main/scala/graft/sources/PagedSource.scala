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

/** Paged-API unfold as a DataSource V2 micro-batch stream.
  *
  * Capability of the reference's `PagedSource` (`PagedSource.scala:40` in
  * akka/akka-stream-contrib): start from a first key, fetch
  * `Page(items, nextKey)`, flatten the items, stop when `nextKey` is
  * empty.
  *
  * Spark-first design: the stream OFFSET is the page key — `latestOffset`
  * advances one page per trigger, `planInputPartitions(start, end)`
  * fetches the pages in `[start, end)`. Page fetchers are registered
  * driver-side by name (DSv2 instantiates providers reflectively, so
  * closures travel via the registry; at cluster scale the fetch runs on
  * the driver, which matches the sequential nature of a keyed page walk —
  * the parallelism is downstream).
  *
  * Schema: page_key LONG, item STRING.
  */
class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedTable(properties.get("fetcher"),
      Option(properties.get("firstKey")).map(_.toLong).getOrElse(0L))
}

object PagedSource {
  val schema: StructType = StructType(Seq(
    StructField("page_key", LongType, nullable = false),
    StructField("item", StringType, nullable = false)))

  /** A fetched page: items plus the next key (None = end of stream). */
  case class Page(items: Seq[String], nextKey: Option[Long])

  private val fetchers = new ConcurrentHashMap[String, Long => Page]()

  /** Register a page fetcher under a name referenced by option
    * `fetcher`. The reference takes `K => Future[Page[T, K]]`; blocking
    * here is fine — the fetch happens on the driver between batches.
    */
  def register(name: String, fetch: Long => Page): Unit = fetchers.put(name, fetch)

  private[sources] def fetcher(name: String): Long => Page = {
    val f = fetchers.get(name)
    require(f != null, s"no paged fetcher registered under '$name'")
    f
  }
}

private[sources] class PagedTable(fetcherName: String, firstKey: Long)
    extends Table with SupportsRead {
  require(fetcherName != null, "option 'fetcher' is required")
  override def name(): String = s"paged($fetcherName)"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = PagedSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PagedStream(fetcherName, firstKey)
    }
}

/** Offset: the next page key to fetch, or -1 when exhausted. */
private[sources] case class PageKey(key: Long) extends Offset {
  override def json(): String = key.toString
}

private[sources] class PagedStream(fetcherName: String, firstKey: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  private def fetch = PagedSource.fetcher(fetcherName)
  // pages fetched between latestOffset calls, keyed by page key
  private val cache = new ConcurrentHashMap[Long, PagedSource.Page]()

  override def initialOffset(): Offset = PageKey(firstKey)

  // Admission control: advance exactly one page per trigger FROM THE
  // ENGINE-PROVIDED start offset (the committed position). Deriving the
  // cursor from `startOffset` instead of instance state makes restart
  // exact — a re-instantiated stream resumes from the checkpointed
  // offset, never behind it (a private cursor seeded at firstKey would
  // re-emit every page after the committed point on restart).
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val s = startOffset.asInstanceOf[PageKey].key
    if (s == -1L) return PageKey(-1L)
    val page = cache.computeIfAbsent(s, k => fetch(k))
    PageKey(page.nextKey.getOrElse(-1L))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used via SupportsAdmissionControl")

  override def commit(end: Offset): Unit = ()

  override def deserializeOffset(json: String): Offset = PageKey(json.toLong)
  override def stop(): Unit = cache.clear()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageKey].key
    val e = end.asInstanceOf[PageKey].key
    if (s == e || s == -1L) return Array.empty
    // walk pages from s, following nextKey, until e (exclusive) or end
    val rows = Seq.newBuilder[(Long, String)]
    var k = s
    var done = false
    while (!done) {
      val p = cache.computeIfAbsent(k, kk => fetch(kk))
      rows ++= p.items.map(i => (k, i))
      p.nextKey match {
        case Some(nk) if nk != e => k = nk
        case _ => done = true
      }
    }
    val out = rows.result()
    if (out.isEmpty) Array.empty else Array(PageRowsPartition(out))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition.asInstanceOf[PageRowsPartition].rows
      new PartitionReader[InternalRow] {
        private val it = rows.iterator
        private var current: InternalRow = _
        override def next(): Boolean = {
          if (!it.hasNext) return false
          val (k, i) = it.next()
          current = InternalRow(k, UTF8String.fromString(i))
          true
        }
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
}

private[sources] case class PageRowsPartition(rows: Seq[(Long, String)])
  extends InputPartition
