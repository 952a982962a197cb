package graft.sources

import java.io.RandomAccessFile
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `tail -f` as a DataSource V2 micro-batch stream.
  *
  * Capability of the reference's `FileTailSource` (`FileTailSource.java:
  * 57,168` in akka/akka-stream-contrib): read a file from a starting
  * position, then keep polling for appended bytes, emitting chunks.
  *
  * Spark-first design: the stream offset IS the byte position (the direct
  * analog of the reference's `position` field, `FileTailSource.java:79`).
  * Each micro-batch covers `[start, end)` of the file; the range is split
  * into chunk-aligned input partitions so a huge append is read in
  * parallel. Exactly-once comes free from the offset log: on restart
  * Spark replays from the committed byte position.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.FileTailSource")
  *     .option("path", "/var/log/app.log")
  *     .option("maxChunkSize", "8192")
  *     .option("startingPosition", "0")
  *     .load()                      // schema: offset LONG, data BINARY
  * }}}
  * Poll cadence is the trigger interval (`Trigger.ProcessingTime`), the
  * analog of the reference's `pollingInterval`.
  */
class FileTailSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileTailSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FileTailTable(properties.get("path"),
      Option(properties.get("maxChunkSize")).map(_.toInt).getOrElse(8192),
      Option(properties.get("startingPosition")).map(_.toLong).getOrElse(0L),
      Option(properties.get("maxChunksPerTrigger")).map(_.toLong))
}

object FileTailSource {
  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("data", BinaryType, nullable = false)))
}

private[sources] class FileTailTable(path: String, maxChunkSize: Int, startingPosition: Long,
                                     maxChunksPerTrigger: Option[Long])
    extends Table with SupportsRead {
  require(path != null, "option 'path' is required")
  override def name(): String = s"file_tail($path)"
  override def schema(): StructType = FileTailSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = FileTailSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new FileTailStream(path, maxChunkSize, startingPosition, maxChunksPerTrigger)
    }
}

private[sources] case class BytePosition(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

private[sources] class FileTailStream(path: String, maxChunkSize: Int, startingPosition: Long,
                                      maxChunksPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = BytePosition(startingPosition)

  private def rawFileLength: Long = {
    val f = new java.io.File(path)
    math.max(if (f.exists()) f.length() else 0L, startingPosition)
  }

  // Trigger.AvailableNow contract: snapshot the end position once at
  // query start; every batch (even under admission control) stops there,
  // so the run drains deterministically and terminates even if the file
  // keeps growing underneath.
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(rawFileLength)

  private def fileLength: Long =
    availableNowCap.getOrElse(rawFileLength)

  override def latestOffset(): Offset = BytePosition(fileLength)

  /** Admission control — the TokenThrottle capability
    * (`TokenThrottle.scala:42-48` in akka/akka-stream-contrib): each
    * trigger admits at most `maxChunksPerTrigger` chunks' worth of bytes,
    * the micro-batch form of a token bucket (tokens = chunks per
    * trigger interval).
    */
  override def getDefaultReadLimit: ReadLimit =
    maxChunksPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[BytePosition].pos
    val len = fileLength
    limit match {
      case mr: ReadMaxRows =>
        BytePosition(math.min(len, s + mr.maxRows() * maxChunkSize))
      case _ => BytePosition(len)
    }
  }

  override def deserializeOffset(json: String): Offset = BytePosition(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BytePosition].pos
    val e = end.asInstanceOf[BytePosition].pos
    if (e <= s) return Array.empty
    // Chunk-aligned splits: at most 32 partitions per batch, each a
    // contiguous byte range, so one giant append parallelizes.
    val total = e - s
    val chunksTotal = (total + maxChunkSize - 1) / maxChunkSize
    val chunksPerPart = math.max(1L, chunksTotal / 32)
    val partBytes = chunksPerPart * maxChunkSize
    Iterator.iterate(s)(_ + partBytes).takeWhile(_ < e)
      .map(lo => FileRange(path, lo, math.min(lo + partBytes, e), maxChunkSize)
        : InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val FileRange(p, lo, hi, chunk) = partition.asInstanceOf[FileRange]
      new PartitionReader[InternalRow] {
        private val raf = new RandomAccessFile(p, "r")
        raf.seek(lo)
        private var pos = lo
        private var current: InternalRow = _
        override def next(): Boolean = {
          if (pos >= hi) return false
          val n = math.min(chunk.toLong, hi - pos).toInt
          val buf = new Array[Byte](n)
          raf.readFully(buf)
          current = InternalRow(pos, buf)
          pos += n
          true
        }
        override def get(): InternalRow = current
        override def close(): Unit = raf.close()
      }
    }
}

private[sources] case class FileRange(path: String, lo: Long, hi: Long, chunk: Int)
  extends InputPartition
