package graft.sources

import java.io.File
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Directory-watch as a DataSource V2 micro-batch stream.
  *
  * Capability of the reference's `DirectoryChanges`
  * (`DirectoryChanges.java:60,215` in akka/akka-stream-contrib): watch a
  * directory, emit (path, Creation|Modification|Deletion) events.
  *
  * Spark-first design: instead of a JDK WatchService (driver-bound,
  * overflow-prone — the reference fails the stage on overflow,
  * `DirectoryChanges.java:152`), the OFFSET is a snapshot of the
  * directory listing (name → mtime:size). Each micro-batch diffs two
  * snapshots into Creation/Modification/Deletion rows. Because the
  * snapshot is serialized into Spark's offset log, restart recovery
  * reconstructs the diff base exactly — no missed or duplicated events,
  * which a WatchService cannot guarantee.
  *
  * Schema: path STRING, change STRING, mtime LONG, size LONG.
  */
class DirectoryChangesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DirectoryChangesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DirChangesTable(properties.get("path"))
}

object DirectoryChangesSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("change", StringType, nullable = false),
    StructField("mtime", LongType, nullable = false),
    StructField("size", LongType, nullable = false)))

  /** name → "mtime:size" snapshot of the directory's regular files. */
  def snapshot(dir: String): Map[String, String] = {
    val d = new File(dir)
    val fs = Option(d.listFiles()).getOrElse(Array.empty[File])
    fs.filter(_.isFile).map(f => f.getName -> s"${f.lastModified()}:${f.length()}").toMap
  }

  def diff(prev: Map[String, String], cur: Map[String, String],
           dir: String): Seq[(String, String, Long, Long)] = {
    def parse(v: String): (Long, Long) = {
      val Array(m, s) = v.split(":"); (m.toLong, s.toLong)
    }
    val created = (cur.keySet -- prev.keySet).toSeq.sorted.map { n =>
      val (m, s) = parse(cur(n)); (s"$dir/$n", "Creation", m, s)
    }
    val deleted = (prev.keySet -- cur.keySet).toSeq.sorted.map { n =>
      val (m, s) = parse(prev(n)); (s"$dir/$n", "Deletion", m, s)
    }
    val modified = cur.keySet.intersect(prev.keySet).toSeq.sorted
      .filter(n => cur(n) != prev(n)).map { n =>
        val (m, s) = parse(cur(n)); (s"$dir/$n", "Modification", m, s)
      }
    created ++ modified ++ deleted
  }
}

private[sources] class DirChangesTable(path: String) extends Table with SupportsRead {
  require(path != null, "option 'path' is required")
  override def name(): String = s"directory_changes($path)"
  override def schema(): StructType = DirectoryChangesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = DirectoryChangesSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new DirChangesStream(path)
    }
}

/** Offset = the full snapshot (JSON map name → "mtime:size"). */
private[sources] case class DirSnapshot(files: Map[String, String]) extends Offset {
  override def json(): String =
    files.toSeq.sorted
      .map { case (k, v) => s""""${k.replace("\"", "\\\"")}":"$v"""" }
      .mkString("{", ",", "}")
}

private[sources] object DirSnapshot {
  private val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"([^"]*)"""".r
  def fromJson(json: String): DirSnapshot =
    DirSnapshot(entry.findAllMatchIn(json)
      .map(m => m.group(1).replace("\\\"", "\"") -> m.group(2)).toMap)
}

private[sources] class DirChangesStream(path: String) extends MicroBatchStream {
  override def initialOffset(): Offset = DirSnapshot(Map.empty)
  override def latestOffset(): Offset = DirSnapshot(DirectoryChangesSource.snapshot(path))
  override def deserializeOffset(json: String): Offset = DirSnapshot.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val prev = start.asInstanceOf[DirSnapshot].files
    val cur = end.asInstanceOf[DirSnapshot].files
    val events = DirectoryChangesSource.diff(prev, cur, path)
    if (events.isEmpty) Array.empty else Array(DirEventsPartition(events))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val events = partition.asInstanceOf[DirEventsPartition].events
      new PartitionReader[InternalRow] {
        private val it = events.iterator
        private var current: InternalRow = _
        override def next(): Boolean = {
          if (!it.hasNext) return false
          val (p, c, m, s) = it.next()
          current = InternalRow(UTF8String.fromString(p), UTF8String.fromString(c), m, s)
          true
        }
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
}

private[sources] case class DirEventsPartition(events: Seq[(String, String, Long, Long)])
  extends InputPartition
