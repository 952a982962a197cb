package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Write-side scale hygiene. Reading 100 TB well is half the job; the
  * other half is not producing a pathological layout while writing it.
  *
  * `writePartitionedParquet` encodes the rules:
  *  - `partitionBy` on low-cardinality columns → partition pruning for
  *    every downstream reader (the write-side dual of PushedFilters);
  *  - `maxRecordsPerFile` bounds file size (no 100 GB files that defeat
  *    task parallelism, no OOM on the writer);
  *  - repartition on the partition columns first, so each task writes to
  *    few partitions (the default — every task writing every partition —
  *    produces smallFiles × tasks explosion);
  *  - optional sort within partitions for run-length/dictionary-friendly
  *    column layout (better compression + rowgroup skipping).
  */
object Sinks {

  /** Compact a parquet directory's small files into ~`targetFileMB`
    * files. Small-file sprawl (streaming sinks, over-parallel writers)
    * taxes every later scan with per-file open cost and driver-side
    * listing; periodic compaction is standard table maintenance. Output
    * file count = ceil(bytes / target); rewrite goes through a temp dir
    * then swaps, so a crash leaves the original intact.
    */
  def compactParquet(df: DataFrame, path: String, targetFileMB: Int = 256): Unit = {
    val spark = df.sparkSession
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hadoopPath).getLength
    val nFiles = math.max(1L, (bytes + targetFileMB.toLong * 1048576 - 1) /
      (targetFileMB.toLong * 1048576)).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(hadoopPath, true)
    fs.rename(tmp, hadoopPath)
  }

  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String],
                              maxRecordsPerFile: Long = 5000000L,
                              sortCols: Seq[Column] = Nil): Unit = {
    val arranged = {
      val base =
        if (partitionCols.nonEmpty)
          df.repartition(partitionCols.map(df.col): _*)
        else df
      if (sortCols.nonEmpty) base.sortWithinPartitions(sortCols: _*) else base
    }
    val writer = arranged.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
  }
}
