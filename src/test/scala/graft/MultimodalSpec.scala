package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("extractFeatures keeps one row per record with a fixed-dim unit-sum vector") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(100)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val feats = Multimodal.extractFeatures(docs, col("doc_id"), col("payload"), dim = 16)
    assert(feats.columns.toSeq == Seq("media_id", "n_bytes", "features"))
    assert(feats.count() == docs.count())
    val rows = feats.as[(Long, Long, Array[Float])].collect()
    assert(rows.forall(_._3.length == 16))
    // histogram of a non-empty payload is a probability vector
    assert(rows.filter(_._2 > 0).forall(r => math.abs(r._3.sum - 1.0f) < 1e-3))
  }

  test("extractHistogram counts every payload byte into its bucket") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(100)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val h = Multimodal.extractHistogram(docs, col("doc_id"), col("payload"), dim = 16)
    assert(h.columns.toSeq == Seq("media_id", "n_bytes", "hist"))
    val rows = h.as[(Long, Long, Array[Long])].collect()
    assert(rows.forall(_._3.length == 16))
    // counts partition the payload exactly: sum == byte length
    assert(rows.forall(r => r._3.sum == r._2))
  }

  test("extractFeatures initializes the codec once per partition, not per row") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(200)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .repartition(4)
    Multimodal.codecInits.set(0)
    Multimodal.extractFeatures(docs, col("doc_id"), col("payload")).count()
    val inits = Multimodal.codecInits.get()
    assert(inits <= 8, s"codec constructed $inits times for 4 partitions") // AQE may retry/split
    assert(inits >= 1)
  }

  test("extractFeatures output feeds the similarity operators") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(50)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val feats = Multimodal.extractFeatures(docs, col("doc_id"), col("payload"))
    val topk = graft.similarity.SimilaritySearch.bruteForceTopK(
      feats, col("media_id"), col("features"),
      feats.filter(col("media_id") < 3), col("media_id"), col("features"), k = 2)
    val got = topk.collect()
    assert(got.nonEmpty && got.forall(_.getAs[Long]("rank") <= 2))
  }

  test("resizeStub bounds the payload and recomputes meta") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(50)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val r = Multimodal.resizeStub(docs, col("doc_id"), col("payload"), 16, 8)
    val rows = r.collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val nIn = row.getAs[Long]("n_bytes_in")
      val nOut = row.getAs[Long]("n_bytes_out")
      assert(nOut == math.min(nIn, 128L))
      assert(row.getAs[Array[Byte]]("resized").length == nOut)
      assert(row.getAs[Long]("width") == 16L && row.getAs[Long]("height") == 8L)
    }
  }

  test("sampleFrames emits bounded, indexed frame rows") {
    val df = Seq((1L, Array.fill[Byte](100)(7)), (2L, Array.emptyByteArray))
      .toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(df, col("media_id"), col("payload"), maxFrames = 3)
    val byId = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
      max("frame_idx").as("mx")).collect().map(r =>
      r.getAs[Long]("media_id") -> (r.getAs[Long]("n"), r.getAs[Int]("mx"))).toMap
    assert(byId(1L)._1 == 1L) // 100 % 10 + 1 = 1 frame
    assert(byId(2L)._1 == 1L) // empty payload still yields 1 (index 0) frame
    assert(frames.filter(col("frame_idx") < 0).count() == 0)
  }

  test("perceptualHashGroups collides same-content media and elects min id") {
    // docs 1 and 2 are byte PERMUTATIONS (identical content histogram,
    // different bytes — exact dedup would keep both); doc 3 differs
    val docs = Seq((1L, "aabbcc"), (2L, "ccbbaa"), (3L, "zzzzzzzz"))
      .toDF("id", "text")
    val out = graft.multimodal.Multimodal.perceptualHashGroups(
        docs, col("id"), col("text").cast("binary"))
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // 'a'→bucket 1, 'b'→2, 'c'→3 (2 each, all ≥ mean): code = 0b1110
    assert(out(0) == (1L, 14L, 1L, true))
    assert(out(1) == (2L, 14L, 1L, false)) // permutation collides, loses election
    assert(out(2) == (3L, 1024L, 3L, true)) // 'z'→bucket 10 only
  }
}
