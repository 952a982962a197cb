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

  test("ImageCodec PNG encode→decode round-trips every pixel (lossless)") {
    import graft.multimodal.ImageCodec
    val codec = new ImageCodec.Codec
    val seed = 5L
    val w = ImageCodec.SyntheticImages.widthOf(seed)
    val h = ImageCodec.SyntheticImages.heightOf(seed)
    val png = codec.encodeGrayPng(w, h, k => ImageCodec.SyntheticImages.pixelAt(seed, k))
    // real PNG bytes: magic header present
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val back = codec.decodeGray(png)
    assert(back.width == w && back.height == h)
    assert(back.pixels.toSeq ==
      (0 until w * h).map(k => ImageCodec.SyntheticImages.pixelAt(seed, k.toLong)))
  }

  test("ImageCodec decodes non-gray payloads by folding to luminance") {
    import graft.multimodal.ImageCodec
    val codec = new ImageCodec.Codec
    val rgb = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(y => (0 until 4).foreach(x =>
      rgb.setRGB(x, y, new java.awt.Color(120, 120, 120).getRGB)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", bos)
    val im = codec.decodeGray(bos.toByteArray)
    assert(im.width == 4 && im.height == 4)
    // uniform gray-ish input: every folded pixel equals the same value
    assert(im.pixels.distinct.length == 1 && im.pixels.head > 0)
  }

  test("ImageCodec decodeMeta over the PNG fixture matches the pixel formula") {
    import graft.multimodal.ImageCodec
    import ImageCodec.SyntheticImages._
    val docs = Tables.documents(spark, TestSpark.sf).limit(40)
    val meta = ImageCodec.decodeMeta(
        pngFixture(docs, col("doc_id")), col("media_id"), col("payload"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(meta.size == 40)
    meta.foreach { case (mid, (w, h, np, sum)) =>
      val seed = seedOf(mid)
      assert(w == widthOf(seed) && h == heightOf(seed) && np == w * h)
      assert(sum == (0L until np).map(pixelAt(seed, _).toLong).sum)
    }
  }

  test("ImageCodec resize pins the decode→resample→encode→decode chain") {
    import graft.multimodal.ImageCodec
    import ImageCodec.SyntheticImages._
    val docs = Tables.documents(spark, TestSpark.sf).limit(20)
    val out = ImageCodec.resize(
        pngFixture(docs, col("doc_id")), col("media_id"), col("payload"),
        targetW = 8, targetH = 6)
      .collect()
    assert(out.length == 20)
    out.foreach { r =>
      val mid = r.getAs[Long]("media_id")
      val seed = seedOf(mid)
      val (w, h) = (widthOf(seed), heightOf(seed))
      val expect = (0 until 48).map { c =>
        val sy = (c / 8) * h / 6
        val sx = (c % 8) * w / 8
        pixelAt(seed, (sy * w + sx).toLong).toLong
      }.sum
      assert(r.getAs[Long]("width") == 8 && r.getAs[Long]("height") == 6)
      assert(r.getAs[Long]("n_pixels") == 48)
      assert(r.getAs[Long]("pix_sum") == expect)
      assert(r.getAs[Long]("n_bytes_out") > 0)
    }
  }

  test("ImageCodec aHash election collides seed-identical images and elects min id") {
    import graft.multimodal.ImageCodec
    // ids 1, 17, 33 share seed 1 → byte-identical PNGs; id 2 differs
    val docs = Seq(1L, 17L, 33L, 2L).toDF("doc_id")
    val out = ImageCodec.perceptualHashGroups(
        ImageCodec.SyntheticImages.pngFixture(docs, col("doc_id")),
        col("media_id"), col("payload"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("keeper_id"), r.getAs[Boolean]("kept"),
         r.getAs[Long]("group_size"))).toMap
    assert(out(1L) == (1L, true, 3L))
    assert(out(17L) == (1L, false, 3L))
    assert(out(33L) == (1L, false, 3L))
    assert(out(2L)._2)
    // codes are the textbook 64-cell form
    val code = ImageCodec.aHashCodes(
        ImageCodec.SyntheticImages.pngFixture(docs, col("doc_id")),
        col("media_id"), col("payload"))
      .filter(col("media_id") === 1L).collect().head.getAs[String]("phash")
    assert(code.length == 64 && code.forall(c => c == '0' || c == '1'))
  }

  test("ImageCodec sampleFrames parses the container and decodes real frames") {
    import graft.multimodal.ImageCodec
    import ImageCodec.{SyntheticImages => SI, SyntheticVideos => SV}
    val docs = Seq(0L, 1L, 2L, 5L).toDF("doc_id") // seeds 0(n=2) 1(n=3) 2(n=4) 5(n=4)
    val rows = ImageCodec.sampleFrames(
        SV.containerFixture(docs, col("doc_id")),
        col("media_id"), col("payload"), maxFrames = 3)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx")) ->
        r.getAs[Long]("pix_sum")).toMap
    // n=2 → frames 0,1; n=3 → 0,1,2; n=4 → 0,1,2 (t·n/s evenly spaced)
    assert(rows.keySet == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L), (1L, 2L),
      (2L, 0L), (2L, 1L), (2L, 2L), (5L, 0L), (5L, 1L), (5L, 2L)))
    rows.foreach { case ((mid, fi), sum) =>
      val seed = SI.seedOf(mid)
      val np = SI.widthOf(seed) * SI.heightOf(seed)
      assert(sum == (0L until np).map(SV.framePixelAt(seed, _, fi).toLong).sum)
    }
  }

  test("ImageCodec constructs once per partition (the amortization contract)") {
    import graft.multimodal.ImageCodec
    val docs = Tables.documents(spark, TestSpark.sf).limit(200)
      .select(col("doc_id")).repartition(4)
    Multimodal.codecInits.set(0)
    ImageCodec.decodeMeta(
      ImageCodec.SyntheticImages.pngFixture(docs, col("doc_id")),
      col("media_id"), col("payload")).count()
    val inits = Multimodal.codecInits.get()
    // fixture encode pass + decode pass, 4 partitions each; AQE may retry
    assert(inits >= 2 && inits <= 16, s"codec constructed $inits times")
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

  test("phashNearDedup dominates within-tolerance code groups, exact groups unchanged") {
    import graft.multimodal.ImageCodec
    // 2 media per fixture seed (ids 0..31, seed = id % 16). The 16
    // fixture codes have min pairwise Hamming 6: seeds 6↔14 at 6 and
    // 5↔14 at 7 — at maxDist=7 exactly seed 14's group is dominated
    // (both neighbors carry smaller keepers), everything else keeps
    // its exact-election result.
    val docs = spark.range(32).toDF("doc_id")
    val out = ImageCodec.phashNearDedup(
        ImageCodec.SyntheticImages.pngFixture(docs, col("doc_id")),
        col("media_id"), col("payload"), maxDist = 7, bands = 8)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(3), r.getLong(4), r.getBoolean(5)))
    assert(out.length == 32)
    assert(out.forall(_._3 == 2L)) // every code group holds its 2 seed-copies
    val dominatedIds = out.filter(_._4).map(_._1).toSet
    assert(dominatedIds == Set(14L, 30L), s"got $dominatedIds")
    val keptIds = out.filter(_._2).map(_._1).toSet
    assert(keptIds == ((0L until 16L).toSet - 14L), s"got $keptIds")
    // tighter tolerance (min fixture distance is 6): nothing dominates,
    // the election degenerates to the exact p56 result
    val exact = ImageCodec.phashNearDedup(
        ImageCodec.SyntheticImages.pngFixture(docs, col("doc_id")),
        col("media_id"), col("payload"), maxDist = 5, bands = 8)
      .collect()
    assert(exact.forall(!_.getBoolean(5)))
    assert(exact.filter(_.getBoolean(3)).map(_.getLong(0)).toSet == (0L until 16L).toSet)
  }

  test("HammingBits counts differing positions and fails loudly on length mismatch") {
    import graft.functions.HammingBits
    val df = Seq(("0110", "0101"), ("1111", "1111")).toDF("a", "b")
    val d = df.select(HammingBits(col("a"), col("b"))).collect().map(_.getInt(0))
    assert(d.toSeq == Seq(2, 0))
    val e = intercept[Exception] {
      Seq(("01", "010")).toDF("a", "b")
        .select(HammingBits(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("WAV codec: s16 round-trip, chunk-walk past foreign chunks, loud on non-PCM") {
    import graft.multimodal.AudioCodec.Wav
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 8)
    val bytes = Wav.encodeS16(8000, samples)
    assert(bytes.length == 44 + samples.length * 2)
    val (rate, back) = Wav.decodeS16(bytes)
    assert(rate == 8000 && back.toSeq == samples.toSeq)
    // a real WAV may carry a LIST chunk before data: splice one in and
    // the chunk walk must skip it (odd-length body → word-aligned pad)
    val listBody = Array[Byte]('I', 'N', 'F', 'O', 7)
    val spliced = bytes.take(36) ++
      "LIST".getBytes("US-ASCII") ++
      Array[Byte]((listBody.length & 0xff).toByte, 0, 0, 0) ++
      listBody ++ Array[Byte](0) ++ bytes.drop(36)
    val (rate2, back2) = Wav.decodeS16(spliced)
    assert(rate2 == 8000 && back2.toSeq == samples.toSeq)
    // stereo / float / truncated payloads fail loudly, never decode
    val stereo = bytes.clone(); stereo(22) = 2 // channels field
    assert(intercept[IllegalArgumentException] {
      Wav.decodeS16(stereo)
    }.getMessage.contains("mono"))
    assert(intercept[IllegalArgumentException] {
      Wav.decodeS16("RIFFxxxxJUNK".getBytes("US-ASCII"))
    }.getMessage.contains("RIFF/WAVE"))
  }

  test("audioStats silence/clip edges: all-silent trims to (n, 0); synthetic formula pins decode") {
    import graft.multimodal.AudioCodec
    import graft.multimodal.AudioCodec.{SyntheticAudio, Wav}
    val silent = (10L, Wav.encodeS16(8000, Array.fill[Short](5)(100)))
    val loudMid = (11L, Wav.encodeS16(8000,
      Array[Short](0, 0, 9000, 16000, 0)))
    val df = Seq(silent, loudMid).toDF("media_id", "payload")
    val out = AudioCodec.audioStats(df, col("media_id"), col("payload"))
      .orderBy(col("media_id")).collect()
    // all-silent: lead = n, trail = 0 (one cut, not two)
    assert(out(0).getAs[Long]("lead_silence") == 5L &&
      out(0).getAs[Long]("trail_silence") == 0L &&
      out(0).getAs[Long]("n_clipped") == 0L)
    // loud middle: 2 leading + 1 trailing silent, one clipped sample
    assert(out(1).getAs[Long]("lead_silence") == 2L &&
      out(1).getAs[Long]("trail_silence") == 1L &&
      out(1).getAs[Long]("n_clipped") == 1L &&
      out(1).getAs[Long]("peak") == 16000L)
    // the fixture's decoded samples equal the formula (local recompute)
    val fixture = SyntheticAudio.wavFixture(
      Tables.documents(spark, TestSpark.sf).limit(20), col("doc_id"))
    fixture.collect().foreach { r =>
      val mid = r.getLong(0)
      val (rate, got) = Wav.decodeS16(r.getAs[Array[Byte]](1))
      val seed = SyntheticAudio.seedOf(mid)
      assert(rate == SyntheticAudio.sampleRate)
      assert(got.toSeq == (0 until SyntheticAudio.nSamplesOf(seed))
        .map(k => SyntheticAudio.sampleAt(seed, k).toShort))
    }
  }

  /** The 48×32 smooth-gradient source behind the COMMITTED
    * src/test/resources/graft/jpeg_fixture.jpg (generated once at
    * quality 0.9 and checked in — lossy decode breaks formula duality,
    * so JPEG pins run on fixed bytes, not oracle duals).
    */
  private def jpegSourcePixel(k: Int): Int = {
    val (w, h) = (48, 32)
    val x = k % w; val y = k / w
    val v = x * 255 / (w - 1) + y * 64 / (h - 1) +
      (32 * math.sin(x / 8.0)).toInt
    v.max(0).min(255)
  }

  test("ImageCodec decodes the committed JPEG fixture to exact pinned stats") {
    import graft.multimodal.ImageCodec
    val bytes = {
      val in = getClass.getResourceAsStream("/graft/jpeg_fixture.jpg")
      assert(in != null, "committed fixture missing")
      try in.readAllBytes() finally in.close()
    }
    assert(bytes.length == 520) // the committed bytes, not a re-encode
    assert((bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xD8) // JFIF SOI
    val codec = new ImageCodec.Codec
    val im = codec.decodeGray(bytes)
    assert(im.width == 48 && im.height == 32)
    // EXACT decoded-luminance pin on the committed bytes — the decode
    // path is deterministic for fixed input
    assert(im.pixels.map(_.toLong).sum == 242276L)
    // lossy but close: the decode tracks the source formula within a
    // small mean error on this JPEG-friendly smooth content
    val meanAbs = im.pixels.zipWithIndex
      .map { case (p, k) => math.abs(p - jpegSourcePixel(k)) }.sum.toDouble /
      im.pixels.length
    assert(meanAbs < 4.0, s"mean abs err $meanAbs")
    // the ranked kernels agree with the source image at the hash
    // level: aHash of the decoded JPEG sits within a small Hamming
    // distance of the lossless source's
    val png = codec.encodeGrayPng(48, 32, jpegSourcePixel)
    val hJpeg = codec.aHash64(im)
    val hPng = codec.aHash64(codec.decodeGray(png))
    val dist = hJpeg.zip(hPng).count { case (a, b) => a != b }
    assert(dist <= 4, s"aHash Hamming distance $dist")
    // decodeMeta (the operator path) reports the same pinned stats
    val row = ImageCodec.decodeMeta(
        Seq((9L, bytes)).toDF("media_id", "payload"),
        col("media_id"), col("payload"))
      .collect()(0)
    assert((row.getLong(1), row.getLong(2), row.getLong(4)) ==
      ((48L, 32L, 242276L)))
  }

  test("mixed PNG+JPEG payloads flow through the image operators and near-dedup together") {
    import graft.multimodal.ImageCodec
    val codec = new ImageCodec.Codec
    val (w, h) = (64, 64)
    def smooth(k: Int): Int = {
      val x = k % w; val y = k / w
      (x * 2 + y + (24 * math.sin(y / 9.0)).toInt).max(0).min(255)
    }
    val png = codec.encodeGrayPng(w, h, smooth)
    val jpg = codec.encodeGrayJpeg(w, h, smooth)
    val other = codec.encodeGrayPng(w, h, k => 255 - smooth(k))
    // encode→decode tolerance: dims exact, luminance close
    val back = codec.decodeGray(jpg)
    assert(back.width == w && back.height == h)
    val meanAbs = back.pixels.zipWithIndex
      .map { case (p, k) => math.abs(p - smooth(k)) }.sum.toDouble / (w * h)
    assert(meanAbs < 4.0, s"mean abs err $meanAbs")
    // ONE payload column mixing containers: every operator decodes via
    // format auto-detection; no format flag anywhere in the API
    val media = Seq((1L, png), (2L, jpg), (3L, other))
      .toDF("media_id", "payload")
    val meta = ImageCodec.decodeMeta(media, col("media_id"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(meta == Map(1L -> 4096L, 2L -> 4096L, 3L -> 4096L))
    // near-dedup pairs the SAME image across formats (p80's machinery,
    // unchanged) and keeps the distinct image apart
    val dd = ImageCodec.phashNearDedup(media, col("media_id"),
        col("payload"), maxDist = 7)
      .select(col("media_id"), col("keeper_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dd(1L) == 1L && dd(2L) == 1L, s"cross-format pair: $dd")
    assert(dd(3L) == 3L, s"distinct content stays: $dd")
  }

  test("requireRealDecode: stub-tier kinds cannot flow into real-DSP operators") {
    import graft.multimodal.{ImageCodec, Multimodal}
    val codec = new ImageCodec.Codec
    val png = codec.encodeGrayPng(4, 4, k => k * 16)
    // real kinds pass through unchanged (rows AND values)
    val ok = Seq((1L, "image", png), (2L, "audio", png))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.requireRealDecode(ok, col("kind"), "spec")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // a FakeCodec-backed kind RAISES, naming the stub tier — even when
    // the gate output is only counted (the filter cannot be pruned)
    for (bad <- Seq("video", "audio/mp3", "AUDIO/OPUS")) {
      val mixed = ok.unionByName(
        Seq((3L, bad, png)).toDF("media_id", "kind", "payload"))
      val e = intercept[Exception] {
        TestSpark.quietly(
          Multimodal.requireRealDecode(mixed, col("kind"), "p110_audio_stats")
            .count())
      }
      assert(e.getMessage.contains("FakeCodec"), s"kind $bad: ${e.getMessage}")
      assert(e.getMessage.contains("p110_audio_stats"))
    }
    // the guarded frame feeds the real operators exactly as before:
    // gate → decode is the composition the DSP entries use
    val metaRows = ImageCodec.decodeMeta(
        Multimodal.requireRealDecode(
          Seq((7L, "image", png)).toDF("media_id", "kind", "payload"),
          col("kind"), "spec"),
        col("media_id"), col("payload"))
      .collect()
    assert(metaRows.length == 1 && metaRows(0).getLong(1) == 4L)
  }

  test("animated GIF: lossless frame round trip, selective decode, sampler equality with the PNG container") {
    import graft.multimodal.ImageCodec
    val codec = new ImageCodec.Codec
    def pix(f: Int, k: Int): Int = (k * 7 + f * 13 + 5) % 256
    // every frame decodes back pixel-exact through the explicit
    // 256-gray palette (interlace is OFF — the JDK writer's interlaced
    // rows do not survive its own reader, pinned here: a regression
    // re-enabling it scrambles rows and this assert catches it)
    val gif = codec.encodeGrayGif(6, 5, 4, pix)
    val (n, all) = codec.decodeGifSampled(gif, m => 0 until m)
    assert(n == 4)
    all.foreach { case (fi, im) =>
      assert(im.width == 6 && im.height == 5)
      (0 until 30).foreach(k => assert(im.pixels(k) == pix(fi, k),
        s"frame $fi pixel $k"))
    }
    // selective decode returns exactly the asked frames
    val (_, picked) = codec.decodeGifSampled(gif, _ => Seq(0, 3))
    assert(picked.map(_._1) == Seq(0, 3))
    // the GIF sampler and the PNG-container sampler agree row-for-row
    // on the same synthetic animation — one fixture intent, two wire
    // containers, so agreement pins that the numbers come from the
    // DECODE, not the container
    val spark2 = spark
    import spark2.implicits._
    val docs = spark.range(0, 40).toDF("doc_id")
    val viaGif = ImageCodec.sampleGifFrames(
      ImageCodec.SyntheticVideos.gifFixture(docs, col("doc_id")),
      col("media_id"), col("payload"), maxFrames = 3)
    val viaPng = ImageCodec.sampleFrames(
      ImageCodec.SyntheticVideos.containerFixture(docs, col("doc_id")),
      col("media_id"), col("payload"), maxFrames = 3)
    assert(viaGif.exceptAll(viaPng).isEmpty && viaPng.exceptAll(viaGif).isEmpty)
    // loud contracts
    intercept[IllegalArgumentException](codec.encodeGrayGif(2, 2, 0, pix))
    intercept[IllegalArgumentException](
      codec.decodeGifSampled(gif, _ => Seq(9)))
  }

  test("decodeGifSampled refuses a frame rect outside the logical screen (hostile-payload guard)") {
    import graft.multimodal.ImageCodec
    import graft.multimodal.ImageCodec.GifFrame
    val codec = new ImageCodec.Codec
    val gif = codec.encodeGrayGifDelta(Seq(
      GifFrame(0, 0, 8, 6, "doNotDispose", (x, y) => (x + y) % 256)))
    // walk the container to the first ImageDescriptor (0x2C at a BLOCK
    // boundary — scanning for the byte would hit gray palette entries)
    // and push imageLeftPosition past the screen width
    val bad = gif.clone()
    var pos = 6 + 7 + 768 // header + LSD + 256-entry GCT
    while ((bad(pos) & 0xff) == 0x21) { // extension: intro+label+subblocks
      pos += 2
      while (bad(pos) != 0) pos += 1 + (bad(pos) & 0xff)
      pos += 1
    }
    assert((bad(pos) & 0xff) == 0x2c, "expected an image separator")
    bad(pos + 1) = 0xff.toByte // left = 255 (little-endian low byte)
    bad(pos + 2) = 0x00
    val e = intercept[IllegalArgumentException](
      codec.decodeGifSampled(bad, _ => Seq(0)))
    assert(e.getMessage.contains("outside the 8x6 logical screen"))
    // the untouched payload still decodes
    assert(codec.decodeGifSampled(gif, _ => Seq(0))._1 == 1)
  }

  test("per-task decode memo is content-addressed: duplicates in ONE task match isolated decodes; distinct payloads never collide") {
    import graft.multimodal.ImageCodec
    val spark2 = spark
    import spark2.implicits._
    // 40 ids over 16 distinct payloads, forced into ONE partition so
    // every duplicate hits the same task's memo; rows must equal the
    // fully-spread run (one id per task ≈ no memo hits) row for row
    val docs = spark.range(0, 40).toDF("doc_id")
    val one = ImageCodec.sampleGifFrames(
      ImageCodec.SyntheticVideos.gifFixture(docs, col("doc_id"))
        .coalesce(1),
      col("media_id"), col("payload"), maxFrames = 3)
    val spread = ImageCodec.sampleGifFrames(
      ImageCodec.SyntheticVideos.gifFixture(docs, col("doc_id"))
        .repartition(40),
      col("media_id"), col("payload"), maxFrames = 3)
    assert(one.exceptAll(spread).isEmpty && spread.exceptAll(one).isEmpty)
    // distinct payloads through one task's decodeGray memo stay distinct
    val metas = ImageCodec.decodeMeta(
      ImageCodec.SyntheticImages.pngFixture(
        spark.range(0, 16).toDF("doc_id"), col("doc_id")).coalesce(1),
      col("media_id"), col("payload"))
      .select(col("media_id"), col("pix_sum")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 16L).foreach { s =>
      val w = ImageCodec.SyntheticImages.widthOf(s)
      val h = ImageCodec.SyntheticImages.heightOf(s)
      val expect = (0L until (w * h).toLong)
        .map(ImageCodec.SyntheticImages.pixelAt(s, _).toLong).sum
      assert(metas(s) == expect, s"seed $s pix_sum")
    }
  }

  test("GIF delta compositing: partial rects overlay, all four disposal methods honored, keyframe window cuts the walk") {
    import graft.multimodal.ImageCodec
    import graft.multimodal.ImageCodec.GifFrame
    val codec = new ImageCodec.Codec
    // 4x4 canvas: keyframe all 10s; f1 draws a 2x2 rect of 20s at
    // (1,1) under doNotDispose; f2 draws a 1x1 of 30 at (0,0) under
    // restoreToBackgroundColor; f3 draws 2x1 of 40s at (2,3) under
    // restoreToPrevious; f4 draws 1x1 of 50 at (3,0)
    val frames = Seq(
      GifFrame(0, 0, 4, 4, "doNotDispose", (_, _) => 10),
      GifFrame(1, 1, 2, 2, "doNotDispose", (_, _) => 20),
      GifFrame(0, 0, 1, 1, "restoreToBackgroundColor", (_, _) => 30),
      GifFrame(2, 3, 2, 1, "restoreToPrevious", (_, _) => 40),
      GifFrame(3, 0, 1, 1, "none", (_, _) => 50))
    val gif = codec.encodeGrayGifDelta(frames)
    val (n, all) = codec.decodeGifSampled(gif, m => 0 until m)
    assert(n == 5)
    val px = all.map { case (fi, im) =>
      assert(im.width == 4 && im.height == 4, s"frame $fi dims")
      fi -> im.pixels.toSeq
    }.toMap
    def at(f: Int, x: Int, y: Int) = px(f)(y * 4 + x)
    // frame 0: the keyframe alone
    assert(px(0).forall(_ == 10))
    // frame 1: the 2x2 rect rides over the persisting canvas
    assert(at(1, 1, 1) == 20 && at(1, 2, 2) == 20 && at(1, 0, 0) == 10 &&
      at(1, 3, 3) == 10)
    // frame 2: f1 persisted (doNotDispose), plus the 30 at (0,0)
    assert(at(2, 0, 0) == 30 && at(2, 1, 1) == 20 && at(2, 3, 0) == 10)
    // frame 3: f2's rect was RESTORED TO BACKGROUND after display —
    // (0,0) is the background index (0), not 30 and not 10 — and f3's
    // 40s land at (2,3)-(3,3)
    assert(at(3, 0, 0) == 0, s"bg restore, got ${at(3, 0, 0)}")
    assert(at(3, 2, 3) == 40 && at(3, 3, 3) == 40 && at(3, 1, 1) == 20)
    // frame 4: f3 was RESTORED TO PREVIOUS — its 40s vanish, the
    // pre-f3 canvas returns, and the 50 lands at (3,0)
    assert(at(4, 2, 3) == 10 && at(4, 3, 3) == 10, "restoreToPrevious")
    assert(at(4, 3, 0) == 50 && at(4, 0, 0) == 0 && at(4, 1, 1) == 20)
    // keyframe window: a mid-stream FULL keyframe makes later frames
    // independent of everything before it — same composited pixels
    // as the step-by-step walk
    val reKey = Seq(
      GifFrame(0, 0, 3, 3, "doNotDispose", (_, _) => 7),
      GifFrame(0, 0, 1, 1, "doNotDispose", (_, _) => 8),
      GifFrame(0, 0, 3, 3, "doNotDispose", (_, _) => 9),  // keyframe
      GifFrame(1, 0, 1, 1, "doNotDispose", (_, _) => 11))
    val (_, k3) = codec.decodeGifSampled(codec.encodeGrayGifDelta(reKey),
      _ => Seq(3))
    assert(k3.head._2.pixels.toSeq ==
      Seq(9, 11, 9, 9, 9, 9, 9, 9, 9))
    // loud contract: a partial FIRST frame refuses
    intercept[IllegalArgumentException](codec.encodeGrayGifDelta(Seq(
      GifFrame(1, 0, 2, 2, "none", (_, _) => 1))))
    // TRANSPARENT pixels are holes the prior canvas shows through —
    // the GIF89a transparency real delta rects lean on: the f1 rect
    // writes 20s only on its main diagonal, palette index 77 marks
    // the rest transparent, so off-diagonal keeps the keyframe's 10s
    val trans = Seq(
      GifFrame(0, 0, 3, 3, "doNotDispose", (_, _) => 10),
      GifFrame(0, 0, 3, 3, "none",
        (x, y) => if (x == y) 20 else 77, transparent = 77))
    val (_, t1) = codec.decodeGifSampled(codec.encodeGrayGifDelta(trans),
      _ => Seq(1))
    assert(t1.head._2.pixels.toSeq ==
      Seq(20, 10, 10, 10, 20, 10, 10, 10, 20))
    // the keyframe-window scan must NOT cut at a transparent full
    // frame (it does not cover the canvas opaquely): same animation
    // sampled at 1 composites through frame 0
    val (_, t1b) = codec.decodeGifSampled(codec.encodeGrayGifDelta(
      trans :+ GifFrame(0, 0, 1, 1, "none", (_, _) => 30)), _ => Seq(2))
    assert(t1b.head._2.pixels.toSeq ==
      Seq(30, 10, 10, 10, 20, 10, 10, 10, 20))
  }

  test("AIFF: 80-bit-extended rate round trip, big-endian samples exact, auto-detect, loud contracts") {
    import graft.multimodal.AudioCodec
    import graft.multimodal.AudioCodec.{Aiff, Wav}
    // the 80-bit extended sample-rate field round-trips exactly for
    // the rates archives actually carry
    for (rate <- Seq(1, 8000, 16000, 22050, 44100, 48000, 96000)) {
      val b = Aiff.ext80(rate)
      assert(Aiff.unext80(b, 0) == rate, s"rate $rate")
    }
    intercept[IllegalArgumentException](Aiff.ext80(0))
    // samples survive byte-for-byte, including negatives and extremes
    val samples = Array[Short](0, 1, -1, 255, -256, 32767, -32768, 12345)
    val aiff = Aiff.encodeS16(8000, samples)
    val (r, back) = Aiff.decodeS16(aiff)
    assert(r == 8000 && back.sameElements(samples))
    // magic auto-detect routes both containers; garbage refuses
    assert(AudioCodec.decodeS16Any(aiff)._2.sameElements(samples))
    assert(AudioCodec.decodeS16Any(Wav.encodeS16(8000, samples))
      ._2.sameElements(samples))
    val e = intercept[IllegalArgumentException](
      AudioCodec.decodeS16Any("OggS garbage".getBytes("US-ASCII")))
    assert(e.getMessage.contains("OggS"))
    // COMM/SSND disagreement refuses: truncate the SSND data by one
    // sample but leave COMM's frame count — self-inconsistent
    val cut = java.util.Arrays.copyOf(aiff, aiff.length - 2)
    // fix the outer FORM and SSND lengths so only the COUNT disagrees
    def putBe32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = ((v >> 24) & 0xff).toByte; b(o + 1) = ((v >> 16) & 0xff).toByte
      b(o + 2) = ((v >> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
    }
    putBe32(cut, 4, cut.length - 8)
    putBe32(cut, 42, 8 + samples.length * 2 - 2)
    val e2 = intercept[IllegalArgumentException](Aiff.decodeS16(cut))
    assert(e2.getMessage.contains("self-inconsistent"))
    // HOSTILE lengths refuse with the NAMED error, never an index
    // error: a chunk length near 2^31 (Int `body+len` would overflow
    // negative and pass) and an SSND offset near 2^31 (negative Int
    // `skip` whose start/dataLen errors cancel)
    val bigLen = aiff.clone()
    putBe32(bigLen, 16, 0x7ffffff0)              // COMM declared length
    val e3 = intercept[IllegalArgumentException](Aiff.decodeS16(bigLen))
    assert(e3.getMessage.contains("corrupt chunk length"), e3.getMessage)
    val bigSkip = aiff.clone()
    putBe32(bigSkip, 46, 0x7ffffff0)             // SSND offset field
    val e4 = intercept[IllegalArgumentException](Aiff.decodeS16(bigSkip))
    assert(e4.getMessage.contains("corrupt SSND offset"), e4.getMessage)
    val wavBig = Wav.encodeS16(8000, samples)
    // 'fmt ' declared length near 2^31 in the RIFF walk
    def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(wavBig, 16, 0x7ffffff0)
    val e5 = intercept[IllegalArgumentException](Wav.decodeS16(wavBig))
    assert(e5.getMessage.contains("corrupt chunk length"), e5.getMessage)
  }
}
