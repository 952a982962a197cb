package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sampleExactPerGroup draws exactly k per group, reservoir-stable") {
    val rows = (1L to 30L).map(i => (i, "a")) ++ (31L to 40L).map(i => (i, "b"))
    val df = rows.toDF("doc_id", "lang")
    val out = Curation.sampleExactPerGroup(df, col("lang"), col("doc_id"), k = 25)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exactly min(k, |group|) rows per group, ranks dense from 1
    val byGroup = out.groupBy(_._1)
    assert(byGroup("a").length == 25 && byGroup("b").length == 10)
    byGroup.values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length))
    }
    // reservoir property: dropping rows the sample did NOT pick leaves
    // the sample unchanged (hash order is global, not corpus-relative)
    val picked = out.filter(_._1 == "a").map(_._2).toSet
    val dropped = (1L to 30L).filterNot(picked).take(5).toSet
    val again = Curation.sampleExactPerGroup(
        df.filter(!col("doc_id").isin(dropped.toSeq: _*)),
        col("lang"), col("doc_id"), k = 25)
      .filter(col("group") === "a")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(again == out.filter(_._1 == "a").map(t => (t._2, t._3)).toSet)
  }

  test("releaseManifest: shard manifests combine to the full manifest (sum counts, xor fps)") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val leaf = (df: org.apache.spark.sql.DataFrame) =>
      Curation.releaseManifest(df, col("source"), col("lang"), col("text"))
        .filter(col("lvl") === 0)
    val full = leaf(docs)
    // a consumer verifying a sharded delivery recomputes per shard and
    // combines: counts/totals ADD, fingerprints XOR — no row-order or
    // shard-boundary coordination needed
    val combined = leaf(docs.filter(col("doc_id") % 2 === 0))
      .unionByName(leaf(docs.filter(col("doc_id") % 2 === 1)))
      .groupBy("lvl", "source", "lang")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        expr("bit_xor(fp_lo)").as("fp_lo"), expr("bit_xor(fp_hi)").as("fp_hi"))
    assert(full.exceptAll(combined).count() == 0 &&
      combined.exceptAll(full).count() == 0)
    // rollup levels are present and consistent: grand total == sum of leaves
    val all = Curation.releaseManifest(docs, col("source"), col("lang"), col("text"))
    val grand = all.filter(col("lvl") === 3).select("n_docs").head().getLong(0)
    val leaves = all.filter(col("lvl") === 0)
      .agg(sum("n_docs")).head().getLong(0)
    assert(grand == leaves && grand == docs.count())
  }

  test("calibrateKeepRate hits ceil(rate*n) minimally; ties all keep; both directions") {
    val df = Seq(
      // lang a: scores 1..10 -> rate .3 => k=3, cutoff=3
      (1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), (4L, "a", 4L), (5L, "a", 5L),
      (6L, "a", 6L), (7L, "a", 7L), (8L, "a", 8L), (9L, "a", 9L), (10L, "a", 10L),
      // lang b: heavy tie at 5 -> k=ceil(.3*6)=2, cutoff=5, ALL ties keep
      (11L, "b", 5L), (12L, "b", 5L), (13L, "b", 5L), (14L, "b", 5L),
      (15L, "b", 7L), (16L, "b", 9L))
      .toDF("id", "lang", "s")
    val low = Curation.calibrateKeepRate(df, col("id"), col("lang"), col("s"),
        rateMicro = 300000L, keepLowest = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert((1L to 3L).forall(low(_) == (3L, true)) &&
      (4L to 10L).forall(low(_)._2 == false))
    // ties: k=2 but all four 5s keep (minimal cutoff covering k)
    assert((11L to 14L).forall(low(_) == (5L, true)) &&
      !low(15L)._2 && !low(16L)._2)
    // keep-highest mirrors: lang a rate .2 => k=2, cutoff=9
    val high = Curation.calibrateKeepRate(df.filter(col("lang") === "a"),
        col("id"), col("lang"), col("s"), rateMicro = 200000L, keepLowest = false)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(high(10L) == (9L, true) && high(9L) == (9L, true) && !high(8L)._2)
    // rate 0 keeps nothing
    val none = Curation.calibrateKeepRate(df, col("id"), col("lang"), col("s"),
      rateMicro = 0L)
    assert(none.filter(col("kept")).count() == 0)
  }

  test("manifestDiff: added/removed/changed/unchanged; silent edits caught by fingerprint") {
    val m = (rows: Seq[(Long, String, String, String)]) =>
      Curation.releaseManifest(rows.toDF("doc_id", "source", "lang", "text"),
        col("source"), col("lang"), col("text"))
    val old_ = m(Seq(
      (1L, "s1", "en", "alpha beta gamma"),
      (2L, "s1", "de", "eins zwei drei"),
      (3L, "s2", "en", "one two three")))
    val new_ = m(Seq(
      (1L, "s1", "en", "alpha beta gamma"),     // unchanged
      (2L, "s1", "de", "eins zwei VIER"),       // SILENT EDIT: same counts
      (4L, "s3", "en", "brand new source")))    // s2/en removed, s3/en added
    val out = Curation.manifestDiff(old_, new_)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(("s1", "en")) == (0L, 0L, "unchanged"))
    // same doc count, same token count — only the fingerprint sees it
    assert(out(("s1", "de")) == (0L, 0L, "changed"))
    assert(out(("s2", "en")) == (-1L, -3L, "removed"))
    assert(out(("s3", "en")) == (1L, 3L, "added"))
  }

  test("stratifiedSample is deterministic and tracks per-stratum rates") {
    val rows = (1 to 4000).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val kept = Curation.stratifiedSample(rows, col("lang"), col("id"),
      Map("en" -> 0.5, "de" -> 0.1))
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 candidates per stratum; md5 buckets are uniform, so expect
    // ~1000 en / ~200 de with generous slack
    assert(byLang("en") > 800 && byLang("en") < 1200, byLang)
    assert(byLang("de") > 120 && byLang("de") < 280, byLang)
    // bit-for-bit reproducible
    assert(kept.exceptAll(Curation.stratifiedSample(rows, col("lang"), col("id"),
      Map("en" -> 0.5, "de" -> 0.1))).count() == 0)
    // unknown strata fall back to defaultRate = 0.0 -> dropped
    val other = Curation.stratifiedSample(
      Seq((1L, "zz")).toDF("id", "lang"), col("lang"), col("id"), Map("en" -> 1.0))
    assert(other.count() == 0)
  }

  test("tokenBudgetPerGroup admits rows in order until the budget") {
    val docs = Seq(
      ("a", 1L, 40L), ("a", 2L, 40L), ("a", 3L, 40L), // a: 40, 80, 120
      ("b", 1L, 90L), ("b", 2L, 20L)                  // b: 90, 110
    ).toDF("src", "id", "n")
    val out = Curation.tokenBudgetPerGroup(docs, col("src"), col("id"),
        col("n"), budget = 100L)
      .select(col("src"), col("id"), col("cum_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("a", 1L, 40L), ("a", 2L, 80L), ("b", 1L, 90L)))
  }

  test("tokenBudgetPerGroup counts tied order values row by row") {
    // two rows tied on order, each 60 tokens, budget 100: a RANGE frame
    // would give both cum=120 and drop both; the ROWS frame admits
    // exactly one (deterministically, with the tiebreak)
    val docs = Seq(("a", 1L, 10L, 60L), ("a", 1L, 11L, 60L)).toDF("src", "ord", "id", "n")
    val out = Curation.tokenBudgetPerGroup(docs, col("src"), col("ord"),
        col("n"), budget = 100L, col("id"))
      .select(col("id"), col("cum_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 60L)))
  }

  test("packSequences lays docs end-to-end and cuts fixed-length sequences") {
    // group a: 300+300+300 tokens at seqLen 512 → doc2 straddles the cut
    val docs = Seq(("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 300L),
      ("b", 1L, 0L), ("b", 2L, 600L)).toDF("src", "id", "n")
    val out = Curation.packSequences(docs, col("src"), col("id"), col("n"), 512L)
      .select(col("src"), col("id"), col("seq_id"), col("seq_offset"), col("n_seqs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out == Set(
      ("a", 1L, 0L, 0L, 1L),   // [0, 300)
      ("a", 2L, 0L, 300L, 2L), // [300, 600) spans seqs 0-1
      ("a", 3L, 1L, 88L, 1L),  // [600, 900) inside seq 1
      ("b", 1L, 0L, 0L, 0L),   // empty doc spans nothing
      ("b", 2L, 0L, 0L, 2L)))  // [0, 600) spans seqs 0-1
  }

  test("packManifest spans tile every sequence exactly, map-side") {
    val docs = Seq(("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 300L),
      ("b", 1L, 0L), ("b", 2L, 600L)).toDF("src", "id", "n")
    val packed = Curation.packSequences(docs, col("src"), col("id"), col("n"), 512L)
    val man = Curation.packManifest(packed, col("id"), col("n"), 512L, col("src"))
    val rows = man.collect().map(r => (r.getString(5), r.getLong(1), r.getLong(0),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // hand-computed: (src, seq, doc, seq_pos, doc_pos, n_span)
    assert(rows == Set(
      ("a", 0L, 1L, 0L, 0L, 300L),   // doc1 fills [0,300) of seq 0
      ("a", 0L, 2L, 300L, 0L, 212L), // doc2 head fills the rest of seq 0
      ("a", 1L, 2L, 0L, 212L, 88L),  // doc2 tail opens seq 1
      ("a", 1L, 3L, 88L, 0L, 300L),  // doc3 follows inside seq 1
      ("b", 0L, 2L, 0L, 0L, 512L),   // doc2 fills seq 0 completely
      ("b", 1L, 2L, 0L, 512L, 88L))) // and spills into seq 1
    // tiling invariant on a larger random corpus: within every sequence
    // the spans are disjoint, gap-free from 0, and full sequences sum
    // to exactly seqLen
    val rnd = new scala.util.Random(7)
    val big = (1 to 300).map(i =>
      (s"g${rnd.nextInt(3)}", i.toLong, rnd.nextInt(200).toLong)).toDF("src", "id", "n")
    val bigMan = Curation.packManifest(
        Curation.packSequences(big, col("src"), col("id"), col("n"), 128L),
        col("id"), col("n"), 128L, col("src"))
      .collect().map(r => (r.getString(5), r.getLong(1), r.getLong(2), r.getLong(4)))
    bigMan.groupBy(t => (t._1, t._2)).foreach { case ((g, seq), spans) =>
      val sorted = spans.sortBy(_._3).map(s => (s._3, s._4))
      assert(sorted.head._1 == 0L, s"seq ($g,$seq) must start at 0")
      sorted.sliding(2).foreach {
        case Array((p1, l1), (p2, _)) => assert(p1 + l1 == p2,
          s"gap/overlap in ($g,$seq)")
        case _ =>
      }
    }
    val full = bigMan.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._4).sum)
    val maxSeq = bigMan.groupBy(_._1).view.mapValues(_.map(_._2).max)
    full.foreach { case ((g, seq), tot) =>
      if (seq < maxSeq(g)) assert(tot == 128L, s"full seq ($g,$seq) holds $tot") }
    // the manifest is a map-side explode: exactly the pack's ONE window
    // shuffle, nothing more (fresh un-executed frame — a collected
    // frame's AQE-finalized plan string counts stages differently)
    val freshPlan = Curation.packManifest(
        Curation.packSequences(docs, col("src"), col("id"), col("n"), 512L),
        col("id"), col("n"), 512L, col("src"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(freshPlan).length == 1,
      s"manifest must add no shuffle:\n$freshPlan")
  }

  test("packSequences matches a sequential per-group reference on random input") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      (s"g${rnd.nextInt(5)}", i.toLong, rnd.nextInt(200).toLong)
    }
    val out = Curation.packSequences(rows.toDF("g", "id", "n"),
        col("g"), col("id"), col("n"), 128L)
      .select(col("g"), col("id"), col("n"),
        col("seq_id"), col("seq_offset"), col("n_seqs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val ref = rows.groupBy(_._1).flatMap { case (g, rs) =>
      var cp = 0L
      rs.sortBy(_._2).map { case (_, id, n) =>
        val seqId = cp / 128
        val off = cp % 128
        val nSeqs = if (n == 0) 0L else (cp + n - 1) / 128 - seqId + 1
        val t = (g, id, n, seqId, off, nSeqs)
        cp += n
        t
      }
    }.toSet
    assert(out == ref)
  }

  test("temperatureMixSqrt downsamples large groups toward sqrt weights") {
    // 100 "big" + 4 "small" rows, target 20: w = (10, 2), Σw = 12,
    // targets = (16, 3), thresholds = (1600, 7500)
    val rows = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 104).map(i => (i.toLong, "small"))).toDF("id", "grp")
    val kept = Curation.temperatureMixSqrt(rows, col("grp"), col("id"), 20L)
      .collect().map(r => r.getLong(0)).toSet
    val expected = rows.select(col("id"), col("grp"),
        Curation.hashBucket(col("id")).as("b"))
      .filter((col("grp") === "big" && col("b") < 1600) ||
        (col("grp") === "small" && col("b") < 7500))
      .collect().map(_.getLong(0)).toSet
    assert(kept == expected && kept.nonEmpty)
    // a target larger than the corpus admits everything (rates clamp at 1)
    val all = Curation.temperatureMixSqrt(rows, col("grp"), col("id"), 100000L)
    assert(all.count() == 104)
    // miskeyed group (per-row key) must fail loudly, not collect the corpus
    val ex = intercept[IllegalArgumentException] {
      Curation.temperatureMixSqrt(rows, col("id"), col("id"), 20L, maxGroups = 50)
    }
    assert(ex.getMessage.contains("distinct values"))
  }

  test("sampleWeightedPerGroup matches an independent A-ES recompute") {
    val rows = (1L to 40L).map(i => ("g", i, i * 100L)).toDF("grp", "id", "w")
    val out = Curation.sampleWeightedPerGroup(rows, col("grp"), col("id"),
        col("w"), k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // independent recompute: 52-bit md5 roll -> u -> ln(u)/w, top-10
    def es(id: Long, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val roll = java.lang.Long.parseLong(hex, 16)
      math.log((roll + 1).toDouble / 4503599627370496.0) / w.toDouble
    }
    val expected = (1L to 40L).map(i => (i, es(i, i * 100L)))
      .sortBy { case (id, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, _), r) => (id, r + 1L) }
    assert(out.toSeq == expected)
  }

  test("sampleWeightedPerGroup favors heavy weights and rejects w <= 0") {
    // one row with overwhelming weight: its key ~0- beats every other
    val rows = ((1L to 50L).map(i => ("g", i, 10L)) :+ (("g", 99L, (1L << 40))))
      .toDF("grp", "id", "w")
    val top = Curation.sampleWeightedPerGroup(rows, col("grp"), col("id"),
      col("w"), k = 1).collect()
    assert(top.length == 1 && top(0).getLong(1) == 99L)
    val bad = Seq(("g", 1L, 0L)).toDF("grp", "id", "w")
    val ex = intercept[Exception] {
      Curation.sampleWeightedPerGroup(bad, col("grp"), col("id"),
        col("w"), k = 1).collect()
    }
    assert(ex.getMessage.contains("weight must be > 0"))
  }

  test("interleaveTag routes every row to at most one tag by weight") {
    val rows = (1 to 4000).map(_.toLong).toDF("id")
    val tagged = rows.select(col("id"),
      Curation.interleaveTag(col("id"), Seq("web" -> 0.8, "code" -> 0.1)).as("tag"))
    val counts = tagged.groupBy("tag").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    assert(counts("web") > 2900 && counts("web") < 3500, counts)
    assert(counts("code") > 250 && counts("code") < 550, counts)
    // remainder (0.1) is untagged, nothing lost
    assert(counts.values.sum == 4000)
    assert(counts.contains("NULL"))
    // same hash -> sample and interleave decisions are aligned: every
    // row tagged "web" under weights (0.8) is exactly a row kept by
    // stratifiedSample at rate 0.8 on the same key
    val sampleIds = Curation.stratifiedSample(rows.withColumn("s", lit("x")),
      col("s"), col("id"), Map("x" -> 0.8)).select("id")
    val webIds = tagged.filter(col("tag") === "web").select("id")
    assert(webIds.exceptAll(sampleIds).count() == 0)
    assert(sampleIds.exceptAll(webIds).count() == 0)
  }

  test("leakageSafeSplit: duplicate content never straddles splits; doc_id never decides") {
    // same content under different ids and whitespace encodings
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "  alpha   beta gamma "),
      (900001L, "alpha beta gamma"), (3L, "delta epsilon"),
      (4L, "zeta eta theta iota")).toDF("doc_id", "text")
    val out = Curation.leakageSafeSplit(docs, col("text"))
    // the leakage invariant itself: one split per fingerprint
    val straddlers = out.groupBy("fingerprint")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(straddlers == 0)
    // the three content-equal docs agree regardless of id
    assert(out.filter(col("doc_id").isin(1L, 2L, 900001L))
      .select("split").distinct().count() == 1)
    // the corpus split tracks the 9000/10000 default on real data
    val real = Curation.leakageSafeSplit(
      Tables.documents(spark, TestSpark.sf), col("text"))
    val n = real.count().toDouble
    val train = real.filter(col("split") === "train").count().toDouble
    assert(train / n > 0.8 && train / n < 0.97, s"train frac ${train / n}")
  }

  test("epochShuffle: pos is exactly the permutation 1..N, reproducible, seed-sensitive") {
    val docs = spark.range(0, 1000).toDF("doc_id")
    val out = Curation.epochShuffle(docs, col("doc_id"), seed = 7L)
      .select(col("doc_id"), col("pos"))
    val pos = out.select("pos").as[Long].collect().sorted.toSeq
    assert(pos == (1L to 1000L), "positions are not a 1..N permutation")
    // bit-reproducible: a second run maps every id to the same position
    val again = Curation.epochShuffle(docs, col("doc_id"), seed = 7L)
      .select(col("doc_id"), col("pos").as("pos2"))
    assert(out.join(again, "doc_id")
      .filter(col("pos") =!= col("pos2")).count() == 0)
    // a different seed is a genuinely different permutation
    val other = Curation.epochShuffle(docs, col("doc_id"), seed = 8L)
      .select(col("doc_id"), col("pos").as("pos2"))
    val moved = out.join(other, "doc_id")
      .filter(col("pos") =!= col("pos2")).count()
    assert(moved > 900, s"seed change moved only $moved of 1000 rows")
  }

  test("curriculumShuffle: tier-major total order, shuffled within tier, loud tier contract") {
    val docs = spark.range(0, 900).toDF("doc_id")
      .withColumn("tier", (col("doc_id") % 3).cast("int"))
    val out = Curation.curriculumShuffle(docs, col("doc_id"), col("tier"), seed = 5L)
      .select(col("doc_id"), col("tier"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // positions are the permutation 1..N
    assert(out.map(_._3).sorted.toSeq == (1L to 900L))
    // tier-major: every tier-0 position < every tier-1 position < tier-2
    val byTier = out.groupBy(_._2).map { case (t, rs) =>
      t -> (rs.map(_._3).min, rs.map(_._3).max) }
    assert(byTier(0)._2 < byTier(1)._1 && byTier(1)._2 < byTier(2)._1,
      s"tiers interleave: $byTier")
    // within a tier the order is the seeded shuffle, not doc_id order
    val tier0 = out.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(tier0.toSeq != tier0.sorted.toSeq, "tier 0 not shuffled")
    // out-of-range tier fails loudly
    val bad = docs.withColumn("tier", lit(12))
    val e = intercept[Exception] {
      Curation.curriculumShuffle(bad, col("doc_id"), col("tier"), 5L).count()
    }
    assert(e.getMessage.contains("single digit"), e.getMessage)
  }

  test("negativeSamples: exact duplicates of the query are never negatives; deterministic") {
    // doc 500 is an exact duplicate of query 1 — it must never appear
    // among query 1's negatives no matter the dice roll
    val corpus = ((1L to 400L).map(i => (i, s"fp_$i")) :+ (500L, "fp_q1"))
      .toDF("doc_id", "fp")
    val queries = Seq((9001L, "fp_q1"), (9002L, "fp_q2")).toDF("qid", "qfp")
    val out = Curation.negativeSamples(corpus, col("doc_id"), col("fp"),
        queries, col("qid"), col("qfp"), poolPermille = 5000, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = out.groupBy(_._1)
    assert(!byQ(9001L).exists(_._2 == 500L), "duplicate served as negative")
    // exactly k negatives per query, ranks dense from 1
    byQ.values.foreach { rs =>
      assert(rs.length == 10 && rs.map(_._3).sorted.toSeq == (1L to 10L))
    }
    // different queries draw different negatives (per-query dice roll)
    assert(byQ(9001L).map(_._2).toSet != byQ(9002L).map(_._2).toSet)
    // bit-reproducible
    val again = Curation.negativeSamples(corpus, col("doc_id"), col("fp"),
        queries, col("qid"), col("qfp"), poolPermille = 5000, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == out.toSet)
  }

  test("negativeSamples strict mode: thin pools raise naming the query; full pools pass") {
    val corpus = (1L to 400L).map(i => (i, s"fp_$i")).toDF("doc_id", "fp")
    val queries = Seq((9001L, "fp_q1")).toDF("qid", "qfp")
    // plenty of candidates: strict mode returns the same rows as default
    val ok = Curation.negativeSamples(corpus, col("doc_id"), col("fp"),
      queries, col("qid"), col("qfp"), poolPermille = 5000, k = 10,
      strict = true)
    val default_ = Curation.negativeSamples(corpus, col("doc_id"), col("fp"),
      queries, col("qid"), col("qfp"), poolPermille = 5000, k = 10)
    assert(ok.exceptAll(default_).count() == 0 &&
      default_.exceptAll(ok).count() == 0)
    // a pool thinned below k (tiny corpus + low permille) raises loudly
    // instead of silently under-delivering; default mode emits fewer
    val tiny = (1L to 20L).map(i => (i, s"fp_$i")).toDF("doc_id", "fp")
    val short = Curation.negativeSamples(tiny, col("doc_id"), col("fp"),
      queries, col("qid"), col("qfp"), poolPermille = 1000, k = 10)
    assert(short.count() < 10)
    val e = intercept[Exception] {
      Curation.negativeSamples(tiny, col("doc_id"), col("fp"),
        queries, col("qid"), col("qfp"), poolPermille = 1000, k = 10,
        strict = true).count()
    }
    assert(e.getMessage.contains("negativeSamples") &&
      e.getMessage.contains("9001"))
  }

  test("mixturePlan: exact budget conservation, cap semantics, and loud mismatch/infeasibility") {
    val docs = Seq((1L, "a", 100L), (2L, "a", 100L), (3L, "b", 50L),
      (4L, "c", 400L)).toDF("id", "src", "n_tok")
    val byG = Curation.mixturePlan(docs, col("src"), col("n_tok"),
        Seq("a" -> 500, "b" -> 300, "c" -> 200),
        budget = 500L, capMilliEpochs = 2000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    // b wants 150 but caps at 2 epochs × 50 = 100; its 50-token deficit
    // redistributes to a/c's headroom; grand total == budget exactly
    assert(byG("b") == ((100L, 2000L, true)))
    assert(byG.values.map(_._1).sum == 500L)
    assert(byG("a")._1 >= 250L && byG("c")._1 >= 100L)
    // a weight naming an absent group raises; a group with no weight raises
    assert(intercept[Exception] {
      Curation.mixturePlan(docs, col("src"), col("n_tok"),
        Seq("a" -> 400, "b" -> 300, "c" -> 100, "zz" -> 200), 500L, 2000L)
        .collect()
    }.getMessage.contains("absent group"))
    assert(intercept[Exception] {
      Curation.mixturePlan(docs, col("src"), col("n_tok"),
        Seq("a" -> 700, "b" -> 300), 500L, 2000L).collect()
    }.getMessage.contains("no weight"))
    // a budget beyond total capped supply raises instead of over-repeating
    assert(intercept[Exception] {
      Curation.mixturePlan(docs, col("src"), col("n_tok"),
        Seq("a" -> 500, "b" -> 300, "c" -> 200), 10000L, 2000L).collect()
    }.getMessage.contains("infeasible"))
  }

  test("split/shuffle operators refuse inputs that already carry their reserved output columns") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(10)
    val e1 = intercept[IllegalArgumentException] {
      Curation.leakageSafeSplit(docs.withColumn("split", lit("x")), col("text"))
    }
    assert(e1.getMessage.contains("split"))
    val e2 = intercept[IllegalArgumentException] {
      Curation.epochShuffle(docs.withColumn("bucket", lit("b")), col("doc_id"), 7L)
    }
    assert(e2.getMessage.contains("bucket"))
    val e3 = intercept[IllegalArgumentException] {
      Curation.curriculumShuffle(docs.withColumn("pos", lit(1L)),
        col("doc_id"), lit(0), 7L)
    }
    assert(e3.getMessage.contains("pos"))
  }
  test("suppressSmallGroups: floor binds, totals exact, suppressed row always present") {
    import org.apache.spark.sql.functions._
    val stats = Seq(("en", "a", 12L, 120L), ("en", "b", 3L, 30L),
      ("de", "a", 5L, 50L), ("de", "b", 10L, 100L))
      .toDF("lang", "bucket", "n_docs", "n_chars")
    val out = Curation.suppressSmallGroups(stats,
        keyCols = Seq("lang", "bucket"), nCol = "n_docs", k = 10L)
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(("en", "a", 12L, 120L), ("de", "b", 10L, 100L),
      ("__SUPPRESSED", "", 8L, 80L)))
    // clean input: the suppressed row is still there, zeroed
    val clean = Curation.suppressSmallGroups(stats, Seq("lang", "bucket"),
        "n_docs", k = 1L)
      .as[(String, String, Long, Long)].collect().toSet
    assert(clean.contains(("__SUPPRESSED", "", 0L, 0L)))
    assert(clean.size == 5)
    intercept[IllegalArgumentException] {
      Curation.suppressSmallGroups(stats, Seq("lang"), "lang", 10L)
    }
    intercept[IllegalArgumentException] {
      Curation.suppressSmallGroups(stats, Seq("lang"), "n_docs", 0L)
    }
  }

  test("packBlastRadius: boundary-spanning bad docs, zero-token bad doc, empty list") {
    val docs = Seq(("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 300L),
      ("b", 1L, 0L), ("b", 2L, 600L)).toDF("src", "id", "n")
    val packed = Curation.packSequences(docs, col("src"), col("id"),
      col("n"), 512L)
    def radius(bad: Seq[Long]) = Curation.packBlastRadius(packed,
        col("id"), col("n"), bad.toDF("bad_id"), col("bad_id"), 512L,
        col("src"))
      .as[(String, Long, Long, Long)].collect().toSet
    // doc 2 in src a occupies [300, 600): 212 tokens of seq 0, 88 of
    // seq 1; in src b it occupies [0, 600): all of seq 0, 88 of seq 1
    assert(radius(Seq(2L)) == Set(
      ("a", 0L, 1L, 212L), ("a", 1L, 1L, 88L),
      ("b", 0L, 1L, 512L), ("b", 1L, 1L, 88L)))
    // doc 1: 300 tokens in src a's seq 0; ZERO tokens in src b — a
    // zero-token takedown contaminates nothing there
    assert(radius(Seq(1L)) == Set(("a", 0L, 1L, 300L)))
    // two bad docs meeting in one sequence roll up together
    assert(radius(Seq(1L, 2L)).contains(("a", 0L, 2L, 512L)))
    assert(radius(Seq.empty) == Set.empty)
  }
}
