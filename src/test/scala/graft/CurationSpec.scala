package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

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
}
