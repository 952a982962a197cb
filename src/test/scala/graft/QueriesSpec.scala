package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run at sf0.001 and produce a sane result.
  * (Value-level correctness is the driver's DuckDB oracle — tools/check.py
  * locally; this spec catches regressions fast.)
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // queries whose result can legitimately be empty at tiny scale
  private val mayBeEmpty = Set("q05_anti_join", "q09_except", "p10_embedding_near_dups",
    "p05_minhash_pairs", "p07_ngram_jaccard")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, TestSpark.sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly non-SQL") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
