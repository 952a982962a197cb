package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.QualityLr

/** Full-batch logistic-regression quality classifier: the closed-form
  * first iteration recomputed independently, gradient-descent loss
  * monotonicity on a separable corpus, convergence of the sign
  * decision, bit-identical determinism under repartitioning (the
  * micro-unit discipline's whole point), and the loud caps.
  */
class QualityLrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "good nice fine good", "en"), (2L, "good fine", "en"),
    (3L, "nice good nice", "en"),
    (4L, "bad awful bad", "de"), (5L, "awful bad", "de"),
    (6L, "awful awful nice", "de"))

  private def docs = corpus.toDF("doc_id", "text", "lang")

  test("iteration 1 matches the closed form recomputed independently") {
    val dim = 8
    val feat = QualityLr.featureRows(docs, col("doc_id"), col("text"), dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val y = corpus.map { case (id, _, lang) =>
      id -> (if (lang == "en") 1L else 0L) }.toMap
    val n = corpus.size
    // r_i = 500000 - 1000000*y_i (sigma(0) = 1/2 exactly); the update
    // rounds half away from zero, matching SQL round on both engines
    val grad = feat.groupBy(_._2).view.mapValues(_.map { case (id, _, x) =>
      (500000L - 1000000L * y(id)) * x }.sum).toMap
    def rnd(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val expected = grad.map { case (b, g) => b -> -rnd(0.5 * g / n) }
    val expBias = -rnd(0.5 * corpus.map { case (id, _, _) =>
      500000L - 1000000L * y(id) }.sum.toDouble / n)
    val w = QualityLr.trainLr(docs, col("doc_id"), col("text"),
        col("lang") === "en", dim = dim, iters = 1, lr = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    expected.foreach { case (b, v) =>
      assert(w(b) == v, s"bucket $b")
    }
    assert(w(-1L) == expBias)
  }

  test("loss decreases across GD iterations on a separable corpus") {
    val losses = Seq(1, 2, 4, 8).map { it =>
      val w = QualityLr.trainLr(docs, col("doc_id"), col("text"),
        col("lang") === "en", dim = 8, iters = it, lr = 0.2)
      QualityLr.logLoss(docs, col("doc_id"), col("text"),
        col("lang") === "en", w, dim = 8)
    }
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a + 1e-6, s"loss went $a -> $b")
    }
  }

  test("the sign decision converges to the labels on a separable corpus") {
    // dim 32: the test tokens land in distinct buckets ('good' and
    // 'awful' collide at 8/16, which the other tests tolerate but a
    // decision test must not)
    val w = QualityLr.trainLr(docs, col("doc_id"), col("text"),
      col("lang") === "en", dim = 32, iters = 12, lr = 0.5)
    val out = QualityLr.scoreLr(docs, col("doc_id"), col("text"), w, 32)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    corpus.foreach { case (id, _, lang) =>
      assert(out(id) == (lang == "en"), s"doc $id")
    }
  }

  test("training is bit-identical under repartitioning — the micro-unit discipline") {
    val a = QualityLr.trainLr(docs, col("doc_id"), col("text"),
        col("lang") === "en", dim = 8, iters = 3, lr = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = QualityLr.trainLr(docs.repartition(7), col("doc_id"),
        col("text"), col("lang") === "en", dim = 8, iters = 3, lr = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("a doc with no tokens scores at the bare bias; null label counts as non-reference") {
    val d2 = (corpus :+ ((7L, "", "en"))).toDF("doc_id", "text", "lang")
    val w = QualityLr.trainLr(d2, col("doc_id"), col("text"),
      col("lang") === "en", dim = 8, iters = 2, lr = 0.5)
    val bias = w.filter(col("bucket") === -1L).head().getLong(1)
    val out = QualityLr.scoreLr(d2, col("doc_id"), col("text"), w, 8)
    assert(out.filter(col("doc_id") === 7L).head().getLong(1) == bias)
    // null predicate -> y = 0 (the logOdds convention): same weights
    // as an explicit non-reference label
    val d3 = corpus.map { case (id, t, lang) =>
      (id, t, if (lang == "de") null else lang) }
      .toDF("doc_id", "text", "lang")
    val w3 = QualityLr.trainLr(d3, col("doc_id"), col("text"),
        col("lang") === "en", dim = 8, iters = 2, lr = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val wRef = QualityLr.trainLr(docs, col("doc_id"), col("text"),
        col("lang") === "en", dim = 8, iters = 2, lr = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(w3 == wRef)
  }

  test("logLoss charges a saturated-sigmoid doc instead of dropping it") {
    // a weight big enough that the margin drives sigma to exactly 0.0
    // in double: every token of doc 1 lands in SOME bucket, so give
    // every bucket (and the bias) a huge positive weight; the one
    // mislabeled doc must CONTRIBUTE a large loss, not null out of avg
    val huge = 100_000_000_000_000L // margin 1e8 nats: exp overflows
    val w = ((-1L to 7L)).map(b => (b, huge)).toDF("bucket", "w_micro")
    val one = Seq((1L, "good nice", "de")).toDF("doc_id", "text", "lang")
    val loss = QualityLr.logLoss(one, col("doc_id"), col("text"),
      col("lang") === "en", w, dim = 8)
    // -ln(Double.MIN_VALUE) = 744.44; an avg that skipped the null
    // row would return NaN (empty mean) here
    assert(!loss.isNaN && loss > 700.0 && loss < 800.0)
  }

  test("loud caps: dim, iters, lr") {
    intercept[IllegalArgumentException] {
      QualityLr.trainLr(docs, col("doc_id"), col("text"),
        col("lang") === "en", dim = 1)
    }
    intercept[IllegalArgumentException] {
      QualityLr.trainLr(docs, col("doc_id"), col("text"),
        col("lang") === "en", iters = 0)
    }
    intercept[IllegalArgumentException] {
      QualityLr.trainLr(docs, col("doc_id"), col("text"),
        col("lang") === "en", lr = 0.0)
    }
  }
}
