package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{UnigramEncode, UnigramKernel, UnigramModel}
import graft.text.UnigramLm

/** The unigram-LM tokenizer family (Kudo 2018): Viterbi serving
  * (optimality + deterministic tie-breaks + UNK coverage), the
  * forward–backward E-step against hand-computed lattice posteriors,
  * and the EM trainer's contracts (likelihood monotonicity when no
  * prune intervenes, prune-only vocabulary, singles never pruned).
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def model(pieces: (String, Long)*): UnigramModel =
    new UnigramModel(pieces.map(_._1).toArray, pieces.map(_._2).toArray,
      -20000000L, "|")

  private def vit(m: UnigramModel, w: String): (Seq[String], Long, Int) = {
    val (p, s, n) = UnigramKernel.viterbi(w, m.byPiece, m.maxPieceCp,
      -20000000L)
    (p.toSeq, s, n)
  }

  test("viterbi: global optimum beats greedy-longest on trap pieces") {
    val m = model("a" -> -2000000L, "b" -> -2100000L, "ab" -> -1500000L,
      "ba" -> -1600000L, "aba" -> -3900000L)
    // greedy-longest at position 0 of "ababa" takes 'aba' (-3.9M) and
    // ends at [aba, ba] = -5.5M; the optimum is [ab, ab, a] = -5.0M
    assert(vit(m, "ababa") == ((Seq("ab", "ab", "a"), -5000000L, 3)))
    // trailing single: [ab, a] (-3.5M) beats [a, ba] (-3.6M), [aba] (-3.9M)
    assert(vit(m, "aba") == ((Seq("ab", "a"), -3500000L, 2)))
  }

  test("viterbi tie-breaks: fewer pieces, then the longer final piece — deterministic") {
    // [ab] and [a, b] tie on score; fewer pieces wins
    val m1 = model("a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L)
    assert(vit(m1, "ab") == ((Seq("ab"), -2000000L, 1)))
    // [aa, b] and [a, ab] tie on score AND count; longer FINAL piece wins
    val m2 = model("a" -> -1000000L, "b" -> -1000000L,
      "aa" -> -2000000L, "ab" -> -2000000L)
    assert(vit(m2, "aab") == ((Seq("a", "ab"), -3000000L, 2)))
  }

  test("viterbi: uncovered characters ride as UNK singles; coverage is total") {
    val m = model("a" -> -1000000L, "ab" -> -1500000L)
    val (pieces, score, n) = vit(m, "azb")
    assert(pieces == Seq("a", "z", "b"))
    assert(n == 3)
    assert(score == -1000000L + 2 * -20000000L) // z and b both UNK
    assert(pieces.mkString("") == "azb")
  }

  test("UnigramEncode column: per-word segmentation, round trip, null passthrough") {
    val vocab = Seq("a" -> -2000000L, "b" -> -2100000L, "ab" -> -1500000L)
    val rows = Seq(Some("ab  aab\tb"), Some(""), None).toDF("t")
      .select(col("t"), UnigramEncode(col("t"), vocab).as("seg"))
      .collect()
    val seg = rows.find(r => !r.isNullAt(0) && r.getString(0).nonEmpty)
      .get.getString(1)
    assert(seg == "ab|a|ab|b") // words: ab, aab, b — boundaries kept
    assert(seg.replace("|", "") == "abaabb")
    assert(rows.exists(r => !r.isNullAt(0) && r.getString(0).isEmpty &&
      r.getString(1).isEmpty))
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("E-step forward-backward matches the hand-computed lattice posterior") {
    // word "ab", probs {a: .2, b: .25, ab: .4}: Z = .4 + .05,
    // P([ab]) = 8/9, P([a,b]) = 1/9 — counts q, 1-q, 1-q; loglik ln(.45)
    val logp = new java.util.HashMap[String, java.lang.Double]()
    logp.put("a", math.log(0.2)); logp.put("b", math.log(0.25))
    logp.put("ab", math.log(0.4))
    val acc = new java.util.HashMap[String, Double]()
    val lik = UnigramKernel.accumulateExpectedCounts("ab", logp, 2, -20.0,
      1.0, acc)
    assert(math.abs(lik - math.log(0.45)) < 1e-12)
    assert(math.abs(acc.get("ab") - 8.0 / 9.0) < 1e-12)
    assert(math.abs(acc.get("a") - 1.0 / 9.0) < 1e-12)
    assert(math.abs(acc.get("b") - 1.0 / 9.0) < 1e-12)
    // weight scales linearly (the distinct-word reduction)
    val acc3 = new java.util.HashMap[String, Double]()
    UnigramKernel.accumulateExpectedCounts("ab", logp, 2, -20.0, 3.0, acc3)
    assert(math.abs(acc3.get("ab") - 3 * 8.0 / 9.0) < 1e-12)
  }

  test("EM: corpus likelihood is non-decreasing across iterations when nothing prunes") {
    val docs = Seq("ab ab abc cab", "abc ab ba", "cab cab ab b")
      .toDF("text")
    // vocabTarget at seed size: the prune step never fires, so the
    // returned per-iteration likelihoods must be monotone — the EM
    // guarantee itself, measured not assumed
    val (vocab, liks) = UnigramLm.unigramTrain(docs, col("text"),
      vocabTarget = 1000, seedMaxLen = 3, seedSize = 1000, iters = 4)
    assert(liks.length == 4)
    liks.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"likelihood regressed: $liks")
    }
    assert(vocab.nonEmpty)
    // probabilities normalize
    assert(math.abs(vocab.map(_._2).sum - 1.0) < 1e-9)
  }

  test("EM prune: singles survive, multis shrink toward the target, order deterministic") {
    val docs = Seq("ab ab abc cab", "abc ab ba", "cab cab ab b")
      .toDF("text")
    val (vocab, _) = UnigramLm.unigramTrain(docs, col("text"),
      vocabTarget = 5, seedMaxLen = 3, seedSize = 100, iters = 3)
    val singles = vocab.map(_._1).filter(_.length == 1).toSet
    assert(singles == Set("a", "b", "c")) // the corpus alphabet, kept
    val multis = vocab.map(_._1).filterNot(_.length == 1)
    assert(multis.size <= 2) // 5 - 3 singles
    // deterministic: same inputs, same vocabulary
    val (vocab2, _) = UnigramLm.unigramTrain(docs, col("text"),
      vocabTarget = 5, seedMaxLen = 3, seedSize = 100, iters = 3)
    assert(vocab == vocab2)
  }

  test("toMicro: integer micro-nats of ln p") {
    val micro = UnigramLm.toMicro(Seq(("x", 0.5), ("y", 0.25)))
    assert(micro == Seq(("x", math.round(math.log(0.5) * 1e6)),
      ("y", math.round(math.log(0.25) * 1e6))))
  }

  test("trained vocabulary round-trips the training corpus through the serving encoder") {
    val docs = Seq("ab ab abc cab", "abc ab ba", "cab cab ab b")
      .toDF("text")
    val (vocab, _) = UnigramLm.unigramTrain(docs, col("text"),
      vocabTarget = 6, seedMaxLen = 3, seedSize = 100, iters = 2)
    val got = docs.select(col("text"),
        UnigramEncode(col("text"), UnigramLm.toMicro(vocab)).as("seg"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1).replace("|", "")
        == r.getString(0).split("\\s+").mkString(""))
    }
  }
}
