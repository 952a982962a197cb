package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.{MergeTrainer, WordPiece}

/** The incremental merge-election engine against naive per-round
  * recounts: bit-identical elections under both total orders (count
  * and cross-multiplied likelihood), and the scaling claim — round
  * cost tracks touched sequences, not numMerges × corpus symbols —
  * made testable by the engine's work counters.
  */
class MergeTrainerSpec extends AnyFunSuite {

  /** A deterministic synthetic (word, freq) vocabulary with repeated
    * substructure (shared stems/suffixes) so merges genuinely compete
    * and ties occur.
    */
  private def vocab(n: Int, seed: Int): Array[(String, Long)] = {
    val rnd = new scala.util.Random(seed)
    val stems = Array("spark", "merge", "scan", "plan", "shuffle", "join",
      "agg", "sort", "read", "write")
    val sufs = Array("ing", "ed", "er", "s", "ment", "ly", "", "able")
    (0 until n).map { i =>
      val w = stems(rnd.nextInt(stems.length)) +
        sufs(rnd.nextInt(sufs.length)) +
        (if (rnd.nextInt(4) == 0) rnd.nextInt(100).toString else "")
      (w + "_" + (i % 7), (rnd.nextInt(50) + 1).toLong)
    }.toArray.distinct
  }

  /** The naive reference: full recount + argmax scan each round —
    * the exact pre-refactor algorithm, preserved here as the oracle
    * the incremental engine must match merge-for-merge.
    */
  private def naive(vocab: Array[(String, Long)], numMerges: Int,
                    likelihood: Boolean): Seq[(String, String, Long)] = {
    var seqs: Array[(Array[String], Long)] =
      vocab.map { case (w, c) =>
        (if (likelihood) graft.functions.WordPieceKernel.seed(w)
         else graft.functions.BpeKernel.seed(w), c)
      }
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCnt = scala.collection.mutable.HashMap.empty[String, Long]
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symCnt.update(syms(i), symCnt.getOrElse(syms(i), 0L) + c)
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pairCnt.update(k, pairCnt.getOrElse(k, 0L) + c)
          }
          i += 1
        }
      }
      if (pairCnt.isEmpty) done = true
      else if (likelihood) {
        val best = pairCnt.iterator.map { case ((l, rg), p) =>
          ((l, rg), (p, symCnt(l), symCnt(rg)))
        }.reduce((a, b) => if (WordPiece.better(a, b)) a else b)
        val ((l, rg), (p, _, _)) = best
        val m = graft.functions.WordPieceKernel.mergedSymbol(l, rg)
        out += ((l, rg, p))
        seqs = seqs.map { case (syms, c) =>
          (graft.functions.WordPieceKernel.mergePass(syms, l, rg, m), c)
        }
        r += 1
      } else {
        val ((l, rg), total) =
          pairCnt.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((l, rg, total))
        seqs = seqs.map { case (syms, c) =>
          (graft.functions.BpeKernel.mergePass(syms, l, rg), c)
        }
        r += 1
      }
    }
    out.result()
  }

  test("count elections are bit-identical to the naive recount (BPE order)") {
    val v = vocab(400, seed = 7)
    val seqs = v.map { case (w, c) => (graft.functions.BpeKernel.seed(w), c) }
    val inc = MergeTrainer.train(seqs, 60, likelihood = false,
      (l, r) => l + r,
      (s, l, r, _) => graft.functions.BpeKernel.mergePass(s, l, r))
      .map(e => (e.l, e.r, e.pairCnt))
    assert(inc == naive(v, 60, likelihood = false))
  }

  test("likelihood elections are bit-identical to the naive recount (WordPiece order)") {
    val v = vocab(300, seed = 11)
    val seqs = v.map { case (w, c) =>
      (graft.functions.WordPieceKernel.seed(w), c) }
    val inc = MergeTrainer.train(seqs, 40, likelihood = true,
      graft.functions.WordPieceKernel.mergedSymbol,
      (s, l, r, m) => graft.functions.WordPieceKernel.mergePass(s, l, r, m))
      .map(e => (e.l, e.r, e.pairCnt))
    assert(inc == naive(v, 40, likelihood = true))
  }

  test("training past exhaustion stops cleanly in both modes") {
    val v: Array[(String, Long)] = Array(("ab", 3L), ("ba", 1L))
    val seqs = v.map { case (w, c) => (graft.functions.BpeKernel.seed(w), c) }
    val inc = MergeTrainer.train(seqs, 100, likelihood = false,
      (l, r) => l + r,
      (s, l, r, _) => graft.functions.BpeKernel.mergePass(s, l, r))
    // 2 merges exhaust every adjacency; no fabricated rows after
    assert(inc.size == 2 && inc == naive(v, 100, likelihood = false)
      .zip(inc).map { case ((l, r, p), e) =>
        assert((e.l, e.r, e.pairCnt) == ((l, r, p))); e })
  }

  test("round cost no longer scales with numMerges × corpus symbols") {
    // an at-cap-shaped vocabulary: 30k distinct words, ~300k seed
    // symbols, 200 merge rounds. The naive trainer walks EVERY symbol
    // EVERY round: 200 × initialSymbols visits. The incremental
    // engine must come in far under one decade of that — in practice
    // it touches a few× the corpus total across ALL rounds, because
    // each round revisits only the sequences containing the elected
    // pair.
    val rnd = new scala.util.Random(13)
    val stems = (0 until 300).map(i => s"w${i}stem").toArray
    val v = (0 until 30000).map { i =>
      (stems(rnd.nextInt(stems.length)) + "x" + i,
        (rnd.nextInt(20) + 1).toLong)
    }.toArray
    val seqs = v.map { case (w, c) => (graft.functions.BpeKernel.seed(w), c) }
    val stats = new MergeTrainer.Stats
    val merges = MergeTrainer.train(seqs, 200, likelihood = false,
      (l, r) => l + r,
      (s, l, r, _) => graft.functions.BpeKernel.mergePass(s, l, r),
      stats)
    assert(merges.size == 200)
    val naiveWork = 200L * stats.initialSymbols
    assert(stats.touchedSymbols < naiveWork / 10,
      s"incremental touched ${stats.touchedSymbols} symbols vs naive " +
        s"$naiveWork — the refactor's point is lost")
  }
}
