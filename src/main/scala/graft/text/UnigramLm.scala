package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, UnigramKernel}

/** Unigram-LM tokenizer TRAINING (Kudo 2018, the SentencePiece
  * algorithm family) — the EM companion to [[CorpusOps.bpeTrainMerges]]:
  * seed a piece vocabulary from frequent substrings, then alternate
  *   E-step: expected piece counts over every word's segmentation
  *           lattice (forward–backward, [[UnigramKernel]] — the SAME
  *           lattice the serving Viterbi walks), and
  *   M-step: re-normalize counts to probabilities and PRUNE the
  *           lowest-probability multi-character pieces
  * until the vocabulary reaches its target size. Training maximizes
  * corpus likelihood under the unigram model; the per-iteration log
  * likelihood is returned so the EM monotonicity contract is pinned
  * by spec, not assumed.
  *
  * Scale shape (the 100 TB story):
  *   - the corpus reduces ONCE to a (word, freq) frame — E over
  *     DISTINCT words (Zipf: the distinct-word set is orders of
  *     magnitude smaller than the token stream), one corpus scan;
  *   - each E-step is one scan of that frame with the vocabulary
  *     BROADCAST (a config-sized artifact, `seedSize`-bounded with a
  *     loud cap — never a shuffle side);
  *   - per-partition expected counts pre-aggregate in a HashMap
  *     before the vocab-sized (piece, count) shuffle — map-side
  *     combine by construction;
  *   - the driver holds only vocab-sized state; the word frame never
  *     collects. Iterations are a bounded driver loop (the
  *     [[graft.graph.LinkGraph.pageRank]] idiom).
  *
  * Single-code-point pieces are never pruned (total coverage — the
  * serving kernel's no-UNK-on-training-data invariant) and the
  * vocabulary only shrinks after seeding (prune-only, the public
  * algorithm's contract), so characters outside the seed can never
  * smuggle themselves in through the UNK accumulation path.
  */
object UnigramLm {

  /** One corpus scan → (word, freq): the exact
    * [[TextFunctions.tokens]] split, so trainer, encoder, and oracle
    * token duals agree on what a word is.
    */
  def wordFreqs(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextFunctions.tokens(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Seed vocabulary: every substring of length 1..`seedMaxLen` (code
    * points) of every distinct word, weighted by word frequency ×
    * occurrence count; the top `seedSize` by (count DESC, piece ASC —
    * the deterministic tie-break) PLUS every single-code-point piece
    * regardless of rank (coverage). Probabilities initialize
    * proportional to count. The substring explosion stays distributed
    * (one flatMap off the word frame); only the vocab-sized result
    * collects, capped loudly.
    */
  def seedVocab(words: DataFrame, seedMaxLen: Int,
                seedSize: Int): Seq[(String, Double)] = {
    require(seedMaxLen >= 1 && seedMaxLen <= 16,
      s"unigramTrain: seedMaxLen must be in [1, 16], got $seedMaxLen")
    require(seedSize >= 1 && seedSize <= (1 << 20),
      s"unigramTrain: seedSize must be in [1, ${1 << 20}], got $seedSize " +
        "— the vocabulary is a broadcast model artifact, keep it bounded")
    val spark = words.sparkSession
    import spark.implicits._
    val subCounts = words.select(col("word"), col("freq").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val acc = new java.util.HashMap[String, Long]()
        it.foreach { case (w, f) =>
          val b = UnigramKernel.cpBounds(w)
          val n = b.length - 1
          var s = 0
          while (s < n) {
            var e = math.min(n, s + seedMaxLen)
            while (e > s) {
              val piece = w.substring(b(s), b(e))
              acc.put(piece, acc.getOrDefault(piece, 0L) + f)
              e -= 1
            }
            s += 1
          }
        }
        val out = Vector.newBuilder[(String, Long)]
        acc.forEach((k, v) => out += ((k, v)))
        out.result().iterator
      }
      .toDF("piece", "cnt")
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
    // Spark length() counts code points, so `= 1` IS single-code-point
    val singles = subCounts.filter(length(col("piece")) === 1)
    val multis = subCounts.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(seedSize)
    val seed = singles.unionByName(multis)
      .orderBy(col("cnt").desc, col("piece"))
      // bounded by construction: seedSize multis + an alphabet of
      // singles; the limit is the loud cap on a pathological alphabet
      .limit(seedSize + (1 << 16))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
    require(seed.length <= seedSize + (1 << 15),
      s"unigramTrain: seed vocabulary hit ${seed.length} pieces — the " +
        "single-character alphabet alone exceeds the broadcast budget; " +
        "this corpus needs byte-level seeding, not silent truncation")
    val total = seed.map(_._2).sum
    seed.map { case (p, c) => (p, c / total) }.toSeq
  }

  /** One distributed E-step: expected piece counts and the corpus log
    * likelihood under `probs`. The vocabulary broadcasts inside the
    * task closure; per-partition counts pre-aggregate before the
    * vocab-sized shuffle. Counts for pieces OUTSIDE the vocabulary
    * (UNK singles) are dropped — the vocabulary is prune-only.
    */
  def eStep(words: DataFrame, probs: Seq[(String, Double)],
            unkLogp: Double): (Map[String, Double], Double) = {
    val spark = words.sparkSession
    import spark.implicits._
    val logp = new java.util.HashMap[String, java.lang.Double](probs.size * 2)
    probs.foreach { case (p, pr) =>
      require(pr > 0.0, s"unigram eStep: piece '$p' has probability $pr " +
        "— the lattice needs strictly positive weights")
      logp.put(p, math.log(pr))
    }
    val maxCp = if (probs.isEmpty) 1
      else probs.iterator.map(p => p._1.codePointCount(0, p._1.length)).max
    val rows = words.select(col("word"), col("freq").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val acc = new java.util.HashMap[String, Double]()
        var lik = 0.0
        it.foreach { case (w, f) =>
          lik += UnigramKernel.accumulateExpectedCounts(
            w, logp, maxCp, unkLogp, f.toDouble, acc)
        }
        val out = Vector.newBuilder[(String, Boolean, Double)]
        acc.forEach((k, v) => out += ((k, false, v)))
        out += (("", true, lik))
        out.result().iterator
      }
      .toDF("piece", "is_lik", "value")
      .groupBy(col("piece"), col("is_lik")).agg(sum(col("value")).as("value"))
      .collect()
    val counts = rows.filter(!_.getBoolean(1))
      .map(r => (r.getString(0), r.getDouble(2)))
      .filter { case (p, _) => logp.containsKey(p) }
      .toMap
    val lik = rows.filter(_.getBoolean(1)).map(_.getDouble(2)).sum
    (counts, lik)
  }

  /** Full training run: seed → `iters` × (E, M + prune toward
    * `vocabTarget`). Returns the final (piece, probability) vocabulary
    * sorted by (probability DESC, piece ASC) and the per-iteration
    * corpus log likelihoods (each measured under the vocabulary that
    * ENTERED the iteration — non-decreasing while no prune intervenes,
    * the spec-pinned EM contract).
    */
  def unigramTrain(docs: DataFrame, text: Column, vocabTarget: Int,
                   seedMaxLen: Int = 4, seedSize: Int = 2000,
                   iters: Int = 3, pruneFrac: Double = 0.25,
                   unkLogp: Double = -20.0): (Seq[(String, Double)], Seq[Double]) = {
    // validate BEFORE the eager checkpoint: a bad parameter must fail
    // instantly, not after a full corpus word-count job
    requireTrainParams(vocabTarget, iters, pruneFrac)
    unigramTrainFromWords(wordFreqs(docs, text).localCheckpoint(),
      vocabTarget, seedMaxLen, seedSize, iters, pruneFrac, unkLogp)
  }

  private def requireTrainParams(vocabTarget: Int, iters: Int,
                                 pruneFrac: Double): Unit = {
    require(vocabTarget >= 1, s"unigramTrain: vocabTarget must be >= 1")
    require(iters >= 1 && iters <= 64,
      s"unigramTrain: iters must be in [1, 64], got $iters — EM is a " +
        "bounded driver loop")
    require(pruneFrac > 0.0 && pruneFrac < 1.0,
      s"unigramTrain: pruneFrac must be in (0, 1), got $pruneFrac")
  }

  /** [[unigramTrain]] off an already-reduced (word, freq) frame — the
    * caller owns the frame's lifetime (the wordPieceTrainFromWords
    * split): the ONE corpus-sized aggregation happens wherever the
    * words come from (batch reduction, or a streaming fold — the q150
    * twin), and the EM rounds run driver-side against the bounded
    * artifact either way.
    */
  def unigramTrainFromWords(words: DataFrame, vocabTarget: Int,
                            seedMaxLen: Int = 4, seedSize: Int = 2000,
                            iters: Int = 3, pruneFrac: Double = 0.25,
                            unkLogp: Double = -20.0): (Seq[(String, Double)], Seq[Double]) = {
    requireTrainParams(vocabTarget, iters, pruneFrac)
    var vocab = seedVocab(words, seedMaxLen, seedSize)
    val liks = Vector.newBuilder[Double]
    var i = 0
    while (i < iters) {
      val (counts, lik) = eStep(words, vocab, unkLogp)
      liks += lik
      val total = counts.values.sum
      require(total > 0.0, "unigramTrain: E-step produced no counts — " +
        "an empty corpus cannot train a tokenizer")
      val reProbs = vocab.flatMap { case (p, _) =>
        counts.get(p).filter(_ > 0.0).map(c => (p, c / total))
      }
      val isSingle = (p: String) => p.codePointCount(0, p.length) == 1
      val singles = reProbs.filter { case (p, _) => isSingle(p) }
      val multis = reProbs.filterNot { case (p, _) => isSingle(p) }
        .sortBy { case (p, pr) => (-pr, p) }
      val multiTarget = math.max(vocabTarget - singles.size,
        math.ceil(multis.size * (1.0 - pruneFrac)).toInt
          min multis.size)
      val keepMulti =
        if (i == iters - 1) multis.take(math.max(0, vocabTarget - singles.size))
        else multis.take(multiTarget)
      vocab = (singles ++ keepMulti).sortBy { case (p, pr) => (-pr, p) }
      i += 1
    }
    (vocab, liks.result())
  }

  /** The serving artifact: integer micro-nat scores
    * (round(ln p · 1e6)) — what [[graft.functions.UnigramEncode]]
    * carries, integer-exact on any engine.
    */
  def toMicro(vocab: Seq[(String, Double)]): Seq[(String, Long)] =
    vocab.map { case (p, pr) => (p, math.round(math.log(pr) * 1e6)) }

  /** Persist the SERVING artifact (piece, score_micro) — train rarely,
    * encode forever, the [[CorpusOps.saveBpeModel]] lifecycle: the
    * vocabulary is config-sized by the training caps, so one parquet
    * file is the whole model.
    */
  def saveUnigramModel(spark: org.apache.spark.sql.SparkSession,
                       pieces: Seq[(String, Long)], dir: String): Unit = {
    import spark.implicits._
    pieces.toDF("piece", "score_micro")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a [[saveUnigramModel]] artifact back into the piece table
    * [[graft.functions.UnigramEncode]] carries. Sorted (score DESC,
    * piece ASC) for a stable artifact identity; encoding reads the
    * table as a map, so order never changes semantics. Loud cap: a
    * "model" bigger than any vocabulary is a mis-pointed path, not a
    * model.
    */
  def loadUnigramModel(spark: org.apache.spark.sql.SparkSession,
                       dir: String,
                       maxPieces: Int = 1 << 20): Seq[(String, Long)] = {
    val rows = spark.read.parquet(dir)
      .select(col("piece").cast("string"), col("score_micro").cast("long"))
      .limit(maxPieces + 1).collect()
    require(rows.length <= maxPieces,
      s"loadUnigramModel: $dir holds more than $maxPieces pieces — not " +
        "a unigram model artifact")
    rows.map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, sMicro) => (-sMicro, p) }.toSeq
  }

  /** Per-ROW expected piece counts under FIXED probabilities — one
    * E-step exposed as a frame op (what p192 oracle-gates against the
    * closed-form lattice posterior): input (id, word) rows, output
    * (id, piece, e_count) with one fresh lattice walk per row.
    */
  def docExpectedCounts(df: DataFrame, id: Column, word: Column,
                        probs: Seq[(String, Double)],
                        unkLogp: Double = -20.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val logp = new java.util.HashMap[String, java.lang.Double](probs.size * 2)
    probs.foreach { case (p, pr) => logp.put(p, math.log(pr)) }
    val maxCp = if (probs.isEmpty) 1
      else probs.iterator.map(p => p._1.codePointCount(0, p._1.length)).max
    df.select(id.cast("long").as("id"), word.cast("string").as("word"))
      .as[(Long, String)]
      .flatMap { case (i, w) =>
        val acc = new java.util.HashMap[String, Double]()
        UnigramKernel.accumulateExpectedCounts(w, logp, maxCp, unkLogp,
          1.0, acc)
        val out = Vector.newBuilder[(Long, String, Double)]
        acc.forEach((k, v) => out += ((i, k, v)))
        out.result()
      }
      .toDF("id", "piece", "e_count")
  }
}
