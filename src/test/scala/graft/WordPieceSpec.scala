package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{WordPieceEncode, WordPieceKernel, WordPieceModel}
import graft.text.WordPiece

/** The WordPiece tokenizer family (Schuster & Nakajima 2012 / BERT's
  * WordpieceTokenizer): greedy longest-match-first serving (longest
  * wins even when a finer split exists; a dead-end makes the WHOLE
  * word [UNK] even when another segmentation exists — the contrast
  * with the unigram Viterbi lattice), the `##` continuation
  * convention, the long-word guard, and the trainer's LIKELIHOOD
  * merge criterion (count(l,r)/(count(l)·count(r)) — a corpus where
  * it elects a DIFFERENT merge than BPE's raw frequency is pinned).
  */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def model(pieces: String*): WordPieceModel =
    new WordPieceModel(pieces.toArray, "[UNK]", "|", 200)

  private def greedy(m: WordPieceModel, w: String): Seq[String] =
    WordPieceKernel.greedy(w, m.vocab, m.maxPieceCp, m.maxWordCp, "[UNK]")
      .toSeq

  test("greedy takes the LONGEST match even when a finer split exists") {
    val m = model("a", "ab", "##a", "##b", "##ab")
    // at position 0 'ab' beats 'a'; at position 2 '##ab' beats '##a'
    assert(greedy(m, "abab") == Seq("ab", "##ab"))
    assert(greedy(m, "aab") == Seq("a", "##ab"))
  }

  test("greedy dead-end makes the WHOLE word [UNK] even when a segmentation exists") {
    // 'abc' = a ##bc exists, but greedy consumes 'ab' first and
    // strands 'c' (no '##c') — the signature all-or-nothing rule; a
    // lattice DP (the unigram kernel) would find a ##bc
    val m = model("a", "ab", "##a", "##ab", "##bc")
    assert(greedy(m, "abc") == Seq("[UNK]"))
    // and with '##c' present the same walk completes
    val m2 = model("a", "ab", "##a", "##ab", "##bc", "##c")
    assert(greedy(m2, "abc") == Seq("ab", "##c"))
  }

  test("continuation prefix: initial pieces bare, later pieces ##-prefixed; seed agrees") {
    val m = model("un", "##related", "##re", "##lated", "u", "n")
    // '##related' (longest continuation) beats '##re'+'##lated'
    assert(greedy(m, "unrelated") == Seq("un", "##related"))
    assert(WordPieceKernel.seed("abc").toSeq == Seq("a", "##b", "##c"))
    // surrogate pairs seed whole code points
    val emoji = new String(Character.toChars(0x1F600))
    assert(WordPieceKernel.seed("a" + emoji).toSeq ==
      Seq("a", "##" + emoji))
  }

  test("long-word guard: a word over maxWordCp code points is [UNK] outright") {
    val m = new WordPieceModel(Array("a", "##a"), "[UNK]", "|", 4)
    assert(WordPieceKernel.greedy("aaaa", m.vocab, m.maxPieceCp, 4,
      "[UNK]").toSeq == Seq("a", "##a", "##a", "##a"))
    assert(WordPieceKernel.greedy("aaaaa", m.vocab, m.maxPieceCp, 4,
      "[UNK]").toSeq == Seq("[UNK]"))
  }

  test("mergedSymbol drops the right side's continuation prefix") {
    assert(WordPieceKernel.mergedSymbol("a", "##b") == "ab")
    assert(WordPieceKernel.mergedSymbol("##a", "##b") == "##ab")
    assert(WordPieceKernel.mergePass(
      Array("a", "##b", "a", "##b"), "a", "##b", "ab").toSeq ==
      Seq("ab", "ab"))
    // simultaneous left-to-right: the merged symbol never re-pairs
    // within its own round
    assert(WordPieceKernel.mergePass(
      Array("##a", "##a", "##a"), "##a", "##a", "##aa").toSeq ==
      Seq("##aa", "##a"))
  }

  test("WordPieceEncode column: per-word encode, separator, empty and null passthrough") {
    val vocab = Seq("a", "ab", "##a", "##ab")
    val rows = Seq(Some("ab  aab\tzz"), Some(""), None).toDF("t")
    val out = rows.select(WordPieceEncode(col("t"), vocab).as("e"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0).contains("ab|a|##ab|[UNK]"))
    assert(out(1).contains(""))
    assert(out(2).isEmpty)
  }

  test("training elects by LIKELIHOOD, not raw frequency — the BPE contrast") {
    // pair (a,##b) occurs 10×; pair (c,##d) occurs 9×. Standalone
    // 'a'/'b' words inflate count(a) and count(##b) is 10, so
    //   score(a,##b) = 10 / (60·10) ≈ 0.0167
    //   score(c,##d) = 9 / (9·9)    ≈ 0.111
    // — likelihood elects (c,##d) where BPE frequency would take
    // (a,##b).
    val docs = (Seq.fill(10)("ab") ++ Seq.fill(9)("cd") ++
      Seq.fill(50)("a")).toDF("text")
    val wp = WordPiece.wordPieceTrain(docs, col("text"), numMerges = 1)
      .collect().head
    assert(wp.getString(1) == "c" && wp.getString(2) == "##d")
    assert(wp.getLong(4) == 9L && wp.getLong(5) == 9L && wp.getLong(6) == 9L)
    val bpe = graft.text.CorpusOps.bpeTrainMerges(docs, col("text"), 1)
      .collect().head
    assert(bpe.getString(1) == "a" && bpe.getString(2) == "b")
  }

  test("training determinism: exact cross-multiplied ties break on pair count then pair order") {
    // two pairs with IDENTICAL score 2/(2·2): (a,##b) and (c,##d) —
    // the (left, right) ascending tie-break must elect (a,##b) on
    // any engine, any map iteration order
    val docs = Seq.fill(2)(Seq("ab", "cd")).flatten.toDF("text")
    val wp = WordPiece.wordPieceTrain(docs, col("text"), numMerges = 1)
      .collect().head
    assert(wp.getString(1) == "a" && wp.getString(2) == "##b")
  }

  test("trainedVocab covers the corpus: round-trip identity, no [UNK] on training data") {
    val docs = Seq("spark scan merge", "scan the spark row",
      "merge row scan scan").toDF("text")
    val merges = WordPiece.wordPieceTrain(docs, col("text"), numMerges = 20)
    val vocab = WordPiece.trainedVocab(docs, col("text"), merges)
    val out = docs.select(col("text"),
        WordPieceEncode(col("text"), vocab).as("seg"))
      .collect()
    out.foreach { r =>
      val text = r.getString(0)
      val seg = r.getString(1)
      assert(!seg.contains("[UNK]"), s"unexpected UNK in '$seg'")
      assert(seg.replaceAll("\\|(##)?", "") == text.replaceAll("\\s+", ""))
    }
  }

  test("model save/load round-trips the vocabulary and serving agrees") {
    val docs = Seq("spark scan merge", "merge scan").toDF("text")
    val merges = WordPiece.wordPieceTrain(docs, col("text"), numMerges = 8)
    val vocab = WordPiece.trainedVocab(docs, col("text"), merges)
    val dir = graft.sources.Sinks.tempArtifactDir("wordpiece_spec_model")
    WordPiece.saveWordPieceModel(spark, vocab, dir)
    val loaded = WordPiece.loadWordPieceModel(spark, dir)
    assert(loaded.sorted == vocab.sorted)
    val a = docs.select(WordPieceEncode(col("text"), vocab).as("e"))
      .collect().map(_.getString(0)).toSeq
    val b = docs.select(WordPieceEncode(col("text"), loaded).as("e"))
      .collect().map(_.getString(0)).toSeq
    assert(a == b)
  }

  test("a null piece row fails loudly at load time, not with an NPE at serve") {
    import spark.implicits._
    val dir = graft.sources.Sinks.tempArtifactDir("wordpiece_spec_null")
    Seq(Some("ab"), None, Some("##c")).toDF("piece")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      WordPiece.loadWordPieceModel(spark, dir)
    }
    assert(e.getMessage.contains("null piece"))
  }

  test("pairScores matches a hand-computed first-iteration table") {
    // corpus: 'ab' ×2, 'ba' ×1 → seed symbols a,##b (×2) and b,##a
    val docs = Seq("ab ab ba").toDF("text")
    val rows = WordPiece.pairScores(docs, col("text"))
      .orderBy(col("pair_left"), col("pair_right"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // symbol counts: a=2, ##b=2, b=1, ##a=1
    assert(rows.toSeq == Seq(
      ("a", "##b", 2L, 2L, 2L, 0.5),
      ("b", "##a", 1L, 1L, 1L, 1.0)))
  }

  test("duplicate piece in the model artifact fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      model("a", "a").vocab
    }
    assert(ex.getMessage.contains("duplicate piece"))
  }

  test("astral-plane text encodes on code-point boundaries through the column expression") {
    val emoji = new String(Character.toChars(0x1F600))
    val vocab = Seq("a", "##a", emoji, "##" + emoji, "a" + emoji)
    val rows = Seq(s"a$emoji$emoji a${emoji}a").toDF("t")
    val out = rows.select(WordPieceEncode(col("t"), vocab).as("e"))
      .collect().head.getString(0)
    // greedy: 'a😀' (longest, 2 cp) then '##😀'; second word
    // 'a😀a' → 'a😀' + '##a' — never a lone surrogate
    assert(out == s"a$emoji|##$emoji|a$emoji|##a")
  }

  test("a greedy match never splits inside a surrogate pair even under maxPieceCp pressure") {
    val emoji = new String(Character.toChars(0x1F680))
    val m = new WordPieceModel(Array("x", "##" + emoji, "##x"), "[UNK]", "|", 200)
    assert(greedy(m, "x" + emoji + "x") ==
      Seq("x", "##" + emoji, "##x"))
    // the piece-length bound counts code points, not chars: '##🚀'
    // has body length 1 cp (2 UTF-16 chars)
    assert(m.maxPieceCp == 1)
  }
}
