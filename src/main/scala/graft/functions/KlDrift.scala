package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}

/** Streaming source-drift state: a fixed-length token-count buffer
  * aligned to a FROZEN reference vocabulary — the drift-monitor
  * deployment shape (train the reference distribution once batch-side,
  * watch arriving sources against it forever). The buffer is
  * `vocab.size + 1` longs per source — the final slot buckets every
  * out-of-vocabulary token, so state stays bounded by the reference
  * artifact no matter what the stream sends (the HistAgg rule: fixed
  * buffer, elementwise-add merge ⇒ results independent of micro-batch
  * slicing).
  */
object KlDrift {

  final case class CountsBuf(counts: Array[Long])

  /** Per-group token counts over the frozen vocabulary (input = one
    * document's token array; index lookup is a broadcast-sized map in
    * the aggregator closure). OOV tokens land in the last slot: they
    * contribute to the source's token total but carry no KL term —
    * the frozen-reference semantics, surfaced rather than silently
    * dropped.
    *
    * reduce/merge mutate the buffer array in place — a copy-per-row
    * buffer is O(|vocab|) per DOCUMENT, which at a production-sized
    * vocabulary (2^20) would dominate the aggregation; the typed
    * Aggregator contract permits in-place buffer mutation.
    */
  class CountsAgg(vocab: Seq[String])
      extends org.apache.spark.sql.expressions.Aggregator[Seq[String], CountsBuf, CountsBuf] {
    // only the index map is retained — methods never touch the vocab
    // Seq, so the serialized closure ships each vocabulary string once
    private val index: Map[String, Int] = vocab.zipWithIndex.toMap
    private val oov = vocab.size

    override def zero: CountsBuf = CountsBuf(Array.ofDim[Long](oov + 1))
    override def reduce(b: CountsBuf, toks: Seq[String]): CountsBuf = {
      if (toks != null) toks.foreach { t => b.counts(index.getOrElse(t, oov)) += 1L }
      b
    }
    override def merge(a: CountsBuf, b: CountsBuf): CountsBuf = {
      var i = 0
      while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
      a
    }
    override def finish(r: CountsBuf): CountsBuf = r
    override def bufferEncoder: Encoder[CountsBuf] = Encoders.product[CountsBuf]
    override def outputEncoder: Encoder[CountsBuf] = Encoders.product[CountsBuf]
  }
}
