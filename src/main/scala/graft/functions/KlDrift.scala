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

  final case class CountsBuf(counts: Seq[Long])

  /** Per-group token counts over the frozen vocabulary (input = one
    * document's token array; index lookup is a broadcast-sized map in
    * the aggregator closure). OOV tokens land in the last slot: they
    * contribute to the source's token total but carry no KL term —
    * the frozen-reference semantics, surfaced rather than silently
    * dropped.
    */
  class CountsAgg(vocab: Seq[String])
      extends org.apache.spark.sql.expressions.Aggregator[Seq[String], CountsBuf, CountsBuf] {
    private val index: Map[String, Int] = vocab.zipWithIndex.toMap
    private val oov = vocab.size

    override def zero: CountsBuf = CountsBuf(Seq.fill(vocab.size + 1)(0L))
    override def reduce(b: CountsBuf, toks: Seq[String]): CountsBuf = {
      val a = b.counts.toArray
      if (toks != null) toks.foreach { t => a(index.getOrElse(t, oov)) += 1L }
      CountsBuf(a.toSeq)
    }
    override def merge(a: CountsBuf, b: CountsBuf): CountsBuf =
      CountsBuf(a.counts.lazyZip(b.counts).map(_ + _))
    override def finish(r: CountsBuf): CountsBuf = r
    override def bufferEncoder: Encoder[CountsBuf] = Encoders.product[CountsBuf]
    override def outputEncoder: Encoder[CountsBuf] = Encoders.product[CountsBuf]
  }
}
