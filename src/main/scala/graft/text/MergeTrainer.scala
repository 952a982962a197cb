package graft.text

import scala.collection.mutable

/** The shared INCREMENTAL merge-election engine behind
  * [[CorpusOps.bpeTrainMerges]] (count election) and
  * [[WordPiece.wordPieceTrainFromWords]] (likelihood election).
  *
  * The naive trainer recounts every adjacent pair of every sequence
  * each round — O(numMerges × corpus-symbols), which on an at-cap
  * vocabulary (10⁶ words) with a production merge budget (32k) is
  * ~10¹¹ driver operations. This engine does the textbook incremental
  * maintenance instead (the subword-nmt / HF-tokenizers structure):
  *
  *  - pair counts (and, for the likelihood mode, symbol counts) are
  *    built ONCE and thereafter updated only by per-sequence DELTAS —
  *    a merge touches exactly the sequences that contain the elected
  *    pair (found through an inverted pair → sequence-ids index), and
  *    each touched sequence contributes subtract-old-pairs /
  *    add-new-pairs updates;
  *  - elections pop a LAZY-DELETION max-heap: every count change
  *    pushes a fresh entry; a popped entry is valid iff its stored
  *    counts still match the live tables, so stale entries discard in
  *    O(log n) and the first valid pop IS the argmax under the same
  *    total order the naive scan used.
  *
  * Bit-identity: the election total orders are EXACTLY the previous
  * implementations' (count desc → pair asc for BPE; cross-multiplied
  * BigInt likelihood desc → pair-count desc → pair asc for
  * WordPiece), the merge application is the caller's own serving
  * kernel, and all count updates are commutative integer sums — so
  * the emitted merge tables are bit-identical to the naive trainer's
  * (p58/p159/p198 pin this through their oracles, and the specs pin
  * it directly against a reference recount).
  *
  * Per-round cost: O(touched-symbols + staleness·log heap) instead of
  * O(corpus-symbols) — the [[Stats]] counters make the claim testable
  * on a synthetic at-cap vocabulary.
  */
private[graft] object MergeTrainer {

  /** One elected merge with the stats the callers' output rows carry. */
  final case class Elected(rank: Int, l: String, r: String, merged: String,
                           pairCnt: Long, cntL: Long, cntR: Long)

  /** Work counters for the scaling spec: `touchedSymbols` counts every
    * sequence symbol visited AFTER the initial build (the term that
    * was O(numMerges × corpus-symbols) in the naive trainer).
    */
  final class Stats {
    var initialSymbols: Long = 0L
    var touchedSymbols: Long = 0L
    var heapPushes: Long = 0L
    var rounds: Long = 0L
  }

  private final case class Entry(l: String, r: String, p: Long,
                                 cl: Long, cr: Long)

  /** count election: count desc, then (l, r) asc — the BPE order. */
  private val countOrder: Ordering[Entry] = (x: Entry, y: Entry) => {
    if (x.p != y.p) java.lang.Long.compare(x.p, y.p)
    else {
      val c1 = y.l.compareTo(x.l)
      if (c1 != 0) c1 else y.r.compareTo(x.r)
    }
  }

  /** likelihood election: p/(cl·cr) desc (exact, cross-multiplied in
    * BigInt — a Long product wraps past 2^63 at corpus scale), then
    * raw pair count desc, then (l, r) asc — the WordPiece order.
    */
  private val likelihoodOrder: Ordering[Entry] = (x: Entry, y: Entry) => {
    val cross = BigInt(x.p) * BigInt(y.cl) * BigInt(y.cr) -
      BigInt(y.p) * BigInt(x.cl) * BigInt(x.cr)
    if (cross != 0) cross.signum
    else if (x.p != y.p) java.lang.Long.compare(x.p, y.p)
    else {
      val c1 = y.l.compareTo(x.l)
      if (c1 != 0) c1 else y.r.compareTo(x.r)
    }
  }

  /** Run `numMerges` elections over `seqs` (MUTATED in place).
    * `mergePass(syms, l, r, merged)` must be the caller's serving
    * kernel; `mergedSym` its symbol-composition rule. `likelihood`
    * picks the election order (and whether symbol counts join the
    * validity check).
    */
  def train(seqs: Array[(Array[String], Long)], numMerges: Int,
            likelihood: Boolean, mergedSym: (String, String) => String,
            mergePass: (Array[String], String, String, String) => Array[String],
            stats: Stats = new Stats): Seq[Elected] = {
    val pairCnt = mutable.HashMap.empty[(String, String), Long]
    val symCnt = mutable.HashMap.empty[String, Long]
    // pair -> ids of sequences that contained it at some point (never
    // pruned: a stale id costs one wasted no-op visit, pruning costs
    // a per-visit set delete — staleness validates itself because a
    // merged-away pair simply no longer occurs in the sequence)
    val index = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // symbol -> pairs that involve it (likelihood mode: a symbol-count
    // change re-scores every pair containing it, so those pairs need
    // fresh heap entries even when their own pair count is unchanged)
    val symPairs =
      if (likelihood) mutable.HashMap.empty[String, mutable.HashSet[(String, String)]]
      else null

    def addPairIndex(k: (String, String), si: Int): Unit = {
      index.getOrElseUpdate(k, mutable.HashSet.empty) += si
      if (likelihood) {
        symPairs.getOrElseUpdate(k._1, mutable.HashSet.empty) += k
        symPairs.getOrElseUpdate(k._2, mutable.HashSet.empty) += k
      }
    }

    // initial build — the ONE full pass
    var si = 0
    while (si < seqs.length) {
      val (syms, c) = seqs(si)
      var i = 0
      while (i < syms.length) {
        symCnt.update(syms(i), symCnt.getOrElse(syms(i), 0L) + c)
        if (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCnt.update(k, pairCnt.getOrElse(k, 0L) + c)
          addPairIndex(k, si)
        }
        i += 1
      }
      stats.initialSymbols += syms.length
      si += 1
    }

    val order = if (likelihood) likelihoodOrder else countOrder
    val heap = mutable.PriorityQueue.empty[Entry](order)
    def push(k: (String, String)): Unit = pairCnt.get(k).foreach { p =>
      heap.enqueue(Entry(k._1, k._2, p,
        symCnt.getOrElse(k._1, 0L), symCnt.getOrElse(k._2, 0L)))
      stats.heapPushes += 1
    }
    pairCnt.keysIterator.foreach(push)

    // delta-apply one sequence's recount: sign = -1 removes the old
    // form, +1 adds the new; dirty collects pairs whose live state
    // changed (they need fresh heap entries after the round settles)
    def delta(syms: Array[String], c: Long, sign: Long, sIdx: Int,
              dirty: mutable.HashSet[(String, String)]): Unit = {
      var i = 0
      while (i < syms.length) {
        val s = syms(i)
        val ns = symCnt.getOrElse(s, 0L) + sign * c
        if (ns == 0L) symCnt.remove(s) else symCnt.update(s, ns)
        if (i < syms.length - 1) {
          val k = (s, syms(i + 1))
          val np = pairCnt.getOrElse(k, 0L) + sign * c
          if (np == 0L) pairCnt.remove(k) else pairCnt.update(k, np)
          dirty += k
          if (sign > 0) addPairIndex(k, sIdx)
        }
        i += 1
      }
      stats.touchedSymbols += syms.length
    }

    val out = Seq.newBuilder[Elected]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // pop to the first LIVE entry (stored counts match the tables)
      var elected: Entry = null
      while (elected == null && heap.nonEmpty) {
        val e = heap.dequeue()
        val live = pairCnt.get((e.l, e.r)).contains(e.p) &&
          (!likelihood || (symCnt.getOrElse(e.l, 0L) == e.cl &&
            symCnt.getOrElse(e.r, 0L) == e.cr))
        if (live) elected = e
      }
      if (elected == null) exhausted = true
      else {
        val l = elected.l; val r = elected.r
        val m = mergedSym(l, r)
        out += Elected(rank, l, r, m, elected.p, elected.cl, elected.cr)
        val dirty = mutable.HashSet.empty[(String, String)]
        index.get((l, r)).foreach(_.foreach { sIdx =>
          val (old, c) = seqs(sIdx)
          val next = mergePass(old, l, r, m)
          // a merge strictly shortens; equal length = stale index hit
          if (next.length != old.length) {
            delta(old, c, -1L, sIdx, dirty)
            delta(next, c, +1L, sIdx, dirty)
            seqs(sIdx) = (next, c)
          }
        })
        if (likelihood) {
          // l, r, and m changed symbol counts: every live pair that
          // contains one of them is re-scored
          Seq(l, r, m).foreach(s => symPairs.get(s).foreach(dirty ++= _))
        }
        dirty.foreach(push)
        stats.rounds += 1
        rank += 1
      }
    }
    out.result()
  }
}
