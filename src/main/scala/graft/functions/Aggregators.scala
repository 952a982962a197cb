package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s — the engine's surface for the reference's
  * user-supplied `(seed, aggregate)` folds (`TimeWindow.scala:33`,
  * `Accumulate.scala:26` in akka/akka-stream-contrib take arbitrary
  * aggregate lambdas; Spark's equivalent contract is
  * `Aggregator[IN, BUF, OUT]` registered via `functions.udaf`).
  *
  * Buffers must be commutative-mergeable (Spark merges partial buffers in
  * shuffle order). `SumSqCents` folds in exact integer cents so results
  * are bit-stable regardless of merge order — the pattern to follow for
  * oracle-verifiable custom folds over doubles.
  */
object Aggregators {

  /** Sum of squared cent-values: sum(round(x*100)^2) as Long. */
  object SumSqCents extends Aggregator[Double, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Double): Long = {
      val cents = math.round(a * 100)
      b + cents * cents
    }
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Elementwise (lo, hi) buffer over fixed-dim vectors. */
  case class VecMinMaxBuf(lo: Seq[Double], hi: Seq[Double])

  /** Elementwise min/max over a vector column in ONE map-side pass —
    * the SQ8 model fold ([[graft.similarity.SimilaritySearch]] trains
    * per-dim (lo, hi) with it), replacing the posexplode + groupBy(dim)
    * shuffle of 64× the rows with a dim-sized buffer per partition.
    * Order-insensitive merge (min/max are commutative), so results are
    * deterministic under any shuffle order — and exactly equal to the
    * exploded form's min/max per dim, INCLUDING NaN components: the
    * fold orders NaN as the largest double (java.lang.Double.compare,
    * Spark's min/max aggregate ordering), so a NaN never becomes a
    * dim's lo while any non-NaN value exists — math.min/max would
    * propagate one NaN into both bounds and silently poison the model.
    */
  object VecMinMax extends Aggregator[Seq[Double], VecMinMaxBuf, VecMinMaxBuf] {
    private def fold(b: VecMinMaxBuf, lo2: Seq[Double],
                     hi2: Seq[Double]): VecMinMaxBuf =
      if (b.lo.isEmpty) VecMinMaxBuf(lo2, hi2)
      else {
        require(b.lo.length == lo2.length,
          s"VecMinMax: mixed dims ${b.lo.length} vs ${lo2.length}")
        val lo = new Array[Double](b.lo.length)
        val hi = new Array[Double](b.lo.length)
        var i = 0
        while (i < lo.length) {
          lo(i) = if (java.lang.Double.compare(lo2(i), b.lo(i)) < 0) lo2(i)
            else b.lo(i)
          hi(i) = if (java.lang.Double.compare(hi2(i), b.hi(i)) > 0) hi2(i)
            else b.hi(i)
          i += 1
        }
        VecMinMaxBuf(lo.toSeq, hi.toSeq)
      }

    override def zero: VecMinMaxBuf = VecMinMaxBuf(Seq.empty, Seq.empty)
    override def reduce(b: VecMinMaxBuf, a: Seq[Double]): VecMinMaxBuf =
      if (a == null) b else fold(b, a, a)
    override def merge(b1: VecMinMaxBuf, b2: VecMinMaxBuf): VecMinMaxBuf =
      if (b2.lo.isEmpty) b1 else fold(b1, b2.lo, b2.hi)
    override def finish(r: VecMinMaxBuf): VecMinMaxBuf = r
    override def bufferEncoder: Encoder[VecMinMaxBuf] =
      Encoders.product[VecMinMaxBuf]
    override def outputEncoder: Encoder[VecMinMaxBuf] =
      Encoders.product[VecMinMaxBuf]
  }

  /** One prioritized URL for bounded smallest-k selection. */
  case class PUrl(prio: String, url: String)

  /** Bounded smallest-k buffer (kept sorted ascending, length ≤ k). */
  case class UrlTopKBuf(items: Seq[PUrl])

  /** Bounded smallest-k by (prio ASC, url ASC) over strings — the
    * [[TopK]] pattern for the crawl worklist: every scan partition
    * reduces its URLs into a ≤k buffer locally (map-side PARTIAL under
    * ObjectHashAggregate), so the shuffle moves one k-row buffer per
    * (domain, partition) instead of a domain's whole URL space — the
    * single-task straggler a `row_number().over(partitionBy(domain))`
    * window would make of a 10⁹-URL domain. EXACT duplicates dedup
    * inside the buffer (a URL discovered by many pages must not take
    * two worklist slots), which is k-bounded-exact: a duplicate beyond
    * the k-th smallest can never surface. Merge is order-insensitive,
    * so results are deterministic under any shuffle order.
    */
  class UrlTopK(k: Int) extends Aggregator[PUrl, UrlTopKBuf, UrlTopKBuf] {
    private def better(a: PUrl, b: PUrl): Boolean =
      a.prio < b.prio || (a.prio == b.prio && a.url < b.url)

    // the buffer stays a Vector through every insert so the hot
    // fast-reject path (length/last on a FULL buffer — the common case
    // once a partition has seen k URLs) is O(1), not the O(k) a
    // List-backed Seq would pay per rejected element
    private def insert(buf0: Seq[PUrl], x: PUrl): Seq[PUrl] = {
      val buf = buf0 match {
        case v: Vector[PUrl] => v
        case other => other.toVector
      }
      if (buf.length >= k && !better(x, buf.last)) buf
      else {
        val (before, after) = buf.span(better(_, x))
        if (after.headOption.contains(x)) buf
        else ((before :+ x) ++ after).take(k)
      }
    }

    override def zero: UrlTopKBuf = UrlTopKBuf(Seq.empty)
    override def reduce(b: UrlTopKBuf, a: PUrl): UrlTopKBuf =
      UrlTopKBuf(insert(b.items, a))
    override def merge(b1: UrlTopKBuf, b2: UrlTopKBuf): UrlTopKBuf =
      UrlTopKBuf(b2.items.foldLeft(b1.items)(insert))
    override def finish(r: UrlTopKBuf): UrlTopKBuf = r
    override def bufferEncoder: Encoder[UrlTopKBuf] =
      Encoders.product[UrlTopKBuf]
    override def outputEncoder: Encoder[UrlTopKBuf] =
      Encoders.product[UrlTopKBuf]
  }

  /** One scored candidate for bounded top-k selection. */
  case class Scored(cos: Double, neighbor_id: Long)

  /** Bounded top-k buffer (kept sorted best-first, length ≤ k). */
  case class TopKBuf(items: Seq[Scored])

  /** Bounded top-k by (cos DESC, neighbor_id ASC) — the two-phase rank
    * for similarity search. As a typed Aggregator it runs under
    * ObjectHashAggregate with map-side PARTIAL aggregation: every scan
    * partition reduces its candidates into a ≤k buffer locally, and the
    * shuffle moves one k-row buffer per (query, partition) instead of
    * every scored candidate. A `row_number().over(partitionBy(query))`
    * rank funnels ALL of a query's candidates into a single task — the
    * straggler this replaces for brute-force top-k with few queries over
    * a huge corpus.
    *
    * Merge is order-insensitive (positional merge of two sorted bounded
    * lists), so results are deterministic regardless of shuffle order —
    * identical output to the window form, including tie-breaks.
    */
  class TopK(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {
    private def better(a: Scored, b: Scored): Boolean =
      a.cos > b.cos || (a.cos == b.cos && a.neighbor_id < b.neighbor_id)

    private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] =
      if (buf.length >= k && !better(x, buf.last)) buf
      else {
        val (before, after) = buf.span(better(_, x))
        ((before :+ x) ++ after).take(k)
      }

    override def zero: TopKBuf = TopKBuf(Seq.empty)
    override def reduce(b: TopKBuf, a: Scored): TopKBuf = TopKBuf(insert(b.items, a))
    override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
      TopKBuf(b2.items.foldLeft(b1.items)(insert))
    override def finish(r: TopKBuf): TopKBuf = r
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Count-min sketch cells: depth × width Long matrix, row-major. */
  case class CMSketch(cells: Array[Long])

  /** Count-min sketch over a token stream — frequency estimation in
    * FIXED memory (depth·width longs) regardless of vocabulary size, the
    * sketch that keeps heavy-hitter state bounded where an exact
    * `groupBy(token)` holds one row per distinct token (unbounded
    * streaming state; billions of cells at 100 TB).
    *
    * Row `j`'s bucket for a token is the first 24 bits of
    * `md5("j:" + token)` mod `width` — pure md5 arithmetic, so BOTH the
    * SQL estimate expression and an oracle can recompute the exact same
    * sketch (see p38). `estimate(tok) = min over rows of cell[j][bucket]`
    * never under-counts (classic CM guarantee, pinned in PropertySpec);
    * merge is elementwise add, so partial aggregation and shuffle order
    * cannot change the result.
    */
  class CountMin(width: Int, depth: Int)
      extends Aggregator[String, CMSketch, CMSketch] {
    require(width > 0 && depth > 0, s"width/depth must be positive: $width/$depth")

    override def zero: CMSketch = CMSketch(new Array[Long](width * depth))
    override def reduce(b: CMSketch, tok: String): CMSketch = {
      // null tokens are skipped, matching the SQL side: estimateCol and
      // the oracle both propagate null through md5(NULL) → NULL, so
      // counting a null here would silently inflate the buckets of the
      // literal string "null" (s"$j:$tok" interpolation) and diverge
      if (tok == null) return b
      var j = 0
      while (j < depth) {
        b.cells(j * width + CountMin.bucket(j, tok, width)) += 1
        j += 1
      }
      b
    }
    override def merge(a: CMSketch, b: CMSketch): CMSketch = {
      var i = 0
      while (i < a.cells.length) { a.cells(i) += b.cells(i); i += 1 }
      a
    }
    override def finish(r: CMSketch): CMSketch = r
    override def bufferEncoder: Encoder[CMSketch] = Encoders.product[CMSketch]
    override def outputEncoder: Encoder[CMSketch] = Encoders.product[CMSketch]
  }

  object CountMin {
    private val digests = ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

    /** First 24 bits of md5("j:tok") mod width — identical to the SQL
      * form `conv(substring(md5('j:tok'), 1, 6), 16, 10) % width`.
      */
    def bucket(j: Int, tok: String, width: Int): Int = {
      val md = digests.get()
      md.reset()
      val d = md.digest(s"$j:$tok".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)) % width
    }

    /** Exact JVM-side estimate from a finished sketch (for tests). */
    def estimate(cells: Array[Long], tok: String, width: Int, depth: Int): Long =
      (0 until depth).map(j => cells(j * width + bucket(j, tok, width))).min

    /** Column-side estimate over a flattened cells array — the same
      * md5-bucket arithmetic as [[bucket]], evaluated in codegen.
      */
    def estimateCol(sk: org.apache.spark.sql.Column,
                    token: org.apache.spark.sql.Column,
                    width: Int, depth: Int): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.functions._
      least((0 until depth).map { j =>
        val b = conv(substring(md5(concat(lit(s"$j:"), token).cast("binary")), 1, 6),
          16, 10).cast("long") % width
        element_at(sk, (b + j * width + 1).cast("int"))
      }: _*)
    }

    /** Shared (token, est, exact) probe report for p38 and its streaming
      * twin — ONE definition so batch and streaming scoring stay
      * identical. `sk` must be a single-row frame with the flattened
      * cells in column `sk`; `exact` must carry (tok, __exact) rows for
      * whatever probes have nonzero exact counts.
      */
    def probeReport(sk: org.apache.spark.sql.DataFrame,
                    exact: org.apache.spark.sql.DataFrame,
                    probes: Seq[String], width: Int,
                    depth: Int): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions._
      sk.select(explode(array(probes.map(lit(_)): _*)).as("token"), col("sk"))
        .withColumn("est", estimateCol(col("sk"), col("token"), width, depth))
        .join(exact, col("token") === col("tok"), "left")
        .select(col("token"), col("est"),
          coalesce(col("__exact"), lit(0L)).as("exact"))
        .orderBy(col("token"))
    }
  }
}
