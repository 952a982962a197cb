package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Embedding-matrix statistics: exact second moments (covariance) and
  * the PCA machinery built on them — what an embedding-curation pipeline
  * runs before whitening, dimensionality auditing, or choosing an index
  * layout.
  *
  * The covariance is INTEGER-EXACT (the p45/p54/p94 micro-unit rule):
  * embeddings quantize to integer micro-units map-side, and everything
  * summed is a long, so the result is bit-identical under any partition
  * count, merge order, or engine — an oracle checks equality, not
  * tolerance. The only float step (quantization) is per-element and
  * order-free.
  *
  * Scale shape: ONE pass, no row explosion. A typed Aggregator folds
  * each row's d(d+1)/2 upper-triangle products into a fixed-size long
  * buffer under ObjectHashAggregate with map-side partial aggregation —
  * the exchange carries one ~(d²/2)-long buffer per partition, never
  * per-row pairs (the posexplode-pairs alternative would shuffle
  * d²/2 × rows). The d×d result is config-sized — a bounded artifact
  * materialized on the driver, like every quantizer/codebook in
  * [[SimilaritySearch]].
  *
  * Overflow is a LOUD contract, not a silent wrap: accumulation uses
  * `Math.addExact`/`multiplyExact`, so a corpus too large for the
  * micro scale fails with an error naming the fix (lower `scale` —
  * resolution trades against headroom; 10³ covers trillion-row
  * corpora).
  */
object EmbeddingStats {

  val MicroScale = 1000000L

  /** Map-side quantization of a float vector to integer micro-units. */
  def microQuantize(e: Column, scale: Long = MicroScale): Column =
    transform(e, x => round(x.cast("double") * scale).cast("long"))

  /** Scalar int8 quantization audit — the serving dtype of an ANN
    * shard: per vector, symmetric codes `q_i = halfup(127·x_i / m)`
    * with `m = max|x_micro|`, plus the EXACT reconstruction-error
    * numerators in integer arithmetic: `err_i = 127·x_i − q_i·m` (the
    * ×127-scaled residual), so Σerr², Σq, Σ|q|, and the saturation
    * count pin every code with no float anywhere after
    * micro-quantization. The signed half-up quotient uses the
    * magnitude form of the `(2a+b) div 2b` idiom — Spark `div`
    * truncates and DuckDB `//` floors, so they agree only on
    * nonnegative operands (the p81 rule). An all-zero vector
    * quantizes to all-zero codes (m = 0 guard), not a division error.
    *
    * Scale shape: a pure map-side column program (HOF transforms +
    * folds, fully codegen'd) — zero shuffles; at 100 TB this runs in
    * the scan stage of the shard writer.
    *
    * Output: (vec_id, max_abs_micro, sum_q, sum_abs_q, n_saturated,
    * sq_err_num); the error denominator 127²·scale² is implied.
    */
  def int8Quantize(df: DataFrame, id: Column, vec: Column,
                   scale: Long = MicroScale): DataFrame = {
    df.select(id.cast("long").as("vec_id"), microQuantize(vec, scale).as("em"))
      .withColumn("max_abs_micro",
        coalesce(array_max(transform(col("em"), x => abs(x))), lit(0L)))
      .withColumn("q", expr(
        """transform(em, x -> CASE WHEN max_abs_micro = 0 THEN 0L
             WHEN x >= 0 THEN (2 * 127 * x + max_abs_micro)
                             div (2 * max_abs_micro)
             ELSE -((2 * 127 * -x + max_abs_micro)
                    div (2 * max_abs_micro)) END)"""))
      .select(col("vec_id"), col("max_abs_micro"),
        expr("aggregate(q, 0L, (a, x) -> a + x)").as("sum_q"),
        expr("aggregate(q, 0L, (a, x) -> a + abs(x))").as("sum_abs_q"),
        expr("""aggregate(q, 0L, (a, x) ->
             a + CASE WHEN abs(x) = 127 THEN 1L ELSE 0L END)""")
          .as("n_saturated"),
        expr("""aggregate(zip_with(em, q,
               (x, c) -> 127 * x - c * max_abs_micro),
             0L, (a, e) -> a + e * e)""").as("sq_err_num"))
  }

  /** Covariance fold state: row count, per-dim sums, upper-triangle
    * product sums (row-major: (0,0),(0,1)..(0,d-1),(1,1),..).
    */
  case class CovBuf(n: Long, sums: Array[Long], prods: Array[Long])

  /** One-pass exact second-moment fold over quantized vectors. */
  class CovMoments(d: Int) extends Aggregator[Seq[Long], CovBuf, CovBuf] {
    private val tri = d * (d + 1) / 2
    override def zero: CovBuf =
      CovBuf(0L, Array.ofDim[Long](d), Array.ofDim[Long](tri))
    override def reduce(b: CovBuf, row: Seq[Long]): CovBuf = {
      require(row != null && row.length == d,
        s"covariance: embedding dim ${if (row == null) "null" else row.length}, expected $d")
      val v = row.toArray
      var i = 0; var k = 0
      while (i < d) {
        b.sums(i) = Math.addExact(b.sums(i), v(i))
        var j = i
        while (j < d) {
          b.prods(k) = Math.addExact(b.prods(k), Math.multiplyExact(v(i), v(j)))
          k += 1; j += 1
        }
        i += 1
      }
      CovBuf(b.n + 1, b.sums, b.prods)
    }
    override def merge(a: CovBuf, c: CovBuf): CovBuf = {
      var i = 0
      while (i < d) { a.sums(i) = Math.addExact(a.sums(i), c.sums(i)); i += 1 }
      var k = 0
      while (k < tri) { a.prods(k) = Math.addExact(a.prods(k), c.prods(k)); k += 1 }
      CovBuf(a.n + c.n, a.sums, a.prods)
    }
    override def finish(b: CovBuf): CovBuf = b
    override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
    override def outputEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
  }

  /** The ONE finalize shared by every covariance surface (batch,
    * streaming twin, segment lifecycle), so they cannot drift:
    * numerators `cov_num(i,j) = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ` from a moment
    * buffer, as a (config-sized) DataFrame. 1-based (i, j), i ≤ j.
    */
  def numeratorRows(spark: org.apache.spark.sql.SparkSession,
                    buf: CovBuf, dim: Int): DataFrame = {
    import spark.implicits._
    val rows = for {
      i <- 0 until dim
      j <- i until dim
    } yield {
      val k = i * dim - i * (i - 1) / 2 + (j - i)
      ((i + 1).toLong, (j + 1).toLong,
        Math.subtractExact(Math.multiplyExact(buf.n, buf.prods(k)),
          Math.multiplyExact(buf.sums(i), buf.sums(j))))
    }
    rows.toDF("i", "j", "cov_num")
  }

  /** One-pass moment fold over a (batch) vector column. */
  def momentFold(df: DataFrame, vec: Column, dim: Int,
                 scale: Long = MicroScale): CovBuf = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(microQuantize(vec, scale).as("em"))
      .as[Seq[Long]]
      .select(new CovMoments(dim).toColumn)
      .head()
  }

  /** Upper-triangle covariance NUMERATORS over micro-quantized vectors:
    * no division, so no floor-semantics drift between engines and no
    * float anywhere after quantization.
    */
  def covarianceNumerators(df: DataFrame, vec: Column, dim: Int,
                           scale: Long = MicroScale): DataFrame =
    numeratorRows(df.sparkSession, momentFold(df, vec, dim, scale), dim)

  /** Persist one corpus slice's moment buffer as a segment artifact —
    * the incremental path: embedding statistics maintained across
    * crawl days WITHOUT re-reading old embeddings (moments are
    * associative, exactly like the sketch segments in
    * [[graft.dedup.Dedup.writeSketchSegment]]). One row per segment:
    * (n, sums, prods).
    */
  def writeMomentSegment(df: DataFrame, vec: Column, dim: Int,
                         dir: String, label: String,
                         scale: Long = MicroScale): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val buf = momentFold(df, vec, dim, scale)
    Seq((buf.n, buf.sums.toSeq, buf.prods.toSeq))
      .toDF("n", "sums", "prods")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/segment=$label")
  }

  /** Serve covariance from a [[writeMomentSegment]] artifact: read every
    * segment row (a bounded artifact — one row per crawl day), merge
    * the buffers (exact integer sums, order-free), finalize through the
    * SAME [[numeratorRows]] the one-pass build uses. Equals the
    * one-pass covariance over the union of all segments' vectors —
    * an identity, not an approximation (p101 shares p100's oracle).
    */
  def servedCovariance(spark: org.apache.spark.sql.SparkSession,
                       dir: String, dim: Int): DataFrame = {
    val segs = spark.read.parquet(dir)
      .select(col("n"), col("sums"), col("prods")).collect()
    require(segs.nonEmpty, s"servedCovariance: no segments under $dir")
    val merged = segs.map { r =>
      val sums = r.getSeq[Long](1).toArray
      require(sums.length == dim,
        s"servedCovariance: segment dim ${sums.length}, expected $dim")
      CovBuf(r.getLong(0), sums, r.getSeq[Long](2).toArray)
    }.reduce((a, b) => new CovMoments(dim).merge(a, b))
    numeratorRows(spark, merged, dim)
  }

  /** Dominant eigenvector of the covariance by power iteration on the
    * DRIVER — the matrix is d×d config-sized data; iterating it where
    * the quantizers and codebooks already live costs nothing and keeps
    * the cluster pass count at ONE (the moment fold). Deterministic:
    * fixed uniform start, fixed iteration count, double arithmetic —
    * same input, same component, bit-for-bit. Returns (component,
    * eigenvalue in cov_num units).
    */
  def dominantComponent(covNum: Array[(Long, Long, Long)], dim: Int,
                        iters: Int = 200): (Array[Double], Double) =
    topComponents(covNum, dim, k = 1, iters).head

  /** Top-k components by power iteration with deflation (after each
    * component, subtract λ·vvᵀ and iterate the remainder) — same
    * driver-side, deterministic, sign-canonical contract as the
    * dominant component. Eigenvalues come out non-increasing.
    */
  def topComponents(covNum: Array[(Long, Long, Long)], dim: Int, k: Int,
                    iters: Int = 2000): Seq[(Array[Double], Double)] = {
    require(k >= 1 && k <= dim, s"topComponents: k must be in [1, $dim], got $k")
    val m = Array.ofDim[Double](dim, dim)
    covNum.foreach { case (i, j, c) =>
      m(i.toInt - 1)(j.toInt - 1) = c.toDouble
      m(j.toInt - 1)(i.toInt - 1) = c.toDouble
    }
    val found = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    (0 until k).map { _ =>
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      var lambda = 0.0
      var it = 0
      while (it < iters) {
        val w = Array.tabulate(dim) { i =>
          var s = 0.0; var j = 0
          while (j < dim) { s += m(i)(j) * v(j); j += 1 }
          s
        }
        // re-orthogonalize against found components every step: pure
        // deflation drifts when eigenvalues are close (the iterate
        // re-acquires a removed direction through rounding); explicit
        // Gram-Schmidt pins orthogonality at machine precision
        found.foreach { u =>
          val d = w.zip(u).map { case (a, b) => a * b }.sum
          var i = 0
          while (i < dim) { w(i) -= d * u(i); i += 1 }
        }
        val norm = math.sqrt(w.map(x => x * x).sum)
        require(norm > 0, "topComponents: rank exhausted before k components")
        v = w.map(_ / norm)
        lambda = norm
        it += 1
      }
      // canonical sign: first nonzero coordinate positive, so the
      // component is unique (±v are the same eigenvector)
      val firstNz = v.find(math.abs(_) > 1e-12).getOrElse(1.0)
      val canon = if (firstNz < 0) v.map(-_) else v
      found += canon
      // deflate: remove this component's subspace before the next
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { m(i)(j) -= lambda * canon(i) * canon(j); j += 1 }
        i += 1
      }
      (canon, lambda)
    }
  }

  /** Map-side k-dim PCA coordinates: one array column of projections. */
  def projectK(vec: Column, components: Seq[Array[Double]]): Column =
    array(components.map(c => project(vec, c)): _*)

  /** Map-side projection of each embedding onto a fixed component —
    * a pure scan-stage dot product (broadcast-free: the component rides
    * the plan as a literal array, the serialized-artifact pattern of
    * [[graft.functions.BpeEncode]]'s merge table).
    */
  def project(vec: Column, component: Array[Double]): Column = {
    val comp = array(component.map(lit): _*)
    aggregate(zip_with(vec, comp, (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x)
  }
}
