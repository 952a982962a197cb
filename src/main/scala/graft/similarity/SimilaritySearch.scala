package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *    Queries are broadcast (they are the small side by construction), so
  *    the scan side never shuffles: score + per-query top-k heap
  *    (`Window` + `row_number` after AQE-coalesced partial top-k).
  *  - `lshTopK`: sign-bucket LSH (see [[VectorFunctions.signBucket]]) —
  *    candidates only from the query's bucket, turning the 100 TB scan
  *    into a bucket-pruned scan. Recall/bits tradeoff documented at the
  *    call site.
  */
object SimilaritySearch {

  /** Exact top-k neighbors per query. `queries` must be small (driver
    * broadcasts it). Excludes self-matches. Ranks by rounded cosine
    * (6 dp) with id tiebreak for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                     queries: DataFrame, queryId: Column, queryVec: Column,
                     k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("cv"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("cv"), col("qv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** LSH-bucketed top-k: identical output shape, but candidates are only
    * corpus vectors sharing the query's sign bucket.
    */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, bucketBits: Int = 4): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("cv"),
      VectorFunctions.signBucket(corpusVec, bucketBits).as("bucket"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"),
      VectorFunctions.signBucket(queryVec, bucketBits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("cv"), col("qv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }
}
