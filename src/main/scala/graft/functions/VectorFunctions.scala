package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * Pure higher-order functions (`zip_with` / `aggregate`) — codegen'd, no
  * UDF, no UDT. All arithmetic is promoted to double *before* summation
  * (left-to-right fold) so results are deterministic and match the DuckDB
  * oracle's `list_dot_product` on `DOUBLE[]` bit-for-bit.
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — native fused expression (one loop, codegen'd;
    * see [[CosineSimilarity]]). `cosineComposed` is the pure-built-in
    * form; both produce bit-identical doubles.
    */
  def cosine(a: Column, b: Column): Column = CosineSimilarity(a, b)

  def cosineComposed(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bucket LSH key: the signs of the first `bits` components, as a
    * bit string. Random-hyperplane LSH with axis-aligned planes — a cheap,
    * deterministic bucketing that turns O(n²) similarity search into a
    * per-bucket search. (With learned embeddings the leading components
    * carry the most variance, so axis planes are a reasonable default; a
    * seeded random rotation slots in here when needed.)
    */
  def signBucket(a: Column, bits: Int): Column =
    array_join(transform(slice(a, 1, bits),
      x => when(x >= 0, lit("1")).otherwise(lit("0"))), "")
}
