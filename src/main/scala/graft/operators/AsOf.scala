package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of ("most recent preceding") lookup.
  *
  * No single reference operator does this, but it is the relational form
  * of the reference's ordered re-pairing machinery (`latencyTimer.scala:
  * 62-68` joins each exit event to its entry context;
  * `MergeByIndex.scala:41` establishes the required total order).
  *
  * Two shapes:
  *  - `lastMatchingInStream`: within ONE ordered stream, attach the value
  *    of the most recent preceding row satisfying a predicate — a window
  *    `last(..., ignoreNulls)` over an unbounded preceding frame. One
  *    shuffle on the keys; no join at all, so it scales better than the
  *    classic union-trick as-of join when both sides share a source.
  *  - `join`: classic as-of join of two tables via the union trick
  *    (tag, union, same window, filter) — equivalent plan, still one
  *    shuffle, never a per-key cross product.
  */
object AsOf {

  def lastMatchingInStream(df: DataFrame, keys: Seq[Column], orderCols: Seq[Column],
                           matches: Column, value: Column, outName: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(outName, last(when(matches, value), ignoreNulls = true).over(w))
  }

  /** As-of join: for each left row, the most recent right row with
    * right.ts <= left.ts on equal keys. `leftCols`/`rightVal` name the
    * output. Union-trick: right rows sort before left rows at equal ts.
    *
    * `tolerance` (same arithmetic as the ts column, e.g. seconds for an
    * epoch-long ts) bounds how stale the match may be — the
    * `merge_asof(tolerance=...)` semantics: a preceding right row older
    * than `left.ts - tolerance` yields null instead. The window carries
    * the matched row's ts in a struct alongside the value, so tolerance
    * is a pure post-filter — still ONE shuffle, no join. Right-side ties
    * at equal (key, ts) are the caller's to resolve (pre-aggregate to
    * one row per (key, ts)) — the window picks an arbitrary peer
    * otherwise.
    *
    * Null-value semantics (pinned in OperatorsSpec): the match is the
    * most recent right ROW — if that row's value column is null, the
    * result is null. A null-valued right row therefore SHADOWS earlier
    * non-null values, exactly like merge_asof; it is not skipped the way
    * a bare `last(value, ignoreNulls)` carry would.
    */
  def join(left: DataFrame, right: DataFrame, key: String, tsName: String,
           rightValName: String, tolerance: Option[Column] = None): DataFrame = {
    val l = left.withColumn("__side", lit(1)).withColumn(rightValName, lit(null).cast(
      right.schema(rightValName).dataType))
    val r = right.select(col(key), col(tsName), col(rightValName))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col(tsName), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned.withColumn("__m",
      last(when(col("__side") === 0,
          struct(col(tsName).as("rts"), col(rightValName).as("rv"))),
        ignoreNulls = true).over(w))
    val valid = tolerance match {
      case Some(tol) =>
        col("__m").isNotNull && (col(tsName) - col("__m.rts") <= tol)
      case None => col("__m").isNotNull
    }
    matched.filter(col("__side") === 1)
      .withColumn(rightValName, when(valid, col("__m.rv")))
      .drop("__side", "__m")
  }
}
