package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the 100 TB design rule of SURVEY §7.2
  * ("salting guidance for skew").
  *
  * When to reach for these (and when not to):
  *  - AQE's skew-join handling already splits oversized partitions of
  *    sort-merge joins at runtime; prefer it. Salting is for the shapes
  *    AQE can't rebalance: a handful of hot keys in a shuffled hash join,
  *    stream-static joins, or aggregations whose map-side combine can't
  *    compress (collect_list / collect_set per hot key).
  *  - Both transforms are semantics-preserving: results equal the
  *    unsalted join/aggregation (specs pin this).
  */
object Skew {

  /** Equi-join with the build side replicated across `salts` buckets and
    * the probe side scattered by a deterministic per-row salt, so one hot
    * key spreads over `salts` reducers instead of one straggler.
    *
    * `build` is the smaller-but-not-broadcastable side: each of its rows
    * is duplicated `salts` times (cost: salts × |build| shuffle rows —
    * keep `salts` small). Supports join types where only probe-side rows
    * survive unmatched ("inner", "left_outer", "left_semi", "left_anti");
    * build-side-preserving types would duplicate unmatched build rows.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer", "left_semi", "left_anti").contains(joinType),
      s"saltedJoin: build-side-preserving join type '$joinType' would duplicate rows")
    // The salt must be reproducible (no rand(): retried tasks must land
    // rows in the same bucket) and must scatter rows that SHARE a hot
    // key — so hash the whole row, not the key.
    val p = probe.withColumn("__salt",
      pmod(hash(probe.columns.map(col).toSeq: _*), lit(salts)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Re-aggregatable aggregate spec for [[saltedAgg]]. */
  sealed trait SaltedAgg { def name: String }
  object SaltedAgg {
    case class Sum(c: Column, name: String) extends SaltedAgg
    case class Count(name: String) extends SaltedAgg
    case class Min(c: Column, name: String) extends SaltedAgg
    case class Max(c: Column, name: String) extends SaltedAgg
    case class CollectSet(c: Column, name: String) extends SaltedAgg
  }

  /** Two-phase aggregation over (keys, salt) then keys: the hot key's
    * state is built on `salts` reducers and merged in a second, tiny
    * exchange. Only aggregates whose states merge associatively are
    * offered; `CollectSet` is the one that really needs this (its
    * map-side combine can't shrink a hot key's set below the set itself).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                aggs: Seq[SaltedAgg]): DataFrame = {
    import SaltedAgg._
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(salts)))
    val partial = aggs.map {
      case Sum(c, n)        => sum(c).as(n)
      case Count(n)         => count(lit(1)).as(n)
      case Min(c, n)        => min(c).as(n)
      case Max(c, n)        => max(c).as(n)
      case CollectSet(c, n) => collect_set(c).as(n)
    }
    val merged = aggs.map {
      case Sum(_, n)        => sum(col(n)).as(n)
      case Count(n)         => sum(col(n)).as(n)
      case Min(_, n)        => min(col(n)).as(n)
      case Max(_, n)        => max(col(n)).as(n)
      case CollectSet(_, n) => array_distinct(flatten(collect_list(col(n)))).as(n)
    }
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(merged.head, merged.tail: _*)
  }
}
