package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rules — the constraint report a pipeline
  * runs before promoting a batch (null/range/consistency checks, key
  * uniqueness, referential integrity), in the style of the
  * expectation-suite tools (Deequ, dbt tests) but as plain Catalyst
  * programs so every rule inherits pushdown, codegen, and AQE.
  *
  * Output contract: one `(rule, violations)` row per rule — violations
  * is an exact count, zero rows are reported too (a clean rule is
  * EVIDENCE, not absence; the report's shape never depends on the
  * data). The assembled report is deterministic and oracle-checkable.
  *
  * Scale shapes:
  *   - [[rowRules]]: ALL row-local predicates over one table fold in a
  *     SINGLE conditional aggregation over a SINGLE scan — adding a
  *     rule adds a sum(when(...)) column, never a pass. The scan prunes
  *     to exactly the columns the predicates touch.
  *   - [[uniqueKeyRule]]: count(*) − count(distinct key) — one
  *     map-combined aggregation. Null keys count as violations (a
  *     nullable "unique key" is already a violation).
  *   - [[orphanRule]]: LEFT ANTI join child→parent keyed on the FK —
  *     one shuffle (or broadcast when the parent's key set is small);
  *     "parent without children" is the same rule with the sides
  *     swapped.
  */
object DataQuality {

  /** One-pass block of row-local rules over one table: each rule is a
    * VIOLATION predicate (true = row violates).
    */
  def rowRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "rowRules: empty rule list")
    val aggs = rules.map { case (n, p) =>
      sum(when(p, 1L).otherwise(0L)).as(s"__$n")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val kvs = rules.flatMap { case (n, _) =>
      Seq(lit(n), coalesce(col(s"__$n"), lit(0L)))
    }
    one.select(explode(map(kvs: _*)).as(Seq("rule", "violations")))
  }

  /** Key-uniqueness rule: rows beyond the first per key value, plus
    * null-keyed rows (count(distinct) ignores nulls BY DESIGN here: a
    * null in a declared unique key is itself a violation).
    */
  def uniqueKeyRule(name: String, df: DataFrame, key: Column): DataFrame =
    df.agg((count(lit(1)) - count_distinct(key)).as("violations"))
      .select(lit(name).as("rule"), col("violations"))

  /** Referential rule: rows of `child` whose `childKey` matches no
    * `parentKey` in `parent`. Swap the sides for "parent with no
    * children" (completeness instead of integrity).
    */
  def orphanRule(name: String, child: DataFrame, childKey: Column,
                 parent: DataFrame, parentKey: Column): DataFrame =
    child.join(parent.select(parentKey.as("__pk")).distinct(),
        childKey === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("rule"), col("violations"))

  /** Assemble rule blocks into the report. */
  def report(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "report: no rule blocks")
    parts.reduce(_.unionByName(_))
  }
}
