package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational core — the SURVEY §2.11 checklist categories (scan / filter /
  * project / join incl. semi/anti/range/as-of / agg incl. distinct +
  * rollup + cube / window functions / sort / limit / top-k / set ops /
  * scalar functions), each as a declared query with a DuckDB oracle.
  *
  * Conventions shared with the oracle SQL:
  *  - every double aggregate is `round(x, 2)` (sums of 2-dp inputs — the
  *    true decimal value has ≤2 dp so rounding is order-insensitive);
  *  - counts / row_number are BIGINT on both sides;
  *  - every query has a total-order ORDER BY for deterministic output.
  *
  * Scale notes: join sides that are bounded regardless of scale factor
  * (nation = 25 rows, literal bucket tables, per-nation aggregates) are
  * explicitly `broadcast(...)`; sides that grow with the data (customer,
  * orders) are NOT hinted — AQE's runtime statistics pick broadcast at
  * small SF and shuffle join at scale. Aggregates rely on Catalyst's
  * partial aggregation; top-k compiles to TakeOrderedAndProject (no
  * global sort materialization).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  def defs: Seq[(String, Q, Option[String])] = Seq(

    ("q01_pricing_summary", (s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             count(*) AS count_order
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    ("q02_top_orders", (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }, Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    ("q03_revenue_by_segment", (s, d) => {
      val c = Tables.customer(s, d); val o = Tables.orders(s, d); val li = Tables.lineitem(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        // customer scales with SF — no broadcast hint; AQE decides.
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("c_mktsegment"))
    }, Some("""
      SELECT c_mktsegment,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY 1""")),

    ("q04_semi_join", (s, d) => {
      val o = Tables.orders(s, d); val li = Tables.lineitem(s, d)
      o.join(li.filter(col("l_quantity") > 45), col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority, count(*) AS n_orders FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY 1 ORDER BY 1""")),

    ("q05_anti_join", (s, d) => {
      val c = Tables.customer(s, d); val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }, Some("""
      SELECT c_mktsegment, count(*) AS n_customers FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY 1 ORDER BY 1""")),

    ("q06_window_topk", (s, d) => {
      val p = Tables.part(s, d)
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      p.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("rn"))
        .orderBy(col("p_brand"), col("rn"))
    }, Some("""
      SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part) t
      WHERE rn <= 3 ORDER BY p_brand, rn""")),

    ("q07_rollup", (s, d) => {
      val li = Tables.lineitem(s, d)
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))
    }, Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY rf, ls""")),

    ("q08_intersect", (s, d) => {
      val n = Tables.nation(s, d)
      val cn = Tables.customer(s, d).join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
      val sn = Tables.supplier(s, d).join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
      cn.intersect(sn).orderBy(col("n_name"))
    }, Some("""
      SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
      INTERSECT
      SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
      ORDER BY n_name""")),

    ("q09_except", (s, d) => {
      val n = Tables.nation(s, d)
      val cn = Tables.customer(s, d).join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
      val sn = Tables.supplier(s, d).join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
      cn.except(sn).orderBy(col("n_name"))
    }, Some("""
      SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
      EXCEPT
      SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
      ORDER BY n_name""")),

    ("q10_distinct_agg", (s, d) => {
      Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      FROM lineitem GROUP BY 1 ORDER BY 1""")),

    ("q11_cube", (s, d) => {
      Tables.orders(s, d).cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy(col("status"), col("priority"))
    }, Some("""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY status, priority""")),

    ("q12_range_join", (s, d) => {
      val spark = s; import spark.implicits._
      val buckets = Seq(("small", 1, 10), ("medium", 11, 25), ("large", 26, 50))
        .toDF("bucket", "lo", "hi")
      Tables.part(s, d)
        .join(broadcast(buckets), col("p_size").between(col("lo"), col("hi")))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("p_size").cast("long")).as("sum_size"))
        .orderBy(col("bucket"))
    }, Some("""
      WITH buckets(bucket, lo, hi) AS (
        VALUES ('small', 1, 10), ('medium', 11, 25), ('large', 26, 50))
      SELECT bucket, count(*) AS n, CAST(sum(p_size) AS BIGINT) AS sum_size
      FROM part JOIN buckets ON p_size BETWEEN lo AND hi
      GROUP BY 1 ORDER BY 1""")),

    ("q13_scalar_functions", (s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        upper(col("o_orderstatus")).as("status_uc"),
        substring(col("o_orderpriority"), 1, 3).as("pri3"),
        length(col("o_orderpriority")).cast("long").as("pri_len"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        (col("o_totalprice") * 2).as("price_bump"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        round(sqrt(col("o_totalprice")), 6).as("price_sqrt"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey,
             upper(o_orderstatus) AS status_uc,
             substr(o_orderpriority, 1, 3) AS pri3,
             CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(month(o_orderdate) AS INTEGER) AS mo,
             o_totalprice * 2 AS price_bump,
             CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
             round(sqrt(o_totalprice), 6) AS price_sqrt
      FROM orders ORDER BY o_orderkey""")),

    ("q14_monthly_orders", (s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("yr"), col("mo"))
    }, Some("""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(month(o_orderdate) AS INTEGER) AS mo,
             count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")),

    ("q15_correlated_subquery", (s, d) => {
      // per-nation customers above their nation's average balance
      val c = Tables.customer(s, d)
      val avgByNation = c.groupBy(col("c_nationkey").as("nk"))
        .agg(avg(col("c_acctbal")).as("nation_avg"))
      c.join(broadcast(avgByNation), col("c_nationkey") === col("nk"))
        .filter(col("c_acctbal") > col("nation_avg"))
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_above"))
        .orderBy(col("c_nationkey"))
    }, Some("""
      SELECT c_nationkey, count(*) AS n_above FROM customer c1
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c1.c_nationkey)
      GROUP BY 1 ORDER BY 1"""))
  )
}
