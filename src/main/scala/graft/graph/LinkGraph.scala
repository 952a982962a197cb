package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{SourceFamily, TextFunctions}

/** The crawl-side LINK GRAPH — what a frontier scheduler reads.
  *
  * A 100 TB crawl does not fetch pages in discovery order: it ranks
  * domains by link authority and spends its politeness-limited request
  * budget top-down (the Common Crawl harmonic-centrality move). These
  * two operators are that pipeline stage: harvest every page's
  * outlinks into a domain-family edge list, then rank the families
  * with a bounded-iteration integer PageRank.
  *
  * No reference counterpart (akka-stream-contrib has no graph
  * analytics); the iteration machinery follows the repo's own
  * fixpoint idiom ([[graft.operators.FeedbackLoop]],
  * `Dedup.connectedComponents`): a bounded driver loop over
  * DataFrames with `localCheckpoint(eager = false)` lineage
  * truncation per round.
  */
object LinkGraph {

  /** Outlink edges at DOMAIN-FAMILY granularity: one row per
    * (src_family, dst_family) pair with the raw link count and the
    * count of DISTINCT canonical target URLs (two messy fetches of
    * one page — tracking params, default ports, shuffled query order
    * — collide into one frontier key, so `n_links` 2 / `n_urls` 1
    * reads "one page, linked twice").
    *
    * `provenanceUrl` is the linking page's own URL (the src node);
    * hrefs harvest from the RAW markup (see
    * [[graft.functions.TextFunctions.extractHrefs]] — nav links are
    * real crawl edges). Everything up to the single (src, dst) group
    * aggregate is scan-stage codegen: regex harvest, explode,
    * canonicalization, family extraction are all per-row column
    * programs, so the only shuffle is the final family-pair rollup —
    * family-pair cardinality is O(F²) worst case but in practice the
    * observed-edge set, the same contract as `Dedup.sourceOverlap`.
    */
  def outlinkEdges(pages: DataFrame, provenanceUrl: Column,
                   html: Column): DataFrame = {
    pages
      .select(SourceFamily.familyOf(provenanceUrl).as("src_family"),
        explode(TextFunctions.extractHrefs(html)).as("href"))
      .select(col("src_family"),
        SourceFamily.canonicalizeUrl(col("href")).as("canonical"))
      .select(col("src_family"), col("canonical"),
        SourceFamily.familyOf(col("canonical")).as("dst_family"))
      .groupBy(col("src_family"), col("dst_family"))
      .agg(count(lit(1)).as("n_links"),
        count_distinct(col("canonical")).as("n_urls"))
  }

  /** Bounded-iteration PageRank in exact integer MICRO-UNITS — the
    * frontier-priority score over [[outlinkEdges]] output (or any
    * (src, dst) string edge list; multi-edges are collapsed to the
    * DISTINCT edge set first, the unweighted-PageRank convention).
    *
    * Arithmetic is integer-exact so the score is engine-portable (the
    * p81 micro-unit rule): every rank starts at 1 000 000; each round
    * a node sends `rank div out_degree` along each out-edge (floored
    * ONCE per edge — order-independent under any partitioning), and
    * receives `base + (dampPermille · Σ contribs) div 1000` where
    * `base = (1000 − dampPermille) · 1000`. Floors and dangling nodes
    * (pure sinks: rank in, none out) both LEAK mass — deliberate:
    * renormalizing would reintroduce a global float boundary, and the
    * RANKING a frontier consumes is unaffected. A node with no
    * in-links reports exactly `base`, never disappears (the
    * recallAtK rule: absence is a value, not a missing row).
    *
    * Scale shape: per round, one src-keyed join (ranks against the
    * static out-degree-annotated edge list) and one dst-keyed sum —
    * the canonical two-exchange distributed PageRank step; ranks and
    * nodes stay DataFrames end-to-end (never collected), so a
    * 10⁸-domain web graph runs the same plan. `iters` bounds the
    * driver loop (fixed-depth unrolled, lineage truncated per round);
    * frontier scheduling wants a handful of rounds, not convergence.
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
               dampPermille: Int = 850): DataFrame = {
    require(iters >= 0 && iters <= 50,
      s"pageRank: iters must be in [0, 50], got $iters")
    require(dampPermille >= 0 && dampPermille <= 1000,
      s"pageRank: dampPermille must be in [0, 1000], got $dampPermille")
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // the static side of every round's join: (src, dst, deg)
    val ew = e.join(outdeg, "src").localCheckpoint(eager = false)
    val base = (1000L - dampPermille) * 1000L
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(ranks, ew("src") === ranks("node"))
        .select(ew("dst").as("node"),
          expr("rank_micro div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cs"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampPermille * coalesce(cs, CAST(0 AS BIGINT))) div 1000"))
            .as("rank_micro"))
        .localCheckpoint(eager = false)
    }
    ranks
  }
}
