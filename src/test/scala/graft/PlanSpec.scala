package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the scale claims of COVERAGE.md, pinned so
  * a refactor that silently breaks pushdown, pruning, or the one-shuffle
  * dedup shape fails CI rather than a 100 TB run.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  private def countExchanges(p: String): Int =
    "Exchange (hash|range)partitioning".r.findAllIn(p).length

  test("q01 prunes the lineitem scan to the 5 needed columns") {
    val scanCols = SparkEntry.queries("q01_pricing_summary")(spark, TestSpark.sf)
      .queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s.requiredSchema.fieldNames.toSet
      }.head
    assert(scanCols == Set("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount"), s"scan reads: $scanCols")
  }

  test("filters reach the parquet scan as pushed filters") {
    val df = Tables.lineitem(spark, TestSpark.sf)
      .filter(col("l_quantity") > 45).select(col("l_orderkey"))
    val p = df.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*GreaterThan\\(l_quantity".r.findFirstIn(p).isDefined,
      s"quantity filter not pushed: $p")
  }

  test("q02 top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q02_top_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q12 broadcasts its bounded side") {
    val p = plan("q12_range_join")
    assert(p.contains("Broadcast"), p)
  }

  test("q01 aggregates with exactly one exchange (partial+final agg)") {
    // groupBy → partial agg, one hash exchange, final agg; orderBy adds a
    // range exchange. Anything more means partial aggregation broke.
    val p = plan("q01_pricing_summary")
    assert(countExchanges(p) == 2, s"expected agg+sort exchanges only:\n$p")
  }

  test("p05 minhash computes signatures map-side: no exchange before the first aggregate") {
    val p = plan("p05_minhash_pairs")
    // band groupBy + distinct + orderBy = 3 exchanges; the signature
    // itself must not add one (no shingle explode shuffle).
    assert(countExchanges(p) <= 3, s"extra shuffle in minhash plan:\n$p")
    assert(!p.contains("Window"), s"minhash should not need a window:\n$p")
  }

  test("q36 salting reaches the shuffle keys") {
    val p = plan("q36_salted_revenue")
    assert("hashpartitioning\\([^)]*__salt".r.findFirstIn(p).isDefined,
      s"__salt not in any exchange key:\n$p")
  }

  test("p12 IVF keeps centroid work broadcast and exchanges bounded") {
    val p = plan("p12_ann_ivf")
    assert(p.contains("BroadcastExchange"), p)
    assert(countExchanges(p) <= 5, s"IVF plan shuffles too much:\n$p")
    // assignment argmax must be the packed-long HashAggregate, not a
    // vector-dragging SortAggregate
    assert(!p.contains("SortAggregate"), s"IVF assignment sort-aggregates:\n$p")
  }

  test("p08 top-k ranks via partial ObjectHashAggregate, not a per-query window") {
    val p = plan("p08_embedding_topk")
    // Two-phase top-k: map-side partial buffers, one exchange on
    // query_id, final merge — never all candidates of a query in one
    // window task.
    assert(!p.contains("Window"), s"window rank reintroduced:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"typed top-k aggregate missing:\n$p")
    assert("(?i)partial_topk".r.findFirstIn(p).isDefined,
      s"no partial (map-side) top-k phase in plan:\n$p")
  }

  test("p17 PQ keeps codebooks and ADC tables broadcast; rank is two-phase") {
    val p = plan("p17_ann_pq")
    // codebook joins (encode + query tables) and the ADC join are all
    // broadcast; the only hash exchanges are the encode argmin, the
    // per-(query,neighbor) sum, the top-k, and the output sort.
    assert(p.contains("BroadcastExchange"), p)
    // the codebook-indexing window is fine (tiny, broadcast side); a
    // query- or vector-keyed window would be the one-task funnel
    assert(!p.contains("windowspecdefinition(query_id"),
      s"PQ rank must not window per query:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"two-phase top-k missing:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in PQ plan:\n$p")
    // encode argmin must be a packed-long HashAggregate — min(struct)
    // would plan a SortAggregate that sorts corpus × codebook
    assert(!p.contains("SortAggregate"), s"PQ encode sort-aggregates:\n$p")
  }

  test("p19 stratified sample is a map-side filter: no hash shuffle, pruned scan") {
    val q = SparkEntry.queries("p19_stratified_sample")(spark, TestSpark.sf)
    val p = q.queryExecution.executedPlan.toString
    // the only exchange is the output orderBy's range partitioning — the
    // sampling decision itself must not shuffle
    assert(!p.contains("Exchange hashpartitioning"), s"sampling shuffled:\n$p")
    val scanCols = q.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.requiredSchema.fieldNames.toSet
    }.head
    assert(scanCols == Set("doc_id", "lang"), s"scan reads: $scanCols")
  }

  test("p84 source sketch: ONE partial-aggregated exchange, corpus never re-shuffles") {
    val sk = graft.dedup.Dedup.sourceSketch(
      Tables.documents(spark, TestSpark.sf), col("source"), col("text"))
    val p = sk.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"sketch build should shuffle exactly once:\n$p")
    // map-side combine: a partial HashAggregate must sit below the exchange
    assert(p.contains("HashAggregate"), s"sketch aggregation not hash-based:\n$p")
  }

  test("p88 release manifest: grouping sets expand map-side, ONE aggregation exchange") {
    val m = graft.curation.Curation.releaseManifest(
      Tables.documents(spark, TestSpark.sf), col("source"), col("lang"), col("text"))
    val p = m.queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"grouping sets should plan an Expand:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"manifest should aggregate through one exchange:\n$p")
  }

  test("p20 token budget: one hash exchange on the group key, windows in-partition") {
    val p = plan("p20_token_budget")
    assert("Exchange hashpartitioning\\(source".r.findFirstIn(p).isDefined,
      s"no per-group exchange:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"budget window should shuffle once, on the group key:\n$p")
  }

  test("p21 PQ rerank broadcasts the shortlist and queries; rank is two-phase") {
    val p = plan("p21_ann_pq_rerank")
    // exact-rerank joins must both be broadcast (shortlist and queries
    // are tiny); the corpus side must never sort-merge
    assert(!p.contains("SortMergeJoin"), s"rerank sort-merged:\n$p")
    assert("partial_topk".r.findAllIn(p).nonEmpty, s"rank not two-phase:\n$p")
    assert(!p.contains("windowspecdefinition(query_id"),
      s"one-task-per-query window crept in:\n$p")
  }

  test("p23 decontamination: eval shingles broadcast, one train-side shuffle") {
    val p = plan("p23_decontam")
    // train side: the shingle window's doc_id exchange is reused by the
    // per-doc distinct; eval side: one exchange for its global distinct.
    // Anything more means text/token rows are shuffling twice.
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2,
      s"expected exactly 2 hash exchanges (train window + eval distinct):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"eval set must broadcast, not sort-merge:\n$p")
  }

  test("p60 RAG chunking is map-side only: no exchange before the output") {
    // orderBy in the oracle entry adds a range exchange at the end; the
    // chunking itself (tokens → windows → join) must add none
    val p = graft.text.CorpusOps.chunkForRag(
        Tables.documents(spark, TestSpark.sf), col("doc_id"), col("text"),
        window = 32, stride = 24)
      .queryExecution.executedPlan.toString
    assert(countExchanges(p) == 0 && !p.contains("Join"),
      s"chunking should be a pure map-side fan-out:\n$p")
  }

  test("p61 boolean search prunes the index to the query vocabulary before exploding") {
    val idx = graft.text.CorpusOps.invertedIndex(
      Tables.documents(spark, TestSpark.sf), col("doc_id"), col("text"))
    val p = graft.text.CorpusOps.booleanSearch(idx,
        graft.text.CorpusOps.bm25DemoQueries, mode = "and")
      .queryExecution.executedPlan.toString
    // the IN-list term filter must actually appear as a predicate on
    // tok (removing the prune would still leave "tok#" references in
    // the plan — assert the filter itself), and the query/term joins
    // stay broadcast
    assert("tok#\\d+ (IN|INSET)".r.findFirstIn(p).isDefined,
      s"expected an IN-list prune on tok in the serve plan:\n$p")
    assert(p.toLowerCase.contains("broadcast"),
      s"expected broadcast query joins:\n$p")
    assert("Generate explode".r.findAllIn(p).nonEmpty)
  }

  test("p25 scrub is a pure projection: no shuffle, no join") {
    val p = plan("p25_scrub")
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("Join"),
      s"scrub should be map-side only:\n$p")
  }

  test("bucketed tables join with no exchange: co-location paid at write time") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i.toLong, i * 2)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 3)).toDF("k", "vb")
    graft.sources.Sinks.writeBucketedTable(a, "graft_bucket_a", 4, Seq("k"), Seq("k"))
    graft.sources.Sinks.writeBucketedTable(b, "graft_bucket_b", 4, Seq("k"), Seq("k"))
    // force the non-broadcast path: the point is fact-to-fact joins
    // where neither side fits in memory
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_bucket_a").join(spark.table("graft_bucket_b"), "k")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      assert(j.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q06 rank filter plans partial+final WindowGroupLimit (map-side top-k)") {
    // Spark's InferWindowGroupLimit turns rank<=k into a group limit
    // BEFORE the shuffle: each map task keeps k rows per group, so the
    // window task never sees a group's full candidate set. This is the
    // optimizer doing what Aggregators.TopK does for the ANN tiers.
    val p = plan("q06_window_topk")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(p).isDefined,
      s"no map-side window group limit:\n$p")
    assert("WindowGroupLimit.*Final".r.findFirstIn(p).isDefined,
      s"no final window group limit:\n$p")
  }

  test("dynamic partition pruning reaches the partitioned fact scan") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    graft.sources.Sinks.writePartitionedParquet(
      Tables.events(spark, TestSpark.sf), out, Seq("event_type"))
    // the DPP cost heuristic compares byte sizes, which rejects KB-scale
    // test tables — disable the stats estimate so the test pins the plan
    // MECHANICS (filter → duplicated as a dynamic partition filter on the
    // fact scan); at real scale the heuristic passes on its own
    val conf = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val old = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val fact = spark.read.parquet(out)
      // dim must come from a real source: a filtered LocalRelation is
      // constant-folded away, leaving no selective predicate for DPP
      Seq(("purchase", 1L), ("error", 2L), ("click", 3L)).toDF("etype", "w")
        .write.mode("overwrite").parquet(s"$out.dim")
      val dim = spark.read.parquet(s"$out.dim").filter(col("w") === 1L)
      val j = fact.join(dim, col("event_type") === col("etype"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruningexpression"),
        s"dim filter did not become a dynamic partition filter:\n$p")
      assert(j.collect().map(_.getString(0)).toSeq == Seq("purchase"))
    } finally {
      spark.conf.set(conf, old)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$out.dim"))
    }
  }

  test("p32 sequence pack: one hash exchange on the group key, window in-partition") {
    val p = plan("p32_sequence_pack")
    assert("Exchange hashpartitioning\\(source".r.findFirstIn(p).isDefined,
      s"no per-group exchange:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"packing should shuffle once, on the group key:\n$p")
  }

  test("p35 chunk dedup: election + reassembly shuffles only, no cartesian") {
    val p = plan("p35_chunk_dedup")
    // fingerprint election (f), doc reassembly (doc_id), plus the
    // fingerprint verdict join — chunking itself must stay map-side
    assert(countExchanges(p) <= 4, s"extra shuffle in chunk dedup plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"chunk dedup must not plan a cartesian:\n$p")
  }

  test("p96 leakage-safe split is a pure scan-stage projection: no exchange before sort") {
    val p = plan("p96_leakage_safe_split")
    // only the final presentation orderBy may shuffle (rangepartitioning);
    // the fingerprint + bucket + split assignment itself is map-side
    assert(!p.contains("Exchange hashpartitioning"),
      s"split assignment must not hash-shuffle:\n$p")
  }

  test("p98 epoch shuffle: in-bucket ranks + broadcast offsets, never one global window") {
    val p = plan("p98_epoch_shuffle")
    // the rank window partitions on the 256 ordered hash-prefix buckets
    assert("Exchange hashpartitioning\\(bucket".r.findFirstIn(p).isDefined,
      s"rank window not partitioned by bucket:\n$p")
    // a total order realized via Exchange SinglePartition would collapse
    // 100 TB onto one task — the exact plan this operator exists to avoid
    assert(!p.contains("Exchange SinglePartition"),
      s"epoch shuffle planned a single-partition stage:\n$p")
    // the ≤256-row offset table joins broadcast
    assert(p.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$p")
  }

  test("p99 epoch pack: the packer reuses the shuffle's bucket exchange — one hash shuffle total") {
    val p = plan("p99_epoch_pack")
    assert("Exchange hashpartitioning\\(bucket".r.findFirstIn(p).isDefined,
      s"no bucket exchange:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"rank and pack windows should share ONE bucket exchange:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"epoch pack planned a single-partition stage:\n$p")
  }

  test("p105 curriculum pack: shuffle and packer share one bucket exchange, no single partition") {
    val p = plan("p105_curriculum_pack")
    assert("Exchange hashpartitioning\\(bucket".r.findFirstIn(p).isDefined,
      s"no composite-bucket exchange:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"curriculum shuffle + pack should share ONE exchange:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"curriculum pack planned a single-partition stage:\n$p")
  }

  test("q96 peak concurrency: the global sweep never plans a single-partition stage") {
    val p = plan("q96_peak_concurrency")
    assert(!p.contains("Exchange SinglePartition"),
      s"sweep funneled the timeline through one task:\n$p")
    // in-day running sum partitions on the day bucket
    assert("Exchange hashpartitioning\\(__day".r.findFirstIn(p).isDefined,
      s"no day-bucket exchange:\n$p")
  }

  test("q91 event paths: one exchange on user_id; top-20 is TakeOrdered, not a global sort") {
    val p = plan("q91_event_paths")
    assert("Exchange hashpartitioning\\(user_id".r.findFirstIn(p).isDefined,
      s"lead window not partitioned by user_id:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 should plan TakeOrderedAndProject:\n$p")
  }

  test("q97 rolling actives: contribution is a map-side explode, never a range join") {
    val p = plan("q97_rolling_active")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"rolling actives planned a range join:\n$p")
    assert(p.toLowerCase.contains("generate"), s"no sequence explode:\n$p")
  }

  test("q105 session export: one sessionize exchange on user_id, no cartesian") {
    val p = plan("q105_session_export")
    assert("Exchange hashpartitioning\\(user_id".r.findFirstIn(p).isDefined,
      s"sessionize not partitioned on user_id:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("p106 negative sampling: queries broadcast; rank exchanges on qid only") {
    val p = plan("p106_negative_sampling")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
    assert("Exchange hashpartitioning\\(qid".r.findFirstIn(p).isDefined,
      s"rank window not partitioned on qid:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"sampling planned a single-partition stage:\n$p")
  }

  test("whole-stage codegen covers the dedup hot path") {
    // AQE only reveals codegen stages in the final plan — execute first.
    val df = SparkEntry.queries("p01_dedup_exact")(spark, TestSpark.sf)
    df.collect() // count() would plan a different query; collect runs THIS one
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    // "*(n) HashAggregate" markers = inside a WholeStageCodegen stage.
    assert("\\*\\(\\d+\\) HashAggregate".r.findFirstIn(p).isDefined,
      s"aggregation not codegen'd:\n$p")
  }

  test("q109 attribution: both windows ride ONE user exchange; final sort is the only other") {
    val p = plan("q109_attribution")
    // the rows-frame (last-touch) and value-range (first-touch/count)
    // windows differ only in sort spec, so Catalyst must reuse a single
    // hashpartitioning(user_id) exchange between them; the orderBy adds
    // one rangepartitioning. Anything more = a window re-shuffled.
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      s"attribution windows should share one user exchange:\n$p")
    assert(countExchanges(p) <= 2, s"unexpected extra exchange:\n$p")
  }

  test("p114 self-dedup: election is a hash-keyed agg, no cartesian, no single-partition stage") {
    val p = plan("p114_self_dedup")
    // shingle windows + h-keyed election/hit join + doc-keyed islands/
    // reassembly + presentation sort; a quadratic pair materialization
    // or a driver-funnel stage must never appear
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"self-dedup must not plan a cartesian:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"self-dedup planned a single-partition stage:\n$p")
    assert("Exchange hashpartitioning\\(h".r.findFirstIn(p).isDefined,
      s"first-occurrence election should shuffle on the shingle hash:\n$p")
  }

  test("p125 ablation: four tiers in one plan, no cartesian, no single-partition funnel before the 4-row report") {
    val p = plan("p125_dedup_ablation")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"ablation must not plan a cartesian:\n$p")
    // each tier collapses through its own one-row aggregate (the
    // accepted one-row-stats shape); nothing corpus-sized may reach a
    // single partition BEFORE those aggregates — the guard is that
    // every SinglePartition exchange sits directly under a final
    // HashAggregate/SortAggregate pair, which the row counts make
    // structural: 4 one-row unions
    assert("Union".r.findFirstIn(p).isDefined, s"expected the 4-tier union:\n$p")
  }

  test("p117 filter funnel: metrics stay in the scan + repetition aggs; no cartesian") {
    val p = plan("p117_filter_funnel")
    // repetition's two doc-keyed agg chains + the metrics join; the
    // one-row report agg's SinglePartition is the accepted one-row-stats
    // shape — but nothing corpus-sized may funnel there, so the hash
    // exchange count is the guard
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"funnel must not plan a cartesian:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 5,
      s"funnel metrics shuffled more than the repetition aggs + join:\n$p")
  }
  test("p141 change rates: lag window and per-url agg share ONE url exchange") {
    val p = plan("p141_change_rates")
    // fixture union (scan-stage) -> hash exchange on url -> window ->
    // partial-free agg on the same key -> final range sort. A second
    // hash exchange means the window/agg partitioning broke apart.
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"window+agg must share one url exchange:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("p143 jsonl quarantine is a pure scan-stage program: no exchange before the sort") {
    val p = plan("p143_jsonl_quarantine")
    assert(!p.contains("Exchange hashpartitioning"),
      s"quarantine parse must not shuffle:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("p140 redirect resolve: log-round self-joins, never a cartesian or single-partition funnel") {
    val p = plan("p140_redirect_resolve")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("crawlWorklist: map-side partial k-buffers, ONE exchange, broadcast schedule") {
    import spark.implicits._
    val allowed = Seq(("https://a.com/1", "a.com"), ("https://b.com/2", "b.com"))
      .toDF("canonical", "dst_family")
    val sched = Seq(("a.com", 1L)).toDF("node", "n_requests")
    val p = graft.graph.CrawlOps.crawlWorklist(allowed, sched)
      .queryExecution.executedPlan.toString
    // the partial ObjectHashAggregate reduces every scan partition to a
    // bounded buffer BEFORE the shuffle — the property that keeps a
    // 10^9-URL domain from moving its URL space through one task
    assert(p.contains("partial_urltopk"),
      s"UrlTopK lost its map-side partial phase:\n$p")
    assert(countExchanges(p) == 1,
      s"worklist should shuffle exactly once (dst_family):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"domain-cardinality schedule must broadcast:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"worklist planned a single-partition stage:\n$p")
  }

  test("p148 boilerplate strip: bounded exchanges, no cartesian, no single partition") {
    val p = plan("p148_boilerplate_strip")
    // df stats (family,line,doc then family,line) + doc reassembly; the
    // flag-to-occurrence join may broadcast (small SF) or SMJ (at scale)
    assert(countExchanges(p) <= 5, s"extra shuffle in boilerplate plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"boilerplate strip must not plan a cartesian:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"boilerplate strip planned a single-partition stage:\n$p")
  }

  test("p149 blast radius: semi-join BEFORE the explode, rollup reuses the pack exchange") {
    val p = plan("p149_pack_blast_radius")
    // one hash exchange total: the (source,seq) rollup rides the pack
    // window's source partitioning; the takedown list joins broadcast
    assert(countExchanges(p) <= 2,
      s"blast radius should reuse the pack window exchange:\n$p")
    assert(p.contains("LeftSemi") && p.contains("BroadcastHashJoin"),
      s"takedown list must broadcast-semi-join:\n$p")
    // the covered-sequence Generate must sit ABOVE the semi join in the
    // tree (parents print first): explode contaminated docs only, never
    // the corpus-sized manifest
    val gen = p.indexOf("Generate explode(sequence")
    val semi = p.indexOf("LeftSemi")
    assert(gen >= 0 && semi > gen,
      s"explode must run on the semi-joined slice only:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"blast radius planned a single-partition stage:\n$p")
  }

  test("p146 snippets: shuffle-free scan-stage program — no hash exchange at all") {
    val p = plan("p146_snippets")
    // every computation is local to one (doc, query) row; only the
    // presentation orderBy may range-shuffle
    assert(!p.contains("Exchange hashpartitioning"),
      s"snippets planned a shuffle the local form does not need:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"snippets planned a single-partition stage:\n$p")
  }

  test("p152 CDC chunker: shuffle-free scan-stage program") {
    val p = plan("p152_cdc_chunks")
    assert(!p.contains("Exchange hashpartitioning"),
      s"CDC chunking must stay per-row:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"CDC chunking planned a single-partition stage:\n$p")
  }

  test("p136 bm25f: nothing pinned (no checkpointed RDD scan), anchor side broadcast") {
    val p = plan("p136_anchor_bm25f")
    // the round-8 localCheckpoint'd doc-cardinality lens frame would
    // surface as a Scan ExistingRDD — the un-pinning must stay un-pinned
    assert(!p.contains("ExistingRDD"),
      s"bm25f re-grew a pinned corpus-cardinality frame:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"anchor/stat sides should broadcast:\n$p")
    // (the corpus-stats GLOBAL aggregate legitimately plans an
    // Exchange SinglePartition — map-side partials first, one ROW
    // crosses it — so that exchange is not pinned away here)
  }

  test("p164 per-host worklist: two bounded-buffer exchanges, broadcast schedule, no window") {
    val p = plan("p164_worklist_per_host")
    // (family, host) fold + family fold — exactly the two aggregation
    // exchanges; the schedule joins broadcast; no per-domain sort or
    // window ever sees a domain's raw URL space
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2,
      s"per-host worklist should shuffle exactly twice (host fold + family fold):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"schedule side should broadcast:\n$p")
    assert(!p.contains("Window"),
      s"selection must stay in bounded TopK buffers, not a window:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"per-host worklist planned a single-partition stage:\n$p")
  }

  test("p159 byte-level encode is map-side: no hash exchange before the output") {
    val p = plan("p159_bpe_bytes_encode")
    assert(!p.contains("Exchange hashpartitioning"),
      s"byte-level encode must stay in the scan stage:\n$p")
  }

  test("p170 CDX build is a scan-stage projection off the parse: no cartesian, no single partition") {
    val p = plan("p170_cdx_index")
    // surt/digest/extent all derive from the record row alone — the
    // only exchanges are the fixture's own assembly and the
    // presentation sort; an index build that shuffles per record
    // would never finish at archive scale
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"CDX build must not plan a cartesian:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"CDX build planned a single-partition stage:\n$p")
  }

  test("p171 CDX fetch: lookup-sized side broadcasts, no cartesian — never a full-archive shuffle") {
    val p = plan("p171_cdx_fetch")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"index-driven fetch must not plan a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the panel/extent side should broadcast against the archive:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"fetch planned a single-partition stage:\n$p")
  }

  test("p172 reshard: prefix sum rides the bucket exchange, shard assembly one hash shuffle, no cartesian") {
    val p = plan("p172_warc_reshard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"reshard must not plan a cartesian:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"reshard planned a single-partition stage (the global running " +
        s"sum must use the bucket carry pattern):\n$p")
  }

  test("p173 revisit: original election is a digest-keyed aggregate, never a window or cartesian") {
    val p = plan("p173_cdx_revisit")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"revisit detection must not plan a cartesian:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"revisit detection planned a single-partition stage:\n$p")
    assert("Exchange hashpartitioning\\(digest".r.findFirstIn(p).isDefined,
      s"the first-stored election should shuffle on the digest:\n$p")
  }

  test("fetchRecords prunes the payload scan: the lookup's file ids reach the parquet scan as a pushed IN filter") {
    import graft.sources.Warc
    val spark2 = spark
    import spark2.implicits._
    val recs = (0L until 8L).map(i => (i % 4, i, s"body $i"))
      .toDF("f", "i", "b")
    val files = Warc.writeWarc(recs, col("f"), col("i"),
      lit("conversion"), concat(lit("https://h.com/p/"), col("i")),
      col("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_fetch").toString
    try {
      files.write.mode("overwrite").parquet(dir)
      val onDisk = spark.read.parquet(dir)
      // a lookup naming 2 of the 4 files
      val extents = Warc.parseWarc(onDisk, col("file_id"), col("payload"))
        .filter(col("file_id") < 2)
        .select(col("file_id"), col("record_idx"), col("offset"),
          col("record_bytes"))
      val fetched = Warc.fetchRecords(onDisk, col("file_id"),
        col("payload"), extents)
      val p = fetched.queryExecution.executedPlan.toString
      assert("PushedFilters: \\[[^\\]]*In\\(file_id".r.findFirstIn(p).isDefined,
        s"the lookup's file ids must prune the payload scan " +
          s"(row-group stats skip the rest of the archive):\n$p")
      // and the prune is not a wrong-answer shortcut
      assert(fetched.count() == 4)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("robotsFilterWildcard: rules broadcast, the match+election fold runs scan-stage — no sort-merge join, no extra exchange") {
    import graft.graph.LinkGraph
    val spark2 = spark
    import spark2.implicits._
    val urls = Tables.documents(spark, TestSpark.sf)
      .select(concat(lit("https://x.com/p?id="),
        col("doc_id").cast("string")).as("canonical"),
        // a REAL (non-literal) family column — a constant would fold
        // the equi-join condition away and change the join strategy
        concat(lit("x"), (col("doc_id") % 2).cast("string"), lit(".com"))
          .as("dst_family"))
    val rules = Seq(("x0.com", "/p*", false), ("x1.com", "/p?id=1$", true))
      .toDF("family", "pattern", "allow")
    val plan = LinkGraph.robotsFilterWildcard(urls, rules)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the per-family rule arrays must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a urls-side shuffle would make the gate cost a corpus exchange:\n$plan")
    // exactly the rule-collapse exchange (domain cardinality), never
    // one on the frontier side
    val exchanges = "Exchange hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.forall(_ == "family"),
      s"only the rule table may shuffle (family key), got $exchanges:\n$plan")
  }

  test("p210 SQ8 serve: both rankings broadcast the query side — no cartesian sort-merge") {
    val plan = graft.SparkEntry.queries("p210_sq8_recall")(
      spark, TestSpark.sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"the panel side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"a corpus-side exchange per ranking is the wrong shape:\n$plan")
  }

  test("alias rewrite in the gated crawl front: the fixture map broadcasts — no harvest-side sort-merge") {
    // the composed chain's checkpointed fixtures truncate the FINAL
    // plans, so pin the rewrite join at its own seam: follow harvest
    // ⋈ the authored alias map must be a BroadcastHashJoin (a
    // stats-less checkpoint would otherwise plan a SortMergeJoin that
    // shuffles the whole harvest against nine rows — the p210 hazard)
    val docs = Tables.documents(spark, TestSpark.sf)
    val pages = docs.select(col("doc_id"),
      graft.queries.PipelineQueries.messyUrlFixture.as("page_url"),
      graft.queries.PipelineQueries.nofollowHtmlFixture.as("html"))
    val links = graft.graph.LinkGraph.linkRowsFollow(pages,
      col("page_url"), col("html"))
    val out = graft.graph.CrawlOps.resolveFrontierAliases(links,
      graft.queries.PipelineQueries.frontierAliasResolved(spark))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the alias map must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a harvest-side exchange against a nine-row map is the wrong shape:\n$p")
  }

  test("compactCdxShards reads only the affected shard partitions (partition-pruned merge scan)") {
    import graft.sources.Warc
    val spark2 = spark
    import spark2.implicits._
    val cdx = (10 until 50).map(i => (f"com,s$i%02d)/p", i.toLong,
        i.toLong * 100, 50L, s"d$i"))
      .toDF("surt_key", "file_id", "offset", "record_bytes", "digest")
      .withColumn("target_uri", col("surt_key"))
    val dir = java.nio.file.Files.createTempDirectory("graft_lsmp").toString
    try {
      Warc.writeCdxShards(cdx, dir, numShards = 4)
      val current = spark.read.parquet(dir)
      val cluster = Warc.cdxClusterIndex(current)
      val segs = Seq(("com,s49x)/p", 149L, 900L, 50L, "dx"))
        .toDF("surt_key", "file_id", "offset", "record_bytes", "digest")
        .withColumn("target_uri", col("surt_key"))
      val assigned = Warc.assignShards(segs, col("surt_key"), cluster,
        clampFloor = true)
      val affected = assigned.select(col("shard")).distinct()
        .collect().map(_.getInt(0))
      // the merge's read side — exactly what compactCdxShards plans
      val merge = current.filter(col("shard").isin(affected.map(Int.box): _*))
      val p = merge.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters") && p.contains("shard"),
        s"the merge must scan only affected shard directories:\n$p")
      assert(affected.length == 1,
        "one segment key should touch exactly one shard")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
