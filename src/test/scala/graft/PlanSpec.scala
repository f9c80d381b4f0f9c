package graft

import graft.queries.{Dedup, Relational, Similarity}

/** Physical-plan assertions — the 100 TB posture is checked, not hoped:
  * filters reach the parquet scan, scans prune columns, dims broadcast,
  * aggregates combine map-side, top-k never global-sorts, and the
  * custom vector expressions stay inside codegen. */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize via this QE so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  /** A finalized AdaptiveSparkPlan stringifies with BOTH a
    * "== Final Plan ==" and an "== Initial Plan ==" section — the same
    * operators twice. `.contains()` pins are safe either way (and
    * several legitimately match pre-finalization structure that AQE
    * elides at test scale, e.g. empty-side join elimination), but any
    * pin that COUNTS occurrences must count within the Final Plan
    * section only or it double-counts (the r6 q77 failure). */
  private def finalSection(p: String): String =
    p.split(java.util.regex.Pattern.quote("== Initial Plan =="))(0)

  test("q02: filters push down to the parquet scan and columns prune") {
    val p = plan(Relational.q02FilterRevenue(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipda"), p) // toString truncates
    // projection pruning: the scan must not read the full 11-col schema
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_orderkey"), "scan reads columns q02 never uses")
  }

  test("q04: part dim joins via BroadcastHashJoin") {
    val p = plan(Relational.q04BrandAgg(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan(Relational.q01PricingSummary(spark, sf))
    assert(p.contains("partial_sum"), p)
    // codegen stages render as *(n) prefixes in executedPlan.toString
    assert(p.contains("*(") || p.contains("WholeStageCodegen"), p)
  }

  test("q11: top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.q11TopK(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q06/q07: semi and anti joins plan as such") {
    assert(plan(Relational.q06SemiJoin(spark, sf)).contains("LeftSemi"))
    assert(plan(Relational.q07AntiJoin(spark, sf)).contains("LeftAnti"))
  }

  test("similarity: custom dot-product expression is in the plan (codegen'd)") {
    val p = plan(Similarity.bruteForceTopKDf(
      graft.Tables.t(spark, sf, "embeddings")))
    assert(p.contains("graft_dot"), p)
    assert(p.contains("graft_norm2"), p)
    // the query side is broadcast against the corpus scan
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("dedup exact: groups on the hash, not the raw text payload") {
    val p = plan(Dedup.exactDf(graft.Tables.t(spark, sf, "documents")))
    assert(p.contains("md5"), p)
    assert(p.contains("partial_min") || p.contains("HashAggregate"), p)
  }

  test("d06: candidate join keys are LSH band signatures, not data columns") {
    val p = plan(Dedup.embeddingCosineDf(graft.Tables.t(spark, sf, "embeddings")))
    // the candidate self-join must hash on the (band, bsig) signature…
    assert(p.contains("bsig"), p)
    // …and the plane dots are the codegen'd custom expression, not HOFs
    assert(p.contains("graft_dot"), p)
    assert(!p.contains("aggregate(zip_with"), "interpreted HOF crept into the hot path")
    // the label data column plays no role in candidate generation
    assert(!p.contains("label"), p)
  }

  test("a03: portable HLL partial-aggregates map-side (sketch merge in shuffle)") {
    val p = plan(graft.queries.Sketches.portableHllDistinct(spark, sf))
    assert(p.contains("partial_graft_portable_hll") ||
      (p.contains("graft_portable_hll") && p.contains("ObjectHashAggregate")), p)
  }

  test("q32: pivot aggregates partially before the shuffle") {
    val p = plan(Relational.q32Pivot(spark, sf))
    assert(p.contains("partial_count") || p.contains("partial_pivotfirst") ||
      p.contains("HashAggregate"), p)
  }

  test("runtime bloom filter from a selective dim prunes the fact-scan side") {
    import org.apache.spark.sql.functions._
    // at 100 TB a selective dim predicate should cut the fact shuffle
    // before the join — Spark's InjectRuntimeFilter does this when the
    // join shuffles; pin that the engine's session shape allows it
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fact = graft.Tables.t(spark, sf, "lineitem")
        .select(col("l_partkey"), col("l_quantity"))
      val dim = graft.Tables.t(spark, sf, "part")
        .filter(col("p_brand") === "Brand#13")
        .select(col("p_partkey"), col("p_brand"))
      val df = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      val p = plan(df)
      assert(p.contains("might_contain") || p.contains("bloom_filter"), p)
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q34: correlated EXISTS/NOT EXISTS decorrelate to semi/anti joins") {
    val p = plan(Relational.q34Exists(spark, sf))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    // never a per-row subquery re-execution
    assert(!p.contains("InSubquery") && !p.contains("ScalarSubquery"), p)
  }

  test("q35: unpivot plans one map-side Expand feeding a partial agg") {
    val p = plan(Relational.q35Unpivot(spark, sf))
    assert(p.contains("Expand"), p)
    assert(p.contains("partial_"), p)
  }

  test("g01: pagerank rounds probe the checkpointed ids-only edge list") {
    val p = plan(graft.queries.Graph.pageRank(spark, sf))
    // the checkpointed adjacency (r12: eager truncate — serialized
    // UnsafeRows scan ~4-6x cheaper than the columnar cache, measured
    // by GraphRoundProbe) is scanned by every round, never recomputed
    // from the lineitem/orders join
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("FileScan"),
      "a round re-derived the edge list from the corpus:\n" + p)
    spark.catalog.clearCache()
  }

  test("q40: all four dims broadcast; only the fact-fact join shuffles") {
    val p = plan(Relational.q40NationPairs(spark, sf))
    // 4 broadcast joins (customer, supplier, nation x2); the
    // lineitem-orders join is the only shuffle join in the tree
    assert(p.sliding("BroadcastHashJoin".length).count(
      _ == "BroadcastHashJoin") >= 4, p)
    assert(p.contains("partial_sum"), p)
  }

  test("s04: centroid aggregation partial-combines map-side") {
    val p = plan(Similarity.centroids(spark, sf))
    assert(p.contains("partial_sum"), p)
    assert(p.contains("Generate"), p) // posexplode is a narrow Generate
  }

  test("p02: md5 pre-filter sits below the per-source Window") {
    // a bare Window.partitionBy(source) would sort one source's whole
    // corpus in one task; the md5 threshold filter must reach the scan
    // side so the ranked set per group stays ~4·quota regardless of size
    val p = plan(graft.queries.Sampling.stratifiedSample(spark, sf))
    val lines = p.linesIterator.toVector
    val winLine = lines.indexWhere(_.contains("Window"))
    val filterLine = lines.indexWhere(l => l.contains("Filter") && l.contains("md5"))
    assert(winLine >= 0 && filterLine >= 0, p)
    // executedPlan prints parents first: the filter must print BELOW
    // (after) the window operator, i.e. on the window's input side
    assert(filterLine > winLine, p)
  }

  test("p03: only over-cap groups are ranked; small groups bypass the window") {
    // assert on the AQE final plan only (the Initial Plan section echoes
    // pre-runtime operators)
    val p = plan(graft.queries.Sampling.sourceCapReport(spark, sf))
      .split("== Initial Plan ==").head
    // exactly one ranking operator total, on the over-cap branch — and
    // TopKRewrite turns it into the bounded-heap TopKPerKey, so the cap
    // never even full-sorts a mega-source partition (two heap LINES
    // since r11: the map-side PartialTopKPerKey prunes each input
    // partition to ≤ k per key before the exchange, the final heap
    // finishes — still one ranking operator, zero sorts)
    assert(p.linesIterator.count(l =>
      (l.contains("TopKPerKey") && !l.contains("PartialTopKPerKey")) ||
        l.contains("row_number")) == 1, p)
    assert(p.linesIterator.count(_.contains("PartialTopKPerKey")) == 1, p)
    assert(p.contains("Union"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q41: scalar subqueries decorrelate — no per-row subquery execution") {
    val p = plan(Relational.q41ScalarSubquery(spark, sf))
    // both correlated aggregates become aggregate-below-outer-join
    assert(p.contains("LeftOuter"), p)
    assert(!p.contains("Subquery subquery"), p)
    assert(p.contains("partial_count") || p.contains("partial_max"), p)
  }

  test("q33: fuzzy-join candidates key on (token, length-band), not the bare token") {
    val p = plan(Relational.q33FuzzyJoin(spark, sf))
    // the banded length bucket must be part of the equi-join key, so a
    // skewed token alone can never form a quadratic hot bucket
    assert(p.contains("lb#"), p)
  }

  test("d10: eval shingles broadcast into a semi join; clean set is a LeftAnti") {
    val p = plan(Dedup.decontaminate(spark, sf))
    // contamination detection must be a map-side broadcast semi join on
    // the shingle key, then an anti join on doc_id — nothing corpus²
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("a04: count-min partial-aggregates map-side; sketch relation broadcasts") {
    val p = plan(graft.queries.Sketches.cmsHeavyHitters(spark, sf))
    assert(p.contains("partial_graft_portable_cms") ||
      (p.contains("graft_portable_cms") && p.contains("ObjectHashAggregate")), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("g02: co-purchase pair expansion is join-free above the scan") {
    val p = plan(graft.queries.Graph.coPairsDf(
      graft.Tables.t(spark, sf, "lineitem")))
    assert(p.contains("collect_set"), p)
    assert(!p.contains("Join"), "pair expansion re-introduced a self-join:\n" + p)
  }

  test("g02: the closing probe hash-joins — the wedge stream is never " +
      "sorted (the r8 sf5/sf10 disk-cliff fix)") {
    val li = graft.Tables.t(spark, sf, "lineitem")
    val p = plan(graft.queries.Graph.trianglesDf(li))
    // the closing join must be ShuffledHashJoin (edge side built,
    // wedge side streamed); a SortMergeJoin here buffers the full
    // wedge relation — 2.18 GB spilled at sf1, disk death at sf5+
    assert(p.contains("ShuffledHashJoin"), p)
    // and the wedge bloom prune is in the plan as the CODEGEN probe
    // (r12: the boxed ScalaUDF form cost an encoder round-trip on
    // every wedge row — 8-25 % of the triangle family's CPU)
    assert(p.contains("graft_bloom_might_contain"),
      "wedge bloom prune missing:\n" + p)
    assert(!p.contains("UDF("),
      "wedge bloom prune regressed to the boxed ScalaUDF form:\n" + p)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }

  test("a08: bloom probe never shuffles the fact table (broadcast-only joins)") {
    val p = plan(graft.queries.Sketches.bloomPrefilter(spark, sf))
    // the 1-row sketch and the dim flag both broadcast; a sort-merge or
    // shuffled-hash join here would mean the fact side moved
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the filter itself partial-aggregates map-side (OR-merge in shuffle)
    assert(p.contains("partial_graft_portable_bloom") ||
      (p.contains("graft_portable_bloom") && p.contains("ObjectHashAggregate")), p)
  }

  test("d12: containment join keys on the df-pruned shingle, never raw text") {
    val p = plan(Dedup.containment(spark, sf))
    // the df-cutoff aggregate must sit in the plan (bucket bound) and
    // no join may carry the text payload
    assert(p.contains("partial_count") || p.contains("count"), p)
    assert(!"Join.*\\btext\\b".r.findFirstIn(p).isDefined,
      "containment join carries the text payload:\n" + p)
  }

  test("m04: phash pair join reads the persisted fingerprints, not the blobs") {
    val p = plan(graft.multimodal.MultimodalQueries.phashPairs(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      "fingerprints recomputed per join side:\n" + p)
    assert(!"Join.*\\btext\\b".r.findFirstIn(p).isDefined,
      "pair join carries blob bytes:\n" + p)
  }

  test("p07: split assignment is map-side — one aggregate, no join, no window") {
    val p = plan(graft.queries.Sampling.datasetSplit(spark, sf))
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
  }

  test("q46: DistinctWindowRewrite removes the per-row set; plan stays join-free") {
    val p = plan(graft.queries.Relational.q46WindowDistinct(spark, sf))
    assert(!p.contains("collect_set"),
      "O(distinct)-state set window survived the rewrite:\n" + p)
    assert(!p.contains("Join"), "decomposition re-introduced a join:\n" + p)
    assert("RunningWindowFunction|Window".r.findFirstIn(p).isDefined, p)
  }

  test("g02: the wedge stream is bloom-filtered before the closing join") {
    val p = plan(graft.queries.Graph.triangles(spark, sf))
    // the prune probes via the codegen expression (the conf-capped
    // catalyst might_contain alternative measured 3.4x slower, and the
    // r12 A/B retired the boxed ScalaUDF form — see trianglesDf);
    // losing the filter silently re-grows the closing join's exchange
    // to wedge-mass rows
    assert(p.contains("graft_bloom_might_contain"),
      "wedge bloom prune missing from plan:\n" + p)
  }

  test("t33: the w-invariant totals aggregate is computed once, not " +
      "per window width") {
    // before the r9 hoist each of the 4 per-w branches re-scanned and
    // re-split the corpus for the same one-row n_grams aggregate: 8
    // relation leaves in the optimized plan. Hoisted + persisted, the
    // totals scans collapse into InMemoryRelation references, leaving
    // exactly the 4 winnowSelDf scans as real relation leaves.
    val plan = graft.queries.TextOps
      .winnowSweep(spark, sf).queryExecution.optimizedPlan
    val scans = plan.collectLeaves().count(
      _.getClass.getSimpleName.contains("LogicalRelation"))
    assert(scans == 4,
      s"expected 4 corpus scans (one per w), got $scans:\n$plan")
  }

  test("q48: WITH RECURSIVE plans a UnionLoop, not an unrolled union") {
    val p = graft.queries.Relational.q48RecursiveAgg(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("UnionLoop"), p)
  }

  test("q49: zorder bucket aggregate combines map-side; no join anywhere") {
    val p = plan(Relational.q49ZorderLayout(spark, sf))
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
    assert(!p.contains("Join"), "the layout-key pass must stay join-free:\n" + p)
  }

  test("q50: brand dim and support lookups broadcast; only the basket " +
      "self-join shuffles") {
    val p = plan(Relational.q50AssocRules(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    // exactly one shuffle join: the items⋈items basket-key pair expansion
    assert(p.linesIterator.count(_.contains("SortMergeJoin")) <= 1, p)
    // the four consumers of the basket relation share its distinct via
    // ReusedExchange — a .persist() instead measured 3× slower (the
    // cache barrier breaks pipelining); losing the reuse means four
    // full fact-scan+distinct subtrees
    assert(p.contains("ReusedExchange"), p)
  }

  test("s08: per-dimension stats broadcast back into the corpus scan") {
    val p = plan(Similarity.embeddingQuantize(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_min"), p)
  }

  test("t18: the index head is a TakeOrdered, never a global sort") {
    val p = plan(graft.queries.TextOps.invertedIndex(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q51: both window passes and the version aggregate share ONE " +
      "user shuffle") {
    val p = plan(Relational.q51Scd2Intervals(spark, sf))
    // the gaps-and-islands chain must reuse the user_id partitioning:
    // exactly one hash exchange on user_id in the FINAL plan (AQE's
    // toString appends the pre-adaptive Initial Plan — don't count it)
    val finalPlan = p.split("== Initial Plan ==").head
    val exchanges = finalPlan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(exchanges == 1,
      s"expected 1 user_id exchange, got $exchanges:\n$finalPlan")
  }

  test("q60: sweep windows and island aggregate share ONE user shuffle") {
    val p = plan(Relational.q60IntervalUnion(spark, sf))
    val finalPlan = p.split("== Initial Plan ==").head
    val exchanges = finalPlan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(exchanges == 1,
      s"expected 1 user_id exchange, got $exchanges:\n$finalPlan")
    // the naive overlap formulation would plan a self-join — forbid it
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q52: the bounds relation broadcasts back into the fact scan") {
    val p = plan(Relational.q52Winsorize(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    // the clamp pass must not re-sort: only the bounds derivation may
    // carry a window sort, and the final agg partial-combines
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("g04: the peel is join-free — windows only, one linear pipeline") {
    val p = plan(graft.queries.Graph.kcore(spark, sf))
    // keep-set semi-joins would appear as SortMergeJoin/ShuffledHash;
    // the measured window form has none (6.5 s vs 15.9/43 s)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("Window"), p)
    // the k order statistic must be the degree-HISTOGRAM prefix sum,
    // never a row_number over the node relation (that shape funnels
    // every node through one task — the r4 perf_weak flag); the fixed
    // plan has no row_number anywhere in the peel
    assert(!p.contains("row_number"),
      "order statistic regressed to a global row_number window:\n" + p)
  }

  test("d13: in-cell pair join keys on the cell id and reuses the one " +
    "persisted assignment") {
    val p = plan(Dedup.semDedup(spark, sf))
    // candidate generation must be the cell-keyed equi-join — a missing
    // key would plan an unkeyed product over the corpus. (The plan's
    // BroadcastNestedLoopJoins are assignCells' intended 8-row seed
    // broadcasts, not corpus-sized sides.)
    assert(!p.contains("CartesianProduct"),
      "in-cell join degenerated to all-pairs:\n" + p)
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[cell"
      .r.findFirstIn(p).isDefined,
      "pair join is not keyed on the cell id:\n" + p)
    // the assignment (seed crossJoin + argmin window) computes once and
    // both join sides read the persisted copy
    assert(p.contains("InMemoryTableScan"),
      "cell assignment recomputed per join side:\n" + p)
  }

  test("e01: the shard manifest aggregate combines map-side and the " +
    "dedup join carries no text payload") {
    val p = plan(graft.queries.Pipeline.corpusBuild(spark, sf))
    assert(p.contains("HashAggregate"), p)
    // keeper join must move (hash, id)-shaped rows, never the document
    // body: no Exchange may carry the text column
    val exchanges = "Exchange[^\\n]*".r.findAllIn(p).toList
    assert(exchanges.nonEmpty, p)
    assert(!exchanges.exists(_.contains("text")),
      "a shuffle carries the document body:\n" + exchanges.mkString("\n"))
  }

  test("e06: no funnel-stage shuffle carries the document body " +
    "(near-dup stage included)") {
    // the e01 40-byte discipline extended to the r10 5-stage funnel:
    // exact dedup moves (md5, id), the near-dup stage moves (id,
    // 8-hex band sig) rows and ids-only CC edges, decontamination
    // moves df-pruned shingles — the text column must never enter an
    // Exchange
    val p = plan(graft.queries.Pipeline.qualityFunnel(spark, sf))
    val exchanges = "Exchange[^\\n]*".r.findAllIn(p).toList
    assert(exchanges.nonEmpty, p)
    assert(!exchanges.exists(_.contains("text")),
      "a funnel shuffle carries the document body:\n" +
        exchanges.mkString("\n"))
  }

  test("t22: dominance signals partial-aggregate map-side; no HOF in " +
    "the agg path") {
    val p = plan(graft.queries.TextOps.gopherRules(spark, sf))
    assert(p.contains("partial_"), p)
    // the length signals must ride the unigram agg, not an interpreted
    // aggregate()/filter() lambda pass over the token arrays
    assert(!p.contains("aggregate(") && !p.contains("ArrayAggregate"),
      "interpreted HOF pass in the hot path:\n" + p)
  }

  test("g05: seeds are a TakeOrdered; rounds probe the persisted edges") {
    val p = plan(graft.queries.Graph.bfsHops(spark, sf))
    // r12: the rounds materialize through eager checkpoints, so the
    // final plan reads the LAST round's snapshot — a Scan ExistingRDD
    // — and must never re-derive anything from the corpus
    assert(p.contains("Scan ExistingRDD"),
      "final round snapshot not checkpointed:\n" + p)
    assert(!p.contains("FileScan"),
      "edge list recomputed from the corpus in the final plan:\n" + p)
  }

  test("q53: change compaction is a partial-agged argmin (r11 — " +
    "ArgminRewrite claims rank-1 before the heap), and the merge is " +
    "one full-outer join") {
    val p = plan(Relational.q53CdcApply(spark, sf))
    // max(struct(ts, event_id, payload…)) collapses to one row per key
    // map-side BEFORE the exchange — the r10 assignCells posture; the
    // k=1 heap (which shuffles every event) must be gone
    assert(p.contains("__graft_argmin") || p.contains("named_struct"),
      "rank=1 compaction was not rewritten to the partial-agged argmin:\n" + p)
    assert(!p.contains("TopKPerKey") && !p.contains("row_number"),
      "a ranking operator survived where the aggregate form fits:\n" + p)
    assert(p.contains("FullOuter"), p)
  }

  test("q43: the decorrelated LATERAL is a partial-heaped per-key " +
    "top-1 with the key filter at the scan — no global sort (r11)") {
    val p = plan(Relational.q43Lateral(spark, sf))
    assert(p.contains("PartialTopKPerKey"),
      "LATERAL inner table shuffles unpruned:\n" + p)
    // the global Sort Catalyst decorrelates into must be rewritten away
    // (only the final presentation Sort on c_custkey remains)
    assert(!p.contains("o_totalprice DESC") ||
      !"Sort \\[o_totalprice".r.findFirstIn(p).isDefined,
      "the decorrelated global sort survived:\n" + p)
  }

  test("s10: greedy rounds rank on the codegen'd fixed-point dot; the " +
    "pool join reads the persisted candidates") {
    val p = plan(Similarity.mmrDiversify(spark, sf))
    assert(p.contains("graft_fp_dot"),
      "fixed-point dot expression missing from the plan:\n" + p)
    assert(p.contains("InMemoryTableScan"),
      "candidate pool recomputed per round:\n" + p)
  }

  test("t23: rounds replay from the checkpointed word-frequency table, " +
    "never the corpus") {
    val p = plan(graft.queries.TextOps.bpeLearn(spark, sf))
    // every round's pair count and rewrite reads the materialized vocab
    // (r12: eager truncate — UnsafeRow snapshot, not the columnar cache)
    assert(p.contains("Scan ExistingRDD"),
      "a BPE round recomputes from the raw documents:\n" + p)
    // the final plan never re-reads the corpus: the last round's
    // snapshot is the only source
    assert(!p.contains("Scan parquet"),
      "a BPE round re-reads the corpus files:\n" + p)
    // the global argmax is a top-1, not a full sort of the pair space
    assert(p.contains("TakeOrderedAndProject"),
      "merge selection global-sorts the pair table:\n" + p)
  }

  test("a10: one fact pass feeds the sketch side; rollup levels " +
    "re-aggregate leaf registers") {
    val p = plan(graft.queries.Sketches.sketchRollup(spark, sf))
      .split("== Initial Plan ==").head
    // the register agg partial-aggregates map-side
    assert(p.contains("partial_graft_portable_hll_regs"),
      "leaf sketch not partial-aggregated:\n" + p)
    // the fact feeds exactly two scans in the FINAL plan: one for the
    // persisted leaf registers, one for the exact rollup reference —
    // the three levels re-read the cached cells, not the corpus
    val scans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(scans <= 2, s"fact scanned $scans times:\n" + p)
    assert(p.contains("InMemoryTableScan"),
      "rollup levels do not reuse the persisted leaf cells:\n" + p)
  }

  test("q55: the refresh is ONE full-outer state merge; both states " +
    "partial-aggregate") {
    val p = plan(Relational.q55MvMerge(spark, sf))
      .split("== Initial Plan ==").head
    assert(p.contains("FullOuter"), p)
    assert(p.linesIterator.count(_.contains("FullOuter")) === 1,
      "more than one merge join:\n" + p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("q56: the planner is one window over the file manifest — no " +
    "join, no global sort") {
    val p = plan(Relational.q56CompactionPlan(spark, sf))
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), "planner joins:\n" + p)
    // manifest agg combines map-side before the window's shuffle
    assert(p.contains("partial_"), p)
  }

  test("q58: no inequality join; the only range exchange is the " +
    "output sort") {
    val p = plan(Relational.q58PitJoin(spark, sf))
      .split("== Initial Plan ==").head
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "PIT join planned as an inequality join:\n" + p)
    // q51's presentation sort must NOT leak into the q58 chain: one
    // rangepartitioning total (the final orderBy on event_id)
    val ranges = p.linesIterator.count(_.contains("rangepartitioning"))
    assert(ranges <= 1, s"$ranges range exchanges (q51 sort leaked):\n" + p)
  }

  test("q64: the lag chain, latest-row pick and ewma ride ONE user_id " +
    "exchange") {
    val p = plan(Relational.q64Ewma(spark, sf))
      .split("== Initial Plan ==").head
    val hashEx = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(hashEx == 1,
      s"$hashEx user_id exchanges (both windows must share one):\n" + p)
  }

  test("q65: the six regression moments partial-aggregate map-side") {
    val p = plan(Relational.q65Regression(spark, sf))
    assert(p.contains("partial_sum"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q66: the day dedup partial-aggregates before its shuffle") {
    val p = plan(Relational.q66Streaks(spark, sf))
      .split("== Initial Plan ==").head
    // distinct = HashAggregate(keys=[user_id, day]) on BOTH sides of
    // its exchange — the fact-sized move is pre-deduped map-side
    val dedupAggs = p.linesIterator.count(l =>
      l.contains("HashAggregate(keys=[user_id") && l.contains("day"))
    assert(dedupAggs >= 2, s"day-dedup not map-side-combined:\n" + p)
  }

  test("g09: seeds are a TakeOrdered; rounds probe the persisted " +
    "weighted edges") {
    val p = plan(graft.queries.Graph.sssp(spark, sf))
    // r12: eager checkpoint rounds — see the g05 pin
    assert(p.contains("Scan ExistingRDD"),
      "final round snapshot not checkpointed:\n" + p)
    assert(!p.contains("FileScan"),
      "edge list recomputed from the corpus in the final plan:\n" + p)
  }

  test("t28: the token count partial-aggregates; GT joins broadcast") {
    val p = plan(graft.queries.TextOps.goodTuring(spark, sf))
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("p13: one corpus moment pass; totals broadcast; ranking window " +
    "is strata-sized") {
    val p = plan(graft.queries.Sampling.varAllocation(spark, sf))
    assert(p.contains("partial_sum"), p)
    assert(p.contains("BroadcastExchange"), p)
    // the corpus is scanned ONCE into the persisted moment relation —
    // every later stage re-reads the strata-sized cache (each
    // InMemoryTableScan PRINTS the cached subtree, so counting
    // "Scan parquet" lines overcounts; the cache nodes are the pin)
    assert(p.contains("InMemoryTableScan"),
      "moment relation not persisted — corpus re-scans per stage:\n" + p)
  }

  test("e02: no shuffle carries the document body; the exact novelty " +
    "join keys on the 32 B hash") {
    val p = plan(graft.queries.Pipeline.corpusRefresh(spark, sf))
    val exchanges = "Exchange[^\\n]*".r.findAllIn(p).toList
    assert(exchanges.nonEmpty, p)
    assert(!exchanges.exists(_.contains("text")),
      "a shuffle carries the document body:\n" + exchanges.mkString("\n"))
    // the Bloom sketch broadcasts; the residue joins hash-keyed
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q67: exactly one exchange carries user_id (lag + matrix agg " +
    "share nothing fact-sized after it)") {
    val p = plan(Relational.q67Markov(spark, sf))
      .split("== Initial Plan ==").head
    val userEx = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("user_id"))
    assert(userEx == 1, s"$userEx user_id exchanges:\n" + p)
    assert(p.contains("partial_count"), p)
  }

  test("q68: the moment pass partial-aggregates; moments broadcast " +
    "back into the flag pass") {
    val p = plan(Relational.q68Outliers(spark, sf))
    assert(p.contains("partial_sum"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("t29: shingle df partial-aggregates; doc totals broadcast") {
    val p = plan(graft.queries.TextOps.boilerplate(spark, sf))
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("s12: the label filter is a hash-join KEY, not a post-filter " +
    "on a nested loop") {
    val p = plan(Similarity.filteredTopKDf(
      graft.Tables.t(spark, sf, "embeddings")))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "label predicate did not become a join key:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "s12 planned the unfiltered nested loop:\n" + p)
  }

  test("g10: reuses the persisted triangle core (no second pair " +
    "expansion) and the coefficient join is node-keyed") {
    val p = plan(graft.queries.Graph.clusteringCoeff(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      "oriented edges recomputed:\n" + p)
    assert(p.contains("partial_count"), p)
  }

  test("a12: the sketch aggregates once and broadcasts onto the " +
    "key-sized exact relation") {
    val p = plan(graft.queries.Sketches.cmsErrorAudit(spark, sf))
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("partial_count"), p)
  }

  test("g11: message rounds probe the persisted edge list; L1 totals " +
    "broadcast; top-N never global-sorts; no unpartitioned window") {
    val p = plan(graft.queries.Graph.hits(spark, sf))
    assert(p.contains("Scan ExistingRDD"),
      "edge list recomputed per round:\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "L1 total not broadcast:\n" + p)
    assert(p.contains("TakeOrderedAndProject"),
      "per-side top-N planned as a global sort:\n" + p)
    assert(!p.contains("Window"), "unexpected window operator:\n" + p)
    assert(p.contains("partial_sum"), p)
  }

  test("q69: one fact pass — the customer dim and all margins join " +
    "broadcast onto the cell relation") {
    val p = plan(Relational.q69ChiSquare(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      "customer dim did not broadcast:\n" + p)
    assert(p.contains("partial_count"), p)
    // margins read the persisted cell relation, not the fact table:
    // cells + row/col margins + grand total = 4 cache reads (the plan
    // text repeats the cached CHILD per site, so count scans, not
    // FileScan mentions)
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 4,
      "margins did not all read the persisted cells:\n" + p)
  }

  test("q71: the fact table collapses into the price histogram BEFORE " +
    "the window (partial agg + broadcast dim, no row-level window)") {
    val p = plan(Relational.q71WeightedMedian(spark, sf))
    assert(p.contains("partial_sum"),
      "histogram agg does not combine map-side:\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "part dim did not broadcast:\n" + p)
    assert(p.contains("Window"), p)
  }

  test("s13: MIH candidates come from a broadcast hash join on " +
    "(band, subcode) — never a nested-loop all-pairs scan") {
    val p = plan(Similarity.mihHammingTopKDf(
      graft.Tables.t(spark, sf, "embeddings")))
    assert(p.contains("BroadcastHashJoin"),
      "band index did not hash-join:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "s13 planned an all-pairs scan:\n" + p)
  }

  test("q72: deviations persist — den and the lag join probe the " +
    "cache, never the fact table twice; stats broadcast") {
    val p = plan(Relational.q72Autocorr(spark, sf))
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
      "lag join or den pass re-derived the deviations:\n" + p)
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q73: the naive 24 h lookback join is auto-banded by " +
    "RangeJoinRewrite — band key present, no inequality nested loop") {
    val p = plan(Relational.q73Attribution(spark, sf))
    assert(p.contains("__graft_band"),
      "RangeJoinRewrite did not fire on q73:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "q73 planned the unbounded inequality join:\n" + p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("q74: the KEYLESS 60 s window join — BNLJ territory — plans as " +
    "a banded hash join via RangeJoinRewrite") {
    val p = plan(Relational.q74SurgeWindow(spark, sf))
    assert(p.contains("__graft_band"),
      "RangeJoinRewrite did not fire on q74:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "q74 planned the keyless nested loop:\n" + p)
  }

  test("g12: joint-degree matrix is two node-keyed hash joins + one " +
    "partial-agged count — no window, no nested loop") {
    val p = plan(graft.queries.Graph.jointDegree(spark, sf))
    assert(p.contains("partial_count"), p)
    assert(!p.contains("Window"), "unexpected window:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "g12 planned an all-pairs scan:\n" + p)
  }

  test("d16: the Levenshtein verifier joins the candidate relation — " +
    "no cartesian, signature agg combines map-side") {
    val p = plan(Dedup.editVerifyDf(
      graft.Tables.t(spark, sf, "documents")))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "d16 planned an all-pairs scan:\n" + p)
    assert(p.contains("partial_min"),
      "minhash signatures do not combine map-side:\n" + p)
  }

  test("q76: the fact table collapses ONCE into the persisted value " +
    "histogram — median, MAD and the flag count all probe the cache; " +
    "stats broadcast") {
    val p = plan(Relational.q76MadOutliers(spark, sf))
    // the histogram agg combines map-side before its one shuffle
    assert(p.contains("partial_count"),
      "histogram agg does not combine map-side:\n" + p)
    // three consumers (median window chain, deviation histogram,
    // flag-and-count) read the persisted histogram, never the fact
    // table again — this is the shape that beats q68's second fact
    // pass at 100 TB
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 3,
      "a histogram consumer re-scanned the fact table:\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "median/MAD stats did not broadcast:\n" + p)
  }

  test("g14: per-landmark BFS rounds are hash joins on the edge list " +
    "with map-side min combine; the P90 window is landmark-partitioned") {
    val p = plan(graft.queries.Graph.landmarkRadius(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "g14 planned an all-pairs expansion:\n" + p)
    // r12: the per-round min-hop now combines inside the eager
    // checkpoint jobs (invisible to the final plan); the observable
    // remainder is the landmark histogram agg, which must still
    // partial-combine, over the checkpointed snapshot
    assert(p.contains("partial_count"),
      "landmark histogram does not combine map-side:\n" + p)
    assert(p.contains("Scan ExistingRDD"),
      "final round snapshot not checkpointed:\n" + p)
    // the prefix-sum window must be keyed by landmark (never a global
    // single-task sort — the g04 lesson)
    assert(!p.contains("Window [") ||
      p.linesIterator.filter(_.contains("windowspecdefinition"))
        .forall(_.contains("landmark")),
      "g14's window is not landmark-partitioned:\n" + p)
  }

  test("q77: one user-partitioned exchange serves both lead() and the " +
    "aggregate; no self-join, no second fact pass") {
    val p = plan(Relational.q77Twap(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      "TWAP planned a join — the step integral needs only a window:\n" + p)
    // exactly one shuffle keyed on user_id feeds window + agg (AQE may
    // append an output-ordering exchange after the final sort); count
    // in the Final Plan section only — the Initial Plan echo repeats
    // the same exchange
    val userExchanges = finalSection(p).linesIterator
      .count(l => l.contains("hashpartitioning(user_id"))
    assert(userExchanges <= 1,
      "window and aggregate did not share the user_id exchange:\n" + p)
  }

  test("q79: both OHLC windows and the aggregate share ONE " +
    "(event_type, hr) exchange; no join anywhere") {
    val p = plan(Relational.q79OhlcBars(spark, sf))
    assert(!p.contains("Join"),
      "OHLC planned a join — open/close need only windows:\n" + p)
    val barExchanges = finalSection(p).linesIterator
      .count(l => l.contains("hashpartitioning(event_type"))
    assert(barExchanges <= 1,
      "windows and aggregate did not share the bar-key exchange:\n" + p)
  }

  test("g16: PPR rounds are hash joins on the persisted edge list with " +
    "map-side sum combine; the landmark relation broadcasts") {
    val p = plan(graft.queries.Graph.pprLandmark(spark, sf))
    assert(!p.contains("CartesianProduct"),
      "g16 planned a cartesian product:\n" + p)
    assert(p.contains("partial_sum"),
      "per-round mass does not combine map-side:\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      "the 1-row landmark did not broadcast:\n" + p)
  }

  test("s17: the projection is one corpus groupBy; the query set " +
    "broadcasts; the exact ranking keeps the codegen'd fixed-point dot") {
    val p = plan(Similarity.rpRecall(spark, sf))
    assert(p.contains("graft_fp_dot"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      "query set did not broadcast against the corpus:\n" + p)
  }

  test("g17: edge support reuses the oriented triangle core — no " +
    "cartesian, counts combine map-side") {
    val p = plan(graft.queries.Graph.edgeSupport(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "g17 planned an all-pairs expansion:\n" + p)
    assert(p.contains("partial_count"),
      "edge support does not combine map-side:\n" + p)
  }

  test("s16: dim stats and the query set broadcast; the pair scoring " +
    "keeps the codegen'd fixed-point dot") {
    val p = plan(Similarity.quantRecall(spark, sf))
    assert(p.contains("graft_fp_dot"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      "query set did not broadcast against the corpus:\n" + p)
  }

  test("t32: the trained profile broadcasts; classification never " +
    "shuffles the corpus a second time") {
    val p = plan(graft.queries.TextOps.trigramLid(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      "profile did not broadcast into the scoring join:\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("s19/s18: single-probe cell assignment is a codegen'd map over " +
    "the packed centroid row (no n·nCells expansion at all)") {
    // r10 collapsed the window's n·nCells EXCHANGE into a partial agg;
    // r11 removes the expansion itself: the centroids pack into one
    // broadcast row and graft_nearest_cell picks the argmin per vector
    // as a pure map — no crossJoin rows, no sort-agg materialization
    // (the 33.6 M-vector probe spilled the disk under the agg form),
    // no exchange in the assignment
    for (df <- Seq(graft.queries.Similarity.knnGraph(spark, sf),
        graft.queries.Similarity.ivfBalance(spark, sf))) {
      val p = finalSection(plan(df))
      assert(p.contains("graft_nearest_cell"),
        "cell assignment lost the map-form argmin:\n" + p)
      assert(!p.contains("partial_min(named_struct"),
        "assignment regressed to the sort-agg argmin:\n" + p)
    }
    // s18's plan (assignment → agg → one-row cross) must carry no
    // window at all; s19 keeps exactly one (the per-vector top-k rank)
    val p18 = finalSection(plan(graft.queries.Similarity.ivfBalance(spark, sf)))
    assert(!p18.contains("Window"),
      "s18 assignment regressed to the window formulation:\n" + p18)
  }

  test("a17/a16: sketch popcounts stay on the one-row sketch relation — " +
    "the probe-side aggregate carries first(), never the array fold") {
    // the r9 straggler: an interpreted ArrayAggregate popcount under
    // the probe agg re-ran 8K words × 15M absent rows at sf1; the fix
    // hoists it onto the broadcast one-row sketch. first(sbd)/first(sb)
    // in the probe agg IS the hoist — re-inlining the fold removes it.
    val p17 = plan(graft.queries.Sketches.bloomSizedAudit(spark, sf))
    assert(p17.contains("first(sbd") && p17.contains("first(sbs"),
      "a17 probe agg no longer first()s the hoisted popcounts:\n" + p17)
    val p16 = plan(graft.queries.Sketches.bloomFprAudit(spark, sf))
    assert(p16.contains("first(sb"),
      "a16 probe agg no longer first()s the hoisted popcount:\n" + p16)
  }
}
