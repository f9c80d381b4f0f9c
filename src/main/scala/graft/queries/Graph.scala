package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Iterative graph analytics over relational data — the message-passing
  * workload family the reference's reverse-web-graph query (Q2,
  * `MapleJuice.cpp` url_count exe pair) points at, taken to its natural
  * next step: a bounded-round PageRank.
  *
  * Graph: the undirected supplier↔customer relationship graph induced by
  * lineitem ⋈ orders (edge = "supplier shipped to customer", both
  * directions materialized, distinct). Node ids share one BIGINT space
  * (customers offset by [[custOffset]]).
  *
  * Determinism at scale: ranks are fixed-point BIGINTs ([[initRank]]
  * micro-units), every per-edge contribution is an integer division
  * (`pr DIV out_deg`), and the damping step is `base + (85·Σ) DIV 100`.
  * Integer message passing makes the result bit-identical regardless of
  * partitioning, aggregation order, or engine — the same trick that lets
  * the d07 label-propagation and a03 HLL oracles hash-match — so a 100 TB
  * run is auditable row-for-row against a second engine. (Float PageRank
  * sums diverge in the last bits under Spark's unordered partial
  * aggregation; rounding per round caps but never removes the risk.)
  *
  * Scale shape: the edge list is ids-only, persisted and pre-partitioned
  * on `src` once; each round is one hash join (reusing that exchange) +
  * one partial-agged groupBy on `dst`. Rounds are FIXED (3) — bounded
  * like d07's min-label propagation, not run-to-convergence, so the DAG
  * depth is static and the oracle can unroll the same rounds as CTEs.
  * `initRank` is sized so 85 · N · initRank stays far below Long.Max for
  * any realistic node count (overflow headroom documented in SCALING.md).
  */
object Graph {

  import graft.operators.ConnectedComponents.truncate

  val prRounds = 3
  val custOffset = 1000000L
  val initRank = 1000000000000L           // 1.0 in pico-rank units
  val baseRank = 150000000000L            // 0.15 · initRank (damping 0.85)
  val topN = 100

  /** The supplier↔customer undirected edge list (both directions,
    * customers offset) — ONE construction shared by g01/g04/g05/g06;
    * the SQL twin is [[undirectedEdgesSql]]. */
  private def undirectedEdges(lineitem: DataFrame, orders: DataFrame)
      : DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_suppkey"))
    val ord = orders.select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("src"),
        (col("o_custkey") + custOffset).as("dst"))
      .distinct()
    pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** SQL twin of [[undirectedEdges]]: the pairs/und CTE pair. The
    * iterative twins (g04/g05) keep their own `AS MATERIALIZED`
    * variants — DuckDB re-inlines multiply-referenced round chains
    * without the hint (the sf1 lesson), which does not apply to the
    * single-reference uses here. */
  private val undirectedEdgesSql: String =
    s"""pairs AS (
       |  SELECT DISTINCT l_suppkey AS src, o_custkey + $custOffset AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |und AS (SELECT src, dst FROM pairs
       |        UNION ALL SELECT dst, src FROM pairs)""".stripMargin

  def pageRank(s: SparkSession, dir: String): DataFrame =
    pageRankDf(t(s, dir, "lineitem"), t(s, dir, "orders"))

  def pageRankDf(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val und = undirectedEdges(lineitem, orders)
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    // ids-only adjacency with degree attached, partitioned once on the
    // per-round join key and persisted (each round probes it against a
    // different ranks relation — ReusedExchange can't help across rounds)
    val edges = truncate(und.join(deg, "src").repartition(col("src")))
    // seed from the CHECKPOINTED edges, not the raw und chain: every
    // und src survives the degree join (each src has a degree row), so
    // the node set is identical — and the seed no longer re-derives
    // the lineitem/orders join from parquet (r12)
    var ranks = edges.select(col("src").as("node")).distinct()
      .select(col("node"), lit(initRank).as("pr"))
    for (_ <- 1 to prRounds) {
      // every node of this undirected graph has in- and out-edges, so
      // the groupBy re-creates the full node set — no dangling patch-up
      ranks = edges.join(ranks, edges("src") === ranks("node"))
        .select(col("dst"), expr("pr DIV out_deg").as("m"))
        .groupBy(col("dst"))
        .agg(sum(col("m")).as("im"))
        .select(col("dst").as("node"),
          expr(s"${baseRank}L + (85L * im) DIV 100L").as("pr"))
    }
    ranks.orderBy(col("pr").desc, col("node")).limit(topN)
  }

  /** DuckDB twin: identical integer recurrence, rounds unrolled as CTEs
    * (`//` floors like Spark's DIV for non-negative operands). */
  private val pageRankSql = {
    val rounds = (1 to prRounds).map { r =>
      s"""r$r AS (
         |  SELECT dst AS node,
         |    $baseRank + (85 * SUM(pr // out_deg)) // 100 AS pr
         |  FROM e JOIN r${r - 1} ON e.src = r${r - 1}.node
         |  GROUP BY dst)"""
    }.mkString(",\n")
    s"""WITH $undirectedEdgesSql,
       |deg AS (SELECT src, COUNT(*) AS out_deg FROM und GROUP BY src),
       |e AS (SELECT und.src, und.dst, deg.out_deg
       |      FROM und JOIN deg ON und.src = deg.src),
       |r0 AS (SELECT DISTINCT src AS node, CAST($initRank AS BIGINT) AS pr
       |       FROM und),
       |$rounds
       |SELECT node, CAST(pr AS BIGINT) AS pr FROM r$prRounds
       |ORDER BY pr DESC, node LIMIT $topN""".stripMargin
  }

  // ------------------------------------------------------------------

  /** g02: triangle counting over the co-purchase graph (edge = two parts
    * appearing in the same order), reporting the [[triTopN]] most
    * triangle-dense parts.
    *
    * Enumeration is DEGREE-ORIENTED: every undirected edge {a,b} is
    * directed from the endpoint with the smaller (degree, id) to the
    * larger, and a triangle is counted exactly once as the wedge
    * u→v, u→w closed by v→w. Orientation bounds every out-degree by
    * O(√m) — the classical bound that keeps the wedge join Σ deg⁺(u)²
    * near-linear even when the raw graph has celebrity nodes — so the
    * plan is two hash joins on node/edge keys, no quadratic hot key.
    * The per-order pair expansion is NOT a lineitem⋈lineitem self-join
    * (which would shuffle the fact table twice and hash-probe it against
    * itself): [[coPairsDf]] groups each order's parts into one sorted
    * array (partial collect_set combines map-side) and expands the
    * C(size, 2) pairs with array transforms — one shuffle of (orderkey,
    * partkey) pairs total, work O(order size²) bounded by the biggest
    * single order, not the corpus.
    *
    * The oriented edge list is consumed three times (both wedge sides +
    * the closing probe), so it is persisted once.
    */
  val triTopN = 50

  def triangles(s: SparkSession, dir: String): DataFrame =
    trianglesDf(t(s, dir, "lineitem"))

  /** Distinct co-purchase pairs (a < b) via per-order array expansion —
    * join-free above the scan (pinned by PlanSpec). */
  private[graft] def coPairsDf(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("pks"))
      .select(explode(expr(
        """flatten(transform(pks,
           (x, i) -> transform(slice(pks, i + 2, size(pks)),
                               y -> struct(x AS a, y AS b))))""")).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()

  /** Degree-oriented edge list (u = smaller-(degree, id) endpoint) —
    * shared by [[trianglesDf]] and the wedge-skew probe
    * ([[graft.tools.SkewProbe]]), which measures the Σdeg⁺² mass this
    * orientation leaves per shuffle partition. NOT persisted here;
    * callers that consume it more than once persist it themselves. */
  private[graft] def orientedEdgesDf(lineitem: DataFrame): DataFrame = {
    val edges = coPairsDf(lineitem)
    orientedFromEdgesDf(edges, undirectedDegreesDf(edges))
  }

  /** Undirected degree (= #distinct co-purchase neighbors) from the
    * canonical distinct pair list — shared by the orientation rule and
    * g10's clustering-coefficient denominator. */
  private[graft] def undirectedDegreesDf(edges: DataFrame): DataFrame =
    edges.select(col("a").as("n"))
      .union(edges.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))

  private def orientedFromEdgesDf(edges: DataFrame, deg: DataFrame): DataFrame = {
    val da = deg.select(col("n").as("na"), col("d").as("dega"))
    val db = deg.select(col("n").as("nb"), col("d").as("degb"))
    // ties break toward (a,b), which is already canonical (a < b)
    edges
      .join(da, col("a") === col("na")).join(db, col("b") === col("nb"))
      .select(
        when(col("dega") <= col("degb"), col("a")).otherwise(col("b")).as("u"),
        when(col("dega") <= col("degb"), col("b")).otherwise(col("a")).as("v"))
  }

  def trianglesDf(lineitem: DataFrame): DataFrame = {
    // persist, NOT checkpoint, for the single-action wedge pipeline:
    // the r12 paired A/B read the eager checkpoint at 1.5x the wall
    // (lost stage overlap) despite halved CPU — the wedge join overlaps
    // the columnar cache build inside one job here, unlike the
    // round-based operators where the checkpoint wins both metrics
    val oriented = orientedEdgesDf(lineitem).persist()
    nodeTriangleCountsDf(oriented)
      .orderBy(col("n_tri").desc, col("node"))
      .limit(triTopN)
  }

  /** Per-node triangle participation counts from a PERSISTED oriented
    * edge list (the caller persists — the relation is consumed three
    * times: both wedge sides + the closing probe). Shared by g02's
    * top-N and g10's clustering coefficient. */
  private[graft] def nodeTriangleCountsDf(oriented: DataFrame): DataFrame =
    triangleTriplesDf(oriented)
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))

  /** The (u, v, w) triangle-triple relation from a PERSISTED oriented
    * edge list — the wedge-enumeration + Bloom-prune + closing-probe
    * core shared by g02/g10 (per-node corner counts) and g17 (per-edge
    * support). Builds its own edge sketch; the overload accepts a
    * caller-built one ([[buildEdgeSketch]]). A sketch over a SUPERSET
    * edge set stays CORRECT (false positives only weaken the prune;
    * the exact closing join removes them) — but do NOT reuse one
    * across PEEL rounds: peeling removes exactly the edges the prune
    * must know are gone, so a stale superset filter passes the dead
    * wedges a fresh one drops — measured a WASH for g18's peel (335.0
    * vs 335.3 s at sf5; SCALING.md round-9 A/B), so reuse only when
    * the edge set is UNCHANGED between calls. */
  private[graft] def triangleTriplesDf(oriented: DataFrame): DataFrame =
    triangleTriplesDf(oriented, buildEdgeSketch(oriented))

  /** Driver-built, uncapped Bloom over the packed (u,v) edge keys.
    * None ⇔ the edge set is empty (no prune needed — no wedges
    * either). Two jobs run at construction (count + sketch build) — a
    * deliberate, measured trade; see the prune rationale below. */
  private[graft] def buildEdgeSketch(oriented: DataFrame): Option[
      org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]] = {
    val packed = shiftleft(col("u").cast("long"), 32) + col("v").cast("long")
    val m = oriented.count()
    if (m == 0) None else {
      // expectedNumItems capped so the sketch never exceeds ~1.2 GB of
      // driver/broadcast memory even on a 10¹⁰-edge graph; beyond the
      // cap fpp degrades gracefully (weaker prune, same exact result)
      val zero = org.apache.spark.util.sketch.BloomFilter.create(
        m.max(1000L).min(1000000000L), 0.02)
      val bf = oriented.select(packed.as("k")).rdd
        .treeAggregate(zero)(
          (f, row) => { f.putLong(row.getLong(0)); f },
          (a, b) => { a.mergeInPlace(b); a })
      Some(oriented.sparkSession.sparkContext.broadcast(bf))
    }
  }

  private[graft] def triangleTriplesDf(oriented: DataFrame,
      sketch: Option[org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]]): DataFrame = {
    // wedge enumeration stays a STREAMED self-join on u: an array
    // expansion (collect_set per center + O(deg²) pair array, the
    // coPairsDf trick) was measured 9× SLOWER here (82 s vs 9 s at
    // sf0.1) — wedge centers have out-degree up to O(√m), so the
    // per-row materialized array is quadratically bigger than an
    // order's basket, while the join streams the same pairs without
    // ever holding a center's wedge set in memory.
    val o2 = oriented.select(col("u").as("u2"), col("v").as("w"))
    val closing = oriented.select(col("u").as("cv"), col("v").as("cw"))
    // Bloom-prune the wedge stream BEFORE the closing join's exchange:
    // Σdeg⁺² wedges (834 M at sf1) vastly outnumber the m oriented
    // edges that can close them, and Spark's own runtime bloom never
    // fires here (the creation side carries no selective predicate).
    // A driver-built sketch over the packed (u,v) edge keys — sketch
    // bytes only, the same driver traffic class as a broadcast build —
    // drops non-closing wedges map-side, so the exchange moves
    // ~(triangles + fpp·wedges) rows instead of every wedge. False
    // positives are removed by the exact closing join, and packing is
    // deterministic on both sides, so the result is bit-identical even
    // if keys ever overflowed the 32-bit split (a collision only
    // weakens the prune, never drops a real wedge).
    //
    // Two jobs run at construction time (count + sketch build) — a
    // deliberate, measured trade. The sketch is built DIRECTLY with
    // util.sketch.BloomFilter over a treeAggregate: EVERY SQL-layer
    // construction is hard-capped at 64 Mbit in Spark 4 —
    // InjectRuntimeFilter by spark.sql.optimizer.runtime.bloomFilter
    // .maxNumBits at analysis (r7 finding, benched 3.4× slower), and
    // stat.bloomFilter by the same ceiling (r8 finding: at sf1's 12 M
    // edges it returned bitSize = 2²⁶ with expectedFpp() = 0.222;
    // random-key probing measured 22.2 % — tools.BloomCheck). A
    // saturated filter kept 197 M of 822 M wedges (24 %) when only
    // 6.35 M close — the wedge exchange was 8× bigger than the sketch
    // math promised, which is what exhausted the disk at sf5/sf10.
    // treeAggregate sizes from the true edge count (12.2 MB at sf1 —
    // measured kept-fraction 4.3 % / 35 M rows / 0.39 GB exchange
    // after the fix), merges fpp-sized partials (not rows), and the
    // count reuses the persisted relation the query materializes
    // anyway.
    val wedges = oriented.join(o2, col("u") === col("u2") && col("v") =!= col("w"))
    val pruned = sketch match {
      case None => wedges
      case Some(bc) =>
        // codegen'd primitive probe (r12): the boxed ScalaUDF form put
        // an encoder round-trip on every wedge row — see
        // functions.BloomMightContain for the A/B rationale
        wedges.filter(graft.functions.VectorFunctions.bloomMightContain(
          shiftleft(col("v").cast("long"), 32) + col("w").cast("long"), bc))
    }
    // SHUFFLE_HASH: the closing probe must never SORT the wedge stream.
    // Unhinted, the planner picks sort-merge and the sort buffers the
    // full surviving wedge relation (197 M rows / 2.2 GB spilled at
    // sf1, measured by tools.SpillProbe) — at sf5/sf10 those sort runs
    // exhausted a 77 GB disk. Hash-building the ids-only EDGE side
    // (~12 MB/partition at sf1) makes the wedge side streamed-only:
    // probe-and-emit, nothing buffered — spill 2.18 GB → 0 and the
    // probe wall 49.8 s → 33.5 s at sf1; the remaining disk is the
    // irreducible 1.9 GB wedge-exchange write (SCALING.md round-8).
    pruned
      .join(closing.hint("SHUFFLE_HASH"),
        col("v") === col("cv") && col("w") === col("cw"))
      .select(col("u"), col("v"), col("w"))
  }

  /** DuckDB twin: identical orientation rule and wedge-close join.
    * pairs/deg/o are MATERIALIZED (the g03/d07 lesson): o is referenced
    * three times (both wedge sides + the closing probe) and each inline
    * copy re-runs the lineitem self-join + DISTINCT — disk-exhausted at
    * sf1 before the hint. */
  /** Shared DuckDB CTE core: canonical pairs → degrees → oriented edges
    * → triangles → per-node corner counts. Composed into the g02 and
    * g10 twins (one definition — a drifted copy would fail both). */
  private val triCoreCtes =
    """pairs AS MATERIALIZED (
      |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |deg AS MATERIALIZED (
      |  SELECT n, COUNT(*) AS d FROM (
      |    SELECT a AS n FROM pairs UNION ALL SELECT b AS n FROM pairs)
      |  GROUP BY n),
      |o AS MATERIALIZED (
      |  SELECT CASE WHEN da.d <= db.d THEN a ELSE b END AS u,
      |         CASE WHEN da.d <= db.d THEN b ELSE a END AS v
      |  FROM pairs JOIN deg da ON pairs.a = da.n
      |             JOIN deg db ON pairs.b = db.n),
      |tri AS (
      |  SELECT o1.u, o1.v, o2.v AS w
      |  FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.v <> o2.v
      |  JOIN o oc ON oc.u = o1.v AND oc.v = o2.v),
      |corners AS (
      |  SELECT u AS node FROM tri
      |  UNION ALL SELECT v FROM tri
      |  UNION ALL SELECT w FROM tri),
      |tcnt AS (SELECT node, COUNT(*) AS n_tri FROM corners GROUP BY node)"""
      .stripMargin

  private val trianglesSql =
    s"""WITH $triCoreCtes
       |SELECT node, n_tri FROM tcnt
       |ORDER BY n_tri DESC, node LIMIT $triTopN""".stripMargin

  // ------------------------------------------------------------------

  /** g10: local clustering coefficient — per-node `2·tri / (d·(d−1))`
    * over the co-purchase graph (the community-density score under
    * recommender "tight cluster" detection; the per-node refinement of
    * g02's raw triangle counts). The ratio is exact integer ppm
    * (`n_tri·2·10⁶ div d(d−1)`), so no float division touches the
    * output, and ties order by (coeff, n_tri, node) — fully
    * deterministic.
    *
    * Shape: g02's degree-oriented triangle core verbatim (persisted
    * oriented edges, Bloom-pruned wedge stream) plus one LEFT join of
    * the node-sized degree relation against the node-sized triangle
    * counts — nothing new moves at fact scale, and both node relations
    * key-shuffle on node id (at 10⁹ nodes neither side broadcasts). */
  val ccTopN = 50

  def clusteringCoeff(s: SparkSession, dir: String): DataFrame =
    clusteringCoeffDf(t(s, dir, "lineitem"))

  def clusteringCoeffDf(lineitem: DataFrame): DataFrame = {
    val edges = coPairsDf(lineitem).persist() // see g02's r12 A/B note
    val deg = undirectedDegreesDf(edges)
    val oriented = orientedFromEdgesDf(edges, deg).persist()
    val tcnt = nodeTriangleCountsDf(oriented)
    deg.filter(col("d") >= 2)
      .join(tcnt, col("n") === col("node"), "left")
      .select(col("n").as("node"), col("d").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("coeff_ppm",
        expr("n_tri * 2000000 div (degree * (degree - 1))"))
      .orderBy(col("coeff_ppm").desc, col("n_tri").desc, col("node"))
      .limit(ccTopN)
  }

  private val clusteringCoeffSql =
    s"""WITH $triCoreCtes
       |SELECT n AS node, CAST(d AS BIGINT) AS degree,
       |  CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
       |  CAST(COALESCE(t.n_tri, 0) * 2000000 // (d * (d - 1))
       |    AS BIGINT) AS coeff_ppm
       |FROM deg LEFT JOIN tcnt t ON deg.n = t.node
       |WHERE d >= 2
       |ORDER BY coeff_ppm DESC, n_tri DESC, node LIMIT $ccTopN""".stripMargin

  // ------------------------------------------------------------------

  /** g03: connected components of the strong co-purchase graph — the
    * [[graft.operators.ConnectedComponents]] operator (the primitive
    * under d07's duplicate clusters) surfaced as its own contract
    * query, on a second graph with genuinely multiple components.
    *
    * Graph: parts are linked when they co-occur in at least
    * [[ccSupport]] distinct orders — the support cutoff prunes the
    * one-off co-purchase noise that fuses everything into a giant
    * component (and at 100 TB prunes the edge list from O(orders ·
    * basket²) to the recurring-pair core). Pair expansion reuses the
    * g02 join-free per-order array expansion ([[coPairsDf]]'s shape)
    * but keeps per-pair counts instead of distinct-ing.
    *
    * Labels come from the POINTER-JUMPING propagation
    * ([[graft.operators.ConnectedComponents.minLabelJumping]]):
    * co-occurrence graphs grow long chains with the data (the sf0.001
    * slice already has a radius-6 component), so the linear-coverage
    * variant d07 uses would need diameter-many rounds — jumping covers
    * radius ≳ 20 in [[compRounds]] = 4 bounded rounds, exponential in
    * rounds, while keeping the DAG static so the oracle unrolls the
    * identical two-step (propagate, shortcut) recurrence per round. */
  val ccSupport = 3
  val compRounds = 4

  /** Shared co-purchase pair expansion — ONE spelling for the three
    * queries on this graph (g03 components, g07 LPA, g19 modularity):
    * parts linked when they co-occur in ≥ [[ccSupport]] distinct
    * orders, one (a<b, support) row per recurring pair. Per-order
    * join-free array expansion (the g02 shape), counted not
    * distinct-ed, so support = number of shared orders. */
  private[queries] def supportPairsDf(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("pks"))
      .select(explode(expr(
        """flatten(transform(pks,
           (x, i) -> transform(slice(pks, i + 2, size(pks)),
                               y -> struct(x AS a, y AS b))))""")).as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= ccSupport)

  /** The pc CTE twin of [[supportPairsDf]] — the oracle side may
    * afford the quadratic self-join form. Shared verbatim by the
    * g03/g07/g19 twins (a drifted copy would silently desync the
    * graphs they analyze). */
  private val coPairSupportCte =
    s"""pc AS MATERIALIZED (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b,
       |    COUNT(DISTINCT a.l_orderkey) AS support
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= $ccSupport)""".stripMargin

  def components(s: SparkSession, dir: String): DataFrame =
    componentsDf(t(s, dir, "lineitem"))

  def componentsDf(lineitem: DataFrame): DataFrame = {
    val pairCounts = supportPairsDf(lineitem)
    // the expansion is the expensive subtree and feeds four consumers
    // (nodes twice via union, und twice) — persist it once
    val edges = truncate(
      pairCounts.select(col("a").as("src"), col("b").as("dst")))
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val labels = graft.operators.ConnectedComponents
      .minLabelJumping(nodes, edges, compRounds)
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
    labels.join(sizes, "label")
      .select(col("id").as("part"), col("label").as("component"),
        col("n_nodes").as("component_size"))
      .orderBy("part")
  }

  /** DuckDB twin: self-join pair counts (the oracle side may afford the
    * quadratic form), identical support cutoff, and each round unrolled
    * as the same two CTEs — propagate (p) then pointer-jump (l). Every
    * CTE is MATERIALIZED: DuckDB inlines CTEs by default, and each
    * round references its predecessor twice, so an inlined chain
    * re-expands the pair computation 2^rounds times — the exact
    * plan-doubling disease the Spark side cures with localCheckpoint
    * (it spilled DuckDB to disk exhaustion at sf0.1 before this). */
  private val componentsSql = {
    val rounds = (1 to compRounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT l.id, LEAST(l.label, COALESCE(m.nbr, l.label)) AS label
         |  FROM l${r - 1} l LEFT JOIN (
         |    SELECT u.src AS id, MIN(n.label) AS nbr
         |    FROM u JOIN l${r - 1} n ON n.id = u.dst GROUP BY u.src) m
         |  USING (id)),
         |l$r AS MATERIALIZED (
         |  SELECT p.id, q.label
         |  FROM p$r p JOIN p$r q ON p.label = q.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $coPairSupportCte,
       |u AS MATERIALIZED (SELECT a AS src, b AS dst FROM pc
       |      UNION ALL SELECT b, a FROM pc),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM u),
       |$rounds,
       |sz AS (SELECT label, COUNT(*) AS n_nodes FROM l$compRounds GROUP BY label)
       |SELECT l.id AS part, l.label AS component,
       |  sz.n_nodes AS component_size
       |FROM l$compRounds l JOIN sz ON l.label = sz.label
       |ORDER BY part""".stripMargin
  }

  // ------------------------------------------------------------------

  /** g04: adaptive k-core peeling of the supplier↔customer graph
    * (g01's graph) — the community-density primitive next to
    * components (membership), triangles (local closure) and PageRank
    * (centrality). k is NOT a constant: it is the graph's own
    * 25th-percentile degree (the exact order statistic at rank
    * ⌈n/4⌉ = `(n+3) div 4` — all-integer, the q47 percentile_disc
    * discipline), so the peel stays meaningful at every corpus scale
    * (a fixed k is degenerate on synthetic data: the co-purchase
    * support-2 graph's k=3 core has 983 nodes at sf0.01 and ZERO at
    * sf0.1 — measured; density-relative k peels ~20-23 % of nodes at
    * sf0.001/0.01/0.1 alike and converges within the bounded rounds
    * at all three). Rounds are FIXED ([[coreRounds]], the g01/g03
    * discipline): output is "the graph after R peel rounds at the
    * quantile k" — a deterministic relation the oracle unrolls
    * identically.
    *
    * Scale: the threshold is an exact order statistic computed as a
    * degree-histogram prefix sum — the only windowed relation is the
    * distinct-degree histogram, never the node set — persisted and
    * broadcast as a scalar;
    * each round is TWO WINDOW COUNTS (partition by src, then by dst)
    * + a filter on the ids-only edge list — an edge survives iff both
    * endpoint degrees clear k, which is exactly the keep-set
    * semantics without building a keep set. The window form keeps the
    * whole peel one linear pipeline (each round references its
    * predecessor once): measured 6.5 s at sf0.1 vs 15.9 s for
    * semi-joins with per-round persist barriers and 43 s without them
    * (lineage doubles per round when the keep subtree references the
    * previous round too). Peeling MONOTONICALLY shrinks the edge
    * list, so rounds get cheaper as they proceed, and degrees are
    * recomputed each round, never cached stale. */
  val coreRounds = 4

  def kcore(s: SparkSession, dir: String): DataFrame =
    kcoreDf(t(s, dir, "lineitem"), t(s, dir, "orders"))

  def kcoreDf(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var und = truncate(undirectedEdges(lineitem, orders))
    val deg0 = und.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // one-row threshold relation, persisted: each round's keep filter
    // re-broadcasts it, and without the persist every broadcast job
    // re-runs the degree aggregate + order-statistic window.
    // The order statistic is computed over the DEGREE HISTOGRAM, not
    // the node relation: a row_number window with no partitionBy over
    // deg0 funnels every node-degree row through ONE task (fine at
    // sf0.1, a single-task sort at 10⁹ nodes). groupBy(d) first makes
    // the windowed relation distinct-degree-sized (≲√|E| on power-law
    // graphs); the rank-⌈n/4⌉ degree is then the bucket whose
    // inclusive prefix count first covers the rank — exact same k,
    // the heavy step now a distributed hash agg.
    val hist = deg0.groupBy(col("d")).agg(count(lit(1)).as("cnt"))
    val kVal = hist
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("d"))))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(lit(1))))
      .filter(expr("cum - cnt < (n + 3) div 4 AND (n + 3) div 4 <= cum"))
      .select(col("d").as("k"))
      .persist()
    // each peel round: an edge survives iff BOTH endpoint degrees
    // (counted over the current edge set) clear the threshold. The
    // window form keeps the whole peel ONE linear pipeline — each
    // round references its predecessor once (no keep-set subtree, so
    // no per-round materialization barrier and no lineage doubling;
    // the semi-join formulation measured 15.9 s with per-round
    // persists and 43 s without — this is 6 s, same rows)
    var peeled = und.crossJoin(broadcast(kVal))
    for (_ <- 1 to coreRounds) {
      peeled = peeled
        .withColumn("ds", count(lit(1)).over(
          Window.partitionBy(col("src"))))
        .withColumn("dd", count(lit(1)).over(
          Window.partitionBy(col("dst"))))
        .filter(col("ds") >= col("k") && col("dd") >= col("k"))
        .select(col("src"), col("dst"), col("k"))
    }
    peeled.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_degree"))
      .select(col("node"),
        when(col("node") >= custOffset, lit("customer"))
          .otherwise(lit("supplier")).as("role"),
        col("core_degree"))
      .orderBy("node")
  }

  /** DuckDB twin: identical quantile threshold and R unrolled peel
    * rounds; every per-round CTE MATERIALIZED (each is referenced
    * twice — the g03 2^rounds re-expansion lesson). */
  private val kcoreSql = {
    val rounds = (1 to coreRounds).map { r =>
      s"""k$r AS MATERIALIZED (
         |  SELECT src AS id FROM e${r - 1}
         |  GROUP BY src HAVING COUNT(*) >= (SELECT k FROM kv)),
         |e$r AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e${r - 1} e
         |  JOIN k$r a ON e.src = a.id
         |  JOIN k$r b ON e.dst = b.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey AS src, o_custkey + $custOffset AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e0 AS MATERIALIZED (SELECT src, dst FROM pairs
       |      UNION ALL SELECT dst, src FROM pairs),
       |d0 AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM e0 GROUP BY src),
       |kv AS MATERIALIZED (
       |  SELECT d AS k FROM (
       |    SELECT d, ROW_NUMBER() OVER (ORDER BY d, src) AS rn FROM d0)
       |  WHERE rn = ((SELECT COUNT(*) FROM d0) + 3) // 4),
       |$rounds
       |SELECT src AS node,
       |  CASE WHEN src >= $custOffset THEN 'customer'
       |       ELSE 'supplier' END AS role,
       |  CAST(COUNT(*) AS BIGINT) AS core_degree
       |FROM e$coreRounds GROUP BY src ORDER BY node""".stripMargin
  }

  // ------------------------------------------------------------------

  /** g05: bounded multi-source BFS — hop distance from the graph's
    * [[bfsSeeds]] highest-degree hubs over the g01 supplier↔customer
    * graph. The reachability/shortest-path primitive the family still
    * lacked next to centrality (g01), closure (g02), membership (g03)
    * and density (g04); in a data pipeline it is "how far is every
    * node from the hubs" (influence radius, crawl frontier, cache-tier
    * assignment).
    *
    * Determinism: seeds are an exact integer order statistic (degree
    * DESC, node id ASC, LIMIT [[bfsSeeds]] — a TakeOrdered, never a
    * global sort); hops are small integers; the per-round min-hop
    * combine is order-invariant. Rounds are FIXED ([[bfsRounds]], the
    * g01/g03/g04 discipline) so the DAG depth is static and the oracle
    * unrolls the same rounds as MATERIALIZED CTEs (each round is
    * referenced twice — union + frontier join — the inline-doubling
    * lesson from g03).
    *
    * Scale shape: the undirected edge list is ids-only and persisted
    * once; each round is ONE hash join (frontier ⋈ edges on src) + one
    * partial-agged min-hop groupBy. The frontier relation is
    * (node, hop) = 16 B rows, monotonically growing to |V| at most —
    * never edge-sized. Per-round persist truncates lineage exactly as
    * g03's label rounds do (reliable-checkpoint switch applies there;
    * 3 rounds × slim relation keeps memory bounded here). */
  val bfsRounds = 3
  val bfsSeeds = 5

  def bfsHops(s: SparkSession, dir: String): DataFrame =
    bfsHopsDf(t(s, dir, "lineitem"), t(s, dir, "orders"))

  def bfsHopsDf(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    import graft.operators.ConnectedComponents.truncate
    // truncate (localCheckpoint) instead of persist for the multiply-
    // read relations (r12): GraphRoundProbe measured the default
    // columnar cache at ~4-6 s executor-CPU PER SCAN of the 1.17 M-row
    // edge list at sf0.1 (compressed-batch decode + row materialize)
    // vs ~0.9-1.3 s for a checkpoint's serialized UnsafeRows — and the
    // columnar build itself 2× the checkpoint's. The rounds re-read
    // these relations 3-4×, so the cache format dominated the query
    // (35.5 s CPU, vs ~1.4 s for the persist-free g06 over the same
    // edge list). Same rows, same plan shape above the scan; the
    // local/reliable trade is [[ConnectedComponents.checkpointModeKey]].
    val und = truncate(undirectedEdges(lineitem, orders))
    val seeds = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("node"))
      .limit(bfsSeeds)
    var dist = truncate(seeds.select(col("node"), lit(0L).as("hop")))
    for (r <- 1 to bfsRounds) {
      // expand ONLY the hop-(r-1) frontier: nodes settled earlier already
      // contributed their neighbors in earlier rounds, so re-joining the
      // whole accumulated relation would regrow with the closure, not
      // the frontier (min-hop would discard the duplicates — at full
      // cost)
      val next = dist.filter(col("hop") === (r - 1)).as("f")
        .join(und.as("u"), col("f.node") === col("u.src"))
        .select(col("u.dst").as("node"), lit(r.toLong).as("hop"))
      dist = truncate(dist.union(next)
        .groupBy(col("node")).agg(min(col("hop")).as("hop")))
    }
    dist.select(col("node"), col("hop"),
      when(col("node") >= custOffset, "customer")
        .otherwise("supplier").as("role"))
      .orderBy("node")
  }

  private val bfsHopsSql = {
    val rounds = (1 to bfsRounds).map { r =>
      s"""h$r AS MATERIALIZED (
         |  SELECT node, MIN(hop) AS hop FROM (
         |    SELECT node, hop FROM h${r - 1}
         |    UNION ALL
         |    SELECT u.dst AS node, CAST($r AS BIGINT) AS hop
         |    FROM (SELECT node FROM h${r - 1} WHERE hop = ${r - 1}) f
         |    JOIN u ON u.src = f.node) GROUP BY node)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey AS src, o_custkey + $custOffset AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |u AS MATERIALIZED (SELECT src, dst FROM pairs
       |      UNION ALL SELECT dst, src FROM pairs),
       |seeds AS MATERIALIZED (
       |  SELECT src AS node FROM u GROUP BY src
       |  ORDER BY COUNT(*) DESC, src LIMIT $bfsSeeds),
       |h0 AS MATERIALIZED (
       |  SELECT node, CAST(0 AS BIGINT) AS hop FROM seeds),
       |$rounds
       |SELECT node, hop,
       |  CASE WHEN node >= $custOffset THEN 'customer'
       |       ELSE 'supplier' END AS role
       |FROM h$bfsRounds ORDER BY node""".stripMargin
  }

  // ------------------------------------------------------------------
  // ------------------------------------------------------------- g06
  /** Degree-distribution profile — the graph-health dashboard row
    * (t16's vocabulary profile for graphs): per role of the
    * supplier↔customer graph, a log₂-bucketed degree histogram with
    * per-bucket min/max/mass. This is the FIRST query a 100 TB graph
    * job runs — it decides whether g02's orientation bound holds,
    * whether AQE skew handling will fire, and how to size partitions
    * (the SkewProbe's answer, as an oracle-checked relation).
    *
    * All integer: bucket = len(bin(degree)) − 1 (⌊log₂⌋ without a
    * float log — both engines render binary identically). One
    * |nodes|-sized aggregate over the ids-only degree relation;
    * buckets are ≤ 64 per role. */
  def degreeProfile(s: SparkSession, dir: String): DataFrame =
    degreeProfileDf(t(s, dir, "lineitem"), t(s, dir, "orders"))

  def degreeProfileDf(lineitem: DataFrame, orders: DataFrame): DataFrame =
    undirectedEdges(lineitem, orders)
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(
        when(col("src") >= custOffset, "customer")
          .otherwise("supplier").as("role"),
        expr("CAST(length(bin(deg)) - 1 AS BIGINT)").as("bucket"),
        col("deg"))
      .groupBy(col("role"), col("bucket"))
      .agg(count(lit(1)).as("n_nodes"), min(col("deg")).as("min_deg"),
        max(col("deg")).as("max_deg"), sum(col("deg")).as("degree_mass"))
      .orderBy("role", "bucket")

  private val degreeProfileSql =
    s"""WITH $undirectedEdgesSql,
       |deg AS (
       |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
       |  FROM und GROUP BY src)
       |SELECT CASE WHEN src >= $custOffset THEN 'customer'
       |  ELSE 'supplier' END AS role,
       |  CAST(len(bin(deg)) - 1 AS BIGINT) AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  MIN(deg) AS min_deg, MAX(deg) AS max_deg,
       |  CAST(SUM(deg) AS BIGINT) AS degree_mass
       |FROM deg GROUP BY 1, 2 ORDER BY role, bucket""".stripMargin

  // ------------------------------------------------------------- g07
  /** Synchronous label propagation (LPA) — COMMUNITY structure, the
    * density-based grouping next to g03's connectivity (every member
    * of one component can still split into many communities) and
    * g04's core membership. Graph: g03's co-purchase part graph
    * (support ≥ [[ccSupport]]) — unipartite and sparse; LPA on the
    * bipartite supplier↔customer graph degenerates into two-sided
    * label oscillation (measured: 2 "communities" = the two sides).
    * Labels start as node ids; each round every node adopts the modal
    * label among its neighbors PLUS ITS OWN (the self-vote is the
    * standard oscillation damper), smallest label on ties; rounds are
    * FIXED ([[lpRounds]], the g01/g03/g04 discipline) so the oracle
    * unrolls the identical recurrence.
    *
    * Determinism: counts are exact integers and the argmax is
    * `max(struct(count, -label))` — max count then smallest label,
    * a total order with no float anywhere. The twin deliberately uses
    * a DIFFERENT argmax formulation (ROW_NUMBER window) so a tie-break
    * bug in either spelling breaks the differential.
    *
    * Scale: each round is one join of the ids-only edge list (persisted,
    * pre-partitioned on src) against the |V|-row label relation + two
    * partial-agged hash aggs; message volume is |E| integers. The
    * output is community-sized (one row per surviving label), never
    * node-sized. */
  val lpRounds = 3

  def labelProp(s: SparkSession, dir: String): DataFrame =
    labelPropDf(t(s, dir, "lineitem"))

  def labelPropDf(lineitem: DataFrame): DataFrame = {
    val pairCounts = supportPairsDf(lineitem)
    val edges = truncate(pairCounts
      .select(col("a").as("src"), col("b").as("dst"))
      .union(pairCounts.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src")))
    // per-round lineage truncation (the ConnectedComponents discipline):
    // labels is referenced TWICE per round (message join + self-vote
    // union), so an un-truncated analyzed plan doubles per round —
    // 2^rounds copies of the pair-expansion seed subtree
    import graft.operators.ConnectedComponents.truncate
    var labels = truncate(edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")))
    for (_ <- 1 to lpRounds) {
      labels = truncate(edges.join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("lbl"))
        .unionByName(labels.select(col("node"), col("lbl")))
        .groupBy(col("node"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("top"))
        .select(col("node"), (-col("top.nl")).as("lbl")))
    }
    labels.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"),
        min(col("node")).as("min_part"),
        max(col("node")).as("max_part"))
      .orderBy("community")
  }

  /** DuckDB twin: g03's pair/support CTEs, identical recurrence with
    * the self-vote UNION ALL, rounds unrolled; argmax via ROW_NUMBER
    * (different spelling than Spark's struct-max on purpose). Round
    * CTEs MATERIALIZED — each label relation is referenced twice per
    * round (the g03 2^rounds lesson). */
  private val labelPropSql = {
    val rounds = (1 to lpRounds).map { r =>
      s"""c$r AS MATERIALIZED (
         |  SELECT node, lbl, COUNT(*) AS c FROM (
         |    SELECT e.dst AS node, l.lbl
         |    FROM u e JOIN l${r - 1} l ON e.src = l.node
         |    UNION ALL SELECT node, lbl FROM l${r - 1})
         |  GROUP BY 1, 2),
         |l$r AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
         |      ORDER BY c DESC, lbl) AS rk FROM c$r)
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $coPairSupportCte,
       |u AS MATERIALIZED (SELECT a AS src, b AS dst FROM pc
       |      UNION ALL SELECT b, a FROM pc),
       |l0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS node, src AS lbl FROM u),
       |$rounds
       |SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
       |  MIN(node) AS min_part, MAX(node) AS max_part
       |FROM l$lpRounds GROUP BY lbl ORDER BY community""".stripMargin
  }


  // ------------------------------------------------------------- g08
  /** g08: common-neighbor / Jaccard link prediction — for every
    * co-purchase pair sharing ≥ [[cnMinCommon]] neighbors, the exact
    * overlap, both (pruned) degrees, and the Jaccard score in integer
    * ppm. This is the classic link-prediction / "customers also
    * bought" primitive: a high-Jaccard NON-edge is a recommendation,
    * a high-Jaccard edge a confirmation.
    *
    * Skew posture (the d03 stop-shingle discipline applied to
    * graphs): common-neighbor enumeration through a center costs
    * deg², so centers with degree > [[cnMaxDeg]] are dropped before
    * the pair expansion — a hub co-neighbor carries no signal exactly
    * as a stop-shingle carries none, and the cap hard-bounds every
    * join bucket at deg² ≤ 10⁴ pairs. Degrees and Jaccard are then
    * EXACT over the pruned neighborhood (standard stop-feature
    * semantics, identical in the twin).
    *
    * Scale: one degree agg, one semi-join prune, one streamed
    * self-join on the center key (the g02 lesson: never materialize a
    * center's neighbor array), partial-agged pair counts; the ppm
    * numerator widens before ×10⁶ (the q59 rule). */
  val cnMaxDeg = 100
  val cnMinCommon = 5

  def commonNeighbors(s: SparkSession, dir: String): DataFrame =
    commonNeighborsDf(t(s, dir, "lineitem"))

  def commonNeighborsDf(lineitem: DataFrame): DataFrame = {
    // persist the quadratic co-pair expansion: the degree aggregate
    // and the center-filtered edge list BOTH read `und`, so without
    // this the per-order pair join executes twice (measured ~2× the
    // pair-generation cost at sf0.1)
    val pairs = coPairsDf(lineitem).persist() // see g02's r12 A/B note
    val und = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    val deg = und.groupBy(col("dst")).agg(count(lit(1)).as("d"))
    val keptCenters = deg.filter(col("d") <= cnMaxDeg)
      .select(col("dst").as("c"))
    // edges whose CENTER endpoint survives the hub cap, persisted: the
    // pruned-degree agg and both self-join sides read it
    val e = und.join(keptCenters, und("dst") === keptCenters("c"))
      .select(col("src").as("node"), col("c"))
      .persist()
    val pd = e.groupBy(col("node")).agg(count(lit(1)).as("pdeg"))
    val cn = e.as("x").join(e.as("y"),
        col("x.c") === col("y.c") && col("x.node") < col("y.node"))
      .groupBy(col("x.node").as("a"), col("y.node").as("b"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= cnMinCommon)
    cn.join(pd.select(col("node").as("na"), col("pdeg").as("deg_a")),
        col("a") === col("na"))
      .join(pd.select(col("node").as("nb"), col("pdeg").as("deg_b")),
        col("b") === col("nb"))
      .select(col("a"), col("b"), col("common"), col("deg_a"), col("deg_b"),
        expr("""CAST(common AS DECIMAL(38,0)) * 1000000
                div (deg_a + deg_b - common)""").as("jaccard_ppm"))
      .orderBy("a", "b")
  }

  /** DuckDB twin: the quadratic pair-count form of coPairs (the g03
    * oracle's choice — the oracle may afford it), identical hub cap
    * and pruned-degree semantics. */
  private val commonNeighborsSql =
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |und AS MATERIALIZED (SELECT a AS src, b AS dst FROM pairs
       |      UNION ALL SELECT b, a FROM pairs),
       |deg AS (SELECT dst, COUNT(*) AS d FROM und GROUP BY dst),
       |e AS MATERIALIZED (
       |  SELECT u.src AS node, u.dst AS c
       |  FROM und u JOIN deg ON u.dst = deg.dst
       |  WHERE deg.d <= $cnMaxDeg),
       |pd AS MATERIALIZED (
       |  SELECT node, COUNT(*) AS pdeg FROM e GROUP BY node),
       |cn AS (
       |  SELECT x.node AS a, y.node AS b, CAST(COUNT(*) AS BIGINT)
       |      AS common
       |  FROM e x JOIN e y ON x.c = y.c AND x.node < y.node
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $cnMinCommon)
       |SELECT a, b, common, pa.pdeg AS deg_a, pb.pdeg AS deg_b,
       |  CAST(CAST(common AS HUGEINT) * 1000000
       |    // (pa.pdeg + pb.pdeg - common) AS BIGINT) AS jaccard_ppm
       |FROM cn JOIN pd pa ON a = pa.node JOIN pd pb ON b = pb.node
       |ORDER BY a, b""".stripMargin

  // ------------------------------------------------------------- g09
  /** g09: bounded-round WEIGHTED shortest paths (Bellman-Ford) from the
    * g05 hub seeds — the cost-distance upgrade of g05's hop count
    * (routing cost, weighted influence radius). Edge weight is the
    * deterministic integer `(src + dst) % 97 + 1` — symmetric, so both
    * directions of an undirected edge agree by construction.
    *
    * Spark runs DELTA relaxation: each round expands only the frontier
    * of nodes whose distance IMPROVED last round, the classical
    * Bellman-Ford optimization (a node re-relaxes only after its own
    * bound drops). After round r both forms yield exactly
    * min-cost-over-≤r-edge-paths — a path that would improve v via u
    * has a prefix that improved u in an earlier round, so u was in a
    * frontier — which is what the oracle computes by FULL relaxation
    * (whole dist ⋈ edges, [[ssspRounds]] unrolled MATERIALIZED CTEs).
    * The two shapes meeting is itself the regression test for the
    * frontier algebra.
    *
    * Determinism: integer weights, integer min-combine — order- and
    * engine-invariant, the g01/g05 discipline. Scale shape: the only
    * edge-sized join input is the persisted ids+weight edge list; the
    * frontier SHRINKS once bounds settle (unlike g05's monotone
    * closure), so late rounds move candidate deltas, not the graph.
    * Per-round persist truncates lineage (g03 discipline). */
  val ssspRounds = 3

  def sssp(s: SparkSession, dir: String): DataFrame =
    ssspDf(t(s, dir, "lineitem"), t(s, dir, "orders"))

  def ssspDf(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val und = truncate(undirectedEdges(lineitem, orders)
      .withColumn("w", (col("src") + col("dst")) % 97 + lit(1L)))
    val seeds = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("node"))
      .limit(bfsSeeds)
    var dist = truncate(seeds.select(col("node"), lit(0L).as("dist")))
    var frontier = dist
    for (_ <- 1 to ssspRounds) {
      // relax ONLY last round's improved set; min-combine candidates
      // before touching the accumulated dist (map-side partial min)
      val cand = frontier.as("f")
        .join(und.as("u"), col("f.node") === col("u.src"))
        .select(col("u.dst").as("node"),
          (col("f.dist") + col("u.w")).as("dist"))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      val improved = cand.as("c")
        .join(dist.select(col("node").as("dn"), col("dist").as("dd")),
          col("node") === col("dn"), "left")
        .filter(col("dd").isNull || col("c.dist") < col("dd"))
        .select(col("c.node").as("node"), col("c.dist").as("dist"))
        // columnar persist, not a checkpoint, for the SMALL improved
        // delta (≤ node-sized): a union of two checkpointed relations
        // trips Spark's Union constraint rewrite on empty input
        // (key-not-found on a non-output attr), and at this size the
        // cache-scan cost is nil — the edge list above is where the
        // checkpoint pays
        .persist()
      dist = truncate(dist.union(improved)
        .groupBy(col("node")).agg(min(col("dist")).as("dist")))
      frontier = improved
    }
    dist.select(col("node"), col("dist"),
      when(col("node") >= custOffset, "customer")
        .otherwise("supplier").as("role"))
      .orderBy("node")
  }

  private val ssspSql = {
    val rounds = (1 to ssspRounds).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT node, MIN(dist) AS dist FROM (
         |    SELECT node, dist FROM d${r - 1}
         |    UNION ALL
         |    SELECT u.dst AS node, p.dist + u.w AS dist
         |    FROM d${r - 1} p JOIN u ON u.src = p.node) GROUP BY node)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey AS src, o_custkey + $custOffset AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |u AS MATERIALIZED (
       |  SELECT src, dst, (src + dst) % 97 + 1 AS w FROM (
       |    SELECT src, dst FROM pairs
       |    UNION ALL SELECT dst, src FROM pairs)),
       |seeds AS MATERIALIZED (
       |  SELECT src AS node FROM u GROUP BY src
       |  ORDER BY COUNT(*) DESC, src LIMIT $bfsSeeds),
       |d0 AS MATERIALIZED (
       |  SELECT node, CAST(0 AS BIGINT) AS dist FROM seeds),
       |$rounds
       |SELECT node, CAST(dist AS BIGINT) AS dist,
       |  CASE WHEN node >= $custOffset THEN 'customer'
       |       ELSE 'supplier' END AS role
       |FROM d$ssspRounds ORDER BY node""".stripMargin
  }

  // ------------------------------------------------------------------

  /** g11: HITS hubs & authorities (Kleinberg) on the DIRECTED
    * supplier→customer shipment graph — the "who supplies the
    * important customers / who is supplied by the important
    * suppliers" mutual-reinforcement score PageRank's single rank
    * can't express. Two fixed update rounds (auth ← Σ in-hub,
    * hub ← Σ out-auth), each followed by the standard L1
    * normalization so scores stay comparable across rounds.
    *
    * Determinism: scores are integer micro-units; normalization is
    * `floor(raw · 10¹² / Σraw)` computed in DECIMAL(38,0) — the
    * numerator multiply keeps scale 0 (never rounds) and `div` is
    * integral, so no float touches a decision or an output cell
    * (the g01/q63–q68 discipline). Headroom: raw·10¹² ≤ 10¹⁸·|E|,
    * inside 38 digits to |E| ≈ 10²⁰ edges.
    *
    * Scale shape: the directed edge list is ids-only, persisted once
    * and reused by all four message rounds (each round = one hash
    * join + one partial-agged groupBy — the g01 shape). The L1 total
    * is a one-row aggregate broadcast back (never a global window);
    * top-N per side via orderBy+limit (TakeOrdered, never collected).
    * Reference analogue: the reverse-web-graph exe pair
    * (linked_graph_map.cpp / linked_graph_reduce.cpp) is exactly one
    * un-normalized authority round; g11 is its fixed-point closure. */
  val hitsScale = 1000000000000L          // 1.0 in pico-score units
  val hitsTopN = 50

  def hits(s: SparkSession, dir: String): DataFrame =
    hitsDf(t(s, dir, "lineitem"), t(s, dir, "orders"))

  def hitsDf(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_suppkey"))
    val ord = orders.select(col("o_orderkey"), col("o_custkey"))
    val e = truncate(li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("src"),
        (col("o_custkey") + custOffset).as("dst"))
      .distinct())
    // floor(raw·10¹²/Σraw) in DECIMAL(38,0): `div` is integral, the
    // multiply never rounds (scale 0), Σ over a one-row broadcast
    def l1Normalize(raw: DataFrame): DataFrame = {
      val tot = raw.agg(
        sum(col("raw").cast("decimal(38,0)")).as("tot"))
      raw.crossJoin(broadcast(tot))
        .select(col("node"),
          expr(s"cast(raw as decimal(38,0)) * ${hitsScale}L div tot")
            .as("score"))
    }
    def authFrom(hub: DataFrame): DataFrame = l1Normalize(
      e.join(hub, e("src") === hub("node"))
        .groupBy(col("dst")).agg(sum(col("score")).as("raw"))
        .select(col("dst").as("node"), col("raw")))
    def hubFrom(auth: DataFrame): DataFrame = l1Normalize(
      e.join(auth, e("dst") === auth("node"))
        .groupBy(col("src")).agg(sum(col("score")).as("raw"))
        .select(col("src").as("node"), col("raw")))
    // round-1 authority under the uniform h0 = 10⁶ is just
    // in_deg·10⁶ — fold the would-be constant join into the agg
    // (Σ of a constant = count·constant, exact)
    val a1 = truncate(l1Normalize(
      e.groupBy(col("dst")).agg((count(lit(1)) * 1000000L).as("raw"))
        .select(col("dst").as("node"), col("raw"))))
    val h1 = truncate(hubFrom(a1))
    val a2 = authFrom(h1)
    val top = (side: DataFrame, role: String) =>
      side.orderBy(col("score").desc, col("node")).limit(hitsTopN)
        .select(lit(role).as("role"), col("node"), col("score"))
    top(a2, "authority").unionAll(top(h1, "hub"))
      .orderBy(col("role"), col("score").desc, col("node"))
  }

  /** DuckDB twin: identical integer recurrence in HUGEINT (128-bit,
    * same ≥38-digit headroom as the Spark DECIMAL(38,0) path; `//`
    * truncates like `div` for the non-negative operands here). */
  private val hitsSql = {
    def norm(rawCte: String) =
      s"""SELECT node, CAST(CAST(raw AS HUGEINT) * $hitsScale
         |  // (SELECT SUM(CAST(raw AS HUGEINT)) FROM $rawCte)
         |  AS BIGINT) AS score FROM $rawCte""".stripMargin
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey AS src, o_custkey + $custOffset AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |a1r AS (SELECT dst AS node,
       |          CAST(COUNT(*) AS BIGINT) * 1000000 AS raw
       |        FROM e GROUP BY dst),
       |a1 AS MATERIALIZED (${norm("a1r")}),
       |h1r AS (SELECT src AS node, SUM(score) AS raw
       |        FROM e JOIN a1 ON e.dst = a1.node GROUP BY src),
       |h1 AS MATERIALIZED (${norm("h1r")}),
       |a2r AS (SELECT dst AS node, SUM(score) AS raw
       |        FROM e JOIN h1 ON e.src = h1.node GROUP BY dst),
       |a2 AS (${norm("a2r")})
       |SELECT role, node, score FROM (
       |  SELECT 'authority' AS role, node, score FROM a2
       |  ORDER BY score DESC, node LIMIT $hitsTopN)
       |UNION ALL
       |SELECT role, node, score FROM (
       |  SELECT 'hub' AS role, node, score FROM h1
       |  ORDER BY score DESC, node LIMIT $hitsTopN)
       |ORDER BY role, score DESC, node""".stripMargin
  }

  // ------------------------------------------------------------- g12
  /** g12: joint degree distribution — edge counts between log₂-degree
    * buckets of the two endpoints, per source role. The SCALABLE form
    * of the assortativity audit (Newman 2002): a Pearson r over raw
    * degrees needs Σ(deg_a·deg_b)²-class moments that overflow any
    * fixed-width integer on a 10¹²-edge graph, while the joint bucket
    * matrix is additive, bounded (≤ roles × 40 × 40 rows forever) and
    * loses nothing a mixing analysis needs — compute r FROM the
    * matrix if wanted, it is bucket-sized. Hub-heavy rows jump out as
    * mass in (high, low) cells — the skew screen g06 gives per node,
    * here per EDGE.
    *
    * Scale: one degree agg over the edge list, then the edge list
    * re-joins the node-bucket relation on each endpoint — two
    * node-keyed hash joins and a partial-agged count; nothing beyond
    * edge-sized ever moves, no window anywhere. */
  def jointDegree(s: SparkSession, dir: String): DataFrame =
    jointDegreeDf(t(s, dir, "lineitem"), t(s, dir, "orders"))

  def jointDegreeDf(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val und = undirectedEdges(lineitem, orders)
    val b = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"),
        expr("CAST(length(bin(deg)) - 1 AS BIGINT)").as("bucket"))
    und.join(b.as("x"), col("src") === col("x.node"))
      .join(b.as("y"), col("dst") === col("y.node"))
      .select(
        when(col("src") >= custOffset, "customer")
          .otherwise("supplier").as("src_role"),
        col("x.bucket").as("src_bucket"),
        col("y.bucket").as("dst_bucket"))
      .groupBy(col("src_role"), col("src_bucket"), col("dst_bucket"))
      .agg(count(lit(1)).as("n_edges"))
      .orderBy("src_role", "src_bucket", "dst_bucket")
  }

  /** Twin: und is referenced three times (degree agg + both endpoint
    * joins run off it), so it is MATERIALIZED here — the g03/d07
    * re-inlining lesson. */
  private val jointDegreeSql =
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey AS src, o_custkey + $custOffset AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |und AS MATERIALIZED (SELECT src, dst FROM pairs
       |      UNION ALL SELECT dst, src FROM pairs),
       |b AS MATERIALIZED (
       |  SELECT src AS node,
       |    CAST(len(bin(CAST(COUNT(*) AS BIGINT))) - 1 AS BIGINT) AS bucket
       |  FROM und GROUP BY src)
       |SELECT CASE WHEN u.src >= $custOffset THEN 'customer'
       |    ELSE 'supplier' END AS src_role,
       |  x.bucket AS src_bucket, y.bucket AS dst_bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_edges
       |FROM und u JOIN b x ON u.src = x.node JOIN b y ON u.dst = y.node
       |GROUP BY 1, 2, 3 ORDER BY src_role, src_bucket, dst_bucket""".stripMargin

  // ------------------------------------------------------------- g13
  /** g13: degree assortativity — the Newman 2002 mixing coefficient the
    * g12 scaladoc promises ("compute r FROM the matrix if wanted"):
    * a weighted Pearson over the joint log₂-degree-bucket grid, per
    * source role. Negative = disassortative (hubs attach to leaves —
    * the expected shape for a bipartite-ish supplier↔customer graph),
    * positive = assortative.
    *
    * Determinism + headroom: bucket values are ≤ 62, so every moment
    * (Σw·x·y etc.) fits a BIGINT up to 10¹³ edges and the q65 ppm
    * algebra runs on exact DECIMAL(38,0)/HUGEINT — computing r over
    * RAW degrees instead needs Σ(deg·deg)² moments that overflow 38
    * digits on a 10¹²-edge graph, which is exactly why the grid form
    * exists. cov_n can be negative here (unlike q65's price/quantity
    * slope), so every division is the q72 sign-split: abs-divide,
    * re-apply the sign — Spark's truncating `div` and DuckDB's `//`
    * agree on non-negative operands only. r² is two chained divides
    * (q1 = |cov|·10⁶ div vx, then q1·|cov| div vy) — Cauchy-Schwarz
    * bounds q1·|cov| ≤ 10⁶·vy_n, inside 38 digits at any edge count
    * whose moments fit (spelled identically in the twin, so the
    * intermediate truncation is engine-identical).
    *
    * Scale: the grid build is g12 (two node-keyed hash joins, nothing
    * beyond edge-sized moves); the moments are one hash agg over the
    * ≤ roles×40×40 grid. */
  def assortativity(s: SparkSession, dir: String): DataFrame =
    assortativityDf(t(s, dir, "lineitem"), t(s, dir, "orders"))

  def assortativityDf(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val grid = jointDegreeDf(lineitem, orders)
      .select(col("src_role"), col("src_bucket").as("x"),
        col("dst_bucket").as("y"), col("n_edges").as("w"))
    grid.groupBy(col("src_role"))
      .agg(sum(col("w")).as("n_edges"),
        sum(col("w") * col("x")).as("sx"),
        sum(col("w") * col("y")).as("sy"),
        sum(col("w") * col("x") * col("y")).as("sxy"),
        sum(col("w") * col("x") * col("x")).as("sxx"),
        sum(col("w") * col("y") * col("y")).as("syy"))
      .select(col("src_role"), col("n_edges"),
        expr("CAST(n_edges AS DECIMAL(38,0)) * sxy " +
          "- CAST(sx AS DECIMAL(38,0)) * sy").as("cov_n"),
        expr("CAST(n_edges AS DECIMAL(38,0)) * sxx " +
          "- CAST(sx AS DECIMAL(38,0)) * sx").as("vx_n"),
        expr("CAST(n_edges AS DECIMAL(38,0)) * syy " +
          "- CAST(sy AS DECIMAL(38,0)) * sy").as("vy_n"))
      .select(col("src_role"), col("n_edges"),
        expr("""CAST(CASE WHEN vx_n = 0 THEN NULL
                WHEN cov_n < 0 THEN -((-cov_n) * 1000000 div vx_n)
                ELSE cov_n * 1000000 div vx_n END AS BIGINT)""")
          .as("slope_ppm"),
        expr("""CAST(CASE WHEN vx_n = 0 OR vy_n = 0 THEN NULL
                WHEN cov_n < 0 THEN
                  -((((-cov_n) * 1000000 div vx_n) * (-cov_n)) div vy_n)
                ELSE ((cov_n * 1000000 div vx_n) * cov_n) div vy_n
                END AS BIGINT)""").as("assort_ppm"))
      .orderBy("src_role")
  }

  /** Twin of [[assortativityDf]] — the g12 grid CTE re-aggregated with
    * the q65 HUGEINT moment algebra and q72 sign-split divides. */
  private val assortativitySql =
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey AS src, o_custkey + $custOffset AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |und AS MATERIALIZED (SELECT src, dst FROM pairs
       |      UNION ALL SELECT dst, src FROM pairs),
       |b AS MATERIALIZED (
       |  SELECT src AS node,
       |    CAST(len(bin(CAST(COUNT(*) AS BIGINT))) - 1 AS BIGINT) AS bucket
       |  FROM und GROUP BY src),
       |grid AS (
       |  SELECT CASE WHEN u.src >= $custOffset THEN 'customer'
       |      ELSE 'supplier' END AS src_role,
       |    x.bucket AS x, y.bucket AS y, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM und u JOIN b x ON u.src = x.node JOIN b y ON u.dst = y.node
       |  GROUP BY 1, 2, 3),
       |m AS (
       |  SELECT src_role, CAST(SUM(w) AS BIGINT) AS n_edges,
       |    CAST(SUM(w * x) AS BIGINT) AS sx,
       |    CAST(SUM(w * y) AS BIGINT) AS sy,
       |    CAST(SUM(w * x * y) AS BIGINT) AS sxy,
       |    CAST(SUM(w * x * x) AS BIGINT) AS sxx,
       |    CAST(SUM(w * y * y) AS BIGINT) AS syy
       |  FROM grid GROUP BY src_role),
       |c AS (
       |  SELECT src_role, n_edges,
       |    CAST(n_edges AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cov_n,
       |    CAST(n_edges AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS vx_n,
       |    CAST(n_edges AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vy_n
       |  FROM m)
       |SELECT src_role, n_edges,
       |  CAST(CASE WHEN vx_n = 0 THEN NULL
       |    WHEN cov_n < 0 THEN -((-cov_n) * 1000000 // vx_n)
       |    ELSE cov_n * 1000000 // vx_n END AS BIGINT) AS slope_ppm,
       |  CAST(CASE WHEN vx_n = 0 OR vy_n = 0 THEN NULL
       |    WHEN cov_n < 0 THEN
       |      -((((-cov_n) * 1000000 // vx_n) * (-cov_n)) // vy_n)
       |    ELSE ((cov_n * 1000000 // vx_n) * cov_n) // vy_n
       |    END AS BIGINT) AS assort_ppm
       |FROM c ORDER BY src_role""".stripMargin

  // ------------------------------------------------------------- g14
  /** g14: landmark distance profile — per-landmark BFS hop histogram
    * with an exact P90 effective-radius cut, over the g01
    * supplier↔customer graph from the [[bfsSeeds]] highest-degree
    * hubs. Where g05 answers "how far is every node from its NEAREST
    * hub" (one min-combined relation), g14 keeps LANDMARK IDENTITY:
    * each hub's own reach curve — the landmark distance sketch that
    * underlies landmark-based shortest-path estimation and tells a
    * crawl/cache planner how much of the graph each hub covers per
    * hop tier. The effective radius (smallest hop whose cumulative
    * reached mass is ≥ 90 % of that landmark's total) is the standard
    * noise-robust diameter surrogate (ANF/HyperANF's P90 convention),
    * here exact because the per-landmark reach is exact.
    *
    * Determinism: seeds are g05's exact integer order statistic
    * (degree DESC, id ASC TakeOrdered); hops are small integers under
    * an order-invariant min; the P90 cut is the all-integer
    * `cum·10 ≥ 9·total` boundary test — first-hop membership falls
    * out of `(cum − n)·10 < 9·total`, no window beyond the prefix
    * sum, no float anywhere (the q71/g04 exact-rank discipline).
    *
    * Scale shape: the frontier relation is (landmark, node, hop) —
    * [[bfsSeeds]]× g05's state, still ids-only and NEVER edge-sized;
    * each round is one hash join + one partial-agged min. The
    * histogram collapses that relation to landmarks × (rounds+1)
    * rows BEFORE the prefix-sum window, so the window input is
    * ~20 rows at any corpus size. Rounds are FIXED ([[bfsRounds]],
    * the g01/g03/g04 discipline); per-round persist truncates
    * lineage. */
  def landmarkRadius(s: SparkSession, dir: String): DataFrame =
    landmarkRadiusDf(t(s, dir, "lineitem"), t(s, dir, "orders"))

  def landmarkRadiusDf(lineitem: DataFrame, orders: DataFrame)
      : DataFrame = {
    val und = truncate(undirectedEdges(lineitem, orders))
    val seeds = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("node"))
      .limit(bfsSeeds)
      .select(col("node").as("landmark"))
    var dist = truncate(seeds
      .select(col("landmark"), col("landmark").as("node"),
        lit(0L).as("hop")))
    for (r <- 1 to bfsRounds) {
      // frontier-only expansion, per landmark (the g05 rule: settled
      // nodes already contributed their neighbors in earlier rounds)
      val next = dist.filter(col("hop") === (r - 1)).as("f")
        .join(und.as("u"), col("f.node") === col("u.src"))
        .select(col("f.landmark"), col("u.dst").as("node"),
          lit(r.toLong).as("hop"))
      dist = truncate(dist.union(next)
        .groupBy(col("landmark"), col("node"))
        .agg(min(col("hop")).as("hop")))
    }
    val hist = dist.groupBy(col("landmark"), col("hop"))
      .agg(count(lit(1)).as("n_nodes"))
    val tot = hist.groupBy(col("landmark"))
      .agg(sum(col("n_nodes")).as("n_reached"))
    hist
      .withColumn("cum_nodes", sum(col("n_nodes")).over(
        Window.partitionBy(col("landmark")).orderBy(col("hop"))))
      .join(broadcast(tot), "landmark")
      .select(col("landmark"), col("hop"), col("n_nodes"),
        col("cum_nodes"), col("n_reached"),
        expr("""CAST(CASE WHEN cum_nodes * 10 >= 9 * n_reached
                AND (cum_nodes - n_nodes) * 10 < 9 * n_reached
                THEN 1 ELSE 0 END AS BIGINT)""").as("is_radius"))
      .orderBy("landmark", "hop")
  }

  /** DuckDB twin: g05's unrolled rounds keyed (landmark, node), then
    * the identical histogram → prefix sum → integer P90 boundary. */
  private val landmarkRadiusSql = {
    val rounds = (1 to bfsRounds).map { r =>
      s"""h$r AS MATERIALIZED (
         |  SELECT landmark, node, MIN(hop) AS hop FROM (
         |    SELECT landmark, node, hop FROM h${r - 1}
         |    UNION ALL
         |    SELECT f.landmark, u.dst AS node, CAST($r AS BIGINT) AS hop
         |    FROM (SELECT landmark, node FROM h${r - 1}
         |          WHERE hop = ${r - 1}) f
         |    JOIN und u ON u.src = f.node) GROUP BY 1, 2)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $undirectedEdgesSql,
       |seeds AS MATERIALIZED (
       |  SELECT src AS landmark FROM und GROUP BY src
       |  ORDER BY COUNT(*) DESC, src LIMIT $bfsSeeds),
       |h0 AS MATERIALIZED (
       |  SELECT landmark, landmark AS node, CAST(0 AS BIGINT) AS hop
       |  FROM seeds),
       |$rounds,
       |hist AS (
       |  SELECT landmark, hop, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |  FROM h$bfsRounds GROUP BY 1, 2),
       |c AS (
       |  SELECT landmark, hop, n_nodes,
       |    SUM(n_nodes) OVER (PARTITION BY landmark ORDER BY hop)
       |      AS cum_nodes,
       |    SUM(n_nodes) OVER (PARTITION BY landmark) AS n_reached
       |  FROM hist)
       |SELECT landmark, hop, n_nodes,
       |  CAST(cum_nodes AS BIGINT) AS cum_nodes,
       |  CAST(n_reached AS BIGINT) AS n_reached,
       |  CAST(CASE WHEN cum_nodes * 10 >= 9 * n_reached
       |    AND (cum_nodes - n_nodes) * 10 < 9 * n_reached
       |    THEN 1 ELSE 0 END AS BIGINT) AS is_radius
       |FROM c ORDER BY landmark, hop""".stripMargin
  }

  // ------------------------------------------------------------- g15
  /** g15: landmark-approximated harmonic centrality — per NODE, the
    * sum of inverse hop distances to the [[bfsSeeds]] highest-degree
    * landmarks, in exact integer ppm (`Σ 10⁶ div hop`). Harmonic
    * centrality is the closeness variant that stays well-defined on
    * disconnected graphs (unreached landmarks contribute 0, not ∞);
    * the landmark restriction is the standard scale approximation
    * (Eppstein–Wang): exact centrality needs all-pairs BFS — O(n·m),
    * unshippable — while k landmarks give an unbiased k-sample of the
    * same sum. g14 reads the SAME per-landmark BFS by landmark
    * (each hub's reach curve); g15 reads it by node (each node's
    * position in the graph) — together they are the two marginals of
    * one (landmark, node, hop) relation.
    *
    * Determinism: hops are exact min-combined integers; 10⁶ div hop
    * is integer floor division; the sum of ≤ [[bfsSeeds]] bounded
    * terms cannot overflow. The landmarks themselves (hop 0) are
    * excluded from their own sums — 1/0 is not a term.
    *
    * Scale shape: identical to g14 (frontier-only per-landmark BFS,
    * ids-only state, fixed [[bfsRounds]], per-round persist); the
    * final grouping is one hash agg from (landmark, node, hop) down
    * to |nodes| rows. */
  def harmonicCentrality(s: SparkSession, dir: String): DataFrame =
    harmonicCentralityDf(t(s, dir, "lineitem"), t(s, dir, "orders"))

  def harmonicCentralityDf(lineitem: DataFrame, orders: DataFrame)
      : DataFrame = {
    val und = truncate(undirectedEdges(lineitem, orders))
    val seeds = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("node"))
      .limit(bfsSeeds)
      .select(col("node").as("landmark"))
    var dist = truncate(seeds
      .select(col("landmark"), col("landmark").as("node"),
        lit(0L).as("hop")))
    for (r <- 1 to bfsRounds) {
      val next = dist.filter(col("hop") === (r - 1)).as("f")
        .join(und.as("u"), col("f.node") === col("u.src"))
        .select(col("f.landmark"), col("u.dst").as("node"),
          lit(r.toLong).as("hop"))
      dist = truncate(dist.union(next)
        .groupBy(col("landmark"), col("node"))
        .agg(min(col("hop")).as("hop")))
    }
    dist.filter(col("hop") >= 1)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_landmarks"),
        min(col("hop")).as("nearest_hop"),
        sum(expr("1000000 div hop")).as("harmonic_ppm"))
      .orderBy("node")
  }

  /** DuckDB twin: g14's unrolled (landmark, node, hop) chain, read by
    * node with the identical integer inverse-hop sum. */
  private val harmonicCentralitySql = {
    val rounds = (1 to bfsRounds).map { r =>
      s"""h$r AS MATERIALIZED (
         |  SELECT landmark, node, MIN(hop) AS hop FROM (
         |    SELECT landmark, node, hop FROM h${r - 1}
         |    UNION ALL
         |    SELECT f.landmark, u.dst AS node, CAST($r AS BIGINT) AS hop
         |    FROM (SELECT landmark, node FROM h${r - 1}
         |          WHERE hop = ${r - 1}) f
         |    JOIN und u ON u.src = f.node) GROUP BY 1, 2)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $undirectedEdgesSql,
       |seeds AS MATERIALIZED (
       |  SELECT src AS landmark FROM und GROUP BY src
       |  ORDER BY COUNT(*) DESC, src LIMIT $bfsSeeds),
       |h0 AS MATERIALIZED (
       |  SELECT landmark, landmark AS node, CAST(0 AS BIGINT) AS hop
       |  FROM seeds),
       |$rounds
       |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_landmarks,
       |  CAST(MIN(hop) AS BIGINT) AS nearest_hop,
       |  CAST(SUM(1000000 // hop) AS BIGINT) AS harmonic_ppm
       |FROM h$bfsRounds WHERE hop >= 1
       |GROUP BY node ORDER BY node""".stripMargin
  }

  // ------------------------------------------------ g16 personalized PR
  /** g16: personalized PageRank from the top-degree landmark — the
    * similarity/recommendation primitive ("how close is every node to
    * THIS node") that global PageRank (g01) cannot answer: the restart
    * mass teleports to the landmark, not uniformly, so scores decay
    * with random-walk distance from it.
    *
    * Same integer discipline as g01: seed mass [[initRank]] pico-units
    * at the landmark, per-edge message `ppr DIV out_deg`, damping
    * `restart(node) + (85·Σ) DIV 100` with the restart term
    * [[baseRank]] AT THE LANDMARK ONLY — every operation is integer,
    * so the result is bit-identical across engines and partitionings.
    * Landmark = highest degree, ties to the smallest id (the g14 seed
    * rule) — a 1-row relation cross-joined in, never a collect.
    *
    * Rounds are FIXED ([[pprRounds]]): bounded DAG, oracle unrolls the
    * same rounds. Scale shape = g01's: ids-only edges partitioned once
    * on the join key and persisted; each round one hash join + one
    * partial-agged sum; the landmark relation broadcasts. */
  val pprRounds = 4

  def pprLandmark(s: SparkSession, dir: String): DataFrame =
    pprLandmarkDf(t(s, dir, "lineitem"), t(s, dir, "orders"))

  def pprLandmarkDf(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val und = undirectedEdges(lineitem, orders)
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val edges = truncate(und.join(deg, "src").repartition(col("src")))
    // 1-row landmark relation — persisted so the per-round cross join
    // does not re-derive it from the edge scan each round; derived
    // from the checkpointed edges ((src, out_deg) distinct over edges
    // IS deg — edges = und ⋈ deg on src), so neither the landmark nor
    // the seed re-reads the corpus (r12)
    val lm = edges.select(col("src"), col("out_deg")).distinct()
      .orderBy(col("out_deg").desc, col("src")).limit(1)
      .select(col("src").as("lm")).persist()
    var ppr = edges.select(col("src").as("node")).distinct()
      .crossJoin(broadcast(lm))
      .select(col("node"),
        when(col("node") === col("lm"), lit(initRank)).otherwise(lit(0L))
          .as("ppr"))
    for (_ <- 1 to pprRounds) {
      ppr = edges.join(ppr, edges("src") === ppr("node"))
        .select(col("dst"), expr("ppr DIV out_deg").as("m"))
        .groupBy(col("dst"))
        .agg(sum(col("m")).as("im"))
        .crossJoin(broadcast(lm))
        .select(col("dst").as("node"),
          (when(col("dst") === col("lm"), lit(baseRank)).otherwise(lit(0L))
            + expr("(85L * im) DIV 100L")).as("ppr"))
    }
    ppr.orderBy(col("ppr").desc, col("node")).limit(topN)
  }

  /** DuckDB twin: identical integer recurrence, rounds unrolled
    * (non-negative operands, so `//` floors exactly like DIV). */
  private val pprLandmarkSql = {
    val rounds = (1 to pprRounds).map { r =>
      s"""r$r AS (
         |  SELECT dst AS node,
         |    CASE WHEN dst = lm.lm THEN $baseRank ELSE 0 END
         |      + (85 * SUM(pr // out_deg)) // 100 AS pr
         |  FROM e JOIN r${r - 1} ON e.src = r${r - 1}.node, lm
         |  GROUP BY dst, lm.lm)"""
    }.mkString(",\n")
    s"""WITH $undirectedEdgesSql,
       |deg AS (SELECT src, COUNT(*) AS out_deg FROM und GROUP BY src),
       |e AS MATERIALIZED (SELECT und.src, und.dst, deg.out_deg
       |      FROM und JOIN deg ON und.src = deg.src),
       |lm AS MATERIALIZED (SELECT src AS lm FROM deg
       |      ORDER BY out_deg DESC, src LIMIT 1),
       |r0 AS (SELECT DISTINCT src AS node,
       |         CAST(CASE WHEN src = lm.lm THEN $initRank ELSE 0 END
       |           AS BIGINT) AS pr
       |       FROM und, lm),
       |$rounds
       |SELECT node, CAST(pr AS BIGINT) AS ppr FROM r$pprRounds
       |ORDER BY ppr DESC, node LIMIT $topN""".stripMargin
  }

  // --------------------------------------------------- g17 edge support
  /** g17: per-edge triangle support — the k-truss ingredient (an edge
    * is in the k-truss iff its support ≥ k−2) and the standard "is this
    * relationship embedded in a community or a bridge?" signal tie
    * strength alone cannot give. Reports the [[triTopN]] most-supported
    * co-purchase edges in canonical (a < b) form.
    *
    * Reuses g02's degree-oriented triangle core verbatim
    * ([[triangleTriplesDf]] — wedge join bounded by the O(√m)
    * orientation, Bloom-pruned before the closing exchange): each
    * triangle contributes its three edges via one map-side explode, so
    * the only work beyond g02 is a (edge → count) partial-agged
    * groupBy. Ranking is (support DESC, a, b) — a total order, so the
    * top-N is deterministic under ties. */
  def edgeSupport(s: SparkSession, dir: String): DataFrame =
    edgeSupportDf(t(s, dir, "lineitem"))

  def edgeSupportDf(lineitem: DataFrame): DataFrame = {
    // persist, NOT checkpoint, for the single-action wedge pipeline:
    // the r12 paired A/B read the eager checkpoint at 1.5x the wall
    // (lost stage overlap) despite halved CPU — the wedge join overlaps
    // the columnar cache build inside one job here, unlike the
    // round-based operators where the checkpoint wins both metrics
    val oriented = orientedEdgesDf(lineitem).persist()
    edgeSupportsOf(oriented)
      .orderBy(col("support").desc, col("a"), col("b"))
      .limit(triTopN)
  }

  /** (a, b, support) per-edge triangle support from a PERSISTED
    * oriented edge list — each triangle contributes its three edges in
    * canonical (a < b) form via one map-side explode, then one
    * partial-agged groupBy. Shared by g17 (top-N report) and g18's
    * per-round truss peel. */
  private[graft] def edgeSupportsOf(oriented: DataFrame): DataFrame =
    edgeSupportsOf(oriented, buildEdgeSketch(oriented))

  /** Sketch-passing overload: a sketch built over any SUPERSET of
    * `oriented` keeps the result exact (false positives only weaken
    * the prune) — but see the [[triangleTriplesDf]] reuse warning:
    * reusing a pre-peel sketch across peel rounds measured as a wash
    * (the weaker prune eats the saved build), so only pass one when
    * the edge set is unchanged between calls. */
  private[graft] def edgeSupportsOf(oriented: DataFrame,
      sketch: Option[org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]]): DataFrame =
    supportsOfTriples(triangleTriplesDf(oriented, sketch))

  /** (a, b, support) from an already-enumerated (u, v, w) triangle
    * relation — each triangle contributes its three edges in canonical
    * (a < b) form via one map-side explode, then one partial-agged
    * groupBy. Split out of [[edgeSupportsOf]] so g18's peel can recount
    * support over a FILTERED triple relation without re-running the
    * wedge enumeration (r13). */
  private[graft] def supportsOfTriples(triples: DataFrame): DataFrame =
    triples
      .select(explode(array(
        struct(least(col("u"), col("v")).as("ea"),
          greatest(col("u"), col("v")).as("eb")),
        struct(least(col("u"), col("w")).as("ea"),
          greatest(col("u"), col("w")).as("eb")),
        struct(least(col("v"), col("w")).as("ea"),
          greatest(col("v"), col("w")).as("eb")))).as("e"))
      .select(col("e.ea").as("a"), col("e.eb").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))

  /** DuckDB twin: the g02 triangle core + the 3-edge expansion. */
  private val edgeSupportSql =
    s"""WITH $triCoreCtes,
       |ee AS (
       |  SELECT LEAST(u, v) AS a, GREATEST(u, v) AS b FROM tri
       |  UNION ALL SELECT LEAST(u, w), GREATEST(u, w) FROM tri
       |  UNION ALL SELECT LEAST(v, w), GREATEST(v, w) FROM tri)
       |SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support
       |FROM ee GROUP BY a, b
       |ORDER BY support DESC, a, b LIMIT $triTopN""".stripMargin

  // ------------------------------------------------------- g18 k-truss
  /** g18: bounded-round k-truss peel — the decomposition g17's edge
    * support is the ingredient FOR. An edge is in the k-truss iff its
    * triangle support on the SURVIVING subgraph is ≥ k−2: each round
    * drops under-supported edges and recomputes support on the
    * survivors, so bridges and weakly-embedded edges peel away and the
    * triangle-dense community cores remain (Cohen 2008; the
    * reference's graph-workload lineage — `LinkedGraph.java:82-105`
    * adjacency semantics — taken to its community-core step).
    *
    * k is NOT a constant (g04's adaptive discipline): k−2 = the
    * 25th-percentile support among triangle edges — the exact order
    * statistic at ascending rank ⌈n/4⌉ (peel the weakly-supported
    * quartile, keep the core: a higher quantile cascades to an empty
    * truss on sparse graphs because peeling destroys triangles and
    * recomputed supports only fall), computed over the SUPPORT
    * HISTOGRAM (distinct-support-sized window, never row-sized), so
    * the peel stays meaningful at every corpus scale. Rounds are FIXED
    * ([[trussRounds]]) so the DAG is static and the oracle unrolls the
    * identical rounds as MATERIALIZED CTEs.
    *
    * Scale shape: each round is one ids-only semi-join (survivor
    * filter) + the g02/g17 triangle core (degree-oriented wedge join,
    * Bloom-pruned closing probe) + one partial-agged groupBy — and the
    * edge set SHRINKS monotonically, so rounds get cheaper. Hygiene is
    * g03's `truncateTracked` discipline: each round's support snapshot
    * is eagerly checkpointed (static plan depth), the previous round's
    * snapshot and edge cache are freed as soon as the next
    * materializes, and every persist is force-materialized BEFORE its
    * tracked window (the ADVICE-r7 attribution rule). */
  val trussRounds = 3

  def ktruss(s: SparkSession, dir: String): DataFrame =
    ktrussDf(t(s, dir, "lineitem"))

  /** Survivor sets below this row count attach to the peel's triple
    * filter as a BROADCAST (3 stacked map-side semi-joins, one codegen
    * pass over the triples); above it the filter falls back to
    * shuffled-hash semi-joins (the survivor set is ids-only, so the
    * per-partition build stays small). 8 M (a, b) long pairs ≈ 128 MB
    * raw — the same executor-memory class as the edge Bloom sketch;
    * overridable for clusters via the conf key. */
  val trussBroadcastRowsKey = "graft.truss.broadcast.maxrows"
  val trussBroadcastRowsDefault = 8000000L

  def ktrussDf(lineitem: DataFrame): DataFrame = {
    import graft.operators.ConnectedComponents.{free, truncateTracked}
    val spark = lineitem.sparkSession
    val sc = spark.sparkContext
    // eager tracked checkpoint instead of a columnar persist (r12):
    // round 1 scans o ~5x (both wedge sides, the closing probe, the
    // sketch build, the count) and GraphRoundProbe measured the
    // columnar cache at ~4-6 s CPU per 1 M-row scan vs ~1 s for
    // checkpointed UnsafeRows
    val (o, oBlocks) = truncateTracked(orientedEdgesDf(lineitem))
    var nEdges = o.count()
    // INCREMENTAL PEEL (r13, guide §2.4 "remove shuffles outright"):
    // a subgraph's triangles are exactly the triangles of the parent
    // graph whose three edges all survive (peeling only REMOVES edges),
    // so the wedge enumeration + Bloom build need to run ONCE — the
    // (u, v, w) triple relation is checkpointed and every later round
    // recounts support by FILTERING it against the survivor edge set
    // (3 stacked semi-joins + the same explode/groupBy recount),
    // instead of re-running the full wedge join + fresh sketch over
    // the shrunken edge list (the r9 "fresh sketch per round" A/B is
    // moot in this shape: no per-round sketch exists at all). Same
    // survivor sets, same recounted supports, bit-identical output —
    // GraphSpec's in-memory reference peel and the oracle twin pin it.
    val (tri, triBlocks) = truncateTracked(triangleTriplesDf(o))
    free(sc, oBlocks) // triples materialized; o is never scanned again
    var (supp, blocks) = truncateTracked(supportsOfTriples(tri))
    // threshold relation (one row, persisted): 25th-percentile support
    // among round-1 triangle edges, k = t + 2
    val tVal = supp.groupBy(col("support")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("support"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(lit(1))))
      .filter(expr("cum - cnt < (n + 3) div 4 AND (n + 3) div 4 <= cum"))
      .select(col("support").as("t"))
      .persist()
    tVal.count() // materialize before the next tracked window
    val bcastMax = spark.conf.get(trussBroadcastRowsKey,
      trussBroadcastRowsDefault.toString).toLong
    var fixed = false
    for (_ <- 2 to trussRounds) if (!fixed) {
      val surv = supp.crossJoin(broadcast(tVal))
        .filter(col("support") >= col("t"))
        .select(col("a"), col("b"))
      // The survivor count doubles as (a) the EXACT fixed-point
      // detector — the old semi-joined edge list was in bijection with
      // surv (every supp key is a canonical o edge), so comparing
      // |surv| round-over-round is the identical test: an unchanged
      // count means an unchanged edge set, an identical recount, and
      // every remaining round a provable no-op (threshold-based early
      // stops were measured and REJECTED — SCALING.md round-10) — and
      // (b) the broadcast-vs-shuffle decision for the triple filter.
      val nNext = surv.count()
      if (nNext == nEdges) {
        fixed = true
      } else {
        val s = if (nNext <= bcastMax) broadcast(surv)
                else surv.hint("SHUFFLE_HASH")
        val kept = tri
          .join(s, least(col("u"), col("v")) === col("a") &&
            greatest(col("u"), col("v")) === col("b"), "left_semi")
          .join(s, least(col("u"), col("w")) === col("a") &&
            greatest(col("u"), col("w")) === col("b"), "left_semi")
          .join(s, least(col("v"), col("w")) === col("a") &&
            greatest(col("v"), col("w")) === col("b"), "left_semi")
        val (suppNext, nb) = truncateTracked(supportsOfTriples(kept))
        free(sc, blocks) // previous round's snapshot, fully consumed
        supp = suppNext; blocks = nb; nEdges = nNext
      }
    }
    val out = supp.crossJoin(broadcast(tVal))
      .filter(col("support") >= col("t"))
      .select(col("a"), col("b"), col("support"))
      .orderBy(col("support").desc, col("a"), col("b"))
      .limit(triTopN)
    // the final support snapshot IS checkpointed — nothing downstream
    // re-reads the triple relation
    free(sc, triBlocks)
    // tVal and the final round's checkpoint `blocks` MUST outlive this
    // call (out reads both lazily), so they cannot be freed here —
    // callers that loop queries must sweep sc.getPersistentRDDs after
    // materializing, which Bench and Verify both do (ADVICE r8).
    out
  }

  /** DuckDB twin: the g02 triangle core, then per round a survivor
    * filter + re-derived triangles + 3-edge support recount — every
    * round CTE MATERIALIZED (each is referenced 3× by the next wedge
    * join; the g03 2^rounds re-expansion lesson). */
  private val ktrussSql = {
    def suppOf(tri: String, s: String) =
      s"""$s AS MATERIALIZED (
         |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support FROM (
         |    SELECT LEAST(u, v) AS a, GREATEST(u, v) AS b FROM $tri
         |    UNION ALL SELECT LEAST(u, w), GREATEST(u, w) FROM $tri
         |    UNION ALL SELECT LEAST(v, w), GREATEST(v, w) FROM $tri)
         |  GROUP BY a, b)""".stripMargin
    val rounds = (2 to trussRounds).map { r =>
      s"""o$r AS MATERIALIZED (
         |  SELECT o.u, o.v FROM o${if (r == 2) "" else r - 1} o
         |  JOIN s${r - 1} s ON LEAST(o.u, o.v) = s.a AND GREATEST(o.u, o.v) = s.b
         |  WHERE s.support >= (SELECT t FROM tv)),
         |tri$r AS (
         |  SELECT x.u, x.v, y.v AS w
         |  FROM o$r x JOIN o$r y ON x.u = y.u AND x.v <> y.v
         |  JOIN o$r c ON c.u = x.v AND c.v = y.v),
         |${suppOf(s"tri$r", s"s$r")}""".stripMargin
    }.mkString(",\n")
    s"""WITH $triCoreCtes,
       |${suppOf("tri", "s1")},
       |tv AS MATERIALIZED (
       |  SELECT support AS t FROM (
       |    SELECT support, cnt,
       |      SUM(cnt) OVER (ORDER BY support) AS cum,
       |      SUM(cnt) OVER () AS n
       |    FROM (SELECT support, COUNT(*) AS cnt FROM s1 GROUP BY support))
       |  WHERE cum - cnt < (n + 3) // 4 AND (n + 3) // 4 <= cum),
       |$rounds
       |SELECT a, b, support FROM s$trussRounds
       |WHERE support >= (SELECT t FROM tv)
       |ORDER BY support DESC, a, b LIMIT $triTopN""".stripMargin
  }

  // ---------------------------------------------------- g19 modularity
  /** g19: Newman modularity of the co-purchase graph's two partitions —
    * the quality metric OVER the partition operators: does g03's
    * connectivity partition or g07's LPA density partition explain the
    * edge mass better? Q = Σ_c [ e_c/m − (d_c/2m)² ] per community c
    * (e_c intra-community edges, d_c degree mass, m total edges) —
    * the objective Louvain climbs, here computed exactly for the two
    * partitions the surface already ships, so "did the community pass
    * produce structure" is a measured relation, not a visual judgment.
    *
    * Determinism (the g01 fixed-point discipline): every term is an
    * exact integer in ppm — intra_ppm = e_c·10⁶ div m, the expected
    * share (d_c·10⁶ div 2m)² div 10⁶ — summed over communities; both
    * engines floor identically, no float anywhere. Overflow audit
    * (the q59 widen rule): d_c·10⁶ ≤ 2m·10⁶ (< 2⁶³ through sf10⁴);
    * the share is ≤ 10⁶ so its square is ≤ 10¹².
    *
    * Scale shape: reuses [[supportPairsDf]] (persisted once, feeds
    * both label recurrences and the scorer), g03's pointer-jumping CC
    * labels and g07's LPA recurrence verbatim; scoring is two
    * node-sized hash joins (labels ⋈ degrees, pairs ⋈ labels×2) +
    * community-sized aggs; output is 2 rows. Nothing beyond the label
    * rounds themselves moves more than |E| integers. */
  def modularity(s: SparkSession, dir: String): DataFrame =
    modularityDf(t(s, dir, "lineitem"))

  def modularityDf(lineitem: DataFrame): DataFrame = {
    import graft.operators.ConnectedComponents.truncate
    // one-direction unique pairs (a<b): m = |pairs|; persisted — feeds
    // the CC seed, the LPA seed, the degree agg and the intra scorer
    val pairs = truncate(supportPairsDf(lineitem)
      .select(col("a"), col("b")))
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val cc = graft.operators.ConnectedComponents
      .minLabelJumping(nodes, edges, compRounds)
      .select(col("id").as("node"), col("label").as("lbl"))
    // g07's LPA recurrence verbatim (self-vote, struct-max argmax)
    val und = truncate(edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src")))
    var lpa = truncate(und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")))
    for (_ <- 1 to lpRounds) {
      lpa = truncate(und.join(lpa, und("src") === lpa("node"))
        .select(col("dst").as("node"), col("lbl"))
        .unionByName(lpa.select(col("node"), col("lbl")))
        .groupBy(col("node"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("top"))
        .select(col("node"), (-col("top.nl")).as("lbl")))
    }
    val m = pairs.agg(count(lit(1)).as("m")) // one-row, broadcast below
    val deg = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
    def score(lbls: DataFrame, method: String): DataFrame = {
      val dsum = deg.join(lbls, "node")
        .groupBy(col("lbl")).agg(sum(col("d")).as("dc"))
      val intra = pairs
        .join(lbls.select(col("node").as("a"), col("lbl").as("la")), "a")
        .join(lbls.select(col("node").as("b"), col("lbl").as("lb")), "b")
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("ec"))
      dsum.join(intra, Seq("lbl"), "left")
        .na.fill(0L, Seq("ec")) // communities with no internal edge
        .crossJoin(broadcast(m)) // broadcast-scalar idiom: one-row agg
        .withColumn("q_c", expr(
          """ec * 1000000 div m
             - ((dc * 1000000 div (2 * m)) * (dc * 1000000 div (2 * m)))
               div 1000000"""))
        .agg(count(lit(1)).as("n_communities"),
          coalesce(sum(col("ec")), lit(0L)).as("intra_edges"),
          coalesce(sum(col("q_c")), lit(0L)).as("q_ppm"))
        .select(lit(method).as("method"),
          col("n_communities"), col("intra_edges"), col("q_ppm"))
    }
    score(cc, "components").unionByName(score(lpa, "lpa"))
      .orderBy("method")
  }

  /** DuckDB twin: the shared pc CTE, BOTH recurrences unrolled under
    * disjoint CTE names (cp/cl = g03's propagate/jump, lc/ll = g07's
    * count/argmax — every round CTE MATERIALIZED, the g03 2^rounds
    * lesson), then the identical integer-ppm scorer per partition.
    * The LPA argmax keeps g07's deliberately-different ROW_NUMBER
    * spelling so a tie-break bug in either engine breaks the
    * differential here too. */
  private val modularitySql = {
    val ccRounds = (1 to compRounds).map { r =>
      s"""cp$r AS MATERIALIZED (
         |  SELECT l.id, LEAST(l.label, COALESCE(m.nbr, l.label)) AS label
         |  FROM cl${r - 1} l LEFT JOIN (
         |    SELECT u.src AS id, MIN(n.label) AS nbr
         |    FROM u JOIN cl${r - 1} n ON n.id = u.dst GROUP BY u.src) m
         |  USING (id)),
         |cl$r AS MATERIALIZED (
         |  SELECT p.id, q.label
         |  FROM cp$r p JOIN cp$r q ON p.label = q.id)""".stripMargin
    }.mkString(",\n")
    val lpaRounds = (1 to lpRounds).map { r =>
      s"""lc$r AS MATERIALIZED (
         |  SELECT node, lbl, COUNT(*) AS c FROM (
         |    SELECT e.dst AS node, l.lbl
         |    FROM u e JOIN ll${r - 1} l ON e.src = l.node
         |    UNION ALL SELECT node, lbl FROM ll${r - 1})
         |  GROUP BY 1, 2),
         |ll$r AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
         |      ORDER BY c DESC, lbl) AS rk FROM lc$r)
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    def scoreCtes(tag: String, lblCte: String, nodeCol: String,
                  lblCol: String, method: String): String =
      s"""ds_$tag AS (
         |  SELECT l.$lblCol AS lbl, SUM(g.d) AS dc
         |  FROM deg g JOIN $lblCte l ON g.node = l.$nodeCol
         |  GROUP BY 1),
         |in_$tag AS (
         |  SELECT la.$lblCol AS lbl, CAST(COUNT(*) AS BIGINT) AS ec
         |  FROM p JOIN $lblCte la ON p.a = la.$nodeCol
         |         JOIN $lblCte lb ON p.b = lb.$nodeCol
         |           AND la.$lblCol = lb.$lblCol
         |  GROUP BY 1),
         |q_$tag AS (
         |  SELECT '$method' AS method,
         |    CAST(COUNT(*) AS BIGINT) AS n_communities,
         |    CAST(COALESCE(SUM(COALESCE(ec, 0)), 0) AS BIGINT) AS intra_edges,
         |    CAST(COALESCE(SUM(COALESCE(ec, 0) * 1000000 // m
         |      - ((dc * 1000000 // (2 * m)) * (dc * 1000000 // (2 * m)))
         |        // 1000000), 0) AS BIGINT) AS q_ppm
         |  FROM ds_$tag LEFT JOIN in_$tag USING (lbl) CROSS JOIN mm)""".stripMargin
    s"""WITH $coPairSupportCte,
       |p AS MATERIALIZED (SELECT a, b FROM pc),
       |u AS MATERIALIZED (SELECT a AS src, b AS dst FROM p
       |      UNION ALL SELECT b, a FROM p),
       |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM p),
       |deg AS MATERIALIZED (
       |  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
       |  FROM u GROUP BY src),
       |cl0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM u),
       |$ccRounds,
       |ll0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS node, src AS lbl FROM u),
       |$lpaRounds,
       |${scoreCtes("cc", s"cl$compRounds", "id", "label", "components")},
       |${scoreCtes("lpa", s"ll$lpRounds", "node", "lbl", "lpa")}
       |SELECT * FROM q_cc UNION ALL SELECT * FROM q_lpa
       |ORDER BY method""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g19_modularity" -> modularity _,
    "g18_ktruss" -> ktruss _,
    "g17_edge_support" -> edgeSupport _,
    "g16_ppr_landmark" -> pprLandmark _,
    "g15_harmonic" -> harmonicCentrality _,
    "g14_landmark_radius" -> landmarkRadius _,
    "g13_assortativity" -> assortativity _,
    "g12_joint_degree" -> jointDegree _,
    "g11_hits" -> hits _,
    "g10_clustering" -> clusteringCoeff _,
    "g09_sssp" -> sssp _,
    "g08_common_neighbors" -> commonNeighbors _,
    "g07_label_prop" -> labelProp _,
    "g06_degree_profile" -> degreeProfile _,
    "g01_pagerank"  -> pageRank _,
    "g02_triangles" -> triangles _,
    "g03_components" -> components _,
    "g04_kcore"     -> kcore _,
    "g05_bfs_hops"  -> bfsHops _)

  val oracle: Map[String, String] = Map(
    "g19_modularity" -> modularitySql,
    "g18_ktruss" -> ktrussSql,
    "g17_edge_support" -> edgeSupportSql,
    "g16_ppr_landmark" -> pprLandmarkSql,
    "g15_harmonic" -> harmonicCentralitySql,
    "g14_landmark_radius" -> landmarkRadiusSql,
    "g13_assortativity" -> assortativitySql,
    "g12_joint_degree" -> jointDegreeSql,
    "g11_hits" -> hitsSql,
    "g10_clustering" -> clusteringCoeffSql,
    "g09_sssp" -> ssspSql,
    "g08_common_neighbors" -> commonNeighborsSql,
    "g07_label_prop" -> labelPropSql,
    "g06_degree_profile" -> degreeProfileSql,
    "g01_pagerank"  -> pageRankSql,
    "g02_triangles" -> trianglesSql,
    "g03_components" -> componentsSql,
    "g04_kcore"     -> kcoreSql,
    "g05_bfs_hops"  -> bfsHopsSql)
}
