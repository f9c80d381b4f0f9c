package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val prRounds = 3
  val custOffset = 1000000L
  val initRank = 1000000000000L           // 1.0 in pico-rank units
  val baseRank = 150000000000L            // 0.15 · initRank (damping 0.85)
  val topN = 100

  def pageRank(s: SparkSession, dir: String): DataFrame =
    pageRankDf(t(s, dir, "lineitem"), t(s, dir, "orders"))

  def pageRankDf(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_suppkey"))
    val ord = orders.select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("src"),
        (col("o_custkey") + custOffset).as("dst"))
      .distinct()
    val und = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    // ids-only adjacency with degree attached, partitioned once on the
    // per-round join key and persisted (each round probes it against a
    // different ranks relation — ReusedExchange can't help across rounds)
    val edges = und.join(deg, "src").repartition(col("src")).persist()
    var ranks = und.select(col("src").as("node")).distinct()
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
    s"""WITH pairs AS (
       |  SELECT DISTINCT l_suppkey AS src, o_custkey + $custOffset AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |und AS (SELECT src, dst FROM pairs
       |        UNION ALL SELECT dst, src FROM pairs),
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
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_pagerank" -> pageRank _)

  val oracle: Map[String, String] = Map(
    "g01_pagerank" -> pageRankSql)
}
