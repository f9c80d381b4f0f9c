package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, MapType, StringType, StructField, StructType}
import graft.Tables.t

/** Relational operator surface (SURVEY.md §2.4): scans, filter/project,
  * every join flavor, aggregation (hash / distinct / rollup / cube /
  * grouping sets), windows, sort/limit/top-k, set ops, scalar functions,
  * theta and as-of joins.
  *
  * Every query here has a DuckDB oracle twin in [[oracle]]; output column
  * names and types match exactly (the driver sorts columns by name and
  * hashes values). Determinism rules used throughout:
  *
  *  - Money/ratio arithmetic goes through DECIMAL casts so both engines
  *    compute the exact same value (double sums are order-dependent,
  *    decimal sums are not), then the final value is cast to DOUBLE for
  *    a stable output schema.
  *  - Averages are computed as exact-decimal-sum / count in double: one
  *    correctly-rounded IEEE division of two exact values.
  *  - Integer-typed computed outputs are cast to BIGINT on both sides
  *    (DuckDB count/row_number/year return BIGINT).
  *  - Every output has a total ORDER BY (unique tie-break) on both sides.
  *
  * Scale posture (the 100 TB design intent, tested at sf0.1): joins to
  * dimension tables are broadcast; fact-fact joins shuffle on their keys;
  * aggregations rely on Spark partial aggregation (map-side combine);
  * windows partition by high-cardinality keys; nothing collects to the
  * driver.
  */
object Relational {

  private val D182 = "decimal(18,2)"
  private val D42  = "decimal(4,2)"

  private def price = col("l_extendedprice").cast(D182)
  private def disc  = col("l_discount").cast(D42)
  private def tax   = col("l_tax").cast(D42)
  private def one   = lit(1).cast(D42)
  private def ts(d: String): Column = lit(d).cast("timestamp")

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-style pricing summary: full-scan partial+final hash agg.
    * Reference analogue: wordcount's map-side combine + reduce sum
    * (word_count_map.cpp:13-38, word_count_reduce.cpp:19-27) generalized
    * to multi-measure aggregation. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      // Per-row values become exact BIGINT fixed-point FIRST (cents /
      // hundredths), every product stays integer (≤ ~1.2e11 per row),
      // sums widen to DECIMAL(38,0) (the e05 rule — a BIGINT sum
      // would wrap silently in non-ANSI mode at extreme scale), and
      // only the final per-group cast lands on BIGINT. This replaces
      // the r6 DOUBLE outputs: the scale-6 sum_charge unscaled value
      // crosses 2^53 already around sf0.1, where DuckDB's two-step
      // decimal→double conversion can differ from Spark's correctly
      // rounded one in the last ulp — integer outputs have no ulp.
      // BIGINT range: the largest group's charge micros is ~5.7e15 at
      // sf1 → safe through ~sf300; past that, emit the DECIMAL(38,0)
      // sums as strings instead.
      .select(col("l_returnflag"), col("l_linestatus"),
        expr(s"CAST(CAST(l_quantity AS $D182) * 100 AS BIGINT)").as("qx"),
        expr(s"CAST(CAST(l_extendedprice AS $D182) * 100 AS BIGINT)").as("pc"),
        expr(s"CAST(CAST(l_discount AS $D42) * 100 AS BIGINT)").as("dh"),
        expr(s"CAST(CAST(l_tax AS $D42) * 100 AS BIGINT)").as("th"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qx").cast("decimal(38,0)")).as("sq"),
        sum(col("pc").cast("decimal(38,0)")).as("sbp"),
        sum((col("pc") * (lit(100) - col("dh")))
          .cast("decimal(38,0)")).as("sdp"),
        sum((col("pc") * (lit(100) - col("dh")) * (lit(100) + col("th")))
          .cast("decimal(38,0)")).as("sch"),
        sum(col("dh").cast("decimal(38,0)")).as("sd"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sq").cast("bigint").as("sum_qty_x100"),
        col("sbp").cast("bigint").as("sum_base_price_cents"),
        col("sdp").cast("bigint").as("sum_disc_price_x10k"),
        col("sch").cast("bigint").as("sum_charge_x1m"),
        // avg operands (scale-2 integer sums < 2^53 through ~sf100,
        // counts) convert to double exactly; the two divisions are
        // IEEE correctly-rounded on identical operands in both
        // engines, spelled identically in the twin
        (col("sq").cast("double") / lit(100.0) / col("count_order"))
          .as("avg_qty"),
        (col("sbp").cast("double") / lit(100.0) / col("count_order"))
          .as("avg_price"),
        (col("sd").cast("double") / lit(100.0) / col("count_order"))
          .as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q01Sql =
    """WITH fx AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qx,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
      |    CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS dh,
      |    CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS th
      |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
      |SELECT l_returnflag, l_linestatus,
      |CAST(SUM(qx) AS BIGINT) AS sum_qty_x100,
      |CAST(SUM(pc) AS BIGINT) AS sum_base_price_cents,
      |CAST(SUM(pc * (100 - dh)) AS BIGINT) AS sum_disc_price_x10k,
      |CAST(SUM(pc * (100 - dh) * (100 + th)) AS BIGINT) AS sum_charge_x1m,
      |CAST(SUM(qx) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
      |CAST(SUM(pc) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
      |CAST(SUM(dh) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
      |COUNT(*) AS count_order
      |FROM fx
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** TPC-H Q6-style selective filter + scalar agg; filters must push to
    * the parquet scan (PushedFilters), scan prunes to 4 columns. */
  def q02FilterRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
              col("l_shipdate") <  ts("1997-01-01") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(sum(price * disc).cast("double").as("revenue"),
           count(lit(1)).as("n_rows"))

  private val q02Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q03
  /** TPC-H Q3-style: 3-way join (dim filter → fact ⋈ fact), agg, top-10.
    * customer is broadcast; orders⋈lineitem shuffles on orderkey. */
  def q03TopUnshipped(s: SparkSession, dir: String): DataFrame = {
    val cut = ts("1998-01-01")
    val c = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(price * (one - disc)).as("rev"))
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        col("rev").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q03Sql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Broadcast hash join fact → small dim (part), per-brand rollforward. */
  def q04BrandAgg(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_retailprice")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(col("l_quantity").cast(D182)).as("sq"),
        sum(price).as("sp"),
        sum(col("p_retailprice").cast(D182)).as("srp"),
        count(lit(1)).as("n_items"))
      .select(col("p_brand"),
        col("sq").cast("double").as("sum_qty"),
        col("sp").cast("double").as("sum_price"),
        (col("srp").cast("double") / col("n_items")).as("avg_retail"),
        col("n_items"))
      .orderBy("p_brand")
  }

  private val q04Sql =
    """SELECT p_brand,
      |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_retail,
      |COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q05
  /** TPC-H Q5-style 6-table join: region/nation/supplier broadcast,
    * orders⋈lineitem⋈customer shuffle; revenue per nation. */
  def q05NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
              col("o_orderdate") <  ts("1998-01-01"))
      .select("o_orderkey", "o_custkey")
    val l = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
                           col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(price * (one - disc)).as("rev"))
      .select(col("n_name"), col("rev").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q05Sql =
    """SELECT n_name,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Left-semi join (EXISTS): customers holding at least one big order. */
  def q06SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      .select(col("o_custkey"))
    c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  private val q06Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Left-anti join (NOT EXISTS): customers with no orders at all. */
  def q07AntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  private val q07Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Ranking window: top-3 orders per customer by totalprice. */
  def q08WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("drk", dense_rank().over(w).cast("long"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  private val q08Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk, quartile FROM (
      |SELECT o_custkey, o_orderkey, o_totalprice,
      |CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
      |CAST(RANK() OVER w AS BIGINT) AS rk,
      |CAST(DENSE_RANK() OVER w AS BIGINT) AS drk,
      |CAST(NTILE(4) OVER w AS BIGINT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Running-frame window: cumulative revenue per supplier over time.
    * Exact decimal running sums → deterministic doubles.
    *
    * The window order must be TOTAL: the synthetic data contains
    * intentional duplicate (orderkey, linenumber) rows, and one sf0.1
    * tie group has two different prices — a ROWS frame over a non-total
    * order accumulates ties in engine-dependent order and the running
    * sums diverge mid-group. l_extendedprice as the last key breaks
    * every tie that matters (rows identical in all keys AND price sum
    * identically in any order). */
  def q09WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("p")) // decimal cast of l_extendedprice — same order
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), price.as("p"))
      .withColumn("running_rev", sum(col("p")).over(w).cast("double"))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "running_rev")
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  private val q09Sql =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
      |PARTITION BY l_suppkey
      |ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
      |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
      |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q10
  /** lag/lead window: days since the customer's previous order. */
  def q10WindowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("days_since_prev",
        datediff(col("o_orderdate"), col("prev_date")).cast("long"))
      .select("o_custkey", "o_orderkey", "days_since_prev")
      .orderBy("o_custkey", "o_orderkey")
  }

  private val q10Sql =
    """SELECT o_custkey, o_orderkey,
      |CAST(DATEDIFF('day', LAG(o_orderdate, 1) OVER (
      |PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate) AS BIGINT) AS days_since_prev
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Top-k: plans as TakeOrderedAndProject (no global sort of the fact). */
  def q11TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  private val q11Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q12
  /** ROLLUP aggregation (hierarchical subtotals).
    *
    * Pre-aggregate to the finest grouping first: rollup/cube plan an
    * Expand that replicates every INPUT row once per grouping set, and
    * Catalyst does not push a partial aggregate below Expand — so the
    * fact table would be materialized ×3. Aggregating to the (flag,
    * status) level first (one ordinary partial+final pass) leaves
    * Expand six rows to triple. Identical results for algebraic aggs
    * (sums of sums, sum of counts). ~3× on the sf0.1 bench; at 100 TB
    * it is the difference between expanding the fact table and
    * expanding a handful of rows. */
  def q12Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n0"),
        sum(col("l_quantity").cast(D182)).as("s0"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("n0")).as("n"),
        sum(col("s0")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)

  private val q12Sql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q13
  /** CUBE aggregation (all grouping combinations). */
  def q13Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n0"),
        sum(col("o_totalprice").cast(D182)).as("s0"))
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(col("n0")).as("n"),
        sum(col("s0")).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
               col("o_orderpriority").asc_nulls_first)

  private val q13Sql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q14
  /** GROUPING SETS via the SQL surface. */
  def q14GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    // same pre-aggregate-below-Expand shape as q12, on the SQL surface
    s.sql(
      """WITH base AS (
        |  SELECT l_returnflag, l_linestatus, COUNT(*) AS n0,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s0
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus, SUM(n0) AS n,
        |CAST(SUM(s0) AS DOUBLE) AS sum_qty
        |FROM base GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  private val q14Sql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Distinct aggregation (expand-based distinct + plain count mixed). */
  def q15DistinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  private val q15Sql =
    """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
      |COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Set operations: INTERSECT / EXCEPT / UNION ALL over customer cohorts
    * (customers ordering in 1996 vs 1997). */
  def q16SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def keys(y: Int) =
      o.filter(year(col("o_orderdate")) === y).select(col("o_custkey"))
    val both   = keys(1996).intersect(keys(1997)).withColumn("grp", lit("both"))
    val only96 = keys(1996).except(keys(1997)).withColumn("grp", lit("only_1996"))
    val only97 = keys(1997).except(keys(1996)).withColumn("grp", lit("only_1997"))
    both.unionByName(only96).unionByName(only97)
      .select(col("grp"), col("o_custkey"))
      .orderBy("grp", "o_custkey")
  }

  private val q16Sql =
    """SELECT 'both' AS grp, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE YEAR(o_orderdate)=1996
      |  INTERSECT SELECT o_custkey FROM orders WHERE YEAR(o_orderdate)=1997)
      |UNION ALL
      |SELECT 'only_1996' AS grp, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE YEAR(o_orderdate)=1996
      |  EXCEPT SELECT o_custkey FROM orders WHERE YEAR(o_orderdate)=1997)
      |UNION ALL
      |SELECT 'only_1997' AS grp, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE YEAR(o_orderdate)=1997
      |  EXCEPT SELECT o_custkey FROM orders WHERE YEAR(o_orderdate)=1996)
      |ORDER BY grp, o_custkey""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Scalar string-function coverage over part. */
  def q17StringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_type"), 1, 4).as("type_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        split(col("p_name"), " ").getItem(0).as("first_word"))
      .orderBy("p_partkey")

  private val q17Sql =
    """SELECT p_partkey, UPPER(p_name) AS name_upper,
      |SUBSTRING(p_type, 1, 4) AS type_prefix,
      |CAST(LENGTH(p_name) AS BIGINT) AS name_len,
      |CONCAT_WS('-', p_brand, p_type) AS brand_type,
      |REGEXP_REPLACE(p_name, ' ', '_', 'g') AS name_snake,
      |STRING_SPLIT(p_name, ' ')[1] AS first_word
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Date functions: truncation + extraction + per-month aggregation. */
  def q18DateAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(D182)).cast("double").as("sum_price"))
      .orderBy("o_year", "o_month")

  private val q18Sql =
    """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
      |CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
      |COUNT(*) AS n,
      |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Conditional aggregation (CASE inside agg). */
  def q19CaseAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("n_urgent"),
        sum(when(col("o_totalprice") > 200000, 1L).otherwise(0L)).as("n_big"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  private val q19Sql =
    """SELECT o_orderstatus,
      |CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
      |CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      |COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q20
  /** JSON extraction from the events.props payload. `from_json` to a
    * typed struct, not `get_json_object`: one Jackson parse bound to a
    * schema vs a per-row path evaluation — measured ~5× on this query
    * at sf0.1 (the map/struct variants in q31 confirmed the gap). */
  def q20Json(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k_val", from_json(col("props"), StructType(
        Seq(StructField("k", LongType)))).getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k_val")).as("sum_k"),
        max(col("k_val")).as("max_k"))
      .orderBy("event_type")

  private val q20Sql =
    """SELECT event_type, COUNT(*) AS n,
      |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Theta (non-equi) join: nation pairs within a region. Small-side
    * cartesian within region — broadcastable by construction. */
  def q21ThetaJoin(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("k1"), col("n_name").as("nation_a"),
        col("n_regionkey").as("r1"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("k2"), col("n_name").as("nation_b"),
        col("n_regionkey").as("r2"))
    val r = t(s, dir, "region")
    n1.join(n2, col("r1") === col("r2") && col("k1") < col("k2"))
      .join(broadcast(r), col("r1") === col("r_regionkey"))
      .select(col("r_name"), col("nation_a"), col("nation_b"))
      .orderBy("r_name", "nation_a", "nation_b")
  }

  private val q21Sql =
    """SELECT r_name, a.n_name AS nation_a, b.n_name AS nation_b
      |FROM nation a JOIN nation b
      |ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
      |JOIN region ON a.n_regionkey = r_regionkey
      |ORDER BY r_name, nation_a, nation_b""".stripMargin

  // ---------------------------------------------------------------- q22
  /** As-of join: for each event, the customer's most recent order date at
    * or before the event time. Spark-first formulation: union both sides,
    * one window pass per user (scales as one shuffle+sort — never a
    * nested-loop inequality join). */
  def q22AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    // events.ts is read as raw nanos (nanosAsLong); compare in exact
    // integer micros on both sides (DuckDB truncates ns→µs the same way).
    val ev = t(s, dir, "events").select(
      col("event_id"), col("user_id"),
      expr("ts div 1000").as("at"),
      lit(null).cast("timestamp_ntz").as("od"), lit(1).as("tag"))
    val or0 = t(s, dir, "orders").select(
      lit(null).cast("long").as("event_id"), col("o_custkey").as("user_id"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("at"),
      col("o_orderdate").as("od"), lit(0).as("tag"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("at"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(or0)
      .withColumn("last_order_date", last(col("od"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select("event_id", "user_id", "last_order_date")
      .orderBy("event_id")
  }

  private val q22Sql =
    """SELECT e.event_id, e.user_id, MAX(o.o_orderdate) AS last_order_date
      |FROM events e LEFT JOIN orders o
      |ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |GROUP BY e.event_id, e.user_id ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Epoch-bucketed (15 min) event aggregation — the batch twin of the
    * streaming tumbling window (graft.streaming). Bucket is pure integer
    * arithmetic so both engines agree exactly. */
  def q23TimeBucket(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      // ts is raw nanos (nanosAsLong); bucket in exact integer arithmetic
      .withColumn("bucket_epoch", expr("(ts div 900000000000) * 900"))
      .groupBy(col("bucket_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D182)).cast("double").as("sum_value"))
      .orderBy("bucket_epoch", "event_type")

  private val q23Sql =
    """SELECT (epoch_us(ts) // 900000000) * 900 AS bucket_epoch,
      |event_type, COUNT(*) AS n,
      |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket_epoch, event_type""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Sessionization in batch: 30-minute-gap sessions per user via
    * windowed gap flags + running session ids (one shuffle, no state). */
  def q24Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ep_us"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      // ts is raw nanos (nanosAsLong); all session math in exact µs
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ep_us"))
      .withColumn("prev_us", lag(col("ep_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ep_us") - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("min(ep_us) div 1000000").as("start_ep"),
        expr("max(ep_us) div 1000000").as("end_ep"))
      .orderBy("user_id", "session_id")
  }

  private val q24Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ep_us,
      |    LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN prev_us IS NULL OR ep_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM e),
      |g AS (
      |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ep_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM f)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |MIN(ep_us) // 1000000 AS start_ep, MAX(ep_us) // 1000000 AS end_ep
      |FROM g GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------- q25
  /** Range join, Spark-first: the probe side derives the covering band
    * key and equi-joins the (broadcast) band dimension, with a residual
    * BETWEEN filter — a hash join at any scale instead of the
    * nested-loop a raw non-equi join plans. Bands partition the domain,
    * so this equals the oracle's true range join. */
  def q25RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = (0 until 5)
      .map(b => (b, b * 10 + 1, (b + 1) * 10, f"q${b * 10 + 1}%02d_${(b + 1) * 10}%02d"))
      .toDF("band", "lo", "hi", "band_label")
    t(s, dir, "lineitem")
      .withColumn("band", floor((col("l_quantity") - 1) / 10).cast("int"))
      .join(broadcast(bands), Seq("band"))
      .filter(col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
      .groupBy(col("band_label"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(D182)).cast("double").as("sum_qty"))
      .orderBy("band_label")
  }

  private val q25Sql =
    """SELECT band_label, COUNT(*) AS n,
      |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN (VALUES
      |  ( 1, 10, 'q01_10'), (11, 20, 'q11_20'), (21, 30, 'q21_30'),
      |  (31, 40, 'q31_40'), (41, 50, 'q41_50')) AS bands(lo, hi, band_label)
      |ON l_quantity >= lo AND l_quantity <= hi
      |GROUP BY band_label ORDER BY band_label""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Multiset (ALL) set operations: bag semantics preserved. */
  def q26SetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    def flags(st: String) =
      li.filter(col("l_linestatus") === st).select(col("l_returnflag"))
    val u = flags("F").unionAll(flags("O")).withColumn("grp", lit("union_all"))
    val i = flags("F").intersectAll(flags("O")).withColumn("grp", lit("intersect_all"))
    val e = flags("F").exceptAll(flags("O")).withColumn("grp", lit("except_all"))
    u.unionByName(i).unionByName(e)
      .groupBy(col("grp"), col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
      .orderBy("grp", "l_returnflag")
  }

  private val q26Sql =
    """SELECT grp, l_returnflag, COUNT(*) AS n FROM (
      |  SELECT 'union_all' AS grp, l_returnflag FROM (
      |    SELECT l_returnflag FROM lineitem WHERE l_linestatus = 'F'
      |    UNION ALL SELECT l_returnflag FROM lineitem WHERE l_linestatus = 'O')
      |  UNION ALL
      |  SELECT 'intersect_all' AS grp, l_returnflag FROM (
      |    SELECT l_returnflag FROM lineitem WHERE l_linestatus = 'F'
      |    INTERSECT ALL SELECT l_returnflag FROM lineitem WHERE l_linestatus = 'O')
      |  UNION ALL
      |  SELECT 'except_all' AS grp, l_returnflag FROM (
      |    SELECT l_returnflag FROM lineitem WHERE l_linestatus = 'F'
      |    EXCEPT ALL SELECT l_returnflag FROM lineitem WHERE l_linestatus = 'O'))
      |GROUP BY grp, l_returnflag ORDER BY grp, l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q27
  /** Exact interpolated median (percentile_cont semantics) per status. */
  def q27Median(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  private val q27Sql =
    """SELECT o_orderstatus,
      |ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
      |COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q28
  /** Scalar subquery: customers above the (exact-decimal) mean balance.
    * The threshold is computed identically in both engines, so the
    * comparison set is deterministic. */
  def q28Subquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin)
  }

  private val q28Sql =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE c_acctbal > (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |  FROM customer)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q29
  /** Per-key top-k via the engine's custom operator stack
    * (graft.plans.TopKPerKey: LogicalPlan + Strategy + bounded-heap
    * exec — one hash shuffle, no partition sort). Oracle is the
    * equivalent window formulation. */
  def q29TopKCustom(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.perKey(
      t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))

  private val q29Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |SELECT o_custkey, o_orderkey, o_totalprice,
      |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q30
  /** Math scalar coverage: sqrt/abs/pow/mod/log/exp/sign/ceil/floor.
    * Transcendentals rounded to 6 places (libm last-bit divergence). */
  def q30MathFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        round(sqrt(col("p_retailprice")), 6).as("sqrt_price"),
        abs(col("p_size") - 25).cast("long").as("abs_off"),
        pow(col("p_size"), 2).as("size_sq"),
        (col("p_partkey") % 7).as("key_mod7"),
        round(log(col("p_retailprice")), 6).as("ln_price"),
        signum(col("p_retailprice") - 1000).cast("long").as("sign_1k"),
        ceil(col("p_retailprice")).cast("long").as("ceil_price"),
        floor(col("p_retailprice")).cast("long").as("floor_price"))
      .orderBy("p_partkey")

  private val q30Sql =
    """SELECT p_partkey,
      |ROUND(SQRT(p_retailprice), 6) AS sqrt_price,
      |CAST(ABS(p_size - 25) AS BIGINT) AS abs_off,
      |POW(p_size, 2) AS size_sq,
      |p_partkey % 7 AS key_mod7,
      |ROUND(LN(p_retailprice), 6) AS ln_price,
      |CAST(SIGN(p_retailprice - 1000) AS BIGINT) AS sign_1k,
      |CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_price,
      |CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_price
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Map-type scalar coverage (SURVEY §2.4 array/map row): the JSON
    * props payload parsed three ways — `from_json` to `map<string,long>`
    * (entries exploded), `map_keys`/`map_values` accessors, and
    * `from_json` to a typed struct — then aggregated per
    * (event_type, prop key). All narrow scans + one hash agg. */
  def q31MapFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("m", from_json(col("props"), MapType(StringType, LongType)))
      .withColumn("st", from_json(col("props"), StructType(
        Seq(StructField("k", LongType)))))
      .select(col("event_type"),
        size(map_keys(col("m"))).as("nk"),
        element_at(map_values(col("m")), 1).as("mv1"),
        col("st.k").as("sk"),
        explode(col("m")))
      .toDF("event_type", "nk", "mv1", "sk", "pk", "pv")
      .groupBy(col("event_type"), col("pk"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("pv")).as("sum_pv"),
        min(col("pv")).as("min_pv"),
        max(col("pv")).as("max_pv"),
        sum(col("sk")).as("sum_struct_k"),
        max(col("mv1")).as("max_mv"),
        sum(col("nk")).cast("long").as("total_keys"))
      .orderBy("event_type", "pk")

  private val q31Sql =
    """WITH kv AS (
      |  SELECT event_type, unnest(json_keys(props)) AS pk, props FROM events),
      |kv2 AS (
      |  SELECT event_type, pk,
      |    CAST(json_extract_string(props, '$.' || pk) AS BIGINT) AS pv,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS sk,
      |    CAST(json_extract_string(props, '$.' || json_keys(props)[1]) AS BIGINT) AS mv1,
      |    len(json_keys(props)) AS nk
      |  FROM kv)
      |SELECT event_type, pk, COUNT(*) AS n_events,
      |CAST(SUM(pv) AS BIGINT) AS sum_pv,
      |MIN(pv) AS min_pv, MAX(pv) AS max_pv,
      |CAST(SUM(sk) AS BIGINT) AS sum_struct_k,
      |MAX(mv1) AS max_mv,
      |CAST(SUM(nk) AS BIGINT) AS total_keys
      |FROM kv2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Pivot: event counts per user cohort × event type. The pivot value
    * list is explicit (no extra distinct-detection job — required at
    * scale), and missing cells coalesce to 0 so the shape is total. */
  private val pivotTypes = Seq("click", "error", "purchase", "signup", "view")

  def q32Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("cohort", (col("user_id") % 10).cast("long"))
      .groupBy(col("cohort"))
      .pivot("event_type", pivotTypes)
      .agg(count(lit(1)))
      .select(col("cohort") +:
        pivotTypes.map(tp => coalesce(col(tp), lit(0L)).as(tp)): _*)
      .orderBy("cohort")

  private val q32Sql = {
    val cells = pivotTypes.map(tp =>
      s"CAST(SUM(CASE WHEN event_type = '$tp' THEN 1 ELSE 0 END) AS BIGINT) AS $tp")
      .mkString(",\n")
    s"""SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
       |$cells
       |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin
  }

  // ---------------------------------------------------------------- q33
  /** Fuzzy (approximate string) join — the entity-resolution primitive:
    * same-token name pairs within levenshtein ≤ 4. Scale shape:
    * DISTINCT names first (fuzzy-join the vocabulary, not the rows —
    * candidate pairs scale with distinct values, and row-level matches
    * map back by equi-join); candidates come from a COMPOUND
    * (token, length-band) key, not the bare token — a skewed token
    * distribution ("the most common second word") would re-create a
    * quadratic hot bucket at scale, and the length band caps every
    * bucket at names-with-that-token within one ~2·(maxDist+1)-char
    * length window. Banding is OVERLAPPING (each name emits
    * ⌊len/5⌋ and ⌊len/5⌋+1) so any pair within the length-difference
    * prefilter — a necessary levenshtein condition — still shares ≥1
    * band: results are identical to the unbanded join, which is why
    * the DuckDB twin can stay on the plain token bucket. Double-banded
    * matches dedupe BEFORE the O(mn) metric runs. Integer edit
    * distance ⇒ exact parity. */
  val fuzzyMaxDistance = 4

  def q33FuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "part").select(col("p_name")).distinct()
      .withColumn("tok", split(col("p_name"), " ").getItem(1))
      .withColumn("g", expr(s"length(p_name) div ${fuzzyMaxDistance + 1}"))
    val banded = names.select(col("p_name"), col("tok"),
      explode(array(col("g"), col("g") + 1)).as("lb"))
    banded.as("a").join(banded.as("b"),
        col("a.tok") === col("b.tok") && col("a.lb") === col("b.lb") &&
        col("a.p_name") < col("b.p_name") &&
        abs(length(col("a.p_name")) - length(col("b.p_name"))) <= fuzzyMaxDistance)
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"))
      .distinct()
      .withColumn("lev",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev") <= fuzzyMaxDistance)
      .orderBy("name_a", "name_b")
  }

  private val q33Sql =
    s"""WITH names AS (
       |  SELECT DISTINCT p_name FROM part),
       |nb AS (
       |  SELECT p_name, string_split(p_name, ' ')[2] AS bucket FROM names)
       |SELECT a.p_name AS name_a, b.p_name AS name_b,
       |CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev
       |FROM nb a JOIN nb b
       |ON a.bucket = b.bucket AND a.p_name < b.p_name
       |  AND abs(length(a.p_name) - length(b.p_name)) <= $fuzzyMaxDistance
       |WHERE levenshtein(a.p_name, b.p_name) <= $fuzzyMaxDistance
       |ORDER BY name_a, name_b""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Correlated EXISTS / NOT EXISTS (SURVEY §2.4 joins row, the
    * subquery-decorrelation surface): orders bucketed by whether any
    * line was deep-discounted. Written as SQL EXISTS on purpose —
    * Catalyst's RewritePredicateSubquery must decorrelate both branches
    * into LeftSemi/LeftAnti hash joins (no per-row re-execution), which
    * PlanSpec pins. Semantically near q06/q07 but exercises a different
    * front-end path (analyzer + decorrelation rules, not the DataFrame
    * join API). */
  def q34Exists(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("g34_orders")
    t(s, dir, "lineitem").createOrReplaceTempView("g34_lineitem")
    s.sql("""
      |SELECT 'discounted' AS bucket, o_orderpriority, COUNT(*) AS n_orders
      |FROM g34_orders o
      |WHERE EXISTS (SELECT 1 FROM g34_lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
      |GROUP BY o_orderpriority
      |UNION ALL
      |SELECT 'full_price' AS bucket, o_orderpriority, COUNT(*) AS n_orders
      |FROM g34_orders o
      |WHERE NOT EXISTS (SELECT 1 FROM g34_lineitem l
      |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
      |GROUP BY o_orderpriority
      |ORDER BY bucket, o_orderpriority""".stripMargin)
  }

  private val q34Sql =
    """SELECT 'discounted' AS bucket, o_orderpriority, COUNT(*) AS n_orders
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
      |GROUP BY o_orderpriority
      |UNION ALL
      |SELECT 'full_price' AS bucket, o_orderpriority, COUNT(*) AS n_orders
      |FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
      |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
      |GROUP BY o_orderpriority
      |ORDER BY bucket, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q35
  /** Unpivot / melt (the inverse of q32's pivot): lineitem's four
    * measure columns melted to (measure, val) rows, then one hash agg
    * per measure. Uses `Dataset.unpivot` — planned as a single Expand
    * (each input row emits 4 rows map-side, no shuffle before the
    * partial agg), so at 100 TB the cost is one scan + one 4-row
    * hash-shuffle. Measures go through decimal(18,2) so the sums are
    * exact and engine-order-independent ([[q01PricingSummary]] rule). */
  def q35Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        col("l_quantity").cast("decimal(18,2)").as("qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"),
        col("l_discount").cast("decimal(18,2)").as("disc"),
        col("l_tax").cast("decimal(18,2)").as("tax"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("qty"), col("price"), col("disc"), col("tax")),
        "measure", "val")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"),
        sum(col("val")).cast("double").as("sum_val"),
        min(col("val")).cast("double").as("min_val"),
        max(col("val")).cast("double").as("max_val"),
        (sum(col("val")).cast("double") / count(lit(1))).as("avg_val"))
      .orderBy("measure")

  private val q35Sql =
    """WITH m AS (
      |  SELECT l_orderkey,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS qty,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |    CAST(l_discount AS DECIMAL(18,2)) AS disc,
      |    CAST(l_tax AS DECIMAL(18,2)) AS tax
      |  FROM lineitem),
      |u AS (UNPIVOT m ON qty, price, disc, tax INTO NAME measure VALUE val)
      |SELECT measure, COUNT(*) AS n,
      |CAST(SUM(val) AS DOUBLE) AS sum_val,
      |CAST(MIN(val) AS DOUBLE) AS min_val,
      |CAST(MAX(val) AS DOUBLE) AS max_val,
      |CAST(SUM(val) AS DOUBLE) / COUNT(*) AS avg_val
      |FROM u GROUP BY measure ORDER BY measure""".stripMargin

  // ---------------------------------------------------------------- q36
  /** RANGE window frame (value-based, vs q09's ROWS frame): per-user
    * trailing 10-minute event count + value sum. A RANGE frame is
    * defined by the ORDER BY *value* (all ties are peers), so the frame
    * content is deterministic even on duplicate timestamps — no
    * tie-order hazard. Event time is exact integer micros (`ts div
    * 1000`, parquet nanos), value sums go through decimal. One hash
    * shuffle on user_id; the frame scan is the incremental sliding
    * range Spark's WindowExec does per partition. */
  def q36RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-600000000L, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("us"), col("value"))
      .withColumn("trailing_n", count(lit(1)).over(w))
      .withColumn("trailing_sum",
        sum(col("value").cast(D182)).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("us"),
        col("trailing_n"), col("trailing_sum"))
      .orderBy("user_id", "us", "event_id")
  }

  private val q36Sql =
    """SELECT event_id, user_id, epoch_us(ts) AS us,
      |COUNT(*) OVER w AS trailing_n,
      |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, us, event_id""".stripMargin

  // ---------------------------------------------------------------- q37
  /** List/string aggregation: per brand, the sorted distinct type set
    * both as a delimited string and as a size. `collect_set` is
    * order-nondeterministic by contract, so the result is made
    * deterministic (and engine-portable) by `array_sort` before the
    * join — the only safe way to emit aggregated lists at scale.
    * Distinct-set state per group is bounded by type cardinality
    * (tiny), so the agg partial-combines map-side. */
  def q37StringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy(col("p_brand"))
      .agg(
        array_join(array_sort(collect_set(col("p_type"))), ",").as("types"),
        countDistinct(col("p_type")).as("n_types"),
        count(lit(1)).as("n_parts"))
      .orderBy("p_brand")

  private val q37Sql =
    """SELECT p_brand,
      |string_agg(DISTINCT p_type, ',' ORDER BY p_type) AS types,
      |COUNT(DISTINCT p_type) AS n_types,
      |COUNT(*) AS n_parts
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Window navigation with IGNORE NULLS: per user ordered by event
    * time, carry the last non-null purchase value forward (the
    * gap-fill idiom) and expose the first and 2nd values of the
    * partition. Nulls are derived deterministically (non-purchase
    * events have no amount). One hash shuffle on user_id; frames are
    * running (no second sort). Total per-partition order via
    * (us, event_id) keeps tie rows engine-stable. */
  def q38IgnoreNulls(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("us"),
        when(col("event_type") === "purchase",
          col("value").cast(D182)).as("amount"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("last_amount",
        last(col("amount"), ignoreNulls = true).over(wAll).cast("double"))
      .withColumn("first_amount",
        first(col("amount"), ignoreNulls = true).over(wAll).cast("double"))
      .withColumn("second_seen",
        nth_value(col("amount"), 2, ignoreNulls = true).over(wAll)
          .cast("double"))
      .select(col("event_id"), col("user_id"), col("us"),
        col("amount").cast("double").as("amount"),
        col("last_amount"), col("first_amount"), col("second_seen"))
      .orderBy("user_id", "us", "event_id")
  }

  private val q38Sql =
    """WITH b AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us,
      |    CASE WHEN event_type = 'purchase'
      |      THEN CAST(value AS DECIMAL(18,2)) END AS amount
      |  FROM events)
      |SELECT event_id, user_id, us,
      |CAST(amount AS DOUBLE) AS amount,
      |CAST(LAST_VALUE(amount IGNORE NULLS) OVER w AS DOUBLE) AS last_amount,
      |CAST(FIRST_VALUE(amount IGNORE NULLS) OVER w AS DOUBLE) AS first_amount,
      |CAST(NTH_VALUE(amount, 2 IGNORE NULLS) OVER w AS DOUBLE) AS second_seen
      |FROM b
      |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, us, event_id""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Distribution window functions (percent_rank / cume_dist),
    * completing the ranking family beyond q08's rank/dense_rank/ntile.
    * Both are exact small-integer ratios evaluated in double — bit-
    * identical across engines with a TOTAL window order (price, key).
    * One hash shuffle on the partition key, single window pass. */
  def q39PercentRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"))
      .filter(col("o_orderkey") % 10 === 0)
      .orderBy("o_orderkey")
  }

  private val q39Sql =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |PERCENT_RANK() OVER w AS pct_rank,
      |CUME_DIST() OVER w AS cum_dist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |  ORDER BY o_totalprice, o_orderkey)
      |QUALIFY o_orderkey % 10 = 0
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q40
  /** Nation-pair trade flow (TPC-H Q7 shape) — the deepest join tree in
    * the suite: lineitem ⋈ orders ⋈ customer ⋈ supplier with `nation`
    * joined TWICE under different roles (supplier's vs customer's
    * nation). All four dimension sides broadcast; the only shuffle is
    * the fact⋈fact lineitem⋈orders join, then one hash agg on the
    * (nation, nation, year) key. Cross-nation filter keeps only
    * inter-country flows. */
  def q40NationPairs(s: SparkSession, dir: String): DataFrame = {
    val sn = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cn = t(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    val l = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(price * (one - disc)).as("rev"),
        count(lit(1)).as("n_lines"))
      .select(col("supp_nation"), col("cust_nation"), col("o_year"),
        col("rev").cast("double").as("revenue"), col("n_lines"))
      .orderBy("supp_nation", "cust_nation", "o_year")
  }

  private val q40Sql =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |COUNT(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE sn.n_name <> cn.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q41
  /** Correlated SCALAR subqueries in SELECT — the remaining subquery
    * form next to q28 (IN) and q34 (EXISTS): per-customer order count
    * and max order value, written as two correlated `(SELECT agg ...)`
    * expressions. Catalyst's decorrelation must turn BOTH into ONE
    * aggregate-below-left-outer-join (no per-row re-execution —
    * PlanSpec pins the absence of a subquery node and the LeftOuter),
    * so at 100 TB this is a hash agg on o_custkey plus one shuffle
    * join, not |customer| scans of orders. COALESCE gives order-less
    * customers exact zeros. */
  def q41ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("g41_customer")
    t(s, dir, "orders").createOrReplaceTempView("g41_orders")
    s.sql("""
      |SELECT c_custkey,
      |  CAST(COALESCE((SELECT COUNT(*) FROM g41_orders o
      |                 WHERE o.o_custkey = c.c_custkey), 0) AS BIGINT) AS n_orders,
      |  CAST(COALESCE((SELECT MAX(o_totalprice) FROM g41_orders o
      |                 WHERE o.o_custkey = c.c_custkey), 0.0) AS DOUBLE) AS max_order
      |FROM g41_customer c
      |WHERE c_custkey % 7 = 0
      |ORDER BY c_custkey""".stripMargin)
  }

  private val q41Sql =
    """SELECT c_custkey,
      |  CAST(COALESCE((SELECT COUNT(*) FROM orders o
      |                 WHERE o.o_custkey = c.c_custkey), 0) AS BIGINT) AS n_orders,
      |  CAST(COALESCE((SELECT MAX(o_totalprice) FROM orders o
      |                 WHERE o.o_custkey = c.c_custkey), 0.0) AS DOUBLE) AS max_order
      |FROM customer c
      |WHERE c_custkey % 7 = 0
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q42
  /** ntile quantile bucketing — the "split each group into k equal
    * cohorts" window (training-mix curricula bucket documents by
    * quality score exactly like this). ntile is deterministic only
    * under a TOTAL order, so the orderkey tiebreak matters (the
    * synthetic tables carry intentional duplicate prices). One window
    * + one hash agg; the window partitions by priority so no global
    * sort. */
  val ntileBuckets = 4

  def q42Ntile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("quartile", ntile(ntileBuckets).over(w).cast("long"))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).cast("double").as("lo"),
        max(col("o_totalprice")).cast("double").as("hi"))
      .orderBy("o_orderpriority", "quartile")
  }

  private val q42Sql =
    s"""WITH q AS (
       |  SELECT o_orderpriority,
       |    NTILE($ntileBuckets) OVER (PARTITION BY o_orderpriority
       |      ORDER BY o_totalprice, o_orderkey) AS quartile,
       |    o_totalprice
       |  FROM orders)
       |SELECT o_orderpriority, CAST(quartile AS BIGINT) AS quartile,
       |  COUNT(*) AS n_orders,
       |  CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
       |  CAST(MAX(o_totalprice) AS DOUBLE) AS hi
       |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q43
  /** LATERAL correlated subquery in FROM — the "top-1 related row per
    * outer row" idiom (DuckDB/Postgres users write exactly this).
    * Catalyst plans the correlated ORDER BY ... LIMIT 1 via
    * DecorrelateInnerQuery into a ranked join — one shuffle + one
    * window/heap on o_custkey — never |customer| subquery executions.
    * INNER lateral semantics drop order-less customers (the COALESCE
    * path is q41's job). */
  def q43Lateral(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("g43_customer")
    t(s, dir, "orders").createOrReplaceTempView("g43_orders")
    s.sql("""
      |SELECT c.c_custkey, t.top_price, t.top_orderkey
      |FROM g43_customer c,
      |LATERAL (SELECT o.o_totalprice AS top_price, o.o_orderkey AS top_orderkey
      |         FROM g43_orders o WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 1) t
      |WHERE c.c_custkey % 11 = 0
      |ORDER BY c.c_custkey""".stripMargin)
      .selectExpr("c_custkey", "CAST(top_price AS DOUBLE) AS top_price",
        "top_orderkey")
  }

  private val q43Sql =
    """SELECT c.c_custkey, CAST(t.top_price AS DOUBLE) AS top_price,
      |  t.top_orderkey
      |FROM customer c,
      |LATERAL (SELECT o.o_totalprice AS top_price, o.o_orderkey AS top_orderkey
      |         FROM orders o WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 1) t
      |WHERE c.c_custkey % 11 = 0
      |ORDER BY c.c_custkey""".stripMargin

  // ---------------------------------------------------------------- q44
  /** Generated calendar dimension + gap fill — reporting over sparse
    * facts needs every period present, so the week dim is GENERATED
    * (sequence/explode — Spark's Range/Generate, no table scan), the
    * fact side pre-aggregates to one row per week BEFORE the join, and
    * the generated side left-joins it with COALESCE zeros. At 100 TB
    * the join touches |weeks| rows on one side and |weeks| pre-agged
    * rows on the other — the dim is broadcast-trivial by construction.
    * Week arithmetic is integer days-since-epoch DIV 7 (no timezone,
    * no DATE_TRUNC dialect drift). */
  def q44CalendarFill(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select((datediff(col("o_orderdate"), lit("1970-01-01")) / 7)
          .cast("long").as("week"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
    val byWeek = o.groupBy(col("week"))
      .agg(count(lit(1)).as("n_orders"), sum(col("p")).as("rev"))
    val bounds = o.agg(min(col("week")).as("w0"), max(col("week")).as("w1"))
    val weeks = bounds
      .select(explode(expr("sequence(w0, w1)")).as("week"))
    weeks.join(byWeek, Seq("week"), "left")
      .select(col("week"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("rev"), lit(0).cast("decimal(18,2)"))
          .cast("double").as("revenue"))
      .orderBy("week")
  }

  private val q44Sql =
    """WITH o AS (
      |  SELECT CAST(datediff('day', DATE '1970-01-01',
      |    CAST(o_orderdate AS DATE)) // 7 AS BIGINT) AS week,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders),
      |by_week AS (
      |  SELECT week, COUNT(*) AS n_orders, SUM(p) AS rev FROM o GROUP BY week),
      |bounds AS (SELECT MIN(week) AS w0, MAX(week) AS w1 FROM o),
      |weeks AS (
      |  SELECT unnest(generate_series(w0, w1)) AS week FROM bounds)
      |SELECT w.week,
      |  COALESCE(b.n_orders, 0) AS n_orders,
      |  CAST(COALESCE(b.rev, 0) AS DOUBLE) AS revenue
      |FROM weeks w LEFT JOIN by_week b ON w.week = b.week
      |ORDER BY w.week""".stripMargin

  // ---------------------------------------------------------------- q45
  /** CDC latest-state compaction (SCD-1 snapshot): collapse the event
    * log to the most recent row per (user, event type) — the "current
    * state table" every change-stream consumer materializes. The
    * unique event_id breaks timestamp ties, so the snapshot is
    * deterministic; `row_number = 1` is auto-rewritten by
    * ArgminRewrite (r11) into a partial-agged max(struct(ts,
    * event_id, payload…)), so compacting a 100 TB log collapses to
    * one row per key on the MAP side — the exchange carries keys, not
    * events, and nothing ever sorts a partition. Event time stays in exact integer micros (ts is raw
    * nanos under nanosAsLong). */
  def q45LatestState(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("last_event_id"),
        expr("ts div 1000").as("last_ts_us"),
        col("value").as("last_value"))
      .orderBy("user_id", "event_type")
  }

  private val q45Sql =
    """SELECT user_id, event_type, event_id AS last_event_id,
      |  CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
      |  value AS last_value
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |        ORDER BY ts DESC, event_id DESC) AS rk
      |      FROM events)
      |WHERE rk = 1 ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- q46
  /** Running COUNT(DISTINCT) over a window — an aggregate Spark does not
    * support natively (no DISTINCT window aggregates). Written in the
    * NATURAL one-line form — `size(collect_set(part).over(w))` — which
    * on stock Spark materializes the distinct SET per row (O(distinct)
    * window state, the scale-killer); the engine's
    * [[graft.plans.DistinctWindowRewrite]] optimizer rule rewrites it
    * into the bounded first-occurrence decomposition (per-(supplier,
    * part) row_number flag + running sum — two plain rank/sum windows,
    * O(1) state per row). PlanSpec pins that no collect_set survives.
    *
    * Scale: two windows partitioned by high-cardinality keys
    * ((suppkey, partkey) then suppkey), no global sort. The oracle
    * spells the decomposition explicitly (DuckDB has no rule), so both
    * engines produce the same values down to the cell. */
  def q46WindowDistinct(s: SparkSession, dir: String): DataFrame = {
    val ord = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val wRun = Window.partitionBy(col("l_suppkey")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_partkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_shipdate"))
      .withColumn("distinct_parts",
        size(collect_set(col("l_partkey")).over(wRun)).cast("long"))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "distinct_parts")
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  private val q46Sql =
    """WITH flagged AS (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
      |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY l_suppkey, l_partkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber) = 1
      |      THEN 1 ELSE 0 END AS first_seen
      |  FROM lineitem)
      |SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(SUM(first_seen) OVER (PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS distinct_parts
      |FROM flagged ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q47
  /** Distribution scalars Spark lacks as deterministic built-ins: MODE
    * (most frequent value) and exact PERCENTILE_DISC, per group — both
    * via rank decompositions so ties are pinned (mode breaks toward the
    * smaller value; the disc quantile is the value at rank ⌈q·n⌉ under
    * a unique total order) and both engines walk the identical plan
    * instead of trusting engine-specific tie behavior.
    *
    * Scale: the mode ranks the (status, priority)-count relation —
    * |groups|-sized, not data-sized — and row_number=1 is rewritten to
    * the partial-agged argmin (ArgminRewrite, r11 — the count is a
    * non-nullable BIGINT, so the DESC key flips under min(struct)); the quantile
    * window ranks within
    * status partitions with O(1) per-row state, then one conditional
    * agg picks the three ranks. No global sort, no collect. */
  def q47DistScalars(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val pc = o.groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
    val wm = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("c").desc, col("o_orderpriority"))
    val mode = pc.withColumn("rk", row_number().over(wm))
      .filter(col("rk") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("c").as("mode_cnt"))
    val wq = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("p"), col("o_orderkey"))
    val ranked = o.select(col("o_orderstatus"), col("o_orderkey"),
        col("o_totalprice").cast(D182).as("p"))
      .withColumn("rn", row_number().over(wq))
    val n = ranked.groupBy(col("o_orderstatus")).agg(max(col("rn")).as("n"))
    val quant = ranked.join(broadcast(n), "o_orderstatus")
      .groupBy(col("o_orderstatus"))
      .agg(
        max(when(col("rn") === ceil(col("n") * 0.25), col("p"))).cast("double").as("p25"),
        max(when(col("rn") === ceil(col("n") * 0.5), col("p"))).cast("double").as("p50"),
        max(when(col("rn") === ceil(col("n") * 0.75), col("p"))).cast("double").as("p75"))
    mode.join(quant, "o_orderstatus").orderBy("o_orderstatus")
  }

  private val q47Sql =
    """WITH pc AS (
      |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
      |  FROM orders GROUP BY 1, 2),
      |md AS (
      |  SELECT o_orderstatus, o_orderpriority AS mode_priority, c AS mode_cnt
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |          ORDER BY c DESC, o_orderpriority) AS rk FROM pc)
      |  WHERE rk = 1),
      |rankd AS (
      |  SELECT o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS p,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |      ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey) AS rn
      |  FROM orders),
      |nn AS (SELECT o_orderstatus, MAX(rn) AS n FROM rankd GROUP BY 1),
      |qt AS (
      |  SELECT r.o_orderstatus,
      |    CAST(MAX(CASE WHEN r.rn = CEIL(nn.n * 0.25) THEN r.p END) AS DOUBLE) AS p25,
      |    CAST(MAX(CASE WHEN r.rn = CEIL(nn.n * 0.5)  THEN r.p END) AS DOUBLE) AS p50,
      |    CAST(MAX(CASE WHEN r.rn = CEIL(nn.n * 0.75) THEN r.p END) AS DOUBLE) AS p75
      |  FROM rankd r JOIN nn ON r.o_orderstatus = nn.o_orderstatus
      |  GROUP BY 1)
      |SELECT md.o_orderstatus, md.mode_priority, md.mode_cnt, qt.p25, qt.p50, qt.p75
      |FROM md JOIN qt ON md.o_orderstatus = qt.o_orderstatus
      |ORDER BY md.o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q48
  /** q48: recursive CTE (Spark 4 `WITH RECURSIVE` → `UnionLoop`) —
    * hierarchy traversal, the one relational operator class the suite
    * lacked. The part "hierarchy" is the deterministic binary tree
    * parent(p) = p DIV 2 rooted at partkey 1, derived from data every
    * engine shares; each seed part (every 101st key) walks its ancestor
    * chain to the root and rolls up chain length, ancestor-key sum, and
    * ancestor retail price (DECIMAL — order-independent money sum).
    *
    * Scale: recursion depth is log₂(maxkey) (~18 at sf1; iteration
    * count, not data volume), each level is one narrow self-map plus a
    * final broadcast-sized join against part on the chain nodes —
    * no step ever holds more than seeds × depth rows. The DuckDB twin
    * is the identical recursion (`//` is DuckDB's integer DIV).
    *
    * anc_price is emitted as BIGINT cents (not DECIMAL): r4 shipped
    * this query hash-red at the driver while bit-identical locally
    * under a string-exact multiset compare, so r5 removes decimals
    * from the output entirely — if the row stays red the channel is
    * the UnionLoop plan, not the value representation. */
  def q48RecursiveAgg(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("g48_part")
    s.sql("""
      |WITH RECURSIVE anc AS (
      |  SELECT p_partkey AS part, p_partkey AS node, 0 AS depth
      |  FROM g48_part WHERE p_partkey % 101 = 0
      |  UNION ALL
      |  SELECT part, node DIV 2 AS node, depth + 1 AS depth
      |  FROM anc WHERE node > 1
      |)
      |SELECT a.part,
      |  CAST(COUNT(*) AS BIGINT) AS chain_len,
      |  CAST(MAX(a.depth) AS BIGINT) AS levels,
      |  CAST(SUM(a.node) AS BIGINT) AS anc_key_sum,
      |  CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS anc_price_cents
      |FROM anc a JOIN g48_part p ON a.node = p.p_partkey
      |GROUP BY a.part
      |ORDER BY a.part""".stripMargin)
  }

  private val q48Sql =
    """WITH RECURSIVE anc AS (
      |  SELECT p_partkey AS part, p_partkey AS node, 0 AS depth
      |  FROM part WHERE p_partkey % 101 = 0
      |  UNION ALL
      |  SELECT part, node // 2 AS node, depth + 1 AS depth
      |  FROM anc WHERE node > 1
      |)
      |SELECT a.part,
      |  CAST(COUNT(*) AS BIGINT) AS chain_len,
      |  CAST(MAX(a.depth) AS BIGINT) AS levels,
      |  CAST(SUM(a.node) AS BIGINT) AS anc_key_sum,
      |  CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS anc_price_cents
      |FROM anc a JOIN part p ON a.node = p.p_partkey
      |GROUP BY a.part
      |ORDER BY a.part""".stripMargin

  // ------------------------------------------------------------- q49
  /** Z-order (Morton) layout keys — the multi-dimensional clustering
    * key behind data-layout optimization (the `OPTIMIZE ZORDER BY`
    * family): the low 16 bits of `l_partkey` and `l_suppkey` are
    * bit-interleaved into one BIGINT, and the query reports, per
    * `zkey >> 12` bucket, the row count and BOTH key ranges. Those
    * per-bucket min/max spans are exactly the parquet column stats a
    * scan prunes on — writing files in zkey order bounds the span of
    * EVERY interleaved column per file (a 1-D sort bounds only its
    * leading column), which is what makes two-predicate scans skip
    * files at 100 TB.
    *
    * The interleave is the classic shift-or-mask bit spread — pure
    * integer arithmetic, codegen'd, map-side, no expansion, and
    * bit-identical on any engine (the same textual expression tree
    * runs in both dialects). Only the bucket aggregate shuffles, and
    * it partial-aggregates to the bucket count first. */
  private def mortonSpread(x: String, shl: (String, Int) => String): String = {
    // 16-bit value spread to even bit positions of a 32-bit result:
    // x = (x | x<<8) & 0x00FF00FF; (|x<<4) & 0x0F0F0F0F;
    // (|x<<2) & 0x33333333; (|x<<1) & 0x55555555
    val s0 = s"($x & 65535)"
    val s1 = s"(($s0 | ${shl(s0, 8)}) & 16711935)"
    val s2 = s"(($s1 | ${shl(s1, 4)}) & 252645135)"
    val s3 = s"(($s2 | ${shl(s2, 2)}) & 858993459)"
    s"(($s3 | ${shl(s3, 1)}) & 1431655765)"
  }

  private def mortonZ(a: String, b: String,
      shl: (String, Int) => String): String =
    s"(${mortonSpread(a, shl)} | ${shl(mortonSpread(b, shl), 1)})"

  def q49ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val sparkShl = (e: String, n: Int) => s"shiftleft($e, $n)"
    t(s, dir, "lineitem")
      .select(expr(mortonZ("l_partkey", "l_suppkey", sparkShl))
        .cast("long").as("zkey"),
        col("l_partkey"), col("l_suppkey"))
      .groupBy(shiftright(col("zkey"), 12).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
        min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
      .select(col("bucket"), col("n_rows"),
        col("pk_min"), col("pk_max"), col("sk_min"), col("sk_max"),
        (col("pk_max") - col("pk_min")).as("pk_span"),
        (col("sk_max") - col("sk_min")).as("sk_span"))
      .orderBy("bucket")
  }

  private val q49Sql = {
    val duckShl = (e: String, n: Int) => s"($e << $n)"
    s"""WITH z AS (
       |  SELECT ${mortonZ("l_partkey", "l_suppkey", duckShl)} AS zkey,
       |    l_partkey, l_suppkey
       |  FROM lineitem)
       |SELECT zkey >> 12 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
       |  MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max,
       |  MAX(l_partkey) - MIN(l_partkey) AS pk_span,
       |  MAX(l_suppkey) - MIN(l_suppkey) AS sk_span
       |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  // ------------------------------------------------------------- q50
  /** Association rules over order baskets (market-basket co-occurrence):
    * each order's distinct part BRANDS form a basket; brand pairs that
    * co-occur get support, confidence (P(b|a) in exact ppm) and lift
    * (×10⁶), top [[assocTopK]] by support. The classic affinity mining
    * shape — and, in an LLM pipeline, the same co-occurrence template
    * as t09's PMI collocations, lifted from token bigrams to basket
    * items.
    *
    * Scale: the brand dimension broadcasts into the fact scan; baskets
    * are `(order, brand)` DISTINCT pairs (never full line items); the
    * pair expansion self-joins on the basket key so per-order work is
    * `C(basket, 2)` — bounded by basket size exactly like g02's
    * wedge bound, not by corpus size; item supports (25 rows) and the
    * basket total (1 row) broadcast back. All ratios are integer div
    * of exact counts; lift uses COMPOSED floors (conf first, then
    * × baskets div supp_b) mirrored verbatim in the oracle, keeping
    * every intermediate under 2⁶³ to ~9·10¹² baskets with sub-ppm
    * bias — the one-shot triple product wrapped silently at ~10⁷. */
  val assocTopK = 30

  def q50AssocRules(s: SparkSession, dir: String): DataFrame = {
    // items feeds FOUR subtrees (supports, the basket total, and both
    // sides of the pair self-join) but is deliberately NOT persisted:
    // the four consumers share the distinct's shuffle via
    // ReusedExchange, and a .persist() here measured 3× SLOWER at
    // sf0.1 (9.4 s vs 3.2 s min-of-3) — the cache materialization
    // barrier breaks stage pipelining (the Dedup.scala d03 lesson)
    val items = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
      .distinct()
    val supp = items.groupBy(col("brand")).agg(count(lit(1)).as("supp"))
    val nOrders = items.agg(
      countDistinct(col("ok")).cast("long").as("n_orders"))
    items.as("a")
      .join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
      .agg(count(lit(1)).as("supp_ab"))
      .join(broadcast(supp.select(col("brand").as("brand_a"),
        col("supp").as("supp_a"))), "brand_a")
      .join(broadcast(supp.select(col("brand").as("brand_b"),
        col("supp").as("supp_b"))), "brand_b")
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("supp_ab"),
        expr("supp_ab * 1000000L div supp_a").as("conf_ppm"),
        // lift as COMPOSED floors: conf first (≤ 10⁶), then × baskets
        // div supp_b — the one-shot product supp_ab·n_orders·10⁶
        // silently wraps Long past ~10⁷ baskets on Spark while DuckDB
        // errors (review catch: engine divergence at exactly the scale
        // the op targets). The composition keeps every intermediate ≤
        // 10⁶·n_orders (< 2⁶³ to ~9·10¹² baskets) and is mirrored
        // verbatim in the oracle, so both engines floor identically;
        // the composed floor's bias vs the exact ratio is < 1 ppm·
        // n_orders/supp_a·supp_b — sub-ppm for any pair that clears a
        // support threshold
        expr("(supp_ab * 1000000L div supp_a) * n_orders div supp_b")
          .as("lift_ppm"))
      .orderBy(col("supp_ab").desc, col("brand_a"), col("brand_b"))
      .limit(assocTopK)
  }

  private val q50Sql =
    s"""WITH items AS MATERIALIZED (
       |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       |supp AS (
       |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS supp
       |  FROM items GROUP BY brand),
       |n AS (
       |  SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM items),
       |pairs AS (
       |  SELECT a.brand AS brand_a, b.brand AS brand_b,
       |    CAST(COUNT(*) AS BIGINT) AS supp_ab
       |  FROM items a JOIN items b ON a.ok = b.ok AND a.brand < b.brand
       |  GROUP BY 1, 2)
       |SELECT brand_a, brand_b, supp_ab,
       |  supp_ab * 1000000 // sa.supp AS conf_ppm,
       |  (supp_ab * 1000000 // sa.supp) * n.n_orders // sb.supp AS lift_ppm
       |FROM pairs
       |JOIN supp sa ON pairs.brand_a = sa.brand
       |JOIN supp sb ON pairs.brand_b = sb.brand, n
       |ORDER BY supp_ab DESC, brand_a, brand_b LIMIT $assocTopK""".stripMargin

  // ------------------------------------------------------------- q51
  /** SCD Type-2 dimension build from the event log — the warehouse
    * history table q45's latest-state CDC only summarizes: each user's
    * consecutive run of the same event_type becomes one VERSIONED row
    * with `[valid_from, valid_to)` micros, event count, and a
    * current-row flag (open valid_to). The run-collapse is the
    * classic gaps-and-islands decomposition: a change flag via lag,
    * a running sum to number versions, one aggregate per version,
    * lead for the interval end.
    *
    * Scale: two window passes and one aggregate, all on the SAME
    * user-partitioned sort (one shuffle, reused ordering); event-time
    * math in exact integer micros (the q23/q24 discipline), ties
    * broken by event_id — deterministic under any partitioning. */
  def q51Scd2Intervals(s: SparkSession, dir: String): DataFrame =
    q51Scd2IntervalsDf(t(s, dir, "events"))

  /** Contract form: the interval core plus the presentation sort. */
  def q51Scd2IntervalsDf(events: DataFrame): DataFrame =
    scd2IntervalsCore(events).orderBy("user_id", "version")

  /** Unordered SCD2 interval build — consumers that re-shuffle (q58's
    * PIT join) use this directly so the q51 presentation sort's range
    * exchange is never paid just to be discarded. */
  def scd2IntervalsCore(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ep_us"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
    events
      .select(col("event_id"), col("user_id"),
        col("event_type").as("state"), expr("ts div 1000").as("ep_us"))
      .withColumn("chg", when(lag(col("state"), 1).over(byUser).isNull ||
        lag(col("state"), 1).over(byUser) =!= col("state"), 1L)
        .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(cum))
      .groupBy(col("user_id"), col("version"))
      .agg(max(col("state")).as("state"), // constant within a version
        min(col("ep_us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(byVer))
      .withColumn("is_current",
        when(col("valid_to_us").isNull, 1L).otherwise(0L))
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from_us"), col("valid_to_us"), col("n_events"),
        col("is_current"))
  }

  private val q51Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type AS state, epoch_us(ts) AS ep_us,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS prev_state
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN prev_state IS NULL OR prev_state <> state
      |    THEN 1 ELSE 0 END AS chg FROM e),
      |v AS (
      |  SELECT *, SUM(chg) OVER (PARTITION BY user_id
      |    ORDER BY ep_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
      |  FROM f),
      |runs AS (
      |  SELECT user_id, version, MAX(state) AS state,
      |    MIN(ep_us) AS valid_from_us,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM v GROUP BY user_id, version)
      |SELECT user_id, CAST(version AS BIGINT) AS version, state,
      |  valid_from_us,
      |  LEAD(valid_from_us, 1) OVER (PARTITION BY user_id
      |    ORDER BY version) AS valid_to_us,
      |  n_events,
      |  CAST(CASE WHEN LEAD(valid_from_us, 1) OVER (PARTITION BY user_id
      |    ORDER BY version) IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM runs ORDER BY user_id, version""".stripMargin

  // ------------------------------------------------------------- q52
  /** Winsorized robust statistics per brand — the outlier-resistant
    * aggregation a metrics pipeline uses when means must not be
    * dragged by tails: per-brand p10/p90 quantity bounds via EXACT
    * order statistics (value at rank `⌈n/10⌉` / `⌈9n/10⌉` — the q47
    * percentile_disc discipline; rank arithmetic all-integer), every
    * row clamped into [p10, p90], then the winsorized mean (×100,
    * integer div) and the clamp count. Quantities are integral in
    * this schema, so the BIGINT cast is exact and every emitted cell
    * is engine-invariant.
    *
    * Scale: one window pass per brand for ranks (value-at-rank is
    * tie-order-invariant, so the non-unique sort key is safe), a
    * 25-row bounds table broadcast back, and one partial-agged final
    * pass — no percentile sketch needed because the bound is an order
    * statistic the window already yields exactly. */
  def q52Winsorize(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        col("l_quantity").cast("long").as("qty"))
    val wr = Window.partitionBy(col("brand")).orderBy(col("qty"))
    val wn = Window.partitionBy(col("brand"))
    val bounds = li
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy(col("brand"))
      .agg(max(col("n")).as("n_rows"),
        max(when(expr("rn = (n + 9) div 10"), col("qty"))).as("p10"),
        max(when(expr("rn = (9 * n + 9) div 10"), col("qty"))).as("p90"))
    li.join(broadcast(bounds), "brand")
      .withColumn("wq", greatest(least(col("qty"), col("p90")), col("p10")))
      .groupBy(col("brand"))
      .agg(max(col("n_rows")).as("n_rows"),
        max(col("p10")).as("p10"), max(col("p90")).as("p90"),
        sum(when(col("qty") < col("p10") || col("qty") > col("p90"), 1L)
          .otherwise(0L)).as("n_clamped"),
        expr("sum(wq) * 100L div max(n_rows)").as("wins_mean_x100"))
      .orderBy("brand")
  }

  private val q52Sql =
    """WITH li AS (
      |  SELECT p.p_brand AS brand, CAST(l.l_quantity AS BIGINT) AS qty
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |rk AS (
      |  SELECT brand, qty,
      |    ROW_NUMBER() OVER (PARTITION BY brand ORDER BY qty) AS rn,
      |    COUNT(*) OVER (PARTITION BY brand) AS n
      |  FROM li),
      |bounds AS (
      |  SELECT brand, CAST(MAX(n) AS BIGINT) AS n_rows,
      |    MAX(CASE WHEN rn = (n + 9) // 10 THEN qty END) AS p10,
      |    MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN qty END) AS p90
      |  FROM rk GROUP BY brand)
      |SELECT li.brand, CAST(MAX(b.n_rows) AS BIGINT) AS n_rows,
      |  MAX(b.p10) AS p10, MAX(b.p90) AS p90,
      |  CAST(SUM(CASE WHEN li.qty < b.p10 OR li.qty > b.p90
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
      |  CAST(SUM(greatest(least(li.qty, b.p90), b.p10)) AS BIGINT)
      |    * 100 // MAX(b.n_rows) AS wins_mean_x100
      |FROM li JOIN bounds b ON li.brand = b.brand
      |GROUP BY li.brand ORDER BY li.brand""".stripMargin

  // ------------------------------------------------------------- q53
  /** CDC / MERGE-INTO apply: fold a change batch into a base snapshot —
    * the table-maintenance primitive (Delta/Iceberg MERGE) expressed as
    * one declarative plan on stock Spark. The change feed is the event
    * log: per key, the LATEST event wins (ts DESC, event_id DESC — the
    * q45 compaction), 'click' means DELETE, anything else UPSERT. The
    * post-merge snapshot classifies every key: unchanged / updated /
    * inserted / deleted (deletes surface as evidence rows with NULL
    * balance; a second filter materializes the clean table).
    *
    * Determinism: the winner per key is an integer-ordered row_number
    * (ArgminRewrite turns it into a partial-agged argmax — compacting a 100 TB
    * feed never sorts a partition); the upserted balance is one IEEE
    * division of an exact integer (single-op, bit-identical on both
    * engines); unchanged balances pass the base doubles through
    * untouched (the q41 raw-cell rule).
    *
    * Scale: the merge is ONE outer join, base shuffled on its key
    * once — with a bucketed base table it is shuffle-free on that
    * side; the compacted change relation is orders smaller than the
    * feed (one row per touched key) and broadcastable when the batch
    * is small. This is exactly how a MERGE executes under Delta;
    * expressing it as a plain plan keeps Catalyst free to pick the
    * join strategy. Change keys are strided (×[[cdcKeyStride]]) so the
    * batch exercises update, insert, AND delete against the base at
    * EVERY scale factor: the event key space is 10× narrower than the
    * customer key space in this data, so stride 11 keeps ~90 % of
    * changes on existing keys and pushes the top ~10 % past the base
    * maximum (inserts), at sf0.001 and sf1 alike. */
  val cdcKeyStride = 11L

  def q53CdcApply(s: SparkSession, dir: String): DataFrame =
    q53CdcApplyDf(t(s, dir, "events"), t(s, dir, "customer"))

  def q53CdcApplyDf(events: DataFrame, customer: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val latest = events
      .select((col("user_id") * cdcKeyStride).as("key"),
        col("event_id"), col("ts"), col("event_type"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("key"),
        when(col("event_type") === "click", "delete")
          .otherwise("upsert").as("op"),
        (expr("event_id % 100000L").cast("double") / 100).as("new_bal"))
    val base = customer
      .select(col("c_custkey").as("key"), col("c_acctbal"))
    base.join(latest, Seq("key"), "full_outer")
      .filter(!(col("c_acctbal").isNull && col("op") === "delete"))
      .select(col("key").as("custkey"),
        when(col("op").isNull, "unchanged")
          .when(col("op") === "delete", "deleted")
          .when(col("c_acctbal").isNull, "inserted")
          .otherwise("updated").as("change"),
        when(col("op").isNull, col("c_acctbal"))
          .when(col("op") === "delete", lit(null).cast("double"))
          .otherwise(col("new_bal")).as("bal"))
      .orderBy("custkey")
  }

  private val q53Sql =
    s"""WITH latest AS (
       |  SELECT key, op, new_bal FROM (
       |    SELECT user_id * $cdcKeyStride AS key,
       |      CASE WHEN event_type = 'click' THEN 'delete'
       |           ELSE 'upsert' END AS op,
       |      CAST(event_id % 100000 AS DOUBLE) / 100 AS new_bal,
       |      ROW_NUMBER() OVER (PARTITION BY user_id
       |        ORDER BY ts DESC, event_id DESC) AS rk
       |    FROM events) WHERE rk = 1),
       |base AS (SELECT c_custkey AS key, c_acctbal FROM customer)
       |SELECT key AS custkey,
       |  CASE WHEN op IS NULL THEN 'unchanged'
       |       WHEN op = 'delete' THEN 'deleted'
       |       WHEN c_acctbal IS NULL THEN 'inserted'
       |       ELSE 'updated' END AS change,
       |  CASE WHEN op IS NULL THEN c_acctbal
       |       WHEN op = 'delete' THEN NULL
       |       ELSE new_bal END AS bal
       |FROM base FULL OUTER JOIN latest USING (key)
       |WHERE NOT (c_acctbal IS NULL AND op = 'delete')
       |ORDER BY custkey""".stripMargin

  // ------------------------------------------------------------- q54
  /** Ordered event funnel — signup → view → purchase, each stage's
    * timestamp strictly after the previous stage's and within a
    * [[funnelWindowUs]] conversion window of it (the product-analytics
    * primitive next to q24's sessionize and q51's SCD2; an unwindowed
    * funnel is degenerate on any long-lived user base — everyone
    * eventually does everything). Per user: the FIRST signup, the
    * first qualifying view, the first qualifying purchase, and the
    * stage reached (1–3).
    *
    * Determinism: all stage choices are MIN over exact integer micros
    * (ties collapse in the MIN) and the window bound is an integer
    * add, so both engines pick identical stage times; stage is an
    * integer CASE. Spark-first shape: each stage is a user-keyed
    * conditional min — three partial-agged hash aggs and two id-keyed
    * joins, no window function, no ordering pass. All three aggs hash
    * on user_id, so they reuse ONE shuffle layout; at 100 TB the
    * stage relations are |users|-sized (orders smaller than the event
    * log) and the joins are slim. */
  val funnelWindowUs = 86400000000L // 24 h in micros

  def q54Funnel(s: SparkSession, dir: String): DataFrame =
    q54FunnelDf(t(s, dir, "events"))

  def q54FunnelDf(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"),
      col("event_type"), expr("ts div 1000").as("us"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val s2 = ev.join(s1, "user_id")
      .filter(col("event_type") === "view" && col("us") > col("t1") &&
        col("us") <= col("t1") + funnelWindowUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
    val s3 = ev.join(s2, "user_id")
      .filter(col("event_type") === "purchase" && col("us") > col("t2") &&
        col("us") <= col("t2") + funnelWindowUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .otherwise(1L).as("stage"),
        col("t1").as("signup_us"), col("t2").as("view_us"),
        col("t3").as("purchase_us"))
      .orderBy("user_id")
  }

  private val q54Sql =
    s"""WITH ev AS (
      |  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us
      |  FROM events),
      |s1 AS (
      |  SELECT user_id, MIN(us) AS t1 FROM ev
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.us) AS t2
      |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'view' AND e.us > s1.t1
      |    AND e.us <= s1.t1 + $funnelWindowUs
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.us) AS t3
      |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.us > s2.t2
      |    AND e.us <= s2.t2 + $funnelWindowUs
      |  GROUP BY e.user_id)
      |SELECT s1.user_id,
      |  CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
      |       WHEN s2.t2 IS NOT NULL THEN 2
      |       ELSE 1 END AS BIGINT) AS stage,
      |  s1.t1 AS signup_us, s2.t2 AS view_us, s3.t3 AS purchase_us
      |FROM s1
      |LEFT JOIN s2 ON s1.user_id = s2.user_id
      |LEFT JOIN s3 ON s1.user_id = s3.user_id
      |ORDER BY s1.user_id""".stripMargin

  // ------------------------------------------------------------- q55
  /** Incremental materialized-view maintenance — the aggregate-state
    * merge that keeps a 100 TB rollup fresh without rescanning it:
    * the per-customer order summary is held as MERGEABLE state
    * (count, DECIMAL sum, min/max date), a delta batch is aggregated
    * to the same state shape, and refresh = ONE full-outer join
    * combining states field-wise. Here the base is pre-cutoff orders
    * and the delta is everything after [[mvCutoff]].
    *
    * The ORACLE is the view definition itself — a direct aggregate
    * over the full table — so a pass is the algebraic proof that
    * merge(state(base), state(delta)) == state(base ∪ delta),
    * cell-exact: counts add, DECIMAL sums add exactly (no float
    * accumulation), min/max combine by explicit CASE (spelled
    * identically in both engines; least/greatest null handling is NOT
    * relied on), and the derived avg is integer cents division off
    * the merged state.
    *
    * Scale: the delta agg shuffles only the batch; the merge join is
    * |state|-sized and shuffle-free on the base side when the stored
    * state is bucketed by key (BucketingSpec); the fact history is
    * never re-read. Associativity of the state merge (spec-tested)
    * means refresh batches can be split or coalesced freely. */
  val mvCutoff = "1997-01-01"

  def q55MvMerge(s: SparkSession, dir: String): DataFrame =
    q55MvMergeDf(t(s, dir, "orders"))

  def q55MvMergeDf(orders: DataFrame): DataFrame =
    mvMergeStates(
      mvState(orders.filter(col("o_orderdate") < lit(mvCutoff))),
      mvState(orders.filter(col("o_orderdate") >= lit(mvCutoff))))

  /** The mergeable state shape for the q55 view (one row per key). */
  def mvState(part: DataFrame): DataFrame =
    part.groupBy(col("o_custkey"))
      // money is a raw DOUBLE in the data: cast to DECIMAL BEFORE the
      // sum (the q01 rule) — float sums are partition-order-dependent,
      // decimal sums are exact and engine-identical
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"),
        min(col("o_orderdate")).as("first_d"),
        max(col("o_orderdate")).as("last_d"))

  /** Field-wise state merge + output projection (refresh operator). */
  def mvMergeStates(base: DataFrame, delta: DataFrame): DataFrame = {
    val b = base.select(col("o_custkey"), col("n").as("n_b"),
      col("spend").as("sp_b"), col("first_d").as("f_b"),
      col("last_d").as("l_b"))
    val d = delta.select(col("o_custkey"), col("n").as("n_d"),
      col("spend").as("sp_d"), col("first_d").as("f_d"),
      col("last_d").as("l_d"))
    b.join(d, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
          .as("n_orders"),
        // money leaves the operator as BIGINT cents, never DECIMAL:
        // decimal stays internal to the exact state sum (q48 rule —
        // every driver-green money column is cents or double; all
        // three decimal-output queries hash-failed r4+r5)
        expr("""CAST((coalesce(sp_b, 0) + coalesce(sp_d, 0)) * 100
                AS BIGINT)""").as("spend_cents"),
        expr("""CASE WHEN f_b IS NULL THEN f_d
                     WHEN f_d IS NULL THEN f_b
                     WHEN f_b < f_d THEN f_b ELSE f_d END""")
          .as("first_order"),
        expr("""CASE WHEN l_b IS NULL THEN l_d
                     WHEN l_d IS NULL THEN l_b
                     WHEN l_b > l_d THEN l_b ELSE l_d END""")
          .as("last_order"))
      .withColumn("avg_cents", expr("spend_cents div n_orders"))
      .orderBy("o_custkey")
  }

  /** The view DEFINITION (direct recompute) — merge must equal this. */
  private val q55Sql =
    """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |    AS spend_cents,
      |  MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |    // COUNT(*) AS avg_cents
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ------------------------------------------------------------- q56
  /** Compaction planner — the OPTIMIZE/bin-packing primitive of table
    * maintenance: given a file manifest (here one "file" per
    * return-flag × ship-month of lineitem, with a deterministic
    * integer size proxy),
    * greedily pack files IN FILE-ID ORDER within each table partition
    * into output bins targeting [[compactTargetBytes]], then emit the
    * per-bin merge plan. The guarantee is on CUMULATIVE mass, not per
    * bin: through every non-final bin k the packed bytes are
    * ≥ (k+1)·target — an oversized file straddling boundaries can
    * leave its successor bin small or skip bin ids entirely (such a
    * file is already ≥ target and needs no compaction). Greedy
    * sequential packing is exactly an
    * EXCLUSIVE prefix sum div target — one window per partition key,
    * so planning 10M files across 10k partitions is a single
    * range-partitioned sort with no driver-side loop (the planner
    * itself must scale, not just the rewrite it plans).
    *
    * All sizes are exact BIGINTs; bin assignment is integer division
    * of the exclusive running sum, so both engines cut bins
    * identically. The per-bin rollup (file span, bytes, rows) is what
    * a compactor would hand each rewrite task. */
  val compactTargetBytes = 400000L

  def q56CompactionPlan(s: SparkSession, dir: String): DataFrame =
    q56CompactionPlanDf(t(s, dir, "lineitem"))

  def q56CompactionPlanDf(lineitem: DataFrame): DataFrame =
    compactionBins(
      lineitem
        .groupBy(col("l_returnflag").as("part"),
          expr("CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)")
            .as("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          expr("CAST(SUM(l_quantity) * 37 AS BIGINT) + COUNT(*) * 100")
            .as("bytes")),
      compactTargetBytes)

  /** The planning operator itself: greedy sequential bin-packing of a
    * (part, file_id, n_rows, bytes) manifest — reusable against any
    * real file listing. Invariants (PropertySpec): bin mass is
    * conserved, and cumulative packed bytes through every non-final
    * bin k are ≥ (k+1)·target. */
  def compactionBins(files: DataFrame, target: Long): DataFrame = {
    val w = Window.partitionBy(col("part")).orderBy(col("file_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum div ${target}L"))
      .groupBy(col("part"), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        min(col("file_id")).as("first_file"),
        max(col("file_id")).as("last_file"),
        sum(col("bytes")).as("bin_bytes"),
        sum(col("n_rows")).as("bin_rows"))
      .orderBy("part", "bin")
  }

  private val q56Sql =
    s"""WITH files AS (
       |  SELECT l_returnflag AS part,
       |    CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
       |      AS file_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(l_quantity) * 37 AS BIGINT) + COUNT(*) * 100 AS bytes
       |  FROM lineitem GROUP BY 1, 2),
       |binned AS (
       |  SELECT part, file_id, n_rows, bytes,
       |    COALESCE(SUM(bytes) OVER (PARTITION BY part ORDER BY file_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      // $compactTargetBytes AS bin
       |  FROM files)
       |SELECT part, CAST(bin AS BIGINT) AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n_files,
       |  MIN(file_id) AS first_file, MAX(file_id) AS last_file,
       |  CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
       |  CAST(SUM(n_rows) AS BIGINT) AS bin_rows
       |FROM binned GROUP BY 1, 2 ORDER BY part, bin""".stripMargin

  // ------------------------------------------------------------- q57
  /** Order-invariant table fingerprints — the migration-validation
    * primitive MIGRATION.md implies: after moving a table between
    * systems, compare (row count, XOR of canonical row hashes)
    * instead of row-by-row diffs. XOR aggregation is commutative,
    * associative and overflow-free, so the signature is independent
    * of partitioning, sort order, and engine — and combining it with
    * the count detects both corruption and duplication/loss (XOR
    * alone cancels even multiplicities). Canonical row rendering
    * sticks to BIGINT and VARCHAR columns (float/timestamp → string
    * rendering is NOT engine-stable; hash those via fixed-point ints
    * if needed).
    *
    * Scale: one map-side md5 + a single-row partial XOR/count agg per
    * table — the cheapest possible full-scan audit, and the partial
    * states are 16 bytes per task. */
  def q57TableFingerprint(s: SparkSession, dir: String): DataFrame = {
    def fp(name: String, df: DataFrame, keyExpr: String): DataFrame =
      df.select(expr(keyExpr).as("canon"))
        .select(expr(
          "CAST(conv(substring(md5(canon), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_sig"))
        .select(lit(name).as("tbl"), col("n_rows"), col("xor_sig"))
    fp("customer", t(s, dir, "customer"),
        "concat_ws('|', c_custkey, c_nationkey, c_name)")
      .unionByName(fp("lineitem", t(s, dir, "lineitem"),
        """concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber,
           l_returnflag, l_linestatus)"""))
      .unionByName(fp("orders", t(s, dir, "orders"),
        "concat_ws('|', o_orderkey, o_custkey, o_orderstatus)"))
      .unionByName(fp("supplier", t(s, dir, "supplier"),
        "concat_ws('|', s_suppkey, s_nationkey, s_name)"))
      .orderBy("tbl")
  }

  private val q57Sql = {
    def one(name: String, tbl: String, canon: String) =
      s"""SELECT '$name' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(bit_xor(CAST(${hex15ToBigint("hx")} AS BIGINT)) AS BIGINT)
         |    AS xor_sig
         |FROM (SELECT md5($canon) AS hx FROM $tbl)""".stripMargin
    Seq(
      one("customer", "customer",
        "concat_ws('|', c_custkey, c_nationkey, c_name)"),
      one("lineitem", "lineitem",
        "concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber, " +
          "l_returnflag, l_linestatus)"),
      one("orders", "orders",
        "concat_ws('|', o_orderkey, o_custkey, o_orderstatus)"),
      one("supplier", "supplier",
        "concat_ws('|', s_suppkey, s_nationkey, s_name)"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY tbl")
  }

  // ------------------------------------------------------------- q58
  /** Point-in-time (AS OF) join against the q51 SCD2 dimension — the
    * op that makes a history table useful: for every purchase event,
    * the state version in force immediately BEFORE it (probe time =
    * ts − 1 µs; 'none' when the purchase is the user's first
    * activity). The warehouse pattern behind "what plan was the
    * customer on when they bought".
    *
    * Spark-first shape: NOT an inequality join (which would shuffle
    * |probes|×|versions| candidate pairs) but the q22 as-of
    * decomposition — union version STARTS with probes, one
    * user-partitioned sort, `last(ignoreNulls)` running window picks
    * the latest start ≤ each probe. Versions are contiguous
    * half-open intervals, so latest-start-≤ IS the interval match;
    * empty intervals (equal-timestamp runs) are skipped by the sort
    * tiebreak (starts before probes, version ascending). Every
    * shuffle in the q51 chain and this pass keys on user_id — one
    * layout end to end. The ORACLE uses the direct interval-predicate
    * LEFT JOIN instead, so the decomposition is checked against the
    * definition, not against itself. */
  def q58PitJoin(s: SparkSession, dir: String): DataFrame =
    q58PitJoinDf(t(s, dir, "events"))

  def q58PitJoinDf(ev: DataFrame): DataFrame = {
    val starts = scd2IntervalsCore(ev)
      .select(col("user_id"), col("valid_from_us").as("ep"),
        col("version"), col("state"), col("n_events"),
        lit(0).as("is_probe"), lit(null).cast("long").as("event_id"),
        lit(null).cast("long").as("purchase_us"))
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000 - 1").as("ep"),
        lit(null).cast("long").as("version"),
        lit(null).cast("string").as("state"),
        lit(null).cast("long").as("n_events"),
        lit(1).as("is_probe"), col("event_id"),
        expr("ts div 1000").as("purchase_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ep"), col("is_probe"), col("version"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.unionByName(probes)
      .withColumn("pv", last(col("version"), ignoreNulls = true).over(w))
      .withColumn("ps", last(col("state"), ignoreNulls = true).over(w))
      .withColumn("pn", last(col("n_events"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("user_id"), col("purchase_us"),
        coalesce(col("pv"), lit(0L)).as("prior_version"),
        coalesce(col("ps"), lit("none")).as("prior_state"),
        coalesce(col("pn"), lit(0L)).as("prior_n_events"))
      .orderBy("event_id")
  }

  /** Oracle: the interval predicate itself (valid_from ≤ p < valid_to,
    * open current) — deliberately NOT the as-of decomposition. */
  private val q58Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type AS state, epoch_us(ts) AS ep_us,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS prev_state
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN prev_state IS NULL OR prev_state <> state
      |    THEN 1 ELSE 0 END AS chg FROM e),
      |v AS (
      |  SELECT *, SUM(chg) OVER (PARTITION BY user_id
      |    ORDER BY ep_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
      |  FROM f),
      |runs AS (
      |  SELECT user_id, version, MAX(state) AS state,
      |    MIN(ep_us) AS valid_from_us,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM v GROUP BY user_id, version),
      |vers AS (
      |  SELECT user_id, version, state, valid_from_us,
      |    LEAD(valid_from_us, 1) OVER (PARTITION BY user_id
      |      ORDER BY version) AS valid_to_us, n_events
      |  FROM runs),
      |p AS (
      |  SELECT event_id, user_id, epoch_us(ts) - 1 AS p_us,
      |    CAST(epoch_us(ts) AS BIGINT) AS purchase_us
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.purchase_us,
      |  CAST(COALESCE(v.version, 0) AS BIGINT) AS prior_version,
      |  COALESCE(v.state, 'none') AS prior_state,
      |  CAST(COALESCE(v.n_events, 0) AS BIGINT) AS prior_n_events
      |FROM p LEFT JOIN vers v ON p.user_id = v.user_id
      |  AND v.valid_from_us <= p.p_us
      |  AND (v.valid_to_us IS NULL OR p.p_us < v.valid_to_us)
      |ORDER BY p.event_id""".stripMargin

  // ------------------------------------------------------------- q59
  /** Ratio-to-report — percent-of-total at two hierarchy levels
    * WITHOUT collapsing the detail (the reporting op next to q12's
    * rollup, Oracle/Teradata `RATIO_TO_REPORT`): per supplier nation,
    * its revenue share within its region and of the grand total.
    *
    * Shape: the q40-style dim chain (supplier→nation→region all
    * broadcast) into ONE fact agg at the finest grain, then the
    * shares are window sums over the TINY (|nations|-row) aggregate —
    * never a second fact pass, never a self-join. Money follows the
    * q01 rule (DECIMAL before sum); shares are integer ppm over exact
    * cents, with the ppm numerator widened to DECIMAL/HUGEINT before
    * the ×10⁶ (a BIGINT numerator wraps silently once a group holds
    * ~9.2·10¹² cents ≈ 9.2·10¹⁰ dollars — reachable at warehouse
    * scale; Spark non-ANSI wraps where DuckDB widens, so the twins
    * would also diverge). */
  def q59RatioToReport(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
        .as("revenue"))
      .withColumn("cents", expr("CAST(revenue * 100 AS BIGINT)"))
    val byRegion = Window.partitionBy(col("r_name"))
    val all = Window.partitionBy()
    rev
      .withColumn("region_cents", sum(col("cents")).over(byRegion))
      .withColumn("total_cents", sum(col("cents")).over(all))
      .select(col("r_name"), col("n_name"),
        // money leaves as exact BIGINT cents (q48 rule): the decimal
        // sum stays internal; every decimal OUTPUT column hash-failed
        // at the driver across r4+r5 regardless of precision/encoding
        col("cents").as("revenue_cents"),
        expr("CAST(cents AS DECIMAL(38,0)) * 1000000 div region_cents")
          .as("region_share_ppm"),
        expr("CAST(cents AS DECIMAL(38,0)) * 1000000 div total_cents")
          .as("total_share_ppm"))
      .orderBy("r_name", "n_name")
  }

  private val q59Sql =
    """WITH rev AS (
      |  SELECT r_name, n_name,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |c AS (SELECT *, CAST(revenue * 100 AS BIGINT) AS cents FROM rev)
      |SELECT r_name, n_name, cents AS revenue_cents,
      |  CAST(CAST(cents AS HUGEINT) * 1000000
      |    // SUM(cents) OVER (PARTITION BY r_name)
      |    AS BIGINT) AS region_share_ppm,
      |  CAST(CAST(cents AS HUGEINT) * 1000000 // SUM(cents) OVER ()
      |    AS BIGINT) AS total_share_ppm
      |FROM c ORDER BY r_name, n_name""".stripMargin

  /** DuckDB spelling of conv(substring(hex, 1, 15), 16, 10). */
  private def hex15ToBigint(hexExpr: String): String =
    OracleDsl.hornerHex(hexExpr, 15)

  // ---------------------------------------------------------------- q60
  /** Interval union (sweep line) — total COVERED time under
    * overlapping intervals, the measure q24's gap sessions can't give
    * (sessions partition events by gaps; activity windows OVERLAP and
    * double-counting their durations is the classic billing/uptime
    * bug). Each event opens a deterministic activity window
    * [ts, ts + (event_id mod 7 + 1) minutes); per user, overlapping
    * windows merge into islands via the textbook sweep: an interval
    * starts a new island iff its start exceeds the running max end of
    * every EARLIER interval (rows-frame max over the start-ordered
    * window, exclusive of the current row — adjacent touching
    * intervals merge). All arithmetic is exact integer micros.
    *
    * Scale: one user-partitioned sort carries both window passes and
    * the island aggregate (the q51 single-shuffle discipline — AQE
    * plans one user_id exchange); islands are then user-sized
    * aggregates. No self-join — the naive overlap-pairs formulation
    * is O(n²) per user and unshippable at 100 TB. */
  def q60IntervalUnion(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("start_us"), col("end_us"), col("event_id"))
    val before = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("start_us"))
      .withColumn("end_us",
        col("start_us") + (col("event_id") % 7 + 1) * 60000000L)
      .withColumn("prev_max_end", max(col("end_us")).over(before))
      .withColumn("new_island",
        when(col("prev_max_end").isNull ||
          col("start_us") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(cum))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("end_us")) - min(col("start_us"))).as("covered_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("n_events")).as("n_events"),
        sum(col("covered_us")).as("covered_us"),
        max(col("covered_us")).as("longest_island_us"))
      .orderBy("user_id")
  }

  private val q60Sql =
    """WITH iv AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS start_us,
      |    epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS end_us
      |  FROM events),
      |m AS (
      |  SELECT *, MAX(end_us) OVER (PARTITION BY user_id
      |      ORDER BY start_us, end_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |    AS prev_max_end
      |  FROM iv),
      |f AS (
      |  SELECT *, CASE WHEN prev_max_end IS NULL
      |      OR start_us > prev_max_end THEN 1 ELSE 0 END AS new_island
      |  FROM m),
      |g AS (
      |  SELECT *, SUM(new_island) OVER (PARTITION BY user_id
      |      ORDER BY start_us, end_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM f),
      |isl AS (
      |  SELECT user_id, island, COUNT(*) AS n_events,
      |    MAX(end_us) - MIN(start_us) AS covered_us
      |  FROM g GROUP BY 1, 2)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
      |  CAST(SUM(n_events) AS BIGINT) AS n_events,
      |  CAST(SUM(covered_us) AS BIGINT) AS covered_us,
      |  CAST(MAX(covered_us) AS BIGINT) AS longest_island_us
      |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin


  // ---------------------------------------------------------------- q61
  /** Skyline / Pareto frontier — the preference-query operator class
    * (Börzsönyi et al.'s SKYLINE OF): per nation, the 1997 orders not
    * STRICTLY dominated on (totalprice, orderdate) — no other same-
    * nation order has BOTH a higher price and a later date. The
    * operator behind "best tradeoff" shortlists (price × recency,
    * quality × cost) that a plain ORDER BY cannot express.
    *
    * Shape: sort-based skyline — within each nation, descending by
    * exact integer cents, a RANGE frame ending 1 cent before the
    * current row sees exactly the strictly-higher-priced orders; a
    * row survives iff their max date does not exceed its own. One
    * partitioned sort, no self-join (the textbook NOT EXISTS
    * formulation is O(n²) per partition — the ORACLE deliberately
    * uses it, so the window algebra is checked against the naive
    * definition rather than a mirror of itself). All comparisons are
    * exact integers (cents, epoch days). */
  def q61Skyline(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1997-01-01") &&
        col("o_orderdate") < ts("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"),
        expr("unix_date(CAST(o_orderdate AS DATE))").as("day"))
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("cents").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .withColumn("max_day_higher", max(col("day")).over(w))
      .filter(col("max_day_higher").isNull ||
        col("max_day_higher") <= col("day"))
      .select(col("n_name"), col("o_orderkey"), col("cents"),
        col("day").cast("long").as("day"))
      .orderBy(col("n_name"), col("cents").desc, col("o_orderkey"))
  }

  private val q61Sql =
    """WITH o AS (
      |  SELECT o_orderkey, n_name,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents,
      |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01')
      |SELECT n_name, o_orderkey, cents, CAST(day AS BIGINT) AS day
      |FROM o
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM o o2
      |  WHERE o2.n_name = o.n_name
      |    AND o2.cents > o.cents AND o2.day > o.day)
      |ORDER BY n_name, cents DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Event-sequence pattern matching (the MATCH_RECOGNIZE / CEP
    * class): each user's event history becomes an ordered letter
    * string (first letter of the event type under the (ts, event_id)
    * total order) and regular expressions count behavioral motifs —
    * view-runs ending in purchase, signup→clicks→purchase quick
    * conversions, the longest error burst. Regex over a per-key
    * ordered encoding IS how sequence mining ships on engines without
    * a CEP operator, and the motif counts are exact integers.
    *
    * Scale: one user-keyed sort-agg (the q37 string_agg discipline);
    * the per-user sequence must fit in memory — the documented
    * contract of every sequence encoder; a production run windows the
    * history first (q24's sessions) exactly like this op composed
    * over session_id. */
  def q62EventRegex(s: SparkSession, dir: String): DataFrame =
    q62EventRegexDf(t(s, dir, "events"))

  /** @param events the [[graft.Tables.t]]-normalized relation (ts =
    *               BIGINT epoch-nanos). */
  def q62EventRegexDf(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ep_us"),
        expr("substring(event_type, 1, 1)").as("ch"))
      .groupBy(col("user_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ep_us"), col("event_id"),
          col("ch")))), x => x.getField("ch")), "").as("seq"))
      .select(col("user_id"),
        length(col("seq")).cast("long").as("seq_len"),
        size(regexp_extract_all(col("seq"), lit("v+p"), lit(0)))
          .cast("long").as("n_view_purchase"),
        size(regexp_extract_all(col("seq"), lit("sc*p"), lit(0)))
          .cast("long").as("n_quick_convert"),
        coalesce(array_max(transform(
          regexp_extract_all(col("seq"), lit("e+"), lit(0)),
          x => length(x))), lit(0)).cast("long").as("longest_error_run"))
      .orderBy("user_id")

  private val q62Sql =
    """WITH sq AS (
      |  SELECT user_id,
      |    string_agg(substring(event_type, 1, 1), ''
      |      ORDER BY epoch_us(ts), event_id) AS seq
      |  FROM events GROUP BY user_id)
      |SELECT user_id, CAST(len(seq) AS BIGINT) AS seq_len,
      |  CAST(len(regexp_extract_all(seq, 'v+p')) AS BIGINT)
      |    AS n_view_purchase,
      |  CAST(len(regexp_extract_all(seq, 'sc*p')) AS BIGINT)
      |    AS n_quick_convert,
      |  CAST(COALESCE(list_max(list_transform(
      |    regexp_extract_all(seq, 'e+'), x -> len(x))), 0) AS BIGINT)
      |    AS longest_error_run
      |FROM sq ORDER BY user_id""".stripMargin


  // ---------------------------------------------------------------- q63
  /** percentile_cont — the INTERPOLATED quantile (SQL standard's other
    * percentile; q47 ships percentile_disc): per order status, the
    * p25/p50/p75 of the price distribution with linear interpolation
    * between the two straddling order statistics.
    *
    * The interpolation is EXACT integer arithmetic, not float: at
    * quartile k over n rows the continuous position is
    * 1 + (n−1)·k/4, whose fractional part is always a quarter —
    * so the result is emitted in QUARTER-CENTS,
    * `lo·(4−rem) + hi·rem` with `rem = ((n−1)·k) mod 4`. No float
    * multiply exists anywhere, so the cell is bit-identical on any
    * engine (a naive `percentile_cont` call would interpolate in
    * doubles with engine-specific rounding — exactly the class the
    * s05 lesson bans).
    *
    * Shape: one status-partitioned rank window + a broadcast n join +
    * one conditional agg picking the 6 straddling statistics — the
    * q47 cost class. */
  def q63PercentileCont(s: SparkSession, dir: String): DataFrame = {
    val wq = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("cents"), col("o_orderkey"))
    val ranked = t(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .withColumn("rn", row_number().over(wq).cast("long"))
    val n = ranked.groupBy(col("o_orderstatus"))
      .agg(max(col("rn")).as("n"))
    val marked = ranked.join(broadcast(n), "o_orderstatus")
      .withColumn("i1", expr("1L + ((n - 1) * 1) div 4"))
      .withColumn("r1", expr("((n - 1) * 1) % 4"))
      .withColumn("i2", expr("1L + ((n - 1) * 2) div 4"))
      .withColumn("r2", expr("((n - 1) * 2) % 4"))
      .withColumn("i3", expr("1L + ((n - 1) * 3) div 4"))
      .withColumn("r3", expr("((n - 1) * 3) % 4"))
    marked.groupBy(col("o_orderstatus"))
      .agg(max(col("n")).as("n_orders"),
        max(when(col("rn") === col("i1"), col("cents"))).as("lo1"),
        max(when(col("rn") === col("i1") + 1, col("cents"))).as("hi1"),
        max(col("r1")).as("f1"),
        max(when(col("rn") === col("i2"), col("cents"))).as("lo2"),
        max(when(col("rn") === col("i2") + 1, col("cents"))).as("hi2"),
        max(col("r2")).as("f2"),
        max(when(col("rn") === col("i3"), col("cents"))).as("lo3"),
        max(when(col("rn") === col("i3") + 1, col("cents"))).as("hi3"),
        max(col("r3")).as("f3"))
      .select(col("o_orderstatus"), col("n_orders"),
        expr("lo1 * (4 - f1) + COALESCE(hi1, lo1) * f1").as("p25_qc"),
        expr("lo2 * (4 - f2) + COALESCE(hi2, lo2) * f2").as("p50_qc"),
        expr("lo3 * (4 - f3) + COALESCE(hi3, lo3) * f3").as("p75_qc"))
      .orderBy("o_orderstatus")
  }

  private val q63Sql =
    """WITH rankd AS (
      |  SELECT o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |        AS BIGINT), o_orderkey) AS BIGINT) AS rn
      |  FROM orders),
      |nn AS (SELECT o_orderstatus, MAX(rn) AS n FROM rankd GROUP BY 1),
      |mk AS (
      |  SELECT r.o_orderstatus, r.cents, r.rn, nn.n,
      |    1 + ((nn.n - 1) * 1) // 4 AS i1, ((nn.n - 1) * 1) % 4 AS r1,
      |    1 + ((nn.n - 1) * 2) // 4 AS i2, ((nn.n - 1) * 2) % 4 AS r2,
      |    1 + ((nn.n - 1) * 3) // 4 AS i3, ((nn.n - 1) * 3) % 4 AS r3
      |  FROM rankd r JOIN nn ON r.o_orderstatus = nn.o_orderstatus),
      |ag AS (
      |  SELECT o_orderstatus, MAX(n) AS n_orders,
      |    MAX(CASE WHEN rn = i1 THEN cents END) AS lo1,
      |    MAX(CASE WHEN rn = i1 + 1 THEN cents END) AS hi1, MAX(r1) AS f1,
      |    MAX(CASE WHEN rn = i2 THEN cents END) AS lo2,
      |    MAX(CASE WHEN rn = i2 + 1 THEN cents END) AS hi2, MAX(r2) AS f2,
      |    MAX(CASE WHEN rn = i3 THEN cents END) AS lo3,
      |    MAX(CASE WHEN rn = i3 + 1 THEN cents END) AS hi3, MAX(r3) AS f3
      |  FROM mk GROUP BY 1)
      |SELECT o_orderstatus, CAST(n_orders AS BIGINT) AS n_orders,
      |  CAST(lo1 * (4 - f1) + COALESCE(hi1, lo1) * f1 AS BIGINT) AS p25_qc,
      |  CAST(lo2 * (4 - f2) + COALESCE(hi2, lo2) * f2 AS BIGINT) AS p50_qc,
      |  CAST(lo3 * (4 - f3) + COALESCE(hi3, lo3) * f3 AS BIGINT) AS p75_qc
      |FROM ag ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Exponentially weighted moving average — the time-series smoother
    * (monitoring dashboards, anomaly baselines) q09's running sum and
    * q36's range frame cannot express: recent events count more. A
    * float EWMA is order- AND engine-dependent (α·x + (1−α)·prev
    * accumulates rounding), so this is the TRUNCATED-kernel form every
    * production scorer actually ships: α = 1/2 over the last
    * [[q64Lags]] events, all weights powers of two, all arithmetic
    * exact integer cents — num = Σⱼ centsₜ₋ⱼ·2^(7−j), den = the CASE
    * table of partial-window weight sums (256 − 2^(8−m)), ewma = num
    * div den. Bit-identical on any engine and any partitioning.
    *
    * Shape: the lag chain and the latest-row pick ride ONE
    * user-partitioned sort (same window order), so the whole query is
    * a single user_id exchange + one broadcast-free projection — at
    * 100 TB the state per row is 8 lags of 8 bytes, never a buffer. */
  val q64Lags = 8
  def q64Ewma(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val num = (1 until q64Lags).foldLeft(
      col("cents") * lit(1L << (q64Lags - 1))) { (acc, j) =>
      acc + coalesce(lag(col("cents"), j).over(byUser), lit(0L)) *
        lit(1L << (q64Lags - 1 - j))
    }
    val denCases = (1 to q64Lags).map { m =>
      s"WHEN $m THEN ${(1L << q64Lags) - (1L << (q64Lags - m))}"
    }.mkString(" ")
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .withColumn("rn", row_number().over(byUser).cast("long"))
      .withColumn("num", num)
      .withColumn("den",
        expr(s"CASE least(rn, $q64Lags) $denCases END"))
      .withColumn("ewma_c", expr("num div den"))
      .withColumn("last_rn",
        max(col("rn")).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === col("last_rn"))
      .select(col("user_id"), col("rn").as("n_events"),
        col("cents").as("last_cents"), col("ewma_c"))
      .orderBy("user_id")
  }

  private val q64Sql = {
    val lagTerms = (1 until q64Lags).map { j =>
      s"COALESCE(LAG(cents, $j) OVER w, 0) * ${1L << (q64Lags - 1 - j)}"
    }.mkString(" + ")
    val denCases = (1 to q64Lags).map { m =>
      s"WHEN $m THEN ${(1L << q64Lags) - (1L << (q64Lags - m))}"
    }.mkString(" ")
    s"""WITH ev AS (
       |  SELECT event_id, user_id, ts,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |lagd AS (
       |  SELECT user_id, cents,
       |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       |    cents * ${1L << (q64Lags - 1)} + $lagTerms AS num
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |scored AS (
       |  SELECT *,
       |    num // (CASE LEAST(rn, $q64Lags) $denCases END) AS ewma_c,
       |    MAX(rn) OVER (PARTITION BY user_id) AS last_rn
       |  FROM lagd)
       |SELECT user_id, rn AS n_events, cents AS last_cents,
       |  CAST(ewma_c AS BIGINT) AS ewma_c
       |FROM scored WHERE rn = last_rn ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- q65
  /** Per-group OLS regression — the `regr_slope`/`regr_r2` family, done
    * exactly: price-vs-quantity fit per part brand. Engine `regr_*`
    * aggregates accumulate FLOATS in partition order (the s05 failure
    * class), so the moments here are exact integer sums — n, Σx, Σy,
    * Σxy as BIGINT; Σx², Σy² as DECIMAL(38,0) (y is cents ~1e7, so y²
    * ~1e14 overflows a BIGINT sum past ~9·10⁴ rows per group — the sf1
    * trap) — and the closed forms are integer division on DECIMAL(38,0)
    * (the q59 HUGEINT-twin pattern): slope_ppm = (nΣxy−ΣxΣy)·10⁶ div
    * (nΣxx−Σx²), intercept_c = (ΣyΣxx−ΣxΣxy) div (nΣxx−Σx²), and
    * r2_ppm = slope_ppm²·(nΣxx−Σx²) div ((nΣyy−Σy²)·10⁶) — r² from the
    * already-floored slope rather than cov²/(vx·vy) directly, because
    * cov² overflows 38 digits at sf0.1 while slope_ppm² keeps every
    * intermediate under ~10³⁴ to ~10⁸ rows per group (a DOUBLE r²
    * was tried first and failed the gate by one ulp: DuckDB's
    * HUGEINT→DOUBLE and Spark's Decimal→DOUBLE round >2⁵³ operands
    * differently — the conversion itself is the non-portable step, so
    * r² must stay integer). Degenerate groups (zero variance) emit
    * NULL on both sides rather than engine-specific div-by-zero
    * behavior.
    *
    * Shape: ONE partial+final hash agg over the fact scan (six moments
    * combine map-side), then scalar math on brand-sized rows. The part
    * join is key-shuffled, not broadcast — at 100 TB the part table is
    * fact-sized. */
  def q65Regression(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_partkey"),
      col("l_quantity").cast("long").as("x"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("y"))
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y").cast("decimal(38,0)")) * col("y")).as("syy"))
      .select(col("p_brand"), col("n"),
        expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy")
          .as("cov_n"),
        expr("CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx")
          .as("vx_n"),
        expr("CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy")
          .as("vy_n"),
        col("sx"), col("sy"), col("sxx"), col("sxy"))
      .select(col("p_brand"), col("n"), col("vx_n"), col("vy_n"),
        expr("CASE WHEN vx_n = 0 THEN NULL " +
          "ELSE cov_n * 1000000 div vx_n END").as("slope_ppm"),
        expr("CASE WHEN vx_n = 0 THEN NULL ELSE " +
          "(CAST(sy AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sxy) " +
          "div vx_n END").as("intercept_c"))
      .select(col("p_brand"), col("n"), col("slope_ppm"), col("intercept_c"),
        expr("CASE WHEN slope_ppm IS NULL OR vy_n = 0 THEN NULL ELSE " +
          "(CAST(slope_ppm AS DECIMAL(38,0)) * slope_ppm * vx_n) " +
          "div (vy_n * 1000000) END").as("r2_ppm"))
      .orderBy("p_brand")
  }

  private val q65Sql =
    """WITH m AS (
      |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(CAST(x * x AS HUGEINT)) AS HUGEINT) AS sxx,
      |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |  FROM (
      |    SELECT p_brand, CAST(l_quantity AS BIGINT) AS x,
      |      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      |    FROM lineitem JOIN part ON l_partkey = p_partkey)
      |  GROUP BY p_brand),
      |c AS (
      |  SELECT p_brand, n,
      |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cov_n,
      |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS vx_n,
      |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vy_n,
      |    sx, sy, sxx, sxy
      |  FROM m),
      |sl AS (
      |  SELECT p_brand, n, vx_n, vy_n,
      |    CASE WHEN vx_n = 0 THEN NULL
      |      ELSE cov_n * 1000000 // vx_n END AS slope_ppm,
      |    CASE WHEN vx_n = 0 THEN NULL ELSE
      |      (CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy) // vx_n
      |      END AS intercept_c
      |  FROM c)
      |SELECT p_brand, n, CAST(slope_ppm AS BIGINT) AS slope_ppm,
      |  CAST(intercept_c AS BIGINT) AS intercept_c,
      |  CAST(CASE WHEN slope_ppm IS NULL OR vy_n = 0 THEN NULL ELSE
      |    (CAST(slope_ppm AS HUGEINT) * slope_ppm * vx_n)
      |    // (vy_n * 1000000) END AS BIGINT) AS r2_ppm
      |FROM sl ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q66
  /** Gaps-and-islands streaks — consecutive-day activity runs per user
    * (retention "current streak / longest streak" analytics; the DAU
    * engagement primitive). q24 sessionizes by time GAPS inside a day;
    * this is the calendar-day dual: distinct active days collapse into
    * maximal consecutive runs via the textbook day − row_number()
    * grouping key. All arithmetic is exact epoch-day integers.
    *
    * Shape: events reduce to distinct (user, day) FIRST — one partial-
    * aggregating exchange shrinks the fact to ≤ users × days rows —
    * then the run detection is a window + two user-sized aggregates on
    * that reduced relation. At 100 TB the only fact-sized move is the
    * dedup shuffle, which partial-aggregates map-side. */
  def q66Streaks(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    t(s, dir, "events")
      .select(col("user_id"),
        // ts is exact integer nanos in Spark (nanosAsLong); one epoch
        // day = 86 400·10⁹ ns — the twin divides epoch_us by 86 400·10⁶
        expr("ts div 86400000000000").as("day"))
      .distinct()
      .withColumn("grp",
        col("day") - row_number().over(byUser).cast("long"))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), max(col("day")).as("end_day"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_days"),
        sum(col("len")).as("active_days"),
        max(col("end_day")).as("last_day"))
      .orderBy("user_id")
  }

  private val q66Sql =
    """WITH d AS (
      |  SELECT DISTINCT user_id,
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      |  FROM events),
      |g AS (
      |  SELECT user_id, day,
      |    day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY day) AS BIGINT) AS grp
      |  FROM d),
      |isl AS (
      |  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len,
      |    MAX(day) AS end_day
      |  FROM g GROUP BY 1, 2)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_streaks,
      |  CAST(MAX(len) AS BIGINT) AS longest_days,
      |  CAST(SUM(len) AS BIGINT) AS active_days,
      |  CAST(MAX(end_day) AS BIGINT) AS last_day
      |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q67
  /** First-order Markov transition matrix over per-user event streams —
    * the behavioral-model primitive (next-action prediction features,
    * funnel leak analysis) that q54's fixed funnel cannot express: ALL
    * type→type transition probabilities at once. Probabilities are
    * exact integer ppm (`n·10⁶ div row_total`), so no float ever
    * touches the output.
    *
    * Shape: ONE user-partitioned sort produces every adjacent pair via
    * `lag` (no self-join of the fact against itself shifted — the
    * classic quadratic trap), then the transition counts hash-aggregate
    * partial/final down to |types|² rows; the per-prev totals are a
    * window over that tiny matrix, never over events. At 100 TB the
    * only fact-sized move is the one user_id exchange. */
  def q67Markov(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("n * 1000000 div row_total").as("ppm"))
      .orderBy("prev_type", "next_type")
  }

  private val q67Sql =
    """WITH seq AS (
      |  SELECT event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |m AS (
      |  SELECT prev_type, event_type AS next_type,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev_type)
      |    AS BIGINT) AS ppm
      |FROM m ORDER BY prev_type, next_type""".stripMargin

  // ---------------------------------------------------------------- q68
  /** Exact k-sigma outlier profile per event type — the data-quality
    * screen (fraud/telemetry anomaly counts) done WITHOUT a float
    * z-score: `|x − μ| > k·σ` is decided by the cross-multiplied
    * integer test `(n·x − Σ)² > k²·(n·Σx² − Σ²)` (both sides exact —
    * multiply the float inequality through by n²), so the discrete
    * choice never touches a sqrt or a division, per the gate's
    * no-float-choice rule. Squares overflow BIGINT past ~10⁵ rows per
    * group (n·x ~ 2·10¹⁰ at sf1), so both engines compute them in
    * 38-digit integer arithmetic (DECIMAL(38,0) / HUGEINT — the q65
    * moment pattern), good to ~10¹⁴ rows per group at observed cents.
    *
    * Shape: the standard exact two-pass profile — one partial/final
    * hash agg for the moments (|types| rows), broadcast back into a
    * second fact scan for the flag-and-count. Both passes combine
    * map-side; nothing wider than (type, cents) ever shuffles. */
  val q68K = 3
  def q68Outliers(s: SparkSession, dir: String): DataFrame = {
    val cents = expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
    val ev = t(s, dir, "events")
      .select(col("event_type"), cents.as("cents"))
    val moments = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum((col("cents").cast("decimal(38,0)")) * col("cents")).as("ss"))
    ev.join(broadcast(moments), "event_type")
      .withColumn("dev_n",
        expr("CAST(n AS DECIMAL(38,0)) * cents - CAST(s AS DECIMAL(38,0))"))
      .withColumn("is_out",
        expr(s"CASE WHEN dev_n * dev_n > ${q68K * q68K} * " +
          "(CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s) " +
          "THEN 1 ELSE 0 END"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), sum(col("is_out")).as("n_outliers"))
      .select(col("event_type"), col("n"),
        col("n_outliers").cast("long").as("n_outliers"),
        expr("CAST(n_outliers * 1000000 div n AS BIGINT)").as("outlier_ppm"))
      .orderBy("event_type")
  }

  private val q68Sql =
    s"""WITH ev AS (
       |  SELECT event_type,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(cents) AS BIGINT) AS s,
       |    CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
       |  FROM ev GROUP BY 1),
       |f AS (
       |  SELECT ev.event_type, m.n,
       |    CASE WHEN (CAST(m.n AS HUGEINT) * ev.cents - m.s)
       |           * (CAST(m.n AS HUGEINT) * ev.cents - m.s)
       |         > ${q68K * q68K} * (CAST(m.n AS HUGEINT) * m.ss
       |           - CAST(m.s AS HUGEINT) * m.s)
       |      THEN 1 ELSE 0 END AS is_out
       |  FROM ev JOIN m ON ev.event_type = m.event_type)
       |SELECT event_type, MAX(n) AS n,
       |  CAST(SUM(is_out) AS BIGINT) AS n_outliers,
       |  CAST(SUM(is_out) * 1000000 // MAX(n) AS BIGINT) AS outlier_ppm
       |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q69
  /** Exact chi-square contingency audit: is order priority independent
    * of customer market segment? The categorical-bias screen a
    * training-data pipeline runs over source × language or source ×
    * quality-bucket cells, on the dims at hand. Per cell it emits the
    * observed count, the expected count under independence in
    * milli-units (`⌊r·c·1000/n⌋`), and the cell's chi-square
    * contribution in ppm via the cross-multiplied exact form
    * `⌊(O·n − r·c)²·10⁶ / (n·r·c)⌋` — multiply `(O−E)²/E` through by
    * n², so no float division or rounding ever decides or renders
    * (the q68 discipline). 38-digit arithmetic holds `(O·n−r·c)²·10⁶ ≤
    * n⁴·10⁶` exactly to n ≈ 10⁸ fact rows; past that, compute the
    * statistic over the (tiny) cell relation with the q01 exact-int →
    * DOUBLE pattern — the heavy pass below is unaffected.
    *
    * Shape: ONE fact-scan hash agg to the |seg|×|prio| cell relation
    * (partial map-side combine; the customer dim join is broadcast);
    * margins and the grand total are re-aggregated from the 25-row
    * cell relation, never from a second fact pass, and join back cell-
    * side. Nothing after the first agg is larger than |cells|. */
  def q69ChiSquare(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("obs"))
      .persist()                 // margins re-read the 25-row cells,
                                 // never the fact table
    val rowT = cells.groupBy(col("seg").as("rs"))
      .agg(sum(col("obs")).as("rt"))
    val colT = cells.groupBy(col("prio").as("cp"))
      .agg(sum(col("obs")).as("ct"))
    val tot = cells.agg(sum(col("obs")).as("n"))
    cells
      .join(broadcast(rowT), col("seg") === col("rs"))
      .join(broadcast(colT), col("prio") === col("cp"))
      .crossJoin(broadcast(tot))
      .withColumn("d",
        expr("CAST(obs AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct"))
      .select(col("seg"), col("prio"), col("obs"),
        expr("CAST(rt AS DECIMAL(38,0)) * ct * 1000 div n")
          .as("expected_milli"),
        expr("d * d * 1000000 div " +
          "(CAST(n AS DECIMAL(38,0)) * rt * ct)").as("chi2_ppm"))
      .orderBy("seg", "prio")
  }

  private val q69Sql =
    s"""WITH cells AS (
       |  SELECT c_mktsegment AS seg, o_orderpriority AS prio,
       |    CAST(COUNT(*) AS BIGINT) AS obs
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1, 2),
       |rt AS (SELECT seg, CAST(SUM(obs) AS BIGINT) AS rt
       |       FROM cells GROUP BY seg),
       |ct AS (SELECT prio, CAST(SUM(obs) AS BIGINT) AS ct
       |       FROM cells GROUP BY prio),
       |tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells)
       |SELECT cells.seg, cells.prio, obs,
       |  CAST(CAST(rt AS HUGEINT) * ct * 1000 // n AS BIGINT)
       |    AS expected_milli,
       |  CAST((CAST(obs AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
       |     * (CAST(obs AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
       |     * 1000000 // (CAST(n AS HUGEINT) * rt * ct) AS BIGINT)
       |    AS chi2_ppm
       |FROM cells
       |JOIN rt ON cells.seg = rt.seg
       |JOIN ct ON cells.prio = ct.prio
       |CROSS JOIN tot
       |ORDER BY cells.seg, cells.prio""".stripMargin

  // ---------------------------------------------------------------- q70
  /** k-anonymity audit over the customer quasi-identifier
    * (nation, market segment, $1000 account-balance bucket) — the
    * privacy/governance screen run before releasing or training on
    * user-adjacent records: how many rows sit in QI groups smaller
    * than k, i.e. are re-identifiable by those attributes alone. Emits
    * the full group-size histogram (k → groups, rows, row share in
    * exact floored ppm, at-risk flag for k < [[q70K]]).
    *
    * Determinism: the balance bucket is integer cents `(c+10⁸) div 10⁵`
    * — the +10⁸ offset keeps the dividend positive so Spark's
    * truncating `div` and DuckDB's flooring `//` agree (negative
    * balances exist); shares are `⌊rows·10⁶/total⌋` on BIGINTs.
    *
    * Shape: fact → QI-group sizes is ONE partial-agged hash agg; the
    * k histogram and its total are re-aggregated from the group
    * relation (already tiny) with the total broadcast back — the q69
    * margin discipline. At 100 TB the only fact-sized movement is the
    * first shuffle, keyed on the QI tuple itself. */
  val q70K = 5
  def q70KAnonymity(s: SparkSession, dir: String): DataFrame = {
    val groups = t(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " + 100000000) div 100000").as("bal_bucket"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
      .agg(count(lit(1)).as("k"))
    val hist = groups.groupBy(col("k"))
      .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
      .persist()
    val tot = hist.agg(sum(col("n_rows")).as("total"))
    hist.crossJoin(broadcast(tot))
      .select(col("k"), col("n_groups"), col("n_rows"),
        expr("n_rows * 1000000 div total").as("rows_ppm"),
        when(col("k") < q70K, 1L).otherwise(0L).as("at_risk"))
      .orderBy("k")
  }

  private val q70Sql =
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
       |     + 100000000) // 100000 AS bal_bucket,
       |    CAST(COUNT(*) AS BIGINT) AS k
       |  FROM customer GROUP BY 1, 2, 3),
       |h AS (
       |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_groups,
       |    CAST(SUM(k) AS BIGINT) AS n_rows
       |  FROM g GROUP BY k),
       |tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM h)
       |SELECT k, n_groups, n_rows,
       |  CAST(n_rows * 1000000 // total AS BIGINT) AS rows_ppm,
       |  CAST(CASE WHEN k < $q70K THEN 1 ELSE 0 END AS BIGINT) AS at_risk
       |FROM h CROSS JOIN tot ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q71
  /** q71: exact weighted median price per brand — weight = quantity,
    * value = extended price in cents. The robust-center statistic for
    * skewed monetary data (a mean is distorted by one whale order; the
    * weighted median is not).
    *
    * Scale shape — the g04 histogram lesson applied to a weighted
    * order statistic: the fact table collapses FIRST into a
    * (brand, cents) weight histogram (one partial-aggregated shuffle),
    * and the prefix-sum window runs over that histogram, whose size is
    * capped by the PRICE DOMAIN (≤ ~10⁷ distinct cent values per
    * brand) no matter how many fact rows exist — at 100 TB the window
    * input is unchanged while a row-level window would be a 4-billion-
    * row single-partition sort per brand. The median is the smallest
    * cent value whose cumulative weight reaches half the total;
    * everything that decides or renders is BIGINT. */
  def q71WeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_partkey"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("cents"),
      expr("CAST(l_quantity AS BIGINT)").as("qty"))
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    val h = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("cents"))
      .agg(sum(col("qty")).as("wq"))
    val cum = h.withColumn("cum", sum(col("wq")).over(
      Window.partitionBy(col("p_brand")).orderBy(col("cents"))))
    val tot = h.groupBy(col("p_brand")).agg(sum(col("wq")).as("w_total"))
    cum.join(broadcast(tot), "p_brand")
      .groupBy(col("p_brand"))
      .agg(max(col("w_total")).as("total_qty"),
        min(when(col("cum") * 2 >= col("w_total"), col("cents")))
          .as("wmedian_cents"))
      .orderBy("p_brand")
  }

  private val q71Sql =
    """WITH h AS (
      |  SELECT p_brand,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents,
      |    SUM(CAST(l_quantity AS BIGINT)) AS wq
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |c AS (
      |  SELECT p_brand, cents,
      |    SUM(wq) OVER (PARTITION BY p_brand ORDER BY cents) AS cum,
      |    SUM(wq) OVER (PARTITION BY p_brand) AS w_total
      |  FROM h)
      |SELECT p_brand, CAST(MAX(w_total) AS BIGINT) AS total_qty,
      |  CAST(MIN(CASE WHEN cum * 2 >= w_total THEN cents END) AS BIGINT)
      |    AS wmedian_cents
      |FROM c GROUP BY 1 ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q72
  /** q72: exact lag-k autocorrelation (k = 1..3) of each event type's
    * daily revenue series — the seasonality/trend screen run before
    * trusting any time-windowed metric. ACF is the q65 moment
    * discipline applied to a self-joined series: with integer daily
    * cents x_t, n days and S = Σx, every deviation n·x_t − S is an
    * exact integer, so numerator Σ dev_t·dev_{t+k} and denominator
    * Σ dev_t² are exact in 38-digit arithmetic and the ppm ratio is
    * engine-identical. Negative numerators use an explicit
    * sign-split floor (Spark `div` truncates toward zero, DuckDB `//`
    * floors — they agree only on non-negative operands).
    *
    * Headroom: dev ≤ n·max(x); the binding step is the ppm numerator
    * `num × 10⁶` (not the moment sums themselves — a naive "10³³ fits
    * with five digits spare" reading misses the ×10⁶). With
    * n ≈ 10³ days the bound is den/|num| ≤ n·dev² ≈ 10³·(n·max(x))²,
    * so max(x) must stay ≤ ~10¹¹·⁵ cents/day (≈ $300 M/day) for
    * num·10⁶ ≈ 10³⁷·⁵ to clear DECIMAL(38,0)/HUGEINT. Beyond that,
    * divide den down before the ppm multiply.
    *
    * Scale: ONE fact pass (the daily agg, partial map-side); the
    * deviations relation is (types × days)-sized and persisted, so
    * the den pass and the single lag-dimension join all probe the
    * tiny cache, never the corpus. Lag alignment is positional over
    * observed days (gaps close ranks — spelled identically in the
    * twin). */
  def q72Autocorr(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("x"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val dd = daily.join(broadcast(stats), "event_type")
      .withColumn("rn", row_number().over(byType).cast("long"))
      .select(col("event_type"), col("rn"),
        expr("CAST(n AS DECIMAL(38,0)) * x - CAST(s AS DECIMAL(38,0))")
          .as("dev"))
      .persist()
    val den = dd.groupBy(col("event_type"))
      .agg(sum(expr("dev * dev")).as("den"))
      .join(broadcast(stats.select(col("event_type"), col("n").as("n_days"))),
        "event_type")
    val lagDim = s.range(1, 4).withColumnRenamed("id", "lag")
    val num = dd.as("t").crossJoin(broadcast(lagDim))
      .join(dd.as("u"),
        col("u.event_type") === col("t.event_type") &&
          col("u.rn") === col("t.rn") + col("lag"))
      .groupBy(col("t.event_type"), col("lag"))
      .agg(sum(expr("t.dev * u.dev")).as("num"))
    num.join(broadcast(den), "event_type")
      .select(col("event_type"), col("lag"), col("n_days"),
        expr("""CAST(CASE WHEN num < 0
                THEN -((-num) * 1000000 div den)
                ELSE num * 1000000 div den END AS BIGINT)""")
          .as("acf_ppm"))
      .orderBy("event_type", "lag")
  }

  private val q72Sql =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
      |    SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS x
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS s
      |       FROM daily GROUP BY 1),
      |d AS MATERIALIZED (
      |  SELECT daily.event_type,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY daily.event_type
      |      ORDER BY day) AS BIGINT) AS rn,
      |    CAST(st.n AS HUGEINT) * x - CAST(st.s AS HUGEINT) AS dev
      |  FROM daily JOIN st USING (event_type)),
      |den AS (
      |  SELECT d.event_type, SUM(dev * dev) AS den, MAX(st.n) AS n_days
      |  FROM d JOIN st USING (event_type) GROUP BY 1),
      |num AS (
      |  SELECT t.event_type, k.lag, SUM(t.dev * u.dev) AS num
      |  FROM d t CROSS JOIN (VALUES (1), (2), (3)) k(lag)
      |  JOIN d u ON u.event_type = t.event_type AND u.rn = t.rn + k.lag
      |  GROUP BY 1, 2)
      |SELECT event_type, CAST(lag AS BIGINT) AS lag,
      |  CAST(n_days AS BIGINT) AS n_days,
      |  CAST(CASE WHEN num < 0 THEN -((-num) * 1000000 // den)
      |    ELSE num * 1000000 // den END AS BIGINT) AS acf_ppm
      |FROM num JOIN den USING (event_type)
      |ORDER BY event_type, lag""".stripMargin

  // ---------------------------------------------------------------- q73
  /** q73: first-/last-touch marketing attribution — each purchase's
    * revenue assigned to the click/view touch that opened (first) or
    * closed (last) its 24 h lookback window, `direct` when none. The
    * revenue-allocation analytic every funnel report (q54) feeds.
    *
    * Scale shape — the q22/q25 as-of discipline, now applied BY THE
    * OPTIMIZER: the Spark side is written as the natural inequality
    * join (touches in `[pts − 24 h, pts]` per user — exactly what the
    * oracle says), and [[graft.plans.RangeJoinRewrite]] rewrites it
    * into the banded form (purchases explode into their two covering
    * day buckets, touches join on the (user, bucket) equi-key with
    * the window as residual) — every join bucket bounded by one
    * user-day of touches, plan-pinned via the `__graft_band` key.
    * The per-purchase argmax/argmin are `max/min(struct(ts, id,
    * type))` hash aggregates ((ts, id) is unique, so the struct order
    * is total — no window, no float, no tie ambiguity). The oracle
    * uses the same definitional inequality join + ROW_NUMBER, so the
    * rewrite is checked against the definition (the q61 rule). */
  def q73Attribution(s: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400000000000L
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"), col("ts"),
      expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("ts").as("pts"), col("cents"))
    val tch = e.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("tu"), col("event_id").as("tid"),
        col("ts").as("tts"), col("event_type").as("typ"))
    val touched = p.join(tch,
        col("user_id") === col("tu") &&
          col("tts") <= col("pts") && col("tts") >= col("pts") - dayNs)
      .groupBy(col("pid"))
      .agg(
        max(struct(col("tts"), col("tid"), col("typ"))).as("lastT"),
        min(struct(col("tts"), col("tid"), col("typ"))).as("firstT"))
      .select(col("pid"), col("lastT.typ").as("last_typ"),
        col("firstT.typ").as("first_typ"))
    val f = p.join(touched, Seq("pid"), "left")
      .select(col("cents"),
        coalesce(col("last_typ"), lit("direct")).as("last_typ"),
        coalesce(col("first_typ"), lit("direct")).as("first_typ"))
    f.select(lit("last").as("model"), col("last_typ").as("touch_type"),
        col("cents"))
      .unionByName(f.select(lit("first").as("model"),
        col("first_typ").as("touch_type"), col("cents")))
      .groupBy(col("model"), col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("revenue_cents"))
      .orderBy("model", "touch_type")
  }

  private val q73Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(epoch_us(ts) AS BIGINT) * 1000 AS tsn,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |p AS (SELECT user_id, event_id AS pid, tsn AS pts, cents FROM e
      |      WHERE event_type = 'purchase'),
      |tch AS (SELECT user_id, event_id AS tid, tsn AS tts,
      |          event_type AS typ
      |        FROM e WHERE event_type IN ('click', 'view')),
      |j AS (
      |  SELECT p.pid, t.typ, t.tts, t.tid
      |  FROM p JOIN tch t ON p.user_id = t.user_id
      |    AND t.tts <= p.pts AND t.tts >= p.pts - 86400000000000),
      |r AS (
      |  SELECT pid, typ,
      |    ROW_NUMBER() OVER (PARTITION BY pid
      |      ORDER BY tts DESC, tid DESC) AS rl,
      |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tts, tid) AS rf
      |  FROM j),
      |f AS (
      |  SELECT p.pid, p.cents,
      |    COALESCE(l.typ, 'direct') AS last_typ,
      |    COALESCE(fi.typ, 'direct') AS first_typ
      |  FROM p
      |  LEFT JOIN (SELECT pid, typ FROM r WHERE rl = 1) l USING (pid)
      |  LEFT JOIN (SELECT pid, typ FROM r WHERE rf = 1) fi USING (pid))
      |SELECT model, touch_type, CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |  CAST(SUM(cents) AS BIGINT) AS revenue_cents
      |FROM (
      |  SELECT 'last' AS model, last_typ AS touch_type, cents FROM f
      |  UNION ALL
      |  SELECT 'first' AS model, first_typ AS touch_type, cents FROM f)
      |GROUP BY 1, 2 ORDER BY model, touch_type""".stripMargin

  // ---------------------------------------------------------------- q74
  /** q74: surge context — for every audited purchase (every 10th),
    * the count of platform-wide events and distinct active users in
    * the 60 s before it. The "was the system busy when this
    * happened" feature a fraud/load model joins onto each
    * transaction.
    *
    * This is the KEYLESS window join — no user equi-key at all — the
    * shape Spark plans as BroadcastNestedLoopJoin (O(|purchases| ×
    * |events|), the worst plan in the engine's repertoire).
    * [[graft.plans.RangeJoinRewrite]] turns it into a hash join on
    * the 60 s bucket: written naively, planned banded, plan-pinned
    * BNLJ-free. The inner window join drops empty-context purchases;
    * a purchase-keyed left join restores them with zero counts. */
  def q74SurgeWindow(s: SparkSession, dir: String): DataFrame = {
    val minNs = 60000000000L
    val e = t(s, dir, "events").select(col("event_id"), col("user_id"),
      col("event_type"), col("ts"))
    val p = e.filter(col("event_type") === "purchase" &&
        col("event_id") % 10 === 0)
      .select(col("event_id").as("pid"), col("ts").as("pts"))
    val x = e.select(col("event_id").as("eid"), col("user_id").as("eu"),
      col("ts").as("ets"))
    val ctx = p.join(x,
        col("ets") <= col("pts") && col("ets") >= col("pts") - minNs &&
          col("eid") =!= col("pid"))
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("ne"), countDistinct(col("eu")).as("nu"))
    p.join(ctx, Seq("pid"), "left")
      .select(col("pid"), coalesce(col("ne"), lit(0L)).as("n_events"),
        coalesce(col("nu"), lit(0L)).as("n_users"))
      .orderBy("pid")
  }

  private val q74Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(epoch_us(ts) AS BIGINT) * 1000 AS tsn
      |  FROM events),
      |p AS (SELECT event_id AS pid, tsn AS pts FROM e
      |      WHERE event_type = 'purchase' AND event_id % 10 = 0),
      |j AS (
      |  SELECT p.pid, x.user_id
      |  FROM p JOIN e x ON x.tsn <= p.pts
      |    AND x.tsn >= p.pts - 60000000000 AND x.event_id <> p.pid),
      |a AS (
      |  SELECT pid, CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM j GROUP BY pid)
      |SELECT p.pid, COALESCE(a.n_events, 0) AS n_events,
      |  COALESCE(a.n_users, 0) AS n_users
      |FROM p LEFT JOIN a USING (pid) ORDER BY pid""".stripMargin

  /** q75: l-diversity audit — the follow-on privacy screen to q70's
    * k-anonymity: a QI group can be large (k-anonymous) yet still leak
    * if every member shares one sensitive value. Here the QI drops
    * to (nation, $1000 balance bucket) and q70's third QI column —
    * market segment — becomes the SENSITIVE attribute: l = exact
    * distinct segments inside each QI group. Emits the l histogram
    * (groups, rows, row share in exact floored ppm, at-risk flag for
    * l < [[q75L]]).
    *
    * Determinism: the q70 bucket trick (offset keeps the dividend
    * non-negative for `div`/`//` agreement); l is an exact
    * count-distinct over a 5-value attribute — partial-aggregable,
    * no sketch needed.
    *
    * Shape: fact → QI groups is ONE hash agg carrying both k and the
    * distinct-segment count; the l histogram + broadcast total reuse
    * the q70 margin discipline. Only the first shuffle is fact-sized. */
  val q75L = 3
  def q75LDiversity(s: SparkSession, dir: String): DataFrame = {
    val groups = t(s, dir, "customer")
      .select(col("c_nationkey"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " + 100000000) div 100000").as("bal_bucket"),
        col("c_mktsegment"))
      .groupBy(col("c_nationkey"), col("bal_bucket"))
      .agg(count(lit(1)).as("k"),
        countDistinct(col("c_mktsegment")).as("l"))
    val hist = groups.groupBy(col("l"))
      .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
      .persist()
    val tot = hist.agg(sum(col("n_rows")).as("total"))
    hist.crossJoin(broadcast(tot))
      .select(col("l"), col("n_groups"), col("n_rows"),
        expr("n_rows * 1000000 div total").as("rows_ppm"),
        when(col("l") < q75L, 1L).otherwise(0L).as("at_risk"))
      .orderBy("l")
  }

  private val q75Sql =
    s"""WITH g AS (
       |  SELECT c_nationkey,
       |    (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
       |     + 100000000) // 100000 AS bal_bucket,
       |    CAST(COUNT(*) AS BIGINT) AS k,
       |    CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
       |  FROM customer GROUP BY 1, 2),
       |h AS (
       |  SELECT l, CAST(COUNT(*) AS BIGINT) AS n_groups,
       |    CAST(SUM(k) AS BIGINT) AS n_rows
       |  FROM g GROUP BY l),
       |tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM h)
       |SELECT l, n_groups, n_rows,
       |  CAST(n_rows * 1000000 // total AS BIGINT) AS rows_ppm,
       |  CAST(CASE WHEN l < $q75L THEN 1 ELSE 0 END AS BIGINT) AS at_risk
       |FROM h CROSS JOIN tot ORDER BY l""".stripMargin

  // ---------------------------------------------------------------- q76
  /** q76: MAD robust-outlier profile per event type — the
    * median/MAD twin of q68's mean/σ screen. A k-sigma test breaks
    * down when the contamination itself inflates σ (one whale event
    * masks the rest); the median absolute deviation has a 50 %
    * breakdown point, so this is the outlier count a pipeline trusts
    * on heavy-tailed telemetry. Flag: `|x − median| > [[q76K]]·MAD`.
    *
    * Both order statistics are EXACT integer ranks (the q71 lower-
    * median convention, smallest value with 2·cum ≥ n), so no float
    * ever decides: median over the (type, cents) count histogram,
    * MAD over the derived (type, |cents − median|) histogram, and the
    * flag is a pure BIGINT comparison.
    *
    * Scale shape — the g04/q71 histogram lesson, twice: the fact
    * table collapses ONCE into the value histogram (one partial-agged
    * shuffle, domain-bounded ≤ distinct cent values per type); the
    * deviation histogram, both prefix-sum windows, and the outlier
    * count all run over histograms, never rows — at 100 TB the
    * post-scan work is unchanged while q68's second fact pass grows
    * linearly. (q68 keeps its two-pass shape deliberately: these are
    * the two canonical profiles, cross-checkable on the same table.) */
  val q76K = 3
  def q76MadOutliers(s: SparkSession, dir: String): DataFrame = {
    val h = t(s, dir, "events")
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    val byType = Window.partitionBy(col("event_type"))
    val med = h
      .withColumn("cum", sum(col("cnt")).over(byType.orderBy(col("cents"))))
      .withColumn("n", sum(col("cnt")).over(byType))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") * 2 >= col("n"), col("cents"))).as("med"))
    val devh = h.join(broadcast(med), "event_type")
      .groupBy(col("event_type"), abs(col("cents") - col("med")).as("adev"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = devh
      .withColumn("cum", sum(col("cnt")).over(byType.orderBy(col("adev"))))
      .withColumn("n", sum(col("cnt")).over(byType))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum") * 2 >= col("n"), col("adev"))).as("mad"))
    h.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max(col("med")).as("median_cents"),
        max(col("mad")).as("mad_cents"),
        sum(when(abs(col("cents") - col("med")) > lit(q76K) * col("mad"),
          col("cnt")).otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"), col("median_cents"),
        col("mad_cents"), col("n_outliers").cast("long").as("n_outliers"),
        expr("CAST(n_outliers * 1000000 div n AS BIGINT)")
          .as("outlier_ppm"))
      .orderBy("event_type")
  }

  private val q76Sql =
    s"""WITH h AS MATERIALIZED (
       |  SELECT event_type,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2),
       |med AS (
       |  SELECT event_type, MAX(n) AS n,
       |    MIN(CASE WHEN cum * 2 >= n THEN cents END) AS med
       |  FROM (
       |    SELECT event_type, cents, cnt,
       |      SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
       |      SUM(cnt) OVER (PARTITION BY event_type) AS n
       |    FROM h) GROUP BY event_type),
       |devh AS (
       |  SELECT h.event_type, abs(h.cents - med.med) AS adev,
       |    CAST(SUM(h.cnt) AS BIGINT) AS cnt
       |  FROM h JOIN med ON h.event_type = med.event_type
       |  GROUP BY 1, 2),
       |mad AS (
       |  SELECT event_type,
       |    MIN(CASE WHEN cum * 2 >= n THEN adev END) AS mad
       |  FROM (
       |    SELECT event_type, adev, cnt,
       |      SUM(cnt) OVER (PARTITION BY event_type ORDER BY adev) AS cum,
       |      SUM(cnt) OVER (PARTITION BY event_type) AS n
       |    FROM devh) GROUP BY event_type)
       |SELECT h.event_type, CAST(MAX(med.n) AS BIGINT) AS n,
       |  CAST(MAX(med.med) AS BIGINT) AS median_cents,
       |  CAST(MAX(mad.mad) AS BIGINT) AS mad_cents,
       |  CAST(SUM(CASE WHEN abs(h.cents - med.med) > $q76K * mad.mad
       |    THEN h.cnt ELSE 0 END) AS BIGINT) AS n_outliers,
       |  CAST(SUM(CASE WHEN abs(h.cents - med.med) > $q76K * mad.mad
       |    THEN h.cnt ELSE 0 END) * 1000000 // MAX(med.n) AS BIGINT)
       |    AS outlier_ppm
       |FROM h JOIN med ON h.event_type = med.event_type
       |       JOIN mad ON h.event_type = mad.event_type
       |GROUP BY h.event_type ORDER BY h.event_type""".stripMargin

  // ---------------------------------------------------------------- q77
  /** q77: time-weighted average value (TWAP) per user — the measure a
    * plain AVG gets wrong on irregularly-sampled telemetry: each
    * event's value HOLDS until the next event (a step function), so
    * the mean must weight by holding duration, not by row count (the
    * classic finance/metering definition; one 10-hour reading and
    * sixty 1-second readings are otherwise sixty-one equal votes).
    *
    * Exactness: values become BIGINT cents before any arithmetic (the
    * q01 rule); the weighted numerator Σ cents·Δus widens to
    * DECIMAL(38,0) BEFORE the multiply — cents ~ 10⁴ × Δus ~ 10¹²
    * overflows a BIGINT term at ~10²-day gaps, and non-ANSI Spark
    * would wrap silently where DuckDB errors (the e05/q65 widening
    * rule). The final TWAP is one integer division of exact numbers,
    * so the cell is engine-bit-identical.
    *
    * Scale: ONE user-partitioned sort provides the lead(ts) alignment
    * and feeds the per-user aggregate directly (the q51/q60
    * single-shuffle discipline); no self-join, no second fact pass.
    * Users with a single event have no holding interval and are
    * excluded by definition (span = 0 cannot divide). */
  def q77Twap(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .withColumn("next_us", lead(col("ts_us"), 1).over(byUser))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts_us")) - min(col("ts_us"))).as("span_us"),
        sum(expr("""CASE WHEN next_us IS NULL THEN CAST(0 AS DECIMAL(38,0))
              ELSE CAST(cents AS DECIMAL(38,0)) * (next_us - ts_us)
              END""")).as("wsum"))
      .filter(col("span_us") > 0)
      // Spark's `div` truncates toward zero; DuckDB's `//` FLOORS — for
      // negative wsum (negative-valued events) the two differ by one.
      // The twin spells the division sign-split (|wsum| div span, sign
      // reapplied) in BOTH engines so the semantics are pinned to
      // truncation regardless of the data's sign, not assumed from it
      // (the q72/a14 sign rule).
      .select(col("user_id"), col("n_events"), col("span_us"),
        expr("""CAST(CASE WHEN wsum < 0
               THEN -((-wsum) div span_us)
               ELSE wsum div span_us END AS BIGINT)""").as("twap_cents"))
      .orderBy("user_id")
  }

  private val q77Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |led AS (
      |  SELECT *, LEAD(ts_us, 1) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id) AS next_us
      |  FROM e),
      |agg AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS span_us,
      |    SUM(CASE WHEN next_us IS NULL THEN CAST(0 AS HUGEINT)
      |      ELSE CAST(cents AS HUGEINT) * (next_us - ts_us) END) AS wsum
      |  FROM led GROUP BY user_id)
      |SELECT user_id, n_events, span_us,
      |  CAST(CASE WHEN wsum < 0 THEN -((-wsum) // span_us)
      |       ELSE wsum // span_us END AS BIGINT) AS twap_cents
      |FROM agg WHERE span_us > 0 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q78
  /** q78: schema-evolution union — merging manifest snapshots written
    * under DIFFERENT schema versions, the table-maintenance reality a
    * long-lived 100 TB corpus cannot avoid (columns get added; old
    * files are never rewritten). The v1 slice carries only
    * (doc_id, source, n_chars); the v2 slice added `lang`. The merge
    * is `unionByName(allowMissingColumns = true)` — Spark aligns
    * columns BY NAME and null-fills the missing ones (a positional
    * UNION would silently misalign or reject), exactly what a
    * Delta/Iceberg-style schema-evolved read does per file group.
    *
    * The rollup then proves the null-fill semantics are what a
    * consumer observes: per (snapshot_version, lang-or-⊥) doc counts
    * and exact char mass. Scale: both slices are one filtered scan of
    * the same table (column-pruned to each version's schema); the
    * union is a zero-shuffle plan node; only the final small rollup
    * aggregates. */
  def q78SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // v1 files: written before `lang` existed (even doc ids)
    val v1 = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("snapshot_version", lit("v1"))
    // v2 files: the evolved schema (odd doc ids)
    val v2 = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
      .withColumn("snapshot_version", lit("v2"))
    v1.unionByName(v2, allowMissingColumns = true)
      .groupBy(col("snapshot_version"),
        coalesce(col("lang"), lit("<absent>")).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("snapshot_version", "lang")
  }

  private val q78Sql =
    """WITH merged AS (
      |  SELECT doc_id, source, n_chars, NULL AS lang, 'v1' AS snapshot_version
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id, source, n_chars, lang, 'v2' AS snapshot_version
      |  FROM documents WHERE doc_id % 2 = 1)
      |SELECT snapshot_version, COALESCE(lang, '<absent>') AS lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM merged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q79
  /** q79: OHLC bars — open/high/low/close/volume per (event_type, hour),
    * the standard downsampling of a tick stream into fixed bars (what a
    * metrics/finance consumer reads instead of raw events). Open/close
    * are POSITIONAL (first/last by event time), which a plain MIN/MAX
    * aggregate cannot express — they come from two row_number() windows
    * over the SAME (event_type, hour) partitioning the aggregate then
    * groups on, so the whole query is ONE hash exchange (the q77/q51
    * single-shuffle discipline; tiebreak on event_id makes both ends
    * deterministic under duplicate timestamps).
    *
    * Exactness: values are BIGINT cents before any arithmetic (q01
    * rule); volume widens to DECIMAL(38,0) before the sum and lands as
    * BIGINT (e05 rule); open/close/high/low are selections, not
    * arithmetic. Scale: bars = |event_types| × hours — tiny output from
    * one fact pass regardless of corpus size. */
  def q79OhlcBars(s: SparkSession, dir: String): DataFrame = {
    val asc = Window.partitionBy(col("event_type"), col("hr"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val desc = Window.partitionBy(col("event_type"), col("hr"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .withColumn("hr", expr("ts_us div 3600000000"))
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("rn_a") === 1, col("cents"))).as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max(when(col("rn_d") === 1, col("cents"))).as("close_cents"),
        sum(col("cents").cast("decimal(38,0)")).as("vol"))
      .select(col("event_type"), col("hr"), col("n_events"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("vol").cast("bigint").as("volume_cents"))
      .orderBy("event_type", "hr")
  }

  private val q79Sql =
    """WITH e AS (
      |  SELECT event_id, event_type, epoch_us(ts) AS ts_us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |b AS (
      |  SELECT *, ts_us // 3600000000 AS hr FROM e),
      |rn AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, hr
      |      ORDER BY ts_us ASC, event_id ASC) AS rn_a,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, hr
      |      ORDER BY ts_us DESC, event_id DESC) AS rn_d
      |  FROM b)
      |SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MAX(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
      |  MAX(cents) AS high_cents,
      |  MIN(cents) AS low_cents,
      |  MAX(CASE WHEN rn_d = 1 THEN cents END) AS close_cents,
      |  CAST(SUM(cents) AS BIGINT) AS volume_cents
      |FROM rn GROUP BY event_type, hr
      |ORDER BY event_type, hr""".stripMargin

  // ---------------------------------------------------------------- q80
  /** q80: referential-integrity audit — per foreign-key relationship,
    * the child row count, orphan count (no matching parent key) and
    * orphan rate in ppm. A lakehouse never ENFORCES foreign keys, so
    * at 100 TB this audit IS the integrity guarantee: run per ingest,
    * diff per release (the a06 pre-flight discipline applied to
    * correctness instead of skew). The star-schema edges audit clean
    * by construction; the events→customer edge is the realistic dirty
    * one (event streams reference users the dimension hasn't seen).
    *
    * Scale shape: one partial-agged scan per relationship — the child
    * side never shuffles its payload (ids only), the parent key set
    * is DISTINCT-collapsed before the join and the aggregate output is
    * one row per relationship. No driver-side counting: all five
    * audits are one unioned plan, one action. */
  def q80FkIntegrity(s: SparkSession, dir: String): DataFrame = {
    def one(rel: String, child: DataFrame, key: String,
        parent: DataFrame, pk: String): DataFrame =
      child.select(col(key).as("k"))
        .join(parent.select(col(pk).as("k")).distinct()
          .withColumn("hit", lit(1L)), Seq("k"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(rel).as("relationship"), col("n_child"),
          col("n_orphans"),
          expr("n_orphans * 1000000 div n_child").as("orphan_ppm"))
    Seq(
      one("lineitem.l_orderkey->orders", t(s, dir, "lineitem"),
        "l_orderkey", t(s, dir, "orders"), "o_orderkey"),
      one("lineitem.l_partkey->part", t(s, dir, "lineitem"),
        "l_partkey", t(s, dir, "part"), "p_partkey"),
      one("lineitem.l_suppkey->supplier", t(s, dir, "lineitem"),
        "l_suppkey", t(s, dir, "supplier"), "s_suppkey"),
      one("orders.o_custkey->customer", t(s, dir, "orders"),
        "o_custkey", t(s, dir, "customer"), "c_custkey"),
      one("events.user_id->customer", t(s, dir, "events"),
        "user_id", t(s, dir, "customer"), "c_custkey"))
      .reduce(_ unionByName _)
      .orderBy("relationship")
  }

  private val q80Sql = {
    def one(rel: String, child: String, key: String,
        parent: String, pk: String) =
      s"""SELECT '$rel' AS relationship,
         |  CAST(COUNT(*) AS BIGINT) AS n_child,
         |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_orphans,
         |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) * 1000000
         |    // COUNT(*) AS BIGINT) AS orphan_ppm
         |FROM $child c LEFT JOIN
         |  (SELECT DISTINCT $pk AS k FROM $parent) p ON c.$key = p.k"""
        .stripMargin
    Seq(
      one("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      one("lineitem.l_partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      one("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      one("orders.o_custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      one("events.user_id->customer", "events", "user_id",
        "customer", "c_custkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relationship")
  }

  // ------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_fk_integrity"    -> q80FkIntegrity _,
    "q79_ohlc_bars"       -> q79OhlcBars _,
    "q78_schema_evolution" -> q78SchemaEvolution _,
    "q77_twap"            -> q77Twap _,
    "q76_mad_outliers"    -> q76MadOutliers _,
    "q75_l_diversity"     -> q75LDiversity _,
    "q74_surge_window"    -> q74SurgeWindow _,
    "q73_attribution"     -> q73Attribution _,
    "q72_autocorrelation" -> q72Autocorr _,
    "q71_weighted_median" -> q71WeightedMedian _,
    "q70_k_anonymity"     -> q70KAnonymity _,
    "q69_chi_square"      -> q69ChiSquare _,
    "q68_outliers"        -> q68Outliers _,
    "q67_markov"          -> q67Markov _,
    "q66_streaks"         -> q66Streaks _,
    "q65_regression"      -> q65Regression _,
    "q64_ewma"            -> q64Ewma _,
    "q63_percentile_cont" -> q63PercentileCont _,
    "q62_event_regex"     -> q62EventRegex _,
    "q61_skyline"         -> q61Skyline _,
    "q60_interval_union"  -> q60IntervalUnion _,
    "q59_ratio_to_report" -> q59RatioToReport _,
    "q58_pit_join"        -> q58PitJoin _,
    "q57_table_fingerprint" -> q57TableFingerprint _,
    "q56_compaction_plan" -> q56CompactionPlan _,
    "q55_mv_merge"        -> q55MvMerge _,
    "q54_funnel"          -> q54Funnel _,
    "q53_cdc_apply"       -> q53CdcApply _,
    "q52_winsorize"       -> q52Winsorize _,
    "q51_scd2_intervals"  -> q51Scd2Intervals _,
    "q49_zorder_layout"   -> q49ZorderLayout _,
    "q50_assoc_rules"     -> q50AssocRules _,
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_filter_revenue"  -> q02FilterRevenue _,
    "q03_top_unshipped"   -> q03TopUnshipped _,
    "q04_brand_agg"       -> q04BrandAgg _,
    "q05_nation_revenue"  -> q05NationRevenue _,
    "q06_semi_join"       -> q06SemiJoin _,
    "q07_anti_join"       -> q07AntiJoin _,
    "q08_window_rank"     -> q08WindowRank _,
    "q09_window_running"  -> q09WindowRunning _,
    "q10_window_lag"      -> q10WindowLag _,
    "q11_topk"            -> q11TopK _,
    "q12_rollup"          -> q12Rollup _,
    "q13_cube"            -> q13Cube _,
    "q14_grouping_sets"   -> q14GroupingSets _,
    "q15_distinct_agg"    -> q15DistinctAgg _,
    "q16_set_ops"         -> q16SetOps _,
    "q17_string_funcs"    -> q17StringFuncs _,
    "q18_date_agg"        -> q18DateAgg _,
    "q19_case_agg"        -> q19CaseAgg _,
    "q20_json"            -> q20Json _,
    "q21_theta_join"      -> q21ThetaJoin _,
    "q22_asof_join"       -> q22AsOfJoin _,
    "q23_time_bucket"     -> q23TimeBucket _,
    "q24_sessionize"      -> q24Sessionize _,
    "q25_range_join"      -> q25RangeJoin _,
    "q26_set_ops_all"     -> q26SetOpsAll _,
    "q27_median"          -> q27Median _,
    "q28_subquery"        -> q28Subquery _,
    "q29_topk_custom"     -> q29TopKCustom _,
    "q30_math_funcs"      -> q30MathFuncs _,
    "q31_map_funcs"       -> q31MapFuncs _,
    "q32_pivot"           -> q32Pivot _,
    "q33_fuzzy_join"      -> q33FuzzyJoin _,
    "q34_exists"          -> q34Exists _,
    "q35_unpivot"         -> q35Unpivot _,
    "q36_range_frame"     -> q36RangeFrame _,
    "q37_string_agg"      -> q37StringAgg _,
    "q38_ignore_nulls"    -> q38IgnoreNulls _,
    "q39_percent_rank"    -> q39PercentRank _,
    "q40_nation_pairs"    -> q40NationPairs _,
    "q41_scalar_subquery" -> q41ScalarSubquery _,
    "q42_ntile"           -> q42Ntile _,
    "q43_lateral"         -> q43Lateral _,
    "q44_calendar_fill"   -> q44CalendarFill _,
    "q45_latest_state"    -> q45LatestState _,
    "q46_window_distinct" -> q46WindowDistinct _,
    "q47_dist_scalars"    -> q47DistScalars _,
    "q48_recursive_agg"   -> q48RecursiveAgg _)

  val oracle: Map[String, String] = Map(
    "q80_fk_integrity"    -> q80Sql,
    "q79_ohlc_bars"       -> q79Sql,
    "q78_schema_evolution" -> q78Sql,
    "q77_twap"            -> q77Sql,
    "q76_mad_outliers"    -> q76Sql,
    "q75_l_diversity"     -> q75Sql,
    "q74_surge_window"    -> q74Sql,
    "q73_attribution"     -> q73Sql,
    "q72_autocorrelation" -> q72Sql,
    "q71_weighted_median" -> q71Sql,
    "q70_k_anonymity"     -> q70Sql,
    "q69_chi_square"      -> q69Sql,
    "q68_outliers"        -> q68Sql,
    "q67_markov"          -> q67Sql,
    "q66_streaks"         -> q66Sql,
    "q65_regression"      -> q65Sql,
    "q64_ewma"            -> q64Sql,
    "q63_percentile_cont" -> q63Sql,
    "q62_event_regex"     -> q62Sql,
    "q61_skyline"         -> q61Sql,
    "q60_interval_union"  -> q60Sql,
    "q59_ratio_to_report" -> q59Sql,
    "q58_pit_join"        -> q58Sql,
    "q57_table_fingerprint" -> q57Sql,
    "q56_compaction_plan" -> q56Sql,
    "q55_mv_merge"        -> q55Sql,
    "q54_funnel"          -> q54Sql,
    "q53_cdc_apply"       -> q53Sql,
    "q52_winsorize"       -> q52Sql,
    "q51_scd2_intervals"  -> q51Sql,
    "q49_zorder_layout"   -> q49Sql,
    "q50_assoc_rules"     -> q50Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_revenue"  -> q02Sql,
    "q03_top_unshipped"   -> q03Sql,
    "q04_brand_agg"       -> q04Sql,
    "q05_nation_revenue"  -> q05Sql,
    "q06_semi_join"       -> q06Sql,
    "q07_anti_join"       -> q07Sql,
    "q08_window_rank"     -> q08Sql,
    "q09_window_running"  -> q09Sql,
    "q10_window_lag"      -> q10Sql,
    "q11_topk"            -> q11Sql,
    "q12_rollup"          -> q12Sql,
    "q13_cube"            -> q13Sql,
    "q14_grouping_sets"   -> q14Sql,
    "q15_distinct_agg"    -> q15Sql,
    "q16_set_ops"         -> q16Sql,
    "q17_string_funcs"    -> q17Sql,
    "q18_date_agg"        -> q18Sql,
    "q19_case_agg"        -> q19Sql,
    "q20_json"            -> q20Sql,
    "q21_theta_join"      -> q21Sql,
    "q22_asof_join"       -> q22Sql,
    "q23_time_bucket"     -> q23Sql,
    "q24_sessionize"      -> q24Sql,
    "q25_range_join"      -> q25Sql,
    "q26_set_ops_all"     -> q26Sql,
    "q27_median"          -> q27Sql,
    "q28_subquery"        -> q28Sql,
    "q29_topk_custom"     -> q29Sql,
    "q30_math_funcs"      -> q30Sql,
    "q31_map_funcs"       -> q31Sql,
    "q32_pivot"           -> q32Sql,
    "q33_fuzzy_join"      -> q33Sql,
    "q34_exists"          -> q34Sql,
    "q35_unpivot"         -> q35Sql,
    "q36_range_frame"     -> q36Sql,
    "q37_string_agg"      -> q37Sql,
    "q38_ignore_nulls"    -> q38Sql,
    "q39_percent_rank"    -> q39Sql,
    "q40_nation_pairs"    -> q40Sql,
    "q41_scalar_subquery" -> q41Sql,
    "q42_ntile"           -> q42Sql,
    "q43_lateral"         -> q43Sql,
    "q44_calendar_fill"   -> q44Sql,
    "q45_latest_state"    -> q45Sql,
    "q46_window_distinct" -> q46Sql,
    "q47_dist_scalars"    -> q47Sql,
    "q48_recursive_agg"   -> q48Sql)
}
