package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.PortableHll

/** Sketch/approximate aggregations (SURVEY.md §2.4: HLL et al.).
  *
  * a01/a02 use Spark's native sketches and have no DuckDB oracle —
  * those sketch implementations differ across engines by design — so
  * they are declared rows-only and accuracy-tested in SketchesSpec
  * against their exact counterparts. a03 is the [[PortableHll]]
  * `TypedImperativeAggregate`: every sketch ingredient is md5-pinned,
  * so it carries a full cell-exact oracle. */
object Sketches {

  /** HyperLogLog++ distinct counts next to the exact answer. */
  def hllDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Approximate quantiles of order value, overall and per status. */
  def percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("o_totalprice"), lit(0.95), lit(10000)).as("p95"),
        percentile_approx(col("o_totalprice"), lit(0.99), lit(10000)).as("p99"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** Portable-HLL distinct parts per return flag: the custom
    * TypedImperativeAggregate next to the exact answer. The collapsed
    * sketch state (`harmonic_sum`, `zero_registers`) is part of the
    * output, so the oracle hash-checks the sketch itself, not just the
    * rounded estimate. */
  def portableHllDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        PortableHll.portableHll(col("l_partkey").cast("string")).as("hll"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"),
        round(col("hll.estimate"), 4).as("hll_estimate"),
        col("hll.harmonic_sum").as("harmonic_sum"),
        col("hll.zero_registers").as("zero_registers"),
        col("exact_parts"))
      .orderBy("l_returnflag")

  /** DuckDB twin of the portable HLL — same md5 hash, register index,
    * rank, integer harmonic sum, and estimator arithmetic (the double
    * expression is spelled in the same evaluation order). */
  private val portableHllSql =
    """WITH h AS (
      |  SELECT l_returnflag, md5(CAST(l_partkey AS VARCHAR)) AS hx FROM lineitem),
      |zd AS (
      |  SELECT l_returnflag, hx,
      |    len(regexp_extract(substring(hx, 3, 12), '^0*')) AS nz
      |  FROM h),
      |rr AS (
      |  SELECT l_returnflag,
      |    ((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
      |     (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1)) % 64 AS reg,
      |    CASE WHEN nz = 12 THEN 49
      |      ELSE 4 * nz + 1 +
      |        CASE WHEN strpos('0123456789abcdef', substring(hx, 3 + nz, 1)) - 1 >= 8 THEN 0
      |             WHEN strpos('0123456789abcdef', substring(hx, 3 + nz, 1)) - 1 >= 4 THEN 1
      |             WHEN strpos('0123456789abcdef', substring(hx, 3 + nz, 1)) - 1 >= 2 THEN 2
      |             ELSE 3 END
      |    END AS rank
      |  FROM zd),
      |regs AS (SELECT l_returnflag, reg, MAX(rank) AS r FROM rr GROUP BY 1, 2),
      |st AS (
      |  SELECT l_returnflag,
      |    CAST(SUM((1::BIGINT << (50 - r))) + (64 - COUNT(*)) * (1::BIGINT << 50) AS BIGINT) AS harmonic_sum,
      |    CAST(64 - COUNT(*) AS BIGINT) AS zero_registers
      |  FROM regs GROUP BY 1),
      |ex AS (
      |  SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
      |  FROM lineitem GROUP BY 1)
      |SELECT st.l_returnflag,
      |ROUND(0.7213 / (1.0 + 1.079 / 64.0) * 64.0 * 64.0 * 1125899906842624.0
      |  / CAST(harmonic_sum AS DOUBLE), 4) AS hll_estimate,
      |harmonic_sum, zero_registers, exact_parts
      |FROM st JOIN ex USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  /** a04: portable count-min heavy hitters — per return flag, sketch the
    * supplier stream with [[PortableCountMin]] (one 8 KB state per
    * group), then report the [[cmsTopN]] exact-heaviest suppliers with
    * their count-min estimates side by side. The whole counter array is
    * md5'd into the output, so the oracle hash-checks the sketch state
    * itself, not just the estimates (the a03 contract).
    *
    * Scale: the sketch agg shuffles 8 KB per group total; the exact
    * top-k (here as the accuracy reference) is a partial-agged count +
    * per-key top-k — at 100 TB you would keep only the sketch side and
    * probe candidate keys against it, which is exactly the join shape
    * below (3-row sketch relation broadcast). */
  val cmsTopN = 5

  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableCountMin
    import org.apache.spark.sql.expressions.Window
    val li = t(s, dir, "lineitem")
    val sk = li.groupBy(col("l_returnflag"))
      .agg(PortableCountMin.portableCms(col("l_suppkey").cast("string"))
        .as("sketch"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("exact_cnt").desc, col("l_suppkey"))
    val top = li.groupBy(col("l_returnflag"), col("l_suppkey"))
      .agg(count(lit(1)).as("exact_cnt"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cmsTopN)
    top.join(broadcast(sk), "l_returnflag")
      .select(col("l_returnflag"), col("rk"), col("l_suppkey"),
        col("exact_cnt"),
        PortableCountMin.estimate(col("sketch"),
          col("l_suppkey").cast("string")).as("cms_est"),
        md5(concat_ws(",", col("sketch").cast("array<string>")))
          .as("sketch_md5"))
      .orderBy("l_returnflag", "rk")
  }

  /** DuckDB twin of the count-min: same md5-derived buckets (strpos on
    * the first two hex chars), a densified (flag, d, bucket) counter
    * grid (zeros included — the sketch md5 covers every counter), and
    * min-over-rows point estimates for the exact top keys. */
  /** Shared CMS-oracle scaffolding — ONE spelling of the sketch's
    * hash recipe and the densified (l_returnflag, d, bucket) counter
    * grid, composed into both the a04 and a11 twins (a drifted copy
    * of the hash recipe would silently desync an oracle). */
  private[queries] def cmsBucketOf(dExpr: String, kExpr: String): String =
    s"""((strpos('0123456789abcdef', substring(md5($dExpr || ':' || $kExpr), 1, 1)) - 1) * 16 +
       | (strpos('0123456789abcdef', substring(md5($dExpr || ':' || $kExpr), 2, 1)) - 1))""".stripMargin

  /** CTE chain ending in `counters` = every (flag, d, bucket) cell,
    * zeros included (the sketch md5 covers every counter). */
  private lazy val cmsGridCtes: String = {
    import graft.functions.PortableCountMin.{depth, width}
    s"""hits AS (
       |  SELECT l_returnflag, dd.d AS d,
       |    ${cmsBucketOf("CAST(dd.d AS VARCHAR)", "CAST(l_suppkey AS VARCHAR)")} AS bucket
       |  FROM lineitem
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${depth - 1})) AS d) dd),
       |grid AS (
       |  SELECT f.l_returnflag, dd.d, bb.bucket
       |  FROM (SELECT DISTINCT l_returnflag FROM lineitem) f
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${depth - 1})) AS d) dd
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${width - 1})) AS bucket) bb),
       |counters AS (
       |  SELECT g.l_returnflag, g.d, g.bucket,
       |    COALESCE(h.c, 0) AS c
       |  FROM grid g LEFT JOIN (
       |    SELECT l_returnflag, d, bucket, COUNT(*) AS c
       |    FROM hits GROUP BY 1, 2, 3) h
       |  ON g.l_returnflag = h.l_returnflag AND g.d = h.d AND g.bucket = h.bucket)"""
      .stripMargin
  }

  private val cmsHeavyHittersSql = {
    val bucketOf = cmsBucketOf _
    s"""WITH $cmsGridCtes,
       |sketch AS (
       |  SELECT l_returnflag,
       |    md5(string_agg(CAST(c AS VARCHAR), ',' ORDER BY d, bucket)) AS sketch_md5
       |  FROM counters GROUP BY 1),
       |exact AS (
       |  SELECT l_returnflag, l_suppkey, COUNT(*) AS exact_cnt
       |  FROM lineitem GROUP BY 1, 2),
       |top AS (
       |  SELECT l_returnflag, l_suppkey, exact_cnt,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
       |      ORDER BY exact_cnt DESC, l_suppkey) AS BIGINT) AS rk
       |  FROM exact),
       |est AS (
       |  SELECT t.l_returnflag, t.rk, t.l_suppkey, t.exact_cnt,
       |    CAST(MIN(c.c) AS BIGINT) AS cms_est
       |  FROM top t JOIN counters c
       |    ON c.l_returnflag = t.l_returnflag
       |   AND c.bucket = ${bucketOf("CAST(c.d AS VARCHAR)", "CAST(t.l_suppkey AS VARCHAR)")}
       |  WHERE t.rk <= $cmsTopN
       |  GROUP BY 1, 2, 3, 4)
       |SELECT e.l_returnflag, e.rk, e.l_suppkey, e.exact_cnt, e.cms_est,
       |  s.sketch_md5
       |FROM est e JOIN sketch s ON e.l_returnflag = s.l_returnflag
       |ORDER BY e.l_returnflag, e.rk""".stripMargin
  }

  /** a12: count-min estimation-error audit — the d15/s09 pattern applied
    * to the CMS: for EVERY (flag, supplier) key, the sketch's point
    * estimate is compared against the exact count, and the per-flag
    * error profile (keys, exact hits, max/total overestimate, mean
    * error in millionths per key) ships as an oracle-checked relation.
    * CMS never underestimates, so `err = est − exact ≥ 0` and every
    * output cell is an exact BIGINT — the sketch's quality is a
    * DIFFABLE measurement, not a doc claim.
    *
    * Scale: the exact side is one partial-agged (flag, key) count; the
    * sketch side is the same 8 KB-per-group agg a04 ships, broadcast
    * back onto the key-sized relation. At 100 TB the audit runs on a
    * sampled key set; the shape is unchanged. */
  def cmsErrorAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableCountMin
    val li = t(s, dir, "lineitem")
    val sk = li.groupBy(col("l_returnflag"))
      .agg(PortableCountMin.portableCms(col("l_suppkey").cast("string"))
        .as("sketch"))
    li.groupBy(col("l_returnflag"), col("l_suppkey"))
      .agg(count(lit(1)).as("exact_cnt"))
      .join(broadcast(sk), "l_returnflag")
      .withColumn("err",
        PortableCountMin.estimate(col("sketch"),
          col("l_suppkey").cast("string")) - col("exact_cnt"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("err") === 0, 1L).otherwise(0L)).as("n_exact"),
        max(col("err")).as("max_err"),
        sum(col("err")).as("sum_err"))
      .select(col("l_returnflag"), col("n_keys"), col("n_exact"),
        col("max_err"), col("sum_err"),
        expr("sum_err * 1000000 div n_keys").as("mean_err_ppm"))
      .orderBy("l_returnflag")
  }

  private val cmsErrorAuditSql = {
    val bucketOf = cmsBucketOf _
    s"""WITH $cmsGridCtes,
       |exact AS (
       |  SELECT l_returnflag, l_suppkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt
       |  FROM lineitem GROUP BY 1, 2),
       |est AS (
       |  SELECT e.l_returnflag, e.l_suppkey, e.exact_cnt,
       |    CAST(MIN(c.c) AS BIGINT) AS cms_est
       |  FROM exact e JOIN counters c
       |    ON c.l_returnflag = e.l_returnflag
       |   AND c.bucket = ${bucketOf("CAST(c.d AS VARCHAR)", "CAST(e.l_suppkey AS VARCHAR)")}
       |  GROUP BY 1, 2, 3)
       |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_keys,
       |  CAST(SUM(CASE WHEN cms_est = exact_cnt THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_exact,
       |  CAST(MAX(cms_est - exact_cnt) AS BIGINT) AS max_err,
       |  CAST(SUM(cms_est - exact_cnt) AS BIGINT) AS sum_err,
       |  CAST(SUM(cms_est - exact_cnt) * 1000000 // COUNT(*) AS BIGINT)
       |    AS mean_err_ppm
       |FROM est GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** a05: portable histogram quantiles — the engine-portable answer to
    * a02's native (rows-only) quantile sketch: a fixed
    * [[histBuckets]]-cell equi-width histogram per order status, with
    * p50/p95/p99 estimated by the first bucket whose running count
    * crosses the rank. Every ingredient is deterministic in both
    * engines (one min/max scan for the edges, integer bucket counts,
    * integral rank thresholds), so unlike percentile_approx the whole
    * result carries a cell-exact oracle.
    *
    * Scale: the histogram is a partial-agged count on (status, bucket)
    * — ≤ statuses × [[histBuckets]] cells of shuffle regardless of row
    * count — and the quantile walk happens on those cells, never a
    * global sort of the data (that is q27's exact-median job; this is
    * the 100 TB profiling pass). */
  val histBuckets = 128

  def histogramQuantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, dir, "orders")
      .select(col("o_orderstatus").as("st"),
        col("o_totalprice").cast("double").as("x"))
    val rng = o.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val h = o.crossJoin(broadcast(rng))
      .withColumn("b", least(lit(histBuckets - 1),
        floor((col("x") - col("lo")) /
          ((col("hi") - col("lo")) / lit(histBuckets.toDouble))).cast("int")))
      .groupBy(col("st"), col("b")).agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy(col("st")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.withColumn("cum", sum(col("c")).over(wcum))
    val tot = cum.groupBy(col("st")).agg(max(col("cum")).as("n"))
    def pickB(p: Double) =
      min(when(col("cum") >= ceil(col("n") * lit(p)), col("b")))
    def edge(b: Column) =
      col("lo") + b * ((col("hi") - col("lo")) / lit(histBuckets.toDouble))
    cum.join(broadcast(tot), "st")
      .groupBy(col("st"))
      .agg(max(col("n")).as("n"), pickB(0.5).as("b50"),
        pickB(0.95).as("b95"), pickB(0.99).as("b99"))
      .crossJoin(broadcast(rng))
      .select(col("st").as("o_orderstatus"), col("n"),
        edge(col("b50")).as("est_p50"),
        edge(col("b95")).as("est_p95"),
        edge(col("b99")).as("est_p99"))
      .orderBy("o_orderstatus")
  }

  private val histogramQuantilesSql =
    s"""WITH o AS (
       |  SELECT o_orderstatus AS st, CAST(o_totalprice AS DOUBLE) AS x
       |  FROM orders),
       |rng AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM o),
       |h AS (
       |  SELECT st, LEAST(${histBuckets - 1},
       |    CAST(FLOOR((x - lo) / ((hi - lo) / $histBuckets.0)) AS INT)) AS b,
       |    COUNT(*) AS c
       |  FROM o CROSS JOIN rng GROUP BY 1, 2),
       |cum AS (
       |  SELECT st, b, SUM(c) OVER (PARTITION BY st ORDER BY b
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM h),
       |tot AS (SELECT st, MAX(cum) AS n FROM cum GROUP BY st),
       |pick AS (
       |  SELECT c.st, MAX(t.n) AS n,
       |    MIN(CASE WHEN c.cum >= CEIL(t.n * 0.5) THEN c.b END) AS b50,
       |    MIN(CASE WHEN c.cum >= CEIL(t.n * 0.95) THEN c.b END) AS b95,
       |    MIN(CASE WHEN c.cum >= CEIL(t.n * 0.99) THEN c.b END) AS b99
       |  FROM cum c JOIN tot t ON c.st = t.st GROUP BY c.st)
       |SELECT p.st AS o_orderstatus, CAST(p.n AS BIGINT) AS n,
       |  lo + p.b50 * ((hi - lo) / $histBuckets.0) AS est_p50,
       |  lo + p.b95 * ((hi - lo) / $histBuckets.0) AS est_p95,
       |  lo + p.b99 * ((hi - lo) / $histBuckets.0) AS est_p99
       |FROM pick p CROSS JOIN rng ORDER BY o_orderstatus""".stripMargin

  /** a06: join-key skew profile — the pre-flight check before any
    * 100 TB join: per candidate key, distinct-key count, the hottest
    * key's row count, and the max/mean skew ratio (the number that
    * decides between a plain hash join, AQE skew splitting, and
    * [[graft.operators.Skew.saltedJoin]]). One partial-agged groupBy
    * per key — the per-key count relation never leaves the executors;
    * the profile rows are 3 × a handful of scalars. */
  def skewProfile(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    def prof(k: String): DataFrame =
      li.groupBy(col(k).as("key")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"),
          count(lit(1)).as("n_distinct"),
          max(col("c")).as("max_cnt"))
        .select(lit(k).as("join_key"), col("n_rows"), col("n_distinct"),
          col("max_cnt"),
          round(col("n_rows").cast("double") / col("n_distinct"), 4)
            .as("avg_cnt"),
          round(col("max_cnt").cast("double") * col("n_distinct") / col("n_rows"), 4)
            .as("skew_ratio"))
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(prof)
      .reduce(_ unionByName _)
      .orderBy("join_key")
  }

  private val skewProfileSql = {
    val one = (k: String) =>
      s"""SELECT '$k' AS join_key,
         |  CAST(SUM(c) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |  CAST(MAX(c) AS BIGINT) AS max_cnt,
         |  ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 4) AS avg_cnt,
         |  ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 4) AS skew_ratio
         |FROM (SELECT $k, COUNT(*) AS c FROM lineitem GROUP BY $k)""".stripMargin
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(one)
      .mkString("", "\nUNION ALL\n", "\nORDER BY join_key")
  }

  /** a07: sketch set algebra — the property that makes sketches the
    * 100 TB tool: portable-HLL sketches of the A-flag and R-flag part
    * sets, their UNION (a sketch over the combined stream — register
    * max-merge, so per-day/per-partition sketches combine without
    * rescanning), and the INTERSECTION estimated by inclusion-exclusion
    * over the raw estimates, all next to exact answers. Conditional
    * sketching (`when(cond, key)` — nulls skip the update) builds all
    * three sketches in ONE pass over the fact table. */
  def sketchSetOps(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHll.portableHll
    val k = col("l_partkey").cast("string")
    val isA = col("l_returnflag") === "A"
    val isR = col("l_returnflag") === "R"
    val li = t(s, dir, "lineitem")
    // sketches and exact distincts aggregate SEPARATELY: mixing a
    // TypedImperativeAggregate with multi-distinct aggs forces the
    // whole (Expand-multiplied) stream through one object/sort
    // aggregate — split, each side plans its best operator and the
    // recombine is a 1-row × 1-row join (measured ~2× on this query)
    val sk = li.agg(
      portableHll(when(isA, k)).as("ha"),
      portableHll(when(isR, k)).as("hr"),
      portableHll(when(isA || isR, k)).as("hu"))
    val ex = li.agg(
      countDistinct(when(isA, k)).as("exact_a"),
      countDistinct(when(isR, k)).as("exact_r"),
      countDistinct(when(isA || isR, k)).as("exact_union"))
    sk.crossJoin(broadcast(ex))
      .select(
        round(col("ha.estimate"), 4).as("est_a"),
        col("ha.harmonic_sum").as("hs_a"),
        round(col("hr.estimate"), 4).as("est_r"),
        col("hr.harmonic_sum").as("hs_r"),
        round(col("hu.estimate"), 4).as("est_union"),
        col("hu.harmonic_sum").as("hs_union"),
        round(col("ha.estimate") + col("hr.estimate") - col("hu.estimate"), 4)
          .as("est_intersection"),
        col("exact_a"), col("exact_r"), col("exact_union"),
        (col("exact_a") + col("exact_r") - col("exact_union"))
          .as("exact_intersection"))
  }

  /** DuckDB twin: the a03 register chain computed per subset (A, R,
    * A∪R) via conditional hashing, identical estimator arithmetic,
    * inclusion-exclusion over the raw (unrounded) estimates. */
  private val sketchSetOpsSql = {
    def chain(name: String, pred: String) =
      s"""zd_$name AS (
         |  SELECT md5(CAST(l_partkey AS VARCHAR)) AS hx,
         |    len(regexp_extract(substring(md5(CAST(l_partkey AS VARCHAR)), 3, 12), '^0*')) AS nz
         |  FROM lineitem WHERE $pred),
         |rr_$name AS (
         |  SELECT
         |    ((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
         |     (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1)) % 64 AS reg,
         |    CASE WHEN nz = 12 THEN 49
         |      ELSE 4 * nz + 1 +
         |        CASE WHEN strpos('0123456789abcdef', substring(hx, 3 + nz, 1)) - 1 >= 8 THEN 0
         |             WHEN strpos('0123456789abcdef', substring(hx, 3 + nz, 1)) - 1 >= 4 THEN 1
         |             WHEN strpos('0123456789abcdef', substring(hx, 3 + nz, 1)) - 1 >= 2 THEN 2
         |             ELSE 3 END
         |    END AS rank
         |  FROM zd_$name),
         |st_$name AS (
         |  SELECT CAST(SUM((1::BIGINT << (50 - r))) + (64 - COUNT(*)) * (1::BIGINT << 50) AS BIGINT) AS hs
         |  FROM (SELECT reg, MAX(rank) AS r FROM rr_$name GROUP BY reg))"""
    def est(name: String) =
      s"""(0.7213 / (1.0 + 1.079 / 64.0) * 64.0 * 64.0 * 1125899906842624.0
         |  / CAST(st_$name.hs AS DOUBLE))""".stripMargin
    s"""WITH ${chain("a", "l_returnflag = 'A'")},
       |${chain("r", "l_returnflag = 'R'")},
       |${chain("u", "l_returnflag IN ('A', 'R')")},
       |ex AS (
       |  SELECT
       |    CAST(COUNT(DISTINCT CASE WHEN l_returnflag = 'A' THEN l_partkey END) AS BIGINT) AS exact_a,
       |    CAST(COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_partkey END) AS BIGINT) AS exact_r,
       |    CAST(COUNT(DISTINCT CASE WHEN l_returnflag IN ('A', 'R') THEN l_partkey END) AS BIGINT) AS exact_union
       |  FROM lineitem)
       |SELECT
       |  ROUND(${est("a")}, 4) AS est_a, st_a.hs AS hs_a,
       |  ROUND(${est("r")}, 4) AS est_r, st_r.hs AS hs_r,
       |  ROUND(${est("u")}, 4) AS est_union, st_u.hs AS hs_union,
       |  ROUND(${est("a")} + ${est("r")} - ${est("u")}, 4) AS est_intersection,
       |  exact_a, exact_r, exact_union,
       |  exact_a + exact_r - exact_union AS exact_intersection
       |FROM st_a, st_r, st_u, ex""".stripMargin
  }

  /** a08: portable-Bloom semi-join pre-filter — the membership sketch
    * ([[graft.functions.PortableBloom]]) in its 100 TB role: build a
    * filter over the BUILDING-segment customer keys (the small side),
    * broadcast it, and probe every order map-side. Per order status
    * the report shows total orders, orders passing the filter, and
    * the exact semi-join count — bloom_pass ≥ exact_match always (no
    * false negatives), and the gap IS the measured false-positive
    * rate. The whole bit array is md5'd into the output, so the
    * oracle hash-checks the sketch itself (the a03/a04 contract).
    *
    * The geometry is SIZED BY THE KEY COUNT (r9,
    * [[graft.functions.PortableBloom.bloomParamsFor]]): the previous
    * fixed 4,096 bits was 94 %-loaded at sf0.1's 2,943 keys with
    * fpp ≈ 0.79 — a prefilter passing 4 of 5 absent keys, i.e.
    * silently inert (a16 had been measuring exactly that). Sizing at
    * 16 bits/key keeps load ≤ 22 % and fpp ≤ ~2,400 ppm at ANY corpus
    * size up to the 8 MB broadcast ceiling, and the count() that pays
    * for it runs on the dimension side only. The oracle computes the
    * SAME size from the same COUNT, so the sizing formula itself is
    * contract-checked (the emitted `bits` column pins it readably).
    *
    * Scale shape: the filter aggregates the dimension side only (OR
    * of bits/8-byte states, partition-invariant); the probe is a
    * broadcast of one word-array row + codegen'd bit arithmetic per
    * fact row — no shuffle of the fact table at all. At 100 TB this
    * runs BEFORE the real semi-join and drops ≥ 99.7 % of
    * non-matching rows at the scan. */
  def bloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableBloom
    val keys = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val (bits, depth) = PortableBloom.bloomParamsFor(keys.count())
    val sk = keys.agg(
      PortableBloom.portableBloom(col("c_custkey").cast("string"),
        bits, depth).as("sketch"))
    val exactFlag = keys
      .select(col("c_custkey").as("o_custkey"), lit(1L).as("is_bldg"))
    t(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_custkey"))
      .crossJoin(broadcast(sk))
      .join(broadcast(exactFlag), Seq("o_custkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(PortableBloom.hit(col("sketch"),
          col("o_custkey").cast("string"), bits, depth), 1L).otherwise(0L))
          .as("bloom_pass"),
        sum(coalesce(col("is_bldg"), lit(0L))).as("exact_match"),
        first(md5(concat_ws(",", col("sketch").cast("array<string>"))))
          .as("sketch_md5"))
      .withColumn("bits", lit(bits.toLong))
      .orderBy("o_orderstatus")
  }

  /** Shared DuckDB spelling of the SIZED portable-Bloom build+probe
    * over the BUILDING customer keys: `params` computes bits from the
    * key COUNT with the [[graft.functions.PortableBloom.bloomParamsFor]]
    * formula (next power of two ≥ 16·n, clamped to [4096, 2^26]);
    * positions take the first FOUR md5 bytes as one 32-bit integer and
    * use its high half for small filters (bits ≤ 65536 — the legacy
    * 4-hex-char grid, bit-identical to the contract default) and the
    * whole for large ones; words OR-fold with bit_or over a densified
    * word grid (zeros included). Produces CTEs: keys, params, ds, pos,
    * grid, wordvals, probe (per-order min-over-hash-rows hit). */
  private def bloomSizedCtes: String = {
    import graft.functions.PortableBloom.{depth, wordBits}
    val u32 = (k: String, d: String) => (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substring(md5($d || ':' || $k), $i, 1)) - 1)")
      .foldLeft("CAST(0 AS BIGINT)")((acc, h) => s"($acc * 16 + $h)")
    s"""keys AS (
       |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
       |params AS (
       |  SELECT CAST(LEAST(GREATEST(
       |    POWER(2, CEIL(LOG2(CAST(16 * COUNT(*) AS DOUBLE)))),
       |    4096), 67108864) AS BIGINT) AS bits
       |  FROM keys),
       |ds AS (SELECT unnest(generate_series(0, ${depth - 1})) AS d),
       |pos AS (
       |  SELECT CASE WHEN pr.bits <= 65536
       |    THEN ((${u32("CAST(c_custkey AS VARCHAR)", "CAST(d AS VARCHAR)")}) // 65536) % pr.bits
       |    ELSE (${u32("CAST(c_custkey AS VARCHAR)", "CAST(d AS VARCHAR)")}) % pr.bits
       |    END AS p
       |  FROM keys CROSS JOIN ds CROSS JOIN params pr),
       |grid AS (SELECT unnest(generate_series(
       |  0, (SELECT bits FROM params) // $wordBits - 1)) AS w),
       |wordvals AS (
       |  SELECT g.w, COALESCE(b.v, 0) AS v
       |  FROM grid g LEFT JOIN (
       |    SELECT p // $wordBits AS w, bit_or(1::BIGINT << (p % $wordBits)) AS v
       |    FROM pos GROUP BY 1) b ON g.w = b.w),
       |probe AS (
       |  SELECT o.o_orderkey, o.o_orderstatus, o.o_custkey,
       |    MIN((wv.v >> (op.p % $wordBits)) & 1) AS hit
       |  FROM orders o
       |  CROSS JOIN ds
       |  CROSS JOIN params pr
       |  JOIN LATERAL (SELECT CASE WHEN pr.bits <= 65536
       |    THEN ((${u32("CAST(o.o_custkey AS VARCHAR)", "CAST(ds.d AS VARCHAR)")}) // 65536) % pr.bits
       |    ELSE (${u32("CAST(o.o_custkey AS VARCHAR)", "CAST(ds.d AS VARCHAR)")}) % pr.bits
       |    END AS p) op ON true
       |  JOIN wordvals wv ON wv.w = op.p // $wordBits
       |  GROUP BY 1, 2, 3)""".stripMargin
  }

  /** DuckDB twin: the sized build+probe CTEs ([[bloomSizedCtes]]) +
    * the per-status report with the sketch md5 and chosen bits. */
  private val bloomPrefilterSql =
    s"""WITH $bloomSizedCtes,
       |sk AS (
       |  SELECT md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY w)) AS sketch_md5
       |  FROM wordvals)
       |SELECT p.o_orderstatus,
       |  COUNT(*) AS n_orders,
       |  CAST(SUM(p.hit) AS BIGINT) AS bloom_pass,
       |  CAST(SUM(CASE WHEN p.o_custkey IN (SELECT c_custkey FROM keys)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS exact_match,
       |  MIN(sk.sketch_md5) AS sketch_md5,
       |  MIN(pr.bits) AS bits
       |FROM probe p CROSS JOIN sk CROSS JOIN params pr
       |GROUP BY p.o_orderstatus
       |ORDER BY p.o_orderstatus""".stripMargin

  /** a09: join-cardinality pre-flight — a06's sibling question: not
    * "is the key skewed" but "HOW BIG is the join output, and how much
    * of it comes from the hottest key". For each candidate fact⋈dim
    * join, the exact output size is Σ_k cnt_build(k)·cnt_probe(k) —
    * computed on the per-key COUNT relations (|keys|-sized, partial-
    * agged), never by running the join. The planner-facing numbers: out
    * rows, amplification vs the probe side, the hot key's share (the
    * AQE-vs-saltedJoin decision), and matched key count (broadcast
    * feasibility of the build side).
    *
    * Scale: two partial-agged groupBys + one |keys|-sized equi-join
    * per candidate — the fact table is scanned once per key column and
    * reduced to counts map-side; nothing data-sized shuffles. */
  def joinCardinality(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    def prof(name: String, factKey: String, dim: DataFrame, dimKey: String)
        : DataFrame = {
      val f = li.groupBy(col(factKey).as("k")).agg(count(lit(1)).as("cf"))
      val d = dim.groupBy(col(dimKey).as("k")).agg(count(lit(1)).as("cd"))
      f.join(d, "k")
        .select(col("k"), (col("cf") * col("cd")).as("o"))
        .agg(count(lit(1)).as("matched_keys"),
          sum(col("o")).as("out_rows"),
          max(col("o")).as("max_key_out"))
        .select(lit(name).as("join_key"), col("matched_keys"),
          col("out_rows"), col("max_key_out"),
          round(col("max_key_out").cast("double") / col("out_rows"), 6)
            .as("hot_share"))
    }
    Seq(
      prof("l_orderkey=o_orderkey", "l_orderkey", t(s, dir, "orders"), "o_orderkey"),
      prof("l_partkey=p_partkey", "l_partkey", t(s, dir, "part"), "p_partkey"),
      prof("l_suppkey=s_suppkey", "l_suppkey", t(s, dir, "supplier"), "s_suppkey"))
      .reduce(_ unionByName _)
      .orderBy("join_key")
  }

  private val joinCardinalitySql = {
    def one(name: String, fk: String, dimTable: String, dk: String) =
      s"""SELECT '$name' AS join_key,
         |  CAST(COUNT(*) AS BIGINT) AS matched_keys,
         |  CAST(SUM(o) AS BIGINT) AS out_rows,
         |  CAST(MAX(o) AS BIGINT) AS max_key_out,
         |  ROUND(CAST(MAX(o) AS DOUBLE) / SUM(o), 6) AS hot_share
         |FROM (
         |  SELECT f.k, f.cf * d.cd AS o
         |  FROM (SELECT $fk AS k, COUNT(*) AS cf FROM lineitem GROUP BY 1) f
         |  JOIN (SELECT $dk AS k, COUNT(*) AS cd FROM $dimTable GROUP BY 1) d
         |  ON f.k = d.k)""".stripMargin
    Seq(
      one("l_orderkey=o_orderkey", "l_orderkey", "orders", "o_orderkey"),
      one("l_partkey=p_partkey", "l_partkey", "part", "p_partkey"),
      one("l_suppkey=s_suppkey", "l_suppkey", "supplier", "s_suppkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY join_key")
  }

  // ------------------------------------------------------------- a10
  /** Sketch-cube re-aggregation — the property that makes sketches the
    * 100 TB answer to hierarchical distinct counts: compute the
    * [[PortableHll]] REGISTER VECTORS once at the finest grain
    * (l_returnflag × l_linestatus), then derive every coarser rollup
    * level — per flag, grand total — by per-register max over those
    * leaf vectors, never rescanning the fact. A naive rollup
    * count-distinct re-shuffles the fact once per level; the sketch
    * cube shuffles it once, total, and the leaf relation it
    * re-aggregates is (leaf groups × 64 registers) rows.
    *
    * The exact reference side (native `rollup` + count_distinct) rides
    * along per level, so the output is also an accuracy table. The
    * rolled-up sketch states are hash-checked against DuckDB computing
    * each level DIRECTLY from the rows (GROUPING SETS over the a03
    * register chain) — equality of the two computations IS the proof
    * that the register merge is exact, not approximately compatible.
    * Rolled-up keys use the '*' sentinel (never NULL) so level keys
    * join and hash identically everywhere.
    *
    * The estimate column is `floor(A / S)` with A the α·m²·2⁵⁰
    * numerator pinned as one BIGINT literal — BIGINT÷BIGINT, exact on
    * any engine. (A first cut emitted a03's ROUND(double, 4) form and
    * hash-failed on a 4-dp representability boundary at level 0 — the
    * verify-skill rule caught live; a03's own values just never sit on
    * a boundary.) */
  private val hllEstNum = 3271257763731268608L // round(α·64²·2⁵⁰)
  def sketchRollup(s: SparkSession, dir: String): DataFrame =
    sketchRollupDf(t(s, dir, "lineitem"))

  def sketchRollupDf(li: DataFrame): DataFrame = {
    import graft.functions.PortableHll.portableHllRegs
    // one pass over the fact: leaf register vectors (m ints per leaf)
    val leaf = li
      .groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
      .agg(portableHllRegs(col("l_partkey").cast("string")).as("regs"))
    // persist the leaf cells (|leaves|×64 tiny rows): every rollup
    // level re-aggregates THIS relation — without it each level's
    // lineage replays the corpus-sized register aggregation
    val cells = leaf.select(col("rf"), col("ls"),
      posexplode(col("regs")).as(Seq("idx", "r"))).persist()
    // collapse a (group, idx, r) relation into the a03 sketch state
    def collapse(grouped: DataFrame, level: Int): DataFrame =
      grouped
        .groupBy(col("rfs"), col("lss"))
        .agg(expr("sum(shiftleft(1L, 50 - r))").as("harmonic_sum"),
          expr("sum(CASE WHEN r = 0 THEN 1L ELSE 0L END)")
            .as("zero_registers"))
        .select(lit(level.toLong).as("level"), col("rfs"), col("lss"),
          expr(s"${hllEstNum}L div harmonic_sum").as("hll_estimate"),
          col("harmonic_sum"), col("zero_registers"))
    val lvl2 = collapse(
      cells.select(col("rf").as("rfs"), col("ls").as("lss"), col("r")), 2)
    val lvl1 = collapse(
      cells.groupBy(col("rf").as("rfs"), col("idx"))
        .agg(max(col("r")).as("r"))
        .select(col("rfs"), lit("*").as("lss"), col("r")), 1)
    val lvl0 = collapse(
      cells.groupBy(col("idx")).agg(max(col("r")).as("r"))
        .select(lit("*").as("rfs"), lit("*").as("lss"), col("r")), 0)
    // exact side: one native rollup (the accuracy reference; at real
    // scale you keep only the sketch cube above)
    val exact = li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .select(coalesce(col("l_returnflag"), lit("*")).as("rfs"),
        coalesce(col("l_linestatus"), lit("*")).as("lss"),
        col("exact_parts"))
    lvl2.unionByName(lvl1).unionByName(lvl0)
      .join(exact, Seq("rfs", "lss"))
      .select(col("level"), col("rfs").as("l_returnflag"),
        col("lss").as("l_linestatus"), col("hll_estimate"),
        col("harmonic_sum"), col("zero_registers"), col("exact_parts"))
      .orderBy("level", "l_returnflag", "l_linestatus")
  }

  /** DuckDB twin: the a03 register chain under GROUPING SETS — each
    * level computed directly from the rows; matching the Spark side's
    * merged-from-leaves states proves the merge exact. */
  private val sketchRollupSql =
    """WITH h AS (
      |  SELECT l_returnflag AS rf, l_linestatus AS ls,
      |    md5(CAST(l_partkey AS VARCHAR)) AS hx FROM lineitem),
      |zd AS (
      |  SELECT rf, ls, hx,
      |    len(regexp_extract(substring(hx, 3, 12), '^0*')) AS nz
      |  FROM h),
      |rr AS (
      |  SELECT rf, ls,
      |    ((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
      |     (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1)) % 64 AS reg,
      |    CASE WHEN nz = 12 THEN 49
      |      ELSE 4 * nz + 1 +
      |        CASE WHEN strpos('0123456789abcdef', substring(hx, 3 + nz, 1)) - 1 >= 8 THEN 0
      |             WHEN strpos('0123456789abcdef', substring(hx, 3 + nz, 1)) - 1 >= 4 THEN 1
      |             WHEN strpos('0123456789abcdef', substring(hx, 3 + nz, 1)) - 1 >= 2 THEN 2
      |             ELSE 3 END
      |    END AS rank
      |  FROM zd),
      |regs AS (
      |  SELECT CASE WHEN GROUPING(rf) = 1 THEN '*' ELSE rf END AS rfs,
      |    CASE WHEN GROUPING(ls) = 1 THEN '*' ELSE ls END AS lss,
      |    CAST(GROUPING(rf) + GROUPING(ls) AS BIGINT) AS miss,
      |    reg, MAX(rank) AS r
      |  FROM rr GROUP BY GROUPING SETS ((rf, ls, reg), (rf, reg), (reg))),
      |st AS (
      |  SELECT 2 - miss AS level, rfs, lss,
      |    CAST(SUM((1::BIGINT << (50 - r))) + (64 - COUNT(*)) * (1::BIGINT << 50) AS BIGINT) AS harmonic_sum,
      |    CAST(64 - COUNT(*) AS BIGINT) AS zero_registers
      |  FROM regs GROUP BY 1, 2, 3),
      |ex AS (
      |  SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN '*' ELSE l_returnflag END AS rfs,
      |    CASE WHEN GROUPING(l_linestatus) = 1 THEN '*' ELSE l_linestatus END AS lss,
      |    CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
      |  FROM lineitem
      |  GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ()))
      |SELECT CAST(level AS BIGINT) AS level, rfs AS l_returnflag,
      |  lss AS l_linestatus,
      |  CAST(3271257763731268608 // harmonic_sum AS BIGINT) AS hll_estimate,
      |  harmonic_sum, zero_registers, exact_parts
      |FROM st JOIN ex USING (rfs, lss)
      |ORDER BY level, l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------------- a11
  /** Count-min sketch-cube — a10's rollup story for the SUM-mergeable
    * algebra: leaf [[graft.functions.PortableCountMin]] counter grids
    * (one fact pass, 8 KB per leaf) roll up to the grand total by
    * ELEMENT-WISE ADDITION — where HLL registers merge by max, CMS
    * counters merge by sum, and both make every coarser level free of
    * fact re-scans. The per-level sketch state is md5'd into the
    * output and the oracle computes each level DIRECTLY from the rows
    * (densified counter grid), so equality proves the additive merge
    * exact. n_rows falls out of the state itself (Σ counters = depth
    * × rows — each event increments one counter per hash row). */
  def cmsRollup(s: SparkSession, dir: String): DataFrame =
    cmsRollupDf(t(s, dir, "lineitem"))

  def cmsRollupDf(li: DataFrame): DataFrame = {
    import graft.functions.PortableCountMin
    val leaf = li.groupBy(col("l_returnflag").as("rfs"))
      .agg(PortableCountMin.portableCms(col("l_suppkey").cast("string"))
        .as("arr"))
      .persist()
    val lvl1 = leaf.select(lit(1L).as("level"), col("rfs"),
      md5(concat_ws(",", col("arr").cast("array<string>")))
        .as("sketch_md5"),
      expr(s"aggregate(arr, 0L, (a, x) -> a + x)" +
        s" div ${PortableCountMin.depth}").as("n_rows"))
    val lvl0 = leaf
      .select(posexplode(col("arr")).as(Seq("idx", "c")))
      .groupBy(col("idx")).agg(sum(col("c")).as("c"))
      .agg(md5(concat_ws(",", expr(
        """transform(array_sort(collect_list(struct(idx, c))),
           x -> CAST(x.c AS STRING))"""))).as("sketch_md5"),
        expr(s"sum(c) div ${PortableCountMin.depth}").as("n_rows"))
      .select(lit(0L).as("level"), lit("*").as("rfs"),
        col("sketch_md5"), col("n_rows"))
    lvl1.unionByName(lvl0).orderBy("level", "rfs")
  }

  /** DuckDB twin: the a04 densified counter grid per level, computed
    * directly from the rows — matching the Spark side's added-up leaf
    * grids proves the sum-merge exact. */
  private val cmsRollupSql = {
    import graft.functions.PortableCountMin.{depth, width}
    s"""WITH $cmsGridCtes,
       |leaf AS (
       |  SELECT CAST(1 AS BIGINT) AS level, l_returnflag AS rfs,
       |    md5(string_agg(CAST(c AS VARCHAR), ','
       |      ORDER BY d * $width + bucket)) AS sketch_md5,
       |    CAST(SUM(c) // $depth AS BIGINT) AS n_rows
       |  FROM counters GROUP BY 2),
       |tcell AS (
       |  SELECT d, bucket, CAST(SUM(c) AS BIGINT) AS c
       |  FROM counters GROUP BY 1, 2),
       |tot AS (
       |  SELECT CAST(0 AS BIGINT) AS level, '*' AS rfs,
       |    md5(string_agg(CAST(c AS VARCHAR), ','
       |      ORDER BY d * $width + bucket)) AS sketch_md5,
       |    CAST(SUM(c) // $depth AS BIGINT) AS n_rows
       |  FROM tcell)
       |SELECT * FROM leaf UNION ALL SELECT * FROM tot
       |ORDER BY level, rfs""".stripMargin
  }

  // ------------------------------------------------------------- a13
  /** Histogram-quantile cube — the third mergeable-sketch algebra next
    * to a10 (HLL, max-merge) and a11 (CMS, sum-merge): leaf equi-width
    * bucket-count grids over price cents, computed in ONE fact pass at
    * the finest grain, roll up to every coarser level by ADDING bucket
    * counts; per-level p50/p95 come from integer prefix sums over the
    * rolled grid. A naive percentile rollup re-shuffles (and re-sorts)
    * the fact once per level; this shuffles it once and every level
    * re-aggregates a ≤ groups×[[a13Buckets]]-row grid.
    *
    * Everything that DECIDES is integer: the bucket is
    * `(cents−lo)·B div span` (global [lo,hi] cents bounds, broadcast),
    * rank cuts are cross-multiplied prefix-sum tests (`2·cum ≥ n`,
    * `20·cum ≥ 19·n`), and the estimates are bucket lower bounds in
    * cents — no float touches a choice or a cell (the q63/q68
    * discipline; a05 keeps the float spelling as the contrast). The
    * oracle computes each level DIRECTLY from the rows via GROUPING
    * SETS — equality proves the additive merge exact. */
  val a13Buckets = 256
  def histRollup(s: SparkSession, dir: String): DataFrame =
    histRollupDf(t(s, dir, "lineitem"))

  def histRollupDf(li: DataFrame): DataFrame = {
    val cents = li.select(col("l_returnflag").as("rf"),
      col("l_linestatus").as("ls"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("c"))
    val bounds = cents.agg(min(col("c")).as("lo"),
      (max(col("c")) - min(col("c")) + 1L).as("span"))
    val leaf = cents.crossJoin(broadcast(bounds))
      .select(col("rf"), col("ls"), col("lo"), col("span"),
        expr(s"(c - lo) * $a13Buckets div span").as("b"))
      .groupBy(col("rf"), col("ls"), col("lo"), col("span"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    def rollLevel(grid: DataFrame, lvl: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("rfs"), col("lss"))
      val cum = grid
        .withColumn("cum", sum(col("cnt")).over(
          w.orderBy(col("b"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("cnt")).over(w))
      cum.groupBy(col("rfs"), col("lss"), col("lo"), col("span"))
        .agg(max(col("n")).as("n_rows"),
          min(when(col("cum") * 2 >= col("n"), col("b"))).as("b50"),
          min(when(col("cum") * 20 >= col("n") * 19, col("b"))).as("b95"))
        .select(lit(lvl.toLong).as("level"), col("rfs"), col("lss"),
          col("n_rows"), col("b50"), col("b95"),
          expr(s"lo + (b50 * span) div $a13Buckets").as("est_p50_cents"),
          expr(s"lo + (b95 * span) div $a13Buckets").as("est_p95_cents"))
    }
    val lvl2 = rollLevel(leaf.select(col("rf").as("rfs"),
      col("ls").as("lss"), col("lo"), col("span"), col("b"), col("cnt")), 2)
    val lvl1 = rollLevel(leaf
      .groupBy(col("rf").as("rfs"), col("lo"), col("span"), col("b"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(col("rfs"), lit("*").as("lss"), col("lo"), col("span"),
        col("b"), col("cnt")), 1)
    val lvl0 = rollLevel(leaf
      .groupBy(col("lo"), col("span"), col("b"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(lit("*").as("rfs"), lit("*").as("lss"), col("lo"),
        col("span"), col("b"), col("cnt")), 0)
    lvl2.unionByName(lvl1).unionByName(lvl0)
      .orderBy("level", "rfs", "lss")
  }

  /** DuckDB twin: identical integer bucket/rank math, each level
    * computed directly from the rows under GROUPING SETS — matching
    * the Spark side's added-up leaf grids proves the sum-merge exact. */
  private val histRollupSql =
    s"""WITH c AS (
       |  SELECT l_returnflag AS rf, l_linestatus AS ls,
       |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS c
       |  FROM lineitem),
       |bounds AS (SELECT MIN(c) AS lo, MAX(c) - MIN(c) + 1 AS span FROM c),
       |g AS (
       |  SELECT CASE WHEN GROUPING(rf) = 1 THEN '*' ELSE rf END AS rfs,
       |    CASE WHEN GROUPING(ls) = 1 THEN '*' ELSE ls END AS lss,
       |    CAST(2 - GROUPING(rf) - GROUPING(ls) AS BIGINT) AS level,
       |    lo, span, (c - lo) * $a13Buckets // span AS b,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM c CROSS JOIN bounds
       |  GROUP BY GROUPING SETS ((rf, ls, lo, span, b), (rf, lo, span, b),
       |    (lo, span, b))),
       |p AS (
       |  SELECT level, rfs, lss, lo, span, b, cnt,
       |    SUM(cnt) OVER (PARTITION BY level, rfs, lss ORDER BY b
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(cnt) OVER (PARTITION BY level, rfs, lss) AS n
       |  FROM g)
       |SELECT level, rfs, lss, CAST(MAX(n) AS BIGINT) AS n_rows,
       |  CAST(MIN(CASE WHEN cum * 2 >= n THEN b END) AS BIGINT) AS b50,
       |  CAST(MIN(CASE WHEN cum * 20 >= n * 19 THEN b END) AS BIGINT)
       |    AS b95,
       |  CAST(lo + (MIN(CASE WHEN cum * 2 >= n THEN b END) * span)
       |    // $a13Buckets AS BIGINT) AS est_p50_cents,
       |  CAST(lo + (MIN(CASE WHEN cum * 20 >= n * 19 THEN b END) * span)
       |    // $a13Buckets AS BIGINT) AS est_p95_cents
       |FROM p GROUP BY level, rfs, lss, lo, span
       |ORDER BY level, rfs, lss""".stripMargin

  // ------------------------------------------------------- a14 HLL audit
  /** Integer HLL estimator constant: ⌊α₆₄ · 64² · 2⁵⁰⌋ with
    * α₆₄ = 0.7213/(1 + 1.079/64) — the standard HyperLogLog bias
    * constant, pre-multiplied into the [[graft.functions.PortableHll]]
    * rank domain (each register contributes 2^(50−rank) to the
    * harmonic sum) and FLOORED ONCE into a literal. `est = C div
    * harmonic_sum` is then a pure BIGINT division of exact integers:
    * the float enters only this compile-time constant, never a
    * per-row or per-group computation, so the estimate is
    * engine-bit-identical (a03's ROUND(double) estimate column is
    * value-checked; this one is arithmetic-checked). */
  val hllEstC = 3271257763731268608L

  /** a14: HLL estimation-error audit — a12's discipline applied to
    * the distinct-count sketch: per ship-month, the portable-HLL
    * estimate of distinct orders next to the exact count, the signed
    * error in exact ppm, and whether the group sits inside the
    * 3σ = 3·1.04/√64 ≈ 39 % theoretical envelope. a03 proves the
    * SKETCH STATE is portable (hash-checked registers); a14 measures
    * what the ESTIMATOR built on that state is worth, per group, as a
    * diffable relation — ~84 month-groups give an error DISTRIBUTION
    * where a03's 3 flags give anecdotes.
    *
    * Exactness: harmonic_sum is the sketch's exact BIGINT state;
    * [[hllEstC]] makes the estimate one integer division; error ppm
    * divides exact integers (sign-split floor — the q72 rule — since
    * HLL errs BOTH ways, unlike CMS). Scale: one partial-agged sketch
    * pass (64 registers per group) + one exact distinct (the audit
    * reference — at 100 TB, run on a sampled group set; shape
    * unchanged). */
  def hllErrorAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHll
    t(s, dir, "lineitem")
      .withColumn("grp",
        expr("CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)"))
      .groupBy(col("grp"))
      .agg(PortableHll.portableHll(col("l_orderkey").cast("string"))
          .as("hll"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("grp"), col("hll.harmonic_sum").as("harmonic_sum"),
        col("exact_orders"))
      .withColumn("est_orders", expr(s"${hllEstC}L div harmonic_sum"))
      .withColumn("err_ppm", expr(
        """CASE WHEN est_orders >= exact_orders
           THEN (est_orders - exact_orders) * 1000000 div exact_orders
           ELSE -((exact_orders - est_orders) * 1000000 div exact_orders)
           END"""))
      .withColumn("within_3sigma",
        when(abs(col("err_ppm")) <= 390000L, 1L).otherwise(0L))
      .orderBy("grp")
  }

  private val hllErrorAuditSql =
    s"""WITH base AS (
       |  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
       |    AS grp, l_orderkey
       |  FROM lineitem),
       |h AS (SELECT grp, md5(CAST(l_orderkey AS VARCHAR)) AS hx FROM base),
       |zd AS (
       |  SELECT grp, hx,
       |    len(regexp_extract(substring(hx, 3, 12), '^0*')) AS nz
       |  FROM h),
       |rr AS (
       |  SELECT grp,
       |    ((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
       |     (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1)) % 64 AS reg,
       |    CASE WHEN nz = 12 THEN 49
       |      ELSE 4 * nz + 1 +
       |        CASE WHEN strpos('0123456789abcdef', substring(hx, 3 + nz, 1)) - 1 >= 8 THEN 0
       |             WHEN strpos('0123456789abcdef', substring(hx, 3 + nz, 1)) - 1 >= 4 THEN 1
       |             WHEN strpos('0123456789abcdef', substring(hx, 3 + nz, 1)) - 1 >= 2 THEN 2
       |             ELSE 3 END
       |    END AS rank
       |  FROM zd),
       |regs AS (SELECT grp, reg, MAX(rank) AS r FROM rr GROUP BY 1, 2),
       |st AS (
       |  SELECT grp,
       |    CAST(SUM((1::BIGINT << (50 - r))) + (64 - COUNT(*)) * (1::BIGINT << 50) AS BIGINT) AS harmonic_sum
       |  FROM regs GROUP BY 1),
       |ex AS (
       |  SELECT grp, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders
       |  FROM base GROUP BY 1),
       |e AS (
       |  SELECT st.grp, harmonic_sum, exact_orders,
       |    $hllEstC // harmonic_sum AS est_orders
       |  FROM st JOIN ex USING (grp))
       |SELECT grp, harmonic_sum, exact_orders,
       |  CAST(est_orders AS BIGINT) AS est_orders,
       |  CAST(CASE WHEN est_orders >= exact_orders
       |    THEN (est_orders - exact_orders) * 1000000 // exact_orders
       |    ELSE -((exact_orders - est_orders) * 1000000 // exact_orders)
       |    END AS BIGINT) AS err_ppm,
       |  CAST(CASE WHEN abs(CASE WHEN est_orders >= exact_orders
       |    THEN (est_orders - exact_orders) * 1000000 // exact_orders
       |    ELSE -((exact_orders - est_orders) * 1000000 // exact_orders)
       |    END) <= 390000 THEN 1 ELSE 0 END AS BIGINT) AS within_3sigma
       |FROM e ORDER BY grp""".stripMargin

  // -------------------------------------------------- a15 quantile audit
  /** a15: quantile-estimator error audit — the a12 (CMS) / a14 (HLL)
    * discipline applied to the THIRD sketch family: per order status
    * and level (p50/p95/p99), a05's 128-bucket histogram estimate next
    * to the EXACT percentile, signed error in exact ppm. Completes the
    * audited-sketch set: every approximate structure the engine ships
    * (count, distinct-count, quantile) now carries a measured-error
    * relation instead of a doc claim.
    *
    * Exactness: the exact percentile never touches a float — prices
    * become BIGINT cents, the (status, cents) value-domain histogram
    * (the q76 shape) is walked with ALL-INTEGER rank thresholds
    * (percentile-disc: smallest value whose running count reaches
    * `ceil(n·p)`, spelled `(n+1) div 2`, `(95n+99) div 100`,
    * `(99n+99) div 100`). The a05 estimate side reuses the proven
    * DOUBLE pipeline verbatim and lands as `floor(est·100)` cents —
    * identical IEEE ops on identical inputs in both engines. The error
    * division is sign-split (q72 rule: bucket lower edges usually
    * UNDER-estimate, so the numerator is negative).
    *
    * Scale: the exact side runs on the value-domain histogram (price
    * cents — domain-bounded, the q76 argument), never a global row
    * sort; the estimate side is a05's ≤ statuses × 128 cells. Output
    * is statuses × 3 rows at any scale. */
  def quantileErrorAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vh = t(s, dir, "orders")
      .select(col("o_orderstatus").as("st"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .groupBy(col("st"), col("cents")).agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy(col("st")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vh.withColumn("cum", sum(col("c")).over(wc))
    val tot = cum.groupBy(col("st")).agg(max(col("cum")).as("n"))
    def exactAt(rank: String) =
      min(when(col("cum") >= expr(rank), col("cents")))
    val ex = cum.join(broadcast(tot), "st")
      .groupBy(col("st"))
      .agg(max(col("n")).as("n"),
        exactAt("(n + 1) div 2").as("x50"),
        exactAt("(95 * n + 99) div 100").as("x95"),
        exactAt("(99 * n + 99) div 100").as("x99"))
    val est = histogramQuantiles(s, dir)
      .select(col("o_orderstatus").as("st"),
        expr("CAST(FLOOR(est_p50 * 100) AS BIGINT)").as("e50"),
        expr("CAST(FLOOR(est_p95 * 100) AS BIGINT)").as("e95"),
        expr("CAST(FLOOR(est_p99 * 100) AS BIGINT)").as("e99"))
    ex.join(est, "st")
      .select(col("st"), col("n"), explode(array(
        struct(lit("p50").as("level"), col("x50").as("exact_cents"),
          col("e50").as("est_cents")),
        struct(lit("p95").as("level"), col("x95").as("exact_cents"),
          col("e95").as("est_cents")),
        struct(lit("p99").as("level"), col("x99").as("exact_cents"),
          col("e99").as("est_cents")))).as("l"))
      .select(col("st").as("o_orderstatus"), col("l.level").as("level"),
        col("n"), col("l.exact_cents").as("exact_cents"),
        col("l.est_cents").as("est_cents"))
      .withColumn("err_ppm", expr(
        """CASE WHEN est_cents >= exact_cents
           THEN (est_cents - exact_cents) * 1000000 div exact_cents
           ELSE -((exact_cents - est_cents) * 1000000 div exact_cents)
           END"""))
      .orderBy("o_orderstatus", "level")
  }

  private val quantileErrorAuditSql = {
    val estInner = histogramQuantilesSql.replace("ORDER BY o_orderstatus", "")
    s"""WITH est AS MATERIALIZED ($estInner),
       |vh AS (
       |  SELECT o_orderstatus AS st,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
       |    COUNT(*) AS c
       |  FROM orders GROUP BY 1, 2),
       |cum2 AS (
       |  SELECT st, cents, SUM(c) OVER (PARTITION BY st ORDER BY cents
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM vh),
       |tot2 AS (SELECT st, MAX(cum) AS n FROM cum2 GROUP BY st),
       |ex AS (
       |  SELECT c.st, MAX(t.n) AS n,
       |    MIN(CASE WHEN c.cum >= (t.n + 1) // 2 THEN c.cents END) AS x50,
       |    MIN(CASE WHEN c.cum >= (95 * t.n + 99) // 100 THEN c.cents END) AS x95,
       |    MIN(CASE WHEN c.cum >= (99 * t.n + 99) // 100 THEN c.cents END) AS x99
       |  FROM cum2 c JOIN tot2 t ON c.st = t.st GROUP BY c.st),
       |lv AS (
       |  SELECT e.st, 'p50' AS level, e.n, e.x50 AS exact_cents,
       |    CAST(FLOOR(q.est_p50 * 100) AS BIGINT) AS est_cents
       |  FROM ex e JOIN est q ON e.st = q.o_orderstatus
       |  UNION ALL
       |  SELECT e.st, 'p95', e.n, e.x95,
       |    CAST(FLOOR(q.est_p95 * 100) AS BIGINT)
       |  FROM ex e JOIN est q ON e.st = q.o_orderstatus
       |  UNION ALL
       |  SELECT e.st, 'p99', e.n, e.x99,
       |    CAST(FLOOR(q.est_p99 * 100) AS BIGINT)
       |  FROM ex e JOIN est q ON e.st = q.o_orderstatus)
       |SELECT st AS o_orderstatus, level, CAST(n AS BIGINT) AS n,
       |  exact_cents, est_cents,
       |  CAST(CASE WHEN est_cents >= exact_cents
       |    THEN (est_cents - exact_cents) * 1000000 // exact_cents
       |    ELSE -((exact_cents - est_cents) * 1000000 // exact_cents)
       |    END AS BIGINT) AS err_ppm
       |FROM lv ORDER BY o_orderstatus, level""".stripMargin
  }

  // ------------------------------------------------ a16 Bloom FPR audit
  /** a16: Bloom false-positive-rate audit — the membership sketch joins
    * the audited family (count a12, distinct-count a14, quantile a15):
    * per order status, the ABSENT probes (custkey provably not in the
    * BUILDING set), how many of them a CONTRACT-DEFAULT-geometry
    * filter wrongly passes, the measured FPR in ppm, and the filter's
    * bit LOAD (popcount / bits, ppm) — the two numbers a Bloom is
    * sized by. This audit is deliberately pinned to the 4,096-bit
    * contract default: it end-to-end oracle-locks the default bit
    * grid (build, probe, and popcount at the grid every streaming
    * state snapshot uses), and it is the measurement that CAUGHT the
    * r8 saturation — at sf0.1's 2,943 keys it reads load ≈ 944,000
    * ppm / fpr ≈ 790,000 ppm, which is why a08/e02 now size their
    * production filters by key count ([[bloomSizedAudit]] is the
    * sized-geometry acceptance twin, and SketchAuditSpec enforces
    * both envelopes in `sbt test`).
    *
    * Exactness: hits are the same deterministic md5 bit probes a08
    * hash-checks; popcount is integer (32-bit words — no sign bit in
    * play); rates are floored integer ppm. Scale shape: a08's — the
    * filter builds on the dimension side, broadcasts, and probes
    * map-side; absent-ness comes from the same broadcast key set. */
  def bloomFprAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableBloom
    val keys = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    // popcount hoisted onto the one-row sketch relation (the a17
    // lesson: the per-row fold under the probe agg re-ran 64 words ×
    // every absent row)
    val sk = keys.agg(
      PortableBloom.portableBloom(col("c_custkey").cast("string"))
        .as("sketch"))
      .select(col("sketch"), expr(
        "aggregate(sketch, 0L, (acc, w) -> acc + CAST(bit_count(w) AS BIGINT))")
        .as("sb"))
    val exactFlag = keys
      .select(col("c_custkey").as("o_custkey"), lit(1L).as("is_bldg"))
    t(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_custkey"))
      .crossJoin(broadcast(sk))
      .join(broadcast(exactFlag), Seq("o_custkey"), "left")
      .filter(col("is_bldg").isNull) // audit runs on ABSENT probes only
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_absent"),
        sum(when(PortableBloom.hit(col("sketch"),
          col("o_custkey").cast("string")), 1L).otherwise(0L))
          .as("n_false"),
        first(col("sb")).as("set_bits"))
      .select(col("o_orderstatus"), col("n_absent"), col("n_false"),
        expr("n_false * 1000000 div n_absent").as("fpr_ppm"),
        col("set_bits"),
        expr(s"set_bits * 1000000 div ${PortableBloom.bits}").as("load_ppm"))
      .orderBy("o_orderstatus")
  }

  /** DuckDB twin: a08's bit grid + probe spelling, restricted to absent
    * keys, plus a popcount over the word grid. */
  private val bloomFprAuditSql = {
    import graft.functions.PortableBloom.{bits, depth, wordBits, words}
    val u16 = (k: String, d: String) => (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substring(md5($d || ':' || $k), $i, 1)) - 1)")
      .reduce((acc, h) => s"($acc * 16 + $h)")
    s"""WITH keys AS (
       |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
       |ds AS (SELECT unnest(generate_series(0, ${depth - 1})) AS d),
       |pos AS (
       |  SELECT (${u16("CAST(c_custkey AS VARCHAR)", "CAST(d AS VARCHAR)")}) % $bits AS p
       |  FROM keys CROSS JOIN ds),
       |grid AS (SELECT unnest(generate_series(0, ${words - 1})) AS w),
       |wordvals AS (
       |  SELECT g.w, COALESCE(b.v, 0) AS v
       |  FROM grid g LEFT JOIN (
       |    SELECT p // $wordBits AS w, bit_or(1::BIGINT << (p % $wordBits)) AS v
       |    FROM pos GROUP BY 1) b ON g.w = b.w),
       |pc AS (SELECT CAST(SUM(bit_count(v)) AS BIGINT) AS set_bits
       |       FROM wordvals),
       |probe AS (
       |  SELECT o.o_orderkey, o.o_orderstatus, o.o_custkey,
       |    MIN((wv.v >> (op.p % $wordBits)) & 1) AS hit
       |  FROM orders o
       |  CROSS JOIN ds
       |  JOIN LATERAL (SELECT
       |    (${u16("CAST(o.o_custkey AS VARCHAR)", "CAST(ds.d AS VARCHAR)")}) % $bits AS p) op ON true
       |  JOIN wordvals wv ON wv.w = op.p // $wordBits
       |  WHERE o.o_custkey NOT IN (SELECT c_custkey FROM keys)
       |  GROUP BY 1, 2, 3)
       |SELECT p.o_orderstatus,
       |  COUNT(*) AS n_absent,
       |  CAST(SUM(p.hit) AS BIGINT) AS n_false,
       |  CAST(SUM(p.hit) * 1000000 // COUNT(*) AS BIGINT) AS fpr_ppm,
       |  MIN(pc.set_bits) AS set_bits,
       |  CAST(MIN(pc.set_bits) * 1000000 // $bits AS BIGINT) AS load_ppm
       |FROM probe p CROSS JOIN pc
       |GROUP BY p.o_orderstatus
       |ORDER BY p.o_orderstatus""".stripMargin
  }

  // --------------------------------------------- a17 sized-Bloom audit
  /** a17: sized-geometry Bloom acceptance audit — the contract-default
    * filter and the [[graft.functions.PortableBloom.bloomParamsFor]]-
    * sized filter built over the SAME key set (a08's BUILDING
    * customers) and probed with the SAME absent keys (every order row
    * whose custkey is provably not BUILDING), one row per geometry:
    * chosen bits, key count, popcount load (ppm) and measured
    * false-positive rate (ppm). This is the acceptance test the r8
    * verdict asked for: the `contract_4096` row shows the saturation
    * a16 had been reporting (~94 % load, ~790,000 ppm fpp at sf0.1),
    * the `sized` row shows the same keys under the sized geometry at
    * ≤ 221,000 ppm load / ≤ ~2,400 ppm fpp — and SketchAuditSpec
    * turns the sized row's envelope into an `sbt test` failure, so a
    * future geometry or scale drift cannot ship silently again.
    *
    * Exactness: identical md5 bit probes to a08/a16; integer
    * popcounts and floored integer ppm. Scale shape: two dimension-
    * side aggregates + one broadcast probe pass over the fact table —
    * nothing data-sized shuffles. */
  def bloomSizedAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableBloom
    import graft.functions.PortableBloom.bloomParamsFor
    val keys = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val (bits, depth) = bloomParamsFor(keys.count())
    val popcnt = (c: String) =>
      expr(s"aggregate($c, 0L, (acc, w) -> acc + CAST(bit_count(w) AS BIGINT))")
    // Popcounts are properties of the ONE-ROW sketch relation — compute
    // them here, once. Inside the probe-side agg the identical fold
    // re-ran per absent row (interpreted ArrayAggregate × 15 M rows ×
    // 8 K sized-geometry words at sf1 — the straggler task that stalled
    // the round-9 sf1 sweep; row-invariant expressions never belong
    // under a row-sized aggregate).
    val sk = keys.agg(
      PortableBloom.portableBloom(col("c_custkey").cast("string"))
        .as("skd"),
      PortableBloom.portableBloom(col("c_custkey").cast("string"),
        bits, depth).as("sks"),
      count(lit(1)).as("n_keys"))
      .select(col("skd"), col("sks"), col("n_keys"),
        popcnt("skd").as("sbd"), popcnt("sks").as("sbs"))
    t(s, dir, "orders")
      .select(col("o_custkey"))
      .join(broadcast(keys.select(col("c_custkey").as("o_custkey"))),
        Seq("o_custkey"), "left_anti") // audit runs on ABSENT probes only
      .crossJoin(broadcast(sk))
      .agg(
        first(col("n_keys")).as("n_keys"),
        count(lit(1)).as("n_absent"),
        sum(when(PortableBloom.hit(col("skd"),
          col("o_custkey").cast("string")), 1L).otherwise(0L)).as("nfd"),
        sum(when(PortableBloom.hit(col("sks"),
          col("o_custkey").cast("string"), bits, depth), 1L).otherwise(0L))
          .as("nfs"),
        first(col("sbd")).as("sbd"),
        first(col("sbs")).as("sbs"))
      .select(explode(array(
        struct(lit("contract_4096").as("geometry"),
          lit(PortableBloom.bits.toLong).as("bits"), col("n_keys"),
          col("sbd").as("set_bits"), col("n_absent"),
          col("nfd").as("n_false")),
        struct(lit("sized").as("geometry"),
          lit(bits.toLong).as("bits"), col("n_keys"),
          col("sbs").as("set_bits"), col("n_absent"),
          col("nfs").as("n_false")))).as("r"))
      .select(col("r.*"))
      .withColumn("load_ppm", expr("set_bits * 1000000 div bits"))
      .withColumn("fpr_ppm", expr("n_false * 1000000 div n_absent"))
      .orderBy("geometry")
  }

  /** DuckDB twin: the sized build+probe CTEs + an a16-spelled default-
    * geometry build+probe over the same keys, both restricted to
    * absent order rows, unioned one row per geometry. */
  private val bloomSizedAuditSql = {
    import graft.functions.PortableBloom.{bits, depth, wordBits, words}
    val u16 = (k: String, d: String) => (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substring(md5($d || ':' || $k), $i, 1)) - 1)")
      .reduce((acc, h) => s"($acc * 16 + $h)")
    s"""WITH $bloomSizedCtes,
       |pcs AS (SELECT CAST(SUM(bit_count(v)) AS BIGINT) AS set_bits
       |        FROM wordvals),
       |posd AS (
       |  SELECT (${u16("CAST(c_custkey AS VARCHAR)", "CAST(d AS VARCHAR)")}) % $bits AS p
       |  FROM keys CROSS JOIN ds),
       |gridd AS (SELECT unnest(generate_series(0, ${words - 1})) AS w),
       |wordvalsd AS (
       |  SELECT g.w, COALESCE(b.v, 0) AS v
       |  FROM gridd g LEFT JOIN (
       |    SELECT p // $wordBits AS w, bit_or(1::BIGINT << (p % $wordBits)) AS v
       |    FROM posd GROUP BY 1) b ON g.w = b.w),
       |pcd AS (SELECT CAST(SUM(bit_count(v)) AS BIGINT) AS set_bits
       |        FROM wordvalsd),
       |probed AS (
       |  SELECT o.o_orderkey, o.o_custkey,
       |    MIN((wv.v >> (op.p % $wordBits)) & 1) AS hit
       |  FROM orders o
       |  CROSS JOIN ds
       |  JOIN LATERAL (SELECT
       |    (${u16("CAST(o.o_custkey AS VARCHAR)", "CAST(ds.d AS VARCHAR)")}) % $bits AS p) op ON true
       |  JOIN wordvalsd wv ON wv.w = op.p // $wordBits
       |  WHERE o.o_custkey NOT IN (SELECT c_custkey FROM keys)
       |  GROUP BY 1, 2),
       |nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys FROM keys),
       |rowd AS (
       |  SELECT 'contract_4096' AS geometry, CAST($bits AS BIGINT) AS bits,
       |    nk.n_keys, pcd.set_bits,
       |    CAST(COUNT(*) AS BIGINT) AS n_absent,
       |    CAST(SUM(p.hit) AS BIGINT) AS n_false
       |  FROM probed p CROSS JOIN nk CROSS JOIN pcd
       |  GROUP BY 1, 2, 3, 4),
       |rows_ AS (
       |  SELECT 'sized' AS geometry, pr.bits, nk.n_keys, pcs.set_bits,
       |    CAST(COUNT(*) AS BIGINT) AS n_absent,
       |    CAST(SUM(p.hit) AS BIGINT) AS n_false
       |  FROM probe p CROSS JOIN nk CROSS JOIN pcs CROSS JOIN params pr
       |  WHERE p.o_custkey NOT IN (SELECT c_custkey FROM keys)
       |  GROUP BY 1, 2, 3, 4)
       |SELECT geometry, bits, n_keys, set_bits, n_absent, n_false,
       |  CAST(set_bits * 1000000 // bits AS BIGINT) AS load_ppm,
       |  CAST(n_false * 1000000 // n_absent AS BIGINT) AS fpr_ppm
       |FROM (SELECT * FROM rowd UNION ALL SELECT * FROM rows_)
       |ORDER BY geometry""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a17_bloom_sized_audit" -> bloomSizedAudit _,
    "a16_bloom_fpr_audit" -> bloomFprAudit _,
    "a15_quantile_error_audit" -> quantileErrorAudit _,
    "a14_hll_error_audit" -> hllErrorAudit _,
    "a13_hist_rollup" -> histRollup _,
    "a12_cms_error_audit" -> cmsErrorAudit _,
    "a11_cms_rollup" -> cmsRollup _,
    "a10_sketch_rollup" -> sketchRollup _,
    "a01_hll_distinct" -> hllDistinct _,
    "a02_percentiles"  -> percentiles _,
    "a03_portable_hll" -> portableHllDistinct _,
    "a04_cms_heavy_hitters" -> cmsHeavyHitters _,
    "a05_hist_quantiles" -> histogramQuantiles _,
    "a06_skew_profile" -> skewProfile _,
    "a07_sketch_setops" -> sketchSetOps _,
    "a08_bloom_prefilter" -> bloomPrefilter _,
    "a09_join_cardinality" -> joinCardinality _)

  /** a01/a02 rows-only (native sketches aren't portable); a03+ are. */
  val oracle: Map[String, String] = Map(
    "a17_bloom_sized_audit" -> bloomSizedAuditSql,
    "a16_bloom_fpr_audit" -> bloomFprAuditSql,
    "a15_quantile_error_audit" -> quantileErrorAuditSql,
    "a14_hll_error_audit" -> hllErrorAuditSql,
    "a13_hist_rollup" -> histRollupSql,
    "a12_cms_error_audit" -> cmsErrorAuditSql,
    "a11_cms_rollup" -> cmsRollupSql,
    "a10_sketch_rollup" -> sketchRollupSql,
    "a03_portable_hll" -> portableHllSql,
    "a04_cms_heavy_hitters" -> cmsHeavyHittersSql,
    "a05_hist_quantiles" -> histogramQuantilesSql,
    "a06_skew_profile" -> skewProfileSql,
    "a07_sketch_setops" -> sketchSetOpsSql,
    "a08_bloom_prefilter" -> bloomPrefilterSql,
    "a09_join_cardinality" -> joinCardinalitySql)
}
