package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a01_hll_distinct" -> hllDistinct _,
    "a02_percentiles"  -> percentiles _,
    "a03_portable_hll" -> portableHllDistinct _)

  /** a01/a02 rows-only (native sketches aren't portable); a03 is. */
  val oracle: Map[String, String] = Map(
    "a03_portable_hll" -> portableHllSql)
}
