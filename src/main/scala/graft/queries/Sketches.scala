package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Sketch/approximate aggregations (SURVEY.md §2.4: HLL et al.). These
  * have no DuckDB oracle — sketch implementations differ across engines
  * by design — so they are declared rows-only and accuracy-tested in
  * SketchesSpec against their exact counterparts. */
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a01_hll_distinct" -> hllDistinct _,
    "a02_percentiles"  -> percentiles _)

  /** Deliberately empty: rows-only checks (sketches aren't portable). */
  val oracle: Map[String, String] = Map.empty
}
