package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Graph

/** Wedge-skew probe for g02's oriented⋈oriented self-join.
  *
  * The wedge join hashes on the center `u`, so the work a shuffle
  * partition receives is Σ deg⁺(u)² over the u's it owns. AQE's
  * skew-split only matters if that mass is concentrated: this tool
  * measures it directly — out-degree extremes vs the O(√m) orientation
  * bound, and the max/mean wedge mass across `spark.sql.shuffle
  * .partitions` hash buckets — so SCALING.md can pin a measured answer
  * instead of a guess.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.SkewProbe <sfDir>"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = cpus.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-skew-probe")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val oriented = Graph.orientedEdgesDf(Tables.t(spark, sfDir, "lineitem"))
      .persist()
    val m = oriented.count()

    val outDeg = oriented.groupBy(col("u")).agg(count(lit(1)).as("dplus"))
      .persist()
    val stats = outDeg.agg(
      count(lit(1)).as("centers"),
      max(col("dplus")).as("max_dplus"),
      avg(col("dplus")).as("mean_dplus"),
      sum(col("dplus") * col("dplus")).as("wedge_mass")).collect()(0)

    // wedge mass per hash bucket at the session's partition count —
    // exactly the shuffle layout the wedge join's exchange produces
    val buckets = outDeg
      .groupBy(pmod(hash(col("u")), lit(parts)).as("bucket"))
      .agg(sum(col("dplus") * col("dplus")).as("mass"))
    val b = buckets.agg(
      max(col("mass")).as("max_mass"),
      avg(col("mass")).as("mean_mass"),
      count(lit(1)).as("nonempty_buckets")).collect()(0)

    val top = outDeg.orderBy(col("dplus").desc).limit(10).collect()
      .map(r => s"${r.get(0)}:${r.get(1)}").mkString("[", ",", "]")

    val sqrtM = math.sqrt(m.toDouble)
    println(
      f"""{"sf":"$sfDir","edges":$m,"sqrt_m":$sqrtM%.1f,"centers":${stats.getLong(0)},"max_dplus":${stats.getLong(1)},"mean_dplus":${stats.getDouble(2)}%.2f,"wedge_mass":${stats.getLong(3)},"buckets":$parts,"nonempty_buckets":${b.getLong(2)},"max_bucket_mass":${b.getLong(0)},"mean_bucket_mass":${b.getDouble(1)}%.1f,"bucket_skew":${b.getLong(0) / b.getDouble(1)}%.2f,"top_centers":$top}""")
    spark.stop()
  }
}
