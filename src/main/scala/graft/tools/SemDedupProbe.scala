package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Dedup

/** Semantic-dedup retention probe: the d13 prune rate as a function of
  * the distance threshold, plus the quantizer's cell-occupancy profile
  * (the quantity that governs the in-cell pair work Σ occ²). The d13
  * contract threshold is oracle-locked; this measures the curve a user
  * tunes it against per corpus — retention targets like SemDeDup's
  * "remove 50% of web data" are picked off exactly this table.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.SemDedupProbe <sfDir>"
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-semdedup-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embs = Tables.t(spark, sfDir, "embeddings")
    val n = embs.count()

    // cell occupancy at the contract quantizer (pair work = Σ occ²/2)
    val occ = Dedup.semDedupDf(embs).groupBy("cell").count()
      .agg(max("count").as("mx"), avg("count").as("mean"),
        sum(col("count") * col("count")).as("sum_sq"))
      .collect()(0)
    println(f"cells: n=$n%d max_occ=${occ.getLong(0)}%d " +
      f"mean_occ=${occ.getDouble(1)}%.1f pair_work=${occ.getLong(2) / 2}%d")

    val thresholds = Seq(1000000L, 1150000L, 1300000L, 1450000L, 1600000L)
    thresholds.foreach { t =>
      val pruned = Dedup.semDedupDf(embs, t)
        .agg(sum("pruned")).collect()(0).getLong(0)
      val retained = n - pruned
      println(f"threshold=$t%d pruned=$pruned%d retained=$retained%d " +
        f"retention=${retained.toDouble / n}%.3f")
    }
    spark.stop()
  }
}
