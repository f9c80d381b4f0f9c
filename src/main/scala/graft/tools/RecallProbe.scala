package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Similarity

/** ANN recall probe: recall@k of each approximate index (LSH, trained
  * IVF, PQ, IVF∘PQ) against the exact brute-force top-k, on a real
  * embeddings table. The unit specs pin recall on synthetic clustered
  * data; this measures the same number at a data scale (`.sfscale/sf1`)
  * where cell routing and code quantization actually face noise —
  * the figure a user sizes `numCells`/`nbits` against.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.RecallProbe <sfDir>"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embs = Tables.t(spark, sfDir, "embeddings")
    def pairs(df: DataFrame): DataFrame =
      df.select(col("query_id"), col("neighbor_id"))

    val exact = pairs(Similarity.bruteForceTopKDf(embs)).persist()
    val nExact = exact.count()
    // the corpus-size-keyed cell count (r11, VERDICT-r10 ask #6): the
    // production IVF search wants the SAME sized geometry the s19/s20
    // corpus-sized consumers run on — these rows measure the recall
    // price of the sized candidate volume at 1/2/4 probes, so search
    // and kNN-graph share one scale posture (contract defaults stay
    // oracle-locked at 8 cells / 2 probes)
    val nSized = Similarity.cellsParamsFor(embs.count())
    val methods = Seq(
      "lsh"      -> Similarity.lshTopKDf(embs),
      "ivf"      -> Similarity.ivfTopKDf(embs),
      // the nCells/nProbes trade at fixed probed volume and beyond —
      // recall should rise with probed fraction nProbes/nCells
      "ivf_8_4"  -> Similarity.ivfTopKDf(embs, 8, 4),
      "ivf_16_4" -> Similarity.ivfTopKDf(embs, 16, 4),
      "ivf_32_8" -> Similarity.ivfTopKDf(embs, 32, 8),
      s"ivf_sized_${nSized}_2" -> Similarity.ivfTopKDf(embs, nSized, 2),
      s"ivf_sized_${nSized}_4" -> Similarity.ivfTopKDf(embs, nSized, 4),
      s"ivf_sized_${nSized}_8" -> Similarity.ivfTopKDf(embs, nSized, 8),
      // the r12 probesFor operating point: probes sized to hold the
      // contract probed fraction (2/8) at the sized cell count — the
      // row that shows the s22 formula buys contract-level recall
      // back at scale, not just at gate geometry
      s"ivf_sized_${nSized}_p${Similarity.probesFor(nSized)}" ->
        Similarity.ivfTopKDf(embs, nSized, Similarity.probesFor(nSized)),
      "pq"       -> Similarity.pqTopKDf(embs),
      "ivfpq"    -> Similarity.ivfPqTopKDf(embs))
    val recalls = methods.map { case (name, df) =>
      val hit = pairs(df).join(exact, Seq("query_id", "neighbor_id")).count()
      name -> hit.toDouble / nExact
    }
    val qCount = exact.select(col("query_id")).distinct().count()
    val body = recalls.map { case (n, r) => f""""$n":$r%.4f""" }.mkString(",")
    println(
      f"""{"sf":"$sfDir","queries":$qCount,"k":${Similarity.topK},"exact_pairs":$nExact,"recall":{$body}}""")
    spark.stop()
  }
}
