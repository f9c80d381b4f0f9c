package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Similarity

/** Clamp-boundary probe for the two-level coarse quantizer (r11,
  * VERDICT-r10 ask #2): measures the in-cell pair volume Σ|c|² of
  * (a) the SINGLE-level index clamped at `clamp` cells — what the r10
  * engine degrades to past its cell ceiling (n²/clamp growth) — vs
  * (b) the TWO-level index [[Similarity.hierParamsFor]] switches to at
  * the same clamp (leaf volume ~n·targetCellSize, linear).
  *
  * The production boundary sits at maxCells·targetCellSize ≈ 16.8 M
  * vectors — unreachable for a local sweep — so the probe takes the
  * clamp as an argument: a 16-cell clamp puts the boundary at 4,096
  * vectors, and running the probe at sf0.1 (below) and sf1/sf5 (above,
  * GenScale) shows the pair-volume crossing ON REAL DATA with the
  * exact production split arithmetic (the clamp only scales the
  * boundary, not the formula). Σ|c|² is computed from the assignment
  * itself, so skew is included.
  *
  * Usage: sbt "runMain graft.tools.HierProbe <sfDir> [<clampCells>]"
  */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val clamp = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-hier-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embs = Tables.t(spark, sfDir, "embeddings")
    val n = embs.count()
    val e = Similarity.emb(embs)

    def sumSq(sizes: Seq[Long]): BigInt =
      sizes.map(c => BigInt(c) * c).sum

    // (a) single level at the clamped count — the degraded regime.
    // At the PRODUCTION clamp on a past-the-boundary corpus this side
    // is n·65536 distance evals (~10^14 element ops at 33 M vectors) —
    // pointless to execute (its Σ|c|² is n²/clamp by arithmetic), so
    // SPARK_GRAFT_HIER_ONLY=1 skips it and reports the arithmetic
    // bound instead.
    val hierOnly = sys.env.get("SPARK_GRAFT_HIER_ONLY").contains("1")
    val cSingle = math.min(clamp, Similarity.cellsParamsFor(n))
    val singleSq: BigInt =
      if (hierOnly) BigInt(n) * n / cSingle
      else {
        val seeds = Similarity.trainedSeeds(e, cSingle,
          Similarity.trainStrideFor(n, cSingle)).persist()
        sumSq(Similarity.assignCells(seeds, e, 1, "cell")
          .groupBy(col("cell")).count()
          .collect().map(_.getLong(1)).toSeq)
      }

    // (b) the two-level split at the same clamp
    val (c1, c2) = Similarity.hierParamsFor(n, clamp)
    val (hierLeaves, hierSq) =
      if (c2 == 1) (cSingle.toLong, singleSq) // below the boundary: same index
      else {
        val sizes = Similarity.hierAssigned(e, n, c1, c2)
          .groupBy(col("sc"), col("sub")).count()
          .collect().map(_.getLong(2)).toSeq
        (c1.toLong * c2, sumSq(sizes))
      }

    val ideal = BigInt(n) * n
    println(
      s"""{"sf":"$sfDir","n":$n,"clamp":$clamp,"single_is_bound":$hierOnly,""" +
      s""""single":{"cells":$cSingle,"sum_sq":$singleSq,"x_ideal":${
        if (singleSq == 0) 0.0 else (BigDecimal(singleSq) * cSingle / BigDecimal(ideal)).toDouble}},""" +
      s""""hier":{"c1":$c1,"c2":$c2,"leaves":$hierLeaves,"sum_sq":$hierSq,"x_ideal":${
        if (hierSq == 0) 0.0 else (BigDecimal(hierSq) * hierLeaves / BigDecimal(ideal)).toDouble}}}""")
    spark.stop()
  }
}
