package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** MIH band-layout probe (dev-only): recall@10 vs exact-Hamming truth
  * AND candidate volume for the three 64-bit band layouts (4×16-bit,
  * 8×8-bit, 16×4-bit), on a real embeddings table.
  *
  * The layout trades the pigeonhole radius against candidate volume:
  * B bands of 64/B bits guarantee any neighbor within Hamming
  * distance < B is found, but each band's bucket space is 2^(64/B) —
  * fewer, wider bands prune harder (high precision, low recall);
  * more, narrower bands admit more (the 16×4 extreme degenerates
  * toward all-pairs as every 4-bit subcode collides constantly).
  * s13/s14 ship 8×8; this probe is the measured justification.
  *
  * Measured at sf0.1 (60k vectors, 40 queries, k=10, 400 truth pairs):
  *   bands= 4 (16-bit): candidates=     1  recall=  0.0%  wall=2.45 s
  *   bands= 8 ( 8-bit): candidates=  2434  recall= 21.8%  wall=1.56 s
  *   bands=16 ( 4-bit): candidates= 51301  recall= 99.5%  wall=2.17 s
  * 4×16 prunes everything (no true neighbor within the pigeonhole
  * radius of 4 on this corpus); 16×4's recall is near-exact but its
  * candidate volume is 21× the 8×8 layout's on a corpus where each
  * 4-bit band has only 16 buckets — candidates grow Θ(N²/16) with
  * corpus size, i.e. all-pairs with a constant shaved off, which is
  * exactly the shape the banding exists to avoid. 8×8 is the only
  * layout whose candidate volume stays corpus-linear (bucket space
  * 2⁸ per band) at an honest, s14-audited recall; callers needing
  * higher recall widen the code (s01's 576-bit signature), not the
  * bands.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.MihProbe <sfDir>"
  */
object MihProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-mih-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val topK = 10
    val isQuery = col("vec_id") % 50 === 0 && col("vec_id") < 50000

    def coded(bands: Int): DataFrame = {
      val bits = 64 / bands
      val e = Tables.t(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      e.select(col("vec_id") +: (0 until bands).map(b => expr(
        s"CAST(aggregate(sequence(0, ${bits - 1}), 0, (acc, i) -> " +
          s"acc + (CASE WHEN v[i + ${b * bits}] > CAST(0 AS DOUBLE) " +
          s"THEN CAST(shiftleft(1, i) AS INT) ELSE 0 END)) AS INT)")
        .as(s"w$b")): _*)
    }

    def ham(bands: Int) = (0 until bands)
      .map(b => expr(s"bit_count(x.w$b ^ y.w$b)").cast("long"))
      .reduce(_ + _)

    def truthPairs(bands: Int): DataFrame = {
      val c = coded(bands)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("hamming"), col("neighbor_id"))
      broadcast(c.filter(isQuery)).as("x")
        .join(c.as("y"), col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("query_id"),
          col("y.vec_id").as("neighbor_id"), ham(bands).as("hamming"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= topK)
        .select("query_id", "neighbor_id")
    }

    def approx(bands: Int): (DataFrame, Long) = {
      val c = coded(bands)
      val bandRows = c.select(col("vec_id"), explode(array(
          (0 until bands).map(b =>
            struct(lit(b).as("band"), col(s"w$b").as("sub"))): _*)).as("bs"))
        .select(col("vec_id"), col("bs.band").as("band"),
          col("bs.sub").as("sub"))
      val cand = broadcast(bandRows.filter(isQuery)).as("q")
        .join(bandRows.as("c"),
          col("q.band") === col("c.band") && col("q.sub") === col("c.sub") &&
            col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("query_id"),
          col("c.vec_id").as("neighbor_id"))
        .distinct().persist()
      val nCand = cand.count()
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("hamming"), col("neighbor_id"))
      val top = cand.join(coded(bands).as("x"),
          col("query_id") === col("x.vec_id"))
        .join(coded(bands).as("y"), col("neighbor_id") === col("y.vec_id"))
        .select(col("query_id"), col("neighbor_id"), ham(bands).as("hamming"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= topK)
        .select("query_id", "neighbor_id")
      (top, nCand)
    }

    // truth is layout-invariant (same 64 sign bits); compute once
    val exact = truthPairs(8).persist()
    val nExact = exact.count()
    println(s"exact truth pairs: $nExact")
    for (bands <- Seq(4, 8, 16)) {
      val t0 = System.nanoTime()
      val (top, nCand) = approx(bands)
      val hit = top.join(exact, Seq("query_id", "neighbor_id")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"bands=$bands%2d (${64 / bands}-bit): candidates=$nCand%9d " +
        f"recall=${hit * 100.0 / nExact}%5.1f%% wall=$secs%6.2f s")
    }
    spark.stop()
  }
}
