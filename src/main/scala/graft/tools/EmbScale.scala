package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only embeddings-ONLY scale-out (the GenScale recipe restricted
  * to one table): replicates `<src>/embeddings.parquet` N× with
  * disjoint id ranges and per-replica array rotation (signatures and
  * cell assignments decorrelate across replicas, so index structure
  * scales instead of densifying — GenScale's trick). Exists because
  * the two-level quantizer's PRODUCTION boundary sits at 16.8 M
  * vectors: replicating every table that far (GenScale) would need
  * ~10 B lineitem rows, but the geometry probe only needs vectors.
  *
  * Usage: sbt "runMain graft.tools.EmbScale <srcSfDir> <dst> <reps>"
  */
object EmbScale {
  def main(args: Array[String]): Unit = {
    val (src, dst, reps) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-emb-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dst).mkdirs()

    val e = graft.Tables.t(spark, src, "embeddings")
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val shift = maxId + 1
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    // rotation alone gives only `dim` distinct transforms — past dim
    // replicas, identical copies form weight atoms no quantizer can
    // balance below (the first 33.6 M probe measured 5.6× of leaf
    // ideal against a 2.04× data floor). A per-replica AFFINE map
    // (deterministic scale in [0.75, 1.75), offset in [-1, 1)) keeps
    // every replica's internal structure (affine) while making all
    // replica clouds distinct.
    val rot = col("r") % dim
    val scaleR = (lit(0.75) + (col("r") * 2654435761L % 1000L) / 1000.0)
    val offR = ((col("r") * 40503L % 2001L) - 1000L) / 1000.0
    val rotated = when(rot === 0, col("embedding")).otherwise(
      concat(
        slice(col("embedding"), (rot + 1).cast("int"),
          (lit(dim) - rot).cast("int")),
        slice(col("embedding"), lit(1), rot.cast("int"))))
    val out = spark.range(reps).select(col("id").as("r"))
      .crossJoin(e)
      .select(
        (col("r") * shift + col("vec_id")).as("vec_id"),
        transform(rotated.cast("array<double>"),
          x => (x * scaleR + offR).cast("float")).as("embedding"))
    out.repartition(cpus.toInt * 2)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    val n = spark.read.parquet(s"$dst/embeddings.parquet").count()
    println(s"""{"src":"$src","dst":"$dst","reps":$reps,"n":$n}""")
    spark.stop()
  }
}
