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
    val out = spark.range(reps).select(col("id").as("r"))
      .crossJoin(e)
      .select(
        (col("r") * shift + col("vec_id")).as("vec_id"),
        // rotate by r mod dim: slice is 1-based; rot 0 = identity
        when(col("r") % dim === 0, col("embedding")).otherwise(
          concat(
            slice(col("embedding"), (col("r") % dim + 1).cast("int"),
              (lit(dim) - col("r") % dim).cast("int")),
            slice(col("embedding"), lit(1), (col("r") % dim).cast("int"))))
          .as("embedding"))
    out.repartition(cpus.toInt * 2)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    val n = spark.read.parquet(s"$dst/embeddings.parquet").count()
    println(s"""{"src":"$src","dst":"$dst","reps":$reps,"n":$n}""")
    spark.stop()
  }
}
