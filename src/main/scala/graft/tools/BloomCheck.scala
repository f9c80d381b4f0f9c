package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: measure the triangle-prune bloom's EFFECTIVE fpp at sf1. */
object BloomCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/.sfscale/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("bloomcheck")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.Tables.t(spark, sfDir, "lineitem")
    val oriented = graft.queries.Graph.orientedEdgesDf(li).persist()
    val m = oriented.count()
    val packed = shiftleft(col("u").cast("long"), 32) + col("v").cast("long")
    val bf = oriented.stat.bloomFilter(packed, m.max(1000L).min(1000000000L), 0.02)
    println(s"edges=$m bitSize=${bf.bitSize()} expectedFpp=${bf.expectedFpp()}")
    // probe RANDOM keys far outside the edge keyspace: true fpp
    val bc = spark.sparkContext.broadcast(bf)
    val rnd = spark.range(1000000).select(
      (shiftleft((rand(7) * 4000000).cast("long") + 5000000L, 32) +
        (rand(11) * 4000000).cast("long") + 5000000L).as("k"))
    val mightRnd = udf((k: Long) => bc.value.mightContainLong(k))
    println(s"random-key hits: ${rnd.filter(mightRnd(col("k"))).count()} / 1000000")
    // probe the ACTUAL wedge (v,w) keys: pre-bloom wedge count, kept, true
    val o2 = oriented.select(col("u").as("u2"), col("v").as("w"))
    val wedges = oriented.join(o2, col("u") === col("u2") && col("v") =!= col("w"))
      .select(shiftleft(col("v").cast("long"), 32) + col("w").cast("long") as "k")
    val total = wedges.count()
    val kept = wedges.filter(mightRnd(col("k"))).count()
    println(s"wedges=$total kept=$kept keptFrac=${kept.toDouble / total}")
    spark.stop()
  }
}
