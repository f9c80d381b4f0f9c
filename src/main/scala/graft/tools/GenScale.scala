package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale-out generator for the sf1 differential spot-check
  * (NOT part of the engine surface, never run by the driver): replicates
  * the sf0.1 testdata N× into a new directory with keys shifted into
  * disjoint per-replica ranges, so row counts scale ~10× while the
  * per-replica structure (baskets, dup clusters, co-purchase graph)
  * matches the source distribution instead of densifying.
  *
  * Content perturbation keeps replicas from cross-pairing in the
  * similarity/dedup queries (which would make pair outputs quadratic
  * in replicas rather than linear):
  *  - documents.text is Caesar-rotated per replica (letters shifted by
  *    r) — every shingle/frame hash changes, lengths and structure
  *    don't;
  *  - embeddings are array-rotated by r positions — hyperplane
  *    signatures decorrelate across replicas.
  *
  * Output layout matches the driver's (`<dst>/<table>.parquet` single
  * files) so `graft.Verify` and `tools/check_oracle.py` run unchanged
  * against the generated dir.
  */
object GenScale {

  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private val upper = lower.toUpperCase
  private def rot(s: String, r: Int): String = s.drop(r % 26) + s.take(r % 26)

  def main(args: Array[String]): Unit = {
    val (src, dst, reps) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-genscale")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dst).mkdirs()

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    /** Write as ONE parquet FILE named `<dst>/<name>.parquet` (the
      * driver layout duckdb can open directly). */
    def writeOne(df: DataFrame, name: String): Unit = {
      val tmp = s"$dst/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(conf)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).filter(_.getName.startsWith("part-")).head
      val target = new org.apache.hadoop.fs.Path(s"$dst/$name.parquet")
      fs.delete(target, false)
      fs.rename(part, target)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }

    def replicate(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(name)
      writeOne((0 until reps).map(r => f(base, r)).reduce(_ unionByName _), name)
    }

    // the per-replica id shifts below assume source key ranges fit
    // under them — fail fast instead of silently colliding replicas
    // (e.g. generating sf10 FROM sf1 would need bigger shifts)
    def assertFits(name: String, idCol: String, shift: Long): Unit = {
      val mx = read(name).agg(max(col(idCol))).collect()(0).getLong(0)
      require(mx < shift,
        s"$name.$idCol max $mx >= replica shift $shift - raise the shift")
    }
    assertFits("documents", "doc_id", 10000L)
    assertFits("embeddings", "vec_id", 10000L)
    assertFits("orders", "o_orderkey", 1000000L)
    assertFits("part", "p_partkey", 100000L)
    assertFits("supplier", "s_suppkey", 10000L)
    assertFits("customer", "c_custkey", 100000L)

    replicate("documents") { (d, r) =>
      d.withColumn("doc_id", col("doc_id") + lit(r * 10000L))
        .withColumn("text",
          if (r == 0) col("text")
          else translate(col("text"), lower + upper, rot(lower, r) + rot(upper, r)))
    }
    replicate("embeddings") { (d, r) =>
      // rotate by r MOD dim: slice(x, r+1, size-r) has a negative
      // length once r >= dim (crashed at reps = 100; r < dim replicas
      // are byte-identical to the pre-fix output). Replicas r and
      // r + dim share a rotation — the same bounded cross-replica
      // twin class as the text path's r mod 26.
      d.withColumn("vec_id", col("vec_id") + lit(r * 10000L))
        .withColumn("embedding",
          if (r == 0) col("embedding")
          else expr(s"concat(slice(embedding, pmod($r, size(embedding)) + 1, " +
            s"size(embedding) - pmod($r, size(embedding))), " +
            s"slice(embedding, 1, pmod($r, size(embedding))))"))
    }
    replicate("lineitem") { (d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * 1000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(r * 100000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * 10000L))
    }
    replicate("orders") { (d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(r * 1000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(r * 100000L))
    }
    // dimensions REPLICATE with the same shifts as the fact FKs that
    // reference them — otherwise replicas r >= 1 carry dangling
    // l_partkey/l_suppkey/o_custkey values, every dim join silently
    // drops 90 % of the scaled data, and the "10× data" claim is
    // false for dim-joining queries (caught by review; the sf1
    // evidence for q50/q52 was re-run after this fix)
    replicate("part") { (d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(r * 100000L))
    }
    replicate("supplier") { (d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(r * 10000L))
    }
    replicate("customer") { (d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(r * 100000L))
    }
    // tiny fixed-cardinality tables and the event stream pass through
    // unchanged (events' non-scaling is documented in VERIFY_sf1.md —
    // event-time queries compare at sf0.1 volume)
    Seq("region", "nation", "events")
      .foreach(n => writeOne(read(n), n))
    spark.stop()
  }
}
