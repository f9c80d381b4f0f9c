package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.queries.Dedup

/** Cosine-LSH parameter probe: quantifies the `nPlanes`/`nBands` knob
  * on `Dedup.embeddingCosineDf` at a given scale — wall time and output
  * size for the contract parameters vs a tuned signature, plus the
  * fraction of the contract's pairs the tuned one retains. Bucket count
  * per band is 2^(planes/bands); occupancy (and the candidate join's
  * per-bucket quadratic cost) falls exponentially with rows-per-band
  * while near-dup recall falls only polynomially — this prints the
  * actual trade so the knob is sized from measurement per corpus.
  *
  * Usage: sbt "runMain graft.tools.CosineLshProbe <sfDir> [planes bands]"
  */
object CosineLshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // default tuned point: the corpus-size-keyed rule (Dedup.cosParamsFor)
    val explicit = args.length > 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cosine-lsh-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embs = Tables.t(spark, sfDir, "embeddings")
    // corpus count only when the rule picks the parameters — an
    // explicit sweep must not pay a scan before its timed runs
    val (planes, bands) =
      if (explicit)
        (args(1).toInt, if (args.length > 2) args(2).toInt else 4)
      else Dedup.cosParamsFor(embs.count())
    def timed(p: Int, b: Int): (Double, org.apache.spark.sql.DataFrame) = {
      val df = Dedup.embeddingCosineDf(embs, p, b).persist()
      val t0 = System.nanoTime()
      df.foreach(_ => ())
      ((System.nanoTime() - t0) / 1e9, df)
    }
    val (tBase, base) = timed(Dedup.cosPlanes, Dedup.cosBands)
    val (tTuned, tuned) = timed(planes, bands)
    val nBase = base.count()
    val nTuned = tuned.count()
    val kept = tuned.select("vec_a", "vec_b")
      .join(base.select("vec_a", "vec_b"), Seq("vec_a", "vec_b")).count()
    // retention stratified by similarity: a coarser signature sheds the
    // weak pairs first — what matters for dedup is the high-cos stratum
    import org.apache.spark.sql.functions._
    val strata = base.withColumn("stratum", floor(col("cos_sim") * 10) / 10)
      .join(tuned.select(col("vec_a"), col("vec_b"), lit(1).as("hit")),
        Seq("vec_a", "vec_b"), "left")
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("kept"))
      .orderBy(col("stratum"))
      .collect()
      .map(r => f""""${r.get(0)}":{"n":${r.getLong(1)},"kept":${r.getLong(2)}}""")
      .mkString("{", ",", "}")
    println(
      f"""{"sf":"$sfDir","contract":{"planes":${Dedup.cosPlanes},"bands":${Dedup.cosBands},"sec":$tBase%.2f,"pairs":$nBase},"tuned":{"planes":$planes,"bands":$bands,"sec":$tTuned%.2f,"pairs":$nTuned},"retained_of_contract":${kept.toDouble / nBase.max(1)}%.4f,"retention_by_cos":$strata}""")
    spark.stop()
  }
}
