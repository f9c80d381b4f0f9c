package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Dedup

/** SimHash geometry probe: quantifies the fingerprint-width knob on the
  * banded candidate generator (d05/d18's shape) at a given scale — wall
  * time, candidate-pair count and calibration-row count for the
  * oracle-locked contract geometry (32-bit/4-band) vs the
  * corpus-size-keyed `Dedup.simhashParamsFor` one. The band keyspace is
  * 2^(bits/bands): once the corpus outgrows it, buckets fill by
  * birthday and candidates grow ~n²/keyspace — the r7 sf1 sweep
  * measured d18 at 31.5× wall for 10× docs under the contract geometry.
  * This prints the actual trade so the knob is sized from measurement
  * per corpus (the CosineLshProbe discipline, pointed at the other
  * sketch family).
  *
  * Usage: sbt "runMain graft.tools.SimhashGeomProbe <sfDir> [bits bands]"
  */
object SimhashGeomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explicit = args.length > 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-simhash-geom-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.t(spark, sfDir, "documents")
    val n = docs.count()
    val (bits, bands) =
      if (explicit)
        (args(1).toInt, if (args.length > 2) args(2).toInt else Dedup.simhashBands)
      else Dedup.simhashParamsFor(n)
    // candidate volume per geometry: the d05/d18 band self-join with no
    // hamming cutoff — the quantity the geometry controls
    def candidates(b: Int, nb: Int) = {
      val fp = Dedup.simHashDf(docs, b)
      val bandW = b / nb
      val bandCols = (0 until nb).map(i =>
        struct(lit(i).as("band"),
          substring(col("simhash"), i * bandW + 1, bandW).as("sig")).as(s"b$i"))
      val bnd = fp.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      bnd.as("x").join(bnd.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct()
    }
    def timedCal(b: Int, nb: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      Dedup.simhashCalibrationDf(docs, b, nb).foreach(_ => ())
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      (dt, candidates(b, nb).count())
    }
    val (tBase, cBase) = timedCal(Dedup.simhashBits, Dedup.simhashBands)
    val (tTuned, cTuned) = timedCal(bits, bands)
    println(
      f"""{"sf":"$sfDir","n_docs":$n,"contract":{"bits":${Dedup.simhashBits},"bands":${Dedup.simhashBands},"cal_sec":$tBase%.2f,"cand_pairs":$cBase},"tuned":{"bits":$bits,"bands":$bands,"cal_sec":$tTuned%.2f,"cand_pairs":$cTuned}}""")
    spark.stop()
  }
}
