package graft.queries

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct is within 5% of exact") {
    val rows = Sketches.hllDistinct(spark, sf)
      .select("approx_parts", "exact_parts").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"approx=$approx exact=$exact")
    }
  }

  test("percentiles are ordered and bounded") {
    val rows = Sketches.percentiles(spark, sf)
      .select("p50", "p95", "p99").as[(Double, Double, Double)].collect()
    rows.foreach { case (p50, p95, p99) =>
      assert(p50 <= p95 && p95 <= p99)
      assert(p50 > 0)
    }
  }

  test("portable HLL: within m=64 error bounds and partition-invariant") {
    import org.apache.spark.sql.functions._
    import graft.functions.PortableHll.portableHll
    val rows = Sketches.portableHllDistinct(spark, sf)
      .select("hll_estimate", "exact_parts").as[(Double, Long)].collect()
    assert(rows.nonEmpty)
    // raw HLL with m=64: std error 1.04/√64 ≈ 13%; allow 3σ
    rows.foreach { case (est, exact) =>
      assert(math.abs(est - exact) / exact <= 0.39, s"est=$est exact=$exact")
    }
    // max-merge is commutative/associative: the sketch state must not
    // depend on how the input is partitioned
    def state(nPart: Int): Seq[(String, Long)] = {
      val df = graft.Tables.t(spark, sf, "lineitem").repartition(nPart)
      df.groupBy(col("l_returnflag"))
        .agg(portableHll(col("l_partkey").cast("string")).as("h"))
        .select(col("l_returnflag"), col("h.harmonic_sum"))
        .as[(String, Long)].collect().sortBy(_._1).toSeq
    }
    assert(state(1) === state(13))
  }

  test("count-min: estimate dominates the exact count and is partition-invariant") {
    import org.apache.spark.sql.functions._
    import graft.functions.PortableCountMin.portableCms
    val rows = Sketches.cmsHeavyHitters(spark, sf)
      .select("exact_cnt", "cms_est").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // count-min never underestimates
    rows.foreach { case (exact, est) =>
      assert(est >= exact, s"est=$est exact=$exact")
    }
    // counter add is commutative/associative: the sketch state must not
    // depend on how the input is partitioned
    def state(nPart: Int): Seq[(String, String)] = {
      val df = graft.Tables.t(spark, sf, "lineitem").repartition(nPart)
      df.groupBy(col("l_returnflag"))
        .agg(portableCms(col("l_suppkey").cast("string")).as("sk"))
        .select(col("l_returnflag"),
          md5(concat_ws(",", col("sk").cast("array<string>"))).as("m"))
        .as[(String, String)].collect().sortBy(_._1).toSeq
    }
    assert(state(1) === state(13))
  }
}
