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
}
