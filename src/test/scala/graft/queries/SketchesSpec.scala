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

  test("a14: integer estimator matches C div harmonic_sum exactly; " +
      "errors mostly inside the 3-sigma envelope") {
    import org.apache.spark.sql.functions._
    val out = Sketches.hllErrorAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length > 10) // ship-months give a real distribution
    out.foreach { case (_, hs, exact, est, ppm, w3) =>
      assert(est === Sketches.hllEstC / hs) // one integer division
      val expPpm =
        if (est >= exact) (est - exact) * 1000000L / exact
        else -((exact - est) * 1000000L / exact)
      assert(ppm === expPpm)
      assert(w3 === (if (math.abs(ppm) <= 390000L) 1L else 0L))
    }
    // the estimator is worth something: for m=64 registers, at least
    // ~99% of groups should sit inside 3 sigma — demand a strong
    // majority so a broken constant or hash fails loudly
    assert(out.count(_._6 == 1L) * 10 >= out.length * 9)
    // (register-state partition invariance is pinned by the a03 spec;
    // a14 adds only integer arithmetic on top of that state)
  }

  test("a05: histogram quantile estimates bracket the exact disc quantiles") {
    import org.apache.spark.sql.functions._
    val est = Sketches.histogramQuantiles(spark, sf).collect()
    val data = graft.Tables.t(spark, sf, "orders")
      .select(col("o_orderstatus"), col("o_totalprice").cast("double"))
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val all = data.values.flatten
    val w = (all.max - all.min) / Sketches.histBuckets
    est.foreach { r =>
      val xs = data(r.getString(0))
      // the estimate is the LOWER edge of the bucket holding the
      // ceil(p·n)-th smallest value — so that value must lie within
      // one bucket width above it
      for ((c, p) <- Seq(("est_p50", 0.5), ("est_p95", 0.95), ("est_p99", 0.99))) {
        val e = r.getAs[Double](c)
        val exact = xs(math.ceil(p * xs.length).toInt - 1)
        assert(exact >= e - 1e-9 && exact <= e + w + 1e-9,
          s"$c: est=$e exact=$exact width=$w")
      }
    }
  }

  test("a07: sketch union/intersection estimates track the exact answers") {
    val r = Sketches.sketchSetOps(spark, sf).collect().head
    // union merge can never exceed the sum of the parts
    assert(r.getAs[Double]("est_union") <=
      r.getAs[Double]("est_a") + r.getAs[Double]("est_r") + 1e-6)
    // inclusion-exclusion compounds three raw-HLL errors (~13% each):
    // assert a wide but real accuracy band
    val estI = r.getAs[Double]("est_intersection")
    val exactI = r.getAs[Long]("exact_intersection")
    assert(math.abs(estI - exactI) <= 0.9 * math.max(exactI.toDouble, 1.0),
      s"est=$estI exact=$exactI")
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

  test("a08: bloom has no false negatives and the state is partition-invariant") {
    import org.apache.spark.sql.functions._
    import graft.functions.PortableBloom
    val rows = Sketches.bloomPrefilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, pass, exact) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(pass >= exact, s"false negative: pass=$pass exact=$exact")
      assert(pass <= n)
    }
    // every inserted key must probe true against its own sketch
    val keys = (1L to 200L).map(k => s"key$k").toDF("k")
    val sk = keys.agg(PortableBloom.portableBloom(col("k")).as("sk"))
    val misses = keys.crossJoin(sk)
      .filter(!PortableBloom.hit(col("sk"), col("k"))).count()
    assert(misses === 0L, "bloom dropped an inserted key")
    // OR-merge is commutative/associative/idempotent: state must not
    // depend on partitioning
    def state(nPart: Int): String =
      keys.repartition(nPart)
        .agg(PortableBloom.portableBloom(col("k")).as("sk"))
        .select(md5(concat_ws(",", col("sk").cast("array<string>"))))
        .as[String].head()
    assert(state(1) === state(7))
  }

  test("a09: predicted join cardinality equals the actual join size") {
    import org.apache.spark.sql.functions._
    val prof = Sketches.joinCardinality(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val li = graft.Tables.t(spark, sf, "lineitem")
    val ord = graft.Tables.t(spark, sf, "orders")
    // fk→pk join: predicted out_rows must equal the real join's count
    val real = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    val (mk, out, mx) = prof("l_orderkey=o_orderkey")
    assert(out === real, s"predicted $out real $real")
    assert(mk === li.select("l_orderkey").distinct().count())
    assert(mx <= out && mx >= 1L)
  }

  test("a10: rolled-up sketch states equal direct sketches per level") {
    import org.apache.spark.sql.functions._
    import graft.functions.PortableHll
    val out = Sketches.sketchRollup(spark, sf).collect()
    // 6 leaves (3 flags × 2 statuses) + 3 flags + 1 total on TPC-H data
    assert(out.map(_.getLong(0)).sorted.toSeq ===
      Seq(0L, 1L, 1L, 1L, 2L, 2L, 2L, 2L, 2L, 2L))
    val li = graft.Tables.t(spark, sf, "lineitem")
    // the law under test: merging leaf registers must give the SAME
    // state as sketching the coarser group directly from the rows
    val direct = li.groupBy(col("l_returnflag"))
      .agg(PortableHll.portableHll(col("l_partkey").cast("string"))
        .as("h"))
      .select(col("l_returnflag"), col("h.harmonic_sum"))
      .as[(String, Long)].collect().toMap
    out.filter(_.getLong(0) == 1L).foreach { r =>
      assert(r.getLong(4) === direct(r.getString(1)),
        s"flag ${r.getString(1)}: merged state != direct state")
    }
    // raw-HLL estimate within 15% of exact at every level (m=64)
    out.foreach { r =>
      val est = r.getLong(3).toDouble
      val exact = r.getLong(6).toDouble
      assert(math.abs(est - exact) / exact < 0.15,
        s"level ${r.getLong(0)} ${r.getString(1)}/${r.getString(2)}: " +
          s"est $est exact $exact")
    }
  }

  test("a11: summed leaf CMS grids equal the direct whole-fact sketch") {
    import org.apache.spark.sql.functions._
    import graft.functions.PortableCountMin
    val li = graft.Tables.t(spark, sf, "lineitem")
    val out = Sketches.cmsRollupDf(li).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // the law: the level-0 state (sum of leaf grids) must be byte-
    // identical to one direct sketch over all rows
    val direct = li
      .agg(PortableCountMin.portableCms(col("l_suppkey").cast("string"))
        .as("arr"))
      .select(md5(concat_ws(",", col("arr").cast("array<string>"))))
      .collect().head.getString(0)
    val tot = out.find(_._1 == 0L).get
    assert(tot._3 === direct, "merged state != direct state")
    // n_rows falls out of the counters exactly, per level and total
    assert(tot._4 === li.count())
    assert(out.filter(_._1 == 1L).map(_._4).sum === li.count())
  }

  test("a13: rolled histogram quantiles match an in-memory exact-" +
      "bucket recompute at every level") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.t(spark, sf, "lineitem")
    val out = Sketches.histRollupDf(li).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    val rows = li.selectExpr("l_returnflag", "l_linestatus",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val lo = rows.map(_._3).min
    val span = rows.map(_._3).max - lo + 1
    val B = Sketches.a13Buckets.toLong
    def want(sel: ((String, String)) => (String, String), lvl: Long) =
      rows.groupBy(t0 => sel((t0._1, t0._2))).map { case ((rf, ls), g) =>
        val grid = g.map(t0 => (t0._3 - lo) * B / span)
          .groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        val n = g.length.toLong
        var cum = 0L
        var b50 = -1L; var b95 = -1L
        grid.foreach { case (b, cnt) =>
          cum += cnt
          if (b50 < 0 && cum * 2 >= n) b50 = b
          if (b95 < 0 && cum * 20 >= n * 19) b95 = b
        }
        (lvl, rf, ls, n, b50, b95, lo + b50 * span / B, lo + b95 * span / B)
      }.toSeq
    val expect = (want(identity, 2L) ++
      want(p => (p._1, "*"), 1L) ++ want(_ => ("*", "*"), 0L))
      .sortBy(x => (x._1, x._2, x._3))
    assert(out.toSeq === expect)
    assert(out.nonEmpty)
    // bucket mass conservation: every level's n_rows telescopes
    assert(out.filter(_._1 == 0L).map(_._4).sum === rows.length.toLong)
    assert(out.filter(_._1 == 1L).map(_._4).sum === rows.length.toLong)
    assert(out.filter(_._1 == 2L).map(_._4).sum === rows.length.toLong)
    // estimates live inside the value range; p95 bucket >= p50 bucket
    out.foreach { case (_, _, _, _, b50, b95, e50, e95) =>
      assert(b95 >= b50 && e95 >= e50)
      assert(e50 >= lo && e95 <= lo + span)
    }
  }

  test("a12: CMS audit — key counts exact, errors non-negative, " +
      "mean floor-exact") {
    import graft.Tables.t
    val out = Sketches.cmsErrorAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    val exactKeys = t(spark, sf, "lineitem")
      .select("l_returnflag", "l_suppkey").distinct().collect()
      .map(_.getString(0)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    for ((flag, nKeys, nExact, maxErr, sumErr, meanPpm) <- out) {
      assert(nKeys === exactKeys(flag), s"$flag key count")
      // CMS never underestimates: every per-key error ≥ 0
      assert(maxErr >= 0L && sumErr >= 0L && sumErr >= maxErr)
      assert(nExact >= 0L && nExact <= nKeys)
      assert(meanPpm === sumErr * 1000000L / nKeys)
    }
  }

  test("a16: bloom FPR audit — measured FPR matches an in-memory probe " +
      "of the same filter; popcount equals the reported load") {
    import graft.Tables.t
    import graft.functions.PortableBloom
    val out = Sketches.bloomFprAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val keys = t(spark, sf, "customer")
      .filter("c_mktsegment = 'BUILDING'")
      .select("c_custkey").as[Long].collect().toSet
    val words = new Array[Long](PortableBloom.words)
    val md = java.security.MessageDigest.getInstance("MD5")
    keys.foreach(k =>
      PortableBloom.testAndSet(words, k.toString.getBytes("UTF-8"), md))
    val setBits = words.map(java.lang.Long.bitCount(_).toLong).sum
    def probe(k: Long): Boolean = // non-mutating: probe a copy
      PortableBloom.testAndSet(words.clone(), k.toString.getBytes("UTF-8"), md)
    val want = t(spark, sf, "orders")
      .select("o_orderstatus", "o_custkey").as[(String, Long)].collect()
      .filter { case (_, c) => !keys(c) }
      .groupBy(_._1).map { case (st, g) =>
        val nf = g.count { case (_, c) => probe(c) }.toLong
        (st, g.length.toLong, nf, nf * 1000000L / g.length,
          setBits, setBits * 1000000L / PortableBloom.bits)
      }.toSeq.sortBy(_._1)
    assert(out.toSeq === want)
    out.foreach { case (_, nAbsent, nFalse, fpr, sb, load) =>
      assert(nFalse <= nAbsent && fpr <= 1000000L)
      assert(sb === setBits && load < 1000000L)
    }
    // the filter is honest: some absent probes exist, load is nonzero
    assert(out.map(_._2).sum > 0L && setBits > 0L)
  }

  test("a15: quantile audit — exact side matches an in-memory " +
      "percentile-disc; estimate within one histogram bucket") {
    import graft.Tables.t
    val out = Sketches.quantileErrorAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val cents = t(spark, sf, "orders")
      .selectExpr("o_orderstatus",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    def disc(v: IndexedSeq[Long], rank: Long): Long = v((rank - 1).toInt)
    val levels = Map("p50" -> ((n: Long) => (n + 1) / 2),
      "p95" -> ((n: Long) => (95 * n + 99) / 100),
      "p99" -> ((n: Long) => (99 * n + 99) / 100))
    assert(out.length === cents.size * 3)
    // one-bucket bound: the a05 estimate is the lower edge of the
    // bucket containing the exact value, so |est − exact| is bounded
    // by one bucket width (global value range / 128, in cents)
    val all = cents.values.flatten
    val widthCents = (all.max - all.min) / Sketches.histBuckets + 2
    for ((st, level, n, exact, est, ppm) <- out) {
      assert(n === cents(st).size.toLong)
      assert(exact === disc(cents(st), levels(level)(n)),
        s"$st/$level exact percentile")
      assert(math.abs(est - exact) <= widthCents,
        s"$st/$level estimate strayed beyond one bucket: est=$est exact=$exact")
      val num = est - exact
      val want = if (num >= 0) num * 1000000L / exact
      else -((-num) * 1000000L / exact)
      assert(ppm === want)
    }
  }
}
