package graft.queries

import graft.SparkSpec
import graft.SparkEntry

class RelationalSpec extends SparkSpec {

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs at sf0.001 and most return rows") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        if (n == 0) Some(name) else None
    }
    // near-dup/anti-join queries may legitimately be empty on tiny data;
    // everything else must produce rows
    val allowedEmpty = Set("q07_anti_join", "d02_minhash_lsh",
      "d03_ngram_jaccard", "d05_simhash_pairs", "d06_embedding_cosine")
    assert(empties.toSet.subsetOf(allowedEmpty), s"unexpected empties: $empties")
  }

  test("oracleSql covers every query except declared rows-only sketches") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // a03 (portable HLL) and s03 (rounded-sim IVF) carry full oracles;
    // only the native-sketch queries stay rows-only
    assert(rowsOnly === Set("a01_hll_distinct", "a02_percentiles"),
      s"unexpected rows-only: $rowsOnly")
  }

  test("q01 aggregates to the 6 flag/status groups") {
    assert(Relational.q01PricingSummary(spark, sf).count() === 6)
  }

  test("top-k queries respect their limits") {
    assert(Relational.q03TopUnshipped(spark, sf).count() <= 10)
    assert(Relational.q11TopK(spark, sf).count() === 20)
  }

  test("as-of join emits exactly one row per event") {
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(Relational.q22AsOfJoin(spark, sf).count() === events)
  }

  test("set ops partition customers disjointly") {
    import org.apache.spark.sql.functions._
    val df = Relational.q16SetOps(spark, sf)
    val total = df.count()
    val distinctKeys = df.select("o_custkey", "grp").distinct().count()
    assert(total === distinctKeys)
  }

  test("q47: mode and disc percentiles match a naive in-memory computation") {
    val rows = Relational.q47DistScalars(spark, sf).collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderstatus", "o_orderpriority", "o_totalprice")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1)
    rows.foreach { r =>
      val st = r.getString(0)
      val grp = orders(st)
      // mode: max count, tie toward smaller priority
      val want = grp.groupBy(_._2).view.mapValues(_.length).toSeq
        .sortBy { case (p, c) => (-c, p) }.head
      assert(r.getString(1) === want._1 && r.getLong(2) === want._2.toLong, st)
      // disc percentiles are order statistics at rank ceil(q*n)
      val sorted = grp.map(_._3).sorted
      def disc(q: Double) = sorted(math.ceil(q * sorted.length).toInt - 1)
      assert(BigDecimal(r.getDouble(3)) === disc(0.25), s"$st p25")
      assert(BigDecimal(r.getDouble(4)) === disc(0.5), s"$st p50")
      assert(BigDecimal(r.getDouble(5)) === disc(0.75), s"$st p75")
    }
  }

  test("q46: final running value equals the supplier's true distinct-part count") {
    import org.apache.spark.sql.functions._
    val last = Relational.q46WindowDistinct(spark, sf)
      .groupBy("l_suppkey").agg(max("distinct_parts").as("got"))
    val truth = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_suppkey")
      .agg(countDistinct("l_partkey").as("want"))
    val off = last.join(truth, "l_suppkey")
      .filter(col("got") =!= col("want")).count()
    assert(off === 0L)
  }

  test("q49: zorder buckets match an independent morton recompute and " +
      "bound BOTH key spans") {
    import spark.implicits._
    def spread(x: Long): Long = {
      var v = x & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_suppkey").as[(Long, Long)].collect()
    val exp = li
      .groupBy { case (pk, sk) => (spread(pk) | (spread(sk) << 1)) >> 12 }
      .map { case (b, rs) =>
        (b, rs.length.toLong, rs.map(_._1).min, rs.map(_._1).max,
          rs.map(_._2).min, rs.map(_._2).max)
      }.toSet
    val got = Relational.q49ZorderLayout(spark, sf)
      .select("bucket", "n_rows", "pk_min", "pk_max", "sk_min", "sk_max")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSet === exp)
    // the layout property: dropping 12 interleaved bits fixes all but
    // 6 bits of EACH dimension, so every bucket bounds both spans ≤ 63
    // (a 1-D sort would bound only its leading column)
    got.foreach { case (b, _, pkMin, pkMax, skMin, skMax) =>
      assert(pkMax - pkMin <= 63L, s"bucket $b pk span")
      assert(skMax - skMin <= 63L, s"bucket $b sk span")
    }
  }

  test("q51: SCD2 intervals tile each user's history without gaps") {
    import spark.implicits._
    val out = Relational.q51Scd2Intervals(spark, sf)
      .select("user_id", "version", "state", "valid_from_us",
        "valid_to_us", "n_events", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5),
        r.getLong(6)))
      .groupBy(_._1)
    // independent recompute from the raw event log
    val raw = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type", "ts div 1000 as us")
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._4, e._2))).toMap
    out.foreach { case (u, versions) =>
      val vs = versions.sortBy(_._2)
      val events = raw(u)
      // versions are 1..n, exactly one current, intervals abut
      assert(vs.map(_._2).toSeq === (1L to vs.length).toSeq, s"user $u")
      assert(vs.count(_._7 == 1L) === 1 && vs.last._7 === 1L, s"user $u")
      vs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $u gap at v${a._2}")
          assert(a._3 !== b._3, s"user $u un-collapsed run at v${a._2}")
        case _ =>
      }
      // event counts per version sum to the user's history; run
      // boundaries match a direct scan of the sorted log
      assert(vs.map(_._6).sum === events.length.toLong, s"user $u")
      val runs = events.foldLeft(List.empty[(String, Long, Long)]) {
        case (acc, (_, _, st, us)) => acc match {
          case (s0, from, n) :: rest if s0 == st => (s0, from, n + 1) :: rest
          case _ => (st, us, 1L) :: acc
        }
      }.reverse
      assert(vs.map(v => (v._3, v._4, v._6)).toSeq === runs, s"user $u")
    }
  }

  test("q52: winsorized stats match an independent order-statistic " +
      "recompute") {
    import spark.implicits._
    val brand = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_brand").as[(Long, String)].collect().toMap
    val qtys = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_quantity").as[(Long, Double)].collect()
      .map { case (p, q) => (brand(p), q.toLong) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    val exp = qtys.map { case (b, qs) =>
      val n = qs.length
      val p10 = qs((n + 9) / 10 - 1)
      val p90 = qs((9 * n + 9) / 10 - 1)
      val clamped = qs.map(q => math.max(math.min(q, p90), p10))
      (b, n.toLong, p10, p90,
        qs.count(q => q < p10 || q > p90).toLong,
        clamped.sum * 100L / n)
    }.toSet
    val got = Relational.q52Winsorize(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === exp)
    // the winsorized mean is robust: clamping never widens the range
    got.foreach { case (_, _, p10, p90, _, m100) =>
      assert(m100 >= p10 * 100 && m100 <= p90 * 100)
    }
  }

  test("q53: CDC apply matches an independent merge recompute") {
    import spark.implicits._
    val out = Relational.q53CdcApply(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val base = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_acctbal").as[(Long, Double)].collect().toMap
    val latest = graft.Tables.t(spark, sf, "events")
      .select("user_id", "event_id", "ts", "event_type")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1 * Relational.cdcKeyStride).view.mapValues(
        _.maxBy(e => (e._3, e._2))).toMap
    val exp = (base.keySet ++ latest.keySet).toSeq.sorted.flatMap { k =>
      (base.get(k), latest.get(k)) match {
        case (Some(b), None) => Some((k, "unchanged", Some(b)))
        case (Some(_), Some(e)) if e._4 == "click" =>
          Some((k, "deleted", None))
        case (Some(_), Some(e)) =>
          Some((k, "updated", Some((e._2 % 100000L).toDouble / 100)))
        case (None, Some(e)) if e._4 != "click" =>
          Some((k, "inserted", Some((e._2 % 100000L).toDouble / 100)))
        case _ => None
      }
    }
    assert(out.toSeq === exp)
    // the batch exercises every merge branch against this base
    val kinds = out.map(_._2).toSet
    assert(kinds === Set("unchanged", "updated", "inserted", "deleted"))
  }

  test("q54: funnel stages match an independent ordered-scan recompute") {
    import spark.implicits._
    val out = Relational.q54Funnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val ev = graft.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_type", "ts div 1000 as us")
      .as[(Long, String, Long)].collect().groupBy(_._1)
    val w = Relational.funnelWindowUs
    val exp = ev.toSeq.flatMap { case (u, es) =>
      val t1 = es.filter(_._2 == "signup").map(_._3).sorted.headOption
      t1.map { a =>
        val t2 = es.filter(e => e._2 == "view" && e._3 > a && e._3 <= a + w)
          .map(_._3).sorted.headOption
        val t3 = t2.flatMap(b =>
          es.filter(e => e._2 == "purchase" && e._3 > b && e._3 <= b + w)
            .map(_._3).sorted.headOption)
        val stage = if (t3.isDefined) 3L else if (t2.isDefined) 2L else 1L
        (u, stage, a, t2, t3)
      }
    }.sortBy(_._1)
    assert(out.toSeq === exp)
    // ordering invariant: each stage time strictly follows the previous
    out.foreach { case (u, _, a, t2, t3) =>
      t2.foreach(b => assert(b > a && b <= a + w, s"user $u view"))
      (t2, t3) match {
        case (Some(b), Some(c)) =>
          assert(c > b && c <= b + w, s"user $u purchase")
        case (None, Some(_)) => fail(s"user $u purchased without view")
        case _ =>
      }
    }
  }

  test("q50: support/confidence/lift match an independent recompute") {
    import spark.implicits._
    val brand = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_brand").as[(Long, String)].collect().toMap
    val items = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect()
      .map { case (o, p) => (o, brand(p)) }.distinct
    val supp = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nOrders = items.map(_._1).distinct.length.toLong
    val pairCnt = items.groupBy(_._1).values.flatMap { its =>
      val bs = its.map(_._2).sorted
      for (i <- bs.indices; j <- i + 1 until bs.length) yield (bs(i), bs(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
    val exp = pairCnt.toSeq.map { case ((a, b), sab) =>
      (a, b, sab, sab * 1000000L / supp(a),
        // the composed-floor lift (overflow-safe form, see q50)
        (sab * 1000000L / supp(a)) * nOrders / supp(b))
    }.sortBy { case (a, b, sab, _, _) => (-sab, a, b) }
      .take(Relational.assocTopK)
    val got = Relational.q50AssocRules(spark, sf)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got === exp)
  }

  test("q55: state merge is associative — split refreshes equal direct") {
    import org.apache.spark.sql.functions._
    val orders = graft.Tables.t(spark, sf, "orders")
    // direct recompute (the view definition / the oracle)
    val direct = Relational.mvMergeStates(
      Relational.mvState(orders), Relational.mvState(orders.limit(0)))
      .collect().toSeq
    // two-step refresh: base + (delta split in two batches, merged one
    // at a time through the SAME operator, state shape preserved)
    val base = orders.filter(col("o_orderdate") < lit(Relational.mvCutoff))
    val d1 = orders.filter(col("o_orderdate") >= lit(Relational.mvCutoff) &&
      col("o_orderkey") % 2 === 0)
    val d2 = orders.filter(col("o_orderdate") >= lit(Relational.mvCutoff) &&
      col("o_orderkey") % 2 === 1)
    val step1 = Relational.mvMergeStates(
      Relational.mvState(base), Relational.mvState(d1))
      .select(col("o_custkey"), col("n_orders").as("n"),
        // output is BIGINT cents; state is DECIMAL dollars — exact
        // decimal division re-enters the state shape losslessly
        expr("CAST(CAST(spend_cents AS DECIMAL(20,2)) / 100" +
          " AS DECIMAL(18,2))").as("spend"),
        col("first_order").as("first_d"),
        col("last_order").as("last_d"))
    val twoStep = Relational.mvMergeStates(step1, Relational.mvState(d2))
      .collect().toSeq
    assert(twoStep === direct)
    assert(direct.nonEmpty)
  }

  test("q59: shares are exact floor-ppm and sum to 1e6 within rounding") {
    val rows = Relational.q59RatioToReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // per region: floor shares sum into (1e6 - nations, 1e6]
    rows.groupBy(_._1).foreach { case (reg, ns) =>
      val s = ns.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - ns.length,
        s"region $reg shares sum $s")
    }
    val t = rows.map(_._5).sum
    assert(t <= 1000000L && t > 1000000L - rows.length, s"total $t")
    // ppm recomputed from the emitted BIGINT cents agrees
    val cents = rows.map(r => (r._1, r._2, r._3))
    val byReg = cents.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    rows.zip(cents).foreach { case ((reg, n, _, rp, tp), (_, _, c)) =>
      assert(rp === c * 1000000L / byReg(reg), s"$reg/$n region share")
      assert(tp === c * 1000000L / cents.map(_._3).sum, s"$reg/$n total")
    }
  }

  test("q60: interval union matches an in-memory sweep; covered time " +
      "bounded by span and wall sum") {
    import graft.Tables.t
    val out = Relational.q60IntervalUnion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // independent reference: explicit sorted merge per user
    val evs = t(spark, sf, "events")
      .selectExpr("event_id", "user_id", "ts div 1000 as start_us")
      .collect()
      .map { r =>
        val s = r.getLong(2)
        (r.getLong(1), s, s + (r.getLong(0) % 7 + 1) * 60000000L)
      }
    val want = evs.groupBy(_._1).map { case (u, ivs) =>
      val sorted = ivs.map(i => (i._2, i._3)).sortBy(identity)
      val islands = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case (acc, (s0, e0)) => acc match {
          case (s1, e1, n) :: rest if s0 <= e1 =>
            (s1, math.max(e1, e0), n + 1) :: rest
          case _ => (s0, e0, 1L) :: acc
        }
      }
      val lens = islands.map { case (s0, e0, _) => e0 - s0 }
      (u, islands.size.toLong, ivs.size.toLong, lens.sum, lens.max)
    }.toSet
    assert(out.toSet === want)
    // covered time can never exceed the sum of interval lengths
    for ((u, _, _, covered, longest) <- out) {
      val wall = evs.filter(_._1 == u).map(i => i._3 - i._2).sum
      assert(covered <= wall && longest <= covered)
    }
  }

  test("q63: quarter-cent interpolation equals Spark's own exact " +
      "percentile") {
    import graft.Tables.t
    import org.apache.spark.sql.functions._
    val out = Relational.q63PercentileCont(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // independent reference: Spark's builtin percentile() on the same
    // integer cents — its double interpolation is exact at quarter
    // fractions (hi/4 and 3*lo/4 are exponent shifts), so qc/4 must
    // match to the bit
    val ref = t(spark, sf, "orders")
      .selectExpr("o_orderstatus",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .groupBy("o_orderstatus")
      .agg(expr("percentile(c, 0.25)").as("p25"),
        expr("percentile(c, 0.5)").as("p50"),
        expr("percentile(c, 0.75)").as("p75"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.nonEmpty)
    for ((st, _, p25, p50, p75) <- out) {
      val (e25, e50, e75) = ref(st)
      assert(p25 / 4.0 == e25 && p50 / 4.0 == e50 && p75 / 4.0 == e75,
        s"$st: ($p25,$p50,$p75)/4 != ($e25,$e50,$e75)")
    }
  }

  test("q61: skyline equals the naive dominance filter; frontier is a " +
      "price-date staircase") {
    import graft.Tables.t
    import org.apache.spark.sql.functions._
    val out = Relational.q61Skyline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val o = t(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(t(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(t(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .selectExpr("n_name", "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)",
        "CAST(unix_date(CAST(o_orderdate AS DATE)) AS BIGINT)")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = o.filter { case (nat, _, c0, d0) =>
      !o.exists { case (n2, _, c2, d2) => n2 == nat && c2 > c0 && d2 > d0 }
    }.toSet
    assert(out.toSet === want)
    // staircase law: within a nation, walking price-descending, dates
    // are non-decreasing (strict-dominance frontiers are monotone up
    // to price ties)
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(r => (-r._3, r._2))
      sorted.sliding(2).foreach {
        case Array(a, b) if a._3 != b._3 =>
          assert(a._4 <= b._4, s"frontier not monotone: $a then $b")
        case _ =>
      }
    }
  }

  test("q62: motif counts match java-regex recompute on a constructed " +
      "history") {
    import spark.implicits._
    // user 1: v v p v p  -> two view-runs ending in purchase
    // user 2: s c c p e e e -> one quick conversion, error run 3
    // user 3: p v v  -> nothing ends in p after views
    val rows = Seq(
      (1L, 1L, "view"), (1L, 2L, "view"), (1L, 3L, "purchase"),
      (1L, 4L, "view"), (1L, 5L, "purchase"),
      (2L, 6L, "signup"), (2L, 7L, "click"), (2L, 8L, "click"),
      (2L, 9L, "purchase"), (2L, 10L, "error"), (2L, 11L, "error"),
      (2L, 12L, "error"),
      (3L, 13L, "purchase"), (3L, 14L, "view"), (3L, 15L, "view"))
      .map { case (u, i, et) => (i, i * 1000000000L, u, et) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Relational.q62EventRegexDf(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSet === Set(
      (1L, 5L, 2L, 0L, 0L),
      (2L, 7L, 0L, 1L, 3L),
      (3L, 3L, 0L, 0L, 0L)))
  }

  test("e03: statuses partition both snapshots; counts reconcile with " +
      "the slice predicates") {
    import graft.Tables.t
    val out = graft.queries.Pipeline.snapshotDiff(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = t(spark, sf, "documents")
      .selectExpr("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def status(id: Long): String =
      if (id % 10 == 7 && id % 17 == 3) "absent"
      else if (id % 10 == 7) "added"
      else if (id % 17 == 3) "removed"
      else if (id % 13 == 0) "changed"
      else "unchanged"
    val want = docs.map { case (id, src) => (src, status(id)) }
      .filter(_._2 != "absent")
      .groupBy(identity).map { case ((src, st), g) => (src, st, g.size.toLong) }
      .toSet
    assert(out.map(r => (r._1, r._2, r._3)).toSet === want)
  }

  test("q64: ewma matches an in-memory exact recompute; bounds hold") {
    import graft.Tables.t
    val out = Relational.q64Ewma(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent reference: the same truncated power-of-two kernel in
    // plain Scala Long math over the (ts, event_id)-sorted cents
    val evs = t(spark, sf, "events")
      .selectExpr("user_id", "ts", "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val k = Relational.q64Lags
    val want = evs.groupBy(_._1).map { case (u, rows) =>
      val cents = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val tail = cents.takeRight(k).reverse // tail(0) = latest
      val num = tail.zipWithIndex
        .map { case (c, j) => c * (1L << (k - 1 - j)) }.sum
      val den = (1L << k) - (1L << (k - tail.length))
      (u, cents.length.toLong, cents.last, num / den)
    }.toSet
    assert(out.toSet === want)
    // an average of cents must sit inside the window's [min, max]
    for ((u, _, _, ewma) <- out) {
      val cents = evs.filter(_._1 == u).sortBy(r => (r._2, r._3))
        .map(_._4).takeRight(k)
      assert(ewma >= cents.min - 1 && ewma <= cents.max)
    }
  }

  test("q65: slope/intercept/r2 match BigInt closed forms on raw rows") {
    import graft.Tables.t
    import org.apache.spark.sql.functions.col
    val out = Relational.q65Regression(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val rows = t(spark, sf, "lineitem")
      .join(t(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .selectExpr("p_brand", "CAST(l_quantity AS BIGINT)",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).map { case (b, g) =>
      val n = BigInt(g.size)
      val sx = g.map(r => BigInt(r._2)).sum
      val sy = g.map(r => BigInt(r._3)).sum
      val sxy = g.map(r => BigInt(r._2) * r._3).sum
      val sxx = g.map(r => BigInt(r._2) * r._2).sum
      val syy = g.map(r => BigInt(r._3) * r._3).sum
      val cov = n * sxy - sx * sy
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      val slope = cov * 1000000 / vx
      (b, g.size.toLong, slope.toLong,
        ((sy * sxx - sx * sxy) / vx).toLong,
        (slope * slope * vx / (vy * 1000000)).toLong)
    }.toSet
    assert(out.toSet === want)
    for ((b, _, _, _, r2) <- out)
      assert(r2 >= 0L && r2 <= 1000000L, s"$b r2_ppm=$r2 outside [0,1e6]")
  }

  test("q66: streaks match an in-memory islands recompute") {
    import graft.Tables.t
    val out = Relational.q66Streaks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val days = t(spark, sf, "events")
      .selectExpr("user_id", "ts div 86400000000000")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = days.groupBy(_._1).map { case (u, g) =>
      val ds = g.map(_._2).sorted
      val runs = ds.foldLeft(List.empty[(Long, Long)]) {
        case ((s0, e0) :: rest, d) if d == e0 + 1 => (s0, d) :: rest
        case (acc, d) => (d, d) :: acc
      }
      val lens = runs.map { case (s0, e0) => e0 - s0 + 1 }
      (u, runs.size.toLong, lens.max, lens.sum, ds.last)
    }.toSet
    assert(out.toSet === want)
    // streak algebra: islands partition the active days
    for ((_, nStreaks, longest, total, _) <- out)
      assert(nStreaks >= 1 && longest <= total && nStreaks <= total)
  }

  test("q57: fingerprints match an in-memory recompute and detect mutation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = graft.Tables.t(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_name"))
      .as[(Long, Long, String)].collect()
    val wantSig = rows.map { case (k, n, nm) =>
      java.lang.Long.parseLong(md5hex(s"$k|$n|$nm").take(15), 16)
    }.reduce(_ ^ _)
    val got = Relational.q57TableFingerprint(spark, sf)
      .as[(String, Long, Long)].collect()
      .map { case (t, n, s) => t -> ((n, s)) }.toMap
    assert(got("customer") === ((rows.length.toLong, wantSig)))
    // any single-cell mutation flips the signature
    val mutated = rows.updated(0, (rows(0)._1, rows(0)._2 + 1, rows(0)._3))
      .map { case (k, n, nm) =>
        java.lang.Long.parseLong(md5hex(s"$k|$n|$nm").take(15), 16)
      }.reduce(_ ^ _)
    assert(mutated !== wantSig)
  }

  test("q67: transition matrix matches an in-memory recompute; " +
      "ppm rows are floor-exact") {
    import graft.Tables.t
    val out = Relational.q67Markov(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ev = t(spark, sf, "events")
      .selectExpr("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.zip(sorted.tail)
    }
    val counts = trans.groupBy(identity).map { case (k, xs) =>
      (k._1, k._2, xs.size.toLong) }
    val totals = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val want = counts.map { case (p, nx, c) =>
      (p, nx, c, c * 1000000L / totals(p)) }.toSet
    assert(out.toSet === want)
    assert(out.nonEmpty)
  }

  test("q68: outlier counts match an exact BigInt recompute") {
    import graft.Tables.t
    val out = Relational.q68Outliers(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = t(spark, sf, "events").selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val k2 = Relational.q68K * Relational.q68K
    val want = ev.groupBy(_._1).map { case (ty, g) =>
      val n = BigInt(g.length)
      val s0 = g.map(e => BigInt(e._2)).sum
      val ss = g.map(e => BigInt(e._2) * e._2).sum
      val nOut = g.count { e =>
        val dev = n * e._2 - s0
        dev * dev > k2 * (n * ss - s0 * s0)
      }
      (ty, g.length.toLong, nOut.toLong, (BigInt(nOut) * 1000000 / n).toLong)
    }.toSet
    assert(out.toSet === want)
    assert(out.nonEmpty)
  }

  test("q69: chi-square cells match an exact BigInt recompute; " +
      "margins telescope") {
    import graft.Tables.t
    import org.apache.spark.sql.functions.col
    val out = Relational.q69ChiSquare(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val pairs = t(spark, sf, "orders")
      .join(t(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = pairs.groupBy(identity).view.mapValues(_.length).toMap
    val rt = pairs.groupBy(_._1).view.mapValues(_.length).toMap
    val ct = pairs.groupBy(_._2).view.mapValues(_.length).toMap
    val n = BigInt(pairs.length)
    val want = cells.toSeq.map { case ((seg, prio), obs) =>
      val (r0, c0) = (BigInt(rt(seg)), BigInt(ct(prio)))
      val d = BigInt(obs) * n - r0 * c0
      (seg, prio, obs.toLong, (r0 * c0 * 1000 / n).toLong,
        (d * d * 1000000 / (n * r0 * c0)).toLong)
    }.sortBy(x => (x._1, x._2))
    assert(out.toSeq === want)
    assert(out.nonEmpty)
    // observed cells partition the fact rows; expectations sum back to
    // ~1000·n (short only by the per-cell floor)
    assert(out.map(_._3).sum === pairs.length.toLong)
    val em = out.map(_._4).sum
    assert(em <= 1000L * pairs.length &&
      em > 1000L * pairs.length - out.length)
    assert(out.forall(_._5 >= 0L))
  }

  test("q70: the k histogram matches an in-memory QI recompute and " +
      "partitions every customer row") {
    import graft.Tables.t
    val out = Relational.q70KAnonymity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val rows = t(spark, sf, "customer")
      .selectExpr("CAST(c_nationkey AS BIGINT)", "c_mktsegment",
        "(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " + 100000000) div 100000").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ks = rows.groupBy(identity).values.map(_.length).toSeq
    val total = rows.length.toLong
    val want = ks.groupBy(identity).toSeq.map { case (k, g) =>
      val nRows = k.toLong * g.length
      (k.toLong, g.length.toLong, nRows, nRows * 1000000L / total,
        if (k < Relational.q70K) 1L else 0L)
    }.sortBy(_._1)
    assert(out.toSeq === want)
    assert(out.nonEmpty)
    // histogram rows partition the table; at-risk flag is consistent
    assert(out.map(_._3).sum === total)
    out.foreach { case (k, _, _, _, risk) =>
      assert(risk === (if (k < Relational.q70K) 1L else 0L))
    }
  }

  test("q73: attribution matches an in-memory first/last-touch " +
      "recompute over the raw event log") {
    import graft.Tables.t
    val dayNs = 86400000000000L
    val out = Relational.q73Attribution(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val ev = t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type", "ts",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val byUser = ev.groupBy(_._1)
    val rows = for {
      (u, _, et, pts, cents) <- ev.toSeq if et == "purchase"
      p = (pts, cents)
    } yield {
      val touches = byUser(u).filter(x =>
        (x._3 == "click" || x._3 == "view") &&
          x._4 <= p._1 && x._4 >= p._1 - dayNs)
        .map(x => (x._4, x._2, x._3)).sorted
      val lastT = if (touches.isEmpty) "direct" else touches.last._3
      val firstT = if (touches.isEmpty) "direct" else touches.head._3
      (lastT, firstT, p._2)
    }
    val want =
      (rows.map(r => ("last", r._1, r._3)) ++
        rows.map(r => ("first", r._2, r._3)))
        .groupBy(r => (r._1, r._2)).view
        .mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap
    assert(out === want)
    assert(out.nonEmpty)
    // both models allocate exactly the total purchase revenue
    val total = rows.map(_._3).sum
    for (m <- Seq("first", "last"))
      assert(out.collect { case ((`m`, _), (_, c)) => c }.sum === total)
  }

  test("q72: autocorrelation matches an exact BigInt recompute of the " +
      "deviation products") {
    import graft.Tables.t
    val out = Relational.q72Autocorr(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val rows = t(spark, sf, "events")
      .selectExpr("event_type", "ts div 86400000000000",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val daily = rows.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((et, d), g) => (et, d, g.map(_._3).sum) }
    for ((et, g) <- daily.groupBy(_._1)) {
      val xs = g.sortBy(_._2).map(x => BigInt(x._3))
      val n = BigInt(xs.length)
      val sTot = xs.sum
      val dev = xs.map(x => n * x - sTot)
      val den = dev.map(d => d * d).sum
      for (k <- 1 to 3) {
        val num = (0 until xs.length - k).map(i => dev(i) * dev(i + k)).sum
        val want =
          if (num < 0) -((-num) * 1000000 / den) else num * 1000000 / den
        assert(out((et, k.toLong)) === (xs.length.toLong, want.toLong),
          s"type $et lag $k")
      }
    }
    assert(out.size === daily.map(_._1).distinct.size * 3)
  }

  test("q71: weighted median matches an in-memory recompute and sits " +
      "at the cumulative-weight midpoint") {
    import graft.Tables.t
    val out = Relational.q71WeightedMedian(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val rows = t(spark, sf, "lineitem").join(
        t(spark, sf, "part"),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .selectExpr("p_brand",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)",
        "CAST(l_quantity AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).toSeq.map { case (brand, g) =>
      val total = g.map(_._3).sum
      val sorted = g.map(x => (x._2, x._3)).groupBy(_._1).toSeq
        .map { case (c, ws) => (c, ws.map(_._2).sum) }.sortBy(_._1)
      var cum = 0L
      val med = sorted.collectFirst {
        case (c, w) if { cum += w; cum * 2 >= total } => c
      }.get
      (brand, total, med)
    }.sortBy(_._1)
    assert(out === want)
    assert(out.nonEmpty)
  }

  test("q75: the l histogram matches an in-memory recompute and " +
      "partitions every customer row") {
    import graft.Tables.t
    val out = Relational.q75LDiversity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val rows = t(spark, sf, "customer")
      .selectExpr("CAST(c_nationkey AS BIGINT)",
        "(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " + 100000000) div 100000", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val groups = rows.groupBy(r => (r._1, r._2)).values.toSeq
      .map(g => (g.length.toLong, g.map(_._3).distinct.length.toLong))
    val total = rows.length.toLong
    val want = groups.groupBy(_._2).toSeq.map { case (l, g) =>
      val nRows = g.map(_._1).sum
      (l, g.length.toLong, nRows, nRows * 1000000L / total,
        if (l < Relational.q75L) 1L else 0L)
    }.sortBy(_._1)
    assert(out.toSeq === want)
    assert(out.nonEmpty)
    assert(out.map(_._3).sum === total)
    // l is bounded by the 5 market segments
    assert(out.forall { case (l, _, _, _, _) => l >= 1L && l <= 5L })
  }

  test("q76: median/MAD/outlier counts match an exact in-memory " +
      "recompute; MAD is robust where q68's sigma is not") {
    import graft.Tables.t
    val out = Relational.q76MadOutliers(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val ev = t(spark, sf, "events").selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // lower median (q71 convention): smallest value with 2*cum >= n
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length - 1) / 2)
    }
    val want = ev.groupBy(_._1).map { case (ty, g) =>
      val vals = g.map(_._2).toSeq
      val med = lowerMedian(vals)
      val mad = lowerMedian(vals.map(v => math.abs(v - med)))
      val nOut = vals.count(v => math.abs(v - med) > Relational.q76K * mad)
      (ty, vals.length.toLong, med, mad, nOut.toLong,
        nOut.toLong * 1000000L / vals.length)
    }.toSet
    assert(out.toSet === want)
    assert(out.nonEmpty)
    // sanity: the flag threshold is meaningful — at least the central
    // half (adev <= MAD <= 3*MAD) is never flagged
    out.foreach { case (_, n, _, _, nOut, _) => assert(nOut * 2 <= n) }
  }

  test("q77: TWAP matches an exact in-memory step-function integral; " +
      "a constant series time-weights to itself") {
    import graft.Tables.t
    val out = Relational.q77Twap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = t(spark, sf, "events").selectExpr("user_id",
        "ts div 1000", "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).flatMap { case (u, g) =>
      val s = g.sortBy(e => (e._2, e._3))
      val span = s.last._2 - s.head._2
      if (span <= 0) None else {
        val wsum = s.zip(s.tail)
          .map { case (a, b) => BigInt(a._4) * BigInt(b._2 - a._2) }.sum
        // div on a non-negative HUGEINT/BigInt numerator is plain floor
        Some((u, s.length.toLong, span, (wsum / span).toLong))
      }
    }.toSet
    assert(out.toSet === want)
    assert(out.nonEmpty)
    // the definition property: a constant-valued step function
    // time-weights to exactly that constant, whatever the spacing
    import spark.implicits._
    val const = Seq((900L, 1L, 10_000_000L, 5.0), (901L, 1L, 11_000_000L, 5.0),
      (902L, 1L, 99_000_000L, 5.0)).toDF("event_id", "user_id", "ts", "value")
    // bypass Tables.t: q77 math starts from (ts nanos, value); feed the
    // same shape through the window+agg path via a local twin
    import org.apache.spark.sql.functions._
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val got = const
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .withColumn("next_us", lead(col("ts_us"), 1).over(byUser))
      .groupBy(col("user_id"))
      .agg((max(col("ts_us")) - min(col("ts_us"))).as("span_us"),
        sum(expr("""CASE WHEN next_us IS NULL THEN CAST(0 AS DECIMAL(38,0))
              ELSE CAST(cents AS DECIMAL(38,0)) * (next_us - ts_us)
              END""")).as("wsum"))
      .selectExpr("CAST(wsum div span_us AS BIGINT)").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(500L))
  }

  test("q79: OHLC bars match an exact in-memory recompute; open/close " +
      "are positional with the (ts, event_id) tiebreak") {
    import graft.Tables.t
    val out = Relational.q79OhlcBars(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    val ev = t(spark, sf, "events").selectExpr("event_type",
        "ts div 1000", "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(e => (e._1, e._2 / 3600000000L)).map {
      case (key, g) =>
        val s = g.sortBy(e => (e._2, e._3))
        key -> (s.length.toLong, s.head._4, g.map(_._4).max,
          g.map(_._4).min, s.last._4, g.map(e => BigInt(e._4)).sum.toLong)
    }
    assert(out === want)
    assert(out.nonEmpty)
    // bar invariants: low <= open, close <= high; volume >= n * low
    out.values.foreach { case (n, o, h, l, c, v) =>
      assert(l <= o && o <= h && l <= c && c <= h)
      assert(v >= n * l && v <= n * h)
    }
  }

  test("q80: FK integrity audit matches an in-memory recompute; the " +
      "star-schema edges audit clean by construction") {
    import graft.Tables.t
    val out = Relational.q80FkIntegrity(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def longs(tbl: String, c: String): Array[Long] =
      t(spark, sf, tbl).select(c).collect().map(_.getLong(0))
    def audit(child: Array[Long], parent: Set[Long]): (Long, Long, Long) = {
      val orph = child.count(!parent(_)).toLong
      (child.length.toLong, orph, orph * 1000000L / child.length)
    }
    val cases = Map(
      "lineitem.l_orderkey->orders" ->
        audit(longs("lineitem", "l_orderkey"), longs("orders", "o_orderkey").toSet),
      "lineitem.l_partkey->part" ->
        audit(longs("lineitem", "l_partkey"), longs("part", "p_partkey").toSet),
      "lineitem.l_suppkey->supplier" ->
        audit(longs("lineitem", "l_suppkey"), longs("supplier", "s_suppkey").toSet),
      "orders.o_custkey->customer" ->
        audit(longs("orders", "o_custkey"), longs("customer", "c_custkey").toSet),
      "events.user_id->customer" ->
        audit(longs("events", "user_id"), longs("customer", "c_custkey").toSet))
    assert(out === cases)
    // the generated star schema is FK-closed; only the event stream
    // may reference users outside the dimension
    Seq("lineitem.l_orderkey->orders", "lineitem.l_partkey->part",
      "lineitem.l_suppkey->supplier", "orders.o_custkey->customer")
      .foreach(rel => assert(out(rel)._2 === 0L, s"$rel has orphans"))
  }

  test("q78: schema-evolution union conserves doc counts and mass; " +
      "the absent column null-fills only the v1 slice") {
    import graft.Tables.t
    val out = Relational.q78SchemaEvolution(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = t(spark, sf, "documents")
    assert(out.map(_._3).sum === docs.count())
    val mass = docs.agg(org.apache.spark.sql.functions.sum("n_chars"))
      .collect()(0).getLong(0)
    assert(out.map(_._4).sum === mass)
    // v1 predates `lang`: every v1 row groups under <absent>, and no
    // v2 row does
    assert(out.filter(_._1 == "v1").forall(_._2 == "<absent>"))
    assert(out.filter(_._1 == "v2").forall(_._2 != "<absent>"))
    assert(out.count(_._1 == "v2") >= 2)
  }
}
