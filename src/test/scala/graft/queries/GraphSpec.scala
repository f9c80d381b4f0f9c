package graft.queries

import graft.SparkSpec
import graft.Tables.t
import org.apache.spark.sql.functions._

/** g01 fixed-point PageRank: the claim under test is bit-exact
  * determinism — integer message passing must make the result
  * independent of physical partitioning (the property that lets a
  * 100 TB run hash-match a second engine). */
class GraphSpec extends SparkSpec {

  private lazy val li = t(spark, sf, "lineitem")
  private lazy val ord = t(spark, sf, "orders")

  test("pagerank is invariant under input partitioning (bit-exact)") {
    val a = Graph.pageRankDf(li, ord).collect().toSeq
    val b = Graph.pageRankDf(li.repartition(7, col("l_suppkey")),
      ord.repartition(3)).collect().toSeq
    assert(a == b)
  }

  test("pagerank ranks respect the damping floor and mass bound") {
    val rows = Graph.pageRankDf(li, ord).collect()
    assert(rows.nonEmpty)
    // every rank >= base (0.15) and < total mass; sorted desc with
    // node-id tiebreak
    val prs = rows.map(_.getLong(1))
    assert(prs.forall(_ >= Graph.baseRank))
    val nNodes = li.select("l_suppkey").distinct.count() +
      ord.select("o_custkey").distinct.count()
    assert(prs.forall(_ < Graph.initRank * nNodes))
    val pairs = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy(p => (-p._1, p._2))))
  }

  test("high-degree nodes outrank leaves") {
    // a supplier shipping to many customers accumulates more mass than
    // one appearing on a single order line
    val out = Graph.pageRankDf(li, ord)
    val degs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("node"), col("o_custkey"))
      .distinct().groupBy("node").count()
    val joined = out.join(degs, "node").select("pr", "count").collect()
    val byDeg = joined.sortBy(-_.getLong(1)).map(_.getLong(0))
    // spearman-ish sanity: the max-degree survivor in the top-100 has a
    // higher rank than the min-degree one
    if (byDeg.length > 1) assert(byDeg.head >= byDeg.last)
  }

  test("g03: components match an in-memory union-find and are partition-invariant") {
    val out = Graph.componentsDf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent reference: union-find over pairs counted the naive way
    val byOrder = li.select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val support = scala.collection.mutable.Map[(Long, Long), Int]()
    byOrder.values.foreach { rows =>
      val parts = rows.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        support((parts(i), parts(j))) =
          support.getOrElse((parts(i), parts(j)), 0) + 1
    }
    val edges = support.filter(_._2 >= Graph.ccSupport).keys.toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val ref = nodes.groupBy(find).flatMap { case (_, ns) =>
      val lbl = ns.min; ns.map(n => n -> (lbl, ns.length.toLong))
    }
    assert(out.length === nodes.length)
    out.foreach { case (part, comp, size) =>
      assert(ref(part) === ((comp, size)),
        s"part=$part got=($comp,$size) want=${ref(part)}")
    }
    // bounded-round propagation is deterministic under repartitioning
    val again = Graph.componentsDf(li.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sameElements(again))
  }

  test("g04: adaptive k-core peeling matches an independent recompute") {
    import spark.implicits._
    val out = Graph.kcoreDf(li, ord).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // independent recompute: same graph, same quantile threshold, same
    // fixed peel rounds, via plain Scala collections
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("o_custkey") + Graph.custOffset)
      .as[(Long, Long)].collect().distinct
    var edges = pairs.flatMap { case (s0, c) => Seq((s0, c), (c, s0)) }.toSet
    val deg0 = edges.groupBy(_._1).view.mapValues(_.size).toMap
    // k = degree value at rank (n+3)/4 under (d, src) order
    val k = deg0.toSeq.map { case (s0, d) => (d, s0) }.sorted
      .apply(((deg0.size + 3) / 4 - 1).toInt)._1
    for (_ <- 1 to Graph.coreRounds) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      edges = edges.filter { case (a, b) => keep(a) && keep(b) }
    }
    val want = edges.groupBy(_._1).map { case (n, es) =>
      (n, if (n >= Graph.custOffset) "customer" else "supplier",
        es.size.toLong)
    }.toSet
    assert(out.toSet === want)
    assert(out.nonEmpty)
    // the quantile threshold must actually peel something at this scale
    assert(out.length < deg0.size, "adaptive k peeled nothing")
    // the peel converges within the bounded rounds here (a fifth round
    // changes nothing), so the true core invariant holds: survivor
    // degrees ≥ k
    val deg5 = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val keep5 = deg5.filter(_._2 >= k).keySet
    assert(edges.forall { case (a, b) => keep5(a) && keep5(b) },
      "peel had not converged; raise coreRounds")
    out.foreach { case (_, _, d) => assert(d >= k.toLong) }
  }

  test("g05: BFS hops match an independent frontier expansion") {
    import spark.implicits._
    val out = Graph.bfsHopsDf(li, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("o_custkey") + Graph.custOffset)
      .as[(Long, Long)].collect().distinct
    val adj = pairs.flatMap { case (s0, c) => Seq((s0, c), (c, s0)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = adj.toSeq.map { case (n, nb) => (n, nb.size) }
      .sortBy { case (n, d) => (-d, n) }.take(Graph.bfsSeeds).map(_._1)
    var dist = seeds.map(_ -> 0L).toMap
    for (r <- 1 to Graph.bfsRounds) {
      val frontier = dist.collect { case (n, h) if h == r - 1 => n }
      val nxt = frontier.toSet.flatMap(adj.getOrElse(_: Long, Set.empty[Long]))
      dist = nxt.filterNot(dist.contains).map(_ -> r.toLong).toMap ++ dist
    }
    val want = dist.map { case (n, h) =>
      (n, h, if (n >= Graph.custOffset) "customer" else "supplier")
    }.toSet
    assert(out.toSet === want)
    assert(out.count(_._2 == 0L) === Graph.bfsSeeds)
    // the bounded horizon is meaningful: more than one hop level present
    assert(out.map(_._2).distinct.length > 1)
  }

  test("g15: harmonic centrality matches an independent per-landmark " +
      "BFS with exact integer inverse-hop sums") {
    import spark.implicits._
    val out = Graph.harmonicCentralityDf(li, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("o_custkey") + Graph.custOffset)
      .as[(Long, Long)].collect().distinct
    val adj = pairs.flatMap { case (s0, c) => Seq((s0, c), (c, s0)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = adj.toSeq.map { case (n, nb) => (n, nb.size) }
      .sortBy { case (n, d) => (-d, n) }.take(Graph.bfsSeeds).map(_._1)
    // per-landmark BFS (landmark identity kept, unlike g05's min-combine)
    val hops = seeds.flatMap { lm =>
      var dist = Map(lm -> 0L)
      for (r <- 1 to Graph.bfsRounds) {
        val frontier = dist.collect { case (n, h) if h == r - 1 => n }
        val nxt = frontier.toSet
          .flatMap(adj.getOrElse(_: Long, Set.empty[Long]))
        dist = nxt.filterNot(dist.contains).map(_ -> r.toLong).toMap ++ dist
      }
      dist.collect { case (n, h) if h >= 1 => (n, h) }
    }
    val want = hops.groupBy(_._1).map { case (n, hs) =>
      (n, hs.size.toLong, hs.map(_._2).min,
        hs.map(h => 1000000L / h._2).sum)
    }.toSet
    assert(out.toSet === want)
    // a landmark adjacent to another landmark appears with hop >= 1
    assert(out.forall(_._3 >= 1L))
    assert(out.forall { case (_, nl, _, _) => nl <= Graph.bfsSeeds })
  }

  test("g16: landmark PPR matches an independent integer mass " +
      "propagation; landmark = highest degree with smallest-id tiebreak") {
    import spark.implicits._
    val out = Graph.pprLandmarkDf(li, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("o_custkey") + Graph.custOffset)
      .as[(Long, Long)].collect().distinct
    val undSeq = pairs.flatMap { case (s0, c) => Seq((s0, c), (c, s0)) }
    val deg = undSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val lm = deg.toSeq.sortBy { case (n, d) => (-d, n) }.head._1
    var ppr = deg.keys.map(n =>
      n -> (if (n == lm) Graph.initRank else 0L)).toMap
    for (_ <- 1 to Graph.pprRounds) {
      val im = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      undSeq.foreach { case (s0, d) => im(d) += ppr(s0) / deg(s0) }
      ppr = im.map { case (n, m) =>
        n -> ((if (n == lm) Graph.baseRank else 0L) + 85L * m / 100L)
      }.toMap
    }
    val want = ppr.toSeq.sortBy { case (n, p) => (-p, n) }
      .take(Graph.topN).map { case (n, p) => (n, p) }
    assert(out.toSeq === want) // ORDERED: ranking ties break on node id
    // the landmark holds restart mass, so it must appear in the top set
    assert(out.exists(_._1 == lm))
    assert(out.forall(_._2 >= 0L))
  }

  test("g17: edge support matches an in-memory triangle enumeration; " +
      "every supported edge is a real co-purchase edge") {
    import spark.implicits._
    val out = Graph.edgeSupportDf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent reference: distinct co-purchase pairs → adjacency →
    // count triangles per edge by common-neighbor intersection
    val pairs = li.select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).values
      .flatMap { rows =>
        val ps = rows.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length)
          yield (ps(i), ps(j))
      }.toSet
    val adj = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val support = pairs.toSeq.map { case (a, b) =>
      (a, b, (adj(a) & adj(b)).size.toLong)
    }.filter(_._3 > 0)
      .sortBy { case (a, b, s0) => (-s0, a, b) }.take(Graph.triTopN)
    assert(out.toSeq === support) // ORDERED: total (support, a, b) order
    assert(out.nonEmpty)
    out.foreach { case (a, b, s0) =>
      assert(a < b && s0 >= 1L)
      assert(pairs((a, b)), s"($a,$b) is not a co-purchase edge")
    }
  }

  test("g18: k-truss peel keeps exactly the dense core on a known fixture " +
      "(K5 survives, hanging triangle and bridge peel away)") {
    import spark.implicits._
    // order 1 = parts 1..5 (K5: every edge support 3), order 2 = parts
    // 10,11,12 (triangle: support 1), order 3 = {5,10} (bridge: no
    // triangle). Supports sorted asc: [1,1,1, 3 x10] -> rank
    // ceil(13/4) = 4 -> t = 3; the triangle peels, K5 survives all
    // rounds at support 3. Round 3 peels ZERO edges here, so this
    // fixture also exercises the r10 fixed-point break (output must
    // be identical to the fully-unrolled rounds — which this
    // hand-computed expectation and the in-memory reference test
    // below both pin).
    val fix = ((1L to 5L).map(p => (1L, p)) ++
      Seq(10L, 11L, 12L).map(p => (2L, p)) ++
      Seq((3L, 5L), (3L, 10L))).toDF("l_orderkey", "l_partkey")
    val out = Graph.ktrussDf(fix).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val k5 = (for (i <- 1L to 5L; j <- i + 1 to 5L) yield (i, j, 3L)).toSeq
    assert(out === k5.sortBy { case (a, b, _) => (a, b) })
    spark.catalog.clearCache()
  }

  test("g18: matches an in-memory bounded-round support peel on the corpus") {
    // independent reference: adjacency supports, 25th-percentile
    // threshold (exact rank ceil(n/4)), then trussRounds-1 peel rounds
    // recomputing supports on the survivor subgraph
    val pairs = li.select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).values
      .flatMap { rows =>
        val ps = rows.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length)
          yield (ps(i), ps(j))
      }.toSet
    def supportsOf(edges: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      edges.toSeq.map { case (a, b) => (a, b) -> (adj(a) & adj(b)).size.toLong }
        .filter(_._2 > 0).toMap
    }
    val s1 = supportsOf(pairs)
    val sorted = s1.values.toSeq.sorted
    val rank = (sorted.length + 3) / 4
    assert(sorted.nonEmpty)
    val t0 = sorted(rank - 1)
    var edges = s1.filter(_._2 >= t0).keySet
    var last = s1
    for (_ <- 2 to Graph.trussRounds) {
      last = supportsOf(edges)
      edges = last.filter(_._2 >= t0).keySet
    }
    val want = last.filter(_._2 >= t0).toSeq
      .map { case ((a, b), s0) => (a, b, s0) }
      .sortBy { case (a, b, s0) => (-s0, a, b) }.take(Graph.triTopN)
    val out = Graph.ktrussDf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === want) // ORDERED: total (support desc, a, b) order
    assert(out.nonEmpty)
    // truss property: every surviving edge's final support clears k-2
    assert(out.forall(_._3 >= t0))
    spark.catalog.clearCache()
  }

  test("g18: empty input yields an empty truss, no failure") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
    assert(Graph.ktrussDf(empty).count() === 0)
    spark.catalog.clearCache()
  }

  test("g07: matches an in-memory 3-round self-vote LPA; partition-invariant") {
    val out = Graph.labelPropDf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent reference: naive support counting + synchronous modal
    // label rounds with self-vote, smallest label on ties
    val byOrder = li.select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val support = scala.collection.mutable.Map[(Long, Long), Int]()
    byOrder.values.foreach { rows =>
      val parts = rows.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        support((parts(i), parts(j))) =
          support.getOrElse((parts(i), parts(j)), 0) + 1
    }
    val und = support.iterator.filter(_._2 >= Graph.ccSupport).map(_._1)
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }.toSeq
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to Graph.lpRounds) {
      val prev = lbl
      lbl = adj.map { case (n, nbrs) =>
        val votes = (nbrs.map(prev) :+ prev(n))
          .groupBy(identity).map { case (l, o) => (l, o.size) }
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val want = lbl.groupBy(_._2).map { case (c, ms) =>
      (c, ms.size.toLong, ms.keys.min, ms.keys.max)
    }.toSet
    assert(out.toSet === want)
    assert(out.map(_._2).sum === adj.size.toLong,
      "members across communities != |V|")
    val b = Graph.labelPropDf(li.repartition(7, col("l_partkey")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(b.toSet === out.toSet, "LPA not partition-invariant")
  }

  test("g08: overlap counts and jaccard match an in-memory recompute " +
      "over the hub-capped graph") {
    val out = Graph.commonNeighborsDf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byOrder = li.select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val und = scala.collection.mutable.Set[(Long, Long)]()
    byOrder.values.foreach { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) {
        und += ((ps(i), ps(j))); und += ((ps(j), ps(i)))
      }
    }
    val degIn = und.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    val adj = und.toSeq.filter(e => degIn(e._2) <= Graph.cnMaxDeg)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = (for {
      (a, na) <- adj.toSeq; (b, nb) <- adj.toSeq if a < b
      common = (na & nb).size.toLong if common >= Graph.cnMinCommon
    } yield {
      val (da, db) = (na.size.toLong, nb.size.toLong)
      (a, b, common, da, db, common * 1000000L / (da + db - common))
    }).toSet
    assert(out.toSet === want)
    assert(out.nonEmpty)
  }

  test("g09: frontier Bellman-Ford equals full-relaxation recompute; " +
      "dist bounded by hops x max weight") {
    import org.apache.spark.sql.functions.col
    val li = graft.Tables.t(spark, sf, "lineitem")
    val ord = graft.Tables.t(spark, sf, "orders")
    val out = Graph.ssspDf(li, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // independent reference: FULL Bellman-Ford (every settled node
    // relaxes every round) in plain Scala — the oracle's shape
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("o_custkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1) + Graph.custOffset))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1)))
      .map { case (s0, d0) => (s0, d0, (s0 + d0) % 97 + 1) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val seeds = deg.toSeq.sortBy { case (n, d) => (-d, n) }
      .take(Graph.bfsSeeds).map(_._1)
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to Graph.ssspRounds) {
      val cand = edges.flatMap { case (s0, d0, w) =>
        dist.get(s0).map(ds => (d0, ds + w))
      }
      dist = (dist.toSeq ++ cand).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    val want = dist.map { case (n, d) =>
      (n, d, if (n >= Graph.custOffset) "customer" else "supplier")
    }.toSet
    assert(out.toSet === want)
    assert(out.nonEmpty)
    // any ≤3-edge path costs at most 3·97; seeds stay at zero
    out.foreach { case (n, d, _) =>
      assert(d >= 0 && d <= Graph.ssspRounds * 97L)
      if (seeds.contains(n)) assert(d === 0L)
    }
  }

  test("g06: buckets partition the degree range; mass sums to 2|E|") {
    import org.apache.spark.sql.functions.col
    val li = graft.Tables.t(spark, sf, "lineitem")
    val ord = graft.Tables.t(spark, sf, "orders")
    val out = Graph.degreeProfileDf(li, ord).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (role, b, n, mn, mx, mass) =>
      assert(mn >= (1L << b) && mx < (1L << (b + 1)),
        s"$role bucket $b range [$mn,$mx]")
      assert(n >= 1 && mass >= n * mn && mass <= n * mx)
    }
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("o_custkey")).distinct().count()
    assert(out.map(_._6).sum === 2 * edges, "degree mass != 2|E|")
  }

  test("g11: HITS matches an in-memory BigInt recompute and is " +
      "partition-invariant") {
    import org.apache.spark.sql.functions.col
    val out = Graph.hitsDf(li, ord).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // independent reference: the same two-round recurrence in plain
    // Scala BigInt (exact — any quotient mismatch is an engine bug)
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("o_custkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1) + Graph.custOffset))
    val scale = BigInt(Graph.hitsScale)
    def l1(raw: Map[Long, BigInt]): Map[Long, BigInt] = {
      val tot = raw.values.sum
      raw.view.mapValues(v => v * scale / tot).toMap
    }
    val h0 = edges.map(_._1).distinct.map(_ -> BigInt(1000000)).toMap
    def auth(h: Map[Long, BigInt]) = l1(
      edges.groupBy(_._2).view
        .mapValues(_.map(e => h(e._1)).sum).toMap)
    def hub(a: Map[Long, BigInt]) = l1(
      edges.groupBy(_._1).view
        .mapValues(_.map(e => a(e._2)).sum).toMap)
    val a1 = auth(h0); val h1 = hub(a1); val a2 = auth(h1)
    def top(m: Map[Long, BigInt], role: String) =
      m.toSeq.map { case (n, s0) => (role, n, s0.toLong) }
        .sortBy { case (_, n, s0) => (-s0, n) }.take(Graph.hitsTopN)
    val want = (top(a2, "authority") ++ top(h1, "hub"))
      .sortBy { case (role, n, s0) => (role, -s0, n) }
    assert(out.toSeq === want)
    assert(out.nonEmpty)
    // normalized scores are an L1 share of 1.0 in pico-units
    assert(out.forall { case (_, _, s0) =>
      s0 >= 0L && s0 <= Graph.hitsScale })
    // bipartite graph: authorities are customers, hubs are suppliers
    out.foreach {
      case ("authority", n, _) => assert(n >= Graph.custOffset)
      case ("hub", n, _)       => assert(n < Graph.custOffset)
      case other               => fail(s"unexpected role row $other")
    }
    val b = Graph.hitsDf(li.repartition(7, col("l_suppkey")),
      ord.repartition(3)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === b.toSeq)
  }

  test("g10: clustering coefficients match an in-memory recompute") {
    val out = Graph.clusteringCoeffDf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // in-memory: distinct co-purchase pairs → adjacency → per-node
    // neighbor-pair closure
    val rows = li.select(col("l_orderkey"), col("l_partkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    for ((_, ps) <- rows.groupBy(_._1)) {
      val s0 = ps.map(_._2).distinct.sorted
      for (i <- s0.indices; j <- i + 1 until s0.length) {
        adj(s0(i)) += s0(j); adj(s0(j)) += s0(i)
      }
    }
    val scored = adj.toSeq.filter(_._2.size >= 2).map { case (n0, nb) =>
      val d = nb.size.toLong
      val nbs = nb.toSeq.sorted
      val tri = (for {
        i <- nbs.indices; j <- i + 1 until nbs.length
        if adj(nbs(i)).contains(nbs(j))
      } yield 1).size.toLong
      (n0, d, tri, tri * 2000000L / (d * (d - 1)))
    }
    val want = scored.sortBy { case (n0, _, tri, c) => (-c, -tri, n0) }
      .take(Graph.ccTopN)
      .map { case (n0, d, tri, c) => (n0, d, tri, c) }
    assert(out.toSeq === want)
    assert(out.nonEmpty)
    // coefficient is a ppm fraction: 0 ≤ c ≤ 1e6
    assert(out.forall { case (_, _, _, c) => c >= 0L && c <= 1000000L })
  }

  test("g12: joint degree matrix matches an in-memory recompute and " +
      "its mass equals the directed edge count") {
    val out = Graph.jointDegree(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pairs = t(spark, sf, "lineitem")
      .join(t(spark, sf, "orders"), expr("l_orderkey = o_orderkey"))
      .selectExpr("CAST(l_suppkey AS BIGINT)",
        s"CAST(o_custkey + ${Graph.custOffset} AS BIGINT)")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = und.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    def bucket(d: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(d)
    val want = und.groupBy { case (s0, d0) =>
        (if (s0 >= Graph.custOffset) "customer" else "supplier",
          bucket(deg(s0)), bucket(deg(d0)))
      }.toSeq
      .map { case ((r0, bs, bd), g) => (r0, bs, bd, g.length.toLong) }
      .sortBy(x => (x._1, x._2, x._3))
    assert(out.toSeq === want)
    assert(out.map(_._4).sum === und.length.toLong)
  }

  test("g13: assortativity matches an exact BigInt recompute from the " +
      "joint-degree grid and is partition-invariant") {
    def optL(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    val out = Graph.assortativity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), optL(r, 2), optL(r, 3)))
    // independent recompute: exact BigInt moment algebra over the grid
    val grid = Graph.jointDegreeDf(li, ord).collect()
      .map(r => (r.getString(0), BigInt(r.getLong(1)), BigInt(r.getLong(2)),
        BigInt(r.getLong(3))))
    val want = grid.groupBy(_._1).toSeq.sortBy(_._1).map { case (role, g) =>
      val n = g.map(_._4).sum
      val sx = g.map(c => c._4 * c._2).sum
      val sy = g.map(c => c._4 * c._3).sum
      val sxy = g.map(c => c._4 * c._2 * c._3).sum
      val sxx = g.map(c => c._4 * c._2 * c._2).sum
      val syy = g.map(c => c._4 * c._3 * c._3).sum
      val cov = n * sxy - sx * sy
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      // the contract's truncating sign-split divides, replayed exactly
      def sdiv(a: BigInt, b: BigInt): BigInt =
        if (a < 0) -((-a) / b) else a / b
      val slope = if (vx == 0) None else Some(sdiv(cov * 1000000, vx).toLong)
      val r2 = if (vx == 0 || vy == 0) None
        else Some((if (cov < 0) -(sdiv(-cov * 1000000, vx) * (-cov) / vy)
          else sdiv(cov * 1000000, vx) * cov / vy).toLong)
      (role, n.toLong, slope, r2)
    }
    assert(out.toSeq === want)
    // |signed r²| is a ppm fraction when defined
    assert(out.forall { case (_, _, _, a) =>
      a.forall(v => v >= -1000000L && v <= 1000000L) })
    val b = Graph.assortativityDf(li.repartition(7, col("l_suppkey")),
      ord.repartition(3)).collect().toSeq
    assert(Graph.assortativity(spark, sf).collect().toSeq == b)
  }

  test("g14: landmark hop histograms match an independent per-seed BFS; " +
      "cum telescopes; exactly one P90 radius row per landmark") {
    import spark.implicits._
    val out = Graph.landmarkRadiusDf(li, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // independent reference: adjacency map + per-landmark frontier BFS
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("o_custkey") + Graph.custOffset)
      .as[(Long, Long)].collect().distinct
    val adj = pairs.flatMap { case (s0, c) => Seq((s0, c), (c, s0)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = adj.toSeq.map { case (n, nb) => (n, nb.size) }
      .sortBy { case (n, d) => (-d, n) }.take(Graph.bfsSeeds).map(_._1)
    val want = seeds.flatMap { lm =>
      var dist = Map(lm -> 0L)
      for (r <- 1 to Graph.bfsRounds) {
        val frontier = dist.collect { case (n, h) if h == r - 1 => n }
        val nxt = frontier.toSet
          .flatMap(adj.getOrElse(_: Long, Set.empty[Long]))
        dist = nxt.filterNot(dist.contains).map(_ -> r.toLong).toMap ++ dist
      }
      val hist = dist.values.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val total = dist.size.toLong
      val hops = hist.keys.toSeq.sorted
      val cums = hops.scanLeft(0L)((c, h) => c + hist(h)).tail
      hops.zip(cums).map { case (h, cum) =>
        (lm, h, hist(h), cum, total,
          if (cum * 10 >= 9 * total && (cum - hist(h)) * 10 < 9 * total) 1L
          else 0L)
      }
    }.toSet
    assert(out.toSet === want)
    // exactly one radius row per landmark, and it is the FIRST hop
    // whose cumulative mass reaches 90 %
    val byLm = out.groupBy(_._1)
    assert(byLm.size === Graph.bfsSeeds)
    byLm.values.foreach { rows =>
      assert(rows.count(_._6 == 1L) === 1)
      val sorted = rows.sortBy(_._2)
      // cum telescopes: each cum = previous cum + n_nodes
      sorted.zip(sorted.map(_._3).scanLeft(0L)(_ + _).tail)
        .foreach { case (row, cum) => assert(row._4 === cum) }
      assert(sorted.last._4 === sorted.last._5)
      val radius = rows.find(_._6 == 1L).get._2
      rows.filter(_._2 < radius)
        .foreach(r => assert(r._4 * 10 < 9 * r._5))
    }
  }

  test("g19: two disjoint triangles score Q = 0.5 exactly under both " +
    "partitions; partition-invariant") {
    import spark.implicits._
    // orders 1-3 each contain parts {1,2,3}, orders 4-6 parts {4,5,6}:
    // every in-clique pair co-occurs in 3 orders (= ccSupport), so the
    // graph is two disjoint triangles. m = 6; per clique e_c = 3,
    // d_c = 6 → intra_ppm 500000, expected (500000)²/10⁶ = 250000,
    // q_c = 250000 → Q = 500000 ppm with 2 communities either way
    // (LPA converges to min-id labels inside each triangle in round 1).
    val li = (1L to 3L).flatMap(ok => Seq(1L, 2L, 3L).map(pk => (ok, pk)))
      .++((4L to 6L).flatMap(ok => Seq(4L, 5L, 6L).map(pk => (ok, pk))))
      .toDF("l_orderkey", "l_partkey")
    val out = Graph.modularityDf(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("components", 2L, 6L, 500000L),
      ("lpa", 2L, 6L, 500000L)))
    val again = Graph.modularityDf(li.repartition(7)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sameElements(again))
  }

  test("g19: a single community scores Q = 0 exactly (intra = expected)") {
    import spark.implicits._
    // one triangle: the whole graph is one component = one community;
    // e_c = m and d_c = 2m, so intra_ppm = 10⁶ = expected_ppm → Q = 0
    val li = (1L to 3L).flatMap(ok => Seq(1L, 2L, 3L).map(pk => (ok, pk)))
      .toDF("l_orderkey", "l_partkey")
    val out = Graph.modularityDf(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("components", 1L, 3L, 0L),
      ("lpa", 1L, 3L, 0L)))
  }

  test("g19: empty input yields the two zero rows, no failure") {
    import spark.implicits._
    val li = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
    val out = Graph.modularityDf(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("components", 0L, 0L, 0L),
      ("lpa", 0L, 0L, 0L)))
  }
}
