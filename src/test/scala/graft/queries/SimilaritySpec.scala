package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Clustered corpus: 4 well-separated random directions, 50 vectors
    * each with small noise; vec_ids 0,50,100,150 are cluster seeds and
    * also the query set (queryStride = 50). */
  private lazy val clustered = {
    val rnd = new Random(7)
    def unit(dim: Int): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val dim = 16
    val centers = Array.fill(4)(unit(dim))
    val rows = for (c <- 0 until 4; i <- 0 until 50) yield {
      val base = centers(c)
      val noise = unit(dim).map(_ * 0.15)
      val v = base.zip(noise).map { case (a, b) => (a + b).toFloat }
      ((c * 50 + i).toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("brute-force top-k: neighbors of a cluster seed are its own cluster") {
    val got = Similarity.bruteForceTopKDf(clustered)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val byQ = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byQ.keySet === Set(0L, 50L, 100L, 150L))
    for ((q, ns) <- byQ) {
      assert(ns.size === Similarity.topK)
      val cluster = (q until q + 50).toSet - q
      assert(ns.subsetOf(cluster), s"query $q strayed outside its cluster")
    }
  }

  test("LSH top-k recall vs brute force is high on clustered data") {
    val exact = Similarity.bruteForceTopKDf(clustered)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopKDf(clustered)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
    // scale sanity: LSH candidate work is a fraction of brute force
    assert(approx.nonEmpty)
  }

  test("s09 ann recall reproduces the measured bf∩lsh intersection per query") {
    val out = Similarity.annRecallDf(clustered).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // independent recomputation of the intersection
    val exact = Similarity.bruteForceTopKDf(clustered)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.lshTopKDf(clustered)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(out.map(_._1).toSet === exact.keySet)
    out.foreach { case (q, nExact, nHit, recall) =>
      assert(nExact === exact(q).size.toLong)
      assert(nHit ===
        (exact(q) & approx.getOrElse(q, Set.empty)).size.toLong)
      assert(nHit <= nExact)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(math.abs(recall - nHit.toDouble / nExact) < 1e-3)
    }
  }

  test("PQ top-k is bit-exact under re-partitioning; distances rank monotonically") {
    val a = Similarity.pqTopKDf(clustered).collect().toSeq
    val b = Similarity.pqTopKDf(clustered.repartition(7)).collect().toSeq
    assert(a == b) // integer ADC ⇒ partition-invariant, like g01/d07
    assert(a.nonEmpty)
    a.map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).foreach { case (_, g) =>
        assert(g.size === Similarity.topK)
        val byRank = g.sortBy(_._3).map(_._2)
        assert(byRank.zip(byRank.tail).forall { case (x, y) => x <= y })
      }
  }

  test("IVF-PQ candidates are a subset of the probed cells; deterministic") {
    val a = Similarity.ivfPqTopKDf(clustered).collect().toSeq
    val b = Similarity.ivfPqTopKDf(clustered.repartition(5)).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // IVF routing: every result pair must also appear in the raw IVF
    // candidate set (the composition only re-scores, never widens)
    val ivfPairs = Similarity.ivfTopKDf(clustered)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // not a strict subset of IVF's TOP-K (scoring differs), but every
    // s07 query must be one IVF also produced results for
    val qs = a.map(_.getLong(0)).toSet
    assert(qs === ivfPairs.map(_._1))
  }

  test("s11: refine matches an in-memory two-stage recompute") {
    val out = Similarity.refineTopKDf(clustered)
      .select("query_id", "neighbor_id", "exact_dist", "rank")
      .as[(Long, Long, Long, Long)].collect()
    val vecs = clustered.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
      .map { case (k, v) => k -> v.map(_.toDouble) }
    val subDim = Similarity.pqSubDim
    def fpSub(a: Array[Double], b: Array[Double], m: Int): Long =
      (m * subDim until math.min((m + 1) * subDim, a.length)).map { i =>
        math.floor((a(i) - b(i)) * (a(i) - b(i)) * 1048576.0).toLong
      }.sum
    def fpAll(a: Array[Double], b: Array[Double]): Long =
      a.indices.map { i =>
        math.floor((a(i) - b(i)) * (a(i) - b(i)) * 1048576.0).toLong
      }.sum
    val nM = (vecs(0L).length + subDim - 1) / subDim
    val cb = (0 until Similarity.pqCodes).map(k => vecs(k.toLong))
    def codes(v: Array[Double]): IndexedSeq[Int] =
      (0 until nM).map { m =>
        cb.indices.minBy(k => (fpSub(v, cb(k), m), k))
      }
    val want = vecs.keys.toSeq.filter(q =>
        q % Similarity.queryStride == 0 &&
        q < Similarity.queryStride.toLong * Similarity.maxQueries)
      .flatMap { q =>
        val cand = vecs.keys.toSeq.filter(_ != q)
          .map { c =>
            val approx = (0 until nM)
              .map(m => fpSub(vecs(q), cb(codes(vecs(c))(m)), m)).sum
            (c, approx)
          }
          .sortBy { case (c, a) => (a, c) }.take(Similarity.rerankC)
        cand.map { case (c, _) => (c, fpAll(vecs(q), vecs(c))) }
          .sortBy { case (c, d) => (d, c) }.take(Similarity.topK)
          .zipWithIndex
          .map { case ((c, d), i) => (q, c, d, (i + 1).toLong) }
      }.toSet
    assert(out.toSet === want)
  }

  test("cosine scores are rounded, in [-1, 1], ranked descending") {
    val rows = Similarity.bruteForceTopKDf(clustered)
      .as[(Long, Long, Double, Long)].collect()
    assert(rows.forall { case (_, _, c, _) => c >= -1.0001 && c <= 1.0001 })
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byRank = g.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("s08: int8 codes and reconstruction error match an exact " +
      "integer recompute") {
    // dim 1 spans [0,1] (codes 0/127/255); dim 2 is constant (the
    // degenerate mx=mn dimension must quantize to 0 with zero error)
    val embs = Seq(
      (0L, Array(0.0f, 7.0f), 0),
      (1L, Array(1.0f, 7.0f), 0),
      (2L, Array(0.5f, 7.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.embeddingQuantizeDf(embs)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    def fp(x: Double): Long = math.floor(x * Similarity.fpScale).toLong
    val (mn, mx) = (fp(0.0), fp(1.0))
    Map(0L -> 0.0, 1L -> 1.0, 2L -> 0.5).foreach { case (id, v) =>
      val vi = fp(v)
      val code = (vi - mn) * 255L / (mx - mn)
      val recon = mn + code * (mx - mn) / 255L
      // code_sum weights dim 1 by 1; the constant dim contributes 0
      assert(got(id) === ((id, 2L, code, math.abs(vi - recon))),
        s"vec $id: code $code recon $recon")
    }
    assert(got(1L)._3 === 255L && got(0L)._3 === 0L)
  }

  test("s16: quantization recall is EXACTLY 1e6 ppm on lattice-exact " +
      "vectors and within [0, 1e6] with full rows on noisy ones") {
    import spark.implicits._
    // binary vectors sit exactly on the 256-level lattice endpoints
    // (code 0 and 255 reconstruct losslessly), so the quantized ranking
    // must equal the exact ranking bit-for-bit — recall is an
    // invariant 1.0, not a measurement (the s15 nprobe=all discipline)
    val dim = 6
    val lattice = (0 until 40).map { i =>
      (i.toLong,
        Array.tabulate(dim)(d => if (((i >> d) & 1) == 1) 1.0f else 0.0f),
        0)
    }.toDF("vec_id", "embedding", "label")
    val exactRows = Similarity.quantRecallDf(lattice)
      .as[(Long, Long, Long, Long)].collect()
    assert(exactRows.map(_._1).toSet === Set(0L))
    exactRows.foreach { case (_, nExact, nHit, ppm) =>
      assert(nExact === Similarity.topK.toLong)
      assert(nHit === nExact && ppm === 1000000L)
    }
    // noisy clustered corpus: every query reports, recall in range
    val rows = Similarity.quantRecallDf(clustered)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet === Set(0L, 50L, 100L, 150L))
    rows.foreach { case (_, nExact, nHit, ppm) =>
      assert(nExact === Similarity.topK.toLong)
      assert(nHit >= 0L && nHit <= nExact)
      assert(ppm === nHit * 1000000L / nExact)
    }
  }

  test("s17: random-projection recall matches an in-memory JL recompute " +
      "(same md5 sign matrix, same integer lattice)") {
    val rows = Similarity.rpRecallDf(clustered)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val vecs = clustered.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def sign(j: Int, dim: Int): Long = {
      val v = "0123456789abcdef".indexOf(md5hex(s"rp:$j:$dim").charAt(0))
      if (v % 2 == 1) 1L else -1L
    }
    val lat = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x * Similarity.fpScale).toLong)
    }
    val proj = lat.map { case (id, vi) =>
      id -> Array.tabulate(Similarity.rpDims)(j =>
        vi.indices.map(i => sign(j, i) * vi(i)).sum)
    }
    def fpdot(a: Array[Double], b: Array[Double]): Long =
      a.zip(b).map { case (x, y) =>
        math.floor(x * y * Similarity.fpScale).toLong }.sum
    val queries = vecs.keys.filter(id =>
      id % Similarity.queryStride == 0 &&
        id < Similarity.queryStride.toLong * Similarity.maxQueries)
      .toSeq.sorted
    val want = queries.map { q =>
      val cands = vecs.keys.filter(_ != q).toSeq
      val exTop = cands.map(c => (c, fpdot(vecs(q), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }
        .take(Similarity.topK).map(_._1).toSet
      val pq = proj(q)
      val prTop = cands
        .map(c => (c, pq.zip(proj(c)).map { case (x, y) => x * y }.sum))
        .sortBy { case (c, s) => (-s, c) }
        .take(Similarity.topK).map(_._1).toSet
      val hit = exTop.count(prTop).toLong
      (q, Similarity.topK.toLong, hit, hit * 1000000L / Similarity.topK)
    }
    assert(rows === want)
    // clustered data: the 16-dim sketch keeps most of a well-separated
    // cluster's ranking — recall should be far above chance
    assert(rows.map(_._4).min >= 300000L,
      s"projection destroyed the ranking: $rows")
  }

  test("s18: IVF balance conserves the corpus and its integer shares; " +
      "bounded to numCells rows") {
    val rows = Similarity.ivfBalanceDf(clustered)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length <= Similarity.numCells && rows.nonEmpty)
    val total = rows.map(_._2).sum
    assert(total === clustered.count())
    rows.foreach { case (cell, n, share, dev) =>
      assert(cell >= 0L && cell < Similarity.numCells.toLong)
      assert(n >= 1L)
      assert(share === n * 1000000L / total)
      val num = n * Similarity.numCells - total
      val want = if (num >= 0) num * 1000000L / total
      else -((-num) * 1000000L / total)
      assert(dev === want)
    }
    // the shares of a 4-cluster corpus on 8 cells must be visibly
    // skewed (some cells host a cluster, some only strays) — the
    // audit's reason to exist
    assert(rows.map(_._3).max > rows.map(_._3).min)
  }

  test("s10: MMR picks match an in-memory greedy recompute") {
    val out = Similarity.mmrDiversifyDf(clustered).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val vecs = clustered.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def fp(a: Array[Double], b: Array[Double]): Long =
      a.zip(b).map { case (x, y) => math.floor(x * y * 1048576.0).toLong }.sum
    val queries = vecs.keys.filter(id =>
      id % Similarity.queryStride == 0 &&
        id < Similarity.queryStride.toLong * Similarity.maxQueries).toSeq.sorted
    val exp = queries.flatMap { q =>
      val pool = vecs.keys.filter(_ != q).toSeq
        .map(c => (c, fp(vecs(q), vecs(c))))
        .sortBy { case (c, rel) => (-rel, c) }.take(Similarity.mmrPool)
      var sel = List.empty[(Long, Long, Long)] // (cid, pick, score)
      for (r <- 1 to Similarity.mmrK) {
        val pick =
          if (r == 1) pool.map { case (c, rel) =>
            (c, rel * Similarity.mmrLam)
          }.minBy { case (c, s0) => (-s0, c) }
          else pool.filterNot(p => sel.exists(_._1 == p._1))
            .map { case (c, rel) =>
              val mx = sel.map(s0 => fp(vecs(c), vecs(s0._1))).max
              (c, rel * Similarity.mmrLam - mx * (100L - Similarity.mmrLam))
            }.minBy { case (c, s0) => (-s0, c) }
        sel = sel :+ ((pick._1, r.toLong, pick._2))
      }
      sel.map { case (c, p, s0) => (q, p, c, s0) }
    }
    assert(out.toSeq === exp)
    // diversity holds: picks within a query are distinct
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length === rows.length)
    }
  }

  test("s12: filtered top-k stays inside the label partition and " +
      "matches an in-memory recompute") {
    val out = Similarity.filteredTopKDf(clustered)
      .as[(Long, Long, Long, Double, Long)].collect()
    val vecs = clustered.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
      .map { case (k, v) => k -> v.map(_.toDouble) }
    // mirror the engine's sequential fold order exactly
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x * x))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x * x))
      BigDecimal(dot / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = Seq(0L, 50L, 100L, 150L).flatMap { q =>
      val lbl = q / 50
      (lbl * 50 until (lbl + 1) * 50).map(_.toLong).filter(_ != q)
        .map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, s0) => (-s0, c) }.take(Similarity.topK)
        .zipWithIndex
        .map { case ((c, s0), i) => (q, lbl, c, s0, (i + 1).toLong) }
    }.toSet
    assert(out.toSet === want)
    // the filter is honored: every neighbor shares the query's label
    assert(out.forall { case (q, lbl, n0, _, _) =>
      q / 50 == lbl && n0 / 50 == lbl })
  }

  test("s13: MIH finds every neighbor inside the pigeonhole radius " +
      "with exact popcount distances; an all-bands-flipped vector " +
      "(hamming 8) is correctly pruned") {
    // deterministic ±1 vectors over 64 dims; `flips` negates those dims
    def pm(flips: Set[Int]): Array[Float] = Array.tabulate(64) { i =>
      val s = if (i % 3 == 0) 1f else -1f
      if (flips(i)) -s else s
    }
    val rows = Seq(
      (0L, pm(Set.empty), 0), // the only query (vec_id % 50 == 0)
      (7L, pm(Set(1, 2, 3)), 0), // 3 flips in band 0 -> hamming 3
      (11L, pm(Set(16, 17, 18, 19, 20)), 0), // 5 flips in band 2
      (12L, pm((0 until 7).map(_ * 8).toSet), 0), // 7 bands touched
      (9L, pm((0 until 8).map(_ * 8).toSet), 0)) // every band differs
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.mihHammingTopKDf(rows)
      .select("query_id", "neighbor_id", "hamming", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._4)
    // hamming < 8 MUST share a band (pigeonhole over 8 bands); vec 9
    // sits exactly AT distance 8 with one flip per band, so no band
    // matches and MIH prunes it — the guarantee's sharp boundary
    assert(got === Seq((0L, 7L, 3L, 1L), (0L, 11L, 5L, 2L),
      (0L, 12L, 7L, 3L)))
  }

  test("s19: kNN graph covers every multi-member cell's vectors; edges " +
    "stay in-cell; top-1 matches a per-cell brute recompute") {
    val out = Similarity.knnGraphDf(clustered)
      .select("vec_id", "cell", "neighbor_id", "cos_sim", "rank")
      .as[(Long, Long, Long, Double, Long)].collect()
    // rank is dense 1..k per vector and capped at kGraphK
    val byV = out.groupBy(_._1)
    byV.values.foreach { rows =>
      assert(rows.length <= Similarity.kGraphK)
      assert(rows.map(_._5).sorted.sameElements(1L to rows.length))
    }
    // every vector shares its cell with all of its neighbors, and the
    // graph covers exactly the vectors whose cell has >= 2 members
    val cellOf = out.map(r => (r._1, r._2)).toMap ++
      out.map(r => (r._3, r._2)).toMap
    out.foreach(r => assert(cellOf(r._3) === r._2))
    // per-cell brute recompute of the top-1 neighbor (rounded-cosine +
    // id order, the contract's total order)
    val vecs = clustered.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, v.map(_.toDouble)) }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val members = out.map(r => (r._1, r._2)).distinct.groupBy(_._2)
    for ((cell, vs) <- members; (v, _) <- vs if byV.contains(v)) {
      val want = vs.map(_._1).filter(_ != v)
        .map(n => (cos(vecs(v), vecs(n)), n))
        .maxBy { case (c, n) => (c, -n) }
      val got = byV(v).find(_._5 == 1L).get
      assert((got._4, got._3) === want,
        s"top-1 of $v in cell $cell: got $got, want $want")
    }
    // deterministic under re-partitioning
    val again = Similarity.knnGraphDf(clustered.repartition(7))
      .select("vec_id", "cell", "neighbor_id", "cos_sim", "rank")
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(out.sortBy(r => (r._1, r._5))
      .sameElements(again.sortBy(r => (r._1, r._5))))
  }

  test("s15: probe-sweep recall is monotone in nprobe and EXACTLY 1.0 " +
      "when every cell is probed") {
    val out = Similarity.ivfProbeSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 4L, Similarity.numCells.toLong))
    // one shared truth denominator
    assert(out.map(_._2).distinct.length === 1)
    // recall (and hits) monotone non-decreasing in probed volume
    assert(out.sliding(2).forall {
      case Array(a, b) => b._3 >= a._3 && b._4 >= a._4
      case _ => true
    })
    // probing all numCells cells makes the candidate set the whole
    // corpus: the ranking equals brute force, so recall is exactly 1
    val full = out.last
    assert(full._3 === full._2)
    assert(full._4 === 1.0)
  }

  test("assignCells on an empty seed relation yields zero rows — the " +
      "packed map form keeps the crossJoin contract (r12, ADVICE-r11)") {
    import spark.implicits._
    val e = Similarity.emb(Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("vec_id", "embedding"))
    val seeds = Seq.empty[(Long, Seq[Double])].toDF("cell", "sv")
    // pre-r12 the one-row empty-array aggregate let every probe row
    // survive with a NULL cell; the size() filter restores zero rows
    assert(Similarity.assignCells(seeds, e, 1, "cell").count() === 0L)
  }
}
