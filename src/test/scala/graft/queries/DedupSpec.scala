package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Crafted corpus: 0/1 near-dups (one token differs), 2 an exact copy
    * of 0, 3/4 unrelated. */
  private lazy val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3L, "one two three four five six seven eight nine ten"),
    (4L, "red green blue cyan magenta yellow black white grey pink"))
    .toDF("doc_id", "text")

  test("cosParamsFor pins the contract and sf1-measured points, " +
      "scales monotonically") {
    // gate-scale corpora get the oracle-locked contract signature
    assert(Dedup.cosParamsFor(500L) === (Dedup.cosPlanes, Dedup.cosBands))
    assert(Dedup.cosParamsFor(2048L) === (Dedup.cosPlanes, Dedup.cosBands))
    // intermediate corpora interpolate (occupancy ~ n / 2^rows ≈ 128)
    assert(Dedup.cosParamsFor(5000L) === (24, Dedup.cosBands))
    // the sf1-measured winner (CosineLshProbe: 65.8 s -> 7.4 s at 20k)
    assert(Dedup.cosParamsFor(20000L) === (32, Dedup.cosBands))
    // rows-per-band grows with log2(n): +4 bits per band per 16x corpus
    val ns = Seq(1L << 17, 1L << 21, 1L << 25, 1L << 30, 1L << 40)
    val rows = ns.map(n => Dedup.cosParamsFor(n)._1 / Dedup.cosBands)
    assert(rows === Seq(10, 14, 18, 23, 33))
    assert(rows.sliding(2).forall(p => p(0) < p(1)))
  }

  test("exact dedup groups identical texts, keeper = min doc_id") {
    val got = Dedup.exactDf(docs)
      .select("keeper", "n_copies").as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 2L), (1L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("minhash LSH finds the near-dup pair and the exact pair") {
    val got = Dedup.minHashLshDf(docs)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    // exact copy: all 16 signatures match
    assert(got((0L, 2L)) === 1.0)
    // near-dup (8 of 10 shingles shared, J≈0.67): banding should catch it
    assert(got.contains((0L, 1L)) && got.contains((1L, 2L)))
    assert(got((0L, 1L)) > 0.2)
    // unrelated docs never become candidates
    assert(!got.keys.exists { case (a, b) => b >= 3L || a >= 3L })
  }

  test("d17: calibration buckets candidates by signature matches with " +
      "exact true-Jaccard stats; exact copies land at 16/16 = 1e6 ppm") {
    val got = Dedup.minhashCalibrationDf(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // the exact-copy pair (0,2): all 16 signatures match, true J = 1
    val full = got(16L)
    assert(full._2 >= 1L && full._3 === 1000000L &&
      full._4 === 1000000L && full._5 === 1000000L && full._6 === 1000000L)
    // every bucket: n_pairs >= 1, est = m*62500, min <= mean <= max
    got.values.foreach { case (m, n, est, mean, mn, mx) =>
      assert(n >= 1L && est === m * 1000000L / 16L)
      assert(mn <= mean && mean <= mx && mn >= 0L && mx <= 1000000L)
    }
    // unrelated docs (3, 4) never become candidates in any bucket:
    // total calibrated pairs == total banded candidate pairs, and the
    // near-dup pair (0,1) calibrates at its exact 7/9 Jaccard floor
    val nearPpm = 7L * 1000000L / 9L
    assert(got.values.exists { case (_, _, _, mean, mn, mx) =>
      mn <= nearPpm && nearPpm <= mx })
  }

  test("d18: SimHash calibration buckets banded candidates by hamming " +
      "with exact true-Jaccard stats; exact copies land at hamming 0") {
    val got = Dedup.simhashCalibrationDf(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // bounded output: one row per hamming value, 0..simhashBits
    assert(got.size <= Dedup.simhashBits + 1)
    assert(got.keys.forall(h => h >= 0L && h <= Dedup.simhashBits.toLong))
    // the exact-copy pair (0,2): hamming 0, true J = 1
    val zero = got(0L)
    assert(zero._2 >= 1L && zero._3 === 1000000L &&
      zero._4 === 1000000L && zero._5 === 1000000L)
    // every bucket: n_pairs >= 1, 0 <= min <= mean <= max <= 1e6
    got.values.foreach { case (_, n, mean, mn, mx) =>
      assert(n >= 1L && mn <= mean && mean <= mx && mn >= 0L &&
        mx <= 1000000L)
    }
    // the near-dup pair (0,1) calibrates somewhere at its exact 7/9
    // Jaccard (the d17 cross-check: both calibration tables see the
    // same true similarity for the same pair)
    val nearPpm = 7L * 1000000L / 9L
    assert(got.values.exists { case (_, _, _, mn, mx) =>
      mn <= nearPpm && nearPpm <= mx })
  }

  test("d19: cluster drift reports exact member-to-keeper Jaccard per " +
      "cluster size; the near-dup chain's floor is the 7/9 pair") {
    val out = Dedup.clusterDriftDf(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // independent recompute from the labels + raw texts
    val labels = Dedup.dupClustersDf(docs)
      .select("doc_id", "cluster", "cluster_size")
      .as[(Long, Long, Long)].collect()
    val texts = docs.as[(Long, String)].collect().toMap
    def shingles(tx: String): Set[String] = {
      val tk = tx.split(" ")
      (1 to math.max(tk.length - 2, 1))
        .map(i => tk.slice(i - 1, i + 2).mkString(" ")).toSet
    }
    def jppm(a: Long, b: Long): Long = {
      val (sa, sb) = (shingles(texts(a)), shingles(texts(b)))
      val c = (sa & sb).size.toLong
      c * 1000000L / (sa.size + sb.size - c)
    }
    val want = labels.filter(l => l._1 != l._2)
      .map { case (m, k, size) => (size, k, jppm(m, k)) }
      .groupBy(_._1).map { case (size, g) =>
        (size, g.map(_._2).distinct.length.toLong, g.length.toLong,
          g.map(_._3).min, g.map(_._3).sum / g.length, g.map(_._3).max)
      }.toSeq.sortBy(_._1)
    assert(out === want)
    // the fixture's one multi-doc cluster {0,1,2}: keeper 0, members
    // 1 (7/9 Jaccard) and 2 (exact copy) — the min IS the drift floor
    assert(out.length === 1)
    val (size, nc, nm, mn, mean, mx) = out.head
    assert(size === 3L && nc === 1L && nm === 2L)
    assert(mn === 7L * 1000000L / 9L && mx === 1000000L)
    assert(mean === (mn + mx) / 2)
  }

  test("ngram jaccard computes the exact shingle overlap") {
    val got = Dedup.ngramJaccardDf(docs)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(got((0L, 2L)) === 1.0)
    // docs 0/1: 10 tokens → 8 shingles each, 7 shared → 7/9
    assert(math.abs(got((0L, 1L)) - 7.0 / 9.0) < 1e-12)
    assert(!got.contains((0L, 3L)))
  }

  test("simhash: identical docs equal fingerprints; near-dups close") {
    val fp = Dedup.simHashDf(docs).as[(Long, String)].collect().toMap
    assert(fp(0L) === fp(2L))
    assert(fp(0L).length === Dedup.simhashBits)
    assert(fp(0L).forall(c => c == '0' || c == '1'))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(fp(0L), fp(1L)) < ham(fp(0L), fp(3L)))
  }

  test("simhash pairs: banding finds hamming<=3 pairs (incl. exact copies)") {
    val got = Dedup.simHashPairsDf(docs)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    assert(got((0L, 2L)) === 0L)
    assert(got.values.forall(_ <= Dedup.simhashMaxHamming))
  }

  test("simhashParamsFor: contract geometry at gate corpora, band width " +
      "grows with log2(n), capped at one md5's 128 bits") {
    // gate corpora (sf0.01 = 500 docs, anything <= 4096) keep the
    // oracle-locked 32-bit/4-band contract geometry
    assert(Dedup.simhashParamsFor(0L) === (32, 4))
    assert(Dedup.simhashParamsFor(500L) === (32, 4))
    assert(Dedup.simhashParamsFor(4096L) === (32, 4))
    // the r7 sf1 corpus (50 k docs): ceil(log2) = 16 -> bandW 12 -> 48
    assert(Dedup.simhashParamsFor(50000L) === (48, 4))
    // monotone non-decreasing in n, always bands * bandW, bands fixed
    val widths = Seq(1L, 100L, 10000L, 1000000L, 100000000L,
      10000000000L, 1000000000000L).map(Dedup.simhashParamsFor)
    assert(widths.map(_._1) === widths.map(_._1).sorted)
    assert(widths.forall(_._2 === Dedup.simhashBands))
    assert(widths.forall(w => w._1 % w._2 === 0))
    // capped at 128 bits (md5 supplies hex char j/4 for bit j < 128)
    assert(Dedup.simhashParamsFor(Long.MaxValue) === (128, 4))
  }

  test("widened simhash geometry EXTENDS the contract fingerprint: " +
      "bit j < 32 identical, defaults byte-identical to explicit 32/4") {
    val fp32 = Dedup.simHashDf(docs).as[(Long, String)].collect().toMap
    val fp32e = Dedup.simHashDf(docs, 32).as[(Long, String)].collect().toMap
    assert(fp32 === fp32e) // default IS the contract geometry
    val fp64 = Dedup.simHashDf(docs, 64).as[(Long, String)].collect().toMap
    assert(fp64.keySet === fp32.keySet)
    fp64.foreach { case (id, f) =>
      assert(f.length === 64)
      assert(f.take(32) === fp32(id),
        s"doc $id: wider fingerprint must extend, not reshuffle")
    }
    // pairs/calibration under explicit contract geometry == defaults
    val p = Dedup.simHashPairsDf(docs).as[(Long, Long, Long)].collect().toSet
    val pe = Dedup.simHashPairsDf(docs, 32, 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(p === pe)
    val c = Dedup.simhashCalibrationDf(docs).collect().map(_.toString).toSet
    val ce = Dedup.simhashCalibrationDf(docs, 32, 4)
      .collect().map(_.toString).toSet
    assert(c === ce)
    spark.catalog.clearCache()
  }

  test("d20: relative-cutoff scaled pairs contain the absolute-cutoff " +
      "survivors (the r10 default recovers the recall the absolute " +
      "cutoff drops), exact copies stay at hamming 0") {
    // containment is structural, not statistical: every 16-bit band
    // match is covered by both its 8-bit halves (8 half-width bands ⊇
    // 4 full-width bands as candidate generators) and cutoff 6 ≥ 3 —
    // so the relative geometry can only ADD pairs the absolute one
    // dropped, never lose one
    val rel = Dedup.simHashPairsDf(docs, Dedup.simhashScaledBits,
        Dedup.simhashRelativeBands, Dedup.simhashRelativeCutoff)
      .as[(Long, Long, Long)].collect().map { case (a, b, h) => (a, b) -> h }.toMap
    val abs = Dedup.simHashPairsDf(docs, Dedup.simhashScaledBits, 4)
      .as[(Long, Long, Long)].collect().map { case (a, b, h) => (a, b) -> h }.toMap
    assert(abs.keySet.subsetOf(rel.keySet),
      s"relative geometry lost absolute survivors: ${abs.keySet -- rel.keySet}")
    assert(rel((0L, 2L)) === 0L) // the exact copy survives any geometry
    abs.foreach { case (k, h) => assert(rel(k) === h) } // same fingerprint
    spark.catalog.clearCache()
  }

  test("embedding cosine near-dup finds same-direction vectors") {
    val embs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.99f, 0.1f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 0),
      (3L, Array(-1f, 0f, 0f, 0f), 1),
      (4L, Array(1f, 0.01f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Dedup.embeddingCosineDf(embs)
      .as[(Long, Long, Double)].collect().map { case (a, b, c) => (a, b) -> c }.toMap
    assert(got.contains((0L, 1L)) && got((0L, 1L)) > 0.99)
    assert(!got.contains((0L, 2L))) // orthogonal → below threshold
    assert(!got.contains((0L, 3L))) // opposite direction → below threshold
    // candidates come from LSH signatures, NOT the label column: a
    // near-dup in a different label still pairs up
    assert(got.contains((0L, 4L)) && got((0L, 4L)) > 0.99)
  }

  test("d13 semdedup prunes in-cell near-identical vectors, keeps the min id") {
    // seeds 0..7 are distinct well-separated directions (the quantizer
    // trains one cell each); 8/9 are near-identical to seed 0
    // (pairwise L2² ≤ 0.01 ≪ threshold) so they land in 0's cell and
    // must prune against it
    val embs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 5f, 0f, 0f)),
      (2L, Array(0f, 0f, 5f, 0f)),
      (3L, Array(0f, 0f, 0f, 5f)),
      (4L, Array(5f, 5f, 0f, 0f)),
      (5L, Array(0f, 5f, 5f, 0f)),
      (6L, Array(5f, 0f, 5f, 0f)),
      (7L, Array(0f, 5f, 0f, 5f)),
      (8L, Array(1f, 0.1f, 0f, 0f)),
      (9L, Array(1f, 0.05f, 0f, 0f)))
      .map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
    val got = Dedup.semDedupDf(embs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got(8L) === 1L && got(9L) === 1L, "near-dups of 0 must prune")
    (0L to 7L).foreach { id =>
      assert(got(id) === 0L, s"vec $id wrongly pruned")
    }
    // pruning decisions are partition-invariant (integer distances)
    val again = Dedup.semDedupDf(embs.repartition(5))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(again === got)
  }

  test("d14 span dedup finds maximal cross-doc spans and merges islands") {
    // 10/11 share the 6-token run "c d e f g h" at positions 3-8;
    // 13/14 share two separated runs (positions 1-4 and 8-12) that must
    // stay two islands (gap 7 > k=4); 12 shares nothing.
    val corpus = Seq(
      (10L, "a b c d e f g h i j"),
      (11L, "x y c d e f g h w v"),
      (12L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      (13L, "p1 p2 p3 p4 m1 m2 m3 q1 q2 q3 q4 q5"),
      (14L, "p1 p2 p3 p4 n1 n2 n3 q1 q2 q3 q4 q5"))
      .toDF("doc_id", "text")
    val got = Dedup.spanDedupDf(corpus)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (10L, 3L, 8L, 6L), (11L, 3L, 8L, 6L),
      (13L, 1L, 4L, 4L), (13L, 8L, 12L, 5L),
      (14L, 1L, 4L, 4L), (14L, 8L, 12L, 5L)))
    // span decisions are integer/md5-only → partition-invariant
    val again = Dedup.spanDedupDf(corpus.repartition(7))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(again === got)
  }

  test("dup clusters: near-dup pairs resolve to components with one keeper each") {
    val got = Dedup.dupClustersDf(docs)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, cl, sz, kp) => id -> ((cl, sz, kp)) }.toMap
    // 0/1/2 are one near-dup component (pairs 0-1, 0-2, 1-2) → cluster 0
    assert(got(0L) === ((0L, 3L, 1L)))
    assert(got(1L) === ((0L, 3L, 0L)))
    assert(got(2L) === ((0L, 3L, 0L)))
    // unrelated docs stay singleton keepers
    assert(got(3L) === ((3L, 1L, 1L)))
    assert(got(4L) === ((4L, 1L, 1L)))
  }

  test("canonical selection keeps the best-quality doc per cluster") {
    // docs 0/1/2 cluster together; all have 10 tokens and no stopwords
    // (keep=0, reason no_stopwords), so the tiebreak falls to doc_id →
    // canonical 0. Singletons are their own canonicals.
    val got = Dedup.canonicalDocsDf(docs)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (cl, cd, sz, kp) => cl -> ((cd, sz, kp)) }.toMap
    assert(got(0L) === ((0L, 3L, 0L)))
    assert(got(3L) === ((3L, 1L, 0L)))
    assert(got(4L) === ((4L, 1L, 0L)))
    assert(got.size === 3)
    // quality must outrank doc_id: a longer stopword-bearing doc in a
    // fresh corpus wins over a lower-id junk doc
    val mixed = Seq(
      (0L, "x y"), // too_short, keep=0
      (1L, "the quick brown fox jumps over the lazy sleeping dog"))
      .toDF("doc_id", "text")
    val solo = Dedup.canonicalDocsDf(mixed)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (cl, cd, _, kp) => cl -> ((cd, kp)) }.toMap
    assert(solo(1L) === ((1L, 1L))) // keep=1 doc is its own canonical
  }

  test("incremental dedup pairs delta docs with base only, never delta-delta") {
    // delta slice = doc_id % 5 == 4 → docs 4 and 9; both copy base doc 0;
    // the delta-delta pair (4,9) must NOT appear
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "one two three four five six seven eight nine ten"),
      (9L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedupDf(corpus)
      .as[(Long, Long, Double)].collect()
    assert(got.map(g => (g._1, g._2)).toSet === Set((4L, 0L), (9L, 0L)))
    assert(got.forall(_._3 == 1.0)) // verbatim copies: all 16 sigs match
  }

  test("decontamination drops corpus docs sharing a shingle with the eval slice") {
    // eval slice = doc_id % 50 == 0 → docs 0 and 50.
    // doc 1 shares a 3-token shingle with eval doc 0 → contaminated.
    // doc 3 is a verbatim copy of eval doc 50 → contaminated.
    // doc 2 shares nothing → survives.
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "prefix alpha beta gamma suffix words that differ wholly here"),
      (2L, "one two three four five six seven eight nine ten"),
      (50L, "red green blue cyan magenta yellow black white grey pink"),
      (3L, "red green blue cyan magenta yellow black white grey pink"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val kept = Dedup.decontaminateDf(corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L))
    // partition invariance: the sample IS the lineage
    val again = Dedup.decontaminateDf(corpus.repartition(7))
      .select("doc_id").as[Long].collect().toSet
    assert(again === kept)
  }

  test("ngram jaccard prunes stop-shingles: a shingle in every doc is not a hot key") {
    // 120 docs that share ONLY one boilerplate shingle (df=120 >
    // maxShingleDf): without the df-cutoff this yields 120·119/2 pairs
    // at jaccard 1/3; with it, the stop-shingle is dropped from the
    // feature set and no pairs survive.
    assert(Dedup.maxShingleDf < 120)
    val skewed = (0 until 120)
      .map(i => (i.toLong, s"common stop shingle uniq$i"))
      .toDF("doc_id", "text")
    assert(Dedup.ngramJaccardDf(skewed).count() === 0L)
  }

  test("d12: containment catches the subset duplicate symmetric jaccard dilutes") {
    val core = (1 to 30).map(i => s"tok$i").mkString(" ")
    val wrapper = core + " " + (1 to 600).map(i => s"pad$i").mkString(" ")
    val docs = Seq((1L, core), (2L, wrapper),
      (3L, "an unrelated document about nothing at all"))
      .toDF("doc_id", "text")
    // the core is a strict prefix of the wrapper: containment 1.0 with
    // canonical orientation (smaller set = inner)
    val cont = Dedup.containmentDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(cont.exists { case (i, o, c) => i == 1L && o == 2L && c == 1.0 },
      s"subset dup not caught: ${cont.toSeq}")
    assert(!cont.exists(p => p._1 == 3L || p._2 == 3L))
    // symmetric jaccard on the same pair: 28/628 — under even the d03
    // threshold, which is the whole point of the asymmetric measure
    val jac = Dedup.ngramJaccardDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(!jac.contains((1L, 2L)),
      "jaccard unexpectedly kept the pair")
  }

  test("d15: audit counts equal an independent intersection of the " +
    "two public pipelines") {
    val docs = graft.Tables.t(spark, sf, "documents")
    val row = Dedup.lshRecallDf(docs).collect().head
    val (nT, nC, nF) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val truth = Dedup.ngramJaccardDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = Dedup.minHashLshDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nT === truth.size.toLong)
    assert(nC === cands.size.toLong)
    assert(nF === (truth intersect cands).size.toLong)
    assert(nF <= math.min(nT, nC))
    assert(row.getLong(3) === nF * 1000000L / nT)
    assert(row.getLong(4) === nF * 1000000L / nC)
  }

  test("d16: edit verification certifies LSH candidates with exact " +
      "Levenshtein on the normalized prefix") {
    // classic DP Levenshtein as the in-memory reference
    def lev(a: String, b: String): Long = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length).toLong
    }
    val got = Dedup.editVerifyDf(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val texts = docs.as[(Long, String)].collect().toMap
      .map { case (k, v) => k -> v.toLowerCase.take(120) }
    assert(got.map(r => (r._1, r._2)).contains((0L, 2L)))
    for ((a, b, dist, isDup) <- got) {
      assert(dist === lev(texts(a), texts(b)),
        s"pair ($a,$b) distance mismatch")
      assert(isDup === (if (dist * 10 <= 120) 1L else 0L))
    }
    // the exact copy certifies at distance 0
    assert(got.find(r => (r._1, r._2) == (0L, 2L)).get._3 === 0L)
  }
}
