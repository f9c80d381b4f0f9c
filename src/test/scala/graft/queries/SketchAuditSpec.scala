package graft.queries

import graft.SparkSpec
import graft.functions.PortableBloom
import org.apache.spark.sql.functions._

/** Enforcing sketch-quality audits (r9, VERDICT-r8 ask #2): the audit
  * relations (a16/a17, d15, s14) had been MEASURING index quality for
  * rounds while nothing asserted on the numbers — a16 reported the
  * 4,096-bit filter's saturation for two rounds before anyone acted.
  * This suite turns each audit's design envelope into an `sbt test`
  * failure:
  *
  *  - the a17 `sized` row must satisfy
  *    [[PortableBloom.withinDesignEnvelope]] (load ≤ 250k ppm,
  *    fpp ≤ 25k ppm — the 16 bits/key design point);
  *  - the detector must have TEETH: a deliberately undersized filter
  *    over the same key set must VIOLATE the envelope (if this test
  *    ever passes envelope, the thresholds have rotted);
  *  - the contract default's bit grid is pinned to golden md5
  *    positions computed outside the JVM — the oracle-locked 4,096-bit
  *    geometry (every streaming state snapshot + a16's twin) cannot
  *    drift even if the Scala and SQL sides drift TOGETHER;
  *  - d15's banded-MinHash recall (pigeonhole-backed at the contract
  *    threshold — measured 1.0 at sf0.001 AND sf0.01) keeps a
  *    ≥ 900k ppm floor; s14's beyond-pigeonhole recall (measured
  *    210k–270k ppm across gate SFs — the designed cost of pruning
  *    past the distance-8 guarantee) keeps a ≥ 100k ppm collapse
  *    floor;
  *  - the [[Similarity.cellsParamsFor]]-sized IVF assignment (s19/s20,
  *    r10) keeps its [[Similarity.withinKnnEnvelope]] balance bound,
  *    the formula pins reproduce the contract count at gate corpora,
  *    and a collapsed quantizer violates the envelope (teeth).
  *    s09 is deliberately NOT floored here: its envelope is
  *    corpus-dependent (untuned planes on the gate embeddings), and
  *    the tuned-corpus floor is already enforced at
  *    SimilaritySpec "LSH top-k recall ... clustered data".
  */
class SketchAuditSpec extends SparkSpec {
  import spark.implicits._

  test("a17: the sized bloom geometry meets its design envelope on the " +
      "contract corpus") {
    val rows = Sketches.bloomSizedAudit(spark, sf).collect()
    val sized = rows.find(_.getAs[String]("geometry") == "sized").get
    val (load, fpr) =
      (sized.getAs[Long]("load_ppm"), sized.getAs[Long]("fpr_ppm"))
    assert(PortableBloom.withinDesignEnvelope(load, fpr),
      s"sized geometry outside design envelope: load=$load ppm, fpr=$fpr ppm")
  }

  /** The synthetic corpus is sized so the undersized case is DEEPLY
    * saturated (20,000 keys into 4,096 bits → expected load
    * 1 − e^(−80000/4096) ≈ 0.9999) — not a borderline flake — while
    * the sized case exercises the WIDE (32-bit) position scheme
    * (bloomParamsFor(20000) = 524,288 bits > 65,536). */
  test("the envelope has teeth: a deliberately undersized filter fails it " +
      "where the sized geometry passes") {
    val keys = spark.range(1, 20001)
      .select(col("id").cast("string").as("k"))
    val absent = spark.range(1000000, 1020000)
      .select(col("id").cast("string").as("k"))
    val (bits, depth) = PortableBloom.bloomParamsFor(20000L)
    assert(bits == 524288, s"sizing formula drifted: $bits")
    def audit(b: Int, d: Int): (Long, Long) = {
      val sk = keys.agg(
        PortableBloom.portableBloom(col("k"), b, d).as("sk"))
      val load = sk.select(expr(
        "aggregate(sk, 0L, (acc, w) -> acc + CAST(bit_count(w) AS BIGINT))"))
        .as[Long].head() * 1000000L / b
      val nFalse = absent.crossJoin(broadcast(sk))
        .filter(PortableBloom.hit(col("sk"), col("k"), b, d))
        .count()
      (load, nFalse * 1000000L / 20000L)
    }
    val (sl, sf_) = audit(bits, depth)
    assert(PortableBloom.withinDesignEnvelope(sl, sf_),
      s"sized filter should pass: load=$sl, fpr=$sf_")
    val (ul, uf) = audit(PortableBloom.bits, PortableBloom.depth)
    assert(!PortableBloom.withinDesignEnvelope(ul, uf),
      s"undersized filter must FAIL the envelope (detector has no teeth): " +
        s"load=$ul, fpr=$uf")
    assert(ul > 900000L, s"20k keys in 4096 bits should saturate: $ul")
  }

  /** Golden grid pin: positions of keys {17, 42, 4096} under all four
    * hash rows, computed with python hashlib OUTSIDE this codebase —
    * the narrow (4096-bit, first-two-md5-bytes) and wide (131072-bit,
    * first-four-bytes) schemes both pinned, so neither can drift even
    * in lockstep with the SQL twin. */
  test("contract-default and wide bit grids match external golden positions") {
    val golden4096 = Seq(346, 695, 1127, 1646, 1895, 2465, 2787, 2937,
      3028, 3364, 3588, 3666)
    val golden131072 = Seq(15624, 16939, 21497, 28622, 48442, 56170,
      81104, 85074, 87270, 94854, 100254, 110453)
    val keys = Seq("17", "42", "4096").toDF("k")
    def setPositions(bits: Int): Seq[Int] = {
      val words = keys
        .agg(PortableBloom.portableBloom(col("k"), bits,
          PortableBloom.depth).as("sk"))
        .head().getAs[scala.collection.Seq[Long]]("sk")
      words.zipWithIndex.flatMap { case (w, i) =>
        (0 until 32).filter(b => ((w >> b) & 1L) == 1L).map(i * 32 + _)
      }.sorted.toSeq
    }
    assert(setPositions(4096) == golden4096)
    assert(setPositions(131072) == golden131072)
  }

  test("d15: banded-MinHash recall keeps its pigeonhole-backed floor") {
    val r = Dedup.lshRecall(spark, sf).head()
    assert(r.getAs[Long]("recall_ppm") >= 900000L,
      s"d15 recall collapsed: ${r.getAs[Long]("recall_ppm")} ppm")
  }

  test("d21: the relative-cutoff geometry recalls at least as much as " +
      "the absolute one, losslessly banded, and the params reproduce " +
      "the contract triple") {
    val rows = Dedup.simhashRelativeAudit(spark, sf).collect()
      .map(r => r.getAs[String]("geometry") -> r).toMap
    val (abs, rel) = (rows("absolute_h3"), rows("relative_h6"))
    assert(rel.getAs[Long]("recall_ppm") >= abs.getAs[Long]("recall_ppm"),
      "the relative cutoff exists to restore recall the absolute one drops")
    // the relative geometry is the scale DEFAULT since r10 (d20 ships
    // it) — pin the measured floor (800k ppm at the gate corpus, r9)
    // with headroom so a regression below ~3/4 of truth fails loud
    assert(rel.getAs[Long]("recall_ppm") >= 750000L,
      s"default scaled geometry recall collapsed: " +
        s"${rel.getAs[Long]("recall_ppm")} ppm")
    // lossless pigeonhole: bands > cutoff on both rows
    rows.values.foreach { r =>
      assert(r.getAs[Long]("bands") > r.getAs[Long]("cutoff"))
      assert(64L % r.getAs[Long]("bands") == 0L)
    }
    // gate corpora reproduce the oracle-locked contract triple; the
    // widened decades keep ratio-scaled cutoffs and covering bands
    assert(Dedup.simhashRelativeParamsFor(1000L) == ((32, 4, 3)))
    assert(Dedup.simhashRelativeParamsFor(60000L) == ((64, 8, 6)))
    assert(Dedup.simhashRelativeParamsFor(1000000000L) == ((128, 16, 12)))
  }

  test("s19/s20: the IVF cell count is corpus-size-keyed, the sized " +
      "assignment stays inside the balance envelope, and the envelope " +
      "has teeth") {
    // sizing formula pins — gate corpora reproduce the oracle-locked
    // contract count; the keying holds Σ|c|² ≈ n·targetCellSize linear
    // (the r9 weak: fixed 8 cells measured 100× in-cell pairs for 10×
    // data at sf1)
    assert(Similarity.cellsParamsFor(500L) == 8)
    assert(Similarity.cellsParamsFor(2000L) == 8)
    assert(Similarity.cellsParamsFor(2048L) == 8)
    assert(Similarity.cellsParamsFor(2049L) == 16)
    assert(Similarity.cellsParamsFor(20000L) == 128)
    assert(Similarity.cellsParamsFor(1L << 32) == Similarity.maxCells)
    // the training stride degenerates to 1 (full training — the
    // pre-r10 behavior, oracle-locked) at gate corpora and bounds the
    // Lloyd pass at ~trainTarget·nCells² flops at scale
    assert(Similarity.trainStrideFor(500L, 8) == 1L)
    assert(Similarity.trainStrideFor(2000L, 8) == 3L)
    assert(Similarity.trainStrideFor(20000L, 128) == 2L)
    assert(Similarity.trainStrideFor(1000000000L, 65536) == 238L)
    // the sized assignment on the gate corpus: in-cell pair volume
    // within the 4×-of-ideal balance envelope
    val sizes = Similarity.sizedBalance(spark, sf).collect()
    val n = sizes.map(_.getAs[Long]("n_vecs")).sum
    val nCells = sizes.head.getAs[Long]("n_cells").toInt
    assert(nCells == Similarity.cellsParamsFor(n),
      s"emitted n_cells ($nCells) drifted from cellsParamsFor($n)")
    val sumSq = sizes.map(r => {
      val c = r.getAs[Long]("n_vecs"); c * c
    }).sum
    assert(Similarity.withinKnnEnvelope(n, nCells, sumSq),
      s"sized cells outside balance envelope: n=$n cells=$nCells " +
        s"sumSq=$sumSq (ideal ${n * n / nCells})")
    // teeth: a collapsed quantizer (everything in one of the cells —
    // Σ|c|² = n²) must violate the envelope, or the threshold has
    // rotted and a quadratic would ship silently
    assert(!Similarity.withinKnnEnvelope(n, nCells, n * n),
      "envelope lost its teeth: a fully-collapsed assignment passes")
  }

  test("s21: the two-level quantizer's sizing is pinned, the leaf " +
      "assignment stays inside the balance envelope, and the " +
      "single-level branch is untouched below the clamp decade") {
    // sizing pins: the gate corpus (500) and bench corpus (2000) get
    // the 4×2 contract geometry; the sized sub count tracks the
    // unclamped n/targetCellSize target past the single-level clamp
    assert(Similarity.subCellsFor(500L) == 2)
    assert(Similarity.subCellsFor(2000L) == 2)
    assert(Similarity.subCellsFor(20000L) == 32)
    assert(Similarity.subCellsFor(1L << 32) == Similarity.maxCells)
    // production switch: single level (c2 == 1, bit-identical to r10)
    // through the whole clamp decade; a balanced pow-2 split past it,
    // both factors under the broadcast/training clamp
    val boundary = Similarity.maxCells.toLong * Similarity.targetCellSize
    assert(Similarity.hierParamsFor(500L) == ((8, 1)))
    assert(Similarity.hierParamsFor(boundary) == ((Similarity.maxCells, 1)))
    val (c1, c2) = Similarity.hierParamsFor(boundary + 1)
    assert(c2 > 1, "the two-level switch must engage past the clamp")
    assert(c1.toLong * c2 == (Similarity.maxCells.toLong * 2),
      "leaves must track the unclamped target (2^17 just past the clamp)")
    assert(c1 <= Similarity.maxCells && c2 <= Similarity.maxCells)
    // at 10^9 vectors: unclamped target 2^22 → 2048×2048 leaves,
    // occupancy back at ~targetCellSize
    assert(Similarity.hierParamsFor(1000000000L) == ((2048, 2048)))
    // the leaf assignment on the gate corpus: in-cell pair volume
    // within the same 4×-of-ideal envelope s20 enforces, over the
    // leaf count
    val leaves = Similarity.hierBalance(spark, sf).collect()
    val n = leaves.map(_.getAs[Long]("n_vecs")).sum
    val nSub = leaves.head.getAs[Long]("n_sub").toInt
    assert(nSub == Similarity.subCellsFor(n),
      s"emitted n_sub ($nSub) drifted from subCellsFor($n)")
    val nLeaves = Similarity.numSuperCells * nSub
    val sumSq = leaves.map(r => {
      val c = r.getAs[Long]("n_vecs"); c * c
    }).sum
    assert(Similarity.withinKnnEnvelope(n, nLeaves, sumSq),
      s"two-level leaves outside balance envelope: n=$n leaves=$nLeaves " +
        s"sumSq=$sumSq (ideal ${n * n / nLeaves})")
    assert(!Similarity.withinKnnEnvelope(n, nLeaves, n * n),
      "envelope lost its teeth on the leaf count")
  }

  test("hierAssigned preserves every input row even when a super-cell's " +
      "members all miss the level-2 training stride (r12, ADVICE-r11)") {
    // Constructed corpus, n=768, nSuper=3, nSub=2 → level-1 seeds at
    // ids {0,256,512} (seedStride 256), level-1 training ids ≡0 mod 4
    // (stride 4), level-2 training ids ≡0 mod 2 (stride 2). The
    // geometry below makes every level-1 trainer of the middle seed
    // FLIP away after the Lloyd step (id256 to the A-centroid, the
    // (100,69) trainers to the C-centroid — the sum-of-squares
    // identity forbids all flipping to the SAME centroid, not to
    // different ones), so the middle super-cell's final members are
    // exactly the 384 ODD ids at (100,45) — none in the even-id
    // level-2 training sample. Pre-fix, cents2 then had no centroid
    // for that sc and the inner join dropped all 384 rows silently.
    val bTrain = Set(4L, 8L, 12L, 16L, 20L)
    val cTrain = (24L to 100L by 4L).toSet
    val rows = (0L until 768L).map { id =>
      val v: Seq[Float] =
        if (id == 0L) Seq(0f, 0f)
        else if (id == 256L) Seq(100f, 0f)
        else if (id == 512L) Seq(100f, 140f)
        else if (id % 2 == 1) Seq(100f, 45f)
        else if (id % 4 == 0 && bTrain(id)) Seq(100f, 69f)
        else if (id % 4 == 0 && cTrain(id)) Seq(100f, 72f)
        else Seq(49f, 0f)
      (id, v)
    }
    val embs = rows.toDF("vec_id", "embedding")
    val leaf = Similarity.hierAssigned(Similarity.emb(embs), 768L, 3, 2)
      .select(col("vec_id"), col("sc")).collect()
    // the degenerate precondition actually holds: the odd-id cluster's
    // super-cell contains NO level-2 training member (even id)
    val oddScs = leaf.filter(_.getLong(0) % 2 == 1).map(_.getLong(1)).toSet
    assert(oddScs.size == 1,
      s"construction rotted: odd ids span super-cells $oddScs")
    val evenInOddSc =
      leaf.count(r => r.getLong(1) == oddScs.head && r.getLong(0) % 2 == 0)
    assert(evenInOddSc == 0,
      "construction rotted: the target super-cell gained a train2 member")
    // the fallback keeps the assignment row-preserving
    assert(leaf.length == 768, s"hierAssigned lost rows: ${leaf.length}/768")
    assert(leaf.map(_.getLong(0)).distinct.length == 768)
  }

  test("s22: the probe count is sized for recall, the formula is " +
      "pinned, and the measured recall keeps its floor") {
    // probesFor holds the contract probed fraction (2/8) at any sized
    // cell count — gate corpora reproduce the oracle-locked contract
    // probe count exactly
    assert(Similarity.probesFor(8) == 2)
    assert(Similarity.probesFor(16) == 4)
    assert(Similarity.probesFor(128) == 32)
    assert(Similarity.probesFor(Similarity.maxCells) == 16384)
    val r = Similarity.sizedProbeRecall(spark, sf).head()
    val n = graft.Tables.t(spark, sf, "embeddings").count()
    assert(r.getAs[Long]("n_cells") == Similarity.cellsParamsFor(n),
      "emitted n_cells drifted from cellsParamsFor")
    assert(r.getAs[Long]("n_probes") ==
      Similarity.probesFor(r.getAs[Long]("n_cells").toInt),
      "emitted n_probes drifted from probesFor")
    // probed fraction held at the contract operating point
    assert(r.getAs[Long]("probed_ppm") == 250000L,
      s"probed fraction drifted: ${r.getAs[Long]("probed_ppm")} ppm")
    // recall floor at the held fraction (measured 0.45-0.48 at the
    // contract point across generations; 0.30 is the collapse guard,
    // not a tight bound — the r11 RecallProbe curve shows unsized
    // probes at 128 cells reading 0.15)
    assert(r.getAs[Double]("recall") >= 0.30,
      s"sized-probe recall collapsed: ${r.getAs[Double]("recall")}")
  }

  test("s19: the two-level switch is output-transparent — a clamped " +
      "run through the hier path equals the single-level answer on a " +
      "clustered corpus (r12, VERDICT-r11 ask #5)") {
    // 192 clusters × 4 IDENTICAL vectors (cluster = id % 192),
    // directions ≥ 0.9375° apart so inter-cluster rounded cosine is
    // ≤ 0.9999 < 1.0: identical vectors can never split across cells
    // (deterministic argmin), so every vector's top-3 is its 3 siblings at
    // cos 1.0 (ranked by neighbor_id) in ANY index geometry — the kNN
    // graph is geometry-invariant by construction, and any difference
    // between the branches is a defect in the switch itself.
    val rows = (0L until 768L).map { id =>
      val theta = (id % 192).toDouble * math.Pi / 192.0
      (id, Seq(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }
    val embs = rows.toDF("vec_id", "embedding")
    def run(): Set[(Long, Long, Double, Long)] =
      Similarity.knnGraphDf(embs)
        .select(col("vec_id"), col("neighbor_id"), col("cos_sim"),
          col("rank"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSet
    val single = run()
    // the clamp actually engages the two-level branch at this n
    assert(Similarity.hierParamsFor(768L, 2)._2 > 1)
    spark.conf.set(Similarity.cellClampKey, "2")
    val hier = try run()
      finally spark.conf.unset(Similarity.cellClampKey)
    assert(single.nonEmpty && single.size == 768 * Similarity.kGraphK)
    assert(hier == single,
      s"two-level switch changed the kNN graph: ${
        (hier diff single).take(5)} vs ${(single diff hier).take(5)}")
    // sanity: every neighbor is a sibling at rounded cos 1.0
    assert(single.forall { case (v, nb, cs, _) =>
      v % 192 == nb % 192 && cs == 1.0 })
  }

  test("s14: multi-index Hamming recall keeps its collapse floor") {
    val r = Similarity.mihRecall(spark, sf).head()
    assert(r.getAs[Long]("recall_ppm") >= 100000L,
      s"s14 recall collapsed: ${r.getAs[Long]("recall_ppm")} ppm")
  }
}
