package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.VectorFunctions.{dot, fpSqDist, hamming, norm2}

/** Deduplication suite (LLM-pipeline extension ops): exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup, duplicate-cluster
  * resolution, and canonical-document selection — the full pipeline from
  * raw docs to pairs to components to one kept doc per cluster.
  *
  * Portability design: every pseudo-random ingredient (MinHash
  * permutations, SimHash bit hashes) is derived from md5 hex strings,
  * which Spark and DuckDB compute identically — so even the sketch-based
  * dedups have exact DuckDB oracles. Similarity estimates are exact
  * integer ratios (k/16, c/(na+nb-c)), never order-dependent float sums.
  *
  * Scale posture: everything is shuffle-on-key (token/shingle/band/
  * bucket); candidate generation is always banded/bucketed so the
  * quadratic pair space is never materialized globally — only within a
  * band bucket. No driver-side collection anywhere.
  */
object Dedup {

  /** MinHash permutation count and LSH banding (4 bands × 4 rows). */
  val numHashes = 16
  val numBands  = 4
  val rowsPerBand: Int = numHashes / numBands

  // ------------------------------------------------------- exact dedup
  /** Exact dedup: group by content hash; keeper = min doc_id. Grouping
    * on md5(text) (not text) keeps 100 TB shuffles narrow. */
  def exact(s: SparkSession, dir: String): DataFrame =
    exactDf(t(s, dir, "documents"))

  def exactDf(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("text_md5")

  private[queries] val exactSql =
    """SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY text_md5""".stripMargin

  // ------------------------------------------------------ MinHash + LSH
  /** MinHash over 3-token shingles (one shuffle: groupBy doc_id with 16
    * min-aggs) → 4 banded keys → self-join per band bucket → distinct
    * candidate pairs with estimated Jaccard = matching-signature
    * fraction. Shingles (not tokens) keep baseline Jaccard between
    * unrelated docs near zero, so bands only collide for real near-dups
    * and the candidate pair space stays tiny at scale. */
  def minHashLsh(s: SparkSession, dir: String): DataFrame =
    minHashLshDf(t(s, dir, "documents"))

  /** MinHash signature table: one row per doc, s0..s15. */
  private def minHashSigs(docs: DataFrame): DataFrame = {
    val toks = docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(sequence(1, greatest(size(toks) - 2, 1)),
           i -> concat_ws(' ', slice(toks, i, 3)))"""))).as("tok"))
    // 16 permutations from 4 md5s: each 128-bit digest yields 4
    // independent 32-bit (8-hex-char) sub-hashes — 4× fewer digests
    // on the hot path, same uniformity.
    def sig(k: Int) = min(substring(
      md5(concat_ws(":", lit(k / 4), col("tok"))), 1 + 8 * (k % 4), 8))
    toks.groupBy(col("doc_id"))
      .agg(sig(0).as("s0"),
        (1 until numHashes).map(k => sig(k).as(s"s$k")): _*)
  }

  /** Banded key rows (doc_id, band, sig) from the signature table — the
    * LSH index relation (what a production pipeline PERSISTS as the
    * stored dedup index). */
  private def minHashBands(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"s${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", parts: _*)).as("sig")).as(s"b$b")
    }
    sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Banded candidate pairs (doc_a < doc_b) from the signature table —
    * shared by d02 (scored pairs) and d07 (cluster edges). */
  private def minHashCandidates(sigs: DataFrame): DataFrame = {
    val bands = minHashBands(sigs)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  def minHashLshDf(docs: DataFrame): DataFrame = {
    // the signature table feeds four join sides; identical shuffle
    // sub-plans dedupe via ReusedExchange, which measures FASTER than a
    // persist here (a cache adds a materialization barrier and breaks
    // stage pipelining) — don't "optimize" this into .persist()
    val sigs = minHashSigs(docs)
    val cand = minHashCandidates(sigs)
    val matches = (0 until numHashes)
      .map(k => when(col(s"xa.s$k") === col(s"yb.s$k"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sigs.as("xa"), col("doc_a") === col("xa.doc_id"))
      .join(sigs.as("yb"), col("doc_b") === col("yb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (matches / lit(numHashes.toDouble)).as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Shared DuckDB CTE chain ending in `{p}bands` (the LSH index
    * relation) — composed into the d02/d07/d11 oracles over
    * `documents` (empty prefix) and, prefixed, into pipeline-stage
    * twins that run the SAME spelling over an intermediate relation
    * (e06's near-dup stage over `kept`). */
  private def minHashBandsSqlFrom(rel: String, p: String): String = {
    val sigCols = (0 until numHashes)
      .map(k => s"min(substring(md5('${k / 4}:' || tok), ${1 + 8 * (k % 4)}, 8)) AS s$k")
      .mkString(", ")
    val bandRows = (0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => s"s${b * rowsPerBand + r}")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS sig FROM ${p}sigs"
    }.mkString("\nUNION ALL\n")
    // sigs is referenced by all band branches AND the final pair scoring
    // (6 sites), bands by both join sides — MATERIALIZED (the g03/d07
    // lesson) or DuckDB re-inlines the whole shingle DISTINCT + minhash
    // agg per site (disk-exhausted at sf1 before the hint)
    s"""${p}d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $rel),
       |${p}toks AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(len(tk) - 2, 1)),
       |    i -> array_to_string(list_slice(tk, i, i + 2), ' '))) AS tok
       |  FROM ${p}d),
       |${p}sigs AS MATERIALIZED (SELECT doc_id, $sigCols FROM ${p}toks GROUP BY doc_id),
       |${p}bands AS MATERIALIZED (
       |$bandRows)""".stripMargin
  }

  private val minHashBandsSql: String = minHashBandsSqlFrom("documents", "")

  /** `{p}bands` chain + `{p}cand` (doc_a < doc_b candidate pairs). */
  private def minHashCandSqlFrom(rel: String, p: String): String =
    s"""${minHashBandsSqlFrom(rel, p)},
       |${p}cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ${p}bands a JOIN ${p}bands b
       |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  private val minHashCandSql: String = minHashCandSqlFrom("documents", "")

  private val minHashLshSql: String = {
    val est = (0 until numHashes)
      .map(k => s"CASE WHEN x.s$k = y.s$k THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $minHashCandSql
       |SELECT doc_a, doc_b, ($est) / 16.0 AS est_jaccard
       |FROM cand JOIN sigs x ON doc_a = x.doc_id JOIN sigs y ON doc_b = y.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // -------------------------------------------------- exact 3-gram Jaccard
  /** Exact token-3-gram Jaccard via shingle inverted index: distinct
    * (doc, shingle) → stop-shingle pruning → self-join on shingle →
    * pair intersection counts → |A∩B| / (|A|+|B|−|A∩B|).
    *
    * Stop-shingle pruning: the per-shingle pair expansion is O(df²), so
    * one boilerplate shingle shared by millions of documents ("of the
    * and") would be a quadratic hot key. Shingles with document
    * frequency > [[maxShingleDf]] are dropped from the feature set
    * (standard stop-shingle cutoff; identical on the oracle side, so
    * parity holds), bounding every join bucket at maxShingleDf² pairs.
    * Document sizes are counted over the *pruned* feature set — the
    * features simply exclude stop-shingles. */
  val jaccardThreshold = 0.1
  val maxShingleDf = 100

  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    ngramJaccardDf(t(s, dir, "documents"))

  def ngramJaccardDf(docs: DataFrame): DataFrame = {
    val shAll = docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(toks) - 2, 1)),
           i -> concat_ws(' ', slice(toks, i, 3)))""")).as("sh"))
      .distinct()
    // df-cutoff: one extra narrow aggregate on the shingle key (same
    // partitioning the join reuses) buys a hard O(maxDf²) bucket bound.
    val keep = shAll.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf)
      .select(col("sh"))
    val sh = shAll.join(keep, "sh")
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("common") / (col("sa.n_sh") + col("sb.n_sh") - col("common")))
          .as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
      .orderBy("doc_a", "doc_b")
  }

  private val ngramJaccardSql =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sh_all AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(len(toks) - 2, 1)),
       |    i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
       |  FROM d),
       |keep AS (SELECT sh FROM sh_all GROUP BY sh HAVING COUNT(*) <= $maxShingleDf),
       |sh AS (SELECT sh_all.* FROM sh_all JOIN keep USING (sh)),
       |sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |common / (sa.n_sh + sb.n_sh - common) AS jaccard
       |FROM pairs JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
       |WHERE common / (sa.n_sh + sb.n_sh - common) >= $jaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------ SimHash
  /** 32-bit SimHash over 3-token shingle features (shingles, not bare
    * tokens: a low-entropy vocabulary makes token-level fingerprints
    * cluster, which blows up every band bucket — shingles spread the
    * feature space). Bit j of md5(shingle) is extracted from hex char
    * j/4 (strpos-based — portable to DuckDB); fingerprint bit = sign of
    * Σ(2·bit−1). Emitted as a 32-char bitstring (no portable hex→int in
    * DuckDB 1.0).
    *
    * THE CONTRACT GEOMETRY IS NOT THE SCALE GEOMETRY. 32 bits over
    * [[simhashBands]] = 4 bands gives a 2⁸ = 256-value band keyspace:
    * band buckets fill by BIRTHDAY, not by similarity, once the corpus
    * outgrows the keyspace, and the banded candidate generator
    * (d05/d18) degrades to ~n²/256 pairs per band. Measured, not
    * guessed: the r7 sf1 sweep clocked d18 at 31.5× wall for 10× docs
    * (96.7 s at 50 k docs, VERIFY_sf1.md), exactly the super-linear
    * candidate volume this geometry predicts; re-swept under
    * `simhashParamsFor(50 k)` = 48-bit/4-band the same query returns
    * to near-linear (see SCALING.md round-8). Contract queries stay on
    * the locked 32/4 defaults (the oracle twins spell the same
    * geometry); every production caller at scale passes
    * [[simhashParamsFor]] — the same corpus-size-keyed discipline as
    * the cosine path's [[cosParamsFor]]. */
  val simhashBits = 32

  /** Band count for the SimHash candidate generator (d05/d18). 4 bands
    * make the hamming ≤ [[simhashMaxHamming]] = 3 prefilter LOSSLESS by
    * pigeonhole (≤ 3 differing bits across 4 bands ⇒ ≥ 1 identical
    * band). */
  val simhashBands = 4

  /** Corpus-size-keyed SimHash fingerprint geometry — (bits, bands).
    * The band-bucket keyspace is 2^(bits/bands) and the candidate
    * join's cost is quadratic per bucket, so band WIDTH must grow with
    * log₂(corpus) to hold expected occupancy constant:
    * bandW = clamp(⌈log₂ n⌉ − 4, [contract 8, 32]) (≈ 16 expected
    * docs per bucket under a uniform fingerprint — real corpora skew
    * denser, which is why the margin is wider than cosParamsFor's −7),
    * bits = bandW · [[simhashBands]], bands FIXED at 4 so the
    * hamming ≤ 3 pigeonhole stays lossless. Reproduces the
    * oracle-locked contract geometry (32/4) for gate corpora
    * (n ≤ 4096) and caps at 128 bits — the width one md5 supplies
    * (hex char j/4 for bit j < 128), enough for n ≈ 10⁹ docs per
    * band-bucket-disjoint shard; beyond that, shard the corpus before
    * fingerprinting. NOTE: this function keys the BAND geometry only —
    * under an absolute hamming cutoff the threshold tightens RELATIVELY
    * as bits grow (3/64 ≪ 3/32), which d21 measured at a 440k-vs-800k
    * ppm recall cost. Since r10 the scale DEFAULT is therefore
    * [[simhashRelativeParamsFor]] (bits, bands, ratio-scaled cutoff) —
    * d20 pins it; use this function directly only for cutoff-free
    * consumers (d18's calibration measures any geometry as-is). */
  def simhashParamsFor(nDocs: Long): (Int, Int) = {
    val lg = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, nDocs - 1)) // ceil(log2 n)
    val bandW = math.min(32, math.max(simhashBits / simhashBands, lg - 4))
    (bandW * simhashBands, simhashBands)
  }

  def simHash(s: SparkSession, dir: String): DataFrame =
    simHashDf(t(s, dir, "documents"))

  /** `bits` defaults to the oracle-locked contract width; scale callers
    * pass `simhashParamsFor(corpus.count())._1` (bit j < 32 is
    * identical at every width — wider fingerprints EXTEND, never
    * reshuffle, so a stored 32-bit prefix remains comparable). */
  def simHashDf(docs: DataFrame, bits: Int = simhashBits): DataFrame = {
    require(bits >= 1 && bits <= 128, s"one md5 supplies 128 bits: $bits")
    val nChars = (bits + 3) / 4
    // hex-digit values factored into ONE projection below the
    // aggregate (r12): the per-bit form evaluated
    // instr('0123456789abcdef', substring(h, j/4+1, 1)) inside all
    // `bits` sum-update expressions — 4 substring+instr evaluations
    // per hex char per (doc, shingle) row; this computes each char's
    // value once and the per-bit updates reduce to two integer ops.
    // Identical integers, identical fingerprints (same instr/substring
    // semantics, just not repeated) — the oracle twin is unchanged.
    val toksH = docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(toks) - 2, 1)),
           i -> concat_ws(' ', slice(toks, i, 3)))""")).as("tok"))
      .withColumn("h", md5(col("tok")))
      .select(col("doc_id") +: (0 until nChars).map(c => expr(
        s"instr('0123456789abcdef', substring(h, ${c + 1}, 1)) - 1")
        .as(s"v$c")): _*)
    def bitFromVal(j: Int) = expr(
      s"CASE WHEN (v${j / 4} div ${1 << (j % 4)}) % 2 = 1 THEN 1 ELSE -1 END")
    val sums = toksH.groupBy(col("doc_id"))
      .agg(sum(bitFromVal(0)).as("w0"),
        (1 until bits).map(j => sum(bitFromVal(j)).as(s"w$j")): _*)
    val fp = concat((0 until bits)
      .map(j => when(col(s"w$j") >= 0, lit("1")).otherwise(lit("0"))): _*)
    sums.select(col("doc_id"), fp.as("simhash")).orderBy("doc_id")
  }

  /** Twin fingerprint CTE body for any width — the contract SQL is
    * `simHashSqlFor(simhashBits)`; d20 pins the widened geometry. */
  private def simHashSqlFor(bits: Int): String = {
    def bit(j: Int) = {
      val c = s"substring(h, ${j / 4 + 1}, 1)"
      val v = s"(strpos('0123456789abcdef', $c) - 1)"
      s"CASE WHEN ($v // ${1 << (j % 4)}) % 2 = 1 THEN 1 ELSE -1 END"
    }
    val sums = (0 until bits).map(j => s"SUM(${bit(j)}) AS w$j").mkString(", ")
    val chars = (0 until bits)
      .map(j => s"CASE WHEN w$j >= 0 THEN '1' ELSE '0' END").mkString(" || ")
    s"""WITH th AS (
       |  SELECT doc_id, md5(tok) AS h FROM (
       |    SELECT doc_id, unnest(list_transform(
       |      generate_series(1, greatest(len(tk) - 2, 1)),
       |      i -> array_to_string(list_slice(tk, i, i + 2), ' '))) AS tok
       |    FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents))),
       |sums AS (SELECT doc_id, $sums FROM th GROUP BY doc_id)
       |SELECT doc_id, $chars AS simhash FROM sums ORDER BY doc_id""".stripMargin
  }

  private val simHashSql: String = simHashSqlFor(simhashBits)

  /** SimHash near-dup pairs: hamming ≤ 3 with a 4-band prefilter
    * (pigeonhole: ≤3 differing bits over 4 bands ⇒ ≥1 identical band,
    * so banding is lossless here, and it keeps the pair space local to
    * buckets at scale). */
  val simhashMaxHamming = 3

  def simHashPairs(s: SparkSession, dir: String): DataFrame =
    simHashPairsDf(t(s, dir, "documents"))

  /** `bits`/`nBands`/`cutoff` default to the oracle-locked contract
    * geometry; scale callers pass the full
    * `simhashRelativeParamsFor(corpus.count())` triple — the measured
    * default since r10 (d21: 800k vs 440k ppm recall at equal 1.0
    * precision; decision recorded in SCALING.md). */
  def simHashPairsDf(docs: DataFrame, bits: Int = simhashBits,
      nBands: Int = simhashBands,
      cutoff: Int = simhashMaxHamming): DataFrame = {
    // non-divisible widths would silently DROP the trailing bits from
    // every band signature, voiding the hamming-pigeonhole losslessness
    // (simhashParamsFor always returns multiples, but params are public)
    require(bits % nBands == 0, s"bits ($bits) % nBands ($nBands) != 0")
    // Fingerprints are tiny relative to the corpus — materialize once
    // (the self-join would otherwise recompute the whole sketch twice).
    val fp = simHashDf(docs, bits).persist()
    val bandW = bits / nBands
    val bandCols = (0 until nBands).map(b =>
      struct(lit(b).as("band"),
        substring(col("simhash"), b * bandW + 1, bandW).as("sig")).as(s"b$b"))
    val bands = fp.select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("simhash"), col("bs.band").as("band"),
        col("bs.sig").as("sig"))
    val ham = hamming(col("x.simhash"), col("y.simhash"))
    // hamming filter BEFORE distinct: the band buckets of a low-entropy
    // corpus can be huge, and most candidates fail the cutoff — never
    // shuffle them into the dedup.
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        ham.as("hamming"))
      .filter(col("hamming") <= cutoff)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  private def simHashPairsSqlFor(bits: Int, nBands: Int,
      cutoff: Int = simhashMaxHamming): String = {
    val bandW = bits / nBands
    val bandRows = (0 until nBands).map(b =>
      s"SELECT doc_id, simhash, $b AS band, substring(simhash, ${b * bandW + 1}, $bandW) AS sig FROM fp")
      .mkString("\nUNION ALL\n")
    val ham = (1 to bits)
      .map(j => s"CASE WHEN substring(x.simhash, $j, 1) <> substring(y.simhash, $j, 1) THEN 1 ELSE 0 END")
      .mkString(" + ")
    val inner = simHashSqlFor(bits).replace("ORDER BY doc_id", "")
    s"""WITH fp AS ($inner),
       |bands AS (
       |$bandRows),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    CAST($ham AS BIGINT) AS hamming
       |  FROM bands x JOIN bands y
       |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, hamming FROM cand
       |WHERE hamming <= $cutoff ORDER BY doc_a, doc_b""".stripMargin
  }

  private val simHashPairsSql: String =
    simHashPairsSqlFor(simhashBits, simhashBands)

  // --------------------------------------------- d20 scaled-geometry twin
  /** d20: the d05 pair generator under the WIDENED fingerprint at the
    * RELATIVE-cutoff geometry ([[simhashRelativeParamsFor]] at the
    * gate-corpus decade: 64 bits, 8 bands, hamming ≤ 6) — the scale
    * default as its own oracle-checked relation, so the widened
    * geometry is proven engine-portable (bit extraction, banding,
    * hamming) exactly like the contract one, not merely
    * spec-consistent with it.
    *
    * THE DEFAULT FOLLOWS THE MEASUREMENT (r10, VERDICT-r9 ask #2):
    * through r9 the scaled path shipped the absolute hamming ≤ 3
    * cutoff, and d21 measured it recalling 440,000 ppm of the exact-
    * Jaccard truth where the relative cutoff recalls 800,000 — at
    * EQUAL 1.0 precision and (at the gate corpus) equal candidate
    * volume (d21's n_pairs column; SCALING.md r10 records the trade
    * at sf1 too). DedupSpec pins the containment direction: the
    * relative pairs are a superset of the absolute-cutoff survivors
    * (8 half-width bands cover every 16-bit band match, cutoff 6 ≥ 3),
    * and exact copies stay at hamming 0. */
  val simhashScaledBits = 64

  def simHashPairsScaled(s: SparkSession, dir: String): DataFrame =
    simHashPairsDf(t(s, dir, "documents"), simhashScaledBits,
      simhashRelativeBands, simhashRelativeCutoff)

  // --------------------------------- d21 relative-threshold geometry
  /** Relative-threshold SimHash geometry — the [[simhashParamsFor]]
    * caveat closed (r9, VERDICT-r8 ask #3): the absolute hamming ≤ 3
    * cutoff TIGHTENS relatively as the fingerprint widens (3/64 ≪
    * 3/32), so the scaled path silently trades recall. The relative
    * variant preserves the contract RATIO (3/32 of the bits) and
    * raises the band count past cutoff+1 so the pigeonhole stays
    * lossless (h differing bits over b > h bands ⇒ ≥ 1 identical
    * band). Bits round UP to a power of two and bands to the next
    * power of two ≥ cutoff+1, so bands always divide bits evenly.
    *
    * The inherent trade this surfaces (and d21 MEASURES rather than
    * hides): lossless banding at a relative cutoff ρ caps band width
    * at < 1/ρ ≈ 10.7 bits regardless of total width, so the relative
    * geometry buys its recall with more band-bucket candidates — the
    * absolute geometry buys candidate volume with silently-tightened
    * recall. d21 puts exact recall/precision ppm for BOTH geometries
    * against the exact-Jaccard truth in one oracle-checked relation,
    * so the choice is a measured trade, not a default.
    *
    * Reproduces the oracle-locked contract triple (32 bits, 4 bands,
    * cutoff 3) for gate corpora (n ≤ 4096). */
  def simhashRelativeParamsFor(nDocs: Long): (Int, Int, Int) = {
    val bits0 = simhashParamsFor(nDocs)._1
    val bits = Integer.highestOneBit(math.max(1, bits0 * 2 - 1))
    val cutoff = bits * simhashMaxHamming / simhashBits
    var bands = simhashBands
    while (bands < cutoff + 1) bands *= 2
    (bits, bands, cutoff)
  }

  /** d21 pinned geometry: the 64-bit scaled fingerprint (d20's width —
    * `simhashRelativeParamsFor` at the gate-corpus decade above the
    * contract) under both cutoff disciplines. */
  val simhashRelativeBands = 8
  val simhashRelativeCutoff = 6

  def simhashRelativeAudit(s: SparkSession, dir: String): DataFrame =
    simhashRelativeAuditDf(t(s, dir, "documents"))

  /** d21: recall/precision of the widened ABSOLUTE-cutoff geometry
    * (d20: 64 bits, 4 bands, hamming ≤ 3) and the widened RELATIVE-
    * cutoff geometry (64 bits, 8 bands, hamming ≤ 6) against the
    * exact 3-gram-Jaccard truth (d15's oracle chain) — one row per
    * geometry, exact integer ppm. The 64-bit fingerprint is computed
    * ONCE and persisted; both candidate relations band it, so the
    * audit costs one sketch pass + two bucket self-joins + two
    * pair-id outer joins. SketchAuditSpec asserts the relative row's
    * recall ≥ the absolute row's (the entire point of the variant). */
  def simhashRelativeAuditDf(docs: DataFrame): DataFrame = {
    val bits = simhashScaledBits
    val fp = simHashDf(docs, bits).persist()
    def pairsFor(nBands: Int, cutoff: Int): DataFrame = {
      val bandW = bits / nBands
      val bandCols = (0 until nBands).map(b =>
        struct(lit(b).as("band"),
          substring(col("simhash"), b * bandW + 1, bandW).as("sig"))
          .as(s"b$b"))
      val bands = fp.select(col("doc_id"), col("simhash"),
          explode(array(bandCols: _*)).as("bs"))
        .select(col("doc_id"), col("simhash"), col("bs.band").as("band"),
          col("bs.sig").as("sig"))
      bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          hamming(col("x.simhash"), col("y.simhash")).as("hamming"))
        .filter(col("hamming") <= cutoff)
        .select(col("doc_a"), col("doc_b"))
        .distinct()
    }
    val truth = ngramJaccardDf(docs).select(col("doc_a"), col("doc_b"))
      .withColumn("t", lit(1L)).persist()
    def row(geom: String, nBands: Int, cutoff: Int): DataFrame =
      truth.join(pairsFor(nBands, cutoff).withColumn("c", lit(1L)),
          Seq("doc_a", "doc_b"), "full_outer")
        .agg(sum(col("t")).as("n_truth"),
          sum(col("c")).as("n_pairs"),
          sum(when(col("t").isNotNull && col("c").isNotNull, 1L)
            .otherwise(0L)).as("n_found"))
        .select(lit(geom).as("geometry"), lit(bits.toLong).as("bits"),
          lit(nBands.toLong).as("bands"), lit(cutoff.toLong).as("cutoff"),
          col("n_truth"), col("n_pairs"), col("n_found"),
          expr("n_found * 1000000L div n_truth").as("recall_ppm"),
          expr("n_found * 1000000L div n_pairs").as("precision_ppm"))
    row("absolute_h3", simhashBands, simhashMaxHamming)
      .unionByName(
        row("relative_h6", simhashRelativeBands, simhashRelativeCutoff))
      .orderBy("geometry")
  }

  /** DuckDB twin: one 64-bit fingerprint CTE, two band/candidate
    * chains (widths 16 and 8, cutoffs 3 and 6), the d15 truth chain,
    * one fold per geometry. */
  private val simhashRelativeAuditSql = {
    val bits = simhashScaledBits
    val ham = (1 to bits)
      .map(j => s"CASE WHEN substring(x.simhash, $j, 1) <> substring(y.simhash, $j, 1) THEN 1 ELSE 0 END")
      .mkString(" + ")
    def candChain(tag: String, nBands: Int, cutoff: Int): String = {
      val bandW = bits / nBands
      val bandRows = (0 until nBands).map(b =>
        s"SELECT doc_id, simhash, $b AS band, substring(simhash, ${b * bandW + 1}, $bandW) AS sig FROM fp")
        .mkString("\nUNION ALL\n")
      s"""bands$tag AS (
         |$bandRows),
         |cand$tag AS MATERIALIZED (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands$tag x JOIN bands$tag y
         |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
         |  WHERE ($ham) <= $cutoff)""".stripMargin
    }
    def fold(geom: String, tag: String, nBands: Int, cutoff: Int): String =
      s"""SELECT '$geom' AS geometry, CAST($bits AS BIGINT) AS bits,
         |  CAST($nBands AS BIGINT) AS bands,
         |  CAST($cutoff AS BIGINT) AS cutoff,
         |  CAST(SUM(t) AS BIGINT) AS n_truth,
         |  CAST(SUM(c) AS BIGINT) AS n_pairs,
         |  CAST(SUM(CASE WHEN t IS NOT NULL AND c IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
         |  CAST(SUM(CASE WHEN t IS NOT NULL AND c IS NOT NULL THEN 1
         |    ELSE 0 END) * 1000000 // SUM(t) AS BIGINT) AS recall_ppm,
         |  CAST(SUM(CASE WHEN t IS NOT NULL AND c IS NOT NULL THEN 1
         |    ELSE 0 END) * 1000000 // SUM(c) AS BIGINT) AS precision_ppm
         |FROM (SELECT t, c FROM truth
         |      FULL OUTER JOIN (SELECT doc_a, doc_b, 1 AS c FROM cand$tag)
         |      USING (doc_a, doc_b))""".stripMargin
    val inner = simHashSqlFor(bits).replace("ORDER BY doc_id", "")
    s"""WITH fp AS MATERIALIZED ($inner),
       |${candChain("a", simhashBands, simhashMaxHamming)},
       |${candChain("r", simhashRelativeBands, simhashRelativeCutoff)},
       |$jaccardTruthCtes
       |SELECT * FROM (
       |${fold("absolute_h3", "a", simhashBands, simhashMaxHamming)}
       |UNION ALL
       |${fold("relative_h6", "r", simhashRelativeBands, simhashRelativeCutoff)})
       |ORDER BY geometry""".stripMargin
  }

  // ------------------------------------------- embedding-cosine near-dup
  /** Embedding near-dup: pairs with rounded cosine ≥ threshold, with
    * candidates generated by banded hyperplane LSH — the same
    * md5-derived plane family as the ANN path ([[Similarity.planeBit]]).
    * 16 sign bits → 4 bands of 4; two vectors are candidates iff some
    * band's 4 bits all agree (OR-amplification: pairs at cosine c match
    * a band with prob. (1−θ/π)⁴, θ = arccos c — high for real near-dups,
    * vanishing for unrelated vectors). The join key is a *signature*,
    * never a data column, so bucket sizes are governed by the plane
    * count (grow `cosPlanes` ∝ log₂ corpus at 100 TB), not by the data
    * distribution. */
  val cosineThreshold = 0.3
  val cosPlanes = 16
  val cosBands  = 4
  val cosRowsPerBand: Int = cosPlanes / cosBands

  /** Corpus-size-keyed cosine-LSH signature parameters — the measured
    * sf1 remedy as code, not a comment: expected band-bucket occupancy
    * is n/2^rowsPerBand and the candidate join's cost is quadratic per
    * bucket, so rows-per-band must grow with log₂(corpus) to hold the
    * per-bucket work constant. Rule: rowsPerBand =
    * max(contract, ⌈log₂ n⌉ − 7) (≈ 128 expected vectors per bucket),
    * band count fixed at [[cosBands]] (the OR-amplification recall
    * knob, not the cost knob). Reproduces both pinned points: the
    * oracle-locked contract signature (16 planes / 4 bands) at gate
    * corpora (≤ 2k vectors) and the sf1-measured winner
    * (32 planes / 4 bands: 65.8 s → 7.4 s, CosineLshProbe) at 20k.
    * Recall at larger r follows the closed form 1−(1−(1−θ/π)^r)^b —
    * 0.89 at cos 0.95, 0.997 at cos 0.99 for r=8 — so the scheme sheds
    * weak pairs first while the near-dup stratum survives. Contract
    * queries (d06/d09) stay on the locked values; scale callers pass
    * `cosParamsFor(corpus.count())` into [[embeddingCosineDf]]. */
  def cosParamsFor(nVectors: Long): (Int, Int) = {
    val lg = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, nVectors - 1)) // ceil(log2 n)
    val rows = math.max(cosRowsPerBand, lg - 7)
    (rows * cosBands, cosBands)
  }

  def embeddingCosine(s: SparkSession, dir: String): DataFrame =
    embeddingCosineDf(t(s, dir, "embeddings"))

  /** `planes`/`bands` default to the oracle-locked contract values;
    * callers at larger corpora raise them (bucket count per band is
    * 2^(planes/bands), so occupancy — and the candidate join's
    * quadratic-per-bucket cost — is tuned here, measured in
    * VERIFY_sf1.md). */
  def embeddingCosineDf(embs: DataFrame, nPlanes: Int = cosPlanes,
      nBands: Int = cosBands): DataFrame = {
    val rowsPerBand = nPlanes / nBands
    val e = embs
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(norm2(col("v"))))
    val sig = e.withColumn("sig",
      concat((0 until nPlanes).map(Similarity.planeBit): _*))
    val bandCols = (0 until nBands).map(b =>
      struct(lit(b).as("band"),
        substring(col("sig"), b * rowsPerBand + 1, rowsPerBand).as("bsig"))
        .as(s"b$b"))
    // Slim (vec_id, band, bsig) relation — candidates shuffle signatures
    // only; vectors re-join by key afterwards.
    val bands = sig.select(col("vec_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("vec_id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    val cos = round(
      dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 4)
    cand.join(e.as("a"), col("vec_a") === col("a.vec_id"))
      .join(e.as("b"), col("vec_b") === col("b.vec_id"))
      .select(col("vec_a"), col("vec_b"), cos.as("cos_sim"))
      .filter(col("cos_sim") >= cosineThreshold)
      .orderBy("vec_a", "vec_b")
  }

  private val embeddingCosineSql: String = {
    val sigExpr = (0 until cosPlanes).map(Similarity.planeBitSql).mkString(" || ")
    val bandRows = (0 until cosBands).map(b =>
      s"SELECT vec_id, $b AS band, substring(sig, ${b * cosRowsPerBand + 1}, $cosRowsPerBand) AS bsig FROM bits")
      .mkString("\nUNION ALL\n")
    // x feeds n, bits, and both dot-product sides; bits feeds every band
    // branch; n both norm joins — MATERIALIZED so DuckDB computes the
    // unnest/plane aggregates once instead of once per reference
    s"""WITH x AS MATERIALIZED (
       |  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS v,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |n AS MATERIALIZED (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM x GROUP BY vec_id),
       |bits AS MATERIALIZED (SELECT vec_id, $sigExpr AS sig FROM x GROUP BY vec_id),
       |bands AS MATERIALIZED (
       |$bandRows),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id < b.vec_id),
       |d AS (
       |  SELECT vec_a, vec_b, SUM(xa.v * xb.v) AS dot
       |  FROM cand JOIN x xa ON vec_a = xa.vec_id
       |  JOIN x xb ON vec_b = xb.vec_id AND xa.i = xb.i
       |  GROUP BY 1, 2)
       |SELECT vec_a, vec_b, ROUND(dot / (na.nrm * nb.nrm), 4) AS cos_sim
       |FROM d JOIN n na ON vec_a = na.vec_id JOIN n nb ON vec_b = nb.vec_id
       |WHERE ROUND(dot / (na.nrm * nb.nrm), 4) >= $cosineThreshold
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  // ---------------------------------------------- duplicate clusters
  /** Duplicate-cluster resolution — the step a real dedup pipeline runs
    * AFTER pair generation: near-dup candidate pairs (the d02 banded
    * MinHash graph) are resolved into connected components and each doc
    * gets a canonical cluster id (min doc_id reachable) plus a keeper
    * flag (the cluster representative a pipeline retains).
    *
    * Components via [[ccRounds]] unrolled min-label-propagation rounds:
    * each round, every doc takes the min of its own label and its
    * neighbors' labels — after r rounds the label is the min over the
    * r-hop neighborhood, so components converge once `ccRounds` ≥ graph
    * diameter (near-dup clusters are tight; boilerplate-heavy corpora
    * with long chains → raise it). Bounded rounds (not loop-to-
    * fixpoint) keep the computation deterministic and identical on the
    * oracle side. Each round is one shuffle on doc_id; edges shuffle
    * ids only, never text. */
  val ccRounds = 4

  def dupClusters(s: SparkSession, dir: String): DataFrame =
    dupClustersDf(t(s, dir, "documents"))

  def dupClustersDf(docs: DataFrame): DataFrame = {
    val edges = minHashCandidates(minHashSigs(docs))
    // the propagation itself is the reusable operator (persisted
    // undirected ids-only edges, one join + min-agg per round)
    val labels = graft.operators.ConnectedComponents.minLabel(
        docs.select(col("doc_id").as("id")),
        edges.select(col("doc_a").as("src"), col("doc_b").as("dst")),
        ccRounds)
      .select(col("id").as("doc_id"), col("label").as("cluster"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
    labels
      .withColumn("cluster_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("cluster"),
        col("cluster_size"),
        when(col("doc_id") === col("cluster"), 1L).otherwise(0L).as("keeper"))
      .orderBy("doc_id")
  }

  /** Near-dup KEEPER ids over an arbitrary `(doc_id, text, …)`
    * relation — d07's resolution (d02 banded candidates → [[ccRounds]]
    * min-label components → keeper = cluster min) packaged for
    * pipeline stages that fuzzy-dedup an intermediate corpus (e06's
    * stage between exact dedup and decontamination — the C4/Dolma
    * funnel order). One spelling: the SQL twin composes
    * [[dupClusterCtesFrom]] with the same source relation. */
  private[queries] def nearDupKeepers(docs: DataFrame): DataFrame =
    graft.operators.ConnectedComponents.minLabel(
        docs.select(col("doc_id").as("id")),
        minHashCandidates(minHashSigs(docs))
          .select(col("doc_a").as("src"), col("doc_b").as("dst")),
        ccRounds)
      .filter(col("id") === col("label"))
      .select(col("id").as("doc_id"))

  /** Shared CTE chain ending in `{p}l{ccRounds}` (doc_id → cluster) —
    * composed into the d07/d08 oracles over `documents` (empty
    * prefix) and, prefixed, into e06's near-dup stage over `kept`. */
  private[queries] def dupClusterCtesFrom(rel: String, p: String): String = {
    // MATERIALIZED like the g03 oracle: every round references its
    // predecessor twice, and DuckDB inlines CTEs by default — an
    // inlined chain re-expands the MinHash signature computation
    // 2^rounds times (the plan-doubling the Spark side cures with
    // localCheckpoint)
    val rounds = (1 to ccRounds).map { r =>
      s"""${p}l$r AS MATERIALIZED (
         |  SELECT l.doc_id, LEAST(l.cluster, COALESCE(m.nbr, l.cluster)) AS cluster
         |  FROM ${p}l${r - 1} l LEFT JOIN (
         |    SELECT u.doc_a AS doc_id, MIN(n.cluster) AS nbr
         |    FROM ${p}u u JOIN ${p}l${r - 1} n ON n.doc_id = u.doc_b GROUP BY u.doc_a) m
         |  USING (doc_id))""".stripMargin
    }.mkString(",\n")
    s"""${minHashCandSqlFrom(rel, p)},
       |${p}u AS MATERIALIZED (SELECT doc_a, doc_b FROM ${p}cand
       |      UNION ALL SELECT doc_b, doc_a FROM ${p}cand),
       |${p}l0 AS MATERIALIZED (SELECT doc_id, doc_id AS cluster FROM $rel),
       |$rounds""".stripMargin
  }

  private val dupClusterCtes: String = dupClusterCtesFrom("documents", "")

  private val dupClustersSql: String =
    s"""WITH $dupClusterCtes
       |SELECT doc_id, cluster,
       |CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size,
       |CAST(CASE WHEN doc_id = cluster THEN 1 ELSE 0 END AS BIGINT) AS keeper
       |FROM l$ccRounds ORDER BY doc_id""".stripMargin

  // ---------------------------------------------- canonical selection
  /** Canonical-document selection — the final stage of the dedup
    * pipeline: within each near-dup cluster (d07 components), retain
    * the best document by quality (t08 keep flag), breaking ties by
    * token count then doc_id. One window pass over (cluster) after a
    * doc_id equi-join of two narrow relations. */
  def canonicalDocs(s: SparkSession, dir: String): DataFrame =
    canonicalDocsDf(t(s, dir, "documents"))

  def canonicalDocsDf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = dupClustersDf(docs).select(col("doc_id"), col("cluster"))
    val quality = TextOps.qualityGateDf(docs)
      .select(col("doc_id"), col("n_tokens"), col("keep"))
    val wRank = Window.partitionBy(col("cluster"))
      .orderBy(col("keep").desc, col("n_tokens").desc, col("doc_id"))
    val wSize = Window.partitionBy(col("cluster"))
    clusters.join(quality, "doc_id")
      .withColumn("cluster_size", count(lit(1)).over(wSize))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("doc_id").as("canonical_doc"),
        col("cluster_size"), col("keep").as("canonical_keep"))
      .orderBy("cluster")
  }

  private val canonicalDocsSql: String =
    s"""WITH $dupClusterCtes,
       |qd AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |qs AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       |    CAST(len(list_filter(toks, t -> t IN (${TextOps.stopList}))) AS BIGINT) AS n_stop
       |  FROM qd),
       |q AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(CASE WHEN n_tokens < 5 OR n_tokens > 500
       |      OR n_distinct * 2 < n_tokens OR n_stop = 0
       |      THEN 0 ELSE 1 END AS BIGINT) AS keep
       |  FROM qs),
       |j AS (
       |  SELECT l.doc_id, l.cluster, q.n_tokens, q.keep,
       |    CAST(COUNT(*) OVER (PARTITION BY l.cluster) AS BIGINT) AS cluster_size,
       |    ROW_NUMBER() OVER (PARTITION BY l.cluster
       |      ORDER BY q.keep DESC, q.n_tokens DESC, l.doc_id) AS rn
       |  FROM l$ccRounds l JOIN q USING (doc_id))
       |SELECT cluster, doc_id AS canonical_doc, cluster_size,
       |keep AS canonical_keep
       |FROM j WHERE rn = 1 ORDER BY cluster""".stripMargin

  // --------------------------------------------- multi-signal union
  /** Multi-signal candidate union — the "drop if ANY modality says
    * dup" view a training pipeline actually filters on: text-sketch
    * pairs (d02 banded MinHash) full-outer-joined with embedding
    * pairs (d06 hyperplane-LSH cosine), each pair tagged with its
    * provenance (`text` / `embedding` / `both`).
    *
    * Scale: both inputs are already bucketed candidate sets (never
    * all-pairs), and the outer join keys are (id, id) pairs — the
    * shuffle carries ids and two doubles. Documents and embeddings
    * share the id space (doc_id ≡ vec_id). */
  def multiSignal(s: SparkSession, dir: String): DataFrame =
    multiSignalDf(t(s, dir, "documents"), t(s, dir, "embeddings"))

  def multiSignalDf(docs: DataFrame, embs: DataFrame): DataFrame = {
    val tx = minHashLshDf(docs)
    val em = embeddingCosineDf(embs)
    tx.join(em,
        tx("doc_a") === em("vec_a") && tx("doc_b") === em("vec_b"),
        "full_outer")
      .select(
        coalesce(tx("doc_a"), em("vec_a")).as("doc_a"),
        coalesce(tx("doc_b"), em("vec_b")).as("doc_b"),
        tx("est_jaccard"), em("cos_sim"),
        when(tx("doc_a").isNotNull && em("vec_a").isNotNull, "both")
          .when(tx("doc_a").isNotNull, "text")
          .otherwise("embedding").as("modality"))
      .orderBy("doc_a", "doc_b")
  }

  private val multiSignalSql: String =
    s"""SELECT COALESCE(t.doc_a, e.vec_a) AS doc_a,
       |COALESCE(t.doc_b, e.vec_b) AS doc_b,
       |t.est_jaccard, e.cos_sim,
       |CASE WHEN t.doc_a IS NOT NULL AND e.vec_a IS NOT NULL THEN 'both'
       |     WHEN t.doc_a IS NOT NULL THEN 'text'
       |     ELSE 'embedding' END AS modality
       |FROM ($minHashLshSql) t
       |FULL OUTER JOIN ($embeddingCosineSql) e
       |  ON t.doc_a = e.vec_a AND t.doc_b = e.vec_b
       |ORDER BY doc_a, doc_b""".stripMargin

  // --------------------------------------- train/test decontamination
  /** d10: train/test decontamination — the pipeline stage between dedup
    * (d01–d09) and quality gating (t08): drop every corpus document that
    * shares ANY ≥3-token shingle with the held-out benchmark set, so
    * eval answers can't leak into training data.
    *
    * The "benchmark" here is a deterministic slice of `documents`
    * (doc_id ≡ 0 mod [[evalStride]]) standing in for an external eval
    * suite; the output is the surviving clean corpus.
    *
    * Scale shape: shingles are df-pruned with the d03 stop-shingle
    * cutoff first (a boilerplate shingle shared by millions of docs is
    * vocabulary, not contamination — and pruning bounds the join bucket
    * at df² exactly as in d03). The eval shingle set is the size of the
    * benchmark suite, not the corpus, so it BROADCASTS: contamination
    * detection is a map-side semi join over the corpus shingle stream,
    * then one left_anti on doc_id. Nothing in the plan grows with
    * corpus × corpus. (If the eval suite ever outgrew the broadcast
    * threshold, drop the hint — the join degrades to a shuffle
    * hash semi join on the shingle key, still df²-bounded.) */
  val evalStride = 50L

  def decontaminate(s: SparkSession, dir: String): DataFrame =
    decontaminateDf(t(s, dir, "documents"))

  def decontaminateDf(docs: DataFrame): DataFrame = {
    val shAll = docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(toks) - 2, 1)),
           i -> concat_ws(' ', slice(toks, i, 3)))""")).as("sh"))
      .distinct()
    val keep = shAll.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf)
      .select(col("sh"))
    val sh = shAll.join(keep, "sh")
    val evalSh = sh.filter(col("doc_id") % evalStride === 0)
      .select(col("sh")).distinct()
    val contaminated = sh.filter(col("doc_id") % evalStride =!= 0)
      .join(broadcast(evalSh), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    docs.filter(col("doc_id") % evalStride =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  private[queries] val decontaminateSql =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sh_all AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(len(toks) - 2, 1)),
       |    i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
       |  FROM d),
       |keep AS (SELECT sh FROM sh_all GROUP BY sh HAVING COUNT(*) <= $maxShingleDf),
       |sh AS (SELECT sh_all.* FROM sh_all JOIN keep USING (sh)),
       |eval_sh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % $evalStride = 0),
       |contaminated AS (
       |  SELECT DISTINCT doc_id FROM sh
       |  WHERE doc_id % $evalStride <> 0
       |    AND sh IN (SELECT sh FROM eval_sh))
       |SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE doc_id % $evalStride <> 0
       |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------- incremental (delta) dedup
  /** d11: incremental dedup — today's batch against the existing
    * corpus, the shape a daily-crawl pipeline actually runs (d02 is the
    * one-time backfill; this is the steady state). The delta slice
    * (doc_id ≡ [[deltaResidue]] mod [[deltaMod]]) stands in for the
    * incoming batch; every delta doc is probed against the BASE side's
    * banded LSH index only — delta×delta and base×base pairs are never
    * generated.
    *
    * Scale: in production the base `bands`/`sigs` relations are the
    * PERSISTED dedup index (written once by the backfill, appended per
    * batch); an incremental run computes signatures for the delta only
    * and hash-joins the stored index — cost ∝ batch size, not corpus
    * size. Here both sides derive from one table so the oracle can
    * check the join itself; the plan shape (band-key hash join, no
    * self-pairing) is identical. */
  val deltaMod = 5L
  val deltaResidue = 4L

  def incrementalDedup(s: SparkSession, dir: String): DataFrame =
    incrementalDedupDf(t(s, dir, "documents"))

  def incrementalDedupDf(docs: DataFrame): DataFrame = {
    val isDelta = col("doc_id") % deltaMod === deltaResidue
    val sigs = minHashSigs(docs)
    val bands = minHashBands(sigs)
    val cand = bands.filter(isDelta).as("dl")
      .join(bands.filter(!isDelta).as("bs"),
        col("dl.band") === col("bs.band") && col("dl.sig") === col("bs.sig"))
      .select(col("dl.doc_id").as("new_doc"), col("bs.doc_id").as("dup_of"))
      .distinct()
    val matches = (0 until numHashes)
      .map(k => when(col(s"xa.s$k") === col(s"yb.s$k"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sigs.as("xa"), col("new_doc") === col("xa.doc_id"))
      .join(sigs.as("yb"), col("dup_of") === col("yb.doc_id"))
      .select(col("new_doc"), col("dup_of"),
        (matches / lit(numHashes.toDouble)).as("est_jaccard"))
      .orderBy("new_doc", "dup_of")
  }

  private val incrementalDedupSql: String = {
    val est = (0 until numHashes)
      .map(k => s"CASE WHEN x.s$k = y.s$k THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $minHashBandsSql,
       |cand AS (
       |  SELECT DISTINCT dl.doc_id AS new_doc, bs.doc_id AS dup_of
       |  FROM bands dl JOIN bands bs
       |  ON dl.band = bs.band AND dl.sig = bs.sig
       |  WHERE dl.doc_id % $deltaMod = $deltaResidue
       |    AND bs.doc_id % $deltaMod <> $deltaResidue)
       |SELECT new_doc, dup_of, ($est) / 16.0 AS est_jaccard
       |FROM cand JOIN sigs x ON new_doc = x.doc_id
       |          JOIN sigs y ON dup_of = y.doc_id
       |ORDER BY new_doc, dup_of""".stripMargin
  }

  // ------------------------------------------------------------------
  /** d12: containment detection — the asymmetric cousin of d03's
    * Jaccard: score = |A∩B| / |smaller set|, which catches SUBSET
    * duplicates (a doc quoted/embedded inside a bigger one, boilerplate
    * wrappers around identical cores) that symmetric Jaccard dilutes
    * below threshold as the size ratio grows. Same df-pruned shingle
    * inverted index as d03 (one index serves both measures — in a real
    * pipeline this is literally a second aggregation over d03's join),
    * same maxShingleDf² bucket bound. Orientation is canonical: `inner`
    * is the doc with the smaller pruned-shingle set (tie → smaller id),
    * so every pair appears once with a deterministic direction. The
    * score is one IEEE division of two exact integers. */
  val containmentThreshold = 0.9

  def containment(s: SparkSession, dir: String): DataFrame =
    containmentDf(t(s, dir, "documents"))

  def containmentDf(docs: DataFrame): DataFrame = {
    val shAll = docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(toks) - 2, 1)),
           i -> concat_ws(' ', slice(toks, i, 3)))""")).as("sh"))
      .distinct()
    val keep = shAll.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf)
      .select(col("sh"))
    val sh = shAll.join(keep, "sh")
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    val scored = pairs
      .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("common"),
        col("sa.n_sh").as("na"), col("sb.n_sh").as("nb"))
    scored
      .select(
        when(col("na") <= col("nb"), col("doc_a")).otherwise(col("doc_b"))
          .as("inner_doc"),
        when(col("na") <= col("nb"), col("doc_b")).otherwise(col("doc_a"))
          .as("outer_doc"),
        col("common"),
        (col("common") / least(col("na"), col("nb"))).as("containment"))
      .filter(col("containment") >= containmentThreshold)
      .orderBy("inner_doc", "outer_doc")
  }

  private val containmentSql =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sh_all AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(len(toks) - 2, 1)),
       |    i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
       |  FROM d),
       |keep AS (SELECT sh FROM sh_all GROUP BY sh HAVING COUNT(*) <= $maxShingleDf),
       |sh AS (SELECT sh_all.* FROM sh_all JOIN keep USING (sh)),
       |sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT p.doc_a, p.doc_b, p.common,
       |    sa.n_sh AS na, sb.n_sh AS nb
       |  FROM pairs p
       |  JOIN sz sa ON p.doc_a = sa.doc_id
       |  JOIN sz sb ON p.doc_b = sb.doc_id)
       |SELECT
       |  CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS inner_doc,
       |  CASE WHEN na <= nb THEN doc_b ELSE doc_a END AS outer_doc,
       |  CAST(common AS BIGINT) AS common,
       |  common / LEAST(na, nb) AS containment
       |FROM scored
       |WHERE common / LEAST(na, nb) >= $containmentThreshold
       |ORDER BY inner_doc, outer_doc""".stripMargin

  // ------------------------------------------------- semantic dedup
  /** d13: semantic dedup in embedding space — the SemDeDup recipe
    * (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus with a
    * coarse quantizer, then prune, WITHIN each cluster, every vector
    * that sits inside a distance threshold of a kept one. Complements
    * the text-space family: d02/d03 catch lexical near-dups, d13
    * catches paraphrases and re-encodings that share no shingles.
    *
    * Composition, not new machinery: the clusters are the s03/s05
    * trained quantizer ([[Similarity.trainedSeeds]] — one Lloyd
    * refinement over the deterministic seeds), assignment is the same
    * all-integer [[Similarity.assignCells]] argmin, and the in-cell
    * prune decision compares the exact fixed-point BIGINT squared
    * distance ([[graft.functions.FixedPointSqDist]]) against an integer
    * threshold — no float boundary anywhere, so every keep/prune bit is
    * engine-portable. Keeper rule: a vector is pruned iff a
    * smaller-id vector in the SAME cell is within [[semDupThreshold]]
    * (deterministic stand-in for SemDeDup's keep-closest-to-centroid;
    * identical pruned-set size, stable under re-partitioning).
    *
    * Scale: the candidate generator IS the cell — the self-join key is
    * the cell id, so pair work is Σ_cells occ², governed by the
    * quantizer granularity, never the corpus: at 100 TB raise
    * `numCells` so corpus/cells stays ~10⁴ (SemDeDup's own regime:
    * 50k clusters over 5B embeddings). Vectors shuffle once per side
    * into their cell; nothing is broadcast, nothing is all-pairs. */
  val semDupThreshold = 1300000L // fixed-point 2^20 units ≈ 1.24 in L2²

  def semDedup(s: SparkSession, dir: String): DataFrame =
    semDedupDf(t(s, dir, "embeddings"))

  /** `threshold` defaults to the oracle-locked contract value; callers
    * tune it per corpus against the retention curve measured by
    * [[graft.tools.SemDedupProbe]] (SCALING.md numbers). */
  def semDedupDf(embs: DataFrame,
      threshold: Long = semDupThreshold): DataFrame = {
    val e = Similarity.emb(embs)
    val seeds = Similarity.trainedSeeds(e)
    // (vec_id, v, nrm, cell) — reused by both sides of the in-cell join
    // and the final labeling, so compute the assignment once
    val assigned = Similarity.assignCells(seeds, e, 1, "cell").persist()
    val pruned = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(fpSqDist(col("a.v"), col("b.v")) <= threshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    assigned.join(pruned.withColumn("pr", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("pr"), lit(0L)).as("pruned"))
      .orderBy("vec_id")
  }

  /** DuckDB twin of [[semDedupDf]]: the s03 trained-quantizer CTE chain
    * ([[Similarity.trainedChainSql]]), then the same integer in-cell
    * prune. */
  private val semDedupSql =
    s"""WITH ${Similarity.trainedChainSql},
       |assigned AS MATERIALIZED (SELECT vec_id, cell FROM rk WHERE rk = 1),
       |pd AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb,
       |    ${Similarity.sqDistSumSql("xa.v", "xb.v")} AS d
       |  FROM assigned a JOIN assigned b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN x xa ON xa.vec_id = a.vec_id
       |  JOIN x xb ON xb.vec_id = b.vec_id AND xa.i = xb.i
       |  GROUP BY 1, 2),
       |pruned AS (SELECT DISTINCT vb AS vec_id FROM pd WHERE d <= $semDupThreshold)
       |SELECT a.vec_id, a.cell,
       |  CAST(CASE WHEN p.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS pruned
       |FROM assigned a LEFT JOIN pruned p ON a.vec_id = p.vec_id
       |ORDER BY a.vec_id""".stripMargin

  // ------------------------------------- exact repeated-span dedup (d14)
  /** Exact substring (repeated-span) dedup — the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" shape:
    * find every maximal token span that also occurs verbatim in ANOTHER
    * document, so a cleaner can cut the span instead of dropping the
    * whole doc (d01/d02 drop docs; d14 is the span-level complement).
    *
    * Reference scope: the reference has no span-level op; this extends
    * the dedup family the same way d10 decontamination does
    * (`MapleJuice.cpp` has only whole-record identity).
    *
    * Algorithm, all integer/md5 (portable per the fixed-point rule):
    *  1. k-gram inventory: one row per (doc, pos) with g = md5 of the
    *     k tokens at pos — positions 1-based, k = [[spanGramK]].
    *  2. duplicated grams: groupBy(g) keeping min(doc)≠max(doc) — a
    *     partial-aggregable min/max pair instead of count(distinct),
    *     so the agg is map-side combinable and the dup test exact.
    *  3. hit positions: semi-join inventory→dups on g (shuffle reuses
    *     the gram-hash partitioning from step 2; never a pair join).
    *  4. maximal spans: per-doc islands — new island iff the gap to the
    *     previous hit exceeds k (spans of length k overlap or touch);
    *     island id = running sum; span = [min(pos), max(pos)+k−1].
    *
    * Scale: work is linear in corpus tokens — the inventory shuffles
    * once on g (narrow: doc_id+pos+32-hex), the island merge shuffles
    * once on doc_id, and nothing is all-pairs or broadcast-unbounded.
    * At 100 TB raise k (real corpora use ~50-token spans; the synthetic
    * ~30-word vocabulary makes k=4 the collision-equivalent regime) and
    * the dup-gram set shrinks to true duplication mass. */
  val spanGramK = 4

  def spanDedup(s: SparkSession, dir: String): DataFrame =
    spanDedupDf(t(s, dir, "documents"))

  def spanDedupDf(docs: DataFrame): DataFrame = {
    val k = spanGramK
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= k)   // sequence(1, n<1) would descend
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(toks) - ${k - 1}),
            i -> struct(i AS pos, md5(concat_ws(' ', slice(toks, i, $k))) AS g))"""
        )).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.g").as("g"))
    val dup = grams.groupBy(col("g"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))  // ≥2 distinct docs, no distinct-agg
      .select(col("g"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    grams.join(dup, "g")
      .select(col("doc_id"), col("pos"))
      .withColumn("ni",
        when(col("pos") - lag("pos", 1).over(w) > k, lit(1L)).otherwise(lit(0L)))
      .withColumn("island", sum(col("ni"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(k - 1)).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
      .orderBy("doc_id", "span_start")
  }

  private val spanDedupSql = {
    val k = spanGramK
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g2 AS (
       |  SELECT doc_id,
       |    unnest(generate_series(1, len(toks) - ${k - 1})) AS pos,
       |    unnest(list_transform(generate_series(1, len(toks) - ${k - 1}),
       |      i -> md5(array_to_string(list_slice(toks, i, i + ${k - 1}), ' ')))) AS g
       |  FROM d WHERE len(toks) >= $k),
       |dup AS (SELECT g FROM g2 GROUP BY g HAVING min(doc_id) <> max(doc_id)),
       |h AS (SELECT doc_id, pos FROM g2 JOIN dup USING (g)),
       |fl AS (SELECT doc_id, pos,
       |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > $k
       |       THEN 1 ELSE 0 END AS ni
       |  FROM h),
       |isl AS (SELECT doc_id, pos, SUM(ni) OVER
       |  (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
       |  FROM fl)
       |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       |  CAST(MAX(pos) + ${k - 1} AS BIGINT) AS span_end,
       |  CAST(MAX(pos) + ${k - 1} - MIN(pos) + 1 AS BIGINT) AS span_tokens
       |FROM isl GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin
  }

  // ------------------------------------------------------------- d15
  /** LSH recall audit — s09's discipline applied to the TEXT dedup
    * path: how many of the exact 3-gram-Jaccard near-dup pairs (d03's
    * ground truth at [[jaccardThreshold]]) does d02's banded MinHash
    * candidate generation actually surface, and at what candidate
    * volume? Index quality becomes a diffable one-row table (recall /
    * precision in exact integer ppm), not a doc claim — the number a
    * 100 TB dedup run checks BEFORE trusting its banding parameters.
    *
    * Scale: composes two already-bounded pipelines (banded buckets;
    * df-cutoff index) plus one (doc_a, doc_b)-keyed outer join of
    * pair-id relations — no new shape. */
  def lshRecall(s: SparkSession, dir: String): DataFrame =
    lshRecallDf(t(s, dir, "documents"))

  def lshRecallDf(docs: DataFrame): DataFrame = {
    val truth = ngramJaccardDf(docs).select(col("doc_a"), col("doc_b"))
      .withColumn("t", lit(1L))
    val cands = minHashCandidates(minHashSigs(docs))
      .withColumn("c", lit(1L))
    truth.join(cands, Seq("doc_a", "doc_b"), "full_outer")
      .agg(sum(col("t")).as("n_truth"),
        sum(col("c")).as("n_candidates"),
        sum(when(col("t").isNotNull && col("c").isNotNull, 1L)
          .otherwise(0L)).as("n_found"))
      .select(col("n_truth"), col("n_candidates"), col("n_found"),
        expr("n_found * 1000000L div n_truth").as("recall_ppm"),
        expr("n_found * 1000000L div n_candidates").as("precision_ppm"))
  }

  /** Exact 3-gram-Jaccard truth CTE chain (d03's relation, t-prefixed
    * to coexist with candidate chains) — shared by d15 and d21. */
  private def jaccardTruthCtes: String =
    s"""td AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |tsh_all AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(len(toks) - 2, 1)),
       |    i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
       |  FROM td),
       |tkeep AS (SELECT sh FROM tsh_all GROUP BY sh
       |  HAVING COUNT(*) <= $maxShingleDf),
       |tsh AS MATERIALIZED (
       |  SELECT tsh_all.* FROM tsh_all JOIN tkeep USING (sh)),
       |tsz AS (SELECT doc_id, COUNT(*) AS n_sh FROM tsh GROUP BY doc_id),
       |tpairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |  FROM tsh a JOIN tsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS MATERIALIZED (
       |  SELECT doc_a, doc_b, 1 AS t
       |  FROM tpairs JOIN tsz sa ON doc_a = sa.doc_id
       |    JOIN tsz sb ON doc_b = sb.doc_id
       |  WHERE common / (sa.n_sh + sb.n_sh - common) >= $jaccardThreshold)"""
      .stripMargin

  /** Oracle: d02's cand chain ∪ d03's exact chain (CTEs prefixed to
    * coexist), same outer-join fold. */
  private val lshRecallSql =
    s"""WITH $minHashCandSql,
       |$jaccardTruthCtes,
       |cc AS (SELECT doc_a, doc_b, 1 AS c FROM cand),
       |j AS (
       |  SELECT t, c FROM truth FULL OUTER JOIN cc USING (doc_a, doc_b))
       |SELECT CAST(SUM(t) AS BIGINT) AS n_truth,
       |  CAST(SUM(c) AS BIGINT) AS n_candidates,
       |  CAST(SUM(CASE WHEN t IS NOT NULL AND c IS NOT NULL
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       |  CAST(SUM(CASE WHEN t IS NOT NULL AND c IS NOT NULL THEN 1
       |    ELSE 0 END) * 1000000 // SUM(t) AS BIGINT) AS recall_ppm,
       |  CAST(SUM(CASE WHEN t IS NOT NULL AND c IS NOT NULL THEN 1
       |    ELSE 0 END) * 1000000 // SUM(c) AS BIGINT) AS precision_ppm
       |FROM j""".stripMargin

  // ------------------------------------- d16: edit-distance verification
  /** Prefix length for the d16 edit-distance key. Levenshtein is
    * O(len²) per pair, so the verifier runs on a fixed normalized
    * prefix — cost per pair is a constant independent of document
    * length, which is what makes exact edit distance affordable as a
    * verification tier at 100 TB (the candidate set is LSH-sized, and
    * each check is 120×120 cells). */
  private val editPrefixLen = 120

  /** Edit distance ≤ 10% of the prefix counts as a duplicate. */
  private val editDupMaxTenth = 1

  def editVerify(s: SparkSession, dir: String): DataFrame =
    editVerifyDf(t(s, dir, "documents"))

  /** d16: exact Levenshtein verification of the banded-MinHash
    * candidate pairs — the character-level second opinion after the
    * shingle-level LSH vote. MinHash estimates set overlap; edit
    * distance certifies sequence-level closeness (catches e.g.
    * shuffled-sentence false positives that share shingles). Pipeline
    * shape every near-dup system ships: cheap sketch proposes, exact
    * verifier on the tiny candidate relation disposes.
    *
    * Scale: the only corpus-sized work is the shared MinHash index
    * (one shuffle, reused from d02/d07); the Levenshtein runs on
    * candidate pairs only — never all-pairs — and each evaluation is
    * capped at [[editPrefixLen]]² cells. Distance and verdict are
    * integers; no float anywhere. */
  def editVerifyDf(docs: DataFrame): DataFrame = {
    val cand = minHashCandidates(minHashSigs(docs))
    val keys = docs.select(col("doc_id"),
      substring(lower(col("text")), 1, editPrefixLen).as("k"))
    cand.join(keys.as("x"), col("doc_a") === col("x.doc_id"))
      .join(keys.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("x.k"), col("y.k")).cast("long").as("edit_dist"))
      .withColumn("is_dup",
        when(col("edit_dist") * 10 <= lit(editPrefixLen * editDupMaxTenth), 1L)
          .otherwise(0L))
      .orderBy("doc_a", "doc_b")
  }

  private val editVerifySql: String =
    s"""WITH $minHashCandSql,
       |k AS (SELECT doc_id, substring(lower(text), 1, $editPrefixLen) AS k
       |      FROM documents)
       |SELECT doc_a, doc_b,
       |  CAST(levenshtein(x.k, y.k) AS BIGINT) AS edit_dist,
       |  CAST(CASE WHEN levenshtein(x.k, y.k) * 10 <=
       |    ${editPrefixLen * editDupMaxTenth} THEN 1 ELSE 0 END AS BIGINT)
       |    AS is_dup
       |FROM cand JOIN k x ON doc_a = x.doc_id JOIN k y ON doc_b = y.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------- d17 MinHash calibration
  /** d17: MinHash estimator calibration — for every banded candidate
    * pair, the signature-agreement estimate (matches/16) laid against
    * the EXACT shingle Jaccard, rolled up per match count: how many
    * pairs, the estimator's nominal value, and the true similarity's
    * mean/min/max. This is the d15/s09/s14 measured-index-quality
    * discipline pointed at the ESTIMATOR itself (d15 audits what the
    * bands recall; d17 audits what the signature claims): a dedup
    * threshold of "≥ 12/16 matches" is only as good as this table
    * says it is, and re-tuning shingle size or hash count shows up as
    * a diffable calibration shift, not a doc claim.
    *
    * Exactness: match counts are integer; the true Jaccard is exact
    * `common·10⁶ div (|A|+|B|−common)` over the full (unpruned)
    * distinct-shingle sets; the per-bucket mean divides two exact
    * integers. A banded pair with NO shared shingle (possible only
    * via a 32-bit sub-hash collision) contributes 0 ppm, not a
    * dropped row.
    *
    * Scale: the corpus-sized work is the shared signature build (one
    * shuffle, identical sub-plans dedupe via ReusedExchange — the d02
    * note) and one distinct-shingle relation; intersections run
    * candidate-bounded (cand ⋈ shingles on doc, then an (id, shingle)
    * hash join), never all-pairs. The output is ≤ 17 rows at any
    * corpus size. */
  def minhashCalibration(s: SparkSession, dir: String): DataFrame =
    minhashCalibrationDf(t(s, dir, "documents"))

  def minhashCalibrationDf(docs: DataFrame): DataFrame = {
    val sigs = minHashSigs(docs)
    val cand = minHashCandidates(sigs)
    val m = (0 until numHashes)
      .map(k => when(col(s"xa.s$k") === col(s"yb.s$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    val scored = cand
      .join(sigs.as("xa"), col("doc_a") === col("xa.doc_id"))
      .join(sigs.as("yb"), col("doc_b") === col("yb.doc_id"))
      .select(col("doc_a"), col("doc_b"), m.as("sig_matches"))
    // exact side: the same distinct 3-token shingle sets the signature
    // summarizes (UNpruned — calibration must measure the estimator
    // against the true set, not a df-cut convenience)
    val sh = docs.withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(sequence(1, greatest(size(toks) - 2, 1)),
           i -> concat_ws(' ', slice(toks, i, 3)))"""))).as("sh"))
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = scored.select(col("doc_a"), col("doc_b"))
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"),
        col("doc_b") === col("b.doc_id") && col("a.sh") === col("b.sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("common"))
    scored
      .join(common, Seq("doc_a", "doc_b"), "left")
      .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("sig_matches"),
        expr("""coalesce(common, 0L) * 1000000
                div (sa.n_sh + sb.n_sh - coalesce(common, 0L))""")
          .as("true_ppm"))
      .groupBy(col("sig_matches"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(true_ppm) div count(1)").as("mean_true_ppm"),
        min(col("true_ppm")).as("min_true_ppm"),
        max(col("true_ppm")).as("max_true_ppm"))
      .select(col("sig_matches"), col("n_pairs"),
        expr(s"CAST(sig_matches * 1000000 div $numHashes AS BIGINT)")
          .as("est_ppm"),
        col("mean_true_ppm"), col("min_true_ppm"), col("max_true_ppm"))
      .orderBy("sig_matches")
  }

  private val minhashCalibrationSql: String = {
    val est = (0 until numHashes)
      .map(k => s"CASE WHEN x.s$k = y.s$k THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $minHashCandSql,
       |scored AS MATERIALIZED (
       |  SELECT doc_a, doc_b, CAST($est AS BIGINT) AS sig_matches
       |  FROM cand JOIN sigs x ON doc_a = x.doc_id
       |            JOIN sigs y ON doc_b = y.doc_id),
       |sz AS MATERIALIZED (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
       |  FROM toks GROUP BY doc_id),
       |com AS (
       |  SELECT s.doc_a, s.doc_b, CAST(COUNT(*) AS BIGINT) AS common
       |  FROM scored s
       |  JOIN toks a ON s.doc_a = a.doc_id
       |  JOIN toks b ON s.doc_b = b.doc_id AND a.tok = b.tok
       |  GROUP BY 1, 2),
       |pairppm AS (
       |  SELECT s.sig_matches,
       |    COALESCE(c.common, 0) * 1000000
       |      // (sa.n_sh + sb.n_sh - COALESCE(c.common, 0)) AS true_ppm
       |  FROM scored s
       |  LEFT JOIN com c ON s.doc_a = c.doc_a AND s.doc_b = c.doc_b
       |  JOIN sz sa ON s.doc_a = sa.doc_id
       |  JOIN sz sb ON s.doc_b = sb.doc_id)
       |SELECT sig_matches, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(sig_matches * 1000000 // $numHashes AS BIGINT) AS est_ppm,
       |  CAST(SUM(true_ppm) // COUNT(*) AS BIGINT) AS mean_true_ppm,
       |  CAST(MIN(true_ppm) AS BIGINT) AS min_true_ppm,
       |  CAST(MAX(true_ppm) AS BIGINT) AS max_true_ppm
       |FROM pairppm GROUP BY sig_matches ORDER BY sig_matches""".stripMargin
  }

  // ------------------------------------------- d18 SimHash calibration
  /** d18: SimHash estimator calibration — the d17 discipline pointed at
    * the OTHER sketch: for every banded SimHash candidate pair (the d05
    * generator with NO hamming cutoff — calibration must see the whole
    * spectrum the bands surface, not just the kept head), the pair's
    * hamming distance laid against the EXACT shingle Jaccard, rolled up
    * per hamming value. This closes the one index-quality gap the r6
    * audit set left: MinHash got d15 (recall) + d17 (estimator), the
    * vector indexes got s09/s14/s15/s16 — SimHash's "hamming ≤ 3 means
    * near-dup" cutoff (d05) was asserted, not measured. After this, a
    * re-tune of `simhashBits`/band count shows up as a diffable
    * calibration shift.
    *
    * Exactness: hamming is an integer over the 32-char fingerprints;
    * true Jaccard is exact `common·10⁶ div (|A|+|B|−common)` over the
    * full distinct-shingle sets (d17's exact side verbatim, so the two
    * calibration tables are directly comparable); per-bucket mean
    * divides two exact integers.
    *
    * Scale: fingerprints build in one corpus pass (persisted — three
    * consumers), candidates stay band-bucketed, intersections are
    * candidate-bounded. Output ≤ 33 rows (hamming 0..32) at any corpus
    * size. */
  def simhashCalibration(s: SparkSession, dir: String): DataFrame =
    simhashCalibrationDf(t(s, dir, "documents"))

  /** `bits`/`nBands` default to the oracle-locked contract geometry;
    * the r8 sf1 re-sweep runs this with `simhashParamsFor(n)` to show
    * the widened geometry restores near-linear candidate volume
    * (SCALING.md round-8). */
  def simhashCalibrationDf(docs: DataFrame, bits: Int = simhashBits,
      nBands: Int = simhashBands): DataFrame = {
    require(bits % nBands == 0, s"bits ($bits) % nBands ($nBands) != 0")
    val fp = simHashDf(docs, bits).persist()
    val bandW = bits / nBands
    val bandCols = (0 until nBands).map(b =>
      struct(lit(b).as("band"),
        substring(col("simhash"), b * bandW + 1, bandW).as("sig")).as(s"b$b"))
    val bands = fp.select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("simhash"), col("bs.band").as("band"),
        col("bs.sig").as("sig"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        hamming(col("x.simhash"), col("y.simhash")).as("hamming"))
      .distinct()
    // exact side: d17's distinct-shingle relation verbatim
    val sh = docs.withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(sequence(1, greatest(size(toks) - 2, 1)),
           i -> concat_ws(' ', slice(toks, i, 3)))"""))).as("sh"))
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = cand.select(col("doc_a"), col("doc_b"))
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"),
        col("doc_b") === col("b.doc_id") && col("a.sh") === col("b.sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("common"))
    cand
      .join(common, Seq("doc_a", "doc_b"), "left")
      .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("hamming"),
        expr("""coalesce(common, 0L) * 1000000
                div (sa.n_sh + sb.n_sh - coalesce(common, 0L))""")
          .as("true_ppm"))
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(true_ppm) div count(1)").as("mean_true_ppm"),
        min(col("true_ppm")).as("min_true_ppm"),
        max(col("true_ppm")).as("max_true_ppm"))
      .orderBy("hamming")
  }

  private val simhashCalibrationSql: String = {
    val bandW = simhashBits / 4
    val bandRows = (0 until 4).map(b =>
      s"SELECT doc_id, simhash, $b AS band, substring(simhash, ${b * bandW + 1}, $bandW) AS sig FROM fp")
      .mkString("\nUNION ALL\n")
    val ham = (1 to simhashBits)
      .map(j => s"CASE WHEN substring(x.simhash, $j, 1) <> substring(y.simhash, $j, 1) THEN 1 ELSE 0 END")
      .mkString(" + ")
    val inner = simHashSql.replace("ORDER BY doc_id", "")
    s"""WITH fp AS MATERIALIZED ($inner),
       |bands AS (
       |$bandRows),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    CAST($ham AS BIGINT) AS hamming
       |  FROM bands x JOIN bands y
       |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
       |toks AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(len(tk) - 2, 1)),
       |    i -> array_to_string(list_slice(tk, i, i + 2), ' '))) AS tok
       |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)),
       |sz AS MATERIALIZED (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
       |  FROM toks GROUP BY doc_id),
       |com AS (
       |  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS common
       |  FROM cand c
       |  JOIN toks a ON c.doc_a = a.doc_id
       |  JOIN toks b ON c.doc_b = b.doc_id AND a.tok = b.tok
       |  GROUP BY 1, 2),
       |pairppm AS (
       |  SELECT c.hamming,
       |    COALESCE(m.common, 0) * 1000000
       |      // (sa.n_sh + sb.n_sh - COALESCE(m.common, 0)) AS true_ppm
       |  FROM cand c
       |  LEFT JOIN com m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
       |  JOIN sz sa ON c.doc_a = sa.doc_id
       |  JOIN sz sb ON c.doc_b = sb.doc_id)
       |SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(true_ppm) // COUNT(*) AS BIGINT) AS mean_true_ppm,
       |  CAST(MIN(true_ppm) AS BIGINT) AS min_true_ppm,
       |  CAST(MAX(true_ppm) AS BIGINT) AS max_true_ppm
       |FROM pairppm GROUP BY hamming ORDER BY hamming""".stripMargin
  }

  // ------------------------------------------------ d19 cluster drift
  /** d19: cluster-drift audit — the known silent failure of
    * connected-component dedup (d07): transitive chaining merges A~B,
    * B~C into one cluster even when A and C share almost nothing, so a
    * keeper-based dedup (d08) can delete documents that are NOT
    * near-dups of what it kept. This audit measures that risk as a
    * relation: for every non-keeper member, the EXACT shingle Jaccard
    * to its cluster's keeper, rolled up per cluster size — a healthy
    * corpus shows min_ppm staying high as size grows; chain-drift shows
    * up as the min collapsing in the big-cluster rows. The
    * keeper-star check is O(members), never within-cluster quadratic.
    *
    * Exactness: d17's distinct-shingle machinery verbatim (exact
    * integer Jaccard ppm, floored mean of exact integers). Scale: the
    * star pair relation is exactly the non-keeper member set;
    * intersections are candidate-bounded; output is bounded by the
    * number of DISTINCT cluster sizes. */
  def clusterDrift(s: SparkSession, dir: String): DataFrame =
    clusterDriftDf(t(s, dir, "documents"))

  def clusterDriftDf(docs: DataFrame): DataFrame = {
    val members = dupClustersDf(docs)
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id").as("m"), col("cluster").as("k"),
        col("cluster_size"))
    val sh = docs.withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(sequence(1, greatest(size(toks) - 2, 1)),
           i -> concat_ws(' ', slice(toks, i, 3)))"""))).as("sh"))
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = members.select(col("m"), col("k"))
      .join(sh.as("a"), col("m") === col("a.doc_id"))
      .join(sh.as("b"),
        col("k") === col("b.doc_id") && col("a.sh") === col("b.sh"))
      .groupBy(col("m"), col("k"))
      .agg(count(lit(1)).as("common"))
    members
      .join(common, Seq("m", "k"), "left")
      .join(sz.as("sa"), col("m") === col("sa.doc_id"))
      .join(sz.as("sb"), col("k") === col("sb.doc_id"))
      .select(col("k"), col("cluster_size"),
        expr("""coalesce(common, 0L) * 1000000
                div (sa.n_sh + sb.n_sh - coalesce(common, 0L))""")
          .as("ppm"))
      .groupBy(col("cluster_size"))
      .agg(countDistinct(col("k")).as("n_clusters"),
        count(lit(1)).as("n_members"),
        min(col("ppm")).as("min_ppm"),
        expr("sum(ppm) div count(1)").as("mean_ppm"),
        max(col("ppm")).as("max_ppm"))
      .orderBy("cluster_size")
  }

  private val clusterDriftSql =
    s"""WITH $dupClusterCtes,
       |cs AS (
       |  SELECT doc_id, cluster,
       |    COUNT(*) OVER (PARTITION BY cluster) AS cluster_size
       |  FROM l$ccRounds),
       |mem AS MATERIALIZED (
       |  SELECT doc_id AS m, cluster AS k, cluster_size
       |  FROM cs WHERE doc_id <> cluster),
       |sz AS MATERIALIZED (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
       |  FROM toks GROUP BY doc_id),
       |com AS (
       |  SELECT mem.m, mem.k, CAST(COUNT(*) AS BIGINT) AS common
       |  FROM mem JOIN toks a ON mem.m = a.doc_id
       |           JOIN toks b ON mem.k = b.doc_id AND a.tok = b.tok
       |  GROUP BY 1, 2),
       |pp AS (
       |  SELECT mem.cluster_size, mem.k,
       |    COALESCE(c.common, 0) * 1000000
       |      // (sa.n_sh + sb.n_sh - COALESCE(c.common, 0)) AS ppm
       |  FROM mem LEFT JOIN com c ON mem.m = c.m AND mem.k = c.k
       |  JOIN sz sa ON mem.m = sa.doc_id
       |  JOIN sz sb ON mem.k = sb.doc_id)
       |SELECT cluster_size,
       |  CAST(COUNT(DISTINCT k) AS BIGINT) AS n_clusters,
       |  CAST(COUNT(*) AS BIGINT) AS n_members,
       |  CAST(MIN(ppm) AS BIGINT) AS min_ppm,
       |  CAST(SUM(ppm) // COUNT(*) AS BIGINT) AS mean_ppm,
       |  CAST(MAX(ppm) AS BIGINT) AS max_ppm
       |FROM pp GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d21_simhash_relative" -> simhashRelativeAudit _,
    "d20_simhash_scaled"  -> simHashPairsScaled _,
    "d19_cluster_drift"   -> clusterDrift _,
    "d18_simhash_calibration" -> simhashCalibration _,
    "d17_minhash_calibration" -> minhashCalibration _,
    "d16_edit_verify"     -> editVerify _,
    "d15_lsh_recall"      -> lshRecall _,
    "d13_semdedup"        -> semDedup _,
    "d14_span_dedup"      -> spanDedup _,
    "d01_dedup_exact"     -> exact _,
    "d02_minhash_lsh"     -> minHashLsh _,
    "d03_ngram_jaccard"   -> ngramJaccard _,
    "d04_simhash"         -> simHash _,
    "d05_simhash_pairs"   -> simHashPairs _,
    "d06_embedding_cosine" -> embeddingCosine _,
    "d07_dup_clusters"    -> dupClusters _,
    "d08_canonical_docs"  -> canonicalDocs _,
    "d09_multi_signal"    -> multiSignal _,
    "d10_decontaminate"   -> decontaminate _,
    "d11_incremental"     -> incrementalDedup _,
    "d12_containment"     -> containment _)

  val oracle: Map[String, String] = Map(
    "d21_simhash_relative" -> simhashRelativeAuditSql,
    "d20_simhash_scaled"  -> simHashPairsSqlFor(simhashScaledBits,
      simhashRelativeBands, simhashRelativeCutoff),
    "d19_cluster_drift"   -> clusterDriftSql,
    "d18_simhash_calibration" -> simhashCalibrationSql,
    "d17_minhash_calibration" -> minhashCalibrationSql,
    "d16_edit_verify"     -> editVerifySql,
    "d15_lsh_recall"      -> lshRecallSql,
    "d13_semdedup"        -> semDedupSql,
    "d14_span_dedup"      -> spanDedupSql,
    "d01_dedup_exact"     -> exactSql,
    "d02_minhash_lsh"     -> minHashLshSql,
    "d03_ngram_jaccard"   -> ngramJaccardSql,
    "d04_simhash"         -> simHashSql,
    "d05_simhash_pairs"   -> simHashPairsSql,
    "d06_embedding_cosine" -> embeddingCosineSql,
    "d07_dup_clusters"    -> dupClustersSql,
    "d08_canonical_docs"  -> canonicalDocsSql,
    "d09_multi_signal"    -> multiSignalSql,
    "d10_decontaminate"   -> decontaminateSql,
    "d11_incremental"     -> incrementalDedupSql,
    "d12_containment"     -> containmentSql)
}
