package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Deterministic corpus-sampling operators — the "pick the training mix"
  * step of an LLM data pipeline (downsample a crawl, balance sources,
  * cap any one domain). The reference has no sampling surface; these
  * extend its data-selection queries (grep Q3 = predicate selection,
  * `MapleJuice.cpp:134`) to statistical selection.
  *
  * Everything is md5-keyed, never `rand()`: a sample that can't be
  * reproduced can't be audited, and at 100 TB the sample IS the dataset
  * lineage. md5 hex strings compare lexicographically the same in every
  * engine (lowercase hex, ASCII), so thresholds and orderings port to
  * the DuckDB oracle verbatim — same trick as the d02 MinHash
  * signatures and s02 hyperplanes.
  *
  * Scale shapes:
  *  - p01 is a pure map-side filter (no shuffle beyond the
  *    oracle-determinism sort): rate-r sampling of 100 TB reads 100 TB
  *    but shuffles r·100 TB at most.
  *  - p02/p03 need per-group ranks. A bare `Window.partitionBy(source)`
  *    would put one source's whole corpus in one task — at 100 TB a
  *    single web domain can be TBs. p02 therefore pre-filters by an
  *    md5 threshold chosen ≫ quota/expected-group-size BEFORE the
  *    window, so the ranked set per group is bounded ~quota/rate
  *    regardless of corpus size. p03 caps by doc id with the same
  *    pre-rank reduction unavailable (the cap keeps the SMALLEST ids,
  *    which a random prefilter would evict), so it bounds the window
  *    input with a per-group count join instead: groups under the cap
  *    bypass ranking entirely — at web scale that is almost all of them.
  */
object Sampling {

  /** p01: uniform deterministic sample. Keep a doc iff the first two
    * hex chars of md5(doc_id) fall under the threshold — rate 13/256
    * ≈ 5.1%. Independent of row order, partitioning, and engine. */
  def hashSample(s: SparkSession, dir: String): DataFrame =
    hashSampleDf(t(s, dir, "documents"))

  def hashSampleDf(documents: DataFrame): DataFrame =
    documents
      .withColumn("bucket", substring(md5(col("doc_id").cast("string")), 1, 2))
      .filter(col("bucket") < lit("0d"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  private val p01Sql =
    """SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
      |ORDER BY doc_id""".stripMargin

  /** p02: stratified sample — quota of [[stratQuota]] docs per source,
    * chosen by md5 rank (a deterministic "random" K). The md5 < '40'
    * (25%) pre-filter runs BEFORE the window so the per-source ranked
    * set stays ~4·quota in expectation even when one source dominates
    * the corpus; the quota filter after the rank is exact. */
  val stratQuota = 10

  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    stratifiedSampleDf(t(s, dir, "documents"))

  def stratifiedSampleDf(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("pick"), col("doc_id"))
    documents
      .withColumn("pick", md5(col("doc_id").cast("string")))
      .filter(substring(col("pick"), 1, 2) < lit("40"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= stratQuota)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("lang"))
      .orderBy("source", "rk")
  }

  private val p02Sql =
    s"""WITH cand AS (
       |  SELECT source, doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS pick
       |  FROM documents
       |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'),
       |ranked AS (
       |  SELECT source, doc_id, lang,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY pick, doc_id) AS rk
       |  FROM cand)
       |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, lang
       |FROM ranked WHERE rk <= $stratQuota ORDER BY source, rk""".stripMargin

  /** p03: per-source cap report — cap every source at [[sourceCap]]
    * docs keeping the smallest doc ids (stable, auditable), and report
    * per source what survives. Only groups OVER the cap are ranked:
    * the count join routes small groups (at web scale, the long tail —
    * almost everything) around the window entirely, so the skewed
    * window input is just the handful of mega-sources. */
  val sourceCap = 60

  def sourceCapReport(s: SparkSession, dir: String): DataFrame =
    sourceCapReportDf(t(s, dir, "documents"))

  def sourceCapReportDf(documents: DataFrame): DataFrame = {
    val docs = documents.select("source", "doc_id", "n_chars")
    val sizes = docs.groupBy("source").agg(count(lit(1)).as("n_total"))
    val sized = docs.join(broadcast(sizes), "source")
    val small = sized.filter(col("n_total") <= sourceCap)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val bigKept = sized.filter(col("n_total") > sourceCap)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= sourceCap)
      .drop("rk")
    small.unionByName(bigKept)
      .groupBy(col("source"))
      .agg(max(col("n_total")).as("n_total"),
        count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("kept_chars"))
      .orderBy("source")
  }

  private val p03Sql =
    s"""WITH ranked AS (
       |  SELECT source, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk,
       |    COUNT(*) OVER (PARTITION BY source) AS n_total
       |  FROM documents)
       |SELECT source, MAX(n_total) AS n_total, COUNT(*) AS n_kept,
       |  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
       |FROM ranked WHERE rk <= $sourceCap GROUP BY source
       |ORDER BY source""".stripMargin

  /** p04: temperature-flattened source mixing — per-source sampling
    * rate ∝ √(source size), normalized to the biggest source (the
    * standard size^α rebalancing, α = 1/2, that stops one mega-crawl
    * from dominating a multilingual/multi-source training mix while
    * still over-representing bigger sources).
    *
    * Portability: the only float ops are IEEE-correctly-rounded sqrt
    * and one division/multiplication chain spelled identically in both
    * engines, collapsed to an integer threshold by FLOOR — after that
    * the keep decision is `md5-16-bit(doc_id) < threshold`, pure
    * integers. Per-doc selection never looks at another row: a
    * map-side filter against a broadcast (source → threshold) table
    * of |sources| rows. */
  val mixScale = 65536L

  def temperatureMix(s: SparkSession, dir: String): DataFrame =
    temperatureMixDf(t(s, dir, "documents"))

  def temperatureMixDf(documents: DataFrame): DataFrame = {
    val docs = documents.select(col("source"), col("doc_id"), col("n_chars"))
    val sizes = docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
    val nmax = sizes.agg(max(col("n_total")).as("n_max"))
    val thr = sizes.crossJoin(broadcast(nmax))
      .withColumn("mix_threshold",
        floor(lit(mixScale.toDouble) * (sqrt(col("n_total")) / sqrt(col("n_max")))))
      .select(col("source"), col("n_total"), col("mix_threshold"))
    val kept = docs
      .withColumn("u", md5U16)
      .join(broadcast(thr.select("source", "mix_threshold")), "source")
      .filter(col("u") < col("mix_threshold"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    thr.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_total"), col("mix_threshold"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"))
      .orderBy("source")
  }

  private val p04Sql = {
    val u = md5U16Sql
    s"""WITH sizes AS (
       |  SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
       |mx AS (SELECT MAX(n_total) AS n_max FROM sizes),
       |thr AS (
       |  SELECT source, n_total,
       |    CAST(FLOOR(65536.0 * (sqrt(n_total) / sqrt(n_max))) AS BIGINT)
       |      AS mix_threshold
       |  FROM sizes CROSS JOIN mx),
       |kept AS (
       |  SELECT d.source, COUNT(*) AS n_kept,
       |    CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
       |  FROM documents d JOIN thr ON d.source = thr.source
       |  WHERE $u < thr.mix_threshold
       |  GROUP BY d.source)
       |SELECT t.source, t.n_total, t.mix_threshold,
       |  COALESCE(k.n_kept, 0) AS n_kept,
       |  COALESCE(k.kept_chars, 0) AS kept_chars
       |FROM thr t LEFT JOIN kept k ON t.source = k.source
       |ORDER BY t.source""".stripMargin
  }

  /** p05: the training-data manifest — the capstone composition of the
    * pipeline stages this library ships: a document makes the cut iff
    * it is (1) the exact-dedup keeper of its content (d01), (2) past
    * the quality gate (t08), and (3) clear of eval contamination (d10).
    * Three left_semi joins on doc_id — each stage's shape is its own
    * (already verified) plan; the composition adds only narrow id
    * joins, so the manifest costs the sum of its stages, not a new
    * quadratic. Output carries the token count a mix scheduler needs. */
  def trainingManifest(s: SparkSession, dir: String): DataFrame =
    trainingManifestDf(t(s, dir, "documents"))

  def trainingManifestDf(docs: DataFrame): DataFrame = {
    val keepers = Dedup.exactDf(docs).select(col("keeper").as("doc_id"))
    val quality = TextOps.qualityGateDf(docs)
      .filter(col("keep") === 1L).select("doc_id")
    val clean = Dedup.decontaminateDf(docs).select("doc_id")
    docs.join(keepers, Seq("doc_id"), "left_semi")
      .join(quality, Seq("doc_id"), "left_semi")
      .join(clean, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  private val p05Sql =
    s"""SELECT d.doc_id, d.lang, d.source,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
       |FROM documents d
       |WHERE d.doc_id IN (SELECT keeper FROM (${Dedup.exactSql}) k)
       |  AND d.doc_id IN (SELECT doc_id FROM (${TextOps.qualityGateSql}) q
       |                   WHERE q.keep = 1)
       |  AND d.doc_id IN (SELECT doc_id FROM (${Dedup.decontaminateSql}) c)
       |ORDER BY d.doc_id""".stripMargin

  /** p06: sequence packing — assign documents to fixed token-budget
    * packs ([[packBudget]] tokens) by running offset, per source in
    * doc_id order: pack = start-offset DIV budget, i.e. documents are
    * concatenated in order and split every `budget` tokens — exactly
    * how pretraining examples are packed from a document stream
    * (straddling docs truncate across the boundary). Pure integer
    * window arithmetic ⇒ engine-portable and reproducible: the pack a
    * doc lands in is a function of the corpus, not the partitioning.
    *
    * Scale: one running sum per source partition. A single source's
    * prefix sum is inherently sequential; the parallel unit is the
    * source (plus AQE), and a mega-source splits into doc_id ranges
    * with per-range base offsets computed in a first pass (classic
    * two-pass distributed prefix sum) — the escape hatch if one source
    * is TBs. */
  val packBudget = 2048L

  def sequencePack(s: SparkSession, dir: String): DataFrame =
    sequencePackDf(t(s, dir, "documents"))

  def sequencePackDf(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tokens) div $packBudget"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
      .orderBy("source", "pack_id")
  }

  private val p06Sql =
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT source, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d)
       |SELECT source, CAST((cum - n_tokens) // $packBudget AS BIGINT) AS pack_id,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
       |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** p07: deterministic train/val/test split — the assignment every
    * training corpus needs before anything touches an eval metric:
    * bucket = md5-16-bit(doc_id) mod 100, train < [[valLo]] ≤ val <
    * [[testLo]] ≤ test. Hash-based (never modulo on the raw id — ids
    * correlate with crawl time/source; md5 decorrelates) and
    * engine-portable, so the SAME doc lands in the SAME split in every
    * run, engine, and partitioning — the property that makes the split
    * auditable and leak-free. Pure map-side assignment (zero shuffle
    * until the report agg); at 100 TB the split column is computed on
    * read, never materialized globally.
    *
    * Output is the split manifest report: per (split, source) doc and
    * char counts — the numbers a mix scheduler checks before training. */
  val valLo = 90L
  val testLo = 95L

  /** The one doc-id hash every threshold/bucket decision derives from:
    * a 16-bit integer from the first 4 hex chars of md5(doc_id).
    * Shared by p04 (temperature thresholds), p07 and p10 (split
    * buckets) — the leak-free-split contract lives in exactly one
    * expression on each engine. */
  private[queries] def md5U16: Column =
    conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long")

  // lazy: referenced by SQL-twin vals declared EARLIER in the object
  // (p04Sql); a strict val would interpolate null during object init
  private[queries] lazy val md5U16Sql: String =
    OracleDsl.hornerHex("md5(CAST(doc_id AS VARCHAR))", 4)

  /** Split assignment from a 0–99 bucket (p07's contract, reused by
    * p10 so curriculum phases can never disagree with the split
    * manifest). */
  private[queries] def splitOf(bucket: Column): Column =
    when(bucket < valLo, "train")
      .when(bucket < testLo, "val")
      .otherwise("test")

  private[queries] lazy val splitOfSql: String =
    s"""CASE WHEN bucket < $valLo THEN 'train'
       |     WHEN bucket < $testLo THEN 'val'
       |     ELSE 'test' END""".stripMargin

  def datasetSplit(s: SparkSession, dir: String): DataFrame =
    datasetSplitDf(t(s, dir, "documents"))

  def datasetSplitDf(documents: DataFrame): DataFrame =
    documents
      .withColumn("bucket", md5U16 % 100)
      .withColumn("split", splitOf(col("bucket")))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("split", "source")

  private val p07Sql =
    s"""WITH b AS (
       |  SELECT source, n_chars, ($md5U16Sql) % 100 AS bucket
       |  FROM documents),
       |sp AS (
       |  SELECT source, n_chars, $splitOfSql AS split
       |  FROM b)
       |SELECT split, source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------- p08 seeded shuffle
  /** p08: deterministic global training-order shuffle — the "randomize
    * the corpus once per epoch" step every trainer needs, as a
    * reproducible manifest instead of an unseeded `rand()`. Shuffle key
    * = md5(seed ‖ doc_id); shard = first two hex chars (256 shards);
    * position-in-shard = rank by key. Changing [[shuffleSeed]] is a new
    * epoch permutation; the same seed always replays the same order on
    * any engine and any partitioning.
    *
    * Scale: md5 keys are uniform, so shards balance to ±√ and the
    * position window ranks ~corpus/256 rows per shard — and shard width
    * is a constant to widen (3 hex chars → 4096 shards) as the corpus
    * grows. In production the manifest order is realized physically with
    * `repartitionByRange(shard, skey).sortWithinPartitions(skey)` —
    * written file order IS the shuffle; the explicit rank here is the
    * oracle-checkable artifact of that order. */
  val shuffleSeed = "epoch0"
  val shardHexChars = 2

  def seededShuffle(s: SparkSession, dir: String): DataFrame =
    seededShuffleDf(t(s, dir, "documents"))

  def seededShuffleDf(documents: DataFrame): DataFrame =
    documents
      .withColumn("skey",
        md5(concat(lit(shuffleSeed + ":"), col("doc_id").cast("string"))))
      .withColumn("shard",
        conv(substring(col("skey"), 1, shardHexChars), 16, 10).cast("long"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id")))
        .cast("long"))
      .select(col("shard"), col("pos"), col("doc_id"))
      .orderBy("shard", "pos")

  private val p08Sql = {
    val shard = OracleDsl.hornerHex("skey", shardHexChars)
    s"""WITH k AS (
       |  SELECT doc_id,
       |    md5('$shuffleSeed:' || CAST(doc_id AS VARCHAR)) AS skey
       |  FROM documents),
       |s AS (SELECT doc_id, skey, CAST($shard AS BIGINT) AS shard FROM k)
       |SELECT shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY skey, doc_id)
       |    AS BIGINT) AS pos,
       |  doc_id
       |FROM s ORDER BY shard, pos""".stripMargin
  }

  // ---------------------------------------------- p09 source interleave
  /** p09: deterministic source-interleaved curriculum order — pick an
    * md5-ranked quota of [[interleaveQuota]] docs per source, then
    * round-robin the sources into one global stream
    * (`global_pos = (rn−1)·|sources| + source_index`). The position is
    * a closed-form formula, not a global window: consecutive training
    * batches see every source once before any source twice — the
    * "interleave the mix" scheduling step after p04 decides the
    * mix WEIGHTS.
    *
    * Scale: the per-source rank windows see quota-bounded sets after
    * the p02-style md5 prefilter trick (here the quota itself is the
    * bound); the source-index relation and the source count are
    * vocabulary-sized (|sources| rows — the one unpartitioned window
    * runs over that tiny distinct relation, never the corpus) and
    * broadcast back. No corpus-sized shuffle except the ordered
    * output. */
  val interleaveQuota = 8L

  def interleaveMix(s: SparkSession, dir: String): DataFrame =
    interleaveMixDf(t(s, dir, "documents"))

  def interleaveMixDf(documents: DataFrame): DataFrame = {
    val docs = documents.select(col("doc_id"), col("source"))
      .withColumn("skey", md5(concat(lit("mix:"), col("doc_id").cast("string"))))
    val picked = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("skey"), col("doc_id")))
        .cast("long"))
      .filter(col("rn") <= interleaveQuota)
    val idx = docs.select(col("source")).distinct()
      .withColumn("src_idx",
        row_number().over(Window.orderBy(col("source"))).cast("long"))
    val nSrc = idx.agg(count(lit(1)).as("n_sources"))
    picked.join(broadcast(idx), "source")
      .crossJoin(broadcast(nSrc))
      .withColumn("global_pos",
        (col("rn") - 1) * col("n_sources") + col("src_idx"))
      .select(col("global_pos"), col("doc_id"), col("source"), col("rn"))
      .orderBy("global_pos")
  }

  private val p09Sql =
    s"""WITH k AS (
       |  SELECT doc_id, source,
       |    md5('mix:' || CAST(doc_id AS VARCHAR)) AS skey
       |  FROM documents),
       |ranked AS (
       |  SELECT doc_id, source,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY skey, doc_id)
       |      AS BIGINT) AS rn
       |  FROM k),
       |picked AS (SELECT * FROM ranked WHERE rn <= $interleaveQuota),
       |idx AS (
       |  SELECT source,
       |    CAST(ROW_NUMBER() OVER (ORDER BY source) AS BIGINT) AS src_idx
       |  FROM (SELECT DISTINCT source FROM documents)),
       |n AS (SELECT COUNT(*) AS n_sources FROM idx)
       |SELECT (p.rn - 1) * n.n_sources + i.src_idx AS global_pos,
       |  p.doc_id, p.source, p.rn
       |FROM picked p JOIN idx i ON p.source = i.source CROSS JOIN n
       |ORDER BY global_pos""".stripMargin

  // ---------------------------------------------------- p10 curriculum
  /** p10: curriculum schedule — order the corpus easy→hard before
    * training. Difficulty is the t15 familiarity score (mean corpus-
    * relative token frequency, exact integer ppm; high = common
    * vocabulary = easy); each source is banded into quartiles with
    * `ntile(4)` ordered by (familiarity DESC, doc_id), so band 1 is
    * the easiest quarter OF EACH SOURCE (per-source banding keeps a
    * hard source from monopolizing late phases). Crossed with the p07
    * split so the schedule never leaks val/test into a training phase.
    * Output: per (band, split) doc/token mass and familiarity range —
    * the table a curriculum sampler consumes directly.
    *
    * Determinism: scores are integer ppm; ntile over a UNIQUE order
    * (score, doc_id) assigns identical bands in Spark and DuckDB
    * (⌈n/4⌉-first semantics are SQL-standard); the split is the p07
    * md5 bucket. No float enters any decision.
    *
    * Scale: scoring is t15's shape (vocabulary joins shuffle, total
    * broadcasts); the banding window partitions by source — the q52/
    * p02 posture: per-source partitions can be wide at 100 TB, and the
    * production hatch is the same two-pass form (exact per-source
    * quartile BOUNDS via order statistics, broadcast back as a range
    * lookup) which this report's semantics are deliberately identical
    * to. Final agg is 12 groups — KBs on the wire. */
  def curriculum(s: SparkSession, dir: String): DataFrame =
    curriculumDf(t(s, dir, "documents"))

  def curriculumDf(docs: DataFrame): DataFrame =
    TextOps.familiarityScored(docs)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("familiarity_ppm").as("fam_ppm"))
      .withColumn("band", ntile(4).over(
        Window.partitionBy(col("source"))
          .orderBy(col("fam_ppm").desc, col("doc_id"))).cast("long"))
      .withColumn("split", splitOf(md5U16 % 100))
      .groupBy(col("band"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("fam_ppm")).as("min_fam_ppm"),
        sum(col("fam_ppm")).as("fs"))
      .select(col("band"), col("split"), col("n_docs"),
        col("total_tokens"), col("min_fam_ppm"),
        expr("fs div n_docs").as("mean_fam_ppm"))
      .orderBy("band", "split")

  private val p10Sql =
    s"""WITH ${TextOps.familiaritySqlCtes},
       |banded AS (
       |  SELECT doc_id, n_tokens, familiarity_ppm AS fam_ppm,
       |    CAST(NTILE(4) OVER (PARTITION BY source
       |      ORDER BY familiarity_ppm DESC, doc_id) AS BIGINT) AS band,
       |    ($md5U16Sql) % 100 AS bucket
       |  FROM scored),
       |sp AS (
       |  SELECT band, n_tokens, fam_ppm, $splitOfSql AS split
       |  FROM banded)
       |SELECT band, split, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  MIN(fam_ppm) AS min_fam_ppm,
       |  CAST(SUM(fam_ppm) // COUNT(*) AS BIGINT) AS mean_fam_ppm
       |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------ p11 water-filling
  /** p11: budget-constrained source caps by water-filling — the mix
    * designer's dual of p03's fixed cap: given a global token budget
    * ([[budgetPct]]% of the corpus), find the per-source cap `c` with
    * Σ min(tokens_s, c) ≈ budget. Sources below the water line keep
    * everything (saturated); sources above it are cut to the common
    * cap — the allocation that maximizes the minimum kept fraction.
    *
    * The fixed [[capRounds]] rounds (g01 discipline) iterate the
    * closed form: cap = (budget − Σ saturated) div |unsaturated|,
    * re-classifying after each round. The water line rises
    * monotonically, and the recurrence reaches its fixed point once a
    * round newly saturates nobody — in at most |distinct masses|
    * rounds in the worst case, and within 2–3 on any realistic mass
    * profile (each round must saturate at least one NEW source to
    * change anything, so 8 rounds cover any chain through 8
    * saturation steps; the spec proves fixed-point convergence on the
    * contract corpus against an exact in-memory recompute). "After R
    * rounds" is a well-defined deterministic relation both engines
    * compute identically (all-integer; the n_unsat=0 guard keeps it
    * total); if a pathological profile needed more rounds, the
    * un-redistributed slack of the last round's new saturants is the
    * only deviation, and alloc ≤ budget always holds.
    *
    * Scale: the ONLY corpus-sized work is the per-source token mass
    * aggregate (map-side partial). Every round then operates on the
    * |sources|-row relation with two one-row broadcast aggregates —
    * the iteration costs KBs regardless of corpus size, which is why
    * it can run as a pre-flight before every mix build. */
  val budgetPct = 90L
  val capRounds = 8

  def budgetCaps(s: SparkSession, dir: String): DataFrame =
    budgetCapsDf(t(s, dir, "documents"))

  def budgetCapsDf(docs: DataFrame): DataFrame = {
    // persist the one corpus-sized stage: every round's stats aggregate
    // AND the next round's relation re-derive from here, so without the
    // persist the token-mass scan re-executes 2×capRounds times
    // (measured 7.2 s → sub-second at sf0.1)
    val m = docs
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("tokens"))
      .persist()
    val tot = m.agg(sum(col("tokens")).as("total"))
      .select(expr(s"total * $budgetPct div 100").as("budget"))
    // each round references its predecessor TWICE (the stats aggregate
    // and the relation itself), so an un-truncated lineage doubles per
    // round — 2^capRounds subtrees re-planning the corpus scan (the
    // g03/d07 inline-doubling disease; measured 25 s at sf0.1).
    // localCheckpoint pins each round's 20-row relation instead
    // (sub-second total); the corpus is only ever scanned once, into m.
    var cur = m.crossJoin(broadcast(tot)).withColumn("sat", lit(false))
      .localCheckpoint()
    for (_ <- 1 to capRounds) {
      val stats = cur.agg(
        sum(when(col("sat"), col("tokens")).otherwise(0L)).as("sat_sum"),
        sum(when(col("sat"), 0L).otherwise(1L)).as("n_unsat"))
      cur = cur.crossJoin(broadcast(stats))
        .withColumn("cap",
          when(col("n_unsat") === 0, lit(Long.MaxValue / 4))
            .otherwise(expr("(budget - sat_sum) div n_unsat")))
        .withColumn("sat", col("tokens") <= col("cap"))
        .select(col("source"), col("tokens"), col("budget"),
          col("cap"), col("sat"))
        .localCheckpoint()
    }
    cur.select(col("source"), col("tokens"), col("cap"),
        least(col("tokens"), col("cap")).as("alloc"),
        when(col("sat"), 1L).otherwise(0L).as("saturated"))
      .orderBy("source")
  }

  private val p11Sql = {
    val bigM = Long.MaxValue / 4
    val rounds = (1 to capRounds).map { r =>
      s"""st$r AS (
         |  SELECT CAST(SUM(CASE WHEN sat THEN tokens ELSE 0 END) AS BIGINT)
         |      AS sat_sum,
         |    CAST(SUM(CASE WHEN sat THEN 0 ELSE 1 END) AS BIGINT) AS n_unsat
         |  FROM r${r - 1}),
         |r$r AS (
         |  SELECT source, tokens, budget, cap, tokens <= cap AS sat FROM (
         |    SELECT source, tokens, budget,
         |      CASE WHEN n_unsat = 0 THEN $bigM
         |           ELSE (budget - sat_sum) // n_unsat END AS cap
         |    FROM r${r - 1} CROSS JOIN st$r))""".stripMargin
    }.mkString(",\n")
    s"""WITH m AS (
       |  SELECT source,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
       |  FROM documents GROUP BY source),
       |tot AS (
       |  SELECT CAST(SUM(tokens) * $budgetPct // 100 AS BIGINT) AS budget
       |  FROM m),
       |r0 AS (
       |  SELECT source, tokens, budget, CAST(0 AS BIGINT) AS cap,
       |    FALSE AS sat
       |  FROM m CROSS JOIN tot),
       |$rounds
       |SELECT source, tokens, cap,
       |  least(tokens, cap) AS alloc,
       |  CAST(CASE WHEN sat THEN 1 ELSE 0 END AS BIGINT) AS saturated
       |FROM r$capRounds ORDER BY source""".stripMargin
  }

  // ------------------------------------------------------------------

  // ------------------------------------------------------------- p12
  /** p12: dedup-aware mix rebalancing — p04's temperature thresholds
    * recomputed over the DEDUP-DEFLATED source masses. Duplication is
    * never uniform across sources (a crawl is 30-60 % duplicate where
    * a books corpus is ~0 %), so a mix designed on raw counts
    * double-weights the most duplicated source exactly in proportion
    * to its redundancy; the fix every production mix applies is:
    * dedup first, weigh what SURVIVES. Per source this emits the raw
    * and surviving (d01 exact-dedup keeper) counts, the deflation in
    * integer ppm, and the p04 threshold computed BOTH ways — the
    * raw-vs-deduped threshold delta IS the bias being corrected.
    *
    * Keeper attribution follows d01 exactly (min doc_id per content
    * hash, across sources — a text shared by two sources keeps one
    * copy globally, in the keeper's source).
    *
    * Scale: one content-hash agg over the corpus (40-byte rows — the
    * e01/e02 dedup-shuffle shape), then everything is |sources|-sized;
    * thresholds are the same broadcast scalar chain as p04. */
  def dedupAwareMix(s: SparkSession, dir: String): DataFrame =
    dedupAwareMixDf(t(s, dir, "documents"))

  def dedupAwareMixDf(documents: DataFrame): DataFrame = {
    val docs = documents.select(col("source"), col("doc_id"), col("text"))
    val keepers = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
    val kept = docs.join(keepers,
        col("doc_id") === col("keep_id"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    val raw = docs.groupBy(col("source")).agg(count(lit(1)).as("n_raw"))
    val base = raw.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_raw"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
    def thr(nCol: String, mxCol: String): Column =
      floor(lit(mixScale.toDouble) * (sqrt(col(nCol)) / sqrt(col(mxCol))))
    val mx = base.agg(max(col("n_raw")).as("mx_raw"),
      max(col("n_kept")).as("mx_kept"))
    base.crossJoin(broadcast(mx))
      .select(col("source"), col("n_raw"), col("n_kept"),
        expr("CAST(n_kept AS DECIMAL(38,0)) * 1000000 div n_raw")
          .as("survival_ppm"),
        thr("n_raw", "mx_raw").cast("long").as("thr_raw"),
        thr("n_kept", "mx_kept").cast("long").as("thr_dedup"))
      .orderBy("source")
  }

  private val p12Sql =
    s"""WITH docs AS MATERIALIZED (
       |  SELECT source, doc_id, md5(text) AS h FROM documents),
       |keepers AS (
       |  SELECT h, MIN(doc_id) AS keep_id FROM docs GROUP BY h),
       |kept AS (
       |  SELECT d.source, COUNT(*) AS n_kept
       |  FROM docs d JOIN keepers k ON d.doc_id = k.keep_id
       |  GROUP BY d.source),
       |base AS MATERIALIZED (
       |  SELECT d.source, COUNT(*) AS n_raw,
       |    COALESCE(MAX(k.n_kept), 0) AS n_kept
       |  FROM docs d LEFT JOIN kept k ON d.source = k.source
       |  GROUP BY d.source),
       |mx AS (SELECT MAX(n_raw) AS mx_raw, MAX(n_kept) AS mx_kept
       |       FROM base)
       |SELECT source, CAST(n_raw AS BIGINT) AS n_raw,
       |  CAST(n_kept AS BIGINT) AS n_kept,
       |  CAST(CAST(n_kept AS HUGEINT) * 1000000 // n_raw AS BIGINT)
       |    AS survival_ppm,
       |  CAST(FLOOR(65536.0 * (sqrt(n_raw) / sqrt(mx_raw))) AS BIGINT)
       |    AS thr_raw,
       |  CAST(FLOOR(65536.0 * (sqrt(n_kept) / sqrt(mx_kept))) AS BIGINT)
       |    AS thr_dedup
       |FROM base CROSS JOIN mx ORDER BY source""".stripMargin

  // ------------------------------------------------------------- p13
  /** p13: variance-weighted sample allocation with largest-remainder
    * rounding — the survey-design step before a QC sample is drawn:
    * split a fixed audit budget of [[p13Budget]] draws across sources
    * proportional to each stratum's total variance N_h·Var(n_chars)
    * (high-variance strata need more draws for the same estimator
    * error — the optimal-allocation idea, with the weight kept on the
    * exact-integer side). p02 stratifies by fixed rate; this computes
    * the RATES. The integer allocation is exact: base_h = B·w_h div W,
    * then the B − Σ base leftover goes to the largest remainders
    * (deterministic tie-break on source) — so Σ alloc = B exactly,
    * the invariant naive per-stratum rounding violates.
    *
    * Exactness: weights come from the q65 moment discipline
    * (N·Σx² − (Σx)² on DECIMAL(38,0) — a BIGINT x² sum wraps on big
    * strata), floored to w_h = max(vx div N_h, 1) so zero-variance
    * strata keep a minimal claim and W > 0 always. Remainders are
    * compared as exact decimals (B·w − base·W). A float-share
    * version of this query would re-open the s05 rounding-boundary
    * class on every remainder tie.
    *
    * Scale: ONE corpus-pass moment aggregate (map-side partial);
    * everything after is |sources|-sized with broadcast one-row
    * totals; the ranking window is over the strata relation, never
    * rows (the q47/a05 aggregate-sized-window precedent). */
  val p13Budget = 10000L

  def varAllocation(s: SparkSession, dir: String): DataFrame =
    varAllocationDf(t(s, dir, "documents"))

  def varAllocationDf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persist the one corpus-sized stage (p11's lesson): the totals
    // aggregate, the allocation relation and the leftover aggregate
    // all re-derive from here — unpersisted, the documents scan
    // re-executes 5× (plan-pinned to exactly one scan)
    val m = docs
      .select(col("source"), col("n_chars").cast("long").as("x"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("sx"),
        sum((col("x").cast("decimal(38,0)")) * col("x")).as("sxx"))
      .select(col("source"), col("n_docs"),
        expr("greatest((CAST(n_docs AS DECIMAL(38,0)) * sxx - " +
          "CAST(sx AS DECIMAL(38,0)) * sx) div n_docs, 1L)").as("w"))
      .persist()
    val tot = m.agg(sum(col("w")).as("wsum"))
    val b = m.crossJoin(broadcast(tot))
      .withColumn("base",
        expr(s"CAST($p13Budget AS DECIMAL(38,0)) * w div wsum"))
      .withColumn("rem",
        expr(s"CAST($p13Budget AS DECIMAL(38,0)) * w - " +
          "CAST(base AS DECIMAL(38,0)) * wsum"))
    val lo = b.agg((lit(p13Budget) - sum(col("base"))).as("leftover"))
    b.crossJoin(broadcast(lo))
      .withColumn("rn", row_number()
        .over(Window.orderBy(col("rem").desc, col("source"))).cast("long"))
      .select(col("source"), col("n_docs"),
        expr("CAST(w div n_docs AS BIGINT)").as("var_est"),
        col("base"),
        expr("CASE WHEN rn <= leftover THEN base + 1 ELSE base END")
          .as("alloc"))
      .orderBy("source")
  }

  private val p13Sql =
    s"""WITH m AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_chars) AS BIGINT) AS sx,
       |    CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS sxx
       |  FROM documents GROUP BY source),
       |wt AS (
       |  SELECT source, n_docs,
       |    greatest((CAST(n_docs AS HUGEINT) * sxx
       |      - CAST(sx AS HUGEINT) * sx) // n_docs, 1) AS w
       |  FROM m),
       |tot AS (SELECT CAST(SUM(w) AS HUGEINT) AS wsum FROM wt),
       |b AS (
       |  SELECT source, n_docs, w, wsum,
       |    CAST($p13Budget AS HUGEINT) * w // wsum AS base,
       |    CAST($p13Budget AS HUGEINT) * w
       |      - (CAST($p13Budget AS HUGEINT) * w // wsum) * wsum AS rem
       |  FROM wt CROSS JOIN tot),
       |lo AS (
       |  SELECT $p13Budget - CAST(SUM(base) AS BIGINT) AS leftover FROM b),
       |r AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source)
       |    AS BIGINT) AS rn
       |  FROM b CROSS JOIN lo)
       |SELECT source, n_docs, CAST(w // n_docs AS BIGINT) AS var_est,
       |  CAST(base AS BIGINT) AS base,
       |  CAST(CASE WHEN rn <= leftover THEN base + 1 ELSE base END
       |    AS BIGINT) AS alloc
       |FROM r ORDER BY source""".stripMargin

  // ------------------------------------------------------------- p14
  /** Max total epochs any source may repeat (the data-constrained-
    * scaling observation: past ~4 passes over the same data, marginal
    * value collapses) and the budget multiple that puts the schedule
    * in the data-constrained regime (budget = 3× the unique mass). */
  val epochCap = 4L
  val epochBudgetX = 3L
  val epochRounds = 4

  def epochSchedule(s: SparkSession, dir: String): DataFrame =
    epochScheduleDf(t(s, dir, "documents"))

  /** p14: repeat-epoch schedule for the data-constrained regime —
    * p11's dual. p11 answers "budget < data: what do we CUT?"; this
    * answers "budget > data: what do we REPEAT?" (Muennighoff et al.,
    * "Scaling Data-Constrained Language Models"): every source's
    * unique (d01-keeper) tokens get one fresh epoch, and the
    * remaining budget buys repeat epochs proportional to each
    * source's GATE-PASSING token mass — quality earns repetition —
    * capped at [[epochCap]] total epochs. The cap binds sources with
    * high gate-pass ratios first, so the fill genuinely water-falls
    * (a mass-proportional split would saturate all-or-nothing).
    *
    * Arithmetic: the proportional share widens to DECIMAL/HUGEINT
    * before the multiply (the q59 rule — extra × gate mass overflows
    * BIGINT at warehouse scale); epochs emit in exact milli-epochs.
    * Fixed [[epochRounds]] redistribution rounds (p11 discipline,
    * saturation is monotone); Σ alloc ≤ budget always holds, with
    * un-redistributed slack only if a round chain longer than
    * [[epochRounds]] were ever needed.
    *
    * Scale: one corpus pass (gate + keeper hash agg, persisted);
    * every round is the |sources|-row relation + one broadcast
    * aggregate — KBs regardless of corpus size. */
  def epochScheduleDf(documents: DataFrame): DataFrame = {
    val scored = graft.queries.TextOps.gateScored(
      documents.select(col("doc_id"), col("text"), col("source")))
    val keepers = documents
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
    val m = scored.join(keepers,
        col("doc_id") === col("keep_id"), "left_semi")
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("u"),
        sum(when(col("reason") === "ok", col("n_tokens")).otherwise(0L))
          .as("g"))
      .persist()
    val tot = m.agg(sum(col("u")).as("utot"))
      .select(expr(s"utot * $epochBudgetX").as("budget"), col("utot"))
    var cur = m.crossJoin(broadcast(tot))
      .withColumn("x", col("budget") - col("utot"))
      .withColumn("sat", lit(false))
      .withColumn("extra", lit(0L))
      .select("source", "u", "g", "x", "sat", "extra")
      .localCheckpoint()
    for (_ <- 1 to epochRounds) {
      val stats = cur.agg(
        sum(when(col("sat"), col("extra")).otherwise(0L)).as("sat_extra"),
        sum(when(col("sat"), 0L).otherwise(col("g"))).as("g_unsat"))
      cur = cur.crossJoin(broadcast(stats))
        .withColumn("share",
          when(col("sat"), col("extra"))
            .otherwise(when(col("g_unsat") === 0, lit(0L))
              .otherwise(expr(
                "CAST(CAST(x - sat_extra AS DECIMAL(38,0)) * g" +
                  " div g_unsat AS BIGINT)"))))
        .withColumn("sat2",
          col("share") >= col("u") * lit(epochCap - 1))
        .select(col("source"), col("u"), col("g"), col("x"),
          when(col("sat2"), col("u") * lit(epochCap - 1))
            .otherwise(col("share")).as("extra"),
          col("sat2").as("sat"))
        .localCheckpoint()
    }
    cur.select(col("source"), col("u").as("unique_tokens"),
        col("g").as("gated_tokens"),
        (col("u") + col("extra")).as("alloc_tokens"),
        expr("(u + extra) * 1000 div u").as("epochs_milli"),
        when(col("sat"), 1L).otherwise(0L).as("capped"))
      .orderBy("source")
  }

  private val p14Sql = {
    val cap = epochCap - 1
    val rounds = (1 to epochRounds).map { r =>
      s"""es$r AS (
         |  SELECT CAST(SUM(CASE WHEN sat THEN extra ELSE 0 END) AS BIGINT)
         |      AS sat_extra,
         |    CAST(SUM(CASE WHEN sat THEN 0 ELSE g END) AS BIGINT) AS g_unsat
         |  FROM e${r - 1}),
         |e$r AS (
         |  SELECT source, u, g, x,
         |    CASE WHEN sat2 THEN u * $cap ELSE share END AS extra,
         |    sat2 AS sat FROM (
         |    SELECT source, u, g, x, share, share >= u * $cap AS sat2 FROM (
         |      SELECT source, u, g, x,
         |        CASE WHEN sat THEN extra
         |             WHEN g_unsat = 0 THEN CAST(0 AS BIGINT)
         |             ELSE CAST(CAST(x - sat_extra AS HUGEINT) * g
         |               // g_unsat AS BIGINT) END AS share
         |      FROM e${r - 1} CROSS JOIN es$r)))""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (
       |  SELECT doc_id, source, text, string_split(text, ' ') AS toks
       |  FROM documents),
       |st AS (
       |  SELECT doc_id, source, md5(text) AS h,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       |    CAST(len(list_filter(toks, t -> t IN (${graft.queries.TextOps.stopList})))
       |      AS BIGINT) AS n_stop
       |  FROM d),
       |k AS (SELECT h, MIN(doc_id) AS keep_id FROM st GROUP BY h),
       |m AS (
       |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS u,
       |    CAST(SUM(CASE WHEN NOT (n_tokens < 5 OR n_tokens > 500
       |      OR n_distinct * 2 < n_tokens OR n_stop = 0)
       |      THEN n_tokens ELSE 0 END) AS BIGINT) AS g
       |  FROM st JOIN k ON st.doc_id = k.keep_id GROUP BY source),
       |tot AS (
       |  SELECT CAST(SUM(u) * $epochBudgetX AS BIGINT) AS budget,
       |    CAST(SUM(u) AS BIGINT) AS utot FROM m),
       |e0 AS (
       |  SELECT source, u, g, budget - utot AS x, FALSE AS sat,
       |    CAST(0 AS BIGINT) AS extra
       |  FROM m CROSS JOIN tot),
       |$rounds
       |SELECT source, u AS unique_tokens, g AS gated_tokens,
       |  CAST(u + extra AS BIGINT) AS alloc_tokens,
       |  CAST((u + extra) * 1000 // u AS BIGINT) AS epochs_milli,
       |  CAST(CASE WHEN sat THEN 1 ELSE 0 END AS BIGINT) AS capped
       |FROM e$epochRounds ORDER BY source""".stripMargin
  }

  // ------------------------------------------ p15 decontaminated split
  /** p15: leak-proof dataset split — p07's deterministic hash split
    * composed with d10's contamination detection, closing the gap
    * between them: p07 assigns docs to train/val/test independently of
    * CONTENT, so a train doc that shares a rare ≥3-token shingle with
    * a val/test doc leaks eval answers into training. Every such train
    * doc moves to a `quarantine` bucket (excluded from training AND
    * from eval — reassigning it to eval would bias the benchmark
    * toward duplicated content). Output: per (final_split, source)
    * doc counts and char mass — p07's manifest, leak-proofed.
    *
    * Reuse discipline: the split rule IS [[splitOf]]/[[md5U16]] (p07's,
    * shared with p10) and the shingle rule IS d10's (df-pruned at
    * [[graft.queries.Dedup.maxShingleDf]] — boilerplate shingles are
    * vocabulary, not contamination) — neither can drift from the ops
    * they compose.
    *
    * Scale shape: d10's exactly — the eval shingle set is eval-sized
    * and BROADCASTS; detection is a map-side semi join over the corpus
    * shingle stream; the final rollup is splits × sources rows. */
  def decontaminatedSplit(s: SparkSession, dir: String): DataFrame =
    decontaminatedSplitDf(t(s, dir, "documents"))

  def decontaminatedSplitDf(documents: DataFrame): DataFrame = {
    val withSplit = documents
      .withColumn("bucket", md5U16 % 100)
      .withColumn("split", splitOf(col("bucket")))
    val shAll = documents
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(toks) - 2, 1)),
           i -> concat_ws(' ', slice(toks, i, 3)))""")).as("sh"))
      .distinct()
    val keep = shAll.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= graft.queries.Dedup.maxShingleDf)
      .select(col("sh"))
    val sh = shAll.join(keep, "sh")
      .withColumn("bucket", md5U16 % 100)
      .withColumn("split", splitOf(col("bucket")))
    val evalSh = sh.filter(col("split") =!= "train")
      .select(col("sh")).distinct()
    val leaky = sh.filter(col("split") === "train")
      .join(broadcast(evalSh), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("leak", lit(1L))
    withSplit.join(leaky, Seq("doc_id"), "left")
      .withColumn("final_split",
        when(col("split") === "train" && col("leak").isNotNull,
          "quarantine").otherwise(col("split")))
      .groupBy(col("final_split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("final_split", "source")
  }

  private val p15Sql =
    s"""WITH d AS (
       |  SELECT doc_id, source, n_chars, string_split(text, ' ') AS toks,
       |    ($md5U16Sql) % 100 AS bucket
       |  FROM documents),
       |ds AS MATERIALIZED (
       |  SELECT doc_id, source, n_chars, $splitOfSql AS split FROM d),
       |sh_all AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(len(toks) - 2, 1)),
       |    i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
       |  FROM d),
       |keep AS (SELECT sh FROM sh_all GROUP BY sh
       |         HAVING COUNT(*) <= ${graft.queries.Dedup.maxShingleDf}),
       |sh AS MATERIALIZED (
       |  SELECT sh_all.doc_id, sh_all.sh, ds.split
       |  FROM sh_all JOIN keep USING (sh) JOIN ds USING (doc_id)),
       |eval_sh AS (SELECT DISTINCT sh FROM sh WHERE split <> 'train'),
       |leaky AS (
       |  SELECT DISTINCT doc_id FROM sh
       |  WHERE split = 'train' AND sh IN (SELECT sh FROM eval_sh))
       |SELECT CASE WHEN ds.split = 'train'
       |    AND ds.doc_id IN (SELECT doc_id FROM leaky)
       |  THEN 'quarantine' ELSE ds.split END AS final_split,
       |  source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM ds GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p15_decontaminated_split" -> decontaminatedSplit _,
    "p14_epoch_schedule"    -> epochSchedule _,
    "p13_var_allocation"    -> varAllocation _,
    "p12_dedup_aware_mix"   -> dedupAwareMix _,
    "p11_budget_caps"       -> budgetCaps _,
    "p10_curriculum"        -> curriculum _,
    "p08_seeded_shuffle"    -> seededShuffle _,
    "p09_interleave_mix"    -> interleaveMix _,
    "p01_hash_sample"       -> hashSample _,
    "p02_stratified_sample" -> stratifiedSample _,
    "p03_source_cap"        -> sourceCapReport _,
    "p04_temperature_mix"   -> temperatureMix _,
    "p05_training_manifest" -> trainingManifest _,
    "p06_sequence_pack"     -> sequencePack _,
    "p07_dataset_split"     -> datasetSplit _)

  val oracle: Map[String, String] = Map(
    "p15_decontaminated_split" -> p15Sql,
    "p14_epoch_schedule"    -> p14Sql,
    "p13_var_allocation"    -> p13Sql,
    "p12_dedup_aware_mix"   -> p12Sql,
    "p11_budget_caps"       -> p11Sql,
    "p10_curriculum"        -> p10Sql,
    "p08_seeded_shuffle"    -> p08Sql,
    "p09_interleave_mix"    -> p09Sql,
    "p01_hash_sample"       -> p01Sql,
    "p02_stratified_sample" -> p02Sql,
    "p03_source_cap"        -> p03Sql,
    "p04_temperature_mix"   -> p04Sql,
    "p05_training_manifest" -> p05Sql,
    "p06_sequence_pack"     -> p06Sql,
    "p07_dataset_split"     -> p07Sql)
}
