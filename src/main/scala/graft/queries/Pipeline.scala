package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** End-to-end corpus build — the whole training-data pipeline as ONE
  * declarative query, proving the operator families compose inside a
  * single Catalyst plan instead of via intermediate materializations.
  *
  * e01 = quality gate (t08 rules) → exact dedup (d01 keeper rule) →
  * seeded shard assignment (p08 key) → per-shard token manifest
  * (p06's budget view). The reference has no pipeline surface — its
  * closest analogue is chaining maple/juice jobs through SDFS files
  * (`MapleJuice.cpp:199-224`); here the chain is one optimizer-visible
  * plan, so column pruning drops `text` the moment the content hash is
  * computed and the gate filter pushes into the scan.
  *
  * Scale shape, stage by stage:
  *  - gate: map-side projection + filter, no shuffle;
  *  - dedup: one shuffle keyed on md5(text) carrying (hash, doc_id) —
  *    32 B + 8 B per doc, never the payload; keeper join is id-keyed;
  *  - sharding: map-side md5;
  *  - manifest: 256-group partial-agged hash agg — KBs on the wire.
  * The only corpus-sized movement in the whole build is the slim dedup
  * shuffle; everything else is bounded by shard/source cardinality.
  */
object Pipeline {

  def corpusBuild(s: SparkSession, dir: String): DataFrame =
    corpusBuildDf(t(s, dir, "documents"))

  /** The p08 seeded shard key — ONE derivation shared by every
    * pipeline stage that shards (e01's manifest, e02's fold). */
  private def withShard(df: DataFrame): DataFrame =
    df
      .withColumn("skey", md5(concat(
        lit(Sampling.shuffleSeed + ":"), col("doc_id").cast("string"))))
      .withColumn("shard",
        conv(substring(col("skey"), 1, Sampling.shardHexChars), 16, 10)
          .cast("long"))

  def corpusBuildDf(documents: DataFrame): DataFrame = {
    val ok = TextOps.gateScored(documents)
      .filter(col("reason") === "ok")
      .select(col("doc_id"), col("text"), col("source"), col("n_tokens"))
    // d01 keeper rule: min doc_id per content hash survives
    val keepers = ok
      .select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val kept = ok.join(keepers, "doc_id")
    withShard(kept)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("shard")
  }

  /** The shard expression over a `skey` column — one SQL spelling. */
  private lazy val shardSqlExpr: String =
    OracleDsl.hornerHex("skey", Sampling.shardHexChars)

  /** The t08 gate as d/st/ok CTEs — ONE spelling shared by the e01
    * and e02 twins (a drifted copy would silently desync the gates). */
  private val gateOkCtes =
    s"""d AS (
       |  SELECT doc_id, text, source, string_split(text, ' ') AS toks
       |  FROM documents),
       |st AS (
       |  SELECT doc_id, text, source,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       |    CAST(len(list_filter(toks, t -> t IN (${TextOps.stopList})))
       |      AS BIGINT) AS n_stop
       |  FROM d),
       |ok AS (
       |  SELECT doc_id, text, source, n_tokens FROM st
       |  WHERE NOT (n_tokens < 5 OR n_tokens > 500
       |    OR n_distinct * 2 < n_tokens OR n_stop = 0))""".stripMargin

  /** DuckDB twin: the t08 gate rules, d01 keeper rule, and p08 shard
    * key spelled identically. */
  private val corpusBuildSql =
    s"""WITH $gateOkCtes,
       |keepers AS (
       |  SELECT MIN(doc_id) AS doc_id FROM ok GROUP BY md5(text)),
       |kept AS (
       |  SELECT o.doc_id, o.source, o.n_tokens,
       |    md5('${Sampling.shuffleSeed}:' || CAST(o.doc_id AS VARCHAR)) AS skey
       |  FROM ok o JOIN keepers k ON o.doc_id = k.doc_id)
       |SELECT CAST($shardSqlExpr AS BIGINT) AS shard,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
       |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- e02
  /** Incremental corpus REFRESH — e01's steady state: a new document
    * batch (the top fifth of the id space; base ids all precede delta
    * ids, so the d01 min-id keeper rule makes incremental == rebuild
    * provably) is gated, deduplicated AGAINST THE BASE INDEX, and
    * folded into the shard manifests — the base corpus text is never
    * re-read for content, only its 32 B/doc hash index and its
    * |shards|-sized manifest are touched (both persisted artifacts in
    * production).
    *
    * The base-dedup probe composes a08's two-tier shape: a
    * [[graft.functions.PortableBloom]] of base hashes — SIZED BY THE
    * INDEX CARDINALITY ([[graft.functions.PortableBloom.bloomParamsFor]],
    * r9; the fixed 4,096-bit filter was 97 %-loaded / fpp ≈ 0.89 at
    * sf0.1's ~3,600-hash index, so every delta doc used to reach the
    * exact join and the shortcut tier was inert) — broadcasts and
    * rejects definite-new docs MAP-SIDE (a Bloom has no false
    * negatives, so a miss is proof of novelty); at the sized
    * geometry's ≤ ~2,400 ppm fpp only the true-dupe rows plus a ppm-
    * level residue of a mostly-novel batch reach the exact anti-join
    * against the index. The count() that sizes it runs on the
    * persisted index (the small, already-materialized side). Batch-
    * internal dupes then collapse by the same min-id rule, and the
    * manifest fold is the q55 state merge (counts/sums over a
    * full-outer shard join).
    *
    * The ORACLE rebuilds from scratch (e01's chain over base and over
    * everything, added = difference) — a pass proves the incremental
    * path is EXACTLY the rebuild, Bloom shortcut and all. */
  def corpusRefresh(s: SparkSession, dir: String): DataFrame =
    corpusRefreshDf(t(s, dir, "documents"))

  /** Per-shard manifest of a kept-doc relation (doc_id, n_tokens). */
  private def shardManifest(kept: DataFrame): DataFrame =
    withShard(kept)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  def corpusRefreshDf(documents: DataFrame): DataFrame = {
    import graft.functions.PortableBloom
    val cut = documents.agg(expr("max(doc_id) * 4 div 5").as("cutoff"))
    val split = documents.crossJoin(broadcast(cut))
    def gated(part: DataFrame) =
      TextOps.gateScored(part).filter(col("reason") === "ok")
        .select(col("doc_id"), col("n_tokens"), md5(col("text")).as("h"))
    // persist the gated base: (doc_id, n_tokens, h) = ~48 B/doc — it
    // feeds the index, the Bloom, the keepers AND the manifest; left
    // unpersisted the plan re-scans and re-gates the base corpus once
    // per consumer (the a10 leaf-persist lesson). Caches are
    // caller-owned (the harness clearCaches between contract runs;
    // a long-lived caller looping refreshes should clearCache or
    // unpersist after materializing — the repo-wide persist contract
    // for query-internal caches)
    val okBase = gated(split.filter(col("doc_id") < col("cutoff"))
      .drop("cutoff")).persist()
    val okDelta = gated(split.filter(col("doc_id") >= col("cutoff"))
      .drop("cutoff"))
    // persisted-in-production artifacts: hash index + Bloom of it,
    // sized by the index cardinality (bloomParamsFor — the count runs
    // on the persisted index, so it's one cheap job over the small side)
    val baseIndex = okBase.select(col("h")).distinct().persist()
    val (bBits, bDepth) = PortableBloom.bloomParamsFor(baseIndex.count())
    val baseBloom = baseIndex.agg(
      PortableBloom.portableBloom(col("h"), bBits, bDepth).as("sk"))
    // two-tier novelty check: map-side Bloom, exact join on the residue
    val flagged = okDelta.crossJoin(broadcast(baseBloom))
      .withColumn("maybe",
        PortableBloom.hit(col("sk"), col("h"), bBits, bDepth))
      .drop("sk")
    val novel = flagged.filter(!col("maybe")).drop("maybe")
      .unionByName(flagged.filter(col("maybe")).drop("maybe")
        .join(baseIndex, Seq("h"), "left_anti"))
    // batch-internal dedup (d01 keeper rule), then manifest the batch
    val keepers = novel.groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val addM = shardManifest(novel.join(keepers, "doc_id"))
    // base manifest (the stored one) + state merge = refreshed view
    val baseKeepers = okBase.groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val baseM = shardManifest(okBase.join(baseKeepers, "doc_id"))
    baseM.select(col("shard"), col("n_docs").as("bd"),
        col("n_tokens").as("bt"))
      .join(addM.select(col("shard"), col("n_docs").as("ad"),
        col("n_tokens").as("at")), Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("bd"), lit(0L)).as("base_docs"),
        coalesce(col("ad"), lit(0L)).as("add_docs"),
        (coalesce(col("bd"), lit(0L)) + coalesce(col("ad"), lit(0L)))
          .as("new_docs"),
        coalesce(col("bt"), lit(0L)).as("base_tokens"),
        coalesce(col("at"), lit(0L)).as("add_tokens"),
        (coalesce(col("bt"), lit(0L)) + coalesce(col("at"), lit(0L)))
          .as("new_tokens"))
      .orderBy("shard")
  }

  /** DuckDB twin: full REBUILD via the e01 chain over base and over
    * everything; added = rebuild − base. Matching the Spark side's
    * incremental fold proves incremental == rebuild. */
  private val corpusRefreshSql = {
    def manifest(okRel: String, name: String) =
      s"""keep_$name AS (
         |  SELECT MIN(doc_id) AS doc_id FROM $okRel GROUP BY md5(text)),
         |m_$name AS (
         |  SELECT CAST($shardSqlExpr AS BIGINT) AS shard,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |  FROM (SELECT o.doc_id, o.n_tokens,
         |          md5('${Sampling.shuffleSeed}:' ||
         |            CAST(o.doc_id AS VARCHAR)) AS skey
         |        FROM $okRel o JOIN keep_$name k ON o.doc_id = k.doc_id)
         |  GROUP BY 1)""".stripMargin
    s"""WITH cut AS (SELECT MAX(doc_id) * 4 // 5 AS cutoff FROM documents),
       |$gateOkCtes,
       |okb AS (SELECT ok.* FROM ok, cut WHERE doc_id < cutoff),
       |${manifest("okb", "b")},
       |${manifest("ok", "f")}
       |SELECT f.shard,
       |  COALESCE(b.n_docs, 0) AS base_docs,
       |  f.n_docs - COALESCE(b.n_docs, 0) AS add_docs,
       |  f.n_docs AS new_docs,
       |  COALESCE(b.n_tokens, 0) AS base_tokens,
       |  f.n_tokens - COALESCE(b.n_tokens, 0) AS add_tokens,
       |  f.n_tokens AS new_tokens
       |FROM m_f f LEFT JOIN m_b b USING (shard)
       |ORDER BY shard""".stripMargin
  }


  // ------------------------------------------------------------- e03
  /** e03: snapshot diff / reconciliation report — the audit companion
    * to e02's refresh (Iceberg/Delta `snapshot diff`, data-recon
    * between a vendor drop and the loaded table): given two corpus
    * snapshots, classify every doc as added / removed / changed /
    * unchanged by CONTENT HASH (never by payload compare) and report
    * per (source, status) counts and character mass. The two
    * snapshots are deterministic derivations of the documents table
    * (old = ids outside the %10=7 slice; new = ids outside the %17=3
    * slice, with the %13=0 slice content-edited) so both engines
    * diff the identical pair without extra fixtures.
    *
    * Scale: the diff moves (doc_id, source, md5, n_chars) rows — the
    * e01/e02 40-byte dedup-shuffle shape, one full-outer join on the
    * id, payloads never shuffled; the report is |sources × 4| rows. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame =
    snapshotDiffDf(t(s, dir, "documents"))

  def snapshotDiffDf(documents: DataFrame): DataFrame = {
    val slim = documents.select(col("doc_id"), col("source"),
      col("text"), col("n_chars"))
    val old = slim.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h_old"),
        col("n_chars").as("chars_old"))
    val neu = slim.filter(col("doc_id") % 17 =!= 3)
      .withColumn("text2",
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("source").as("source_n"),
        md5(col("text2")).as("h_new"),
        (col("n_chars") + when(col("doc_id") % 13 === 0, 5L)
          .otherwise(0L)).as("chars_new"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("source"), col("source_n")).as("source"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("chars_new"), col("chars_old")).as("chars"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("chars")).as("n_chars"))
      .orderBy("source", "status")
  }

  private val snapshotDiffSql =
    """WITH old AS (
      |  SELECT doc_id, source, md5(text) AS h_old, n_chars AS chars_old
      |  FROM documents WHERE doc_id % 10 <> 7),
      |neu AS (
      |  SELECT doc_id, source AS source_n,
      |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' rev2'
      |             ELSE text END) AS h_new,
      |    n_chars + CASE WHEN doc_id % 13 = 0 THEN 5 ELSE 0 END
      |      AS chars_new
      |  FROM documents WHERE doc_id % 17 <> 3),
      |d AS (
      |  SELECT COALESCE(old.source, neu.source_n) AS source,
      |    CASE WHEN h_old IS NULL THEN 'added'
      |         WHEN h_new IS NULL THEN 'removed'
      |         WHEN h_old <> h_new THEN 'changed'
      |         ELSE 'unchanged' END AS status,
      |    COALESCE(chars_new, chars_old) AS chars
      |  FROM old FULL OUTER JOIN neu USING (doc_id))
      |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(chars) AS BIGINT) AS n_chars
      |FROM d GROUP BY 1, 2 ORDER BY source, status""".stripMargin

  // ------------------------------------------------------------- e04
  /** e04: per-source corpus report card — the daily governance
    * dashboard a training-data org reads before shipping a corpus:
    * for every source, document volume, t08-gate pass rate, exact-
    * duplicate rate (d01's content-hash definition), and token mass /
    * mean length, each in exact floored integer units (ppm / milli).
    * The gate spelling is [[TextOps.gateScored]] — the SAME rule
    * chain e01/e02 filter on, so the report's pass rate and the
    * build's kept set can never drift apart.
    *
    * Scale shape: ONE pass over the corpus projecting
    * (source, md5(text), n_tokens, ok) — the e01 40-byte discipline,
    * payloads never shuffle; the distinct-hash count partial-
    * aggregates on (source, hash) before the per-source rollup, and
    * the report is |sources| rows. */
  def corpusReport(s: SparkSession, dir: String): DataFrame =
    corpusReportDf(t(s, dir, "documents"))

  def corpusReportDf(documents: DataFrame): DataFrame =
    TextOps.gateScored(documents)
      .select(col("source"), md5(col("text")).as("h"), col("n_tokens"),
        when(col("reason") === "ok", 1L).otherwise(0L).as("ok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ok")).as("ok_docs"),
        countDistinct(col("h")).as("n_unique"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(col("source"), col("n_docs"), col("ok_docs"),
        expr("ok_docs * 1000000 div n_docs").as("gate_pass_ppm"),
        col("n_unique"),
        expr("(n_docs - n_unique) * 1000000 div n_docs").as("dup_ppm"),
        col("total_tokens"),
        expr("total_tokens * 1000 div n_docs").as("mean_tokens_milli"))
      .orderBy("source")

  /** DuckDB twin: the shared t08 gate rules spelled identically over
    * ALL docs (the report scores the whole corpus, not just the kept
    * set), d01's md5 dup definition, floored integer rates. */
  private val corpusReportSql =
    s"""WITH d AS (
       |  SELECT source, text, string_split(text, ' ') AS toks
       |  FROM documents),
       |st AS (
       |  SELECT source, md5(text) AS h,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       |    CAST(len(list_filter(toks, t -> t IN (${TextOps.stopList})))
       |      AS BIGINT) AS n_stop
       |  FROM d),
       |r AS (
       |  SELECT source, h, n_tokens,
       |    CASE WHEN NOT (n_tokens < 5 OR n_tokens > 500
       |      OR n_distinct * 2 < n_tokens OR n_stop = 0)
       |    THEN 1 ELSE 0 END AS ok
       |  FROM st),
       |g AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(ok) AS BIGINT) AS ok_docs,
       |    CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique,
       |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |  FROM r GROUP BY source)
       |SELECT source, n_docs, ok_docs,
       |  CAST(ok_docs * 1000000 // n_docs AS BIGINT) AS gate_pass_ppm,
       |  n_unique,
       |  CAST((n_docs - n_unique) * 1000000 // n_docs AS BIGINT) AS dup_ppm,
       |  total_tokens,
       |  CAST(total_tokens * 1000 // n_docs AS BIGINT) AS mean_tokens_milli
       |FROM g ORDER BY source""".stripMargin

  // ------------------------------------------------------------------
  // ------------------------------------------------------------- e05
  /** e05: source-concentration audit — per language, the exact Gini
    * coefficient of character mass across sources plus the dominant
    * source and its share. The diversity screen next to e04's
    * per-source report: e04 says how good each source is, e05 says
    * whether a language's data is all ONE source (a training corpus
    * with gini → 1 inherits that source's biases no matter how many
    * sources are nominally present; p04/p12's mixing math assumes
    * there is something to mix).
    *
    * Exactness: with per-source masses x₁ ≤ … ≤ xₙ (rank r by
    * (mass, source) — ties carry equal x so the sum is tie-invariant),
    * Σᵢ Σⱼ |xᵢ−xⱼ| = 2·(2A − (n+1)·S) where A = Σ r·xᵣ and S = Σ x,
    * so gini = (2A − (n+1)S)/(n·S) — numerator and denominator are
    * exact integers, emitted in floored ppm; the numerator is
    * non-negative by the rearrangement inequality, so `div`/`//`
    * agree. A is widened to DECIMAL(38,0)/HUGEINT: r·x ≈ n²·mass
    * overflows BIGINT past ~10³ sources × 10¹³ chars (the q65 rule).
    * The dominant source is `max(struct(mass, source))` — an exact
    * total order, no window.
    *
    * Scale shape: ONE corpus pass (partial-agged (lang, source) mass
    * histogram — n_chars is a column, text never moves); the rank
    * window and both rollups run on the languages × sources relation,
    * which a 100 TB corpus does not grow. */
  def sourceConcentration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = t(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n_chars")).as("mass"))
    h.withColumn("r", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("mass"), col("source"))).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sources"),
        sum(col("mass")).as("total_chars"),
        sum(expr("CAST(mass AS DECIMAL(38,0)) * r")).as("a"),
        max(struct(col("mass"), col("source"))).as("top"))
      .select(col("lang"), col("n_sources"), col("total_chars"),
        expr("""CAST((2 * a - (n_sources + 1) * CAST(total_chars AS
                DECIMAL(38,0))) * 1000000
                div (n_sources * CAST(total_chars AS DECIMAL(38,0)))
                AS BIGINT)""").as("gini_ppm"),
        col("top.source").as("top_source"),
        // the ×10⁶ ppm multiply follows the same q65 widening rule as
        // the gini numerator: a raw BIGINT `mass * 1000000` wraps
        // silently (non-ANSI) once one (lang, source) holds ~9.2e12
        // chars — under the 100 TB design point — and DuckDB's BIGINT
        // would error rather than wrap, so the twins would diverge in
        // failure mode too
        expr("CAST(top.mass AS DECIMAL(38,0)) * 1000000 div total_chars")
          .as("top_share_ppm"))
      .orderBy("lang")
  }

  private val sourceConcentrationSql =
    """WITH h AS (
      |  SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS mass
      |  FROM documents GROUP BY 1, 2),
      |r AS (
      |  SELECT lang, source, mass,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY mass, source) AS BIGINT) AS r,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY mass DESC, source DESC) AS rd
      |  FROM h),
      |g AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sources,
      |    CAST(SUM(mass) AS BIGINT) AS total_chars,
      |    CAST(SUM(CAST(mass AS HUGEINT) * r) AS HUGEINT) AS a,
      |    MAX(CASE WHEN rd = 1 THEN source END) AS top_source,
      |    CAST(MAX(CASE WHEN rd = 1 THEN mass END) AS BIGINT) AS top_mass
      |  FROM r GROUP BY lang)
      |SELECT lang, n_sources, total_chars,
      |  CAST((2 * a - (n_sources + 1) * CAST(total_chars AS HUGEINT))
      |    * 1000000 // (n_sources * CAST(total_chars AS HUGEINT))
      |    AS BIGINT) AS gini_ppm,
      |  top_source,
      |  CAST(CAST(top_mass AS HUGEINT) * 1000000 // total_chars
      |    AS BIGINT) AS top_share_ppm
      |FROM g ORDER BY lang""".stripMargin

  // ------------------------------------------------------------- e06
  /** e06: pipeline attrition funnel — the data-card table a corpus
    * release publishes (the C4/Dolma-style per-gate survivor table):
    * documents and token mass surviving each stage, raw → t05
    * language ID (r11 — C4's published stage order runs langdetect
    * FIRST) → t08 quality gate → d01 exact dedup → d02/d07 NEAR dedup
    * (r10 — real corpus cards run fuzzy dedup between exact dedup and
    * decontamination) → d10 decontamination, with the per-stage drop.
    * Each gate reuses the EXACT spelling of the operator it audits
    * ([[TextOps.withLangScores]]/[[TextOps.langPred]] — t05's
    * marker-scored chained argmax, with the one confidence analogue a
    * marker classifier affords: the winning language must actually
    * score (`score_en > 0`), C4's langdetect ≥ 0.99 in miniature —
    * [[TextOps.gateScored]], the d01 min-doc_id keeper,
    * [[Dedup.nearDupKeepers]] — d02's banded candidates resolved to
    * d07's cluster keepers — and d10's df-pruned shingle rule against
    * the raw — the eval suite is external and ungated — benchmark
    * slice), so the funnel can never drift from the pipeline it
    * describes.
    *
    * Scale shape: every stage aggregate is a one-row partial-agged
    * pass (the e01 40-byte discipline — payloads never shuffle: dedup
    * moves (md5, doc_id), the near stage moves (doc_id, 8-hex band
    * sig) rows and id-only CC edges, decontamination moves df-pruned
    * shingles with the eval side broadcast, exactly d10's posture);
    * the only window is the dropped-column lag over the funnel
    * itself — stage-count-sized by construction, never data-sized. */
  def qualityFunnel(s: SparkSession, dir: String): DataFrame =
    qualityFunnelDf(t(s, dir, "documents"))

  def qualityFunnelDf(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextOps.gateScored(documents)
      .select(col("doc_id"), col("text"), col("toks"), col("n_tokens"),
        col("reason"))
    // lang-ID gate (stage 1): t05's marker scores + chained argmax over
    // the SAME token array the quality stats read — a map-side filter,
    // no shuffle (the funnel's stage aggregates stay one-row partial
    // aggs and no Exchange ever carries the document body)
    val langed = TextOps.withLangScores(scored, "toks")
      .filter(TextOps.langPred === "en" && col("score_en") > 0)
      .select(col("doc_id"), col("text"), col("n_tokens"), col("reason"))
    val ok = langed.filter(col("reason") === "ok")
    val keepers = ok
      .select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // kept feeds its own stage row and the near-dup chain; near feeds
    // its stage row, the shingle stream and the final stage — persist
    // both slim (doc_id, text, n_tokens) relations once
    val kept = ok.join(keepers, "doc_id")
      .select(col("doc_id"), col("text"), col("n_tokens")).persist()
    val near = kept.join(Dedup.nearDupKeepers(kept), Seq("doc_id"),
      "left_semi").persist()
    val cand = near.filter(col("doc_id") % Dedup.evalStride =!= 0)
    val evalDocs = documents
      .filter(col("doc_id") % Dedup.evalStride === 0)
      .select(col("doc_id"), col("text"))
    val base = cand.select(col("doc_id"), col("text"))
      .unionByName(evalDocs)
    val shAll = base
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(toks) - 2, 1)),
           i -> concat_ws(' ', slice(toks, i, 3)))""")).as("sh"))
      .distinct()
    val keepSh = shAll.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= Dedup.maxShingleDf)
      .select(col("sh"))
    val sh = shAll.join(keepSh, "sh")
    val evalSh = sh.filter(col("doc_id") % Dedup.evalStride === 0)
      .select(col("sh")).distinct()
    val contaminated = sh.filter(col("doc_id") % Dedup.evalStride =!= 0)
      .join(broadcast(evalSh), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    val clean = cand.join(contaminated, Seq("doc_id"), "left_anti")
    def stageRow(df: DataFrame, ord: Long, name: String): DataFrame =
      df.agg(count(lit(1)).as("docs_out"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("tokens_out"))
        .select(lit(ord).as("stage"), lit(name).as("gate"),
          col("docs_out"), col("tokens_out"))
    val funnel = stageRow(scored, 0L, "raw")
      .unionByName(stageRow(langed, 1L, "lang_id"))
      .unionByName(stageRow(ok, 2L, "quality_gate"))
      .unionByName(stageRow(kept, 3L, "exact_dedup"))
      .unionByName(stageRow(near, 4L, "near_dedup"))
      .unionByName(stageRow(clean, 5L, "decontaminated"))
    funnel.withColumn("dropped",
        coalesce(lag(col("docs_out"), 1).over(Window.orderBy(col("stage"))),
          col("docs_out")) - col("docs_out"))
      .orderBy("stage")
  }

  /** DuckDB twin: the shared t08 gate CTEs, the t05 lang-ID rule
    * ([[TextOps.langScoresSql]]/[[TextOps.langPredSql]] — one
    * spelling) as a doc_id filter composed over the SAME `d.toks`,
    * d01 keeper rule, the nd_-prefixed d02/d07 near-dup chain over
    * `kept` ([[Dedup.dupClusterCtesFrom]] — same spelling, different
    * source relation) and d10 shingle rule spelled identically; the
    * funnel's dropped column is the same 6-row LAG. The lang filter
    * CTE composes AROUND the shared gateOkCtes (e01/e02 reuse those
    * unfiltered) — gate-then-lang equals lang-then-gate because both
    * rules are row-local, so `ok ∩ lk` IS the C4 stage order's
    * quality-gate survivor set. */
  private val qualityFunnelSql =
    s"""WITH $gateOkCtes,
       |lk AS MATERIALIZED (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |${TextOps.langScoresSql("toks")}
       |    FROM d)
       |  WHERE (${TextOps.langPredSql}) = 'en' AND score_en > 0),
       |lang_kept AS (
       |  SELECT st.doc_id, st.n_tokens FROM st JOIN lk USING (doc_id)),
       |okl AS MATERIALIZED (
       |  SELECT o.* FROM ok o JOIN lk USING (doc_id)),
       |keepers AS (SELECT MIN(doc_id) AS doc_id FROM okl GROUP BY md5(text)),
       |kept AS MATERIALIZED (
       |  SELECT o.doc_id, o.text, o.n_tokens
       |  FROM okl o JOIN keepers k ON o.doc_id = k.doc_id),
       |${Dedup.dupClusterCtesFrom("kept", "nd_")},
       |near AS MATERIALIZED (
       |  SELECT k.doc_id, k.text, k.n_tokens
       |  FROM kept k JOIN nd_l${Dedup.ccRounds} l
       |    ON k.doc_id = l.doc_id AND l.doc_id = l.cluster),
       |cand AS (SELECT * FROM near WHERE doc_id % ${Dedup.evalStride} <> 0),
       |ev AS (SELECT doc_id, text FROM documents
       |       WHERE doc_id % ${Dedup.evalStride} = 0),
       |base AS (SELECT doc_id, text FROM cand
       |         UNION ALL SELECT doc_id, text FROM ev),
       |bt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM base),
       |sh_all AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(len(toks) - 2, 1)),
       |    i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
       |  FROM bt),
       |keep_sh AS (SELECT sh FROM sh_all GROUP BY sh
       |            HAVING COUNT(*) <= ${Dedup.maxShingleDf}),
       |shp AS (SELECT sh_all.* FROM sh_all JOIN keep_sh USING (sh)),
       |eval_sh AS (SELECT DISTINCT sh FROM shp
       |            WHERE doc_id % ${Dedup.evalStride} = 0),
       |contaminated AS (
       |  SELECT DISTINCT doc_id FROM shp
       |  WHERE doc_id % ${Dedup.evalStride} <> 0
       |    AND sh IN (SELECT sh FROM eval_sh)),
       |f AS (
       |  SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS gate,
       |    CAST(COUNT(*) AS BIGINT) AS docs_out,
       |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS tokens_out
       |  FROM st
       |  UNION ALL
       |  SELECT 1, 'lang_id', COUNT(*),
       |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM lang_kept
       |  UNION ALL
       |  SELECT 2, 'quality_gate', COUNT(*),
       |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM okl
       |  UNION ALL
       |  SELECT 3, 'exact_dedup', COUNT(*),
       |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM kept
       |  UNION ALL
       |  SELECT 4, 'near_dedup', COUNT(*),
       |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM near
       |  UNION ALL
       |  SELECT 5, 'decontaminated', COUNT(*),
       |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT)
       |  FROM cand WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
       |SELECT stage, gate, docs_out, tokens_out,
       |  COALESCE(LAG(docs_out) OVER (ORDER BY stage), docs_out) - docs_out
       |    AS dropped
       |FROM f ORDER BY stage""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e06_quality_funnel" -> qualityFunnel _,
    "e05_source_concentration" -> sourceConcentration _,
    "e04_corpus_report" -> corpusReport _,
    "e03_snapshot_diff" -> snapshotDiff _,
    "e01_corpus_build" -> corpusBuild _,
    "e02_corpus_refresh" -> corpusRefresh _)

  val oracle: Map[String, String] = Map(
    "e06_quality_funnel" -> qualityFunnelSql,
    "e05_source_concentration" -> sourceConcentrationSql,
    "e04_corpus_report" -> corpusReportSql,
    "e03_snapshot_diff" -> snapshotDiffSql,
    "e01_corpus_build" -> corpusBuildSql,
    "e02_corpus_refresh" -> corpusRefreshSql)
}
