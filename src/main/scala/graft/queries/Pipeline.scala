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
    kept
      .withColumn("skey", md5(concat(
        lit(Sampling.shuffleSeed + ":"), col("doc_id").cast("string"))))
      .withColumn("shard",
        conv(substring(col("skey"), 1, Sampling.shardHexChars), 16, 10)
          .cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("shard")
  }

  /** DuckDB twin: the t08 gate rules, d01 keeper rule, and p08 shard
    * key spelled identically. */
  private val corpusBuildSql = {
    val shard = (1 to Sampling.shardHexChars).map(i =>
      s"(strpos('0123456789abcdef', substring(skey, $i, 1)) - 1)")
      .reduce((acc, d) => s"($acc * 16 + $d)")
    s"""WITH d AS (
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
       |    OR n_distinct * 2 < n_tokens OR n_stop = 0)),
       |keepers AS (
       |  SELECT MIN(doc_id) AS doc_id FROM ok GROUP BY md5(text)),
       |kept AS (
       |  SELECT o.doc_id, o.source, o.n_tokens,
       |    md5('${Sampling.shuffleSeed}:' || CAST(o.doc_id AS VARCHAR)) AS skey
       |  FROM ok o JOIN keepers k ON o.doc_id = k.doc_id)
       |SELECT CAST($shard AS BIGINT) AS shard,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
       |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e01_corpus_build" -> corpusBuild _)

  val oracle: Map[String, String] = Map(
    "e01_corpus_build" -> corpusBuildSql)
}
