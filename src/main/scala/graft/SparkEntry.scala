package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the full declared engine surface: relational operators
  * (graft.queries.Relational), the MapleJuice-parity text/KV workloads,
  * and the LLM-pipeline extensions (dedup, similarity, text analysis,
  * multimodal).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3-style join+agg+top-k — one real query through scan → join →
    * partial/final agg → sort → limit. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03TopUnshipped(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ graft.queries.TextOps.queries ++
      graft.queries.Dedup.queries ++ graft.queries.Similarity.queries ++
      graft.multimodal.MultimodalQueries.queries ++
      graft.queries.Sketches.queries ++ graft.queries.Graph.queries ++
      graft.queries.Sampling.queries ++ graft.queries.Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ graft.queries.TextOps.oracle ++
      graft.queries.Dedup.oracle ++ graft.queries.Similarity.oracle ++
      graft.multimodal.MultimodalQueries.oracle ++
      graft.queries.Sketches.oracle ++ graft.queries.Graph.oracle ++
      graft.queries.Sampling.oracle ++ graft.queries.Pipeline.oracle
}
