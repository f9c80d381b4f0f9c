package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.LongType

/** Named-table access over a testdata scale-factor directory.
  *
  * Plays the role of the reference's SDFS name → data mapping
  * (`file_list.cpp:12`): a flat namespace of named datasets. Here the
  * namespace is a directory of Parquet tables; Spark's catalog replaces
  * the replica map entirely (SURVEY.md §2.1 S1–S6).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one named table. Parquet scan → columnar, predicate/column
    * pushdown handled by Catalyst; never pre-materialize.
    *
    * `events.ts` is normalized to BIGINT epoch-nanos regardless of the
    * file's physical encoding: int64-nanos files surface as LongType
    * directly (`spark.sql.legacy.parquet.nanosAsLong`), while
    * timestamp[us]/[ms] files are converted via `unix_micros` under the
    * session's pinned UTC zone. Every event-time query does its math in
    * exact integer nanos/micros (engine-portable, order-invariant), so
    * the one conversion lives here instead of in ten queries. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType != LongType)
      df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    else df
  }

  /** Register every table as a temp view (for SQL-surface queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
