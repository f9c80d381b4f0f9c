package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    * pushdown handled by Catalyst; never pre-materialize. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for SQL-surface queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
