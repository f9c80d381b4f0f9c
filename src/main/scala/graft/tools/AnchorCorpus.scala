package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generation-independent bench anchor corpus (r12, VERDICT-r11 ask #3).
  *
  * The driver REGENERATES `/root/testdata` every round, so every
  * round-over-round per-query bench diff confounds three causes: code,
  * run conditions, and generation density — and the confound has
  * consumed a verdict ask three rounds running (r9 d17, r10's four
  * movers, r11 g14/a10), each resolved only by a hand A/B. This corpus
  * removes the third cause structurally: every value is a pure integer
  * function of the row id (`xxhash64` mixes — no RNG object, no time,
  * no environment), so the SAME code version always writes the SAME
  * rows, and [[graft.Bench]] times a 5-query anchor set against it
  * every round (`anchor_ms` beside `ref_ms`). Anchor drift with the
  * data held constant measures run conditions + code only;
  * cross-generation per-query comparison of the main sweep is
  * deprecated for attribution (SCALING.md r12).
  *
  * Sizing: ~half the sf0.1 density (lineitem 300 k) — anchors land in
  * the 0.3–5 s band where the 1.5× actionability threshold resolves,
  * without adding minutes to the bench wall. The five anchors span the
  * cost families that actually move: scan-agg (q01), banded dedup
  * (d02), sketch rollup (a10 — an r11 mover), iterative graph (g14 —
  * the r11 suite-#2 mover), and the cell-blocked kNN graph (s19).
  *
  * [[version]] participates in the on-disk marker AND the bench line:
  * changing any generation expression must bump it, which voids
  * cross-version anchor comparison explicitly instead of silently.
  */
object AnchorCorpus {

  val version = "v1"

  /** Row counts — fixed forever within a version. */
  val nOrders = 75000L
  val nLineitem = 300000L
  val nDocuments = 5000L
  val nEmbeddings = 2000L

  /** Deterministic non-negative mix of (seed-column expression, salt). */
  private def mix(e: String, salt: Int, m: Long): String =
    s"pmod(xxhash64($e, $salt), ${m}L)"

  def ensure(spark: SparkSession, dir: String): Unit = {
    val marker = Paths.get(dir, "_ANCHOR_VERSION")
    if (Files.exists(marker) &&
        new String(Files.readAllBytes(marker), StandardCharsets.UTF_8)
          .trim == version) return
    generate(spark, dir)
    Files.createDirectories(Paths.get(dir))
    Files.write(marker, (version + "\n").getBytes(StandardCharsets.UTF_8))
  }

  private def write(df: DataFrame, dir: String, name: String): Unit =
    df.write.mode("overwrite").parquet(s"$dir/$name.parquet")

  def generate(spark: SparkSession, dir: String): Unit = {
    // ---- orders: dense keys, hash FKs, 7-year date band
    val orders = spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      expr(mix("id", 1, 15000L)).as("o_custkey"),
      expr(s"element_at(array('O','F','P'), cast(${mix("id", 2, 3L)} as int) + 1)")
        .as("o_orderstatus"),
      expr(s"cast(${mix("id", 3, 9000000L)} as double) / 100.0 + 900.0")
        .as("o_totalprice"),
      expr(s"timestamp_millis(694224000000 + ${mix("id", 4, 2556L)} * 86400000)")
        .as("o_orderdate"),
      expr(s"element_at(array('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED'," +
        s"'5-LOW'), cast(${mix("id", 5, 5L)} as int) + 1)")
        .as("o_orderpriority"))
    write(orders, dir, "orders")

    // ---- lineitem: 4 lines per order, TPC-H-shaped value bands
    val lineitem = spark.range(nLineitem).select(
      (col("id") / 4).cast("long").as("l_orderkey"),
      expr(mix("id", 11, 20000L)).as("l_partkey"),
      expr(mix("id", 12, 1000L)).as("l_suppkey"),
      (col("id") % 4 + 1).cast("int").as("l_linenumber"),
      expr(s"cast(${mix("id", 13, 50L)} + 1 as double)").as("l_quantity"),
      expr(s"cast(${mix("id", 14, 9000000L)} as double) / 100.0 + 900.0")
        .as("l_extendedprice"),
      expr(s"cast(${mix("id", 15, 11L)} as double) / 100.0").as("l_discount"),
      expr(s"cast(${mix("id", 16, 9L)} as double) / 100.0").as("l_tax"),
      expr(s"element_at(array('A','N','R'), cast(${mix("id", 17, 3L)} as int) + 1)")
        .as("l_returnflag"),
      expr(s"element_at(array('O','F'), cast(${mix("id", 18, 2L)} as int) + 1)")
        .as("l_linestatus"),
      expr(s"timestamp_millis(694224000000 + ${mix("id", 19, 2556L)} * 86400000)")
        .as("l_shipdate"))
    write(lineitem, dir, "lineitem")

    // ---- documents: 30-149 tokens from an 800-word vocabulary; the
    // first three ids of every 13-block share a text seed (dup
    // clusters for the d-family); lang skewed toward en
    val documents = spark.range(nDocuments)
      .withColumn("tseed",
        expr("case when pmod(id, 13) < 3 then id - pmod(id, 13) else id end"))
      .withColumn("n_toks", expr(s"30 + ${mix("tseed", 21, 120L)}"))
      .withColumn("text", expr(
        "concat_ws(' ', transform(sequence(1, cast(n_toks as int)), " +
          "i -> concat('w', pmod(xxhash64(tseed, i), 800))))"))
      .select(
        col("id").as("doc_id"),
        col("text"),
        expr(s"element_at(array('en','en','en','en','en','en','de','es'," +
          s"'fr','zh'), cast(${mix("id", 22, 10L)} as int) + 1)").as("lang"),
        expr(s"concat('src', ${mix("id", 23, 20L)})").as("source"),
        length(col("text")).cast("long").as("n_chars"))
    write(documents, dir, "documents")

    // ---- embeddings: 10 hash-centered clusters with radius-0.2
    // jitter, dim 64 — gives the quantizer real modes to separate
    val embeddings = spark.range(nEmbeddings)
      .withColumn("lbl", expr(s"cast(${mix("id", 31, 10L)} as int)"))
      .select(
        col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> cast(" +
          "(cast(pmod(xxhash64(cast(lbl as bigint), j + 100), 2001L) as double) - 1000.0) / 1000.0 + " +
          "(cast(pmod(xxhash64(id, j + 200), 401L) as double) - 200.0) / 1000.0 as float))")
          .as("embedding"),
        col("lbl").as("label"))
    write(embeddings, dir, "embeddings")
  }
}
