package graft.engine

import graft.SparkSpec

/** The shared test session loads GraftExtensions via the
  * spark.sql.extensions config (the cluster deployment path). */
class GraftExtensionsSpec extends SparkSpec {

  test("graft_dot and graft_norm2 are callable from SQL") {
    val row = spark.sql(
      """SELECT graft_dot(CAST(ARRAY(1.0, 2.0, 3.0) AS ARRAY<DOUBLE>),
        |                 CAST(ARRAY(4.0, 5.0, 6.0) AS ARRAY<DOUBLE>)) AS d,
        |       graft_norm2(CAST(ARRAY(3.0, 4.0) AS ARRAY<DOUBLE>)) AS n2
        |""".stripMargin).collect().head
    assert(row.getDouble(0) === 32.0)
    assert(row.getDouble(1) === 25.0)
  }

  test("codegen evaluates the expressions (no fallback errors) on 1k rows") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, Array(i.toDouble, 2.0, 3.0)))
      .toDF("id", "v")
    df.createOrReplaceTempView("vecs")
    val s = spark.sql(
      "SELECT SUM(graft_dot(v, v)) AS t, SUM(graft_norm2(v)) AS n FROM vecs")
      .collect().head
    assert(s.getDouble(0) === s.getDouble(1)) // dot(v,v) == norm2(v)
  }

  test("fixed-point vector functions are callable from SQL") {
    val row = spark.sql(
      """SELECT graft_fp_dot(CAST(ARRAY(1.0, 2.0) AS ARRAY<DOUBLE>),
        |                    CAST(ARRAY(3.0, 4.0) AS ARRAY<DOUBLE>)) AS fd,
        |       graft_fp_sqdist(CAST(ARRAY(1.0, 2.0) AS ARRAY<DOUBLE>),
        |                       CAST(ARRAY(1.0, 2.0) AS ARRAY<DOUBLE>)) AS sq
        |""".stripMargin).collect().head
    assert(row.getLong(0) > 0L) // Σ floor(a·2^s)·floor(b·2^s) scaled
    assert(row.getLong(1) === 0L) // identical vectors: exact zero
  }

  test("portable sketch aggregates are callable from SQL GROUP BY") {
    import spark.implicits._
    (1 to 300).map(i => (i % 3, s"k${i % 50}"))
      .toDF("g", "k").createOrReplaceTempView("sk")
    val rows = spark.sql(
      """SELECT g, graft_portable_hll(k).harmonic_sum AS hs,
        |       size(graft_portable_cms(k)) AS cms_words,
        |       size(graft_portable_bloom(k)) AS bloom_words
        |FROM sk GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows.length === 3)
    // SQL-path state must equal the Column-API path state
    val viaApi = (1 to 300).map(i => (i % 3, s"k${i % 50}"))
      .toDF("g", "k").groupBy("g")
      .agg(graft.functions.PortableHll.portableHll(
        org.apache.spark.sql.functions.col("k")).as("h"))
      .selectExpr("g", "h.harmonic_sum").orderBy("g")
      .as[(Int, Long)].collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      viaApi.toSeq)
  }
}
