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
}
