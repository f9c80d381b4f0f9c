package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextUdfsSpec extends SparkSpec {
  import spark.implicits._

  test("readability UDF evaluates via Column and SQL registration") {
    TextUdfs.register(spark)
    val df = Seq((1L, "the cat sat"), (2L, "")).toDF("id", "text")
    val viaCol = df.select($"id", TextUdfs.readabilityCol($"text").as("r"))
      .as[(Long, Double)].collect().toMap
    df.createOrReplaceTempView("udf_docs")
    val viaSql = spark.sql(
      "SELECT id, graft_readability(text) AS r FROM udf_docs")
      .as[(Long, Double)].collect().toMap
    assert(viaCol === viaSql)
    assert(viaCol(2L) === 0.0)
    // 3 words, 3 syllables → 206.835 - 1.015*3 - 84.6*1
    assert(math.abs(viaCol(1L) - (206.835 - 3.045 - 84.6)) < 1e-9)
  }
}
