package graft.queries

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf ranks rare terms above ubiquitous ones") {
    // "common" appears in every doc (idf = ln(1) = 0); each doc's
    // unique term carries all the weight
    val docs = Seq(
      (0L, "common zebra common common"),
      (1L, "common yak common"),
      (2L, "common xerus"))
      .toDF("doc_id", "text")
    val got = TextOps.tfidfDf(docs)
      .as[(Long, String, Long, Long, Double, Long)].collect()
    val top = got.filter(_._6 == 1L).map(r => r._1 -> r._2).toMap
    assert(top === Map(0L -> "zebra", 1L -> "yak", 2L -> "xerus"))
    // ubiquitous term scores exactly 0 (ln 1) and never outranks
    got.filter(_._2 == "common").foreach { r =>
      assert(r._5 === 0.0)
      assert(r._6 > 1L)
    }
    // tf and df columns are exact
    val zebra = got.find(_._2 == "zebra").get
    assert(zebra._3 === 1L && zebra._4 === 1L)
  }
}
