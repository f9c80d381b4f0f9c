package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[RangeJoinRewrite]] — the declarative sliding-window join gets the
  * banded plan automatically; results are proven identical to the
  * rule-disabled run in every case, including negative timestamps
  * (floor, not truncate-toward-zero, bucketing). */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val W = 100L

  private def withRule[T](on: Boolean)(f: => T): T = {
    val key = "graft.rangejoin.rewrite.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private lazy val anchors = (0L until 40L)
    .map(i => (i, i * 37L % 500L - 100L)).toDF("aid", "at")
  private lazy val ranged = (0L until 200L)
    .map(i => (i, i * 13L % 520L - 120L)).toDF("rid", "rt")

  private def naive(join: String): DataFrame =
    anchors.as("a").join(ranged.as("r"),
      col("r.rt") <= col("a.at") && col("r.rt") >= col("a.at") - W, join)

  test("keyless window join: BNLJ becomes a banded hash join with " +
      "identical results (negative timestamps included)") {
    val got = withRule(on = true) {
      val df = naive("inner")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_band"), "rule did not fire:\n" + plan)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        "still a nested loop:\n" + plan)
      df.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    }
    val want = withRule(on = false) {
      val df = naive("inner")
      assert(!df.queryExecution.executedPlan.toString.contains("__graft_band"))
      df.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    }
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("keyed window join: results identical with and without the rule") {
    def keyed(): Seq[(Long, Long)] = {
      val a = anchors.withColumn("k", col("aid") % 5)
      val r = ranged.withColumn("k", col("rid") % 5)
      a.as("a").join(r.as("r"),
          col("a.k") === col("r.k") &&
            col("r.rt") <= col("a.at") && col("r.rt") >= col("a.at") - W)
        .select(col("aid"), col("rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    }
    val got = withRule(on = true)(keyed())
    val want = withRule(on = false)(keyed())
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("guards: outer joins and non-window conditions are left alone") {
    withRule(on = true) {
      val lo = naive("left_outer")
      assert(!lo.queryExecution.executedPlan.toString.contains("__graft_band"),
        "rewrote a LEFT OUTER join")
      // single-bound condition (no window): not rewritten
      val half = anchors.as("a").join(ranged.as("r"),
        col("r.rt") <= col("a.at"))
      assert(!half.queryExecution.executedPlan.toString
        .contains("__graft_band"), "rewrote a half-open range")
    }
  }

  test("alternate spellings (r + W >= a, strict bounds) also band") {
    withRule(on = true) {
      val add = anchors.as("a").join(ranged.as("r"),
        col("r.rt") < col("a.at") && col("r.rt") + W >= col("a.at"))
      val plan = add.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_band"),
        "add-form window not recognized:\n" + plan)
      val want = withRule(on = false) {
        anchors.as("a").join(ranged.as("r"),
            col("r.rt") < col("a.at") && col("r.rt") + W >= col("a.at"))
          .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
      }
      assert(add.collect().map(r => (r.getLong(0), r.getLong(2))).sorted
        .toSeq === want)
    }
  }
}
