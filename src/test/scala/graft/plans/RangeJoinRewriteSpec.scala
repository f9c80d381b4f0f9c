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

  test("symmetric interval |rt - at| <= W bands as a two-sided window") {
    def sym(): (String, Seq[(Long, Long)]) = {
      val df = anchors.as("a").join(ranged.as("r"),
        col("r.rt") <= col("a.at") + W && col("r.rt") >= col("a.at") - W)
      (df.queryExecution.executedPlan.toString,
        df.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq)
    }
    val (plan, got) = withRule(on = true)(sym())
    assert(plan.contains("__graft_band"),
      "two-sided window not recognized:\n" + plan)
    val (_, want) = withRule(on = false)(sym())
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("property: random rows / widths / spellings — rewrite-on equals " +
      "rewrite-off (50 randomized cases)") {
    val rnd = new scala.util.Random(20260815L)
    for (c <- 1 to 50) {
      val n = 5 + rnd.nextInt(30)
      val m = 5 + rnd.nextInt(60)
      val span = 1 + rnd.nextInt(400)
      val a = (0 until n).map(i =>
        (i.toLong, rnd.nextLong(span) - span / 2)).toDF("aid", "at")
      val r = (0 until m).map(i =>
        (i.toLong, rnd.nextLong(span) - span / 2)).toDF("rid", "rt")
      val w1 = rnd.nextInt(60).toLong
      val w2 = if (w1 == 0) 1L + rnd.nextInt(60) else rnd.nextInt(60).toLong
      val upper =
        if (rnd.nextBoolean()) col("r.rt") <= col("a.at") + w2
        else col("a.at") + w2 >= col("r.rt")
      val lower =
        if (rnd.nextBoolean()) col("r.rt") >= col("a.at") - w1
        else col("a.at") - w1 <= col("r.rt")
      def run(): Seq[(Long, Long)] =
        a.as("a").join(r.as("r"), upper && lower)
          .select(col("aid"), col("rid"))
          .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val on = withRule(on = true)(run())
      val off = withRule(on = false)(run())
      assert(on === off, s"case $c: w1=$w1 w2=$w2 n=$n m=$m")
    }
  }

  test("property: Long-extreme timestamps — the band arithmetic never " +
      "wraps, so no pair the original predicate matches is dropped") {
    // Timestamps hugging Long.MinValue are exactly where the naive
    // `bucket(anchor − W1)` spelling wrapped to a huge positive band
    // and silently dropped every match. The ORIGINAL predicates use
    // the overflow-free `r + W >= a` spelling (rt stays ≥ W below
    // Long.MaxValue), so the rule-off run is a well-defined truth.
    val lo = Long.MinValue
    val hi = Long.MaxValue - W // headroom so rt + W cannot overflow
    val a = ((0L until 25L).map(i => (i, lo + i * 17L % 250L)) ++
      (0L until 25L).map(i => (100L + i, hi - i * 13L % 250L)))
      .toDF("aid", "at")
    val r = ((0L until 80L).map(i => (i, lo + i * 7L % 260L)) ++
      (0L until 80L).map(i => (200L + i, hi - i * 11L % 260L)))
      .toDF("rid", "rt")
    def run(on: Boolean): Seq[(Long, Long)] = withRule(on) {
      val df = a.as("a").join(r.as("r"),
        col("r.rt") <= col("a.at") && col("r.rt") + W >= col("a.at"))
      if (on) assert(df.queryExecution.executedPlan.toString
        .contains("__graft_band"), "rule did not fire at Long extremes")
      df.select(col("aid"), col("rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    }
    val got = run(on = true)
    val want = run(on = false)
    assert(got === want)
    assert(got.nonEmpty, "degenerate fixture: no matching pairs at all")
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
