package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class DistinctWindowRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val wRows = Window.partitionBy($"p").orderBy($"o", $"id")
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  // (p, o, id, x) with repeats and a null x
  private def df: DataFrame = Seq(
    ("a", 1L, 1L, Some("u")), ("a", 2L, 2L, Some("v")),
    ("a", 3L, 3L, Some("u")), ("a", 4L, 4L, None),
    ("a", 5L, 5L, Some("w")), ("b", 1L, 6L, Some("u")),
    ("b", 2L, 7L, Some("u")), ("b", 3L, 8L, None))
    .toDF("p", "o", "id", "x")

  private def natural(d: DataFrame): DataFrame =
    d.select($"p", $"id", size(collect_set($"x").over(wRows)).as("nd"))

  test("rewrite: collect_set vanishes from the plan; two rank/sum windows appear") {
    val out = natural(df)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("collect_set"),
      "set-building window survived the rewrite:\n" + p)
    assert("__graft_dw_rn".r.findFirstIn(p).isDefined, p)
  }

  test("rewrite preserves values incl. nulls and repeats (vs rule disabled)") {
    val got = natural(df).as[(String, Long, Int)].collect().toSet
    val want = {
      spark.conf.set("graft.distinctwindow.rewrite.enabled", "false")
      try natural(df).as[(String, Long, Int)].collect().toSet
      finally spark.conf.unset("graft.distinctwindow.rewrite.enabled")
    }
    assert(got === want)
    // spot values: partition a timeline u,v,u,null,w → 1,2,2,2,3
    val a = natural(df).filter($"p" === "a").orderBy($"id")
      .select($"nd").as[Int].collect().toSeq
    assert(a === Seq(1, 2, 2, 2, 3))
  }

  test("tied order keys: counts stay in the original plan's achievable range") {
    // rows tied on (p, o) with the same non-null x: whatever tie order
    // window 2 resolves, the first-seen flag (sorted DESC within the
    // tie) must be in view — so no row can report 0, which the
    // original size(collect_set) plan (frame includes current row)
    // can never produce
    val tied = Seq(
      ("a", 1L, 1L, Some("u")), ("a", 1L, 2L, Some("u")),
      ("a", 1L, 3L, Some("u")), ("a", 2L, 4L, Some("v")),
      ("b", 5L, 5L, Some("z")), ("b", 5L, 6L, Some("z")))
      .toDF("p", "o", "id", "x")
    val wTied = Window.partitionBy($"p").orderBy($"o")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = tied.select($"p", $"id",
      size(collect_set($"x").over(wTied)).as("nd"))
    out.collect()
    assert(!out.queryExecution.executedPlan.toString.contains("collect_set"))
    val got = out.select($"nd").as[Int].collect()
    assert(got.forall(_ >= 1), s"count 0 emitted: ${got.toSeq}")
    // the final row of each tie group always sees the full set
    val byP = out.as[(String, Long, Int)].collect().groupBy(_._1)
    assert(byP("a").map(_._3).max === 2)
    assert(byP("b").map(_._3).max === 1)
  }

  test("tied keys at shuffle scale: non-null rows never see count 0") {
    // large fully-tied groups across many input partitions: windows 1
    // and 2 are separate shuffles whose tie resolution genuinely
    // diverges at this size, so this catches a tiebreaker that exists
    // only in the expression's spec (execution sorts by the NODE-level
    // orderSpec — a spec-only tiebreaker is a silent no-op)
    val rows = (0 until 5000).map { i =>
      (i % 8, 1L, i.toLong, if (i % 11 == 0) None else Some((i % 10).toString))
    }
    val big = rows.toDF("p", "o", "id", "x").repartition(17)
    val wTied = Window.partitionBy($"p").orderBy($"o")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = big.select($"p", $"x",
      size(collect_set($"x").over(wTied)).as("nd"))
    out.collect()
    assert(!out.queryExecution.executedPlan.toString.contains("collect_set"))
    val got = out.as[(Int, Option[String], Int)].collect()
    val distinctPerP = rows.groupBy(_._1).view
      .mapValues(_.flatMap(_._4).distinct.size).toMap
    got.foreach { case (p, x, nd) =>
      if (x.isDefined) assert(nd >= 1, s"count 0 for non-null x in p=$p")
      assert(nd <= distinctPerP(p), s"count $nd exceeds distinct in p=$p")
    }
  }

  test("no rewrite when the set itself escapes or the frame is RANGE") {
    // set escapes: array itself selected
    val escape = df.select($"p", $"id",
      size(collect_set($"x").over(wRows)).as("nd"),
      collect_set($"x").over(wRows).as("the_set"))
    escape.collect()
    assert(escape.queryExecution.executedPlan.toString.contains("collect_set"))
    // RANGE frame (default with orderBy): tie rows share the set —
    // decomposition would differ mid-tie, so the rule must not fire
    val wRange = Window.partitionBy($"p").orderBy($"o")
    val range = df.select($"p", $"id",
      size(collect_set($"x").over(wRange)).as("nd"))
    range.collect()
    assert(range.queryExecution.executedPlan.toString.contains("collect_set"))
  }
}
