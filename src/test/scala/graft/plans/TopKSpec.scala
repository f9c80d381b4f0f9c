package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = graft.Tables.t(spark, sf, "orders")

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    orders.select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k).drop("rn")
  }

  private def viaCustom(k: Int) =
    TopK.perKey(
      orders.select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), k)

  test("TopKPerKey equals the window formulation (k=3)") {
    val expected = viaWindow(3).as[(Long, Long, Double)].collect().toSet
    val got = viaCustom(3).as[(Long, Long, Double)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("TopKPerKey equals the window formulation (k=1)") {
    assert(viaCustom(1).as[(Long, Long, Double)].collect().toSet ===
      viaWindow(1).as[(Long, Long, Double)].collect().toSet)
  }

  test("physical plan: custom exec after a hash exchange, no sort") {
    val df = viaCustom(3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p) // nodeName strips the Exec suffix
    assert(p.contains("hashpartitioning(o_custkey"), p)
    assert(!p.contains("Sort "), s"window-style sort crept in:\n$p")
  }

  test("per-key output arrives in rank order") {
    val rows = viaCustom(3).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val byKey = rows.zipWithIndex.groupBy(_._1._1)
    byKey.values.foreach { g =>
      val inOrder = g.sortBy(_._2).map(_._1._2)
      assert(inOrder.zip(inOrder.tail).forall { case (a, b) => a >= b })
    }
  }

  test("optimizer rewrites the row_number formulation into the heap operator") {
    def windowForm = {
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      orders.select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3).drop("rn")
    }
    val rewritten = windowForm
    rewritten.collect()
    val p = rewritten.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p) // the rule fired
    assert(!p.contains("Sort "), s"sort survived the rewrite:\n$p")
    // same rows as the unrewritten plan
    spark.conf.set("graft.topk.rewrite.enabled", "false")
    try {
      val plain = windowForm
      val expected = plain.as[(Long, Long, Double)].collect().toSet
      assert(!plain.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(rewritten.as[(Long, Long, Double)].collect().toSet === expected)
    } finally spark.conf.unset("graft.topk.rewrite.enabled")
  }

  test("rewrite leaves rank-keeping and rank-exposing plans alone") {
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    // rn stays in the output → must NOT rewrite (TopKPerKey can't emit it)
    val keepsRank = orders.select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
    keepsRank.collect()
    assert(!keepsRank.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("partial phase prunes map-side and stays exact under forced " +
      "segment flushes (r11)") {
    // a 10-row partial budget with k=3 forces a flush every 3 keys on
    // the map side (~50 segments over 150 keys) — the final result
    // must still equal the window formulation exactly (each key's
    // top-k is contained in the union of its segment top-k's)
    spark.conf.set(TopK.partialMaxHeapRowsKey, "10")
    try {
      val expected = viaWindow(3).as[(Long, Long, Double)].collect().toSet
      val got = viaCustom(3).as[(Long, Long, Double)].collect().toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally spark.conf.unset(TopK.partialMaxHeapRowsKey)
    // and the physical plan really has the map-side pruner below the
    // exchange
    val df = viaCustom(3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val partialLine = p.linesIterator.indexWhere(_.contains("PartialTopKPerKey"))
    val exchangeLine = p.linesIterator.indexWhere(_.contains("Exchange"))
    assert(partialLine >= 0 && exchangeLine >= 0 && partialLine > exchangeLine,
      "PartialTopKPerKey must sit BELOW the exchange:\n" + p)
  }

  test("a pathological partial budget below k cannot drop rows: the " +
      "effective budget floors at k (r12, ADVICE-r11)") {
    // budget 1 < k=2: pre-fix, the carried-over `pending` row's
    // fresh-map insert refused (heaps.size * k >= 1 already at size 0)
    // and the ignored return value silently lost the row. With the
    // floor, every segment holds exactly one key's heap — degenerate
    // pruning, exact results.
    spark.conf.set(TopK.partialMaxHeapRowsKey, "1")
    try {
      val expected = viaWindow(2).as[(Long, Long, Double)].collect().toSet
      val got = viaCustom(2).as[(Long, Long, Double)].collect().toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally spark.conf.unset(TopK.partialMaxHeapRowsKey)
  }

  test("heap budget guard fails fast on high key cardinality (no silent OOM)") {
    // every row its own key → keys·k exceeds a tiny budget immediately
    spark.conf.set(TopK.maxHeapRowsKey, "100")
    try {
      val e = intercept[org.apache.spark.SparkException] {
        viaCustom(3).count() // o_custkey is near-unique per small groups
      }
      assert(e.getMessage.contains("TopKPerKey heap budget exceeded") ||
        e.getCause != null &&
          e.getCause.getMessage.contains("TopKPerKey heap budget exceeded"))
    } finally spark.conf.unset(TopK.maxHeapRowsKey)
  }

  test("estimatedKeys hint routes huge-cardinality jobs to the spillable window plan") {
    spark.conf.set(TopK.maxHeapRowsKey, "100")
    try {
      val df = TopK.perKey(
        orders.select($"o_custkey", $"o_orderkey", $"o_totalprice"),
        Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)),
        k = 3, estimatedKeys = 100000000L)
      // same rows as the heap operator under the default budget
      spark.conf.unset(TopK.maxHeapRowsKey)
      val expected = viaWindow(3).as[(Long, Long, Double)].collect().toSet
      assert(df.as[(Long, Long, Double)].collect().toSet === expected)
      // and the plan really is the window formulation (sort present,
      // no custom exec)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("TopKPerKey"), p)
      assert(p.contains("Window"), p)
    } finally spark.conf.unset(TopK.maxHeapRowsKey)
  }
}
