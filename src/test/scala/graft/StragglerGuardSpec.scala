package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, ArrayAggregate,
  AttributeReference, AttributeSet, EqualTo, Expression, ExprId,
  GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal,
  RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.types.IntegerType

/** Row-invariant-fold straggler guard (r10, VERDICT-r9 ask #7).
  *
  * The r9 sf1 sweep found a16/a17 spending 583 s of single-core CPU in
  * an interpreted `aggregate()` (Catalyst [[ArrayAggregate]]) popcount
  * that sat under the PROBE-side aggregate: the folded array came from
  * a broadcast one-row sketch relation, so the fold's value was
  * identical for every probe row, yet it re-ran 8K words × 15M rows.
  * The fix hoists such folds onto the one-row relation itself. That
  * class of straggler is invisible at sf0.01 wall clock (the guard
  * exists because it only FIRED at sf1), but it is visible in the
  * OPTIMIZED PLAN at any scale — which is what this suite walks.
  *
  * Rule: no contract query's plan may contain an [[ArrayAggregate]]
  * inside an [[Aggregate]]'s expressions when the fold's inputs are
  * row-invariant — i.e. every attribute it references is produced by a
  * one-row (`maxRows == 1`) subplan of the aggregate's child, or it
  * references no attributes at all. Such a fold belongs on the one-row
  * relation (compute once, join the scalar), never under the
  * corpus-sized aggregate.
  *
  * Cost: plan-only — each query is analyzed and optimized but never
  * executed (queries whose CONSTRUCTION runs bounded driver work, e.g.
  * geometry counts or localCheckpoint rounds, do that work at the test
  * corpus). */
class StragglerGuardSpec extends SparkSpec {

  /** True iff every attribute `refs` needs is available from some
    * one-row subplan — the "constant per probe row" signature. An
    * empty `refs` (literal-only fold the optimizer left standing) is
    * row-invariant by definition. */
  private def rowInvariant(child: LogicalPlan, refs: AttributeSet): Boolean =
    refs.isEmpty || child.collect {
      case n if n.maxRows.contains(1L) && refs.subsetOf(n.outputSet) => n
    }.nonEmpty

  test("no row-invariant array fold hides under a corpus-sized " +
      "aggregate in any contract plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        plan.collect {
          // a one-row aggregate (global agg, no grouping over a
          // one-row child) may fold arrays freely — that IS the hoist
          // target, not the straggler
          case a: Aggregate if !a.child.maxRows.contains(1L) =>
            (a.aggregateExpressions ++ a.groupingExpressions)
              .flatMap(_.collect { case f: ArrayAggregate => f })
              .filter(f => rowInvariant(a.child, f.references))
              .map(f => s"$name: ${f.sql.take(120)}")
        }.flatten
    }
    assert(offenders.isEmpty,
      s"row-invariant fold(s) under corpus-sized aggregates — hoist " +
        s"onto the one-row relation (the a16/a17 r9 fix):\n" +
        offenders.mkString("\n"))
  }

  // ------------------------------------------------------------------
  // rank-1 window argmin guard (r11, VERDICT-r10 ask #7): the r10
  // assignCells fix (row_number window → partial-agged min(struct)) was
  // the second hand-instance of "corpus-sized shuffle where a map-side
  // collapse fits". Three layers now provide the collapse: ArgminRewrite
  // (min/max(struct) partial agg — the sound k=1 cases), the
  // partial-heaped TopKPerKey (any k, exact SortOrder semantics — what
  // TopKRewrite claims, including the decorrelated-LATERAL shape), and
  // Spark's own InferWindowGroupLimit (sort-side pruning for the window
  // shapes neither custom rule takes). This guard walks every contract
  // plan and flags any rank-1 window that ended up with NONE of them —
  // a Filter-bounded row_number over an unbounded child with no
  // WindowGroupLimit pruner below it, i.e. a full shuffle-and-sort that
  // keeps one row per key. Bounded children (maxRows defined —
  // seed/cell-count relations) may rank freely.

  private def boundsToOne(cond: Expression, rn: ExprId): Boolean = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => k == 1
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => k == 2
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => k == 1
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => k == 2
    case EqualTo(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => k == 1
    case EqualTo(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => k == 1
    case _ => false
  }

  private def rankOneOffenders(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case Filter(cond, Window(Seq(al @ Alias(
          WindowExpression(RowNumber(), _), _)), _, _, wc, _))
          if boundsToOne(cond, al.exprId) &&
            !wc.isInstanceOf[WindowGroupLimit] && wc.maxRows.isEmpty =>
        "unprotected row_number()=1 window over an unbounded child " +
          "(no agg collapse, no heap, no group-limit pruner)"
    }

  test("no rank-1 window/heap argmin survives over an unbounded child " +
      "in any contract plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        rankOneOffenders(fn(spark, sf).queryExecution.optimizedPlan)
          .map(o => s"$name: $o")
    }
    assert(offenders.isEmpty,
      "rank-1 argmin shape(s) survived optimization — ArgminRewrite " +
        "bailed; convert to the min/max(struct) agg form by hand (the " +
        "r10 assignCells fix):\n" + offenders.mkString("\n"))
  }

  // ------------------------------------------------------------------
  // k>1 top-k guard (r12, VERDICT-r11 ask #6): the q43 class before its
  // r11 fix — Filter(rk <= k, k small) over a row_number window whose
  // child is unbounded, with NEITHER TopKPerKey (the custom heap — its
  // plans never contain this Window shape) NOR a WindowGroupLimit
  // pruner (Spark's InferWindowGroupLimit) protecting it. Such a shape
  // shuffles AND fully sorts every input row to keep k per key.

  /** The filter (or one of its conjuncts) bounds the rank attribute to
    * a small k ≥ 2 — the 2..1000 band: k=1 belongs to the rank-1 guard
    * above, and a four-digit k is a deliberate wide cut, not the
    * straggler class. */
  private def boundsToSmallK(cond: Expression, rn: ExprId): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def k(e: Expression): Option[Int] = e match {
      case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn => Some(v)
      case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn => Some(v - 1)
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference)
        if a.exprId == rn => Some(v)
      case GreaterThan(Literal(v: Int, IntegerType), a: AttributeReference)
        if a.exprId == rn => Some(v - 1)
      case _ => None
    }
    conjuncts(cond).flatMap(k(_)).exists(v => v >= 2 && v <= 1000)
  }

  private def topKOffenders(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case Filter(cond, Window(Seq(al @ Alias(
          WindowExpression(fn, _), _)), _, _, wc, _))
          if (fn.isInstanceOf[RowNumber] ||
            fn.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Rank]) &&
            boundsToSmallK(cond, al.exprId) &&
            !wc.isInstanceOf[WindowGroupLimit] && wc.maxRows.isEmpty =>
        "unprotected row_number()<=k window over an unbounded child " +
          "(no heap operator, no group-limit pruner)"
    }

  test("no small-k top-k window survives over an unbounded child " +
      "without a pruner in any contract plan (r12)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        topKOffenders(fn(spark, sf).queryExecution.optimizedPlan)
          .map(o => s"$name: $o")
    }
    assert(offenders.isEmpty,
      "small-k top-k shape(s) survived without TopKPerKey or " +
        "WindowGroupLimit — the pre-r11 q43 class:\n" +
        offenders.mkString("\n"))
  }

  test("the k>1 guard has teeth: the pre-fix q43 shape is flagged when " +
      "both pruners are stripped, and clean under either protection") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    def q43Shape() = {
      val w = W.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
      graft.Tables.t(spark, sf, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_extendedprice"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3).drop("rk")
    }
    val topkKey = "graft.topk.rewrite.enabled"
    val wglKey = "spark.sql.optimizer.windowGroupLimitThreshold"
    spark.conf.set(topkKey, "false")
    spark.conf.set(wglKey, "-1")
    try {
      val bad = topKOffenders(q43Shape().queryExecution.optimizedPlan)
      assert(bad.nonEmpty,
        "detector lost its teeth: the unprotected k=3 window was not flagged")
    } finally {
      spark.conf.set(topkKey, "true")
      spark.conf.unset(wglKey)
    }
    // protected (TopKRewrite takes it as a heap by default): clean
    val protectedPlan = q43Shape().queryExecution.optimizedPlan
    assert(topKOffenders(protectedPlan).isEmpty,
      "the protected k=3 shape must not be flagged:\n" + protectedPlan)
  }

  test("the rank-1 guard has teeth: the r9 assignCells shape is " +
      "flagged when unprotected, and rewritten to an aggregate by " +
      "ArgminRewrite") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    def r9Shape() = {
      // the r9 straggler in miniature: corpus (parquet — unbounded
      // maxRows, like every contract scan) × broadcast seeds scored,
      // then a rank-1 window argmin — shuffles n·nCells rows
      val seeds = spark.range(8).select(col("id").as("cell"),
        (col("id") * 7 % 13).as("sv"))
      val corpus = graft.Tables.t(spark, sf, "embeddings")
        .select(col("vec_id"), (col("vec_id") % 17).as("v"))
      val w = W.partitionBy(col("vec_id")).orderBy(col("d"), col("cell"))
      corpus.crossJoin(broadcast(seeds))
        .withColumn("d", (col("v") - col("sv")) * (col("v") - col("sv")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("cell"))
    }
    val key = "graft.argmin.rewrite.enabled"
    val topkKey = "graft.topk.rewrite.enabled"
    val wglKey = "spark.sql.optimizer.windowGroupLimitThreshold"
    // strip ALL three protection layers → the bare r9 form must flag
    spark.conf.set(key, "false")
    spark.conf.set(topkKey, "false")
    spark.conf.set(wglKey, "-1")
    try {
      val bad = rankOneOffenders(r9Shape().queryExecution.optimizedPlan)
      assert(bad.nonEmpty,
        "detector lost its teeth: the r9 rank-1 window was not flagged")
    } finally {
      spark.conf.set(key, "true")
      spark.conf.set(topkKey, "true")
      spark.conf.unset(wglKey)
    }
    // with the rewrite on: same code, no rank-1 form — and the plan is
    // a real aggregate (the partial-agged argmin)
    val fixedPlan = r9Shape().queryExecution.optimizedPlan
    assert(rankOneOffenders(fixedPlan).isEmpty,
      "ArgminRewrite did not claim the r9 shape:\n" + fixedPlan)
    assert(fixedPlan.collectFirst {
      case a: Aggregate if a.groupingExpressions.nonEmpty => a
    }.nonEmpty, "expected the min(struct) aggregate form:\n" + fixedPlan)
    // and the rewrite is VALUE-correct vs the raw window form
    spark.conf.set(key, "false")
    spark.conf.set(topkKey, "false")
    val want =
      try r9Shape().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      finally { spark.conf.set(key, "true"); spark.conf.set(topkKey, "true") }
    val got = r9Shape().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(want), "agg-form argmin diverged from the window form")
  }

  test("ArgminRewrite's direction flip is exact at Long.MinValue " +
      "(r12, ADVICE-r11: BitwiseNot, not UnaryMinus)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits._
    // mixed directions (v desc + tag asc) force the flip path under
    // the min-form; v carries Long.MinValue/MaxValue. UnaryMinus wraps
    // -MinValue back to MinValue, ordering the maximum-seeking key's
    // extreme value FIRST under min — the wrong row wins keys 1 and 2.
    // BitwiseNot (~x = -1 - x) reverses the full range bijectively.
    def shape() = {
      val df = Seq(
        (1L, Long.MinValue, "min"), (1L, -5L, "neg"), (1L, 7L, "pos"),
        (2L, Long.MinValue, "min2"), (2L, Long.MaxValue, "max2"),
        (3L, 0L, "zero")).toDF("k", "v", "tag")
      val w = W.partitionBy(col("k")).orderBy(col("v").desc, col("tag"))
      df.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("k"), col("tag"))
    }
    val plan = shape().queryExecution.optimizedPlan.toString
    assert(plan.contains("__graft_argmin"),
      "the flip case no longer reaches ArgminRewrite:\n" + plan)
    val got = shape().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "pos"), (2L, "max2"), (3L, "zero")),
      s"flip ordering wrong at the integer extremes: $got")
  }

  test("the guard has teeth: the pre-fix a16 plan shape is flagged") {
    import org.apache.spark.sql.functions._
    // the r9 straggler in miniature: a one-row sketch relation whose
    // array is folded INSIDE the probe-side aggregate instead of
    // being hoisted onto the sketch relation
    val sketch = spark.range(64).agg(collect_list(col("id")).as("arr"))
    val probes = spark.range(10000).select(col("id").as("k"))
    val bad = probes.crossJoin(broadcast(sketch))
      .agg(max(expr("aggregate(arr, 0L, (a, x) -> a + x)")).as("pop"))
    val hits = bad.queryExecution.optimizedPlan.collect {
      case a: Aggregate if !a.child.maxRows.contains(1L) =>
        (a.aggregateExpressions ++ a.groupingExpressions)
          .flatMap(_.collect { case f: ArrayAggregate => f })
          .filter(f => rowInvariant(a.child, f.references))
    }.flatten
    assert(hits.nonEmpty,
      "detector lost its teeth: the a16-shaped row-invariant fold " +
        "was not flagged")
    // and the FIXED shape (fold hoisted onto the one-row relation,
    // scalar joined in) is clean
    val good = probes
      .crossJoin(broadcast(sketch.select(
        expr("aggregate(arr, 0L, (a, x) -> a + x)").as("pop"))))
      .agg(max(col("pop")).as("pop"))
    val cleanHits = good.queryExecution.optimizedPlan.collect {
      case a: Aggregate if !a.child.maxRows.contains(1L) =>
        (a.aggregateExpressions ++ a.groupingExpressions)
          .flatMap(_.collect { case f: ArrayAggregate => f })
          .filter(f => rowInvariant(a.child, f.references))
    }.flatten
    assert(cleanHits.isEmpty, "the hoisted shape must not be flagged")
  }
}
