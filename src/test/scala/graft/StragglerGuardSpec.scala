package graft

import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}

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
