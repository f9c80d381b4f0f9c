package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: recognize the idiomatic per-key top-k formulation
  *
  * {{{ df.withColumn("rn", row_number().over(Window.partitionBy(k).orderBy(o)))
  *       .filter($"rn" <= k).drop("rn") }}}
  *
  * (logical shape `Project(cols, Filter(rn cmp lit, Window([row_number])))`
  * with the rank column dropped) and replace it with the engine's
  * [[TopKPerKey]] operator — per-key bounded heaps instead of a full
  * per-partition sort. Spark's own InferWindowGroupLimit (3.5+) only
  * *prunes* rows entering the sort (WindowGroupLimit still sorts); this
  * rewrite removes the sort entirely. Users keep writing the idiomatic
  * window form and get the heap plan for free.
  *
  * Safety conditions (no rewrite otherwise):
  *  - exactly one window expression, and it is `row_number()` with the
  *    default running-rows frame;
  *  - the partition spec is non-empty (global top-k belongs to
  *    TakeOrderedAndProject) and the order spec is non-empty;
  *  - the filter tests ONLY the rank attribute against an int literal
  *    (`<=, <, =1, >=, >` mirrored forms);
  *  - the projection drops the rank attribute and references only the
  *    window child's columns;
  *  - the rank alias is not the fallback marker `__graft_rn`
  *    ([[TopK.perKeyWindow]] — the guard's spillable escape hatch must
  *    not be rewritten back into the heap it is escaping);
  *  - `graft.topk.rewrite.enabled` (default true) is not set to false.
  *
  * Tie semantics: among order-equal rows, row_number picks an arbitrary
  * winner and so does the heap — the same nondeterminism class, decided
  * per-row instead of post-sort. Callers wanting determinism add a
  * unique tiebreak to the order, exactly as with row_number.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private val enabledKey = "graft.topk.rewrite.enabled"

  private def limitFrom(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn && k == 1 => Some(1)
    case EqualTo(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn && k == 1 => Some(1)
    case _ => None
  }

  private def isRowNumberFrame(f: Expression): Boolean = f match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case UnspecifiedFrame => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(enabledKey, "true").toBoolean) return plan
    plan.transformUp {
      case Project(projectList,
          Filter(cond,
            Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(parts, order, frame)), name)), _, _, wchild, _)))
          if name != "__graft_rn" && parts.nonEmpty && order.nonEmpty &&
            isRowNumberFrame(frame) &&
            cond.references.toSeq.forall(_.exprId == alias.exprId) &&
            projectList.forall(_.references.subsetOf(wchild.outputSet)) &&
            limitFrom(cond, alias.exprId).exists(_ > 0) =>
        // InferWindowGroupLimit may already have inserted its sort-side
        // row pruner under the Window — redundant below a heap, strip it
        val child = wchild match {
          case WindowGroupLimit(_, _, _, _, c) => c
          case c => c
        }
        val k = limitFrom(cond, alias.exprId).get
        Project(projectList, TopKPerKey(parts, order, k, child))

      // The decorrelated-LATERAL shape (r11): Catalyst plans
      // `LATERAL (... ORDER BY o LIMIT k)` as a GLOBAL Sort below an
      // ORDER-LESS row_number window — rank-in-global-order per key.
      // InferWindowGroupLimit needs an in-spec order and skips it, so
      // without this case the plan full-sorts AND full-shuffles the
      // inner table. Lifting the Sort's keys into TopKPerKey yields
      // the partial-heaped per-key top-k and drops the global sort
      // (its output order is already destroyed by the window's own
      // partition-clustering; no operator above can rely on it).
      case whole @ Project(projectList,
          Filter(cond,
            Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(parts, Seq(), frame)), name)), _, _,
              wchild, _)))
          if name != "__graft_rn" && parts.nonEmpty &&
            isRowNumberFrame(frame) &&
            cond.references.toSeq.forall(_.exprId == alias.exprId) &&
            projectList.forall(_.references.subsetOf(wchild.outputSet)) &&
            limitFrom(cond, alias.exprId).exists(_ > 0) =>
        val k = limitFrom(cond, alias.exprId).get
        wchild match {
          case proj @ Project(innerList, Sort(sortOrder, true, schild, _))
              if sortOrder.forall(_.references.subsetOf(schild.outputSet)) &&
                innerList.forall(_.references.subsetOf(schild.outputSet)) &&
                parts.forall(_.references.subsetOf(schild.outputSet)) =>
            Project(projectList,
              Project(innerList, TopKPerKey(parts, sortOrder, k, schild)))
          case Sort(sortOrder, true, schild, _)
              if parts.forall(_.references.subsetOf(schild.outputSet)) =>
            Project(projectList, TopKPerKey(parts, sortOrder, k, schild))
          case _ => whole
        }

      // Key-only predicate pushdown through the custom node: a filter
      // referencing ONLY the partition keys drops or keeps WHOLE
      // groups, so it commutes with per-key top-k — and Catalyst's
      // own PushDownPredicates cannot see through an unknown node, so
      // without this case an inferred join-key filter (the
      // decorrelated-LATERAL plan above) parks ABOVE the heap and the
      // scan ranks 100 % of the keys to keep a slice. Fixpoint batch
      // membership makes this compose: Infer Filters lands the
      // predicate, the next operator-optimization pass moves it below
      // here, the one after pushes it into the scan.
      case Filter(cond, t @ TopKPerKey(keys, _, _, child))
          if cond.deterministic &&
            cond.references.subsetOf(AttributeSet(
              keys.flatMap(_.references))) =>
        t.withNewChildren(Seq(Filter(cond, child)))
    }
  }
}
