package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite the rank-1 window idiom
  *
  * {{{ df.withColumn("rk", row_number().over(Window.partitionBy(k).orderBy(o)))
  *       .filter($"rk" === 1).drop("rk") }}}
  *
  * into a PARTIAL-AGGREGATED argmin —
  * `groupBy(k).agg(min(struct(o…, payload…)))` + a projection back out
  * of the struct. This generalizes the r10 `assignCells` fix
  * (VERDICT-r10 ask #7, the second hand-instance of the class after
  * the a16 popcount hoist): a rank-1 window — even as [[TopKPerKey]]'s
  * bounded heap — SHUFFLES every input row and only then discards all
  * but one per key, while the aggregate form collapses to one row per
  * key per map partition BEFORE the exchange. At the corpus sizes this
  * engine targets that is the difference between shuffling n·nCells
  * rows and n rows (measured 1.29–1.72× at sf0.1 on the assignCells
  * family, SCALING.md r10); the map side pays one spillable hash/sort
  * aggregation, which Spark's agg machinery already bounds.
  *
  * Equivalence: `min(struct(o₁…oₖ, payload…))` IS
  * "ORDER BY o₁…oₖ … rank = 1" — struct comparison is lexicographic,
  * and Spark's struct ordering sorts a null field first, which matches
  * the `Ascending/NullsFirst` sort default exactly (`max` matches
  * `Descending/NullsLast` — null loses to every value). Among
  * order-equal rows row_number picks an arbitrary winner and the
  * struct-min picks the lexicographically smallest payload — the same
  * nondeterminism class TopKRewrite documents; callers wanting
  * determinism add a unique tiebreak, exactly as with row_number.
  *
  * Safety conditions (bail → [[TopKRewrite]] takes the shape as a
  * k=1 heap, and StragglerGuardSpec flags it for a hand-fix):
  *  - the TopKRewrite preconditions (single row_number window expr,
  *    default frame, non-empty partition + order specs, the filter
  *    tests only the rank attribute — here against exactly 1 — the
  *    projection drops the rank and references only child columns);
  *  - every sort key and every projected payload column is orderable
  *    (no maps) and deterministic;
  *  - sort directions are homogeneous after flips: every key either
  *    carries the Spark default matching the chosen aggregate
  *    (Ascending/NullsFirst under min, Descending/NullsLast under
  *    max), or is a NON-NULLABLE int/bigint in the opposite default
  *    direction, which [[BitwiseNot]] flips exactly (~x = -1 - x, a
  *    bijective order-REVERSING map on the full two's-complement
  *    range — where unary minus wraps at Int/Long.MinValue and would
  *    order the minimum as the extreme opposite, ADVICE-r11;
  *    non-nullable because a null would jump from last to first;
  *    integral because float negation at ±0.0/NaN needs care — the
  *    engine's rank keys are fixed-point BIGINTs by design).
  *
  * `graft.argmin.rewrite.enabled` (default true) disables the rule
  * (StragglerGuardSpec uses this to prove its detector has teeth).
  */
object ArgminRewrite extends Rule[LogicalPlan] {

  private val enabledKey = "graft.argmin.rewrite.enabled"

  /** The filter bounds the rank attribute to exactly rank 1. */
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

  private def isRowNumberFrame(f: Expression): Boolean = f match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case UnspecifiedFrame => true
    case _ => false
  }

  /** The struct field realizing sort key `so` under aggregate
    * direction `asc` (true = min), or None if the key can't
    * participate (see the class scaladoc's flip rules). */
  private def fieldFor(so: SortOrder, asc: Boolean): Option[Expression] = {
    val matches =
      if (asc) so.direction == Ascending && so.nullOrdering == NullsFirst
      else so.direction == Descending && so.nullOrdering == NullsLast
    val opposite =
      if (asc) so.direction == Descending && so.nullOrdering == NullsLast
      else so.direction == Ascending && so.nullOrdering == NullsFirst
    val flippable = !so.child.nullable &&
      (so.child.dataType == IntegerType || so.child.dataType == LongType)
    if (matches) Some(so.child)
    else if (opposite && flippable) Some(BitwiseNot(so.child))
    else None
  }

  /** All keys realized under one direction: exact-default first (no
    * flips), then the flipped variants; None → bail. */
  private def orderFields(order: Seq[SortOrder]): Option[(Boolean, Seq[Expression])] = {
    def exact(asc: Boolean) = order.forall(so =>
      if (asc) so.direction == Ascending && so.nullOrdering == NullsFirst
      else so.direction == Descending && so.nullOrdering == NullsLast)
    if (exact(asc = true)) Some((true, order.map(_.child)))
    else if (exact(asc = false)) Some((false, order.map(_.child)))
    else {
      val asMin = order.map(fieldFor(_, asc = true))
      if (asMin.forall(_.isDefined)) Some((true, asMin.map(_.get)))
      else {
        val asMax = order.map(fieldFor(_, asc = false))
        if (asMax.forall(_.isDefined)) Some((false, asMax.map(_.get)))
        else None
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(enabledKey, "true").toBoolean) return plan
    plan.transformUp {
      case p @ Project(projectList,
          Filter(cond,
            Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(parts, order, frame)), name)), _, _, wchild, _)))
          if name != "__graft_rn" && parts.nonEmpty && order.nonEmpty &&
            isRowNumberFrame(frame) &&
            cond.references.toSeq.forall(_.exprId == alias.exprId) &&
            boundsToOne(cond, alias.exprId) &&
            projectList.forall(_.references.subsetOf(wchild.outputSet)) &&
            parts.forall(_.deterministic) &&
            order.forall(_.child.deterministic) =>
        val child = wchild match {
          case WindowGroupLimit(_, _, _, _, c) => c
          case c => c
        }
        // payload = exactly the child columns the projection reads
        // (keeps the agg state narrow and the orderability check
        // scoped to what actually enters the struct)
        val needed = AttributeSet(projectList.flatMap(_.references))
        val payload = child.output.filter(needed.contains)
        val ok = for {
          (asc, keys) <- orderFields(order)
          if (keys ++ payload).forall(e => RowOrdering.isOrderable(e.dataType))
          if projectList.forall {
            case _: AttributeReference => true
            case _: Alias => true
            case _ => false
          }
        } yield (asc, keys)
        ok match {
          case None => p // bail — TopKRewrite takes it as a k=1 heap
          case Some((asc, keys)) =>
            val fields = keys.zipWithIndex.map { case (e, i) => s"o$i" -> e } ++
              payload.zipWithIndex.map { case (a, i) => s"p$i" -> (a: Expression) }
            val struct = CreateNamedStruct(fields.flatMap { case (n, e) =>
              Seq(Literal(n), e) })
            val aggFn = if (asc) Min(struct) else Max(struct)
            val mAlias = Alias(aggFn.toAggregateExpression(), "__graft_argmin")()
            val agg = Aggregate(parts, Seq(mAlias), child)
            val m = mAlias.toAttribute
            val repl: Map[ExprId, Expression] =
              payload.zipWithIndex.map { case (a, i) =>
                a.exprId -> (GetStructField(m, keys.size + i,
                  Some(s"p$i")): Expression)
              }.toMap
            val rebuilt = projectList.map {
              case a: AttributeReference =>
                Alias(repl(a.exprId), a.name)(a.exprId, a.qualifier)
              case al @ Alias(c, aname) =>
                val nc = c.transform {
                  case a: AttributeReference if repl.contains(a.exprId) =>
                    repl(a.exprId)
                }
                Alias(nc, aname)(al.exprId, al.qualifier)
            }
            Project(rebuilt, agg)
        }
    }
  }
}
