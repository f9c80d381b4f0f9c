package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectSet, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: recognize the idiomatic running count-distinct
  *
  * {{{ df.withColumn("nd", size(collect_set(x).over(
  *       Window.partitionBy(p).orderBy(o)
  *             .rowsBetween(unboundedPreceding, currentRow)))) }}}
  *
  * and replace it with the bounded first-occurrence decomposition: a
  * row_number over (p, x) marks each value's first appearance in the
  * timeline, and a running sum of those flags over (p) is the distinct
  * count. The natural formulation materializes the DISTINCT SET per
  * row — O(distinct values) of window state and array output per row,
  * a scale-killer on high-cardinality columns; the decomposition is
  * two plain rank/sum windows with O(1) state (the q46 shape). Users
  * keep writing the readable form and get the bounded plan for free —
  * the [[TopKRewrite]] philosophy applied to a second native gap
  * (Spark has no DISTINCT window aggregates, so collect_set is the
  * only one-line spelling).
  *
  * Safety conditions (no rewrite otherwise):
  *  - the Window node carries exactly ONE window expression and it is
  *    `collect_set(x)` (no DISTINCT flag, no FILTER clause) over a
  *    ROWS UNBOUNDED PRECEDING..CURRENT ROW frame with a non-empty
  *    order (a RANGE frame shares tie rows' sets — the row-wise
  *    decomposition would differ mid-tie, so it is left alone);
  *  - x is deterministic;
  *  - the set itself never escapes: every reference to the window
  *    column in the parent Project is exactly `size(<attr>)` — any
  *    other use (the array itself, array_contains, …) disables the
  *    rewrite;
  *  - `graft.distinctwindow.rewrite.enabled` (default true).
  *
  * Semantics preserved: collect_set drops nulls (the flag is 0 for
  * null x); the frame always contains the current row, so the sum is
  * never null; size() returns INT, so the LONG sum is cast back.
  * Tied order keys: the original plan is itself nondeterministic
  * mid-tie, but always counts the current row's value; the rewrite
  * appends the first-seen flag DESC to window 2's ordering so flagged
  * rows precede their unflagged tie-peers and every emitted count is
  * one the original plan could produce (in particular never 0 for a
  * non-null current value).
  */
object DistinctWindowRewrite extends Rule[LogicalPlan] {

  private val enabledKey = "graft.distinctwindow.rewrite.enabled"

  private def isCumulativeRowFrame(f: Expression): Boolean = f match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(enabledKey, "true").toBoolean) return plan
    plan.transformUp {
      case p @ Project(projectList,
          Window(Seq(alias @ Alias(WindowExpression(
              AggregateExpression(CollectSet(x, _, _), _, false, None, _),
              WindowSpecDefinition(parts, order, frame)), _)), _, _, wchild, _))
          if order.nonEmpty && isCumulativeRowFrame(frame) &&
            x.deterministic && x.references.subsetOf(wchild.outputSet) =>
        // every use of the set column must be size(set); count them to
        // prove no bare reference survives
        var sized = 0
        val replaced = projectList.map(_.transform {
          case Size(ar: AttributeReference, _) if ar.exprId == alias.exprId =>
            sized += 1
            UnresolvedSizePlaceholder
        }.asInstanceOf[NamedExpression])
        val bareRefs = replaced.exists(
          _.references.exists(_.exprId == alias.exprId))
        if (sized == 0 || bareRefs) p
        else {
          // window 1: first occurrence of x within (parts, x)
          val rn = Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(parts :+ x, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
            "__graft_dw_rn")()
          val w1 = Window(Seq(rn), parts :+ x, order, wchild, None)
          // flag: 1 for the first non-null occurrence, else 0
          val flag = Alias(
            If(And(IsNotNull(x), EqualTo(rn.toAttribute, Literal(1))),
              Literal(1L, LongType), Literal(0L, LongType)),
            "__graft_dw_flag")()
          val proj1 = Project(wchild.output :+ flag, w1)
          // window 2: running sum of flags over the original partition.
          // The flag is appended DESC as a secondary sort so a flagged
          // row always precedes its unflagged tie-peers: with tied
          // order keys, windows 1 and 2 are separate shuffles that may
          // resolve ties differently, and without this a row could be
          // summed before the tie-peer carrying its first-seen flag —
          // yielding a count of 0, a value impossible under the
          // original size(collect_set) plan (whose frame always
          // contains the current row). With the tiebreaker every
          // prefix ending in a tie group has all of the group's flags
          // in view, so counts stay within the original plan's
          // achievable range; for unique order keys the extra key is
          // inert.
          // the extended order must go on the Window NODE, not only the
          // expression's spec: WindowExec derives requiredChildOrdering
          // from the node-level orderSpec (the spec inside the
          // expression only contributes the frame), so a tiebreaker
          // placed solely in the spec never reaches the child sort
          val order2 = order :+ SortOrder(flag.toAttribute, Descending)
          val sumA = Alias(WindowExpression(
            AggregateExpression(Sum(flag.toAttribute), aggregate.Complete,
              isDistinct = false),
            WindowSpecDefinition(parts, order2, frame)),
            "__graft_dw_sum")()
          val w2 = Window(Seq(sumA), parts, order2, proj1, None)
          val finalList = replaced.map(_.transform {
            case UnresolvedSizePlaceholder =>
              Cast(sumA.toAttribute, IntegerType)
          }.asInstanceOf[NamedExpression])
          Project(finalList, w2)
        }
    }
  }

  /** Marker swapped in for `size(set)` during the two-phase transform
    * (the sum attribute does not exist yet on the first pass). Never
    * survives into the returned plan. */
  private case object UnresolvedSizePlaceholder extends LeafExpression
      with Unevaluable {
    override def nullable: Boolean = false
    override def dataType: org.apache.spark.sql.types.DataType = IntegerType
  }
}
