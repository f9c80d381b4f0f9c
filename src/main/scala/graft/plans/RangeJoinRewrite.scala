package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: recognize the declarative sliding-window (as-of /
  * lookback / symmetric-interval) inequality join
  *
  * {{{ a.join(b, keyEq... && b.t <= a.t + W2 && b.t >= a.t - W1) }}}
  *
  * (`W2 = 0` is the as-of lookback; `W1 = W2` the symmetric fuzzy
  * timestamp match) — what users naturally write for "events of `b`
  * within the window around each row of `a`" — and rewrite it into
  * the banded form: the
  * anchor side explodes into its two covering `W`-width time buckets,
  * the ranged side computes its single bucket, and the join gains a
  * bucket EQUI-key with the original range predicates kept as
  * residual. Every join bucket is then bounded by one (key, window)
  * cell of rows instead of a full per-key (or, with no equi key, full
  * cartesian) pairing:
  *
  *  - with equi keys, Spark plans the naive form as a hash/SMJ on the
  *    keys and filters the range per key-group pair — O(|a_k|·|b_k|)
  *    per key, unbounded on active keys;
  *  - with NO equi key it plans BroadcastNestedLoopJoin — O(|a|·|b|).
  *
  * After the rewrite both plan as hash joins on the bucket key. The
  * result multiset is IDENTICAL: a matching pair agrees on exactly
  * one of the anchor's two buckets (the ranged row's own), so no
  * duplicates are introduced, and the retained original predicates
  * filter exactly as before (including null semantics — a null
  * timestamp produces a null bucket, which fails the added equi-key
  * just as the null range predicate failed the original join).
  *
  * Safety conditions (no rewrite otherwise):
  *  - INNER join only (the anchor-row duplication is invisible only
  *    when unmatched rows don't survive);
  *  - the two range conjuncts bound one LongType attribute of one
  *    side to a closed-or-open window `[t − W1, t + W2]` of a
  *    LongType attribute of the other side, `W1, W2 ≥ 0` integer
  *    literals with `W1 + W2 > 0` (strict variants accepted — the
  *    bucket containment argument only needs the interval length
  *    ≤ W1 + W2);
  *  - the condition does not already carry this rule's band key (the
  *    fixed-point guard);
  *  - `graft.rangejoin.rewrite.enabled` (default true) is not false.
  *
  * Overflow safety: the band arithmetic never subtracts a window
  * from a timestamp. The naive spelling `bucket(anchor − W1)` wraps
  * when `anchor` is within `W1` of `Long.MinValue` and would silently
  * DROP pairs the original predicate (in a non-overflowing spelling
  * like `r + W1 >= a`) still matches. Instead the low band is derived
  * from the anchor's own bucket and its in-bucket offset:
  * `low = bucket(anchor) − (pmod(anchor, W) < W1 ? 1 : 0)` — exact
  * (`anchor − W1` leaves the anchor's bucket iff its offset is below
  * `W1`), computed only with `pmod`/`div`/±1-on-bucket-index, all of
  * which stay in range for every Long timestamp (bucket indices are
  * ≤ Long.Max / W for W ≥ 2; W = 1 keeps indices = t and the ±1 at
  * t = Long.MaxValue could only create a FALSE band candidate, which
  * the retained original predicates filter — false negatives are
  * impossible because a matching ranged row's bucket is always one of
  * the two probes). Property-tested at Long-extreme timestamps in
  * RangeJoinRewriteSpec.
  *
  * Bucketing uses true floor division `(t − pmod(t, W)) div W` (not
  * `div`'s truncation toward zero), so negative timestamps band
  * correctly. The q73/q22 manual decomposition is this rule applied
  * by hand; with the rule installed the manual form is no longer
  * required — q73 ships the naive spelling and gets this plan.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val enabledKey = "graft.rangejoin.rewrite.enabled"
  private val bandName = "__graft_band"
  private val bucketName = "__graft_rbucket"

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  /** `(ranged, anchor, W2)` for `ranged <= anchor + W2` (W2 = 0 for
    * the plain `ranged <= anchor`; strict variants accepted). */
  private def asUpper(e: Expression)
      : Seq[(AttributeReference, AttributeReference, Long)] = e match {
    case LessThanOrEqual(r: AttributeReference, l: AttributeReference) =>
      Seq((r, l, 0L))
    case LessThan(r: AttributeReference, l: AttributeReference) =>
      Seq((r, l, 0L))
    case GreaterThanOrEqual(l: AttributeReference, r: AttributeReference) =>
      Seq((r, l, 0L))
    case GreaterThan(l: AttributeReference, r: AttributeReference) =>
      Seq((r, l, 0L))
    case LessThanOrEqual(r: AttributeReference,
        Add(l: AttributeReference, w, _)) =>
      litLong(w).map((r, l, _)).toSeq
    case LessThan(r: AttributeReference,
        Add(l: AttributeReference, w, _)) =>
      litLong(w).map((r, l, _)).toSeq
    case GreaterThanOrEqual(Add(l: AttributeReference, w, _),
        r: AttributeReference) =>
      litLong(w).map((r, l, _)).toSeq
    case GreaterThan(Add(l: AttributeReference, w, _),
        r: AttributeReference) =>
      litLong(w).map((r, l, _)).toSeq
    case LessThanOrEqual(Subtract(r: AttributeReference, w, _),
        l: AttributeReference) =>
      litLong(w).map((r, l, _)).toSeq
    case GreaterThanOrEqual(l: AttributeReference,
        Subtract(r: AttributeReference, w, _)) =>
      litLong(w).map((r, l, _)).toSeq
    case _ => Seq.empty
  }

  /** `(ranged, anchor, W)` for `ranged >= anchor − W` (or strict, or
    * the `ranged + W >= anchor` spelling). */
  private def asLower(e: Expression)
      : Seq[(AttributeReference, AttributeReference, Long)] = e match {
    case GreaterThanOrEqual(r: AttributeReference,
        Subtract(l: AttributeReference, w, _)) =>
      litLong(w).map((r, l, _)).toSeq
    case GreaterThan(r: AttributeReference,
        Subtract(l: AttributeReference, w, _)) =>
      litLong(w).map((r, l, _)).toSeq
    case LessThanOrEqual(Subtract(l: AttributeReference, w, _),
        r: AttributeReference) =>
      litLong(w).map((r, l, _)).toSeq
    case LessThan(Subtract(l: AttributeReference, w, _),
        r: AttributeReference) =>
      litLong(w).map((r, l, _)).toSeq
    case GreaterThanOrEqual(Add(r: AttributeReference, w, _),
        l: AttributeReference) =>
      litLong(w).map((r, l, _)).toSeq
    case LessThanOrEqual(l: AttributeReference,
        Add(r: AttributeReference, w, _)) =>
      litLong(w).map((r, l, _)).toSeq
    case _ => Seq.empty
  }

  /** True floor-division bucket INDEX of `t` at width `w` — exact on
    * longs, floor (not truncate-toward-zero) for negatives. Spelled as
    * truncating `div` with a −1 correction when the remainder is
    * negative, NEVER as `(t − pmod(t, w)) div w`: near Long.MinValue
    * the bucket START is below the Long range even though the index is
    * representable, so the subtraction form overflows (ANSI: throws;
    * legacy: wraps and mis-bands). */
  private def bucket(t: Expression, w: Long): Expression = {
    val q = IntegralDivide(t, Literal(w))
    If(LessThan(Remainder(t, Literal(w)), Literal(0L)),
      Subtract(q, Literal(1L)), q)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(enabledKey, "true").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !cond.references.exists(_.name == bandName) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val windows = for {
          c1 <- conjuncts; (ru, au, w2) <- asUpper(c1)
          c2 <- conjuncts; (rl, al, w1) <- asLower(c2)
          if c1 != c2 && ru.exprId == rl.exprId && au.exprId == al.exprId &&
            w1 >= 0 && w2 >= 0 && w1 + w2 > 0 &&
            ru.dataType == LongType && au.dataType == LongType &&
            ((left.outputSet.contains(au) && right.outputSet.contains(ru)) ||
              (right.outputSet.contains(au) && left.outputSet.contains(ru)))
        } yield (ru, au, w1, w2)
        windows.headOption match {
          case Some((ranged, anchor, w1, w2)) =>
            val w = w1 + w2
            val anchorOnLeft = left.outputSet.contains(anchor)
            val (anchorSide, rangedSide) =
              if (anchorOnLeft) (left, right) else (right, left)
            // anchor side: explode into the two buckets covering
            // [anchor − W1, anchor + W2] — an interval of length
            // exactly W = W1 + W2, so it spans at most two W-buckets
            // starting at the lower end's bucket. The lower end's
            // bucket is computed WITHOUT forming `anchor − W1` (which
            // wraps near Long.MinValue): it is the anchor's own bucket
            // minus one exactly when the anchor's in-bucket offset is
            // below W1 (see the scaladoc overflow-safety note).
            val base = {
              val b0 = bucket(anchor, w)
              if (w1 == 0) b0
              else Subtract(b0,
                If(LessThan(Pmod(anchor, Literal(w)), Literal(w1)),
                  Literal(1L), Literal(0L)))
            }
            val gen = Explode(CreateArray(Seq(
              base, Add(base, Literal(1L)))))
            val el = gen.elementSchema.fields.head
            val bandAttr = AttributeReference(bandName, el.dataType,
              el.nullable)()
            val banded = Generate(gen, Nil, outer = false, None,
              Seq(bandAttr), anchorSide)
            // ranged side: its single bucket
            val bAlias = Alias(bucket(ranged, w), bucketName)()
            val bucketed = Project(rangedSide.output :+ bAlias, rangedSide)
            val newCond = (EqualTo(bandAttr, bAlias.toAttribute) +:
              conjuncts).reduce(And)
            val newJoin =
              if (anchorOnLeft) Join(banded, bucketed, Inner, Some(newCond), hint)
              else Join(bucketed, banded, Inner, Some(newCond), hint)
            Project(j.output, newJoin)
          case _ => j
        }
    }
  }
}
