package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, FixedPointDot, FixedPointSqDist,
  HammingDistance, NearestCell, PortableBloom, PortableCountMin,
  PortableHll, SquaredNorm}

/** SparkSessionExtensions entry point (SURVEY.md §7.1): registers the
  * engine's native expressions into the SQL function registry so the
  * pure-SQL surface can call them too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT graft_dot(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>))")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // ArgminRewrite claims rank-1 shapes first (partial-agged argmin —
    // one row per key per map partition enters the exchange);
    // TopKRewrite takes what it bails on (k > 1, mixed un-flippable
    // directions) as the bounded heap
    ext.injectOptimizerRule(_ => graft.plans.ArgminRewrite)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.DistinctWindowRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_norm2"),
      new ExpressionInfo(classOf[SquaredNorm].getName, "graft_norm2"),
      (args: Seq[Expression]) => SquaredNorm(args.head)))
    // exact fixed-point vector arithmetic (the engine-portable forms)
    ext.injectFunction((
      new FunctionIdentifier("graft_fp_dot"),
      new ExpressionInfo(classOf[FixedPointDot].getName, "graft_fp_dot"),
      (args: Seq[Expression]) => FixedPointDot(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_fp_sqdist"),
      new ExpressionInfo(classOf[FixedPointSqDist].getName,
        "graft_fp_sqdist"),
      (args: Seq[Expression]) => FixedPointSqDist(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName,
        "graft_hamming"),
      (args: Seq[Expression]) => HammingDistance(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_nearest_cell"),
      new ExpressionInfo(classOf[NearestCell].getName,
        "graft_nearest_cell"),
      (args: Seq[Expression]) => NearestCell(args(0), args(1))))
    // the portable sketch AGGREGATES: the analyzer wraps a returned
    // AggregateFunction in its AggregateExpression, so plain SQL can
    // GROUP BY with them — SELECT graft_portable_hll(k) FROM t GROUP BY g
    ext.injectFunction((
      new FunctionIdentifier("graft_portable_hll"),
      new ExpressionInfo(classOf[PortableHll].getName,
        "graft_portable_hll"),
      (args: Seq[Expression]) => PortableHll(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_portable_hll_regs"),
      new ExpressionInfo(classOf[PortableHll].getName,
        "graft_portable_hll_regs"),
      (args: Seq[Expression]) =>
        PortableHll(args.head, emitRegisters = true)))
    ext.injectFunction((
      new FunctionIdentifier("graft_portable_cms"),
      new ExpressionInfo(classOf[PortableCountMin].getName,
        "graft_portable_cms"),
      (args: Seq[Expression]) => PortableCountMin(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_portable_bloom"),
      new ExpressionInfo(classOf[PortableBloom].getName,
        "graft_portable_bloom"),
      (args: Seq[Expression]) => PortableBloom(args.head)))
  }
}
