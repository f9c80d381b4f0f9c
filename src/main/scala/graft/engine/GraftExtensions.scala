package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, SquaredNorm}

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
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.DistinctWindowRewrite)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_norm2"),
      new ExpressionInfo(classOf[SquaredNorm].getName, "graft_norm2"),
      (args: Seq[Expression]) => SquaredNorm(args.head)))
  }
}
