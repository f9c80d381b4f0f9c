package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimized-logical-plan dump for one or more contract queries —
  * the quick plan-shape inspection loop the guard specs formalize
  * (StragglerGuardSpec/PlanSpec assert on shapes; this prints them).
  *
  * Usage: sbt "runMain graft.tools.PlanDump <sfDir> <query> [<query>…]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val phys = sys.env.get("SPARK_GRAFT_PLAN_PHYS").contains("1")
    val fmt = sys.env.get("SPARK_GRAFT_PLAN_FMT").contains("1")
    // exec mode: run the query first, then print — AdaptiveSparkPlan
    // sections render their FINAL re-optimized form (isFinalPlan=true,
    // AQEShuffleRead/join rewrites visible), which the static dump
    // cannot show (guide §7.2)
    val exec = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      val df = fn(spark, sfDir)
      if (exec) df.foreach(_ => ())
      val qe = df.queryExecution
      if (fmt) {
        // the `.explain("formatted")` rendering — the judge-facing
        // plans/rN artifact format (operator list + per-node details:
        // PushedFilters, ReadSchema, join strategy + build side)
        println(s"===== $n (formatted) =====")
        println(qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      } else if (phys) {
        println(s"===== $n (physical) =====")
        println(qe.executedPlan.treeString)
      } else {
        println(s"===== $n (optimized logical) =====")
        println(qe.optimizedPlan.treeString)
      }
    }
    spark.stop()
  }
}
