package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only g18 peel profiler (NOT part of the engine surface): runs
  * the EXACT ktruss round structure and prints, per round, the
  * surviving edge count, the peeled count and the round wall — the
  * evidence for the early-stop keep/reject decision (VERDICT-r9 ask
  * #6: on dense/replicated support distributions the quantile peel
  * stops shrinking, so late rounds may be near-no-ops). An
  * output-pinned early stop may only fire at an EXACT fixed point
  * (a round that peels zero edges reproduces the same support
  * relation forever after); this probe measures whether that point is
  * reached within trussRounds and what the skipped rounds would cost.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.TrussProbe <sfDir>"
  */
object TrussProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-truss-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.ConnectedComponents.{free, truncateTracked}
    import graft.queries.Graph
    val sc = spark.sparkContext
    val lineitem = graft.Tables.t(spark, sfDir, "lineitem")

    var t0 = System.nanoTime()
    def lap(tag: String, extra: String = ""): Unit = {
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[truss-probe] $tag%-14s ${dt}%8.2f s $extra")
      t0 = System.nanoTime()
    }

    var o = Graph.orientedEdgesDf(lineitem).persist()
    var nEdges = o.count()
    lap("edges", s"n=$nEdges")
    var (supp, blocks) = truncateTracked(Graph.edgeSupportsOf(o))
    lap("support r1", s"triEdges=${supp.count()}")
    val tVal = supp.groupBy(col("support")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("support"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(lit(1))))
      .filter(expr("cum - cnt < (n + 3) div 4 AND (n + 3) div 4 <= cum"))
      .select(col("support").as("t"))
      .persist()
    tVal.count()
    lap("threshold", s"t=${tVal.head().getLong(0)}")
    for (r <- 2 to Graph.trussRounds) {
      val surv = supp.crossJoin(broadcast(tVal))
        .filter(col("support") >= col("t"))
        .select(col("a"), col("b"))
      val oNext = o.join(surv,
          least(col("u"), col("v")) === col("a") &&
          greatest(col("u"), col("v")) === col("b"), "left_semi")
        .persist()
      val nNext = oNext.count()
      lap(s"survive r$r",
        s"n=$nNext peeled=${nEdges - nNext} fixedPoint=${nNext == nEdges}")
      val (suppNext, nb) = truncateTracked(Graph.edgeSupportsOf(oNext))
      suppNext.count()
      lap(s"support r$r")
      free(sc, blocks)
      o.unpersist(false)
      supp = suppNext; blocks = nb; o = oNext; nEdges = nNext
    }
    spark.stop()
  }
}
