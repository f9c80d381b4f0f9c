package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only per-query job/stage profiler (NOT part of the engine
  * surface): the c8-vs-c32 bench showed most of the suite is
  * driver/job-count bound at sf0.1, not executor-CPU bound, so wall
  * there moves by cutting ACTIONS and EXCHANGES, not per-row work
  * (VERDICT-r12 ask #5). For each named query this runs one untimed
  * warm rep, then one timed rep with a listener counting Spark jobs,
  * stages and tasks, and prints them next to the wall — queries whose
  * job count exceeds the one-action ideal (1 job + AQE re-plans) pay
  * driver round-trips that a plan restructure can remove.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.JobCountProbe <sfDir> <q> [<q>…]"
  * Query args accept family prefixes ("q" = every q-family query).
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobcount-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sel = args.drop(1).toSeq
    val names = graft.SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      sel.isEmpty || sel.exists(s => n == s || n.startsWith(s))
    }

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized {
          stages += 1
          tasks += s.stageInfo.numTasks
        }
    }
    spark.sparkContext.addSparkListener(listener)
    println(f"${"query"}%-28s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def sweep(): Unit = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
      fn(spark, sfDir).foreach(_ => ()) // warm rep: JIT + codegen
      sweep()
      spark.sparkContext.listenerBus.waitUntilEmpty(60000)
      synchronized { jobs = 0; stages = 0; tasks = 0 }
      val t0 = System.nanoTime()
      fn(spark, sfDir).foreach(_ => ())
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.listenerBus.waitUntilEmpty(60000)
      println(f"$n%-28s $dt%7.2f $jobs%5d $stages%7d $tasks%6d")
      sweep()
    }
    spark.stop()
  }
}
