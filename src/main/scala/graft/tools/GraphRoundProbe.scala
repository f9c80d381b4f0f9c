package graft.queries // private[queries] access to the graph pieces

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** g05-family round-cost attribution probe (r12, guide §1). The BFS
  * family reads 20–47 s of executor CPU per query at sf0.1 while its
  * nominal row volume (|E| per round) prices at ~1–2 s — this probe
  * counts the ACTUAL per-round volumes and times each round with its
  * inputs pre-materialized, so the gap is attributed (cache misses,
  * re-evaluation, join strategy) instead of guessed.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.queries.GraphRoundProbe /root/testdata/sf0.1"
  */
object GraphRoundProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-graph-round-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
    def cpuSnap(): Map[Long, Long] = {
      val ids = tmx.getAllThreadIds
      tmx.getThreadInfo(ids).zip(ids).collect {
        case (info, id) if info != null &&
          info.getThreadName.startsWith("Executor task launch worker") =>
          id -> tmx.getThreadCpuTime(id)
      }.toMap
    }
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val c0 = cpuSnap()
      val out = body
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = cpuSnap().map { case (id, v) =>
        math.max(0L, v - c0.getOrElse(id, 0L)) }.sum / 1e9
      println(f"[roundprobe] $name%-34s wall=$dt%6.2f cpu=$dc%6.2f")
      out
    }

    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val lineitem = graft.Tables.t(spark, sfDir, "lineitem")
    val orders = graft.Tables.t(spark, sfDir, "orders")

    // ---- bisect: chain compute vs persist write vs cache read
    locally {
      def chain() = {
        val li = lineitem.select(col("l_orderkey"), col("l_suppkey"))
        val ord = orders.select(col("o_orderkey"), col("o_custkey"))
        val p = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("src"),
            (col("o_custkey") + Graph.custOffset).as("dst"))
          .distinct()
        p.union(p.select(col("dst").as("src"), col("src").as("dst")))
      }
      val g0 = gcMs()
      timed("A chain count uncached")(chain().foreach(_ => ()))
      val g1 = gcMs()
      val c = chain().persist()
      timed("B chain persist+count")(c.count())
      val g2 = gcMs()
      timed("C cached groupBy(src) agg") {
        c.groupBy(col("src")).agg(count(lit(1))).foreach(_ => ())
      }
      val g3 = gcMs()
      timed("D cached groupBy again") {
        c.groupBy(col("src")).agg(count(lit(1))).foreach(_ => ())
      }
      val g4 = gcMs()
      println(s"[roundprobe] gc deltas ms: A=${g1-g0} B=${g2-g1} C=${g3-g2} D=${g4-g3}")
      c.unpersist(true)
      val e = timed("E chain localCheckpoint")(chain().localCheckpoint())
      timed("F lc groupBy(src) agg") {
        e.groupBy(col("src")).agg(count(lit(1))).foreach(_ => ())
      }
      timed("G lc groupBy again") {
        e.groupBy(col("src")).agg(count(lit(1))).foreach(_ => ())
      }
      val s = timed("H chain persist SER+count") {
        val x = chain().persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        x.count(); x
      }
      timed("I ser groupBy(src) agg") {
        s.groupBy(col("src")).agg(count(lit(1))).foreach(_ => ())
      }
      s.unpersist(true)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    // replicate bfsHopsDf exactly, but count + time each round
    val li = lineitem.select(col("l_orderkey"), col("l_suppkey"))
    val ord = orders.select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("src"),
        (col("o_custkey") + Graph.custOffset).as("dst"))
      .distinct()
    val und = pairs.union(pairs.select(col("dst").as("src"),
      col("src").as("dst"))).persist()
    timed("und materialize")(println(s"[roundprobe]   und rows=${und.count()}"))
    val seeds = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("node"))
      .limit(Graph.bfsSeeds)
    var dist = seeds.select(col("node"), lit(0L).as("hop")).persist()
    timed("seed materialize")(println(s"[roundprobe]   dist0 rows=${dist.count()}"))
    for (r <- 1 to Graph.bfsRounds) {
      val next = dist.filter(col("hop") === (r - 1)).as("f")
        .join(und.as("u"), col("f.node") === col("u.src"))
        .select(col("u.dst").as("node"), lit(r.toLong).as("hop"))
      timed(s"round $r expansion count") {
        println(s"[roundprobe]   next$r rows=${next.count()}")
      }
      dist = dist.union(next)
        .groupBy(col("node")).agg(min(col("hop")).as("hop"))
        .persist()
      timed(s"round $r dist materialize") {
        println(s"[roundprobe]   dist$r rows=${dist.count()}")
      }
    }
    timed("final output (all cached)") {
      dist.select(col("node"), col("hop"),
        when(col("node") >= Graph.custOffset, "customer")
          .otherwise("supplier").as("role"))
        .orderBy("node").foreach(_ => ())
    }
    // the contract query end-to-end, fresh caches, for comparison
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    timed("g05 contract end-to-end") {
      Graph.bfsHops(spark, sfDir).foreach(_ => ())
    }
    spark.stop()
  }
}
