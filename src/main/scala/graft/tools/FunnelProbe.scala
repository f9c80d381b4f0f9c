package graft.queries // private[queries] access to the funnel pieces

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** e06 stage-cost attribution probe (r12, guide §1: measure first).
  * Times each sub-chain of the quality funnel separately — gate+lang
  * scoring, exact-dedup keeper build, the d02/d07 near-dup chain, the
  * d10-style shingle decontamination — against the full funnel, with
  * executor-thread CPU alongside wall, so funnel optimization targets
  * the measured stage instead of the assumed one.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.queries.FunnelProbe /root/testdata/sf0.1"
  */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-funnel-probe")
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
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def time(name: String)(mk: => DataFrame): Unit = {
      // rep 0 is the untimed warm-up; report min of 2 timed reps
      val reps = (0 to 2).map { _ =>
        val t0 = System.nanoTime(); val c0 = cpuSnap()
        mk.foreach(_ => ())
        val dt = (System.nanoTime() - t0) / 1e9
        val c1 = cpuSnap()
        val dc = c1.map { case (id, v) =>
          math.max(0L, v - c0.getOrElse(id, 0L)) }.sum / 1e9
        sweep()
        (dt, dc)
      }.drop(1)
      println(f"[funnelprobe] $name%-28s wall=${reps.map(_._1).min}%6.2f cpu=${reps.map(_._2).min}%6.2f")
    }

    val docs = graft.Tables.t(spark, sfDir, "documents")
    

    time("gate+lang scan (1 pass)") {
      TextOps.withLangScores(
          TextOps.gateScored(docs).select(col("doc_id"), col("text"),
            col("toks"), col("n_tokens"), col("reason")), "toks")
        .select(col("doc_id"), col("n_tokens"), col("reason"),
          (TextOps.langPred === "en" && col("score_en") > 0).as("lang_ok"))
    }
    def keptDf(): DataFrame = {
      val ok = TextOps.withLangScores(
          TextOps.gateScored(docs).select(col("doc_id"), col("text"),
            col("toks"), col("n_tokens"), col("reason")), "toks")
        .filter(TextOps.langPred === "en" && col("score_en") > 0)
        .filter(col("reason") === "ok")
        .select(col("doc_id"), col("text"), col("n_tokens"))
      val keepers = ok
        .select(col("doc_id"), md5(col("text")).as("h"))
        .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      ok.join(keepers, "doc_id")
    }
    time("kept build (gate+exact)") { keptDf() }
    time("nearDupKeepers(kept)") {
      val kept = keptDf().persist()
      Dedup.nearDupKeepers(kept)
    }
    time("near (kept semi keepers)") {
      val kept = keptDf().persist()
      kept.join(Dedup.nearDupKeepers(kept), Seq("doc_id"), "left_semi")
    }
    time("decon chain (from near)") {
      val kept = keptDf().persist()
      val near = kept.join(Dedup.nearDupKeepers(kept), Seq("doc_id"),
        "left_semi").persist()
      val cand = near.filter(col("doc_id") % Dedup.evalStride =!= 0)
      val evalDocs = docs
        .filter(col("doc_id") % Dedup.evalStride === 0)
        .select(col("doc_id"), col("text"))
      val base = cand.select(col("doc_id"), col("text"))
        .unionByName(evalDocs)
      val shAll = base
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, greatest(size(toks) - 2, 1)),
             i -> concat_ws(' ', slice(toks, i, 3)))""")).as("sh"))
        .distinct()
      val keepSh = shAll.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= Dedup.maxShingleDf)
        .select(col("sh"))
      val sh = shAll.join(keepSh, "sh")
      val evalSh = sh.filter(col("doc_id") % Dedup.evalStride === 0)
        .select(col("sh")).distinct()
      val contaminated = sh.filter(col("doc_id") % Dedup.evalStride =!= 0)
        .join(broadcast(evalSh), Seq("sh"), "left_semi")
        .select(col("doc_id")).distinct()
      cand.join(contaminated, Seq("doc_id"), "left_anti")
    }
    // microscope inside the decon chain: one persisted near, then each
    // sub-relation timed from the shared cache
    locally {
      val kept = keptDf().persist()
      val near = kept.join(Dedup.nearDupKeepers(kept), Seq("doc_id"),
        "left_semi").persist()
      near.count()
      val cand = near.filter(col("doc_id") % Dedup.evalStride =!= 0)
      val evalDocs = docs
        .filter(col("doc_id") % Dedup.evalStride === 0)
        .select(col("doc_id"), col("text"))
      val base = cand.select(col("doc_id"), col("text"))
        .unionByName(evalDocs)
      def shAll() = base
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, greatest(size(toks) - 2, 1)),
             i -> concat_ws(' ', slice(toks, i, 3)))""")).as("sh"))
        .distinct()
      def keepSh() = shAll().groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= Dedup.maxShingleDf)
        .select(col("sh"))
      def sh() = shAll().join(keepSh(), "sh")
      def evalSh() = sh().filter(col("doc_id") % Dedup.evalStride === 0)
        .select(col("sh")).distinct()
      def contaminated() = sh()
        .filter(col("doc_id") % Dedup.evalStride =!= 0)
        .join(broadcast(evalSh()), Seq("sh"), "left_semi")
        .select(col("doc_id")).distinct()
      val tmxLocal = tmx
      def timeNoSweep(name: String)(mk: => DataFrame): Unit = {
        val reps = (0 to 1).map { _ =>
          val t0 = System.nanoTime(); val c0 = cpuSnap()
          mk.foreach(_ => ())
          val dt = (System.nanoTime() - t0) / 1e9
          val c1 = cpuSnap()
          val dc = c1.map { case (id, v) =>
            math.max(0L, v - c0.getOrElse(id, 0L)) }.sum / 1e9
          (dt, dc)
        }
        println(f"[funnelprobe]   sub ${name}%-24s wall=${reps.map(_._1).min}%6.2f cpu=${reps.map(_._2).min}%6.2f")
      }
      println(s"[funnelprobe] rows: near=${near.count()} " +
        s"docs=${docs.count()} shAll=${shAll().count()}")
      timeNoSweep("d10 shAll (parquet)") {
        docs.withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, greatest(size(toks) - 2, 1)),
               i -> concat_ws(' ', slice(toks, i, 3)))""")).as("sh"))
          .distinct()
      }
      timeNoSweep("shAll cand-only") {
        cand.select(col("doc_id"), col("text"))
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, greatest(size(toks) - 2, 1)),
               i -> concat_ws(' ', slice(toks, i, 3)))""")).as("sh"))
          .distinct()
      }
      timeNoSweep("shAll")(shAll())
      timeNoSweep("shAll evalDocs-only") {
        evalDocs
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, greatest(size(toks) - 2, 1)),
               i -> concat_ws(' ', slice(toks, i, 3)))""")).as("sh"))
          .distinct()
      }
      timeNoSweep("shAll union, no distinct") {
        base
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, greatest(size(toks) - 2, 1)),
               i -> concat_ws(' ', slice(toks, i, 3)))""")).as("sh"))
      }
      timeNoSweep("keepSh")(keepSh())
      timeNoSweep("sh")(sh())
      timeNoSweep("evalSh")(evalSh())
      timeNoSweep("contaminated")(contaminated())
      timeNoSweep("clean")(cand.join(contaminated(), Seq("doc_id"),
        "left_anti"))
      sweep()
    }
    time("e06 full") {
      Pipeline.qualityFunnel(spark, sfDir)
    }
    spark.stop()
  }
}
