package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming micro-bench (dev main, not a driver contract): rate-source
  * throughput + state-store evidence for the two stateful streaming
  * operators that have no batch oracle —
  * [[graft.streaming.EventStreams.dedupStreamBloom]] (constant-size
  * keyed Bloom state) and
  * [[graft.streaming.EventStreams.clickViewJoin]] (watermark-evicted
  * interval-join state).
  *
  * What it demonstrates, with numbers instead of assertions:
  *  - rows/s through each operator on a rate source (per-progress
  *    `processedRowsPerSecond`, median over the run);
  *  - the Bloom dedup's state-store row count equals the key-group
  *    count and stays CONSTANT while input grows (the exact variant's
  *    state grows with distinct keys — the scale-killer the Bloom
  *    trade removes);
  *  - the interval join's buffered-row count stabilizes once the run
  *    is several watermark horizons long (eviction keeps pace with
  *    arrival) rather than growing with the stream's history.
  *
  * Output: one JSON blob to SPARK_GRAFT_STREAMBENCH_OUT (default
  * `STREAMBENCH.json`), carrying per-operator rows/s and the state-rows
  * series across progress ticks.
  */
object StreamBench {

  private case class OpResult(rowsPerSec: Double, totalRows: Long,
      stateRows: Seq[Long], stateBytes: Seq[Long], batches: Int)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val runSecs = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_SECS", "20").toInt
    val rps = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_RPS", "200000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-streambench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bloom = benchBloom(spark, rps, runSecs)
    val join = benchIntervalJoin(spark, rps, runSecs)
    val ojoin = benchOuterJoin(spark, rps, runSecs)
    val fjoin = benchFullJoin(spark, rps, runSecs)
    val drift = benchDrift(spark, rps, runSecs)
    val sess = benchSessionize(spark, rps, runSecs)
    val tsess = benchTimerSessionize(spark, rps, runSecs)
    val hll = benchHllSketch(spark, rps, runSecs)
    val cms = benchCmsSketch(spark, rps, runSecs)

    def js(r: OpResult): String =
      s"""{"rows_per_sec":${r.rowsPerSec.round},"total_rows":${r.totalRows},""" +
        s""""batches":${r.batches},"state_rows":[${r.stateRows.mkString(",")}],""" +
        s""""state_bytes":[${r.stateBytes.mkString(",")}]}"""
    val line =
      s"""{"rate_rows_per_sec":$rps,"run_secs":$runSecs,"cpus":$cpus,""" +
        s""""dedup_bloom":${js(bloom)},"interval_join":${js(join)},""" +
        s""""outer_join":${js(ojoin)},"full_join":${js(fjoin)},""" +
        s""""drift_monitor":${js(drift)},"sessionize":${js(sess)},""" +
        s""""timer_sessionize":${js(tsess)},""" +
        s""""hll_sketch":${js(hll)},"cms_sketch":${js(cms)}}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_OUT", "STREAMBENCH.json")
    Files.write(Paths.get(outPath), (line + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }

  /** Rate source → Event with duplicate ids (every id arrives ~3×) over
    * 256 user key-groups; Bloom state must stay at 256 rows forever. */
  private def benchBloom(spark: SparkSession, rps: Int, secs: Int): OpResult = {
    import spark.implicits._
    import graft.streaming.EventStreams
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select(((col("value") * 7919L) % (rps.toLong * secs / 3)).as("event_id"),
        col("timestamp").as("ts"),
        (col("value") % 256).as("user_id"),
        lit("click").as("event_type"),
        lit(1.0).as("value"))
      .as[EventStreams.Event]
    runQuery(spark, EventStreams.dedupStreamBloom(events).toDF(), secs)
  }

  /** Rate source → windowed distinct-user HLL sketch (1-second
    * tumbling windows, 2-second watermark): state is one 64-byte
    * register buffer per open window — the bounded series across
    * ≥ secs/2 watermark horizons shows the sketch holding constant
    * state while an exact distinct would hold the 65536-key set. */
  private def benchHllSketch(spark: SparkSession, rps: Int, secs: Int): OpResult = {
    import graft.streaming.EventStreams
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select(col("timestamp").as("ts"),
        (col("value") % 65536).as("user_id"))
    runQuery(spark,
      EventStreams.distinctSketchTumbling(events,
        width = "1 second", watermark = "2 seconds"),
      secs)
  }

  /** Rate source → windowed heavy-hitter CMS grid (1-second tumbling
    * windows, 2-second watermark): state is one 8 KB counter grid per
    * open window regardless of key cardinality (65536 users here) —
    * the additive-merge analogue of the HLL bench; an exact per-key
    * count would hold all 65536 rows per window. */
  private def benchCmsSketch(spark: SparkSession, rps: Int, secs: Int): OpResult = {
    import graft.streaming.EventStreams
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select(col("timestamp").as("ts"),
        (col("value") % 65536).as("user_id"))
    runQuery(spark,
      EventStreams.heavyHitterSketchTumbling(events,
        width = "1 second", watermark = "2 seconds"),
      secs)
  }

  /** Rate source split into click/view streams, joined on user within a
    * 1-second interval under a 2-second watermark — a `secs`-long run
    * spans ≥ secs/2 watermark horizons, so a bounded state series IS
    * the eviction proof. */
  private def benchIntervalJoin(spark: SparkSession, rps: Int, secs: Int): OpResult = {
    import graft.streaming.EventStreams
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select(col("value").as("event_id"),
        col("timestamp").as("ts"),
        // user_id from value DIV 2, not value: event_type is value
        // parity, so a same-parity modulus would give clicks only even
        // user_ids and views only odd — a join bench that never joins
        // (ADVICE r8). div 2 pairs each click (2k) with the next view
        // (2k+1) on user k, ~1/rps s apart — inside the 1 s interval.
        ((col("value") / 2).cast("long") % 65536).as("user_id"),
        when(col("value") % 2 === 0, "click").otherwise("view").as("event_type"),
        lit(1.0).as("value"))
    runQuery(spark,
      EventStreams.clickViewJoin(events, window = "1 second", watermark = "2 seconds"),
      secs)
  }

  /** [[benchIntervalJoin]]'s LEFT OUTER twin — every 8th click is
    * matchless (clicks at value ≡ 14 mod 16 are routed to a user range
    * views never reach), so those clicks wait out the full horizon and
    * emit null-extended. Outer state is strictly larger than inner
    * (unmatched rows held until watermark + interval), and the bounded
    * state series across ≥ secs/2 horizons is the eviction proof for
    * THAT path too. */
  private def benchOuterJoin(spark: SparkSession, rps: Int, secs: Int): OpResult = {
    import graft.streaming.EventStreams
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select(col("value").as("event_id"),
        col("timestamp").as("ts"),
        // user_id from value DIV 2 (the benchIntervalJoin parity fix,
        // ADVICE r8): click 2k and view 2k+1 share user k%61440, so
        // the matched-emission path actually runs — at the SAME
        // ~1.6 views/click match density as the inner bench (the
        // first fix used a 4096-user space: ~24 matches/click, a 24×
        // output amplification that snowballed the backlog and read
        // as unbounded state). Clicks at value%16==14 (every 8th
        // click) keep the carve-out to the isolated 61440+ range
        // views never reach → genuinely matchless stratum.
        when(col("value") % 16 === 14,
          ((col("value") / 2).cast("long") % 4096) + 61440L)
          .otherwise((col("value") / 2).cast("long") % 61440).as("user_id"),
        when(col("value") % 2 === 0, "click").otherwise("view").as("event_type"),
        lit(1.0).as("value"))
    runQuery(spark,
      EventStreams.clickViewJoinOuter(events,
        window = "1 second", watermark = "2 seconds"),
      secs)
  }

  /** [[benchOuterJoin]]'s FULL OUTER twin — both null-extended classes
    * run: clicks at value%16==14 go to the 61440+ user range views
    * never reach (null-view rows) and views at value%16==13 go to the
    * 53248+ range clicks never reach (null-click rows); everything
    * else pairs on user = value div 2 like the inner bench. Full-outer
    * state holds BOTH sides' unmatched rows to their watermark
    * horizons — the strictly-largest state of the three join modes,
    * which is exactly what the bounded state series must prove. */
  private def benchFullJoin(spark: SparkSession, rps: Int, secs: Int): OpResult = {
    import graft.streaming.EventStreams
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select(col("value").as("event_id"),
        col("timestamp").as("ts"),
        // same 61440-user base density as the outer bench; matchless
        // clicks park at 61440+, matchless views at 70000+ (disjoint
        // from base AND from the click carve-out)
        when(col("value") % 16 === 14,
          ((col("value") / 2).cast("long") % 4096) + 61440L)
          .when(col("value") % 16 === 13,
            ((col("value") / 2).cast("long") % 4096) + 70000L)
          .otherwise((col("value") / 2).cast("long") % 61440).as("user_id"),
        when(col("value") % 2 === 0, "click").otherwise("view").as("event_type"),
        lit(1.0).as("value"))
    runQuery(spark,
      EventStreams.clickViewJoinFull(events,
        window = "1 second", watermark = "2 seconds"),
      secs)
  }

  /** Rate source → DocEvent-shaped docs: each doc carries one token
    * from a 997-token rotating vocab plus four constant commons, so
    * the monitor's windowed-agg state is (vocab ≈ 1001) × open
    * windows — the bounded-state series across ≥ secs/2 two-second
    * watermark horizons is the eviction proof. The alert threshold is
    * set unreachably high so the measured cost is the windowed agg +
    * finalize + baseline join pipeline, not parquet alert volume. */
  private def benchDrift(spark: SparkSession, rps: Int, secs: Int): OpResult = {
    import spark.implicits._
    import graft.streaming.EventStreams
    val docs = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select(col("value").as("doc_id"), col("timestamp").as("ts"),
        concat(lit("tok"), (col("value") % 997).cast("string"),
          lit(" common the a of")).as("text"))
    val baseline = (0 until 997).map(i => (s"tok$i", 200L))
      .toDF("tok", "base_ppm")
    val tmp = Files.createTempDirectory("graft_driftbench")
    val q = EventStreams.driftMonitor(docs, baseline,
      s"$tmp/alerts", s"$tmp/ckpt", width = "2 seconds",
      watermark = "2 seconds", alertPpm = 10000000L)
    Thread.sleep(secs * 1000L)
    stopTolerant(q)
    val r = summarize(q)
    // checkpoints are many small files — delete the whole tree or
    // every bench run leaks a growing /tmp dir (the exeWordCount
    // deleteOnExit lesson, but recursive)
    import scala.jdk.CollectionConverters._
    Files.walk(tmp).iterator().asScala.toSeq.reverse
      .foreach(p => Files.deleteIfExists(p))
    r
  }

  /** Rate source → 4096 user key-groups with a 10 ms session gap. At
    * 200k rows/s a user's events arrive ~20 ms apart — ABOVE the gap,
    * so (almost) every event closes the previous session and a
    * session row is emitted downstream: the bench exercises the full
    * state-update + emission path, not just state writes. The
    * `flatMapGroupsWithState` state stays one open-session row per
    * ACTIVE user — bounded by key cardinality (≤ 4096 rows) no matter
    * how long the stream runs. The custom-state analogue of the
    * session-window path, measured instead of asserted. */
  private def benchSessionize(spark: SparkSession, rps: Int, secs: Int): OpResult = {
    import spark.implicits._
    import graft.streaming.EventStreams
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select(col("value").as("event_id"),
        col("timestamp").as("ts"),
        (col("value") % 4096).as("user_id"),
        lit("click").as("event_type"),
        lit(1.0).as("value"))
      .as[EventStreams.Event]
    runQuery(spark,
      EventStreams.sessionizeStateful(events, gapMs = 10L).toDF(), secs)
  }

  /** The transformWithState timer sessionizer under the same load
    * shape: 4096 user key-groups, 10 ms gap, 1 s watermark — sessions
    * close by TIMER as the watermark advances, so state rows must
    * PLATEAU at ~active-users instead of tracking stream history.
    * Needs the RocksDB provider (column families). */
  private def benchTimerSessionize(spark: SparkSession, rps: Int,
      secs: Int): OpResult = {
    import spark.implicits._
    import graft.streaming.EventStreams
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    try {
      val events = spark.readStream.format("rate")
        .option("rowsPerSecond", rps).load()
        .select(col("value").as("event_id"),
          col("timestamp").as("ts"),
          (col("value") % 4096).as("user_id"),
          lit("click").as("event_type"),
          lit(1.0).as("value"))
        .as[EventStreams.Event]
      runQuery(spark,
        EventStreams.sessionizeWithTimers(events, gapMs = 10L,
          watermark = "1 second").toDF(), secs)
    } finally oldProv match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }

  private def runQuery(spark: SparkSession,
      out: org.apache.spark.sql.DataFrame, secs: Int): OpResult = {
    val q = out.writeStream.format("noop").outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    Thread.sleep(secs * 1000L)
    stopTolerant(q)
    summarize(q)
  }

  /** stop() interrupts the in-flight micro-batch; a task caught
    * mid-codegen surfaces the interrupt as a StreamingQueryException
    * AFTER the measurement window — progress history is already
    * complete, so a stop-time abort must not fail the bench. A query
    * that had ALREADY failed before stop() (exception present while
    * we thought it was running) is a real failure and rethrows —
    * otherwise a dead bench would publish near-zero rows/s as a
    * successful run. */
  private def stopTolerant(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val failedBeforeStop = q.exception.isDefined
    try {
      q.stop()
      q.awaitTermination()
    } catch {
      case e: org.apache.spark.sql.streaming.StreamingQueryException
          if !failedBeforeStop =>
        // The pre-stop snapshot alone has a check-then-act window: a
        // query that genuinely dies between the sample and stop()
        // would be misread as a stop-time abort. A whole-run
        // "ever produced a batch" check doesn't close it either (a
        // query can die mid-run after healthy batches). Swallow only
        // when the query was demonstrably alive AT stop time: its
        // most recent progress event is within a few trigger
        // intervals of now — a query that died mid-run stopped
        // emitting progress well before the stop.
        val lastProgressMs = q.recentProgress.lastOption
          .map(p => java.time.Instant.parse(p.timestamp).toEpochMilli)
        val aliveAtStop = lastProgressMs
          .exists(t => System.currentTimeMillis() - t < 5000L)
        if (aliveAtStop)
          System.err.println(s"[streambench] stop-time abort ignored: " +
            e.getMessage.takeWhile(_ != '\n'))
        else throw e
    }
  }

  private def summarize(
      q: org.apache.spark.sql.streaming.StreamingQuery): OpResult = {
    val progress = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    val rates = progress.map(_.processedRowsPerSecond).sorted
    val median = if (rates.isEmpty) 0.0 else rates(rates.size / 2)
    val stateRows = progress.flatMap(_.stateOperators.headOption)
      .map(_.numRowsTotal)
    val stateBytes = progress.flatMap(_.stateOperators.headOption)
      .map(_.memoryUsedBytes)
    OpResult(median, progress.map(_.numInputRows).sum, stateRows,
      stateBytes, progress.size)
  }
}
