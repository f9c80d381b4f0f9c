package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues}

/** Structured-Streaming surface (SURVEY.md §7.5, isolated from batch):
  * event-time windowed aggregation with watermarks, session windows,
  * and custom sessionization state via flatMapGroupsWithState.
  *
  * The reference has no streaming (SURVEY.md §1.1 item 5); this is the
  * driver-mandated extension, expressed purely with Structured Streaming
  * so the same code runs over readStream sources at scale.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionOut(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long)

  case class SessionState(start: Long, last: Long, cnt: Long)

  case class BloomState(words: Array[Long])

  /** A document arriving on the ingest stream (driftMonitor input). */
  case class DocEvent(doc_id: Long, ts: java.sql.Timestamp, text: String)

  /** Tumbling event-time window aggregation with a watermark. Works on
    * both batch and streaming DataFrames with (ts, event_type, value). */
  def tumbling(events: DataFrame, width: String = "15 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Tumbling-window DISTINCT-USER SKETCH — the a10 story in streaming
    * state: the [[graft.functions.PortableHll]] aggregation buffer (64
    * register bytes per window) lives in the state store and merges
    * across micro-batches exactly as it merges across partitions, so
    * the emitted sketch state is bit-identical to a batch run over the
    * same rows regardless of micro-batch boundaries (spec-proven). An
    * exact streaming count-distinct would hold the full key set per
    * window — unbounded state; this holds 64 bytes per window, period.
    * Works on both batch and streaming frames with (ts, user_id). */
  def distinctSketchTumbling(events: DataFrame,
      width: String = "15 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"))
      .agg(graft.functions.PortableHll
        .portableHll(col("user_id").cast("string")).as("hll"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"),
        col("hll.harmonic_sum").as("harmonic_sum"),
        col("hll.zero_registers").as("zero_registers"),
        round(col("hll.estimate"), 4).as("approx_users"),
        col("n_events"))

  /** Tumbling-window HEAVY-HITTER SKETCH — the a04 count-min story in
    * streaming state: the [[graft.functions.PortableCountMin]] counter
    * grid (depth·width = 1024 longs, 8 KB per window) lives in the
    * state store; its merge is element-wise ADDITION, so associativity
    * across micro-batch boundaries is exact and the emitted grid is
    * bit-identical to a batch run over the same rows (spec-proven, the
    * distinctSketchTumbling discipline). An exact per-key streaming
    * count would hold every key per window — unbounded state for
    * high-cardinality keys; this holds 8 KB per window regardless of
    * key cardinality, and any key's count is recoverable downstream
    * via [[graft.functions.PortableCountMin.estimate]] (point query
    * over the emitted array — never a re-scan). Works on both batch
    * and streaming frames with (ts, user_id). */
  def heavyHitterSketchTumbling(events: DataFrame,
      width: String = "15 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"))
      .agg(graft.functions.PortableCountMin
        .portableCms(col("user_id").cast("string")).as("cms"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("cms"),
        col("n_events"))

  /** Sliding window (width, slide). */
  def sliding(events: DataFrame, width: String = "30 minutes",
      slide: String = "10 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Built-in session window (gap-based). */
  def sessionWindow(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n"))

  /** foreachBatch upsert sink: maintain a parquet table of the tumbling
    * aggregates, partitioned by window. Update output mode emits each
    * batch's changed windows; dynamic partition overwrite rewrites ONLY
    * those partitions — the idempotent micro-batch upsert used when the
    * target store has no native streaming sink (retries of a batch
    * rewrite the same partitions, so the sink stays exactly-once per
    * key). The partition columns must be the FULL aggregation key
    * (window AND event_type): update mode only emits changed rows, so
    * any coarser overwrite granularity would wipe the unchanged
    * siblings sharing a partition. */
  def upsertTumblingParquet(events: DataFrame, outDir: String,
      checkpoint: String, width: String = "15 minutes",
      watermark: String = "1 hour"): org.apache.spark.sql.streaming.StreamingQuery =
    tumbling(events, width, watermark)
      .writeStream.outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("window_start", "event_type")
          .parquet(outDir)
      }
      .start()

  /** Streaming corpus drift monitor — the streaming deployment of the
    * t19 batch op ([[graft.queries.TextOps.snapshotDriftDf]] computes
    * the BASELINE; this watches live ingest against it): tumbling
    * event-time windows of token counts, each finalized window's
    * per-token ppm compared to the static baseline ppm table, alert
    * rows (drift ≥ `alertPpm`) written to a window_start-partitioned
    * parquet sink with dynamic partition overwrite (retry-idempotent:
    * a failed batch's re-run replaces its own windows' partitions
    * rather than appending duplicates). A token
    * surging in live ingest (template spam, a new crawl source, an
    * encoding bug) raises an alert one watermark delay after its
    * window closes — before the corpus ships to training.
    *
    * Mechanics that make it scale:
    *  - append output mode ⇒ a window's (tok, cnt) rows emit exactly
    *    once, when the watermark passes the window end. Each
    *    foreachBatch therefore sees only COMPLETE windows, so the
    *    batch-side window totals (and thus ppm) are exact, and the
    *    emitted alerts are micro-batch-boundary-invariant.
    *  - state is bounded by (vocab × open windows) — the watermark
    *    evicts closed windows; no per-token history accumulates.
    *  - the baseline joins broadcast (vocabulary-of-interest sized, the
    *    t19 output shape `(tok, base_ppm)`); unseen tokens compare
    *    against base 0 via the left join, so NEW tokens alert too.
    *  - integer-ppm arithmetic end to end — alerts are deterministic
    *    and engine-portable, same as t19. */
  def driftMonitor(docs: DataFrame, baselinePpm: DataFrame, outDir: String,
      checkpoint: String, width: String = "15 minutes",
      watermark: String = "30 minutes", alertPpm: Long = 100000L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(window(col("ts"), width).as("w"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val tot = batch.groupBy(col("w"))
          .agg(sum(col("cnt")).as("win_total"))
        batch.join(tot, "w")
          .join(broadcast(baselinePpm), Seq("tok"), "left")
          .select(col("w.start").cast("long").as("window_start"),
            col("tok"), col("cnt"),
            expr("cnt * 1000000L div win_total").as("win_ppm"),
            coalesce(col("base_ppm"), lit(0L)).as("base_ppm"))
          .withColumn("drift_ppm", abs(col("win_ppm") - col("base_ppm")))
          .filter(col("drift_ppm") >= alertPpm)
          // retry-idempotent sink (the upsertTumblingParquet rule): a
          // window finalizes in exactly one batch, so dynamic
          // partition overwrite on window_start rewrites ONLY this
          // batch's windows — a re-run of a failed batch replaces its
          // own partitions instead of appending duplicate alert rows
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("window_start")
          .parquet(outDir)
      }
      .start()

  /** Streaming exact dedup — the streaming twin of the batch d01 op:
    * duplicate event_ids arriving within the watermark horizon are
    * dropped; the dedup state store evicts keys older than the
    * watermark, so state is bounded by (arrival rate × horizon), never
    * the stream's history. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Approximate streaming dedup with BOUNDED state: a per-user
    * portable Bloom filter ([[graft.functions.PortableBloom]], 1 KB)
    * in keyed state instead of [[dedupStream]]'s exact key set.
    *
    * The exact variant's state grows with distinct keys inside the
    * watermark — on a 100 TB / multi-month dedup horizon that is the
    * state store's scale-killer. The Bloom trade: state is CONSTANT
    * (words × 8 bytes per key-group, forever), a true duplicate is
    * never emitted twice (no false negatives), and the cost is a tiny
    * false-POSITIVE rate — (1 − e^(−depth·n/bits))^depth chance a new
    * event is wrongly dropped — acceptable for dedup (losing 1-in-10⁴
    * events to over-dedup beats unbounded state) and tunable via the
    * filter size. Events are processed in (ts, event_id) order within
    * each micro-batch so output is deterministic given batch
    * boundaries. */
  def dedupStreamBloom(events: Dataset[Event]): Dataset[Event] = {
    import events.sparkSession.implicits._
    import graft.functions.PortableBloom
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[BloomState, Event](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, evs: Iterator[Event], state: GroupState[BloomState]) =>
          val words = state.getOption.map(_.words)
            .getOrElse(new Array[Long](PortableBloom.words))
          val md = java.security.MessageDigest.getInstance("MD5")
          val out = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .filterNot { e =>
              PortableBloom.testAndSet(words,
                e.event_id.toString.getBytes("UTF-8"), md)
            }
          state.update(BloomState(words))
          out.iterator
      }
  }

  /** Stream-stream interval join: each click joined to the same user's
    * views within `window` after the click. Both sides carry watermarks
    * and the join condition bounds event time in both directions, so
    * Spark can expire buffered state (state ≤ watermark + interval per
    * side) — the required shape for an unbounded-stream join. Inner
    * join ⇒ append output mode. */
  def clickViewJoin(events: DataFrame, window: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("view_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
      col("user_id") === col("view_user") &&
        col("view_ts") >= col("click_ts") &&
        col("view_ts") <= col("click_ts") + expr(s"INTERVAL $window"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Stream-stream LEFT OUTER interval join — [[clickViewJoin]]'s
    * abandoned-click twin: a click with NO view inside the window still
    * emits (null view columns), but only once the watermark passes the
    * click's join horizon (before that a matching view could still
    * arrive — outer results are inherently watermark-delayed). This is
    * the funnel-drop detector ("clicked, never viewed") as an unbounded
    * stream: the same two-sided watermark + time-range condition bounds
    * buffered state on both sides, which Spark REQUIRES before it
    * accepts an outer stream-stream join at all. */
  def clickViewJoinOuter(events: DataFrame, window: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("view_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
      col("user_id") === col("view_user") &&
        col("view_ts") >= col("click_ts") &&
        col("view_ts") <= col("click_ts") + expr(s"INTERVAL $window"),
      "leftOuter")
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Stream-stream FULL OUTER interval join — the one join mode
    * Structured Streaming supports that the surface didn't expose
    * (r9, VERDICT-r8 ask #8): [[clickViewJoinOuter]]'s abandoned-click
    * rows PLUS orphan-view rows (a view no click preceded inside the
    * window — bot traffic, deep links, attribution gaps). Both null-
    * extended classes are watermark-delayed exactly like the left
    * outer's: a row emits null-extended only once the watermark
    * proves no partner can still arrive; the same two-sided watermark
    * + time-range condition bounds buffered state on both sides.
    * user_id coalesces across sides so orphan views keep their user.
    * Batch-twin property: on a batch DataFrame the same definition is
    * the plain full-outer interval join, and the streamed answer
    * converges to it for any batching (EventStreamsSpec). */
  def clickViewJoinFull(events: DataFrame, window: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("view_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
      col("user_id") === col("view_user") &&
        col("view_ts") >= col("click_ts") &&
        col("view_ts") <= col("click_ts") + expr(s"INTERVAL $window"),
      "fullOuter")
      .select(coalesce(col("user_id"), col("view_user")).as("user_id"),
        col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Custom stateful sessionization: per-user state machine with a
    * processing-timeout, the mapGroupsWithState escape hatch for
    * semantics the built-in windows can't express. Gap in millis. */
  def sessionizeStateful(events: Dataset[Event], gapMs: Long)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          // Sort this micro-batch's events; emit sessions closed by gaps;
          // the still-open session stays in state.
          val sorted = evs.map(_.ts.getTime).toSeq.sorted
          var open = state.getOption.orNull
          var out = List.empty[SessionOut]
          for (t <- sorted) {
            open match {
              case SessionState(st, last, n) if t - last <= gapMs =>
                open = SessionState(st, t, n + 1)
              case SessionState(st, last, n) =>
                out ::= SessionOut(userId, st, last, n)
                open = SessionState(t, t, 1)
              case null =>
                open = SessionState(t, t, 1)
            }
          }
          if (open != null) state.update(open)
          out.reverseIterator
      }
  }

  /** [[sessionizeStateful]]'s semantic gap, fixed: flatMapGroupsWithState
    * only closes a user's session when that user's NEXT event arrives —
    * a user who goes silent holds their session open forever (state
    * leak AND a session that never emits). This processor closes it
    * with an EVENT-TIME TIMER at `last + gap`: when the watermark
    * passes the gap horizon with no new events, the session emits and
    * the state clears — bounded state with emission guaranteed by
    * time, not by the user's return. The Spark-4 `transformWithState`
    * API (typed state + timers) is what makes the timer expressible;
    * `GroupStateTimeout.EventTimeTimeout` on the old API cannot carry
    * a per-key re-armable horizon alongside batch-internal gap splits.
    *
    * Semantics: identical to [[sessionizeStateful]] for sessions closed
    * by a later event; additionally any open session whose gap horizon
    * falls at-or-before the watermark emits on expiry. At-scale state:
    * one 24-byte SessionState + one timer per ACTIVE user, period. */
  class TimerSessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, SessionOut] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.map(_.ts.getTime).toSeq.sorted
      val prev = if (state.exists()) state.get() else null
      var open = prev
      var out = List.empty[SessionOut]
      for (t <- sorted) {
        open match {
          case SessionState(st, last, n) if t - last <= gapMs =>
            open = SessionState(st, t, n + 1)
          case SessionState(st, last, n) =>
            out ::= SessionOut(userId, st, last, n)
            open = SessionState(t, t, 1)
          case null =>
            open = SessionState(t, t, 1)
        }
      }
      if (open != null && (prev == null || open != prev)) {
        state.update(open)
        // re-arm: drop the superseded horizon's timer (without this the
        // dead timers accumulate as state-store rows until they fire —
        // measured as monotonic state-bytes growth in STREAMBENCH) and
        // arm the new one; the expiry-side horizon check stays as the
        // defense for any timer this delete misses
        if (prev != null && prev.last != open.last)
          getHandle.deleteTimer(prev.last + gapMs)
        // duplicate-timestamp extension (count grew, `last` didn't):
        // the horizon is unchanged and its timer is already armed —
        // don't re-register the same expiry (avoids relying on
        // registerTimer idempotence in the timer store)
        if (prev == null || prev.last != open.last)
          getHandle.registerTimer(open.last + gapMs)
      }
      out.reverseIterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (state.exists()) {
        val s = state.get()
        // only the CURRENT horizon closes the session — earlier
        // (re-armed-over) timers fire harmlessly and match nothing
        if (s.last + gapMs == expired.getExpiryTimeInMs) {
          state.clear()
          return Iterator.single(SessionOut(userId, s.start, s.last, s.cnt))
        }
      }
      Iterator.empty
    }
  }

  /** Timer-closed sessionization over the event stream — see
    * [[TimerSessionProcessor]]. Requires a watermark on `ts` (the
    * timer fires off the event-time watermark). */
  def sessionizeWithTimers(events: Dataset[Event], gapMs: Long,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
