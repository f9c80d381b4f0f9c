package graft.streaming

import graft.SparkSpec
import graft.streaming.EventStreams._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, minute: Int, typ: String, user: Long = 1L,
      value: Double = 1.0) =
    Event(id, new Timestamp(minute * 60000L), user, typ, value)

  private lazy val sample = Seq(
    ev(1, 0, "click"), ev(2, 5, "click"), ev(3, 14, "view"),
    ev(4, 16, "click"), ev(5, 29, "view"), ev(6, 31, "click"),
    // user 2: two sessions separated by a 40-min gap
    ev(7, 0, "click", user = 2), ev(8, 10, "click", user = 2),
    ev(9, 55, "click", user = 2))

  test("streaming tumbling window equals batch grouping of the same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = tumbling(mem.toDF(), width = "15 minutes", watermark = "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tumbling_out")
      .select(col("window_start").cast("long"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    val batch = tumbling(sample.toDF(), width = "15 minutes")
      .select(col("window_start").cast("long"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.contains((0L, "click", 4L))) // u1@0,5 + u2@0,10
    assert(streamed.contains((900L, "click", 1L))) // minute 16
  }

  test("streaming HLL sketch state is bit-identical to the batch sketch, " +
    "across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = distinctSketchTumbling(mem.toDF(), width = "15 minutes",
        watermark = "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("sketch_out").start()
    // feed one event at a time: every micro-batch boundary forces a
    // state-store merge of the register buffer
    sample.foreach { e => mem.addData(e); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("sketch_out")
      .select(col("window_start").cast("long"), col("harmonic_sum"),
        col("zero_registers"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = distinctSketchTumbling(sample.toDF(), width = "15 minutes")
      .select(col("window_start").cast("long"), col("harmonic_sum"),
        col("zero_registers"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // a window with k distinct users has at most k non-zero registers
    val perWindow = spark.table("sketch_out")
      .select(col("window_start").cast("long"), col("zero_registers"))
      .as[(Long, Long)].collect().toMap
    val exactUsers = sample.groupBy(e =>
      e.ts.getTime / 1000 / 900 * 900).view
      .mapValues(_.map(_.user_id).distinct.size.toLong)
    exactUsers.foreach { case (w, k) =>
      assert(64L - perWindow(w) <= k, s"window $w: more registers than users")
    }
  }

  test("streaming CMS heavy-hitter grid is bit-identical to the batch " +
    "sketch across micro-batch boundaries; estimates dominate truth") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = heavyHitterSketchTumbling(mem.toDF(), width = "15 minutes",
        watermark = "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_out").start()
    // one event per micro-batch: every boundary forces an additive
    // state-store merge of the counter grid
    sample.foreach { e => mem.addData(e); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("cms_out")
      .select(col("window_start").cast("long"), col("cms"), col("n_events"))
      .as[(Long, Seq[Long], Long)].collect()
      .map { case (w, g, n) => (w, g.toVector, n) }.toSet
    val batch = heavyHitterSketchTumbling(sample.toDF(),
        width = "15 minutes")
      .select(col("window_start").cast("long"), col("cms"), col("n_events"))
      .as[(Long, Seq[Long], Long)].collect()
      .map { case (w, g, n) => (w, g.toVector, n) }.toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // count-min never under-counts: per window, the point estimate of
    // every true user is >= the exact count, and the grid's per-row
    // mass equals n_events
    val est = spark.table("cms_out").select(
        col("window_start").cast("long").as("w"),
        explode(lit((sample.map(_.user_id).distinct.sorted: Seq[Long])
          .toArray)).as("uid"))
      .join(spark.table("cms_out")
        .select(col("window_start").cast("long").as("w2"), col("cms")),
        col("w") === col("w2"))
      .select(col("w"), col("uid"), graft.functions.PortableCountMin
        .estimate(col("cms"), col("uid").cast("string")).as("e"))
      .as[(Long, Long, Long)].collect()
    val exact = sample.groupBy(e => (e.ts.getTime / 1000 / 900 * 900,
        e.user_id)).view.mapValues(_.size.toLong).toMap
    est.foreach { case (w, uid, e) =>
      assert(e >= exact.getOrElse((w, uid), 0L),
        s"CMS under-counted user $uid in window $w")
    }
    val mass = spark.table("cms_out")
      .select(col("window_start").cast("long"),
        expr("aggregate(slice(cms, 1, 256), 0L, (a, x) -> a + x)"),
        col("n_events"))
      .as[(Long, Long, Long)].collect()
    mass.foreach { case (w, m, n) =>
      assert(m === n, s"window $w row-0 mass $m != n_events $n") }
  }

  test("built-in session window closes on the gap") {
    val got = sessionWindow(sample.toDF(), gap = "30 minutes")
      .filter(col("user_id") === 2)
      .select(col("n")).as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L)) // sessions: {0,10} then {55}
  }

  test("stateful sessionization emits closed sessions with counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionizeStateful(mem.toDS(), gapMs = 30 * 60000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sess_out")
      .as[SessionOut].collect()
    // user 2's first session {0,10} is closed by the event at 55
    val u2 = closed.filter(_.user_id == 2L)
    assert(u2.length === 1)
    assert(u2.head.n_events === 2 && u2.head.session_start === 0L)
  }

  test("timer sessionization closes a SILENT user's session at the " +
      "watermark — the case flatMapGroupsWithState cannot emit") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState needs column families => RocksDB provider
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    try {
    val mem = MemoryStream[Event]
    val q = sessionizeWithTimers(mem.toDS(), gapMs = 30 * 60000L,
        watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("timer_sess_out").start()
    // batch 1: user 9 events at minutes 1 and 11, then SILENCE
    // (minute 1, not 0: a ts equal to the initial watermark 0 is
    // filtered as late by the event-time mode before the processor)
    mem.addData(ev(100, 1, "click", user = 9), ev(101, 11, "click", user = 9))
    q.processAllAvailable()
    // batch 2: only OTHER users advance event time; user 9 stays silent.
    // watermark moves to ~minute 110; user 9's horizon (minute 41) expires
    mem.addData(ev(102, 120, "click", user = 8))
    q.processAllAvailable()
    // one more batch so the advanced watermark fires the timers
    mem.addData(ev(103, 121, "click", user = 8))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("timer_sess_out").as[SessionOut].collect()
    val u9 = closed.filter(_.user_id == 9L)
    assert(u9.length === 1, s"silent user's session did not emit: " +
      closed.mkString(", "))
    assert(u9.head.session_start === 1 * 60000L &&
      u9.head.session_end === 11 * 60000L && u9.head.n_events === 2L)
    // and in-batch gap splits behave exactly like sessionizeStateful
    val mem2 = MemoryStream[Event]
    val q2 = sessionizeWithTimers(mem2.toDS(), gapMs = 30 * 60000L,
        watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("timer_sess_out2").start()
    // sample shifted +1 min so no ts collides with the initial watermark
    val shifted = sample.map(e =>
      e.copy(ts = new Timestamp(e.ts.getTime + 60000L)))
    mem2.addData(shifted: _*)
    q2.processAllAvailable()
    q2.stop()
    val closed2 = spark.table("timer_sess_out2").as[SessionOut].collect()
    val u2 = closed2.filter(_.user_id == 2L)
    assert(u2.length === 1)
    assert(u2.head.n_events === 2 && u2.head.session_start === 60000L)
    } finally oldProv match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }

  test("timer sessionization equals the batch gap-split twin at a " +
      "SECOND gap/watermark setting (every session eventually emits)") {
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    try {
      // deterministic quasi-random event log: 4 users, jittered strides,
      // DUPLICATE timestamps for user 3 (pins the r6 re-arm-skip fix),
      // gaps both above and below the 7-minute session gap
      val events = (0 until 48).map { i =>
        val user = 1L + (i % 4)
        val minute = 1 + (i / 4) * 3 + (i * i % 7) // jitter, non-monotone
        ev(200 + i, minute, if (i % 3 == 0) "view" else "click", user)
      } ++ Seq(ev(300, 9, "click", user = 3), // dup ts with another u3 event
        ev(301, 9, "click", user = 3))
      val sorted = events.sortBy(_.ts.getTime)
      // batch twin: per user, sort, split where the gap EXCEEDS gapMs —
      // the plain-Scala definition, independent of any engine path
      val gapMs = 7 * 60000L
      val expected = sorted.groupBy(_.user_id).flatMap { case (u, es) =>
        val ts = es.map(_.ts.getTime).sorted
        val sessions = ts.tail.foldLeft(List((ts.head, ts.head, 1L))) {
          case ((s, last, n) :: rest, t) =>
            if (t - last <= gapMs) (s, t, n + 1) :: rest
            else (t, t, 1L) :: (s, last, n) :: rest
          case (Nil, t) => List((t, t, 1L))
        }
        sessions.map { case (s, l, n) => SessionOut(u, s, l, n) }
      }.toSet
      val mem = MemoryStream[Event]
      val q = sessionizeWithTimers(mem.toDS(), gapMs = gapMs,
          watermark = "2 minutes")
        .writeStream.outputMode("append")
        .format("memory").queryName("timer_sess_twin").start()
      // feed in event-time order, 7 events per micro-batch (crosses
      // session boundaries mid-batch and mid-stream both)
      sorted.grouped(7).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      // sentinel: advance the watermark past every horizon, then one
      // more batch so the advanced watermark fires the timers — after
      // this EVERY session must have emitted, by timer or by gap
      mem.addData(ev(900, 100000, "click", user = 77))
      q.processAllAvailable()
      mem.addData(ev(901, 100001, "click", user = 77))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("timer_sess_twin").as[SessionOut].collect()
        .filter(_.user_id != 77L).toSet
      assert(got === expected,
        s"missing=${(expected -- got).mkString(",")} " +
          s"extra=${(got -- expected).mkString(",")}")
    } finally oldProv match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }

  test("stream-static enrichment join (events stream x user dimension)") {
    implicit val sqlCtx = spark.sqlContext
    val users = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[Event]
    val q = mem.toDF().join(users, Seq("user_id"))
      .groupBy(col("tier")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("enriched_out").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enriched_out")
      .as[(String, Long)].collect().toMap
    assert(got === Map("gold" -> 6L, "basic" -> 3L))
  }

  test("readStream file-source round-trip matches batch tumbling") {
    val dir = java.nio.file.Files.createTempDirectory("evfilesrc").toString
    sample.toDF().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(sample.toDF().schema).parquet(dir)
    val q = tumbling(stream, width = "15 minutes", watermark = "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("file_tumbling_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("file_tumbling_out")
      .select(col("window_start").cast("long"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    val batch = tumbling(sample.toDF(), width = "15 minutes")
      .select(col("window_start").cast("long"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.contains((0L, "click", 4L))) // event-time, not arrival
  }

  test("stream-stream interval join pairs clicks with later views (bounded state)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = clickViewJoin(mem.toDF(), window = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("cv_join_out").start()
    // shift off epoch 0: a row exactly AT the initial watermark (t=0)
    // is evicted as late by the join's state predicate
    val shifted = sample.map(e => e.copy(ts = new Timestamp(e.ts.getTime + 86400000L)))
    mem.addData(shifted: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cv_join_out")
      .select(col("click_id"), col("view_id"))
      .as[(Long, Long)].collect().toSet
    // user 1 clicks @0,5,16,31 (ids 1,2,4,6); views @14,29 (ids 3,5):
    // each view joins clicks within the preceding 30 min
    assert(got === Set((1L, 3L), (1L, 5L), (2L, 3L), (2L, 5L), (4L, 5L)))
  }

  test("LEFT OUTER stream-stream join: matched clicks join; an " +
      "abandoned click emits with a null view once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = clickViewJoinOuter(mem.toDF(), window = "30 minutes",
        watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("cv_outer_out").start()
    val base = 86400000L // shift off epoch 0 (row AT watermark is late)
    def at(id: Long, minute: Int, typ: String, user: Long = 1L) =
      ev(id, minute, typ, user).copy(
        ts = new Timestamp(base + minute * 60000L))
    // user 1: click@1 matched by view@10; user 2: click@1, NO view ever
    mem.addData(at(1, 1, "click", 1), at(2, 10, "view", 1),
      at(3, 1, "click", 2))
    q.processAllAvailable()
    // advance both sides' watermarks far past click@1 + window + wm so
    // the unmatched click's state expires and the null row emits (the
    // outer emission needs one MORE batch after the advancing one)
    mem.addData(at(8, 600, "click", 9), at(9, 600, "view", 9))
    q.processAllAvailable()
    mem.addData(at(10, 601, "click", 9), at(11, 601, "view", 9))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cv_outer_out")
      .select(col("user_id"), col("click_id"), col("view_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    assert(got.contains((1L, 1L, 2L)), s"matched click missing: $got")
    assert(got.contains((2L, 3L, -1L)),
      s"abandoned click never emitted its null row: $got")
    // no click may emit BOTH matched and null rows
    val byClick = got.groupBy(c => (c._1, c._2))
    assert(byClick((2L, 3L)).size === 1)
    assert(!byClick((1L, 1L)).exists(_._3 == -1L),
      "matched click also emitted a spurious null row")
  }

  test("left-outer stream join equals its BATCH twin on a quasi-random " +
      "log once every watermark has passed — batch boundaries invisible") {
    implicit val sqlCtx = spark.sqlContext
    // clickViewJoinOuter is ONE definition for both executions: on a
    // batch DataFrame withWatermark is a no-op and the left-outer
    // interval join is the final answer; on the stream, outer rows are
    // watermark-delayed but must converge to the same set. Same
    // discipline as the Bloom fold twin: the semantics the operator
    // claims is "the batch answer", whatever the batching.
    val base = 86400000L
    def at(id: Long, minute: Int, typ: String, user: Long) =
      ev(id, minute, typ, user).copy(
        ts = new Timestamp(base + minute * 60000L))
    // deterministic quasi-random log: 3 users; clicks every 7 min,
    // views at offsets that match some clicks inside the 30-min window
    // and leave others abandoned; ids disjoint across types
    val clicks = (0 until 12).map { i =>
      at(100L + i, 1 + i * 7, "click", 1L + (i % 3)) }
    val views = (0 until 6).map { i =>
      at(500L + i, 5 + i * 16, "view", 1L + ((i * 2) % 3)) }
    // watermark-advancing tail, far past every real event's horizon
    // (outer emission needs one MORE batch after the advancing one) —
    // part of the log on BOTH sides so the answers stay comparable
    val tail = Seq(at(900L, 600, "click", 9L), at(901L, 600, "view", 9L),
      at(902L, 601, "click", 9L), at(903L, 601, "view", 9L))
    val events = (clicks ++ views ++ tail).sortBy(_.ts.getTime)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))
    val expected = clickViewJoinOuter(events.toDF(),
      window = "30 minutes", watermark = "10 minutes")
      .collect().map(key).toSet
    val mem = MemoryStream[Event]
    val q = clickViewJoinOuter(mem.toDF(), window = "30 minutes",
        watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("cv_outer_twin").start()
    // feed in event-time order in a batching unrelated to the data
    events.grouped(5).foreach { chunk =>
      mem.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("cv_outer_twin").collect().map(key).toSet
    assert(got === expected,
      s"missing=${(expected -- got)} extra=${(got -- expected)}")
    // the twin is non-degenerate: both matched and abandoned clicks
    assert(expected.exists(_._3 >= 0L) && expected.exists(_._3 == -1L))
  }

  test("FULL OUTER stream-stream join: matched pairs join; abandoned " +
      "clicks AND orphan views null-extend once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = clickViewJoinFull(mem.toDF(), window = "30 minutes",
        watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("cv_full_out").start()
    val base = 86400000L // shift off epoch 0 (row AT watermark is late)
    def at(id: Long, minute: Int, typ: String, user: Long = 1L) =
      ev(id, minute, typ, user).copy(
        ts = new Timestamp(base + minute * 60000L))
    // user 1: click@1 matched by view@10; user 2: click@1, NO view;
    // user 3: view@1, NO click (the class only full-outer emits)
    mem.addData(at(1, 1, "click", 1), at(2, 10, "view", 1),
      at(3, 1, "click", 2), at(4, 1, "view", 3))
    q.processAllAvailable()
    // advance both watermarks past every horizon; null-extended rows
    // need one MORE batch after the advancing one
    mem.addData(at(8, 600, "click", 9), at(9, 600, "view", 9))
    q.processAllAvailable()
    mem.addData(at(10, 601, "click", 9), at(11, 601, "view", 9))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cv_full_out")
      .select(col("user_id"), col("click_id"), col("view_id"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    assert(got.contains((1L, 1L, 2L)), s"matched pair missing: $got")
    assert(got.contains((2L, 3L, -1L)),
      s"abandoned click never emitted its null-view row: $got")
    assert(got.contains((3L, -1L, 4L)),
      s"orphan view never emitted its null-click row: $got")
    // matched rows never duplicate as null-extended ones
    assert(!got.contains((1L, 1L, -1L)) && !got.contains((1L, -1L, 2L)),
      s"matched pair also emitted a spurious null row: $got")
  }

  test("full-outer stream join equals its BATCH twin on a quasi-random " +
      "log once every watermark has passed — batch boundaries invisible") {
    implicit val sqlCtx = spark.sqlContext
    // same discipline as the left-outer twin test: one definition,
    // two executions; the streamed answer must converge to the plain
    // batch full-outer interval join for ANY batching.
    val base = 86400000L
    def at(id: Long, minute: Int, typ: String, user: Long) =
      ev(id, minute, typ, user).copy(
        ts = new Timestamp(base + minute * 60000L))
    val clicks = (0 until 12).map { i =>
      at(100L + i, 1 + i * 7, "click", 1L + (i % 3)) }
    val views = (0 until 6).map { i =>
      at(500L + i, 5 + i * 16, "view", 1L + ((i * 2) % 3)) }
    // an orphan view (user 7 never clicks) so the null-click class is
    // exercised — every generated view above happens to find a click
    val orphan = Seq(at(800L, 40, "view", 7L))
    val tail = Seq(at(900L, 600, "click", 9L), at(901L, 600, "view", 9L),
      at(902L, 601, "click", 9L), at(903L, 601, "view", 9L))
    val events = (clicks ++ views ++ orphan ++ tail).sortBy(_.ts.getTime)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))
    val expected = clickViewJoinFull(events.toDF(),
      window = "30 minutes", watermark = "10 minutes")
      .collect().map(key).toSet
    val mem = MemoryStream[Event]
    val q = clickViewJoinFull(mem.toDF(), window = "30 minutes",
        watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("cv_full_twin").start()
    events.grouped(5).foreach { chunk =>
      mem.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("cv_full_twin").collect().map(key).toSet
    assert(got === expected,
      s"missing=${(expected -- got)} extra=${(got -- expected)}")
    // non-degenerate: all three row classes present in the answer
    assert(expected.exists(k => k._2 >= 0L && k._3 >= 0L) &&
      expected.exists(_._3 == -1L) && expected.exists(_._2 == -1L))
  }

  test("writeStream file-sink round-trip preserves rows (append + checkpoint)") {
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("evfilesink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evckpt").toString
    val mem = MemoryStream[Event]
    val q = mem.toDF().filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").start(outDir)
    mem.addData(sample: _*)
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(outDir)
    assert(back.count() === sample.count(_.event_type == "click"))
    assert(back.columns.toSet === Set("event_id", "user_id", "ts"))
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = dedupStream(mem.toDF(), watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    // event 1 arrives three times (same id), others once; shifted off
    // epoch 0 (a row AT the initial watermark is dropped as late)
    val shifted = (sample ++ Seq(ev(1, 2, "click"), ev(1, 3, "click")))
      .map(e => e.copy(ts = new Timestamp(e.ts.getTime + 86400000L)))
    mem.addData(shifted: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out")
      .select(col("event_id")).as[Long].collect().sorted.toSeq
    assert(got === sample.map(_.event_id).sorted)
  }

  test("bloom-state dedup drops duplicates ACROSS micro-batches with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = dedupStreamBloom(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("bloomdedup_out").start()
    // batch 1: ids 1..5 (id 1 twice within the batch), two users
    mem.addData(ev(1, 1, "click"), ev(1, 2, "click"), ev(2, 3, "view"),
      ev(3, 4, "click", user = 2L), ev(4, 5, "view"), ev(5, 6, "view", user = 2L))
    q.processAllAvailable()
    // batch 2: ids 1 and 3 AGAIN (exact dedup would need their keys in
    // state — the bloom remembers them in constant space), plus new 6, 7
    mem.addData(ev(1, 7, "click"), ev(3, 8, "click", user = 2L),
      ev(6, 9, "view"), ev(7, 10, "view", user = 2L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("bloomdedup_out")
      .select(col("event_id")).as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      s"cross-batch duplicate survived or a new id was dropped: $got")
  }

  test("bloom-state dedup equals the plain-Scala fold twin on a second, " +
      "larger quasi-random log — batch boundaries invisible") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.PortableBloom
    // deterministic log: 3 users, 90 events, event_ids drawn from a
    // small pool so duplicates land both inside and across micro-batches
    val events = (0 until 90).map { i =>
      val user = 1L + (i % 3)
      val id = 1000L + (i * 7 + user * 13) % 40 // collides across users too
      ev(id, minute = 1 + i, if (i % 4 == 0) "view" else "click", user)
    }
    // plain-Scala twin: per user, fold the (ts, event_id)-sorted stream
    // through the SAME PortableBloom — keep iff testAndSet says unseen.
    // Independent of Spark: the semantics the operator claims is "as if
    // one fold over the ordered stream", whatever the batching.
    val expected = events.groupBy(_.user_id).toSeq.flatMap { case (_, es) =>
      val words = new Array[Long](PortableBloom.words)
      val md = java.security.MessageDigest.getInstance("MD5")
      es.sortBy(e => (e.ts.getTime, e.event_id)).filterNot { e =>
        PortableBloom.testAndSet(words, e.event_id.toString.getBytes("UTF-8"), md)
      }
    }.map(e => (e.user_id, e.event_id, e.ts.getTime)).toSet
    val mem = MemoryStream[Event]
    val q = dedupStreamBloom(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("bloomdedup_twin").start()
    // feed in event-time order in a DIFFERENT batching than the first
    // bloom test (chunks of 5): the fold twin must hold regardless
    events.grouped(5).foreach { chunk =>
      mem.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("bloomdedup_twin")
      .select(col("user_id"), col("event_id"), col("ts").cast("long") * 1000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected,
      s"missing=${(expected -- got).size} extra=${(got -- expected).size}")
  }

  test("foreachBatch upsert keeps the parquet table equal to the batch answer") {
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("evupsert").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evupsertck").toString
    val mem = MemoryStream[Event]
    val q = upsertTumblingParquet(mem.toDF(), outDir, ckpt,
      width = "15 minutes", watermark = "1 hour")
    // two waves that touch an overlapping window: the second batch must
    // OVERWRITE that window's partition, not append to it
    val (wave1, wave2) = sample.splitAt(5)
    mem.addData(wave1: _*)
    q.processAllAvailable()
    mem.addData(wave2: _*)
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(outDir)
      .select(col("window_start").cast("timestamp").cast("long"),
        col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    val batch = tumbling(sample.toDF(), width = "15 minutes")
      .select(col("window_start").cast("long"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(back === batch)
  }

  test("sliding windows overlap") {
    val got = sliding(sample.toDF(), width = "30 minutes", slide = "10 minutes")
      .filter(col("event_type") === "click")
      .select(col("window_start").cast("long"), col("n"))
      .as[(Long, Long)].collect().toMap
    // window [0,30) has clicks at u1@0,5,16 + u2@0,10 → 5
    assert(got(0L) === 5L)
  }

  test("custom portable-HLL sketch aggregates in streaming state, equal to batch") {
    // the TypedImperativeAggregate's serialize/merge path runs through
    // the streaming state store here — a 100 TB stream profiles
    // distinct users per window with 64 bytes of state per group
    implicit val sqlCtx = spark.sqlContext
    def agged(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window(col("ts"), "15 minutes")("start").as("ws"))
        .agg(graft.functions.PortableHll
          .portableHll(col("user_id").cast("string")).as("h"))
        .select(col("ws").cast("long").as("ws"),
          col("h.harmonic_sum").as("hs"))
    val mem = MemoryStream[Event]
    val q = agged(mem.toDF()).writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream_out").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hll_stream_out")
      .as[(Long, Long)].collect().toSet
    val batch = agged(sample.toDF()).as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("drift monitor alerts on finalized windows with exact ppm vs " +
      "the static baseline") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift")
    val (outDir, ckpt) = (s"$tmp/alerts", s"$tmp/ckpt")
    // baseline (the t19 batch output shape): a and b each 50% of mass
    val baseline = Seq(("a", 500000L), ("b", 500000L))
      .toDF("tok", "base_ppm")
    val mem = MemoryStream[DocEvent]
    val q = driftMonitor(mem.toDF(), baseline, outDir, ckpt,
      width = "15 minutes", watermark = "30 minutes", alertPpm = 300000L)
    try {
      // window [0,15): a=2 b=1 spam=3 of 6 tokens
      mem.addData(
        DocEvent(1L, new Timestamp(1 * 60000L), "a b"),
        DocEvent(2L, new Timestamp(5 * 60000L), "spam spam spam a"))
      q.processAllAvailable()
      // advance the watermark past the window end + horizon so the
      // first window finalizes and emits (append mode)
      mem.addData(DocEvent(3L, new Timestamp(50 * 60000L), "x"))
      q.processAllAvailable()
    } finally q.stop()
    val alerts = spark.read.parquet(outDir)
      .select("window_start", "tok", "cnt", "win_ppm", "base_ppm",
        "drift_ppm")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    // spam: 500000 ppm vs base 0 (NEW token) — alert; b: 166666 vs
    // 500000 → drift 333334 — alert; a: 333333 vs 500000 → 166667,
    // below the 300000 threshold — no alert. The open [45,60) window
    // ("x") must NOT emit.
    assert(alerts === Set(
      (0L, "spam", 3L, 500000L, 0L, 500000L),
      (0L, "b", 1L, 166666L, 500000L, 333334L)))
  }
}
