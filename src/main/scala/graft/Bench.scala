package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query wall times.
  *
  * Methodology: a session-warmup action first (JVM/codegen/parquet
  * footer caches) and a raw page-cache priming pass over every
  * parquet byte (run ORDER must not masquerade as query cost), then
  * each query runs `SPARK_GRAFT_BENCH_WARMUP` untimed warm reps
  * (default 1 — rep-1 of a cold query measures JIT, not the engine)
  * followed by `SPARK_GRAFT_BENCH_REPS` timed reps (default 3),
  * end-to-end (plan → action) via a foreach-noop action so the full
  * result set is produced but nothing is collected to the driver.
  * Per-query time is the MIN over timed reps — this VM's CPU is
  * erratic (identical runs can read 3-10× over the min), so min-of-N
  * is the only stable estimator of engine cost. The JSON carries the
  * host load average so between-run environment drift is visible.
  *
  * Output: the JSON line goes to stdout AND, when SPARK_GRAFT_BENCH_OUT
  * is set, to that file — sbt interleaves [info] noise on stdout, so the
  * file is the reliable channel for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional session-conf overrides for controlled A/Bs (e.g.
    // "graft.argmin.rewrite.enabled=false,graft.topk.partial.enabled=false")
    sys.env.get("SPARK_GRAFT_BENCH_CONF").foreach {
      _.split(",").map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    }

    // Warmup: touch every table (footer/schema caches, codegen paths)
    Tables.names.foreach { n =>
      Tables.t(spark, sfDir, n).limit(1).foreach(_ => ())
    }
    // Prime the OS page cache: stream every parquet byte once (raw
    // read, no decode — ~1-2 s at sf0.1). Without this, whichever
    // queries run FIRST pay the cold-IO cost and the round-over-round
    // diff reads run ORDER as query regressions (r8: 34 of 41 shared
    // queries drifted 1.0-1.34× with untouched code — VERDICT-r8 #6).
    // Generation fingerprint, collected during the same walk: total
    // parquet bytes + newest mtime (epoch s). The driver REGENERATES
    // the testdata every round, so round-over-round per-query deltas
    // are confounded by generation density (r10's 41 % total swell was
    // only attributable by cross-referencing SCALING.md prose) — the
    // artifact itself must say which generation it measured
    // (VERDICT-r10 ask #3).
    var genBytes = 0L
    var genMtime = 0L
    locally {
      val buf = new Array[Byte](1 << 20)
      java.nio.file.Files.walk(Paths.get(sfDir)).forEach { p =>
        if (p.toString.endsWith(".parquet") && Files.isRegularFile(p)) {
          genBytes += Files.size(p)
          genMtime = math.max(genMtime,
            Files.getLastModifiedTime(p).toMillis / 1000L)
          val in = Files.newInputStream(p)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
      }
    }

    // optional comma-separated name filter for local spot-benching
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // Untimed warm-up reps per query (default 1): rep-1 of a cold
    // query carries its JIT/codegen compilation, not engine cost —
    // measured spreads show rep-1 up to 2.2× the final min (g02:
    // [9.99, 5.47, 4.64] at sf0.1), which both wastes a rep and
    // widens the between-run envelope the round-over-round diff can
    // resolve (VERDICT-r8 #6). The warm rep runs the identical
    // plan+action, is discarded, and the block-manager sweep below
    // still runs between IT and the timed reps.
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1")
      .toInt.max(0)
    // Executor-thread CPU per query, alongside wall: the r9 double-run
    // measured the wall envelope as RUN-level (whole rep distributions
    // shift between JVMs — q08 read [0.41..0.51] in one run and
    // [0.71..1.02] in the next, disjoint), so no rep count tightens
    // wall below ~1.3-1.4× p90 on this host. A first cut recorded
    // whole-PROCESS CpuTime and measured WORSE than wall (median mover
    // 1.175 vs 1.078 across a back-to-back pair): process CPU sweeps
    // in JIT/GC/ContextCleaner background threads, which dwarf a
    // sub-second query's own work. The column that isolates "did this
    // query's WORK change" is the CPU of the EXECUTOR TASK THREADS
    // only — in local mode a stable pool named "Executor task launch
    // worker-N" — summed before/after each rep via ThreadMXBean.
    // Snapshot (threadId → cpuNanos) and difference PER ID: the pool's
    // threads die on a 60 s keepalive, and a dead thread's accumulated
    // CPU vanishing from an aggregate sum made whole-rep deltas go
    // NEGATIVE (9 queries in the first full run). Per-id deltas are
    // immune: a respawned id counts from zero (correct); a thread that
    // hits its keepalive mid-rep is absent from the after snapshot, so
    // its ENTIRE in-rep CPU is lost (not just the tail) — acceptable
    // for a diagnostic column, and the pool is stable within a rep in
    // practice (the keepalive only fires across long idle gaps).
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
    def execCpuSnap(): java.util.HashMap[java.lang.Long, java.lang.Long] = {
      val out = new java.util.HashMap[java.lang.Long, java.lang.Long]()
      val ids = tmx.getAllThreadIds
      val infos = tmx.getThreadInfo(ids)
      var i = 0
      while (i < ids.length) {
        val info = infos(i)
        if (info != null &&
            info.getThreadName.startsWith("Executor task launch worker")) {
          val t = tmx.getThreadCpuTime(ids(i))
          if (t > 0) out.put(ids(i), t)
        }
        i += 1
      }
      out
    }
    def execCpuDelta(
        before: java.util.HashMap[java.lang.Long, java.lang.Long],
        after: java.util.HashMap[java.lang.Long, java.lang.Long]): Long = {
      var sum = 0L
      val it = after.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val b = before.getOrDefault(e.getKey, 0L)
        if (e.getValue > b) sum += e.getValue - b
      }
      sum
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, fn) =>
      val times = (1 - warmups to reps).map { _ =>
        val t0 = System.nanoTime()
        val c0 = execCpuSnap()
        try fn(spark, sfDir).foreach(_ => ())
        catch { case e: Throwable =>
          // FIRST LINE only: a multi-line Spark message interleaves
          // with executor stderr and can clobber this marker entirely
          // (the sf10 sweep's failures were invisible in the log; the
          // recorded per-query time is then time-to-failure, not a
          // completion — r8 lesson)
          // getMessage is null for NPEs and many JVM errors — Option
          // it, or the catch block itself NPEs and kills the sweep
          System.err.println(s"[bench] $name FAILED: " +
            Option(e.getMessage)
              .flatMap(_.linesIterator.nextOption())
              .getOrElse(e.toString))
        }
        // Wall stops BEFORE the closing CPU snapshot (an all-thread
        // ThreadMXBean walk) so the wall metric stays uncontaminated
        // by the instrumentation — the methodology treats 1.15× movers
        // as signal, and sub-second queries would otherwise carry the
        // snapshot cost inside every rep (ADVICE r9).
        val dt = (System.nanoTime() - t0) / 1e9
        val dc = execCpuDelta(c0, execCpuSnap()) / 1e9
        spark.catalog.clearCache() // drop any query-internal persists
        // clearCache only drops CATALOG-cached plans — localCheckpoint
        // and raw RDD persist blocks (the iterative operators: g01/g03/
        // g04/g05/g07/g09/g14/g15, d07, t23) are invisible to it, and
        // across 198 queries × reps they accumulated until eviction
        // races made late queries recompute full lineages (r6: g03 min
        // 2.1 s → 13.2 s with unchanged code). Sweep the block manager
        // itself so every rep starts from zero resident blocks.
        // ASSUMES strictly sequential reps (true here: queries run one
        // at a time in this loop) — a cross-query session-level cache
        // or overlapping reps would be destroyed by this sweep and
        // re-measured cold.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        // shuffle FILES outlive the rep too: they are deleted only when
        // the ContextCleaner GCs the shuffle dependency. At sf5+ the
        // triangle-family reps each leave tens of GB of shuffle files,
        // and three consecutive queries exhausted the disk (r8).
        // An explicit GC makes the cleaner reclaim them between reps.
        System.gc()
        (dt, dc)
      }
      // the first `warmups` entries are the untimed-by-contract warm
      // reps — identical hygiene ran for them, only the timing drops
      name -> times.drop(warmups)
    }
    // ---- generation-independent anchors (r12, VERDICT-r11 ask #3):
    // five queries timed against a checked-in deterministic corpus
    // (graft.tools.AnchorCorpus — every value a pure hash of the row
    // id, identical bytes every round). Round-over-round anchor drift
    // measures run conditions + code with the DATA HELD CONSTANT,
    // which the regenerated-sfDir sweep above cannot do — per-query
    // attribution across generations goes through these, not the main
    // map (SCALING.md r12). Same discipline as the sweep: page-cache
    // prime, 1 untimed warm rep, min-of-reps, block-manager sweep
    // between reps. Skipped under SPARK_GRAFT_BENCH_ONLY spot-runs or
    // SPARK_GRAFT_ANCHORS=0; failures degrade to an empty map, never
    // the bench line.
    val anchorNames = Seq("q01_pricing_summary", "d02_minhash_lsh",
      "a10_sketch_rollup", "g14_landmark_radius", "s19_knn_graph")
    val anchorsOn = only.isEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_ANCHORS", "1") != "0"
    val anchorMs: Seq[(String, Long)] = if (!anchorsOn) Nil else try {
      val adir = sys.env.getOrElse("SPARK_GRAFT_ANCHOR_DIR",
        sys.props("java.io.tmpdir") + "/graft_anchor_" +
          graft.tools.AnchorCorpus.version)
      graft.tools.AnchorCorpus.ensure(spark, adir)
      locally { // prime the page cache over the anchor bytes
        val buf = new Array[Byte](1 << 20)
        java.nio.file.Files.walk(Paths.get(adir)).forEach { p =>
          if (p.toString.endsWith(".parquet") && Files.isRegularFile(p)) {
            val in = Files.newInputStream(p)
            try { while (in.read(buf) >= 0) () } finally in.close()
          }
        }
      }
      anchorNames.map { name =>
        val fn = SparkEntry.queries(name)
        val times = (0 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, adir).foreach(_ => ())
          val dt = System.nanoTime() - t0
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          System.gc()
          dt
        }.drop(1) // first rep is the untimed warm-up
        name -> Math.round(times.min / 1e6)
      }
    } catch { case e: Throwable =>
      System.err.println("[bench] anchors failed: " +
        Option(e.getMessage).flatMap(_.linesIterator.nextOption())
          .getOrElse(e.toString))
      Nil
    }
    val anchorJson = anchorMs
      .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + v }
      .mkString("{", ",", "}")
    val anchorGen = graft.tools.AnchorCorpus.version
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"${v.map(_._1).min}%.3f" }
      .mkString("{", ",", "}")
    // per-query min executor-thread-CPU seconds — the work column (see
    // the execCpu note above)
    val cpuQs = results
      .map { case (k, v) => "\"" + k + "\":" + f"${v.map(_._2).min}%.3f" }
      .mkString("{", ",", "}")
    // per-query rep spread: min/max + every rep, so the driver can
    // discount throttle-window noise itself (this VM's CPU is erratic —
    // a single high rep is host noise, not engine cost)
    val spread = results
      .map { case (k, v) =>
        val w = v.map(_._1)
        val repsArr = w.map(t => f"$t%.3f").mkString("[", ",", "]")
        "\"" + k + "\":" + f"""{"min":${w.min}%.3f,"max":${w.max}%.3f,"reps":$repsArr}"""
      }
      .mkString("{", ",", "}")
    val total = results.map(_._2.map(_._1).min).sum
    // run-conditions stamp: host load right after the sweep — the
    // judge's round-over-round diff can discount a run that shared
    // the machine (the r8 driver-vs-builder 11 % whole-run offset was
    // environment, not code; VERDICT-r8 #6)
    val load1 = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"cpu":$cpuQs,"spread":$spread,"sf":"$sfDir","reps":$reps,"warmups":$warmups,"load1":$load1%.2f,"gen":"$genMtime-$genBytes","anchor_gen":"$anchorGen","anchor_ms":$anchorJson}"""
    // The driver keeps only a ~2.3 KB stdout TAIL: the full line
    // (~14 KB with spread) truncates mid-stream and parses as null
    // (BENCH_r03/r04). Print it first for humans, then emit a compact
    // self-contained final line — per-query integer ms keyed by the
    // short query prefix (unique across the contract), no whitespace,
    // ~1.9 KB — so the LAST line the driver sees is parseable JSON.
    println(line)
    // Known-file channel: sbt wraps stdout in [info] noise; the driver
    // can read this file instead. Best-effort — a bad out-path must
    // not cost the stdout channel the results.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try Files.write(Paths.get(outPath),
      (line + "\n").getBytes(StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // EVERY per-query time must reach the driver's stdout tail
    // (measured: exactly the last 2000 bytes — PERF r11/r12 both came
    // back with per_query:{} and a null geomean because only the
    // compact line's 48-query top_ms survived truncation; VERDICT-r12
    // ask #2). A flat short-key ms map is 2.3 KB at 221 queries and
    // cannot fit, so the compact line carries (a) per-FAMILY subtotal
    // ms and (b) "q_ms": per-family INTEGER-MS ARRAYS, one element per
    // query in ascending full-name order within the family (the same
    // sortBy(_._1) order as `results`; names are stable across rounds,
    // so q_ms["g"][i] aligns round-over-round and with the sorted
    // contract names). ~1.0 KB for 221 queries — all of them, not a
    // top-N. Full per-query detail keyed by full name stays in the big
    // line above and in SPARK_GRAFT_BENCH_OUT.
    val famGroups = results.toSeq
      .groupBy { case (k, _) => k.takeWhile(_.isLetter) }
      .toSeq.sortBy(_._1)
    val famMs = famGroups
      .map { case (f, vs) =>
        "\"" + f + "\":" + Math.round(vs.map(_._2.map(_._1).min).sum * 1000) }
      .mkString("{", ",", "}")
    val qMs = famGroups
      .map { case (f, vs) =>
        "\"" + f + "\":" + vs.sortBy(_._1)
          .map(v => Math.round(v._2.map(_._1).min * 1000))
          .mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    // Regression guard on the reference's OWN workloads (wordcount,
    // grep, reverse-graph = t00-t03): these are the queries the
    // baseline comparison is really about, and they run 0.17-0.69 s at
    // sf0.1 today. If one blows its budget at sf0.1 something
    // structural regressed; flag it in-band (the bench must still
    // emit its line, so this warns rather than aborts).
    val refWork = results.filter(_._1.matches("t0[0-3].*"))
    val refGuard = refWork.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + Math.round(v.map(_._1).min * 1000)
    }.mkString("{", ",", "}")
    // Budgets carry the VM's documented 1.5-2x run-position noise on
    // top of the measured mins (t01-t03 ≤ 0.76 s → 2 s budget): a
    // noisy-but-healthy run must not stamp ref_guard:FAIL into the
    // bench JSON. t00 additionally pipes through external processes
    // (tr/awk) — its floor is process-spawn overhead, not engine cost.
    def refLimit(name: String): Double =
      if (name.startsWith("t00")) 4.0 else 2.0
    val slow = refWork.filter { case (k, v) => v.map(_._1).min >= refLimit(k) }
    val refSlow = sfDir.contains("sf0.1") && slow.nonEmpty
    if (refSlow) System.err.println(
      s"[bench] GUARD: reference workload over budget at sf0.1: " +
        slow.map(_._1).mkString(","))
    // Run-conditions + generation stamp IN THE COMPACT LINE (not just
    // the big one): warmup count, host load, and the data-generation
    // fingerprint — so BENCH_rN.json alone separates generation
    // density from run noise from code (VERDICT-r10 ask #3; the r10
    // 41 % swell needed SCALING.md prose to attribute).
    val compact =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","reps":$reps,"warmups":$warmups,"load1":$load1%.2f,"gen":"$genMtime-$genBytes","anchor_gen":"$anchorGen","anchor_ms":$anchorJson,"n_queries":${results.size},"ref_ms":$refGuard,"ref_guard":"${if (refSlow) "FAIL" else "ok"}","fam_ms":$famMs,"q_ms":$qMs}"""
    // In-band size guard: the driver keeps only the last 2000 stdout
    // bytes, and a compact line that outgrows that window truncates
    // silently (the failure mode that blinded PERF r11/r12). Warn so
    // the overflow is visible in the round it happens.
    if (compact.length > 1900) System.err.println(
      s"[bench] GUARD: compact line ${compact.length} B nears the " +
        "driver's 2000 B stdout tail — trim fields before it truncates")
    // The compact line must be the LAST BARE stdout line the driver
    // sees (BENCH_r03-r05 all parsed null because sbt wrapped it in
    // "[info] " and appended its "[success] Total time" epilogue).
    // Three layers: (1) build.sbt pipes the forked JVM's stdout
    // verbatim (OutputStrategy.StdoutOutput — no [info] prefix) and
    // suppresses the [success] epilogue (showSuccess := false);
    // (2) log level goes to ERROR before stop so Spark's shutdown
    // chatter stays off stdout; (3) the line itself prints from a JVM
    // shutdown hook, which runs after main returns — nothing in this
    // process prints later.
    spark.sparkContext.setLogLevel("ERROR")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      System.out.println(compact)
      System.out.flush()
    }))
    spark.stop()
  }
}
