package graft.queries

import graft.SparkSpec
import graft.Tables.t
import org.apache.spark.sql.functions._

/** p01–p03 deterministic sampling: the claims under test are
  * reproducibility (identical output under re-partitioning — the sample
  * IS the dataset lineage at 100 TB) and the semantic bounds (rate,
  * quota, cap). */
class SamplingSpec extends SparkSpec {

  private lazy val docs = t(spark, sf, "documents")

  test("p01 hash sample is invariant under input partitioning") {
    val a = Sampling.hashSampleDf(docs).collect().toSeq
    val b = Sampling.hashSampleDf(docs.repartition(7)).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("p01 keeps only docs under the md5 threshold, rate near 13/256") {
    val n = docs.count()
    val kept = Sampling.hashSampleDf(docs).count()
    // binomial(n, 13/256): allow a wide band — determinism, not luck
    val rate = kept.toDouble / n
    assert(rate > 0.005 && rate < 0.15, s"rate $rate")
  }

  test("p02 stratified sample: per-source quota respected, ranks dense") {
    val out = Sampling.stratifiedSampleDf(docs)
    val bySource = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"))
      .collect()
    assert(bySource.nonEmpty)
    bySource.foreach { r =>
      assert(r.getLong(1) <= Sampling.stratQuota)
      assert(r.getLong(2) === r.getLong(1)) // ranks 1..n, no gaps
    }
    // deterministic under re-partitioning
    val again = Sampling.stratifiedSampleDf(docs.repartition(5)).collect().toSeq
    assert(again == out.collect().toSeq)
  }

  test("p03 cap report: kept counts bounded by cap, totals preserved") {
    val out = Sampling.sourceCapReportDf(docs).collect()
    val truth = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (src, total, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(total === truth(src))
      assert(kept === math.min(total, Sampling.sourceCap.toLong))
    }
    // every source appears exactly once
    assert(out.map(_.getString(0)).distinct.length === out.length)
  }

  test("p03 keeps the smallest doc ids (auditable cap)") {
    // recompute the kept set the naive way and compare kept_chars
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    val naive = docs.select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Sampling.sourceCap)
      .groupBy("source").agg(sum("n_chars").as("kept_chars"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Sampling.sourceCapReportDf(docs).collect().foreach { r =>
      assert(r.getLong(3) === naive(r.getString(0)))
    }
  }

  test("p07 split covers every doc once with ~90/5/5 shares, partition-invariant") {
    val rep = Sampling.datasetSplitDf(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val total = rep.map(_._3).sum
    assert(total === docs.count(), "split dropped or duplicated docs")
    val bySplit = rep.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // md5 buckets are uniform: train ≈ 90% with slack for small corpora
    assert(bySplit("train").toDouble / total > 0.8)
    assert(bySplit.getOrElse("val", 0L) + bySplit.getOrElse("test", 0L) <
      total / 4)
    val again = Sampling.datasetSplitDf(docs.repartition(7)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rep.sameElements(again))
  }

  test("p15 decontaminated split matches an in-memory recompute: " +
      "quarantine holds exactly the leaky train docs, mass conserved") {
    val out = Sampling.decontaminatedSplitDf(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // full independent recompute (md5 split + df-pruned shingle leak)
    val rows = docs.selectExpr("doc_id", "text", "source", "n_chars")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def splitOf(id: Long): String = {
      val b = java.lang.Long.parseLong(md5hex(id.toString).take(4), 16) % 100
      if (b < Sampling.valLo) "train" else if (b < Sampling.testLo) "val"
      else "test"
    }
    def shingles(tx: String): Set[String] = {
      val tk = tx.split(" ", -1)
      (1 to math.max(tk.length - 2, 1))
        .map(i => tk.slice(i - 1, i + 2).mkString(" ")).toSet
    }
    val sh = rows.map { case (id, tx, _, _) => id -> shingles(tx) }.toMap
    val df = sh.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val pruned = sh.map { case (id, ss) =>
      id -> ss.filter(df(_) <= Dedup.maxShingleDf) }
    val evalSh = rows.iterator
      .filter(r => splitOf(r._1) != "train").flatMap(r => pruned(r._1)).toSet
    val want = rows.map { case (id, _, src, nc) =>
      val s0 = splitOf(id)
      val fin = if (s0 == "train" && pruned(id).exists(evalSh)) "quarantine"
      else s0
      (fin, src, nc)
    }.groupBy(t3 => (t3._1, t3._2)).map { case ((f, s0), g) =>
      (f, s0, g.length.toLong, g.map(_._3).sum)
    }.toSeq.sortBy(t4 => (t4._1, t4._2))
    assert(out.toSeq === want)
    // conservation: quarantine came OUT of train, nothing vanished
    assert(out.map(_._3).sum === rows.length.toLong)
    assert(out.exists(_._1 == "quarantine"),
      "fixture has no leaky train docs — the test is vacuous")
  }

  test("p08 seeded shuffle is a permutation: every doc once, dense shard positions") {
    val out = Sampling.seededShuffleDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length.toLong === docs.count())
    assert(out.map(_._3).distinct.length === out.length, "a doc repeated")
    out.foreach { case (shard, _, _) => assert(shard >= 0 && shard < 256) }
    // positions are 1..n within each shard, no gaps
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1L to rows.length.toLong))
    }
    // the epoch permutation replays identically on any partitioning
    val again = Sampling.seededShuffleDf(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sameElements(again))
  }

  test("p09 interleave: per-source quota, unique positions, round-robin blocks") {
    val out = Sampling.interleaveMixDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val nSources = docs.select("source").distinct().count()
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // quota respected, exact for sources with enough docs
    out.groupBy(_._3).foreach { case (src, rows) =>
      assert(rows.length.toLong ===
        math.min(Sampling.interleaveQuota, sizes(src)))
    }
    // one global position per row
    assert(out.map(_._1).distinct.length === out.length)
    // each round-robin block of |sources| positions sees a source at most once
    out.groupBy(t => (t._1 - 1) / nSources).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length === rows.length)
    }
  }

  test("p10: curriculum covers every doc, bands quarter each source, " +
    "and is invariant under input partitioning") {
    val out = Sampling.curriculumDf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.map(_._3).sum === docs.count())
    assert(out.map(_._1).distinct.sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    out.foreach { case (_, _, _, _, minF, meanF) =>
      assert(meanF >= minF)
    }
    // ntile(4) per source: band totals differ from n/4 by at most the
    // number of sources (one remainder row each)
    val nSources = docs.select("source").distinct().count()
    val total = out.map(_._3).sum
    out.groupBy(_._1).foreach { case (band, rows) =>
      val got = rows.map(_._3).sum
      assert(math.abs(got - total / 4) <= nSources, s"band $band: $got")
    }
    val b = Sampling.curriculumDf(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === b.toSeq)
  }

  test("p13: allocation matches a BigInt recompute and sums exactly " +
      "to the budget") {
    import graft.Tables.t
    val out = Sampling.varAllocation(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val rows = t(spark, sf, "documents")
      .selectExpr("source", "CAST(n_chars AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val b = BigInt(Sampling.p13Budget)
    val ws = rows.groupBy(_._1).map { case (src, g) =>
      val n = BigInt(g.size)
      val sx = g.map(r => BigInt(r._2)).sum
      val sxx = g.map(r => BigInt(r._2) * r._2).sum
      val w = ((n * sxx - sx * sx) / n).max(BigInt(1))
      (src, n, w)
    }.toSeq
    val wsum = ws.map(_._3).sum
    val based = ws.map { case (src, n, w) =>
      (src, n, w, b * w / wsum, b * w - (b * w / wsum) * wsum)
    }
    val leftover = (b - based.map(_._4).sum).toLong
    val ranked = based.sortBy { case (src, _, _, _, rem) => (-rem, src) }
      .zipWithIndex
    val want = ranked.map { case ((src, n, w, base, _), i) =>
      val alloc = if (i < leftover) base + 1 else base
      (src, n.toLong, (w / n).toLong, base.toLong, alloc.toLong)
    }.toSet
    assert(out.toSet === want)
    assert(out.map(_._5).sum === Sampling.p13Budget,
      "largest-remainder allocation must sum exactly to the budget")
  }

  test("p12: survivors + thresholds match an in-memory d01 recompute; " +
      "duplicated sources deflate") {
    import graft.Tables.t
    val docs = t(spark, sf, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val keepIds = docs.groupBy(_._3).values.map(_.map(_._2).min).toSet
    val raw = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val kept = docs.filter(d => keepIds(d._2))
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val mxRaw = raw.values.max
    val mxKept = kept.values.max
    def thr(n: Long, mx: Long): Long =
      math.floor(65536.0 * (math.sqrt(n.toDouble) / math.sqrt(mx.toDouble)))
        .toLong
    val want = raw.keys.map { src =>
      val k = kept.getOrElse(src, 0L)
      (src, raw(src), k, k * 1000000L / raw(src),
        thr(raw(src), mxRaw), thr(k, mxKept))
    }.toSet
    val out = Sampling.dedupAwareMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSet === want)
    // the design claim: survival is a per-source quantity (if any source
    // is duplicated at all, at least one source deflates below 1e6 ppm)
    if (docs.length > keepIds.size)
      assert(out.exists(_._4 < 1000000L))
  }

  test("p11: water-filling saturates small sources, caps big ones, and " +
    "fills the budget to within the integer remainder") {
    import spark.implicits._
    // skewed masses: 100/200/1000/5000 tokens (one doc per source)
    val skewed = Seq(
      (0L, ("w " * 100).trim, "en", "tiny", 0L),
      (1L, ("w " * 200).trim, "en", "small", 0L),
      (2L, ("w " * 1000).trim, "en", "mid", 0L),
      (3L, ("w " * 5000).trim, "en", "huge", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Sampling.budgetCapsDf(skewed).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val budget = 6300L * Sampling.budgetPct / 100 // = 5670
    val m = out.map(r => r._1 -> r).toMap
    // the three under-the-water-line sources keep everything
    Seq("tiny" -> 100L, "small" -> 200L, "mid" -> 1000L).foreach {
      case (s0, tk) =>
        assert(m(s0)._5 === 1L && m(s0)._4 === tk, s0)
    }
    // the big source is cut to the remaining budget
    assert(m("huge")._5 === 0L && m("huge")._4 === budget - 1300L)
    // allocation fills the budget up to the division remainder
    val alloc = out.map(_._4).sum
    val nUnsat = out.count(_._5 == 0L)
    assert(alloc <= budget && budget - alloc < math.max(nUnsat, 1).toLong)
    // real corpus: the rounds reach the water-filling FIXED POINT —
    // the output equals an in-memory iteration run to convergence
    val real = Sampling.budgetCapsDf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(real.length === docs.select("source").distinct().count())
    val masses = docs
      .selectExpr("source", "size(split(text, ' ')) as n").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val b = masses.values.sum * Sampling.budgetPct / 100
    var sat = Set.empty[String]
    var cap = 0L
    var converged = false
    while (!converged) {
      val satSum = sat.toSeq.map(masses).sum
      val nUnsat = masses.size - sat.size
      cap = if (nUnsat == 0) Long.MaxValue / 4 else (b - satSum) / nUnsat
      val next = masses.filter(_._2 <= cap).keySet
      converged = next == sat
      sat = next
    }
    val want = masses.map { case (s0, tk) =>
      (s0, tk, cap, math.min(tk, cap), if (tk <= cap) 1L else 0L)
    }.toSeq.sortBy(_._1)
    assert(real.toSeq === want,
      "capRounds did not reach the fixed point on the contract corpus")
    // at the fixed point the budget is filled to the division remainder
    val nUnsatFinal = real.count(_._5 == 0L)
    assert(b - real.map(_._4).sum < math.max(nUnsatFinal, 1).toLong)
  }

  test("p14: epoch schedule matches an exact in-memory water-fill and " +
      "honors the budget and cap invariants") {
    val out = Sampling.epochSchedule(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // invariants first: epoch bounds, cap flag consistency, budget
    val utot = out.map(_._2).sum
    val budget = utot * Sampling.epochBudgetX
    assert(out.map(_._4).sum <= budget)
    for ((_, u, g, alloc, milli, capped) <- out) {
      assert(alloc >= u && alloc <= u * Sampling.epochCap)
      assert(milli === (alloc * 1000L) / u)
      assert(milli >= 1000L && milli <= Sampling.epochCap * 1000L)
      assert((capped == 1L) === (alloc == u * Sampling.epochCap))
      assert(g <= u)
    }
    // exact recompute mirroring the engine's round structure: each
    // round's shares use the PREVIOUS round's saturation set, and the
    // final extras are the ones computed in the last round
    val masses = out.map(r => (r._1, r._2, r._3))
    val x = budget - utot
    val capX = Sampling.epochCap - 1
    var sat = Set.empty[String]
    var extras = Map.empty[String, Long]
    for (_ <- 1 to Sampling.epochRounds) {
      val satExtra = masses.filter(m => sat(m._1))
        .map(m => m._2 * capX).sum
      val gUnsat = masses.filterNot(m => sat(m._1)).map(_._3).sum
      val round = masses.map { case (s0, u, g) =>
        val share =
          if (sat(s0)) u * capX
          else if (gUnsat == 0) 0L
          else ((BigInt(x - satExtra) * g) / gUnsat).toLong
        val sat2 = share >= u * capX
        (s0, if (sat2) u * capX else share, sat2)
      }
      extras = round.map(r => r._1 -> r._2).toMap
      sat = round.filter(_._3).map(_._1).toSet
    }
    for ((s0, u, _, alloc, _, _) <- out)
      assert(alloc === u + extras(s0), s"source $s0 allocation")
  }
}
