package graft

import graft.kv.MapleJuice
import graft.queries.Dedup
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2): partition-count
  * invariance of the KV algebra, dedup idempotence, Jaccard bounds.
  * Uses raw ScalaCheck generators with fixed seeds (the scalatest
  * bridge artifact isn't in the offline cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val wordGen = Gen.listOfN(2, Gen.oneOf("aa", "bb", "cc", "dd"))
    .map(_.mkString(" "))
  private val docGen = Gen.listOfN(6, wordGen)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("wordcount result is independent of numTasks (repartition invariance)") {
    for (s <- 1 to 5) {
      val lines = sample(docGen, s)
      val n = sample(Gen.choose(1, 7), s + 100)
      val ds = lines.toDS()
      def run(tasks: Int) = MapleJuice.juice(
        MapleJuice.maple(ds, tasks)(
          _.split("\\s+").iterator.filter(_.nonEmpty).map((_, "1"))), tasks)(
        (k, vs) => Iterator.single((k, vs.size.toString))).collect().toSeq
      assert(run(n) === run(1), s"seed $s tasks $n")
    }
  }

  test("exact dedup is idempotent: keepers survive a second pass unchanged") {
    for (s <- 1 to 5) {
      val docs = sample(docGen, s).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val keepers = Dedup.exactDf(docs).select("keeper").as[Long].collect().toSet
      val kept = docs.filter($"doc_id".isin(keepers.toSeq: _*))
      val twice = Dedup.exactDf(kept)
      assert(twice.filter($"n_copies" > 1).count() === 0, s"seed $s")
      assert(twice.count() === keepers.size, s"seed $s")
    }
  }

  test("dup clusters are invariant to input partitioning") {
    val docs = graft.Tables.t(spark, sf, "documents")
    def labels(n: Int) =
      Dedup.dupClustersDf(docs.repartition(n))
        .select("doc_id", "cluster")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(labels(1) === labels(17))
  }

  test("ngram jaccard is bounded in (0, 1], pairs canonically ordered") {
    for (s <- 1 to 5) {
      val docs = sample(docGen, s).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      Dedup.ngramJaccardDf(docs).as[(Long, Long, Double)].collect()
        .foreach { case (a, b, j) =>
          assert(j > 0 && j <= 1.0, s"seed $s")
          assert(a < b, s"seed $s")
        }
    }
  }

  /** Plain-Scala mirror of g01's integer recurrence — the distributed
    * result must equal it exactly on any graph (fixed-point arithmetic
    * has no association slack to hide in). */
  private def refPageRank(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import graft.queries.Graph.{baseRank, custOffset, initRank, prRounds}
    val und = pairs.distinct.map { case (s, c) => (s, c + custOffset) }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val outDeg = und.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val nodes = und.map(_._1).distinct
    var pr = nodes.map(_ -> initRank).toMap
    for (_ <- 1 to prRounds) {
      val in = und.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => pr(s) / outDeg(s) }.sum
      }
      pr = nodes.map(n => n -> (baseRank + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    pr
  }

  test("pointer-jumping min-label equals union-find components on random graphs") {
    import org.apache.spark.sql.functions.col
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
    for (s <- 1 to 5) {
      val edges = sample(edgeGen, s).filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // reference: union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = nodes.groupBy(find).values
          .flatMap(ns => ns.map(_ -> ns.min)).toMap
        // 30 nodes ⇒ worst-case path diameter ~30, radius ≤ 29: 5 jump
        // rounds cover radius ≥ 31, linear propagation would need 29
        val got = graft.operators.ConnectedComponents.minLabelJumping(
            nodes.toDF("id"),
            edges.toDF("src", "dst").repartition(3), 5)
          .select(col("id"), col("label"))
          .as[(Long, Long)].collect().toMap
        assert(got === want, s"seed $s")
      }
    }
  }

  test("distinct-window rewrite is value-identical to the set plan on random inputs") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    val rowGen = Gen.listOfN(60, Gen.zip(
      Gen.choose(0, 3), Gen.choose(0L, 20L),
      Gen.option(Gen.oneOf("u", "v", "w", "z"))))
    val wr = W.partitionBy($"p").orderBy($"o", $"id")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    for (s <- 1 to 3) {
      val rows = sample(rowGen, s).zipWithIndex
        .map { case ((p, o, x), i) => (p, o, i.toLong, x) }
      val df = rows.toDF("p", "o", "id", "x").repartition(5)
      def run(): Set[(Int, Long, Int)] =
        df.select($"p", $"id", size(collect_set($"x").over(wr)).as("nd"))
          .as[(Int, Long, Int)].collect().toSet
      val rewritten = run()
      spark.conf.set("graft.distinctwindow.rewrite.enabled", "false")
      val stock = try run()
        finally spark.conf.unset("graft.distinctwindow.rewrite.enabled")
      assert(rewritten === stock, s"seed $s")
    }
  }

  test("pagerank equals the in-memory integer reference on random graphs") {
    val pairGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 5L)))
    for (s <- 1 to 5) {
      val pairs = sample(pairGen, s)
      val li = pairs.zipWithIndex
        .map { case ((supp, _), i) => (i.toLong, supp) }
        .toDF("l_orderkey", "l_suppkey")
      val ord = pairs.zipWithIndex
        .map { case ((_, cust), i) => (i.toLong, cust) }
        .toDF("o_orderkey", "o_custkey")
      val got = graft.queries.Graph.pageRankDf(li, ord)
        .as[(Long, Long)].collect().toMap
      assert(got === refPageRank(pairs), s"seed $s")
    }
  }

  test("t17 chunks cover every token exactly once per stride window") {
    import graft.queries.TextOps
    val lenGen = Gen.choose(1, 130)
    for (s <- 1 to 8) {
      val n = sample(lenGen, s + 500)
      val docs = Seq((1L, (1 to n).map(i => s"t$i").mkString(" ")))
        .toDF("doc_id", "text")
      val chunks = TextOps.chunkOverlapDf(docs)
        .select("chunk_idx", "start_tok", "n_tok")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      val (w, st) = (TextOps.chunkTokens, TextOps.chunkStride)
      // expected count: 1 + ceil(max(n-W,0)/S)
      assert(chunks.length === 1 + (math.max(n - w, 0) + st - 1) / st,
        s"n=$n")
      // full coverage: union of [start, start+len) is exactly [1, n]
      val covered = chunks.flatMap { case (_, a, l) => a until (a + l) }.toSet
      assert(covered === (1 to n).map(_.toLong).toSet, s"n=$n")
      // every chunk is as long as the window or ends at n
      chunks.foreach { case (_, a, l) =>
        assert(l === w.toLong || a + l - 1 === n.toLong, s"n=$n start=$a")
      }
    }
  }

  test("morton spread is a bijection on 16-bit inputs (zorder keys " +
      "never collide)") {
    def spread(x: Long): Long = {
      var v = x & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    val pairGen = Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L))
    val seen = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for (s <- 1 to 200) {
      val (a, b) = sample(pairGen, s)
      val z = spread(a) | (spread(b) << 1)
      // invertible: de-interleaving recovers the inputs
      def unspread(v: Long): Long = {
        var x = v & 0x55555555L
        x = (x | (x >> 1)) & 0x33333333L
        x = (x | (x >> 2)) & 0x0F0F0F0FL
        x = (x | (x >> 4)) & 0x00FF00FFL
        x = (x | (x >> 8)) & 0x0000FFFFL
        x
      }
      assert(unspread(z) === a && unspread(z >> 1) === b, s"($a,$b)")
      seen.get(z).foreach(p => assert(p === ((a, b)), s"collision at $z"))
      seen(z) = (a, b)
    }
  }

  test("q51's run collapse tiles random event logs without gaps") {
    import org.apache.spark.sql.functions.{col, expr}
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 4L),                 // user
      Gen.choose(0L, 50L),                // coarse ts (collisions likely)
      Gen.oneOf("click", "view", "buy"))) // state
    for (s <- 1 to 5) {
      val rows = sample(evGen, s + 40).zipWithIndex.map {
        case ((u, t0, st), i) => (i.toLong, u, st, t0 * 1000000L)
      }
      // run the same gaps-and-islands chain q51 uses, against a
      // driver-side fold over the identically-sorted log
      val df = rows.toDF("event_id", "user_id", "state", "ep_us")
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ep_us"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = df
        .withColumn("chg", expr(
          """case when lag(state, 1) over (partition by user_id
             order by ep_us, event_id) is distinct from state
             then 1L else 0L end"""))
        .withColumn("version",
          org.apache.spark.sql.functions.sum(col("chg")).over(cum))
        .groupBy(col("user_id"), col("version"))
        .agg(org.apache.spark.sql.functions.max(col("state")).as("state"),
          org.apache.spark.sql.functions.min(col("ep_us")).as("from_us"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
        .as[(Long, Long, String, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      val want = rows.groupBy(_._2).view.mapValues { es =>
        es.sortBy(e => (e._4, e._1))
          .foldLeft(List.empty[(String, Long, Long)]) {
            case ((st0, f, n) :: rest, (_, _, st, us)) if st0 == st =>
              (st0, f, n + 1) :: rest
            case (acc, (_, _, st, us)) => (st, us, 1L) :: acc
          }.reverse
      }.toMap
      got.foreach { case (u, vs) =>
        assert(vs.map(_._2).toSeq === (1L to vs.length).toSeq, s"seed $s")
        assert(vs.map(v => (v._3, v._4, v._5)).toSeq === want(u),
          s"seed $s user $u")
      }
    }
  }

  test("q53 CDC apply is idempotent on the clean table for random batches") {
    import org.apache.spark.sql.functions.col
    import graft.queries.Relational
    val baseGen = Gen.listOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(0, 99999)))
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 3L),                   // user (keys = user * stride)
      Gen.choose(0L, 50L),                  // coarse ts (ties likely)
      Gen.oneOf("click", "view", "buy")))   // click = delete
    for (s <- 1 to 5) {
      val base = sample(baseGen, s).distinctBy(_._1)
        .map { case (k, c) => (k, c.toDouble / 100) }
      val evs = sample(evGen, s + 7).zipWithIndex.map {
        case ((u, t0, ty), i) => (i.toLong, t0 * 1000000000L, u, ty)
      }
      val evDf = evs.toDF("event_id", "ts", "user_id", "event_type")
      def clean(customer: org.apache.spark.sql.DataFrame) =
        Relational.q53CdcApplyDf(evDf, customer)
          .filter(col("change") =!= "deleted")
          .select(col("custkey").as("c_custkey"), col("bal").as("c_acctbal"))
      val once = clean(base.toDF("c_custkey", "c_acctbal"))
      val onceRows = once.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val twiceRows = clean(once).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(onceRows.toSeq === twiceRows.toSeq, s"seed $s")
    }
  }

  test("s08 codes are bounded in [0,255] and order-preserving per dim") {
    import graft.queries.Similarity
    val vecGen = Gen.listOfN(6,
      Gen.listOfN(4, Gen.choose(-1000, 1000).map(_ / 250.0f)))
    for (s <- 1 to 5) {
      val vs = sample(vecGen, s + 900)
      val embs = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray, 0) }
        .toDF("vec_id", "embedding", "label")
      // recompute codes the slow way from raw values
      val fp = vs.map(_.map(x => math.floor(x * 1048576.0).toLong))
      val dims = fp.head.indices
      val codes = dims.map { d =>
        val col = fp.map(_(d))
        val (mn, mx) = (col.min, col.max)
        col.map(v => if (mx == mn) 0L else (v - mn) * 255L / (mx - mn))
      }
      codes.foreach(_.foreach(c => assert(c >= 0L && c <= 255L)))
      // per dimension, larger raw value never gets a smaller code
      dims.foreach { d =>
        fp.map(_(d)).zip(codes(d)).sortBy(_._1).map(_._2)
          .sliding(2).foreach {
            case Seq(a, b) => assert(a <= b, s"seed $s dim $d")
            case _         =>
          }
      }
      // and the engine's weighted checksum matches this recompute
      val expSum = vs.indices.map(i =>
        i.toLong -> dims.map(d => codes(d)(i) * (d + 1)).sum).toMap
      val got = Similarity.embeddingQuantizeDf(embs)
        .select("vec_id", "code_sum").as[(Long, Long)].collect().toMap
      assert(got === expSum, s"seed $s")
    }
  }

  test("q58 PIT join equals a brute-force interval scan on random logs") {
    import org.apache.spark.sql.functions.col
    import graft.queries.Relational
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 4L),                     // user
      Gen.choose(0L, 40L),                    // coarse µs (ties likely)
      Gen.oneOf("click", "view", "purchase")))
    for (s <- 1 to 5) {
      val rows = sample(evGen, s + 500).zipWithIndex.map {
        case ((u, t0, st), i) => (i.toLong, u, st, t0) }
      // ts in ns (the Tables.t shape); run the REAL operator
      val ev = rows.map { case (id, u, st, us) => (id, u, st, us * 1000L) }
        .toDF("event_id", "user_id", "event_type", "ts")
      val got = Relational.q58PitJoinDf(ev)
        .select(col("event_id"), col("prior_version"), col("prior_state"))
        .as[(Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // brute force: versions from a driver-side run collapse; probe
      // picks the version whose [from, to) contains ts-1
      val want = rows.filter(_._3 == "purchase").map { case (id, u, _, us) =>
        val evs = rows.filter(_._2 == u).sortBy(e => (e._4, e._1))
        val runs = evs.foldLeft(List.empty[(String, Long, Long)]) {
          case ((st0, f, n) :: rest, (_, _, st, t)) if st0 == st =>
            (st0, f, n + 1) :: rest
          case (acc, (_, _, st, t)) => (st, t, 1L) :: acc
        }.reverse.zipWithIndex
          .map { case ((st, f, n), i) => (i + 1L, st, f) }
        val p = us - 1
        val hit = runs.zip(runs.drop(1).map(r => Some(r._3)) :+ None)
          .find { case ((_, _, f), to) => f <= p && to.forall(p < _) }
        id -> hit.map { case ((v, st, _), _) => (v, st) }
          .getOrElse((0L, "none"))
      }.toMap
      assert(got === want, s"seed $s")
    }
  }

  test("t23/t24 match the reference BPE trainer on random corpora") {
    import graft.queries.{BpeReference, TextOps}
    // tiny alphabet forces tie-breaks, repeated merges, and (on some
    // seeds) full collapse before the round budget runs out
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c"))
      .map(_.take(5).mkString)
    val docGen = Gen.nonEmptyListOf(wordGen).map(_.take(8).mkString(" "))
    val corpusGen = Gen.nonEmptyListOf(docGen).map(_.take(6))
    for (s <- 1 to 5) {
      val texts = sample(corpusGen, s + 300)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val (wantMerges, wantWf) =
        BpeReference.train(texts, TextOps.bpeLearnRounds)
      val gotMerges = TextOps.bpeLearnDf(docs)
        .as[(Long, String, String, String, Long)].collect().toSeq
      assert(gotMerges === wantMerges, s"seed $s merges")
      val gotVocab = TextOps.bpeApplyDf(docs)
        .as[(String, Long, Long)].collect().toSeq
      assert(gotVocab ===
        BpeReference.vocabHead(wantWf, TextOps.bpeVocabTopK),
        s"seed $s vocab")
    }
  }

  test("q56 bin packing conserves mass and meets the cumulative-target " +
    "law on random manifests") {
    import org.apache.spark.sql.functions.col
    val target = 1000L
    val fileGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("A", "B", "C"),        // partition
      Gen.choose(1L, 60L),             // file id (collisions dropped)
      Gen.choose(1L, 3500L),           // bytes (some files span bins)
      Gen.choose(1L, 500L)))           // rows
    for (s <- 1 to 5) {
      val files = sample(fileGen, s + 70)
        .groupBy(f => (f._1, f._2)).map(_._2.head).toSeq
        .map { case (p, id, b, r) => (p, id, r, b) }
      val df = files.toDF("part", "file_id", "n_rows", "bytes")
      val plan = graft.queries.Relational.compactionBins(df, target)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      // mass conservation, per partition and total
      val bytesByPart = files.groupBy(_._1).view.mapValues(_.map(_._4).sum)
      val rowsByPart = files.groupBy(_._1).view.mapValues(_.map(_._3).sum)
      plan.groupBy(_._1).foreach { case (p, bins) =>
        assert(bins.map(_._6).sum === bytesByPart(p), s"seed $s part $p bytes")
        assert(bins.map(_._7).sum === rowsByPart(p), s"seed $s part $p rows")
        assert(bins.map(_._3).sum === files.count(_._1 == p), s"seed $s $p files")
        // cumulative-target law: through every non-final bin k the
        // packed bytes reach at least (k+1)*target
        val sorted = bins.sortBy(_._2)
        var cum = 0L
        sorted.dropRight(1).foreach { b =>
          cum += b._6
          assert(cum >= (b._2 + 1) * target,
            s"seed $s part $p bin ${b._2}: cum $cum < ${(b._2 + 1) * target}")
        }
        // file spans never overlap across bins (packing is in order)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._5 < b._4, s"seed $s $p span overlap")
          case _ =>
        }
      }
    }
  }
}
