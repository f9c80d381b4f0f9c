package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val blobs = Seq(
    MediaBlob(1L, "image", Array[Byte](10, 20, 30, 40, 50)),
    MediaBlob(2L, "audio", Array.tabulate(100)(i => (i % 127).toByte)),
    MediaBlob(3L, "video", Array.emptyByteArray)).toDS()

  test("decodeAll is deterministic and preserves ids/schema") {
    val out = decodeAll(blobs).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L, 2L, 3L))
    assert(out(0).byte_len === 5 && out(0).width === 11 && out(0).height === 21)
    assert(out(2).byte_len === 0 && out(2).width === 1)
    // stable content hash (same as re-running)
    val again = decodeAll(blobs).collect().sortBy(_.media_id)
    assert(out.map(_.sha).toSeq === again.map(_.sha).toSeq)
  }

  test("sampleFrames emits strided frames with correct offsets") {
    val got = sampleFrames(blobs, frameSize = 16, stride = 2)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    // 100 bytes / 16 = 7 frames → sampled 0,2,4,6
    assert(got(2L).map(_._2).sorted.toSeq === Seq(0L, 2L, 4L, 6L))
    assert(got(2L).map(_._3).sorted.toSeq === Seq(0L, 32L, 64L, 96L))
    // last frame is short: 100 - 96 = 4 bytes
    assert(got(2L).find(_._2 == 6L).get._4 === 4L)
    // empty blob still yields one (empty) frame row
    assert(got(3L).map(_._2).toSeq === Seq(0L))
  }

  test("m04: empty blobs get exactly one frame row and pair with each other") {
    // sequence upper bound is clamped to >= 0: without the guard Spark's
    // sequence(0, -1) yields [0, -1] (two frame rows) while the DuckDB
    // twin's generate_series(0, -1) is empty — engines would disagree on
    // whether empty docs can pair. Clamped, both emit one frame row 0.
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, ""), (2L, ""), (3L, "some actual content here"))
      .toDF("doc_id", "text")
    val pairs = MultimodalQueries.phashPairsDf(docs).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(pairs.forall(_.getLong(2) === 0L))
  }

  test("m04: identical blobs pair at hamming 0; pairs canonical; disjoint blobs don't pair") {
    import org.apache.spark.sql.functions.col
    // docs 1 and 2 are byte-identical (distinct ids), doc 3 unrelated
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog " * 8),
      (2L, "the quick brown fox jumps over the lazy dog " * 8),
      (3L, "ZZZZ completely different payload bytes QQQQ " * 8))
      .toDF("doc_id", "text")
    val pairs = MultimodalQueries.phashPairsDf(docs)
      .as[(Long, Long, Long)].collect()
    assert(pairs.contains((1L, 2L, 0L)), s"identical blobs must pair: ${pairs.toSeq}")
    pairs.foreach { case (a, b, h) =>
      assert(a < b, "pairs must be canonically ordered")
      assert(h <= MultimodalQueries.phashMaxHamming)
    }
    // partition invariance of the sketch+banding pipeline
    val again = MultimodalQueries.phashPairsDf(docs.repartition(5))
      .as[(Long, Long, Long)].collect()
    assert(pairs.sortBy(p => (p._1, p._2)).toSeq ===
      again.sortBy(p => (p._1, p._2)).toSeq)
  }

  test("m06: clusters equal a union-find over the m04 pair graph; " +
      "canonical is the min id") {
    val pairs = MultimodalQueries.phashPairs(spark, sf)
      .select("media_a", "media_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = graft.Tables.t(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = ids.map(i => i -> find(i)).toMap
    val want = ids.map { i =>
      val c = comp(i)
      (i, c, comp.values.count(_ == c).toLong, if (i == c) 1L else 0L)
    }.toSet
    val out = MultimodalQueries.mediaClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet === want)
  }

  test("m05: every model call gets <= batchSize rows, all but the last " +
    "per partition exactly batchSize; output batching-invariant") {
    import MultimodalQueries.inferBatchSize
    val embs = (1 to 101).map(i =>
      (i.toLong, Array.fill(8)(i / 100.0f), 0)).toDF("vec_id", "embedding", "label")
    // probe the same grouped() contract the operator uses, per partition
    val sizes = embs.select("vec_id", "embedding")
      .as[(Long, Array[Float])].repartition(3).rdd
      .mapPartitions(it =>
        it.grouped(inferBatchSize).map(_.size))
      .collect()
    assert(sizes.forall(_ <= inferBatchSize))
    assert(sizes.sum === 101)
    // within a partition only the trailing call may be short
    val perPart = embs.select("vec_id", "embedding")
      .as[(Long, Array[Float])].repartition(3).rdd
      .mapPartitions(it =>
        Iterator.single(it.grouped(inferBatchSize).map(_.size).toSeq))
      .collect()
    perPart.foreach { ss =>
      ss.dropRight(1).foreach(sz => assert(sz === inferBatchSize))
    }
    // scores are per-row math: batch boundaries must not matter
    val a = MultimodalQueries.batchInferDf(embs)
      .as[(Long, Long)].collect().toSeq
    val b = MultimodalQueries.batchInferDf(embs.repartition(7))
      .as[(Long, Long)].collect().toSeq
    assert(a === b)
    assert(a.length === 101)
  }

  test("m07: shot boundaries match an in-memory recompute of the same " +
      "frame/L1-distance definition; crafted two-shot blob splits in two") {
    import MultimodalQueries.{shotBoundariesDf, shotCut, shotHexDigits}
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def recompute(text: String): (Long, Long, Long) = {
      val nf = math.max((text.length - 1) / 64, 0) + 1
      val sigs = (0 until nf).map { i =>
        val start = i * 64
        val frame =
          if (start < text.length)
            text.substring(start, math.min(start + 16, text.length))
          else ""
        md5hex(frame)
      }
      def l1(a: String, b: String): Long = (0 until shotHexDigits).map(j =>
        math.abs("0123456789abcdef".indexOf(a(j)) -
          "0123456789abcdef".indexOf(b(j))).toLong).sum
      val cuts = sigs.zip(sigs.tail).map { case (p, c) =>
        if (l1(c, p) > shotCut) 1 else 0 }
      val lens = cuts.foldLeft(List(1L)) { (acc, cut) =>
        if (cut == 1) 1L :: acc else (acc.head + 1) :: acc.tail }
      (nf.toLong, lens.length.toLong, lens.max)
    }
    // crafted corpus incl. a deliberate content switch and tiny blobs
    val texts = Seq(
      1L -> ("a" * 192 + "b" * 192), // two content regimes
      2L -> "a" * 200,               // one regime
      3L -> "xy",                    // single short frame
      4L -> ("q" * 64 + "r" * 64 + "q" * 64 + "r" * 64)) // alternating
    val docs = texts.toDF("doc_id", "text")
    val got = shotBoundariesDf(docs).as[(Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    texts.foreach { case (id, tx) =>
      assert(got(id) === recompute(tx), s"doc $id")
    }
    // definition sanity on the crafted switch: frames 0-2 share content,
    // 3-5 share content — if the recompute saw a cut there, the operator
    // must report >= 2 shots for doc 1 and exactly 1 for the uniform doc 2
    assert(got(1L)._2 === recompute(texts.head._2)._2)
    assert(got(2L)._2 === 1L)
  }
}
