package graft.queries

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("t00 exe-pipe wordcount equals t01's codegen'd wordcount") {
    // same tokenizer through a real process boundary (tr/awk exes via
    // RDD.pipe) must produce the identical (word, cnt) relation
    val viaExe = TextOps.exeWordCount(spark, sf)
      .as[(String, Long)].collect().toSeq
    val native = TextOps.wordCount(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(viaExe === native)
    assert(viaExe.nonEmpty)
  }

  test("t32: disjoint alphabets classify perfectly; shared-alphabet " +
      "docs classify deterministically by (overlap desc, lang asc)") {
    import org.apache.spark.sql.functions._
    // two languages with fully disjoint character sets => the trained
    // trigram profiles cannot overlap, confusion matrix is diagonal
    val docs = Seq(
      (0L, "aaab baaa abab bbaa", "aa"),
      (1L, "abba baab aabb abaa", "aa"),
      (2L, "xxxy yxxx xyxy yyxx", "xx"),
      (3L, "xyyx yxxy xxyy xyxx", "xx"))
      .toDF("doc_id", "text", "lang")
    val got = TextOps.trigramLidDf(docs)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("aa", "aa", 2L), ("xx", "xx", 2L)))
    // a doc whose trigrams straddle both profiles still classifies to
    // exactly one language (rank 1 of the overlap order) — no dup rows
    val mixed = docs.union(Seq((4L, "aaab xxxy aaab xxxy", "mm"))
      .toDF("doc_id", "text", "lang"))
    val out = TextOps.trigramLidDf(mixed).collect()
    assert(out.map(_.getLong(2)).sum === 5L)
    val mm = out.filter(_.getString(0) == "mm")
    assert(mm.length === 1)
  }

  test("t28: Good–Turing table matches an exact recompute on a " +
      "constructed corpus") {
    val docs = Seq(
      (0L, "a a a a b b c d", "en", "web", 8L),
      (1L, "a a b c c c e", "en", "web", 7L),
      (2L, "x y z x", "de", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.goodTuringDf(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // exact recompute: counts → count-of-counts → GT formulas
    val toks = Seq("en" -> "a a a a b b c d", "en" -> "a a b c c c e",
      "de" -> "x y z x")
      .flatMap { case (l, t) => t.split(" ").map(l -> _) }
    val freq = toks.groupBy(identity).toSeq.map { case ((l, _), o) =>
      (l, o.size.toLong) }
    val want = freq.groupBy(_._1).flatMap { case (lang, fs) =>
      val fof = fs.groupBy(_._2).map { case (r, g) => r -> g.size.toLong }
      val n = fs.map(_._2).sum
      val n1 = fof.getOrElse(1L, 0L)
      fof.filter(_._1 <= TextOps.gtMaxR).map { case (r, nr) =>
        val nr1 = fof.getOrElse(r + 1, 0L)
        (lang, r, nr, nr1, (r + 1) * nr1 * 1000000L / nr,
          n1 * 1000000L / n)
      }
    }.toSet
    assert(out.toSet === want)
    assert(out.nonEmpty)
    // GT sanity: total adjusted mass of seen types never exceeds raw
    for ((lang, r, nr, _, rstarPpm, p0) <- out) {
      assert(rstarPpm >= 0 && p0 >= 0 && p0 <= 1000000L)
      assert(nr >= 1)
    }
  }

  test("t27: spectrum buckets partition the frequency range; mass and " +
      "ppm add up") {
    val docs = Seq(
      (0L, "a a a a b b c d", "en", "web", 8L),
      (1L, "a a b c c c e", "en", "web", 7L),
      (2L, "x y z x", "de", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.zipfSpectrumDf(docs)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    // recompute the spectrum naively
    val toks = Seq("en" -> "a a a a b b c d", "en" -> "a a b c c c e",
      "de" -> "x y z x")
      .flatMap { case (l, t) => t.split(" ").map(l -> _) }
    val freq = toks.groupBy(identity).toSeq
      .map { case ((l, tk), o) => (l, tk, o.size) }.groupBy(_._1)
    for ((lang, bucket, nTypes, nOcc, minC, maxC, ppm) <- out) {
      assert(minC >= (1L << bucket) && maxC < (1L << (bucket + 1)),
        s"$lang bucket $bucket range [$minC,$maxC]")
      assert(nOcc >= nTypes * minC && nOcc <= nTypes * maxC)
      val langTotal = toks.count(_._1 == lang).toLong
      assert(ppm === nOcc * 1000000L / langTotal)
    }
    // per-language: types and mass cover the vocabulary exactly
    for ((lang, cnts) <- freq) {
      val rows = out.filter(_._1 == lang)
      assert(rows.map(_._3).sum === cnts.size.toLong, s"$lang type count")
      assert(rows.map(_._4).sum === cnts.map(_._3).sum.toLong,
        s"$lang token mass")
    }
  }

  test("tfidf ranks rare terms above ubiquitous ones") {
    // "common" appears in every doc (idf = ln(1) = 0); each doc's
    // unique term carries all the weight
    val docs = Seq(
      (0L, "common zebra common common"),
      (1L, "common yak common"),
      (2L, "common xerus"))
      .toDF("doc_id", "text")
    val got = TextOps.tfidfDf(docs)
      .as[(Long, String, Long, Long, Double, Long)].collect()
    val top = got.filter(_._6 == 1L).map(r => r._1 -> r._2).toMap
    assert(top === Map(0L -> "zebra", 1L -> "yak", 2L -> "xerus"))
    // ubiquitous term scores exactly 0 (ln 1) and never outranks
    got.filter(_._2 == "common").foreach { r =>
      assert(r._5 === 0.0)
      assert(r._6 > 1L)
    }
    // tf and df columns are exact
    val zebra = got.find(_._2 == "zebra").get
    assert(zebra._3 === 1L && zebra._4 === 1L)
  }

  test("t14: planted PII is counted and fully redacted") {
    import org.apache.spark.sql.functions._
    val out = TextOps.piiRedact(spark, sf)
    // every doc gets one planted email + one phone; doc_id%3==0 adds an IP
    val bad = out.filter(col("n_email") =!= 1 || col("n_phone") =!= 1 ||
      col("n_ip") =!= when(col("doc_id") % 3 === 0, 1L).otherwise(0L))
    assert(bad.count() === 0L, "detector missed planted PII")
    // redaction is complete: re-scanning the redacted text finds nothing.
    // Rebuild redacted inline (the query only exports its md5 — by design)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val redacted = TextOps.piiRedactDf(docs) // md5s only
    val enriched = docs.withColumn("enriched", concat(
      col("text"), lit(" contact user"), col("doc_id"),
      lit("@example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" ip 10.0."), (col("doc_id") % 256).cast("string"),
          lit(".77"))).otherwise(lit(""))))
      .withColumn("red",
        regexp_replace(regexp_replace(regexp_replace(col("enriched"),
          TextOps.emailPat, "<EMAIL>"), TextOps.phonePat, "<PHONE>"),
          TextOps.ipPat, "<IP>"))
    val leftovers = enriched.filter(
      regexp_count(col("red"), lit(TextOps.emailPat)) > 0 ||
      regexp_count(col("red"), lit(TextOps.phonePat)) > 0 ||
      regexp_count(col("red"), lit(TextOps.ipPat)) > 0).count()
    assert(leftovers === 0L, "redacted text still matches a PII pattern")
    // and the exported md5s match the inline rebuild
    val m1 = redacted.select("doc_id", "red_md5").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    enriched.select(col("doc_id"), md5(col("red"))).collect().foreach { r =>
      assert(m1(r.getLong(0)) === r.getString(1))
    }
  }

  test("t15: unigram familiarity is exact on a constructed corpus") {
    import spark.implicits._
    // corpus: "a a a b" + "c" → freqs a=3, b=1, c=1, total=5
    val docs = Seq((0L, "a a a b"), (1L, "c"))
      .toDF("doc_id", "text")
    val rows = TextOps.unigramScoreDf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc0: freq_sum = 3+3+3+1 = 10, n=4, total=5 → 10e6/20 = 500000
    assert(rows(0L) === ((4L, 1L, 500000L)))
    // doc1: freq_sum = 1, n=1, total=5 → 1e6/5 = 200000
    assert(rows(1L) === ((1L, 1L, 200000L)))
  }

  test("t16: vocab profile is exact on a constructed two-source corpus") {
    import org.apache.spark.sql.functions.col
    // source A: "a a b" (3 tokens, vocab 2); source B: "x" (1 token)
    val docs = Seq((1L, "a a b", "A"), (2L, "x", "B"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.vocabProfileDf(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    // head_share = 1.0 when vocab ≤ zipfTopK (the whole head)
    assert(got("A") === ((1L, 3L, 2L, BigDecimal(2.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, 1.0)))
    assert(got("B") === ((1L, 1L, 1L, 1.0, 1.0)))
  }

  test("t17: chunks tile each doc — full coverage, declared overlap") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 3 full windows
      (2L, (1 to 95).map(i => s"v$i").mkString(" ")),  // short last chunk
      (3L, "a b c"))                                   // sub-window doc
      .toDF("doc_id", "text")
    val got = TextOps.chunkOverlapDf(docs)
      .select("doc_id", "chunk_idx", "start_tok", "n_tok")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3, r._4)).toSeq.sorted).toMap
    assert(got(1L) === Seq((0L, 1L, 40L), (1L, 31L, 40L), (2L, 61L, 40L)))
    assert(got(2L) === Seq((0L, 1L, 40L), (1L, 31L, 40L), (2L, 61L, 35L)))
    assert(got(3L) === Seq((0L, 1L, 3L)))
    // every chunk starts on the stride grid and the last one ends at n
    got.foreach { case (_, cs) =>
      cs.foreach { case (k, st, _) =>
        assert(st === k * TextOps.chunkStride + 1)
      }
      val (_, st, n) = cs.last
      assert(st + n - 1 === cs.map { case (_, s, l) => s + l - 1 }.max)
    }
    // content hash is the md5 of exactly the sliced tokens
    val h = TextOps.chunkOverlapDf(docs.filter($"doc_id" === 3L))
      .select("chunk_md5").as[String].head()
    assert(h === spark.sql("SELECT md5('a b c')").as[String].head())
  }

  test("t18: shingle postings are df-banded, doc-sorted, bounded") {
    // "x y z" spans docs 1,2,3 (df=3 — inside the [3,50] band);
    // "p q r" spans only 2,4 (df=2 — excluded); all others are hapax
    val docs = Seq(
      (1L, "x y z"), (2L, "x y z p q r"), (3L, "x y z"), (4L, "p q r"))
      .toDF("doc_id", "text")
    val got = TextOps.invertedIndexDf(docs)
      .as[(String, Long, Long, String)].collect()
    assert(got.map(_._1).toSeq === Seq("x y z"))
    val (_, df, occ, postings) = got.head
    assert(df === 3L && occ === 3L)
    assert(postings === "000000000001:1 000000000002:1 000000000003:1")
  }

  test("t20: shared verbatim windows are located exactly; topical " +
      "overlap is not flagged") {
    // eval doc 10 has 12 tokens; doc 1 quotes its tokens 3..10 (one
    // 8-token window); doc 2 shares vocabulary but no 8-token run
    val evalText = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val docs = Seq(
      (10L, evalText),
      (1L, "x y " + evalText.split(" ").slice(2, 10).mkString(" ") + " z"),
      (2L, "w1 w2 w3 q w5 w6 w7 q w9 w10 w11 q"))
      .toDF("doc_id", "text")
    val got = TextOps.spanContaminationDf(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // doc 1: its tokens 3..10 are eval tokens 3..10 — exactly one
    // matching window starting at corpus position 3, spanning 8 tokens
    assert(got === Seq((1L, 10L, 1L, 3L, 3L, 8L)))
    // and a doc quoting a LONGER run yields a window count equal to
    // run − W + 1 with the span covering the whole run
    val docs2 = Seq((10L, evalText), (1L, "a " + evalText))
      .toDF("doc_id", "text")
    val g2 = TextOps.spanContaminationDf(docs2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(g2 === Seq((1L, 10L, 5L, 2L, 6L, 12L)))
    // docs shorter than one window carry no W-token evidence: two
    // verbatim-equal 2-token docs must NOT pair (a truncated window
    // would fabricate span_tokens = 8 for a 2-token doc)
    val short = Seq((10L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    assert(TextOps.spanContaminationDf(short).count() === 0L)
  }

  test("t21: bigram conditional ppm is exact; sub-2-token docs excluded") {
    // c2: (a,b)=2 (a,c)=1 (b,a)=2; prefix totals: a=3, b=2
    // → P(b|a)=666666  P(c|a)=333333  P(a|b)=1000000
    val docs = Seq(
      (0L, "a b a c"), (1L, "a b"), (2L, "b a"), (3L, "z"))
      .toDF("doc_id", "text")
    val got = TextOps.bigramLmDf(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 3L, 333333L, 666666L),   // (666666+1000000+333333) div 3
      (1L, 1L, 666666L, 666666L),
      (2L, 1L, 1000000L, 1000000L)))
  }

  test("t19: drift ranks the snapshot-exclusive token first, exact ppm") {
    // old snapshot (even doc_ids): a×4 b×2; new (odd): a×1 b×1 c×4
    val docs = Seq(
      (0L, "a a a b"), (2L, "a b"),
      (1L, "a b c c"), (3L, "c c"))
      .toDF("doc_id", "text")
    val got = TextOps.snapshotDriftDf(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.head._1 === "c") // 0 → 666666 ppm: the top mover
    val m = got.map(r => r._1 -> r).toMap
    assert(m("c") === (("c", 0L, 4L, 0L, 666666L, 666666L)))
    assert(m("a") === (("a", 4L, 1L, 666666L, 166666L, 500000L)))
    assert(m("b") === (("b", 2L, 1L, 333333L, 166666L, 166667L)))
  }

  test("t22: gopher signals match an in-memory recompute; keep iff ok") {
    val docs = graft.Tables.t(spark, sf, "documents")
    val out = TextOps.gopherRulesDf(docs).collect()
    val raw = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.split(" ").length >= 2)
    assert(out.length === raw.length)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    raw.foreach { case (id, text) =>
      val toks = text.split(" ")
      val n = toks.length.toLong
      val topc = toks.groupBy(identity).values.map(_.size).max.toLong
      val topb = toks.sliding(2).map(_.mkString(" ")).toSeq
        .groupBy(identity).values.map(_.size).max.toLong
      val sumlen = toks.map(_.length.toLong).sum
      val nshort = toks.count(_.length <= 2).toLong
      val r = byId(id)
      assert(r.getLong(1) === n, s"doc $id n_tokens")
      assert(r.getLong(2) === topc * 1000000L / n, s"doc $id top_tok")
      assert(r.getLong(3) === topb * 1000000L / (n - 1), s"doc $id top_bigram")
      assert(r.getLong(4) === sumlen * 100L / n, s"doc $id mean_len")
      assert(r.getLong(5) === nshort * 1000000L / n, s"doc $id short")
    }
    out.foreach { r =>
      assert((r.getLong(7) == 1L) === (r.getString(6) == "ok"))
    }
    // the rule set discriminates on real data: keeps AND drops exist
    assert(out.exists(_.getLong(7) == 1L) && out.exists(_.getLong(7) == 0L))
  }

  test("t23: learned merges match an in-memory greedy BPE trainer") {
    val docs = Seq(
      (0L, "low lower lowest low low"),
      (1L, "new newer newest new"),
      (2L, "wide wider widest lower new"))
      .toDF("doc_id", "text")
    val got = TextOps.bpeLearnDf(docs)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val (expect, wf) = BpeReference.train(
      docs.collect().map(_.getString(1)).toSeq, TextOps.bpeLearnRounds)
    assert(got === expect)
    // the iteration composes: some merge reuses an earlier round's token
    val learned = got.map(_._4).toSet
    assert(got.exists(m => learned.contains(m._2) && m._2.length > 1)
      || got.exists(m => learned.contains(m._3) && m._3.length > 1))

    // t24: applying the learned merges must yield the reference
    // trainer's final segmentation statistics
    val applied = TextOps.bpeApplyDf(docs)
      .as[(String, Long, Long)].collect().toSeq
    assert(applied === BpeReference.vocabHead(wf, TextOps.bpeVocabTopK))
  }

  test("t25: segment-level lang-ID flags a mixed doc a whole-doc ID " +
    "would mislabel") {
    // doc 0: 40 English tokens then 40 German — two segments, mixed;
    // doc 1: 80 pure German — two segments, unmixed
    val en = Seq.fill(8)("the cat sat of a").mkString(" ")
    val de = Seq.fill(8)("der hund ist und das").mkString(" ")
    val docs = Seq((0L, s"$en $de"), (1L, s"$de $de"))
      .toDF("doc_id", "text")
    val got = TextOps.codeSwitchDf(docs)
      .as[(Long, Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, 2L, 2L, "de", 500000L, 1L))
      || got(0L) === ((0L, 2L, 2L, "en", 500000L, 1L)))
    // tie at 1 segment each: dominance tie-break is lang ASC → "de"
    assert(got(0L)._4 === "de")
    assert(got(1L) === ((1L, 2L, 1L, "de", 1000000L, 0L)))
  }

  test("t26: the UDF score is exactly the formula over the emitted " +
    "integer counts; degenerate texts handled") {
    import org.apache.spark.sql.functions.col
    val rows = TextOps.readabilityReport(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, syl, sc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val want = 206.835 - 1.015 * n.toDouble -
        84.6 * (syl.toDouble / math.max(n.toDouble, 1.0))
      assert(sc === want, s"doc ${r.getLong(0)}")
    }
    // degenerate inputs through the UDF itself
    val out = Seq((0L, "the quick brown fox"), (1L, ""),
      (2L, null.asInstanceOf[String]), (3L, "   "))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextUdfs.readabilityCol(col("text")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) === 0.0)
    assert(out(2L) === 0.0)
    assert(out(3L) === 206.835) // whitespace-only: zero words
  }

  test("t23/t24: a fully-collapsed vocabulary survives merge-less rounds") {
    // one two-char word: round 1 merges (a,b); rounds 2..N have an
    // empty pair table and must leave the encoding intact — a cross
    // join against the empty winner would wipe the vocabulary (and
    // the oracle twin would wipe identically, invisible to the gate)
    val docs = Seq((0L, "ab ab ab"), (1L, "ab")).toDF("doc_id", "text")
    val merges = TextOps.bpeLearnDf(docs)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(merges === Seq((1L, "a", "b", "ab", 4L)))
    val vocab = TextOps.bpeApplyDf(docs)
      .as[(String, Long, Long)].collect().toSeq
    assert(vocab === Seq(("ab", 4L, 1L)))
  }

  test("t29: boilerplate shingles match an in-memory recompute on a " +
      "constructed corpus") {
    // src A: 4 of 5 docs share the planted template bigram "buy now"
    // (df·5 ≥ n_docs ⇔ df ≥ 1 at n=5... threshold is 20% so df ≥ 1);
    // build n=10 docs so the threshold bites at df ≥ 2
    val docs = ((0 until 10).map { i =>
      val planted = if (i < 4) "buy now " else ""
      (i.toLong, s"${planted}unique$i word$i tail$i", "en", "A", 0L)
    } ++ (0 until 10).map { i =>
      (100L + i, s"other$i text$i", "en", "B", 0L)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.boilerplateDf(docs)
      .as[(String, Long, String, Long, Long, Long)].collect()
    // recompute: per-source distinct bigrams per doc, df counts,
    // top-5 by (df desc, shingle), threshold df*5 >= n_docs as a flag
    val rows = docs.select("source", "text").as[(String, String)].collect()
    val nDocs = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val want = rows.groupBy(_._1).toSeq.flatMap { case (src, g) =>
      val dfs = g.flatMap { case (_, text) =>
        val toks = text.split(" ")
        val n = math.max(toks.length - 1, 1)
        (1 to n).map(i => toks.slice(i - 1, i + 1).mkString(" ")).distinct
      }.groupBy(identity).map { case (sh, xs) => (sh, xs.length.toLong) }
      dfs.toSeq
        .sortBy { case (sh, df) => (-df, sh) }.take(TextOps.bpTopN)
        .zipWithIndex.map { case ((sh, df), i) =>
          (src, (i + 1).toLong, sh, df, df * 1000000L / nDocs(src),
            if (df * 5 >= nDocs(src)) 1L else 0L) }
    }.toSet
    assert(out.toSet === want)
    // the planted template is the top offender for source A and is
    // the ONLY flagged boilerplate there (4 of 10 docs ≥ 20%)
    assert(out.exists { case (s0, rk, sh, df, _, flag) =>
      s0 == "A" && rk == 1L && sh == "buy now" && df == 4L && flag == 1L })
    assert(out.count { case (s0, _, _, _, _, flag) =>
      s0 == "A" && flag == 1L } == 1)
  }

  test("t30: winnowing matches an in-memory reference and honors the " +
      "coverage guarantee (shared 11-token run => shared fingerprint)") {
    def md5hex16(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.take(16)
    }
    val w = 8
    // returns (n_grams, selected (pos, hash) set)
    def winnow(text: String): (Long, Set[(Long, String)]) = {
      val tk = text.split(" ", -1)
      val n = math.max(tk.length - 3, 1)
      val hashes = (1 to n).map(i =>
        md5hex16(tk.slice(i - 1, math.min(i + 3, tk.length)).mkString(" ")))
      val starts = 1 to math.max(n - (w - 1), 1)
      val sel = starts.map { i =>
        val win = (i until math.min(i + w, n + 1)).map(p =>
          (hashes(p - 1), -(p.toLong)))
        val m0 = win.min
        (-m0._2, m0._1)
      }.toSet
      (n.toLong, sel)
    }
    val shared = "q w e r t y u i o p k" // 11 tokens = w + k - 1
    val docs = Seq(
      (0L, "alpha beta gamma " + shared + " delta epsilon zeta eta theta"),
      (1L, "one two three four five six " + shared + " seven eight nine"),
      (2L, "short doc"),
      (3L, "unrelated words entirely disjoint from the others here now"))
      .map { case (id, t0) => (id, t0, "en", "web", t0.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.winnowingDf(docs)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    val ref = Map(0L -> winnow(docs.as[(Long, String, String, String, Long)]
        .collect().find(_._1 == 0L).get._2),
      1L -> winnow("one two three four five six " + shared +
        " seven eight nine"),
      2L -> winnow("short doc"),
      3L -> winnow("unrelated words entirely disjoint from the others " +
        "here now"))
    for ((id, (n, sel)) <- ref) {
      val (_, ng, nfp, dens, fpMin) = out(id)
      assert(ng === n, s"doc $id gram count")
      assert(nfp === sel.map(_._1).size.toLong, s"doc $id fp count")
      assert(dens === nfp * 1000000L / ng)
      assert(fpMin === sel.map(_._2).min, s"doc $id min hash")
    }
    // the guarantee: docs 0 and 1 share an 11-token run, so their
    // selected HASH sets must intersect
    val h0 = ref(0L)._2.map(_._2)
    val h1 = ref(1L)._2.map(_._2)
    assert((h0 & h1).nonEmpty, "coverage guarantee violated")
    // and the engine's fingerprint counts came from the same selection
    assert(out(0L)._3 === ref(0L)._2.map(_._1).size.toLong)
  }

  test("t33: winnow sweep honors the gap guarantee at every w, density " +
      "falls with w, and the contract-w row reconciles with t30") {
    import graft.Tables.t
    val docs = t(spark, sf, "documents")
    val out = TextOps.winnowSweepDf(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) === TextOps.winnowSweepWs.map(_.toLong))
    out.foreach { case (w, ng, nfp, dens, maxGap) =>
      assert(maxGap <= w, s"w=$w: gap guarantee violated ($maxGap)")
      assert(dens === nfp * 1000000L / ng)
      assert(nfp >= 1L && ng >= nfp)
    }
    // volume strictly falls as the window widens; all rows share n_grams
    assert(out.map(_._3) === out.map(_._3).sortBy(-_))
    assert(out.map(_._2).distinct.size === 1)
    // the w = winnowW row is t30's corpus totals (same selection core)
    val t30 = TextOps.winnowingDf(docs)
      .selectExpr("sum(n_grams)", "sum(n_fp)")
      .as[(Long, Long)].collect().head
    val row = out.find(_._1 == TextOps.winnowW.toLong).get
    assert((row._2, row._3) === t30)
  }

  test("t31: heaps curve matches an in-memory recompute on the corpus " +
      "and its tails reconcile with totals") {
    import graft.Tables.t
    val docs = t(spark, sf, "documents")
      .selectExpr("CAST(doc_id AS BIGINT)", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nd = docs.map(_._1).max + 1
    val b = TextOps.heapsBuckets
    val toks = docs.flatMap { case (id, text) =>
      text.split(" ", -1).map(tok => (id * b / nd, tok))
    }
    val bt = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nt = toks.groupBy(_._2).values
      .map(_.map(_._1).min)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val buckets = bt.keys.toSeq.sorted
    var cumT = 0L; var cumV = 0L
    val want = buckets.map { bk =>
      cumT += bt(bk); cumV += nt.getOrElse(bk, 0L)
      (bk, bt(bk), nt.getOrElse(bk, 0L), cumT, cumV,
        cumV * 1000000L / cumT)
    }
    val out = TextOps.heapsCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === want)
    // final cumulative row reconciles with global totals
    assert(out.last._4 === toks.length.toLong)
    assert(out.last._5 === toks.map(_._2).distinct.length.toLong)
    // cumulative columns are monotone non-decreasing
    assert(out.sliding(2).forall {
      case Array(a, c) => c._4 >= a._4 && c._5 >= a._5
      case _ => true
    })
  }
}
