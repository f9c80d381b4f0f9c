package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Degenerate-input hardening: every Df-parameterized operator must
  * handle an EMPTY corpus (first partition of a new table, a filter
  * that matched nothing) by returning zero rows — never throwing on
  * empty aggregates, empty joins, or empty iteration rounds. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val noDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noEmbs: DataFrame =
    Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")

  test("dedup suite yields zero rows on an empty corpus") {
    assert(Dedup.exactDf(noDocs).count() === 0)
    assert(Dedup.minHashLshDf(noDocs).count() === 0)
    assert(Dedup.ngramJaccardDf(noDocs).count() === 0)
    assert(Dedup.simHashDf(noDocs).count() === 0)
    assert(Dedup.simHashPairsDf(noDocs).count() === 0)
    assert(Dedup.dupClustersDf(noDocs).count() === 0)
    assert(Dedup.canonicalDocsDf(noDocs).count() === 0)
  }

  test("embedding ops yield zero rows on an empty corpus") {
    assert(Dedup.embeddingCosineDf(noEmbs).count() === 0)
    assert(Similarity.bruteForceTopKDf(noEmbs).count() === 0)
    assert(Similarity.lshTopKDf(noEmbs).count() === 0)
    assert(Similarity.ivfTopKDf(noEmbs).count() === 0)
    assert(Similarity.pqTopKDf(noEmbs).count() === 0)
    assert(Similarity.ivfPqTopKDf(noEmbs).count() === 0)
  }

  test("text ops yield zero rows on an empty corpus") {
    assert(TextOps.tfidfDf(noDocs).count() === 0)
    assert(TextOps.qualityGateDf(noDocs).count() === 0)
    assert(TextOps.chunkOverlapDf(noDocs).count() === 0)
    assert(TextOps.invertedIndexDf(noDocs).count() === 0)
    assert(TextOps.snapshotDriftDf(noDocs).count() === 0)
    assert(TextOps.heapsCurveDf(noDocs).count() === 0)
    assert(Similarity.embeddingQuantizeDf(noEmbs).count() === 0)
  }

  test("centroids / k-means / multi-signal yield zero rows on empty input") {
    assert(Similarity.centroidsDf(noEmbs).count() === 0)
    assert(Similarity.kmeansStepDf(noEmbs).count() === 0)
    assert(Dedup.multiSignalDf(noDocs, noEmbs).count() === 0)
  }

  test("pagerank yields zero rows on an empty edge source") {
    val noLi = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey")
    val noOrd = Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey")
    assert(Graph.pageRankDf(noLi, noOrd).count() === 0)
    assert(Graph.assortativityDf(noLi, noOrd).count() === 0)
  }

  test("sampling / decontamination / manifest yield zero rows on an empty corpus") {
    val noFull = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Sampling.hashSampleDf(noFull).count() === 0)
    assert(Sampling.stratifiedSampleDf(noFull).count() === 0)
    assert(Sampling.sourceCapReportDf(noFull).count() === 0)
    assert(Sampling.temperatureMixDf(noFull).count() === 0)
    assert(Sampling.trainingManifestDf(noFull).count() === 0)
    assert(Sampling.sequencePackDf(noFull).count() === 0)
    assert(Dedup.decontaminateDf(noFull).count() === 0)
    assert(TextOps.normalizeGainDf(noFull).count() === 0)
    assert(TextOps.oovRateDf(noFull).count() === 0)
  }

  test("triangle counting yields zero rows on an empty lineitem") {
    val noLi = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
    assert(Graph.trianglesDf(noLi).count() === 0)
  }

  test("round-3 ops yield zero rows on empty input") {
    val noFull = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val noLi = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
    assert(Graph.componentsDf(noLi).count() === 0)
    assert(Dedup.containmentDf(noFull).count() === 0)
    assert(Sampling.datasetSplitDf(noFull).count() === 0)
    assert(TextOps.piiRedactDf(noFull).count() === 0)
    assert(TextOps.unigramScoreDf(noFull).count() === 0)
    assert(graft.multimodal.MultimodalQueries.phashPairsDf(noFull).count() === 0)
  }

  test("round-5 ops yield zero rows on empty input") {
    val noFull = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val noLi = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey")
    val noOrd = Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey")
    val noEv = Seq.empty[(Long, Long, Long, String)]
      .toDF("event_id", "ts", "user_id", "event_type")
    val noCust = Seq.empty[(Long, Double)].toDF("c_custkey", "c_acctbal")
    assert(TextOps.gopherRulesDf(noFull).count() === 0)
    assert(Sampling.curriculumDf(noFull).count() === 0)
    assert(Graph.bfsHopsDf(noLi, noOrd).count() === 0)
    assert(Relational.q53CdcApplyDf(noEv, noCust).count() === 0)
    assert(Sampling.budgetCapsDf(noFull).count() === 0)
    val noEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.mmrDiversifyDf(noEmb).count() === 0)
  }

  test("round-6 ops yield zero rows on empty input") {
    val noFull = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val noOrders = Seq.empty[(Long, java.sql.Date, Double)]
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val noLi = Seq.empty[(Long, java.sql.Date, Double, String, String)]
      .toDF("l_partkey", "l_shipdate", "l_quantity",
        "l_returnflag", "l_linestatus")
    assert(TextOps.bpeLearnDf(noFull).count() === 0)
    assert(TextOps.bpeApplyDf(noFull).count() === 0)
    assert(Relational.q55MvMergeDf(noOrders).count() === 0)
    assert(Relational.q56CompactionPlanDf(noLi).count() === 0)
    assert(Pipeline.corpusRefreshDf(noFull).count() === 0)
    // a10: empty fact → no leaf sketches, so every level joins empty
    assert(Sketches.sketchRollupDf(noLi).count() === 0)
  }

  test("round-7 ops yield zero rows on empty input") {
    val noFull = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val noLi = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey")
    val noOrd = Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey")
    assert(TextOps.goodTuringDf(noFull).count() === 0)
    assert(Sampling.varAllocationDf(noFull).count() === 0)
    assert(Graph.ssspDf(noLi, noOrd).count() === 0)
  }
}
