package graft.queries

import graft.SparkSpec
import scala.util.Random

class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** Clusters seeded so that vec_ids 0..7 (the IVF seeds) span the 4
    * directions — cluster c's seed lives in cells {c, c+4}. */
  private lazy val clustered = {
    val rnd = new Random(11)
    def unit(dim: Int): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val dim = 16
    val centers = Array.fill(4)(unit(dim))
    val rows = for (c <- 0 until 4; i <- 0 until 50) yield {
      val noise = unit(dim).map(_ * 0.15)
      val v = centers(c).zip(noise).map { case (a, b) => (a + b).toFloat }
      ((c * 50 + i).toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("IVF top-k recall vs brute force is high on clustered data") {
    val exact = Similarity.bruteForceTopKDf(clustered)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopKDf(clustered)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
  }

  test("kmeans step is partition-invariant (integer assignment, like PQ)") {
    val a = Similarity.kmeansStepDf(clustered).collect().toSeq
    val b = Similarity.kmeansStepDf(clustered.repartition(7)).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // one (cell, pos) mean per assigned cell and dimension; members sum
    // to the corpus size within every pos slice
    val byPos = a.groupBy(_.getLong(1))
    byPos.values.foreach(g => assert(g.map(_.getLong(3)).sum === 200L))
  }

  test("IVF emits at most k ranked neighbors per query") {
    val rows = Similarity.ivfTopKDf(clustered)
      .as[(Long, Long, Double, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length <= Similarity.topK)
      assert(g.map(_._4).sorted.toSeq === (1L to g.length).toSeq)
    }
  }

  test("index lifecycle: build → save → load → probe equals inline s03") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf")
    try {
      val idx = VectorIndex.build(clustered)
      VectorIndex.save(idx, dir.toString)
      val loaded = VectorIndex.load(spark, dir.toString)
      // the saved quantizer has exactly nCells centroids, and every
      // corpus vector is filed in exactly one cell
      assert(loaded.centroids.count() === Similarity.numCells.toLong)
      assert(loaded.postings.count() === 200L)
      assert(loaded.postings.select("vec_id").distinct().count() === 200L)
      // probing the persisted index with the contract query set must
      // reproduce the single-plan s03 result exactly — the round-trip
      // through parquet (incl. the partitionBy cell layout) loses
      // nothing
      val got = VectorIndex
        .probe(loaded, clustered.filter(Similarity.isQuery))
        .as[(Long, Long, Double, Long)].collect().toSeq
      val inline = Similarity.ivfTopKDf(clustered)
        .as[(Long, Long, Double, Long)].collect().toSeq
      assert(got === inline)
      assert(got.nonEmpty)
      // probe-side pruning is physical: the postings scan carries the
      // cell join as a partition filter (directory layout), so a probe
      // reads nProbes/nCells of the corpus by LAYOUT
      val probePlan = VectorIndex
        .probe(loaded, clustered.filter(Similarity.isQuery))
        .queryExecution.executedPlan.toString
      assert(probePlan.contains("PartitionFilters") ||
        probePlan.contains("dynamicpruning"), probePlan)
      // steady-state append: new vectors file under the SAVED
      // quantizer without touching existing postings, and a reload
      // equals a full rebuild over the union corpus (same centroids —
      // append must not shift cells)
      import org.apache.spark.sql.functions.col
      val extra = clustered
        .select((col("vec_id") + 1000L).as("vec_id"),
          col("embedding"), col("label"))
        .limit(20)
      VectorIndex.append(loaded, extra, dir.toString)
      val appended = VectorIndex.load(spark, dir.toString)
      assert(appended.postings.count() === 220L)
      val rebuilt = Similarity.assignCells(loaded.centroids,
        Similarity.emb(clustered.unionByName(extra)), 1, "cell")
      val a = appended.postings.select("vec_id", "cell")
        .as[(Long, Long)].collect().toMap
      val b = rebuilt.select("vec_id", "cell")
        .as[(Long, Long)].collect().toMap
      assert(a === b)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
