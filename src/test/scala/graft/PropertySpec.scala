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
}
