package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions.{dot, fpSqDist, hamming, norm2}
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
    (2L, Array(0.5, -0.25, 2.0), Array(-0.5, 0.75, 1.0)),
    (3L, Array(1e-7, 0.0, -1e-7), Array(0.0, 0.0, 0.0))
  ).toDF("id", "a", "b")

  test("dot and norm2 match the sequential fold") {
    val rows = vecs.select(col("id"), dot(col("a"), col("b")).as("d"),
      norm2(col("a")).as("n")).orderBy("id").collect()
    assert(rows(0).getDouble(1) === 14.0)
    assert(rows(0).getDouble(2) === 14.0)
    assert(rows(1).getDouble(1) === (0.5 * -0.5 + -0.25 * 0.75 + 2.0 * 1.0))
  }

  test("fpSqDist is the exact BIGINT sum of floor((a-b)^2 * 2^20)") {
    def expect(a: Array[Double], b: Array[Double]): Long =
      a.zip(b).map { case (x, y) =>
        val d = x - y; math.floor(d * d * 1048576.0).toLong
      }.sum
    val rows = vecs.select(col("id"), fpSqDist(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).getLong(1) === 0L)
    assert(rows(1).getLong(1) ===
      expect(Array(0.5, -0.25, 2.0), Array(-0.5, 0.75, 1.0)))
    // sub-2^-20 squared differences floor to 0 — below output precision
    assert(rows(2).getLong(1) === 0L)
  }

  test("fpSqDist iterates min(len) and is symmetric") {
    val df = Seq((Array(1.0, 2.0, 9.0), Array(1.0, 1.0)))
      .toDF("a", "b")
    val d1 = df.select(fpSqDist(col("a"), col("b"))).head().getLong(0)
    val d2 = df.select(fpSqDist(col("b"), col("a"))).head().getLong(0)
    assert(d1 === 1048576L) // only (2-1)^2 contributes
    assert(d1 === d2)
  }

  test("hamming counts differing chars plus length delta") {
    val df = Seq(("10110", "10011"), ("111", "11100")).toDF("x", "y")
    val got = df.select(hamming(col("x"), col("y"))).as[Long].collect().toSeq
    assert(got === Seq(2L, 2L))
  }

  test("nearestCell picks the fixed-point argmin with first-index " +
      "tie-break and equals the min(struct) form") {
    import graft.functions.VectorFunctions.nearestCell
    // cells: index 1 is nearest to a=(1,0); indexes 0 and 2 tie for
    // b=(0,0) -> first index (0) wins, matching (d, cell) struct-min
    // over an id-ordered array
    val df = Seq(
      (Array(1.0, 0.0), Seq(Array(0.0, 0.0), Array(1.0, 0.1), Array(5.0, 5.0))),
      (Array(0.0, 0.0), Seq(Array(2.0, 0.0), Array(9.0, 9.0), Array(2.0, 0.0))))
      .toDF("v", "cells")
    val got = df.select(nearestCell(col("v"), col("cells"))).as[Int].collect()
    assert(got.toSeq === Seq(1, 0))
    // empty centroid array -> null (unreachable for non-empty corpora)
    val empty = Seq((Array(1.0), Seq.empty[Array[Double]])).toDF("v", "cells")
    assert(empty.select(nearestCell(col("v"), col("cells")))
      .collect().head.isNullAt(0))
    // interpreted eval agrees with codegen (same rows via a filter that
    // blocks whole-stage codegen's constant fold: collect both paths)
    val viaEval = df.selectExpr("graft_nearest_cell(v, cells) AS i")
      .as[Int].collect()
    assert(viaEval.toSeq === Seq(1, 0))
  }

  test("bloomMightContain matches direct filter probes (codegen and " +
      "interpreted) — no false negatives, same keep/drop set") {
    import graft.functions.{BloomMightContain, VectorFunctions}
    val keys = (0L until 2000L).map(_ * 2654435761L)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(2000, 0.02)
    keys.foreach(bf.putLong)
    val bc = spark.sparkContext.broadcast(bf)
    val probes = (0L until 4000L).map(i => i * 2654435761L + (i % 2))
    val df = probes.toDF("k")
    // codegen path (whole-stage filter)
    val got = df.filter(VectorFunctions.bloomMightContain(col("k"), bc))
      .as[Long].collect().toSet
    val expect = probes.filter(bf.mightContainLong).toSet
    assert(got === expect)
    // every inserted key survives (no false negatives by construction)
    assert(keys.toSet.intersect(probes.toSet).subsetOf(got))
    // interpreted eval agrees with the codegen path
    val e = BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(42L), bc)
    assert(e.eval(null) === bf.mightContainLong(42L))
  }
}
