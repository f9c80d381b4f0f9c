package graft.operators

import graft.SparkSpec

/** The reusable min-label propagation: exact components within the
  * round bound, deterministic under re-partitioning. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nodes = (0L to 7L).toDF("id")
  // components: {0,1,2} (triangle), {3,4} (edge), {5} {6} {7} isolated
  private lazy val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (4L, 3L))
    .toDF("src", "dst")

  test("labels components by min id within the round bound") {
    val got = ConnectedComponents.minLabel(nodes, edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 6L, 7L -> 7L))
    spark.catalog.clearCache()
  }

  test("bit-exact under input re-partitioning") {
    val a = ConnectedComponents.minLabel(nodes, edges, 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val b = ConnectedComponents.minLabel(
        nodes.repartition(5), edges.repartition(3), 3)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a === b)
    spark.catalog.clearCache()
  }

  test("reliable checkpoint mode produces identical labels (g03's operator)") {
    // graft.cc.checkpoint=reliable swaps the per-round localCheckpoint
    // for a setCheckpointDir-backed checkpoint() — same rounds, same
    // labels, lineage durable against executor loss
    val local = ConnectedComponents.minLabelJumping(nodes, edges, 4)
      .as[(Long, Long)].collect().sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(ConnectedComponents.checkpointModeKey, "reliable")
    try {
      val reliable = ConnectedComponents.minLabelJumping(nodes, edges, 4)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(reliable === local)
    } finally {
      spark.conf.unset(ConnectedComponents.checkpointModeKey)
      spark.catalog.clearCache()
    }
  }

  test("a path longer than the round bound resolves only within hops") {
    // path 0-1-2-3-4-5: with 2 rounds, node 5 sees min id within 2 hops (3)
    val path = (0L to 4L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = ConnectedComponents.minLabel((0L to 5L).toDF("id"), path, 2)
      .as[(Long, Long)].collect().toMap
    assert(got(5L) === 3L)
    assert(got(2L) === 0L)
    spark.catalog.clearCache()
  }
}
