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

  test("the persisted edge list survives every round's snapshot freeing " +
      "(ADVICE-r7: lazy persist attributed to round 1 and freed at round 2)") {
    // Assert the mechanism directly: a lazily-persisted relation whose
    // first materialization happens inside a truncateTracked window IS
    // captured by the diff (the failure mode), while one
    // force-materialized before the window is NOT. minLabel/
    // minLabelJumping materialize their edge list first, so their
    // edge caches never enter a round's freed set.
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(true))
    // failure mode: a lazy persist first materialized INSIDE the diff
    // window is captured alongside the checkpoint's own blocks
    val lazyDf = edges.select($"src", $"dst").repartition($"dst").persist()
    val (_, freshLazy) = ConnectedComponents.truncateTracked(
      lazyDf.select($"src".as("id"), $"src".as("label")))
    assert(freshLazy.size >= 2,
      s"expected the window to capture the lazy cache too: $freshLazy")
    lazyDf.unpersist(true)
    // the fix: force-materialized persist registers BEFORE the window,
    // so the window reports only the checkpoint's own blocks
    val eagerDf = edges.select($"src", $"dst").repartition($"dst").persist()
    eagerDf.count()
    val (_, freshEager) = ConnectedComponents.truncateTracked(
      eagerDf.select($"src".as("id"), $"src".as("label")))
    assert(freshEager.size === 1,
      s"pre-materialized run must track only the checkpoint: $freshEager")
    eagerDf.unpersist(true)
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(true))
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
