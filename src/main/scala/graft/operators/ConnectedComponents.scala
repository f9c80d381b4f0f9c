package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round connected components by min-label propagation — the
  * reusable clustering primitive under duplicate-cluster resolution
  * (`Dedup.dupClustersDf` / d07) and any other "group the candidate
  * pairs" step.
  *
  * Semantics: after `rounds` iterations every node's label is the
  * minimum node id within `rounds` hops — components whose diameter is
  * ≤ `rounds` are exactly resolved (near-dup clusters are dense, so
  * tiny diameters; 4 rounds covers them with slack). Bounded rounds
  * keep the DAG static — an engine-portable second run (or a SQL twin
  * unrolling the same rounds as CTEs) reproduces labels bit-for-bit.
  *
  * Scale shape: the undirected ids-only edge list is persisted once and
  * pre-partitioned on the join key (each round probes it against a
  * CHANGING labels relation, so ReusedExchange can't dedupe across
  * rounds — this is the persist-pays-off case); each round is one hash
  * join + one partial-agged min-aggregate, labels staying partitioned
  * on id between rounds. Messages are (id, label) longs — KBs per
  * million edges, never payloads.
  */
object ConnectedComponents {

  /** Conf key selecting how per-round lineage truncation is done:
    * `local` (default) uses `localCheckpoint` — executor-memory
    * resident, zero I/O, right for a single-JVM or loss-tolerant run;
    * `reliable` uses `checkpoint()` against the directory set via
    * `SparkContext.setCheckpointDir` — on a real cluster an executor
    * loss then costs re-reading one round's (id, label) pairs from the
    * checkpoint store instead of recomputing every prior round (local
    * checkpoint blocks die with their executor). The round structure
    * is identical in both modes; only the storage of the truncated
    * lineage differs. */
  val checkpointModeKey = "graft.cc.checkpoint"

  /** Per-round lineage truncation honoring [[checkpointModeKey]] —
    * shared by every bounded-round propagation (also g07's LPA). */
  private[graft] def truncate(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(checkpointModeKey, "local") match {
      case "reliable" => df.checkpoint()
      case _          => df.localCheckpoint()
    }

  /** [[truncate]] that also reports which persistent-RDD ids the
    * eager checkpoint registered, so the caller can FREE a superseded
    * round's blocks as soon as the next round has materialized.
    * localCheckpoint blocks are not catalog-cached — `clearCache()`
    * never drops them — so without this every bounded-round operator
    * leaks one (id, label) snapshot per round into the block manager
    * for the life of the session (the r6 bench showed exactly that:
    * g03/d07 slowing 2-6× late in a 198-query run as orphaned blocks
    * accumulated and GC raced eviction).
    *
    * The before/after diff is CONTEXT-GLOBAL: any cache that first
    * materializes inside the checkpoint window — a concurrent query's,
    * or this operator's own lazily-persisted edge list — would be
    * attributed to the round's snapshot and freed one round later.
    * Callers therefore (a) force-materialize every relation they
    * persist BEFORE the first tracked checkpoint (see
    * [[materialize]]), and (b) must not run two tracked propagations
    * concurrently in one SparkContext (the sequential Bench/Verify
    * drivers satisfy this; a concurrent serving deployment would
    * scope freeing per-operator instead). */
  private[graft] def truncateTracked(df: DataFrame): (DataFrame, Seq[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = truncate(df)
    val fresh = sc.getPersistentRDDs.keysIterator.filterNot(before).toSeq
    (out, fresh)
  }

  /** Unpersist the given persistent-RDD ids (a superseded round's
    * snapshot blocks) — shared with every bounded-round peel that uses
    * [[truncateTracked]] (g03/d07's label rounds, g18's truss peel). */
  private[graft] def free(sc: org.apache.spark.SparkContext, ids: Seq[Int]): Unit =
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))

  /** @param nodes single-column `id` relation seeding the labels
    * @param edges two-column `src`/`dst` relation (either orientation;
    *              both directions are materialized internally)
    * @param persistEdges edge-list materialization strategy: `false`
    *              (default) takes the r12 eager checkpoint — the win
    *              for the ROUND-BASED callers (d07/d08/d19/m06), whose
    *              many scans amortize the serialization; `true` takes
    *              a count-materialized columnar persist — the r13 A/B
    *              win for SINGLE-ACTION pipeline callers (e06), where
    *              the checkpoint's serialize-everything build cost
    *              exceeds what 4 round scans save. The count is NOT
    *              optional under `true`: a lazy persist would first
    *              materialize inside round 1's tracked window and be
    *              freed behind our back after round 2 (the ADVICE-r7
    *              trap), recomputing the edge derivation every later
    *              round.
    * @return (id, label) — label = min id within `rounds` hops */
  def minLabel(nodes: DataFrame, edges: DataFrame, rounds: Int,
      persistEdges: Boolean = false): DataFrame = {
    val sc = nodes.sparkSession.sparkContext
    // eager checkpoint instead of a columnar persist (r12): the edge
    // list is re-scanned every round, and GraphRoundProbe measured the
    // default columnar cache at ~4-6 s executor-CPU PER SCAN of a
    // 1.17 M-row ids-only relation at sf0.1 vs ~1 s for a checkpoint's
    // serialized UnsafeRows (build also ~2x cheaper). UNTRACKED on
    // purpose: a caller's lazily-persisted upstream (e06's `kept`)
    // materializes INSIDE this eager build — under truncateTracked its
    // cache id would land in the diff and be freed behind the caller's
    // back (the ADVICE-r7 trap, caller-side). The build happening
    // FIRST also keeps those caller caches out of the round windows
    // below, exactly as the old materialize(und) ordering did; the
    // edge-list blocks themselves are swept by the harness between
    // contract runs (the repo's caller-owned-cache contract).
    val undRel =
      edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("dst"))
    val und =
      if (persistEdges) { val p = undRel.persist(); p.count(); p }
      else truncate(undRel)
    // eager lineage truncation per round (see minLabelJumping): labels
    // is referenced twice per round, so an un-truncated analyzed plan
    // doubles per round — 2^rounds copies of the seed subtree for the
    // driver to re-plan even when every block is cached
    var (labels, blocks) =
      truncateTracked(nodes.select(col("id"), col("id").as("label")))
    for (_ <- 1 to rounds) {
      val msgs = und.join(labels, und("dst") === labels("id"))
        .select(col("src").as("id"), col("label"))
      val (next, nb) =
        truncateTracked(msgs.union(labels.select(col("id"), col("label")))
          .groupBy(col("id")).agg(min(col("label")).as("label")))
      free(sc, blocks) // round r-1's snapshot, fully consumed by `next`
      labels = next; blocks = nb
    }
    labels
  }

  /** [[minLabel]] with POINTER JUMPING: each round propagates along
    * edges (radius +1) and then shortcuts every label to its label's
    * label (radius ×2) — the PRAM-CC / Hash-to-Min trick that makes
    * covered radius grow exponentially in rounds (4 rounds ≳ radius
    * 20) instead of linearly. This is the variant for graphs whose
    * component diameter grows with the data (co-occurrence graphs,
    * social graphs); [[minLabel]] remains the cheaper choice when
    * components are known-tight (near-dup clusters).
    *
    * The shortcut join is total by construction — every label value IS
    * a node id present in the labels relation — and adds one (id,
    * label)-only hash join per round: 2 joins + 1 min-agg per round,
    * still never a payload shuffle.
    *
    * Each round TRUNCATES LINEAGE with an eager checkpoint of the
    * (id, label)-only propagated relation ([[truncate]] — mode picked
    * by [[checkpointModeKey]]: executor-memory `localCheckpoint` by
    * default, reliable `checkpoint()` for clusters with executor-loss
    * risk). Caching alone is not enough here: the shortcut references
    * `prop` twice, so the ANALYZED plan doubles per round — 4 rounds
    * produced a 2-million-line tree whose driver-side planning alone
    * cost ~60 s at sf0.1 even with every block cached; checkpointing
    * keeps the plan constant-depth (measured 60 s → ~1 s). */
  def minLabelJumping(nodes: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    val sc = nodes.sparkSession.sparkContext
    // eager UNTRACKED checkpoint, not a columnar persist — see
    // minLabel (r12) for both the scan-cost measurement and the
    // caller-cache ordering rationale
    val und = truncate(
      edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("dst")))
    var (labels0, blocks) =
      truncateTracked(nodes.select(col("id"), col("id").as("label")))
    var labels = labels0
    for (_ <- 1 to rounds) {
      val msgs = und.join(labels, und("dst") === labels("id"))
        .select(col("src").as("id"), col("label"))
      val (prop, nb) =
        truncateTracked(msgs.union(labels.select(col("id"), col("label")))
          .groupBy(col("id")).agg(min(col("label")).as("label")))
      // materializing prop executed the previous round's lazy shortcut
      // join — its checkpoint snapshot is now fully consumed
      free(sc, blocks); blocks = nb
      val ptr = prop.select(col("id").as("lid"), col("label").as("llabel"))
      labels = prop.join(ptr, prop("label") === ptr("lid"))
        .select(prop("id"), col("llabel").as("label"))
    }
    // the final labels is the lazy shortcut join over the LAST round's
    // prop (still persisted for the caller's action)
    labels
  }
}
