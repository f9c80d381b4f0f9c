package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index lifecycle — build ONCE, probe many times.
  *
  * The contract query `s03` trains and probes in a single plan (the
  * right shape for an oracle), but a production corpus is indexed once
  * and probed by every downstream consumer. This is that split:
  *
  *  - [[build]]: train the coarse quantizer (one Lloyd refinement, the
  *    s05 step) and file every corpus vector under its nearest
  *    centroid — integer fixed-point assignment, so the index is
  *    bit-reproducible on any engine/partitioning.
  *  - [[save]]/[[load]]: the index is two parquet tables. `postings`
  *    is written `partitionBy("cell")`, so cell membership is encoded
  *    in the DIRECTORY layout — a probe that touches `nProbes` of
  *    `nCells` cells physically reads only that fraction of the
  *    corpus (partition pruning, not a filter after a full scan).
  *  - [[probe]]: assign queries to their `nProbes` nearest cells
  *    against the broadcast centroid table and rank candidates inside
  *    probed cells only — identical math to `s03`, verified equal in
  *    IvfSpec.
  *
  * 100 TB posture: the analogue of d11's persisted band index for the
  * embedding modality — the expensive global pass (training +
  * assignment) amortizes across probe workloads, the probe-side scan
  * is `nProbes/nCells` of the corpus by LAYOUT, and the only
  * broadcast is the centroid table (nCells rows). Steady-state
  * ingestion appends new vectors by assigning against the saved
  * centroids (one map-side pass) and re-trains only on drift (t19 is
  * the monitor for that).
  */
object VectorIndex {

  /** A built inverted file: `centroids` = `(cell, sv: array<double>)`
    * (the trained coarse quantizer, nCells rows); `postings` =
    * `(vec_id, v, nrm, cell)` — every corpus vector filed under its
    * nearest trained centroid. */
  final case class IvfIndex(centroids: DataFrame, postings: DataFrame)

  /** Train the quantizer and assign the corpus (the expensive pass). */
  def build(embs: DataFrame,
      nCells: Int = Similarity.numCells): IvfIndex = {
    val e = Similarity.emb(embs)
    val seeds = Similarity.trainedSeeds(e, nCells)
    IvfIndex(seeds, Similarity.assignCells(seeds, e, 1, "cell"))
  }

  /** Persist both tables; postings are LAID OUT by cell so probes
    * prune directories, never scan-and-filter. */
  def save(idx: IvfIndex, dir: String): Unit = {
    idx.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    idx.postings.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/postings")
  }

  def load(s: SparkSession, dir: String): IvfIndex =
    IvfIndex(
      s.read.parquet(s"$dir/centroids"),
      s.read.parquet(s"$dir/postings"))

  /** Steady-state ingestion: file a batch of NEW vectors under the
    * SAVED quantizer — one map-side assignment pass against the
    * broadcast centroid table, appended to the postings layout (same
    * `partitionBy(cell)` directories; parquet append touches only the
    * cells the batch lands in). No retraining, no touch of existing
    * postings — the O(batch) daily-crawl shape (d11's incremental-index
    * twin for the embedding modality). Retrain (rebuild) when the t19
    * drift monitor says the corpus moved. */
  def append(idx: IvfIndex, newEmbs: DataFrame, dir: String): Unit =
    Similarity.assignCells(idx.centroids, Similarity.emb(newEmbs), 1, "cell")
      .write.mode("append").partitionBy("cell").parquet(s"$dir/postings")

  /** Top-k cosine neighbors for `queries` (raw `(vec_id, embedding)`
    * rows) against the index: route each query to its `nProbes`
    * nearest cells (broadcast centroids, integer fixed-point argmin —
    * the s03/s05 assignment), then score only inside probed cells.
    * Queries sharing ids with indexed vectors never match themselves. */
  def probe(idx: IvfIndex, queries: DataFrame,
      nProbes: Int = Similarity.numProbes,
      k: Int = Similarity.topK): DataFrame = {
    val qs = Similarity.assignCells(
      idx.centroids, Similarity.emb(queries), nProbes, "cell")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    qs.as("q")
      .join(idx.postings.as("c"), col("q.cell") === col("c.cell") &&
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        Similarity.cosCol.as("cos_sim"))
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
