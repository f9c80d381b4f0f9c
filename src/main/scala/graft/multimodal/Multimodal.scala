package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (LLM-pipeline extension op).
  *
  * Images/audio/video are opaque `binary` columns plus typed metadata —
  * the Spark-side contract (schema, partitioning, batch shape) is real
  * and tested; the actual codec step is STUBBED with a deterministic
  * fake (`decodeStub`) because no media libraries exist in this
  * environment. Swapping the stub for a real decoder (e.g. javacv)
  * changes no schema or plan shape.
  *
  * Design for scale: decode work runs inside `mapPartitions` over a
  * typed Dataset — one JVM-side pass per partition, no driver
  * involvement, shuffle-free (narrow) unless the caller repartitions to
  * balance decode skew.
  */
object Multimodal {

  /** An opaque media blob + its metadata, as a typed row. */
  case class MediaBlob(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded-media features (what a real codec would yield). */
  case class MediaMeta(
      media_id: Long, kind: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, sha: String)

  /** Deterministic fake decode: derives "dimensions" from the blob
    * contents. A real implementation would parse the container header;
    * the signature, batching, and output schema are the contract. */
  def decodeStub(b: MediaBlob): MediaMeta = {
    val len = b.bytes.length
    val h = java.security.MessageDigest.getInstance("SHA-256").digest(b.bytes)
    val hex = h.map("%02x".format(_)).mkString
    // fake header parse: first bytes → dims, deterministic
    val w0 = if (len > 0) (b.bytes(0) & 0x7f) + 1 else 1
    val h0 = if (len > 1) (b.bytes(1) & 0x7f) + 1 else 1
    MediaMeta(b.media_id, b.kind, len.toLong, w0, h0, len / 16 + 1, hex)
  }

  /** Distributed decode: per-partition batch over the typed Dataset. */
  def decodeAll(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling: every `stride`-th fixed-size frame of a blob,
    * emitted as (media_id, frame_no, offset) — the shape a video
    * pipeline fans out to per-frame feature extraction. */
  def sampleFrames(blobs: Dataset[MediaBlob], frameSize: Int, stride: Int)
      : DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.flatMap { b =>
      val nFrames = math.max((b.bytes.length + frameSize - 1) / frameSize, 1)
      (0 until nFrames by stride).map { f =>
        val off = f * frameSize
        val end = math.min(off + frameSize, b.bytes.length)
        val slice = if (off < b.bytes.length) b.bytes.slice(off, end)
                    else Array.empty[Byte]
        (b.media_id, f.toLong, off.toLong, slice.length.toLong)
      }
    }.toDF("media_id", "frame_no", "offset", "frame_bytes")
  }
}

/** Oracle-checkable multimodal queries: documents.text treated as the
  * opaque byte payload (the only blob-like column in the testdata).
  * Exercises the binary path end-to-end with engine-portable hashing.
  */
object MultimodalQueries {
  import graft.Tables.t

  /** Binary metadata extraction: byte length + content hash. */
  def binaryMeta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("byte_len"),
        sha2(col("text").cast("binary"), 256).as("sha"))
      .orderBy("doc_id")

  private val binaryMetaSql =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |sha256(text) AS sha FROM documents ORDER BY doc_id""".stripMargin

  /** Frame sampling in pure SQL shape: 16-byte frames, every 4th frame
    * (64-byte stride), fingerprint per sampled frame. The distributed
    * twin of Multimodal.sampleFrames with a portable oracle.
    *
    * The sequence upper bound is clamped to ≥ 0 (greatest) because for
    * an EMPTY blob Spark's `sequence(0, -1)` yields `[0, -1]` (a
    * descending 2-step sequence) while DuckDB's `generate_series(0,
    * -1)` is empty — an empty doc would get two frame rows on Spark
    * and none in the oracle. Clamped, both engines emit exactly one
    * row 0 (an empty blob still yields one empty frame). Same guard in
    * m03/m04 and mirrored as GREATEST in every SQL twin. */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(expr(
          "sequence(0, greatest(cast(floor((octet_length(text) - 1) / 64) as int), 0))"))
          .as("i"))
      .select(col("doc_id"), (col("i") * 4).cast("long").as("frame_no"),
        md5(expr("substring(text, i * 64 + 1, 16)")).as("frame_sig"))
      .orderBy("doc_id", "frame_no")

  private val frameSampleSql =
    """SELECT doc_id, CAST(i * 4 AS BIGINT) AS frame_no,
      |md5(substring(text, CAST(i AS INT) * 64 + 1, 16)) AS frame_sig
      |FROM (
      |  SELECT doc_id, text,
      |    unnest(generate_series(0, GREATEST(CAST(FLOOR((octet_length(encode(text)) - 1) / 64) AS BIGINT), 0))) AS i
      |  FROM documents)
      |ORDER BY doc_id, frame_no""".stripMargin

  /** Blob → clip-level feature vector → modality cluster: the fan-in
    * stage after per-frame extraction. Every 16-byte frame is hashed;
    * feature dim j aggregates hex digit j over the blob's frames (the
    * deterministic stand-in for a frame-encoder output — swapping in a
    * real encoder changes only the per-frame expression); the clip is
    * assigned its dominant dimension (argmax, first-index tiebreak).
    * One explode + one 8-sum hash agg — partial-aggregated map-side,
    * shuffle carries 8 longs per doc. */
  val featDims = 8

  def blobFeatures(s: SparkSession, dir: String): DataFrame = {
    val frames = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(expr(
          "sequence(0, greatest(cast(floor((octet_length(text) - 1) / 16) as int), 0))"))
          .as("i"), col("text"))
      .select(col("doc_id"), md5(expr("substring(text, i * 16 + 1, 16)")).as("h"))
    val aggs = (0 until featDims).map(j =>
      sum(expr(s"instr('0123456789abcdef', substring(h, ${j + 1}, 1)) - 1"))
        .cast("long").as(s"f$j"))
    val fvec = array((0 until featDims).map(j => col(s"f$j")): _*)
    frames.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("fvec", fvec)
      .withColumn("top_dim",
        expr("array_position(fvec, array_max(fvec))").cast("long"))
      .select(col("doc_id") +: (0 until featDims).map(j => col(s"f$j")) :+
        col("top_dim"): _*)
      .orderBy("doc_id")
  }

  private val blobFeaturesSql: String = {
    val sums = (0 until featDims).map(j =>
      s"CAST(SUM(strpos('0123456789abcdef', substring(h, ${j + 1}, 1)) - 1) AS BIGINT) AS f$j")
      .mkString(",\n")
    val lst = (0 until featDims).map(j => s"f$j").mkString("[", ", ", "]")
    s"""WITH fr AS (
       |  SELECT doc_id, md5(substring(text, CAST(i AS INT) * 16 + 1, 16)) AS h
       |  FROM (
       |    SELECT doc_id, text,
       |      unnest(generate_series(0, GREATEST(CAST(FLOOR((octet_length(encode(text)) - 1) / 16) AS BIGINT), 0))) AS i
       |    FROM documents)),
       |sums AS (
       |  SELECT doc_id,
       |$sums
       |  FROM fr GROUP BY doc_id)
       |SELECT doc_id, ${(0 until featDims).map(j => s"f$j").mkString(", ")},
       |CAST(list_indexof($lst, list_aggregate($lst, 'max')) AS BIGINT) AS top_dim
       |FROM sums ORDER BY doc_id""".stripMargin
  }

  /** m04: perceptual-hash near-dup across blobs — MULTIMODAL dedup,
    * the stage that catches re-encoded/re-uploaded media exact-hash
    * dedup (m01's sha) misses. The pHash stand-in is a simhash over
    * the blob's frame fingerprints (the m02 frame family: 16-byte
    * frames at 64-byte stride): content-derived, locality-preserving,
    * and portable — a real DCT pHash swaps only the per-frame
    * expression, exactly like m03's encoder stub. Pairing reuses the
    * d04/d05 machinery verbatim (reference: `Dedup.scala` simhash):
    * 4-band pigeonhole prefilter (lossless for hamming ≤ 3), hamming
    * cut BEFORE distinct.
    *
    * Scale shape: fingerprints are 32-char strings — the self-join
    * input is ids+fingerprints, never blob bytes; band buckets bound
    * the candidate space; the sketch is persisted once (computing it
    * on both join sides would decode every blob twice). */
  val phashBits = graft.queries.Dedup.simhashBits
  val phashMaxHamming = graft.queries.Dedup.simhashMaxHamming

  def phashPairs(s: SparkSession, dir: String): DataFrame =
    phashPairsDf(t(s, dir, "documents"))

  def phashPairsDf(docs: DataFrame): DataFrame =
    phashCandDf(docs).orderBy("media_a", "media_b")

  /** Unordered pHash candidate pairs — the edge relation shared by m04
    * (scored pairs) and m06 (cluster resolution). */
  private def phashCandDf(docs: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.hamming
    // hex-digit values factored into one projection below the agg —
    // the same r12 rewrite as Dedup.simHashDf (4 substring+instr per
    // char collapse to 1; identical integers, identical fingerprints)
    val feats = docs
      .select(col("doc_id"),
        explode(expr(
          "sequence(0, greatest(cast(floor((octet_length(text) - 1) / 64) as int), 0))"))
          .as("i"), col("text"))
      .select(col("doc_id"), md5(expr("substring(text, i * 64 + 1, 16)")).as("h"))
      .select(col("doc_id") +: (0 until (phashBits + 3) / 4).map(c => expr(
        s"instr('0123456789abcdef', substring(h, ${c + 1}, 1)) - 1")
        .as(s"v$c")): _*)
    def bitFromVal(j: Int) = expr(
      s"CASE WHEN (v${j / 4} div ${1 << (j % 4)}) % 2 = 1 THEN 1 ELSE -1 END")
    val sums = feats.groupBy(col("doc_id"))
      .agg(sum(bitFromVal(0)).as("w0"),
        (1 until phashBits).map(j => sum(bitFromVal(j)).as(s"w$j")): _*)
    val fp = sums.select(col("doc_id"),
      concat((0 until phashBits)
        .map(j => when(col(s"w$j") >= 0, lit("1")).otherwise(lit("0"))): _*)
        .as("phash"))
      .persist()
    val bandW = phashBits / 4
    val bandCols = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        substring(col("phash"), b * bandW + 1, bandW).as("sig")).as(s"b$b"))
    val bands = fp.select(col("doc_id"), col("phash"),
        explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("phash"), col("bs.band").as("band"),
        col("bs.sig").as("sig"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("media_a"), col("y.doc_id").as("media_b"),
        hamming(col("x.phash"), col("y.phash")).as("hamming"))
      .filter(col("hamming") <= phashMaxHamming)
      .distinct()
  }

  /** CTE chain ending in `cand` (scored candidates) and `pairs` (the
    * thresholded edge relation) — shared by the m04 and m06 oracles. */
  private val phashCandCtes: String = {
    def bit(j: Int) = {
      val c = s"substring(h, ${j / 4 + 1}, 1)"
      val v = s"(strpos('0123456789abcdef', $c) - 1)"
      s"CASE WHEN ($v // ${1 << (j % 4)}) % 2 = 1 THEN 1 ELSE -1 END"
    }
    val sums = (0 until phashBits).map(j => s"SUM(${bit(j)}) AS w$j").mkString(", ")
    val chars = (0 until phashBits)
      .map(j => s"CASE WHEN w$j >= 0 THEN '1' ELSE '0' END").mkString(" || ")
    val bandW = phashBits / 4
    val bandRows = (0 until 4).map(b =>
      s"SELECT doc_id, phash, $b AS band, substring(phash, ${b * bandW + 1}, $bandW) AS sig FROM fp")
      .mkString("\nUNION ALL\n")
    val ham = (1 to phashBits)
      .map(j => s"CASE WHEN substring(x.phash, $j, 1) <> substring(y.phash, $j, 1) THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""fh AS (
       |  SELECT doc_id, md5(substring(text, CAST(i AS INT) * 64 + 1, 16)) AS h
       |  FROM (
       |    SELECT doc_id, text,
       |      unnest(generate_series(0, GREATEST(CAST(FLOOR((octet_length(encode(text)) - 1) / 64) AS BIGINT), 0))) AS i
       |    FROM documents)),
       |sums AS (SELECT doc_id, $sums FROM fh GROUP BY doc_id),
       |fp AS (SELECT doc_id, $chars AS phash FROM sums),
       |bands AS (
       |$bandRows),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS media_a, y.doc_id AS media_b,
       |    CAST($ham AS BIGINT) AS hamming
       |  FROM bands x JOIN bands y
       |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
       |pairs AS MATERIALIZED (
       |  SELECT media_a, media_b, hamming FROM cand
       |  WHERE hamming <= $phashMaxHamming)"""
  }

  private val phashPairsSql: String =
    s"""WITH $phashCandCtes
       |SELECT media_a, media_b, hamming FROM pairs
       |ORDER BY media_a, media_b""".stripMargin


  // ------------------------------------------------------------- m06
  /** m06: media duplicate-CLUSTER resolution — the d07 step for the
    * multimodal path, completing its dedup story (m04 stops at pairs;
    * a pipeline needs per-blob cluster ids and one canonical keeper).
    * Bounded min-label propagation ([[graft.operators
    * .ConnectedComponents.minLabel]], [[mediaCcRounds]] rounds — pHash
    * band clusters are short chains, same regime as d07) over the m04
    * candidate graph; canonical = the cluster's min media id.
    *
    * Scale: the edge relation is the banded-pHash candidate set (never
    * all-pairs); propagation moves (id, label) longs; the final size
    * window partitions by cluster. */
  val mediaCcRounds = 4

  def mediaClusters(s: SparkSession, dir: String): DataFrame =
    mediaClustersDf(t(s, dir, "documents"))

  def mediaClustersDf(docs: DataFrame): DataFrame = {
    val pairs = phashCandDf(docs).select(col("media_a"), col("media_b"))
    val labels = graft.operators.ConnectedComponents.minLabel(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("media_a").as("src"), col("media_b").as("dst")),
        mediaCcRounds)
      .select(col("id").as("media_id"), col("label").as("cluster"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
    labels
      .withColumn("cluster_size", count(lit(1)).over(w))
      .select(col("media_id"), col("cluster"), col("cluster_size"),
        when(col("media_id") === col("cluster"), 1L).otherwise(0L)
          .as("canonical"))
      .orderBy("media_id")
  }

  /** DuckDB twin: the m04 candidate chain + the d07-style unrolled
    * min-label rounds (every CTE MATERIALIZED — each round references
    * its predecessor twice). */
  private val mediaClustersSql: String = {
    val rounds = (1 to mediaCcRounds).map { r =>
      s"""l$r AS MATERIALIZED (
         |  SELECT l.media_id,
         |    LEAST(l.cluster, COALESCE(m.nbr, l.cluster)) AS cluster
         |  FROM l${r - 1} l LEFT JOIN (
         |    SELECT u.media_a AS media_id, MIN(n.cluster) AS nbr
         |    FROM u JOIN l${r - 1} n ON n.media_id = u.media_b
         |    GROUP BY u.media_a) m
         |  USING (media_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH $phashCandCtes,
       |u AS MATERIALIZED (SELECT media_a, media_b FROM pairs
       |      UNION ALL SELECT media_b, media_a FROM pairs),
       |l0 AS MATERIALIZED (
       |  SELECT doc_id AS media_id, doc_id AS cluster FROM documents),
       |$rounds
       |SELECT media_id, cluster,
       |CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size,
       |CAST(CASE WHEN media_id = cluster THEN 1 ELSE 0 END AS BIGINT)
       |  AS canonical
       |FROM l$mediaCcRounds ORDER BY media_id""".stripMargin
  }

  // ------------------------------------------------------------- m05
  /** Batched model-inference plumbing — the serving shape every
    * embedding/caption/classifier pass over a 100 TB corpus needs:
    * rows are batched per partition into fixed-size model calls
    * ([[inferBatchSize]] vectors per call — amortizing per-call
    * overhead exactly as a GPU forward pass would), the "model" here
    * being a deterministic integer stand-in (the decodeStub
    * discipline: the lib isn't in this container, the PLUMBING is
    * real). The score is per-row math, so the output is provably
    * independent of batch boundaries, partitioning, and batch count —
    * which is precisely the property a real inference pass must keep
    * and the DuckDB oracle checks cell-exact (it knows nothing about
    * batches). The per-call batch shape itself is spec-asserted
    * (MultimodalSpec): every call gets ≤ batchSize rows and all but
    * the last per partition get exactly batchSize.
    *
    * Scale: mapPartitions is the sanctioned per-partition imperative
    * hatch; nothing shuffles — inference cost is the scan plus the
    * model. Fixed-point `floor(v·2²⁰)` keeps the fake scores
    * engine-exact (the s06 rule). */
  val inferBatchSize = 32

  def batchInfer(s: SparkSession, dir: String): DataFrame =
    batchInferDf(graft.Tables.t(s, dir, "embeddings"))

  def batchInferDf(embs: DataFrame): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    embs.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.grouped(inferBatchSize).flatMap { batch =>
          // one "model call" per batch; scoring itself is per-row
          batch.iterator.map { case (id, v) =>
            var s = 0L
            var i = 0
            while (i < v.length) {
              s += math.floor(v(i).toDouble * 1048576.0).toLong * (i + 1)
              i += 1
            }
            (id, s)
          }
        }
      }
      .toDF("vec_id", "score")
      .orderBy("vec_id")
  }

  // LEFT JOIN back to embeddings so a zero-length embedding still
  // yields a (vec_id, 0) row — the Spark side emits one for every
  // input row, but a bare unnest(generate_series(1, 0)) would drop
  // the vec_id from the oracle entirely (latent differential).
  private val batchInferSql =
    """SELECT e.vec_id, CAST(COALESCE(s.score, 0) AS BIGINT) AS score
      |FROM embeddings e LEFT JOIN (
      |  SELECT vec_id,
      |    CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1048576)
      |      AS BIGINT) * i) AS BIGINT) AS score
      |  FROM embeddings,
      |    unnest(generate_series(1, len(embedding))) AS t(i)
      |  GROUP BY vec_id) s USING (vec_id)
      |ORDER BY e.vec_id""".stripMargin

  // ------------------------------------------------ m07 shot boundaries
  /** m07: shot-boundary detection — the video-segmentation primitive a
    * training pipeline runs before frame sampling (sample per SHOT,
    * not per fixed stride, or a 10-minute static shot floods the
    * batch): consecutive frames whose feature distance exceeds
    * [[shotCut]] start a new shot; per media the audit emits frame
    * count, shot count, and the longest shot. The per-frame feature is
    * the m02/m03/m04 stand-in (md5 of the 16-byte frame at 64-byte
    * stride — a real decoder swaps only that expression); the distance
    * is the integer L1 over the first [[shotHexDigits]] hex digits —
    * deterministic in both engines, no float anywhere.
    *
    * Scale shape: one blob pass explodes to frames, ONE doc_id
    * exchange serves the lag window, the running-sum window AND both
    * aggregates (their keys are doc_id-prefixed, so the window's
    * partitioning already clusters them — the q79 discipline extended
    * through two grouping levels); shuffle rows are (doc_id, frame_no,
    * 32-char sig), never blob bytes. */
  val shotCut = 40L
  val shotHexDigits = 8

  def shotBoundaries(s: SparkSession, dir: String): DataFrame =
    shotBoundariesDf(t(s, dir, "documents"))

  def shotBoundariesDf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = (1 to shotHexDigits).map(j =>
      expr(s"""abs((instr('0123456789abcdef', substring(h, $j, 1))) -
              (instr('0123456789abcdef', substring(ph, $j, 1))))"""))
      .reduce(_ + _)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    val wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"),
        explode(expr(
          "sequence(0, greatest(cast(floor((octet_length(text) - 1) / 64) as int), 0))"))
          .as("i"), col("text"))
      .select(col("doc_id"), col("i").cast("long").as("frame_no"),
        md5(expr("substring(text, i * 64 + 1, 16)")).as("h"))
      .withColumn("ph", lag(col("h"), 1).over(w))
      .withColumn("cut",
        when(col("ph").isNotNull && dist > lit(shotCut), 1L).otherwise(0L))
      .withColumn("shot", sum(col("cut")).over(wrun))
      .groupBy(col("doc_id"), col("shot"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("doc_id"))
      .agg(sum(col("len")).as("n_frames"),
        count(lit(1)).as("n_shots"),
        max(col("len")).as("longest_shot"))
      .orderBy("doc_id")
  }

  private val shotBoundariesSql = {
    val dist = (1 to shotHexDigits).map(j =>
      s"""abs((strpos('0123456789abcdef', substring(h, $j, 1))) -
         |(strpos('0123456789abcdef', substring(ph, $j, 1))))""".stripMargin)
      .mkString(" + ")
    s"""WITH fr AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
       |    md5(substring(text, CAST(i AS INT) * 64 + 1, 16)) AS h
       |  FROM (
       |    SELECT doc_id, text,
       |      unnest(generate_series(0, GREATEST(CAST(FLOOR((octet_length(encode(text)) - 1) / 64) AS BIGINT), 0))) AS i
       |    FROM documents)),
       |lg AS (
       |  SELECT doc_id, frame_no, h,
       |    LAG(h, 1) OVER (PARTITION BY doc_id ORDER BY frame_no) AS ph
       |  FROM fr),
       |ct AS (
       |  SELECT doc_id, frame_no,
       |    CASE WHEN ph IS NOT NULL AND ($dist) > $shotCut
       |      THEN 1 ELSE 0 END AS cut
       |  FROM lg),
       |sh AS (
       |  SELECT doc_id, SUM(cut) OVER (PARTITION BY doc_id ORDER BY frame_no
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shot
       |  FROM ct),
       |shots AS (
       |  SELECT doc_id, shot, COUNT(*) AS len FROM sh GROUP BY 1, 2)
       |SELECT doc_id, CAST(SUM(len) AS BIGINT) AS n_frames,
       |  CAST(COUNT(*) AS BIGINT) AS n_shots,
       |  CAST(MAX(len) AS BIGINT) AS longest_shot
       |FROM shots GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m07_shot_boundaries" -> shotBoundaries _,
    "m06_media_clusters" -> mediaClusters _,
    "m05_batch_infer"   -> batchInfer _,
    "m01_binary_meta"   -> binaryMeta _,
    "m02_frame_sample"  -> frameSample _,
    "m03_blob_features" -> blobFeatures _,
    "m04_phash_pairs"   -> phashPairs _)

  val oracle: Map[String, String] = Map(
    "m07_shot_boundaries" -> shotBoundariesSql,
    "m06_media_clusters" -> mediaClustersSql,
    "m05_batch_infer"   -> batchInferSql,
    "m01_binary_meta"   -> binaryMetaSql,
    "m02_frame_sample"  -> frameSampleSql,
    "m03_blob_features" -> blobFeaturesSql,
    "m04_phash_pairs"   -> phashPairsSql)
}
