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
    * twin of Multimodal.sampleFrames with a portable oracle. */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(expr(
          "sequence(0, cast(floor((octet_length(text) - 1) / 64) as int))"))
          .as("i"))
      .select(col("doc_id"), (col("i") * 4).cast("long").as("frame_no"),
        md5(expr("substring(text, i * 64 + 1, 16)")).as("frame_sig"))
      .orderBy("doc_id", "frame_no")

  private val frameSampleSql =
    """SELECT doc_id, CAST(i * 4 AS BIGINT) AS frame_no,
      |md5(substring(text, CAST(i AS INT) * 64 + 1, 16)) AS frame_sig
      |FROM (
      |  SELECT doc_id, text,
      |    unnest(generate_series(0, CAST(FLOOR((octet_length(encode(text)) - 1) / 64) AS BIGINT))) AS i
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
          "sequence(0, cast(floor((octet_length(text) - 1) / 16) as int))"))
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
       |      unnest(generate_series(0, CAST(FLOOR((octet_length(encode(text)) - 1) / 16) AS BIGINT))) AS i
       |    FROM documents)),
       |sums AS (
       |  SELECT doc_id,
       |$sums
       |  FROM fr GROUP BY doc_id)
       |SELECT doc_id, ${(0 until featDims).map(j => s"f$j").mkString(", ")},
       |CAST(list_indexof($lst, list_aggregate($lst, 'max')) AS BIGINT) AS top_dim
       |FROM sums ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta"   -> binaryMeta _,
    "m02_frame_sample"  -> frameSample _,
    "m03_blob_features" -> blobFeatures _)

  val oracle: Map[String, String] = Map(
    "m01_binary_meta"   -> binaryMetaSql,
    "m02_frame_sample"  -> frameSampleSql,
    "m03_blob_features" -> blobFeaturesSql)
}
