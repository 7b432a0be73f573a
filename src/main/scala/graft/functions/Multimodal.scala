package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline (north-star op,
  * BASELINE.json): image/audio/video travel as opaque `binary` payload
  * columns with typed metadata structs; decode / feature-extraction /
  * resize / frame-sampling run as partition-batched functions over typed
  * Datasets (`mapPartitions` — the JVM analog of a vectorized batch UDF:
  * one iterator per partition, no per-row driver round-trips).
  *
  * ==== STUB NOTICE ====
  * This container has no image/audio codec libraries, so `decode*` are
  * deterministic FAKES computed from payload byte lengths (marked STUB
  * below). The Spark-side contract — schema, encoders, partitioning, batch
  * iteration shape — is real and is what the tests pin. Swapping in a real
  * codec changes only the arithmetic inside the stubs.
  */
object Multimodal {

  /** An opaque media payload + routing metadata. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Typed decode result (image-style metadata). */
  case class DecodedMedia(doc_id: Long, media_type: String, byte_len: Long,
                          width: Int, height: Int, channels: Int)

  /** Fixed-length feature vector extracted per payload. */
  case class MediaFeature(doc_id: Long, feature: Array[Double])

  val FeatureDim = 8
  private val FeaturePrimes = Array(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)

  /** STUB decode: metadata derived arithmetically from the byte length —
    * stands in for an image header parse. Deterministic and
    * SQL-expressible so the full pipeline is oracle-checkable. */
  def decodeStub(r: MediaRecord): DecodedMedia = {
    val n = r.payload.length.toLong
    DecodedMedia(r.doc_id, r.media_type, n,
      width = (64 + (n * 7) % 513).toInt,
      height = (64 + (n * 13) % 513).toInt,
      channels = (1 + n % 3).toInt)
  }

  /** STUB feature extraction: 8-dim deterministic pseudo-embedding. */
  def featureStub(r: MediaRecord): MediaFeature = {
    val n = r.payload.length.toLong
    MediaFeature(r.doc_id,
      FeaturePrimes.map(p => ((n * p) % 1000).toDouble / 1000.0))
  }

  /** STUB resize: returns a payload of exactly `targetBytes` (≤ 0 → empty),
    * cycling the source bytes — stands in for a pixel resample. */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (targetBytes <= 0) Array.emptyByteArray
    else if (payload.isEmpty) new Array[Byte](targetBytes)
    else Array.tabulate(targetBytes)(i => payload(i % payload.length))
  }

  /** STUB frame sampling: split the payload into `n` equal-length frames
    * (remainder bytes dropped; n ≤ 0 or payload shorter than n → empty) —
    * stands in for video frame extraction. */
  def frameSampleStub(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (n <= 0) return Seq.empty
    val frameLen = payload.length / n
    if (frameLen == 0) Seq.empty
    else (0 until n).map(i => payload.slice(i * frameLen, (i + 1) * frameLen))
  }

  /** Wrap the documents table as a media table: payload = UTF-8 bytes of the
    * text (the testdata has no true binary table; the plumbing downstream is
    * payload-agnostic), media_type routed from the source column. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // null text → null payload → executor NPE in the stubs; drop such rows
    // here (the engine's null contract — the q_media_* oracles mirror this
    // with WHERE text IS NOT NULL)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        concat(lit("img/"), col("source")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Partition-batched decode: one iterator per partition (vectorized-UDF
    * shape). Payloads never leave executors. */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Partition-batched feature extraction. */
  def featuresAll(media: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(featureStub))
  }

  /** Per-payload frame-sampling profile. */
  case class FrameInfo(doc_id: Long, n_frames: Int, frame_len: Int)

  /** Partition-batched frame sampling (video-style): split each payload
    * into `n` frames via [[frameSampleStub]] and report the per-doc frame
    * profile — the sampled frames themselves stay on executors. */
  def framesAll(media: Dataset[MediaRecord], n: Int): Dataset[FrameInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val frames = frameSampleStub(r.payload, n)
      FrameInfo(r.doc_id, frames.length,
        frames.headOption.map(_.length).getOrElse(0))
    })
  }
}
