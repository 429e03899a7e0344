package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/**
 * Multimodal-column operators: image/audio/video payloads are opaque
 * `binary` columns with a typed metadata struct alongside. The Spark-side
 * plumbing — schema, partition-preserving batch processing, output shape —
 * is real and tested; the actual byte decoding is STUBBED behind
 * [[MediaCodecStub]] with a deterministic fake (no image/audio libraries in
 * this environment). A production deployment swaps the stub body for a real
 * codec; nothing else changes.
 *
 * Scale posture: decode/feature-extract run as `mapPartitions` over the
 * typed Dataset — per-partition imperative batches (the Scala analogue of
 * `mapInPandas`), so one task owns one partition's worth of media bytes,
 * codecs amortize per partition, and no bytes ever reach the driver.
 * Metadata-only transforms (resize plans, frame sampling) are pure column
 * expressions and never touch the payload bytes — Catalyst prunes the
 * binary column out of the scan entirely when only metadata is selected.
 */
object Multimodal {

  /** One media row: opaque payload + declared kind ("image" | "audio" |
    * "video"). */
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded metadata (what a real codec would surface). */
  final case class MediaMeta(
      media_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, channels: Int,
      sample_rate: Int, n_frames: Int)

  /** Extracted feature vector (what a real model/feature pipe would emit). */
  final case class MediaFeature(media_id: Long, feature: Array[Float])

  /**
   * STUB codec ???: deterministic fake decode driven only by payload length
   * and bytes — replace the body with a real image/audio/video library
   * call. Kept as plain functions of the byte array so the mapPartitions
   * plumbing (batching, partition preservation, output schema) is
   * exercised for real.
   */
  object MediaCodecStub {
    def decode(row: MediaRow): MediaMeta = {
      val n = row.content.length
      MediaMeta(
        media_id = row.media_id,
        kind = row.kind,
        byte_len = n,
        width = 16 + n % 64,
        height = 16 + (n * 7) % 64,
        channels = 3,
        sample_rate = if (row.kind == "audio") 16000 else 0,
        n_frames = if (row.kind == "video") 1 + n % 30 else 1)
    }

    /** Fake feature extraction: `dim` pseudo-features, lane j = sum of the
      * byte values at payload positions ≡ j (mod dim) — deterministic,
      * cheap, shaped like a real embedding, and (by design) every lane is
      * an exact small integer, so the value is bit-identical in float32,
      * float64, and any SQL engine recomputing it: the whole feature path
      * gets a hard cross-engine oracle despite being a stub. */
    def features(row: MediaRow, dim: Int): MediaFeature = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < row.content.length) {
        out(i % dim) += (row.content(i) & 0xFF)
        i += 1
      }
      MediaFeature(row.media_id, out)
    }
  }

  /** Wrap a text table as fake media rows (test harness: UTF-8 bytes stand
    * in for encoded payloads; kind cycles deterministically by id). */
  def fakeMediaFromDocs(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col(idCol).as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("content"))
      .as[MediaRow]
  }

  /** Decode payloads to typed metadata — mapPartitions batch plumbing. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] =
    media.mapPartitions(_.map(MediaCodecStub.decode))(Encoders.product[MediaMeta])

  /** Feature extraction — mapPartitions, one codec context per partition. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeature] =
    media.mapPartitions(_.map(MediaCodecStub.features(_, dim)))(Encoders.product[MediaFeature])

  /** Deterministic scalar digest of a feature vector — the oracle-checkable
    * projection of [[extractFeatures]] output (a raw `array<float>` column
    * can't be sorted/hashed by generic comparators; this can). Lanes are
    * exact integers by construction, so the int-cast is lossless. */
  def featureDigest(features: DataFrame): DataFrame =
    features.select(col("media_id"),
      md5(concat_ws(",",
        transform(col("feature"), f => f.cast("int").cast("string")))
        .cast("binary")).as("feature_digest"))

  /** Resize plan: pure metadata transform (aspect-preserving fit into a
    * `target`×`target` box, round-to-nearest semantics — ceil would
    * overshoot the box when the exact fit times FP epsilon lands above an
    * integer) — never touches payload bytes. */
  def resizePlan(meta: DataFrame, target: Int): DataFrame =
    meta.withColumn("scale",
      least(lit(target) / col("width"), lit(target) / col("height")))
      .withColumn("out_width", round(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", round(col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** Frame sampling plan for video rows: every `step`-th frame index —
    * pure `sequence`/`explode`, no payload access. */
  def frameSamplePlan(meta: DataFrame, step: Int): DataFrame =
    meta.filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
          .as("frame_idx"))
}
