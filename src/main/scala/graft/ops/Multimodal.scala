package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/**
 * Multimodal-column operators: image/audio/video payloads are opaque
 * `binary` columns with a typed metadata struct alongside. The Spark-side
 * plumbing — schema, partition-preserving batch processing, output shape —
 * is real and tested, and the IMAGE and AUDIO lanes decode for real
 * through JDK-shipped codecs ([[JdkMediaCodec]]: `javax.imageio` +
 * `javax.sound.sampled`): the fixture synthesizes genuine PNG/WAV
 * payloads and the codec reads width/height/channels/pixels (image) and
 * sample_rate/n_frames/samples (audio) back out of the containers. Video
 * stays behind the deterministic [[MediaCodecStub]] (the JDK ships no
 * video codec); the [[MediaCodec]] trait is the swap point — a production
 * deployment drops in a real codec and nothing else changes.
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

  /** Decoded metadata (what a real codec would surface). `byte_len` is the
    * encoded payload size — a container/encoder property, not a content
    * property, so oracle-matched queries project it out (PNG size is not
    * SQL-predictable) and `MultimodalSpec` asserts it instead. */
  final case class MediaMeta(
      media_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, channels: Int,
      sample_rate: Int, n_frames: Int)

  /** Extracted feature vector (what a real model/feature pipe would emit). */
  final case class MediaFeature(media_id: Long, feature: Array[Float])

  /** The codec seam: decode + feature extraction over one media row.
    * Serializable because instances ride mapPartitions closures to
    * executors. */
  trait MediaCodec extends Serializable {
    def decode(row: MediaRow): MediaMeta
    def features(row: MediaRow, dim: Int): MediaFeature
  }

  /**
   * STUB codec: deterministic fake decode driven only by payload length
   * and bytes — the stand-in for video (no JDK video codec) and the
   * all-lanes fake the codec-seam tests swap in. Kept as plain functions
   * of the byte array so the mapPartitions plumbing (batching, partition
   * preservation, output schema) is exercised for real.
   */
  object MediaCodecStub extends MediaCodec {
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

  /**
   * REAL image + audio lanes, both on JDK-shipped codecs (no external
   * libraries needed):
   *
   *  - image: `javax.imageio` decode of the payload bytes — width, height,
   *    and channel count come from the decoded raster, features from the
   *    decoded pixel samples (lane j = sum of band-0 samples at raster
   *    positions ≡ j mod dim, row-major).
   *  - audio: `javax.sound.sampled` decode of the payload bytes — sample
   *    rate, channel count, and frame count come from the parsed WAV
   *    container, features from the decoded 16-bit PCM samples (lane j =
   *    sum of channel-0 samples at frame positions ≡ j mod dim).
   *
   * Pixel/sample sums stay exact small integers (≤ count/dim × 255 ≪ 2^24),
   * so both feature paths keep their bit-exact cross-engine oracle even
   * though the decodes are real. Video delegates to [[MediaCodecStub]] —
   * the JDK ships no video codec, so that lane stays a documented stub.
   */
  object JdkMediaCodec extends MediaCodec {
    /** One PNG ImageReader per task thread, reused across the partition's
      * rows — `ImageIO.read` scans the plugin registry per call, which is
      * the per-row overhead `mapPartitions` batching exists to amortize.
      * ImageReader is not thread-safe; Spark runs one partition per task
      * thread, so ThreadLocal is the correct scope. */
    @transient private lazy val pngReader =
      ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
        javax.imageio.ImageIO.getImageReadersByFormatName("png").next())

    private def readImage(row: MediaRow): java.awt.image.BufferedImage = {
      val reader = pngReader.get()
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(row.content))
      try {
        reader.setInput(in, true, true)
        reader.read(0)
      } catch {
        case e: Exception => throw new IllegalArgumentException(
          s"undecodable image payload for media_id=${row.media_id}", e)
      } finally {
        reader.setInput(null)
        in.close()
      }
    }

    /** One WAV-capable `AudioFileReader` provider per task thread, reused
      * across the partition's rows — `AudioSystem.getAudioInputStream`
      * walks the provider registry per call, the same per-row overhead
      * the thread-local PNG reader above exists to amortize. The probe
      * WAV selects the provider once per thread. */
    @transient private lazy val wavReader =
      ThreadLocal.withInitial[javax.sound.sampled.spi.AudioFileReader] { () =>
        val probe = synthesizeWav(0L, 0)
        val it = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
        var found: javax.sound.sampled.spi.AudioFileReader = null
        while (found == null && it.hasNext) {
          val r = it.next()
          try {
            r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close()
            found = r
          } catch { case _: Exception => }
        }
        if (found == null) throw new IllegalStateException(
          "no WAV-capable javax.sound AudioFileReader provider on this JVM")
        found
      }

    /** Open the WAV container WITHOUT draining it: header parse only.
      * `ByteArrayInputStream` provides the mark/reset the reader needs.
      * Callers close the stream; `getFrameLength` comes from the header,
      * so metadata-only decode never touches the PCM bytes. */
    private def openAudio(row: MediaRow): javax.sound.sampled.AudioInputStream =
      try wavReader.get().getAudioInputStream(
        new java.io.ByteArrayInputStream(row.content))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"undecodable audio payload for media_id=${row.media_id}", e)
      }

    def decode(row: MediaRow): MediaMeta = row.kind match {
      case "image" =>
        val img = readImage(row)
        MediaMeta(
          media_id = row.media_id,
          kind = row.kind,
          byte_len = row.content.length,
          width = img.getWidth,
          height = img.getHeight,
          channels = img.getRaster.getNumBands,
          sample_rate = 0,
          n_frames = 1)
      case "audio" =>
        val ais = openAudio(row)
        try MediaMeta(
          media_id = row.media_id,
          kind = row.kind,
          byte_len = row.content.length,
          width = 0,
          height = 0,
          channels = ais.getFormat.getChannels,
          sample_rate = ais.getFormat.getSampleRate.toInt,
          // header field — metadata decode never drains the PCM bytes
          n_frames = ais.getFrameLength.toInt)
        finally ais.close()
      case _ => MediaCodecStub.decode(row)
    }

    def features(row: MediaRow, dim: Int): MediaFeature = row.kind match {
      case "image" =>
        val img = readImage(row)
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val out = new Array[Float](dim)
        var p = 0
        while (p < w * h) {
          out(p % dim) += raster.getSample(p % w, p / w, 0)
          p += 1
        }
        MediaFeature(row.media_id, out)
      case "audio" =>
        val ais = openAudio(row)
        val (stride, pcm) =
          try (ais.getFormat.getFrameSize, ais.readAllBytes())
          finally ais.close()
        val out = new Array[Float](dim)
        val nFrames = pcm.length / stride
        var p = 0
        while (p < nFrames) {
          // channel-0 sample, 16-bit little-endian signed
          val lo = pcm(p * stride) & 0xFF
          val hi = pcm(p * stride + 1).toInt
          out(p % dim) += ((hi << 8) | lo).toShort.toInt
          p += 1
        }
        MediaFeature(row.media_id, out)
      case _ => MediaCodecStub.features(row, dim)
    }
  }

  /** Deterministic RGB PNG synthesis for the image fixture: dimensions
    * follow the SAME formulas the stub applies to a byte length (so the
    * SQL oracle derives them from `length(text)`), and band-0 pixel p
    * (row-major) carries the value `(p*31 + id*7) % 256` — a function a
    * SQL engine can re-evaluate, which is what gives the REAL decode path
    * a full hash-match oracle. */
  def synthesizePng(id: Long, sourceLen: Int): Array[Byte] = {
    val w = 16 + sourceLen % 64
    val h = 16 + (sourceLen * 7) % 64
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster
    var p = 0
    while (p < w * h) {
      val v = ((p * 31L + id * 7L) % 256L).toInt
      raster.setSample(p % w, p / w, 0, v)
      raster.setSample(p % w, p / w, 1, (v + 101) % 256)
      raster.setSample(p % w, p / w, 2, (v + 202) % 256)
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV synthesis for the audio fixture:
    * the frame count follows a formula of the source byte length (so the
    * SQL oracle derives it from `octet_length(text)`), and frame p carries
    * the sample value `(p*31 + id*7) % 256` — the same SQL-re-evaluable
    * family as the PNG band-0 pixels, which is what gives the REAL
    * `javax.sound.sampled` decode path a full hash-match oracle. */
  def synthesizeWav(id: Long, sourceLen: Int): Array[Byte] = {
    val nFrames = 64 + (sourceLen * 5) % 256
    val pcm = new Array[Byte](nFrames * 2)
    var p = 0
    while (p < nFrames) {
      val v = ((p * 31L + id * 7L) % 256L).toInt
      pcm(p * 2) = (v & 0xFF).toByte // little-endian, values < 256 → hi byte 0
      pcm(p * 2 + 1) = 0
      p += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Wrap a text table as media rows (test harness; kind cycles
    * deterministically by id). Image rows carry a REAL synthesized PNG
    * ([[synthesizePng]]) and audio rows a REAL synthesized WAV
    * ([[synthesizeWav]]), both sized from the text's byte length so
    * metadata stays SQL-derivable; video rows carry the UTF-8 bytes
    * standing in for encoded payloads (no JDK video codec). */
  def fakeMediaFromDocs(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val bytes = text.getBytes("UTF-8")
        val content = kind match {
          case "image" => synthesizePng(id, bytes.length)
          case "audio" => synthesizeWav(id, bytes.length)
          case _ => bytes
        }
        MediaRow(id, kind, content)
      }
  }

  /** Decode payloads to typed metadata — mapPartitions batch plumbing. */
  def decodeMeta(media: Dataset[MediaRow],
      codec: MediaCodec = JdkMediaCodec): Dataset[MediaMeta] =
    media.mapPartitions(_.map(codec.decode))(Encoders.product[MediaMeta])

  /** Feature extraction — mapPartitions, one codec context per partition. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16,
      codec: MediaCodec = JdkMediaCodec): Dataset[MediaFeature] =
    media.mapPartitions(_.map(codec.features(_, dim)))(Encoders.product[MediaFeature])

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
