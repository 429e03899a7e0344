package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/**
 * Multimodal-column operators: image/audio/video payloads are opaque
 * `binary` columns with a typed metadata struct alongside. The Spark-side
 * plumbing — schema, partition-preserving batch processing, output shape —
 * is real and tested, and ALL THREE lanes decode for real through
 * JDK-shipped codecs ([[JdkMediaCodec]]: `javax.imageio` +
 * `javax.sound.sampled`): the fixture synthesizes genuine PNG/WAV payloads
 * and multi-frame animated GIF payloads (the JDK's `javax.imageio` GIF
 * plugin reads and writes frame sequences — the video lane's
 * moving-picture container), and the codec reads width/height/channels/
 * pixels (image), sample_rate/n_frames/samples (audio), and per-frame
 * rasters + the container frame count (video) back out of the containers.
 * The [[MediaCodec]] trait is the swap point — a production deployment
 * drops in an H.264/VP9-class codec for the video lane and nothing else
 * changes; [[MediaCodecStub]] remains as the deterministic all-lanes fake
 * the codec-seam tests swap in.
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
    * executors. `frameSums` is the video-frame access path: the sum of
    * band-0 sample values of every `step`-th decoded frame, indexed by
    * frame number — the digest projection a real frame-extraction
    * pipeline exposes for verification. */
  trait MediaCodec extends Serializable {
    def decode(row: MediaRow): MediaMeta
    def features(row: MediaRow, dim: Int): MediaFeature
    def frameSums(row: MediaRow, step: Int): Array[(Int, Long)]
    def pcmWindows(row: MediaRow, win: Int): Array[AudioWindow]
  }

  /** One windowed-PCM stats row ([[MediaCodec.pcmWindows]]): integer-exact
    * per-window aggregates of the decoded channel-0 samples. */
  final case class AudioWindow(
      media_id: Long, window_idx: Int, n_samples: Int,
      sample_sum: Long, sample_sumsq: Long, peak: Int)

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

    /** Fake frame digests: byte-length arithmetic, same register as the
      * fake decode — video rows only. */
    def frameSums(row: MediaRow, step: Int): Array[(Int, Long)] =
      if (row.kind != "video") Array.empty
      else {
        val n = row.content.length
        (0 until decode(row).n_frames by step)
          .map(f => f -> (f * 131L + n))
          .toArray
      }

    /** Fake PCM windows: byte-length arithmetic (audio rows only), same
      * register as the other stub lanes — window w pretends to hold `win`
      * samples of constant value `(w*13 + n) % 256`. */
    def pcmWindows(row: MediaRow, win: Int): Array[AudioWindow] =
      if (row.kind != "audio") Array.empty
      else {
        val n = row.content.length
        (0 until 1 + n % 4).map { w =>
          val v = (w * 13L + n) % 256L
          AudioWindow(row.media_id, w, win, v * win, v * v * win, v.toInt)
        }.toArray
      }
  }

  /**
   * REAL image + audio + video lanes, all on JDK-shipped codecs (no
   * external libraries needed):
   *
   *  - image: `javax.imageio` decode of the payload bytes — width, height,
   *    and channel count come from the decoded raster, features from the
   *    decoded pixel samples (lane j = sum of band-0 samples at raster
   *    positions ≡ j mod dim, row-major).
   *  - audio: `javax.sound.sampled` decode of the payload bytes — sample
   *    rate, channel count, and frame count come from the parsed WAV
   *    container, features from the decoded 16-bit PCM samples (lane j =
   *    sum of channel-0 samples at frame positions ≡ j mod dim).
   *  - video: `javax.imageio` GIF-sequence decode of the payload bytes —
   *    the frame count comes from the container's image sequence
   *    (`getNumImages`), width/height/channels from the frame-0 header,
   *    and features from the decoded per-frame pixels (lane j = sum of
   *    gray values at GLOBAL sample positions ≡ j mod dim, where global
   *    position = frame·(w·h) + row-major pixel index — the flattened
   *    space-time raster). Pixels are read through `getRGB` so the values
   *    are palette-resolved colors, independent of GIF color-table order.
   *
   * Pixel/sample sums stay exact small integers (≤ count/dim × 255 ≪ 2^24),
   * so all three feature paths keep their bit-exact cross-engine oracle
   * even though the decodes are real.
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

    /** One GIF ImageReader per task thread (same amortization rationale as
      * [[pngReader]]): the video lane opens the container once per row and
      * reads frames through it. */
    @transient private lazy val gifReader =
      ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next())

    /** Open the GIF container on the reader and run `body` with it —
      * centralizes setInput/cleanup so decode, features, and frameSums
      * share one access path. `seekForwardOnly=false` because frame reads
      * may revisit the stream; `getNumImages(true)` needs the full scan. */
    private def withGif[A](row: MediaRow)(
        body: javax.imageio.ImageReader => A): A = {
      val reader = gifReader.get()
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(row.content))
      try {
        reader.setInput(in, false, true)
        body(reader)
      } catch {
        case e: Exception => throw new IllegalArgumentException(
          s"undecodable video payload for media_id=${row.media_id}", e)
      } finally {
        reader.setInput(null)
        in.close()
      }
    }

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
      case _ => withGif(row) { rd =>
        MediaMeta(
          media_id = row.media_id,
          kind = row.kind,
          byte_len = row.content.length,
          // frame-0 header fields — no pixel decode for metadata
          width = rd.getWidth(0),
          height = rd.getHeight(0),
          channels = rd.getImageTypes(0).next().getNumBands,
          sample_rate = 0,
          // the container's actual image sequence length
          n_frames = rd.getNumImages(true))
      }
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
      case _ => withGif(row) { rd =>
        val out = new Array[Float](dim)
        val n = rd.getNumImages(true)
        var f = 0
        var s = 0 // global sample position across the frame sequence
        while (f < n) {
          val img = rd.read(f)
          val (w, h) = (img.getWidth, img.getHeight)
          var p = 0
          while (p < w * h) {
            out(s % dim) += (img.getRGB(p % w, p / w) & 0xFF)
            p += 1
            s += 1
          }
          f += 1
        }
        MediaFeature(row.media_id, out)
      }
    }

    /** Real frame extraction: decode every `step`-th frame of the GIF
      * sequence and emit its band-0 pixel sum — the verifiable digest of
      * "the pipeline actually held frame f's raster in memory". */
    def frameSums(row: MediaRow, step: Int): Array[(Int, Long)] =
      if (row.kind != "video") Array.empty
      else withGif(row) { rd =>
        val n = rd.getNumImages(true)
        (0 until n by step).map { f =>
          val img = rd.read(f)
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var p = 0
          while (p < w * h) {
            sum += (img.getRGB(p % w, p / w) & 0xFF)
            p += 1
          }
          f -> sum
        }.toArray
      }

    /** REAL windowed PCM statistics over audio rows: decode the WAV
      * payload with `javax.sound.sampled` and aggregate the channel-0
      * samples in fixed windows of `win` frames (the last window may be
      * partial) — sum, sum of squares, and peak |sample| per window, all
      * exact integers so downstream RMS (`sqrt(sumsq/n)`, two
      * correctly-rounded IEEE ops) is bit-identical cross-engine. The
      * per-window energy/peak envelope is the silence-trim / clipping /
      * activity-detection signal an audio curation pipeline filters on. */
    def pcmWindows(row: MediaRow, win: Int): Array[AudioWindow] =
      if (row.kind != "audio") Array.empty
      else {
        require(win >= 1, s"window must be >= 1, got $win")
        val ais = openAudio(row)
        val (stride, pcm) =
          try (ais.getFormat.getFrameSize, ais.readAllBytes())
          finally ais.close()
        val nFrames = pcm.length / stride
        val out = Array.newBuilder[AudioWindow]
        var w = 0
        while (w * win < nFrames) {
          val end = math.min((w + 1) * win, nFrames)
          var p = w * win
          var sum = 0L
          var sumsq = 0L
          var peak = 0
          while (p < end) {
            val lo = pcm(p * stride) & 0xFF
            val hi = pcm(p * stride + 1).toInt
            val v = ((hi << 8) | lo).toShort.toInt
            sum += v
            sumsq += v.toLong * v
            if (math.abs(v) > peak) peak = math.abs(v)
            p += 1
          }
          out += AudioWindow(row.media_id, w, end - w * win, sum, sumsq, peak)
          w += 1
        }
        out.result()
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

  /** Deterministic multi-frame animated-GIF synthesis for the video
    * fixture: `1 + sourceLen % 30` frames of a small gray raster
    * (`8 + sourceLen % 8` × `8 + sourceLen*3 % 8` — kept compact because
    * the oracle re-evaluates every space-time sample in SQL), where the
    * pixel at GLOBAL sample position s (= frame·w·h + row-major index)
    * carries `(s*31 + id*7) % 256` — the same SQL-re-evaluable family as
    * the PNG pixels and WAV samples, extended along the time axis, which
    * is what gives the REAL GIF-sequence decode path a full hash-match
    * oracle. Frames use an explicit 256-gray palette so `getRGB & 0xFF`
    * reads the exact synthesized value back regardless of how the writer
    * orders the color table. */
  def synthesizeGif(id: Long, sourceLen: Int): Array[Byte] = {
    val w = 8 + sourceLen % 8
    val h = 8 + (sourceLen * 3) % 8
    val nFrames = 1 + sourceLen % 30
    val grays = Array.tabulate[Byte](256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var p = 0
        while (p < w * h) {
          val s = f.toLong * w * h + p
          raster.setSample(p % w, p / w, 0, ((s * 31L + id * 7L) % 256L).toInt)
          p += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.setOutput(null)
      ios.close()
    }
    bos.toByteArray
  }

  /** Wrap a text table as media rows (test harness; kind cycles
    * deterministically by id). Image rows carry a REAL synthesized PNG
    * ([[synthesizePng]]), audio rows a REAL synthesized WAV
    * ([[synthesizeWav]]), and video rows a REAL synthesized multi-frame
    * animated GIF ([[synthesizeGif]]) — all sized from the text's byte
    * length so metadata stays SQL-derivable. */
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
          case _ => synthesizeGif(id, bytes.length)
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

  /** REAL windowed audio feature extraction over audio rows: decode →
    * fixed-window PCM stats ([[MediaCodec.pcmWindows]]) → RMS column
    * (`sqrt(sumsq/n)`: both ops correctly-rounded IEEE over exact integer
    * inputs, so the double is bit-identical in any engine — no rounding
    * needed). Same scale posture as decode/features: mapPartitions
    * batches, payload bytes never leave the executor. */
  def audioWindows(media: Dataset[MediaRow], win: Int,
      codec: MediaCodec = JdkMediaCodec): DataFrame =
    media.mapPartitions(_.flatMap(row =>
        codec.pcmWindows(row, win).iterator))(Encoders.product[AudioWindow])
      .toDF()
      .withColumn("rms",
        sqrt(col("sample_sumsq").cast("double") / col("n_samples")))

  /** One decoded-frame digest row. */
  final case class FrameDigest(media_id: Long, frame_idx: Int, frame_sum: Long)

  /** REAL frame extraction over video rows: decode every `step`-th frame
    * of each payload's image sequence and emit its band-0 pixel sum —
    * the executable counterpart of [[frameSamplePlan]] (which plans
    * indices without touching bytes, this one holds each sampled frame's
    * raster). mapPartitions batches, per-task-thread reader reuse, bytes
    * never reach the driver — identical scale posture to decode/features. */
  def frameDigest(media: Dataset[MediaRow], step: Int,
      codec: MediaCodec = JdkMediaCodec): Dataset[FrameDigest] =
    media.mapPartitions(_.flatMap(row =>
      codec.frameSums(row, step).iterator.map { case (f, sum) =>
        FrameDigest(row.media_id, f, sum)
      }))(Encoders.product[FrameDigest])
}
