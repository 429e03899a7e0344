package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fakeMediaFromDocs(
    Tables(spark, sf0001, "documents"), "doc_id", "text")

  private lazy val textLens: Map[Long, Int] =
    Tables(spark, sf0001, "documents")
      .select(col("doc_id"), octet_length(col("text")).cast("int"))
      .as[(Long, Int)].collect().toMap

  test("media wrapping: binary payload, kind cycles by id") {
    val rows = media.filter(col("media_id") < 6).collect().sortBy(_.media_id)
    assert(rows.map(_.kind).toSeq ==
      Seq("image", "audio", "video", "image", "audio", "video"))
    assert(rows.forall(_.content.nonEmpty))
  }

  test("image payloads are genuine PNG containers") {
    val pngMagic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val rows = media.filter(col("kind") === "image").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.content.take(8).sameElements(pngMagic),
        s"media_id=${r.media_id} is not a PNG")
      // the container is real: its size is the encoder's, not the text's
      assert(r.content.length != textLens(r.media_id))
    }
  }

  test("audio payloads are genuine WAV containers") {
    val rows = media.filter(col("kind") === "audio").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(new String(r.content.take(4), "US-ASCII") == "RIFF" &&
        new String(r.content.slice(8, 12), "US-ASCII") == "WAVE",
        s"media_id=${r.media_id} is not a WAV")
      // the container is real: canonical 44-byte PCM header + 2 bytes per
      // frame. (NOT a "size != text length" check — a 436-byte text
      // synthesizes a WAV of exactly 436 bytes, so that discriminator is
      // ambiguous on real fixture lengths.)
      val frames = 64 + (textLens(r.media_id) * 5) % 256
      assert(r.content.length == 44 + 2 * frames,
        s"media_id=${r.media_id}: ${r.content.length} != 44 + 2*$frames")
    }
  }

  test("video payloads are genuine multi-frame GIF containers") {
    val rows = media.filter(col("kind") === "video").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val magic = new String(r.content.take(6), "US-ASCII")
      assert(magic == "GIF89a" || magic == "GIF87a",
        s"media_id=${r.media_id} is not a GIF")
      // the container is real: its size is the encoder's, not the text's
      assert(r.content.length != textLens(r.media_id))
    }
  }

  test("decode: REAL image/audio/video metadata from JDK codecs") {
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length == media.count())
    meta.foreach { m =>
      // image/audio metadata must come out of the DECODED container and
      // land on the synthesis formulas over the SOURCE text length
      // (byte_len is the container size and must NOT satisfy them — that
      // would mean the stub ran)
      m.kind match {
        case "image" =>
          val srcLen = textLens(m.media_id)
          assert(m.byte_len != srcLen)
          assert(m.width == 16 + srcLen % 64, s"$m")
          assert(m.height == 16 + (srcLen * 7) % 64, s"$m")
          assert(m.channels == 3 && m.sample_rate == 0 && m.n_frames == 1)
        case "audio" =>
          val srcLen = textLens(m.media_id)
          // structural container check, unambiguous at any text length
          // (byte_len != srcLen is NOT: a 436-byte text yields a 436-byte WAV)
          assert(m.byte_len == 44 + 2 * m.n_frames, s"$m")
          assert(m.width == 0 && m.height == 0 && m.channels == 1, s"$m")
          assert(m.sample_rate == 16000, s"$m")
          assert(m.n_frames == 64 + (srcLen * 5) % 256, s"$m")
        case _ =>
          val srcLen = textLens(m.media_id)
          // GIF container size is the encoder's, not the text's
          assert(m.byte_len != srcLen)
          assert(m.width == 8 + srcLen % 8, s"$m")
          assert(m.height == 8 + (srcLen * 3) % 8, s"$m")
          // palette-indexed frames: one band; frame count from the
          // container's image sequence
          assert(m.channels == 1 && m.sample_rate == 0, s"$m")
          assert(m.n_frames == 1 + srcLen % 30, s"$m")
      }
    }
    // deterministic across evaluations
    val again = Multimodal.decodeMeta(media).collect()
    assert(meta.sortBy(_.media_id).sameElements(again.sortBy(_.media_id)))
  }

  test("codec seam: swapping the trait swaps all three decode lanes") {
    val real = Multimodal.decodeMeta(media, Multimodal.JdkMediaCodec)
      .collect().map(m => m.media_id -> m).toMap
    val stub = Multimodal.decodeMeta(media, Multimodal.MediaCodecStub)
      .collect().map(m => m.media_id -> m).toMap
    assert(real.keySet == stub.keySet)
    // the stub hashes the container length into width/height — the real
    // codec reads the container; only byte_len can agree
    real.foreach { case (id, m) => assert(m.byte_len == stub(id).byte_len) }
    Seq("image", "audio", "video").foreach { kind =>
      val differing = real.collect {
        case (id, m) if m.kind == kind && m.width != stub(id).width => id }
      assert(differing.nonEmpty,
        s"real $kind decode must not equal the stub formulas on container bytes")
    }
  }

  test("image features sum DECODED pixel samples, reproducibly") {
    val f = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(x => x.media_id -> x.feature.toSeq).toMap
    // independent recomputation of one image row from the pixel formula
    val imgIds = media.filter(col("kind") === "image")
      .select("media_id").as[Long].collect().sorted.take(3)
    imgIds.foreach { id =>
      val len = textLens(id)
      val (w, h) = (16 + len % 64, 16 + (len * 7) % 64)
      val expect = new Array[Float](16)
      var p = 0
      while (p < w * h) {
        expect(p % 16) += ((p * 31L + id * 7L) % 256L).toInt
        p += 1
      }
      assert(f(id) == expect.toSeq, s"pixel-sum mismatch for media_id=$id")
    }
  }

  test("audio features sum DECODED PCM samples, reproducibly") {
    val f = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(x => x.media_id -> x.feature.toSeq).toMap
    // independent recomputation of audio rows from the sample formula
    val audIds = media.filter(col("kind") === "audio")
      .select("media_id").as[Long].collect().sorted.take(3)
    audIds.foreach { id =>
      val nFrames = 64 + (textLens(id) * 5) % 256
      val expect = new Array[Float](16)
      var p = 0
      while (p < nFrames) {
        expect(p % 16) += ((p * 31L + id * 7L) % 256L).toInt
        p += 1
      }
      assert(f(id) == expect.toSeq, s"sample-sum mismatch for media_id=$id")
    }
  }

  test("audio windows aggregate DECODED PCM in fixed windows; stub seam swaps") {
    val win = 50
    val got = Multimodal.audioWindows(media, win)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5), r.getDouble(6)))
      .toMap
    // audio rows only
    assert(got.keys.map(_._1).forall(_ % 3 == 1))
    // independent recomputation of the first 3 audio rows from the fixture
    val audIds = media.filter(col("kind") === "audio")
      .select("media_id").as[Long].collect().sorted.take(3)
    audIds.foreach { id =>
      val nFrames = 64 + (textLens(id) * 5) % 256
      (0 until (nFrames + win - 1) / win).foreach { w =>
        val samples = (w * win until math.min((w + 1) * win, nFrames))
          .map(p => ((p * 31L + id * 7L) % 256L).toInt)
        val sumsq = samples.map(v => v.toLong * v).sum
        val expect = (samples.size, samples.map(_.toLong).sum, sumsq,
          samples.max, math.sqrt(sumsq.toDouble / samples.size))
        assert(got((id, w)) == expect, s"window ($id,$w)")
      }
      // full coverage: no extra windows beyond the frame count
      assert(!got.contains((id, (nFrames + win - 1) / win)))
    }
    // seam: the stub produces its length-arithmetic windows instead
    val stub = Multimodal.audioWindows(media, win, Multimodal.MediaCodecStub)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(stub.keys.map(_._1).forall(_ % 3 == 1))
    assert(stub != got.view.mapValues(_._2).toMap,
      "real decode must not equal the stub formulas")
  }

  test("video features sum DECODED per-frame pixels over the flattened sequence") {
    val f = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(x => x.media_id -> x.feature.toSeq).toMap
    val vidIds = media.filter(col("kind") === "video")
      .select("media_id").as[Long].collect().sorted.take(3)
    vidIds.foreach { id =>
      val len = textLens(id)
      val (w, h, n) = (8 + len % 8, 8 + (len * 3) % 8, 1 + len % 30)
      val expect = new Array[Float](16)
      var s = 0
      while (s < n * w * h) {
        expect(s % 16) += ((s * 31L + id * 7L) % 256L).toInt
        s += 1
      }
      assert(f(id) == expect.toSeq, s"frame-pixel-sum mismatch for media_id=$id")
    }
  }

  test("frame digests decode every 4th frame's raster for real") {
    val digests = Multimodal.frameDigest(media, step = 4).collect()
      .groupBy(_.media_id)
    val vidIds = media.filter(col("kind") === "video")
      .select("media_id").as[Long].collect().toSet
    assert(digests.keySet == vidIds)
    digests.foreach { case (id, rows) =>
      val len = textLens(id)
      val (w, h, n) = (8 + len % 8, 8 + (len * 3) % 8, 1 + len % 30)
      assert(rows.map(_.frame_idx).sorted.toSeq == (0 until n by 4).toSeq)
      rows.foreach { r =>
        val area = w * h
        var expect = 0L
        var p = 0
        while (p < area) {
          expect += ((r.frame_idx.toLong * area + p) * 31L + id * 7L) % 256L
          p += 1
        }
        assert(r.frame_sum == expect,
          s"frame-sum mismatch media_id=$id frame=${r.frame_idx}")
      }
    }
  }

  test("resize plan fits the 224-box preserving aspect, metadata-only") {
    val plan = Multimodal.resizePlan(
      Multimodal.decodeMeta(media).toDF().filter(col("width") > 0), 224)
    val r = plan.collect()
    r.foreach { row =>
      val (w, h) = (row.getAs[Int]("out_width"), row.getAs[Int]("out_height"))
      assert(w <= 224 && h <= 224)
      assert(w == 224 || h == 224) // aspect-preserving fit touches the box
    }
    // the payload column must not appear in the plan's schema
    assert(!plan.schema.fieldNames.contains("content"))
  }

  test("frame sampling emits every 4th frame for video rows only") {
    val meta = Multimodal.decodeMeta(media).toDF()
    val frames = Multimodal.frameSamplePlan(meta, 4)
    val byId = frames.collect()
      .groupBy(_.getAs[Long]("media_id"))
    byId.foreach { case (_, rows) =>
      val n = rows.head.getAs[Int]("n_frames")
      val idx = rows.map(_.getAs[Int]("frame_idx")).sorted
      assert(idx.toSeq == (0 until n by 4).toSeq)
    }
    val videoIds = meta.filter(col("kind") === "video")
      .select("media_id").as[Long].collect().toSet
    assert(byId.keySet == videoIds)
  }

  test("feature extraction: fixed dim, deterministic, distributed (no driver bytes)") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect()
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(f1.forall(_.feature.length == 16))
    val m1 = f1.map(f => f.media_id -> f.feature.toSeq).toMap
    val m2 = f2.map(f => f.media_id -> f.feature.toSeq).toMap
    assert(m1 == m2)
    // different payloads -> different features (sanity)
    assert(m1.values.toSet.size > 1)
  }
}
