package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fakeMediaFromDocs(
    Tables(spark, sf0001, "documents"), "doc_id", "text")

  test("media wrapping: binary payload, kind cycles by id") {
    val rows = media.filter(col("media_id") < 6).collect().sortBy(_.media_id)
    assert(rows.map(_.kind).toSeq ==
      Seq("image", "audio", "video", "image", "audio", "video"))
    assert(rows.forall(_.content.nonEmpty))
  }

  test("decode stub produces schema-complete deterministic metadata") {
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length == media.count())
    meta.foreach { m =>
      assert(m.width == 16 + m.byte_len % 64)
      assert(m.height == 16 + (m.byte_len * 7) % 64)
      assert(m.channels == 3)
      if (m.kind == "audio") assert(m.sample_rate == 16000) else assert(m.sample_rate == 0)
      if (m.kind == "video") assert(m.n_frames == 1 + m.byte_len % 30)
      else assert(m.n_frames == 1)
    }
    // deterministic across evaluations
    val again = Multimodal.decodeMeta(media).collect()
    assert(meta.sortBy(_.media_id).sameElements(again.sortBy(_.media_id)))
  }

  test("resize plan fits the 224-box preserving aspect, metadata-only") {
    val plan = Multimodal.resizePlan(Multimodal.decodeMeta(media).toDF(), 224)
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
