package graft

import graft.ops.Multimodal
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Multimodal-column and event-stream queries. All three media lanes are
 * REAL JDK-codec decodes ([[graft.ops.Multimodal.JdkMediaCodec]]): image
 * rows carry synthesized PNG payloads decoded through `javax.imageio`,
 * audio rows synthesized WAV payloads decoded through
 * `javax.sound.sampled`, and video rows synthesized multi-frame animated
 * GIF payloads decoded frame-by-frame through the `javax.imageio` GIF
 * sequence reader. All lanes stay DuckDB-expressible — PNG
 * dimensions/pixels, WAV frame counts/samples, and GIF frame
 * counts/per-frame rasters are synthesized from SQL-derivable formulas
 * (`Multimodal.synthesizePng` / `synthesizeWav` / `synthesizeGif`), so
 * the oracle re-predicts what the real decodes must read back out of the
 * containers. `byte_len` (container size — an encoder property, not
 * SQL-predictable) is projected out of the oracle queries and
 * spec-asserted in `MultimodalSpec` instead.
 */
object MmStreamQueries {

  /** Synthesized media fixture cached as parquet per corpus dir per JVM
    * (the persisted-index precedent: iteration 1 carries the build, warm
    * iterations price the OPERATOR): real media payloads arrive as stored
    * binary columns, not synthesized from text, so reading them back from
    * parquet is the production shape — the per-iteration cost is the PNG
    * DECODE itself, which is the thing the mm_* queries exist to
    * exercise. Temp trees are reclaimed by a shutdown hook. */
  private val mediaCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    mediaCache.values.forEach { p =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(p))
    }))

  private def media(s: SparkSession, dir: String): org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    val p = mediaCache.computeIfAbsent(dir, _ => {
      val t = java.nio.file.Files.createTempDirectory("graft_media").toString
      Multimodal.fakeMediaFromDocs(Tables(s, dir, "documents"), "doc_id", "text")
        .write.mode("overwrite").parquet(t)
      t
    })
    import s.implicits._
    s.read.parquet(p).as[Multimodal.MediaRow]
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> ((s, dir) =>
      Multimodal.decodeMeta(media(s, dir)).toDF().drop("byte_len")),

    // visual lanes only: audio metadata has no raster (width/height 0), so
    // an aspect-fit over it is undefined — filter on the decoded width
    "mm_resize_plan" -> ((s, dir) =>
      Multimodal.resizePlan(
        Multimodal.decodeMeta(media(s, dir)).toDF().filter(col("width") > 0), 224)
        .select("media_id", "width", "height", "out_width", "out_height")),

    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.frameSamplePlan(Multimodal.decodeMeta(media(s, dir)).toDF(), 4)),

    // REAL frame extraction: decode every 4th frame of each video row's
    // GIF sequence and digest its raster (mm_frame_sample above plans the
    // same indices without touching payload bytes)
    "mm_frame_digest" -> ((s, dir) =>
      Multimodal.frameDigest(media(s, dir), step = 4).toDF()),

    // REAL windowed audio DSP: decode each audio row's WAV and aggregate
    // its PCM samples in 50-frame windows (sum / sumsq / peak exact ints,
    // RMS = two correctly-rounded IEEE ops) — the silence-trim/clipping
    // envelope an audio curation pipeline filters on; the oracle
    // re-synthesizes every sample from the fixture formula
    "mm_audio_windows" -> ((s, dir) =>
      Multimodal.audioWindows(media(s, dir), win = 50)),

    // digest projection: the raw array<float> API stays (extractFeatures);
    // the registered query emits an oracle-checkable md5 of the exact
    // integer lanes — generic comparators can't sort an array column
    "mm_features" -> ((s, dir) =>
      Multimodal.featureDigest(
        Multimodal.extractFeatures(media(s, dir), dim = 16).toDF())),

    "events_sessionize" -> ((s, dir) =>
      EventStream.sessionizeBatch(Tables.events(s, dir), gapMinutes = 30)),

    // media similarity search: cosine top-k over the extracted feature
    // vectors (decode → embed → search, the full multimodal retrieval
    // pipeline; exact-integer stub lanes keep it oracle-checkable)
    "mm_similar_media" -> ((s, dir) => {
      // materialize the decode→embed pass once: both searcher sides read
      // the same features, and localCheckpoint cuts the lineage without a
      // cache entry to leak (query entries can't unpersist lazily)
      val f = Multimodal.extractFeatures(media(s, dir), dim = 16)
        .toDF().localCheckpoint()
      graft.ops.Similarity.bruteForceTopK(
        f.filter(col("media_id") < 10), f, k = 5,
        idCol = "media_id", vecCol = "feature")
    }),

    // the SCALE path of the same pipeline: decode → embed → quantized-IVF
    // retrieval (int8 codes scored inside probe cells, bounded-heap
    // ranking — no cross join; mm_similar_media above stays as the
    // labeled exact baseline). The whole composition keeps a
    // full-algorithm oracle because the stub feature lanes are exact
    // integers and every IVF stage is deterministic.
    "mm_similar_media_ivf" -> ((s, dir) => {
      // exact power-of-two pre-scale (2^-16): image-lane pixel sums reach
      // ~1e5, so reconstructed int8 dots would sit at ~3.5e9 — where
      // round(sim, 6) is finer than the double ulp and the rounded score
      // diverges between engines. Dividing by 65536 is exact in float32
      // and double alike, so every downstream value (codes, cells, sims)
      // is the unscaled one scaled bit-exactly into the O(1) range where
      // rounded-score ranking is portable. Standard ANN practice anyway:
      // bounded-magnitude features before quantized retrieval.
      val f = Multimodal.extractFeatures(media(s, dir), dim = 16)
        .toDF()
        .withColumn("feature", transform(col("feature"), x => x / lit(65536.0f)))
        .localCheckpoint()
      graft.ops.Similarity.ivfQuantizedTopK(
        f.filter(col("media_id") < 10), f, k = 5, nCells = 16, nProbe = 4,
        idCol = "media_id", vecCol = "feature")
    }),
  )

  // Per-kind metadata, each branch re-predicting what the REAL decode
  // reads out of its payload: image width/height come from synthesizePng's
  // text-length formulas (read back from the PNG raster), audio
  // sample_rate/n_frames from synthesizeWav's (read back from the WAV
  // container; width/height 0, mono), video width/height/n_frames from
  // synthesizeGif's (read back from the GIF frame-0 header and the
  // container's image-sequence length; 1 band — palette-indexed frames).
  private val metaSql =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CASE WHEN doc_id % 3 = 0 THEN 16 + octet_length(encode(text)) % 64
      |       WHEN doc_id % 3 = 2 THEN 8 + octet_length(encode(text)) % 8 ELSE 0 END AS width,
      |  CASE WHEN doc_id % 3 = 0 THEN 16 + (octet_length(encode(text)) * 7) % 64
      |       WHEN doc_id % 3 = 2 THEN 8 + (octet_length(encode(text)) * 3) % 8 ELSE 0 END AS height,
      |  CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS channels,
      |  CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS sample_rate,
      |  CASE WHEN doc_id % 3 = 1 THEN 64 + (octet_length(encode(text)) * 5) % 256
      |       WHEN doc_id % 3 = 2 THEN 1 + octet_length(encode(text)) % 30 ELSE 1 END AS n_frames
      |FROM documents""".stripMargin

  // Exact-integer feature lanes, branched by kind: image rows re-predict
  // the decoded band-0 pixel sums of the synthesized PNG (pixel p carries
  // (p*31 + id*7) % 256 over a w×h raster sized from the text length);
  // audio rows the decoded PCM sample sums of the synthesized WAV (frame p
  // carries the same (p*31 + id*7) % 256 over n_frames sized from the text
  // length); video rows the decoded per-frame gray sums of the synthesized
  // GIF (GLOBAL space-time sample s over n_frames·w·h carries the same
  // (s*31 + id*7) % 256 — the flattened frame sequence).
  // payloads are sized from the text's BYTE length (synthesizePng/Wav/Gif
  // take UTF-8 bytes), so every branch uses octet_length like metaSql —
  // length(text) would silently diverge on non-ASCII documents
  private val laneListSql =
    """CASE WHEN doc_id % 3 = 0 THEN
      |    [coalesce(list_sum([(p*31 + doc_id*7) % 256 for p in
      |       range(j, (16 + octet_length(encode(text)) % 64) * (16 + (octet_length(encode(text)) * 7) % 64), 16)]), 0)
      |     for j in range(0, 16)]
      |  WHEN doc_id % 3 = 1 THEN
      |    [coalesce(list_sum([(p*31 + doc_id*7) % 256 for p in
      |       range(j, 64 + (octet_length(encode(text)) * 5) % 256, 16)]), 0)
      |     for j in range(0, 16)]
      |  ELSE
      |    [coalesce(list_sum([(p*31 + doc_id*7) % 256 for p in
      |       range(j, (1 + octet_length(encode(text)) % 30)
      |                * (8 + octet_length(encode(text)) % 8)
      |                * (8 + (octet_length(encode(text)) * 3) % 8), 16)]), 0)
      |     for j in range(0, 16)]
      |  END""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_decode_meta" -> metaSql,

    // the WAV fixture formula re-evaluated sample-by-sample: nFrames =
    // 64 + octet_length*5 % 256, sample p = (p*31 + id*7) % 256, grouped
    // into 50-frame windows; sums cast back to BIGINT (DuckDB sum() is
    // HUGEINT), rms = sqrt(sumsq/n) with no rounding (both ops are
    // correctly-rounded IEEE on identical integer inputs)
    "mm_audio_windows" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    64 + (octet_length(encode(text)) * 5) % 256 AS nf
        |  FROM documents WHERE doc_id % 3 = 1
        |), s AS (
        |  SELECT doc_id, p, (p*31 + doc_id*7) % 256 AS v, p // 50 AS w
        |  FROM a, unnest(range(0, nf)) t(p)
        |)
        |SELECT doc_id AS media_id, cast(w as int) AS window_idx,
        |  cast(count(*) as int) AS n_samples,
        |  cast(sum(v) as bigint) AS sample_sum,
        |  cast(sum(v*v) as bigint) AS sample_sumsq,
        |  cast(max(v) as int) AS peak,
        |  sqrt(cast(sum(v*v) as double) / count(*)) AS rms
        |FROM s GROUP BY doc_id, w""".stripMargin,

    // exact integer lanes (see laneListSql), so the digest is reproducible
    // from SQL with no FP hazard — for image rows this hash-checks the
    // REAL javax.imageio decode pixel-by-pixel
    "mm_features" ->
      s"""SELECT doc_id AS media_id,
        |  md5(array_to_string($laneListSql, ',')) AS feature_digest
        |FROM documents""".stripMargin,

    // same exact-integer lanes as mm_features, cast to DOUBLE[] — cosine
    // is then the bit-identical sequential fold (dedup_embedding_pairs
    // precedent); ranking by round(sim,6) + id tiebreak
    "mm_similar_media" ->
      s"""WITH f AS (
        |  SELECT doc_id AS media_id,
        |    list_transform($laneListSql, x -> cast(x as double)) AS e
        |  FROM documents
        |), sims AS (
        |  SELECT q.media_id AS q_id, c.media_id AS n_id,
        |    list_cosine_similarity(q.e, c.e) AS sim
        |  FROM f q JOIN f c ON q.media_id != c.media_id
        |  WHERE q.media_id < 10
        |), ranked AS (
        |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
        |  FROM sims)
        |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin,

    // the IvfInt8Sql pipeline (OpsQueries precedent) over the stub
    // feature lanes: same md5-ordered centroids, argmin cells, max-abs
    // int8 codes, exact integer dots, round(sim,6)+id ranking
    "mm_similar_media_ivf" ->
      s"""WITH v AS (
        |  SELECT doc_id AS vec_id,
        |    list_transform($laneListSql, x -> cast(x as double) / 65536.0) AS e
        |  FROM documents
        |), cent AS (
        |  SELECT row_number() OVER (ORDER BY md5(cast(vec_id as varchar))) - 1 AS cell, e
        |  FROM v ORDER BY md5(cast(vec_id as varchar)) LIMIT 16
        |), sc AS (
        |  SELECT vec_id, e,
        |    list_max(list_transform(e, x -> abs(x))) AS scale
        |  FROM v
        |), qz AS (
        |  SELECT vec_id, e, scale,
        |    CASE WHEN scale = 0.0
        |      THEN list_transform(e, x -> CAST(0 AS DOUBLE))
        |      ELSE list_transform(e, x -> floor((x * 127.0) / scale + 0.5))
        |    END AS qv
        |  FROM sc
        |), cassign AS (
        |  SELECT vec_id, scale, qv, cell FROM (
        |    SELECT n.vec_id, n.scale, n.qv, c.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY -(list_inner_product(n.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM qz n CROSS JOIN cent c) WHERE r = 1
        |), qprobe AS (
        |  SELECT vec_id AS q_id, scale AS q_scale, qv AS q_qv, cell FROM (
        |    SELECT q.vec_id, q.scale, q.qv, c.cell,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY -(list_inner_product(q.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM qz q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE r <= 4
        |), sims AS (
        |  SELECT p.q_id, a.vec_id AS n_id,
        |    ((list_dot_product(p.q_qv, a.qv) * p.q_scale) * a.scale) / 16129.0 AS sim
        |  FROM qprobe p JOIN cassign a USING (cell)
        |  WHERE p.q_id != a.vec_id
        |), ranked AS (
        |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
        |  FROM sims)
        |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin,

    "mm_resize_plan" ->
      s"""WITH meta AS ($metaSql)
        |SELECT media_id, width, height,
        |  cast(round(width * least(224.0 / width, 224.0 / height)) as int) AS out_width,
        |  cast(round(height * least(224.0 / width, 224.0 / height)) as int) AS out_height
        |FROM meta WHERE width > 0""".stripMargin,

    "mm_frame_sample" ->
      s"""WITH meta AS ($metaSql)
        |SELECT media_id, n_frames, unnest(range(0, n_frames, 4)) AS frame_idx
        |FROM meta WHERE kind = 'video'""".stripMargin,

    // re-predicts each sampled DECODED frame's gray sum: frame f of video
    // row id spans global samples [f·w·h, (f+1)·w·h), sample s carrying
    // (s*31 + id*7) % 256 — what the real GIF-sequence decode must read
    "mm_frame_digest" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id,
        |    (8 + octet_length(encode(text)) % 8)
        |      * (8 + (octet_length(encode(text)) * 3) % 8) AS area,
        |    1 + octet_length(encode(text)) % 30 AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2
        |), fr AS (
        |  SELECT media_id, area, unnest(range(0, n_frames, 4)) AS frame_idx
        |  FROM v)
        |SELECT media_id, cast(frame_idx as int) AS frame_idx,
        |  cast(list_sum([(s*31 + media_id*7) % 256
        |    for s in range(frame_idx * area, (frame_idx + 1) * area)]) as bigint)
        |    AS frame_sum
        |FROM fr""".stripMargin,

    "events_sessionize" ->
      """WITH b AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR cast(floor(epoch(ts)) as bigint)
        |         - cast(floor(epoch(lag(ts) OVER w)) as bigint) > 1800
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    cast(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) as bigint) AS session_seq
        |  FROM b)
        |SELECT user_id, session_seq,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, session_seq""".stripMargin,
  )
}
