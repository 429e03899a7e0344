package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly counts match the batch aggregation (stream/batch parity)") {
    val batchEvents = Tables.events(spark, sf0001)
    // write the (nanos-converted) events out so the file streaming source
    // reads the exact same rows with a stream-compatible schema
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.hourlyCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val streamed = spark.table("hourly_out")
      .select("hour", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = EventStream.hourlyCounts(spark.read.parquet(dir))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("flatMapGroupsWithState sessionize emits gap-separated sessions on timeout") {
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val events = Seq(
      EventStream.Event(1L, ts(0), 7L, "click", 1.0),
      EventStream.Event(2L, ts(5), 7L, "click", 1.0),
      EventStream.Event(3L, ts(90), 7L, "view", 1.0), // > 30 min gap -> new session
      EventStream.Event(4L, ts(0), 8L, "click", 1.0),
    ).toDS()

    val sessions = EventStream.sessionize(events, gapMinutes = 30)
    // batch-style drive: feed all rows in one micro-batch; sessions closed
    // by gaps WITHIN the batch are emitted immediately (open ones wait for
    // the processing-time timeout, which a one-shot test doesn't reach)
    val dirIn = java.nio.file.Files.createTempDirectory("graft_sess_in").toString
    events.write.mode("overwrite").parquet(dirIn)
    val stream = spark.readStream.schema(events.schema).parquet(dirIn)
      .as[EventStream.Event]
    // NOTE: a processing-time-timeout stateful query never self-terminates
    // (it keeps scheduling batches to evaluate timeouts) — poll the sink
    // for the expected in-batch-closed session, then stop explicitly.
    val q = EventStream.sessionize(stream, gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    val deadline = System.nanoTime() + 60L * 1000000000L
    def sink() = spark.table("sess_out").as[EventStream.Session].collect()
    var closed = sink()
    while (closed.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(250); closed = sink()
    }
    q.stop()
    // user 7's first session (2 events, gap-closed inside the batch)
    assert(closed.exists(s => s.user_id == 7L && s.n_events == 2))
  }

  test("sessionize across micro-batches: out-of-order merge, then timeout emission") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(ms: Long) = new Timestamp(1700000000000L + ms)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    // NOTE: no processAllAvailable() anywhere — with ProcessingTimeTimeout
    // the engine keeps scheduling (empty) batches to evaluate timeouts, so
    // the no-new-data latch processAllAvailable waits on never settles and
    // the call hangs. Drive by addData + sleep, observe via the sink, stop
    // explicitly (same pattern as the single-batch test above).
    val q = EventStream.sessionizeMs(input.toDS(), gapMs = 5000)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_mb").start()
    def sink() = spark.table("sess_mb").as[EventStream.Session].collect()
    try {
      // batch 1: user 7 opens a session [0, 1000]
      input.addData(
        EventStream.Event(1L, ts(0), 7L, "c", 1.0),
        EventStream.Event(2L, ts(1000), 7L, "c", 1.0))
      Thread.sleep(1500) // trigger-0 batches spin continuously: consumed now
      assert(sink().isEmpty) // still open — nothing emitted
      // batch 2: OUT-OF-ORDER event at 500 (inside the open envelope,
      // earlier than the session's last) must merge, not reset or close;
      // 2500 extends the session forward
      input.addData(
        EventStream.Event(3L, ts(500), 7L, "c", 1.0),
        EventStream.Event(4L, ts(2500), 7L, "c", 1.0))
      Thread.sleep(1500)
      assert(sink().isEmpty)
      // quiet period past the processing-time timeout, then poll: the
      // spinning empty batches evaluate the timeout and emit the session
      val deadline = System.nanoTime() + 60L * 1000000000L
      var out = sink()
      while (!out.exists(_.user_id == 7L) && System.nanoTime() < deadline) {
        Thread.sleep(250); out = sink()
      }
      val s7 = out.filter(_.user_id == 7L)
      assert(s7.length == 1)
      // all four events in ONE session with true event-time extent
      assert(s7.head.n_events == 4)
      assert(s7.head.session_start == ts(0) && s7.head.session_end == ts(2500))
    } finally q.stop()
  }

  test("event-time-timeout sessionize: watermark-driven eviction, replay-deterministic") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(ms: Long) = new Timestamp(1700000000000L + ms)
    val input = MemoryStream[EventStream.Event]
    // watermark delay 0: the watermark is max event time seen; gap 5 s
    val sessions = EventStream.sessionizeEventTime(
      input.toDS().withWatermark("ts", "0 seconds"), gapMs = 5000)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_et").start()
    def sink() = spark.table("sess_et").as[EventStream.Session].collect()
    try {
      // batch 1: user 7 opens [0, 1000]
      input.addData(
        EventStream.Event(1L, ts(0), 7L, "c", 1.0),
        EventStream.Event(2L, ts(1000), 7L, "c", 1.0))
      q.processAllAvailable()
      assert(sink().isEmpty) // watermark at 1000 < last+gap → still open
      // batch 2: another user's event far in the future advances the
      // watermark past 7's last+gap → 7's session must evict via the
      // EVENT clock (no wall-time waiting), emitted on the next trigger
      input.addData(EventStream.Event(3L, ts(60000), 8L, "c", 1.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(4L, ts(61000), 8L, "c", 1.0))
      q.processAllAvailable()
      val s7 = sink().filter(_.user_id == 7L)
      assert(s7.length == 1)
      assert(s7.head.n_events == 2)
      assert(s7.head.session_start == ts(0) && s7.head.session_end == ts(1000))
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_in").toString
    val base = Tables.events(spark, sf0001).limit(100)
    base.union(base).write.mode("overwrite").parquet(dir) // every row twice
    val schema = spark.read.parquet(dir).schema
    val q = EventStream.dedupStream(
      spark.readStream.schema(schema).parquet(dir), "event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table("dedup_out")
    assert(out.count() == 100)
    assert(out.select("event_id").distinct().count() == 100)
  }

  test("stream -> dynamic partitioned sink: full validated write path per micro-batch") {
    import graft.sink._
    val inDir = java.nio.file.Files.createTempDirectory("graft_ss_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_ss_out").toString
    val batchEvents = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    batchEvents.write.mode("overwrite").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    val q = EventStream.writePartitionedStream(
      spark.readStream.schema(schema).parquet(inDir), outDir,
      SinkConfig(ParquetFormat, Seq("event_type"), Some("snappy"),
        runtimeNullCheck = true))
    q.awaitTermination(60000)
    val back = PartitionedSink.readBack(spark, outDir)
    assert(back.count() == batchEvents.count())
    val parts = PartitionCatalog.list(spark, outDir, 1).map(_("event_type")).toSet
    val expected = batchEvents.select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(parts == expected)
  }

  test("streaming entity linkage matches the batch fuzzyLink per micro-batch") {
    import graft.ops.EntityResolution
    val canonical = Seq(
      (10L, "Acme Corporation", 0), (11L, "Acme Corp", 0),
      (12L, "Globex Industries", 0), (13L, "Initech LLC", 1))
      .toDF("c_id", "c_name", "block")
    val incoming = Seq(
      (100L, "Acme Corportion", 0), // typo'd Acme — links to 10/11
      (101L, "Initech L.L.C.", 1))  // links to 13
      .toDF("p_id", "p_name", "block")
    val inDir = java.nio.file.Files.createTempDirectory("graft_linkstream_in").toString
    incoming.write.mode("overwrite").parquet(inDir)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val q = EventStream.linkStream(
      spark.readStream.schema(incoming.schema).parquet(inDir),
      canonical, k = 1,
      links => collected ++= links.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))))
    q.awaitTermination(60000)
    val batch = EntityResolution.fuzzyLink(incoming, canonical, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(collected.toSeq.sorted == batch.sorted)
    // block 1's probe resolves to Initech, never to a block-0 entity
    assert(collected.exists(l => l._1 == 101L && l._2 == 13L))
  }

  test("streaming incremental near-dup matches equal the batch operator's") {
    import graft.ops.Dedup
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark catalyst optimizer rules"),
    ).toDF("doc_id", "text")
    val newBatch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "entirely novel text that matches nothing in the historical set"),
    ).toDF("doc_id", "text")
    val corpusSigs = Dedup.minhashSignatures(corpus, "doc_id", "text")

    val inDir = java.nio.file.Files.createTempDirectory("graft_incdedup_in").toString
    newBatch.write.mode("overwrite").parquet(inDir)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = EventStream.incrementalDedupStream(
      spark.readStream.schema(newBatch.schema).parquet(inDir),
      "doc_id", "text", corpusSigs,
      m => collected ++= m.collect().map(r => (r.getLong(0), r.getLong(1))))
    q.awaitTermination(60000)

    val batchResult = Dedup.incrementalMinhashMatches(
      newBatch, "doc_id", "text", corpusSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(collected.toSeq.sorted == batchResult.sorted)
    assert(collected.toSeq == Seq((100L, 1L))) // dup found, novel doc clean
  }

  test("streaming decontamination guard flags the batch operator's exact spans") {
    import graft.ops.Dedup
    val bench = Seq(
      (100L, "what is the capital of france paris is the answer")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "prefix words what is the capital of france and trailing text"),
      (2L, "clean document with no benchmark overlap whatsoever in it at all"),
    ).toDF("doc_id", "text")

    val inDir = java.nio.file.Files.createTempDirectory("graft_decon_in").toString
    incoming.write.mode("overwrite").parquet(inDir)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    val q = EventStream.decontaminationStream(
      spark.readStream.schema(incoming.schema).parquet(inDir),
      "doc_id", "text", bench,
      spans => collected ++= spans.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))),
      k = 5)
    q.awaitTermination(60000)

    val batchResult = Dedup.benchmarkSpanContamination(
      incoming, bench, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(collected.toSeq.sorted == batchResult.sorted)
    // the leaked 6-token run 'what is the capital of france' at positions
    // 2..7 is the one contaminated span; the clean doc passes
    assert(collected.toSeq == Seq((1L, 2, 7)))
  }

  test("streaming classification gate scores batches exactly like the batch op") {
    import graft.ops.TextAnalysis
    // fit once on the real corpus (the train-once posture)
    val docs = graft.Tables(spark, sf0001, "documents")
    val model = TextAnalysis.naiveBayesFit(
      docs.filter(col("doc_id") % 10 < 8), "text", "lang")

    val incoming = docs.filter(col("doc_id") >= 400).select("doc_id", "text")
    val inDir = java.nio.file.Files.createTempDirectory("graft_clf_in").toString
    incoming.write.mode("overwrite").parquet(inDir)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
    val q = EventStream.classifyStream(
      spark.readStream.schema(incoming.schema).parquet(inDir),
      "doc_id", "text", model,
      scored => collected ++= scored.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))))
    q.awaitTermination(60000)

    val batchResult = TextAnalysis.naiveBayesScore(
      incoming, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(collected.nonEmpty)
    assert(collected.toSeq.sorted == batchResult.sorted)
    // the model actually discriminates: more than one class appears
    assert(collected.map(_._2).toSet.size > 1)
  }

  test("watermark closes windows in append mode and drops late data") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, t: String) = EventStream.Event(
      id, Timestamp.valueOf(t), 1L, "click", 1.0)
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.hourlyCounts(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      // two events in the 10:00 window; watermark (max ts - 10 min) stays
      // inside the window, nothing emits in append mode yet
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:30:00"))
      q.processAllAvailable()
      assert(spark.table("wm_out").count() == 0)
      // an event at 12:00 pushes the watermark past 11:00 → the 10:00
      // window closes and emits exactly once
      input.addData(ev(3, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      val closed = spark.table("wm_out")
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      assert(closed == Map("2024-01-01 10:00:00" -> 2L))
      // a LATE event for the already-closed window (behind the watermark)
      // must be dropped — no duplicate or updated row for 10:00
      input.addData(ev(4, "2024-01-01 10:45:00"))
      q.processAllAvailable()
      val after = spark.table("wm_out")
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      assert(after == Map("2024-01-01 10:00:00" -> 2L))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch attribution join") {
    val events = Tables.events(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj_in").toString
    events.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    def streamSide(t: String) =
      spark.readStream.schema(schema).parquet(dir)
        .filter(col("event_type") === t)

    val q = EventStream.attributionJoin(streamSide("view"), streamSide("click"))
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("attr_out")
      .select("user_id", "click_id", "view_id", "delta_s")
      .collect().map(_.toSeq).toSet
    val static = events
    val batch = EventStream.attributionJoin(
      static.filter(col("event_type") === "view"),
      static.filter(col("event_type") === "click"))
      .select("user_id", "click_id", "view_id", "delta_s")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("batch sessionize: exact session boundaries at the 30-min gap") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:29:59"), 7L),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 7L), // 30:01 gap -> new
      (4L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 8L),
    ).toDF("event_id", "ts", "user_id")
    val sessions = EventStream.sessionizeBatch(df, gapMinutes = 30)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("n_events"))).toSet
    assert(sessions == Set((7L, 1L, 2L), (7L, 2L, 1L), (8L, 1L, 1L)))
  }

  test("mergeStream applies CDC micro-batches to the partitioned dataset") {
    import graft.sink.{ParquetFormat, PartitionedSink, SinkConfig}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val cfg = SinkConfig(ParquetFormat, Seq("grp"), runtimeNullCheck = true)
    val out = java.nio.file.Files.createTempDirectory("graft_merge_stream")
    PartitionedSink.write(
      Seq((1L, "a", "A"), (2L, "b", "A"), (3L, "c", "B"))
        .toDF("id", "payload", "grp"),
      out.toString, cfg)

    // (id, payload, grp, del)
    val input = MemoryStream[(Long, String, String, Boolean)]
    val q = EventStream.mergeStream(
      input.toDF().toDF("id", "payload", "grp", "del"),
      out.toString, Seq("id"), cfg, deleteCol = Some("del"))
    try {
      // batch 1: update id 1 in place, move id 3 from B to A
      input.addData((1L, "a2", "A", false), (3L, "c2", "A", false))
      q.processAllAvailable()
      val afterB1 = PartitionedSink.readBack(spark, out.toString)
        .select("id", "payload", "grp").as[(Long, String, String)]
        .collect().toSet
      assert(afterB1 == Set((1L, "a2", "A"), (2L, "b", "A"), (3L, "c2", "A")))
      assert(!java.nio.file.Files.exists(out.resolve("grp=B")),
        "partition B emptied by the move — dir must be dropped")

      // batch 2: delete id 2, insert id 9 into C
      input.addData((2L, "", "A", true), (9L, "i", "C", false))
      q.processAllAvailable()
      val afterB2 = PartitionedSink.readBack(spark, out.toString)
        .select("id", "payload", "grp").as[(Long, String, String)]
        .collect().toSet
      assert(afterB2 == Set((1L, "a2", "A"), (3L, "c2", "A"), (9L, "i", "C")))
    } finally q.stop()
  }

  test("streaming skew telemetry matches the batch profile, batch_id stamped") {
    import graft.ops.Relational
    val incoming = (Seq.fill(30)(7L) ++ Seq.fill(10)(8L) ++ Seq(1L, 2L, 3L))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("row_id", "user_key")
    val inDir = java.nio.file.Files.createTempDirectory("graft_skew_in").toString
    incoming.write.mode("overwrite").parquet(inDir)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Long)]
    val q = EventStream.skewStream(
      spark.readStream.schema(incoming.schema).parquet(inDir),
      "user_key", topN = 2,
      prof => collected ++= prof.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))))
    q.awaitTermination(60000)
    val batch = Relational.keySkewProfile(incoming, "user_key", topN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(collected.map(t => (t._1, t._2, t._3)).toSeq.sorted == batch.sorted)
    // the hot key leads and its share is exact
    assert(collected.head._1 == 7L || collected.map(_._1).contains(7L))
    assert(collected.find(_._1 == 7L).get._3 == BigDecimal(30.0 / 43)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
