package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/**
 * Structured Streaming surface over the `events` table shape
 * (event_id, ts timestamp, user_id, event_type, value, props).
 *
 * Batch/stream parity: [[hourlyCounts]] produces the same result as the
 * batch `q6_events_window` aggregation when fed the same rows; the
 * ScalaTest suite drives both from the parquet fixture and compares.
 * Watermarks bound state: hourly windows close 10 minutes after event
 * time passes; session state times out per key. At scale, state lives in
 * the state store partitioned by grouping key — no driver accumulation.
 */
object EventStream {

  /** Watermarked tumbling-window counts per event type (streaming twin of
    * the batch q6_events_window query). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Stream → dynamic-partitioned sink: the reference's core write surface
    * driven by Structured Streaming via foreachBatch — each micro-batch
    * goes through the full validated PartitionedSink path (stringify+trim,
    * guards, codec) with CREATE_OR_APPEND semantics. Returns the started
    * query; callers own termination. */
  def writePartitionedStream(
      events: DataFrame, path: String,
      cfg: graft.sink.SinkConfig): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sink.PartitionedSink.write(batch.toDF(), path, cfg): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Streaming exact dedup by id with bounded state: duplicates arriving
    * within the watermark horizon are dropped; state for ids older than
    * the watermark is evicted (the streaming twin of [[Dedup.exact]] —
    * unbounded-state `dropDuplicates` would OOM on an infinite stream). */
  def dedupStream(events: DataFrame, idCol: String,
      watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCol)

  /**
   * Streaming incremental NEAR-dup detection — the production ingest shape:
   * each micro-batch of new documents is MinHash-signed (row-local native
   * expression) and its LSH bands joined against the STATIC historical band
   * index via the full batch operator
   * ([[graft.ops.Dedup.incrementalMinhashMatches]]). Run through
   * `foreachBatch`, the pipeline is STATELESS across batches: no streaming
   * state grows with the corpus — the historical signatures are the only
   * large side and they stay at rest (at scale: a bucketed table keyed by
   * band hash, refreshed out-of-band as accepted docs are signed).
   * `onMatches` receives each batch's (new_id, old_id, est_jaccard) result.
   */
  def incrementalDedupStream(
      newDocs: DataFrame, idCol: String, textCol: String,
      corpusSigs: DataFrame,
      onMatches: DataFrame => Unit,
      numHashes: Int = 64, shingleLen: Int = 5,
      bands: Int = 16, threshold: Double = 0.7): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        onMatches(graft.ops.Dedup.incrementalMinhashMatches(
          batch.toDF(), idCol, textCol, corpusSigs,
          numHashes, shingleLen, bands, threshold))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /**
   * Streaming entity linkage at ingestion: every micro-batch of incoming
   * records fuzzy-links against a FIXED canonical entity table — the
   * "resolve before you write" step of a CDC/crawl intake pipeline, and
   * the streaming twin of the batch `er_link_*` queries. Stateless
   * foreachBatch (the incremental-dedup posture: no state store — the
   * canonical table IS the state): per batch, a blocking-key equi-join +
   * bounded-heap Jaro–Winkler ranking, so batch cost is
   * Σ |block(record)|, never the canonical-table size.
   *
   * Inputs use [[graft.ops.EntityResolution.fuzzyLink]]'s standard
   * shapes: records (p_id, p_name, block), canonical (c_id, c_name,
   * block). `onLinks` receives each batch's (p_id, c_id, jw_r, rnk).
   */
  def linkStream(
      newRecords: DataFrame, canonical: DataFrame, k: Int,
      onLinks: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    newRecords.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        onLinks(graft.ops.EntityResolution.fuzzyLink(batch.toDF(), canonical, k))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /**
   * Streaming key-skew telemetry: per micro-batch, the
   * [[graft.ops.Relational.keySkewProfile]] of the incoming rows —
   * the LIVE feed for the sink layer's measure-then-rebalance loop
   * (`SinkConfig.adaptiveRowsPerFile` salt widths, hot-join salting):
   * a key that goes hot mid-ingestion shows up in the next batch's
   * profile instead of the next nightly sweep. Stateless foreachBatch
   * (per-batch profile, batch_id stamped — trend assembly is the
   * consumer's one aggregation over the tiny emitted tables; no
   * streaming state store for an unbounded key domain).
   *
   * `onProfile` receives (key, n_rows, share_r, batch_id) per batch —
   * route it to the partition-stats table the adaptive writers read.
   */
  def skewStream(
      rows: DataFrame, keyCol: String, topN: Int,
      onProfile: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        onProfile(graft.ops.Relational.keySkewProfile(batch.toDF(), keyCol, topN)
          .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId)))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /**
   * Streaming eval-decontamination guard: every micro-batch of incoming
   * documents is span-checked against a FIXED benchmark set
   * ([[graft.ops.Dedup.benchmarkSpanContamination]]) before admission —
   * the ingestion-time twin of the batch `dedup_decontaminate_spans`
   * query, and the gate a training-data pipeline runs where documents
   * ENTER the corpus rather than as a later sweep. Stateless foreachBatch
   * (the incremental-dedup posture: no streaming state store — the
   * benchmark gram set is the state, and it is static): per batch, the
   * bounded benchmark grams broadcast and the batch probes by semi-join,
   * so a batch never shuffles for membership.
   *
   * `onContaminated` receives each batch's contaminated-span table
   * (id, span_start, span_end, n_grams) — route it to quarantine,
   * excision ([[graft.ops.Dedup.stripRepeatedSpans]]'s span semantics),
   * or a drop list.
   */
  def decontaminationStream(
      newDocs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame,
      onContaminated: DataFrame => Unit,
      k: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        onContaminated(graft.ops.Dedup.benchmarkSpanContamination(
          batch.toDF(), benchmark, idCol, textCol, k))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /**
   * Streaming CDC apply: each micro-batch of change rows (upserts +
   * deletes, the [[graft.sink.PartitionedSink.mergeUpsert]] contract) is
   * MERGED into the partitioned dataset at `path` — the ingestion-time
   * loop that keeps a 100 TB partitioned corpus current from a change
   * feed without ever rewriting untouched partitions.
   *
   * Exactly-once posture: foreachBatch can re-deliver a batch after a
   * failure, and mergeUpsert is IDEMPOTENT for re-application (upserting
   * the same row twice, or deleting an already-deleted key, converges to
   * the same table state), so replays are safe. Within one batch the
   * per-key uniqueness check inside mergeUpsert still applies — feed it
   * compacted change batches (last change per key), which is what any CDC
   * source (Debezium-style) emits per poll anyway.
   */
  def mergeStream(
      changes: DataFrame, path: String, keyFields: Seq[String],
      cfg: graft.sink.SinkConfig,
      deleteCol: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          graft.sink.PartitionedSink.mergeUpsert(
            batch.sparkSession, path, batch.toDF(), keyFields, cfg,
            deleteCol): Unit
      }
      // default as-fast-as-possible micro-batches (NOT AvailableNow): a
      // CDC feed is continuous — the query keeps draining the change
      // source until stopped
      .start()

  /**
   * Streaming classification gate: every micro-batch of incoming
   * documents is scored under a PRE-FITTED Naive Bayes model
   * ([[graft.ops.TextAnalysis.naiveBayesFit]]) — the ingestion-time twin
   * of the batch `text_classify_nb` query, and the shape a production
   * quality/language/domain filter takes: train once on the reference
   * corpus, gate documents where they ENTER the pipeline. Stateless
   * foreachBatch (the decontamination-guard posture: the bounded model
   * IS the state, and it is static — it rides the closure as plan
   * literals, so a batch never shuffles to be scored).
   *
   * `onScored` receives each batch's (id, pred, score_r) table — route
   * it to routing, dropping, or per-class quotas.
   */
  def classifyStream(
      newDocs: DataFrame, idCol: String, textCol: String,
      model: graft.ops.TextAnalysis.NbModel,
      onScored: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        onScored(graft.ops.TextAnalysis.naiveBayesScore(
          batch.toDF(), idCol, textCol, model))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /**
   * Continuous duplicate-graph maintenance: every micro-batch of NEW
   * documents appends its near-dup edges into a persisted
   * [[graft.ops.Dedup.writeDupGraph]] tree through
   * [[graft.ops.Dedup.appendToDupGraph]] — the probe-restricted PPJoin
   * computes only new-touching pairs, with (n, threshold) frozen by the
   * stored `params/` sidecar. Stateless foreachBatch: the INDEX is the
   * state ([[incrementalDedupStream]]'s posture — `corpus` is the
   * at-rest historical document table, refreshed out-of-band as accepted
   * batches land; pairs BETWEEN two not-yet-folded-in batches surface
   * once the refresh catches up, exactly the historical-signatures
   * caveat documented on [[incrementalDedupStream]]). Compose with
   * [[componentsStream]] to keep cluster labels live off the same feed.
   */
  def dupGraphStream(
      newDocs: DataFrame, corpus: DataFrame, path: String,
      idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val b = batch.toDF()
          // anti-join the corpus against the batch ids before the union:
          // once the out-of-band refresh has folded a batch in (or on
          // replay after a refresh) those docs would otherwise appear
          // twice — duplicated gram rows fan out the verify join and
          // emit duplicate edge rows that the stored-pair anti-join
          // cannot block (it only drops ALREADY-STORED pairs, not
          // within-batch duplicate output rows)
          val batchIds = b.select(col(idCol))
          graft.ops.Dedup.appendToDupGraph(
            corpus.join(batchIds, Seq(idCol), "left_anti").unionByName(
              b.select(corpus.columns.toIndexedSeq.map(col): _*)),
            batchIds, path, idCol, textCol)
        }
      }
      .start()

  /**
   * Continuous component-labeling maintenance: every micro-batch of new
   * near-dup EDGES folds into a persisted
   * [[graft.ops.Dedup.writeComponentsIndex]] tree through
   * [[graft.ops.Dedup.appendToComponentsIndex]] — the
   * [[appendStreamToIvfIndex]] posture for the duplicate graph's cluster
   * labels (stateless foreachBatch, no streaming state store: the
   * LABELING is the state, updated in one contraction-bounded pass per
   * batch and published as a new generation, so concurrent readers keep
   * resolving a complete immutable tree). Batches carry `(a_id, b_id)`
   * pairs — the output shape of
   * [[graft.ops.Dedup.prefixFilteredPairs]]-style probe joins or the
   * incremental MinHash matcher; edgeless new docs ride along when the
   * batch includes them as self-edges upstream or via a separate
   * [[graft.ops.Dedup.appendToComponentsIndex]] call.
   */
  def componentsStream(
      newEdges: DataFrame,
      labelsPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    newEdges.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // an empty batch must not burn a generation publish
        if (!batch.isEmpty) {
          val b = batch.toDF()
          graft.ops.Dedup.appendToComponentsIndex(
            labelsPath,
            b.select(col("a_id").as("doc_id")).limit(0),
            b.select("a_id", "b_id"))
        }
      }
      // default as-fast-as-possible micro-batches (the mergeStream
      // posture): label maintenance is continuous — the query keeps
      // draining the edge feed until stopped
      .start()

  /**
   * Stream-stream interval join — click-to-view attribution, the streaming
   * twin of the batch `q32_attribution` query: each click pairs with the
   * same user's views at most `windowMinutes` before it.
   *
   * Both sides carry watermarks, so the state store holds only views whose
   * join window can still match a future click: once the click-side
   * watermark passes `view_ts + window`, the buffered view is evicted.
   * That is the property that makes a stream-stream join runnable forever
   * — an un-watermarked join would buffer both streams unboundedly. State
   * is partitioned by `user_id` (the equi-key) across executors.
   */
  def attributionJoin(
      views: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 10, watermarkDelay: String = "30 minutes"): DataFrame = {
    val v = views
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermarkDelay)
    val c = clicks
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    c.as("c").join(v.as("v"),
      expr(s"""c.user_id = v.user_id
              |AND c.click_ts >= v.view_ts
              |AND c.click_ts <= v.view_ts + interval $windowMinutes minutes""".stripMargin))
      .select(col("c.user_id").as("user_id"), col("click_id"), col("view_id"),
        (unix_timestamp(col("click_ts")) - unix_timestamp(col("view_ts")))
          .as("delta_s"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  final case class SessionState(
      start: Long, last: Long, n: Long)

  /**
   * Gap-based sessionization with `flatMapGroupsWithState`: a session ends
   * when no event arrives for `gapMinutes` of processing time. Emits the
   * closed session when state times out. Keyed state is per user — hash
   * partitioned, bounded by active-user cardinality.
   */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] =
    sessionizeMs(events, gapMinutes * 60000L)

  /** Millisecond-gap variant of [[sessionize]] (same operator; sub-minute
    * gaps make multi-micro-batch timeout behavior testable in seconds).
    *
    * Cross-batch semantics, pinned by `EventStreamSpec`:
    *  - state carries the open session across micro-batches; a later batch's
    *    events continue it when they fall inside the session ENVELOPE
    *    `[start − gap, last + gap]` — so an out-of-order event that sorts
    *    BEFORE the open session's last event still joins it (a plain
    *    `t − last <= gap` check would, worse, move `last` backwards);
    *  - envelope merges update `start`/`last` with min/max, so session
    *    bounds are the true event-time extent seen so far;
    *  - an event outside the envelope closes the open session immediately
    *    (emitted this batch) and opens a fresh one;
    *  - a PROCESSING-time timeout of `gap` emits the open session when the
    *    key goes quiet — event time decides membership, processing time
    *    decides when to stop waiting (an event-time-timeout variant would
    *    instead tie eviction to the watermark).
    */
  def sessionizeMs(events: Dataset[Event], gapMs: Long): Dataset[Session] =
    sessionizeWith(events, gapMs,
      GroupStateTimeout.ProcessingTimeTimeout,
      (state, _) => state.setTimeoutDuration(gapMs))

  /**
   * Event-time-timeout variant: the open session is evicted (and emitted)
   * when the WATERMARK passes `last + gap` — eviction is driven by the
   * data's own clock, so a replay of the same stream produces the same
   * sessions regardless of wall-clock pacing (processing-time timeouts do
   * not have that property; they are for live low-latency emission).
   * Requires a watermark on `ts` upstream (`withWatermark` before calling).
   */
  def sessionizeEventTime(events: Dataset[Event], gapMs: Long): Dataset[Session] =
    sessionizeWith(events, gapMs,
      GroupStateTimeout.EventTimeTimeout,
      (state, s) => state.setTimeoutTimestamp(s.last + gapMs))

  private def sessionizeWith(
      events: Dataset[Event], gapMs: Long,
      timeout: GroupStateTimeout,
      arm: (GroupState[SessionState], SessionState) => Unit): Dataset[Session] = {
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n))
          } else {
            // fold this micro-batch's events into (possibly several) sessions
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t >= s.start - gapMs && t <= s.last + gapMs =>
                  cur = Some(SessionState(
                    math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed += Session(userId,
                    new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              arm(state, s)
            }
            closed.result().iterator
          }
      }(Encoders.product[SessionState], Encoders.product[Session])
  }

  /**
   * Batch sessionization (same gap semantics, exact): boundary where the
   * gap to the previous event exceeds `gapMinutes`; session id = running
   * boundary count per user. Pure window functions — this is the
   * oracle-checkable twin of [[sessionize]].
   */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapSec = gapMinutes * 60L
    val withBoundary = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull
          || unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withBoundary.groupBy(col("user_id"), col("session_seq"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
