package graft.streaming

import graft.SparkSpec

/** State-store metrics surface: the numbers must track what the state
  * actually did — rows appear when sessions open, and watermark-driven
  * eviction shows up as removals with the total falling back. */
class StateMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("state metrics track open-session state and watermark eviction") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(ms: Long) = new Timestamp(1700000000000L + ms)
    val input = MemoryStream[EventStream.Event]
    val sessions = EventStream.sessionizeEventTime(
      input.toDS().withWatermark("ts", "0 seconds"), gapMs = 5000)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_metrics").start()
    try {
      // two users open sessions
      input.addData(
        EventStream.Event(1L, ts(0), 7L, "c", 1.0),
        EventStream.Event(2L, ts(1000), 7L, "c", 1.0),
        EventStream.Event(3L, ts(500), 8L, "c", 1.0))
      q.processAllAvailable()
      val afterOpen = StateMetrics.latestByOperator(q)
      assert(afterOpen.size == 1)
      val (opName, open) = afterOpen.head
      assert(opName.nonEmpty)
      assert(open.num_rows_total == 2, s"expected 2 open sessions in state: $open")
      // the latest batch can be a trailing no-data trigger (watermark
      // commit) where updated is 0 — the update count shows in the batch
      // that actually folded the events
      assert(StateMetrics.stateOperatorProgress(q).exists(_.num_rows_updated >= 2))
      assert(open.memory_used_bytes > 0)
      assert(open.num_state_store_instances > 0)

      // far-future events advance the watermark past both sessions'
      // last+gap → event-time timeout evicts them; totals must fall back
      // to just the fresh session and removals must be recorded
      input.addData(EventStream.Event(4L, ts(60000), 9L, "c", 1.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(5L, ts(61000), 9L, "c", 1.0))
      q.processAllAvailable()
      val history = StateMetrics.stateOperatorProgress(q)
      assert(history.map(_.batch_id).distinct.size >= 2)
      assert(history.exists(_.num_rows_removed >= 2),
        s"no eviction recorded in: $history")
      val last = StateMetrics.latestByOperator(q).head._2
      assert(last.num_rows_total == 1, s"state should hold only user 9: $last")

      // DataFrame surface carries the same rows
      val df = StateMetrics.stateMetrics(spark, q)
      assert(df.count() == history.size)
      assert(df.columns.contains("num_rows_total"))
    } finally q.stop()
  }

  test("sessionize runs unchanged on the RocksDB state store (production backend)") {
    // At 100 TB-scale state the default HDFS-backed in-memory store OOMs —
    // RocksDB spills to local disk and is the production choice. The
    // operator must not care which backend holds its state, and the
    // metrics surface must still see it.
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(ms: Long) = new Timestamp(1700000000000L + ms)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[EventStream.Event]
    val sessions = EventStream.sessionizeEventTime(
      input.toDS().withWatermark("ts", "0 seconds"), gapMs = 5000)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_rocksdb").start()
    try {
      input.addData(
        EventStream.Event(1L, ts(0), 7L, "c", 1.0),
        EventStream.Event(2L, ts(1000), 7L, "c", 1.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(3L, ts(60000), 8L, "c", 1.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(4L, ts(61000), 8L, "c", 1.0))
      q.processAllAvailable()
      val s7 = spark.table("sess_rocksdb").as[EventStream.Session]
        .collect().filter(_.user_id == 7L)
      assert(s7.length == 1 && s7.head.n_events == 2)
      val last = StateMetrics.latestByOperator(q).head._2
      assert(last.num_rows_total == 1) // only user 8 still open
      assert(last.memory_used_bytes > 0)
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
