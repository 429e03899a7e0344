package graft.sources

import graft.SparkSpec
import graft.sink.Snapshots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `spark.readStream.format("graft-snapshot")` — the snapshot dataset
  * behind Spark's own streaming engine: checkpointed offsets, restart
  * recovery, exactly-once landing through the replay-tag window, and
  * the follower's mode dispatch (maintenance skips, non-appends are
  * policy). */
class SnapshotStreamSpec extends SparkSpec {

  private def orders = graft.Tables(spark, sf0001, "orders")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderpriority")

  private def keysOf(df: DataFrame): Set[Long] =
    df.select("o_orderkey").collect().map(_.getLong(0)).toSet

  test("bootstrap + incremental batches mirror exactly-once across restarts; compact never re-emits") {
    val root = java.nio.file.Files.createTempDirectory("sstream_src").toString
    val mirror = java.nio.file.Files.createTempDirectory("sstream_mir").toString
    val cp = java.nio.file.Files.createTempDirectory("sstream_cp").toString
    val k = col("o_orderkey")
    Snapshots.write(orders.filter(k % 3 === 0).coalesce(1), root,
      Seq("o_orderpriority"))
    Snapshots.write(orders.filter(k % 3 === 1).coalesce(1), root,
      Seq("o_orderpriority"), Snapshots.SnapAppend)

    def runStream(extraOpts: Map[String, String] = Map.empty): Unit = {
      var reader = spark.readStream.format("graft-snapshot")
      extraOpts.foreach { case (kk, v) => reader = reader.option(kk, v) }
      val stream = reader.load(root)
      assert(stream.isStreaming)
      val q = stream.writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (df: DataFrame, id: Long) =>
          // stable SS batch ids + the sink's replay-tag window =
          // exactly-once landing even if a batch redelivers
          if (!df.isEmpty)
            Snapshots.write(df, mirror, Seq("o_orderpriority"),
              Snapshots.SnapAppend, batchTag = Some(s"sqlstream-$id")): Unit
        }
        .start()
      try { q.processAllAvailable() } finally q.stop()
    }

    // both pre-stream snapshots arrive as ONE bootstrap batch
    runStream()
    assert(keysOf(Snapshots.read(spark, mirror))
      == keysOf(orders.filter(k % 3 <= 1)))
    // an append plus an interleaved compact: restart on the SAME
    // checkpoint picks up only the new rows — the compact (a
    // row-preserving rewrite) must not re-emit
    Snapshots.write(orders.filter(k % 3 === 2).coalesce(1), root,
      Seq("o_orderpriority"), Snapshots.SnapAppend)
    Snapshots.compact(spark, root, Seq("o_orderpriority"))
    runStream()
    assert(keysOf(Snapshots.read(spark, mirror)) == keysOf(orders))
    assert(Snapshots.read(spark, mirror).count() == orders.count(),
      "no duplicates: maintenance snapshots contribute nothing")
    // caught up: another run emits nothing (mirror state unchanged)
    val before = Snapshots.currentSnapshot(spark, mirror)
    runStream()
    assert(Snapshots.currentSnapshot(spark, mirror) == before)

    // a non-append (predicate delete) FAILS the stream by default…
    val minKey = orders.agg(min(k)).head().getLong(0)
    assert(Snapshots.deleteWhere(spark, root, Seq("o_orderpriority"),
      k === minKey).isDefined)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${messages(t.getCause)}"
    assert(messages(ex).contains("not an append"), messages(ex))
    // …and option("onNonAppend","skip") opts past it; a later append
    // still streams through
    Snapshots.write(orders.filter(k % 3 === 0).coalesce(1)
        .withColumn("o_orderkey", k + 5000000L), root,
      Seq("o_orderpriority"), Snapshots.SnapAppend)
    runStream(Map("onNonAppend" -> "skip"))
    assert(keysOf(Snapshots.read(spark, mirror))
      == keysOf(orders) ++ keysOf(orders.filter(k % 3 === 0)
        .select((k + 5000000L).as("o_orderkey"))))
    // pins cannot stream — the option set is validated loudly
    intercept[Exception] {
      spark.readStream.format("graft-snapshot").option("asOf", "1")
        .load(root)
    }
    // a checkpoint left behind the retention window names the STALE
    // condition on restart instead of a missing-manifest error
    Snapshots.write(orders.limit(3).coalesce(1), root,
      Seq("o_orderpriority"), Snapshots.SnapAppend)
    Snapshots.write(orders.limit(2).coalesce(1), root,
      Seq("o_orderpriority"), Snapshots.SnapAppend)
    Snapshots.expire(spark, root, keepLast = 1)
    val exStale =
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        runStream()
      }
    assert(messages(exStale).contains("STALE"), messages(exStale))
  }

  test("maxSnapshotsPerTrigger bounds catch-up batches to per-trigger units") {
    val root = java.nio.file.Files.createTempDirectory("scap_src").toString
    val mirror = java.nio.file.Files.createTempDirectory("scap_mir").toString
    val cp = java.nio.file.Files.createTempDirectory("scap_cp").toString
    val k = col("o_orderkey")
    Snapshots.write(orders.filter(k % 4 === 0).coalesce(1), root,
      Seq("o_orderpriority"))
    def run(opts: Map[String, String]): Unit = {
      var reader = spark.readStream.format("graft-snapshot")
      opts.foreach { case (kk, v) => reader = reader.option(kk, v) }
      val q = reader.load(root).writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          if (!df.isEmpty)
            Snapshots.write(df, mirror, Seq("o_orderpriority"),
              Snapshots.SnapAppend, batchTag = Some(s"cap-$id")): Unit
        }.start()
      try { q.processAllAvailable() } finally q.stop()
    }
    run(Map.empty) // bootstrap: one batch
    assert(Snapshots.currentSnapshot(spark, mirror).contains(1))
    // three publishes land while the stream is down; a capped restart
    // takes them one snapshot per trigger — three mirror batches, not
    // one unbounded union
    for (m <- 1 to 3)
      Snapshots.write(orders.filter(k % 4 === m).coalesce(1), root,
        Seq("o_orderpriority"), Snapshots.SnapAppend)
    run(Map("maxSnapshotsPerTrigger" -> "1"))
    assert(Snapshots.currentSnapshot(spark, mirror).contains(4),
      s"expected three capped batches: ${Snapshots
        .currentSnapshot(spark, mirror)}")
    assert(keysOf(Snapshots.read(spark, mirror)) == keysOf(orders))
    intercept[Exception] {
      spark.readStream.format("graft-snapshot")
        .option("maxSnapshotsPerTrigger", "0").load(root)
    }
  }

  test("writeStream sink: snapshot-to-snapshot mirroring is a one-liner with exactly-once batch tags") {
    val src = java.nio.file.Files.createTempDirectory("ssink_src").toString
    val dst = java.nio.file.Files.createTempDirectory("ssink_dst").toString
    val cp = java.nio.file.Files.createTempDirectory("ssink_cp").toString
    val k = col("o_orderkey")
    Snapshots.write(orders.filter(k % 2 === 0).coalesce(1), src,
      Seq("o_orderpriority"))
    def run(): Unit = {
      val q = spark.readStream.format("graft-snapshot").load(src)
        .writeStream.format("graft-snapshot")
        .option("checkpointLocation", cp)
        .partitionBy("o_orderpriority")
        .start(dst)
      try { q.processAllAvailable() } finally q.stop()
    }
    run()
    assert(keysOf(Snapshots.read(spark, dst))
      == keysOf(orders.filter(k % 2 === 0)))
    // a mid-stream publish flows through on the next run; every landed
    // batch is an audited, stream-tagged snapshot
    Snapshots.write(orders.filter(k % 2 === 1).coalesce(1), src,
      Seq("o_orderpriority"), Snapshots.SnapAppend)
    run()
    assert(keysOf(Snapshots.read(spark, dst)) == keysOf(orders))
    assert(Snapshots.read(spark, dst).count() == orders.count())
    val log = Snapshots.snapshotLog(spark, dst).collect()
    assert(log.forall(_.getString(1) == "append"))
    // a caught-up rerun lands nothing (no empty snapshots, no dupes)
    val before = Snapshots.currentSnapshot(spark, dst)
    run()
    assert(Snapshots.currentSnapshot(spark, dst) == before)
    // non-append output modes are rejected loudly
    val exMode = intercept[Exception] {
      spark.readStream.format("graft-snapshot").load(src)
        .groupBy("o_orderpriority").count()
        .writeStream.format("graft-snapshot")
        .outputMode("complete")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ssink_cp2").toString)
        .start(java.nio.file.Files
          .createTempDirectory("ssink_dst2").toString)
    }
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${messages(t.getCause)}"
    assert(messages(exMode).contains("append-of-batches"),
      messages(exMode))
  }
}
