package graft.streaming

import graft.SparkSpec
import graft.sink.Snapshots
import graft.sink.Snapshots.{SnapAppend, SnapOverwritePartitions}
import org.apache.spark.sql.functions._

/** The snapshot-subscribe lane: incremental append reads in publish
  * order, snapshot id as the resumable offset, maintenance snapshots
  * skipped, at-least-once delivery composing to exactly-once against a
  * tag-guarded snapshot sink. */
class SnapshotFollowerSpec extends SparkSpec {

  private def orders = graft.Tables(spark, sf0001, "orders")
    .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")

  private def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("o_orderkey").collect().map(_.getLong(0)).toSet

  test("batch parity: emits each append once, skips maintenance, resumes across restarts") {
    val root = java.nio.file.Files.createTempDirectory("follow_src").toString
    val cp = java.nio.file.Files.createTempDirectory("follow_cp").toString
    for (m <- 0 to 1)
      Snapshots.write(orders.filter(col("o_orderkey") % 3 === m).coalesce(1),
        root, Seq("o_orderpriority"), SnapAppend)
    Snapshots.compact(spark, root, Seq("o_orderpriority")) // s3: must skip
    val seen = scala.collection.mutable.ArrayBuffer[(Int, Set[Long])]()
    val f1 = new SnapshotFollower(spark, root, cp)
    assert(f1.drain((df, b) => seen += ((b.snapshotId, keys(df))))
      == Seq(1, 2))
    assert(seen.map(_._1).toSeq == Seq(1, 2), "compact s3 must not emit")
    assert(seen.map(_._2).reduce(_ ++ _) ==
      keys(orders.filter(col("o_orderkey") % 3 <= 1)))
    assert(f1.lastCommitted.contains(3), "skipped maintenance still commits")
    // a RESTARTED follower on the same checkpoint resumes, redelivering
    // nothing; a new append is the only thing it sees
    Snapshots.write(orders.filter(col("o_orderkey") % 3 === 2).coalesce(1),
      root, Seq("o_orderpriority"), SnapAppend) // s4
    val f2 = new SnapshotFollower(spark, root, cp)
    val seen2 = scala.collection.mutable.ArrayBuffer[(Int, Set[Long])]()
    assert(f2.drain((df, b) => seen2 += ((b.snapshotId, keys(df))))
      == Seq(4))
    assert(seen2.head._2 == keys(orders.filter(col("o_orderkey") % 3 === 2)))
    assert(f2.pollOnce((_, _) => fail("caught up — nothing to emit")).isEmpty)
  }

  test("crash redelivery + tagged sink writes = exactly-once table mirroring") {
    val root = java.nio.file.Files.createTempDirectory("follow_a").toString
    val mirror = java.nio.file.Files.createTempDirectory("follow_b").toString
    val cp = java.nio.file.Files.createTempDirectory("follow_cp2").toString
    for (m <- 0 to 2)
      Snapshots.write(orders.filter(col("o_orderkey") % 3 === m).coalesce(1),
        root, Seq("o_orderpriority"), SnapAppend)
    val follower = new SnapshotFollower(spark, root, cp)
    var crashed = false
    def mirrorBatch(df: org.apache.spark.sql.DataFrame,
        b: SnapshotFollower.BatchInfo): Unit = {
      Snapshots.write(df.coalesce(1), mirror, Seq("o_orderpriority"),
        SnapAppend, batchTag = Some(s"follow-${b.snapshotId}")): Unit
      // crash AFTER the write, BEFORE the offset commits — the batch
      // will redeliver and the sink's replay tag must converge it
      if (b.snapshotId == 2 && !crashed) { crashed = true; sys.error("crash") }
    }
    intercept[RuntimeException] { follower.drain(mirrorBatch) }
    assert(follower.lastCommitted.contains(1),
      "a crashed batch must not commit its offset")
    assert(follower.drain(mirrorBatch) == Seq(2, 3))
    assert(keys(Snapshots.read(spark, mirror)) == keys(orders),
      "mirror must converge to the source rows exactly once")
    assert(Snapshots.read(spark, mirror).count() == orders.count(),
      "the redelivered batch must not double-append")
  }

  test("non-append snapshots fail loudly by default, skip under the opt-in policy") {
    val root = java.nio.file.Files.createTempDirectory("follow_ovw").toString
    val cp1 = java.nio.file.Files.createTempDirectory("follow_cpf").toString
    val cp2 = java.nio.file.Files.createTempDirectory("follow_cps").toString
    Snapshots.write(orders, root, Seq("o_orderpriority"))
    Snapshots.write(
      orders.filter(col("o_orderpriority") === "1-URGENT"
        && col("o_orderkey") % 2 === 0), root,
      Seq("o_orderpriority"), SnapOverwritePartitions) // s2
    Snapshots.write(
      orders.filter(col("o_orderkey") % 10 === 4)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000L)
        .withColumn("o_orderpriority", lit("5-LOW")).coalesce(1),
      root, Seq("o_orderpriority"), SnapAppend) // s3
    val strict = new SnapshotFollower(spark, root, cp1)
    val got = scala.collection.mutable.ArrayBuffer[Int]()
    assert(strict.pollOnce((_, b) => got += b.snapshotId).contains(1))
    val e = intercept[IllegalStateException] {
      strict.pollOnce((_, b) => got += b.snapshotId)
    }
    assert(e.getMessage.contains("overwrite_partitions"))
    val lenient = new SnapshotFollower(spark, root, cp2,
      onNonAppend = SnapshotFollower.SkipNonAppend)
    assert(lenient.drain((_, b) => got += b.snapshotId) == Seq(1, 3))
    // refresh policy: the non-append snapshot emits its FULL state so the
    // consumer rebuilds — then increments resume
    val cp3 = java.nio.file.Files.createTempDirectory("follow_cpr").toString
    val refreshed = scala.collection.mutable.Map[Int, (Long, Boolean)]()
    val rebuild = new SnapshotFollower(spark, root, cp3,
      onNonAppend = SnapshotFollower.RefreshOnNonAppend)
    assert(rebuild.drain((df, b) =>
      refreshed(b.snapshotId) = (df.count(), b.isRefresh)) == Seq(1, 2, 3))
    assert(refreshed(2) ==
      ((Snapshots.read(spark, root, asOf = Some(2)).count(), true)),
      "the refresh batch must be the FLAGGED full state at the overwrite")
    assert(refreshed(1)._2 && !refreshed(3)._2,
      "bootstrap is a refresh; the later append is not")
  }

  test("a fresh checkpoint on expired history bootstraps from the earliest retained snapshot") {
    val root = java.nio.file.Files.createTempDirectory("follow_exp").toString
    val cp = java.nio.file.Files.createTempDirectory("follow_cpe").toString
    for (m <- 0 to 2)
      Snapshots.write(orders.filter(col("o_orderkey") % 3 === m).coalesce(1),
        root, Seq("o_orderpriority"), SnapAppend)
    Snapshots.expire(spark, root, keepLast = 2) // s1 expired
    val seen = scala.collection.mutable.ArrayBuffer[(Int, Set[Long])]()
    val f = new SnapshotFollower(spark, root, cp)
    // bootstrap = the FULL state at s2 (batches 1+2), then s3 incremental
    assert(f.drain((df, b) => seen += ((b.snapshotId, keys(df))))
      == Seq(2, 3))
    assert(seen.head._2 == keys(orders.filter(col("o_orderkey") % 3 <= 1)))
    assert(seen.map(_._2).reduce(_ ++ _) == keys(orders))
  }

  test("a checkpoint behind the retention window fails with the dedicated stale error, or re-bootstraps under the opt-in") {
    val root = java.nio.file.Files.createTempDirectory("follow_stale").toString
    val cp = java.nio.file.Files.createTempDirectory("follow_cps").toString
    Snapshots.write(orders.filter(col("o_orderkey") % 3 === 0).coalesce(1),
      root, Seq("o_orderpriority"), SnapAppend)
    val f = new SnapshotFollower(spark, root, cp)
    assert(f.drain((_, _) => ()) == Seq(1))
    // history moves on without the follower; retention reclaims the
    // manifests its resume needs (s1 itself included)
    for (m <- 1 to 2)
      Snapshots.write(orders.filter(col("o_orderkey") % 3 === m).coalesce(1),
        root, Seq("o_orderpriority"), SnapAppend)
    Snapshots.expire(spark, root, keepLast = 1) // only s3 retained
    val ex = intercept[IllegalStateException] {
      f.pollOnce((_, _) => fail("stale checkpoint must not emit"))
    }
    assert(ex.getMessage.contains("STALE") &&
      ex.getMessage.contains("refreshOnStaleCheckpoint"),
      s"must name the stale-checkpoint condition: ${ex.getMessage}")
    // the opt-in re-bootstraps: one full-state REFRESH at the earliest
    // retained snapshot, then incremental as usual
    val seen = scala.collection.mutable.ArrayBuffer[(Int, Boolean, Set[Long])]()
    val fr = new SnapshotFollower(spark, root, cp,
      refreshOnStaleCheckpoint = true)
    assert(fr.drain((df, b) =>
      seen += ((b.snapshotId, b.isRefresh, keys(df)))) == Seq(3))
    assert(seen.toSeq == Seq((3, true, keys(orders))),
      s"expected one full-state refresh at s3: $seen")
    // and a later append resumes incrementally from there
    Snapshots.write(orders.limit(5).coalesce(1), root,
      Seq("o_orderpriority"), SnapAppend)
    assert(fr.drain((df, b) => assert(!b.isRefresh)) == Seq(4))
  }

  test("followStream: the scheduled loop mirrors publishes exactly-once without a hand-rolled poller") {
    val root = java.nio.file.Files.createTempDirectory("follow_loop").toString
    val mirror = java.nio.file.Files.createTempDirectory("follow_loopm").toString
    val cp = java.nio.file.Files.createTempDirectory("follow_loopc").toString
    val follower = new SnapshotFollower(spark, root, cp)
    val handle = follower.followStream(50L, (df, b) =>
      Snapshots.write(df.coalesce(1), mirror, Seq("o_orderpriority"),
        SnapAppend, batchTag = Some(s"follow-${b.snapshotId}")): Unit)
    try {
      // two publishes land while the loop runs — each must mirror once
      Snapshots.write(orders.filter(col("o_orderkey") % 2 === 0).coalesce(1),
        root, Seq("o_orderpriority"), SnapAppend)
      assert(handle.awaitCaughtUp(60000L), "loop must drain s1")
      Snapshots.write(orders.filter(col("o_orderkey") % 2 === 1).coalesce(1),
        root, Seq("o_orderpriority"), SnapAppend)
      assert(handle.awaitCaughtUp(60000L), "loop must drain s2")
      assert(follower.lastCommitted.contains(2))
      assert(keys(Snapshots.read(spark, mirror)) == keys(orders))
      assert(handle.error.isEmpty && handle.isRunning)
    } finally handle.stop()
    assert(!handle.isRunning)
  }
}
