package graft.streaming

import graft.sink.{FsOps, Snapshots}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * SUBSCRIBE TO A SNAPSHOT DATASET: a pull-driven incremental-read source
 * that feeds a consumer each snapshot's NEW ROWS in publish order, with
 * the snapshot id as the resumable offset — the "landing zone in, derived
 * table out" consumer every [[Snapshots.snapshotStream]] deployment
 * eventually wants, without a custom DataSourceV2 (the batches are
 * ordinary manifest-pruned [[Snapshots.readAddedSince]] reads, so all of
 * Spark's scan machinery applies untouched).
 *
 * Dispatch is by each manifest's recorded MODE:
 *  - `append` / `merge_mor` EMIT the snapshot's added files — exactly the
 *    new/updated row images (the Iceberg incremental-append-scan
 *    contract). Merge-on-read DELETES do not surface here; a consumer
 *    that must see deletes reads [[Snapshots.changes]] instead.
 *  - maintenance (`compact`, `fold`, `migrate_spec`, `evolve_spec`) SKIPS:
 *    those snapshots rewrite representation, provably preserving visible
 *    rows — re-emitting their files would double-deliver.
 *  - anything else (`overwrite_partitions`, `merge`, `rollback`,
 *    `delete_where`, `branch_merge`) cannot be represented as an append
 *    stream: [[FailOnNonAppend]] (default) fails loudly;
 *    [[SkipNonAppend]] opts into skipping for consumers that tolerate it;
 *    [[RefreshOnNonAppend]] emits the FULL state at that snapshot so the
 *    consumer can rebuild its downstream copy.
 *
 * Delivery is AT-LEAST-ONCE: the offset commits only after `process`
 * returns, so a crash between replays the batch. End-to-end EXACTLY-ONCE
 * when the consumer lands into another snapshot dataset with
 * `batchTag = s"follow-<id>"` — the id is stable across redeliveries, so
 * the sink's replay-tag window converges the retry
 * ([[Snapshots.write]]'s guard, hardened against interleaved
 * maintenance).
 *
 * 100 TB shape: every poll is METADATA-cost until a batch emits (one
 * pointer read + one manifest read per considered id); an emitted batch
 * scans only the files that snapshot added. Single-consumer per
 * checkpoint, same as any Structured Streaming query.
 */
class SnapshotFollower(
    spark: SparkSession, root: String, checkpoint: String,
    startAfter: Option[Int] = None,
    onNonAppend: SnapshotFollower.NonAppendPolicy =
      SnapshotFollower.FailOnNonAppend,
    refreshOnStaleCheckpoint: Boolean = false) {

  import SnapshotFollower._

  private val (cpFs, qcp) = FsOps.fs(spark, checkpoint)
  private val offsetPath = new Path(qcp, "OFFSET")

  // committed id mirrored in memory once THIS instance commits: the
  // durable OFFSET file stays authoritative across restarts, but a
  // monitoring thread ([[FollowerHandle.awaitCaughtUp]]) polling the file
  // mid-atomic-rewrite would hit transient checksum/not-found reads
  @volatile private var committedCache: Option[Int] = None

  /** The last snapshot id this checkpoint has fully processed (or been
    * configured to start after). */
  def lastCommitted: Option[Int] = committedCache.orElse {
    if (cpFs.exists(offsetPath)) {
      val in = cpFs.open(offsetPath)
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim finally in.close()
      Some(s.toInt)
    } else startAfter
  }

  private def commit(id: Int): Unit = {
    cpFs.mkdirs(qcp)
    FsOps.atomicWrite(cpFs, offsetPath, id.toString)
    committedCache = Some(id)
  }

  /** Advance toward the current snapshot, emitting AT MOST ONE batch:
    * maintenance snapshots commit through silently; the first
    * append-shaped snapshot with added files goes to `process` and its id
    * commits AFTER `process` returns. A FRESH checkpoint with no
    * `startAfter` bootstraps with the full state at the EARLIEST RETAINED
    * snapshot (expired history cannot replay — without this, a follower
    * could never start on any dataset older than its retention window)
    * and goes incremental from there. Returns the emitted snapshot id, or
    * None when caught up. */
  def pollOnce(process: (DataFrame, SnapshotFollower.BatchInfo) => Unit)
      : Option[Int] = {
    val cur = Snapshots.currentSnapshot(spark, root).getOrElse(return None)
    def bootstrap(): Option[Int] = {
      val first = Snapshots.earliestRetainedSnapshot(spark, root)
        .getOrElse(return None)
      process(Snapshots.read(spark, root, asOf = Some(first)),
        BatchInfo(first, isRefresh = true))
      commit(first)
      Some(first)
    }
    val resumeFrom = lastCommitted match {
      case Some(last) =>
        // a checkpoint that fell behind the retention window cannot
        // replay incrementally — the diff needs manifest s<last>, and
        // expire reclaimed it. Name the real condition instead of the
        // generic missing-snapshot error deep inside readAddedSince; the
        // opt-in recovery re-bootstraps with a full-state refresh at the
        // earliest retained snapshot (the consumer REPLACES its copy,
        // exactly the fresh-checkpoint path) and goes incremental again.
        if (last < cur &&
            Snapshots.earliestRetainedSnapshot(spark, root).exists(_ > last)) {
          if (refreshOnStaleCheckpoint) return bootstrap()
          throw new IllegalStateException(
            s"follower checkpoint at $checkpoint is STALE: it last " +
              s"committed s$last but Snapshots.expire has reclaimed the " +
              s"manifests needed to replay from there (earliest retained " +
              s"is s${Snapshots.earliestRetainedSnapshot(spark, root)
                .getOrElse(-1)}) — widen the dataset's retention relative " +
              "to the follower's poll cadence, or construct the follower " +
              "with refreshOnStaleCheckpoint=true to re-bootstrap from a " +
              "full-state refresh")
        }
        last
      case None => return bootstrap()
    }
    var id = resumeFrom + 1
    while (id <= cur) {
      val mode = Snapshots.snapshotModeOf(spark, root, id)
      if (EmitModes(mode)) {
        val batch =
          if (id == 1) Some(Snapshots.read(spark, root, asOf = Some(1)))
          else Snapshots.readAddedSince(spark, root, id - 1, Some(id))
        batch match {
          case Some(df) =>
            process(df, BatchInfo(id, isRefresh = false))
            commit(id)
            return Some(id)
          case None => // added nothing (e.g. a delete-only CDC batch)
            commit(id); id += 1
        }
      } else if (SkipModes(mode)) {
        commit(id); id += 1
      } else onNonAppend match {
        case SkipNonAppend => commit(id); id += 1
        case RefreshOnNonAppend =>
          // the consumer rebuilds from the FULL state at this snapshot —
          // the "replace the downstream table" recovery for overwrites,
          // rollbacks and predicate deletes
          process(Snapshots.read(spark, root, asOf = Some(id)),
            BatchInfo(id, isRefresh = true))
          commit(id)
          return Some(id)
        case FailOnNonAppend => throw new IllegalStateException(
          s"snapshot s$id mode '$mode' under $root is not an append — an " +
            "incremental append scan cannot represent it; consume " +
            "row-level diffs via Snapshots.changes, opt into " +
            "SkipNonAppend if dropping it is acceptable, or " +
            "RefreshOnNonAppend to rebuild from the full state")
      }
    }
    None
  }

  /** Drain every pending snapshot (each emitted batch processed and
    * committed individually). Returns the emitted snapshot ids. */
  def drain(process: (DataFrame, SnapshotFollower.BatchInfo) => Unit)
      : Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var emitted = pollOnce(process)
    while (emitted.isDefined) { out += emitted.get; emitted = pollOnce(process) }
    out.result()
  }

  /** Run the follower on a SCHEDULE — the driver loop every deployment
    * otherwise hand-rolls: a daemon thread [[drain]]s, sleeps
    * `intervalMs`, repeats, until [[FollowerHandle.stop]]. Idle cost per
    * tick is the [[pollOnce]] metadata read (one pointer + one manifest
    * per considered id). The pull API stays available for tests and
    * custom schedulers, but must not run CONCURRENTLY with a live loop —
    * one consumer per checkpoint, as ever. A `process` failure stops the
    * loop and surfaces on [[FollowerHandle.stop]] /
    * [[FollowerHandle.error]] — batches are never skipped past an error
    * (the uncommitted batch redelivers on the next start). */
  def followStream(
      intervalMs: Long,
      process: (DataFrame, SnapshotFollower.BatchInfo) => Unit)
      : SnapshotFollower.FollowerHandle = {
    require(intervalMs > 0, "poll interval must be positive")
    new SnapshotFollower.FollowerHandle(this, spark, root, intervalMs,
      process)
  }
}

object SnapshotFollower {
  /** What one delivered batch IS: an incremental APPEND (new rows — the
    * consumer adds them downstream) or a full-state REFRESH (the
    * bootstrap batch and [[RefreshOnNonAppend]] batches — the consumer
    * REPLACES its downstream copy; appending a refresh double-counts).
    * Without this flag a consumer could not tell the two apart — the
    * manifest mode accessor is library-internal. */
  case class BatchInfo(snapshotId: Int, isRefresh: Boolean)

  sealed trait NonAppendPolicy
  /** Fail loudly on a snapshot an append stream cannot represent. */
  case object FailOnNonAppend extends NonAppendPolicy
  /** Skip such snapshots (consumer accepts missing those changes). */
  case object SkipNonAppend extends NonAppendPolicy
  /** Emit the FULL state at such snapshots — the consumer replaces its
    * downstream copy instead of appending (overwrite/rollback recovery). */
  case object RefreshOnNonAppend extends NonAppendPolicy

  /** Mode dispatch shared with the Structured Streaming source — the
    * single source of truth lives with the manifests
    * ([[Snapshots.EmitModes]]). */
  private val EmitModes = Snapshots.EmitModes
  private val SkipModes = Snapshots.SkipModes

  /** A running [[SnapshotFollower.followStream]] loop. [[stop]] is
    * graceful: it wakes the scheduler, lets any in-flight batch finish
    * (never interrupting a Spark job mid-commit), joins the thread, and
    * rethrows the loop's failure if one stopped it early. */
  final class FollowerHandle private[streaming](
      follower: SnapshotFollower, spark: SparkSession, root: String,
      intervalMs: Long,
      process: (DataFrame, BatchInfo) => Unit) {
    @volatile private var running = true
    @volatile private var failed: Option[Throwable] = None
    private val wake = new Object
    private val thread = new Thread(() => {
      while (running) {
        try follower.drain(process): Unit
        catch {
          case t: Throwable => failed = Some(t); running = false
        }
        if (running) wake.synchronized {
          if (running) wake.wait(intervalMs)
        }
      }
    }, "graft-snapshot-follower")
    thread.setDaemon(true)
    thread.start()

    /** The failure that stopped the loop, if any. */
    def error: Option[Throwable] = failed

    def isRunning: Boolean = running && thread.isAlive

    /** Block until the follower has committed through the dataset's
      * CURRENT snapshot (sampled per poll, so publishes during the wait
      * extend the target). False on timeout; rethrows a loop failure. */
    def awaitCaughtUp(timeoutMs: Long = 30000L): Boolean = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (System.currentTimeMillis() < deadline) {
        failed.foreach(throw _)
        val cur = Snapshots.currentSnapshot(spark, root)
        // a first-commit racing this poll can make the offset read fail
        // transiently (atomic rename vs checksum file) — treat as not-yet
        val committed =
          try follower.lastCommitted
          catch { case _: java.io.IOException => None }
        if (cur.isEmpty || cur == committed) return true
        wake.synchronized(wake.notifyAll()) // skip the idle sleep
        Thread.sleep(25)
      }
      failed.foreach(throw _)
      false
    }

    /** Stop the loop and rethrow its failure if one occurred. Waits for
      * any in-flight batch to finish; if it is still running after the
      * timeout this FAILS rather than returning as if stopped — the
      * caller must not start a second consumer on the checkpoint while
      * the first may still commit. */
    def stop(timeoutMs: Long = 60000L): Unit = {
      running = false
      wake.synchronized(wake.notifyAll())
      thread.join(timeoutMs)
      if (thread.isAlive)
        throw new IllegalStateException(
          s"follower loop did not stop within ${timeoutMs}ms — a batch " +
            "is still in flight; wait for it (stop again with a larger " +
            "timeout) before reusing this checkpoint")
      failed.foreach(throw _)
    }
  }
}
