package graft.sources

import graft.sink.Snapshots
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming over a snapshot dataset:
 * `spark.readStream.format("graft-snapshot").load(root)` — the
 * [[graft.streaming.SnapshotFollower]]'s id-as-offset machinery behind
 * Spark's own streaming engine, so triggers, every `writeStream` sink,
 * checkpoint coordination and restart recovery all apply. The classic
 * v1 [[Source]] shape deliberately (the same engine path
 * FileStreamSource runs on): the batch connector is a v1
 * RelationProvider under the same short name, and one registered
 * format cannot serve DSv2 reads without hijacking the batch lane —
 * the offset/getBatch contract below is exactly MicroBatchStream's
 * (planInputPartitions ≙ getBatch, id-as-offset), at no loss of
 * engine features.
 *
 * Semantics (the follower's, made WAL-replayable):
 *  - offset = published snapshot id; `getOffset` is one pointer read.
 *  - first batch (`start = None`) = the FULL state at the end offset —
 *    the bootstrap every fresh checkpoint needs; deterministic on
 *    restart replay while the snapshot is retained ([[Snapshots
 *    .expire]] must out-retain the checkpoint lag, as with the
 *    follower).
 *  - incremental batches union each emit-mode snapshot's ADDED rows in
 *    (start, end] (`append` / `merge_mor` — the Iceberg
 *    incremental-append contract); row-preserving maintenance
 *    (`compact`/`fold`/`migrate_spec`/`evolve_spec`) contributes
 *    nothing; anything else (overwrite, CoW merge, delete_where,
 *    update_where, rollback, branch_merge) cannot be represented in an
 *    append stream — FAIL by default, or skip with
 *    `option("onNonAppend", "skip")`.
 *  - columns project to the stream's START schema: a mid-stream
 *    COLUMN addition never breaks the running query (new columns
 *    surface on restart; pre-widening replays fill typed nulls), and a
 *    mid-stream TYPE widening fails LOUDLY naming the restart remedy —
 *    down-casting the widened rows would silently corrupt values (the
 *    batch connector's drift rule).
 *
 * `maxSnapshotsPerTrigger` caps each trigger's end offset (bounded
 * catch-up batches); a v1 source cannot see the trigger kind, so the
 * cap also bounds a `Trigger.Once` run — use AvailableNow/continuous
 * scheduling (or drop the cap) when one run must drain everything.
 *
 * Exactly-once end-to-end: land batches into another snapshot dataset
 * with `batchTag = s"<app>-$batchId"` inside `foreachBatch` — SS batch
 * ids are stable across retries, and the sink's replay-tag window
 * converges redeliveries (the follower's contract, unchanged).
 */
class SnapshotStreamSource(
    sqlContext: SQLContext, root: String,
    userSchema: Option[StructType], skipNonAppend: Boolean,
    maxSnapshotsPerTrigger: Option[Int] = None,
    maxRowsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends Source {

  private def spark = sqlContext.sparkSession

  // highest offset handed to the engine — the base the per-trigger cap
  // advances from. Restart recovery repopulates it through the WAL
  // replay's getBatch; until something sets it the cap stands down
  // (the bootstrap batch is one full-state read regardless, and a
  // clean restart's first increment may span the downtime gap —
  // the cap is a steady-state trigger bound, not an admission quota)
  @volatile private var lastDelivered: Option[Int] = None

  /** The stream's read contract, FIXED at stream start (Spark caches it
    * in the query plan); a widening surfaces on restart. */
  override val schema: StructType = userSchema.getOrElse(
    Snapshots.tableSchema(spark, root))

  private case class SnapOffset(id: Int) extends Offset {
    override def json: String = id.toString
  }

  // the WAL hands offsets back as SerializedOffset(json) after a
  // restart — parse the id out of any Offset shape
  private def idOf(o: Offset): Int = o match {
    case SnapOffset(id) => id
    case other => other.json.trim.toInt
  }

  /** The newest offset this trigger may take: the published pointer,
    * capped `maxSnapshotsPerTrigger` past the last delivered offset,
    * then tightened by the ROW/BYTE budgets against each snapshot's
    * manifest-recorded added size (metadata-cost — no data file opens)
    * — a stream catching up over a long gap processes bounded batches
    * instead of one unbounded union, and one huge snapshot no longer
    * rides a count-only cap as one unbounded batch. Progress is always
    * ≥ 1 snapshot: an over-budget or unknown-cost snapshot becomes its
    * own batch (never a stall, never a split — a snapshot is the
    * atomic emission unit). The caps are steady-state trigger bounds:
    * the bootstrap (no delivered offset yet) is one full-state read
    * regardless, as with the count cap. */
  override def getOffset: Option[Offset] =
    Snapshots.currentSnapshot(spark, root).map { cur =>
      val countCapped = (maxSnapshotsPerTrigger, lastDelivered) match {
        case (Some(n), Some(last)) => math.min(cur, last + n)
        case _ => cur
      }
      val sizeCaps = maxRowsPerTrigger.isDefined ||
        maxBytesPerTrigger.isDefined
      val capped = lastDelivered match {
        case Some(last) if sizeCaps && countCapped > last =>
          var end = last
          var rows = 0L
          var bytes = 0L
          var done = false
          while (!done && end < countCapped) {
            val (r, b) = Snapshots.addedStreamCost(spark, root, end + 1)
            val unknown = r < 0 || b < 0
            val wouldRows = rows + math.max(r, 0L)
            val wouldBytes = bytes + math.max(b, 0L)
            val over = unknown ||
              maxRowsPerTrigger.exists(wouldRows > _) ||
              maxBytesPerTrigger.exists(wouldBytes > _)
            if (over && end > last) done = true
            else {
              end += 1; rows = wouldRows; bytes = wouldBytes
              if (over) done = true
            }
          }
          end
        case _ => countCapped
      }
      SnapOffset(capped)
    }

  /** Batch rows under the STREAM's schema: a column the batch's
    * recorded contract predates reads as a typed null and a
    * since-widened type upcasts — a crash-restart can replay a batch
    * written BEFORE a widening against a stream constructed AFTER it,
    * and the replay must project exactly like the batch read path
    * projects pre-widening files. */
  private def projected(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val present = df.columns.toSet
    df.select(schema.fields.toSeq.map { fd =>
      if (present(fd.name)) {
        val from = df.schema(fd.name).dataType
        // a type that WIDENED under the running stream must fail loudly:
        // casting the batch's long rows down to the stream's int would
        // silently corrupt values past 2^31 (the buildScan drift rule)
        if (from != fd.dataType &&
          !org.apache.spark.sql.catalyst.expressions.Cast
            .canUpCast(from, fd.dataType))
          throw new IllegalStateException(
            s"column '${fd.name}' widened ${fd.dataType.sql} -> " +
              s"${from.sql} under the running stream — restart the " +
              "stream to pick up the widened contract (the checkpoint " +
              "stays valid)")
        col(s"`${fd.name.replace("`", "``")}`")
          .cast(fd.dataType).as(fd.name)
      } else lit(null).cast(fd.dataType).as(fd.name)
    }: _*)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endId = idOf(end)
    lastDelivered = Some(endId)
    // a checkpoint that fell behind the retention window cannot replay —
    // either lane (a WAL-replayed bootstrap pins asOf=endId; an
    // incremental batch walks (start, end]) needs manifests Snapshots
    // .expire may have reclaimed. Name the real condition instead of the
    // missing-manifest error deep inside read/diff.
    def assertRetained(neededFrom: Int, what: String): Unit =
      Snapshots.earliestRetainedSnapshot(spark, root)
        .filter(_ > neededFrom)
        .foreach(earliest => throw new IllegalStateException(
          s"stream checkpoint is STALE: its $what needs s$neededFrom but " +
            s"Snapshots.expire has reclaimed the manifests to replay it " +
            s"(earliest retained is s$earliest) — widen the dataset's " +
            "retention relative to the stream's trigger cadence, or " +
            "restart with a fresh checkpoint to re-bootstrap from the " +
            "full state"))
    val batch = start match {
      case None =>
        // bootstrap: the full state at the first observed offset — a
        // crash between the WAL write and the commit replays THIS batch
        // pinned at endId, which must still be retained
        assertRetained(endId, "bootstrap replay")
        projected(Snapshots.read(spark, root, asOf = Some(endId)))
      case Some(s0) =>
        val startId = idOf(s0)
        if (startId < endId)
          assertRetained(startId, s"incremental replay from s$startId")
        // one shared manifest cache across the whole span — a stream
        // catching up over a long gap must not re-walk delta chains per
        // id (gap × chainDepth manifest reads instead of O(gap))
        val parts = Snapshots.addedSinceBatches(spark, root, startId,
          endId, onNonAppend = { (id, mode) =>
            if (!skipNonAppend) throw new IllegalStateException(
              s"snapshot s$id mode '$mode' under $root is not an append " +
                "— an incremental append stream cannot represent it; " +
                "consume row-level diffs via Snapshots.changes, or opt " +
                "into option(\"onNonAppend\", \"skip\") if dropping it " +
                "is acceptable")
          }).map(projected)
        parts.reduceOption(_ union _).getOrElse(
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
    }
    // the micro-batch engine requires a STREAMING-flagged plan; the
    // batch's own (already optimized) plan executes beneath it
    org.apache.spark.sql.graft.GraftSqlBridge.asStreamingFrame(spark, batch)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotStreamSource[$root]"
}
