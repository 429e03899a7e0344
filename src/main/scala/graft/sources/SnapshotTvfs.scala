package graft.sources

import graft.sink.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types.StringType

/**
 * Table-valued SQL functions over snapshot METADATA — the operational
 * reads as plain SQL (the Delta `DESCRIBE HISTORY` role, via Spark's
 * standard `injectTableFunction` extension point, no custom parser):
 *
 * {{{
 *   SELECT * FROM graft_history('/data/events')
 *   SELECT * FROM graft_snapshot_log('/data/events')
 *   SELECT * FROM graft_partition_stats('/data/events')
 * }}}
 *
 * Each resolves at ANALYSIS time into a [[LocalRelation]] over the
 * manifest-answered frame — sound because these reads are
 * metadata-cost and metadata-SIZED by construction (rows ≤ retained
 * snapshots / live partitions / live files; no data file is opened —
 * and the per-FILE inventory is no larger than the resolved manifest
 * the driver already holds to plan ANY read), so materializing them
 * driver-side is exactly what the underlying API does anyway. The
 * argument must be one string literal (the dataset root): a
 * non-literal cannot be evaluated during resolution and fails loudly.
 */
object SnapshotTvfs {

  /** (name, description, metadata read) — what [[graft.GraftExtensions]]
    * registers. */
  val functions: Seq[(String, String, (SparkSession, String) => DataFrame)] =
    Seq(
      ("graft_history",
        "per retained snapshot: id, mode, live files/partitions, current",
        (s, r) => Snapshots.history(s, r)),
      ("graft_snapshot_log",
        "operational log: instants, spec, delete counts, rows, bytes",
        (s, r) => Snapshots.snapshotLog(s, r)),
      ("graft_partition_stats",
        "per-partition live files/rows/bytes from the manifest alone",
        (s, r) => Snapshots.partitionStats(s, r)),
      ("graft_files",
        "per-live-file inventory: path, partition, adding snapshot, " +
          "rows, bytes",
        (s, r) => Snapshots.liveFiles(s, r)),
      ("graft_detail",
        "one-row dataset summary: current id, format, declarations, " +
          "live totals, pending deletes, ref counts",
        (s, r) => Snapshots.detail(s, r)))

  /** The injected resolution: one string-literal root → LocalRelation. */
  def resolve(
      name: String, read: (SparkSession, String) => DataFrame)(
      args: Seq[Expression]): LogicalPlan = {
    val root = args match {
      case Seq(l: Literal)
          if l.dataType == StringType && l.value != null =>
        l.value.toString
      case _ => throw new IllegalArgumentException(
        s"$name takes exactly one STRING LITERAL argument — the dataset " +
          "root (a computed argument cannot be evaluated while the query " +
          "is being resolved)")
    }
    val spark = SparkSession.active
    val df = read(spark, root)
    LocalRelation.fromExternalRows(
      DataTypeUtils.toAttributes(df.schema), df.collect().toSeq)
  }

  private def strLit(name: String, e: Expression, what: String): String =
    e match {
      case l: Literal if l.dataType == StringType && l.value != null =>
        l.value.toString
      case _ => throw new IllegalArgumentException(
        s"$name: $what must be a string literal")
    }

  private def intLit(name: String, e: Expression, what: String): Int =
    e match {
      // match the TYPES, not typeName strings — LongType.typeName is
      // "long", never "bigint", so name-matching silently rejected every
      // non-int integral literal
      case l: Literal if l.value != null && Seq(
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType,
          org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.ByteType).contains(l.dataType) =>
        // a bigint literal parses fine but must still FIT a snapshot id —
        // keep the named argument error, never a raw NumberFormatException
        val v = l.value.toString.toLong
        if (v < Int.MinValue || v > Int.MaxValue)
          throw new IllegalArgumentException(
            s"$name: $what must fit an integer snapshot id, got $v")
        v.toInt
      case _ => throw new IllegalArgumentException(
        s"$name: $what must be an integer literal")
    }

  /** A TIMESTAMP literal's epoch millis, if `e` is one — TimestampType,
    * or TimestampNTZType under `spark.sql.timestampType=TIMESTAMP_NTZ`
    * (interpreted under the session tz, the same instant the equivalent
    * TimestampType literal denotes). */
  private def tsMillis(
      spark: SparkSession, e: Expression): Option[Long] = e match {
    case l: Literal if l.value != null &&
        (l.dataType == org.apache.spark.sql.types.TimestampType ||
          l.dataType == org.apache.spark.sql.types.TimestampNTZType) =>
      val micros =
        if (l.dataType == org.apache.spark.sql.types.TimestampType)
          l.value.asInstanceOf[Long]
        else org.apache.spark.sql.catalyst.expressions.Cast(
          l, org.apache.spark.sql.types.TimestampType,
          Some(spark.sessionState.conf.sessionLocalTimeZone))
          .eval().asInstanceOf[Long]
      Some(micros / 1000L)
    case _ => None
  }

  /** A snapshot-id argument: an integral literal verbatim, or a
    * TIMESTAMP literal resolved against each manifest's RECORDED
    * publish instant ([[Snapshots.snapshotAt]] — the newest snapshot at
    * or before it; survives expire's rebase-in-place). */
  private def idArg(
      spark: SparkSession, name: String, root: String, e: Expression,
      what: String): Int =
    tsMillis(spark, e) match {
      case Some(ms) => Snapshots.snapshotAt(spark, root, ms).getOrElse(
        throw new IllegalArgumentException(
          s"$name: no retained snapshot published at or before the " +
            s"given $what timestamp under $root"))
      case None => intLit(name, e, what)
    }

  /** `SELECT * FROM graft_snapshot('root'[, asOf])` — TIME TRAVEL in
    * SQL without DataSourceV2's `VERSION AS OF` / `TIMESTAMP AS OF` (a
    * v1 relation cannot parse them): resolves to the REAL distributed
    * scan plan — manifest-pruned, merge-on-read applied, nothing
    * collected — so it composes, filters and joins like any relation.
    * `asOf` is a snapshot id, a `TIMESTAMP '...'` literal (resolved via
    * [[idArg]]), or a STRING literal naming a TAG (the retention-pinned
    * release-label read, [[Snapshots.readTag]]). */
  def resolveSnapshot(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    args match {
      case Seq(r) =>
        val root = strLit("graft_snapshot", r, "the dataset root")
        Snapshots.read(spark, root).queryExecution.logical
      case Seq(r, t: Literal)
          if t.dataType == StringType && t.value != null =>
        val root = strLit("graft_snapshot", r, "the dataset root")
        Snapshots.readTag(spark, root, t.value.toString)
          .queryExecution.logical
      case Seq(r, v) =>
        val root = strLit("graft_snapshot", r, "the dataset root")
        Snapshots.read(spark, root,
          asOf = Some(idArg(spark, "graft_snapshot", root, v, "asOf")))
          .queryExecution.logical
      case _ => throw new IllegalArgumentException(
        "graft_snapshot takes (root[, asOf snapshot id | TIMESTAMP | " +
          "'tag'])")
    }
  }

  /** `SELECT * FROM graft_changes('root', from, to, 'k1,k2')` — the
    * row-level CDC diff ([[Snapshots.changes]]: insert/delete/update
    * classification between two snapshots) as a SQL relation; the plan
    * is the real changed-partition-pruned join, never a collect. The
    * bounds are snapshot ids or `TIMESTAMP '...'` literals (resolved
    * against recorded publish instants — "what changed since
    * yesterday's run" without bookkeeping ids). */
  def resolveChanges(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val (root, from, to, keys) = args match {
      case Seq(r, f, t, k) =>
        val root = strLit("graft_changes", r, "the dataset root")
        (root,
          idArg(spark, "graft_changes", root, f, "fromId"),
          idArg(spark, "graft_changes", root, t, "toId"),
          strLit("graft_changes", k, "the comma-separated key columns")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      case _ => throw new IllegalArgumentException(
        "graft_changes takes (root, fromId, toId, 'key1,key2,...'); the " +
          "bounds may be TIMESTAMP literals")
    }
    Snapshots.changes(spark, root, from, to, keys)
      .queryExecution.logical
  }
}
