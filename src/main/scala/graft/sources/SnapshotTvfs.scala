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
 * snapshots / live partitions; no data file is opened), so
 * materializing them driver-side is exactly what the underlying API
 * does anyway. The argument must be one string literal (the dataset
 * root): a non-literal cannot be evaluated during resolution and
 * fails loudly.
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
        (s, r) => Snapshots.partitionStats(s, r)))

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

  /** `SELECT * FROM graft_snapshot('root'[, asOf])` — TIME TRAVEL in
    * SQL without DataSourceV2's `VERSION AS OF` / `TIMESTAMP AS OF` (a
    * v1 relation cannot parse them): resolves to the REAL distributed
    * scan plan — manifest-pruned, merge-on-read applied, nothing
    * collected — so it composes, filters and joins like any relation.
    * `asOf` is a snapshot id, or a `TIMESTAMP '...'` literal resolved
    * against each manifest's RECORDED publish instant
    * ([[Snapshots.snapshotAt]] — the newest snapshot at or before it). */
  def resolveSnapshot(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val (root, asOf) = args match {
      case Seq(r) => (strLit("graft_snapshot", r, "the dataset root"), None)
      case Seq(r, v) =>
        val root = strLit("graft_snapshot", r, "the dataset root")
        val id = v match {
          // TIMESTAMP literals parse as TimestampType, or as
          // TimestampNTZType under spark.sql.timestampType=TIMESTAMP_NTZ
          // — accept both (NTZ interprets under the session tz, the same
          // instant the equivalent TimestampType literal denotes)
          case l: Literal if l.value != null &&
              (l.dataType == org.apache.spark.sql.types.TimestampType ||
                l.dataType == org.apache.spark.sql.types.TimestampNTZType) =>
            val tz = spark.sessionState.conf.sessionLocalTimeZone
            val micros =
              if (l.dataType == org.apache.spark.sql.types.TimestampType)
                l.value.asInstanceOf[Long]
              else org.apache.spark.sql.catalyst.expressions.Cast(
                l, org.apache.spark.sql.types.TimestampType, Some(tz))
                .eval().asInstanceOf[Long]
            Snapshots.snapshotAt(spark, root, micros / 1000L).getOrElse(
              throw new IllegalArgumentException(
                s"graft_snapshot: no retained snapshot published at or " +
                  s"before the given timestamp under $root"))
          case _ => intLit("graft_snapshot", v, "asOf")
        }
        (root, Some(id))
      case _ => throw new IllegalArgumentException(
        "graft_snapshot takes (root[, asOf snapshot id | TIMESTAMP])")
    }
    Snapshots.read(spark, root, asOf = asOf).queryExecution.logical
  }

  /** `SELECT * FROM graft_changes('root', from, to, 'k1,k2')` — the
    * row-level CDC diff ([[Snapshots.changes]]: insert/delete/update
    * classification between two snapshots) as a SQL relation; the plan
    * is the real changed-partition-pruned join, never a collect. */
  def resolveChanges(args: Seq[Expression]): LogicalPlan = {
    val (root, from, to, keys) = args match {
      case Seq(r, f, t, k) =>
        (strLit("graft_changes", r, "the dataset root"),
          intLit("graft_changes", f, "fromId"),
          intLit("graft_changes", t, "toId"),
          strLit("graft_changes", k, "the comma-separated key columns")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      case _ => throw new IllegalArgumentException(
        "graft_changes takes (root, fromId, toId, 'key1,key2,...')")
    }
    Snapshots.changes(SparkSession.active, root, from, to, keys)
      .queryExecution.logical
  }
}
