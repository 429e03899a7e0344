package graft.sources

import graft.sink.Snapshots
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{StructType, TimestampType}

/**
 * Catalog-facing read connector for [[Snapshots]] datasets — what makes a
 * snapshot landing zone a plain SQL table (`SELECT ... FROM db.tbl`,
 * `spark.read.format("graft-snapshot").load(root)`) without callers going
 * through `Snapshots.read`.
 *
 * Shape: the classic external-connector RelationProvider (the public
 * spark-avro / spark-redshift pattern), NOT a directory scan — a snapshot
 * dataset's `data/` tree holds files from EVERY retained snapshot, so only
 * the manifest knows which are live. Per query:
 *
 *  - the CURRENT snapshot resolves at [[SnapshotRelation.buildScan]] time,
 *    so a cached catalog relation still sees every new publish (the
 *    pointer flip is the refresh; no `REFRESH TABLE` needed for data),
 *  - pushed filters drive FILE-LEVEL DATA SKIPPING (recorded min/max +
 *    null counts → [[Snapshots.StatRange]]s) and are re-applied inside the
 *    assembled scan, where Catalyst pushes them down to the parquet/orc
 *    reader as usual (partition pruning included),
 *  - column pruning projects before handing back rows,
 *  - `needConversion = false`: the underlying columnar scan's InternalRows
 *    flow through without a per-row Row conversion.
 *
 * Options: `path` (the dataset root — set by `LOCATION`), `asOf` (pin a
 * snapshot id — a time-travel table), `tag` (pin a named tag). Writes go
 * through the [[Snapshots]] API, which owns the commit protocol — this
 * source is deliberately read-only.
 */
class SnapshotSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val byLower = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = byLower.getOrElse("path", byLower.getOrElse("root",
      throw new IllegalArgumentException(
        "graft-snapshot needs the dataset root: LOCATION '<root>' (or a " +
          "path/root option)")))
    val asOf = byLower.get("asof").map(_.trim.toInt)
    val tag = byLower.get("tag")
    require(asOf.isEmpty || tag.isEmpty,
      "asOf and tag are mutually exclusive")
    new SnapshotRelation(sqlContext, root, asOf, tag)
  }
}

class SnapshotRelation(
    val sqlContext: SQLContext, root: String, asOf: Option[Int],
    tag: Option[String])
    extends BaseRelation with PrunedFilteredScan {

  private def spark = sqlContext.sparkSession

  private def pinnedId: Option[Int] =
    tag.map(t => graft.sink.Snapshots.tags(spark, root).getOrElse(t,
      throw new IllegalStateException(s"no tag '$t' under $root"))
    ).orElse(asOf)

  /** The recorded contract at registration/first-resolution time. A
    * schema WIDENING published later needs re-registration (or a fresh
    * relation) to surface the new columns; data stays current
    * regardless. */
  override val schema: StructType =
    Snapshots.tableSchema(spark, root, pinnedId)

  // rows come back as the assembled scan's InternalRows — no Row
  // round-trip (the documented external-connector fast path)
  override def needConversion: Boolean = false

  /** All filters are also evaluated inside the assembled scan (and
    * re-checked by Spark above it) — this relation uses them for
    * file-level skipping, never as the sole evaluator. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val prune = filters.toSeq.flatMap(toRanges)
    val base = tag match {
      case Some(t) => Snapshots.readTag(spark, root, t, prune = prune)
      case None => Snapshots.read(spark, root, asOf = asOf, prune = prune)
    }
    // hand the filters to Catalyst too: inside the assembled scan they
    // push down to the file reader (partition pruning, parquet predicate
    // pushdown) — file skipping above, row skipping below
    val filtered = filters.flatMap(toColumn).foldLeft(base)(_ filter _)
    val projected =
      if (requiredColumns.isEmpty) filtered.select()
      else filtered.select(requiredColumns.toSeq.map(c =>
        org.apache.spark.sql.functions.col(s"`${c.replace("`", "``")}`")): _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }

  /** Timestamp columns derive no RANGE (their recorded stat strings are
    * writer-session-tz renderings — the [[Snapshots.deleteWhere]] rule);
    * nullness pruning is count-based and stays. */
  private def tzSafe(col: String): Boolean =
    !schema.fields.exists(f => f.name == col && f.dataType == TimestampType)

  private def toRanges(f: Filter): Seq[Snapshots.StatRange] = f match {
    case And(l, r) => toRanges(l) ++ toRanges(r)
    case EqualTo(c, v) if v != null && tzSafe(c) =>
      Seq(Snapshots.StatRange(c, Some(v), Some(v)))
    case GreaterThan(c, v) if v != null && tzSafe(c) =>
      Seq(Snapshots.StatRange(c, Some(v), None))
    case GreaterThanOrEqual(c, v) if v != null && tzSafe(c) =>
      Seq(Snapshots.StatRange(c, Some(v), None))
    case LessThan(c, v) if v != null && tzSafe(c) =>
      Seq(Snapshots.StatRange(c, None, Some(v)))
    case LessThanOrEqual(c, v) if v != null && tzSafe(c) =>
      Seq(Snapshots.StatRange(c, None, Some(v)))
    case IsNull(c) => Seq(Snapshots.StatRange(c, nullness = Some(true)))
    case IsNotNull(c) => Seq(Snapshots.StatRange(c, nullness = Some(false)))
    case _ => Seq.empty
  }

  /** Source filters back to Column predicates for in-scan pushdown —
    * best-effort (an unconverted filter is still applied by Spark above
    * the scan). */
  private def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    def q(c: String) = col(s"`${c.replace("`", "``")}`")
    f match {
      case EqualTo(c, v) => Some(q(c) === lit(v))
      case GreaterThan(c, v) => Some(q(c) > lit(v))
      case GreaterThanOrEqual(c, v) => Some(q(c) >= lit(v))
      case LessThan(c, v) => Some(q(c) < lit(v))
      case LessThanOrEqual(c, v) => Some(q(c) <= lit(v))
      case IsNull(c) => Some(q(c).isNull)
      case IsNotNull(c) => Some(q(c).isNotNull)
      case In(c, vs) => Some(q(c).isin(vs.toSeq: _*))
      case StringStartsWith(c, p) => Some(q(c).startsWith(p))
      case And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
      case Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
      case Not(x) => toColumn(x).map(!_)
      case _ => None
    }
  }
}
