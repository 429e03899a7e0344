package graft.sources

import graft.sink.Snapshots
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
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
 * snapshot id — a time-travel table), `tag` (pin a named tag),
 * `partitionBy` (comma-separated — required only when a WRITE creates
 * the dataset; afterwards the recorded spec governs).
 *
 * Writes route through [[Snapshots.write]] — the API that owns the
 * commit protocol — in two SQL-native shapes: `INSERT INTO` /
 * `INSERT OVERWRITE` on a registered table ([[InsertableRelation]]:
 * append / dynamic partition overwrite, exactly the sink's
 * CREATE_OR_APPEND semantics made non-destructive), and
 * `df.write.format("graft-snapshot")` ([[CreatableRelationProvider]]:
 * SaveMode.Append / Overwrite map the same way; ErrorIfExists / Ignore
 * honor existing state). Time-travel-pinned tables are read-only views
 * of history and reject inserts loudly.
 */
class SnapshotSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  private case class Opts(
      root: String, asOf: Option[Int], tag: Option[String],
      partitionBy: Seq[String], statsColumns: Seq[String],
      bloomColumns: Seq[String])

  private def parse(parameters: Map[String, String]): Opts = {
    val byLower = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = byLower.getOrElse("path", byLower.getOrElse("root",
      throw new IllegalArgumentException(
        "graft-snapshot needs the dataset root: LOCATION '<root>' (or a " +
          "path/root option)")))
    val asOf = byLower.get("asof").map(_.trim.toInt)
    val tag = byLower.get("tag")
    require(asOf.isEmpty || tag.isEmpty,
      "asOf and tag are mutually exclusive")
    def cols(key: String): Seq[String] = byLower.get(key).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    Opts(root, asOf, tag, cols("partitionby"), cols("statscolumns"),
      cols("bloomcolumns"))
  }

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val o = parse(parameters)
    new SnapshotRelation(sqlContext, o.root, o.asOf, o.tag)
  }

  /** `df.write.format("graft-snapshot")` — lands one snapshot through
    * the full write discipline (staging, stats, schema-evolution gate,
    * atomic pointer flip). `statsColumns`/`bloomColumns` options declare
    * the skipping metadata at dataset CREATION (afterwards they are
    * dataset-fixed — a conflicting redeclaration fails loudly, matching
    * the Snapshots API). */
  override def createRelation(
      sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val o = parse(parameters)
    require(o.asOf.isEmpty && o.tag.isEmpty,
      "cannot write through a time-travel-pinned (asOf/tag) reference — " +
        "it is a read-only view of history")
    val spark = sqlContext.sparkSession
    val root = o.root
    val existing = Snapshots.currentSnapshot(spark, root)
    val fields = existing match {
      case Some(_) =>
        val recorded = SnapshotSource.recordedPartitioning(spark, root)
        require(o.partitionBy.isEmpty || o.partitionBy == recorded,
          s"dataset at $root is partitioned by ${recorded.mkString(",")}; " +
            s"cannot write under ${o.partitionBy.mkString(",")}")
        recorded
      case None =>
        require(o.partitionBy.nonEmpty,
          "creating a snapshot dataset through the writer needs " +
            "partitionBy (comma-separated partition fields)")
        o.partitionBy
    }
    def land(m: Snapshots.SnapshotMode): Unit =
      Snapshots.write(data, root, fields, m,
        statsColumns = o.statsColumns, bloomColumns = o.bloomColumns): Unit
    mode match {
      case SaveMode.Append => land(Snapshots.SnapAppend)
      case SaveMode.Overwrite => land(Snapshots.SnapOverwritePartitions)
      case SaveMode.ErrorIfExists =>
        existing.foreach(id => throw new IllegalStateException(
          s"dataset at $root already exists (current s$id) and " +
            "SaveMode is ErrorIfExists"))
        land(Snapshots.SnapAppend)
      case SaveMode.Ignore =>
        if (existing.isEmpty) land(Snapshots.SnapAppend)
    }
    new SnapshotRelation(sqlContext, root, None, None)
  }
}

object SnapshotSource {
  /** The partition spec the dataset records (the current manifest's
    * `partitionby=` line) — what `INSERT INTO` writes route under. */
  private[sources] def recordedPartitioning(
      spark: org.apache.spark.sql.SparkSession, root: String): Seq[String] = {
    val spec = Snapshots.recordedPartitionCols(spark, root)
    require(spec.nonEmpty,
      s"dataset at $root predates recorded partition specs — one write " +
        "through the Snapshots API pins it before SQL inserts can route")
    spec
  }
}

class SnapshotRelation(
    val sqlContext: SQLContext, root: String, asOf: Option[Int],
    tag: Option[String])
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

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

  // Catalyst may consult stats several times while planning one query —
  // memoize the chain resolution keyed by the pointer value, so each
  // stats call past the first costs one small pointer read (and stays
  // publish-current)
  @volatile private var sizeMemo: Option[(Option[Int], Long)] = None

  /** Recorded live byte size from the manifest (no filesystem walk), so
    * Catalyst can broadcast a small snapshot table; datasets predating
    * byte recording fall back to the conservative session default. */
  override def sizeInBytes: Long = {
    val cur = pinnedId.orElse(Snapshots.currentSnapshot(spark, root))
    sizeMemo match {
      case Some((id, bytes)) if id == cur => bytes
      case _ =>
        val bytes = Snapshots.liveDataBytes(spark, root, cur)
          .getOrElse(super.sizeInBytes)
        sizeMemo = Some((cur, bytes))
        bytes
    }
  }

  /** All filters are also evaluated inside the assembled scan (and
    * re-checked by Spark above it) — this relation uses them for
    * file-level skipping, never as the sole evaluator. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  /** `INSERT INTO` (append) / `INSERT OVERWRITE` (dynamic partition
    * overwrite) on a registered table — routed under the RECORDED
    * partition spec through the full snapshot write discipline. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(asOf.isEmpty && tag.isEmpty,
      "cannot INSERT into a time-travel-pinned (asOf/tag) table — it is " +
        "a read-only view of history")
    val fields = SnapshotSource.recordedPartitioning(spark, root)
    val mode =
      if (overwrite) Snapshots.SnapOverwritePartitions
      else Snapshots.SnapAppend
    Snapshots.write(data, root, fields, mode): Unit
  }

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
