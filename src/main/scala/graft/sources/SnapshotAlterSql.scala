package graft.sources

import graft.sink.Snapshots
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/**
 * `ALTER TABLE <snapshot table> RENAME COLUMN a TO b`,
 * `ALTER TABLE <snapshot table> DROP COLUMN c` / `DROP COLUMNS (a, b)`
 * and `ALTER TABLE <snapshot table> ALTER COLUMN c TYPE <widerType>`
 * — the ALTERs Spark's session catalog hard-rejects for v1 tables
 * ("only supported with v2 tables") BEFORE any extension resolution
 * rule can run, so (like the static `INSERT ... PARTITION` and `CALL`
 * lanes) they intercept at the PARSER and route to the engine's
 * metadata-only column-mapping events: [[Snapshots.renameColumn]] /
 * [[Snapshots.dropColumn]] — zero bytes moved, old files read through
 * the manifest's rename ledger, old snapshots time-travel under the
 * old shape. Non-snapshot tables pass through untouched (Spark's own
 * v2 error stands for them). `IF EXISTS` is not supported — evolution
 * events are deliberate; a missing column aborts naming the contract.
 */
private[sources] object SnapshotAlterSql {
  import SnapshotMaintenanceSql.{containsIgnoreCase, splitArgs, stripComments}

  private val Ident = """(?:[A-Za-z_][A-Za-z0-9_]*|`(?:[^`]|``)+`)"""
  private val RenameRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($Ident(?:\\.$Ident)?)\\s+RENAME""" +
      s"""\\s+COLUMN\\s+($Ident)\\s+TO\\s+($Ident)\\s*;?\\s*$$""").r
  private val DropRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($Ident(?:\\.$Ident)?)\\s+DROP""" +
      """\s+COLUMNS?\s+(.+?)\s*;?\s*$""").r
  private val TypeRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($Ident(?:\\.$Ident)?)\\s+""" +
      s"""(?:ALTER|CHANGE)\\s+COLUMN\\s+($Ident)\\s+TYPE\\s+""" +
      """(.+?)\s*;?\s*$""").r

  def intercept(
      session: SparkSession, delegate: ParserInterface,
      sqlText: String): Option[LogicalPlan] = {
    if (!containsIgnoreCase(sqlText, "alter") ||
      !containsIgnoreCase(sqlText, "column")) return None
    val stripped = stripComments(sqlText)
    stripped match {
      case RenameRe(table, from, to) =>
        onSnapshotTable(session, delegate, table).map { _ =>
          SnapshotRenameColumnCommand(table,
            one(delegate, from, "RENAME COLUMN"),
            one(delegate, to, "RENAME COLUMN"))
        }
      case TypeRe(table, column, typeText) =>
        onSnapshotTable(session, delegate, table).map { _ =>
          val dt =
            try delegate.parseDataType(typeText)
            catch {
              case scala.util.control.NonFatal(e) =>
                throw new IllegalArgumentException(
                  s"ALTER COLUMN ... TYPE: cannot parse type " +
                    s"'$typeText'", e)
            }
          SnapshotWidenColumnCommand(table,
            one(delegate, column, "ALTER COLUMN"), dt)
        }
      case DropRe(table, colsText) =>
        onSnapshotTable(session, delegate, table).map { _ =>
          val inner = colsText.trim match {
            case t if t.startsWith("(") && t.endsWith(")") =>
              t.substring(1, t.length - 1)
            case t => t
          }
          val cols = splitArgs(inner).map(one(delegate, _, "DROP COLUMN"))
          require(cols.nonEmpty, "DROP COLUMN needs at least one column")
          SnapshotDropColumnCommand(table, cols)
        }
      case _ => None
    }
  }

  /** Some(()) when `table` is a registered snapshot table — everything
    * else (missing, temp view, other providers) delegates untouched. */
  private def onSnapshotTable(
      session: SparkSession, delegate: ParserInterface,
      table: String): Option[Unit] =
    try {
      val ident = delegate.parseTableIdentifier(table)
      val meta = session.sessionState.catalog.getTableMetadata(ident)
      if (GraftCatalog.isSnapshotTable(meta)) Some(()) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  private def one(
      delegate: ParserInterface, raw: String, what: String): String = {
    val parts =
      try delegate.parseMultipartIdentifier(raw.trim)
      catch {
        case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"$what: '$raw' is not a column identifier", e)
      }
    require(parts.length == 1,
      s"$what targets a top-level column, got: $raw")
    parts.head
  }
}

/** Shared run-time resolution of the ALTER column commands: re-resolve
  * the table (pin check — every pin rejects: time-travel pins are
  * read-only views, and a branch's files carry fork-time physical
  * names the LIVE ledger must not re-map), call the engine, refresh
  * the relation cache so the very next SELECT sees the new contract. */
private[sources] object SnapshotAlterRun {
  def resolveRoot(session: SparkSession, table: String): String = {
    val ident = session.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    require(GraftCatalog.isSnapshotTable(meta),
      s"$table is no longer a graft snapshot table")
    GraftCatalog.pinnedOption(meta).foreach(p =>
      throw new UnsupportedOperationException(
        s"cannot ALTER the $p-pinned table $table — schema evolution " +
          "publishes to the live dataset; alter the unpinned table"))
    GraftCatalog.rootOf(meta, table)
  }

  /** Push the engine's current contract into the metastore's stored
    * copy and drop the cached relation, so the very next SELECT
    * resolves the post-ALTER shape. The EXTERNAL catalog is written
    * directly: `SessionCatalog.alterTableDataSchema` refuses any
    * schema that loses a column (the ADD-COLUMNS-only guard), which
    * is exactly what a rename/drop does — the engine already holds
    * the authoritative contract, the metastore copy merely mirrors
    * it for resolution-time column checks. */
  def syncCatalog(session: SparkSession, table: String, root: String): Unit = {
    val catalog = session.sessionState.catalog
    val ident = session.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = catalog.getTableMetadata(ident)
    catalog.externalCatalog.alterTableDataSchema(
      meta.identifier.database.getOrElse(catalog.getCurrentDatabase),
      meta.identifier.table, Snapshots.tableSchema(session, root))
    session.catalog.refreshTable(table)
  }
}

/** `ALTER TABLE t RENAME COLUMN a TO b` ≡ [[Snapshots.renameColumn]]. */
case class SnapshotRenameColumnCommand(table: String, from: String, to: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val root = SnapshotAlterRun.resolveRoot(session, table)
    Snapshots.renameColumn(session, root, from, to): Unit
    SnapshotAlterRun.syncCatalog(session, table, root)
    Seq.empty
  }
}

/** `ALTER TABLE t ALTER COLUMN c TYPE <type>` ≡
  * [[Snapshots.widenColumn]] — only the lossless promotion chains the
  * evolution gate admits; metadata-only. */
case class SnapshotWidenColumnCommand(
    table: String, column: String,
    newType: org.apache.spark.sql.types.DataType)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val root = SnapshotAlterRun.resolveRoot(session, table)
    Snapshots.widenColumn(session, root, column, newType): Unit
    SnapshotAlterRun.syncCatalog(session, table, root)
    Seq.empty
  }
}

/** `ALTER TABLE t DROP COLUMN(S) ...` ≡ [[Snapshots.dropColumns]] —
  * the engine validates the WHOLE list (existence, partition columns,
  * delete keys, constraint references) before publishing ONE atomic
  * `drop_column` snapshot, so a mid-list refusal applies nothing. */
case class SnapshotDropColumnCommand(table: String, columns: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val root = SnapshotAlterRun.resolveRoot(session, table)
    Snapshots.dropColumns(session, root, columns): Unit
    SnapshotAlterRun.syncCatalog(session, table, root)
    Seq.empty
  }
}
