package graft.sources

import graft.sink.Snapshots
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, AttributeSet, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.GraftSqlBridge

/**
 * ROW-LEVEL SQL over registered snapshot tables: `DELETE FROM`,
 * `UPDATE`, and the canonical `MERGE INTO` shapes — the statements a
 * user of a GDPR-capable SQL table reaches for first. A classic
 * [[org.apache.spark.sql.sources.RelationProvider]] cannot intercept
 * them (Spark fails v1 relations in its v2-only check), so this
 * post-hoc resolution rule — injected by [[graft.GraftExtensions]], the
 * Delta-SQL-extensions pattern — rewrites the analyzed command into the
 * engine call that already owns the machinery:
 *
 *  - `DELETE FROM t WHERE c`  → [[Snapshots.deleteWhere]] (the
 *    stat+Bloom-narrowed, discovery-exact file-bounded copy-on-write)
 *  - `UPDATE t SET ... WHERE` → [[Snapshots.updateWhere]] (same rewrite
 *    narrowing, assignments applied to matching rows only)
 *  - `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *
 *    WHEN NOT MATCHED THEN INSERT *` → [[Snapshots.mergeUpsert]]; the
 *    delete-only form (`WHEN MATCHED THEN DELETE`) maps to the same
 *    call's delete lane. Non-canonical merges (clause conditions,
 *    partial assignment lists, NOT MATCHED BY SOURCE) abort loudly
 *    naming the supported shapes — never a silently different merge.
 *
 * Conditions cross from catalyst back to the Column API with attribute
 * references UNRESOLVED to bare names (they re-resolve by name against
 * the engine's own scans) and literals kept INTERNAL — a timestamp
 * bound is never re-rendered through a session-tz string, preserving
 * the exact-instant Bloom probe. Subqueries in DML conditions abort
 * loudly (materialize the list first). Non-snapshot tables pass
 * through untouched.
 */
class SnapshotDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(t, cond)
        if d.childrenResolved && cond.resolved =>
      snapshotTarget(t).fold(plan) { rel =>
        SnapshotDeleteCommand(rel.datasetRoot, rel.dmlBlockedReason,
          SnapshotDml.toEngineColumn(cond, "DELETE"))
      }
    case u @ UpdateTable(t, assignments, cond)
        if u.childrenResolved && assignments.forall(_.resolved) &&
          cond.forall(_.resolved) =>
      snapshotTarget(t).fold(plan) { rel =>
        SnapshotUpdateCommand(rel.datasetRoot, rel.dmlBlockedReason,
          SnapshotDml.toEngineColumn(
            cond.getOrElse(org.apache.spark.sql.catalyst.expressions
              .Literal.TrueLiteral), "UPDATE"),
          assignments.map(a => SnapshotDml.assignmentName(a) ->
            SnapshotDml.toEngineColumn(a.value, "UPDATE assignment")))
      }
    case m: MergeIntoTable if m.childrenResolved =>
      snapshotTarget(m.targetTable).fold(plan)(rel =>
        SnapshotDml.convertMerge(rel, m))
    case _ => plan
  }

  /** The snapshot relation behind a DML target, unwrapping alias/
    * projection shells the resolver adds. */
  private def snapshotTarget(p: LogicalPlan): Option[SnapshotRelation] =
    p match {
      case SubqueryAlias(_, child) => snapshotTarget(child)
      case lr: LogicalRelation => lr.relation match {
        case rel: SnapshotRelation => Some(rel)
        case _ => None
      }
      case _ => None
    }
}

private[sources] object SnapshotDml {

  /** Catalyst → Column with attributes unresolved back to bare names
    * (unique within the flat recorded contract, so the name round-trip
    * is lossless) and literals kept internal. */
  def toEngineColumn(e: Expression, what: String): Column = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"$what with a subquery is not supported on snapshot tables — " +
        "materialize the subquery (e.g. into an IN-list or a MERGE " +
        "source) first")
    GraftSqlBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  def assignmentName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case u: UnresolvedAttribute if u.nameParts.length == 1 =>
      u.nameParts.head
    case other => throw new UnsupportedOperationException(
      s"UPDATE target must be a top-level column, got: ${other.sql}")
  }

  private def unsupportedMerge(why: String): Nothing =
    throw new UnsupportedOperationException(
      s"this MERGE shape is not supported on snapshot tables ($why). " +
        "Supported: MERGE INTO t USING s ON t.k = s.k [AND ...] " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *, " +
        "or WHEN MATCHED THEN DELETE alone; for row-level CDC shapes " +
        "use Snapshots.mergeUpsert / mergeDeltas directly")

  /** The canonical-merge translation: extract same-named key equalities
    * from the ON condition, validate the clause shapes, and emit the
    * engine command. Loud on anything the upsert semantics cannot
    * represent exactly. */
  def convertMerge(rel: SnapshotRelation, m: MergeIntoTable): LogicalPlan = {
    val tOut = AttributeSet(m.targetTable.output)
    val sOut = AttributeSet(m.sourceTable.output)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val keyPairs = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tOut.contains(a) && sOut.contains(b) => (a.name, b.name)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if sOut.contains(b) && tOut.contains(a) => (a.name, b.name)
      case other => unsupportedMerge(
        s"ON must be a conjunction of target-key = source-key " +
          s"equalities, got: ${other.sql}")
    }
    keyPairs.find(p => p._1 != p._2).foreach(p => unsupportedMerge(
      s"key columns must share a name on both sides (got t.${p._1} = " +
        s"s.${p._2}) — alias the source column to ${p._1}"))
    val keys = keyPairs.map(_._1).distinct
    if (keys.isEmpty) unsupportedMerge("no key equality in ON")
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupportedMerge("WHEN NOT MATCHED BY SOURCE is not expressible " +
        "as an upsert")
    // `UPDATE SET *` may reach post-hoc either unexpanded (star action)
    // or expanded to per-column assignments — accept both, but ONLY the
    // full same-name copy (anything partial is not an upsert)
    def fullCopy(assigns: Seq[Assignment]): Boolean = {
      val pairs = assigns.map(a => (a.key, a.value) match {
        case (k: AttributeReference, v: AttributeReference)
            if tOut.contains(k) && sOut.contains(v) && k.name == v.name =>
          Some(k.name)
        case _ => None
      })
      pairs.forall(_.isDefined) &&
        pairs.flatten.toSet == m.targetTable.output.map(_.name).toSet
    }
    val deleteOnly = (m.matchedActions, m.notMatchedActions) match {
      case (Seq(DeleteAction(None)), Seq()) => true
      case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) =>
        false
      case (Seq(u: UpdateAction), Seq(i: InsertAction))
          if u.condition.isEmpty && i.condition.isEmpty &&
            fullCopy(u.assignments) && fullCopy(i.assignments) => false
      case (ma, na) => unsupportedMerge(
        s"matched=${ma.map(_.getClass.getSimpleName).mkString(",")} " +
          s"notMatched=${na.map(_.getClass.getSimpleName).mkString(",")}")
    }
    SnapshotMergeCommand(rel.datasetRoot, rel.dmlBlockedReason,
      m.sourceTable, keys, deleteOnly)
  }
}

/** `DELETE FROM <snapshot table> WHERE cond` — one published
  * copy-on-write snapshot through [[Snapshots.deleteWhere]]'s full
  * narrowing (derived StatRanges, Bloom probes, exact discovery). */
case class SnapshotDeleteCommand(
    root: String, blocked: Option[String], condition: Column)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    blocked.foreach(w => throw new UnsupportedOperationException(
      s"cannot DELETE FROM this table: $w"))
    Snapshots.deleteWhere(session, root,
      Snapshots.recordedPartitionCols(session, root), condition): Unit
    Seq.empty
  }
}

/** `UPDATE <snapshot table> SET ... [WHERE cond]` —
  * [[Snapshots.updateWhere]]'s file-bounded copy-on-write. */
case class SnapshotUpdateCommand(
    root: String, blocked: Option[String], condition: Column,
    assignments: Seq[(String, Column)])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    blocked.foreach(w => throw new UnsupportedOperationException(
      s"cannot UPDATE this table: $w"))
    Snapshots.updateWhere(session, root,
      Snapshots.recordedPartitionCols(session, root), condition,
      assignments): Unit
    Seq.empty
  }
}

/** Canonical `MERGE INTO` — [[Snapshots.mergeUpsert]] over the analyzed
  * source plan (per key: replace-or-insert, or delete-matched). */
case class SnapshotMergeCommand(
    root: String, blocked: Option[String], source: LogicalPlan,
    keys: Seq[String], deleteOnly: Boolean)
    extends LeafRunnableCommand {
  // the source plan is already analyzed; keep it visible in EXPLAIN
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans
    .QueryPlan[_]] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    blocked.foreach(w => throw new UnsupportedOperationException(
      s"cannot MERGE INTO this table: $w"))
    val fields = Snapshots.recordedPartitionCols(session, root)
    val src = GraftSqlBridge.ofRows(session, source)
    def q(c: String) = col(s"`${c.replace("`", "``")}`")
    if (deleteOnly) {
      // the upsert lane's routing select needs the partition columns
      // PRESENT on the updates frame even when every row is a delete
      // (a delete removes the key wherever it lives — the values are
      // never read); typed nulls satisfy the contract
      val schema = Snapshots.tableSchema(session, root)
      val updates = fields.foldLeft(
        src.select(keys.map(q): _*).distinct()) { (df, p) =>
          df.withColumn(p, lit(null).cast(schema(p).dataType))
        }.withColumn("__graft_merge_del", lit(true))
      Snapshots.mergeUpsert(session, root, updates, fields, keys,
        deleteCol = Some("__graft_merge_del")): Unit
    } else {
      val targetCols = Snapshots.tableSchema(session, root).fieldNames
      targetCols.foreach(c => require(src.columns.contains(c),
        s"MERGE source must carry every target column for UPDATE SET * " +
          s"/ INSERT * — missing '$c'"))
      Snapshots.mergeUpsert(session, root,
        src.select(targetCols.toSeq.map(q): _*), fields, keys): Unit
    }
    Seq.empty
  }
}
