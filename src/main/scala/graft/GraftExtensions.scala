package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * Library entry point for Spark's standard extension mechanism:
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 * }}}
 *
 * installs every native graft SQL function (minhash_signature, simhash64,
 * word_tokens, word_ngrams, dot_product, cosine_similarity,
 * sorted_intersect_count) into each session built on the cluster — no
 * per-session `registerSql` call needed — plus the ROW-LEVEL SQL rule for
 * registered snapshot tables ([[graft.sources.SnapshotDmlRule]]):
 * `DELETE FROM` / `UPDATE` / canonical `MERGE INTO` route to
 * `Snapshots.deleteWhere` / `updateWhere` / `mergeUpsert`. This is the
 * deployment path for shared clusters / SQL-only users; the Column API
 * ([[graft.functions.hashes]] / [[graft.functions.vectors]]) needs no
 * installation at all, and sessions without the extension keep every
 * non-DML snapshot-table capability (the rule only ADDS statements).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.SqlFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // post-hoc: the DML plans must be fully column-resolved before the
    // rewrite, and the rewrite must land before Spark's v2-only check
    // rejects them
    ext.injectPostHocResolutionRule(session =>
      new graft.sources.SnapshotDmlRule(session))
    // the four maintenance statements (CALL graft_maintain/compact/
    // expire/vacuum) — a narrow parser delegate; everything else passes
    // through to Spark's parser untouched
    ext.injectParser((session, delegate) =>
      new graft.sources.GraftSqlParser(session, delegate))
    // metadata table-valued functions: SELECT * FROM graft_history(root)
    graft.sources.SnapshotTvfs.functions.foreach {
      case (name, _, read) =>
        ext.injectTableFunction((
          FunctionIdentifier(name),
          new ExpressionInfo(classOf[GraftExtensions].getName, name),
          graft.sources.SnapshotTvfs.resolve(name, read) _))
    }
    // time travel and row-level CDC as SQL relations — these resolve to
    // the REAL distributed plans (manifest-pruned scan / changed-
    // partition-pruned diff join), never a collect
    ext.injectTableFunction((
      FunctionIdentifier("graft_snapshot"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_snapshot"),
      graft.sources.SnapshotTvfs.resolveSnapshot _))
    ext.injectTableFunction((
      FunctionIdentifier("graft_changes"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_changes"),
      graft.sources.SnapshotTvfs.resolveChanges _))
  }
}
