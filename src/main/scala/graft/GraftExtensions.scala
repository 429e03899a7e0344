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
 * per-session `registerSql` call needed. This is the deployment path for
 * shared clusters / SQL-only users; the Column API
 * ([[graft.functions.hashes]] / [[graft.functions.vectors]]) needs no
 * installation at all.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.SqlFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
