package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/**
 * The narrow bridge into Spark's `private[sql]` surface that SQL DML
 * routing needs — the established external-connector shim (Delta's SQL
 * extensions and the spark-redshift lineage ship the same sub-package
 * trick). Two entry points only, both driven by
 * [[graft.sources.SnapshotDmlRule]]:
 *
 *  - an analyzed `LogicalPlan` (a MERGE source) back into a DataFrame,
 *  - a catalyst `Expression` (a DELETE/UPDATE condition, attribute
 *    references unresolved back to bare names) into a user-facing
 *    [[Column]] — keeping literals INTERNAL end to end, so a timestamp
 *    bound is never re-parsed from a session-tz string (the
 *    DST-ambiguity rule the Bloom probe enforces).
 *
 * Nothing else may use this object: every other graft surface stays on
 * public Spark API.
 */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** A computed batch as a STREAMING-flagged frame — what a v1
    * streaming `Source.getBatch` must hand the micro-batch engine (the
    * Kafka-v1 pattern: the batch's own plan is already optimized; the
    * engine stacks the query's streaming operators on its rows). */
  def asStreamingFrame(spark: SparkSession, batch: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      batch.queryExecution.toRdd, batch.schema, isStreaming = true)
  }

  /** The inverse, for a v1 streaming `Sink.addBatch`: the engine hands a
    * STREAMING-flagged micro-batch frame that batch writers reject
    * ("must be executed with writeStream.start()") — re-wrap its
    * executed rows as an ordinary batch frame (Spark's own
    * ForeachBatchSink does exactly this). */
  def asBatchFrame(spark: SparkSession, data: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }
}
