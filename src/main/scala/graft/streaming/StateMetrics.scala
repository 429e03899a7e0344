package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * State-store health surface for long-running stateful streams.
 *
 * At 100 TB-scale ingest the operational failure mode of stateful
 * streaming is not wrong results, it is UNBOUNDED STATE: a missing or
 * too-lax watermark, a key-cardinality explosion, or an eviction bug
 * grows `numRowsTotal` monotonically until executors spill and die —
 * long after the deploy that caused it. Spark already measures every
 * state store per micro-batch ([[org.apache.spark.sql.streaming.StateOperatorProgress]]);
 * this surface flattens those progress events into a queryable frame so
 * a pipeline can alert on state growth and watermark-eviction efficacy
 * (rows removed vs rows added) the same way it queries any other table,
 * and assert bounded state in CI (see `StateMetricsSpec`).
 */
object StateMetrics {

  /** One state operator × one micro-batch. */
  case class StateOpProgress(
      batch_id: Long,
      operator: String,
      num_rows_total: Long,
      num_rows_updated: Long,
      num_rows_removed: Long,
      rows_dropped_by_watermark: Long,
      memory_used_bytes: Long,
      num_state_store_instances: Long,
      commit_time_ms: Long)

  /** Flatten a query's retained progress history (bounded by
    * `spark.sql.streaming.numRecentProgressUpdates`, default 100 — O(1)
    * driver memory regardless of stream lifetime) into per-operator
    * per-batch rows, oldest first. */
  def stateOperatorProgress(q: StreamingQuery): Seq[StateOpProgress] =
    q.recentProgress.toSeq.flatMap { p =>
      p.stateOperators.toSeq.map { so =>
        StateOpProgress(
          p.batchId, so.operatorName, so.numRowsTotal, so.numRowsUpdated,
          so.numRowsRemoved, so.numRowsDroppedByWatermark, so.memoryUsedBytes,
          so.numStateStoreInstances, so.commitTimeMs)
      }
    }

  /** The same history as a DataFrame, for joining against other
    * monitoring tables or writing through the partitioned sink. */
  def stateMetrics(spark: SparkSession, q: StreamingQuery): DataFrame = {
    import spark.implicits._
    stateOperatorProgress(q).toDF()
  }

  /** Latest per-operator snapshot: the numbers an alert would page on. */
  def latestByOperator(q: StreamingQuery): Map[String, StateOpProgress] =
    stateOperatorProgress(q).groupBy(_.operator)
      .map { case (op, rows) => op -> rows.maxBy(_.batch_id) }
}
