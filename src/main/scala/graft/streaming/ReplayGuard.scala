package graft.streaming

import org.apache.spark.sql.DataFrame

/**
 * Content-derived replay identity for at-least-once micro-batch sinks.
 *
 * `foreachBatch` batch ids alone are NOT a safe replay key: they are scoped
 * to one checkpoint lineage, and a stream restarted without (or with a
 * fresh) checkpoint re-issues ids from 0 — an id-keyed dedup set then
 * silently DROPS real data that collides with a prior run's recorded ids.
 * The robust key is (batchId, content fingerprint): a genuine re-delivery
 * carries the same id AND the same rows, while a new lineage's id-0 batch
 * carries different rows and lands.
 *
 * The fingerprint is order-independent (micro-batch partitioning is not
 * deterministic across retries): the wrapping sum of per-row `xxhash64`
 * over all columns, mixed with the row count. One narrow scan of the
 * batch — batch-sized cost, no state, no shuffle beyond the final
 * two-value aggregate.
 */
private[graft] object ReplayGuard {

  def fingerprint(df: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    // sum in decimal(38,0): overflow-proof under ANSI mode at any batch
    // size; truncating to the low 64 bits afterwards IS the wrapping sum
    val r = df
      .select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
      .agg(sum(col("__h").cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n"))
      .head()
    val s = if (r.isNullAt(0)) 0L else r.getDecimal(0).toBigInteger.longValue()
    s ^ (r.getLong(1) * 0x9E3779B97F4A7C15L)
  }
}
