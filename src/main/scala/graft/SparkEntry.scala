package graft

import graft.sink._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.Files

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: dynamic-partitioned write (the reference's core capability,
    * SURVEY.md §0) — write orders partitioned by o_orderpriority, read the
    * tree back, count rows per partition. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft_entry").toString
    val orders = Tables(spark, dir, "orders")
    PartitionedSink.write(orders, out,
      SinkConfig(ParquetFormat, Seq("o_orderpriority"), Some("snappy"),
        runtimeNullCheck = true))
    PartitionedSink.readBack(spark, out)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_rows"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ extension
    * surface). Signature: (session, sfDir) => result DataFrame. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ SinkQueries.all ++ OpsQueries.all ++
      MmStreamQueries.all ++ RelationalQueries.all ++ PipelineQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables, resolved for a given SF dir: the seven
    * side-input oracles read this JVM's per-run export root
    * ([[OpsQueries.sideRoot]]) at the SF actually being verified —
    * selfcheck is meaningful at sf0.001/0.01/0.1 alike, and a concurrent
    * JVM on the same corpus can never swap an export between a Verify run
    * and its DuckDB compare. Omit for non-SQL-expressible ops. */
  def oracleSqlFor(sfDir: String): Map[String, String] = {
    val sfBase = new java.io.File(sfDir).getName
    (CoreQueries.oracles ++ SinkQueries.oracles ++ OpsQueries.oracles ++
      MmStreamQueries.oracles ++ RelationalQueries.oracles ++ PipelineQueries.oracles)
      .view.mapValues(_
        .replace("__SIDEROOT__", OpsQueries.sideRoot)
        .replace("__SFBASE__", sfBase))
      .toMap
  }

  /** Driver-contract form, resolved at the driver's sf0.01 oracle scale.
    * The seven side-input paths resolve against THIS JVM's export root —
    * the SQL is runnable once this JVM has executed the corresponding
    * queries (exactly the Verify flow, which dumps this map alongside the
    * exports it just wrote); a different JVM must use its own dump. */
  def oracleSql: Map[String, String] = oracleSqlFor("/root/testdata/sf0.01")
}
