package graft

import graft.sink._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.Files

/**
 * Dynamic-partitioned sink round-trips — the reference's core surface
 * (SURVEY.md §2.1 S1–S3, §2.2 P2–P4, §2.7 W1). Each query writes a table
 * through [[graft.sink.PartitionedSink]] into a fresh temp dir, reads the
 * partitioned tree back, and returns a deterministic projection. The oracle
 * applies the same partition-key semantics (stringify + trim,
 * `AvroDynamicPartitionedDatasetSink.java:119-120`) directly to the source
 * table: if partition routing, payload elision, or value normalization were
 * wrong, the round-trip would not hash-match.
 */
object SinkQueries {

  private def roundTrip(
      s: SparkSession, dir: String, fmt: SinkFormat, codec: Option[String]): DataFrame = {
    val out = Files.createTempDirectory(s"graft_sink_${fmt.name}").toString
    val orders = Tables(s, dir, "orders")
    val orcOpts =
      if (fmt == OrcFormat)
        Some(graft.schema.Validators.OrcOptions(
          compressionChunkSize = 262144, stripeSize = 67108864,
          indexStride = 10000, createIndex = true))
      else None
    PartitionedSink.write(orders, out,
      SinkConfig(fmt, Seq("o_orderpriority"), codec, orcOptions = orcOpts,
        runtimeNullCheck = true))
    PartitionedSink.readBack(s, out, fmt)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
  }

  private val ordersOracle =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  trim(cast(o_orderpriority as varchar)) AS o_orderpriority
      |FROM orders""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sink_parquet_partitioned" -> ((s, dir) => roundTrip(s, dir, ParquetFormat, Some("snappy"))),
    "sink_orc_partitioned" -> ((s, dir) => roundTrip(s, dir, OrcFormat, Some("zlib"))),
    "sink_avro_partitioned" -> ((s, dir) => roundTrip(s, dir, AvroFormat, Some("snappy"))),

    // Multi-field key: nested directory layers in declared order
    // (`PartitionedFileSetSinkConfig.java:128,133-147`). Verified by grouping
    // the read-back tree by its two partition columns.
    "sink_range_sharded" -> ((s, dir) => rangeShardRoundTrip(s, dir)),

    "sink_multifield_layout" -> ((s, dir) => {
      val out = Files.createTempDirectory("graft_sink_multi").toString
      val li = Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_returnflag", "l_linestatus")
      PartitionedSink.write(li, out,
        SinkConfig(ParquetFormat, Seq("l_returnflag", "l_linestatus"),
          runtimeNullCheck = true))
      PartitionedSink.readBack(s, out)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          (sum(round(col("l_quantity") * 100).cast("long")) / 100.0)
            .as("sum_qty"))
    }),
  )

  /** Range-sharded export round-trip (registered into [[all]] below):
    * content identity is the oracle; shard-file count and global ordering
    * are asserted in `SinkSurfaceSpec` (shard boundaries come from a
    * sampler, so the per-shard split is not oracle-stable — the content
    * is). */
  private def rangeShardRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_sink_range").toString
    PartitionedSink.writeRangeSharded(
      Tables(s, dir, "documents"), out, "doc_id", nShards = 8)
    s.read.parquet(out)
  }

  private def orcAvroOracle = ordersOracle

  val oracles: Map[String, String] = Map(
    "sink_parquet_partitioned" -> ordersOracle,
    "sink_orc_partitioned" -> orcAvroOracle,
    "sink_avro_partitioned" -> orcAvroOracle,
    "sink_range_sharded" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "sink_multifield_layout" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  cast(sum(cast(round(l_quantity * 100, 0) as bigint)) / 100.0 as double) AS sum_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
  )
}
