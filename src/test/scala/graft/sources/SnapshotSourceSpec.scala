package graft.sources

import graft.SparkSpec
import graft.sink.Snapshots
import graft.sink.Snapshots.{SnapAppend, SnapOverwritePartitions}
import org.apache.spark.sql.functions._

/** The catalog face of the snapshot table format: a metastore-registered
  * external table resolves the CURRENT manifest per scan (publish = the
  * refresh), supports time-travel pins, and prunes files from pushed
  * filters — against the suite's real Derby metastore, not asserted DDL
  * text. */
class SnapshotSourceSpec extends SparkSpec {

  private def orders = graft.Tables(spark, sf0001, "orders")
    .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")

  private def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("o_orderkey").collect().map(_.getLong(0)).toSet

  test("registerTable: SQL reads equal Snapshots.read and stay current across publishes") {
    val root = java.nio.file.Files.createTempDirectory("srcsnap_reg").toString
    Snapshots.write(orders, root, Seq("o_orderpriority"))
    Snapshots.registerTable(spark, root, "snap_reg_tbl")
    assert(keys(spark.sql("SELECT o_orderkey FROM snap_reg_tbl"))
      == keys(orders))
    // a publish AFTER registration is visible to the NEXT query with no
    // re-registration or REFRESH — the pointer flip is the refresh
    val ins = orders.filter(col("o_orderkey") % 10 === 2)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000L)
    Snapshots.write(ins, root, Seq("o_orderpriority"), SnapAppend)
    assert(keys(spark.sql("SELECT o_orderkey FROM snap_reg_tbl"))
      == keys(orders) ++ keys(ins))
    // an overwrite (logical replace) is equally current
    Snapshots.write(orders.filter(col("o_orderpriority") === "1-URGENT"
        && col("o_orderkey") % 2 === 0), root,
      Seq("o_orderpriority"), SnapOverwritePartitions)
    assert(keys(spark.sql("SELECT o_orderkey FROM snap_reg_tbl"))
      == keys(Snapshots.read(spark, root)))
    // aggregates and filters through plain SQL
    val viaSql = spark.sql(
      """SELECT o_orderpriority, count(*) AS n FROM snap_reg_tbl
        |WHERE o_orderkey % 2 = 0 GROUP BY o_orderpriority""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Snapshots.read(spark, root)
      .filter(col("o_orderkey") % 2 === 0)
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == direct)
    // DROP TABLE never touches the dataset (external semantics)
    spark.sql("DROP TABLE snap_reg_tbl")
    assert(keys(Snapshots.read(spark, root)).nonEmpty)
  }

  test("registerTable asOf pins a time-travel table; format reader and stat-skipping work") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("srcsnap_asof").toString
    Snapshots.write(
      Seq((1L, "a", 10.0), (2L, "a", 20.0)).toDF("k", "p", "v").coalesce(1),
      root, Seq("p"), statsColumns = Seq("k"))
    Snapshots.write(
      Seq((100L, "b", 30.0)).toDF("k", "p", "v").coalesce(1),
      root, Seq("p"), SnapAppend)
    Snapshots.registerTable(spark, root, "snap_v1_tbl", asOf = Some(1))
    assert(spark.sql("SELECT k FROM snap_v1_tbl").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L),
      "the pinned table must keep reading snapshot 1")
    // the short-name reader path (DataSourceRegister) sees the current
    // snapshot, and a pushed range filter produces correct results while
    // skipping non-intersecting files
    val viaFormat = spark.read.format("graft-snapshot").load(root)
      .filter(col("k") >= 100L)
    assert(viaFormat.collect().map(_.getLong(0)).toSet == Set(100L))
    spark.sql("DROP TABLE snap_v1_tbl")
  }
}
