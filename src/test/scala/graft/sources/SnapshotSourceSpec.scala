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

  test("recorded byte sizes drive broadcast planning for registered snapshot tables") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("srcsnap_bc").toString
    Snapshots.write(
      Seq((1L, "a", "x"), (2L, "a", "y")).toDF("k", "p", "s").coalesce(1),
      root, Seq("p"))
    spark.sql("DROP TABLE IF EXISTS snap_bc_tbl")
    Snapshots.registerTable(spark, root, "snap_bc_tbl")
    val big = orders.withColumnRenamed("o_orderkey", "k")
    val joined = big.join(spark.table("snap_bc_tbl"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a few-KB snapshot table must broadcast (manifest-recorded size):\n$plan")
    assert(joined.count() == 2)
    spark.sql("DROP TABLE snap_bc_tbl")
  }

  test("SQL INSERT INTO/OVERWRITE and the DataFrame writer route through the snapshot commit protocol") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("srcsnap_ins").toString
    // the writer CREATES the dataset (partitionBy required only here) —
    // and can declare the skipping metadata, which is creation-fixed
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v")
      .coalesce(1).write.format("graft-snapshot")
      .option("partitionBy", "p")
      .option("statsColumns", "k").option("bloomColumns", "k").save(root)
    assert(Snapshots.currentSnapshot(spark, root).contains(1))
    assert(Snapshots.snapshotLog(spark, root).collect()
      .forall(r => !r.isNullAt(9) && !r.isNullAt(10)),
      "writer-declared statsColumns must record row/byte counts")
    assert(Snapshots.read(spark, root, prune = Seq(
      Snapshots.StatRange("k", Some(1L), Some(1L)))).inputFiles.length == 1,
      "writer-declared stats must point-prune")
    assert(new java.io.File(s"$root/blooms").listFiles()
      .exists(f => !f.getName.startsWith(".")),
      "writer-declared bloomColumns must land a sidecar")
    // a second ErrorIfExists write fails; Ignore is a no-op
    intercept[IllegalStateException] {
      Seq((9L, "a", 0.0)).toDF("k", "p", "v")
        .write.format("graft-snapshot").save(root)
    }
    Seq((9L, "a", 0.0)).toDF("k", "p", "v")
      .write.format("graft-snapshot").mode("ignore").save(root)
    assert(Snapshots.currentSnapshot(spark, root).contains(1))
    // SQL INSERT INTO appends under the RECORDED spec (no partitionBy)
    Snapshots.registerTable(spark, root, "snap_ins_tbl")
    spark.sql("INSERT INTO snap_ins_tbl VALUES (3, 'a', 30.0)")
    assert(spark.sql("SELECT k FROM snap_ins_tbl").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // INSERT OVERWRITE = dynamic partition overwrite: only partition 'a'
    // (the one the batch touches) is replaced; 'b' rides through
    spark.sql("INSERT OVERWRITE snap_ins_tbl VALUES (7, 'a', 70.0)")
    assert(spark.sql("SELECT k FROM snap_ins_tbl").collect()
      .map(_.getLong(0)).toSet == Set(2L, 7L))
    // every write is an audited snapshot: history shows the full lineage
    val modes = Snapshots.history(spark, root).collect()
      .map(_.getString(1)).toSeq
    assert(modes == Seq("append", "append", "overwrite_partitions"))
    // pre-insert states stay time-travelable
    assert(Snapshots.read(spark, root, asOf = Some(1)).count() == 2)
    // a writer append with a MISMATCHED spec fails loudly
    val ex = intercept[IllegalArgumentException] {
      Seq((8L, "a", 0.0)).toDF("k", "p", "v")
        .write.format("graft-snapshot").mode("append")
        .option("partitionBy", "k").save(root)
    }
    assert(ex.getMessage.contains("partitioned by p"))
    // a time-travel-pinned table rejects inserts
    Snapshots.registerTable(spark, root, "snap_ins_v1", asOf = Some(1))
    val exPinned = intercept[Exception] {
      spark.sql("INSERT INTO snap_ins_v1 VALUES (5, 'a', 50.0)")
    }
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${messages(t.getCause)}"
    assert(messages(exPinned).contains("read-only view of history"),
      messages(exPinned))
    spark.sql("DROP TABLE snap_ins_tbl")
    spark.sql("DROP TABLE snap_ins_v1")
  }
}
