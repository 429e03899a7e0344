package graft.sources

import graft.SparkSpec
import graft.sink.Snapshots
import org.apache.spark.sql.functions._

/** Row-level SQL over registered snapshot tables (the
  * [[graft.GraftExtensions]]-injected [[SnapshotDmlRule]]): DELETE /
  * UPDATE / canonical MERGE must be EXACTLY the engine calls — same
  * file-bounded rewrites (manifest-asserted), same semantics — and
  * everything the upsert mapping cannot represent must abort loudly. */
class SnapshotDmlSpec extends SparkSpec {

  private def manifestRemoves(root: String, id: Int): Int =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/snapshots/s$id")))
      .linesIterator.count(_.startsWith("remove="))

  test("DELETE FROM routes through deleteWhere: Bloom-bounded copy-on-write, manifest-asserted") {
    val root = java.nio.file.Files.createTempDirectory("dml_del").toString
    // interleaved per-file key ranges: only the Bloom separates them
    val evens = spark.range(0, 200, 2).select(col("id").as("k"),
      lit("a").as("p"))
    val odds = spark.range(1, 200, 2).select(col("id").as("k"),
      lit("a").as("p"))
    Snapshots.write(evens.coalesce(1), root, Seq("p"),
      statsColumns = Seq("k"), bloomColumns = Seq("k"))
    Snapshots.write(odds.coalesce(1), root, Seq("p"), Snapshots.SnapAppend)
    spark.sql("DROP TABLE IF EXISTS dml_del_tbl")
    Snapshots.registerTable(spark, root, "dml_del_tbl")
    // the point delete: exactly one file rewrites (the Bloom bound) —
    // the same assertion the Scala-API test pins, now reached from SQL
    spark.sql("DELETE FROM dml_del_tbl WHERE k = 42")
    assert(Snapshots.currentSnapshot(spark, root).contains(3))
    assert(manifestRemoves(root, 3) == 1,
      "the SQL delete must inherit the Bloom-bounded rewrite")
    assert(spark.sql("SELECT count(*) AS n FROM dml_del_tbl")
      .head().getLong(0) == 199L)
    // an audited snapshot with the engine's mode, visible in history
    assert(Snapshots.history(spark, root).collect()
      .map(_.getString(1)).toSeq
      == Seq("append", "append", "delete_where"))
    // a predicate (non-point) delete; IN-lists derive disjunctive prunes
    spark.sql("DELETE FROM dml_del_tbl WHERE k IN (1, 3, 5)")
    assert(spark.sql("SELECT count(*) AS n FROM dml_del_tbl")
      .head().getLong(0) == 196L)
    // deleting nothing publishes nothing (deleteWhere's no-match no-op)
    spark.sql("DELETE FROM dml_del_tbl WHERE k = 424242")
    assert(Snapshots.currentSnapshot(spark, root).contains(4))
    // pre-delete states stay time-travelable
    assert(Snapshots.read(spark, root, asOf = Some(2)).count() == 200L)
    spark.sql("DROP TABLE dml_del_tbl")
  }

  test("UPDATE evaluates every assignment against the PRE-update row and can move partitions") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("dml_upd").toString
    Snapshots.write(
      Seq((1L, "a", 10.0, 100.0), (2L, "a", 20.0, 200.0),
        (3L, "b", 30.0, 300.0)).toDF("k", "p", "v", "w").coalesce(1),
      root, Seq("p"), statsColumns = Seq("k"))
    spark.sql("DROP TABLE IF EXISTS dml_upd_tbl")
    Snapshots.registerTable(spark, root, "dml_upd_tbl")
    // v and w swap-and-combine: both right-hand sides must see the OLD
    // row (one projection — SQL UPDATE semantics), never each other
    spark.sql(
      "UPDATE dml_upd_tbl SET v = v + w, w = v WHERE k = 2")
    val r2 = spark.sql("SELECT v, w FROM dml_upd_tbl WHERE k = 2").head()
    assert(r2.getDouble(0) == 220.0 && r2.getDouble(1) == 20.0,
      s"got $r2 — assignments must not see each other's results")
    // untouched rows ride through; the write is an audited snapshot
    assert(spark.sql("SELECT v FROM dml_upd_tbl WHERE k = 1")
      .head().getDouble(0) == 10.0)
    assert(Snapshots.history(spark, root).collect().map(_.getString(1))
      .last == "update_where")
    // an assignment to the PARTITION column moves the row's partition
    spark.sql("UPDATE dml_upd_tbl SET p = 'b' WHERE k = 1")
    assert(spark.sql("SELECT p FROM dml_upd_tbl WHERE k = 1")
      .head().getString(0) == "b")
    assert(Snapshots.read(spark, root).filter(col("p") === "b").count() == 2)
    // WHERE omitted = every row (condition TRUE), still file-bounded CoW
    spark.sql("UPDATE dml_upd_tbl SET v = 0.0")
    assert(spark.sql("SELECT sum(v) AS s FROM dml_upd_tbl")
      .head().getDouble(0) == 0.0)
    // a typo'd target column fails loudly EVEN when nothing matches —
    // never the success-shaped None of a legitimate no-match update
    val exCol = intercept[IllegalArgumentException] {
      Snapshots.updateWhere(spark, root, Seq("p"),
        col("k") === -999L, Seq("nosuchcol" -> lit(1)))
    }
    assert(exCol.getMessage.contains("unknown UPDATE target"),
      exCol.getMessage)
    spark.sql("DROP TABLE dml_upd_tbl")
  }

  test("MERGE INTO: canonical upsert and delete-matched map to mergeUpsert; other shapes abort loudly") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("dml_mrg").toString
    Snapshots.write(
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
        .toDF("k", "p", "v").coalesce(1), root, Seq("p"))
    spark.sql("DROP TABLE IF EXISTS dml_mrg_tbl")
    Snapshots.registerTable(spark, root, "dml_mrg_tbl")
    // source: replaces k=2 (moving it to partition b), inserts k=4
    Seq((2L, "b", 99.0), (4L, "a", 40.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("dml_mrg_src")
    spark.sql(
      """MERGE INTO dml_mrg_tbl t USING dml_mrg_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.sql("SELECT k, p, v FROM dml_mrg_tbl ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, "a", 10.0), (2L, "b", 99.0),
      (3L, "b", 30.0), (4L, "a", 40.0)), rows.mkString(","))
    assert(Snapshots.history(spark, root).collect().map(_.getString(1))
      .last == "merge", "the SQL merge must be the engine's merge lane")
    // WHEN MATCHED THEN DELETE alone removes exactly the matched keys
    Seq(2L, 4L, 777L).toDF("k").createOrReplaceTempView("dml_mrg_del")
    spark.sql(
      """MERGE INTO dml_mrg_tbl t USING dml_mrg_del s ON t.k = s.k
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.sql("SELECT k FROM dml_mrg_tbl").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    // non-canonical shapes abort loudly, naming the supported forms
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${messages(t.getCause)}"
    val exPartial = intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_mrg_tbl t USING dml_mrg_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
    assert(messages(exPartial).contains("not supported on snapshot tables"),
      messages(exPartial))
    val exKey = intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_mrg_tbl t USING dml_mrg_src s ON t.k = s.v
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(messages(exKey).contains("not supported on snapshot tables"),
      messages(exKey))
    spark.sql("DROP TABLE dml_mrg_tbl")
  }

  test("DML rejects pinned tables and subquery conditions loudly; other tables pass through") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("dml_pin").toString
    Snapshots.write(Seq((1L, "a", 1.0)).toDF("k", "p", "v").coalesce(1),
      root, Seq("p"))
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${messages(t.getCause)}"
    spark.sql("DROP TABLE IF EXISTS dml_pin_tbl")
    Snapshots.registerTable(spark, root, "dml_pin_tbl", asOf = Some(1))
    val exPin = intercept[Exception] {
      spark.sql("DELETE FROM dml_pin_tbl WHERE k = 1")
    }
    assert(messages(exPin).contains("read-only view of history"),
      messages(exPin))
    Snapshots.createBranch(spark, root, "audit")
    spark.sql("DROP TABLE IF EXISTS dml_br_tbl")
    Snapshots.registerTable(spark, root, "dml_br_tbl",
      branch = Some("audit"))
    val exBr = intercept[Exception] {
      spark.sql("UPDATE dml_br_tbl SET v = 0.0 WHERE k = 1")
    }
    assert(messages(exBr).contains("branch"), messages(exBr))
    spark.sql("DROP TABLE IF EXISTS dml_live_tbl")
    Snapshots.registerTable(spark, root, "dml_live_tbl")
    val exSub = intercept[Exception] {
      spark.sql(
        "DELETE FROM dml_live_tbl WHERE k IN (SELECT k FROM dml_live_tbl)")
    }
    assert(messages(exSub).toLowerCase.contains("subquery"),
      messages(exSub))
    // the rule leaves NON-snapshot tables untouched: Spark's own v2-only
    // error surfaces for a parquet-backed table, not a graft error
    spark.sql("DROP TABLE IF EXISTS dml_plain_tbl")
    Seq((1, "x")).toDF("a", "b").write.saveAsTable("dml_plain_tbl")
    val exPlain = intercept[Exception] {
      spark.sql("DELETE FROM dml_plain_tbl WHERE a = 1")
    }
    assert(!messages(exPlain).contains("snapshot"), messages(exPlain))
    spark.sql("DROP TABLE dml_pin_tbl")
    spark.sql("DROP TABLE dml_br_tbl")
    spark.sql("DROP TABLE dml_live_tbl")
    spark.sql("DROP TABLE dml_plain_tbl")
    Snapshots.dropBranch(spark, root, "audit")
  }
}
