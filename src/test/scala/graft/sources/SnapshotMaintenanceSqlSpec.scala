package graft.sources

import graft.SparkSpec
import graft.sink.Snapshots
import org.apache.spark.sql.functions._

/** `CALL graft_maintain/compact/expire/vacuum` — the SQL maintenance
  * entry points must be EXACTLY the Scala API on the manifest (modes
  * asserted), reject pinned tables, fail loudly on malformed arguments,
  * and leave every other statement to Spark's own parser. */
class SnapshotMaintenanceSqlSpec extends SparkSpec {

  private def orders = graft.Tables(spark, sf0001, "orders")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderpriority")

  private def modes(root: String): Seq[String] =
    Snapshots.history(spark, root).collect().map(_.getString(1)).toSeq

  test("CALL graft_compact / graft_expire / graft_vacuum are the engine calls, by root and by table") {
    val root = java.nio.file.Files.createTempDirectory("msql_c").toString
    val k = col("o_orderkey")
    for (m <- 0 to 2)
      Snapshots.write(orders.filter(k % 3 === m).coalesce(1), root,
        Seq("o_orderpriority"), Snapshots.SnapAppend)
    val esc = root.replace("'", "''")
    // compact by quoted root: returns the new snapshot id, publishes the
    // engine's compact mode, preserves content
    val c = spark.sql(s"CALL graft_compact('$esc')").head()
    assert(c.getInt(0) == 4, s"compacted_to: $c")
    assert(modes(root).last == "compact")
    assert(Snapshots.read(spark, root).count() == orders.count())
    // nothing fragmented → null id, no snapshot burned (the API's no-op)
    val c2 = spark.sql(s"CALL graft_compact('$esc')").head()
    assert(c2.isNullAt(0))
    assert(Snapshots.currentSnapshot(spark, root).contains(4))
    // expire by root: keepLast=1 reclaims the three pre-compact states
    val e = spark.sql(s"CALL graft_expire('$esc', 1)").head()
    assert(e.getInt(0) == 3, s"snapshots_expired: $e")
    assert(Snapshots.read(spark, root).count() == orders.count())
    // vacuum returns its (orphans, staging) counts — nothing to reclaim;
    // SQL comments around a recognized statement must not defeat the
    // intercept (the no-fall-through guarantee)
    val v = spark.sql(
      s"-- nightly ops\nCALL graft_vacuum('$esc', 0) -- reclaim").head()
    assert(v.getInt(0) == 0 && v.getInt(1) == 0, s"vacuum: $v")
    // by TABLE identifier: the registered table resolves to its root
    spark.sql("DROP TABLE IF EXISTS msql_tbl")
    Snapshots.registerTable(spark, root, "msql_tbl")
    Snapshots.write(orders.limit(10).coalesce(1), root,
      Seq("o_orderpriority"), Snapshots.SnapAppend)
    Snapshots.write(orders.limit(5).coalesce(1), root,
      Seq("o_orderpriority"), Snapshots.SnapAppend)
    val ct = spark.sql("CALL graft_compact(msql_tbl, 1)").head()
    assert(!ct.isNullAt(0) && modes(root).last == "compact")
    spark.sql("DROP TABLE msql_tbl")
  }

  test("CALL graft_maintain runs fold→compact→expire→vacuum and reports; pins and malformed calls are loud") {
    val root = java.nio.file.Files.createTempDirectory("msql_m").toString
    val k = col("o_orderkey")
    for (m <- 0 to 1)
      Snapshots.write(orders.filter(k % 2 === m).coalesce(1), root,
        Seq("o_orderpriority"), Snapshots.SnapAppend)
    val esc = root.replace("'", "''")
    val rep = spark.sql(s"CALL graft_maintain('$esc', 1)").head()
    assert(rep.isNullAt(0), "no merge-on-read deletes → no fold")
    assert(rep.getInt(1) == 3, s"compacted_to: $rep")
    assert(rep.getInt(2) == 2, s"snapshots_expired: $rep")
    assert(Snapshots.read(spark, root).count() == orders.count())
    assert(modes(root) == Seq("compact"))
    // pinned registrations are rejected with the pin named — maintenance
    // mutates the live dataset
    spark.sql("DROP TABLE IF EXISTS msql_pin_tbl")
    Snapshots.registerTable(spark, root, "msql_pin_tbl",
      asOf = Snapshots.currentSnapshot(spark, root))
    val exPin = intercept[Exception] {
      spark.sql("CALL graft_compact(msql_pin_tbl)").collect()
    }
    assert(exPin.getMessage.contains("asof-pinned"), exPin.getMessage)
    // a recognized statement with wrong arity fails HERE, naming usage —
    // never falls through to Spark's CALL-procedure machinery
    val exArity = intercept[IllegalArgumentException] {
      spark.sql(s"CALL graft_expire('$esc')")
    }
    assert(exArity.getMessage.contains("keepLast"), exArity.getMessage)
    val exNum = intercept[IllegalArgumentException] {
      spark.sql(s"CALL graft_expire('$esc', 'soon')")
    }
    assert(exNum.getMessage.contains("integer"), exNum.getMessage)
    // a non-graft table target names the provider mismatch
    spark.sql("DROP TABLE IF EXISTS msql_plain")
    import spark.implicits._
    Seq((1, "x")).toDF("a", "b").write.saveAsTable("msql_plain")
    val exPlain = intercept[Exception] {
      spark.sql("CALL graft_vacuum(msql_plain)").collect()
    }
    assert(exPlain.getMessage.contains("not a graft snapshot table"),
      exPlain.getMessage)
    // everything NOT a graft CALL delegates untouched
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    spark.sql("DROP TABLE msql_pin_tbl")
    spark.sql("DROP TABLE msql_plain")
  }

  test("CALL graft_rollback / graft_tag / graft_drop_tag: RESTORE and release pins from SQL") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("msql_rb").toString
    val esc = root.replace("'", "''")
    Snapshots.write(Seq((1L, "a")).toDF("k", "p"), root, Seq("p"))
    Snapshots.write(Seq((2L, "a")).toDF("k", "p"), root, Seq("p"),
      Snapshots.SnapAppend)
    // tag the good state (defaults to CURRENT), then land a bad batch
    val tagged = spark.sql(s"CALL graft_tag('$esc', 'good')").head()
    assert(tagged.getInt(0) == 2)
    Snapshots.write(Seq((666L, "a")).toDF("k", "p"), root, Seq("p"),
      Snapshots.SnapAppend)
    assert(Snapshots.read(spark, root).count() == 3)
    // RESTORE: re-publish s2's live set as a NEW snapshot — the bad
    // batch stays time-travelable for audit
    val restored = spark.sql(s"CALL graft_rollback('$esc', 2)").head()
    assert(restored.getInt(0) == 4)
    assert(Snapshots.read(spark, root).collect().map(_.getLong(0)).toSet
      == Set(1L, 2L))
    assert(Snapshots.read(spark, root, asOf = Some(3)).count() == 3)
    // the tag reads through SQL time travel and drops cleanly
    assert(spark.sql(s"SELECT count(*) FROM graft_snapshot('$esc', 'good')")
      .head().getLong(0) == 2L)
    assert(spark.sql(s"CALL graft_drop_tag('$esc', 'good')").head()
      .getBoolean(0))
    assert(!spark.sql(s"CALL graft_drop_tag('$esc', 'good')").head()
      .getBoolean(0), "dropping a dropped tag reports existed=false")
    // explicit-id tagging; a string where an id belongs is loud
    assert(spark.sql(s"CALL graft_tag('$esc', 'v1', 1)").head()
      .getInt(0) == 1)
    // block comments anywhere around a recognized statement must not
    // defeat the intercept (the no-fall-through guarantee, both kinds)
    assert(spark.sql(s"/* release */ CALL graft_tag('$esc', 'v2') /* pin */")
      .head().getInt(0) == 4)
    // NESTED bracketed comments are legal Spark SQL — the strip must
    // track depth, or the statement mis-strips and falls through
    assert(spark.sql(
      s"/* outer /* inner */ still comment */ CALL graft_tag('$esc', 'v3')")
      .head().getInt(0) == 4)
    val exStr = intercept[IllegalArgumentException] {
      spark.sql(s"CALL graft_tag('$esc', 3)")
    }
    assert(exStr.getMessage.contains("quoted string"), exStr.getMessage)
    val exId = intercept[IllegalArgumentException] {
      spark.sql(s"CALL graft_rollback('$esc')")
    }
    assert(exId.getMessage.contains("toSnapshotId"), exId.getMessage)
  }

  test("CALL graft_add_constraint / graft_drop_constraint: SQL CHECK rules on registered tables") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("msql_ck").toString
    val esc = root.replace("'", "''")
    Snapshots.write(Seq((1L, 10.0, "a")).toDF("k", "v", "p"), root, Seq("p"))
    spark.sql("DROP TABLE IF EXISTS msql_ck_tbl")
    Snapshots.registerTable(spark, root, "msql_ck_tbl")
    assert(spark.sql(s"CALL graft_add_constraint('$esc', 'v_pos', 'v > 0')")
      .head().getInt(0) == 2)
    // the constrained table rejects a violating SQL INSERT naming the rule
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    val ex = intercept[Exception] {
      spark.sql("INSERT INTO msql_ck_tbl VALUES (2, -5.0, 'a')")
    }
    assert(msgs(ex).contains("CHECK constraint 'v_pos'"), msgs(ex))
    spark.sql("INSERT INTO msql_ck_tbl VALUES (2, 5.0, 'a')")
    // the summary TVF reports the rule; novalidate declares forward-only
    assert(spark.sql(s"SELECT constraints FROM graft_detail('$esc')")
      .head().getString(0).contains("v_pos"))
    spark.sql(
      s"CALL graft_add_constraint('$esc', 'k_big', 'k > 100', 'novalidate')")
    val exVal = intercept[Exception] {
      spark.sql(s"CALL graft_add_constraint('$esc', 'v_cap', 'v < 6')")
    }
    assert(msgs(exVal).contains("existing rows violate"), msgs(exVal))
    // drop releases; dropping a missing rule reports null (the API no-op)
    assert(!spark.sql(s"CALL graft_drop_constraint('$esc', 'k_big')")
      .head().isNullAt(0))
    assert(spark.sql(s"CALL graft_drop_constraint('$esc', 'k_big')")
      .head().isNullAt(0))
    spark.sql("INSERT INTO msql_ck_tbl VALUES (3, 7.0, 'a')")
    assert(spark.sql("SELECT count(*) FROM msql_ck_tbl")
      .head().getLong(0) == 3L)
    spark.sql("DROP TABLE msql_ck_tbl")
  }

  test("CALL graft_compact('path','cols') / graft_retention: plain-tree SQL maintenance ≡ the Scala API; snapshot roots rejected") {
    import graft.sink.{PartitionedSink, ParquetFormat, SinkConfig}
    val tree = java.nio.file.Files.createTempDirectory("msql_plainc")
    PartitionedSink.write(orders.repartition(8), tree.toString,
      SinkConfig(ParquetFormat, Seq("o_orderpriority"),
        runtimeNullCheck = true))
    def files(): Map[String, Int] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tree).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith("."))
        .map(_.getParent.getFileName.toString).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    }
    val before = files()
    assert(before.values.max > 1, s"fixture must be fragmented: $before")
    val content = PartitionedSink.readBack(spark, tree.toString)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val esc = tree.toString.replace("'", "''")
    // SQL compact ≡ compactInPlace: every partition collapses to one
    // file, content identical, and the report's counts match the tree
    val rep = spark.sql(
      s"CALL graft_compact('$esc', 'o_orderpriority')").head()
    val after = files()
    assert(after.keySet == before.keySet && after.values.forall(_ == 1),
      s"after: $after")
    assert(rep.getInt(0) == before.values.sum &&
      rep.getInt(1) == after.values.sum, s"report: $rep")
    assert(PartitionedSink.readBack(spark, tree.toString)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == content)
    // retention: the SQL predicate evaluates over partition STRING
    // values; exactly the matching partitions drop, reported as rows
    val dropped = spark.sql(s"CALL graft_retention('$esc', " +
      "'o_orderpriority', 'o_orderpriority like ''1-%''')")
      .collect().map(_.getString(0)).toSeq
    assert(dropped == Seq("o_orderpriority=1-URGENT"), dropped.toString)
    assert(!files().keySet.exists(_.contains("1-URGENT")))
    assert(PartitionedSink.readBack(spark, tree.toString)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      content - "1-URGENT")
    // matching nothing drops nothing; a predicate naming a non-partition
    // column is loud with the real columns named
    assert(spark.sql(s"CALL graft_retention('$esc', 'o_orderpriority', " +
      "'o_orderpriority = ''nope''')").collect().isEmpty)
    val exCol = intercept[Exception] {
      spark.sql(s"CALL graft_retention('$esc', 'o_orderpriority', " +
        "'not_a_column = ''x''')").collect()
    }
    assert(exCol.getMessage.contains("partition columns"), exCol.getMessage)
    // a SNAPSHOT root is rejected by BOTH plain-lane ops — its manifest
    // would go inconsistent; the snapshot lane is named in the error
    val snapRoot = java.nio.file.Files.createTempDirectory("msql_snapr")
    Snapshots.write(orders.limit(20).coalesce(1), snapRoot.toString,
      Seq("o_orderpriority"), Snapshots.SnapAppend)
    val snapEsc = snapRoot.toString.replace("'", "''")
    val exSnap = intercept[Exception] {
      spark.sql(s"CALL graft_compact('$snapEsc', 'o_orderpriority')")
        .collect()
    }
    assert(exSnap.getMessage.contains("SNAPSHOT dataset root"),
      exSnap.getMessage)
    val exSnap2 = intercept[Exception] {
      spark.sql(s"CALL graft_retention('$snapEsc', 'o_orderpriority', " +
        "'true')").collect()
    }
    assert(exSnap2.getMessage.contains("SNAPSHOT dataset root"),
      exSnap2.getMessage)
    // a path INSIDE the snapshot dataset (`<root>/data`, or a partition
    // directory under it) is equally rejected: compacting it would
    // rename files the manifest references by relative name — the exact
    // corruption the guard exists to prevent. The ancestor walk names
    // the owning dataset.
    val exInner = intercept[Exception] {
      spark.sql(s"CALL graft_compact('$snapEsc/data', 'o_orderpriority')")
        .collect()
    }
    assert(exInner.getMessage.contains("INSIDE the snapshot dataset"),
      exInner.getMessage)
    val exInner2 = intercept[Exception] {
      spark.sql(s"CALL graft_retention(" +
        s"'$snapEsc/data/o_orderpriority=1-URGENT', 'o_orderpriority', " +
        "'true')").collect()
    }
    assert(exInner2.getMessage.contains("INSIDE the snapshot dataset"),
      exInner2.getMessage)
    // a bare-identifier target is rejected for the plain lane (paths only)
    val exIdent = intercept[Exception] {
      spark.sql("CALL graft_retention(some_tbl, 'p', 'true')").collect()
    }
    assert(exIdent.getMessage.contains("quoted plain-tree path"),
      exIdent.getMessage)
  }

  test("plain-lane partition lists must match the tree's nesting ORDER — a reordered list is loud, never a silent no-op") {
    import graft.sink.{PartitionedSink, ParquetFormat, SinkConfig}
    import spark.implicits._
    val tree = java.nio.file.Files.createTempDirectory("msql_nest")
    val rows = Seq((1L, "d1", "h1"), (2L, "d1", "h2"), (3L, "d2", "h1"))
      .toDF("id", "day", "hour")
    PartitionedSink.write(rows, tree.toString,
      SinkConfig(ParquetFormat, Seq("day", "hour"), runtimeNullCheck = true))
    val esc = tree.toString.replace("'", "''")
    // reversed order: dropPartitionsWhere would build hour=/day= paths
    // that don't exist and report success while deleting nothing —
    // rejected up front naming the actual nesting
    val exOrder = intercept[Exception] {
      spark.sql(s"CALL graft_retention('$esc', 'hour,day', " +
        "'day = ''d1''')").collect()
    }
    assert(exOrder.getMessage.contains("nests day="), exOrder.getMessage)
    val exOrder2 = intercept[Exception] {
      spark.sql(s"CALL graft_compact('$esc', 'hour,day')").collect()
    }
    assert(exOrder2.getMessage.contains("nests day="), exOrder2.getMessage)
    // a TOO-LONG list (the tree bottoms out early) is equally loud —
    // PartitionCatalog.list at depth 3 would find nothing and the
    // command would report success while deleting nothing
    val exDeep = intercept[Exception] {
      spark.sql(s"CALL graft_retention('$esc', 'day,hour,minute', " +
        "'day = ''d1''')").collect()
    }
    assert(exDeep.getMessage.contains("nests only 2"), exDeep.getMessage)
    // the correctly-ordered list works end to end
    val dropped = spark.sql(s"CALL graft_retention('$esc', 'day,hour', " +
      "'day = ''d1''')").collect().map(_.getString(0)).toSeq
    assert(dropped == Seq("day=d1/hour=h1", "day=d1/hour=h2"), dropped)
    assert(PartitionedSink.readBack(spark, tree.toString).count() == 1)
  }
}
