package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}

/** CDC MERGE ([[PartitionedSink.mergeUpsert]]): partition-granular
  * copy-on-write — updated/moved/deleted keys land correctly, untouched
  * partitions' data files are NOT rewritten, and fully-deleted partitions
  * disappear from disk. */
class MergeUpsertSpec extends SparkSpec {

  import spark.implicits._

  private val cfg = SinkConfig(ParquetFormat, Seq("grp"),
    runtimeNullCheck = true)

  private def base() = Seq(
    (1L, "a", "A", 10.0), (2L, "b", "A", 20.0), (3L, "c", "A", 30.0),
    (4L, "d", "B", 40.0), (5L, "e", "B", 50.0),
    (6L, "f", "E", 60.0), (7L, "g", "E", 70.0)
  ).toDF("id", "payload", "grp", "v")

  private def fileSet(root: Path): Map[String, Set[String]] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .toSeq
      .groupBy(p => root.relativize(p).subpath(0, 1).toString)
      .view.mapValues(_.map(p =>
        s"${p.getFileName}@${Files.getLastModifiedTime(p)}").toSet)
      .toMap
  }

  test("merge: update in place, move across partitions, insert, delete") {
    val out = Files.createTempDirectory("graft_merge")
    PartitionedSink.write(base(), out.toString, cfg)

    val updates = Seq(
      // id 1: in-place update within A
      (1L, "a2", "A", 11.0, false),
      // id 4: MOVES from B to C (new partition)
      (4L, "d2", "C", 44.0, false),
      // id 9: brand-new key into B
      (9L, "i", "B", 90.0, false),
      // id 2: delete (its partition value here is deliberately wrong — a
      // delete locates its victim by key, not by carried partition value)
      (2L, "x", "ZZZ", 0.0, true)
    ).toDF("id", "payload", "grp", "v", "del")

    val stats = PartitionedSink.mergeUpsert(spark, out.toString, updates,
      Seq("id"), cfg, deleteCol = Some("del"))

    val got = PartitionedSink.readBack(spark, out.toString)
      .select("id", "payload", "grp", "v").as[(Long, String, String, Double)]
      .collect().toSet
    assert(got == Set(
      (1L, "a2", "A", 11.0), (3L, "c", "A", 30.0),
      (5L, "e", "B", 50.0), (9L, "i", "B", 90.0),
      (4L, "d2", "C", 44.0),
      (6L, "f", "E", 60.0), (7L, "g", "E", 70.0)))
    // touched: A (update+delete), B (old home of 4, insert of 9), C (new)
    assert(stats == PartitionedSink.MergeStats(3, 0))
  }

  test("merge: untouched partition files are not rewritten") {
    val out = Files.createTempDirectory("graft_merge_cow")
    PartitionedSink.write(base(), out.toString, cfg)
    val before = fileSet(out)

    val updates = Seq((1L, "a2", "A", 11.0)).toDF("id", "payload", "grp", "v")
    PartitionedSink.mergeUpsert(spark, out.toString, updates, Seq("id"), cfg)

    val after = fileSet(out)
    assert(after("grp=B") == before("grp=B"),
      "partition B had no changed keys — its files must be byte-untouched")
    assert(after("grp=E") == before("grp=E"))
    assert(after("grp=A") != before("grp=A"),
      "partition A was merged — its files must be new")
  }

  test("merge: a fully-deleted partition's directory is dropped") {
    val out = Files.createTempDirectory("graft_merge_drop")
    PartitionedSink.write(base(), out.toString, cfg)

    val updates = Seq(
      (6L, "", "", 0.0, true), (7L, "", "", 0.0, true)
    ).toDF("id", "payload", "grp", "v", "del")
    val stats = PartitionedSink.mergeUpsert(spark, out.toString, updates,
      Seq("id"), cfg, deleteCol = Some("del"))

    assert(stats.partitionsDropped == 1)
    assert(!Files.exists(out.resolve("grp=E")),
      "emptied partition dir must be removed (dynamic overwrite alone " +
        "would leave its stale files)")
    val got = PartitionedSink.readBack(spark, out.toString)
    assert(got.count() == 5)
    assert(!got.select("grp").distinct().as[String].collect().contains("E"))
  }

  test("snapshotDiff → CDC batch → merge converges the stored old snapshot to new") {
    val docs = graft.Tables(spark, sf0001, "documents")
      .select("doc_id", "text", "lang")
    val oldSnap = docs.filter(col("doc_id") % 19 =!= 0)
    val newSnap = docs.filter(col("doc_id") % 23 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    val out = Files.createTempDirectory("graft_diff_merge")
    val dcfg = SinkConfig(ParquetFormat, Seq("lang"), runtimeNullCheck = true)
    PartitionedSink.write(oldSnap, out.toString, dcfg)

    // the incremental pipeline: diff the snapshots, turn the diff into a
    // CDC batch (added/changed → upsert with the new payload, removed →
    // delete-by-key), merge — the stored table must BE the new snapshot
    val diff = graft.ops.Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
    val upserts = diff.filter(col("status").isin("added", "changed"))
      .join(newSnap, Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("lang"))
      .withColumn("__del", lit(false))
    val deletes = diff.filter(col("status") === "removed")
      .select(col("doc_id"), lit("").as("text"), lit("zz").as("lang"),
        lit(true).as("__del"))
    PartitionedSink.mergeUpsert(spark, out.toString,
      upserts.unionByName(deletes), Seq("doc_id"), dcfg, Some("__del"))

    val got = PartitionedSink.readBack(spark, out.toString)
      .select("doc_id", "text", "lang")
    assert(got.count() == newSnap.count())
    assert(got.exceptAll(newSnap).isEmpty && newSnap.exceptAll(got).isEmpty,
      "merged table must equal the new snapshot row-for-row")
  }

  test("merge: duplicate keys in one batch are rejected") {
    val out = Files.createTempDirectory("graft_merge_dup")
    PartitionedSink.write(base(), out.toString, cfg)
    val updates = Seq(
      (1L, "a2", "A", 11.0), (1L, "a3", "A", 12.0)
    ).toDF("id", "payload", "grp", "v")
    val e = intercept[IllegalArgumentException] {
      PartitionedSink.mergeUpsert(spark, out.toString, updates, Seq("id"), cfg)
    }
    assert(e.getMessage.contains("multiple rows"))
  }

  test("merge: partition fields containing dots still resolve as literal names") {
    // the sink admits dotted field names (its qcol discipline); the
    // touched-partition pruning must not parse them as nested access
    val out = Files.createTempDirectory("graft_merge_dot")
    val dotted = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "x", 3.0))
      .toDF("id", "the.part", "v")
    val dcfg = SinkConfig(ParquetFormat, Seq("the.part"),
      runtimeNullCheck = true)
    PartitionedSink.write(dotted, out.toString, dcfg)
    val updates = Seq((1L, "x", 9.0, false), (2L, "y", 0.0, true))
      .toDF("id", "the.part", "v", "del")
    PartitionedSink.mergeUpsert(spark, out.toString, updates, Seq("id"),
      dcfg, deleteCol = Some("del"))
    val got = PartitionedSink.readBack(spark, out.toString)
      .select(col("id"), col("`the.part`"), col("v"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "x", 9.0), (3L, "x", 3.0)))
  }
}
