package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}

/** Write-time skew/file-budget control (`SinkConfig.filesPerPartition` +
  * `maxRecordsPerFile`): the file-side contract behind the
  * `sink_skewed_write` content oracle. A deliberately hot partition value
  * must split across tasks (no single-writer straggler) while every value
  * stays within the file budget (no tasks × partitions small-file fan-out).
  */
class SkewedWriteSpec extends SparkSpec {

  private def dataFiles(root: Path): Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .toSeq
      .groupBy(p => root.relativize(p).subpath(0, 1).toString)
      .view.mapValues(_.size).toMap
  }

  // 90% of rows land in one 'hot' partition value, the rest in 10 cold ones;
  // input arrives 8-way fragmented (every task holds every value) — the
  // worst-case layout for a dynamic partitioned write on both axes.
  private def skewed = graft.Tables(spark, sf0001, "orders")
    .withColumn("shard",
      when(col("o_orderkey") % 100 < 90, lit("hot"))
        .otherwise(concat(lit("c"), (col("o_orderkey") % 100).cast("string"))))
    .repartition(8)

  test("unbudgeted control: fragmented input fans out tasks x partitions files") {
    val out = Files.createTempDirectory("graft_skew_ctl")
    PartitionedSink.write(skewed, out.toString,
      SinkConfig(ParquetFormat, Seq("shard"), runtimeNullCheck = true))
    val files = dataFiles(out)
    // every one of the 8 tasks holds hot rows -> 8 files for the hot value
    assert(files("shard=hot") > 4,
      s"control must show the small-file fan-out: $files")
  }

  test("filesPerPartition splits the hot value and caps every value") {
    val out = Files.createTempDirectory("graft_skew_budget")
    val df = skewed
    PartitionedSink.write(df, out.toString,
      SinkConfig(ParquetFormat, Seq("shard"), runtimeNullCheck = true,
        filesPerPartition = Some(4)))
    val files = dataFiles(out)
    // cap: no value may exceed the budget, fragmented input or not
    assert(files.values.forall(_ <= 4), s"file budget of 4 violated: $files")
    // split: the hot value's rows spread across multiple writing tasks
    // (salt-group -> reducer assignment is deterministic content hashing,
    // so this does not flake; collisions can only merge groups, and with
    // 4 salts over 8 reducers at least two land apart)
    assert(files("shard=hot") >= 2, s"hot value must split: $files")
    // content identity: same rows, same routing as the source
    val back = PartitionedSink.readBack(spark, out.toString)
    val src = skewed
    assert(back.count() == src.count())
    assert(back.agg(sum("o_orderkey")).head.getLong(0) ==
      src.agg(sum("o_orderkey")).head.getLong(0))
    assert(back.groupBy("shard").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      src.groupBy("shard").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("filesPerPartition=1 compacts each value to a single file") {
    val out = Files.createTempDirectory("graft_skew_one")
    PartitionedSink.write(skewed, out.toString,
      SinkConfig(ParquetFormat, Seq("shard"), runtimeNullCheck = true,
        filesPerPartition = Some(1)))
    val files = dataFiles(out)
    assert(files.values.forall(_ == 1), s"expected 1 file per value: $files")
  }

  test("maxRecordsPerFile splits oversized partitions deterministically") {
    val out = Files.createTempDirectory("graft_skew_rcap")
    val hotRows = skewed.filter(col("shard") === "hot").count()
    // one task per value (filesPerPartition=1) + a row cap of a third of the
    // hot value -> the writer must split hot into >= 3 files while the cold
    // values (far under the cap) stay at one file each
    PartitionedSink.write(skewed, out.toString,
      SinkConfig(ParquetFormat, Seq("shard"), runtimeNullCheck = true,
        filesPerPartition = Some(1), maxRecordsPerFile = Some(hotRows / 3)))
    val files = dataFiles(out)
    assert(files("shard=hot") >= 3, s"row cap must split the hot value: $files")
    assert(files.filter(_._1 != "shard=hot").values.forall(_ == 1),
      s"under-cap values stay single-file: $files")
    assert(PartitionedSink.readBack(spark, out.toString).count() ==
      skewed.count())
  }

  test("adaptive salt: file counts track per-value row counts within the target") {
    val out = Files.createTempDirectory("graft_skew_adaptive")
    val df = skewed
    val counts = df.groupBy("shard").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = 200L
    PartitionedSink.write(df, out.toString,
      SinkConfig(ParquetFormat, Seq("shard"), runtimeNullCheck = true,
        adaptiveRowsPerFile = Some(target)))
    val files = dataFiles(out)
    counts.foreach { case (v, n) =>
      val want = math.ceil(n.toDouble / target).toLong
      val got = files(s"shard=$v").toLong
      // the derived width IS the ceiling; hash collisions across reducers
      // can only merge salt groups, and rows >> width keeps every salt
      // populated — so the count tracks the per-value need within 2x below
      assert(got <= want, s"value $v ($n rows): $got files exceeds width $want")
      assert(got >= math.max(1L, want / 2),
        s"value $v ($n rows): $got files does not track its need $want")
    }
    // the measured widths, not a uniform n: hot fans out, cold stays at 1
    assert(files("shard=hot") > 1, s"hot value must fan out: $files")
    assert(counts.filter(_._2 <= target).keys
      .forall(v => files(s"shard=$v") == 1),
      s"under-target values must stay single-file: $files")
    // content identity through the adaptive path
    val back = PartitionedSink.readBack(spark, out.toString)
    assert(back.count() == df.count())
    assert(back.agg(sum("o_orderkey")).head.getLong(0) ==
      df.agg(sum("o_orderkey")).head.getLong(0))
  }

  test("adaptive salt respects the filesPerPartition cap") {
    val out = Files.createTempDirectory("graft_skew_adaptive_cap")
    // target 200 gives the ~1350-row hot value width 7, capped at 3
    PartitionedSink.write(skewed, out.toString,
      SinkConfig(ParquetFormat, Seq("shard"), runtimeNullCheck = true,
        filesPerPartition = Some(3), adaptiveRowsPerFile = Some(200L)))
    val files = dataFiles(out)
    assert(files.values.forall(_ <= 3), s"cap of 3 violated: $files")
    assert(files("shard=hot") > 1, s"hot value must still split: $files")
  }

  test("adaptive salt raises the reducer count past a width above shuffle.partitions") {
    val out = Files.createTempDirectory("graft_skew_adaptive_wide")
    val hotRows = skewed.filter(col("shard") === "hot").count()
    // width for the hot value = ceil(1350/100) = 14 > the session's 8
    // shuffle partitions: without raising nShuffle to the max width,
    // repartition would fold the 14 salt groups into <= 8 reducers and
    // under-split past the target
    val target = 100L
    val want = math.ceil(hotRows.toDouble / target).toLong
    assert(want > spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"fixture no longer exercises width > shuffle.partitions (want=$want)")
    PartitionedSink.write(skewed, out.toString,
      SinkConfig(ParquetFormat, Seq("shard"), runtimeNullCheck = true,
        adaptiveRowsPerFile = Some(target)))
    val files = dataFiles(out)
    assert(files("shard=hot") <= want, s"width must cap files: $files")
    assert(files("shard=hot") >= want / 2,
      s"hot value must track its width $want even past shuffle.partitions: $files")
  }

  test("invalid budgets are rejected up front") {
    val df = skewed
    intercept[graft.schema.GraftSchemaException] {
      PartitionedSink.validate(df, SinkConfig(ParquetFormat, Seq("shard"),
        runtimeNullCheck = true, filesPerPartition = Some(0)))
    }
    intercept[graft.schema.GraftSchemaException] {
      PartitionedSink.validate(df, SinkConfig(ParquetFormat, Seq("shard"),
        runtimeNullCheck = true, maxRecordsPerFile = Some(-1L)))
    }
    intercept[graft.schema.GraftSchemaException] {
      PartitionedSink.validate(df, SinkConfig(ParquetFormat, Seq("shard"),
        runtimeNullCheck = true, adaptiveRowsPerFile = Some(0L)))
    }
  }
}
