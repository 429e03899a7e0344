package graft.sink

import graft.SparkSpec
import graft.schema.{GraftSchemaException, SchemaEvolution}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The schema-evolution gate wired into the sink's append and merge
  * paths: Strict freezes the stored contract, Widen admits safe drift
  * end-to-end (data readable under the merged schema), breakage fails
  * loudly BEFORE any file lands. */
class EvolutionSinkSpec extends SparkSpec {

  import spark.implicits._

  private def cfg(policy: SchemaEvolution.Policy) =
    SinkConfig(ParquetFormat, Seq("grp"), runtimeNullCheck = true,
      evolution = Some(policy))

  private def seed(dir: String, policy: SchemaEvolution.Policy): Unit =
    PartitionedSink.write(
      Seq((1L, "A", 10), (2L, "B", 20)).toDF("id", "grp", "n"),
      dir, cfg(policy)): Unit

  test("first write into an empty tree never consults the gate") {
    val out = Files.createTempDirectory("graft_evo_first").toString
    seed(out, SchemaEvolution.Strict) // no stored schema yet — must pass
    assert(PartitionedSink.readBack(spark, out).count() == 2)
  }

  test("Strict: identical append passes, any drift is rejected pre-write") {
    val out = Files.createTempDirectory("graft_evo_strict").toString
    seed(out, SchemaEvolution.Strict)
    PartitionedSink.write(
      Seq((3L, "A", 30)).toDF("id", "grp", "n"), out, cfg(SchemaEvolution.Strict))
    assert(PartitionedSink.readBack(spark, out).count() == 3)
    val drifted = Seq((4L, "B", 40, "x")).toDF("id", "grp", "n", "note")
    val e = intercept[GraftSchemaException](
      PartitionedSink.write(drifted, out, cfg(SchemaEvolution.Strict)))
    assert(e.getMessage.contains("note"))
    // rejected BEFORE any file landed
    assert(PartitionedSink.readBack(spark, out).count() == 3)
  }

  test("Widen: new nullable column appends; old rows read null under mergeSchema") {
    val out = Files.createTempDirectory("graft_evo_widen").toString
    seed(out, SchemaEvolution.Widen)
    PartitionedSink.write(
      Seq((3L, "B", 30, "fresh")).toDF("id", "grp", "n", "note"),
      out, cfg(SchemaEvolution.Widen))
    val all = spark.read.option("mergeSchema", "true").parquet(out)
    assert(all.count() == 3)
    assert(all.filter(col("id") === 3L).select("note").head.getString(0)
      == "fresh")
    assert(all.filter(col("id") === 1L).select("note").head.isNullAt(0)
      || all.filter(col("id") === 1L).select("note").head.getString(0) == null)
  }

  test("Widen still rejects breakage: narrowed column, nothing written") {
    val out = Files.createTempDirectory("graft_evo_break").toString
    seed(out, SchemaEvolution.Widen)
    // id narrowed long → int
    val bad = Seq((9, "A", 99)).toDF("id", "grp", "n")
    val e = intercept[GraftSchemaException](
      PartitionedSink.write(bad, out, cfg(SchemaEvolution.Widen)))
    assert(e.getMessage.contains("id") && e.getMessage.contains("NARROW"))
    assert(PartitionedSink.readBack(spark, out).count() == 2)
  }

  test("mergeUpsert under Widen: batch with a new nullable column lands") {
    val out = Files.createTempDirectory("graft_evo_merge").toString
    seed(out, SchemaEvolution.Widen)
    val updates = Seq((1L, "A", 11, "tagged"), (5L, "B", 50, "new"))
      .toDF("id", "grp", "n", "note")
    PartitionedSink.mergeUpsert(
      spark, out, updates, Seq("id"), cfg(SchemaEvolution.Widen)): Unit
    val all = spark.read.option("mergeSchema", "true").parquet(out)
    assert(all.count() == 3)
    assert(all.filter(col("id") === 1L).select("n").head.getInt(0) == 11)
    assert(all.filter(col("id") === 1L).select("note").head.getString(0)
      == "tagged")
  }

  test("mergeUpsert under Strict rejects a drifted batch before touching disk") {
    val out = Files.createTempDirectory("graft_evo_merge_strict").toString
    seed(out, SchemaEvolution.Strict)
    val updates = Seq((1L, "A", 11, "tagged")).toDF("id", "grp", "n", "note")
    intercept[GraftSchemaException](
      PartitionedSink.mergeUpsert(
        spark, out, updates, Seq("id"), cfg(SchemaEvolution.Strict)))
    val all = PartitionedSink.readBack(spark, out)
    assert(all.count() == 2 && !all.columns.contains("note"))
  }
}
