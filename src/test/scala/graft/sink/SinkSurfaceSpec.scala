package graft.sink

import graft.schema.GraftSchemaException
import graft.{SparkSpec, Tables}
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Coverage for the remaining SURVEY §2 rows: T2 constant injection, F7
  * catalog registration, §2.8 schema-enforced sources, V5 macro-driven
  * sink properties. */
class SinkSurfaceSpec extends SparkSpec {

  test("T2: stage-constant injection appends a literal column") {
    val df = Tables(spark, sf0001, "orders").limit(5)
    val withStage = PartitionedSink.withStageConstant(df, "orders_sink")
    assert(withStage.schema.fieldNames.last == "_stage")
    assert(withStage.select("_stage").distinct().collect().map(_.getString(0)).toSeq
      == Seq("orders_sink"))
  }

  test("F7: register written tree as external table, SHOW PARTITIONS works") {
    val out = Files.createTempDirectory("graft_catalog").toString
    PartitionedSink.write(Tables(spark, sf0001, "orders"), out,
      SinkConfig(ParquetFormat, Seq("o_orderpriority"), runtimeNullCheck = true))
    PartitionCatalog.registerExternal(spark, "orders_part", out)
    val parts = spark.sql("SHOW PARTITIONS orders_part").collect().map(_.getString(0))
    assert(parts.length == 5)
    assert(parts.exists(_.contains("o_orderpriority=1-URGENT")))
    // queryable by name with partition pruning
    val n = spark.table("orders_part")
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(n > 0)
    spark.sql("DROP TABLE orders_part")
  }

  test("F7: table properties carry SerDe classes and Avro schema literal") {
    // reference parity: FileSetUtil.java:75-80,114-121,155-164 set the Hive
    // SerDe/IO-format classes and avro.schema.literal on the Explore table
    import spark.implicits._
    val out = Files.createTempDirectory("graft_catalog_props").toString
    val df = Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("id", "v", "part")
    PartitionedSink.write(df, out,
      SinkConfig(AvroFormat, Seq("part"), runtimeNullCheck = true))
    PartitionCatalog.registerExternal(spark, "avro_props", out, "avro")
    val show = spark.sql("SHOW CREATE TABLE avro_props").head().getString(0)
    assert(show.contains("avro.schema.literal"))
    assert(show.contains("\"type\":\"record\"") || show.contains("'type':'record'")
      || show.contains("record"))
    assert(show.contains("org.apache.hadoop.hive.serde2.avro.AvroSerDe"))
    assert(spark.table("avro_props").count() == 2)
    spark.sql("DROP TABLE avro_props")

    val outP = Files.createTempDirectory("graft_catalog_props2").toString
    PartitionedSink.write(df, outP,
      SinkConfig(ParquetFormat, Seq("part"), runtimeNullCheck = true))
    PartitionCatalog.registerExternal(spark, "pq_props", outP)
    val showP = spark.sql("SHOW CREATE TABLE pq_props").head().getString(0)
    assert(showP.contains("ParquetHiveSerDe"))
    spark.sql("DROP TABLE pq_props")
  }

  test("CREATE pre-check consults the catalog, not the filesystem, when registered") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_cat_precheck").toString
    val v1 = Seq((1L, "a", "p1")).toDF("id", "v", "part")
    PartitionedSink.write(v1, out,
      SinkConfig(ParquetFormat, Seq("part"), runtimeNullCheck = true))
    PartitionCatalog.registerExternal(spark, "precheck_t", out)
    // diverge catalog from disk: p2 lands on disk AFTER registration, so the
    // catalog doesn't know it (no recoverPartitions)
    Seq((2L, "b", "p2")).toDF("id", "v", "part").write
      .partitionBy("part").mode("append").parquet(out)
    val incoming = Seq((3L, "c", "p2")).toDF("id", "v", "part")
    val cfgFs = SinkConfig(ParquetFormat, Seq("part"),
      disposition = Create, runtimeNullCheck = true)
    // filesystem path sees the on-disk p2 -> clash
    intercept[IllegalStateException] {
      PartitionedSink.write(incoming, out, cfgFs)
    }
    // catalog path trusts the registered partition list -> no clash: proves
    // SHOW PARTITIONS, not listStatus, is the existing side
    PartitionedSink.write(incoming, out,
      cfgFs.copy(catalogTable = Some("precheck_t")))
    // and a registered clash IS detected through the catalog
    spark.catalog.recoverPartitions("precheck_t")
    intercept[IllegalStateException] {
      PartitionedSink.write(incoming, out,
        cfgFs.copy(catalogTable = Some("precheck_t")))
    }
    spark.sql("DROP TABLE precheck_t")
  }

  test("F7 executed: hiveRegistrationDdl runs on a real metastore, MSCK recovers, Hive reads back") {
    // closes the F7 honesty boundary: the parity DDL is EXECUTED against the
    // suite's Derby-backed Hive metastore (FileSetUtil.java:114-121,155-164
    // semantics), not just emitted as text
    val out = Files.createTempDirectory("graft_hive_f7").toString
    val orders = Tables(spark, sf0001, "orders")
    PartitionedSink.write(orders, out,
      SinkConfig(ParquetFormat, Seq("o_orderpriority"), runtimeNullCheck = true))
    spark.sql("DROP TABLE IF EXISTS orders_hive_f7")
    spark.sql(PartitionCatalog.hiveRegistrationDdl(
      "orders_hive_f7", out, orders.schema, Seq("o_orderpriority")))
    // a real metastore knows the table but NO partitions until repair
    assert(spark.sql("SHOW PARTITIONS orders_hive_f7").count() == 0)
    spark.sql("MSCK REPAIR TABLE orders_hive_f7")
    val parts = spark.sql("SHOW PARTITIONS orders_hive_f7")
      .collect().map(_.getString(0))
    assert(parts.length == 5 && parts.exists(_.contains("o_orderpriority=1-URGENT")))
    // catalog listing equals the filesystem walk on the same tree
    assert(PartitionCatalog.listFromCatalog(spark, "orders_hive_f7").toSet
      == PartitionCatalog.list(spark, out, 1).toSet)
    // read-back through the Hive-format table is the written data, exactly.
    // Hive renders TIMESTAMP_NTZ columns as TIMESTAMP (its own timestamps
    // are wall-clock), so cast back to the source schema for the compare —
    // value-preserving under the suite's UTC session.
    val back = spark.table("orders_hive_f7")
      .select(orders.schema.fields.toIndexedSeq
        .map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    spark.sql("DROP TABLE orders_hive_f7")

    // avro flavor: STORED AS AVRO over a spark-avro-written tree (the
    // reference's Explore-registration format, FileSetUtil.java:114-121)
    import spark.implicits._
    val outA = Files.createTempDirectory("graft_hive_f7_avro").toString
    val df = Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p1"))
      .toDF("id", "v", "part")
    PartitionedSink.write(df, outA,
      SinkConfig(AvroFormat, Seq("part"), runtimeNullCheck = true))
    spark.sql("DROP TABLE IF EXISTS avro_hive_f7")
    spark.sql(PartitionCatalog.hiveRegistrationDdl(
      "avro_hive_f7", outA, df.schema, Seq("part"), "avro"))
    spark.sql("MSCK REPAIR TABLE avro_hive_f7")
    assert(spark.sql("SHOW PARTITIONS avro_hive_f7").count() == 2)
    val backA = spark.table("avro_hive_f7").select("id", "v", "part")
    assert(backA.exceptAll(df).isEmpty && df.exceptAll(backA).isEmpty)
    spark.sql("DROP TABLE avro_hive_f7")

    // orc flavor: the reference configures ORC Explore/SerDe registration
    // equally (FileSetUtil.java:151-165) — execute it, same gauntlet
    val outO = Files.createTempDirectory("graft_hive_f7_orc").toString
    PartitionedSink.write(df, outO,
      SinkConfig(OrcFormat, Seq("part"), runtimeNullCheck = true))
    spark.sql("DROP TABLE IF EXISTS orc_hive_f7")
    spark.sql(PartitionCatalog.hiveRegistrationDdl(
      "orc_hive_f7", outO, df.schema, Seq("part"), "orc"))
    assert(spark.sql("SHOW PARTITIONS orc_hive_f7").count() == 0)
    spark.sql("MSCK REPAIR TABLE orc_hive_f7")
    val partsO = spark.sql("SHOW PARTITIONS orc_hive_f7")
      .collect().map(_.getString(0))
    assert(partsO.toSet == Set("part=p1", "part=p2"))
    val backO = spark.table("orc_hive_f7").select("id", "v", "part")
    assert(backO.exceptAll(df).isEmpty && df.exceptAll(backO).isEmpty)
    spark.sql("DROP TABLE orc_hive_f7")
  }

  test("hiveRegistrationDdl emits STORED AS storage with partition columns split out") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType, nullable = true),
      StructField("day", StringType, nullable = false),
      StructField("region", StringType, nullable = false)))
    val ddl = PartitionCatalog.hiveRegistrationDdl(
      "sales", "/data/sales", schema, Seq("region", "day"), "avro")
    assert(ddl.contains("CREATE EXTERNAL TABLE `sales` (`id` BIGINT, `v` STRING)"))
    // declared field order defines nesting, not schema order
    assert(ddl.contains("PARTITIONED BY (`region` STRING, `day` STRING)"))
    assert(ddl.contains("STORED AS AVRO"))
    assert(ddl.contains("LOCATION '/data/sales'"))
  }

  test("hostile partition values round-trip the catalog listing (incl '+' and '%')") {
    // '+' is the URLDecoder trap: unescaped on write, a URL-decode turns it
    // into a space and the CREATE pre-check then misses the partition
    import spark.implicits._
    val out = Files.createTempDirectory("graft_plus").toString
    val vals = Seq("2026-01-01T00:00:00+00", "a+b", "50%off", "x y")
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "part")
    PartitionedSink.write(df, out,
      SinkConfig(ParquetFormat, Seq("part"), runtimeNullCheck = true))
    val listed = PartitionCatalog.list(spark, out, 1).map(_("part")).toSet
    assert(listed == vals.toSet)
    // and the CREATE pre-check must now detect the collision
    intercept[IllegalStateException] {
      PartitionedSink.write(df, out, SinkConfig(ParquetFormat, Seq("part"),
        disposition = Create, runtimeNullCheck = true))
    }
  }

  test("write/readBack do not leak session conf changes") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_confleak").toString
    val overwriteKey = "spark.sql.sources.partitionOverwriteMode"
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val priorOverwrite = spark.conf.get(overwriteKey)
    val priorInfer = spark.conf.get(inferKey)
    val df = Seq((1L, "p1")).toDF("id", "part")
    PartitionedSink.write(df, out, SinkConfig(ParquetFormat, Seq("part"),
      disposition = OverwritePartitions, runtimeNullCheck = true))
    PartitionedSink.readBack(spark, out).count()
    assert(spark.conf.get(overwriteKey) == priorOverwrite)
    assert(spark.conf.get(inferKey) == priorInfer)
  }

  test("sources: schema-enforced csv/json round-trip") {
    val dir = Files.createTempDirectory("graft_src").toString
    val df = Tables(spark, sf0001, "nation")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    df.write.mode("overwrite").json(s"$dir/json")
    val ddl = "n_nationkey INT, n_name STRING, n_regionkey INT"
    val fromCsv = Sources.readDeclared(spark, "csv", s"$dir/csv", ddl,
      Map("header" -> "true"))
    val fromJson = Sources.readDeclared(spark, "json", s"$dir/json", ddl)
    assert(fromCsv.count() == 25 && fromJson.count() == 25)
    assert(fromCsv.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    intercept[IllegalArgumentException] {
      Sources.read(spark, "xml", s"$dir/csv")
    }
  }

  test("OverwritePartitions replaces only incoming partitions") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_dynover").toString
    val v1 = Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "v", "part")
    PartitionedSink.write(v1, out,
      SinkConfig(ParquetFormat, Seq("part"), runtimeNullCheck = true))
    // overwrite p2 only; p1 must survive untouched
    val v2 = Seq((3L, "c", "p2")).toDF("id", "v", "part")
    PartitionedSink.write(v2, out,
      SinkConfig(ParquetFormat, Seq("part"),
        disposition = OverwritePartitions, runtimeNullCheck = true))
    val back = PartitionedSink.readBack(spark, out)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("part"))).toSet
    assert(back == Set((1L, "p1"), (3L, "p2")))
  }

  test("range-sharded write: n files, globally ordered, content-complete") {
    val out = Files.createTempDirectory("graft_range_shard").toString
    val docs = Tables(spark, sf0001, "documents")
    PartitionedSink.writeRangeSharded(docs, out, "doc_id", nShards = 8)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val shards = back
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("n")))
      .sortBy(_._1)
    assert(shards.length == 8)
    // global range order: shard i's max key sorts before shard i+1's min
    shards.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 < b._1, s"overlapping shard ranges: $a vs $b")
    }
    // balanced enough to be useful (sampled boundaries, not exact eighths)
    assert(shards.forall(_._3 > 0))
  }

  test("bucketed tables join without a shuffle exchange") {
    val li = Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables(spark, sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    PartitionedSink.writeBucketed(li, "li_b", 8, Seq("l_orderkey"), Seq("l_orderkey"))
    PartitionedSink.writeBucketed(o, "o_b", 8, Seq("o_orderkey"), Seq("o_orderkey"))
    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == li.count()) // every lineitem has its order
    spark.sql("DROP TABLE li_b"); spark.sql("DROP TABLE o_b")
  }

  test("avro round-trip: nullable fields with nulls, all primitive types survive") {
    // SURVEY §7.4 item 6: Avro nullable (union-with-null) and primitive
    // matrix through the real writer and back
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("b", BooleanType, nullable = true),
      StructField("i", IntegerType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("by", BinaryType, nullable = true),
      StructField("part", StringType, nullable = false)))
    val rows = Seq(
      Row(1L, true, 42, 1.5f, 2.5, "x", Array[Byte](1, 2), "p1"),
      Row(2L, null, null, null, null, null, null, "p1"),
      Row(3L, false, -1, -0.5f, 1e300, "", Array.empty[Byte], "p2"))
    val df = spark.createDataFrame(rows.asJava, schema)
    val out = Files.createTempDirectory("graft_avro_rt").toString
    PartitionedSink.write(df, out, SinkConfig(AvroFormat, Seq("part"), Some("deflate")))
    val back = PartitionedSink.readBack(spark, out, AvroFormat)
    assert(back.count() == 3)
    val r2 = back.filter(col("id") === 2L).head()
    Seq("b", "i", "f", "d", "s", "by").foreach(c => assert(r2.isNullAt(r2.fieldIndex(c))))
    val r1 = back.filter(col("id") === 1L).head()
    assert(r1.getAs[Boolean]("b") && r1.getAs[Int]("i") == 42
      && r1.getAs[Float]("f") == 1.5f && r1.getAs[Double]("d") == 2.5
      && r1.getAs[String]("s") == "x"
      && r1.getAs[Array[Byte]]("by").toSeq == Seq[Byte](1, 2))
    val r3 = back.filter(col("id") === 3L).head()
    assert(r3.getAs[Double]("d") == 1e300
      && r3.getAs[Array[Byte]]("by").isEmpty)
  }

  test("V5: macro-driven sink properties resolve and validate") {
    val props = Map(
      "name" -> "${dataset}",
      "basePath" -> "/tmp/graft/${env}",
      "schema" -> """{"type":"record","name":"r","fields":[
        {"name":"id","type":"long"},{"name":"day","type":"string"}]}""",
      "fieldNames" -> "day",
      "format" -> "orc",
      "compressionCodec" -> "snappy",
      "appendToPartition" -> "Yes",
      "compressionChunkSize" -> "262144", "stripeSize" -> "67108864",
      "indexStride" -> "10000", "createIndex" -> "true")
    val runtime = Map("dataset" -> "sales", "env" -> "prod")
    val r = SinkProperties.resolve(props, runtime)
    assert(r.name == "sales" && r.path == "/tmp/graft/prod/sales")
    assert(r.config.format == OrcFormat && r.config.disposition == CreateOrAppend)
    assert(r.config.partitionFields == Seq("day"))
    assert(r.config.orcOptions.exists(_.indexStride == 10000))
    // default disposition is CREATE (reference appendToPartition default No)
    val r2 = SinkProperties.resolve(props - "appendToPartition", runtime)
    assert(r2.config.disposition == Create)
    // macro to nowhere fails
    intercept[Exception] {
      SinkProperties.resolve(props, runtime - "dataset")
    }
    // nullable partition field rejected through the properties surface too
    intercept[GraftSchemaException] {
      SinkProperties.resolve(props + ("schema" ->
        """{"type":"record","name":"r","fields":[
          {"name":"id","type":"long"},{"name":"day","type":["null","string"]}]}"""),
        runtime)
    }
  }
}
