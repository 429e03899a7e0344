package graft.sink

import graft.SparkSpec
import graft.schema.GraftSchemaException

import java.nio.file.Files

/** The zstd extension flag: reference whitelists stay closed by default,
  * allowModernCodecs admits zstd on all three formats and the written
  * trees round-trip. */
class ModernCodecSpec extends SparkSpec {

  import spark.implicits._

  private def sample = Seq((1L, "x", "A"), (2L, "y", "B"), (3L, "z", "A"))
    .toDF("id", "payload", "grp")

  test("zstd is rejected under the reference-faithful default whitelist") {
    for (fmt <- Seq(ParquetFormat, AvroFormat, OrcFormat)) {
      val e = intercept[GraftSchemaException] {
        PartitionedSink.validate(sample,
          SinkConfig(fmt, Seq("grp"), Some("zstd"), runtimeNullCheck = true))
      }
      assert(e.getMessage.contains("zstd"), fmt.name)
    }
  }

  test("allowModernCodecs round-trips zstd on parquet, avro, and orc") {
    for (fmt <- Seq(ParquetFormat, AvroFormat, OrcFormat)) {
      val out = Files.createTempDirectory(s"graft_zstd_${fmt.getClass.getSimpleName}")
      val cfg = SinkConfig(fmt, Seq("grp"), Some("zstd"),
        runtimeNullCheck = true, allowModernCodecs = true,
        orcOptions = if (fmt == OrcFormat)
          Some(graft.schema.Validators.OrcOptions(262144, 67108864, 10000,
            createIndex = true))
        else None)
      PartitionedSink.write(sample, out.toString, cfg)
      val back = PartitionedSink.readBack(spark, out.toString, fmt)
        .select("id", "payload", "grp").as[(Long, String, String)]
        .collect().toSet
      assert(back == Set((1L, "x", "A"), (2L, "y", "B"), (3L, "z", "A")),
        fmt.name)
      // the codec must actually reach the files, not silently fall back —
      // parquet/orc stamp it in the data file name; avro in the header
      val files = java.nio.file.Files.walk(out).iterator()
      val names = new scala.collection.mutable.ArrayBuffer[String]
      while (files.hasNext) names += files.next().getFileName.toString
      fmt match {
        case ParquetFormat =>
          assert(names.exists(_.contains(".zstd.parquet")), names)
        case OrcFormat =>
          assert(names.exists(_.contains(".zstd.orc")), names)
        case AvroFormat =>
          val avro = java.nio.file.Files.walk(out).iterator()
          var found = false
          while (avro.hasNext && !found) {
            val p = avro.next()
            if (p.toString.endsWith(".avro")) {
              val head = java.nio.file.Files.readAllBytes(p)
                .take(4096).map(_.toChar).mkString
              found = head.contains("zstandard")
            }
          }
          assert(found, "avro header must name the zstandard codec")
      }
    }
  }

  test("the zstandard spelling resolves too") {
    PartitionedSink.validate(sample,
      SinkConfig(ParquetFormat, Seq("grp"), Some("zstandard"),
        runtimeNullCheck = true, allowModernCodecs = true))
  }
}
