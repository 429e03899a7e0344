package graft.sink

import graft.schema.GraftSchemaException
import org.scalatest.funsuite.AnyFunSuite

/**
 * Configure-time vs run-time validation split (reference parity:
 * `PartitionedFileSetSink.java:56-67` skips each validation whose backing
 * property contains an unexpanded macro and defers dataset creation;
 * `PartitionedFileSetSinkConfig.java:152-162`). Run time = [[SinkProperties
 * .resolve]], where every macro must expand.
 */
class ConfigureModeSpec extends AnyFunSuite {

  private val base = Map(
    "name" -> "sales",
    "basePath" -> "/data/out",
    "schema" -> "id BIGINT NOT NULL, region STRING NOT NULL, payload STRING",
    "fieldNames" -> "region",
    "format" -> "parquet",
    "compressionCodec" -> "snappy")

  test("macro-free config: everything validates at configure time") {
    val r = SinkProperties.validateConfigure(base)
    assert(r.deferred.isEmpty)
    assert(r.validated == Set(
      "name", "basePath", "schema", "fieldNames", "format", "compressionCodec"))
  }

  test("macroed basePath defers only its own check") {
    val r = SinkProperties.validateConfigure(base + ("basePath" -> "${run.dir}/out"))
    assert(r.deferred == Set("basePath"))
    assert(r.validated.contains("schema") && r.validated.contains("fieldNames"))
  }

  test("macroed schema defers the dependent fieldNames check too") {
    val r = SinkProperties.validateConfigure(base + ("schema" -> "${schema.json}"))
    assert(r.deferred == Set("schema", "fieldNames"))
  }

  test("macroed format defers the codec whitelist check") {
    val r = SinkProperties.validateConfigure(base + ("format" -> "${fmt}"))
    assert(r.deferred == Set("format", "compressionCodec"))
  }

  test("a missing required property is an error even at configure time") {
    intercept[GraftSchemaException] {
      SinkProperties.validateConfigure(base - "basePath")
    }
  }

  test("macro-free violations still fail at configure time") {
    intercept[GraftSchemaException] { // nullable partition column
      SinkProperties.validateConfigure(base + ("fieldNames" -> "payload"))
    }
    intercept[GraftSchemaException] { // unknown codec for the format
      SinkProperties.validateConfigure(base + ("compressionCodec" -> "zip"))
    }
    intercept[GraftSchemaException] { // unknown format
      SinkProperties.validateConfigure(base + ("format" -> "sequencefile"))
    }
  }

  test("macroed ORC options defer; macro-free ORC options validate") {
    val orc = base + ("format" -> "orc") +
      ("compressionCodec" -> "zlib") +
      ("compressionChunkSize" -> "262144") + ("stripeSize" -> "67108864") +
      ("indexStride" -> "10000") + ("createIndex" -> "true")
    val ok = SinkProperties.validateConfigure(orc)
    assert(ok.deferred.isEmpty && ok.validated.contains("stripeSize"))

    val deferred = SinkProperties.validateConfigure(
      orc + ("stripeSize" -> "${orc.stripe}"))
    assert(deferred.deferred.contains("stripeSize"))

    intercept[GraftSchemaException] { // stride < 1000, macro-free → fails now
      SinkProperties.validateConfigure(orc + ("indexStride" -> "5"))
    }

    // codec set but tuning options entirely absent — run-time parity says
    // this fails, and all involved properties are macro-free, so it must
    // fail at configure time too
    intercept[GraftSchemaException] {
      SinkProperties.validateConfigure(
        base + ("format" -> "orc") + ("compressionCodec" -> "zlib"))
    }
  }

  test("run time: an unexpanded macro is an error; supplied macros resolve") {
    val propsWithMacro = base + ("basePath" -> "${run.dir}/out")
    intercept[Exception] {
      SinkProperties.resolve(propsWithMacro)
    }
    val resolved = SinkProperties.resolve(
      propsWithMacro, runtime = Map("run.dir" -> "/data/2026-08-12"))
    assert(resolved.path == "/data/2026-08-12/out/sales")
  }
}
