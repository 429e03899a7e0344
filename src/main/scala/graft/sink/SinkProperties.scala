package graft.sink

import graft.macros.MacroParser
import graft.schema.{GraftSchemaException, SchemaDef, Validators}
import org.apache.spark.sql.types.StructType

/**
 * String-properties config surface for the sink — the Spark twin of the
 * reference's plugin configuration (SURVEY.md §1.2, §2.5):
 * `name`, `basePath`, `schema`, `fieldNames`, `format`,
 * `compressionCodec`, `appendToPartition` (default "No" → CREATE,
 * `PartitionedFileSetSinkConfig.java:63-65`), plus the ORC tuning options.
 * Every value supports `${...}` runtime-macro expansion
 * (`common/MacroParser.java`) against the supplied runtime properties.
 */
object SinkProperties {

  final case class ResolvedSink(
      name: String, path: String, schema: StructType, config: SinkConfig)

  def resolve(
      props: Map[String, String],
      runtime: Map[String, String] = Map.empty,
      functions: Map[String, String => String] = Map.empty): ResolvedSink = {

    def get(key: String): Option[String] =
      props.get(key).map(v => MacroParser.expand(v, runtime, functions))
    def require(key: String): String =
      get(key).getOrElse(throw new GraftSchemaException(s"Missing sink property '$key'"))

    val name = require("name")
    val basePath = require("basePath")
    val schema = SchemaDef.parse(require("schema"))
    val fields = Validators.partitionFields(schema, require("fieldNames"))
    val format = get("format").getOrElse("parquet").toLowerCase match {
      case "parquet" => ParquetFormat
      case "avro" => AvroFormat
      case "orc" => OrcFormat
      case other => throw new GraftSchemaException(s"Unknown sink format '$other'")
    }
    val codec = get("compressionCodec").filter(_.toLowerCase != "none")
    val disposition = get("appendToPartition").map(_.toLowerCase) match {
      case Some("yes") | Some("true") => CreateOrAppend
      case _ => Create // reference default: appendToPartition = "No"
    }
    val orc = (format, get("compressionChunkSize"), get("stripeSize"),
      get("indexStride"), get("createIndex")) match {
      case (OrcFormat, Some(c), Some(s), Some(i), Some(x)) =>
        Some(Validators.OrcOptions(c.toLong, s.toLong, i.toInt, x.toBoolean))
      case _ => None
    }
    val cfg = SinkConfig(format, fields, codec, disposition, orc)
    Validators.validateOrcOptions(if (format == OrcFormat) codec else None, orc)
    ResolvedSink(name, s"$basePath/$name", schema, cfg)
  }
}
