package graft.sources

import graft.schema.SchemaDef
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Schema-enforced source readers (SURVEY.md §2.8). The reference consumes
 * upstream rows against a declared schema; here the declared schema is
 * applied at the scan (`spark.read.schema(...)`) so Catalyst plans column
 * pruning/pushdown against the declared shape and malformed rows fail fast
 * rather than silently inferring.
 */
object Sources {

  /** Formats the engine reads. Avro needs its FQCN in this image (the
    * short name is not ServiceLoader-registered). */
  val Formats: Map[String, String] = Map(
    "parquet" -> "parquet",
    "orc" -> "orc",
    "avro" -> "org.apache.spark.sql.avro.AvroFileFormat",
    "csv" -> "csv",
    "json" -> "json")

  def read(
      spark: SparkSession, format: String, path: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val fmt = Formats.getOrElse(format.toLowerCase,
      throw new IllegalArgumentException(
        s"Unsupported source format '$format' (supported: ${Formats.keys.toSeq.sorted.mkString(", ")})"))
    val reader = spark.read.format(fmt).options(options)
    schema.fold(reader)(reader.schema).load(path)
  }

  /** Read with a declared schema in any supported syntax (Avro-style JSON,
    * Spark JSON, DDL — see [[graft.schema.SchemaDef.parse]]). */
  def readDeclared(
      spark: SparkSession, format: String, path: String, schemaText: String,
      options: Map[String, String] = Map.empty): DataFrame =
    read(spark, format, path, Some(SchemaDef.parse(schemaText)), options)
}
