package graft.schema

import org.apache.spark.sql.types._

/**
 * Pre-flight validation surface (SURVEY.md §2.5, V1–V4).
 *
 * Reference behaviors reproduced:
 *  - partition fields must exist and be non-nullable in the input schema
 *    (`/root/reference/src/main/java/io/cdap/plugin/PartitionedFileSetSinkConfig.java:126-149`)
 *  - output (file) schema = declared schema minus partition fields
 *    (`PartitionedFileSetSinkConfig.java:101-118`)
 *  - per-format codec whitelists (`common/FileSetUtil.java:224-286`)
 *  - ORC option completeness + indexStride >= 1000
 *    (`ORCDynamicPartitionedDatasetSink.java:170-183`)
 */
object Validators {

  /** V2: split a comma-separated field-name list into an ordered partition
    * spec, enforcing existence and non-nullability. */
  def partitionFields(schema: StructType, fieldNames: String): Seq[String] = {
    val fields = fieldNames.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (fields.isEmpty)
      throw new GraftSchemaException("at least one partition field is required")
    fields.foreach(f => validatePartitionField(schema, f))
    fields
  }

  /** One partition field: must exist, must be non-nullable
    * (`PartitionedFileSetSinkConfig.java:134-144`). */
  def validatePartitionField(schema: StructType, field: String): Unit = {
    val idx = schema.fieldNames.indexOf(field)
    if (idx < 0)
      throw new GraftSchemaException(
        s"Partition field '$field' does not exist in the input schema " +
          s"(fields: ${schema.fieldNames.mkString(", ")})")
    if (schema(idx).nullable)
      throw new GraftSchemaException(
        s"Partition field '$field' must not be nullable")
  }

  /** T1/V3: the payload (file) schema — declared schema minus partition
    * fields. Spark's partitionBy does this automatically at write time; this
    * exists for pre-flight introspection and catalog DDL. */
  def outputSchema(schema: StructType, partitionFields: Seq[String]): StructType = {
    partitionFields.foreach(f => validatePartitionField(schema, f))
    val remaining = schema.fields.filterNot(f => partitionFields.contains(f.name))
    if (remaining.isEmpty)
      throw new GraftSchemaException(
        "schema must contain at least one non-partition field")
    StructType(remaining)
  }

  /** F4–F6 codec whitelists (keys normalized to lowercase). The value is the
    * Spark writer `compression` option to use. */
  val AvroCodecs: Map[String, String] =
    Map("none" -> "uncompressed", "snappy" -> "snappy", "deflate" -> "deflate")
  val ParquetCodecs: Map[String, String] =
    Map("none" -> "none", "snappy" -> "snappy", "gzip" -> "gzip", "lzo" -> "lzo")
  val OrcCodecs: Map[String, String] =
    Map("none" -> "none", "snappy" -> "snappy", "zlib" -> "zlib")

  /** EXTENSION beyond the reference's 2015-era whitelists
    * (`common/FileSetUtil.java:224-286` stops at snappy/deflate/gzip/lzo/
    * zlib): zstd is the modern archival default on all three formats and
    * Spark writes it natively. Kept in separate maps so the
    * reference-faithful lists above stay byte-for-byte faithful; admitted
    * only when `SinkConfig.allowModernCodecs` opts in. Avro's writer
    * option spells it `zstandard`; both spellings are accepted as keys. */
  val ModernAvroCodecs: Map[String, String] =
    Map("zstd" -> "zstandard", "zstandard" -> "zstandard")
  val ModernParquetCodecs: Map[String, String] =
    Map("zstd" -> "zstd", "zstandard" -> "zstd")
  val ModernOrcCodecs: Map[String, String] =
    Map("zstd" -> "zstd", "zstandard" -> "zstd")

  def resolveCodec(whitelist: Map[String, String], codec: String, format: String): String =
    whitelist.getOrElse(codec.trim.toLowerCase,
      throw new GraftSchemaException(
        s"Unsupported compression codec '$codec' for $format " +
          s"(supported: ${whitelist.keys.toSeq.sorted.mkString(", ")})"))

  /** ORC writer tuning (intended semantics of
    * `ORCDynamicPartitionedDatasetSink.java:104-127`, NOT its two in-repo
    * bugs — see SURVEY.md §2.6 F6). */
  final case class OrcOptions(
      compressionChunkSize: Long,
      stripeSize: Long,
      indexStride: Int,
      createIndex: Boolean)

  /** V4: if an ORC codec is configured, all tuning options are required and
    * indexStride must be >= 1000. */
  def validateOrcOptions(codec: Option[String], opts: Option[OrcOptions]): Unit =
    (codec, opts) match {
      case (Some(c), None) if c.trim.toLowerCase != "none" =>
        throw new GraftSchemaException(
          "ORC compression requires compressionChunkSize, stripeSize, " +
            "indexStride and createIndex to all be set")
      case (_, Some(o)) =>
        if (o.indexStride < 1000)
          throw new GraftSchemaException(
            s"ORC indexStride must be >= 1000, got ${o.indexStride}")
        if (o.compressionChunkSize <= 0 || o.stripeSize <= 0)
          throw new GraftSchemaException("ORC sizes must be positive")
      case _ => ()
    }
}
