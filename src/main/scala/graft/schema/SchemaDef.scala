package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._
import scala.util.Try

/** Thrown for any schema-definition or validation failure. */
final class GraftSchemaException(msg: String) extends IllegalArgumentException(msg)

/**
 * Schema definition layer: parse a user-declared schema (Avro-style JSON
 * object string, Spark JSON, or Spark DDL) into a Catalyst [[StructType]].
 *
 * Reference semantics (see SURVEY.md §1.2): the reference declares schema as a
 * JSON (Avro-style) string and cross-validates it as Avro + Hive
 * (`/root/reference/src/main/java/io/cdap/plugin/PartitionedFileSetSinkConfig.java:55-96`).
 * Here the single source of truth is [[StructType]]; Avro-style nullability
 * (union-with-null, `StructuredToOrcTransformer.java:106-111`) maps to
 * `StructField.nullable`, enum maps to string
 * (`StructuredToOrcTransformer.java:115-117`).
 */
object SchemaDef {

  private val mapper = new ObjectMapper()

  /** Parse any supported schema syntax. Tries Avro-style JSON record, then
    * Spark `DataType.fromJson`, then Spark DDL (`a INT, b STRING`). */
  def parse(text: String): StructType = {
    val trimmed = text.trim
    val attempts: Seq[() => StructType] = Seq(
      () => parseAvroStyle(trimmed),
      () => DataType.fromJson(trimmed) match {
        case s: StructType => s
        case other => throw new GraftSchemaException(s"not a struct: $other")
      },
      () => StructType.fromDDL(trimmed),
    )
    attempts.view.map(f => Try(f())).collectFirst { case scala.util.Success(s) => s }
      .getOrElse(throw new GraftSchemaException(
        s"Unparseable schema (tried Avro-style JSON, Spark JSON, DDL): $trimmed"))
  }

  /** Avro-style record JSON → StructType. Supported leaf types mirror the
    * reference's widget envelope + ORC switch: boolean, int, long, float,
    * double, string, bytes, enum(→string); union-with-null → nullable;
    * array/map/record map to Catalyst complex types (the Spark writers
    * support them natively for all three formats, a superset of the
    * reference's ORC path which threw UnsupportedTypeException —
    * `StructuredToOrcTransformer.java:112-138`). */
  def parseAvroStyle(json: String): StructType = {
    val node = mapper.readTree(json)
    if (node == null || !node.isObject || node.path("type").asText() != "record")
      throw new GraftSchemaException("Avro-style schema must be a record")
    structOf(node)
  }

  private def structOf(record: JsonNode): StructType = {
    val fields = record.path("fields")
    if (!fields.isArray)
      throw new GraftSchemaException("record schema missing 'fields' array")
    StructType(fields.elements().asScala.map { f =>
      val name = f.path("name").asText()
      if (name.isEmpty) throw new GraftSchemaException("field missing 'name'")
      val (dt, nullable) = typeOf(f.path("type"))
      StructField(name, dt, nullable)
    }.toSeq)
  }

  private def typeOf(t: JsonNode): (DataType, Boolean) = t match {
    case s if s.isTextual => (leaf(s.asText()), false)
    case u if u.isArray => // union: only [null, T] / [T, null] supported
      val members = u.elements().asScala.toSeq
      val (nulls, others) = members.partition(m => m.isTextual && m.asText() == "null")
      if (others.size != 1)
        throw new GraftSchemaException(s"unsupported union: $u")
      val (dt, _) = typeOf(others.head)
      (dt, nulls.nonEmpty)
    case o if o.isObject =>
      o.path("type").asText() match {
        case "enum" => (StringType, false) // enum → Text, StructuredToOrcTransformer.java:115-117
        case "array" =>
          val (el, elNullable) = typeOf(o.path("items"))
          (ArrayType(el, containsNull = elNullable), false)
        case "map" =>
          val (v, vNullable) = typeOf(o.path("values"))
          (MapType(StringType, v, valueContainsNull = vNullable), false)
        case "record" => (structOf(o), false)
        case "fixed" => (BinaryType, false)
        case other => throw new GraftSchemaException(s"unsupported complex type: $other")
      }
    case other => throw new GraftSchemaException(s"unsupported type node: $other")
  }

  private def leaf(name: String): DataType = name match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "bytes" => BinaryType
    case "null" => NullType
    case other => throw new GraftSchemaException(s"unsupported primitive type: $other")
  }

  /** Hive-style DDL string for catalog registration (F7 in SURVEY.md §2.6). */
  def toHiveDdl(schema: StructType): String = schema.toDDL
}
