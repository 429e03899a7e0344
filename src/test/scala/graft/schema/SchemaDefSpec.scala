package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaDefSpec extends AnyFunSuite {

  // sales fixture (FIXTURES.md §2) as an Avro-style JSON schema
  private val salesJson =
    """{"type":"record","name":"sales","fields":[
      |{"name":"product","type":"string"},
      |{"name":"buyer","type":"string"},
      |{"name":"price","type":"double"}]}""".stripMargin

  test("Avro-style record parses to StructType with non-nullable fields") {
    val s = SchemaDef.parse(salesJson)
    assert(s == StructType(Seq(
      StructField("product", StringType, nullable = false),
      StructField("buyer", StringType, nullable = false),
      StructField("price", DoubleType, nullable = false))))
  }

  test("union-with-null maps to nullable") {
    val s = SchemaDef.parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"x","type":["null","long"]},
        |{"name":"y","type":["string","null"]}]}""".stripMargin)
    assert(s("x") == StructField("x", LongType, nullable = true))
    assert(s("y") == StructField("y", StringType, nullable = true))
  }

  test("all widget primitive types + bytes + enum") {
    val s = SchemaDef.parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"b","type":"boolean"},{"name":"i","type":"int"},
        |{"name":"l","type":"long"},{"name":"f","type":"float"},
        |{"name":"d","type":"double"},{"name":"s","type":"string"},
        |{"name":"by","type":"bytes"},
        |{"name":"e","type":{"type":"enum","name":"E","symbols":["A","B"]}}]}""".stripMargin)
    assert(s("b").dataType == BooleanType); assert(s("i").dataType == IntegerType)
    assert(s("l").dataType == LongType); assert(s("f").dataType == FloatType)
    assert(s("d").dataType == DoubleType); assert(s("s").dataType == StringType)
    assert(s("by").dataType == BinaryType); assert(s("e").dataType == StringType)
  }

  test("complex types: array, map, nested record") {
    val s = SchemaDef.parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"arr","type":{"type":"array","items":"double"}},
        |{"name":"m","type":{"type":"map","values":"long"}},
        |{"name":"rec","type":{"type":"record","name":"inner","fields":[
        |  {"name":"z","type":"string"}]}}]}""".stripMargin)
    assert(s("arr").dataType == ArrayType(DoubleType, containsNull = false))
    assert(s("m").dataType == MapType(StringType, LongType, valueContainsNull = false))
    assert(s("rec").dataType == StructType(Seq(StructField("z", StringType, nullable = false))))
  }

  test("DDL fallback") {
    val s = SchemaDef.parse("a INT, b STRING")
    assert(s.fieldNames.toSeq == Seq("a", "b"))
  }

  test("garbage rejected") {
    intercept[GraftSchemaException] { SchemaDef.parse("{nope") }
  }

  test("validators: partition field list split/exists/non-nullable") {
    val s = SchemaDef.parse(salesJson)
    assert(Validators.partitionFields(s, "price,buyer") == Seq("price", "buyer"))
    intercept[GraftSchemaException] { Validators.partitionFields(s, "no_field") }
    intercept[GraftSchemaException] { Validators.partitionFields(s, "") }
    val nullable = StructType(s.fields.map(f =>
      if (f.name == "buyer") f.copy(nullable = true) else f))
    intercept[GraftSchemaException] { Validators.partitionFields(nullable, "price,buyer") }
  }

  test("output schema drops partition fields, rejects empty payload") {
    val s = SchemaDef.parse(salesJson)
    assert(Validators.outputSchema(s, Seq("price")).fieldNames.toSeq == Seq("product", "buyer"))
    intercept[GraftSchemaException] {
      Validators.outputSchema(s, Seq("product", "buyer", "price"))
    }
  }
}
