package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The drift classification matrix (pure, no Spark session) plus the
  * merged-schema contract. End-to-end sink wiring lives in
  * `graft.sink.EvolutionSinkSpec`. */
class SchemaEvolutionSpec extends AnyFunSuite {
  import SchemaEvolution._

  private val pf = Seq("grp")
  private def st(fields: StructField*) = StructType(fields.toSeq)
  private val base = st(
    StructField("grp", StringType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("n", IntegerType, nullable = true),
    StructField("note", StringType, nullable = true))

  private def deltaFor(incoming: StructType, field: String): Delta =
    classify(base, incoming, pf).find(_.field == field).get

  test("identical schema is all-unchanged and passes Strict") {
    assert(classify(base, base, pf).forall(_.isInstanceOf[Unchanged]))
    assert(validate(base, base, pf, Strict) == base)
  }

  test("column order is irrelevant — comparison is by name") {
    val reordered = st(base.fields.reverse.toIndexedSeq: _*)
    assert(classify(base, reordered, pf).forall(_.isInstanceOf[Unchanged]))
  }

  test("widen matrix: every safe delta classifies Widened") {
    // new nullable column
    val added = st(base.fields.toIndexedSeq :+
      StructField("extra", DoubleType, nullable = true): _*)
    assert(deltaFor(added, "extra").isInstanceOf[Widened])
    // int → long promotion
    val promoted = st(base.fields.map(f =>
      if (f.name == "n") f.copy(dataType = LongType) else f).toIndexedSeq: _*)
    assert(deltaFor(promoted, "n").isInstanceOf[Widened])
    // nullability loosened
    val loosened = st(base.fields.map(f =>
      if (f.name == "id") f.copy(nullable = true) else f).toIndexedSeq: _*)
    assert(deltaFor(loosened, "id").isInstanceOf[Widened])
    // nullable column omitted by the batch
    val omitted = st(base.fields.filterNot(_.name == "note").toIndexedSeq: _*)
    assert(deltaFor(omitted, "note").isInstanceOf[Widened])
    // decimal precision growth at equal scale
    val d1 = st(StructField("grp", StringType, false),
      StructField("amt", DecimalType(10, 2), true))
    val d2 = st(StructField("grp", StringType, false),
      StructField("amt", DecimalType(14, 2), true))
    assert(classify(d1, d2, pf).collect { case w: Widened => w.field }
      == Seq("amt"))
  }

  test("break matrix: every unsafe delta classifies Broken") {
    def broken(incoming: StructType, field: String) =
      assert(deltaFor(incoming, field).isInstanceOf[Broken], field)
    // new NON-nullable column
    broken(st(base.fields.toIndexedSeq :+
      StructField("req", LongType, nullable = false): _*), "req")
    // narrowing long → int
    broken(st(base.fields.map(f =>
      if (f.name == "id") f.copy(dataType = IntegerType) else f)
      .toIndexedSeq: _*), "id")
    // cross-family change
    broken(st(base.fields.map(f =>
      if (f.name == "n") f.copy(dataType = StringType) else f)
      .toIndexedSeq: _*), "n")
    // partition field type change
    broken(st(base.fields.map(f =>
      if (f.name == "grp") f.copy(dataType = IntegerType) else f)
      .toIndexedSeq: _*), "grp")
    // partition field missing
    broken(st(base.fields.filterNot(_.name == "grp").toIndexedSeq: _*), "grp")
    // NON-nullable column missing
    broken(st(base.fields.filterNot(_.name == "id").toIndexedSeq: _*), "id")
    // decimal scale change is NOT widening
    val d1 = st(StructField("grp", StringType, false),
      StructField("amt", DecimalType(10, 2), true))
    val d3 = st(StructField("grp", StringType, false),
      StructField("amt", DecimalType(12, 4), true))
    assert(classify(d1, d3, pf).exists(d =>
      d.field == "amt" && d.isInstanceOf[Broken]))
  }

  test("Strict rejects widening; Widen admits it; breakage always throws") {
    val added = st(base.fields.toIndexedSeq :+
      StructField("extra", DoubleType, nullable = true): _*)
    val eStrict = intercept[GraftSchemaException](
      validate(base, added, pf, Strict))
    assert(eStrict.getMessage.contains("extra"))
    assert(validate(base, added, pf, Widen).fieldNames.contains("extra"))
    val bad = st(base.fields.toIndexedSeq :+
      StructField("req", LongType, nullable = false): _*)
    val eWiden = intercept[GraftSchemaException](
      validate(base, bad, pf, Widen))
    assert(eWiden.getMessage.contains("req"))
  }

  test("breakage message lists EVERY broken field, not just the first") {
    val doubly = st(
      StructField("grp", StringType, false),
      StructField("id", IntegerType, false), // narrowed
      StructField("n", IntegerType, true),
      StructField("note", StringType, true),
      StructField("req", LongType, false))   // non-nullable addition
    val e = intercept[GraftSchemaException](
      validate(base, doubly, pf, Widen))
    assert(e.getMessage.contains("id") && e.getMessage.contains("req"))
  }

  test("merged schema: promoted types, union nullability, appended columns") {
    val incoming = st(
      StructField("grp", StringType, false),
      StructField("id", LongType, true),          // loosened
      StructField("n", LongType, true),           // promoted
      StructField("extra", DoubleType, true))     // new; note omitted
    val m = validate(base, incoming, pf, Widen)
    assert(m.fieldNames.toSeq ==
      Seq("grp", "id", "n", "note", "extra"), "stored order then additions")
    assert(m("n").dataType == LongType)
    assert(m("id").nullable)
    assert(m("note").nullable)
  }
}
