package graft.macros

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class MacroParserSpec extends AnyFunSuite {

  /** Deterministic property loop over a ScalaCheck Gen (no scalatestplus). */
  private def forSamples[A](gen: Gen[A], n: Int = 100)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val props = Map(
    "basePath" -> "/data/out", "name" -> "sales",
    "a" -> "${b}", "b" -> "${c}", "c" -> "leaf",
    "loop" -> "${loop}",
    "inner" -> "name", "nested" -> "${${inner}}")

  test("simple substitution") {
    assert(MacroParser.expand("${basePath}/x", props) == "/data/out/x")
  }

  test("multiple macros, rightmost expanded first") {
    assert(MacroParser.expand("${basePath}/${name}", props) == "/data/out/sales")
  }

  test("recursive expansion of substituted values") {
    assert(MacroParser.expand("${a}", props) == "leaf")
  }

  test("nested macros resolve inner first") {
    assert(MacroParser.expand("${${inner}}", props) == "sales")
    assert(MacroParser.expand("${nested}", props) == "sales")
  }

  test("depth limit 10 on self-referential macro") {
    intercept[MacroException] { MacroParser.expand("${loop}", props) }
  }

  test("escaped macro is left literal") {
    assert(MacroParser.expand("\\${basePath}", props) == "${basePath}")
    assert(MacroParser.expand("cost: \\$5", props) == "cost: $5")
  }

  test("escaped backslash before macro still expands") {
    assert(MacroParser.expand("\\\\${name}", props) == "\\sales")
  }

  test("unterminated macro throws") {
    intercept[MacroException] { MacroParser.expand("${basePath", props) }
  }

  test("undefined property throws") {
    intercept[MacroException] { MacroParser.expand("${nope}", props) }
  }

  test("macro functions") {
    val fns = Map[String, String => String](
      "upper" -> (_.toUpperCase), "const" -> (_ => "K"))
    assert(MacroParser.expand("${upper(abc)} ${const()}", props, fns) == "ABC K")
  }

  test("function argument containing a macro expands before the call") {
    val fns = Map[String, String => String]("upper" -> (_.toUpperCase))
    assert(MacroParser.expand("${upper(${name})}", props, fns) == "SALES")
  }

  test("undefined function throws") {
    intercept[MacroException] {
      MacroParser.expand("${nofn(x)}", props, Map.empty)
    }
  }

  test("body ends at the FIRST unescaped close brace (reference contract)") {
    // a bare '{' inside the body is literal, not a nesting level:
    // "${a{b}" looks up property "a{b" (MacroParser.java:69-87)
    assert(MacroParser.expand("${a{b}", Map("a{b" -> "V")) == "V")
    // an escaped close brace belongs to the body
    assert(MacroParser.expand("${a\\}b}", Map("a}b" -> "W")) == "W")
    // trailing text after the first close brace is literal
    assert(MacroParser.expand("${name}}", props) == "sales}")
  }

  test("containsMacro: unescaped ${ only") {
    assert(MacroParser.containsMacro("${x}"))
    assert(MacroParser.containsMacro("a/${x}/b"))
    assert(!MacroParser.containsMacro("plain"))
    assert(!MacroParser.containsMacro("\\${x}"))
    assert(MacroParser.containsMacro("\\\\${x}")) // escaped backslash, live macro
    assert(!MacroParser.containsMacro("$ {x}"))
  }

  test("property: macro-free strings without escapes are unchanged") {
    val plain = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    forSamples(plain) { s => assert(MacroParser.expand(s, props) == s) }
  }

  test("property: any property value round-trips through ${key}") {
    val kv = for {
      k <- Gen.identifier.suchThat(_.nonEmpty)
      v <- Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    } yield (k, v)
    forSamples(kv) { case (k, v) =>
      assert(MacroParser.expand(s"$${$k}", Map(k -> v)) == v)
    }
  }
}
