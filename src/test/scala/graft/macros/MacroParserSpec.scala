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
    val fns = Map[String, Seq[String] => String](
      "upper" -> (a => a.head.toUpperCase), "const" -> (_ => "K"))
    assert(MacroParser.expand("${upper(abc)} ${const()}", props, fns) == "ABC K")
  }

  test("function argument containing a macro expands before the call") {
    val fns = Map[String, Seq[String] => String]("upper" -> (a => a.head.toUpperCase))
    assert(MacroParser.expand("${upper(${name})}", props, fns) == "SALES")
  }

  test("undefined function throws") {
    intercept[MacroException] {
      MacroParser.expand("${nofn(x)}", props, Map.empty)
    }
  }

  test("multi-arg functions: comma split, empty args preserved, escape-then-split") {
    val fns = Map[String, Seq[String] => String](
      "join" -> (_.mkString("|")),
      "nargs" -> (a => a.length.toString))
    // args split on commas (MacroParser.java:31 ARGUMENT_DELIMITER)
    assert(MacroParser.expand("${join(a,b,c)}", props, fns) == "a|b|c")
    // empty args are preserved, not dropped: f() gets ONE empty arg,
    // f(a,,b) three (Guava Splitter semantics)
    assert(MacroParser.expand("${nargs()}", props, fns) == "1")
    assert(MacroParser.expand("${nargs(a,,b)}", props, fns) == "3")
    assert(MacroParser.expand("${join(a,,b,)}", props, fns) == "a||b|")
    // reference order of operations: escapes are replaced BEFORE the
    // split (MacroParser.java:139-143), so an escaped comma still
    // delimits — a literal comma cannot appear inside an argument
    assert(MacroParser.expand("${join(a\\,b)}", props, fns) == "a|b")
    // whitespace in args is NOT trimmed (the split is the only tokenizer)
    assert(MacroParser.expand("${join(a, b)}", props, fns) == "a| b")
  }

  test("function-call malformations throw; escaped paren routes to property") {
    val fns = Map[String, Seq[String] => String]("f" -> (_.mkString))
    // unescaped '(' makes the body a call — a missing ')' is an error,
    // never a property fallback (MacroParser.java:118-128)
    intercept[MacroException] { MacroParser.expand("${f(x}", props, fns) }
    // the first unescaped ')' must close the body
    intercept[MacroException] { MacroParser.expand("${f(x)y)}", props, fns) }
    // an ESCAPED paren is literal → property lookup of the unescaped name
    assert(MacroParser.expand("${we\\(ird}", Map("we(ird" -> "V"), fns) == "V")
  }

  test("escapingEnabled=false: backslashes are literal, no escape processing") {
    // reference MacroParser.java:41-44 constructor mode
    val p = Map("x" -> "V", "a\\" -> "W")
    assert(MacroParser.expand("\\${x}", p, Map.empty, escapingEnabled = false) == "\\V")
    assert(MacroParser.expand("${a\\}", p, Map.empty, escapingEnabled = false) == "W")
    val fns = Map[String, Seq[String] => String]("join" -> (_.mkString("|")))
    // backslash before a comma is literal and rides into the arg
    assert(MacroParser.expand("${join(a\\,b)}", p, fns, escapingEnabled = false)
      == "a\\|b")
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
