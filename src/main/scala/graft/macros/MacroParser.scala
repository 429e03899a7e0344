package graft.macros

/**
 * Runtime macro substitution for config strings (SURVEY.md §2.5 V5).
 *
 * Behavior contract (from the reference's parser,
 * `/root/reference/src/main/java/io/cdap/plugin/common/MacroParser.java:30-217`):
 *  - `${name}` is replaced by the property `name`;
 *    `${fnName(arguments)}` is replaced by the registered macro function
 *    applied to the raw argument string.
 *  - Expansion proceeds RIGHT-TO-LEFT: the rightmost `${` in the string is
 *    expanded first (`MacroParser.java:69-87`).
 *  - Substituted values are themselves re-expanded, to a maximum total depth
 *    of 10; exceeding it is an error (`MacroParser.java:32`).
 *  - A backslash escapes the following character: `\$` yields a literal `$`
 *    (suppressing macro interpretation), `\\` yields `\`, `\}` a literal `}`
 *    (`MacroParser.java:145-204`).
 *  - An unterminated `${` is an error; an unknown property/function is an
 *    error.
 *
 * This is a fresh recursive implementation in Scala — no Spark involvement.
 */
final class MacroException(msg: String) extends IllegalArgumentException(msg)

object MacroParser {
  val MaxDepth = 10

  def expand(
      input: String,
      properties: Map[String, String],
      functions: Map[String, String => String] = Map.empty): String =
    expandAt(input, properties, functions, MaxDepth)

  /** True when the string contains at least one unescaped `${` — i.e. it
    * still requires runtime expansion (property or function macro alike).
    * The configure-time/run-time validation split keys off this. */
  def containsMacro(s: String): Boolean = {
    var i = 0
    while (i < s.length - 1) {
      if (s.charAt(i) == '$' && s.charAt(i + 1) == '{' && !isEscaped(s, i))
        return true
      i += 1
    }
    false
  }

  private def expandAt(
      s: String,
      props: Map[String, String],
      fns: Map[String, String => String],
      depth: Int): String = {
    if (depth < 0)
      throw new MacroException(s"Macro expansion exceeds maximum depth $MaxDepth")
    findRightmostMacro(s) match {
      case None => unescape(s)
      case Some((start, end, body)) =>
        // Expand nested macros inside the body first (body itself may contain
        // escaped chars — the recursive call handles them).
        val resolved = resolve(expandAt(body, props, fns, depth - 1), props, fns)
        // The substituted value may itself contain macros → re-scan.
        val replaced = s.substring(0, start) + resolved + s.substring(end + 1)
        expandAt(replaced, props, fns, depth - 1)
    }
  }

  private def resolve(
      body: String,
      props: Map[String, String],
      fns: Map[String, String => String]): String = {
    val fnCall = "^\\s*([A-Za-z_][A-Za-z0-9_]*)\\((.*)\\)\\s*$".r
    body match {
      case fnCall(name, args) if fns.contains(name) => fns(name)(args)
      case fnCall(name, _) if !props.contains(body.trim) =>
        throw new MacroException(s"Undefined macro function '$name'")
      case _ =>
        props.getOrElse(body.trim,
          throw new MacroException(s"Undefined macro property '${body.trim}'"))
    }
  }

  /** Locate the rightmost unescaped `${`, return (startIdx, closingBraceIdx,
    * body between the braces). The body ends at the FIRST unescaped `}` —
    * matching the reference contract (`MacroParser.java:69-87`): because the
    * rightmost `${` is taken first, the body can never contain another
    * macro open, and a bare `{` inside it is literal (`${a{b}` → property
    * `a{b`), not a nesting level. */
  private def findRightmostMacro(s: String): Option[(Int, Int, String)] = {
    var i = s.length - 2
    while (i >= 0) {
      if (s.charAt(i) == '$' && s.charAt(i + 1) == '{' && !isEscaped(s, i)) {
        // find the first unescaped close brace
        var j = i + 2
        while (j < s.length && (s.charAt(j) != '}' || isEscaped(s, j))) j += 1
        if (j >= s.length)
          throw new MacroException(s"Unterminated macro in: $s")
        return Some((i, j, s.substring(i + 2, j)))
      }
      i -= 1
    }
    None
  }

  /** True if the char at idx is preceded by an odd number of backslashes. */
  private def isEscaped(s: String, idx: Int): Boolean = {
    var n = 0
    var i = idx - 1
    while (i >= 0 && s.charAt(i) == '\\') { n += 1; i -= 1 }
    n % 2 == 1
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
