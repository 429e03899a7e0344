package graft.macros

/**
 * Runtime macro substitution for config strings (SURVEY.md §2.5 V5).
 *
 * Behavior contract (from the reference's parser,
 * `/root/reference/src/main/java/io/cdap/plugin/common/MacroParser.java:30-217`):
 *  - `${name}` is replaced by the property `name`;
 *    `${fnName(arguments)}` is replaced by the registered macro function
 *    applied to the argument list. Arguments are split on commas AFTER
 *    escape replacement (`MacroParser.java:139-143`: `replaceEscapedSyntax`
 *    runs before `Splitter.on(ARGUMENT_DELIMITER)`) — so `\,` also
 *    delimits; a literal comma cannot appear inside an argument. Empty
 *    arguments are preserved (`f()` receives one empty-string argument,
 *    `f(a,,b)` three). A body whose first unescaped `(` exists is ALWAYS
 *    a function call (`MacroParser.java:118-122`): the `)` must close the
 *    body or it is an error, never a property fallback; an escaped `\(`
 *    routes to property lookup.
 *  - `escapingEnabled = false` (`MacroParser.java:41-44`) disables ALL
 *    backslash processing: backslashes are literal and never suppress
 *    macro syntax.
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
      functions: Map[String, Seq[String] => String] = Map.empty,
      escapingEnabled: Boolean = true): String =
    expandAt(input, properties, functions, MaxDepth, escapingEnabled)

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
      fns: Map[String, Seq[String] => String],
      depth: Int,
      esc: Boolean): String = {
    if (depth < 0)
      throw new MacroException(s"Macro expansion exceeds maximum depth $MaxDepth")
    findRightmostMacro(s, esc) match {
      case None => if (esc) unescape(s) else s
      case Some((start, end, body)) =>
        // The RIGHTMOST macro's body cannot itself contain a macro open
        // (that `${` would be more-right), so the body goes straight to
        // the resolver, which owns its escape handling.
        val resolved = resolve(body, props, fns, esc)
        // The substituted value may itself contain macros → re-scan.
        val replaced = s.substring(0, start) + resolved + s.substring(end + 1)
        expandAt(replaced, props, fns, depth - 1, esc)
    }
  }

  /** Resolve one macro body (escapes still intact — escape decisions must
    * be made BEFORE replacement, or an escaped `\(` would masquerade as a
    * call). Mirrors `MacroParser.java:100-143`: trim; first unescaped `(`
    * ⇒ function call whose first unescaped `)` must close the body;
    * otherwise property lookup of the escape-replaced body. */
  private def resolve(
      rawBody: String,
      props: Map[String, String],
      fns: Map[String, Seq[String] => String],
      esc: Boolean): String = {
    val t = rawBody.trim
    def unesc(x: String): String = if (esc) unescape(x) else x
    val parenIdx = firstUnescaped(t, '(', esc)
    if (parenIdx >= 0) {
      val closeIdx = firstUnescaped(t, ')', esc)
      if (closeIdx < 0 || !t.endsWith(")"))
        throw new MacroException(
          s"Could not find enclosing ')' for macro arguments in '$t'")
      if (closeIdx != t.length - 1)
        throw new MacroException(
          s"Macro arguments in '$t' have extra invalid trailing ')'")
      val name = unesc(t.substring(0, parenIdx))
      // reference order of operations: escapes replaced FIRST, then the
      // comma split — `\,` therefore still delimits (MacroParser.java:139-143)
      val args: Seq[String] =
        unesc(t.substring(parenIdx + 1, t.length - 1)).split(",", -1).toSeq
      fns.getOrElse(name,
        throw new MacroException(s"Undefined macro function '$name'"))(args)
    } else {
      val key = unesc(t)
      props.getOrElse(key,
        throw new MacroException(s"Undefined macro property '$key'"))
    }
  }

  /** Index of the first occurrence of `token` not escaped by a preceding
    * odd backslash run; -1 if none. */
  private def firstUnescaped(s: String, token: Char, esc: Boolean): Int = {
    var i = s.indexOf(token)
    while (i >= 0 && esc && isEscaped(s, i)) i = s.indexOf(token, i + 1)
    i
  }

  /** Locate the rightmost unescaped `${`, return (startIdx, closingBraceIdx,
    * body between the braces). The body ends at the FIRST unescaped `}` —
    * matching the reference contract (`MacroParser.java:69-87`): because the
    * rightmost `${` is taken first, the body can never contain another
    * macro open, and a bare `{` inside it is literal (`${a{b}` → property
    * `a{b`), not a nesting level. */
  private def findRightmostMacro(s: String, esc: Boolean = true): Option[(Int, Int, String)] = {
    var i = s.length - 2
    while (i >= 0) {
      if (s.charAt(i) == '$' && s.charAt(i + 1) == '{' && !(esc && isEscaped(s, i))) {
        // find the first unescaped close brace
        var j = i + 2
        while (j < s.length && (s.charAt(j) != '}' || (esc && isEscaped(s, j)))) j += 1
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
