package graft.config

/** Token / variable / secret substitution (reference:
  * src/lhp/core/processing/substitution.py:42-45,156-240 and
  * flowgroup_resolver.py:86-97).
  *
  * Three forms, resolved in this order:
  *   - `%{var}`   — flowgroup-local variables
  *   - `{token}` / `${token}` — environment token maps, recursive
  *   - `${secret:scope/key}`  — secret provider (env-var backed here)
  */
object Substitution {

  final case class UnresolvedToken(token: String, context: String)
    extends RuntimeException(s"unresolved token '$token' in $context")

  private val VarPat = "%\\{([A-Za-z0-9_.-]+)\\}".r
  private val SecretPat = "\\$\\{secret:([A-Za-z0-9_.-]+)/([A-Za-z0-9_.-]+)\\}".r
  private val TokenPat = "\\$?\\{([A-Za-z0-9_.-]+)\\}".r

  /** Secret provider: scope/key → value. Default reads `SCOPE_KEY` env vars
    * (the reference maps `${secret:scope/key}` to dbutils.secrets.get). */
  type SecretProvider = (String, String) => Option[String]
  val envSecrets: SecretProvider =
    (scope, key) => sys.env.get(s"${scope.toUpperCase}_${key.toUpperCase}")

  def substituteVars(s: String, vars: Map[String, String]): String =
    VarPat.replaceAllIn(s, m => Regex.quote(vars.getOrElse(m.group(1),
      throw UnresolvedToken(m.group(1), s))))

  /** Like [[substituteVars]] but leaves unknown `%{var}` untouched — used by
    * blueprint expansion, where flowgroup-local variables share the `%{}`
    * syntax and resolve in a later pass. */
  def substituteVarsPartial(s: String, vars: Map[String, String]): String =
    VarPat.replaceAllIn(s, m =>
      Regex.quote(vars.getOrElse(m.group(1), m.matched)))

  /** Recursive token expansion with cycle guard (tokens may reference other
    * tokens — reference substitution.py:156-174). */
  def substituteTokens(s: String, tokens: Map[String, String], maxDepth: Int = 10): String = {
    var cur = s
    var depth = 0
    while (TokenPat.findFirstIn(cur).isDefined && depth < maxDepth) {
      val next = TokenPat.replaceAllIn(cur, m =>
        Regex.quote(tokens.getOrElse(m.group(1), m.matched)))
      if (next == cur) return cur // remaining tokens unresolved; caller validates
      cur = next
      depth += 1
    }
    cur
  }

  def substituteSecrets(s: String, secrets: SecretProvider = envSecrets): String =
    SecretPat.replaceAllIn(s, m => Regex.quote(
      secrets(m.group(1), m.group(2))
        .getOrElse(throw UnresolvedToken(s"secret:${m.group(1)}/${m.group(2)}", s))))

  /** Full pipeline; throws [[UnresolvedToken]] on any leftover `{token}`
    * (the reference's unresolved-token validation,
    * flowgroup_resolver.py:164-188). */
  def apply(s: String, vars: Map[String, String], tokens: Map[String, String],
      secrets: SecretProvider = envSecrets, strict: Boolean = true): String = {
    val out = substituteSecrets(substituteTokens(substituteVars(s, vars), tokens), secrets)
    if (strict) TokenPat.findFirstMatchIn(out).foreach(m =>
      throw UnresolvedToken(m.group(1), s))
    out
  }

  private object Regex {
    def quote(s: String): String = java.util.regex.Matcher.quoteReplacement(s)
  }
}
