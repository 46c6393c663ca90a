package graft.config

/** `required_lhp_version` enforcement — the engine-side counterpart of the
  * reference's core/loaders/version_enforcement.py: a project may pin the
  * config-surface version it was written against, and a run on an
  * incompatible engine fails LOUDLY up front instead of half-parsing.
  *
  * The version compared is the engine's COMPATIBILITY version: the
  * reference release whose YAML surface this engine mirrors (not the
  * engine's own build number — a project's `required_lhp_version:
  * ">=0.9,<1.0"` is a statement about the config dialect). The reference's
  * `LHP_IGNORE_VERSION` bypass is honored, plus a `GRAFT_IGNORE_VERSION`
  * spelling.
  *
  * Specifier grammar: the PEP 440 subset real projects use — comma-joined
  * clauses of `==`, `!=`, `>=`, `<=`, `>`, `<`, `~=`, with `.*` wildcards
  * on `==`/`!=`. Anything else is a loud ConfigError, never a silent
  * always-true.
  */
object VersionCheck {

  import YamlConfig.ConfigError

  /** The reference release whose YAML/config surface this engine mirrors
    * (reference pyproject.toml `version = "0.9.1"` at survey time). */
  val CompatVersion = "0.9.1"

  /** Enforce straight from a project directory's manifest, BEFORE the full
    * loader runs: a project written for a different config surface should
    * see the version-mismatch message, not whatever shape error the strict
    * loaders hit first. Reads only `name` + `required_lhp_version`. */
  def enforceForProjectDir(dir: String): Unit = {
    val manifest = java.nio.file.Paths.get(dir, "lhp.yaml")
    if (java.nio.file.Files.exists(manifest)) {
      val root = Option(new org.yaml.snakeyaml.Yaml()
        .load[Any](java.nio.file.Files.readString(manifest)))
      root match {
        case Some(m: java.util.Map[_, _]) =>
          import scala.jdk.CollectionConverters._
          val mm = m.asScala.map { case (k, v) => k.toString -> v }
          enforce(mm.get("required_lhp_version").map(_.toString),
            mm.get("name").map(_.toString).getOrElse(dir))
        case _ => ()
      }
    }
  }

  /** Enforce a project's requirement; no-op when unset or bypassed via
    * GRAFT_IGNORE_VERSION / LHP_IGNORE_VERSION in ("1", "true", "yes"). */
  def enforce(required: Option[String], projectName: String,
      actual: String = CompatVersion,
      env: String => Option[String] = sys.env.get): Unit =
    required.map(_.trim).filter(_.nonEmpty).foreach { spec =>
      val bypass = Seq("GRAFT_IGNORE_VERSION", "LHP_IGNORE_VERSION")
        .flatMap(env(_)).exists(v =>
          Set("1", "true", "yes").contains(v.toLowerCase))
      if (bypass)
        graft.Log.warn(s"version requirement bypass enabled " +
          s"(required: $spec, engine compat: $actual)")
      else if (!satisfies(spec, actual))
        throw ConfigError(graft.ErrorCodes.CFG_040(
          s"project '$projectName' requires config-surface version " +
            s"'$spec', but this engine is compatible with '$actual'. " +
            "Update required_lhp_version if the project config is known to " +
            "work here, or set GRAFT_IGNORE_VERSION=1 to bypass."))
    }

  /** True when `version` satisfies every comma-joined clause of `spec`. */
  private[config] def satisfies(spec: String, version: String): Boolean =
    spec.split(",").map(_.trim).filter(_.nonEmpty)
      .forall(clause(_, version))

  private def clause(c: String, v: String): Boolean = {
    val op = Seq("~=", "==", "!=", ">=", "<=", ">", "<").find(c.startsWith)
      .getOrElse(throw ConfigError(
        s"unsupported required_lhp_version clause '$c' — use ==, !=, >=, " +
          "<=, >, <, or ~= (PEP 440 subset)"))
    val target = c.drop(op.length).trim
    if (target.isEmpty) throw ConfigError(
      s"required_lhp_version clause '$c' has no version")
    op match {
      case "==" if target.endsWith(".*") => prefixMatch(v, target.dropRight(2))
      case "!=" if target.endsWith(".*") => !prefixMatch(v, target.dropRight(2))
      case "==" => cmp(v, target) == 0
      case "!=" => cmp(v, target) != 0
      case ">=" => cmp(v, target) >= 0
      case "<=" => cmp(v, target) <= 0
      case ">" => cmp(v, target) > 0
      case "<" => cmp(v, target) < 0
      case "~=" =>
        // compatible release: >= X.Y.Z and matching X.Y (PEP 440 §~=)
        val parts = target.split("\\.")
        if (parts.length < 2) throw ConfigError(
          s"'~= $target' needs at least two version components")
        cmp(v, target) >= 0 && prefixMatch(v, parts.dropRight(1).mkString("."))
    }
  }

  /** Numeric components; non-digit suffixes (rc1, dev0) truncate at the
    * first non-digit — release-channel ordering is out of scope, and the
    * truncation is documented rather than silently wrong. */
  private def nums(v: String): Seq[Int] =
    v.split("\\.").toSeq.map(_.takeWhile(_.isDigit)).map(s =>
      if (s.isEmpty) 0 else s.toInt)

  private def cmp(a: String, b: String): Int = {
    val (x, y) = (nums(a), nums(b))
    (0 until math.max(x.size, y.size)).iterator
      .map(i => x.lift(i).getOrElse(0).compare(y.lift(i).getOrElse(0)))
      .find(_ != 0).getOrElse(0)
  }

  private def prefixMatch(v: String, prefix: String): Boolean = {
    val (x, p) = (nums(v), nums(prefix))
    p.indices.forall(i => x.lift(i).getOrElse(0) == p(i))
  }
}
