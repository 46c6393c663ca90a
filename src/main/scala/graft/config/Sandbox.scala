package graft.config

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Dev-sandbox surface — the reference's `--sandbox` mode (reference:
  * src/lhp/core/sandbox/scope_resolver.py, models SandboxConfig /
  * SandboxProfile): a team policy in `lhp.yaml` (`sandbox:` block) plus a
  * personal, gitignored `.lhp/profile.yaml` (namespace + pipeline scope)
  * rewrite every table LEAF through `table_pattern`, so developers run real
  * pipelines against private table names in a shared environment.
  *
  * Where the reference rewrites generated TEXT, this engine applies the
  * rename at the storage boundary: [[SandboxRun.nameMap]] plugs into
  * [[graft.exec.TableStore]]'s nameMap seam — one choke point, no
  * re-parsing. Scope is explicit, never auto-detected: profile entries are
  * exact pipeline names or case-sensitive globs, zero-match entries are a
  * loud error, and the monitoring pipeline can never be sandboxed.
  */
object Sandbox {

  import YamlConfig.ConfigError

  /** Team policy (`lhp.yaml` `sandbox:`). v1 ships the TABLE strategy only:
    * `table_pattern` formats the table leaf with `{namespace}`/`{table}`;
    * `allowedEnvs` None = unrestricted. */
  final case class Config(
      strategy: String = "table",
      tablePattern: String = "{namespace}_{table}",
      allowedEnvs: Option[Seq[String]] = None)

  /** Personal profile (`.lhp/profile.yaml`): explicit opt-in only. */
  final case class Profile(namespace: String, pipelines: Seq[String])

  /** Merged team policy + personal profile, resolved against the project's
    * discovered pipelines. */
  final case class Run(
      namespace: String,
      tablePattern: String,
      strategy: String,
      pipelines: Seq[String]) {
    /** The table-name remap for [[graft.exec.TableStore]]: rewrites the
      * LEAF only — catalog/schema qualifiers pass through untouched
      * (reference _renames.py:124-132). */
    def nameMap: String => String = { table =>
      val parts = table.split('.')
      val leaf = tablePattern
        .replace("{namespace}", namespace)
        .replace("{table}", parts.last)
      (parts.init :+ leaf).mkString(".")
    }
  }

  private val NamespacePat = "^[a-z][a-z0-9_]{0,63}$".r
  private val GlobChars = Set('*', '?', '[')

  /** Structural `table_pattern` validation (reference CFG_063 + the runtime
    * shim's exactly-once rule): placeholders ⊆ {namespace, table} with
    * `{table}` exactly once and `{namespace}` present; literal text limited
    * to `[A-Za-z0-9_]`. */
  def validatePattern(pattern: String): String = {
    if (!pattern.contains("{namespace}")) throw ConfigError(
      s"sandbox table_pattern must reference {namespace}: '$pattern'")
    if (pattern.sliding("{table}".length).count(_ == "{table}") != 1) throw ConfigError(
      s"sandbox table_pattern must reference {table} exactly once: '$pattern'")
    val literals = pattern.replace("{namespace}", "").replace("{table}", "")
    if (!literals.matches("[A-Za-z0-9_]*")) throw ConfigError(
      s"sandbox table_pattern literals must be [A-Za-z0-9_] and placeholders " +
        s"only {namespace}/{table}: '$pattern'")
    pattern
  }

  /** Parse the `sandbox:` block of a loaded lhp.yaml map (None = absent —
    * team defaults apply at resolve time). An empty `allowed_envs: []`
    * would make --sandbox unusable everywhere — loud, like the reference's
    * CFG_062. */
  def parseConfig(manifest: Map[String, Any]): Option[Config] =
    manifest.get("sandbox").map {
      case m: java.util.Map[_, _] =>
        val sm = m.asScala.map { case (k, v) => k.toString -> v }.toMap
        val strategy = sm.get("strategy").map(_.toString).getOrElse("table")
        if (strategy != "table") throw ConfigError(
          s"sandbox strategy '$strategy' is not supported (v1: table)")
        val allowed = sm.get("allowed_envs") match {
          case Some(l: java.util.List[_]) =>
            val envs = l.asScala.toSeq.map(_.toString)
            if (envs.isEmpty) throw ConfigError(
              "sandbox allowed_envs is empty — no environment could ever " +
                "run --sandbox; remove the key to leave it unrestricted")
            Some(envs)
          // a scalar spelling (`allowed_envs: dev`) is unambiguous intent —
          // falling to None silently DISABLED the env gate, the exact
          // silent-config class the empty-list check above refuses
          case Some(v) if v != null => Some(Seq(v.toString))
          case _ => None
        }
        Config(strategy,
          validatePattern(sm.get("table_pattern").map(_.toString)
            .getOrElse("{namespace}_{table}")),
          allowed)
      case other => throw ConfigError(s"sandbox: must be a map, got: $other")
    }

  /** Load the personal profile — MANDATORY for a sandbox run (explicit
    * opt-in; reference loader contract). */
  def loadProfile(projectRoot: Path): Profile = {
    val p = projectRoot.resolve(".lhp/profile.yaml")
    if (!Files.exists(p)) throw ConfigError(
      s"--sandbox needs a personal profile at ${p} with 'namespace' and " +
        "'pipelines' — sandbox scope is explicit, never auto-detected")
    val m0 = new Yaml().load[Any](Files.readString(p)) match {
      case mm: java.util.Map[_, _] => mm.asScala.map { case (k, v) => k.toString -> v }.toMap
      case other => throw ConfigError(s"profile.yaml must be a map, got: $other")
    }
    // the reference nests the payload under a `sandbox:` key
    // (models/_sandbox.py: "nested under its ``sandbox:`` key"); the flat
    // spelling is accepted too
    val m = m0.get("sandbox") match {
      case Some(inner: java.util.Map[_, _]) =>
        inner.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap
      case _ => m0
    }
    val ns = m.get("namespace").map(_.toString).getOrElse(
      throw ConfigError("profile.yaml missing 'namespace'"))
    if (NamespacePat.findFirstIn(ns).isEmpty) throw ConfigError(
      s"profile namespace '$ns' must match [a-z][a-z0-9_]{0,63} (lowercase, " +
        "matching generated-table canonicalization)")
    val pipelines = m.get("pipelines") match {
      case Some(l: java.util.List[_]) if !l.isEmpty => l.asScala.toSeq.map(_.toString)
      case _ => throw ConfigError(
        "profile.yaml needs a non-empty 'pipelines' list (names or globs)")
    }
    Profile(ns, pipelines)
  }

  /** Merge policy + profile into a [[Run]] (reference resolve_sandbox_run):
    *  - env must be in `allowed_envs` when restricted;
    *  - an exact entry naming the monitoring pipeline is an error, and the
    *    monitoring pipeline is excluded from glob expansion;
    *  - entries matching ZERO pipelines are one error listing every
    *    offender plus what exists. */
  def resolveRun(config: Option[Config], profile: Profile, env: String,
      discoveredPipelines: Iterable[String],
      monitoringPipeline: Option[String] = None): Run = {
    val cfg = config.getOrElse(Config())
    cfg.allowedEnvs.foreach { allowed =>
      if (!allowed.contains(env)) throw ConfigError(
        s"environment '$env' is not sandbox-enabled: sandbox.allowed_envs " +
          s"permits only [${allowed.mkString(", ")}]")
    }
    monitoringPipeline.foreach { mon =>
      profile.pipelines.find(e => e == mon && !e.exists(GlobChars)).foreach { e =>
        throw ConfigError(
          s"profile pipelines entry '$e' names the monitoring pipeline — " +
            "the monitoring pipeline cannot be sandboxed")
      }
    }
    val candidates = discoveredPipelines.toSeq.distinct
      .filterNot(monitoringPipeline.contains).sorted
    val (matched, offenders) =
      profile.pipelines.foldLeft((Set.empty[String], Seq.empty[String])) {
        case ((hit, miss), entry) =>
          val hits = candidates.filter(globMatches(entry, _))
          if (hits.nonEmpty) (hit ++ hits, miss) else (hit, miss :+ entry)
      }
    if (offenders.nonEmpty) throw ConfigError(
      s"sandbox profile entries matched no pipelines: " +
        s"${offenders.map(o => s"'$o'").mkString(", ")}. Available: " +
        (if (candidates.isEmpty) "none — no pipelines discovered"
         else candidates.mkString(", ")) +
        ". Glob matching is case-sensitive.")
    Run(profile.namespace, cfg.tablePattern, cfg.strategy, matched.toSeq.sorted)
  }

  /** Case-sensitive fnmatch: `*` any run, `?` one char, `[...]` char class
    * (`[!...]` negates, per fnmatch — NOT regex `[^...]`); everything else
    * literal. */
  private[config] def globMatches(pattern: String, name: String): Boolean =
    if (!pattern.exists(GlobChars)) pattern == name
    else {
      val rx = new StringBuilder
      var i = 0
      while (i < pattern.length) {
        pattern(i) match {
          case '*' => rx ++= ".*"
          case '?' => rx += '.'
          case '[' =>
            val close = pattern.indexOf(']', i + 1)
            if (close < 0) { rx ++= java.util.regex.Pattern.quote("[") }
            else {
              // fnmatch spells negation `[!...]`; copied raw into regex it
              // would match literal '!' plus the chars it should EXCLUDE
              val body = pattern.substring(i + 1, close)
              val translated =
                if (body.startsWith("!")) "[^" + body.drop(1) + "]"
                else "[" + body + "]"
              rx ++= translated; i = close
            }
          case c => rx ++= java.util.regex.Pattern.quote(c.toString)
        }
        i += 1
      }
      name.matches(rx.toString)
    }
}
