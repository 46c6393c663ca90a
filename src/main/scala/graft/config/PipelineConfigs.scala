package graft.config

import scala.jdk.CollectionConverters._

import graft.model.{FlowGroup, MaterializedViewWrite, StreamingTableWrite, TableLoad}

/** `pipeline_config.yaml` — per-pipeline deployment settings (reference
  * core/loaders/pipeline_config_loader.py, schemas/pipeline_config.schema
  * .json): a multi-document YAML where one document may carry
  * `project_defaults` and every other names one-or-more `pipeline`s.
  *
  * The reference consumes this file at bundle-codegen time (DLT pipeline
  * JSON). The interpreter honors the RUNTIME-meaningful subset and keeps
  * the rest as validated advisory data:
  *   - `configuration` (string→string Spark confs) is applied to the run's
  *     session — unioned across the pipelines in the run, with CONFLICTING
  *     values for one key a loud error (one local session cannot hold two
  *     values at once; the reference generates one DLT pipeline each).
  *   - `catalog` / `schema` become the default namespace for UNQUALIFIED
  *     engine-table names (loads and write targets) of that pipeline —
  *     DLT's publish-target semantics, where unqualified reads also
  *     resolve against the reader pipeline's own target.
  *   - `continuous: true` is refused loudly: this engine runs triggered
  *     (AvailableNow) microbatches; accepting it would silently run a
  *     "continuous" pipeline once.
  *   - `serverless` / `edition` / `channel` / `clusters` / `photon` /
  *     `permissions` / `notifications` / `run_as` / `environment` /
  *     `packaging` / `tags` / `event_log` are Databricks-infra fields with
  *     no local counterpart: validated exactly where the reference
  *     validates (allowlists, permission shape — its value is catching
  *     errors at `validate` time, not deploy time) and retained in
  *     [[Settings.raw]] for inspection.
  *
  * Merge order per pipeline (reference `get_pipeline_config`):
  * hard defaults → `project_defaults` → pipeline document, nested maps
  * merged recursively, lists REPLACED. Unknown keys are allowed (the
  * reference's forward-compatibility posture — explicitly NOT the strict
  * unknown-key contract of flowgroup YAML, which the reference enforces
  * via pydantic there but not here).
  */
object PipelineConfigs {
  import YamlConfig.ConfigError

  /** `pipeline: __eventlog_monitoring` names the monitoring pipeline
    * without hard-coding its configured name (reference MONITORING_ALIAS). */
  val MonitoringAlias = "__eventlog_monitoring"

  private val AllowedEditions = Set("CORE", "PRO", "ADVANCED")
  private val AllowedChannels = Set("CURRENT", "PREVIEW")
  private val AllowedPackaging = Set("wheel", "source")

  /** Reference DEFAULT_PIPELINE_CONFIG. */
  val Defaults: Map[String, Any] = Map(
    "serverless" -> true, "edition" -> "ADVANCED",
    "channel" -> "CURRENT", "continuous" -> false)

  /** One pipeline's fully-merged settings. `raw` keeps every field
    * (including advisory infra fields) for inspection/ShowProject. */
  final case class Settings(raw: Map[String, Any]) {
    def continuous: Boolean = raw.get("continuous").exists {
      case b: java.lang.Boolean => b.booleanValue
      case s => s.toString.toBoolean
    }
    def catalog: Option[String] = strOpt("catalog")
    def schema: Option[String] = strOpt("schema")
    /** Spark confs for the run — validated string→string at load. The
      * merged value is a Scala map when both layers set keys, a raw
      * snakeyaml map when only one did. */
    def configuration: Map[String, String] = raw.get("configuration") match {
      case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v.toString }
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.map { case (k, v) => k.toString -> v.toString }.toMap
      case _ => Map.empty
    }
    /** The default namespace prefix, if any: `catalog[.schema]`. */
    def namespace: Seq[String] = catalog.toSeq ++ schema.toSeq
    private def strOpt(k: String): Option[String] =
      raw.get(k).flatMap(Option(_)).map(_.toString)
  }

  final case class Loaded(
      projectDefaults: Map[String, Any],
      pipelineConfigs: Map[String, Map[String, Any]]) {
    /** Defaults → project_defaults → pipeline-specific (deep merge). */
    def settingsFor(pipeline: String): Settings =
      Settings(deepMerge(deepMerge(Defaults, projectDefaults),
        pipelineConfigs.getOrElse(pipeline, Map.empty)))

    /** Union the `configuration` confs of the given pipelines; a key bound
      * to two different values by two pipelines in the SAME run is a loud
      * error (session confs are process-global here; the reference gives
      * every pipeline its own DLT runtime). */
    def unionConfiguration(pipelines: Seq[String]): Map[String, String] = {
      val perPipe = pipelines.map(p => p -> settingsFor(p).configuration)
      val conflicts = perPipe.flatMap { case (p, m) => m.map { case (k, v) => (k, v, p) } }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1)
      if (conflicts.nonEmpty) {
        val detail = conflicts.toSeq.sortBy(_._1).map { case (k, vs) =>
          s"'$k': " + vs.map(t => s"${t._3}=${t._2}").distinct.mkString(", ")
        }.mkString("; ")
        throw ConfigError(graft.ErrorCodes.CFG_051("pipeline config: conflicting `configuration` " +
          s"values across pipelines in one run — $detail. One session holds " +
          "one value per conf key; align the pipelines or run them separately"))
      }
      perPipe.flatMap(_._2).toMap
    }
  }

  /** CLI-path form: relative paths resolve against the project root
    * (reference loader contract) — the ONE place that rule lives, shared
    * by RunProject and ValidateProject. */
  def load(pathStr: String, projectDir: String,
      monitoringPipeline: Option[String]): Loaded = {
    val raw = java.nio.file.Paths.get(pathStr)
    load(if (raw.isAbsolute) raw
      else java.nio.file.Paths.get(projectDir).resolve(raw), monitoringPipeline)
  }

  /** Load + validate. `monitoringPipeline` resolves the
    * `__eventlog_monitoring` alias (None = monitoring not configured:
    * alias entries warn and drop, reference parity). */
  def load(path: java.nio.file.Path,
      monitoringPipeline: Option[String]): Loaded = {
    if (!java.nio.file.Files.exists(path)) throw ConfigError(
      graft.ErrorCodes.IO_001(s"pipeline config file not found: $path"))
    val docs = new org.yaml.snakeyaml.Yaml()
      .loadAll(java.nio.file.Files.readString(path)).asScala.toSeq
    var projectDefaults = Map.empty[String, Any]
    var seenDefaults = false
    val configs = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Any]]
    val firstSeen = scala.collection.mutable.Map.empty[String, Int]
    docs.zipWithIndex.foreach {
      case (null, _) => ()
      case (doc: java.util.Map[_, _], idx) =>
        val m = doc.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap
        // the reference's if/elif here silently DROPS the pipeline half of a
        // both-keys document and last-wins a repeated project_defaults —
        // both are data loss; this engine's posture is loud (same deviation
        // as the delta-load unknown-option guard)
        if (m.contains("project_defaults") && m.contains("pipeline"))
          throw ConfigError(s"pipeline config document ${idx + 1}: carries " +
            "BOTH 'project_defaults' and 'pipeline' — split them into " +
            "separate YAML documents (--- delimited)")
        if (m.contains("project_defaults")) {
          if (seenDefaults) throw ConfigError(
            s"pipeline config document ${idx + 1}: a second " +
              "'project_defaults' document would silently replace the " +
              "first — merge them into one")
          seenDefaults = true
          projectDefaults = asMap(m("project_defaults"), "project_defaults")
          validateConfig(projectDefaults, s"project_defaults (document ${idx + 1})")
        } else if (m.contains("pipeline")) {
          val names = m("pipeline") match {
            case s: String => Seq(s)
            case l: java.util.List[_] => l.asScala.toSeq.map(_.toString)
            case null => throw ConfigError(s"pipeline config document " +
              s"${idx + 1}: 'pipeline' has no value — name one pipeline " +
              "(string) or several (list)")
            case other =>
              graft.Log.warn(s"pipeline config document " +
                s"${idx + 1}: invalid pipeline type ${other.getClass.getSimpleName}" +
                " (expected string or list); skipping")
              Nil
          }
          if (m("pipeline").isInstanceOf[java.util.List[_]] && names.isEmpty)
            throw ConfigError(s"pipeline config document ${idx + 1}: empty " +
              "pipeline list — at least one pipeline name is required")
          if (names.contains(MonitoringAlias) && names.size > 1)
            throw ConfigError(s"pipeline config document ${idx + 1}: " +
              s"'$MonitoringAlias' must be a standalone pipeline entry, " +
              "not listed with other pipelines")
          val cfg = m - "pipeline"
          if (names.nonEmpty) validateConfig(cfg, s"document ${idx + 1}")
          names.foreach { n =>
            firstSeen.get(n).foreach { first =>
              throw ConfigError(s"pipeline config: pipeline '$n' in document " +
                s"${idx + 1} was already defined in document $first — each " +
                "pipeline must be unique across all documents")
            }
            firstSeen(n) = idx + 1
            configs(n) = cfg
          }
        } else graft.Log.warn(s"pipeline config document " +
          s"${idx + 1} has neither 'project_defaults' nor 'pipeline'; ignoring")
      case (other, idx) => graft.Log.warn(s"pipeline config " +
        s"document ${idx + 1} is not a mapping; ignoring: $other")
    }
    // __eventlog_monitoring → the configured monitoring pipeline name
    configs.remove(MonitoringAlias).foreach { aliasCfg =>
      monitoringPipeline match {
        case None => graft.Log.warn(s"pipeline config: " +
          s"'$MonitoringAlias' present but monitoring is not enabled in " +
          "lhp.yaml; ignoring the entry")
        case Some(actual) if configs.contains(actual) => throw ConfigError(
          s"pipeline config: both '$MonitoringAlias' and the monitoring " +
            s"pipeline's actual name '$actual' are defined — use one")
        case Some(actual) => configs(actual) = aliasCfg
      }
    }
    Loaded(projectDefaults, configs.toMap)
  }

  /** The reference's `_validate_config`: allowlists + shape checks; unknown
    * keys pass (forward compatibility). */
  private def validateConfig(cfg: Map[String, Any], where: String): Unit = {
    def bad(msg: String) = throw ConfigError(graft.ErrorCodes.CFG_052(s"pipeline config $where: $msg"))
    // a key written with no value ('edition:') parses as YAML null — catch
    // it by name BEFORE any .toString/.getClass would NPE; a null here is
    // always a mistake, never a meaningful setting
    Seq("edition", "channel", "packaging", "environment", "continuous",
        "configuration", "permissions").foreach { k =>
      if (cfg.contains(k) && cfg(k) == null) bad(
        s"'$k' has no value — set one or drop the key")
    }
    cfg.get("edition").foreach { e =>
      if (!AllowedEditions(e.toString)) bad(
        s"invalid edition '$e' — allowed: ${AllowedEditions.toSeq.sorted.mkString(", ")}")
    }
    cfg.get("channel").foreach { c =>
      if (!AllowedChannels(c.toString)) bad(
        s"invalid channel '$c' — allowed: ${AllowedChannels.toSeq.sorted.mkString(", ")}")
    }
    cfg.get("packaging").foreach { p =>
      if (!AllowedPackaging(p.toString)) bad(
        s"invalid packaging '$p' — allowed: ${AllowedPackaging.toSeq.sorted.mkString(", ")}")
    }
    cfg.get("environment").foreach {
      case _: java.util.Map[_, _] => ()
      case other => bad("'environment' must be a mapping, got " +
        other.getClass.getSimpleName)
    }
    cfg.get("continuous").foreach {
      case _: java.lang.Boolean => ()
      case other => bad(s"'continuous' must be a boolean, got '$other'")
    }
    cfg.get("configuration").foreach {
      case m: java.util.Map[_, _] =>
        m.asScala.foreach { case (k, v) =>
          // Databricks requires conf VALUES as strings; an unquoted YAML
          // true/5 parses as Boolean/Integer (and 'k:' as null) and the
          // reference rejects them
          if (v == null || !v.isInstanceOf[String]) bad(
            s"configuration value for '$k' must be a quoted string, got " +
              (if (v == null) "no value" else s"${v.getClass.getSimpleName} ($v)"))
        }
      case other => bad("'configuration' must be a mapping, got " +
        other.getClass.getSimpleName)
    }
    cfg.get("permissions").foreach {
      case l: java.util.List[_] =>
        val identityKeys = Set("user_name", "group_name", "service_principal_name")
        l.asScala.zipWithIndex.foreach {
          case (e: java.util.Map[_, _], i) =>
            val entry = e.asScala.map { case (k, v) => k.toString -> v }.toMap
            if (!entry.get("level").exists(_.isInstanceOf[String])) bad(
              s"permissions entry $i must have a string 'level'")
            val present = identityKeys.filter(entry.contains)
            if (present.size != 1) bad(s"permissions entry $i must have " +
              s"exactly one of ${identityKeys.toSeq.sorted.mkString(", ")}; " +
              s"found ${present.toSeq.sorted.mkString("[", ", ", "]")}")
          case (null, i) => bad(s"permissions entry $i is empty")
          case (other, i) => bad(s"permissions entry $i must be a mapping, " +
            s"got ${other.getClass.getSimpleName}")
        }
      case other => bad("'permissions' must be a list, got " +
        other.getClass.getSimpleName)
    }
  }

  /** DLT publish-target semantics: the pipeline's `catalog`/`schema`
    * qualify every UNQUALIFIED engine-table name in its flowgroups — write
    * targets AND table loads (an unqualified read resolves against the
    * reader pipeline's own target, exactly as in DLT). Already-qualified
    * names and non-table actions (views, sinks, sql text) pass through. */
  def applyNamespace(fg: FlowGroup, s: Settings,
      siblingTables: Set[String] = Set.empty): FlowGroup = {
    val ns = s.namespace
    if (ns.isEmpty) fg
    else {
      def q(t: String) = if (t.contains(".")) t else (ns :+ t).mkString(".")
      // table names this PIPELINE produces/loads, pre-qualification: a
      // recomputeView naming one of them must follow it into the
      // namespace (the base table's own write just got qualified, so the
      // unqualified reference would fail with a spurious "names neither a
      // view nor a table"); names NOT in this set are session views and
      // stay as-is (views are not namespaced). `siblingTables` carries the
      // OTHER flowgroups' tables — an MV in flowgroup B recomputing over a
      // table flowgroup A writes is the normal medallion shape, and a
      // per-flowgroup-only set left its view reference unqualified
      val ownTables = fg.actions.collect {
        case a: TableLoad => a.table
        case a: StreamingTableWrite => a.table
        case a: MaterializedViewWrite => a.table
      }.toSet ++ siblingTables
      fg.copy(actions = fg.actions.map {
        case a: TableLoad => a.copy(table = q(a.table))
        case a: StreamingTableWrite => a.copy(table = q(a.table))
        case a: MaterializedViewWrite =>
          a.copy(table = q(a.table),
            recomputeView = a.recomputeView.map(v =>
              if (ownTables.contains(v)) q(v) else v))
        // the DLQ is an engine table too — an unqualified dlq name left in
        // the flat namespace would collide across namespaced pipelines
        case a: graft.model.DataQualityTransform if a.quarantineTable.isDefined =>
          a.copy(quarantineTable = a.quarantineTable.map(q))
        // a delta sink addressed by tableName writes a STORE-managed table:
        // unqualified it would land at the warehouse root, colliding
        // across namespaced pipelines exactly like the DLQ case above
        case a: graft.model.SinkWrite
            if a.sinkType == "delta" && a.options.contains("tableName") =>
          a.copy(options = a.options.updated("tableName", q(a.options("tableName"))))
        case other => other
      })
    }
  }

  /** Refuse `continuous: true` for any pipeline in the run, loudly and all
    * at once — this engine executes triggered (AvailableNow) microbatches;
    * silently running a continuous pipeline once would be the worst kind
    * of accepted-and-ignored. */
  def refuseContinuous(loaded: Loaded, pipelines: Seq[String]): Unit = {
    val cont = pipelines.filter(p => loaded.settingsFor(p).continuous)
    if (cont.nonEmpty) throw ConfigError(graft.ErrorCodes.CFG_050(
      s"pipeline config: continuous mode is not runnable on this engine " +
        s"(triggered AvailableNow microbatches only) — pipelines " +
        s"${cont.mkString(", ")}; set continuous: false or drop the key"))
  }

  private def deepMerge(base: Map[String, Any], over: Map[String, Any]): Map[String, Any] =
    over.foldLeft(base) { case (acc, (k, v)) =>
      (acc.get(k), v) match {
        case (Some(b: java.util.Map[_, _]), o: java.util.Map[_, _]) =>
          acc.updated(k, deepMerge(
            b.asScala.map { case (bk, bv) => bk.toString -> (bv: Any) }.toMap,
            o.asScala.map { case (ok, ov) => ok.toString -> (ov: Any) }.toMap))
        case (Some(b: Map[_, _]), o: java.util.Map[_, _]) =>
          acc.updated(k, deepMerge(b.asInstanceOf[Map[String, Any]],
            o.asScala.map { case (ok, ov) => ok.toString -> (ov: Any) }.toMap))
        case _ => acc.updated(k, v) // scalars and LISTS replace (reference)
      }
    }

  private def asMap(o: Any, what: String): Map[String, Any] = o match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap
    case null => Map.empty
    case other => throw ConfigError(
      s"pipeline config: '$what' must be a mapping, got $other")
  }
}
