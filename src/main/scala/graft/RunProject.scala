package graft

import graft.config.Project
import graft.exec.{PipelineOrchestrator, TableStore, TestReporters}

/** CLI entrypoint: run a whole project directory for an environment — the
  * engine's counterpart of the reference CLI's generate-then-run cycle.
  *
  * {{{
  * sbt "runMain graft.RunProject <projectDir> <env> <warehouse> [pipelineFilter] [--full-refresh] [--sandbox] [--pipeline-config=<path>]"
  * }}}
  *
  * `--pipeline-config=<path>` (the reference CLI's `-pc`): per-pipeline
  * deployment settings — see [[graft.config.PipelineConfigs]] for the
  * honored subset (configuration confs, catalog/schema namespace,
  * continuous refusal) and the validated advisory remainder.
  *
  * `--sandbox` (the reference's dev-sandbox mode): the run is restricted to
  * the pipelines in the developer's `.lhp/profile.yaml` scope, and every
  * table name is rewritten through the team's `sandbox.table_pattern` at
  * the storage boundary (TableStore nameMap) — private tables in a shared
  * warehouse, no config edits.
  *
  * Loads lhp.yaml + templates/presets/blueprints/substitutions, resolves the
  * included flowgroups for `env`, binds the env's `{catalog}` token to a
  * [[org.apache.spark.sql.graftnative.WarehouseCatalog]] over `warehouse`,
  * and runs everything through the generation-parallel orchestrator with
  * JUnit XML test reports under `<warehouse>/_reports`. Exit code 1 if any
  * flowgroup failed.
  */
object RunProject {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: RunProject <projectDir> <env> <warehouse> [pipelineFilter]")
    val Array(projectDir, env, warehouse) = args.take(3)
    val flags = args.drop(3).filter(_.startsWith("--")).toSet
    val pipelineFilter = args.drop(3).find(!_.startsWith("--"))

    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val outcomes = execute(spark, projectDir, env, warehouse, pipelineFilter, flags)
    spark.stop()
    if (outcomes.exists(o => o.error.isDefined || o.skipped)) sys.exit(1)
  }

  /** The whole run, minus session lifecycle and exit codes — extracted so
    * the CLI WIRING (version gate, sandbox state roots, hook composition,
    * monitoring hand-off, provider terminal publish) is itself
    * integration-testable; two review rounds found wiring-only bugs here
    * that no component spec could catch. */
  def execute(spark: org.apache.spark.sql.SparkSession, projectDir: String,
      env: String, warehouse: String, pipelineFilter: Option[String] = None,
      flags: Set[String] = Set.empty): Seq[PipelineOrchestrator.Outcome] = {
    val fullRefresh: Set[String] = if (flags("--full-refresh")) Set("*") else Set.empty
    // required_lhp_version gate (reference version_enforcement.py) — BEFORE
    // the full loader, so an incompatible project reports the version
    // mismatch rather than whichever strict parse error it hits first
    graft.config.VersionCheck.enforceForProjectDir(projectDir)
    val project = Project.load(projectDir)
    project.registerCatalog(spark, env, warehouse)

    val fgs0 = project.flowgroups(env, lenient = true)
    val fgs1 = pipelineFilter.map(p => fgs0.filter(_.pipeline == p)).getOrElse(fgs0)

    // --sandbox: profile-scoped pipelines + table renames at the storage
    // boundary (the reference's dev-sandbox mode; see graft.config.Sandbox);
    // the monitoring pipeline is never sandboxable. Profile entries resolve
    // against the FULL discovered pipeline set, then intersect with any
    // [pipelineFilter] — resolving against the filtered subset would turn a
    // legitimate subset run into a fatal zero-match for every out-of-filter
    // profile entry.
    val sandboxRun = if (flags("--sandbox"))
      Some(project.sandboxRun(env, fgs0.map(_.pipeline).distinct,
        project.monitoringPipelineName))
    else None
    val fgs = sandboxRun match {
      case Some(run) =>
        println(s"[graft] sandbox: namespace '${run.namespace}', " +
          s"pattern '${run.tablePattern}', pipelines ${run.pipelines.mkString(", ")}")
        fgs1.filter(fg => run.pipelines.contains(fg.pipeline))
      case None => fgs1
    }
    println(s"[graft] project '${project.name}': ${fgs.size} flowgroup(s) for env '$env'")

    // --pipeline-config=<path> (reference `-pc` flag): per-pipeline
    // deployment settings. Runtime honoring: continuous refused loudly,
    // catalog/schema become the default namespace for unqualified table
    // names of that pipeline, `configuration` confs apply to the session
    // (unioned; cross-pipeline conflicts loud). See config.PipelineConfigs.
    val pipelineConfig = flags.collectFirst {
      case f if f.startsWith("--pipeline-config=") =>
        graft.config.PipelineConfigs.load(f.stripPrefix("--pipeline-config="),
          projectDir, project.monitoringPipelineName)
    }
    // the monitoring pipeline runs in this same session (when it runs at
    // all), so its pipeline-config entry joins the continuous refusal and
    // the conf union — its catalog/schema, though, are governed by the
    // lhp.yaml monitoring block, and an explicit entry saying otherwise
    // must not be silently absorbed
    val monPipelines: Seq[String] =
      if (flags("--sandbox") || !project.eventLog.exists(_.enabled)) Nil
      else project.monitoringPipelineName.toSeq
    val runPipelines = fgs.map(_.pipeline).distinct ++ monPipelines
    val fgsNs = pipelineConfig match {
      case Some(pc) =>
        graft.config.PipelineConfigs.refuseContinuous(pc, runPipelines)
        monPipelines.filter(mp => pc.pipelineConfigs.get(mp).exists(c =>
          c.contains("catalog") || c.contains("schema"))).foreach(mp =>
          graft.Log.warn(s"pipeline config: catalog/schema " +
            s"for monitoring pipeline '$mp' come from the lhp.yaml " +
            "monitoring block; the pipeline-config values are ignored"))
        // sibling set per PIPELINE: a recomputeView may name a table any
        // flowgroup of the same pipeline produces (they share the namespace)
        val tablesByPipeline: Map[String, Set[String]] = fgs.groupBy(_.pipeline)
          .map { case (pl, gs) => pl -> gs.flatMap(_.actions.collect {
            case a: graft.model.TableLoad => a.table
            case a: graft.model.StreamingTableWrite => a.table
            case a: graft.model.MaterializedViewWrite => a.table
          }).toSet }
        fgs.map(fg => graft.config.PipelineConfigs.applyNamespace(
          fg, pc.settingsFor(fg.pipeline),
          tablesByPipeline.getOrElse(fg.pipeline, Set.empty)))
      case None => fgs
    }
    val runConfs = pipelineConfig.map(
      _.unionConfiguration(runPipelines)).getOrElse(Map.empty)
    // remember priors so execute() leaves the session as it found it
    // (spec harnesses share one session across runs); the SETTING happens
    // inside the try — a failure on the Nth key must still restore keys 1..N-1
    val priorConfs = runConfs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    try {
    runConfs.foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw graft.config.YamlConfig.ConfigError(
            s"pipeline config: cannot apply configuration '$k' at runtime " +
              s"(${e.getMessage.linesIterator.next()}) — static confs must be " +
              "set on session construction")
        case e: IllegalArgumentException =>
          throw graft.config.YamlConfig.ConfigError(
            s"pipeline config: invalid value for configuration '$k': " +
              e.getMessage)
      }
    }

    val store = sandboxRun match {
      case Some(run) => new TableStore(spark, warehouse, run.nameMap)
      case None => new TableStore(spark, warehouse)
    }
    // Sandbox isolation covers RUNTIME STATE, not just table names: a
    // sandbox run sharing `_checkpoints` with real runs is data loss both
    // ways (the sandbox stream resumes past files the sandbox table never
    // saw, then commits offsets the next real run skips). Checkpoints,
    // JUnit reports, and default sink paths all namespace under
    // `_sandbox/<namespace>/`; the sandboxed TABLES stay in the shared
    // warehouse by design (that is the reference's sandbox contract).
    val stateRoot = sandboxRun match {
      case Some(run) => s"$warehouse/_sandbox/${run.namespace}"
      case None => warehouse
    }
    // event_log block present + enabled → the engine writes per-pipeline
    // event-log tables alongside the JUnit reports (exec.EventLog)
    val junit = new TestReporters.JUnitXmlReporter(s"$stateRoot/_reports")
    val eventLogOn = project.eventLog.exists(_.enabled)
    // test_reporting provider: accumulates every data-test result and
    // publishes ONCE at run terminal state (after the outcomes loop)
    val providerReporter = project.testReporting.map { tr =>
      val cfg = tr.configFile.map { f =>
        TestReporters.flatConfig(java.nio.file.Files.readString(
          java.nio.file.Paths.get(projectDir).resolve(f)), f)
      }.getOrElse(Map.empty[String, String])
      new TestReporters.ProviderReporter(
        TestReporters.loadProvider(tr.modulePath, tr.functionName), cfg)
    }
    val hookList: Seq[graft.exec.PipelineHooks] =
      Seq(junit) ++
        (if (eventLogOn) {
          val cfg = project.eventLog.get
          Seq(new graft.exec.EventLog.Writer(spark, store, cfg.qualifier,
            cfg.namePrefix, cfg.nameSuffix))
        } else Nil) ++
        providerReporter.toSeq
    val hooks: graft.exec.PipelineHooks =
      if (hookList.size == 1) hookList.head
      else new graft.exec.EventLog.Composite(hookList: _*)
    val orchestrator = new PipelineOrchestrator(spark, store, s"$stateRoot/_checkpoints",
      hooks = hooks,
      projectRoot = projectDir, opMetaColumns = project.opMetaColumns,
      fullRefresh = fullRefresh,
      tagsEnabled = project.tagsEnabled,
      removeUndeclaredTags = project.removeUndeclaredTags,
      sinkRoot = Some(s"$stateRoot/_sinks"))
    val outcomes = orchestrator.run(fgsNs)

    // monitoring pipeline (union + MVs) — after the data pipelines, never
    // under --sandbox (the reference excludes it from sandbox scope)
    for (mon <- project.monitoring if mon.enabled && eventLogOn && sandboxRun.isEmpty) {
      val qual = (mon.catalog.orElse(project.eventLog.flatMap(_.catalog)).toSeq ++
        mon.schema.orElse(project.eventLog.flatMap(_.schema)).toSeq)
      def q(t: String) = if (t.contains(".") || qual.isEmpty) t
        else (qual :+ t).mkString(".")
      // checkpoint_path (reference MonitoringConfig): explicit base wins;
      // relative paths live under the warehouse
      val monCp = mon.checkpointPath
        .map(p => if (java.nio.file.Paths.get(p).isAbsolute) p
          else s"$warehouse/$p")
        .getOrElse(s"$warehouse/_checkpoints/${project.monitoringPipelineName.get}")
      graft.streaming.Monitoring.runPipeline(spark, store,
        fgsNs.map(_.pipeline).distinct.map(p => p -> project.eventLogTable(p)).toMap,
        q(mon.streamingTable), mon.materializedViews,
        monCp,
        readFile = p => java.nio.file.Files.readString(
          java.nio.file.Paths.get(projectDir).resolve(p)),
        qualify = q,
        maxConcurrentStreams = mon.maxConcurrentStreams)
      println(s"[graft] monitoring: ${project.monitoringPipelineName.get} refreshed " +
        s"${mon.materializedViews.size} view(s) over ${q(mon.streamingTable)}")
    }

    outcomes.foreach { o =>
      val status =
        if (o.skipped) "SKIPPED (upstream failed)"
        else o.error.map(e => s"FAILED: ${e.getMessage}")
          .getOrElse(s"ok (${o.durationMs} ms)")
      println(s"[graft] ${o.flowgroup}: $status")
    }
    // terminal state: hand every accumulated test result to the provider
    providerReporter.foreach(_.publishAll())
    outcomes
    } finally {
      // leave the session as found — spec harnesses share one session
      priorConfs.foreach {
        case (k, Some(prior)) => spark.conf.set(k, prior)
        case (k, None) => scala.util.Try(spark.conf.unset(k)): Unit
      }
    }
  }
}
