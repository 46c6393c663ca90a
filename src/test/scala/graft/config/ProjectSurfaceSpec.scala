package graft.config

import java.nio.file.Files


import graft.exec.TestReporters

/** Fixture provider for the test_reporting JVM contract (must be top-level
  * with a zero-arg constructor for Class.forName). */
class FixtureResultProvider extends TestReporters.Provider {
  def publish(results: Seq[TestReporters.TestResult],
      config: Map[String, String]): Unit =
    FixtureResultProvider.captured = Some((results, config))
}
object FixtureResultProvider {
  @volatile var captured: Option[(Seq[TestReporters.TestResult], Map[String, String])] = None
}

/** Fixture with a custom method name (the reflective function_name path). */
class FixtureFnProvider {
  def report(results: Seq[TestReporters.TestResult],
      config: Map[String, String]): Unit =
    FixtureFnProvider.count = results.size
}
object FixtureFnProvider { @volatile var count: Int = -1 }

/** The round-9 ProjectConfig surface closures: blueprint/instance include
  * patterns, duplicate-name detection, required_lhp_version enforcement,
  * and the test_reporting provider contract — each mirrors a reference
  * behavior that was previously silently absorbed. */
class ProjectSurfaceSpec extends graft.SparkSuite {

  // ------------------------------------------------------------- discovery

  private def write(root: java.nio.file.Path, rel: String, text: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, text): Unit
  }

  test("blueprint discovery is recursive and honors blueprint_include") {
    val root = Files.createTempDirectory("graft-bpdisc")
    write(root, "lhp.yaml", "name: p\n")
    write(root, "blueprints/top.yaml", "name: bp_top\nflowgroup: f\nactions: []\n")
    write(root, "blueprints/nested/deep.yaml", "name: bp_deep\nflowgroup: f\nactions: []\n")
    val p = Project.load(root.toString)
    // a flat listing found only top.yaml; the reference default pattern is
    // the recursive blueprints/ tree, zero-directory case included
    assert(p.blueprints.keySet == Set("bp_top", "bp_deep"))

    write(root, "lhp.yaml",
      """name: p
        |blueprint_include: ["defs/**/*.yaml"]
        |""".stripMargin)
    write(root, "defs/alt.yaml", "name: bp_alt\nflowgroup: f\nactions: []\n")
    val p2 = Project.load(root.toString)
    assert(p2.blueprints.keySet == Set("bp_alt")) // explicit pattern replaces default
  }

  test("duplicate blueprint names are loud with both file paths") {
    val root = Files.createTempDirectory("graft-bpdup")
    write(root, "lhp.yaml", "name: p\n")
    write(root, "blueprints/a.yaml", "name: same_bp\nflowgroup: f\nactions: []\n")
    write(root, "blueprints/b.yaml", "name: same_bp\nflowgroup: f\nactions: []\n")
    val e = intercept[YamlConfig.ConfigError](Project.load(root.toString))
    assert(e.msg.contains("same_bp") && e.msg.contains("a.yaml") &&
      e.msg.contains("b.yaml"), e.msg)
  }

  test("include-pattern fields reject non-list and non-string shapes loudly") {
    val root = Files.createTempDirectory("graft-incbad")
    write(root, "lhp.yaml", "name: p\nblueprint_include: \"*.yaml\"\n")
    val e = intercept[YamlConfig.ConfigError](Project.load(root.toString))
    assert(e.msg.contains("blueprint_include") && e.msg.contains("list"), e.msg)
  }

  test("instance discovery is independent of the flowgroup include globs") {
    val root = Files.createTempDirectory("graft-instdisc")
    write(root, "lhp.yaml",
      """name: p
        |include: ["bronze_*.yaml"]
        |instance_include: ["pipelines/**/*.yaml", "instances/**/*.yaml"]
        |""".stripMargin)
    write(root, "blueprints/ing.yaml",
      """name: ing
        |parameters: [{name: tbl, required: true}]
        |flowgroups:
        |  - pipeline: q
        |    flowgroup: "%{tbl}_fg"
        |    actions:
        |      - name: load_%{tbl}
        |        type: load
        |        source: {type: sql, sql: "SELECT 1 AS id"}
        |        target: v_%{tbl}
        |      - name: w_%{tbl}
        |        type: write
        |        source: v_%{tbl}
        |        write_target: {type: materialized_view, table: "%{tbl}"}
        |""".stripMargin)
    // a plain flowgroup EXCLUDED by include: ignored
    write(root, "pipelines/gold_x.yaml",
      "pipeline: gold\nflowgroup: gx\nactions: []\n")
    // an instance file excluded by include: still discovered (content-shape
    // routing, as the reference's discover_instances does)
    write(root, "pipelines/inst_a.yaml", "use_blueprint: ing\nparameters: {tbl: t_a}\n")
    // an instance OUTSIDE pipelines/, reachable only via instance_include
    write(root, "instances/inst_b.yaml", "pipeline: q\nuse_blueprint: ing\nparameters: {tbl: t_b}\n")
    write(root, "substitutions/dev.yaml", "dev: {}\n")
    val p = Project.load(root.toString)
    val fgs = p.flowgroups("dev", lenient = true)
    val names = fgs.map(_.flowgroup).toSet
    assert(names.contains("t_a_fg") && names.contains("t_b_fg"), names.toString)
    assert(!names.contains("gx")) // include still filters plain flowgroups
  }

  test("a malformed file excluded by include never breaks resolution") {
    val root = Files.createTempDirectory("graft-malformed")
    write(root, "lhp.yaml",
      "name: p\ninclude: [\"bronze_*.yaml\"]\n")
    write(root, "pipelines/bronze_ok.yaml",
      """pipeline: b
        |flowgroup: ok
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: sql, sql: "SELECT 1 AS id"}
        |    target: v
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: materialized_view, table: t_ok}
        |""".stripMargin)
    // a scratch file the include globs deliberately exclude — broken YAML;
    // the instance-shape sniff must treat it as "not an instance", not die
    write(root, "pipelines/wip.yaml", "pipeline: [unterminated\n  bad: {{{{\n")
    write(root, "substitutions/dev.yaml", "dev: {}\n")
    val fgs = Project.load(root.toString).flowgroups("dev", lenient = true)
    assert(fgs.map(_.flowgroup) == Seq("ok"))
  }

  test("validate walks the same file set as run (instances included)") {
    val root = Files.createTempDirectory("graft-valinst")
    write(root, "lhp.yaml",
      """name: p
        |instance_include: ["instances/**/*.yaml"]
        |""".stripMargin)
    // instance referencing a blueprint that does not exist — run would
    // fail; validate must report it instead of passing a narrower file set
    write(root, "instances/bad.yaml",
      "pipeline: q\nuse_blueprint: no_such_bp\nparameters: {x: y}\n")
    write(root, "substitutions/dev.yaml", "dev: {}\n")
    val (ok, issues) = graft.ValidateProject.validate(spark, root.toString, "dev")
    assert(ok == 0)
    assert(issues.exists(_.message.contains("no_such_bp")),
      issues.map(_.message).mkString("; "))
  }

  test("version gate reads the manifest before the strict loaders") {
    val root = Files.createTempDirectory("graft-pregate")
    // the manifest carries BOTH an incompatible version pin and a shape
    // error the loud loader would throw on (duplicate blueprint names) —
    // the user must see the version message, not the shape error
    write(root, "lhp.yaml",
      "name: future_proj\nrequired_lhp_version: \">=2.0\"\n")
    write(root, "blueprints/a.yaml", "name: dup\nflowgroups: []\n")
    write(root, "blueprints/b.yaml", "name: dup\nflowgroups: []\n")
    val e = intercept[YamlConfig.ConfigError](
      VersionCheck.enforceForProjectDir(root.toString))
    assert(e.msg.contains("future_proj") && e.msg.contains("0.9.1"), e.msg)
  }

  test("provider config_file must be flat — nested values are loud") {
    assert(TestReporters.flatConfig("a: 1\nb: text\nc: true\n", "r.yaml") ==
      Map("a" -> "1", "b" -> "text", "c" -> "true"))
    val e = intercept[YamlConfig.ConfigError](
      TestReporters.flatConfig("endpoint: {url: x, retries: 3}\n", "r.yaml"))
    assert(e.msg.contains("endpoint") && e.msg.contains("nested"), e.msg)
    val e2 = intercept[YamlConfig.ConfigError](
      TestReporters.flatConfig("hosts: [a, b]\n", "r.yaml"))
    assert(e2.msg.contains("hosts"), e2.msg)
  }

  test("substitutions: global tokens shared across envs, env-specific wins") {
    val root = Files.createTempDirectory("graft-glob")
    write(root, "lhp.yaml", "name: p\n")
    write(root, "substitutions/dev.yaml",
      """global:
        |  db_name: sales
        |  region: us-east
        |dev:
        |  catalog: dev_cat
        |  region: eu-west
        |""".stripMargin)
    val p = Project.load(root.toString)
    val tokens = p.envTokens("dev")
    assert(tokens("db_name") == "sales")   // from global
    assert(tokens("catalog") == "dev_cat") // env-specific
    assert(tokens("region") == "eu-west")  // env overrides global
  }

  test("a test-only flowgroup runs end-to-end (no load, no write)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-testonly").toString
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    val hooks = new graft.exec.PipelineHooks.Recording
    val runner = new graft.exec.PipelineRunner(spark, store, s"$dir/cp",
      hooks = hooks)
    Seq((1, "a"), (1, "b")).toDF("id", "v").createOrReplaceTempView("dq_src")
    runner.run(YamlConfig.parseFlowGroup(
      """pipeline: bronze_dq
        |flowgroup: orders_dq
        |actions:
        |  - name: orders_id_unique
        |    type: test
        |    test_type: uniqueness
        |    source: dq_src
        |    columns: [id]
        |    on_violation: warn
        |""".stripMargin))
    assert(hooks.tests.exists { case (n, _, v) =>
      n == "orders_id_unique" && v > 0 })
  }

  // -------------------------------------------------- required_lhp_version

  test("version specifier subset: ranges, wildcards, compatible release") {
    import VersionCheck.satisfies
    assert(satisfies(">=0.5.0,<=0.9.9", "0.9.1"))
    assert(!satisfies(">=0.5.0,<0.8.0", "0.9.1"))
    assert(satisfies("==0.9.*", "0.9.1"))
    assert(!satisfies("==0.8.*", "0.9.1"))
    assert(satisfies("!=0.9.0", "0.9.1"))
    assert(satisfies("~=0.9.0", "0.9.1"))
    assert(!satisfies("~=0.8.0", "0.9.1"))
    assert(satisfies(">0.9", "0.9.1"))
    assert(!satisfies("<0.9.1", "0.9.1"))
    // unknown operator is loud, not silently true
    val e = intercept[YamlConfig.ConfigError](satisfies("^0.9", "0.9.1"))
    assert(e.msg.contains("^0.9"), e.msg)
  }

  test("enforce: mismatch is loud, env bypass honored, unset is a no-op") {
    VersionCheck.enforce(None, "p") // no-op
    VersionCheck.enforce(Some(">=0.5.0,<=0.9.9"), "p") // satisfied
    val e = intercept[YamlConfig.ConfigError](
      VersionCheck.enforce(Some(">=0.5.0,<0.8.0"), "acmi"))
    assert(e.msg.contains("acmi") && e.msg.contains("0.9.1"), e.msg)
    // the reference's LHP_IGNORE_VERSION bypass (and the GRAFT_ spelling)
    VersionCheck.enforce(Some("<0.8.0"), "p",
      env = k => if (k == "LHP_IGNORE_VERSION") Some("yes") else None)
    VersionCheck.enforce(Some("<0.8.0"), "p",
      env = k => if (k == "GRAFT_IGNORE_VERSION") Some("1") else None)
  }

  // --------------------------------------------------------- test_reporting

  test("test_reporting: providers resolve by class or reflective method, loudly otherwise") {
    val p = TestReporters.loadProvider(
      "graft.config.FixtureResultProvider", "publish")
    val reporter = new TestReporters.ProviderReporter(p, Map("k" -> "v"))
    reporter.onTestResult("pl", "fg", "t_rows", "row_count", 0L)
    reporter.onTestResult("pl", "fg", "t_uni", "uniqueness", 3L)
    reporter.publishAll()
    val (results, cfg) = FixtureResultProvider.captured.get
    assert(results.map(r => (r.testName, r.status)) ==
      Seq(("t_rows", "passed"), ("t_uni", "failed")))
    assert(cfg == Map("k" -> "v"))

    val fn = TestReporters.loadProvider("graft.config.FixtureFnProvider", "report")
    fn.publish(Seq.empty, Map.empty)
    assert(FixtureFnProvider.count == 0)

    val ePy = intercept[YamlConfig.ConfigError](
      TestReporters.loadProvider("providers/my_reporter.py", "publish"))
    assert(ePy.msg.contains("JVM"), ePy.msg)
    val eMissing = intercept[YamlConfig.ConfigError](
      TestReporters.loadProvider("graft.config.NoSuchProviderClass", "publish"))
    assert(eMissing.msg.contains("NoSuchProviderClass"), eMissing.msg)
    val eNoFn = intercept[YamlConfig.ConfigError](
      TestReporters.loadProvider("graft.config.FixtureFnProvider", "missing_fn"))
    assert(eNoFn.msg.contains("missing_fn"), eNoFn.msg)
  }

  test("test_reporting and version blocks parse from lhp.yaml") {
    val root = Files.createTempDirectory("graft-trcfg")
    write(root, "lhp.yaml",
      """name: p
        |required_lhp_version: ">=0.5.0,<=0.9.9"
        |test_reporting:
        |  module_path: graft.config.FixtureResultProvider
        |  function_name: publish
        |  config_file: reporting.yaml
        |""".stripMargin)
    val p = Project.load(root.toString)
    assert(p.requiredLhpVersion.contains(">=0.5.0,<=0.9.9"))
    val tr = p.testReporting.get
    assert(tr.modulePath == "graft.config.FixtureResultProvider" &&
      tr.functionName == "publish" && tr.configFile.contains("reporting.yaml"))
    // required keys are loud
    write(root, "lhp.yaml", "name: p\ntest_reporting: {module_path: x.Y}\n")
    val e = intercept[YamlConfig.ConfigError](Project.load(root.toString))
    assert(e.msg.contains("function_name"), e.msg)
  }

  // ------------------------------------------------------- field inventory

  /** The reference PROJECT-config field inventory (models/_project.py:20-39
    * + the block models it nests), each mapped to its contract category —
    * the same documentation-as-test audit the Action model already has: a
    * field left uncategorized fails the build, closing the "nothing
    * silently absorbed" doctrine at the PROJECT level. */
  test("full reference ProjectConfig field inventory is categorized — none absorbed") {
    // honored: parsed AND runtime behavior matches the reference's
    val honored = Map(
      "ProjectConfig" -> Set("name", "version", "include",
        "blueprint_include", "instance_include", "operational_metadata",
        "event_log", "monitoring", "required_lhp_version", "test_reporting",
        "uc_tagging", "sandbox"),
      "EventLogConfig" -> Set("enabled", "catalog", "schema", "name_prefix",
        "name_suffix"),
      "MonitoringConfig" -> Set("enabled", "pipeline_name", "catalog",
        "schema", "streaming_table", "checkpoint_path",
        "max_concurrent_streams", "materialized_views"),
      "MonitoringMaterializedViewConfig" -> Set("name", "sql", "sql_path"),
      "TestReportingConfig" -> Set("module_path", "function_name",
        "config_file"),
      "MetadataColumnConfig" -> Set("expression", "applies_to", "enabled"),
      "SandboxConfig" -> Set("strategy", "table_pattern", "allowed_envs"))
    // doc-only: identity/annotation fields with no runtime semantics
    val docOnly = Map(
      "ProjectConfig" -> Set("description", "author", "created_date"),
      "MetadataColumnConfig" -> Set("description"))
    // codegen-only: meaningful ONLY to the reference's generate-Python /
    // Databricks-job pipeline; this engine interprets configs in-process,
    // so there is no generated file to format, wheel to upload, or
    // Workflow job to configure. Parsed where cheap so typos stay visible.
    val codegenOnly = Map(
      "ProjectConfig" -> Set("wheel", "apply_formatting"),
      "WheelConfig" -> Set("artifact_volume"),
      "MonitoringConfig" -> Set("job_config_path", "enable_job_monitoring"),
      "MetadataColumnConfig" -> Set("additional_imports"))
    // reference-dead: models the reference defines but never consumes at
    // runtime (OperationalMetadataSelection / MetadataPresetConfig — the
    // action/flowgroup field type is `bool | list[str]`, the selection
    // class has no call sites outside models/__init__)
    val referenceDead = Map(
      "ProjectOperationalMetadataConfig" -> Set("presets", "defaults"),
      "MetadataPresetConfig" -> Set("columns", "description"),
      "OperationalMetadataSelection" -> Set("enabled", "preset", "columns",
        "include_columns", "exclude_columns"))

    // the full reference field lists, transcribed from the model sources
    val reference = Map(
      "ProjectConfig" -> Set("name", "version", "description", "author",
        "created_date", "include", "blueprint_include", "instance_include",
        "operational_metadata", "event_log", "monitoring",
        "required_lhp_version", "test_reporting", "uc_tagging", "wheel",
        "sandbox", "apply_formatting"),
      "EventLogConfig" -> Set("enabled", "catalog", "schema", "name_prefix",
        "name_suffix"),
      "MonitoringConfig" -> Set("enabled", "pipeline_name", "catalog",
        "schema", "streaming_table", "checkpoint_path", "job_config_path",
        "max_concurrent_streams", "materialized_views",
        "enable_job_monitoring"),
      "MonitoringMaterializedViewConfig" -> Set("name", "sql", "sql_path"),
      "TestReportingConfig" -> Set("module_path", "function_name",
        "config_file"),
      "MetadataColumnConfig" -> Set("expression", "description",
        "applies_to", "additional_imports", "enabled"),
      "WheelConfig" -> Set("artifact_volume"),
      "SandboxConfig" -> Set("strategy", "table_pattern", "allowed_envs"),
      "ProjectOperationalMetadataConfig" -> Set("columns", "presets", "defaults"),
      "MetadataPresetConfig" -> Set("columns", "description"),
      "OperationalMetadataSelection" -> Set("enabled", "preset", "columns",
        "include_columns", "exclude_columns"))
    // ProjectOperationalMetadataConfig.columns is honored via
    // MetadataColumnConfig above
    val honoredPlus = honored.updated("ProjectOperationalMetadataConfig",
      honored.getOrElse("ProjectOperationalMetadataConfig", Set.empty) + "columns")

    reference.foreach { case (model, fields) =>
      val categorized =
        honoredPlus.getOrElse(model, Set.empty) ++
          docOnly.getOrElse(model, Set.empty) ++
          codegenOnly.getOrElse(model, Set.empty) ++
          referenceDead.getOrElse(model, Set.empty)
      val missing = fields -- categorized
      assert(missing.isEmpty,
        s"$model fields not categorized (silently absorbed?): $missing")
      val phantom = categorized -- fields
      assert(phantom.isEmpty, s"$model categorized fields not in reference: $phantom")
    }

    // spot-verify the reference lists themselves against the source files,
    // so the transcription cannot drift silently (reference present in CI
    // environment; skip quietly elsewhere)
    val src = java.nio.file.Paths.get("/root/reference/src/lhp/models/_project.py")
    if (Files.exists(src)) {
      val text = Files.readString(src)
      reference("ProjectConfig").foreach(f =>
        assert(text.contains(f), s"ProjectConfig.$f not found in _project.py"))
    }
  }

  test("full reference FlowGroup/Template/Preset field inventories are categorized") {
    // models/_flowgroup.py:13-21, _template.py, Preset — same
    // documentation-as-test audit as the Action and ProjectConfig levels
    val honored = Map(
      "FlowGroup" -> Set("pipeline", "flowgroup", "variables", "presets",
        "use_template", "template_parameters", "actions",
        "operational_metadata"),
      "Template" -> Set("name", "presets", "parameters", "actions"),
      "Preset" -> Set("name", "extends", "defaults"))
    val docOnly = Map(
      "Template" -> Set("version", "description"),
      "Preset" -> Set("version", "description"))
    // job_name names the generated Databricks Workflow job — there is no
    // job artifact in an in-process interpreter
    val codegenOnly = Map("FlowGroup" -> Set("job_name"))
    val reference = Map(
      "FlowGroup" -> Set("pipeline", "flowgroup", "job_name", "variables",
        "presets", "use_template", "template_parameters", "actions",
        "operational_metadata"),
      "Template" -> Set("name", "version", "description", "presets",
        "parameters", "actions"),
      "Preset" -> Set("name", "version", "extends", "description",
        "defaults"))
    reference.foreach { case (model, fields) =>
      val categorized = honored.getOrElse(model, Set.empty) ++
        docOnly.getOrElse(model, Set.empty) ++
        codegenOnly.getOrElse(model, Set.empty)
      assert((fields -- categorized).isEmpty,
        s"$model fields not categorized: ${fields -- categorized}")
      assert((categorized -- fields).isEmpty,
        s"$model phantom fields: ${categorized -- fields}")
    }
  }

  // ------------------------------------------------------ monitoring knobs

  test("monitoring checkpoint_path and max_concurrent_streams parse with loud bounds") {
    val root = Files.createTempDirectory("graft-monknobs")
    write(root, "lhp.yaml",
      """name: p
        |monitoring:
        |  checkpoint_path: "cp/monitoring"
        |  max_concurrent_streams: 4
        |  job_config_path: jobs/mon.yaml
        |  enable_job_monitoring: true
        |""".stripMargin)
    val mon = Project.load(root.toString).monitoring.get
    assert(mon.checkpointPath.contains("cp/monitoring"))
    assert(mon.maxConcurrentStreams == 4)
    assert(mon.jobConfigPath.contains("jobs/mon.yaml") && mon.enableJobMonitoring)

    for (bad <- Seq("0", "21", "lots")) {
      write(root, "lhp.yaml",
        s"name: p\nmonitoring: {max_concurrent_streams: $bad}\n")
      val e = intercept[YamlConfig.ConfigError](Project.load(root.toString))
      assert(e.msg.contains("max_concurrent_streams"), e.msg)
    }
  }
}
