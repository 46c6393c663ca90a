package graft

import java.nio.file.Files

import graft.config.YamlConfig

/** Integration spec over [[RunProject.execute]] — the CLI WIRING end to
  * end: version gate, event-log hooks, monitoring pipeline (qualified MVs,
  * parallel union streams), test_reporting terminal publish, and sandbox
  * state isolation. Two review rounds found wiring-only defects in this
  * file that no component spec could catch; this drives the real
  * composition path a user's `runMain graft.RunProject` takes. */
class RunProjectE2ESpec extends SparkSuite {
  import spark.implicits._

  private def write(root: java.nio.file.Path, rel: String, text: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, text): Unit
  }

  private def mkProject(root: java.nio.file.Path): Unit = {
    write(root, "lhp.yaml",
      """name: e2e_proj
        |required_lhp_version: ">=0.9,<1.0"
        |event_log: {}
        |monitoring:
        |  catalog: ops
        |  streaming_table: all_logs
        |  max_concurrent_streams: 2
        |  materialized_views:
        |    - {name: mv_counts, sql: "SELECT pipeline, CAST(count(*) AS BIGINT) AS n FROM all_logs GROUP BY pipeline"}
        |test_reporting:
        |  module_path: graft.config.FixtureResultProvider
        |  function_name: publish
        |sandbox:
        |  table_pattern: "{namespace}_{table}"
        |""".stripMargin)
    write(root, "substitutions/dev.yaml", "dev: {}\n")
    for (n <- Seq("alpha", "beta")) write(root, s"pipelines/$n.yaml",
      s"""pipeline: $n
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    source: {type: sql, sql: "SELECT 1 AS id, 'x' AS v"}
         |    target: v
         |  - name: t
         |    type: test
         |    test_type: completeness
         |    source: v
         |    required_columns: [id]
         |    on_violation: warn
         |  - name: w
         |    type: write
         |    source: v
         |    write_target: {type: materialized_view, table: ${n}_out}
         |""".stripMargin)
  }

  test("execute wires version gate, event logs, monitoring, and provider publish") {
    val root = Files.createTempDirectory("graft-runwire")
    mkProject(root)
    val wh = Files.createTempDirectory("graft-runwh").toString
    graft.config.FixtureResultProvider.captured = None
    val outcomes = RunProject.execute(spark, root.toString, "dev", wh)
    assert(outcomes.size == 2 && outcomes.forall(o => o.error.isEmpty && !o.skipped),
      outcomes.map(o => s"${o.flowgroup}: ${o.error}").mkString("; "))
    val store = new graft.exec.TableStore(spark, wh)
    // data landed
    assert(store.read("alpha_out").count() == 1L)
    // event logs written per pipeline, monitoring union + MV under ops.
    assert(store.exists("alpha_event_log") && store.exists("beta_event_log"))
    assert(store.exists("ops.all_logs"))
    val counts = store.read("ops.mv_counts").as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("alpha", "beta"), counts.toString)
    // provider received the terminal publish with BOTH pipelines' tests
    val (results, _) = graft.config.FixtureResultProvider.captured.get
    assert(results.map(_.pipeline).toSet == Set("alpha", "beta"))
    assert(results.forall(_.status == "passed"))
    // JUnit XML landed under the warehouse (non-sandbox state root)
    assert(new java.io.File(s"$wh/_reports").listFiles().nonEmpty)
  }

  test("a sandbox run isolates tables AND runtime state from the real run") {
    val root = Files.createTempDirectory("graft-runsand")
    mkProject(root)
    // a STREAMING pipeline so sandbox checkpoint isolation is exercised
    // (batch-only actions create no stream state)
    val landing = Files.createTempDirectory("graft-sandlanding")
    Seq((1L, "a")).toDF("id", "v").write.json(s"$landing/files")
    write(root, "pipelines/gamma.yaml",
      s"""pipeline: gamma
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    source:
         |      type: cloudfiles
         |      path: $landing/files
         |      format: json
         |      readMode: stream
         |      table_schema: "id BIGINT, v STRING"
         |    target: v
         |  - name: w
         |    type: write
         |    source: v
         |    write_target: {type: streaming_table, table: gamma_out}
         |""".stripMargin)
    // the reference nests the profile payload under `sandbox:`
    write(root, ".lhp/profile.yaml",
      """sandbox:
        |  namespace: alice
        |  pipelines: [alpha, beta, gamma]
        |""".stripMargin)
    val wh = Files.createTempDirectory("graft-sandwh").toString
    val outcomes = RunProject.execute(spark, root.toString, "dev", wh,
      flags = Set("--sandbox"))
    assert(outcomes.forall(_.error.isEmpty))
    val store = new graft.exec.TableStore(spark, wh)
    // renamed tables in the SHARED warehouse; originals absent
    assert(store.exists("alice_alpha_out") && !store.exists("alpha_out"))
    assert(store.exists("alice_gamma_out") && !store.exists("gamma_out"))
    // runtime state namespaced — nothing at the shared roots
    assert(new java.io.File(s"$wh/_sandbox/alice/_checkpoints").exists())
    assert(new java.io.File(s"$wh/_sandbox/alice/_reports").exists())
    assert(!new java.io.File(s"$wh/_checkpoints").exists())
    assert(!new java.io.File(s"$wh/_reports").exists())
    // monitoring never runs under sandbox
    assert(!store.exists("ops.all_logs"))
    // a pipeline filter with --sandbox still resolves the full profile
    val filtered = RunProject.execute(spark, root.toString, "dev", wh,
      pipelineFilter = Some("alpha"), flags = Set("--sandbox"))
    assert(filtered.size == 1 && filtered.head.error.isEmpty,
      filtered.map(o => s"${o.flowgroup}: ${o.error}").mkString("; "))
  }

  test("an incompatible version pin reports the version, not a shape error") {
    val root = Files.createTempDirectory("graft-runver")
    mkProject(root)
    write(root, "lhp.yaml",
      "name: e2e_proj\nrequired_lhp_version: \"<0.8\"\n")
    val e = intercept[YamlConfig.ConfigError](
      RunProject.execute(spark, root.toString, "dev",
        Files.createTempDirectory("graft-verwh").toString))
    assert(e.msg.contains("0.9.1"), e.msg)
  }

  test("--pipeline-config: namespace, session confs with restore, continuous refusal") {
    val root = Files.createTempDirectory("graft-runpc")
    mkProject(root)
    // alpha publishes under main.bronze (DLT publish-target semantics);
    // beta stays unqualified; both set a shared conf to the SAME value
    write(root, "pipeline_config.yaml",
      """project_defaults:
        |  configuration: {graft.test.shared: "on"}
        |---
        |pipeline: alpha
        |catalog: main
        |schema: bronze
        |configuration: {graft.test.alpha: "1"}
        |""".stripMargin)
    spark.conf.set("graft.test.shared", "prior")
    val wh = Files.createTempDirectory("graft-runpcwh").toString
    val outcomes = RunProject.execute(spark, root.toString, "dev", wh,
      flags = Set("--pipeline-config=pipeline_config.yaml"))
    assert(outcomes.forall(_.error.isEmpty),
      outcomes.map(o => s"${o.flowgroup}: ${o.error}").mkString("; "))
    val store = new graft.exec.TableStore(spark, wh)
    // alpha's table landed under the pipeline's catalog.schema; beta's flat
    assert(store.exists("main.bronze.alpha_out") && !store.exists("alpha_out"))
    assert(store.exists("beta_out"))
    // confs were restored to their pre-run state after execute returned
    assert(spark.conf.get("graft.test.shared") == "prior")
    assert(spark.conf.getOption("graft.test.alpha").isEmpty)
    spark.conf.unset("graft.test.shared")

    // conflicting conf values across the run's pipelines are loud
    write(root, "pipeline_config.yaml",
      """pipeline: alpha
        |configuration: {graft.test.shared: "a"}
        |---
        |pipeline: beta
        |configuration: {graft.test.shared: "b"}
        |""".stripMargin)
    val eConf = intercept[YamlConfig.ConfigError](
      RunProject.execute(spark, root.toString, "dev", wh,
        flags = Set("--pipeline-config=pipeline_config.yaml")))
    assert(eConf.msg.contains("graft.test.shared"), eConf.msg)

    // continuous: true is refused, naming the pipeline
    write(root, "pipeline_config.yaml", "pipeline: beta\ncontinuous: true\n")
    val eCont = intercept[YamlConfig.ConfigError](
      RunProject.execute(spark, root.toString, "dev", wh,
        flags = Set("--pipeline-config=pipeline_config.yaml")))
    assert(eCont.msg.contains("beta"), eCont.msg)

    // the monitoring pipeline's entry (via the alias) joins the continuous
    // refusal — it runs in this same session; mkProject enables monitoring
    write(root, "pipeline_config.yaml",
      "pipeline: __eventlog_monitoring\ncontinuous: true\n")
    val eMonCont = intercept[YamlConfig.ConfigError](
      RunProject.execute(spark, root.toString, "dev", wh,
        flags = Set("--pipeline-config=pipeline_config.yaml")))
    assert(eMonCont.msg.contains("event_log_monitoring"), eMonCont.msg)

    // ValidateProject surfaces the file's validation contract as issues —
    // including the RUN-blocking checks (continuous, conf conflicts), so a
    // green validate is never followed by a run abort on the same file
    write(root, "pipeline_config.yaml", "pipeline: alpha\nedition: DELUXE\n")
    val (_, issues) = ValidateProject.validate(spark, root.toString, "dev",
      pipelineConfig = Some("pipeline_config.yaml"))
    assert(issues.exists(_.message.contains("edition")),
      issues.map(_.message).mkString("; "))
    write(root, "pipeline_config.yaml",
      """pipeline: alpha
        |continuous: true
        |configuration: {k.a: "1"}
        |---
        |pipeline: beta
        |configuration: {k.a: "2"}
        |""".stripMargin)
    val (_, issues2) = ValidateProject.validate(spark, root.toString, "dev",
      pipelineConfig = Some("pipeline_config.yaml"))
    assert(issues2.exists(_.message.contains("continuous")) &&
      issues2.exists(_.message.contains("k.a")),
      issues2.map(_.message).mkString("; "))
  }
}
