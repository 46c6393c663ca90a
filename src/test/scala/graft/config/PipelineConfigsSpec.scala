package graft.config

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.config.YamlConfig.ConfigError
import graft.model.{FlowGroup, MaterializedViewWrite, SqlLoad, StreamingTableWrite, TableLoad}

/** Pins the `pipeline_config.yaml` contract (reference
  * core/loaders/pipeline_config_loader.py): multi-document parsing, the
  * defaults → project_defaults → pipeline deep-merge, the full validation
  * surface (allowlists, shape checks, duplicate/empty/alias rules), the
  * forward-compatible unknown-key posture, and the engine's runtime
  * honoring helpers (namespace application, conf union, continuous
  * refusal). */
class PipelineConfigsSpec extends AnyFunSuite {

  private def load(text: String, monitoring: Option[String] = None) = {
    val f = Files.createTempFile("graft-pc", ".yaml")
    Files.writeString(f, text)
    PipelineConfigs.load(f, monitoring)
  }

  test("merge order: hard defaults, then project_defaults, then pipeline doc") {
    val pc = load(
      """project_defaults:
        |  edition: PRO
        |  configuration:
        |    a.key: "1"
        |    b.key: "2"
        |---
        |pipeline: sales
        |channel: PREVIEW
        |configuration:
        |  b.key: "9"
        |""".stripMargin)
    val s = pc.settingsFor("sales")
    assert(s.raw("serverless") == true)          // hard default survives
    assert(s.raw("edition") == "PRO")            // project default wins over hard
    assert(s.raw("channel") == "PREVIEW")        // pipeline wins over hard
    assert(!s.continuous)                        // hard default false
    // nested configuration maps MERGE (b.key overridden, a.key kept)
    assert(s.configuration == Map("a.key" -> "1", "b.key" -> "9"))
    // an undeclared pipeline gets defaults + project_defaults only
    assert(pc.settingsFor("other").configuration == Map("a.key" -> "1", "b.key" -> "2"))
    assert(pc.settingsFor("other").raw("edition") == "PRO")
  }

  test("lists REPLACE across layers; a doc can name several pipelines") {
    val pc = load(
      """project_defaults:
        |  notifications: [a@x.com, b@x.com]
        |---
        |pipeline: [p1, p2]
        |notifications: [c@x.com]
        |serverless: false
        |""".stripMargin)
    assert(pc.settingsFor("p1").raw("notifications") ==
      java.util.List.of("c@x.com"))
    assert(pc.settingsFor("p2").raw("serverless") == false)
    assert(pc.settingsFor("p3").raw("notifications") ==
      java.util.List.of("a@x.com", "b@x.com"))
  }

  test("duplicate pipeline names across documents are loud, with both doc indexes") {
    val e = intercept[ConfigError](load(
      "pipeline: p\n---\npipeline: [q, p]\n"))
    assert(e.msg.contains("'p'") && e.msg.contains("document 2") &&
      e.msg.contains("document 1"), e.msg)
  }

  test("empty pipeline list is an error; non-dict and keyless docs warn-skip") {
    val e = intercept[ConfigError](load("pipeline: []\n"))
    assert(e.msg.contains("empty"), e.msg)
    // scalar doc and a doc with neither recognized key are ignored, not fatal
    val pc = load("just a string\n---\nunrelated: {a: 1}\n---\npipeline: p\n")
    assert(pc.pipelineConfigs.keySet == Set("p"))
  }

  test("monitoring alias: standalone-only, resolves, collides, or drops") {
    val e1 = intercept[ConfigError](load(
      s"pipeline: [${PipelineConfigs.MonitoringAlias}, other]\n",
      monitoring = Some("mon_pipe")))
    assert(e1.msg.contains("standalone"), e1.msg)
    val ok = load(
      s"pipeline: ${PipelineConfigs.MonitoringAlias}\nserverless: false\n",
      monitoring = Some("mon_pipe"))
    assert(ok.pipelineConfigs.keySet == Set("mon_pipe"))
    assert(ok.settingsFor("mon_pipe").raw("serverless") == false)
    val e2 = intercept[ConfigError](load(
      s"""pipeline: ${PipelineConfigs.MonitoringAlias}
         |---
         |pipeline: mon_pipe
         |""".stripMargin, monitoring = Some("mon_pipe")))
    assert(e2.msg.contains("mon_pipe"), e2.msg)
    // monitoring not configured: entry warns and drops, not an error
    val dropped = load(s"pipeline: ${PipelineConfigs.MonitoringAlias}\n")
    assert(dropped.pipelineConfigs.isEmpty)
  }

  test("validation: allowlists, configuration string values, permissions shape") {
    def bad(yaml: String): String =
      intercept[ConfigError](load(yaml)).msg
    assert(bad("pipeline: p\nedition: DELUXE\n").contains("edition"))
    assert(bad("pipeline: p\nchannel: NIGHTLY\n").contains("channel"))
    assert(bad("pipeline: p\npackaging: zip\n").contains("packaging"))
    assert(bad("pipeline: p\nenvironment: not_a_map\n").contains("environment"))
    assert(bad("pipeline: p\ncontinuous: maybe\n").contains("continuous"))
    assert(bad("pipeline: p\nconfiguration: not_a_map\n").contains("configuration"))
    // unquoted YAML scalars parse as Boolean/Integer — the reference
    // requires all Databricks conf values to be strings
    val eVal = bad("pipeline: p\nconfiguration: {k: true}\n")
    assert(eVal.contains("'k'") && eVal.contains("string"), eVal)
    assert(bad("pipeline: p\npermissions: CAN_MANAGE\n").contains("list"))
    assert(bad("pipeline: p\npermissions: [{user_name: u}]\n").contains("level"))
    val eTwo = bad("pipeline: p\npermissions: [{level: CAN_VIEW, " +
      "user_name: u, group_name: g}]\n")
    assert(eTwo.contains("exactly one"), eTwo)
    // project_defaults validates with the same contract
    assert(bad("project_defaults: {edition: DELUXE}\n").contains("edition"))
    // a valid permissions entry passes
    load("pipeline: p\npermissions: [{level: CAN_MANAGE, group_name: eng}]\n")
  }

  test("documents that would silently lose data are loud; null values named") {
    // the reference's if/elif silently drops the pipeline half of a
    // both-keys doc and last-wins a repeated project_defaults — here loud
    val eBoth = intercept[ConfigError](load(
      "project_defaults: {edition: PRO}\npipeline: p\n"))
    assert(eBoth.msg.contains("BOTH"), eBoth.msg)
    val eTwice = intercept[ConfigError](load(
      "project_defaults: {edition: PRO}\n---\nproject_defaults: {channel: CURRENT}\n"))
    assert(eTwice.msg.contains("second"), eTwice.msg)
    // value-less keys parse as YAML null — named errors, not NPEs
    assert(intercept[ConfigError](load("pipeline: p\nedition:\n"))
      .msg.contains("no value"))
    assert(intercept[ConfigError](load("pipeline:\nedition: PRO\n"))
      .msg.contains("no value"))
    val eNullConf = intercept[ConfigError](load(
      "pipeline: p\nconfiguration: {k: }\n"))
    assert(eNullConf.msg.contains("'k'"), eNullConf.msg)
    assert(intercept[ConfigError](load("pipeline: p\npermissions: [~]\n"))
      .msg.contains("empty"))
  }

  test("unknown keys are allowed — forward compatibility, unlike flowgroup YAML") {
    val pc = load("pipeline: p\nsome_future_key: {nested: true}\nphoton: true\n")
    assert(pc.settingsFor("p").raw.contains("some_future_key"))
  }

  test("missing file is a named error") {
    val e = intercept[ConfigError](PipelineConfigs.load(
      java.nio.file.Paths.get("/nonexistent/pc.yaml"), None))
    assert(e.msg.contains("not found"), e.msg)
  }

  test("unionConfiguration: union across pipelines, conflicting values loud") {
    val pc = load(
      """pipeline: p1
        |configuration: {shared.key: "1", only.p1: "a"}
        |---
        |pipeline: p2
        |configuration: {shared.key: "1", only.p2: "b"}
        |---
        |pipeline: p3
        |configuration: {shared.key: "2"}
        |""".stripMargin)
    assert(pc.unionConfiguration(Seq("p1", "p2")) ==
      Map("shared.key" -> "1", "only.p1" -> "a", "only.p2" -> "b"))
    val e = intercept[ConfigError](pc.unionConfiguration(Seq("p1", "p3")))
    assert(e.msg.contains("shared.key") && e.msg.contains("p1") &&
      e.msg.contains("p3"), e.msg)
  }

  test("applyNamespace qualifies unqualified engine tables; refuseContinuous") {
    val pc = load(
      """pipeline: sales
        |catalog: main
        |schema: bronze
        |---
        |pipeline: always_on
        |continuous: true
        |""".stripMargin)
    val fg = FlowGroup("sales", "f", actions = Seq(
      TableLoad("l1", Some("v1"), "src"),                 // unqualified → main.bronze.src
      TableLoad("l2", Some("v2"), "other.cat.t"),         // qualified → untouched
      SqlLoad("l3", Some("v3"), "SELECT 1 AS a"),         // sql text untouched
      StreamingTableWrite("w1", "v1", "out_st"),
      MaterializedViewWrite("w2", Some("v3"), "out_mv"),
      graft.model.DataQualityTransform("dq", Some("v4"), "v1", rules = Nil,
        quarantineTable = Some("dlq"))))                  // DLQ is an engine table too
    val out = PipelineConfigs.applyNamespace(fg, pc.settingsFor("sales"))
    assert(out.actions.collect { case a: TableLoad => a.table } ==
      Seq("main.bronze.src", "other.cat.t"))
    assert(out.actions.collect { case a: StreamingTableWrite => a.table } ==
      Seq("main.bronze.out_st"))
    assert(out.actions.collect { case a: MaterializedViewWrite => a.table } ==
      Seq("main.bronze.out_mv"))
    assert(out.actions.collect {
      case a: graft.model.DataQualityTransform => a.quarantineTable.get } ==
      Seq("main.bronze.dlq"))
    // a pipeline without catalog/schema is untouched (identity)
    assert(PipelineConfigs.applyNamespace(fg, pc.settingsFor("nohome")) eq fg)
    val e = intercept[ConfigError](PipelineConfigs.refuseContinuous(
      pc, Seq("sales", "always_on")))
    assert(e.msg.contains("always_on") && !e.msg.contains("sales,"), e.msg)
  }
}
