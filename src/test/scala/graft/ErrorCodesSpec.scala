package graft

import java.nio.file.Files

import graft.config.YamlConfig

/** The stable error-code contract (reference parity:
  * src/lhp/errors/codes.py:511 is snapshot-tested there). Two halves:
  * the registry's own invariants, and a snapshot of which code each
  * induced refusal renders — the part a version diff must not move. */
class ErrorCodesSpec extends SparkSuite {

  test("registry: codes are unique, shaped, and append-only by construction") {
    val codes = ErrorCodes.all.map(_.code)
    assert(codes.distinct.size == codes.size, "duplicate codes in registry")
    codes.foreach(c => assert(c.matches("GRF-[A-Z]+-[0-9]{3}"), c))
    assert(ErrorCodes.all.forall(_.summary.nonEmpty))
  }

  test("split recovers (code, bare message); untagged messages are GEN-000") {
    val tagged = ErrorCodes.VAL_002("flowgroup 'g' has no actions")
    assert(ErrorCodes.split(tagged) ==
      ("GRF-VAL-002", "flowgroup 'g' has no actions"))
    // multi-line prose stays intact after the tag
    val multi = ErrorCodes.DEP_001("cycle:\n  a -> b\n  b -> a")
    assert(ErrorCodes.split(multi)._2.contains("b -> a"))
    assert(ErrorCodes.split("plain old message") ==
      (ErrorCodes.Uncoded, "plain old message"))
  }

  test("snapshot: induced refusals render their registered codes") {
    def codeOf(body: => Any): String = ErrorCodes.split(
      intercept[RuntimeException](body).getMessage)._1
    // CFG: document shape
    assert(codeOf(YamlConfig.parseFlowGroup("flowgroup: g\nactions: []")) ==
      "GRF-CFG-001")
    assert(codeOf(YamlConfig.parseFlowGroup("pipeline: p\nactions: []")) ==
      "GRF-CFG-002")
    // ACT: per-action contract
    assert(codeOf(YamlConfig.parseAction(
      Map("name" -> "x", "type" -> "nonsense"))) == "GRF-ACT-001")
    assert(codeOf(YamlConfig.parseAction(Map("name" -> "x", "type" -> "write",
      "write_target" -> new java.util.HashMap[String, Any](
        java.util.Map.of("type", "nonsense", "table", "t"))))) == "GRF-ACT-002")
    // VAL/DEP: planner refusals
    def fg(actionsYaml: String) = YamlConfig.parseFlowGroup(
      s"pipeline: p\nflowgroup: g\nactions:\n$actionsYaml")
    assert(codeOf(graft.plan.Planner.plan(fg(
      """  - name: l
        |    type: load
        |    source: {type: sql, sql: "SELECT 1 AS x"}
        |    target: v
        |  - name: a
        |    type: transform
        |    transform_type: sql
        |    source: [v, b_out]
        |    target: a_out
        |    sql: SELECT * FROM b_out
        |  - name: b
        |    type: transform
        |    transform_type: sql
        |    source: a_out
        |    target: b_out
        |    sql: SELECT * FROM a_out
        |  - name: w
        |    type: write
        |    source: a_out
        |    write_target: {type: materialized_view, table: t}""".stripMargin))) ==
      "GRF-DEP-001")
    assert(codeOf(graft.plan.Planner.validate(
      YamlConfig.parseFlowGroup("pipeline: p\nflowgroup: g\nactions: []"))) ==
      "GRF-VAL-002")
    // CFG: pipeline-config surface
    assert(codeOf(graft.config.PipelineConfigs.load(
      java.nio.file.Paths.get("/nonexistent/pc.yaml"), None)) == "GRF-IO-001")
    val pc = Files.createTempFile("graft-pc", ".yaml")
    Files.writeString(pc, "pipeline: p\nedition: BOGUS\n")
    assert(codeOf(graft.config.PipelineConfigs.load(pc, None)) == "GRF-CFG-052")
    // CFG: version gate
    assert(codeOf(graft.config.VersionCheck.enforce(
      Some(">=99.0.0"), "proj")) == "GRF-CFG-040")
    // ACT: incremental_join contract
    assert(codeOf(YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: g
        |actions:
        |  - name: mv
        |    type: write
        |    write_target:
        |      type: materialized_view
        |      table: t
        |      mode: incremental_join
        |      sql: SELECT 1 AS x
        |""".stripMargin)) == "GRF-ACT-010")
  }

  test("ValidateProject issues carry the code as a structured field") {
    def write(root: java.nio.file.Path, rel: String, text: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, text): Unit
    }
    val root = Files.createTempDirectory("graft-codes")
    write(root, "lhp.yaml", "name: codes_fixture\n")
    write(root, "substitutions/dev.yaml", "dev:\n  env: dev\n")
    // a flowgroup with no write action -> GRF-VAL-003 at plan time
    write(root, "pipelines/bad.yaml",
      """pipeline: p
        |flowgroup: bad
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: sql, sql: "SELECT 1 AS x"}
        |    target: v
        |""".stripMargin)
    val (_, issues) = ValidateProject.validate(spark, root.toString, "dev")
    assert(issues.map(_.code) == Seq("GRF-VAL-003"), issues)
    // the code is NOT duplicated inside the bare message
    assert(!issues.head.message.contains("GRF-"), issues.head.message)
  }
}
