package graft

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** The validate CLI (reference: src/lhp/cli/commands/validate_command.py):
  * resolve + plan with no execution, per-file error context, non-zero exit
  * on any failure. */
class ValidateProjectSpec extends SparkSuite {

  private def write(root: java.nio.file.Path, rel: String, text: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, text): Unit
  }

  private def fixtureProject(): java.nio.file.Path = {
    val root = Files.createTempDirectory("graft-validate")
    write(root, "lhp.yaml", "name: validate_fixture\n")
    write(root, "substitutions/dev.yaml", "dev:\n  env: dev\n")
    write(root, "pipelines/good.yaml",
      """pipeline: p
        |flowgroup: good
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: sql, sql: "SELECT 1 AS x"}
        |    target: v
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: materialized_view, table: t_good}
        |""".stripMargin)
    root
  }

  test("a clean project validates with zero issues") {
    val root = fixtureProject()
    val (ok, issues) = ValidateProject.validate(spark, root.toString, "dev")
    assert(ok == 1)
    assert(issues.isEmpty)
  }

  test("plan errors carry source-file context; unresolvable YAML is an issue") {
    val root = fixtureProject()
    // orphan transform: target never consumed -> PlanError
    write(root, "pipelines/bad_orphan.yaml",
      """pipeline: p
        |flowgroup: bad_orphan
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: sql, sql: "SELECT 1 AS x"}
        |    target: v
        |  - name: t_unused
        |    type: transform
        |    transform_type: sql
        |    source: v
        |    target: v_unused
        |    sql: "SELECT * FROM v"
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: materialized_view, table: t_bad}
        |""".stripMargin)
    // unknown template -> resolution error attributed to the file
    write(root, "pipelines/bad_template.yaml",
      """pipeline: p
        |flowgroup: bad_template
        |use_template: no_such_template
        |""".stripMargin)
    val (ok, issues) = ValidateProject.validate(spark, root.toString, "dev")
    assert(ok == 1) // the good flowgroup still validates
    assert(issues.size == 2)
    assert(issues.exists(i => i.context.contains("bad_orphan.yaml") &&
      i.message.contains("orphan")))
    assert(issues.exists(i => i.context.contains("bad_template.yaml")))
  }

  test("unknown environment reports instead of throwing") {
    val root = fixtureProject()
    val (ok, issues) = ValidateProject.validate(spark, root.toString, "staging")
    assert(ok == 0)
    assert(issues.nonEmpty)
    assert(issues.head.message.contains("unknown environment"))
  }

  test("the reference example corpus validates") {
    // the two example dirs that are full projects (mehdi is generated-only,
    // streaming_datasource_example is a single python file)
    for (name <- Seq("acmi", "performance_testing")) {
      val examples = Paths.get(s"/root/reference/Example_Projects/$name")
      assume(Files.exists(examples), "reference examples not present")
      val (ok, issues) = ValidateProject.validate(spark, examples.toString, "dev")
      assert(ok > 0, s"$name: expected at least one validated flowgroup")
      // acmi pins required_lhp_version '<0.8.0' — stale relative to the
      // 0.9.1 reference checkout itself, whose own validate reports the
      // identical mismatch. Every OTHER issue class must be empty.
      val structural = issues.filterNot(_.message.contains("required_lhp_version")
        ).filterNot(_.message.contains("config-surface version"))
      assert(structural.isEmpty,
        s"$name has issues:\n${structural.take(5).mkString("\n")}")
    }
  }
}
