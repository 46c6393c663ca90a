package graft.config

import graft.SparkSuite
import graft.model.MaterializedViewWrite
import graft.plan.Planner

class BlueprintSpec extends SparkSuite {

  private val blueprintYaml =
    """blueprint: ingest_family
      |instances:
      |  - {table: customer}
      |  - {table: orders}
      |  - {table: lineitem}
      |flowgroup_template: |
      |  pipeline: bronze
      |  flowgroup: ingest_{{ table }}
      |  actions:
      |    - name: load_{{ table }}
      |      type: load
      |      source: {type: sql, sql: "SELECT 1 AS x"}
      |      target: v_{{ table }}
      |    - name: write_{{ table }}
      |      type: write
      |      source: v_{{ table }}
      |      write_target: {type: materialized_view, table: "{{ table }}_bronze"}
      |""".stripMargin

  test("reference-shape blueprint + use_blueprint instance expand through the project loader") {
    val root = java.nio.file.Paths.get("/root/reference/Example_Projects/performance_testing")
    assume(java.nio.file.Files.exists(root), "reference examples not present")
    val project = Project.load(root.toString)
    assert(project.blueprints.contains("domain_u_end_to_end"))

    // expand the real blueprint directly with its required parameter
    val bp = Blueprint.parseBlueprintDoc(project.blueprints("domain_u_end_to_end"))
    assert(bp.required == Seq("site_name"))
    val tokens = project.substitutions("dev")
    val fgs = Blueprint.expandBlueprintDoc(bp, Map("site_name" -> "siteX"),
      project.templates, project.presets, tokens, secrets = (_, _) => Some("x"),
      lenient = true)
    assert(fgs.size == 10) // ten flowgroup specs in the blueprint
    assert(fgs.forall(_.flowgroup.endsWith("_siteX")))
    assert(fgs.forall(_.actions.nonEmpty)) // templates expanded into actions

    // missing required parameter is a clear error
    val e = intercept[YamlConfig.ConfigError](
      Blueprint.expandBlueprintDoc(bp, Map.empty, project.templates,
        project.presets, tokens, lenient = true))
    assert(e.msg.contains("site_name"))
  }

  test("missing, non-list, and EMPTY 'instances' all refuse loudly") {
    val body = blueprintYaml.linesIterator
      .dropWhile(!_.startsWith("flowgroup_template")).mkString("\n")
    // missing key
    val eMissing = intercept[YamlConfig.ConfigError](
      Blueprint.parse(s"blueprint: b\n$body"))
    assert(eMissing.msg.contains("instances"))
    // scalar instead of list
    val eScalar = intercept[YamlConfig.ConfigError](
      Blueprint.parse(s"blueprint: b\ninstances: oops\n$body"))
    assert(eScalar.msg.contains("LIST"))
    // explicit empty list — would expand to ZERO flowgroups silently
    val eEmpty = intercept[YamlConfig.ConfigError](
      Blueprint.parse(s"blueprint: b\ninstances: []\n$body"))
    assert(eEmpty.msg.contains("EMPTY"))
  }

  test("blueprint expands one flowgroup per instance") {
    val fgs = Blueprint.expand(Blueprint.parse(blueprintYaml))
    assert(fgs.map(_.flowgroup) == Seq("ingest_customer", "ingest_orders", "ingest_lineitem"))
    assert(fgs.head.actions(1).asInstanceOf[MaterializedViewWrite].table == "customer_bronze")
    fgs.foreach(fg => Planner.validate(fg)) // every expansion is a valid flowgroup
  }

  test("resolution throughput: 600 blueprint flowgroups resolve + plan fast") {
    // The reference's metadata-plane baseline resolves+generates 600
    // blueprint flowgroups in 14.36 s (BASELINE.md, blueprint fixture).
    // Our interpreter has no codegen/file-emission: resolution + planning of
    // 600 expanded flowgroups must come in far under that.
    val many = blueprintYaml.replace(
      """instances:
        |  - {table: customer}
        |  - {table: orders}
        |  - {table: lineitem}""".stripMargin,
      "instances:\n" + (1 to 600).map(i => s"  - {table: t$i}").mkString("\n"))
    val t0 = System.nanoTime()
    val fgs = Blueprint.expand(Blueprint.parse(many))
    fgs.foreach(fg => Planner.plan(fg))
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(fgs.size == 600)
    info(f"600 flowgroups resolved+planned in $elapsedMs%.0f ms")
    assert(elapsedMs < 14360, s"resolution took $elapsedMs ms — should beat the reference baseline")
  }
}
