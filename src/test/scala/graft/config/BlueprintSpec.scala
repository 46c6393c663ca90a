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

  test("blueprint expands one flowgroup per instance") {
    val fgs = Blueprint.expand(Blueprint.parse(blueprintYaml))
    assert(fgs.map(_.flowgroup) == Seq("ingest_customer", "ingest_orders", "ingest_lineitem"))
    assert(fgs.head.actions(1).asInstanceOf[MaterializedViewWrite].table == "customer_bronze")
    fgs.foreach(Planner.validate) // every expansion is a valid flowgroup
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
