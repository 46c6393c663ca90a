package graft.plan

import graft.SparkSuite
import graft.model._

class DependencyAnalyzerSpec extends SparkSuite {

  test("tablesInSql extracts refs via Catalyst, including CTEs and stream()") {
    val sql =
      """WITH x AS (SELECT * FROM bronze_tbl)
        |SELECT a.*, b.v FROM x a JOIN stream(silver_tbl) b ON a.id = b.id""".stripMargin
    val tables = DependencyAnalyzer.tablesInSql(spark, sql).toSet
    assert(tables == Set("bronze_tbl", "silver_tbl"))
  }

  test("stream() wrappers strip and report") {
    assert(StreamRef.streamedViews("SELECT * FROM stream(v1) JOIN stream(`v2`)") == Seq("v1", "v2"))
    assert(StreamRef.strip("SELECT * FROM stream(v1)") == "SELECT * FROM v1")
  }

  private def fg(pipeline: String, name: String, reads: Seq[String], writes: String) =
    FlowGroup(pipeline, name, actions =
      reads.zipWithIndex.map { case (r, i) =>
        TableLoad(s"l$i", Some(s"v$i"), r): Action
      } :+ (MaterializedViewWrite("w", Some("v0"), writes): Action))

  test("flowgroup graph orders generations by produced tables") {
    val fgs = Seq(
      fg("p1", "bronze", Seq("landing"), "bronze_t"),
      fg("p1", "silver", Seq("bronze_t"), "silver_t"),
      fg("p2", "gold", Seq("silver_t"), "gold_t"))
    val g = DependencyAnalyzer.flowgroupGraph(spark, fgs)
    assert(g.generations == Seq(Seq("p1.bronze"), Seq("p1.silver"), Seq("p2.gold")))
    val pg = DependencyAnalyzer.pipelineGraph(spark, fgs)
    assert(pg.generations == Seq(Seq("p1"), Seq("p2")))
  }

  test("independent flowgroups land in the same generation") {
    val fgs = Seq(
      fg("p", "a", Seq("ext1"), "t_a"),
      fg("p", "b", Seq("ext2"), "t_b"),
      fg("p", "c", Seq("t_a", "t_b"), "t_c"))
    val g = DependencyAnalyzer.flowgroupGraph(spark, fgs)
    assert(g.generations == Seq(Seq("p.a", "p.b"), Seq("p.c")))
  }

  test("dependency graph exports DOT and generation text") {
    val fgs = Seq(
      fg("p", "a", Seq("ext"), "t_a"),
      fg("p", "b", Seq("t_a"), "t_b"))
    val g = DependencyAnalyzer.flowgroupGraph(spark, fgs)
    val dot = graft.tools.Dependencies.toDot("flowgroups", g)
    assert(dot.startsWith("digraph \"flowgroups\" {"))
    assert(dot.contains("\"p.a\" -> \"p.b\";")) // data-flow direction
    assert(graft.tools.Dependencies.toText(g) ==
      "generation 0: p.a\ngeneration 1: p.b")
  }

  test("JSON export mirrors the reference dag shape (pipelines, stages, externals)") {
    val fgs = Seq(
      fg("bronze", "a", Seq("landing_ext"), "t_a"),
      fg("bronze", "b", Seq("other_ext"), "t_b"),
      fg("gold", "c", Seq("t_a", "t_b"), "t_c"))
    val json = graft.tools.Dependencies.toJson(spark, fgs)
    // structurally valid + reference keys present (parsed, not substring-d)
    val parsed = new org.yaml.snakeyaml.Yaml().load[java.util.Map[String, Any]](json)
    val meta = parsed.get("metadata").asInstanceOf[java.util.Map[String, Any]]
    assert(meta.get("total_pipelines") == 2)
    assert(meta.get("total_stages") == 2)
    assert(meta.get("has_circular_dependencies") == false)
    assert(meta.get("total_external_sources") == 2)
    val pipelines = parsed.get("pipelines").asInstanceOf[java.util.Map[String, Any]]
    val goldDep = pipelines.get("gold").asInstanceOf[java.util.Map[String, Any]]
    assert(goldDep.get("depends_on").asInstanceOf[java.util.List[_]]
      .contains("bronze"))
    assert(goldDep.get("stage") == 1)
    assert(goldDep.get("flowgroup_count") == 1)
    val bronzeDep = pipelines.get("bronze").asInstanceOf[java.util.Map[String, Any]]
    assert(bronzeDep.get("external_sources").asInstanceOf[java.util.List[_]]
      .containsAll(java.util.List.of("landing_ext", "other_ext")))
    assert(parsed.get("execution_stages").asInstanceOf[java.util.List[_]].size == 2)
  }
}
