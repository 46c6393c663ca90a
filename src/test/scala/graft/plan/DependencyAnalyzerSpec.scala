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
}
