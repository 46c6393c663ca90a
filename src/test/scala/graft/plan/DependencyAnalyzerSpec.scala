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

  test("cross-flowgroup fan-in edges the consumer to EVERY producer") {
    // fgs a (gen 1, depends on d's table) and b (gen 0) BOTH write t_fan;
    // c reads t_fan. A last-wins producers map kept only one edge, so c
    // could schedule concurrently with the other writer and read a
    // mid-commit table.
    val fgs = Seq(
      fg("p", "d", Seq("ext"), "t_d"),
      fg("p", "a", Seq("t_d"), "t_fan"),
      fg("p", "b", Seq("ext2"), "t_fan"),
      fg("p", "c", Seq("t_fan"), "t_c"))
    val g = DependencyAnalyzer.flowgroupGraph(spark, fgs)
    assert(g.edges("p.c") == Set("p.a", "p.b"), g.edges.toString)
    assert(g.generations == Seq(Seq("p.b", "p.d"), Seq("p.a"), Seq("p.c")))
  }

  test("leaf-name consumption resolves to the qualified producer when unambiguous") {
    // fg s writes 'silver.events'; fg r reads 'events' — legal at runtime
    // (registerAll registers leaf-name views), so the scheduler must see
    // the edge; pre-fix r could run in the same generation as its writer
    val fgs = Seq(
      fg("p", "s", Seq("ext"), "silver.events"),
      fg("p", "r", Seq("events"), "t_r"))
    val g = DependencyAnalyzer.flowgroupGraph(spark, fgs)
    assert(g.edges("p.r") == Set("p.s"), g.edges.toString)
    // AMBIGUOUS leaf (two qualified tables share it): no edge is guessed
    val amb = Seq(
      fg("p", "s1", Seq("ext"), "silver.events"),
      fg("p", "s2", Seq("ext"), "gold.events"),
      fg("p", "r", Seq("events"), "t_r"))
    val g2 = DependencyAnalyzer.flowgroupGraph(spark, amb)
    assert(g2.edges("p.r") == Set.empty, g2.edges.toString)
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
    // stable warnings contract: key always present, empty when clean
    assert(parsed.get("warnings").asInstanceOf[java.util.List[_]].isEmpty)
    assert(meta.get("total_warnings") == 0)
  }

  test("unparseable SQL yields a DEP-003 advisory instead of silent edge loss") {
    val broken = FlowGroup("p", "bad", actions = Seq(
      SqlTransform("t1", target = Some("v_out"), source = Seq("v_in"),
        sql = "SELEKT * FORM upstream_tbl"),
      MaterializedViewWrite("w", Some("v_out"), "out_t")))
    val ok = fg("p", "good", Seq("ext"), "t_ok")
    val warnings = DependencyAnalyzer.extractionWarnings(spark, Seq(broken, ok))
    assert(warnings.size == 1)
    val w = warnings.head
    assert(w.code == "LHP-DEP-003")
    assert(w.flowgroup == "p.bad" && w.action == "t1")
    assert(w.message.contains("Could not parse SQL"))
    assert(w.suggestion.contains("depends_on"))
    // extraction itself still contributes zero edges for the broken SQL
    // (warning-only — analysis proceeds, matching the reference)
    assert(DependencyAnalyzer.tablesInSql(spark, "SELEKT * FORM upstream_tbl").isEmpty)
    // and the JSON export carries the advisory
    val json = graft.tools.Dependencies.toJson(spark, Seq(broken, ok))
    val parsed = new org.yaml.snakeyaml.Yaml().load[java.util.Map[String, Any]](json)
    val ws = parsed.get("warnings").asInstanceOf[java.util.List[java.util.Map[String, Any]]]
    assert(ws.size == 1 && ws.get(0).get("action") == "t1")
    assert(parsed.get("metadata").asInstanceOf[java.util.Map[String, Any]]
      .get("total_warnings") == 1)
  }

  test("depends_on suppresses the action's parse advisories") {
    val covered = FlowGroup("p", "covered", actions = Seq(
      SqlTransform("t1", target = Some("v_out"), source = Seq("v_in"),
        sql = "SELEKT * FORM upstream_tbl", dependsOn = Seq("upstream_tbl")),
      MaterializedViewWrite("w", Some("v_out"), "out_t")))
    assert(DependencyAnalyzer.extractionWarnings(spark, Seq(covered)).isEmpty)
  }

  test("trust-depends-on makes depends_on authoritative, not additive") {
    // SQL references parsed_tbl; depends_on declares declared_tbl
    val a = SqlTransform("t", target = Some("v"), source = Seq("v_in"),
      sql = "SELECT * FROM parsed_tbl", dependsOn = Seq("declared_tbl"))
    // default mode: union of parsed + declared
    assert(DependencyAnalyzer.actionInputs(spark, a).toSet ==
      Set("v_in", "parsed_tbl", "declared_tbl"))
    // trust mode: body extraction skipped — declared source + depends_on only
    assert(DependencyAnalyzer.actionInputs(spark, a, trustDependsOn = true).toSet ==
      Set("v_in", "declared_tbl"))
    // an action WITHOUT depends_on still extracts in trust mode
    val plain = SqlTransform("t2", target = Some("v2"), source = Nil,
      sql = "SELECT * FROM parsed_tbl")
    assert(DependencyAnalyzer.actionInputs(spark, plain, trustDependsOn = true) ==
      Seq("parsed_tbl"))
  }

  test("incremental_join MV: joined_sql's fact and dims are dependency edges; the companion is not") {
    // the REAL upstream (streamed fact + dims) lives in joined_sql; the
    // aggregation sql sees only the engine-managed __joined companion,
    // which is this MV's own artifact — without joined_sql extraction the
    // gold flowgroup could be generation-ordered before the fact write
    val mv = MaterializedViewWrite("mv", None, "rev_mv",
      sql = Some("SELECT r, sum(x) AS t FROM rev_mv__joined GROUP BY r"),
      incrementalJoin = true,
      joinedSql = Some(
        "SELECT f.x, d.r FROM stream(fact_t) f JOIN dim_t d ON f.k = d.k"))
    assert(DependencyAnalyzer.actionInputs(spark, mv).toSet ==
      Set("fact_t", "dim_t"))
  }
}
