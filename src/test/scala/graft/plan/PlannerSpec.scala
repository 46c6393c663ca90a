package graft.plan

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Table-name edge resolution in the planner (round-4 ADVICE): the bare last
  * segment of a qualified write target binds only when it is UNAMBIGUOUS —
  * `a.events` and `b.events` both claiming `events` would fabricate
  * dependency edges (and potential false cycles) for any consumer of either
  * short name. A consumer that does read an ambiguous short name is a loud
  * PlanError, not a guess. */
class PlannerSpec extends AnyFunSuite {

  private def write(name: String, table: String): Action =
    StreamingTableWrite(name, source = "v_src", table = table)
  private def reader(name: String, from: String): Action =
    SqlTransform(name, Some(s"v_$name"), Seq(from), "SELECT 1")

  test("bare segment of a qualified table binds when unambiguous") {
    val deps = Planner.dependencies(Seq(write("w_a", "a.events"), reader("t", "events")))
    assert(deps("t") == Set("w_a"))
  }

  test("same-named tables in different schemas do not alias under the short name") {
    val actions = Seq(write("w_a", "a.events"), write("w_b", "b.events"),
      reader("t", "a.events"))
    val deps = Planner.dependencies(actions)
    // qualified reference resolves exactly; no fabricated edge to w_b
    assert(deps("t") == Set("w_a"))
    assert(deps("w_b") == Set.empty)
  }

  test("consuming an ambiguous short name is a loud PlanError") {
    val actions = Seq(write("w_a", "a.events"), write("w_b", "b.events"),
      reader("t", "events"))
    val e = intercept[Planner.PlanError] { Planner.dependencies(actions) }
    assert(e.getMessage.contains("events"))
    assert(e.getMessage.contains("a.events") && e.getMessage.contains("b.events"))
  }

  test("fan-in to one qualified table keeps every write as a short-name edge") {
    val actions = Seq(write("w_1", "a.events"), write("w_2", "a.events"),
      reader("t", "events"))
    assert(Planner.dependencies(actions)("t") == Set("w_1", "w_2"))
  }

  test("a write target whose name is itself unqualified still binds") {
    val deps = Planner.dependencies(Seq(write("w", "events"), reader("t", "events")))
    assert(deps("t") == Set("w"))
  }

  test("test-only flowgroups validate; sql_path MVs are self-contained") {
    // tests and nothing else — a valid DQ pipeline in the reference
    // (dependency_resolver.py: "Test-only flowgroups are allowed")
    Planner.validate(FlowGroup("p", "dq_only", actions = Seq(
      TestAction("t_unique", "uniqueness", Seq("cat.bronze.orders"),
        Map("columns" -> java.util.List.of("order_id"))))))
    // an empty flowgroup is still invalid
    intercept[Planner.PlanError](Planner.validate(FlowGroup("p", "empty")))
    // a transform without tests still needs a write
    intercept[Planner.PlanError](Planner.validate(FlowGroup("p", "tf", actions = Seq(
      SqlTransform("t", Some("v_t"), Seq("x"), "SELECT 1")))))
    // a sql_path-only materialized view needs no load (the reference's
    // _is_self_contained_materialized_view accepts sql OR sql_path)
    Planner.validate(FlowGroup("p", "gold", actions = Seq(
      MaterializedViewWrite("mv", source = None, table = "gold.sales",
        sql = None, sqlPath = Some("sql/sales.sql")))))
  }

  test("two sinks sharing a sink identity are a loud PlanError") {
    // shared identity = shared streaming checkpoint: the second sink would
    // silently resume from the first's offsets and drop its own data
    val load = SqlLoad("l", Some("v_src"), "SELECT 1 AS k")
    def sink(name: String, sinkName: Option[String]) =
      SinkWrite(name, "v_src", "files", sinkName = sinkName)
    val e = intercept[Planner.PlanError](Planner.validate(FlowGroup(
      "p", "f", actions = Seq(load, sink("s1", Some("out")), sink("s2", Some("out"))))))
    assert(e.getMessage.contains("out"))
    // distinct identities (explicit or defaulted to action name) are fine
    Planner.validate(FlowGroup("p", "f",
      actions = Seq(load, sink("s1", Some("out")), sink("s2", None))))
  }

  test("duplicate action names and duplicate targets refuse instead of silently dropping one") {
    // every plan map keys by name/target — a duplicate collapsed last-wins
    // and one action NEVER RAN with no error (reference:
    // config_validator.py:94-103 refuses both)
    val dupName = FlowGroup("p", "f", actions = Seq(
      SqlTransform("t", Some("v_a"), Seq("src"), "SELECT 1"),
      SqlTransform("t", Some("v_b"), Seq("src"), "SELECT 2"),
      write("w", "out"), reader("r", "v_a"),
      StreamingTableWrite("w2", source = "v_b", table = "out2"),
      StreamingTableWrite("w3", source = "v_r", table = "out3")))
    val e1 = intercept[Planner.PlanError] { Planner.validate(dupName) }
    assert(e1.getMessage.contains("duplicate action name"), e1.getMessage)
    val dupTarget = FlowGroup("p", "f", actions = Seq(
      SqlTransform("t1", Some("v_a"), Seq("src"), "SELECT 1"),
      SqlTransform("t2", Some("v_a"), Seq("src"), "SELECT 2"),
      StreamingTableWrite("w", source = "v_a", table = "out")))
    val e2 = intercept[Planner.PlanError] { Planner.validate(dupTarget) }
    assert(e2.getMessage.contains("duplicate target"), e2.getMessage)
  }
}
