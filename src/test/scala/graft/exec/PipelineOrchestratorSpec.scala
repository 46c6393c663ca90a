package graft.exec

import java.nio.file.Files

import graft.SparkSuite
import graft.config.YamlConfig

class PipelineOrchestratorSpec extends SparkSuite {
  import spark.implicits._

  test("orchestrator runs flowgroups in dependency order, parallel within generation") {
    val dir = Files.createTempDirectory("graft-orch").toString
    val store = new TableStore(spark, s"$dir/warehouse")
    Seq((1, "a"), (2, "b")).toDF("id", "v").createOrReplaceTempView("orch_src")

    val bronze = YamlConfig.parseFlowGroup(
      """pipeline: p1
        |flowgroup: bronze
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: orch_src}
        |    target: v
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: materialized_view, table: orch_bronze}
        |""".stripMargin)
    val silver = YamlConfig.parseFlowGroup(
      """pipeline: p1
        |flowgroup: silver
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: orch_bronze}
        |    target: v
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: materialized_view, table: orch_silver}
        |""".stripMargin)
    // submit out of order: orchestrator must run bronze first
    val orch = new PipelineOrchestrator(spark, store, s"$dir/cp", maxParallelism = 2)
    val outcomes = orch.run(Seq(silver, bronze))
    assert(outcomes.forall(_.error.isEmpty), outcomes.flatMap(_.error.map(_.getMessage)))
    assert(store.read("orch_silver").count() == 2)
    assert(outcomes.filterNot(_.skipped).forall(_.durationMs >= 0))
  }

  test("full refresh with cross-flowgroup fan-in keeps both flows' output") {
    val dir = Files.createTempDirectory("graft-orch-fr").toString
    val store = new TableStore(spark, s"$dir/warehouse")
    Seq(1).toDF("x").createOrReplaceTempView("fan_a_src")
    Seq(2).toDF("x").createOrReplaceTempView("fan_b_src")
    def fanFg(name: String, src: String) = YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: $name
         |actions:
         |  - name: l
         |    type: load
         |    source: {type: table, table: $src}
         |    target: v_$name
         |  - name: w
         |    type: write
         |    source: v_$name
         |    write_target: {type: streaming_table, table: fan_target}
         |""".stripMargin)
    val fgs = Seq(fanFg("fa", "fan_a_src"), fanFg("fb", "fan_b_src"))
    val orch0 = new PipelineOrchestrator(spark, store, s"$dir/cp", maxParallelism = 1)
    orch0.run(fgs)
    assert(store.read("fan_target").as[Int].collect().toSet == Set(1, 2))
    // full refresh must rebuild BOTH flows' rows, not just the last one's
    val orch1 = new PipelineOrchestrator(spark, store, s"$dir/cp", maxParallelism = 1,
      fullRefresh = Set("*"))
    orch1.run(fgs)
    assert(store.read("fan_target").as[Int].collect().toSet == Set(1, 2))
  }

  test("failed flowgroup skips its transitive dependents; independents still run") {
    val dir = Files.createTempDirectory("graft-orch-skip").toString
    val store = new TableStore(spark, s"$dir/warehouse")
    Seq(1).toDF("x").createOrReplaceTempView("ok_src")
    def fgYaml(pipeline: String, flowgroup: String, srcTable: String, outTable: String) =
      YamlConfig.parseFlowGroup(
        s"""pipeline: $pipeline
           |flowgroup: $flowgroup
           |actions:
           |  - name: l
           |    type: load
           |    source: {type: table, table: $srcTable}
           |    target: v_$flowgroup
           |  - name: w
           |    type: write
           |    source: v_$flowgroup
           |    write_target: {type: materialized_view, table: $outTable}
           |""".stripMargin)
    val broken = fgYaml("p", "broken", "no_such_table_anywhere", "t_broken")
    val dependent = fgYaml("p", "dependent", "t_broken", "t_dep")
    val grandchild = fgYaml("p", "grandchild", "t_dep", "t_grand")
    val independent = fgYaml("p", "independent", "ok_src", "t_ok")

    val rec = new PipelineHooks.Recording
    val orch = new PipelineOrchestrator(spark, store, s"$dir/cp",
      maxParallelism = 2, hooks = rec)
    val byName = orch.run(Seq(dependent, grandchild, broken, independent))
      .map(o => o.flowgroup -> o).toMap
    assert(byName("p.broken").error.isDefined && !byName("p.broken").skipped)
    assert(byName("p.dependent").skipped)
    assert(byName("p.grandchild").skipped) // transitive
    assert(byName("p.independent").error.isEmpty && !byName("p.independent").skipped)
    assert(store.read("t_ok").count() == 1)
    // SKIPPED flowgroups fire the completion hook too (as failures, with
    // the skip reason): monitoring must be able to tell "skipped on
    // upstream failure" from "never scheduled"
    val fgHook = rec.flowgroups.toMap
    assert(fgHook.get("p.dependent").contains(false), fgHook.toString)
    assert(fgHook.get("p.grandchild").contains(false), fgHook.toString)
    assert(fgHook.get("p.independent").contains(true), fgHook.toString)
  }

  test("orchestrated full refresh fires runner-side refresh behaviors with ONE runId") {
    // the orchestrator drops tables up front (once, fan-in-safe) AND the
    // runners receive the refresh set for the behaviors beyond dropping;
    // all flowgroups in one orchestrated run share one _pipeline_run_id
    val dir = Files.createTempDirectory("graft-orch-fr").toString
    val store = new TableStore(spark, s"$dir/warehouse")
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("fr_src")
    def fgYaml(flowgroup: String, outTable: String) =
      YamlConfig.parseFlowGroup(
        s"""pipeline: p
           |flowgroup: $flowgroup
           |operational_metadata: true
           |actions:
           |  - name: l
           |    type: load
           |    source: {type: table, table: fr_src}
           |    target: v_$flowgroup
           |  - name: w
           |    type: write
           |    source: v_$flowgroup
           |    write_target: {type: materialized_view, table: $outTable}
           |""".stripMargin)
    val orch = new PipelineOrchestrator(spark, store, s"$dir/cp",
      maxParallelism = 2, fullRefresh = Set("*"))
    val outs = orch.run(Seq(fgYaml("a", "fr_a"), fgYaml("b", "fr_b")))
    assert(outs.forall(_.error.isEmpty), outs.toString)
    assert(store.read("fr_a").count() == 1 && store.read("fr_b").count() == 1)
    // one runId for the whole orchestrated run — per-runner random UUIDs
    // made _pipeline_run_id useless for correlating a run's outputs
    val ids = store.read("fr_a").select("_pipeline_run_id").as[String].collect() ++
      store.read("fr_b").select("_pipeline_run_id").as[String].collect()
    assert(ids.distinct.length == 1, ids.mkString(", "))
  }
}
