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
  }
}
