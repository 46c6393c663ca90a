package graft.exec

import java.nio.file.Files

import graft.SparkSuite
import graft.config.YamlConfig

class PipelineHooksSpec extends SparkSuite {
  import spark.implicits._

  test("hooks fire on table writes, test results, and flowgroup completion") {
    val dir = Files.createTempDirectory("hooks").toString
    val store = new TableStore(spark, s"$dir/wh")
    val rec = new PipelineHooks.Recording
    val runner = new PipelineRunner(spark, store, s"$dir/cp", hooks = rec)
    Seq((1, 5), (2, 7)).toDF("id", "v").createOrReplaceTempView("hooks_src")
    runner.run(YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: hooks_src}
        |    target: v
        |  - name: t
        |    type: test
        |    test_type: range
        |    source: v
        |    config: {column: v, min: "0", max: "6", on_fail: warn}
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: materialized_view, table: hooks_out}
        |""".stripMargin))
    assert(rec.tables.toList == List("hooks_out"))
    assert(rec.tests.toList == List(("t", "range", 1L))) // v=7 out of range
    assert(rec.flowgroups.toList == List(("p.f", true)))
  }
}
