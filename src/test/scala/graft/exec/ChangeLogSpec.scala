package graft.exec

import java.nio.file.Files

import graft.SparkSuite
import graft.config.YamlConfig

class ChangeLogSpec extends SparkSuite {
  import spark.implicits._

  test("change_log maintains a CDF-style __changes companion table") {
    val dir = Files.createTempDirectory("graft-cdf").toString
    val store = new TableStore(spark, s"$dir/wh")
    val runner = new PipelineRunner(spark, store, s"$dir/cp")
    def yamlFor(view: String) =
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    source: {type: table, table: $view}
         |    target: v
         |  - name: w
         |    type: write
         |    source: v
         |    write_target: {type: streaming_table, table: cdf_dim, change_log: true}
         |    cdc_config: {keys: [id], sequence_by: seq, scd_type: 1, apply_as_deletes: "op = 'D'"}
         |""".stripMargin

    Seq((1, 1L, "a", "U"), (2, 1L, "b", "U")).toDF("id", "seq", "v", "op")
      .createOrReplaceTempView("cdf_b1")
    runner.run(YamlConfig.parseFlowGroup(yamlFor("cdf_b1")))
    Seq((1, 2L, "a2", "U"), (2, 2L, "b", "D")).toDF("id", "seq", "v", "op")
      .createOrReplaceTempView("cdf_b2")
    runner.run(YamlConfig.parseFlowGroup(yamlFor("cdf_b2")))

    // current state: id=1 updated, id=2 deleted
    assert(store.read("cdf_dim").select("id", "v").as[(Int, String)].collect().toSet
      == Set((1, "a2")))
    // change feed: 2 commits, 4 change rows, delete marked
    val changes = store.read("cdf_dim__changes")
    assert(changes.count() == 4)
    assert(changes.select("_commit_version").distinct().as[Long].collect().toSet == Set(0L, 1L))
    assert(changes.filter("_change_type = 'delete'")
      .select("id").as[Int].collect().toSeq == Seq(2))

    // bounded CDF read back through the YAML surface: a delta load with
    // readChangeFeed + version window reads exactly commit 1's rows
    val reader = new PipelineRunner(spark, store, s"$dir/cp2")
    reader.execute(YamlConfig.parseFlowGroup(
      s"""pipeline: p2
         |flowgroup: f2
         |actions:
         |  - name: l
         |    type: load
         |    source: {type: delta, table: cdf_dim,
         |             options: {readChangeFeed: "true",
         |                       startingVersion: "1", endingVersion: "1"}}
         |    target: window
         |""".stripMargin).actions.head)
    val window = reader.view("window")
    assert(window.select("_commit_version").distinct().as[Long].collect().toSeq == Seq(1L))
    assert(window.select("id", "_change_type").as[(Int, String)].collect().toSet
      == Set((1, "upsert"), (2, "delete")))
  }
}
