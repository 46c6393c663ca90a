package graft.exec

import java.nio.file.Files

import graft.SparkSuite
import graft.config.{Project, YamlConfig}

/** Engine-written event logs + the monitoring pipeline over them: the
  * runtime of the reference's `event_log:` / `monitoring:` project blocks. */
class EventLogSpec extends SparkSuite {
  import spark.implicits._

  private def runFlowgroup(runner: PipelineRunner, pipeline: String,
      table: String): Unit = {
    runner.run(YamlConfig.parseFlowGroup(
      s"""pipeline: $pipeline
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    source: {type: table, table: ev_src}
         |    target: v
         |  - name: t
         |    type: test
         |    test_type: completeness
         |    source: v
         |    required_columns: [id]
         |    on_violation: warn
         |  - name: w
         |    type: write
         |    source: v
         |    write_target: {type: materialized_view, table: $table}
         |""".stripMargin))
  }

  test("Writer flushes one batch per flowgroup with typed event rows") {
    val dir = Files.createTempDirectory("graft-evlog").toString
    val store = new TableStore(spark, s"$dir/wh")
    val writer = new EventLog.Writer(spark, store, qualifier = Some("ops"),
      prefix = "pre_", suffix = "_sfx")
    assert(writer.tableFor("sales") == "ops.pre_sales_event_log_sfx")
    val runner = new PipelineRunner(spark, store, s"$dir/cp", hooks = writer)
    Seq((1, "a"), (2, null: String)).toDF("id", "v").createOrReplaceTempView("ev_src")
    runFlowgroup(runner, "sales", "ev_out")

    val log = store.read("ops.pre_sales_event_log_sfx")
    assert(log.columns.toSet == Set("timestamp", "pipeline", "flowgroup",
      "level", "event_type", "message", "details"))
    val byType = log.select("event_type", "level")
      .as[(String, String)].collect().toMap
    assert(byType("table_written") == "INFO")
    assert(byType("test_result") == "INFO") // zero violations
    assert(byType("flowgroup_complete") == "INFO")
    // a failing flowgroup logs an ERROR completion (still one batch)
    intercept[Exception](runner.run(YamlConfig.parseFlowGroup(
      """pipeline: sales
        |flowgroup: broken
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: no_such_table_anywhere}
        |    target: v
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: materialized_view, table: x}
        |""".stripMargin)))
    val errRow = store.read("ops.pre_sales_event_log_sfx")
      .filter("flowgroup = 'broken' AND event_type = 'flowgroup_complete'")
      .select("level").as[String].collect().toSeq
    assert(errRow == Seq("ERROR"))
  }

  test("monitoring pipeline: incremental union + MV refresh over event logs") {
    val dir = Files.createTempDirectory("graft-mon").toString
    val store = new TableStore(spark, s"$dir/wh")
    val writer = new EventLog.Writer(spark, store)
    val junit = new PipelineHooks.Recording
    // Composite fans out to both implementations
    val runner = new PipelineRunner(spark, store, s"$dir/cp",
      hooks = new EventLog.Composite(junit, writer))
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("ev_src")
    runFlowgroup(runner, "bronze", "mon_out1")
    runFlowgroup(runner, "gold", "mon_out2")
    assert(junit.tables.nonEmpty) // composite delivered to the second hook

    val mvs = Seq(graft.streaming.Monitoring.MvDef("mon_events_by_pipeline",
      Some("SELECT pipeline, CAST(count(*) AS BIGINT) AS n " +
        "FROM all_pipelines_event_log GROUP BY pipeline"), None))
    def monitor(): Unit = graft.streaming.Monitoring.runPipeline(spark, store,
      Map("bronze" -> "bronze_event_log", "gold" -> "gold_event_log",
        "never_ran" -> "never_ran_event_log"), // missing log: skipped
      "all_pipelines_event_log", mvs, s"$dir/moncp")
    monitor()
    val counts = store.read("mon_events_by_pipeline")
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("bronze", "gold"))
    assert(counts.values.forall(_ >= 2L)) // table_written + test + complete

    // INCREMENTAL: a new flowgroup run adds events; re-monitoring unions
    // only the new files (checkpointed) and the MV reflects the new total
    runFlowgroup(runner, "bronze", "mon_out3")
    monitor()
    val counts2 = store.read("mon_events_by_pipeline")
      .as[(String, Long)].collect().toMap
    assert(counts2("bronze") > counts("bronze"))
    assert(counts2("gold") == counts("gold"))
  }

  test("Project parses event_log and monitoring blocks; sandbox excludes monitoring") {
    val root = Files.createTempDirectory("graft-moncfg")
    Files.writeString(root.resolve("lhp.yaml"),
      """name: obs_proj
        |event_log:
        |  catalog: ops
        |  name_prefix: "lhp_"
        |monitoring:
        |  streaming_table: all_logs
        |  materialized_views:
        |    - {name: mv_errors, sql: "SELECT * FROM all_logs WHERE level = 'ERROR'"}
        |""".stripMargin)
    val p = Project.load(root.toString)
    assert(p.eventLog.get.qualifier.contains("ops"))
    assert(p.eventLogTable("sales") == "ops.lhp_sales_event_log")
    assert(p.monitoringPipelineName.contains("obs_proj_event_log_monitoring"))
    val mon = p.monitoring.get
    assert(mon.streamingTable == "all_logs" &&
      mon.materializedViews.map(_.name) == Seq("mv_errors"))
    // the monitoring pipeline can never be sandboxed (exact naming is loud)
    val e = intercept[YamlConfig.ConfigError](graft.config.Sandbox.resolveRun(
      None, graft.config.Sandbox.Profile("alice",
        Seq("obs_proj_event_log_monitoring")),
      "dev", Seq("bronze", "obs_proj_event_log_monitoring"),
      p.monitoringPipelineName))
    assert(e.msg.contains("monitoring"), e.msg)
  }
}
