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

  test("parallel same-generation flowgroups never lose event-log rows") {
    // The orchestrator runs independent flowgroups of one pipeline in
    // PARALLEL; their completions append to the SAME event-log table.
    // Unserialized, Spark's file committer shares one _temporary staging
    // dir per output path and the first job's commit wipes the second's
    // in-flight files — rows vanish or the flowgroup is marked FAILED.
    val dir = Files.createTempDirectory("graft-evpar").toString
    val store = new TableStore(spark, s"$dir/wh")
    val writer = new EventLog.Writer(spark, store)
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("ev_src")
    val fgs = (1 to 4).map { i =>
      YamlConfig.parseFlowGroup(
        s"""pipeline: par
           |flowgroup: f$i
           |actions:
           |  - name: l
           |    type: load
           |    source: {type: table, table: ev_src}
           |    target: v
           |  - name: w
           |    type: write
           |    source: v
           |    write_target: {type: materialized_view, table: par_out$i}
           |""".stripMargin)
    }
    val orch = new PipelineOrchestrator(spark, store, s"$dir/cp",
      maxParallelism = 4, hooks = writer)
    val outcomes = orch.run(fgs)
    assert(outcomes.forall(o => o.error.isEmpty && !o.skipped),
      outcomes.map(o => s"${o.flowgroup}: ${o.error}").mkString("; "))
    val log = store.read("par_event_log")
    val completions = log.filter("event_type = 'flowgroup_complete'")
      .select("flowgroup").as[String].collect().toSet
    assert(completions == (1 to 4).map(i => s"f$i").toSet)
    // every flowgroup's table_written row survived the concurrent appends
    assert(log.filter("event_type = 'table_written'").count() == 4L)
  }

  test("monitoring union is exactly-once: a replayed batch never duplicates rows") {
    val dir = Files.createTempDirectory("graft-monidem").toString
    val store = new TableStore(spark, s"$dir/wh")
    val writer = new EventLog.Writer(spark, store)
    val runner = new PipelineRunner(spark, store, s"$dir/cp", hooks = writer)
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("ev_src")
    runFlowgroup(runner, "bronze", "idem_out")
    def monitor(): Unit = graft.streaming.Monitoring.runPipeline(spark, store,
      Map("bronze" -> "bronze_event_log"), "mon_union", Nil, s"$dir/moncp")
    monitor()
    val n0 = store.read("mon_union").count()
    assert(n0 >= 2L)
    // simulate the crash-replay window: the source batch re-fires from
    // scratch (checkpoint lost after the data landed). foreachBatch is
    // at-least-once — only idempotent per-batch placement keeps the union
    // exactly-once; a blind append would double every row here.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(s"$dir/moncp"))
    monitor()
    assert(store.read("mon_union").count() == n0)
    // partition discovery surfaces the source tag for MV SQL
    assert(store.read("mon_union").columns.contains("_pipeline"))
  }

  test("monitoring MVs land under the monitoring catalog/schema, not the warehouse root") {
    val dir = Files.createTempDirectory("graft-monqual").toString
    val store = new TableStore(spark, s"$dir/wh")
    val writer = new EventLog.Writer(spark, store)
    val runner = new PipelineRunner(spark, store, s"$dir/cp", hooks = writer)
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("ev_src")
    runFlowgroup(runner, "bronze", "qual_out")
    val mvs = Seq(graft.streaming.Monitoring.MvDef("mv_by_level",
      Some("SELECT level, CAST(count(*) AS BIGINT) AS n " +
        "FROM ops_union GROUP BY level"), None))
    graft.streaming.Monitoring.runPipeline(spark, store,
      Map("bronze" -> "bronze_event_log"), "ops.obs.ops_union", mvs,
      s"$dir/moncp", qualify = t => if (t.contains(".")) t else s"ops.obs.$t")
    assert(store.exists("ops.obs.mv_by_level"))
    assert(!store.exists("mv_by_level"))
    assert(store.read("ops.obs.mv_by_level").columns.toSet == Set("level", "n"))
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

  test("typo'd manifest booleans fail loudly with block and key named") {
    val root = Files.createTempDirectory("graft-badbool")
    Files.writeString(root.resolve("lhp.yaml"),
      """name: bad_proj
        |event_log:
        |  enabled: maybe
        |""".stripMargin)
    val e = intercept[YamlConfig.ConfigError](Project.load(root.toString))
    assert(e.msg.contains("event_log.enabled") && e.msg.contains("maybe"), e.msg)
    Files.writeString(root.resolve("lhp.yaml"),
      """name: bad_proj
        |uc_tagging:
        |  remove_undeclared_tags: yep
        |""".stripMargin)
    val e2 = intercept[YamlConfig.ConfigError](Project.load(root.toString))
    assert(e2.msg.contains("uc_tagging.remove_undeclared_tags"), e2.msg)
  }
}
