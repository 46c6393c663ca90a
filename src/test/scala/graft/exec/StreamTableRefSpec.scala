package graft.exec

import java.nio.file.Files

import graft.SparkSuite
import graft.config.YamlConfig

/** `stream(table)` over engine-managed append-only tables reads
  * INCREMENTALLY across runs (round-3 verdict "What's missing #4"): the
  * table name is overlaid with a checkpointed file stream, so a re-run
  * appends only new data instead of re-reading the whole table. */
class StreamTableRefSpec extends SparkSuite {
  import spark.implicits._

  test("two runs of stream(table) into an append target produce no duplicates") {
    val dir = Files.createTempDirectory("graft-st").toString
    val store = new TableStore(spark, s"$dir/warehouse")
    val runner = new PipelineRunner(spark, store, s"$dir/checkpoints")
    val landing = s"$dir/landing"
    Seq((1, "a"), (2, "b")).toDF("id", "v").write.json(landing)
    val yaml =
      s"""pipeline: p
         |flowgroup: fg
         |actions:
         |  - name: load_raw
         |    type: load
         |    source: {type: cloudfiles, path: $landing, format: json, readMode: stream,
         |             table_schema: "id BIGINT, v STRING"}
         |    target: v_raw
         |  - name: write_bronze
         |    type: write
         |    source: v_raw
         |    write_target: {type: streaming_table, table: bronze}
         |  - name: load_bronze_stream
         |    type: load
         |    source: {type: sql, sql: "SELECT id, upper(v) AS vu FROM stream(bronze)"}
         |    target: v_silver
         |  - name: write_silver
         |    type: write
         |    source: v_silver
         |    write_target: {type: streaming_table, table: silver}
         |""".stripMargin
    runner.run(YamlConfig.parseFlowGroup(yaml))
    assert(store.read("silver").count() == 2)
    // new file lands; second run must append ONLY the new row downstream
    Seq((3, "c")).toDF("id", "v").write.mode("append").json(landing)
    runner.run(YamlConfig.parseFlowGroup(yaml))
    val out = store.read("silver")
    assert(out.count() == 3, "re-run duplicated historical rows")
    assert(out.select("vu").as[String].collect().sorted.toSeq == Seq("A", "B", "C"))
    // and the bronze batch view is restored for batch consumers
    assert(!spark.table("bronze").isStreaming)
  }

  test("stream(x) over a rewritten table falls back to batch with a warning") {
    val dir = Files.createTempDirectory("graft-st2").toString
    val store = new TableStore(spark, s"$dir/warehouse")
    val runner = new PipelineRunner(spark, store, s"$dir/checkpoints")
    // a CDC target is merge-rewritten
    store.overwrite("dim", Seq((1, "x")).toDF("id", "v"))
    store.setMeta("dim", "rewritten", "true")
    store.read("dim").createOrReplaceTempView("dim")
    val yaml =
      s"""pipeline: p
         |flowgroup: fg
         |actions:
         |  - name: load_dim
         |    type: load
         |    source: {type: sql, sql: "SELECT * FROM stream(dim)"}
         |    target: v_dim
         |  - name: write_out
         |    type: write
         |    source: v_dim
         |    write_target: {type: materialized_view, table: out_mv}
         |""".stripMargin
    runner.run(YamlConfig.parseFlowGroup(yaml))
    assert(store.read("out_mv").count() == 1)
  }
}
