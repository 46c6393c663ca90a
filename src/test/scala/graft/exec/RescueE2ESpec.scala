package graft.exec

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.config.YamlConfig
import graft.operators.Quarantine

/** Composition E2E for the round-4 surface: a bronze ingest with schema
  * evolution + rescued data + quarantine, the DLQ repair/recycle cycle on
  * the raw payload, and an SCD1 silver fed by `stream(bronze)` — proving
  * the new pieces compose, not just pass their unit specs. */
class RescueE2ESpec extends SparkSuite {
  import spark.implicits._

  test("rescue -> quarantine -> repair -> recycle -> incremental silver") {
    val dir = Files.createTempDirectory("graft-re2e").toString
    val store = new TableStore(spark, s"$dir/warehouse")
    val runner = new PipelineRunner(spark, store, s"$dir/checkpoints")
    val landing = s"$dir/landing"
    new java.io.File(landing).mkdirs()

    Files.write(Paths.get(landing, "batch1.json"),
      """{"user_id": 1, "seq": 1, "city": "NY"}
        |{"user_id": "broken", "seq": 1, "city": "SF"}
        |{"user_id": 3, "seq": 1, "city": "LA"}
        |""".stripMargin.getBytes)

    val yaml =
      s"""pipeline: p
         |flowgroup: fg
         |actions:
         |  - name: load_raw
         |    type: load
         |    source:
         |      type: cloudfiles
         |      path: $landing
         |      format: json
         |      readMode: stream
         |      table_schema: "user_id BIGINT, seq BIGINT, city STRING"
         |      options:
         |        cloudFiles.rescuedDataColumn: _rescued_data
         |    target: v_raw
         |  - name: dq
         |    type: transform
         |    transform_type: data_quality
         |    source: v_raw
         |    target: v_clean
         |    expectations:
         |      - {name: parsed, expression: "_rescued_data IS NULL", failureAction: fail}
         |      - {name: has_key, expression: "user_id IS NOT NULL", failureAction: fail}
         |    quarantine: {table: dlq}
         |  - name: write_bronze
         |    type: write
         |    source: v_clean
         |    write_target: {type: streaming_table, table: bronze}
         |  - name: load_bronze
         |    type: load
         |    source: {type: sql, sql: "SELECT user_id, seq, city FROM stream(bronze)"}
         |    target: v_bronze
         |  - name: write_silver
         |    type: write
         |    source: v_bronze
         |    write_target: {type: streaming_table, table: silver}
         |    cdc_config: {keys: [user_id], sequence_by: seq, scd_type: 1}
         |""".stripMargin

    // run 1: two clean rows flow to silver; the broken row quarantines
    runner.run(YamlConfig.parseFlowGroup(yaml))
    assert(store.read("silver").select("user_id").as[Long].collect().toSet == Set(1L, 3L))
    assert(store.read("dlq").count() == 1)

    // operator repairs the RAW payload and flips the row to fixed
    store.replace("dlq", store.read("dlq")
      .withColumn("_rescued_data", lit("""{"user_id": 2, "seq": 1, "city": "SF"}"""))
      .withColumn(Quarantine.StatusCol, lit("fixed")))

    // recycle re-projects the typed row; feed it back through the landing
    // zone (the recycle-to-source loop) and re-run — only new data moves
    val recycled = Quarantine.recycle(store, "dlq",
      Seq("user_id", "seq", "city", "_rescued_data"),
      Seq(graft.operators.Expectations.Rule("parsed", "_rescued_data IS NULL",
        graft.operators.Expectations.Fail)),
      rescueCol = Some("_rescued_data"))
    assert(recycled.select("user_id").as[Long].collect().toSeq == Seq(2L))
    recycled.select("user_id", "seq", "city").write.mode("append").json(landing)

    runner.run(YamlConfig.parseFlowGroup(yaml))
    val silver = store.read("silver")
    assert(silver.select("user_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // SCD1: exactly one row per key (re-run did not duplicate 1 and 3)
    assert(silver.count() == 3)
    assert(silver.filter("user_id = 2").select("city").as[String].head() == "SF")

    // run 3: a late update for user 1 arrives; only it moves through
    Files.write(Paths.get(landing, "batch3.json"),
      """{"user_id": 1, "seq": 2, "city": "CHI"}
        |""".stripMargin.getBytes)
    runner.run(YamlConfig.parseFlowGroup(yaml))
    val after = store.read("silver")
    assert(after.count() == 3)
    assert(after.filter("user_id = 1").select("city").as[String].head() == "CHI")
  }
}
