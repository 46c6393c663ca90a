package graft.exec

import java.nio.file.Files

import graft.SparkSuite
import graft.config.YamlConfig

/** Flagship end-to-end: the acmi-style medallion architecture
  * (Example_Projects/acmi) — bronze file ingestion → silver SCD2 dimension →
  * gold materialized view with an SCD2 temporal range join — executed across
  * three flowgroups by the orchestrator in dependency order. */
class MedallionE2ESpec extends SparkSuite {
  import spark.implicits._

  test("bronze -> silver SCD2 -> gold temporal MV across flowgroups") {
    val dir = Files.createTempDirectory("graft-medallion").toString
    val store = new TableStore(spark, s"$dir/wh")

    // landing zone: customer CDC feed (seq = last_modified version)
    val landing = s"$dir/landing/customers"
    Seq(
      (1L, "alice", "BUILDING", 1L),
      (2L, "bob", "MACHINERY", 1L),
      (1L, "alice", "AUTOMOBILE", 5L)) // alice changes segment at v5
      .toDF("id", "name", "segment", "version").write.json(landing)

    // orders fact with event-time versions
    Seq((100L, 1L, 250.0, 2L), (101L, 1L, 90.0, 6L), (102L, 2L, 40.0, 3L))
      .toDF("order_id", "customer_id", "amount", "at_version")
      .createOrReplaceTempView("orders_src")

    val bronze = YamlConfig.parseFlowGroup(
      s"""pipeline: medallion
         |flowgroup: bronze_customers
         |actions:
         |  - name: ingest
         |    type: load
         |    source:
         |      type: cloudfiles
         |      path: $landing
         |      format: json
         |      readMode: stream
         |      table_schema: "id BIGINT, name STRING, segment STRING, version BIGINT"
         |    target: v_raw
         |  - name: write_bronze
         |    type: write
         |    source: v_raw
         |    write_target: {type: streaming_table, table: bronze_customers}
         |""".stripMargin)

    val silver = YamlConfig.parseFlowGroup(
      """pipeline: medallion
        |flowgroup: silver_customers
        |actions:
        |  - name: load_bronze
        |    type: load
        |    source: {type: table, table: bronze_customers}
        |    target: v_changes
        |  - name: quality
        |    type: transform
        |    transform_type: data_quality
        |    source: v_changes
        |    target: v_clean
        |    expectations:
        |      - {name: has_key, expression: "id IS NOT NULL", failureAction: drop}
        |  - name: write_dim
        |    type: write
        |    source: v_clean
        |    write_target: {type: streaming_table, table: dim_customer}
        |    cdc_config: {keys: [id], sequence_by: version, scd_type: 2}
        |""".stripMargin)

    val gold = YamlConfig.parseFlowGroup(
      """pipeline: medallion
        |flowgroup: gold_revenue
        |actions:
        |  - name: mv
        |    type: write
        |    write_target: {type: materialized_view, table: revenue_by_segment}
        |    sql: |
        |      SELECT c.segment, sum(o.amount) AS revenue, count(*) AS n_orders
        |      FROM orders_src o
        |      JOIN dim_customer c
        |        ON o.customer_id = c.id
        |        AND o.at_version >= c.__start_at
        |        AND (o.at_version < c.__end_at OR c.__end_at IS NULL)
        |      GROUP BY c.segment
        |""".stripMargin)

    val orch = new PipelineOrchestrator(spark, store, s"$dir/cp")
    val outcomes = orch.run(Seq(gold, silver, bronze)) // deliberately shuffled
    assert(outcomes.forall(_.error.isEmpty), outcomes.flatMap(_.error.map(_.toString)))

    // alice: order 100 at v2 → BUILDING era; order 101 at v6 → AUTOMOBILE era
    val out = store.read("revenue_by_segment")
      .select("segment", "revenue", "n_orders")
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      "BUILDING" -> ((250.0, 1L)),
      "AUTOMOBILE" -> ((90.0, 1L)),
      "MACHINERY" -> ((40.0, 1L))))

    // incremental: a late bronze file flows through to a refreshed gold MV
    Seq((2L, "bob", "FURNITURE", 7L)).toDF("id", "name", "segment", "version")
      .write.mode("append").json(landing)
    val outcomes2 = orch.run(Seq(bronze, silver, gold))
    assert(outcomes2.forall(_.error.isEmpty))
    val dim = store.read("dim_customer").filter($"id" === 2)
    assert(dim.count() == 2) // bob now has two versions
    assert(store.read("revenue_by_segment").count() == 3) // 40.0 order stays in MACHINERY era
  }
}
