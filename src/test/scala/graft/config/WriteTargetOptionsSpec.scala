package graft.config

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** The write-target option contract: EVERY field of the reference's
  * WriteTarget model (src/lhp/models/_action.py:11-62) is either HONORED
  * (lands in the model / folds into options), ADVISORY (ConfigError by
  * default, stderr warning under lenient), or a loud ConfigError — never
  * silently absorbed. This spec enumerates the full field list so a future
  * reference field addition that parseWrite ignores fails here first.
  */
class WriteTargetOptionsSpec extends AnyFunSuite {

  private def parse(wtFields: String, lenient: Boolean = false,
      extra: String = "") = YamlConfig.parseDocuments(
    s"""pipeline: p
       |flowgroup: f
       |actions:
       |  - name: w
       |    type: write
       |    source: v
       |    $extra
       |    write_target:
       |      $wtFields
       |""".stripMargin, lenient).head.actions.head

  private def advisory(field: String): Unit = {
    val e = intercept[YamlConfig.ConfigError](
      parse(s"type: streaming_table\n      table: t\n      $field"))
    assert(e.msg.contains(field.split(":").head.trim), e.msg)
    // lenient mode downgrades to a warning — parse succeeds
    parse(s"type: streaming_table\n      table: t\n      $field", lenient = true)
  }

  test("streaming-table fields: honored set lands in the model") {
    val a = parse(
      """type: streaming_table
        |      catalog: c
        |      schema: s
        |      table: t
        |      create_table: true
        |      comment: "customer dim"
        |      table_properties: {quality: gold}
        |      tags: {team: data, pii: }
        |      tags_file: schemas/t.yaml
        |      partition_columns: [dt]
        |      cluster_columns: [k]
        |      table_schema: "k BIGINT, v STRING"
        |      row_filter: "v IS NOT NULL"
        |""".stripMargin).asInstanceOf[StreamingTableWrite]
    assert(a.table == "c.s.t")
    assert(a.comment.contains("customer dim"))
    assert(a.tableProperties == Map("quality" -> "gold"))
    assert(a.tags == Map("team" -> "data", "pii" -> "")) // value-less tag kept
    assert(a.tagsFile.contains("schemas/t.yaml"))
    assert(a.partitionColumns == Seq("dt"))
    assert(a.clusterColumns == Seq("k"))
    assert(a.tableSchemaDdl.contains("k BIGINT, v STRING"))
    assert(a.rowFilter.contains("v IS NOT NULL"))
  }

  test("materialized-view fields: sql_path + governance set honored") {
    val a = parse(
      """type: materialized_view
        |      table: mv
        |      sql_path: sql/mv.sql
        |      comment: agg
        |      tags: {layer: silver}
        |      table_schema: "k BIGINT"
        |""".stripMargin).asInstanceOf[MaterializedViewWrite]
    assert(a.sqlPath.contains("sql/mv.sql"))
    assert(a.comment.contains("agg"))
    assert(a.tags == Map("layer" -> "silver"))
    assert(a.tableSchemaDdl.contains("k BIGINT"))
  }

  test("advisory fields: loud by default, warning under lenient") {
    advisory("refresh_schedule: \"0 * * * *\"")
    advisory("refresh_policy: triggered")
    advisory("temporary: true")
    advisory("path: /external/loc")
    advisory("spark_conf: {spark.sql.shuffle.partitions: 8}")
    advisory("cluster_by_auto: true")
  }

  test("create_table: false is advisory; true (the default) is accepted") {
    val e = intercept[YamlConfig.ConfigError](
      parse("type: streaming_table\n      table: t\n      create_table: false"))
    assert(e.msg.contains("create_table"))
    parse("type: streaming_table\n      table: t\n      create_table: false",
      lenient = true)
    assert(parse("type: streaming_table\n      table: t\n      create_table: true")
      .asInstanceOf[StreamingTableWrite].table == "t")
  }

  test("sink fields: kafka dedicated fields fold into options; handler aliases; sink_name") {
    val a = parse(
      """type: sink
        |      sink_type: kafka
        |      sink_name: out_topic
        |      bootstrap_servers: "broker:9092"
        |      topic: events_out
        |      options: {kafka.security.protocol: SSL}
        |""".stripMargin).asInstanceOf[SinkWrite]
    assert(a.options("kafka.bootstrap.servers") == "broker:9092")
    assert(a.options("topic") == "events_out")
    assert(a.options("kafka.security.protocol") == "SSL")
    assert(a.sinkId == "out_topic")
    // explicit options win over the dedicated-field spelling
    val b = parse(
      """type: sink
        |      sink_type: kafka
        |      bootstrap_servers: "broker:9092"
        |      options: {kafka.bootstrap.servers: "other:9092"}
        |""".stripMargin).asInstanceOf[SinkWrite]
    assert(b.options("kafka.bootstrap.servers") == "other:9092")

    val fb = parse(
      """type: sink
        |      sink_type: foreachbatch
        |      batch_handler: com.example.Handler
        |""".stripMargin).asInstanceOf[SinkWrite]
    assert(fb.handlerClass.contains("com.example.Handler"))

    val e = intercept[YamlConfig.ConfigError](parse(
      """type: sink
        |      sink_type: custom
        |      module_path: pkg/sinks.py
        |      custom_sink_class: X
        |""".stripMargin))
    assert(e.msg.contains("module_path"))
  }

  test("table-governance fields on a SINK are refused, not absorbed") {
    for (field <- Seq("comment: c", "tags: {a: b}", "tags_file: f.yaml",
        "table_schema: \"k BIGINT\"")) {
      val e = intercept[YamlConfig.ConfigError](parse(
        s"type: sink\n      sink_type: files\n      $field"))
      assert(e.msg.contains("sink"), e.msg)
      parse(s"type: sink\n      sink_type: files\n      $field", lenient = true)
    }
  }

  test("malformed booleans are ConfigErrors, not raw parse exceptions") {
    val e = intercept[YamlConfig.ConfigError](
      parse("type: streaming_table\n      table: t\n      create_table: \"enabled\""))
    assert(e.msg.contains("create_table") && e.msg.contains("enabled"))
  }

  /** The reference WriteTarget field inventory (models/_action.py:11-62),
    * each mapped to its contract category. Documentation-as-test: a field
    * listed `absorbed` fails the build. */
  test("full reference field inventory is categorized — none absorbed") {
    val honored = Set("type", "catalog", "schema", "database", "table",
      "create_table", // true (default) honored; false advisory — asserted above
      "comment", "table_properties", "tags", "tags_file", "partition_columns",
      "cluster_columns", "table_schema", "row_filter", "sql", "sql_path",
      "sink_type", "sink_name", "bootstrap_servers", "topic",
      "custom_sink_class", "batch_handler", "options")
    val advisoryFields = Set("cluster_by_auto", "spark_conf", "temporary",
      "path", "refresh_schedule", "refresh_policy", "module_path")
    val referenceFields = Set("type", "catalog", "schema", "database", "table",
      "create_table", "comment", "table_properties", "tags", "tags_file",
      "partition_columns", "cluster_columns", "cluster_by_auto", "spark_conf",
      "table_schema", "row_filter", "temporary", "path", "refresh_schedule",
      "refresh_policy", "sql", "sql_path", "sink_type", "sink_name",
      "bootstrap_servers", "topic", "module_path", "custom_sink_class",
      "batch_handler", "options")
    val uncategorized = referenceFields -- honored -- advisoryFields
    assert(uncategorized.isEmpty,
      s"reference WriteTarget fields with no contract: $uncategorized")
  }
}
