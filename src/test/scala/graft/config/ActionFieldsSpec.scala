package graft.config

import java.nio.file.Files

import graft.SparkSuite
import graft.model._
import graft.plan.Planner

/** The reference Action model's field surface (src/lhp/models/_action.py:
  * 65-128): `depends_on` explicit dependency edges, the flat schema-transform
  * definition fields (`schema_inline` / `schema_file` / `enforcement`), the
  * data-quality `mode` contract, and the full-inventory audit proving no
  * action-level reference field is silently absorbed. */
class ActionFieldsSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------ depends_on

  test("depends_on parses on every action shape — string and list forms") {
    val fg = YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: src}
        |    target: v
        |    depends_on: cat.sch.upstream
        |  - name: t
        |    type: transform
        |    transform_type: function
        |    source: v
        |    function: com.example.Fn
        |    depends_on: [cat.sch.dim_a, cat.sch.dim_b]
        |    target: v2
        |  - name: w
        |    type: write
        |    source: v2
        |    depends_on: [cat.sch.dim_a]
        |    write_target: {type: streaming_table, table: out}
        |""".stripMargin)
    val Seq(l, t, w) = fg.actions
    assert(l.dependsOn == Seq("cat.sch.upstream"))
    assert(t.dependsOn == Seq("cat.sch.dim_a", "cat.sch.dim_b"))
    assert(w.dependsOn == Seq("cat.sch.dim_a"))
    // and the edges surface through inputNames, the planner's signal
    assert(t.inputNames == Seq("v", "cat.sch.dim_a", "cat.sch.dim_b"))
  }

  test("depends_on / operational_metadata parse on a watermark transform (r16 MatchError)") {
    // Action.withDependsOn/withOperationalMetadata enumerate the sealed
    // hierarchy by hand and MISSED WatermarkTransform — a watermark action
    // carrying either field crashed the parse with a MatchError instead of
    // attaching the edge/selection
    val fg = YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: src}
        |    target: v
        |  - name: wm
        |    type: transform
        |    transform_type: watermark
        |    source: v
        |    target: vw
        |    column: ts
        |    delay: "10 minutes"
        |    depends_on: [cat.sch.dim_a]
        |    operational_metadata: false
        |""".stripMargin)
    val wm = fg.actions.collectFirst { case a: WatermarkTransform => a }.get
    assert(wm.dependsOn == Seq("cat.sch.dim_a"))
    assert(wm.operationalMetadata.contains(OpMeta.Disabled))
    assert(wm.inputNames == Seq("v", "cat.sch.dim_a"))
  }

  test("depends_on orders a function transform after its producer write") {
    // the reference fixture scenario (19_dependency_bindings/opaque_read_flow
    // .yaml): a python transform reads a table no static analysis can see —
    // depends_on is the ONLY ordering signal
    val producer = StreamingTableWrite("w_dim", source = "v_seed", table = "sch.dim")
    val seed = SqlLoad("l_seed", Some("v_seed"), "SELECT 1 AS id")
    val opaque = FunctionTransform("t_opaque", Some("v_out"), Seq("v_seed"),
      "com.example.OpaqueFn", dependsOn = Seq("sch.dim"))
    val sink = StreamingTableWrite("w_out", source = "v_out", table = "sch.out")
    val deps = Planner.dependencies(Seq(seed, producer, opaque, sink))
    assert(deps("t_opaque").contains("w_dim"),
      s"explicit depends_on edge missing: ${deps("t_opaque")}")
    val order = Planner.order(Seq(opaque, sink, producer, seed)).map(_.name)
    assert(order.indexOf("w_dim") < order.indexOf("t_opaque"), order.toString)
  }

  test("depends_on E2E: cross-flowgroup ordering holds only because of the edge") {
    val dir = Files.createTempDirectory("graft-depon").toString
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    Seq((1, "a"), (2, "b")).toDF("id", "v").createOrReplaceTempView("depon_src")
    val producer = YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: producer
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: depon_src}
        |    target: v
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: materialized_view, table: depon_dim}
        |""".stripMargin)
    // the consumer's function transform reads depon_dim OPAQUELY (inside the
    // plugin, invisible to SQL parsing); its declared source is a local seed
    val consumer = YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: consumer
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: sql, sql: "SELECT 9 AS id, 'z' AS v"}
        |    target: v_seed
        |  - name: t
        |    type: transform
        |    transform_type: function
        |    source: v_seed
        |    function: graft.config.OpaqueDimReader
        |    depends_on: [depon_dim]
        |    target: v_joined
        |  - name: w
        |    type: write
        |    source: v_joined
        |    write_target: {type: materialized_view, table: depon_out}
        |""".stripMargin)
    // negative control: WITHOUT depends_on the analyzer sees no edge — the
    // orchestrator would be free to run the consumer first (and fail)
    val stripped = consumer.copy(actions = consumer.actions.map {
      case f: FunctionTransform => f.copy(dependsOn = Nil)
      case other => other
    })
    assert(!graft.plan.DependencyAnalyzer.consumes(spark, stripped).contains("depon_dim"))
    assert(graft.plan.DependencyAnalyzer.consumes(spark, consumer).contains("depon_dim"))
    // submitted consumer-first with serial parallelism: only the depends_on
    // edge reorders producer ahead
    val orch = new graft.exec.PipelineOrchestrator(spark, store, s"$dir/cp",
      maxParallelism = 1)
    val outcomes = orch.run(Seq(consumer, producer))
    assert(outcomes.forall(_.error.isEmpty),
      outcomes.flatMap(_.error.map(_.getMessage)).mkString("; "))
    assert(store.read("depon_out").count() == 2)
  }

  // ------------------------------------- schema transform (reference shape)

  private def schemaFg(actionYaml: String): FlowGroup = YamlConfig.parseFlowGroup(
    s"""pipeline: p
       |flowgroup: f
       |actions:
       |  - name: t
       |    type: transform
       |    transform_type: schema
       |    source: v
       |$actionYaml
       |    target: v2
       |  - name: w
       |    type: write
       |    source: v2
       |    write_target: {type: streaming_table, table: out}
       |""".stripMargin)

  test("schema_inline arrow format parses renames, casts, and declared columns") {
    val fg = schemaFg(
      """    enforcement: strict
        |    schema_inline: |
        |      columns:
        |        - "c_custkey -> customer_id: BIGINT"
        |        - "c_name -> customer_name"
        |        - "c_acctbal: DECIMAL(18,2)"
        |        - "c_comment"
        |""".stripMargin)
    val t = fg.actions.head.asInstanceOf[SchemaTransformAction]
    assert(t.renames == Map("c_custkey" -> "customer_id", "c_name" -> "customer_name"))
    assert(t.casts == Map("customer_id" -> "BIGINT", "c_acctbal" -> "DECIMAL(18,2)"))
    assert(t.declared == Seq("customer_id", "customer_name", "c_acctbal", "c_comment"))
    assert(t.strict)
  }

  test("schema_inline plain arrow lines (no columns: wrapper) parse too") {
    val fg = schemaFg(
      """    schema_inline: |
        |      old_col -> new_col: TIMESTAMP
        |      amount: DOUBLE
        |""".stripMargin)
    val t = fg.actions.head.asInstanceOf[SchemaTransformAction]
    assert(t.renames == Map("old_col" -> "new_col"))
    assert(t.casts == Map("new_col" -> "TIMESTAMP", "amount" -> "DOUBLE"))
    assert(!t.strict) // enforcement defaults to permissive
  }

  test("schema_inline legacy column_mapping/type_casting format parses") {
    val fg = schemaFg(
      """    schema_inline: |
        |      column_mapping:
        |        o_orderkey: order_id
        |      type_casting:
        |        last_modified_dt: TIMESTAMP
        |""".stripMargin)
    val t = fg.actions.head.asInstanceOf[SchemaTransformAction]
    assert(t.renames == Map("o_orderkey" -> "order_id"))
    assert(t.casts == Map("last_modified_dt" -> "TIMESTAMP"))
  }

  test("$-prefixed source columns are legal; minted rename targets must be clean") {
    val fg = schemaFg(
      """    schema_inline: |
        |      columns:
        |        - "$revenue -> revenue: DECIMAL(18,2)"
        |""".stripMargin)
    val t = fg.actions.head.asInstanceOf[SchemaTransformAction]
    assert(t.renames == Map("$revenue" -> "revenue"))
    val e = intercept[YamlConfig.ConfigError](schemaFg(
      """    schema_inline: |
        |      columns:
        |        - "a -> $b"
        |""".stripMargin))
    assert(e.msg.contains("unparseable") || e.msg.contains("$b"), e.msg)
  }

  test("schema transform definition errors are loud") {
    // no definition at all — a silent no-op transform is the bug class
    val none = intercept[YamlConfig.ConfigError](schemaFg("    enforcement: strict"))
    assert(none.msg.contains("no schema definition"), none.msg)
    // a bare `schema:` key (indentation error swallowed its children) is
    // NOT a definition — it must not slip past as an empty no-op spec
    val bare = intercept[YamlConfig.ConfigError](schemaFg("    schema:"))
    assert(bare.msg.contains("no schema definition"), bare.msg)
    // a renamed column cannot also pass through (it no longer exists)
    val passDup = intercept[YamlConfig.ConfigError](schemaFg(
      """    schema_inline: |
        |      columns:
        |        - "a -> b"
        |        - "a"
        |""".stripMargin))
    assert(passDup.msg.contains("pass through"), passDup.msg)
    // inline + file together
    val both = intercept[YamlConfig.ConfigError](schemaFg(
      """    schema_inline: "a: INT"
        |    schema_file: schemas/x.yaml""".stripMargin))
    assert(both.msg.contains("mutually exclusive"), both.msg)
    // duplicate source mapping
    val dup = intercept[YamlConfig.ConfigError](schemaFg(
      """    schema_inline: |
        |      columns:
        |        - "a -> b"
        |        - "a -> c"
        |""".stripMargin))
    assert(dup.msg.contains("more than once"), dup.msg)
    // unknown enforcement value
    val enf = intercept[YamlConfig.ConfigError](schemaFg(
      """    enforcement: exact
        |    schema_inline: "a: INT"""".stripMargin))
    assert(enf.msg.contains("exact"), enf.msg)
  }

  test("schema_file resolves at run time through the runner, project-relative") {
    val dir = Files.createTempDirectory("graft-schemafile")
    Files.createDirectories(dir.resolve("schema_transforms"))
    Files.writeString(dir.resolve("schema_transforms/orders.yaml"),
      """name: orders_transform
        |column_mapping:
        |  o_orderkey: order_id
        |type_casting:
        |  order_id: BIGINT
        |""".stripMargin)
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    val runner = new graft.exec.PipelineRunner(spark, store, s"$dir/cp",
      projectRoot = dir.toString)
    Seq((1, "x")).toDF("o_orderkey", "o_comment").createOrReplaceTempView("sf_src")
    runner.run(YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: sf_src}
        |    target: v
        |  - name: t
        |    type: transform
        |    transform_type: schema
        |    source: v
        |    schema_file: schema_transforms/orders.yaml
        |    target: v2
        |  - name: w
        |    type: write
        |    source: v2
        |    write_target: {type: materialized_view, table: sf_out}
        |""".stripMargin))
    val out = store.read("sf_out")
    assert(out.columns.toSeq == Seq("order_id", "o_comment"))
    assert(out.schema("order_id").dataType.simpleString == "bigint")
    // a missing file is a contextual PlanError naming action and file
    val e = intercept[Planner.PlanError](runner.execute(
      YamlConfig.parseFlowGroup(
        """pipeline: p
          |flowgroup: f
          |actions:
          |  - name: t2
          |    type: transform
          |    transform_type: schema
          |    source: v
          |    schema_file: schema_transforms/missing.yaml
          |    target: v3
          |  - name: w
          |    type: write
          |    source: v3
          |    write_target: {type: streaming_table, table: out}
          |""".stripMargin).actions.head))
    assert(e.getMessage.contains("t2") && e.getMessage.contains("missing.yaml"), e.getMessage)
  }

  // ----------------------------------------------------- data_quality mode

  test("mode: quarantine without a quarantine config is loud; bad modes too") {
    def dq(extra: String) = YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: t
         |    type: transform
         |    transform_type: data_quality
         |    source: v
         |$extra
         |    expectations:
         |      - {name: r, expression: "id IS NOT NULL", failureAction: drop}
         |    target: v2
         |  - name: w
         |    type: write
         |    source: v2
         |    write_target: {type: streaming_table, table: out}
         |""".stripMargin)
    val e = intercept[YamlConfig.ConfigError](dq("    mode: quarantine"))
    assert(e.msg.contains("quarantine"), e.msg)
    val bad = intercept[YamlConfig.ConfigError](dq("    mode: dlq"))
    assert(bad.msg.contains("dlq"), bad.msg)
    // an explicit dqe mode CONTRADICTING a quarantine config is loud — the
    // runner routes on the config's presence, so accepting both would DLQ
    // rows the user explicitly opted out of
    val contra = intercept[YamlConfig.ConfigError](dq(
      "    mode: dqe\n    quarantine: {dlq_table: d}"))
    assert(contra.msg.contains("contradicts"), contra.msg)
    // a quarantine block with no DLQ table is loud, not a silent downgrade
    val noDlq = intercept[YamlConfig.ConfigError](dq(
      "    quarantine: {source_table: s}"))
    assert(noDlq.msg.contains("dlq_table"), noDlq.msg)
    // mode: quarantine with the REFERENCE spelling (dlq_table + source_table,
    // models/_quarantine.py) parses into a quarantine transform with the
    // tagging identity — not a silent dqe downgrade
    val ok = dq("""    mode: quarantine
                  |    quarantine: {dlq_table: cat.raw.universal_dlq, source_table: cat.bronze.product}""".stripMargin)
    val t = ok.actions.head.asInstanceOf[DataQualityTransform]
    assert(t.quarantineTable.contains("cat.raw.universal_dlq"))
    assert(t.quarantineSourceTable.contains("cat.bronze.product"))
    // this engine's pre-existing `table` alias keeps working
    val legacy = dq("    quarantine: {table: dlq_t}")
    assert(legacy.actions.head.asInstanceOf[DataQualityTransform]
      .quarantineTable.contains("dlq_t"))
  }

  // ------------------------------------------- operational_metadata surface

  test("operational_metadata is honored on every action type, not only cloudfiles") {
    val dir = Files.createTempDirectory("graft-opmeta").toString
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    val runner = new graft.exec.PipelineRunner(spark, store, s"$dir/cp",
      opMetaColumns = Map("_source_system" ->
        graft.operators.OperationalMetadata.ColumnDef("'fixture'",
          graft.operators.OperationalMetadata.TargetTypes)))
    Seq((1, "a"), (2, "b")).toDF("id", "v").createOrReplaceTempView("om_src")
    // delta load with an action-level SELECTION (the reference
    // product_quarantine_bronze.yaml shape — previously silently ignored);
    // a sql transform inheriting the flowgroup-level toggle; a write with
    // its own action-level selection
    runner.run(YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |operational_metadata: ["_pipeline_name"]
        |actions:
        |  - name: l
        |    type: load
        |    operational_metadata: ["_source_system"]
        |    source: {type: table, table: om_src}
        |    target: v
        |  - name: t
        |    type: transform
        |    transform_type: sql
        |    source: v
        |    sql: "SELECT * FROM v"
        |    target: v2
        |  - name: w
        |    type: write
        |    source: v2
        |    operational_metadata: ["_flowgroup_name"]
        |    write_target: {type: materialized_view, table: om_out}
        |""".stripMargin))
    val out = store.read("om_out")
    // load-level selection (custom project column), transform's inherited
    // flowgroup toggle, and write-level selection all landed
    assert(out.columns.contains("_source_system"))
    assert(out.columns.contains("_pipeline_name"))
    assert(out.columns.contains("_flowgroup_name"))
    // selections are subsets — unselected defaults stay absent
    assert(!out.columns.contains("_ingestion_timestamp"))
    // _source_file never materializes off file loads (no _metadata struct)
    assert(!out.columns.contains("_source_file"))
    assert(out.select("_source_system").distinct().as[String].collect().toSeq
      == Seq("fixture"))
  }

  test("operational_metadata tri-state: explicit false opts out, writes inherit the toggle") {
    val dir = Files.createTempDirectory("graft-opmeta3").toString
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    val runner = new graft.exec.PipelineRunner(spark, store, s"$dir/cp")
    Seq((1, "a"), (2, "b")).toDF("id", "v").createOrReplaceTempView("om3_src")
    runner.run(YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |operational_metadata: ["_pipeline_name"]
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: om3_src}
        |    target: v
        |  - name: opt_out
        |    type: transform
        |    transform_type: sql
        |    source: v
        |    sql: "SELECT id, v FROM v"
        |    operational_metadata: false
        |    target: v2
        |  - name: w_off
        |    type: write
        |    operational_metadata: false
        |    source: v2
        |    write_target: {type: materialized_view, table: om3_plain}
        |  - name: w_agg
        |    type: write
        |    sql: "SELECT count(*) AS n FROM v2"
        |    write_target: {type: materialized_view, table: om3_agg}
        |""".stripMargin))
    // explicit false at transform AND write level: nothing injected anywhere
    // along that chain (pre-fix, false parsed to None = inherit, so the
    // flowgroup toggle re-injected _pipeline_name despite the opt-out)
    assert(store.read("om3_plain").columns.toSet == Set("id", "v"))
    // an AGGREGATING SQL write drops any source-carried meta columns — only
    // write-level inheritance of the flowgroup toggle can restore them
    // (pre-fix, writes never inherited and om3_agg lost _pipeline_name)
    val agg = store.read("om3_agg")
    assert(agg.columns.toSet == Set("n", "_pipeline_name"))
    assert(agg.select("_pipeline_name").distinct().as[String].collect().toSeq
      == Seq("p"))
  }

  test("applies_to scopes metadata columns by target type; selections union across levels") {
    import graft.operators.OperationalMetadata.ColumnDef
    val dir = Files.createTempDirectory("graft-opmeta4").toString
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    val runner = new graft.exec.PipelineRunner(spark, store, s"$dir/cp",
      opMetaColumns = Map(
        // reference DEFAULT scope: the two write kinds only
        "_write_only" -> ColumnDef("'w'"),
        "_view_only" -> ColumnDef("'v'", Set("view")),
        "_killed" -> ColumnDef("'x'", Set("view"), enabled = false)))
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("om4_src")
    runner.run(YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |operational_metadata: ["_view_only", "_killed"]
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: om4_src}
        |    target: v
        |  - name: w_plain
        |    type: write
        |    source: v
        |    operational_metadata: ["_write_only"]
        |    write_target: {type: materialized_view, table: om4_plain}
        |  - name: w_agg
        |    type: write
        |    operational_metadata: ["_write_only"]
        |    sql: "SELECT count(*) AS n FROM v"
        |    write_target: {type: materialized_view, table: om4_agg}
        |""".stripMargin))
    // the load (target type `view`) injected the view-scoped column only;
    // `enabled: false` removes _killed from the catalog entirely
    val plain = store.read("om4_plain")
    assert(plain.columns.toSet == Set("id", "v", "_view_only", "_write_only"))
    // the aggregating write starts from scratch: selection is the UNION of
    // action ["_write_only"] and flowgroup ["_view_only", "_killed"], then
    // applies_to filters _view_only out of a materialized_view target
    assert(store.read("om4_agg").columns.toSet == Set("n", "_write_only"))
  }

  test("flowgroup-level operational_metadata: false beats a root-level true") {
    val fgs = YamlConfig.parseDocuments(
      """pipeline: p
        |operational_metadata: true
        |flowgroups:
        |  - flowgroup: on_by_root
        |    actions: []
        |  - flowgroup: off_explicitly
        |    operational_metadata: false
        |    actions: []
        |""".stripMargin)
    assert(fgs.find(_.flowgroup == "on_by_root").get
      .operationalMetadata.contains(Nil))
    assert(fgs.find(_.flowgroup == "off_explicitly").get
      .operationalMetadata.isEmpty)
  }

  // ------------------------------------------------------- field inventory

  /** The reference Action field inventory (models/_action.py:65-128), each
    * mapped to its contract category. Documentation-as-test: a field left
    * uncategorized fails the build — the audit that closes the
    * "nothing silently absorbed" doctrine at the ACTION level. */
  test("full reference Action field inventory is categorized — none absorbed") {
    val honored = Set(
      "name", "type", "source", "target", "readMode", "write_target",
      "transform_type", "sql", "sql_path", "operational_metadata",
      "expectations_file", "mode", "quarantine", "schema_inline",
      "schema_file", "enforcement", "depends_on", "function_name",
      "parameters", "custom_datasource_class", "once", "expectations",
      // test-action fields, honored via TestAction.config -> executeTest
      "test_type", "on_violation", "tolerance", "columns", "filter",
      "reference", "source_columns", "reference_columns", "required_columns",
      "column", "min_value", "max_value", "lookup_table", "lookup_columns",
      "lookup_result_columns")
    // Doc-only: carries no runtime behavior to reproduce. `description` is
    // prose; `test_id` is a reporting label (our hooks report by action
    // name); `module_path` locates the PYTHON file for a function whose
    // NAME (function_name — honored) is what the JVM resolves from the
    // classpath — the intent (which function) is fully captured.
    val docOnly = Set("description", "test_id", "module_path")
    val referenceFields = Set(
      "name", "type", "source", "target", "description", "readMode",
      "write_target", "transform_type", "sql", "sql_path",
      "operational_metadata", "expectations_file", "mode", "quarantine",
      "schema_inline", "schema_file", "enforcement", "module_path",
      "depends_on", "function_name", "parameters", "custom_datasource_class",
      "once", "test_type", "on_violation", "tolerance", "columns", "filter",
      "reference", "source_columns", "reference_columns", "required_columns",
      "column", "min_value", "max_value", "lookup_table", "lookup_columns",
      "lookup_result_columns", "expectations", "test_id")
    val uncategorized = referenceFields -- honored -- docOnly
    assert(uncategorized.isEmpty,
      s"reference Action fields with no contract: $uncategorized")
  }
}

/** Test plugin: reads the producer flowgroup's table OPAQUELY — by name,
  * inside the function, invisible to any static source analysis. The
  * depends_on edge is the only thing ordering it after the producer. */
class OpaqueDimReader extends graft.exec.TransformFunction {
  def apply(inputs: Seq[org.apache.spark.sql.DataFrame],
      spark: org.apache.spark.sql.SparkSession,
      parameters: Map[String, Any]): org.apache.spark.sql.DataFrame =
    spark.table("depon_dim")
}
