package graft.config

import graft.SparkSuite
import graft.model._

class FlowGroupResolverSpec extends SparkSuite {

  private val template =
    """name: csv_ingestion
      |parameters:
      |  - {name: table_name}
      |  - {name: landing, default: /data/landing}
      |actions:
      |  - name: load_{{ table_name }}
      |    type: load
      |    source:
      |      type: cloudfiles
      |      path: "{{ landing }}/{{ table_name }}"
      |      format: csv
      |    target: v_{{ table_name }}
      |""".stripMargin

  test("template expansion renders parameters and appends actions") {
    val fg = FlowGroupResolver.resolve(
      """pipeline: bronze
        |flowgroup: ingest_customer
        |use_template: csv_ingestion
        |template_parameters: {table_name: customer}
        |actions:
        |  - name: write_customer
        |    type: write
        |    source: v_customer
        |    write_target: {type: streaming_table, table: customer_raw}
        |""".stripMargin,
      templates = Map("csv_ingestion" -> template))
    assert(fg.actions.size == 2)
    val load = fg.actions.head.asInstanceOf[CloudFilesLoad]
    assert(load.name == "load_customer")
    assert(load.path == "/data/landing/customer") // default parameter used
    assert(load.target.contains("v_customer"))
  }

  test("missing required template parameter fails") {
    intercept[Substitution.UnresolvedToken] {
      FlowGroupResolver.resolve(
        """pipeline: p
          |flowgroup: f
          |use_template: csv_ingestion
          |actions: []
          |""".stripMargin,
        templates = Map("csv_ingestion" -> template))
    }
  }

  test("presets: defaults sections merge into matching actions; extends chains") {
    val base =
      """name: base
        |defaults:
        |  variables: {region: us-east}
        |  write_actions:
        |    streaming_table:
        |      table_properties: {quality: bronze, owner: base-team}
        |""".stripMargin
    val child =
      """name: child
        |extends: base
        |defaults:
        |  write_actions:
        |    streaming_table:
        |      table_properties: {owner: child-team}
        |""".stripMargin
    val fg = FlowGroupResolver.resolve(
      """pipeline: real_pipeline
        |flowgroup: f
        |presets: [child]
        |variables: {env: dev}
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: sql, sql: "SELECT 1 AS x"}
        |    target: v
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: streaming_table, table: out}
        |""".stripMargin,
      presets = Map("base" -> base, "child" -> child))
    assert(fg.pipeline == "real_pipeline")
    // flowgroup-level default fills only missing keys (variables already set)
    assert(fg.variables == Map("env" -> "dev"))
    // write_actions.streaming_table merged into the write target, with the
    // extends child overriding the parent per-key
    val w = fg.actions.collectFirst { case x: StreamingTableWrite => x }.get
    assert(w.tableProperties == Map("quality" -> "bronze", "owner" -> "child-team"))
  }

  test("preset schema_suffix appends to the write schema; database_suffix deprecated alias") {
    val preset =
      """name: envsuffix
        |defaults:
        |  write_actions:
        |    streaming_table:
        |      schema_suffix: "_dev"
        |    materialized_view:
        |      database_suffix: "_legacy"
        |""".stripMargin
    val fg = FlowGroupResolver.resolve(
      """pipeline: p
        |flowgroup: f
        |presets: [envsuffix]
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: sql, sql: "SELECT 1 AS x"}
        |    target: v
        |  - name: w1
        |    type: write
        |    source: v
        |    write_target: {type: streaming_table, schema: bronze, table: out}
        |  - name: w2
        |    type: write
        |    source: v
        |    write_target: {type: materialized_view, database: main.gold, table: agg}
        |""".stripMargin,
      presets = Map("envsuffix" -> preset))
    // schema_suffix appended to the schema qualifier (the reference's
    // env-specific schema mechanism, _apply_suffix); the suffix keys are
    // consumed by the resolver, never leaking into write-target options
    val w1 = fg.actions.collectFirst { case x: StreamingTableWrite => x }.get
    assert(w1.table == "bronze_dev.out")
    // legacy database_suffix (LHP-DEPR-004) appends to the PACKED string
    // (reference _apply_suffix: `target["database"] += suffix`), and the
    // namespace normalizer then splits it — so the suffix lands on the
    // schema half. A dot-less database would be CFG_011 downstream.
    val w2 = fg.actions.collectFirst { case x: graft.model.MaterializedViewWrite => x }.get
    assert(w2.table == "main.gold_legacy.agg")
  }

  test("operational_metadata unions with presets; a double opt-out stays off") {
    def resolveWith(fgOpMeta: String, presetOpMeta: String) =
      FlowGroupResolver.resolve(
        s"""pipeline: p
           |flowgroup: f
           |presets: [om]
           |operational_metadata: $fgOpMeta
           |actions:
           |  - name: l
           |    type: load
           |    source: {type: sql, sql: "SELECT 1 AS x"}
           |    target: v
           |  - name: w
           |    type: write
           |    source: v
           |    write_target: {type: materialized_view, table: t}
           |""".stripMargin,
        presets = Map("om" ->
          s"name: om\ndefaults:\n  operational_metadata: $presetOpMeta\n"))
    // union of two lists
    assert(resolveWith("[\"_pipeline_name\"]", "[\"_flowgroup_name\"]")
      .operationalMetadata.contains(Seq("_pipeline_name", "_flowgroup_name")))
    // true at either level selects everything
    assert(resolveWith("true", "[\"_flowgroup_name\"]")
      .operationalMetadata.contains(Nil))
    // BOTH levels false: the union must re-serialize as false, NOT as an
    // empty list (which would re-parse as "all columns" — a double opt-out
    // silently inverting into full injection)
    assert(resolveWith("false", "false").operationalMetadata.isEmpty)
    // flowgroup false contributes nothing but does not veto the preset
    // (reference: only ACTION-level false disables)
    assert(resolveWith("false", "[\"_flowgroup_name\"]")
      .operationalMetadata.contains(Seq("_flowgroup_name")))
  }

  test("preset inheritance cycle is an error") {
    val a = "name: a\nextends: b\ndefaults: {}\n"
    val b = "name: b\nextends: a\ndefaults: {}\n"
    intercept[YamlConfig.ConfigError] {
      FlowGroupResolver.resolvePresetChain(Seq("a"), Map("a" -> a, "b" -> b))
    }
  }

  test("token substitution with recursion and secrets") {
    val out = Substitution("{a}/${secret:sc/key}",
      vars = Map.empty,
      tokens = Map("a" -> "x-{b}", "b" -> "y"),
      secrets = (s, k) => Some(s"$s-$k-v"))
    assert(out == "x-y/sc-key-v")
  }

  test("unresolved token is a strict error") {
    intercept[Substitution.UnresolvedToken] {
      Substitution("{nope}", Map.empty, Map.empty, strict = true)
    }
  }
}
