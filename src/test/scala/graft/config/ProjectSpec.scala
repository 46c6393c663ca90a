package graft.config

import java.nio.file.{Files, Path}

import graft.SparkSuite
import graft.exec.{PipelineOrchestrator, TableStore}

class ProjectSpec extends SparkSuite {
  import spark.implicits._

  /** Build a minimal but complete on-disk project: manifest with an
    * operational-metadata catalog and include globs, substitutions,
    * a template + preset, schema file, and two pipeline files. */
  private def writeFixtureProject(): Path = {
    val root = Files.createTempDirectory("graft-project")
    def write(rel: String, text: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, text): Unit
    }
    write("lhp.yaml",
      """name: fixture_project
        |version: "1.0"
        |include:
        |  - "bronze/**"
        |  - "gold/revenue.yaml"
        |operational_metadata:
        |  columns:
        |    _processing_timestamp:
        |      expression: "F.current_timestamp()"
        |    _source_system:
        |      expression: "'fixture'"
        |      applies_to: ["view", "streaming_table", "materialized_view"]
        |""".stripMargin)
    write("substitutions/dev.yaml",
      """dev:
        |  env: dev
        |  catalog: fixture_cat
        |  bronze_schema: bronze_dev
        |""".stripMargin)
    write("templates/ingest_template.yaml",
      """name: ingest_template
        |presets: [bronze_layer]
        |parameters:
        |  - {name: entity, required: true}
        |  - {name: landing, required: true}
        |actions:
        |  - name: load_{{ entity }}
        |    type: load
        |    operational_metadata: ["_source_system"]
        |    source:
        |      type: cloudfiles
        |      path: "{{ landing }}"
        |      format: json
        |      readMode: stream
        |    target: v_{{ entity }}
        |  - name: write_{{ entity }}
        |    type: write
        |    source: v_{{ entity }}
        |    write_target:
        |      type: streaming_table
        |      schema: "{bronze_schema}"
        |      table: "{{ entity }}"
        |""".stripMargin)
    write("presets/bronze_layer.yaml",
      """name: bronze_layer
        |defaults:
        |  write_actions:
        |    streaming_table:
        |      table_properties: {quality: bronze}
        |""".stripMargin)
    write("gold/ignored_outside_pipelines.yaml", "not: included\n")
    root
  }

  test("project load + resolve + run end-to-end with operational metadata") {
    val root = writeFixtureProject()
    val landing = root.resolve("landing").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.json(landing)
    Files.createDirectories(root.resolve("pipelines/bronze"))
    Files.createDirectories(root.resolve("pipelines/gold"))
    Files.writeString(root.resolve("pipelines/bronze/events.yaml"),
      s"""pipeline: bronze
         |flowgroup: events_ingest
         |use_template: ingest_template
         |template_parameters:
         |  entity: events
         |  landing: "$landing"
         |""".stripMargin)
    // qualified table load so the cross-flowgroup dependency edge orders
    // gold after bronze in the orchestrator
    Files.writeString(root.resolve("pipelines/gold/revenue.yaml"),
      """pipeline: gold
        |flowgroup: revenue
        |actions:
        |  - name: load_events
        |    type: load
        |    source: {type: table, table: "{bronze_schema}.events"}
        |    target: v_src
        |  - name: agg
        |    type: transform
        |    transform_type: sql
        |    source: v_src
        |    target: v_rev
        |    sql: "SELECT count(*) AS n FROM v_src"
        |  - name: w
        |    type: write
        |    source: v_rev
        |    write_target: {type: materialized_view, table: revenue}
        |""".stripMargin)
    // .yml is a FIRST-CLASS extension (reference flowgroup_discoverer
    // rglobs *.yaml AND *.yml) — a .yaml-only filter silently resolved
    // zero flowgroups from .yml-authored projects
    Files.writeString(root.resolve("pipelines/bronze/yml_spelled.yml"),
      """pipeline: bronze
        |flowgroup: yml_spelled
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: sql, sql: "SELECT 1 AS one"}
        |    target: v_one
        |  - name: w
        |    type: write
        |    source: v_one
        |    write_target: {type: materialized_view, table: yml_t}
        |""".stripMargin)

    val project = Project.load(root.toString)
    assert(project.name == "fixture_project")
    // the PySpark spellings translated; _processing_timestamp keeps the
    // reference DEFAULT applies_to (write kinds only), _source_system
    // opted into views explicitly (as the reference examples do for their
    // view-scoped columns)
    import graft.operators.OperationalMetadata.ColumnDef
    assert(project.opMetaColumns == Map(
      "_processing_timestamp" -> ColumnDef("current_timestamp()"),
      "_source_system" -> ColumnDef("'fixture'",
        Set("view", "streaming_table", "materialized_view"))))

    val fgs = project.flowgroups("dev")
    assert(fgs.map(_.flowgroup).toSet ==
      Set("events_ingest", "revenue", "yml_spelled"))

    // template + preset + token resolution all landed
    val ingest = fgs.find(_.flowgroup == "events_ingest").get
    val write = ingest.actions.collectFirst { case w: graft.model.StreamingTableWrite => w }.get
    assert(write.table == "bronze_dev.events") // {bronze_schema} token + schema qualifier
    assert(write.tableProperties == Map("quality" -> "bronze")) // template-level preset

    // run the whole project through the orchestrator
    val wh = Files.createTempDirectory("graft-project-wh").toString
    val store = new TableStore(spark, s"$wh/warehouse")
    val orch = new PipelineOrchestrator(spark, store, s"$wh/ckpt",
      projectRoot = root.toString, opMetaColumns = project.opMetaColumns)
    val outcomes = orch.run(fgs)
    assert(outcomes.forall(_.error.isEmpty), outcomes.flatMap(_.error).map(_.toString))

    val events = store.read("bronze_dev.events")
    assert(events.count() == 2)
    // action-level operational_metadata selected ONLY _source_system
    assert(events.columns.contains("_source_system") &&
      !events.columns.contains("_processing_timestamp") &&
      !events.columns.contains("_ingestion_timestamp"))
    assert(events.select("_source_system").distinct().as[String].collect().toSeq == Seq("fixture"))
    assert(store.read("revenue").as[Long].head() == 2L)

    // the env's {catalog} token registers as a warehouse catalog, so
    // three-part SQL over written tables resolves
    assert(project.registerCatalog(spark, "dev", store.warehouse).contains("fixture_cat"))
    assert(spark.sql("SELECT count(*) FROM fixture_cat.bronze_dev.events")
      .as[Long].head() == 2L)

    // unknown environment is a clear error
    val e = intercept[YamlConfig.ConfigError](project.flowgroups("prod"))
    assert(e.msg.contains("unknown environment"))
  }

  test("secret provider honors scope aliases and default_scope from substitutions") {
    val root = Files.createTempDirectory("secrets-proj")
    Files.createDirectories(root.resolve("substitutions"))
    Files.writeString(root.resolve("substitutions/dev.yaml"),
      """dev:
        |  env: dev
        |secrets:
        |  default_scope: dev_secrets
        |  scopes:
        |    database: dev_db_secrets
        |""".stripMargin)
    val fakeEnv = Map(
      "DEV_DB_SECRETS_PWD" -> "db-pw",
      "DEV_SECRETS_API_KEY" -> "api-k")
    val secrets = Project.secretProvider(root, "dev", fakeEnv.get)
    assert(secrets("database", "pwd").contains("db-pw"))     // alias → real scope
    assert(secrets("anything", "api_key").contains("api-k")) // default_scope fallback
    assert(secrets("database", "missing").isEmpty)
    // resolves inside substitution text as ${secret:scope/key}
    assert(Substitution("${secret:database/pwd}", Map.empty, Map.empty, secrets) == "db-pw")
  }

  test("pyspark expression forms translate to Spark SQL") {
    assert(Project.pysparkToSql("F.col('_metadata.file_path')") == "_metadata.file_path")
    assert(Project.pysparkToSql("F.current_timestamp()") == "current_timestamp()")
    assert(Project.pysparkToSql("concat(a, b)") == "concat(a, b)")
  }
}
