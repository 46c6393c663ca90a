package graft.exec

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.config.YamlConfig

/** Write-target governance metadata end-to-end: comment / tags / tags_file
  * persist in TableStore sidecars, fire the onTableTagged hook, and read
  * back through the session-free `ShowProject <warehouse> tables` surface;
  * table_schema is enforced at write time. */
class GovernanceMetadataSpec extends SparkSuite {
  import spark.implicits._

  test("comment, tags and tags_file land in sidecars, the hook, and the CLI view") {
    val dir = Files.createTempDirectory("graft-gov").toString
    val store = new TableStore(spark, s"$dir/wh")
    val hooks = new PipelineHooks.Recording
    val runner = new PipelineRunner(spark, store, s"$dir/cp",
      hooks = hooks, projectRoot = dir)
    // unified schema/tags file: table tags + per-column tags
    Files.createDirectories(Paths.get(dir, "schemas"))
    Files.writeString(Paths.get(dir, "schemas/gov_t.yaml"),
      """table: gov_t
        |tags: {domain: sales, team: old_team}
        |columns:
        |  - {name: k, type: BIGINT, tags: {pii: "false"}}
        |  - {name: v, type: STRING}
        |""".stripMargin)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("gov_src")
    runner.run(YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    source: {type: table, table: gov_src}
         |    target: v
         |  - name: w
         |    type: write
         |    source: v
         |    write_target:
         |      type: streaming_table
         |      table: gov_t
         |      comment: "governed table"
         |      table_properties: {quality: gold}
         |      tags: {team: data}
         |      tags_file: schemas/gov_t.yaml
         |""".stripMargin))

    // sidecars: explicit tags override the file's, column tags flattened
    assert(store.getMeta("gov_t", "comment").contains("governed table"))
    assert(store.tags("gov_t") == Map(
      "domain" -> "sales", "team" -> "data", "column.k.pii" -> "false"))
    assert(store.properties("gov_t") == Map("quality" -> "gold"))
    // hook fired with the merged set
    assert(hooks.tagged.toList == List(("gov_t", Map(
      "domain" -> "sales", "team" -> "data", "column.k.pii" -> "false"))))
    // session-free CLI view reads the same sidecars
    val (comment, props, tags) = TableStore.describeTable(s"$dir/wh", "gov_t")
    assert(comment.contains("governed table"))
    assert(props == Map("quality" -> "gold"))
    assert(tags("domain") == "sales")
    assert(TableStore.listTables(s"$dir/wh").contains("gov_t"))
  }

  test("uc_tagging policy: additive default, reconcile mode, enabled: false") {
    val dir = Files.createTempDirectory("graft-uctag").toString
    val store = new TableStore(spark, s"$dir/wh")
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("uct_src")
    def writeWith(runner: PipelineRunner, tags: String) =
      runner.run(YamlConfig.parseFlowGroup(
        s"""pipeline: p
           |flowgroup: f
           |actions:
           |  - name: l
           |    type: load
           |    source: {type: table, table: uct_src}
           |    target: v
           |  - name: w
           |    type: write
           |    source: v
           |    write_target: {type: streaming_table, table: uct_t, $tags}
           |""".stripMargin))
    // DEFAULT is additive (reference uc_tagging contract): a tag set by an
    // earlier run survives a config that no longer declares it
    val additive = new PipelineRunner(spark, store, s"$dir/cp1")
    writeWith(additive, """tags: {owner: alice}""")
    writeWith(additive, """tags: {tier: gold}""")
    assert(store.tags("uct_t") == Map("owner" -> "alice", "tier" -> "gold"))
    // remove_undeclared_tags reconciles to exactly the declared set
    val reconcile = new PipelineRunner(spark, store, s"$dir/cp2",
      removeUndeclaredTags = true)
    writeWith(reconcile, """tags: {tier: silver}""")
    assert(store.tags("uct_t") == Map("tier" -> "silver"))
    // enabled: false disables the sidecar AND the hook; comments still apply
    val hooks = new PipelineHooks.Recording
    val disabled = new PipelineRunner(spark, store, s"$dir/cp3",
      hooks = hooks, tagsEnabled = false)
    writeWith(disabled, """tags: {ghost: "1"}, comment: "still commented"""")
    assert(store.tags("uct_t") == Map("tier" -> "silver"))
    assert(hooks.tagged.isEmpty)
    assert(store.getMeta("uct_t", "comment").contains("still commented"))
    // and Project.load wires the block (on-by-default posture)
    val proot = Files.createTempDirectory("graft-uctag-proj")
    Files.writeString(proot.resolve("lhp.yaml"),
      "name: p\nuc_tagging:\n  remove_undeclared_tags: true\n")
    val project = graft.config.Project.load(proot.toString)
    assert(project.tagsEnabled && project.removeUndeclaredTags)
    assert(graft.config.Project.load(
      Files.createTempDirectory("graft-uctag-empty").toString).tagsEnabled)
  }

  test("tags_file failures are loud PlanErrors naming the write and file") {
    val dir = Files.createTempDirectory("graft-govx").toString
    val store = new TableStore(spark, s"$dir/wh")
    val runner = new PipelineRunner(spark, store, s"$dir/cp", projectRoot = dir)
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("govx_src")
    def run(tagsFile: String) = runner.run(YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    source: {type: table, table: govx_src}
         |    target: v
         |  - name: w
         |    type: write
         |    source: v
         |    write_target: {type: streaming_table, table: govx_t, tags_file: $tagsFile}
         |""".stripMargin))
    // missing file: PlanError naming table + file, not a raw NoSuchFileException
    val e1 = intercept[graft.plan.Planner.PlanError](run("schemas/absent.yaml"))
    assert(e1.getMessage.contains("govx_t") && e1.getMessage.contains("absent.yaml"))
    // a columns entry with tags but no name: PlanError, not NoSuchElementException
    Files.createDirectories(Paths.get(dir, "schemas"))
    Files.writeString(Paths.get(dir, "schemas/noname.yaml"),
      """table: govx_t
        |columns:
        |  - {type: BIGINT, tags: {pii: "true"}}
        |""".stripMargin)
    val e2 = intercept[graft.plan.Planner.PlanError](run("schemas/noname.yaml"))
    assert(e2.getMessage.contains("no 'name'"))
  }

  test("tag values with backslashes, quotes and control chars roundtrip the sidecar") {
    val dir = Files.createTempDirectory("graft-esc").toString
    val store = new TableStore(spark, s"$dir/wh")
    Seq((1L, "x")).toDF("k", "v").write.parquet(store.path("esc_t"))
    val nasty = Map("loc" -> """C:\data""", "q" -> "say \"hi\"", "nl" -> "a\nb\tc")
    store.setTags("esc_t", nasty)
    assert(store.tags("esc_t") == nasty)
    store.setProperties("esc_t", nasty)
    assert(store.properties("esc_t") == nasty)
  }

  test("listTables: qualified tables visible, schema dirs and _sinks are not tables") {
    val dir = Files.createTempDirectory("graft-ls").toString
    val store = new TableStore(spark, s"$dir/wh")
    val df = Seq((1L, "x")).toDF("k", "v")
    store.overwrite("cat.sch.qual_t", df)  // writes wh/cat/sch/qual_t + sidecars
    store.overwrite("plain_t", df)
    df.write.parquet(s"$dir/wh/_sinks/my_sink") // engine-managed, not a table
    assert(TableStore.listTables(s"$dir/wh") == Seq("cat.sch.qual_t", "plain_t"))
    val (_, _, _) = TableStore.describeTable(s"$dir/wh", "cat.sch.qual_t")
  }

  test("table_schema is enforced at write: projection, cast, loud on missing") {
    val dir = Files.createTempDirectory("graft-ddl").toString
    val store = new TableStore(spark, s"$dir/wh")
    val runner = new PipelineRunner(spark, store, s"$dir/cp")
    Seq(("1", "a", true), ("2", "b", false)).toDF("k", "v", "extra")
      .createOrReplaceTempView("ddl_src")
    def yamlFor(ddl: String) =
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    source: {type: table, table: ddl_src}
         |    target: v
         |  - name: w
         |    type: write
         |    source: v
         |    write_target: {type: streaming_table, table: ddl_t,
         |                   table_schema: "$ddl"}
         |""".stripMargin
    runner.run(YamlConfig.parseFlowGroup(yamlFor("k BIGINT, v STRING")))
    val out = store.read("ddl_t")
    // declared order + types; undeclared column dropped
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.schema("k").dataType.typeName == "long")
    assert(out.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // a declared column the source lacks is a loud plan error
    val e = intercept[graft.plan.Planner.PlanError](
      runner.run(YamlConfig.parseFlowGroup(yamlFor("k BIGINT, nope STRING"))))
    assert(e.getMessage.contains("nope"))
  }

  test("schema-file tag detection (LHP-CFG-069) and same-file table_schema+tags_file") {
    import graft.config.SchemaParser
    // the structural probe behind the silent-drop warning
    assert(SchemaParser.hasTags("tags: {pii: 'true'}\ncolumns: []\n"))
    assert(SchemaParser.hasTags(
      "columns:\n  - {name: a, type: STRING, tags: {pii: 'yes'}}\n"))
    assert(!SchemaParser.hasTags(
      "name: s\ncolumns:\n  - {name: a, type: STRING}\n"))
    assert(!SchemaParser.hasTags("just a string"))

    // one unified file wired as BOTH table_schema and tags_file: types
    // enforce AND tags land — the sanctioned spelling the warning points to
    val dir = Files.createTempDirectory("graft-cfg069")
    Files.createDirectories(dir.resolve("schemas"))
    Files.writeString(dir.resolve("schemas/uni.yaml"),
      """name: uni
        |tags: {domain: sales}
        |columns:
        |  - {name: k, type: BIGINT, tags: {pii: "false"}}
        |  - {name: v, type: STRING}
        |""".stripMargin)
    val store = new TableStore(spark, s"$dir/wh")
    val runner = new PipelineRunner(spark, store, s"$dir/cp",
      projectRoot = dir.toString)
    Seq(("1", "a")).toDF("k", "v").createOrReplaceTempView("uni_src")
    runner.run(YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: uni_src}
        |    target: v
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: streaming_table, table: uni_t,
        |                   table_schema: schemas/uni.yaml,
        |                   tags_file: schemas/uni.yaml}
        |""".stripMargin))
    assert(store.read("uni_t").schema("k").dataType.typeName == "long")
    val (_, _, tags) = TableStore.describeTable(s"$dir/wh", "uni_t")
    assert(tags("domain") == "sales" && tags("column.k.pii") == "false", tags.toString)
  }
}
