package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import graft.config.SchemaParser
import graft.streaming.Monitoring

class SourcesSpec extends SparkSuite {
  import spark.implicits._

  test("DataSource V2 custom source reads partitioned synthetic rows") {
    val df = spark.read.format("graft.sources.v2.SyntheticSource")
      .option("rows", "100").option("partitions", "5").load()
    assert(df.count() == 100)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.columns.toSeq == Seq("id", "bucket", "payload"))
    assert(df.filter($"bucket" === 3).count() == 10)
  }

  test("DataSource V2 custom sink round-trips rows, batch and streaming") {
    import graft.sources.v2.BufferSink
    // batch write through the V2 commit protocol
    BufferSink.clear("b1")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.format("graft.sources.v2.BufferSink").option("buffer", "b1")
      .mode("append").save()
    assert(BufferSink.rows("b1").map(r => (r(0), r(1))).toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // streaming write (epoch commit), driven end-to-end through the runner's
    // custom-sink YAML surface
    BufferSink.clear("b2")
    val dir = Files.createTempDirectory("sink-e2e").toString
    Seq((10L, "x"), (11L, "y")).toDF("id", "v").write.json(s"$dir/landing")
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    val runner = new graft.exec.PipelineRunner(spark, store, s"$dir/ckpt")
    runner.run(graft.config.YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: cs
         |actions:
         |  - name: l
         |    type: load
         |    source:
         |      type: cloudfiles
         |      path: $dir/landing
         |      format: json
         |      readMode: stream
         |      table_schema: "id BIGINT, v STRING"
         |    target: v_rows
         |  - name: w
         |    type: write
         |    source: v_rows
         |    write_target:
         |      type: sink
         |      sink_type: custom
         |      custom_sink_class: graft.sources.v2.BufferSink
         |      options: {buffer: b2}
         |""".stripMargin))
    assert(BufferSink.rows("b2").map(r => (r(0), r(1))).toSet ==
      Set((10L, "x"), (11L, "y")))
  }

  test("delta sink appends to a managed table, batch and streaming") {
    val dir = Files.createTempDirectory("delta-sink").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.json(s"$dir/landing")
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    val runner = new graft.exec.PipelineRunner(spark, store, s"$dir/ckpt")
    def fg(src: String) = graft.config.YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: ds
         |actions:
         |$src
         |  - name: w
         |    type: write
         |    source: v_rows
         |    write_target:
         |      type: sink
         |      sink_type: delta
         |      sink_name: ext_delta
         |      options: {tableName: ext_target}
         |""".stripMargin)
    // streaming source → file-sink append with its own metadata log
    runner.run(fg(
      s"""  - name: l
         |    type: load
         |    source:
         |      type: cloudfiles
         |      path: $dir/landing
         |      format: json
         |      readMode: stream
         |      table_schema: "id BIGINT, v STRING"
         |    target: v_rows""".stripMargin))
    assert(store.read("ext_target").count() == 2L)
    // a SECOND run with no new files appends nothing (exactly-once)
    runner.run(fg(
      s"""  - name: l
         |    type: load
         |    source:
         |      type: cloudfiles
         |      path: $dir/landing
         |      format: json
         |      readMode: stream
         |      table_schema: "id BIGINT, v STRING"
         |    target: v_rows""".stripMargin))
    assert(store.read("ext_target").count() == 2L)
    // the table is owned by the streaming sink's metadata log now — a
    // BATCH append beside it would be invisible to reads (the log filters
    // the listing), so mixing is refused loudly
    val eMix = intercept[graft.plan.Planner.PlanError](runner.run(
      graft.config.YamlConfig.parseFlowGroup(
        """pipeline: p
          |flowgroup: ds_mix
          |actions:
          |  - name: l
          |    type: load
          |    source: {type: sql, sql: "SELECT 9 AS id, 'z' AS v"}
          |    target: v
          |  - name: w
          |    type: write
          |    source: v
          |    write_target:
          |      type: sink
          |      sink_type: delta
          |      sink_name: s_mix
          |      options: {tableName: ext_target}
          |""".stripMargin)))
    assert(eMix.getMessage.contains("_spark_metadata"), eMix.getMessage)
    // neither tableName nor path is loud
    val e = intercept[graft.plan.Planner.PlanError](runner.run(
      graft.config.YamlConfig.parseFlowGroup(
        """pipeline: p
          |flowgroup: ds2
          |actions:
          |  - name: l
          |    type: load
          |    source: {type: sql, sql: "SELECT 1 AS id"}
          |    target: v
          |  - name: w
          |    type: write
          |    source: v
          |    write_target: {type: sink, sink_type: delta, sink_name: s}
          |""".stripMargin)))
    assert(e.getMessage.contains("tableName"), e.getMessage)
  }

  test("schema parser maps the reference type vocabulary") {
    val doc = SchemaParser.parse(
      """name: customer
        |version: "1"
        |columns:
        |  - {name: c_custkey, type: BIGINT, nullable: false}
        |  - {name: c_acctbal, type: "DECIMAL(18,2)"}
        |  - {name: weird type, type: SOMETHING}
        |primary_key: [c_custkey]
        |""".stripMargin)
    assert(doc.schema.fields(0).dataType.typeName == "long" && !doc.schema.fields(0).nullable)
    assert(doc.schema.fields(1).dataType.simpleString == "decimal(18,2)")
    assert(doc.schema.fields(2).dataType.typeName == "string") // lenient fallback
    assert(doc.primaryKey == Seq("c_custkey"))
    val hints = SchemaParser.hints(doc.schema)
    assert(hints == "c_custkey BIGINT NOT NULL, c_acctbal DECIMAL(18,2), `weird type` STRING")
    // empty/comment-only file: loud ConfigError, not an NPE on the cast
    val e = intercept[graft.config.YamlConfig.ConfigError] {
      SchemaParser.parse("# just a comment\n")
    }
    assert(e.getMessage.contains("empty"), e.getMessage)
  }

  test("jdbc load reads an embedded Derby table end-to-end") {
    val dbDir = Files.createTempDirectory("derby").toString + "/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE people (id INT, name VARCHAR(20))")
      st.execute("INSERT INTO people VALUES (1, 'ada'), (2, 'bob')")
      st.close()
    } finally conn.close()

    val dir = Files.createTempDirectory("jdbc-e2e").toString
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    val runner = new graft.exec.PipelineRunner(spark, store, s"$dir/ckpt")
    runner.run(graft.config.YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: jdbc
         |actions:
         |  - name: l
         |    type: load
         |    source:
         |      type: jdbc
         |      url: "$url"
         |      dbtable: people
         |    target: v_people
         |  - name: w
         |    type: write
         |    source: v_people
         |    write_target: {type: materialized_view, table: people_out}
         |""".stripMargin))
    assert(store.read("people_out").select("ID", "NAME")
      .as[(Int, String)].collect().toSet == Set((1, "ada"), (2, "bob")))
  }

  test("Tables.load absorbs all three parquet timestamp encodings identically") {
    // the three encodings fixtures have actually carried across driver
    // regenerations: TIMESTAMP(NANOS) (surfaces as LongType ns under the
    // pinned nanosAsLong conf), TIMESTAMP(MICROS, non-UTC) (surfaces as
    // TIMESTAMP_NTZ), and TIMESTAMP(MICROS, UTC) (TimestampType). The
    // loader must yield byte-identical TimestampType output for each so
    // the next fixture drift fails HERE, not in the gate.
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.TimestampType
    val micros = Seq(0L, 1704067200000000L, 1704067201500000L, 1704153599999999L)
    val base = micros.toDF("us").select(
      timestamp_micros($"us").as("ts"), ($"us" % 7).as("k"))
    val root = Files.createTempDirectory("ts-encodings").toString
    base.select(col("ts"), col("k"))
      .write.parquet(s"$root/tz/events.parquet")
    base.select(col("ts").cast("timestamp_ntz").as("ts"), col("k"))
      .write.parquet(s"$root/ntz/events.parquet")
    base.select((expr("unix_micros(ts)") * 1000L).as("ts"), col("k"))
      .write.parquet(s"$root/nanos/events.parquet")
    val loaded = Seq("tz", "ntz", "nanos").map { enc =>
      val df = Tables.load(spark, s"$root/$enc", "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"$enc encoding must normalize to TimestampType")
      df.orderBy("ts").collect().toSeq
    }
    assert(loaded(0) == loaded(1), "NTZ encoding drifted from UTC encoding")
    assert(loaded(0) == loaded(2), "nanos-long encoding drifted from UTC encoding")

    // the nanos-long recovery covers every KNOWN timestamp column, not just
    // events.ts — a full-fixture TIMESTAMP(NANOS) regeneration would land
    // date columns as raw longs too
    base.select((expr("unix_micros(ts)") * 1000L).as("l_shipdate"), col("k"))
      .write.parquet(s"$root/nanos/lineitem.parquet")
    val li = Tables.load(spark, s"$root/nanos", "lineitem")
    assert(li.schema("l_shipdate").dataType == TimestampType)
    assert(li.orderBy("l_shipdate").select(col("l_shipdate").as("ts"), col("k"))
      .collect().toSeq == loaded(0))
  }

  test("monitoring unions event logs with pipeline tags") {
    val d1 = Files.createTempDirectory("log1").toString
    val d2 = Files.createTempDirectory("log2").toString
    Seq(("start", 1L)).toDF("event", "ts").write.mode("overwrite").parquet(d1)
    Seq(("stop", 2L), ("start", 3L)).toDF("event", "ts").write.mode("overwrite").parquet(d2)
    val u = Monitoring.unionEventLogs(spark, Map("p1" -> d1, "p2" -> d2))
    assert(u.count() == 3)
    assert(u.filter($"_pipeline" === "p2").count() == 2)
  }
}
