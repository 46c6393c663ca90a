package graft.exec

import java.nio.file.Files

import graft.SparkSuite
import graft.config.YamlConfig

class PipelineHooksSpec extends SparkSuite {
  import spark.implicits._

  test("hooks fire on table writes, test results, and flowgroup completion") {
    val dir = Files.createTempDirectory("hooks").toString
    val store = new TableStore(spark, s"$dir/wh")
    val rec = new PipelineHooks.Recording
    val runner = new PipelineRunner(spark, store, s"$dir/cp", hooks = rec)
    Seq((1, 5), (2, 7)).toDF("id", "v").createOrReplaceTempView("hooks_src")
    runner.run(YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: hooks_src}
        |    target: v
        |  - name: t
        |    type: test
        |    test_type: range
        |    source: v
        |    config: {column: v, min: "0", max: "6", on_fail: warn}
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: materialized_view, table: hooks_out}
        |""".stripMargin))
    assert(rec.tables.toList == List("hooks_out"))
    assert(rec.tests.toList == List(("t", "range", 1L))) // v=7 out of range
    assert(rec.flowgroups.toList == List(("p.f", true)))
  }

  test("onBatchCommitted fires on CDC-merge and MV-maintenance streams, not just plain appends") {
    val dir = Files.createTempDirectory("hooksb").toString
    val store = new TableStore(spark, s"$dir/wh")
    val rec = new PipelineHooks.Recording
    val runner = new PipelineRunner(spark, store, s"$dir/cp", hooks = rec)
    val landing = s"$dir/landing"
    Seq((1L, 1L, "NY"), (2L, 1L, "SF")).toDF("id", "seq", "city")
      .write.json(landing)
    runner.run(YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    source:
         |      type: cloudfiles
         |      path: $landing
         |      format: json
         |      readMode: stream
         |      table_schema: "id BIGINT, seq BIGINT, city STRING"
         |    target: v
         |  - name: w_cdc
         |    type: write
         |    source: v
         |    write_target: {type: streaming_table, table: dim}
         |    cdc_config: {keys: [id], sequence_by: seq, scd_type: 1}
         |  - name: w_mv
         |    type: write
         |    sql: "SELECT city, count(*) AS n FROM v GROUP BY city"
         |    write_target: {type: materialized_view, table: mv, mode: incremental}
         |""".stripMargin))
    // both maintenance routes committed exactly one microbatch each — a
    // batch:<table>:<n> kill spec or a monitoring listener must see them
    val byTable = rec.batches.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byTable == Map("dim" -> 1, "mv" -> 1), rec.batches.toList.toString)
  }

  test("test reporters: audit-table rows and JUnit XML per flowgroup") {
    val dir = Files.createTempDirectory("reporters").toString
    val store = new TableStore(spark, s"$dir/wh")
    val table = new TestReporters.TableTestReporter(spark, store)
    val junit = new TestReporters.JUnitXmlReporter(s"$dir/reports")

    table.onTestResult("p", "f", "uniq_ids", "uniqueness", 0L)
    table.onTestResult("p", "f", "in_range", "range", 3L)
    junit.onTestResult("p", "f", "uniq_ids", "uniqueness", 0L)
    junit.onTestResult("p", "f", "in_range", "range", 3L)
    junit.onFlowgroupComplete("p", "f", None)

    val rows = store.read("lhp_test_results")
      .select("test_name", "status", "violations")
      .as[(String, String, Long)].collect().toSet
    assert(rows == Set(("uniq_ids", "passed", 0L), ("in_range", "failed", 3L)))

    val xml = Files.readString(java.nio.file.Paths.get(s"$dir/reports/TEST-p.f.xml"))
    assert(xml.contains("""<testsuite name="p.f" tests="2" failures="1">"""))
    assert(xml.contains("""name="uniq_ids"""") && !xml.contains("""name="uniq_ids"><failure"""))
    assert(xml.contains("""<failure message="3 violating row(s)" type="range"/>"""))

    // a flowgroup error becomes an <error> entry in its own suite
    junit.onFlowgroupComplete("p", "g", Some(new RuntimeException("boom & bust")))
    val xml2 = Files.readString(java.nio.file.Paths.get(s"$dir/reports/TEST-p.g.xml"))
    assert(xml2.contains("""<error message="boom &amp; bust"/>"""))
  }
}
