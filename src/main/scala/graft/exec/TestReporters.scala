package graft.exec

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Test-result reporting providers on the [[PipelineHooks]] seam — the
  * runtime counterpart of the reference's test-reporting providers
  * (providers/delta_test_reporter.py: append results to an audit table;
  * providers/ado_test_reporter.py: publish to a CI system). The ADO REST
  * surface is vendor-specific, so the CI analogue here is JUnit XML — the
  * interchange format every major CI system (ADO included) ingests.
  */
object TestReporters {

  private final case class Result(pipeline: String, flowgroup: String,
      name: String, testType: String, violations: Long, at: Long)

  /** Appends one row per data-test result to a warehouse audit table
    * (columns: pipeline, flowgroup, test_name, test_type, violations,
    * status, collected_at) — the delta_test_reporter analogue. */
  final class TableTestReporter(spark: SparkSession, store: TableStore,
      resultTable: String = "lhp_test_results") extends PipelineHooks {
    override def onTestResult(pipeline: String, flowgroup: String, testName: String,
        testType: String, violations: Long): Unit = {
      import spark.implicits._
      val status = if (violations == 0) "passed" else "failed"
      store.append(resultTable,
        Seq((pipeline, flowgroup, testName, testType, violations, status,
          System.currentTimeMillis()))
          .toDF("pipeline", "flowgroup", "test_name", "test_type",
            "violations", "status", "collected_at"))
    }
  }

  /** Buffers results per flowgroup and writes one JUnit XML testsuite file
    * when the flowgroup completes — consumable by any CI test-report
    * ingester. A flowgroup error surfaces as an `<error>` suite entry. */
  final class JUnitXmlReporter(outputDir: String) extends PipelineHooks {
    private val buf = mutable.ListBuffer[Result]()

    override def onTestResult(pipeline: String, flowgroup: String, testName: String,
        testType: String, violations: Long): Unit = synchronized {
      buf += Result(pipeline, flowgroup, testName, testType, violations,
        System.currentTimeMillis()): Unit
    }

    override def onFlowgroupComplete(pipeline: String, flowgroup: String,
        error: Option[Throwable]): Unit = synchronized {
      val mine = buf.filter(r => r.pipeline == pipeline && r.flowgroup == flowgroup)
      buf --= mine
      val cases = mine.map { r =>
        val body =
          if (r.violations == 0) ""
          else s"""<failure message="${r.violations} violating row(s)" type="${esc(r.testType)}"/>"""
        s"""  <testcase classname="${esc(s"$pipeline.$flowgroup")}" name="${esc(r.name)}">$body</testcase>"""
      } ++ error.map(e =>
        s"""  <testcase classname="${esc(s"$pipeline.$flowgroup")}" name="flowgroup">""" +
        s"""<error message="${esc(Option(e.getMessage).getOrElse(e.getClass.getName))}"/></testcase>""")
      val failures = mine.count(_.violations > 0) + error.size
      val xml =
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<testsuite name="${esc(s"$pipeline.$flowgroup")}" tests="${cases.size}" failures="$failures">
           |${cases.mkString("\n")}
           |</testsuite>
           |""".stripMargin
      val p = Paths.get(s"$outputDir/TEST-$pipeline.$flowgroup.xml")
      Files.createDirectories(p.getParent)
      Files.writeString(p, xml): Unit
    }

    private def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
  }
}
