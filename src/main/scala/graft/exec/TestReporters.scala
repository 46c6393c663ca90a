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

  /** One accumulated data-test outcome handed to a [[Provider]]. */
  final case class TestResult(pipeline: String, flowgroup: String,
      testName: String, testType: String, violations: Long, status: String,
      collectedAt: Long)

  /** User-provider contract for the project's `test_reporting:` block —
    * the JVM counterpart of the reference's provider function
    * (tst_reporting_hook_generator.py: accumulate DQ expectation results,
    * publish ONCE at pipeline terminal state). `config` carries the
    * flattened `config_file` map. */
  trait Provider {
    def publish(results: Seq[TestResult], config: Map[String, String]): Unit
  }

  /** Accumulates every data-test result across the whole run and publishes
    * them in one call when the orchestrator reaches terminal state (the
    * run CLI invokes [[publishAll]] after the last flowgroup settles). */
  final class ProviderReporter(provider: Provider,
      config: Map[String, String] = Map.empty) extends PipelineHooks {
    private val buf = mutable.ListBuffer[TestResult]()
    override def onTestResult(pipeline: String, flowgroup: String,
        testName: String, testType: String, violations: Long): Unit =
      synchronized {
        buf += TestResult(pipeline, flowgroup, testName, testType, violations,
          if (violations == 0) "passed" else "failed",
          System.currentTimeMillis()): Unit
      }
    def publishAll(): Unit = provider.publish(synchronized(buf.toList), config)
  }

  /** Parse a provider `config_file` into the FLAT string map the
    * [[Provider]] contract hands over. Nested maps/lists are LOUD — a
    * silent `String.valueOf` would deliver '{k=v}' Java toString blobs. */
  def flatConfig(yamlText: String, fileName: String): Map[String, String] =
    Option(new org.yaml.snakeyaml.Yaml().load[Any](yamlText)) match {
      case Some(m: java.util.Map[_, _]) =>
        import scala.jdk.CollectionConverters._
        m.asScala.map {
          case (k, _: java.util.Map[_, _]) =>
            throw graft.config.YamlConfig.ConfigError(
              s"test_reporting config_file '$fileName': key '$k' holds a " +
                "nested map — provider config must be flat key: value")
          case (k, _: java.util.List[_]) =>
            throw graft.config.YamlConfig.ConfigError(
              s"test_reporting config_file '$fileName': key '$k' holds a " +
                "list — provider config must be flat key: value")
          case (k, v) => k.toString -> String.valueOf(v)
        }.toMap
      case _ => Map.empty
    }

  /** Resolve the `test_reporting` provider: `module_path` must name a
    * loadable JVM class; `function_name` either the [[Provider]] `publish`
    * (when the class implements the trait) or a reflective
    * `(Seq[TestResult], Map[String, String]) => Unit` method of that name.
    * A Python module path — valid in the reference, inert on a JVM — fails
    * LOUDLY with the porting contract spelled out, never silently skipped. */
  def loadProvider(modulePath: String, functionName: String): Provider = {
    if (modulePath.endsWith(".py"))
      throw graft.config.YamlConfig.ConfigError(
        s"test_reporting.module_path '$modulePath' is a Python module — " +
          "this engine runs providers on the JVM. Point module_path at a " +
          "class implementing graft.exec.TestReporters.Provider (or " +
          "exposing a `function_name(Seq[TestResult], Map[String,String])` " +
          "method).")
    val cls = try Class.forName(modulePath) catch {
      case _: ClassNotFoundException =>
        throw graft.config.YamlConfig.ConfigError(
          s"test_reporting.module_path: class not found: $modulePath")
    }
    val inst = cls.getDeclaredConstructor().newInstance()
    inst match {
      case p: Provider if functionName == "publish" || functionName.isEmpty => p
      case _ =>
        val m = try cls.getMethod(functionName, classOf[Seq[_]], classOf[Map[_, _]])
        catch {
          case _: NoSuchMethodException =>
            throw graft.config.YamlConfig.ConfigError(
              s"test_reporting: $modulePath has no method " +
                s"'$functionName(Seq[TestResult], Map[String, String])' and " +
                "does not implement graft.exec.TestReporters.Provider")
        }
        new Provider {
          def publish(results: Seq[TestResult],
              config: Map[String, String]): Unit = {
            m.invoke(inst, results, config); ()
          }
        }
    }
  }

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
