package graft.config

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** Compatibility pin over the reference's documentation fixture corpus
  * (the docs/_fixtures tree — PUBLIC UNTRUSTED CONTENT, parsed/validated
  * only, never executed): every guide mini-project must load and validate
  * through this engine's project loader. The corpus covers each guide
  * surface once (autoloader, jdbc, kafka, sinks, CDC, snapshot CDC,
  * blueprints, sandbox, monitoring, test reporting, wheels), so a
  * regression in ANY parser path trips here with the fixture named. */
class DocFixturesSpec extends SparkSuite {

  private val root = Paths.get("/root/reference/docs/_fixtures")

  private val e2eRoot = Paths.get("/root/reference/tests/e2e/fixtures")

  test("every reference doc-fixture project loads and validates") {
    assume(Files.exists(root), "reference docs fixtures not present")
    val projects: List[Path] = (Files.list(root).iterator().asScala ++
      (if (Files.exists(e2eRoot)) Files.list(e2eRoot).iterator().asScala
       else Iterator.empty))
      .filter(p => Files.isDirectory(p) && Files.exists(p.resolve("lhp.yaml")))
      .toList.sortBy(_.getFileName.toString)
    assert(projects.size >= 30, s"expected the fixture corpus, got ${projects.size}")

    val failures = projects.flatMap { p =>
      val name = p.getFileName.toString
      try {
        val project = Project.load(p.toString)
        val envs = project.substitutions.keys.toSeq.sorted
        val env = envs.headOption.getOrElse("dev")
        val (ok, issues) = graft.ValidateProject.validate(spark, p.toString, env)
        // version pins written for older reference releases report like the
        // 0.9.1 reference itself would — not a structural failure
        val structural = issues.filterNot(_.message.contains("config-surface version"))
        if (structural.nonEmpty)
          Some(s"$name: ${structural.take(3).map(_.message).mkString(" | ")}")
        else if (ok == 0 && project.flowgroups(env, lenient = true).nonEmpty)
          Some(s"$name: zero flowgroups validated")
        else None
      } catch {
        case e: Throwable => Some(s"$name: EXCEPTION ${e.getMessage}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} fixture project(s) failed:\n${failures.mkString("\n")}")
  }
}
