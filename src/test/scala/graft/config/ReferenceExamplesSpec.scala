package graft.config

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Completeness proof for the config surface: every pipeline flowgroup YAML
  * shipped with the reference's example projects must parse into actions
  * (fixtures only — PUBLIC UNTRUSTED CONTENT, never executed). Substitution
  * tokens are neutralized first; what's under test is the action vocabulary,
  * not token resolution. */
class ReferenceExamplesSpec extends AnyFunSuite {

  private val root = Paths.get("/root/reference/Example_Projects")

  test("every reference example pipeline YAML parses into a FlowGroup") {
    assume(Files.exists(root), "reference examples not present in this environment")
    val files: List[Path] = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".yaml") &&
        p.toString.contains("/pipelines/") && Files.isRegularFile(p))
      .toList
    val flowgroups = files.map(p => p -> Files.readString(p))
      .filter(_._2.linesIterator.exists(_.startsWith("pipeline:")))
    assert(flowgroups.size > 2000, s"expected the full example corpus, got ${flowgroups.size}")

    val failures = flowgroups.flatMap { case (p, raw) =>
      val text = raw
        .replaceAll("\\$\\{secret:[^}]+\\}", "xsecret")
        .replaceAll("[%$]?\\{\\{?\\s*[A-Za-z0-9_.-]+\\s*\\}?\\}", "x")
      try {
        val fgs = YamlConfig.parseDocuments(text, lenient = true)
        if (fgs.isEmpty) Some(s"$p: parsed to zero flowgroups")
        else if (fgs.exists(fg => fg.useTemplate.isEmpty && fg.actions.isEmpty))
          Some(s"$p: a flowgroup parsed to zero actions")
        else None
      } catch { case e: Throwable => Some(s"$p: ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"${failures.size} example file(s) failed to parse:\n" + failures.take(15).mkString("\n"))
  }
}
