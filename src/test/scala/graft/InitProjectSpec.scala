package graft

import java.nio.file.Files

/** `init` scaffolds a project that validates out of the box; re-init on an
  * existing project refuses. */
class InitProjectSpec extends SparkSuite {

  test("scaffolded project validates cleanly for both envs") {
    val dir = Files.createTempDirectory("graft-init").toString
    val written = InitProject.scaffold(dir, "demo")
    assert(written.contains("lhp.yaml"))
    assert(written.exists(_.startsWith("pipelines/")))
    val (okDev, devIssues) = ValidateProject.validate(spark, dir, "dev")
    assert(okDev == 1, devIssues.mkString("; "))
    assert(devIssues.isEmpty)
    val (okProd, prodIssues) = ValidateProject.validate(spark, dir, "prod")
    assert(okProd == 1)
    assert(prodIssues.isEmpty)
    // substitution tokens resolved into the scaffold's write target
    val project = graft.config.Project.load(dir)
    val fg = project.flowgroups("prod").head
    val w = fg.actions.collectFirst { case w: graft.model.StreamingTableWrite => w }.get
    assert(w.table == "bronze.events")
  }

  test("init refuses to overwrite an existing project") {
    val dir = Files.createTempDirectory("graft-init2").toString
    InitProject.scaffold(dir, "demo")
    intercept[IllegalArgumentException] { InitProject.scaffold(dir, "demo") }
  }
}
