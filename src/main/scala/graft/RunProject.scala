package graft

import graft.config.Project
import graft.exec.{PipelineOrchestrator, TableStore, TestReporters}

/** CLI entrypoint: run a whole project directory for an environment — the
  * engine's counterpart of the reference CLI's generate-then-run cycle.
  *
  * {{{
  * sbt "runMain graft.RunProject <projectDir> <env> <warehouse> [pipelineFilter] [--full-refresh]"
  * }}}
  *
  * Loads lhp.yaml + templates/presets/blueprints/substitutions, resolves the
  * included flowgroups for `env`, binds the env's `{catalog}` token to a
  * [[org.apache.spark.sql.graftnative.WarehouseCatalog]] over `warehouse`,
  * and runs everything through the generation-parallel orchestrator with
  * JUnit XML test reports under `<warehouse>/_reports`. Exit code 1 if any
  * flowgroup failed.
  */
object RunProject {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: RunProject <projectDir> <env> <warehouse> [pipelineFilter]")
    val Array(projectDir, env, warehouse) = args.take(3)
    val flags = args.drop(3).filter(_.startsWith("--")).toSet
    val pipelineFilter = args.drop(3).find(!_.startsWith("--"))
    val fullRefresh: Set[String] = if (flags("--full-refresh")) Set("*") else Set.empty

    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val project = Project.load(projectDir)
    project.registerCatalog(spark, env, warehouse)

    val fgs0 = project.flowgroups(env, lenient = true)
    val fgs = pipelineFilter.map(p => fgs0.filter(_.pipeline == p)).getOrElse(fgs0)
    println(s"[graft] project '${project.name}': ${fgs.size} flowgroup(s) for env '$env'")

    val store = new TableStore(spark, warehouse)
    val orchestrator = new PipelineOrchestrator(spark, store, s"$warehouse/_checkpoints",
      hooks = new TestReporters.JUnitXmlReporter(s"$warehouse/_reports"),
      projectRoot = projectDir, opMetaColumns = project.opMetaColumns,
      fullRefresh = fullRefresh)
    val outcomes = orchestrator.run(fgs)

    outcomes.foreach { o =>
      val status =
        if (o.skipped) "SKIPPED (upstream failed)"
        else o.error.map(e => s"FAILED: ${e.getMessage}")
          .getOrElse(s"ok (${o.durationMs} ms)")
      println(s"[graft] ${o.flowgroup}: $status")
    }
    spark.stop()
    if (outcomes.exists(o => o.error.isDefined || o.skipped)) sys.exit(1)
  }
}
