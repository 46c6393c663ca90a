package graft.tools

import graft.GraftSession
import graft.config.Project
import graft.plan.DependencyAnalyzer

/** Dependency-graph export — the reference CLI's `deps` command
  * (core/dependencies/output.py: DOT/JSON/text serialization of the
  * flowgroup and pipeline graphs).
  *
  * {{{
  * sbt "runMain graft.tools.Dependencies <projectDir> <env> [dot|text]"
  * }}}
  */
object Dependencies {

  /** Graphviz DOT for a dependency graph (edges point dependency → dependent,
    * i.e. data-flow direction). */
  def toDot(name: String, g: DependencyAnalyzer.Graph): String = {
    val nodes = g.nodes.toSeq.sorted.map(n => s"""  "$n";""")
    val edges = for {
      (node, deps) <- g.edges.toSeq.sortBy(_._1)
      dep <- deps.toSeq.sorted
    } yield s"""  "$dep" -> "$node";"""
    (s"digraph \"$name\" {" +: "  rankdir=LR;" +: (nodes ++ edges) :+ "}").mkString("\n")
  }

  def toText(g: DependencyAnalyzer.Graph): String =
    g.generations.zipWithIndex.map { case (gen, i) =>
      s"generation $i: ${gen.mkString(", ")}"
    }.mkString("\n")

  /** Structured JSON export mirroring the reference's `dag --format json`
    * shape (core/dependencies/output.py:67-105 export_to_json): metadata
    * block, per-pipeline dependencies with stage / external sources /
    * parallelism, execution stages, externals. Keys kept identical so a
    * consumer of the reference's output can point at this engine's. */
  def toJson(spark: org.apache.spark.sql.SparkSession,
      fgs: Seq[graft.model.FlowGroup],
      trustDependsOn: Boolean = false, projectRoot: String = ""): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def jstr(s: String) = "\"" + esc(s) + "\""
    def jarr(xs: Seq[String]) = xs.map(jstr).mkString("[", ", ", "]")

    val pg = DependencyAnalyzer.pipelineGraph(spark, fgs, trustDependsOn, projectRoot)
    val byPipeline = fgs.groupBy(_.pipeline)
    val producedAnywhere = fgs.flatMap(DependencyAnalyzer.produces).toSet
    val externalByPipeline: Map[String, Seq[String]] = byPipeline.map {
      case (p, pfgs) =>
        p -> pfgs.flatMap(DependencyAnalyzer.consumes(spark, _, trustDependsOn, projectRoot))
          .filterNot(producedAnywhere).distinct.sorted
    }
    val (stages, circular) =
      try (pg.generations.map(_.sorted), false)
      catch { case _: Throwable => (Nil, true) }
    val stageOf = stages.zipWithIndex.flatMap { case (gen, i) =>
      gen.map(_ -> i)
    }.toMap
    val pipelines = byPipeline.toSeq.sortBy(_._1).map { case (p, pfgs) =>
      val deps = pg.edges.getOrElse(p, Set.empty).toSeq.sorted
      val stage = stageOf.getOrElse(p, -1)
      val parallel = stages.lift(stage).exists(_.size > 1)
      jstr(p) + ": {" + Seq(
        s""""depends_on": ${jarr(deps)}""",
        s""""flowgroup_count": ${pfgs.size}""",
        s""""action_count": ${pfgs.map(_.actions.size).sum}""",
        s""""external_sources": ${jarr(externalByPipeline(p))}""",
        s""""can_run_parallel": $parallel""",
        s""""stage": $stage""").mkString(", ") + "}"
    }
    val allExternal = externalByPipeline.values.flatten.toSeq.distinct.sorted
    // stable `warnings` key (always present, empty when extraction was
    // clean) — the reference export's schema contract
    // (core/dependencies/output.py:75-90); DEP-003 advisories mean the
    // graph above is missing edges the user must cover with depends_on
    val warnings = DependencyAnalyzer.extractionWarnings(spark, fgs, projectRoot)
    val warningsJson = warnings.map { w =>
      "{" + Seq(
        s""""code": ${jstr(w.code)}""",
        s""""message": ${jstr(w.message)}""",
        s""""flowgroup": ${jstr(w.flowgroup)}""",
        s""""action": ${jstr(w.action)}""",
        s""""suggestion": ${jstr(w.suggestion)}""").mkString(", ") + "}"
    }
    Seq(
      "\"metadata\": {" + Seq(
        s""""total_pipelines": ${byPipeline.size}""",
        s""""total_external_sources": ${allExternal.size}""",
        s""""total_stages": ${stages.size}""",
        s""""has_circular_dependencies": $circular""",
        s""""total_warnings": ${warnings.size}""").mkString(", ") + "}",
      "\"pipelines\": {" + pipelines.mkString(", ") + "}",
      "\"execution_stages\": " + stages.map(jarr).mkString("[", ", ", "]"),
      "\"external_sources\": " + jarr(allExternal),
      "\"warnings\": " + warningsJson.mkString("[", ", ", "]")
    ).mkString("{", ", ", "}")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Dependencies <projectDir> <env> " +
      "[dot|json|text] [--trust-depends-on] [--pipeline <name>]")
    val (projectDir, env) = (args(0), args(1))
    val rest = args.drop(2)
    val pipelineIdx = rest.indexOf("--pipeline")
    // the token AFTER --pipeline is its VALUE, not the output format —
    // `--pipeline dot` used to flip the tool into Graphviz mode
    val pipelineValueIdx = if (pipelineIdx >= 0) pipelineIdx + 1 else -2
    val format = rest.zipWithIndex.collectFirst {
      case (t, i) if !t.startsWith("-") && i != pipelineValueIdx => t
    }.getOrElse("text")
    val trust = rest.contains("--trust-depends-on")
    val pipelineFilter = pipelineIdx match {
      case -1 => None
      case i => Some(rest.lift(i + 1).getOrElse(
        throw new IllegalArgumentException("--pipeline needs a name")))
    }
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val all = Project.load(projectDir).flowgroups(env, lenient = true)
    val fgs = pipelineFilter match {
      case Some(p) =>
        val sel = all.filter(_.pipeline == p)
        if (sel.isEmpty) throw new IllegalArgumentException(
          s"no flowgroups in pipeline '$p'; have: " +
            all.map(_.pipeline).distinct.sorted.mkString(", "))
        sel
      case None => all
    }
    // advisories to stderr for the human formats (JSON embeds them)
    if (format != "json")
      DependencyAnalyzer.extractionWarnings(spark, fgs, projectDir).foreach { w =>
        System.err.println(
          s"[graft] WARN ${w.code} ${w.flowgroup}/${w.action}: ${w.message} ${w.suggestion}")
      }
    println(format match {
      case "dot" =>
        toDot("flowgroups", DependencyAnalyzer.flowgroupGraph(spark, fgs, trust, projectDir))
      case "json" => toJson(spark, fgs, trust, projectDir)
      case _ => toText(DependencyAnalyzer.flowgroupGraph(spark, fgs, trust, projectDir))
    })
    spark.stop()
  }
}
