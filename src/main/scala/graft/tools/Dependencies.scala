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

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Dependencies <projectDir> <env> [dot|text]")
    val (projectDir, env) = (args(0), args(1))
    val format = args.lift(2).getOrElse("text")
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val fgs = Project.load(projectDir).flowgroups(env, lenient = true)
    val graph = DependencyAnalyzer.flowgroupGraph(spark, fgs)
    println(format match {
      case "dot" => toDot("flowgroups", graph)
      case _ => toText(graph)
    })
    spark.stop()
  }
}
