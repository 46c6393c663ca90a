package graft

import graft.config.Project

/** `list` / `substitutions` CLI — inspect a project without executing it
  * (the reference CLI's `lhp list presets|templates|blueprints` and
  * `lhp substitutions <env>` — src/lhp/cli/commands/list_command.py,
  * substitutions_command.py).
  *
  * {{{
  * sbt "runMain graft.ShowProject <dir> templates|presets|blueprints|flowgroups [env]"
  * sbt "runMain graft.ShowProject <dir> substitutions <env>"
  * sbt "runMain graft.ShowProject <warehouse> tables [table]"
  * }}}
  */
object ShowProject {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ShowProject <dir> templates|presets|blueprints|flowgroups|substitutions|tables [env|table]")
    // `tables` inspects a WAREHOUSE directory (sidecar reads, no session,
    // no project config) — the surface for write_target comment/tags/
    // table_properties, which otherwise live only in sidecar files.
    if (args(1) == "tables") {
      val wh = args(0)
      val names = args.lift(2).map(Seq(_))
        .getOrElse(graft.exec.TableStore.listTables(wh))
      names.foreach { t =>
        val (comment, props, tags) = graft.exec.TableStore.describeTable(wh, t)
        println(t)
        comment.foreach(c => println(s"  comment: $c"))
        props.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"  property: $k = $v") }
        tags.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"  tag: $k = $v") }
      }
      return
    }
    val project = Project.load(args(0))
    args(1) match {
      case "templates" =>
        project.templates.keys.toSeq.sorted.foreach(println)
      case "presets" =>
        project.presets.keys.toSeq.sorted.foreach(println)
      case "blueprints" =>
        project.blueprints.keys.toSeq.sorted.foreach(println)
      case "substitutions" =>
        val env = args.lift(2).getOrElse(
          throw new IllegalArgumentException("substitutions needs an <env>"))
        project.envTokens(env).toSeq.sortBy(_._1)
          .foreach { case (k, v) => println(s"$k = $v") }
      case "flowgroups" =>
        val env = args.lift(2).getOrElse("dev")
        project.flowgroups(env, lenient = true)
          .groupBy(_.pipeline).toSeq.sortBy(_._1)
          .foreach { case (pipeline, fgs) =>
            println(pipeline)
            fgs.sortBy(_.flowgroup).foreach { fg =>
              println(s"  ${fg.flowgroup} (${fg.actions.size} actions)")
            }
          }
      case other =>
        throw new IllegalArgumentException(s"unknown subcommand '$other'")
    }
  }
}
