package graft

import java.nio.file.{Files, Paths}

/** `init` CLI — scaffold a new project directory (the reference CLI's
  * `lhp init` — src/lhp/cli/commands/init_command.py, minus the
  * Databricks-bundle/git extras, which are platform-specific):
  * manifest, per-env substitutions, and a sample template + pipeline that
  * validate out of the box (`graft.ValidateProject <dir> dev` passes).
  *
  * {{{
  * sbt "runMain graft.InitProject <dir> [name]"
  * }}}
  */
object InitProject {

  def scaffold(dir: String, name: String): Seq[String] = {
    val root = Paths.get(dir)
    require(!Files.exists(root.resolve("lhp.yaml")),
      s"$dir already contains an lhp.yaml — refusing to overwrite")
    val files = Seq(
      "lhp.yaml" ->
        s"""name: $name
           |version: "1.0"
           |include:
           |  - "**"
           |operational_metadata:
           |  columns:
           |    _processing_timestamp:
           |      expression: "F.current_timestamp()"
           |    _pipeline_run_id:
           |      expression: "'{run_id}'"
           |""".stripMargin,
      "substitutions/dev.yaml" ->
        """dev:
          |  env: dev
          |  catalog: dev_catalog
          |  bronze_schema: bronze_dev
          |""".stripMargin,
      "substitutions/prod.yaml" ->
        """prod:
          |  env: prod
          |  catalog: prod_catalog
          |  bronze_schema: bronze
          |""".stripMargin,
      "templates/ingest_template.yaml" ->
        """name: ingest_template
          |parameters:
          |  - {name: entity, required: true}
          |  - {name: landing, required: true}
          |actions:
          |  - name: load_{{ entity }}
          |    type: load
          |    source:
          |      type: cloudfiles
          |      path: "{{ landing }}"
          |      format: json
          |      readMode: stream
          |    target: v_{{ entity }}
          |  - name: write_{{ entity }}
          |    type: write
          |    source: v_{{ entity }}
          |    write_target:
          |      type: streaming_table
          |      schema: "{bronze_schema}"
          |      table: "{{ entity }}"
          |""".stripMargin,
      "pipelines/bronze/events.yaml" ->
        """pipeline: bronze
          |flowgroup: events_ingest
          |use_template: ingest_template
          |template_parameters:
          |  entity: events
          |  landing: /data/landing/events
          |""".stripMargin,
      "presets/.gitkeep" -> "",
      "schemas/.gitkeep" -> "",
      "expectations/.gitkeep" -> "")
    files.map { case (rel, text) =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, text)
      rel
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: InitProject <dir> [name]")
    val dir = args(0)
    val name = args.lift(1).getOrElse(Paths.get(dir).getFileName.toString)
    val written = scaffold(dir, name)
    written.foreach(f => println(s"[graft] created $f"))
    println(s"[graft] project '$name' initialized — validate with: " +
      s"runMain graft.ValidateProject $dir dev")
  }
}
