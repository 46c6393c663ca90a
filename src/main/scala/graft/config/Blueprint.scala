package graft.config

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

import graft.model.FlowGroup

/** Blueprints: programmatic flowgroup factories (reference:
  * src/lhp/parsers/blueprint_parser.py, models/_blueprint.py:16-70 — used to
  * expand 600 synthetic flowgroups in the perf fixture).
  *
  * A blueprint document carries a flowgroup *template body* plus a list of
  * `instances` (parameter maps); expansion renders the body once per
  * instance through the same `{{ param }}` substitution as action templates.
  *
  * ```yaml
  * blueprint: ingest_family
  * instances:
  *   - {table: customer, format: csv}
  *   - {table: orders, format: json}
  * flowgroup_template: |
  *   pipeline: bronze
  *   flowgroup: ingest_{{ table }}
  *   actions: ...
  * ```
  */
object Blueprint {

  final case class Doc(name: String, instances: Seq[Map[String, String]], body: String)

  def parse(yamlText: String): Doc = {
    val root = new Yaml().load[Any](yamlText).asInstanceOf[java.util.Map[String, Any]]
      .asScala.map { case (k, v) => k.toString -> v }.toMap
    val instances = root.get("instances") match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map {
        case m: java.util.Map[_, _] =>
          m.asScala.map { case (k, v) => k.toString -> String.valueOf(v) }.toMap
        case other => throw YamlConfig.ConfigError(s"blueprint instance must be a map: $other")
      }
      case _ => Nil
    }
    Doc(
      root.get("blueprint").map(_.toString).getOrElse("blueprint"),
      instances,
      root.get("flowgroup_template").map(_.toString)
        .getOrElse(throw YamlConfig.ConfigError("blueprint missing 'flowgroup_template'")))
  }

  /** Expand a blueprint into concrete flowgroups via the shared resolution
    * pipeline (templates/presets/tokens still apply per instance). */
  def expand(doc: Doc,
      templates: Map[String, String] = Map.empty,
      presets: Map[String, String] = Map.empty,
      tokens: Map[String, String] = Map.empty): Seq[FlowGroup] =
    doc.instances.map { params =>
      val rendered = FlowGroupResolver.renderTemplate(
        FlowGroupResolver.Template(doc.name, Map.empty, doc.body), params)
      FlowGroupResolver.resolve(rendered, templates, presets, tokens)
    }
}
