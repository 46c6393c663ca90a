package graft.config

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

import graft.model.FlowGroup

/** Full flowgroup resolution pipeline — the ordered phases of the reference's
  * FlowgroupResolutionService (core/processing/flowgroup_resolver.py:66-253):
  * local variables → template expansion → preset deep-merge (template-level
  * then flowgroup-level) → token substitution → unresolved-token validation →
  * parse. Substitution is textual (on YAML source), matching the reference.
  */
object FlowGroupResolver {

  final case class Template(name: String, defaults: Map[String, String], body: String)

  /** Parse a template document: `name`, `parameters: [{name, default}]`,
    * and the raw `actions:` block kept as text for `{{ param }}` rendering
    * (the reference renders templates with Jinja; our parameter surface is
    * `{{ name }}` substitution — template_engine.py's main path). */
  def parseTemplate(yamlText: String): Template = {
    val root = new Yaml().load[Any](yamlText).asInstanceOf[java.util.Map[String, Any]].asScala
    val name = root.get("name").map(_.toString).getOrElse("template")
    val defaults = root.get("parameters") match {
      case Some(l: java.util.List[_]) => l.asScala.flatMap {
        case m: java.util.Map[_, _] =>
          val mm = m.asScala.map { case (k, v) => k.toString -> v }
          for (n <- mm.get("name"); d <- mm.get("default"))
            yield n.toString -> d.toString
        case _ => None
      }.toMap
      case _ => Map.empty[String, String]
    }
    Template(name, defaults, yamlText)
  }

  private val ParamPat = "\\{\\{\\s*([A-Za-z0-9_.-]+)\\s*\\}\\}".r

  /** Render `{{ param }}` placeholders with provided params over defaults. */
  def renderTemplate(t: Template, params: Map[String, String]): String = {
    val all = t.defaults ++ params
    ParamPat.replaceAllIn(t.body, m =>
      java.util.regex.Matcher.quoteReplacement(
        all.getOrElse(m.group(1),
          throw Substitution.UnresolvedToken(m.group(1), s"template ${t.name}"))))
  }

  /** Recursive deep merge: `overlay` wins on scalars; maps merge; action
    * lists merge positionally is wrong — the reference concatenates template
    * actions with flowgroup actions, and presets only contribute defaults, so
    * lists from the overlay replace lists from the base. */
  def deepMerge(base: Map[String, Any], overlay: Map[String, Any]): Map[String, Any] =
    (base.keySet ++ overlay.keySet).map { k =>
      k -> ((base.get(k), overlay.get(k)) match {
        case (Some(b: java.util.Map[_, _]), Some(o: java.util.Map[_, _])) =>
          mapToJava(deepMerge(javaToMap(b), javaToMap(o)))
        case (_, Some(o)) => o
        case (Some(b), None) => b
        case _ => null
      })
    }.toMap

  /** Resolve a flowgroup YAML document to a parsed FlowGroup.
    *
    * @param templates preset template documents by name
    * @param presets   preset YAML documents by name (partial flowgroup maps,
    *                  deep-merged under the flowgroup — flowgroup wins)
    * @param tokens    environment token map for `{token}` / `${token}`
    */
  def resolve(yamlText: String,
      templates: Map[String, String] = Map.empty,
      presets: Map[String, String] = Map.empty,
      tokens: Map[String, String] = Map.empty,
      secrets: Substitution.SecretProvider = Substitution.envSecrets): FlowGroup = {
    val yaml = new Yaml()
    val raw = javaToMap(yaml.load[Any](yamlText))

    // 1. local variables (textual %{var})
    val vars = raw.get("variables") match {
      case Some(m: java.util.Map[_, _]) => javaToMap(m).map { case (k, v) => k -> String.valueOf(v) }
      case _ => Map.empty[String, String]
    }

    // 2. template expansion: rendered template actions are appended
    val withTemplate: Map[String, Any] = raw.get("use_template") match {
      case Some(tName) =>
        val tDoc = templates.getOrElse(tName.toString,
          throw YamlConfig.ConfigError(s"unknown template '$tName'"))
        val params = raw.get("template_parameters") match {
          case Some(m: java.util.Map[_, _]) => javaToMap(m).map { case (k, v) => k -> String.valueOf(v) }
          case _ => Map.empty[String, String]
        }
        val rendered = javaToMap(yaml.load[Any](renderTemplate(parseTemplate(tDoc), params)))
        val tActions = rendered.get("actions").map(asList).getOrElse(Nil)
        val fgActions = raw.get("actions").map(asList).getOrElse(Nil)
        val merged = new java.util.ArrayList[Any]((tActions ++ fgActions).asJava)
        raw + ("actions" -> merged)
      case None => raw
    }

    // 3. presets: template-level then flowgroup-level, each chain deep-merged
    //    with the flowgroup winning
    val presetNames = withTemplate.get("presets").map(asList).getOrElse(Nil).map(_.toString)
    val presetBase = presetNames.foldLeft(Map.empty[String, Any]) { (acc, p) =>
      val doc = presets.getOrElse(p, throw YamlConfig.ConfigError(s"unknown preset '$p'"))
      deepMerge(acc, javaToMap(yaml.load[Any](doc)))
    }
    val mergedCfg = deepMerge(presetBase - "name", withTemplate)

    // 4. token/secret substitution, textually over the re-serialized document
    val text = yaml.dump(mapToJava(mergedCfg))
    val substituted = Substitution(text, vars, tokens, secrets)

    // 5. parse + (validation happens in Planner.validate at plan time)
    YamlConfig.parseFlowGroup(substituted)
  }

  // ------------------------------------------------------------------ java

  private def javaToMap(o: Any): Map[String, Any] = o match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, v) => k.toString -> v }.toMap
    case null => Map.empty
    case other => throw YamlConfig.ConfigError(s"expected map, got $other")
  }
  private def mapToJava(m: Map[String, Any]): java.util.Map[String, Any] = {
    val jm = new java.util.LinkedHashMap[String, Any]()
    m.foreach { case (k, v) => jm.put(k, v) }
    jm
  }
  private def asList(o: Any): Seq[Any] = o match {
    case l: java.util.List[_] => l.asScala.toSeq
    case _ => Nil
  }
}
