package graft.config

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Schema-transform definition parsing — the reference's arrow + legacy
  * formats (reference: src/lhp/parsers/schema_transform_parser.py:22-260,
  * generators/transform/schema.py:50-110). These live FLAT on the action
  * (`schema_inline` / `schema_file` / `enforcement`), not under a nested
  * map — a reference-shaped schema transform must parse into real
  * renames/casts, not a silent no-op.
  *
  * Arrow format (one string per column):
  *   - `old -> new: TYPE`  rename + cast
  *   - `old -> new`        rename only
  *   - `col: TYPE`         cast only
  *   - `col`               pass-through (declares the column for strict mode)
  *
  * Legacy format: `column_mapping: {old: new}` + `type_casting: {col: TYPE}`
  * + `pass_through_columns: [col, ...]`.
  *
  * `$` is legal wherever a name REFERENCES a source column (left of `->`,
  * a cast-only name, a pass-through) — Databricks metadata columns carry it
  * — but a freshly MINTED rename target must be a plain identifier
  * (reference-vs-mint invariant, schema_transform_parser.py:16-20).
  */
object SchemaTransformParser {

  final case class Parsed(
      renames: Map[String, String],   // old -> new (insertion order not significant)
      casts: Map[String, String],     // target/output name -> SQL type
      declared: Seq[String])          // output columns, for strict enforcement

  private val SourceCol = "[a-zA-Z_$][a-zA-Z0-9_$]*"
  private val TargetCol = "[a-zA-Z_][a-zA-Z0-9_]*"
  private val ArrowPat = s"^\\s*($SourceCol)\\s*->\\s*($TargetCol)\\s*(?::\\s*(.+?))?\\s*$$".r
  private val CastPat = s"^\\s*($SourceCol)\\s*:\\s*(.+?)\\s*$$".r
  private val PassPat = s"^\\s*($SourceCol)\\s*$$".r

  import YamlConfig.ConfigError

  /** Parse a `schema_inline` string: a YAML document with `columns:` /
    * legacy keys, or plain arrow lines. */
  def parseInline(text: String): Parsed = {
    if (text == null || text.trim.isEmpty) throw ConfigError(
      "schema_inline is empty — provide arrow lines ('old -> new: TYPE') or a 'columns:' list")
    val loaded = scala.util.Try(new Yaml().load[Any](text)).toOption
    loaded match {
      case Some(m: java.util.Map[_, _]) =>
        val keys = m.asScala.keys.map(_.toString).toSet
        if (keys("columns") || keys("column_mapping") || keys("type_casting"))
          parseData(asMap(m))
        else parseArrowLines(text)
      case _ => parseArrowLines(text)
    }
  }

  /** Parse an external schema-transform file's contents (schema_file). */
  def parseFileText(text: String): Parsed =
    new Yaml().load[Any](text) match {
      case m: java.util.Map[_, _] => parseData(asMap(m))
      case other => throw ConfigError(
        s"schema transform file must be a YAML map with 'columns' or " +
          s"'column_mapping'/'type_casting', got: $other")
    }

  private def parseArrowLines(text: String): Parsed = {
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    if (lines.isEmpty) throw ConfigError(
      "schema_inline has no column definitions")
    parseArrow(lines)
  }

  private def parseData(m: Map[String, Any]): Parsed = {
    val hasColumns = m.contains("columns")
    val hasLegacy = m.contains("column_mapping") || m.contains("type_casting")
    if (hasColumns && hasLegacy) throw ConfigError(
      "schema transform: use either 'columns' (arrow format) OR " +
        "'column_mapping'/'type_casting' (legacy format), not both")
    if (hasColumns) m("columns") match {
      case l: java.util.List[_] => parseArrow(l.asScala.toSeq.map {
        case s: String => s
        case other => throw ConfigError(
          s"schema transform 'columns' entries must be strings (quote the " +
            s"arrow line in YAML), got: $other")
      })
      case other => throw ConfigError(s"schema transform 'columns' must be a list, got: $other")
    } else if (hasLegacy) {
      val renames = strMap(m, "column_mapping")
      val casts = strMap(m, "type_casting")
      val pass = m.get("pass_through_columns") match {
        case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
        case _ => Nil
      }
      Parsed(renames, casts,
        (renames.values.toSeq ++ casts.keys.filterNot(renames.values.toSet) ++ pass).distinct)
    } else throw ConfigError(
      "schema transform needs 'columns' (arrow format) or " +
        "'column_mapping'/'type_casting' (legacy format)")
  }

  private def parseArrow(lines: Seq[String]): Parsed = {
    val renames = scala.collection.mutable.LinkedHashMap[String, String]()
    val casts = scala.collection.mutable.LinkedHashMap[String, String]()
    val declared = scala.collection.mutable.LinkedHashSet[String]()
    val sourcesSeen = scala.collection.mutable.Set[String]()
    lines.foreach {
      case ArrowPat(src, tgt, tpe) =>
        if (sourcesSeen.contains(src)) throw ConfigError(
          s"schema transform: source column '$src' is mapped more than once")
        if (declared.contains(tgt)) throw ConfigError(
          s"schema transform: target column '$tgt' is declared more than once")
        sourcesSeen += src
        declared += tgt
        renames(src) = tgt
        if (tpe != null) casts(tgt) = tpe
      case CastPat(name, tpe) =>
        if (casts.contains(name)) throw ConfigError(
          s"schema transform: column '$name' has more than one type cast")
        if (sourcesSeen.contains(name)) throw ConfigError(
          s"schema transform: '$name' was renamed above — cast the target column instead")
        declared += name
        casts(name) = tpe
      case PassPat(name) =>
        // pass-throughs share the duplicate/contradiction contract of the
        // arrow lines: a column consumed by a rename no longer exists to
        // pass through, and re-declaring an output is ambiguous
        if (sourcesSeen.contains(name)) throw ConfigError(
          s"schema transform: '$name' was renamed above — it cannot also pass through")
        if (declared.contains(name)) throw ConfigError(
          s"schema transform: column '$name' is declared more than once")
        declared += name
      case bad => throw ConfigError(
        s"schema transform: unparseable column definition '$bad' — expected " +
          "'old -> new: TYPE', 'old -> new', 'col: TYPE', or 'col'")
    }
    Parsed(renames.toMap, casts.toMap, declared.toSeq)
  }

  private def strMap(m: Map[String, Any], k: String): Map[String, String] =
    m.get(k) match {
      case Some(mm: java.util.Map[_, _]) =>
        mm.asScala.map { case (a, b) => a.toString -> b.toString }.toMap
      case _ => Map.empty
    }

  private def asMap(m: java.util.Map[_, _]): Map[String, Any] =
    m.asScala.map { case (k, v) => k.toString -> v }.toMap
}
