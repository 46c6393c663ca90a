package graft.config

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

import org.apache.spark.sql.types._

/** Schema-file parsing: YAML/JSON schema documents → Spark `StructType`, and
  * schema-hint strings (reference: src/lhp/parsers/schema_parser.py:19-92,
  * core/codegen/struct_type_emitter.py:27-115).
  *
  * Format: `name` / `version` / `columns: [{name, type, nullable, comment}]`
  * / `primary_key`. Type vocabulary per SURVEY §1.2, with the reference's
  * lenient unknown-type → STRING fallback.
  */
object SchemaParser {

  final case class SchemaDoc(
      name: String,
      version: Option[String],
      schema: StructType,
      primaryKey: Seq[String])

  private val DecimalPat = "(?i)DECIMAL\\s*\\(\\s*(\\d+)\\s*,\\s*(\\d+)\\s*\\)".r

  /** The emitted type mapping (struct_type_emitter.py:27-44). */
  def sparkType(t: String): DataType = t.trim.toUpperCase match {
    case "STRING" | "VARCHAR" | "TEXT" => StringType
    case "BIGINT" | "LONG" => LongType
    case "INT" | "INTEGER" => IntegerType
    case "DOUBLE" => DoubleType
    case "FLOAT" | "REAL" => FloatType
    case "BOOLEAN" | "BOOL" => BooleanType
    case "DATE" => DateType
    case "TIMESTAMP" => TimestampType
    case "BINARY" => BinaryType
    case "BYTE" | "TINYINT" => ByteType
    case "SHORT" | "SMALLINT" => ShortType
    case s => DecimalPat.findFirstMatchIn(s) match {
      case Some(m) => DecimalType(m.group(1).toInt, m.group(2).toInt)
      case None => StringType // lenient fallback (struct_type_emitter.py:114-115)
    }
  }

  def parse(yamlText: String): SchemaDoc = {
    // an empty/comment-only file loads as null — name the problem instead
    // of NPEing on the cast (same guard parseTagsFile already has)
    val root = Option(new Yaml().load[Any](yamlText)).getOrElse(
      throw YamlConfig.ConfigError(
        "schema file is empty — expected 'columns:' (and optional " +
          "name/version/primary_key)"))
      .asInstanceOf[java.util.Map[String, Any]]
      .asScala.map { case (k, v) => k.toString -> v }.toMap
    val cols = root.get("columns") match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map { c =>
        val m = c.asInstanceOf[java.util.Map[String, Any]].asScala
        val name = m("name").toString
        val dt = sparkType(m.get("type").map(_.toString).getOrElse("STRING"))
        val nullable = m.get("nullable").forall(_.toString.toBoolean)
        val field = StructField(name, dt, nullable)
        m.get("comment").map(c => field.withComment(c.toString)).getOrElse(field)
      }
      case _ => throw YamlConfig.ConfigError("schema file missing 'columns'")
    }
    val pk = root.get("primary_key") match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
      case Some(s: String) => Seq(s)
      case _ => Nil
    }
    SchemaDoc(
      root.get("name").map(_.toString).getOrElse("schema"),
      root.get("version").map(_.toString),
      StructType(cols),
      pk)
  }

  /** A unified schema/tags file's tag content (reference:
    * parsers/tags_file_parser.py): the top-level `tags:` block plus
    * per-column `tags:` under `columns:`. Schema-only fields (type/
    * nullable/comment) are ignored, so one file serves as both
    * `table_schema` and `tags_file`. Null tag values (value-less UC tags)
    * read as empty strings. */
  final case class TagsDoc(
      table: Option[String],
      tags: Map[String, String],
      columnTags: Map[String, Map[String, String]]) {
    /** Table tags + column tags flattened as `column.<col>.<key>` — the
      * form the tags sidecar and the onTableTagged hook carry. */
    def flattened: Map[String, String] =
      tags ++ columnTags.flatMap { case (c, ts) =>
        ts.map { case (k, v) => s"column.$c.$k" -> v }
      }
  }

  /** Structural tag-presence probe (reference
    * unified_schema_format.schema_has_tags — the LHP-CFG-069 footgun
    * detector): a `table_schema` file is read for column TYPES only, so a
    * top-level `tags:` key or any per-column `tags:` key it carries is
    * silently dropped unless the same file is also wired as `tags_file`.
    * Presence of the key, not non-emptiness. */
  def hasTags(yamlText: String): Boolean =
    Option(new Yaml().load[Any](yamlText)).exists {
      case m: java.util.Map[_, _] =>
        val root = m.asScala.map { case (k, v) => k.toString -> v }
        root.contains("tags") || (root.get("columns") match {
          case Some(l: java.util.List[_]) => l.asScala.exists {
            case c: java.util.Map[_, _] =>
              c.asScala.keys.exists(_.toString == "tags")
            case _ => false
          }
          case _ => false
        })
      case _ => false
    }

  def parseTagsFile(yamlText: String): TagsDoc = {
    val root = Option(new Yaml().load[Any](yamlText))
      .map(_.asInstanceOf[java.util.Map[String, Any]].asScala
        .map { case (k, v) => k.toString -> v }.toMap)
      .getOrElse(Map.empty[String, Any])
    def tagMap(o: Any): Map[String, String] = o match {
      case m: java.util.Map[_, _] => m.asScala.map { case (k, v) =>
        k.toString -> Option(v).map(_.toString).getOrElse("") }.toMap
      case _ => Map.empty
    }
    val colTags = root.get("columns") match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.flatMap { c =>
        val m = c.asInstanceOf[java.util.Map[String, Any]].asScala
        val ts = m.get("tags").map(tagMap).getOrElse(Map.empty)
        if (ts.isEmpty) None
        else Some(m.getOrElse("name", throw YamlConfig.ConfigError(
          s"tags file: a 'columns' entry carries tags but no 'name' — " +
            s"tags cannot be attached to an unnamed column: ${m.toMap}")).toString -> ts)
      }.toMap
      case _ => Map.empty[String, Map[String, String]]
    }
    TagsDoc(
      // canonical `table` wins over its alias `name` (tags_file_parser.py)
      root.get("table").orElse(root.get("name")).map(_.toString),
      root.get("tags").map(tagMap).getOrElse(Map.empty),
      colTags)
  }

  private val Identifier = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Render a schema as `cloudFiles.schemaHints`-style `"col TYPE [NOT
    * NULL], ..."` with backtick-quoting of non-identifier names
    * (schema_parser.py:53-92). */
  def hints(schema: StructType): String =
    schema.fields.map { f =>
      val name = f.name match {
        case Identifier() => f.name
        case other => s"`$other`"
      }
      val notNull = if (f.nullable) "" else " NOT NULL"
      s"$name ${f.dataType.sql}$notNull"
    }.mkString(", ")
}
