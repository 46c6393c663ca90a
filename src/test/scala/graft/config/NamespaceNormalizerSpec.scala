package graft.config

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Legacy `database` namespace normalization (reference
  * core/processing/namespace_normalizer.py): the soft-deprecated packed
  * `database: "catalog.schema"` field auto-converts to the explicit
  * 3-level namespace with a warning; the migration MISTAKES the reference
  * hard-rejects (dot-less database — CFG_011/012; DDL text in the
  * namespace `schema` field — CFG_013) stay hard errors here. Before this
  * spec the engine silently composed `database.table` 2-level names and
  * dropped the catalog in the delta Format-A case — exactly the
  * silently-wrong namespace the normalizer exists to prevent. */
class NamespaceNormalizerSpec extends AnyFunSuite {

  private def parseWrite(wtFields: String): Action = YamlConfig.parseDocuments(
    s"""pipeline: p
       |flowgroup: f
       |actions:
       |  - name: w
       |    type: write
       |    source: v
       |    write_target:
       |      $wtFields
       |""".stripMargin).head.actions.head

  private def parseLoad(srcFields: String): Action = YamlConfig.parseDocuments(
    s"""pipeline: p
       |flowgroup: f
       |actions:
       |  - name: l
       |    type: load
       |    target: v
       |    source:
       |      $srcFields
       |""".stripMargin).head.actions.head

  test("write target: dotted database splits into catalog.schema.table") {
    val a = parseWrite("type: streaming_table\n      database: cat.sch\n      table: t")
      .asInstanceOf[StreamingTableWrite]
    assert(a.table == "cat.sch.t")
  }

  test("write target: dot-less database is a hard error in every mode") {
    val e = intercept[YamlConfig.ConfigError](
      parseWrite("type: streaming_table\n      database: justaschema\n      table: t"))
    assert(e.msg.contains("justaschema") && e.msg.contains("catalog.schema"), e.msg)
    // NOT downgraded by lenient — a wrong namespace is a config mistake,
    // not an advisory feature gap
    intercept[YamlConfig.ConfigError](YamlConfig.parseDocuments(
      """pipeline: p
        |flowgroup: f
        |actions:
        |  - name: w
        |    type: write
        |    source: v
        |    write_target:
        |      type: streaming_table
        |      database: justaschema
        |      table: t
        |""".stripMargin, lenient = true))
  }

  test("write target: schema next to database is the pre-0.7.8 DDL alias") {
    val a = parseWrite("type: streaming_table\n      database: cat.sch\n" +
      "      schema: \"id BIGINT, name STRING\"\n      table: t")
      .asInstanceOf[StreamingTableWrite]
    assert(a.table == "cat.sch.t")
    assert(a.tableSchemaDdl.contains("id BIGINT, name STRING"))
  }

  test("write target: DDL text in the namespace schema field is rejected") {
    val e = intercept[YamlConfig.ConfigError](
      parseWrite("type: streaming_table\n      catalog: c\n" +
        "      schema: \"id BIGINT, name STRING\"\n      table: t"))
    assert(e.msg.contains("table_schema"), e.msg)
  }

  test("write target: a plain schema name never trips the DDL detector") {
    // single words (no space) and spaced names without type keywords pass
    val a = parseWrite("type: streaming_table\n      catalog: c\n" +
      "      schema: silver\n      table: t").asInstanceOf[StreamingTableWrite]
    assert(a.table == "c.silver.t")
  }

  test("materialized view gets the same normalization") {
    val a = parseWrite("type: materialized_view\n      database: cat.sch\n      table: mv")
      .asInstanceOf[MaterializedViewWrite]
    assert(a.table == "cat.sch.mv")
  }

  test("delta source: dotted database splits into catalog.schema.table") {
    val a = parseLoad("type: delta\n      database: cat.sch\n      table: t")
      .asInstanceOf[TableLoad]
    assert(a.table == "cat.sch.t")
  }

  test("delta source Format A: explicit catalog + dot-less database = schema") {
    // the case the old `qualified` got silently WRONG (dropped the catalog)
    val a = parseLoad("type: delta\n      catalog: c\n      database: sch\n      table: t")
      .asInstanceOf[TableLoad]
    assert(a.table == "c.sch.t")
  }

  test("delta source: dot-less database without catalog is a hard error") {
    val e = intercept[YamlConfig.ConfigError](
      parseLoad("type: delta\n      database: sch\n      table: t"))
    assert(e.msg.contains("sch") && e.msg.contains("catalog.schema"), e.msg)
  }

  test("explicit catalog/schema pass through untouched on both surfaces") {
    val w = parseWrite("type: streaming_table\n      catalog: c\n" +
      "      schema: s\n      table: t").asInstanceOf[StreamingTableWrite]
    assert(w.table == "c.s.t")
    val l = parseLoad("type: delta\n      catalog: c\n      schema: s\n      table: t")
      .asInstanceOf[TableLoad]
    assert(l.table == "c.s.t")
  }

  test("schema-only DDL refuses; a defaulted table name still qualifies") {
    // DDL in `schema` WITHOUT a catalog used to slip through as a garbage
    // namespace ("id BIGINT, name STRING.t") and fail later in the store
    val e = intercept[graft.config.YamlConfig.ConfigError] {
      graft.config.YamlConfig.parseFlowGroup(
        """pipeline: p
          |flowgroup: f
          |actions:
          |  - name: w
          |    type: write
          |    source: v
          |    write_target: {type: streaming_table, table: t,
          |                   schema: "id BIGINT, name STRING"}
          |""".stripMargin)
    }
    assert(e.msg.contains("DDL"), e.msg)
    // no `table:` key: the defaulted action name must qualify exactly like
    // an explicit one (it used to land bare in the flat namespace)
    val fg = graft.config.YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |actions:
        |  - name: orders
        |    type: write
        |    source: v
        |    write_target: {type: streaming_table, catalog: main, schema: silver}
        |""".stripMargin)
    val w = fg.actions.collectFirst { case w: graft.model.StreamingTableWrite => w }.get
    assert(w.table == "main.silver.orders", w.table)
  }
}
