package graft.sources

import org.apache.spark.sql.DataFrame

import graft.config.YamlConfig.ConfigError
import graft.model.KafkaLoad

/** Kafka option assembly, factored out of the runner so the full option
  * contract is unit-testable WITHOUT a broker or the kafka connector jar
  * (reference: src/lhp/generators/load/kafka.py:13-183,
  * templates/write/sinks/kafka_sink.py.j2:1-32). The runner feeds these maps
  * to `readStream.format("kafka")` / `writeStream.format("kafka")`; the only
  * untestable residue in this environment is the broker I/O itself. */
object KafkaSupport {

  /** Spark's kafka source accepts EXACTLY ONE of subscribe /
    * subscribePattern / assign; validate here so a bad YAML fails at plan
    * time with a config error, not inside the connector at stream start. */
  def readerOptions(a: KafkaLoad): Map[String, String] = {
    // a mode may arrive as a model field OR through the generic options map
    // (both YAML spellings occur in the wild); any disagreement refuses
    // option keys match CASE-INSENSITIVELY (the connector's own reader
    // treats them so): a 'Subscribe:' spelling must count as a mode here,
    // or plan-time validation and the connector disagree — either a late
    // multi-mode failure at stream start or a spurious 'got 0' refusal
    def mode(k: String, field: Option[String]): Option[(String, String)] = {
      // collect ALL spellings — the typed field plus every case variant in
      // the options map ('subscribe' + 'Subscribe'): conflicting values
      // from ANY two of them would otherwise pick a silent winner (map
      // iteration order between variants, field-beats-option between
      // layers) and drop the loser — conflict is a refusal, duplicate
      // agreement collapses
      val spellings = (field.toSeq ++ a.options.collect {
        case (ok, v) if ok.equalsIgnoreCase(k) => v
      }).distinct
      if (spellings.size > 1)
        throw ConfigError(s"kafka load '${a.name}': mode '$k' is given " +
          s"more than once (field and/or case-variant option spellings) " +
          s"with conflicting values (${spellings.mkString(", ")}) — keep one")
      spellings.headOption.map(k -> _)
    }
    val modes = Seq(
      mode("subscribe", a.subscribe),
      mode("subscribePattern", a.subscribePattern),
      mode("assign", a.assign)).flatten
    if (modes.size != 1)
      throw ConfigError(s"kafka load '${a.name}': exactly one of subscribe, " +
        s"subscribe_pattern, assign is required (got ${modes.size}: " +
        s"${modes.map(_._1).mkString(", ")})")
    // kafka.* options pass through to the consumer config; connector-level
    // options (startingOffsets, maxOffsetsPerTrigger, …) pass as-is
    a.options ++ modes.toMap +
      ("kafka.bootstrap.servers" -> a.bootstrapServers)
  }

  /** Kafka sink rows need a `value` column (key/partition/topic optional —
    * the connector's contract); a `topic` must come from either the options
    * or a column. */
  def sinkOptions(name: String, options: Map[String, String],
      columns: Seq[String]): Map[String, String] = {
    if (!columns.contains("value"))
      throw ConfigError(s"kafka sink '$name' needs a 'value' column " +
        s"(got: ${columns.mkString(", ")})")
    if (!options.contains("topic") && !columns.contains("topic"))
      throw ConfigError(s"kafka sink '$name' needs a 'topic' option or column")
    if (!options.contains("kafka.bootstrap.servers"))
      throw ConfigError(s"kafka sink '$name' missing kafka.bootstrap.servers")
    options
  }

  /** Projection helper: serialize non-binary key/value columns to the
    * BINARY/STRING types the connector requires, leaving conforming columns
    * untouched. */
  def conformColumns(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.name match {
        case "key" | "value" => f.dataType match {
          case BinaryType | StringType => d
          case _: StructType | _: ArrayType | _: MapType =>
            d.withColumn(f.name, to_json(col(f.name)))
          case _ => d.withColumn(f.name, col(f.name).cast(StringType))
        }
        case _ => d
      }
    }
  }
}
