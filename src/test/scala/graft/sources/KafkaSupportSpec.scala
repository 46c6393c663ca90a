package graft.sources

import graft.SparkSuite
import graft.config.YamlConfig
import graft.config.YamlConfig.ConfigError
import graft.model.KafkaLoad

/** Broker-less contract tests for the kafka option surface (round-3 verdict
  * "Next round #6"): subscribe/pattern/assign exclusivity, consumer-config
  * pass-through, sink column/topic validation, and key/value serialization —
  * everything short of the broker I/O itself. */
class KafkaSupportSpec extends SparkSuite {
  import spark.implicits._

  private def load(sub: Option[String] = None, pat: Option[String] = None,
      assign: Option[String] = None, opts: Map[String, String] = Map.empty) =
    KafkaLoad("k", Some("v"), "host:9092", sub, pat, assign, opts)

  test("exactly one of subscribe/subscribePattern/assign") {
    val r = KafkaSupport.readerOptions(load(sub = Some("t1,t2")))
    assert(r("subscribe") == "t1,t2")
    assert(r("kafka.bootstrap.servers") == "host:9092")
    intercept[ConfigError] { KafkaSupport.readerOptions(load()) }
    intercept[ConfigError] {
      KafkaSupport.readerOptions(load(sub = Some("a"), pat = Some("b.*")))
    }
    assert(KafkaSupport.readerOptions(load(pat = Some("ev-.*")))
      .contains("subscribePattern"))
    assert(KafkaSupport.readerOptions(load(assign = Some("""{"t":[0,1]}""")))
      .contains("assign"))
  }

  test("a mode supplied via the generic options map is honored") {
    val r = KafkaSupport.readerOptions(load(opts = Map("subscribe" -> "topic_a")))
    assert(r("subscribe") == "topic_a")
    // field + conflicting option: refused (a silent field-beats-option
    // winner is the same class as the case-variant silent winner below)
    val eFo = intercept[graft.config.YamlConfig.ConfigError] {
      KafkaSupport.readerOptions(
        load(sub = Some("field_topic"), opts = Map("subscribe" -> "opt_topic")))
    }
    assert(eFo.msg.contains("more than once"), eFo.msg)
    // field + agreeing option: collapses
    val r2 = KafkaSupport.readerOptions(
      load(sub = Some("same_topic"), opts = Map("subscribe" -> "same_topic")))
    assert(r2("subscribe") == "same_topic")
    // two different modes across field and options: rejected
    intercept[graft.config.YamlConfig.ConfigError] {
      KafkaSupport.readerOptions(load(sub = Some("t"), opts = Map("assign" -> "{}")))
    }
    // two case-variant spellings of ONE mode with DIFFERENT values: a
    // map-iteration-order winner would silently drop the loser — refuse
    val e = intercept[graft.config.YamlConfig.ConfigError] {
      KafkaSupport.readerOptions(load(opts =
        Map("subscribe" -> "topic_a", "Subscribe" -> "topic_b")))
    }
    assert(e.msg.contains("more than once"), e.msg)
    // agreeing duplicates collapse rather than refuse
    val r3 = KafkaSupport.readerOptions(load(opts =
      Map("subscribe" -> "same", "Subscribe" -> "same")))
    assert(r3("subscribe") == "same")
  }

  test("consumer and connector options pass through") {
    val r = KafkaSupport.readerOptions(load(sub = Some("t"), opts = Map(
      "startingOffsets" -> "earliest",
      "maxOffsetsPerTrigger" -> "10000",
      "kafka.security.protocol" -> "SASL_SSL")))
    assert(r("startingOffsets") == "earliest")
    assert(r("maxOffsetsPerTrigger") == "10000")
    assert(r("kafka.security.protocol") == "SASL_SSL")
  }

  test("YAML kafka load parses the full option surface") {
    val fg = YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |actions:
        |  - name: k
        |    type: load
        |    source:
        |      type: kafka
        |      bootstrap_servers: b:9092
        |      subscribe_pattern: "events-.*"
        |      options: {startingOffsets: earliest}
        |    target: v
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: streaming_table, table: t}
        |""".stripMargin)
    val k = fg.actions.head.asInstanceOf[KafkaLoad]
    val r = KafkaSupport.readerOptions(k)
    assert(r("subscribePattern") == "events-.*")
    assert(r("startingOffsets") == "earliest")
  }

  test("sink validation: value column, topic, bootstrap servers") {
    val base = Map("kafka.bootstrap.servers" -> "b:9092", "topic" -> "out")
    assert(KafkaSupport.sinkOptions("s", base, Seq("value")) == base)
    intercept[ConfigError] { KafkaSupport.sinkOptions("s", base, Seq("key")) }
    intercept[ConfigError] {
      KafkaSupport.sinkOptions("s", base - "topic", Seq("value"))
    }
    // topic as a COLUMN also satisfies the contract
    KafkaSupport.sinkOptions("s", base - "topic", Seq("value", "topic"))
    intercept[ConfigError] {
      KafkaSupport.sinkOptions("s", base - "kafka.bootstrap.servers", Seq("value"))
    }
  }

  test("sink conformance serializes non-binary key/value") {
    val df = Seq((1, ("a", 2))).toDF("key", "value")
    val out = KafkaSupport.conformColumns(df)
    assert(out.schema("key").dataType.typeName == "string")
    assert(out.schema("value").dataType.typeName == "string")
    assert(out.select("value").as[String].head().contains("\"a\""))
    // binary/string already conform — untouched
    val ok = Seq(("k", Array[Byte](1))).toDF("key", "value")
    assert(KafkaSupport.conformColumns(ok).schema("value").dataType.typeName == "binary")
  }
}
