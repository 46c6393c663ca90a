package graft.config

import java.nio.file.Files

import graft.SparkSuite
import graft.operators.Expectations

class YamlConfigSpec extends SparkSuite {

  test("expectations map format: constraint -> {action, name}") {
    val rules = YamlConfig.parseRules(
      new org.yaml.snakeyaml.Yaml().load[Any](
        """"v > 0": {action: drop, name: positive}
          |"v < 100": {action: warn}
          |""".stripMargin))
    assert(rules.toSet == Set(
      Expectations.Rule("positive", "v > 0", Expectations.Drop),
      Expectations.Rule("v < 100", "v < 100", Expectations.Warn)))
  }

  test("expectations file: JSON list format with failureAction") {
    val f = Files.createTempFile("exp", ".json")
    Files.writeString(f,
      """{"expectations": [
        |  {"name": "valid_key", "expression": "id IS NOT NULL", "failureAction": "fail"},
        |  {"name": "valid_v", "expression": "v >= 0", "failureAction": "drop"}
        |]}""".stripMargin)
    val rules = YamlConfig.rulesFromFile(f.toString)
    assert(rules == Seq(
      Expectations.Rule("valid_key", "id IS NOT NULL", Expectations.Fail),
      Expectations.Rule("valid_v", "v >= 0", Expectations.Drop)))
  }

  test("expectations file: bare YAML list") {
    val f = Files.createTempFile("exp", ".yaml")
    Files.writeString(f,
      """- {name: r1, expression: "x > 0", failureAction: warn}
        |""".stripMargin)
    assert(YamlConfig.rulesFromFile(f.toString) ==
      Seq(Expectations.Rule("r1", "x > 0", Expectations.Warn)))
  }

  test("cloudfiles format falls back to the cloudFiles.format option") {
    import graft.model.CloudFilesLoad
    val fg = YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |actions:
        |  - name: l
        |    type: load
        |    source:
        |      type: cloudfiles
        |      path: /data/in
        |      options: {cloudFiles.format: csv}
        |    target: v
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: streaming_table, table: t}
        |""".stripMargin)
    assert(fg.actions.head.asInstanceOf[CloudFilesLoad].format == "csv")
  }

  test("cdc_config: sequence_by parses as scalar, single-item list, and multi-column list") {
    import graft.model.StreamingTableWrite
    def parse(seqBy: String) = YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: w
         |    type: write
         |    source: v
         |    write_target: {type: streaming_table, table: t}
         |    cdc_config:
         |      keys: [k]
         |      sequence_by: $seqBy
         |      scd_type: 2
         |""".stripMargin)
      .actions.head.asInstanceOf[StreamingTableWrite].cdc.get.sequenceBy
    assert(parse("ts") == Seq("ts"))
    assert(parse("[ts]") == Seq("ts"))
    assert(parse("[d, tiebreak]") == Seq("d", "tiebreak"))
  }

  test("unsupported options fail loudly: time travel, CDF-external, cluster/refresh/temporary") {
    def load(extra: String) = YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    source: {type: delta, table: t, $extra}
         |    target: v
         |""".stripMargin)
    // TIMESTAMP time travel is a feature since round 7 too (commit-ts sidecar)
    assert(load("timestamp_as_of: \"2026-01-01\"").actions.head
      .asInstanceOf[graft.model.TableLoad].timestampAsOf.contains("2026-01-01"))
    // VERSION time travel is a feature since round 7 (change-log replay)
    assert(load("version_as_of: 3").actions.head
      .asInstanceOf[graft.model.TableLoad].versionAsOf.contains(3L))
    assert(load("options: {versionAsOf: \"3\"}").actions.head
      .asInstanceOf[graft.model.TableLoad].versionAsOf.contains(3L))
    assert(intercept[YamlConfig.ConfigError](load("read_change_feed: true"))
      .msg.contains("readChangeFeed")) // removed spelling, reference posture
    assert(load("options: {timestampAsOf: \"2026-01-01\"}").actions.head
      .asInstanceOf[graft.model.TableLoad].timestampAsOf.contains("2026-01-01"))
    assert(intercept[YamlConfig.ConfigError](
      load("version_as_of: 3, timestamp_as_of: \"2026-01-01\""))
      .msg.contains("ambiguous"))
    assert(intercept[YamlConfig.ConfigError](
      load("""version_as_of: 3, options: {readChangeFeed: "true", startingVersion: "0"}"""))
      .msg.contains("incompatible"))
    assert(intercept[YamlConfig.ConfigError](
      load("version_as_of: 3, readMode: stream")).msg.contains("batch only"))

    def write(extra: String) = YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: w
         |    type: write
         |    source: v
         |    write_target: {type: streaming_table, table: t, $extra}
         |""".stripMargin)
    // cluster_columns is a FEATURE (range-clustered writes), not an error
    import graft.model.StreamingTableWrite
    assert(write("cluster_columns: [a, b]").actions.head
      .asInstanceOf[StreamingTableWrite].clusterColumns == Seq("a", "b"))
    assert(intercept[YamlConfig.ConfigError](write("refresh_schedule: \"0 * * * *\""))
      .msg.contains("refresh_schedule"))
    assert(intercept[YamlConfig.ConfigError](write("temporary: true")).msg.contains("temporary"))
  }

  test("readChangeFeed routes to the __changes companion with version bounds") {
    def load(extra: String, readMode: String = "batch") = YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    readMode: $readMode
         |    source: {type: delta, table: dim, $extra}
         |    target: v
         |""".stripMargin).actions.head.asInstanceOf[graft.model.TableLoad]

    val bounded = load("""options: {readChangeFeed: "true", startingVersion: "2", endingVersion: "5"}""")
    assert(bounded.table == "dim__changes")
    assert(bounded.cdfStartingVersion.contains(2L) && bounded.cdfEndingVersion.contains(5L))

    // stream: startingVersion ok, endingVersion is batch-only (delta.py:160)
    val s = load("""options: {readChangeFeed: "true", startingVersion: "2"}""", "stream")
    assert(s.table == "dim__changes" && s.cdfStartingVersion.contains(2L))
    assert(intercept[YamlConfig.ConfigError](
      load("""options: {readChangeFeed: "true", startingVersion: "0", endingVersion: "5"}""", "stream"))
      .msg.contains("endingVersion"))

    // batch CDF requires a starting bound (delta.py VAL_013)
    assert(intercept[YamlConfig.ConfigError](load("""options: {readChangeFeed: "true"}"""))
      .msg.contains("startingVersion"))
    // timestamp CDF bounds parse into the model (resolved at run time)
    val tsb = load("""options: {readChangeFeed: "true", startingTimestamp: "2026-01-01",
                     endingTimestamp: "2026-02-01"}""")
    assert(tsb.cdfStartingTimestamp.contains("2026-01-01")
      && tsb.cdfEndingTimestamp.contains("2026-02-01"))
    assert(intercept[YamlConfig.ConfigError](
      load("""options: {readChangeFeed: "true", startingVersion: "0", startingTimestamp: "2026-01-01"}"""))
      .msg.contains("ambiguous"))
    // ... and the ENDING pair equally (accepting it would silently intersect)
    assert(intercept[YamlConfig.ConfigError](
      load("""options: {readChangeFeed: "true", startingVersion: "0", endingVersion: "5", endingTimestamp: "2026-01-01"}"""))
      .msg.contains("ambiguous"))
    assert(intercept[YamlConfig.ConfigError](
      load("""options: {readChangeFeed: "true", startingTimestamp: "2026-01-01", endingTimestamp: "2026-02-01"}""", "stream"))
      .msg.contains("endingVersion/endingTimestamp"))
    // incompatible pair (delta.py:110)
    assert(intercept[YamlConfig.ConfigError](
      load("""options: {readChangeFeed: "true", startingVersion: "0", skipChangeCommits: "true"}"""))
      .msg.contains("incompatible"))
    // CDF bounds without readChangeFeed are a loud error, not absorbed
    assert(intercept[YamlConfig.ConfigError](load("""options: {startingVersion: "2"}"""))
      .msg.contains("readChangeFeed"))
    // non-integer version
    assert(intercept[YamlConfig.ConfigError](
      load("""options: {readChangeFeed: "true", startingVersion: "abc"}"""))
      .msg.contains("integer"))
  }

  test("unrecognized table-load options are loud: typo'd bounds cannot widen a window") {
    def yaml(extra: String) =
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    source: {type: delta, table: t, $extra}
         |    target: v
         |""".stripMargin
    // a typo'd bound would otherwise silently read an UNBOUNDED window
    assert(intercept[YamlConfig.ConfigError](YamlConfig.parseFlowGroup(
      yaml("""options: {readChangeFeed: "true", startingVersion: "0", endingVerison: "5"}""")))
      .msg.contains("endingVerison"))
    // a recognized stream-only option on a batch read is a CONTRACT error,
    // not an unknown-option warning — loud even where unknowns are lenient
    assert(intercept[YamlConfig.ConfigError](YamlConfig.parseFlowGroup(
      yaml("""options: {maxFilesPerTrigger: "4"}"""))).msg.contains("maxFilesPerTrigger"))
    // lenient mode (validate/show CLI paths) degrades UNKNOWNS to a warning
    val fg = YamlConfig.parseFlowGroup(
      yaml("""options: {withEventTimeOrder: "true"}"""), lenient = true)
    assert(fg.actions.head.isInstanceOf[graft.model.TableLoad])
  }

  test("write mode is an allowlist — a typo cannot silently degrade the write") {
    def yaml(writeType: String, mode: String, extra: String = "") =
      s"""pipeline: p
         |flowgroup: wm
         |actions:
         |  - name: w
         |    type: write
         |    source: v
         |    sql: "SELECT 1 AS x"
         |    write_target:
         |      type: $writeType
         |      table: t
         |      mode: $mode
         |$extra""".stripMargin
    // downstream dispatch is Option.contains — pre-fix these parsed fine
    // and ran as plain append / full refresh
    val e1 = intercept[YamlConfig.ConfigError](
      YamlConfig.parseFlowGroup(yaml("materialized_view", "incrementall")))
    assert(e1.msg.contains("unknown mode 'incrementall'") &&
      e1.msg.contains("incremental_join"), e1.msg)
    val e2 = intercept[YamlConfig.ConfigError](
      YamlConfig.parseFlowGroup(yaml("streaming_table", "snapshot-cdc")))
    assert(e2.msg.contains("snapshot_cdc"), e2.msg)
    // mode: snapshot_cdc REQUIRES its config — without it every run would
    // plain-append the full snapshot (deletes never diffed)
    val e3 = intercept[YamlConfig.ConfigError](
      YamlConfig.parseFlowGroup(yaml("streaming_table", "snapshot_cdc")))
    assert(e3.msg.contains("snapshot_cdc_config"), e3.msg)
    // the reference corpus's advisory spellings stay valid
    YamlConfig.parseFlowGroup(yaml("streaming_table", "cdc",
      """      cdc_config: {keys: [k], sequence_by: [ts]}
        |""".stripMargin)): Unit
    YamlConfig.parseFlowGroup(yaml("streaming_table", "standard")): Unit
  }

  test("resolveAndParse substitutes BEFORE validation — tokens in validated fields work") {
    // pre-fix, the pre-substitution parse validated the literal token text
    // and threw "maxFilesPerTrigger must be a positive integer, got '{rate}'"
    val yaml =
      """pipeline: p
        |flowgroup: rp
        |variables:
        |  fmt: json
        |actions:
        |  - name: l
        |    type: load
        |    source:
        |      type: cloudfiles
        |      path: /tmp/x
        |      format: "%{fmt}"
        |      readMode: stream
        |      options: {maxFilesPerTrigger: "{rate}"}
        |    target: v
        |""".stripMargin
    val fg = YamlConfig.resolveAndParse(yaml, Map.empty, Map("rate" -> "4"))
    val load = fg.actions.head.asInstanceOf[graft.model.CloudFilesLoad]
    assert(load.format == "json")
    assert(load.options("maxFilesPerTrigger") == "4")
  }

  test("unknown action type and failureAction are errors") {
    intercept[YamlConfig.ConfigError] {
      YamlConfig.parseAction(Map("name" -> "a", "type" -> "nonsense"))
    }
    intercept[YamlConfig.ConfigError] {
      YamlConfig.parseRules(new org.yaml.snakeyaml.Yaml().load[Any](
        """- {name: r, expression: "1=1", failureAction: explode}"""))
    }
  }

  test("silent-dispatch guards: readMode, mode cdc, recompute keys, sink_type") {
    def parse(y: String) = YamlConfig.parseFlowGroup(y)
    def fgYaml(action: String) =
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |$action""".stripMargin
    // a typo'd readMode silently selected batch-mode dispatch before
    val e1 = intercept[YamlConfig.ConfigError](parse(fgYaml(
      """  - name: l
        |    type: load
        |    source: {type: cloudfiles, path: /tmp/x, format: json, readMode: streaming}
        |    target: v""".stripMargin)))
    assert(e1.msg.contains("readMode") && e1.msg.contains("streaming"))
    // jdbc loads are batch-only — refuse readMode: stream by name
    val e2 = intercept[YamlConfig.ConfigError](parse(fgYaml(
      """  - name: l
        |    type: load
        |    source: {type: jdbc, url: "jdbc:derby:x", dbtable: t, readMode: stream}
        |    target: v""".stripMargin)))
    assert(e2.msg.contains("batch-only"))
    // mode: cdc without cdc_config plain-appended every CDC batch before
    val e3 = intercept[YamlConfig.ConfigError](parse(fgYaml(
      """  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: streaming_table, table: t, mode: cdc}""".stripMargin)))
    assert(e3.msg.contains("cdc_config"))
    // recompute map refuses unknown keys (a typo'd buckets fell back to 64)
    val e4 = intercept[YamlConfig.ConfigError](parse(fgYaml(
      """  - name: w
        |    type: write
        |    sql: "SELECT 1 AS x"
        |    write_target:
        |      type: materialized_view
        |      table: t
        |      mode: incremental_recompute
        |      recompute: {view: v, buckts: 512}""".stripMargin)))
    assert(e4.msg.contains("buckts"))
    // a sink needs sink_type (a typo'd key selected the files default and
    // wrote parquet while the intended connector received nothing)
    val e5 = intercept[YamlConfig.ConfigError](parse(fgYaml(
      """  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: sink, sinktype: kafka}""".stripMargin)))
    assert(e5.msg.contains("sink_type"))
    // source_function with a typo'd class key silently switched snapshot
    // polling into source-view diffing
    val e6 = intercept[YamlConfig.ConfigError](parse(fgYaml(
      """  - name: w
        |    type: write
        |    source: v
        |    write_target:
        |      type: streaming_table
        |      table: t
        |      mode: snapshot_cdc
        |      snapshot_cdc_config:
        |        keys: [k]
        |        sequence_by: [s]
        |        source_function: {className: com.x.Poller}""".stripMargin)))
    assert(e6.msg.contains("source_function") && e6.msg.contains("className"))
  }
}
