package graft.config

import java.nio.file.Files

import graft.SparkSuite

/** The dev-sandbox surface (reference core/sandbox/): team policy parsing,
  * personal profile loading, scope/env resolution, and the table-leaf
  * rename applied at the TableStore boundary. */
class SandboxSpec extends SparkSuite {
  import spark.implicits._

  private def cfg(yaml: String): Option[Sandbox.Config] = {
    val m = new org.yaml.snakeyaml.Yaml().load[Any](yaml)
      .asInstanceOf[java.util.Map[String, Any]]
    import scala.jdk.CollectionConverters._
    Sandbox.parseConfig(m.asScala.map { case (k, v) => k.toString -> v }.toMap)
  }

  test("sandbox config: defaults, strategy/pattern/env validation") {
    assert(cfg("name: p").isEmpty)
    val c = cfg(
      """sandbox:
        |  strategy: table
        |  table_pattern: "{table}_{namespace}"
        |  allowed_envs: [dev, tst]
        |""".stripMargin).get
    assert(c.tablePattern == "{table}_{namespace}" && c.allowedEnvs.contains(Seq("dev", "tst")))
    // defaults when the block is present but sparse
    assert(cfg("sandbox: {}").get == Sandbox.Config())
    val badStrat = intercept[YamlConfig.ConfigError](cfg("sandbox: {strategy: schema}"))
    assert(badStrat.msg.contains("schema"), badStrat.msg)
    val emptyEnvs = intercept[YamlConfig.ConfigError](cfg("sandbox: {allowed_envs: []}"))
    assert(emptyEnvs.msg.contains("allowed_envs"), emptyEnvs.msg)
    // pattern structure: {table} exactly once, {namespace} present, clean literals
    for (bad <- Seq("{namespace}_x", "{table}_{table}_{namespace}",
        "{namespace}-{table}", "{namespace}_{tabel}"))
      intercept[YamlConfig.ConfigError](
        cfg(s"""sandbox: {table_pattern: "$bad"}"""))
  }

  test("profile loading is explicit opt-in with loud failures") {
    val root = Files.createTempDirectory("graft-sbx")
    val missing = intercept[YamlConfig.ConfigError](Sandbox.loadProfile(root))
    assert(missing.msg.contains("profile"), missing.msg)
    Files.createDirectories(root.resolve(".lhp"))
    Files.writeString(root.resolve(".lhp/profile.yaml"),
      "namespace: alice_dev\npipelines: [bronze, \"gold_*\"]\n")
    val p = Sandbox.loadProfile(root)
    assert(p == Sandbox.Profile("alice_dev", Seq("bronze", "gold_*")))
    Files.writeString(root.resolve(".lhp/profile.yaml"),
      "namespace: Alice\npipelines: [bronze]\n")
    val badNs = intercept[YamlConfig.ConfigError](Sandbox.loadProfile(root))
    assert(badNs.msg.contains("Alice"), badNs.msg)
    Files.writeString(root.resolve(".lhp/profile.yaml"), "namespace: alice\n")
    val noPipes = intercept[YamlConfig.ConfigError](Sandbox.loadProfile(root))
    assert(noPipes.msg.contains("pipelines"), noPipes.msg)
  }

  test("scope resolution: env guard, globs, zero-match offenders, monitoring") {
    val profile = Sandbox.Profile("alice", Seq("bronze", "gold_*"))
    val discovered = Seq("bronze", "gold_eu", "gold_us", "lhp_monitoring")
    val run = Sandbox.resolveRun(
      Some(Sandbox.Config(allowedEnvs = Some(Seq("dev")))), profile, "dev",
      discovered, monitoringPipeline = Some("lhp_monitoring"))
    assert(run.pipelines == Seq("bronze", "gold_eu", "gold_us"))
    // refused on a non-allowed env
    val envErr = intercept[YamlConfig.ConfigError](Sandbox.resolveRun(
      Some(Sandbox.Config(allowedEnvs = Some(Seq("dev")))), profile, "prod",
      discovered))
    assert(envErr.msg.contains("prod"), envErr.msg)
    // zero-match entries: ONE error listing every offender + what exists
    val zero = intercept[YamlConfig.ConfigError](Sandbox.resolveRun(
      None, Sandbox.Profile("alice", Seq("silver", "platinum_*", "bronze")),
      "dev", discovered))
    assert(zero.msg.contains("'silver'") && zero.msg.contains("'platinum_*'") &&
      zero.msg.contains("gold_eu"), zero.msg)
    // an exact entry naming the monitoring pipeline is loud; a glob that
    // would cover it silently excludes it instead
    val mon = intercept[YamlConfig.ConfigError](Sandbox.resolveRun(
      None, Sandbox.Profile("alice", Seq("lhp_monitoring")), "dev",
      discovered, Some("lhp_monitoring")))
    assert(mon.msg.contains("monitoring"), mon.msg)
    val globAll = Sandbox.resolveRun(None,
      Sandbox.Profile("alice", Seq("*")), "dev", discovered, Some("lhp_monitoring"))
    assert(!globAll.pipelines.contains("lhp_monitoring"))
    // glob matching is case-sensitive (fnmatchcase semantics)
    assert(!Sandbox.globMatches("Gold_*", "gold_eu"))
    assert(Sandbox.globMatches("gold_[eu]?", "gold_eu"))
    // fnmatch negation is `[!...]` — translated to regex `[^...]`, not
    // copied raw (raw, the class would match literal '!' plus the very
    // chars it should exclude, inverting the selection)
    assert(Sandbox.globMatches("gold_[!e]*", "gold_us"))
    assert(!Sandbox.globMatches("gold_[!e]*", "gold_eu"))
    assert(Sandbox.globMatches("q[!0-8]", "q9"))
    assert(!Sandbox.globMatches("q[!0-8]", "q5"))
  }

  test("nameMap rewrites the table LEAF only; sandbox run E2E isolates tables") {
    val run = Sandbox.Run("alice", "{namespace}_{table}", "table", Seq("p"))
    assert(run.nameMap("cat.bronze.events") == "cat.bronze.alice_events")
    assert(run.nameMap("events") == "alice_events")

    // E2E through Project.load + orchestrator: the physical directory
    // carries the sandbox name, the logical flowgroup config is untouched
    val root = Files.createTempDirectory("graft-sbx-e2e")
    Files.writeString(root.resolve("lhp.yaml"),
      """name: sbx_proj
        |sandbox:
        |  table_pattern: "{namespace}_{table}"
        |  allowed_envs: [dev]
        |""".stripMargin)
    Files.createDirectories(root.resolve(".lhp"))
    Files.writeString(root.resolve(".lhp/profile.yaml"),
      "namespace: alice\npipelines: [sbx]\n")
    Files.createDirectories(root.resolve("substitutions"))
    Files.writeString(root.resolve("substitutions/dev.yaml"), "dev:\n  env: dev\n")
    Files.createDirectories(root.resolve("pipelines"))
    Files.writeString(root.resolve("pipelines/sbx.yaml"),
      """pipeline: sbx
        |flowgroup: f
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: table, table: sbx_src}
        |    target: v
        |  - name: w
        |    type: write
        |    source: v
        |    write_target: {type: materialized_view, table: events}
        |""".stripMargin)
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("sbx_src")
    val project = Project.load(root.toString)
    val fgs = project.flowgroups("dev")
    val run2 = project.sandboxRun("dev", fgs.map(_.pipeline).distinct)
    val wh = Files.createTempDirectory("graft-sbx-wh").toString
    val store = new graft.exec.TableStore(spark, wh, run2.nameMap)
    new graft.exec.PipelineRunner(spark, store, s"$wh/cp").run(fgs.head)
    // physical isolation: the sandboxed directory exists, the plain one not
    assert(Files.exists(java.nio.file.Paths.get(s"$wh/alice_events")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$wh/events")))
    // reads through the SAME store resolve transparently
    assert(store.read("events").count() == 1)
  }

  test("scalar allowed_envs restricts (it used to silently disable the gate)") {
    val c = cfg("sandbox: {allowed_envs: dev}").get
    assert(c.allowedEnvs == Some(Seq("dev")), c.allowedEnvs.toString)
  }
}
