package graft.exec

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.config.YamlConfig
import graft.plan.Planner
import graft.sources.Tables

/** `mode: incremental_recompute` — partition-scoped recompute of OVER-window
  * MVs (the fifth declared-incremental MV shape). Pins, beyond the q63
  * DuckDB gate: physical scoping (untouched buckets' files are byte- and
  * mtime-identical after a delta run), the semi-join pushdown below the
  * Window in the optimized plan (the 100 TB property: only affected
  * partitions are scanned), and the loud ends of the key-locality audit
  * plus the config contract. */
class RecomputeMvSpec extends SparkSuite {
  import spark.implicits._

  private def yamlFor(landing: String, mvSql: String,
      mvExtra: String = "", recompute: String = "{keys: [ub], view: e}"): String =
    s"""pipeline: rmv
       |flowgroup: fg
       |actions:
       |  - name: l
       |    type: load
       |    source:
       |      type: cloudfiles
       |      path: $landing
       |      format: parquet
       |      readMode: stream
       |      table_schema: "id BIGINT, ts TIMESTAMP, v DOUBLE"
       |    target: raw
       |  - name: t
       |    type: transform
       |    transform_type: sql
       |    source: raw
       |    target: e
       |    sql: "SELECT id, ts, v, CAST(id % 4 AS BIGINT) AS ub FROM raw"
       |  - name: w_base
       |    type: write
       |    source: e
       |    write_target: {type: streaming_table, table: base}
       |  - name: mv
       |    type: write
       |    sql: >
       |      $mvSql
       |    write_target:
       |      type: materialized_view
       |      table: mv
       |      mode: incremental_recompute
       |      recompute: $recompute
       |$mvExtra""".stripMargin

  private val goodSql =
    "SELECT ub, id, ts, v, CAST(row_number() OVER (PARTITION BY ub ORDER BY ts, id) AS BIGINT) AS rn FROM base"

  private def fresh(): (PipelineRunner, TableStore, String) = {
    val dir = Files.createTempDirectory("graft-rmv").toString
    val store = new TableStore(spark, s"$dir/warehouse")
    (new PipelineRunner(spark, store, s"$dir/checkpoints"), store, dir)
  }

  private def writeRows(landing: String, rows: Seq[(Long, String, Double)]): Unit =
    rows.toDF("id", "tss", "v")
      .select(col("id"), col("tss").cast("timestamp").as("ts"), col("v"))
      .repartition(1).write.mode("append").parquet(landing)

  test("two-run recompute matches a one-shot batch window over the full base") {
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    // run 1: ids across all four buckets
    writeRows(landing, (0L until 40L).map(i => (i, f"2024-01-01 00:${i}%02d:00", i * 1.5)))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, goodSql)))
    // run 2: delta touches ONLY buckets 0 and 1, interleaving earlier rows
    writeRows(landing, Seq((100L, "2024-01-01 00:05:30", 9.0), (101L, "2024-01-01 00:07:30", 8.0)))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, goodSql)))

    val got = store.read("mv").select("ub", "id", "ts", "v", "rn")
    val expected = store.read("base")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("ub").orderBy("ts", "id"))
        .cast("bigint"))
      .select("ub", "id", "ts", "v", "rn")
    assert(got.count() == 42)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "recomputed MV must equal the one-shot window over the accumulated base")
  }

  test("untouched buckets' partition files are physically untouched by a delta run") {
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    writeRows(landing, (0L until 40L).map(i => (i, f"2024-01-01 00:${i}%02d:00", 1.0)))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, goodSql)))
    def files(bucket: Long): Map[Path, java.nio.file.attribute.FileTime] = {
      val p = Paths.get(s"$dir/warehouse/mv/ub=$bucket")
      Files.list(p).iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(f => f -> Files.getLastModifiedTime(f)).toMap
    }
    val before2 = files(2L); val before3 = files(3L); val before0 = files(0L)
    // delta touches bucket 0 only (id 100 % 4 == 0)
    writeRows(landing, Seq((100L, "2024-01-01 00:50:00", 2.0)))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, goodSql)))
    assert(files(2L) == before2 && files(3L) == before3,
      "a delta run must not rewrite partitions whose keys it did not touch")
    assert(files(0L) != before0, "the touched bucket must be rewritten")
    assert(store.read("mv").filter(col("ub") === 0).count() == 11)
  }

  test("the affected-key filter pushes below the Window to the scan (semi-join pushdown)") {
    Seq((1L, 0L), (2L, 1L)).toDF("id", "ub").createOrReplaceTempView("rmv_base_pd")
    // the production shape: null-safe condition join on aliased key columns
    val keys = Seq(0L).toDF("ub").select(col("ub").as("__aff_ub"))
    val filtered = spark.sql(
      "SELECT ub, id, row_number() OVER (PARTITION BY ub ORDER BY id) AS rn FROM rmv_base_pd")
      .join(broadcast(keys), col("ub") <=> col("__aff_ub"), "left_semi")
    val windows = filtered.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    val joinBelowWindow = windows.head.find {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi
      case _ => false
    }
    assert(joinBelowWindow.nonEmpty,
      "PushDownLeftSemiAntiJoin must move the key filter below the Window " +
        "so only affected partitions are scanned")
  }

  private def refusal(mvSql: String, recompute: String = "{keys: [ub], view: e}",
      extra: String = ""): String = {
    val (runner, _, dir) = fresh()
    val landing = s"$dir/landing"
    writeRows(landing, Seq((1L, "2024-01-01 00:00:00", 1.0)))
    val e = intercept[Planner.PlanError](
      runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, mvSql, extra, recompute))))
    e.getMessage
  }

  test("key-locality audit refuses, naming the shape (ACT-011)") {
    // OVER omitting the key
    val m1 = refusal(
      "SELECT ub, id, row_number() OVER (ORDER BY id) AS rn FROM base")
    assert(m1.contains("ACT-011") && m1.contains("PARTITION BY omits") && m1.contains("ub"))
    // GROUP BY omitting the key
    val m2 = refusal("SELECT id % 2 AS ub, count(*) AS n FROM base GROUP BY id % 2")
    assert(m2.contains("GROUP BY omits"))
    // an expression OF the key is not the key
    val m3 = refusal(
      "SELECT ub, id, row_number() OVER (PARTITION BY ub % 2 ORDER BY id) AS rn FROM base")
    assert(m3.contains("PARTITION BY omits"))
    // joins mix keys
    val m4 = refusal(
      "SELECT a.ub, a.id, row_number() OVER (PARTITION BY a.ub ORDER BY a.id) AS rn " +
        "FROM base a JOIN base b ON a.id = b.id")
    assert(m4.contains("a join"))
    // LIMIT selects across partitions
    val m5 = refusal(
      "SELECT ub, id, row_number() OVER (PARTITION BY ub ORDER BY id) AS rn FROM base LIMIT 3")
    assert(m5.contains("LIMIT"))
    // scalar subqueries read other partitions
    val m6 = refusal(
      "SELECT ub, id, v / (SELECT max(v) FROM base) AS sh, " +
        "row_number() OVER (PARTITION BY ub ORDER BY id) AS rn FROM base")
    assert(m6.contains("subquery"))
    // output must carry the keys
    val m7 = refusal(
      "SELECT id, row_number() OVER (PARTITION BY ub ORDER BY id) AS rn FROM base")
    assert(m7.contains("output schema without"))
  }

  test("streaming sql, batch delta view, and missing key columns refuse loudly") {
    val mStream = refusal(
      "SELECT ub, id, ts, v FROM stream(base)")
    assert(mStream.contains("BATCH query"), mStream)
    // recompute.view must be streaming: point it at a batch table view.
    // The base table view is registered only after w_base runs, so use a
    // batch sql LOAD as the non-streaming delta
    val (runner, _, dir) = fresh()
    val landing = s"$dir/landing"
    writeRows(landing, Seq((1L, "2024-01-01 00:00:00", 1.0)))
    val yaml = yamlFor(landing, goodSql, recompute = "{keys: [ub], view: bv}")
      .replace("  - name: mv",
        """  - name: lb
          |    type: load
          |    source: {type: sql, sql: "SELECT CAST(1 AS BIGINT) AS ub"}
          |    target: bv
          |  - name: mv""".stripMargin)
    val e = intercept[Planner.PlanError](runner.run(YamlConfig.parseFlowGroup(yaml)))
    assert(e.getMessage.contains("not a streaming view"))
    val mKeys = refusal(goodSql, recompute = "{keys: [nope], view: e}")
    assert(mKeys.contains("nope") && mKeys.contains("not in"))
  }

  test("a NULL delta key recomputes the null partition instead of deleting it") {
    // ub NULL is a real Hive partition (__HIVE_DEFAULT_PARTITION__): the
    // affected set includes it (replacePartitions WILL drop its dir), so
    // the key semi-join must be null-safe or the rows vanish silently
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    val yaml =
      s"""pipeline: rmvn
         |flowgroup: fg
         |actions:
         |  - name: l
         |    type: load
         |    source:
         |      type: cloudfiles
         |      path: $landing
         |      format: parquet
         |      readMode: stream
         |      table_schema: "id BIGINT, ts TIMESTAMP, v DOUBLE"
         |    target: raw
         |  - name: t
         |    type: transform
         |    transform_type: sql
         |    source: raw
         |    target: e
         |    sql: "SELECT id, ts, v, CASE WHEN id % 3 = 0 THEN CAST(NULL AS BIGINT) ELSE CAST(id % 4 AS BIGINT) END AS ub FROM raw"
         |  - name: w_base
         |    type: write
         |    source: e
         |    write_target: {type: streaming_table, table: base}
         |  - name: mv
         |    type: write
         |    sql: >
         |      $goodSql
         |    write_target:
         |      type: materialized_view
         |      table: mv
         |      mode: incremental_recompute
         |      recompute: {keys: [ub], view: base}
         |""".stripMargin
    writeRows(landing, Seq((0L, "2024-01-01 00:00:00", 1.0), // ub NULL
      (1L, "2024-01-01 00:01:00", 2.0)))
    runner.run(YamlConfig.parseFlowGroup(yaml))
    assert(store.read("mv").filter(col("ub").isNull).count() == 1)
    // run 2's delta has another NULL-ub row: the null partition must be
    // RECOMPUTED over both rows, not dropped
    writeRows(landing, Seq((3L, "2024-01-01 00:02:00", 3.0))) // ub NULL
    runner.run(YamlConfig.parseFlowGroup(yaml))
    val nulls = store.read("mv").filter(col("ub").isNull)
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nulls == Map(0L -> 1L, 3L -> 2L),
      s"null partition must hold both rows ranked together, got $nulls")
  }

  test("an alias redefining the key inside a subquery is refused (name capture)") {
    val m = refusal(
      "SELECT ub, id, row_number() OVER (PARTITION BY ub ORDER BY id) AS rn " +
        "FROM (SELECT CAST(ub % 2 AS BIGINT) AS ub, id FROM base)")
    assert(m.contains("alias redefining recompute key"), m)
    val m2 = refusal(
      "SELECT ub, id, row_number() OVER (PARTITION BY ub ORDER BY id) AS rn " +
        "FROM (SELECT id AS ub, id FROM base)")
    assert(m2.contains("alias redefining recompute key"), m2)
  }

  test("recompute.view naming nothing refuses with the route named") {
    val m = refusal(goodSql, recompute = "{keys: [ub], view: nope}")
    assert(m.contains("names neither") && m.contains("nope"), m)
  }

  test("declared schema that drops the key refuses before the partition swap") {
    val m = refusal(goodSql,
      extra = "      table_schema: \"id BIGINT, ts TIMESTAMP, v DOUBLE, rn BIGINT\"\n")
    assert(m.contains("removed by the declared schema"), m)
  }

  test("config contract: mode/recompute/partition_columns/watermark combinations are loud") {
    def cfg(wt: String): String =
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    source: {type: sql, sql: "SELECT 1 AS ub"}
         |    target: v
         |  - name: mv
         |    type: write
         |    source: v
         |    sql: "SELECT ub FROM v"
         |    write_target:
         |      type: materialized_view
         |      table: t
         |$wt""".stripMargin
    val e1 = intercept[YamlConfig.ConfigError](YamlConfig.parseFlowGroup(cfg(
      "      mode: incremental_recompute")))
    assert(e1.getMessage.contains("needs recompute"))
    val e2 = intercept[YamlConfig.ConfigError](YamlConfig.parseFlowGroup(cfg(
      "      recompute: {keys: [ub], view: v}")))
    assert(e2.getMessage.contains("only applies with mode: incremental_recompute"))
    val e3 = intercept[YamlConfig.ConfigError](YamlConfig.parseFlowGroup(cfg(
      "      mode: incremental_recompute\n" +
        "      recompute: {keys: [ub], view: v}\n" +
        "      partition_columns: [other]")))
    assert(e3.getMessage.contains("partition_columns"))
    val e4 = intercept[YamlConfig.ConfigError](YamlConfig.parseFlowGroup(cfg(
      "      mode: incremental_recompute\n" +
        "      recompute: {keys: [ub], view: v}\n" +
        "      watermark: {column: ts, delay: 1 hour}")))
    assert(e4.getMessage.contains("watermark does not apply"))
  }

  test("forged crash: a replayed delta batch recomputes idempotently (no dupes, no loss)") {
    // the append path needed (flow, batch) txn identity to absorb replays
    // (CrashResumeSpec); the recompute path's claim is stronger — replay
    // is SELF-HEALING because recompute-from-current-base is idempotent.
    // Forge the exact crash state (offsets written, partitions swapped,
    // commit marker missing) and prove it.
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    writeRows(landing, (0L until 40L).map(i => (i, f"2024-01-01 00:${i}%02d:00", i * 1.0)))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, goodSql)))
    val before = store.read("mv").select("ub", "id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def dropNewestCommit(cp: String): Unit = {
      val commits = Paths.get(cp, "commits")
      assert(Files.exists(commits), s"no commits dir at $commits")
      val newest = Files.list(commits).toArray.map(_.asInstanceOf[Path])
        .filter(p => p.getFileName.toString.forall(_.isDigit))
        .maxBy(_.getFileName.toString.toLong)
      Files.delete(newest)
      Files.deleteIfExists(
        commits.resolve(s".${newest.getFileName.toString}.crc")): Unit
    }
    dropNewestCommit(s"$dir/checkpoints/rmv/fg/mv")
    // replay with NO new data: the whole first delta batch re-runs
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, goodSql)))
    val replayed = store.read("mv").select("ub", "id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(replayed == before, "replayed recompute diverged from the original")
    assert(store.read("mv").count() == 40, "replay duplicated rows")
    // and a crash forged BETWEEN two runs with new data: the replayed
    // batch recomputes its keys against the ALREADY-ADVANCED base and
    // still lands the final answer
    writeRows(landing, Seq((100L, "2024-01-01 00:50:00", 2.0))) // ub 0
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, goodSql)))
    dropNewestCommit(s"$dir/checkpoints/rmv/fg/mv")
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, goodSql)))
    val ub0 = store.read("mv").filter(col("ub") === 0)
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(store.read("mv").count() == 41)
    assert(ub0.size == 11 && ub0(100L) == ub0.values.max,
      s"post-crash bucket 0 state wrong: $ub0")
  }

  test("q64 gate: cross-run duplicates collapse through the nested-dedup recompute") {
    val got = graft.queries.Extras.q64NestedDedupMv(spark, sf0001)
      .select("ub", "user_id", "n_events", "n_types")
    // the fixture feeds every id%10==1 event TWICE (once per run); the MV's
    // nested DISTINCT must collapse them, so the expected frame is the
    // dedup+agg over the PLAIN events table
    val ev = Tables.load(spark, sf0001, "events")
    val expected = ev.select(
        (col("user_id") % 20).cast("bigint").as("ub"),
        col("user_id"), col("event_id"), col("event_type"))
      .distinct()
      .groupBy("ub", "user_id")
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        countDistinct(col("event_type")).cast("bigint").as("n_types"))
    assert(got.count() > 0)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("gate query q63 matches the equivalent Spark one-shot window at sf0.001") {
    val got = graft.queries.Extras.q63RecomputeMv(spark, sf0001)
      .select("ub", "user_id", "event_id", "ts", "rn", "running_value")
    val ev = Tables.load(spark, sf0001, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id") % 50, col("user_id")).orderBy("ts", "event_id")
    val expected = ev.select(
      (col("user_id") % 50).cast("bigint").as("ub"),
      col("user_id"), col("event_id"), col("ts"),
      row_number().over(w).cast("bigint").as("rn"),
      sum(col("value").cast("decimal(18,6)")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
        .cast("double").as("running_value"))
    assert(got.count() == 1000)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
