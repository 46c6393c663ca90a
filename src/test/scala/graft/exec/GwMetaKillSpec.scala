package graft.exec

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.graftnative.GlobalWindowMv

import graft.SparkSuite
import graft.config.YamlConfig

/** Crash-forge for the global-window MV's data/sidecar pair: the refresh
  * swaps the suffix `__gw_bucket` partitions FIRST and updates the gwmeta
  * counts sidecar SECOND (`forge:gw_meta` sits between them). A kill in
  * that window leaves new data under a stale sidecar — if a later refresh
  * trusted the stale counts for the buckets the crashed run rewrote, every
  * tail rank would shift silently. The design's defense is replay: the
  * stream checkpoint commits only after the whole refresh returns, so the
  * batch REPLAYS on resume, and the replayed refresh recomputes suffix
  * counts from the current base (stored counts are consulted only for
  * buckets BELOW the delta's min bucket, which the crashed run never
  * touched). This spec forges the kill in a child JVM, verifies the torn
  * state is real (data committed, sidecar stale), resumes in-process, and
  * pins table + sidecar against a never-crashed run. */
class GwMetaKillSpec extends SparkSuite {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-gwkill").toString

  private def yamlFor(landing: String): String =
    s"""pipeline: gwkill
       |flowgroup: fg
       |actions:
       |  - name: l
       |    type: load
       |    source:
       |      type: cloudfiles
       |      path: $landing
       |      format: parquet
       |      readMode: stream
       |      table_schema: "id BIGINT, score DOUBLE"
       |    target: raw
       |  - name: w_base
       |    type: write
       |    source: raw
       |    write_target: {type: streaming_table, table: base}
       |  - name: mv
       |    type: write
       |    sql: >
       |      SELECT id, score, CAST(rank() OVER (ORDER BY score DESC) AS INT) AS rnk
       |      FROM base
       |    write_target:
       |      type: materialized_view
       |      table: mv
       |      mode: incremental_recompute
       |      recompute: {view: base, buckets: 4}
       |""".stripMargin

  private def writeGen(landing: String, rows: Seq[(Long, Double)]): Unit =
    rows.toDF("id", "score").repartition(1).write.mode("append").parquet(landing)

  private def runInProcess(wh: String): Unit = {
    val store = new TableStore(spark, s"$wh/wh")
    val orch = new PipelineOrchestrator(spark, store, s"$wh/cp")
    val outcomes = orch.run(Seq(YamlConfig.parseFlowGroup(yamlFor(s"$wh/landing"))))
    outcomes.find(_.error.isDefined).foreach(o => throw o.error.get)
  }

  private val gen1 = (0L until 400L).map(i => (i, i.toDouble))
  private val gen2 = Seq((2000L, -5.0), (2001L, -6.0)) // bottom of the DESC order

  test("kill between partition swap and setMeta: replay converges table AND sidecar") {
    // never-crashed baseline
    val exp = s"$root/expected"
    writeGen(s"$exp/landing", gen1)
    runInProcess(exp)
    writeGen(s"$exp/landing", gen2)
    runInProcess(exp)
    val expStore = new TableStore(spark, s"$exp/wh")
    val expMeta = expStore.getMeta("mv", "gwmeta")
      .flatMap(GlobalWindowMv.decodeMeta)
      .getOrElse(fail("baseline run persisted no gwmeta"))

    // crashed run: gen 1 in-process (bootstrap), gen 2 killed at gw_meta
    val wh = s"$root/killed"
    writeGen(s"$wh/landing", gen1)
    runInProcess(wh)
    val store = new TableStore(spark, s"$wh/wh")
    val staleMeta = store.getMeta("mv", "gwmeta")
      .flatMap(GlobalWindowMv.decodeMeta)
      .getOrElse(fail("bootstrap persisted no gwmeta"))
    writeGen(s"$wh/landing", gen2)
    val yamlDir = s"$wh/yaml"
    Files.createDirectories(Paths.get(yamlDir))
    Files.writeString(Paths.get(s"$yamlDir/fg.yaml"), yamlFor(s"$wh/landing")): Unit
    val (code, out) = graft.tools.CrawlResumeChild.spawn(
      s"$wh/wh", s"$wh/cp", yamlDir, "forge:gw_meta")
    assert(code == 137, s"child was supposed to hard-halt (137) at gw_meta, " +
      s"got $code; output tail: ${out.takeRight(800)}")
    assert(out.contains("HALTING at gw_meta"), out.takeRight(800))

    // the torn window is REAL: the delta rows are in the table, but the
    // sidecar still carries the pre-delta counts (else the forge sits on
    // the wrong side of one of the writes and pins nothing)
    assert(store.read("mv").count() == 402,
      "kill point fired before the partition swap — window not forged")
    val tornMeta = store.getMeta("mv", "gwmeta")
      .flatMap(GlobalWindowMv.decodeMeta)
      .getOrElse(fail("torn state lost the gwmeta sidecar entirely"))
    assert(tornMeta.counts == staleMeta.counts &&
        tornMeta.counts.values.sum == 400L,
      s"kill point fired after setMeta — window not forged: $tornMeta")

    // resume in-process: the un-checkpointed batch replays, the refresh
    // recomputes suffix counts from the current base, setMeta lands
    runInProcess(wh)
    val got = store.read("mv").select("id", "score", "rnk")
    val expected = expStore.read("mv").select("id", "score", "rnk")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "crashed+resumed MV diverged from the never-crashed run")
    val healedMeta = store.getMeta("mv", "gwmeta")
      .flatMap(GlobalWindowMv.decodeMeta)
      .getOrElse(fail("resume did not restore the gwmeta sidecar"))
    assert(healedMeta.counts == expMeta.counts &&
        healedMeta.boundaries == expMeta.boundaries &&
        healedMeta.distincts == expMeta.distincts,
      s"healed sidecar != baseline sidecar: $healedMeta vs $expMeta")
  }
}
