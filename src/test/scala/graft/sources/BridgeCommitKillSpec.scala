package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.tools.{BridgeCommitChild, ChildJvm}

/** Kill-point matrix for the bridge writers' stage→rename commit window
  * (the r15 AvroBridge rewrite's protocol, shared by WarcBridge): a child
  * JVM hard-halts AFTER a task's staging file is fully written but BEFORE
  * its atomic rename. The spec asserts the three properties the protocol
  * promises:
  *
  *   1. the torn directory is READ-SAFE — the halted partition's rows are
  *      simply absent (its staging dot-file is invisible to readers),
  *      never half-present;
  *   2. the job-level retry (re-running the same write) converges to
  *      exactly-once output — no doubled partition, no lost partition;
  *   3. the retry's StagedCommit sweep removes the crash's `.inprogress`
  *      orphans, so torn attempts cannot accumulate litter.
  */
class BridgeCommitKillSpec extends SparkSuite {

  private def listNames(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).map(_.map(_.getName).toSeq).getOrElse(Nil)
  }

  private def spawnTorn(bridge: String, dir: String, marker: String): Unit = {
    val (code, out) = ChildJvm.spawn(
      "graft.tools.BridgeCommitChild", Seq(bridge, dir))
    assert(code == 137,
      s"child was supposed to hard-halt (137) at the $bridge commit point, " +
        s"got $code; output tail: ${out.takeRight(800)}")
    assert(out.contains(marker),
      s"expected '$marker' in child output; tail: ${out.takeRight(800)}")
    // the halted task staged its file and died before the rename — the
    // orphan MUST be there, or the kill-point fired somewhere else
    val staged = listNames(dir).filter(StagedCommit.isStaging)
    assert(staged.nonEmpty,
      s"no .inprogress orphan after the forged halt; dir: ${listNames(dir)}")
  }

  test("avro: stage→rename kill is read-safe, retry is exactly-once, sweep cleans") {
    val dir = Files.createTempDirectory("graft-avrokill").toString + "/data"
    spawnTorn("avro", dir, "HALTING at avro_commit")
    val expected = BridgeCommitChild.fixtureAvro(spark)
    // 1. torn read: committed partitions only — a strict subset, never
    //    duplicated or torn rows (empty dir is legal: maybe no task won)
    val tornFiles = listNames(dir).filter(_.endsWith(".avro"))
    if (tornFiles.nonEmpty) {
      val torn = AvroBridge.decode(
        spark.read.format("binaryFile").load(dir), expected.schema)
      assert(torn.exceptAll(expected).isEmpty,
        "torn read surfaced rows outside the fixture")
      assert(torn.count() < 120, "halted partition's rows visible pre-retry")
    }
    // 2. retry converges to exactly-once
    AvroBridge.write(expected, dir)
    val got = AvroBridge.decode(
      spark.read.format("binaryFile").load(dir), expected.schema)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "retried avro write is not exactly-once")
    assert(got.count() == 120)
    // 3. the retry's sweep removed the crash's orphans
    assert(listNames(dir).filter(StagedCommit.isStaging).isEmpty,
      s"stale staging survived the retry: ${listNames(dir)}")
  }

  test("warc: stage→rename kill is read-safe, retry is exactly-once, sweep cleans") {
    val dir = Files.createTempDirectory("graft-warckill").toString + "/data"
    spawnTorn("warc", dir, "HALTING at warc_commit")
    val expected = BridgeCommitChild.fixtureWarc(spark)
      .select(col("record_id"), decode(col("payload"), "UTF-8").as("body"))
    def readBack() = WarcBridge.decode(
      spark.read.format("binaryFile").load(dir))
      .select(col("record_id"), decode(col("payload"), "UTF-8").as("body"))
    // 1. torn read is a strict subset
    if (listNames(dir).exists(_.endsWith(".warc.gz"))) {
      val torn = readBack()
      assert(torn.exceptAll(expected).isEmpty,
        "torn warc read surfaced rows outside the fixture")
      assert(torn.count() < 120, "halted partition's records visible pre-retry")
    }
    // 2. retry converges to exactly-once
    WarcBridge.write(BridgeCommitChild.fixtureWarc(spark), dir)
    val got = readBack()
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "retried warc write is not exactly-once")
    assert(got.count() == 120)
    // 3. sweep
    assert(listNames(dir).filter(StagedCommit.isStaging).isEmpty,
      s"stale staging survived the retry: ${listNames(dir)}")
  }
}
