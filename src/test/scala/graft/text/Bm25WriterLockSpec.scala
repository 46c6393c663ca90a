package graft.text

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Single-writer ENFORCEMENT for the BM25 manifest commit and the bridge
  * staged commits (r17 verdict item 2): the contracts were documented but
  * nothing stopped two concurrent folds from racing the manifest rename —
  * last rename wins, the loser's fold silently lost. Now every commit
  * runs under the cross-process writer lock. Forged with a genuinely
  * separate JVM holding the advisory lock (same pattern as
  * ProcessLockSpec): a contender refuses loudly past the deadline, waits
  * through a transient holder, and the post-contention index equals the
  * sequential-fold fingerprint. The stale-basis refusal (a fold whose
  * manifest was read before another writer committed) is pinned in-JVM. */
class Bm25WriterLockSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(rows: (String, String)*) = rows.toDF("doc_id", "text")

  private def fingerprint(ix: Bm25.Index): (Seq[String], Seq[String], Long, Long) = (
    ix.tf.orderBy("__t", "__doc").collect().map(_.toString).toSeq,
    ix.df.orderBy("__t").collect().map(_.toString).toSeq,
    ix.nDocs, ix.totLen)

  private def holdLock(lockFile: String, holdMs: Long): Process = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val proc = new ProcessBuilder(
      javaBin, "-cp", sys.props("java.class.path"),
      "graft.exec.LockHolderMain", lockFile, holdMs.toString)
      .redirectErrorStream(true).start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    val line = out.readLine()
    assert(line == "HELD", s"holder JVM failed to start: $line")
    proc
  }

  test("a foreign JVM holding the index lock blocks folds loudly; the " +
      "waited-out fold equals the sequential fingerprint") {
    val path = Files.createTempDirectory("bm25-lock").toString + "/ix"
    Bm25.saveIndex(Bm25.buildIndex(
      corpus("d1" -> "alpha beta", "d2" -> "beta gamma"),
      "doc_id", "text"), path)
    val delta = corpus("d3" -> "gamma delta epsilon")

    // 1) sustained holder + short deadline → loud refusal naming the lock
    val proc = holdLock(s"$path/._writer_lock", 8000)
    try {
      spark.conf.set("spark.graft.store.lockWaitMs", "400")
      val m0 = Bm25.readManifest(spark, path).get
      val live = Bm25.loadIndex(spark, path)
      val ex = intercept[IllegalStateException] {
        Bm25.appendSegment(live, m0, delta, "doc_id", "text", path)
      }
      assert(ex.getMessage.contains("locked by another writer"), ex.getMessage)
      assert(ex.getMessage.contains("bm25 index"), ex.getMessage)
      // nothing committed under contention — the manifest is unchanged
      assert(Bm25.readManifest(spark, path).get == m0,
        "a refused fold must not have moved the manifest")

      // 2) the holder dies → kernel releases the lock; a generous deadline
      //    folds through, and the result equals plain sequential folds
      proc.destroy()
      assert(proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS))
      spark.conf.set("spark.graft.store.lockWaitMs", "10000")
      Bm25.appendSegment(live, m0, delta, "doc_id", "text", path)
      val folded = fingerprint(Bm25.loadIndex(spark, path))
      val seqPath = Files.createTempDirectory("bm25-seq").toString + "/ix"
      Bm25.saveIndex(Bm25.buildIndex(
        corpus("d1" -> "alpha beta", "d2" -> "beta gamma"),
        "doc_id", "text"), seqPath)
      Bm25.appendSegment(Bm25.loadIndex(spark, seqPath),
        Bm25.readManifest(spark, seqPath).get, delta, "doc_id", "text", seqPath)
      assert(folded == fingerprint(Bm25.loadIndex(spark, seqPath)),
        "post-contention fold diverged from the sequential fingerprint")
    } finally {
      spark.conf.set("spark.graft.store.lockWaitMs", "10000")
      if (proc.isAlive) proc.destroyForcibly(): Unit
    }
  }

  test("a stale fold basis refuses instead of silently dropping the " +
      "interleaved fold's segments") {
    val path = Files.createTempDirectory("bm25-stale").toString + "/ix"
    Bm25.saveIndex(Bm25.buildIndex(
      corpus("d1" -> "alpha beta"), "doc_id", "text"), path)
    val m0 = Bm25.readManifest(spark, path).get
    val live = Bm25.loadIndex(spark, path)
    // another writer commits between this fold's manifest read and its
    // own commit — the waited-out-lock interleave, compressed in-process
    Bm25.appendSegment(live, m0, corpus("d2" -> "beta gamma"),
      "doc_id", "text", path)
    val mAfter = Bm25.readManifest(spark, path).get
    val ex = intercept[IllegalStateException] {
      Bm25.appendSegment(live, m0, corpus("d3" -> "gamma delta"),
        "doc_id", "text", path)
    }
    assert(ex.getMessage.contains("stale"), ex.getMessage)
    // the interleaved fold's manifest is still live — nothing was lost
    assert(Bm25.readManifest(spark, path).get == mAfter)
    // a rebased retry (reload under the live manifest) goes through
    Bm25.appendSegment(Bm25.loadIndex(spark, path), mAfter,
      corpus("d3" -> "gamma delta"), "doc_id", "text", path)
    assert(Bm25.loadIndex(spark, path).nDocs == 3)
  }

  test("bridge writes refuse loudly while a foreign JVM holds the dir lock") {
    val dir = Files.createTempDirectory("avro-lock").toString + "/land"
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    graft.sources.AvroBridge.write(df, dir) // create + baseline
    val before = new java.io.File(dir).listFiles().map(_.getName).toSet
    val proc = holdLock(s"$dir/._writer_lock", 8000)
    try {
      spark.conf.set("spark.graft.store.lockWaitMs", "400")
      val ex = intercept[IllegalStateException] {
        graft.sources.AvroBridge.write(Seq((3, "c")).toDF("k", "v"), dir)
      }
      assert(ex.getMessage.contains("locked by another writer"), ex.getMessage)
      assert(ex.getMessage.contains("avro bridge dir"), ex.getMessage)
      // the refused write swept nothing and staged nothing
      assert(new java.io.File(dir).listFiles().map(_.getName).toSet == before,
        "a refused bridge write must leave the directory untouched")
    } finally {
      spark.conf.set("spark.graft.store.lockWaitMs", "10000")
      proc.destroyForcibly(): Unit
    }
  }
}
