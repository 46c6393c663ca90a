package graft.exec

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** The cross-process writer commit protocol (r12 verdict item 2): two
  * RunProject JVMs against one warehouse must not interleave a table's
  * staging/swap sections. The first spec forges the real cross-process
  * interleave with a genuinely separate JVM holding the advisory lock; the
  * rest pin the in-JVM layers (cross-instance exclusion, reentrancy,
  * release-on-crash semantics). */
class ProcessLockSpec extends SparkSuite {
  import spark.implicits._

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("plock-wh").toString + "/wh")

  test("a foreign JVM holding the writer lock blocks mutations, loudly, until it exits") {
    val store = freshStore()
    store.overwrite("t", Seq((1, "a")).toDF("k", "v"))
    val lockFile = store.path("t") + "._writer_lock"
    // spawn a REAL second JVM that owns the lock for 8 s
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val proc = new ProcessBuilder(
      javaBin, "-cp", sys.props("java.class.path"),
      "graft.exec.LockHolderMain", lockFile, "8000")
      .redirectErrorStream(true).start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    try {
      // wait for the holder to own the lock before asserting contention
      val line = out.readLine()
      assert(line == "HELD", s"holder JVM failed to start: $line")
      // short deadline → loud refusal naming the contract
      spark.conf.set("spark.graft.store.lockWaitMs", "400")
      val ex = intercept[IllegalStateException] {
        store.append("t", Seq((2, "b")).toDF("k", "v"))
      }
      assert(ex.getMessage.contains("locked by another writer"), ex.getMessage)
      assert(ex.getMessage.contains("one runtime per pipeline"), ex.getMessage)
      // nothing landed under contention
      assert(store.read("t").count() == 1)
      // once the holder DIES the kernel releases the lock — no stale-marker
      // sweep; a generous deadline now succeeds
      proc.destroy()
      assert(proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS))
      spark.conf.set("spark.graft.store.lockWaitMs", "10000")
      store.append("t", Seq((2, "b")).toDF("k", "v"))
      assert(store.read("t").count() == 2)
    } finally {
      spark.conf.set("spark.graft.store.lockWaitMs", "10000")
      if (proc.isAlive) proc.destroyForcibly(): Unit
    }
  }

  test("two store instances in one JVM are mutually excluded per table") {
    // two TableStore instances (two pipelines misconfigured onto one
    // warehouse) have DISJOINT monitor maps — only the file-lock layer
    // stands between their mutations
    val wh = Files.createTempDirectory("plock-wh2").toString + "/wh"
    val s1 = new TableStore(spark, wh)
    val s2 = new TableStore(spark, wh)
    s1.overwrite("t", Seq((1, "a")).toDF("k", "v"))
    spark.conf.set("spark.graft.store.lockWaitMs", "300")
    try {
      val inside = new java.util.concurrent.CountDownLatch(1)
      val proceed = new java.util.concurrent.CountDownLatch(1)
      @volatile var t1Err: Throwable = null
      val t1 = new Thread(() => {
        try s1.withTableLock("t") { inside.countDown(); proceed.await() }
        catch { case t: Throwable => t1Err = t }
      })
      t1.start()
      inside.await()
      // s2 cannot enter while s1 holds — loud refusal after the deadline
      val ex = intercept[IllegalStateException] {
        s2.append("t", Seq((2, "b")).toDF("k", "v"))
      }
      assert(ex.getMessage.contains("locked by another writer"), ex.getMessage)
      proceed.countDown()
      t1.join(10000)
      assert(t1Err == null, s"holder thread failed: $t1Err")
      // and with the holder gone, s2 proceeds (in-JVM release notifies)
      spark.conf.set("spark.graft.store.lockWaitMs", "10000")
      s2.append("t", Seq((2, "b")).toDF("k", "v"))
      assert(s2.read("t").count() == 2)
    } finally spark.conf.set("spark.graft.store.lockWaitMs", "10000")
  }

  test("the lock is reentrant within one instance (upsert's nested rewrite path)") {
    val store = freshStore()
    store.overwrite("t", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    // upsert → replace → (staging swap) all re-enter the same table's lock
    store.upsert("t", Seq((2, "B"), (3, "c")).toDF("k", "v"), keys = Seq("k"))
    assert(store.read("t").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B"), (3, "c")))
    // explicit triple nesting
    store.withTableLock("t") {
      store.withTableLock("t") {
        store.append("t", Seq((4, "d")).toDF("k", "v"))
      }
    }
    assert(store.read("t").count() == 4)
    // release discipline: a non-holder release is a loud bug, not a no-op
    val ex = intercept[IllegalArgumentException] {
      TableStore.ProcessLock.release(
        Paths.get(store.path("t") + "._writer_lock"), new Object)
    }
    assert(ex.getMessage.contains("non-holder"), ex.getMessage)
  }

  test("drop keeps the writer-lock sidecar; concurrent-table mutations never contend") {
    val store = freshStore()
    store.overwrite("t", Seq((1, "a")).toDF("k", "v"))
    val lockFile = Paths.get(store.path("t") + "._writer_lock")
    assert(Files.exists(lockFile))
    store.drop("t")
    // the other sidecars are gone, the lock inode survives (deleting it
    // would detach a concurrently-spinning process onto a fresh inode)
    assert(Files.exists(lockFile))
    assert(!store.exists("t"))
    assert(store.getMeta("t", "schema").isEmpty)
    // distinct tables take distinct locks — parallel mutations proceed
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (1 to 4).map { i =>
        pool.submit(new Runnable {
          def run(): Unit =
            store.overwrite(s"p$i", Seq((i, s"v$i")).toDF("k", "v"))
        })
      }
      futs.foreach(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
      (1 to 4).foreach(i => assert(store.read(s"p$i").count() == 1))
    } finally pool.shutdown()
  }
}
