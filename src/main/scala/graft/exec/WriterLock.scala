package graft.exec

/** Cross-process single-writer ENFORCEMENT for path-keyed commit
  * protocols outside the TableStore — the BM25 index manifest commit
  * ([[graft.text.Bm25]]) and the bridge writers' staged commits
  * ([[graft.sources.StagedCommit]]). Those protocols documented
  * single-writer-per-path as a caller contract; unenforced, two
  * concurrent folds race the manifest rename (last rename wins — the
  * loser's fold is silently absent from the index) and two bridge writes
  * sweep each other's in-flight staging. This applies the same two
  * layers as TableStore mutations: a per-path JVM monitor, then the
  * advisory OS file lock ([[TableStore.ProcessLock]]) on
  * `<dir>/._writer_lock` — a contender waits up to
  * `spark.graft.store.lockWaitMs` (default 10 s) and then refuses
  * LOUDLY, naming the holder.
  *
  * Local/`file:` filesystems only: on other stores the documented
  * single-writer contract stands unenforced — the same seam as the
  * rename-atomicity assumption these protocols already carry (advisory
  * flocks have no meaning on an object store; HDFS deployments get
  * exclusion from the one-runtime-per-pipeline posture). */
object WriterLock {
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The lock sidecar for `dir` when it is a local path; None on any
    * other filesystem (enforcement not applicable — see class doc). */
  private def localLockPath(dir: String): Option[java.nio.file.Path] = {
    val uri = new org.apache.hadoop.fs.Path(dir).toUri
    val base =
      if (uri.getScheme == null) Some(java.nio.file.Paths.get(dir))
      else if (uri.getScheme == "file") Some(java.nio.file.Paths.get(uri.getPath))
      else None
    base.map(_.resolve("._writer_lock"))
  }

  /** Run `body` as the sole writer of `dir`. Reentrant within a thread
    * (a compaction fold's nested full save re-enters its own lock);
    * concurrent threads serialize on the JVM monitor; concurrent
    * PROCESSES serialize on the flock, refusing loudly past the
    * deadline. `what` names the resource in the refusal. */
  def withLock[T](dir: String, what: String, waitMs: Long)(body: => T): T =
    localLockPath(dir) match {
      case None => body
      case Some(lp) =>
        val mon = monitors.computeIfAbsent(
          lp.toAbsolutePath.normalize.toString, _ => new Object)
        mon.synchronized {
          TableStore.ProcessLock.acquire(lp, mon, what, waitMs)
          try body
          finally TableStore.ProcessLock.release(lp, mon)
        }
    }

  /** The configured contention deadline (same key as TableStore). */
  def waitMs(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get("spark.graft.store.lockWaitMs", "10000").toLong
}
