package graft.sources

/** Shared pieces of the bridge writers' commit protocol (AvroBridge.write,
  * WarcBridge.write): each task stages to a hidden per-ATTEMPT
  * `.part-NNNNN-<attempt>.<ext>.inprogress` name and commits via ONE
  * `FileContext.rename(OVERWRITE)` to a per-PARTITION final name.
  *
  * ATOMICITY ASSUMPTION — HDFS/local only: `FileContext.rename(OVERWRITE)`
  * is a single atomic namespace operation on HDFS and on local/posix
  * filesystems (the environments these fixture/egress writers target). On
  * object stores (S3A and friends) Hadoop emulates rename as copy+delete,
  * which is neither atomic nor cheap — a committed sink there needs a
  * manifest-based protocol (the TableStore paths), not this one. The
  * bridges stay on rename because they are landing/fixture writers whose
  * stores are FS-backed by contract.
  *
  * STALE STAGING: a killed speculative/retried attempt (or a whole-JVM
  * crash between stage and rename) leaves its dot-prefixed staging file
  * behind. Readers never see it (Spark and both bridge readers skip
  * dot-files), but the litter accumulates, so [[sweepStaging]] removes any
  * leftover staging files at the START of the next write to the same
  * directory — the retry that re-runs the job is the natural janitor, and
  * sweeping before (not during) the new attempt cannot race its own tasks:
  * fresh staging names carry the NEW attempt ids, minted only after the
  * sweep completes. `BridgeCommitKillSpec` crash-forges the stage→rename
  * window in both bridges and pins exactly-once output plus a clean sweep.
  *
  * SINGLE WRITER PER DIRECTORY — a hard contract, and on local/`file:`
  * filesystems an ENFORCED one: the sweep deletes EVERY staging file in
  * the target dir, so two concurrent bridge writes into the same
  * directory would each sweep the other's in-flight staging files and
  * watch their task renames fail with FileNotFoundException. Both
  * bridges therefore run their whole sweep→stage→rename under the
  * cross-process writer lock ([[graft.exec.WriterLock]],
  * `<dir>/._writer_lock`) — a concurrent write waits, then refuses
  * loudly naming the holder. On non-local stores the contract stands
  * unenforced (same seam as the rename-atomicity assumption above);
  * writes to DIFFERENT directories are fully independent.
  */
object StagedCommit {

  /** True for this protocol's staging names (dot-prefixed, `.inprogress`
    * suffixed) — one predicate shared by the sweep and the specs. */
  def isStaging(name: String): Boolean =
    name.startsWith(".part-") && name.endsWith(".inprogress")

  /** Delete leftover staging files under `dir` (non-recursive — the
    * bridges write flat directories). No-op when `dir` does not exist. */
  def sweepStaging(dir: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p))
      fs.listStatus(p).foreach { st =>
        if (st.isFile && isStaging(st.getPath.getName))
          fs.delete(st.getPath, false): Unit
      }
  }
}
