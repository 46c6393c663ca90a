package graft.exec

/** Event hooks — the runtime counterpart of the reference's UC-tagging and
  * test-reporting hook templates (templates/uc_tagging/hook.py.j2,
  * templates/test_reporting/hook.py.j2): callbacks fired on table writes,
  * test results, and flowgroup completion. Implementations register with the
  * runner/orchestrator; the default is a no-op.
  */
trait PipelineHooks {
  /** A write action finished materializing `table`. */
  def onTableWritten(pipeline: String, flowgroup: String, table: String): Unit = ()
  /** One streaming microbatch of `table` finished its TABLE-side commit
    * (rows + change log + txn identity). Fires inside foreachBatch, AFTER
    * the table write but BEFORE Spark records the batch in the stream's
    * checkpoint commit log — so delivery is AT-LEAST-ONCE: a crash in
    * that window replays the batch and re-fires the hook with the same
    * (table, batchId); listeners that must count exactly dedupe on that
    * pair (the table write itself is replay-idempotent, so data is safe
    * either way). Fires BETWEEN batches of one stream — the seam
    * monitoring latches onto and the crash-forge matrix halts in (a kill
    * here leaves the stream half-consumed, the window [[onTableWritten]]
    * can never express). Covers EVERY streaming foreachBatch write path,
    * not just the plain append: CDC merge, the MV maintenance routes
    * (incremental dedup, incremental_join companion, key-local and
    * global-window recompute, watermarked append, complete-mode replace),
    * and the quarantine DLQ drain — a `batch:<table>:<n>` kill spec or a
    * monitoring listener must not silently miss a table because of HOW it
    * is maintained. */
  def onBatchCommitted(pipeline: String, flowgroup: String, table: String,
      batchId: Long): Unit = ()
  /** A write target declared governance tags (write_target.tags/tags_file —
    * the uc_tagging hook seam): fired after the write with the merged tag
    * set; a deployment hooks ALTER TABLE ... SET TAGS here. Column-level
    * tags from a tags_file arrive flattened as `column.<col>.<key>`. */
  def onTableTagged(pipeline: String, flowgroup: String, table: String,
      tags: Map[String, String]): Unit = ()
  /** A data test completed with `violations` violating rows. */
  def onTestResult(pipeline: String, flowgroup: String, testName: String,
      testType: String, violations: Long): Unit = ()
  /** A flowgroup finished (error = None on success). */
  def onFlowgroupComplete(pipeline: String, flowgroup: String,
      error: Option[Throwable]): Unit = ()
}

object PipelineHooks {
  val noop: PipelineHooks = new PipelineHooks {}

  /** Collecting implementation for tests/reporting. Appends are
    * synchronized: the orchestrator fires hooks from maxParallelism
    * concurrent flowgroup threads, and ListBuffer's += is not thread-safe
    * (the EventLog.Writer precedent — lost entries or a corrupted list
    * otherwise). */
  final class Recording extends PipelineHooks {
    val tables = scala.collection.mutable.ListBuffer[String]()
    val batches = scala.collection.mutable.ListBuffer[(String, Long)]()
    val tagged = scala.collection.mutable.ListBuffer[(String, Map[String, String])]()
    val tests = scala.collection.mutable.ListBuffer[(String, String, Long)]()
    val flowgroups = scala.collection.mutable.ListBuffer[(String, Boolean)]()
    override def onTableWritten(p: String, f: String, table: String): Unit =
      synchronized { tables += table: Unit }
    override def onBatchCommitted(p: String, f: String, table: String,
        batchId: Long): Unit =
      synchronized { batches += ((table, batchId)): Unit }
    override def onTableTagged(p: String, f: String, table: String,
        tags: Map[String, String]): Unit =
      synchronized { tagged += ((table, tags)): Unit }
    override def onTestResult(p: String, f: String, name: String, tt: String, v: Long): Unit =
      synchronized { tests += ((name, tt, v)): Unit }
    override def onFlowgroupComplete(p: String, f: String, e: Option[Throwable]): Unit =
      synchronized { flowgroups += ((s"$p.$f", e.isEmpty)): Unit }
  }
}
