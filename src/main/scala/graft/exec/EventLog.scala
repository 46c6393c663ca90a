package graft.exec

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Engine-written pipeline event logs — the runtime counterpart of the
  * reference's `event_log:` project block (models/_monitoring.py:8-17).
  * Where DLT writes its own event log and the reference merely CONFIGURES
  * where it lands, this engine has no DLT underneath, so the log is
  * produced here: a [[PipelineHooks]] implementation records every
  * table-write / tagging / test / completion event and appends them to a
  * per-pipeline table (`<qualifier.><prefix><pipeline>_event_log<suffix>`)
  * in ONE batch per flowgroup completion — no per-event tiny-file storm.
  *
  * The row shape is the useful subset of DLT's event log: `timestamp`,
  * `level`, `event_type`, `message`, `details` (JSON), plus `pipeline` /
  * `flowgroup` origin columns. The monitoring pipeline
  * ([[graft.streaming.Monitoring]]) unions these tables and runs the
  * project's monitoring materialized views over them.
  */
object EventLog {

  /** Fan-out composite — run several hook implementations side by side
    * (JUnit XML reporting + event logging, typically). */
  final class Composite(hs: PipelineHooks*) extends PipelineHooks {
    override def onTableWritten(p: String, f: String, t: String): Unit =
      hs.foreach(_.onTableWritten(p, f, t))
    // EVERY hook must forward — this composite predates onBatchCommitted
    // and silently swallowed it for all children (a crash-forge halt spec
    // or monitoring listener wired through a composite never fired);
    // CompositeHooksSpec pins the full forwarding surface by reflection
    override def onBatchCommitted(p: String, f: String, t: String,
        batchId: Long): Unit =
      hs.foreach(_.onBatchCommitted(p, f, t, batchId))
    override def onTableTagged(p: String, f: String, t: String,
        tags: Map[String, String]): Unit =
      hs.foreach(_.onTableTagged(p, f, t, tags))
    override def onTestResult(p: String, f: String, n: String, tt: String,
        v: Long): Unit =
      hs.foreach(_.onTestResult(p, f, n, tt, v))
    override def onFlowgroupComplete(p: String, f: String,
        e: Option[Throwable]): Unit =
      hs.foreach(_.onFlowgroupComplete(p, f, e))
  }

  final case class Event(timestamp: Long, pipeline: String, flowgroup: String,
      level: String, event_type: String, message: String, details: String)

  /** Per-pipeline event-log writer. `qualifier` is the event_log block's
    * catalog/schema prefix; `prefix`/`suffix` wrap the table leaf. */
  final class Writer(spark: SparkSession, store: TableStore,
      qualifier: Option[String] = None,
      prefix: String = "", suffix: String = "") extends PipelineHooks {

    def tableFor(pipeline: String): String =
      (qualifier.toSeq :+ s"$prefix${pipeline}_event_log$suffix").mkString(".")

    private val buf = mutable.ListBuffer[Event]()

    // Per-table append serialization: the orchestrator runs same-generation
    // flowgroups in PARALLEL, and two flowgroups of one pipeline completing
    // together would append to the same event-log directory concurrently —
    // Spark's file committer shares a _temporary staging dir per output
    // path, so the first job's commit wipes the second's in-flight files.
    // No lock map of its own: store.append serializes per RESOLVED table
    // name store-wide (JVM monitor + cross-process file lock) — a second
    // layer here locked the UNRESOLVED name and could only drift.

    private def json(kv: (String, String)*): String = TableStore.jsonObject(kv)

    private def add(p: String, f: String, level: String, tpe: String,
        msg: String, details: String): Unit = synchronized {
      buf += Event(System.currentTimeMillis(), p, f, level, tpe, msg, details): Unit
    }

    override def onTableWritten(p: String, f: String, t: String): Unit =
      add(p, f, "INFO", "table_written", s"wrote $t", json("table" -> t))
    override def onTableTagged(p: String, f: String, t: String,
        tags: Map[String, String]): Unit =
      add(p, f, "INFO", "table_tagged", s"tagged $t",
        json(("table" -> t) +: tags.toSeq.sortBy(_._1): _*))
    override def onTestResult(p: String, f: String, n: String, tt: String,
        v: Long): Unit =
      add(p, f, if (v == 0) "INFO" else "WARN", "test_result",
        s"$n ($tt): $v violation(s)",
        json("test" -> n, "test_type" -> tt, "violations" -> v.toString))

    /** Flush point: ONE append per flowgroup run, completion row included. */
    override def onFlowgroupComplete(p: String, f: String,
        e: Option[Throwable]): Unit = {
      add(p, f, if (e.isEmpty) "INFO" else "ERROR", "flowgroup_complete",
        e.map(t => s"failed: ${Option(t.getMessage).getOrElse(t.getClass.getName)}")
          .getOrElse("completed"),
        json("status" -> (if (e.isEmpty) "completed" else "failed")))
      val mine = synchronized {
        val m = buf.filter(ev => ev.pipeline == p && ev.flowgroup == f).toList
        buf --= m
        m
      }
      import spark.implicits._
      // a failed append must not LOSE the run's events (removed from the
      // buffer, never on disk): re-buffer and rethrow, so a later
      // completion of the same flowgroup (a retry) flushes them with its
      // own batch
      try store.append(tableFor(p), mine.toDF())
      catch { case e2: Throwable =>
        synchronized { buf ++= mine }
        throw e2
      }
    }
  }
}
