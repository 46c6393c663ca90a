package graft.exec

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession

import graft.model.FlowGroup
import graft.plan.DependencyAnalyzer

/** Multi-flowgroup orchestration: build the flowgroup dependency graph, run
  * topological generations in order, and flowgroups *within* a generation in
  * parallel (the reference's ProcessPoolExecutor fan-out,
  * core/coordination/_pool.py:196 — here threads submitting concurrent Spark
  * jobs into one session; Spark's scheduler interleaves their stages across
  * the cluster, which is the idiomatic Spark replacement for a process pool).
  *
  * Fault policy: a failure never aborts the run — unaffected flowgroups in
  * the same and later generations still execute, but transitive DEPENDENTS
  * of a failed flowgroup are skipped (running them would read stale or
  * missing upstream tables) and reported with `skipped = true`.
  */
final class PipelineOrchestrator(
    spark: SparkSession,
    store: TableStore,
    checkpointRoot: String,
    maxParallelism: Int = 4,
    plugins: Map[String, AnyRef] = Map.empty,
    hooks: PipelineHooks = PipelineHooks.noop,
    projectRoot: String = ".",
    opMetaColumns: Map[String, graft.operators.OperationalMetadata.ColumnDef] = Map.empty,
    fullRefresh: Set[String] = Set.empty,
    /** uc_tagging policy — see [[PipelineRunner]]. */
    tagsEnabled: Boolean = true,
    removeUndeclaredTags: Boolean = false,
    /** Default root for path-less file sinks — see [[PipelineRunner]]. */
    sinkRoot: Option[String] = None) {
  import PipelineOrchestrator.Outcome

  /** Run all flowgroups respecting cross-flowgroup table dependencies.
    * Returns one outcome per flowgroup (run, failed, or skipped). */
  def run(fgs: Seq[FlowGroup]): Seq[Outcome] = {
    // full-refresh tables drop ONCE up front (and each action's stream
    // state with them) — per-runner drops would let a cross-flowgroup
    // fan-in's later flow wipe an earlier flow's fresh output
    if (fullRefresh.nonEmpty) {
      for {
        fg <- fgs
        w <- fg.actions.collect { case w: graft.model.WriteAction => w }
        if fullRefresh.contains("*") || fullRefresh.contains(w.table)
      } {
        store.drop(w.table)
        store.drop(s"${w.table}__changes")
        store.drop(s"${w.table}__tombstones")
        // the incremental_join companion lives and dies with its MV
        w match {
          case mv: graft.model.MaterializedViewWrite if mv.incrementalJoin =>
            store.drop(s"${w.table}__joined")
          case _ =>
        }
        Fs.deleteRecursively(s"$checkpointRoot/${fg.pipeline}/${fg.flowgroup}/${w.name}")
      }
    }
    val runId = java.util.UUID.randomUUID().toString
    val byName = fgs.map(fg => s"${fg.pipeline}.${fg.flowgroup}" -> fg).toMap
    val graph = DependencyAnalyzer.flowgroupGraph(spark, fgs,
      projectRoot = projectRoot)
    val pool = Executors.newFixedThreadPool(math.max(1, maxParallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val dead = scala.collection.mutable.Set[String]() // failed or skipped
    try {
      graph.generations.flatMap { gen =>
        val (blocked, runnable) = gen.partition(n =>
          graph.edges.getOrElse(n, Set.empty).exists(dead))
        dead ++= blocked
        val skips = blocked.flatMap(byName.get).map { fg =>
          // skipped flowgroups fire the completion hook too — the event
          // log and test reporters must record WHY a flowgroup produced
          // nothing, or monitoring cannot tell "skipped on upstream
          // failure" from "never scheduled"
          // guarded like the runner-thread hooks: a hook failure here
          // (event-log lock timeout, legacy-table refusal) ran on the
          // orchestrator thread and aborted every remaining generation,
          // violating the fault policy above
          try hooks.onFlowgroupComplete(fg.pipeline, fg.flowgroup,
            Some(new RuntimeException(
              "skipped: an upstream flowgroup failed this run")))
          catch { case e: Exception =>
            graft.Log.warn(s"completion hook failed for skipped flowgroup " +
              s"${fg.pipeline}.${fg.flowgroup}: ${e.getMessage}")
          }
          Outcome(s"${fg.pipeline}.${fg.flowgroup}", None, skipped = true,
            durationMs = 0L)
        }
        val futures = runnable.flatMap(byName.get).map { fg =>
          Future {
            // runners receive the full-refresh set: the orchestrator's
            // up-front pass drops the tables/changes/checkpoints ONCE
            // (per-runner re-drops would let a fan-in's later flow wipe an
            // earlier flow's fresh output — drops stay idempotent against
            // that), but the RUNNER-side refresh behaviors beyond dropping
            // (the incremental_join __joined companion reset, Auto Loader
            // schema-pin re-inference, includeExistingFiles snapshot
            // re-take) key off this set and silently never fired when it
            // arrived empty. One runId for the whole orchestrated run —
            // per-runner random UUIDs made _pipeline_run_id useless for
            // correlating a run's outputs across flowgroups.
            val runner = new PipelineRunner(spark, store, checkpointRoot, plugins, hooks,
              projectRoot, opMetaColumns, runId = runId,
              fullRefresh = fullRefresh, refreshDropsExternal = true,
              tagsEnabled = tagsEnabled, removeUndeclaredTags = removeUndeclaredTags,
              sinkRoot = sinkRoot)
            val name = s"${fg.pipeline}.${fg.flowgroup}"
            val t0 = System.nanoTime()
            def ms = (System.nanoTime() - t0) / 1000000
            try { runner.run(fg); Outcome(name, None, skipped = false, ms) }
            catch { case e: Throwable => Outcome(name, Some(e), skipped = false, ms) }
          }
        }
        val ran = Await.result(Future.sequence(futures), Duration.Inf)
        dead ++= ran.filter(_.error.isDefined).map(_.flowgroup)
        skips ++ ran
      }
    } finally pool.shutdown()
  }
}

object PipelineOrchestrator {
  final case class Outcome(flowgroup: String, error: Option[Throwable],
      skipped: Boolean = false, durationMs: Long = 0L)
}
