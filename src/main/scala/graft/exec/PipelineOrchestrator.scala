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
  */
final class PipelineOrchestrator(
    spark: SparkSession,
    store: TableStore,
    checkpointRoot: String,
    maxParallelism: Int = 4,
    plugins: Map[String, AnyRef] = Map.empty,
    hooks: PipelineHooks = PipelineHooks.noop,
    projectRoot: String = ".",
    opMetaColumns: Map[String, String] = Map.empty) {
  import PipelineOrchestrator.Outcome

  /** Run all flowgroups respecting cross-flowgroup table dependencies.
    * Returns per-flowgroup outcomes; fails fast only within a generation. */
  def run(fgs: Seq[FlowGroup]): Seq[Outcome] = {
    val byName = fgs.map(fg => s"${fg.pipeline}.${fg.flowgroup}" -> fg).toMap
    val graph = DependencyAnalyzer.flowgroupGraph(spark, fgs)
    val pool = Executors.newFixedThreadPool(math.max(1, maxParallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      graph.generations.flatMap { gen =>
        val futures = gen.flatMap(byName.get).map { fg =>
          Future {
            val runner = new PipelineRunner(spark, store, checkpointRoot, plugins, hooks,
              projectRoot, opMetaColumns)
            val name = s"${fg.pipeline}.${fg.flowgroup}"
            try { runner.run(fg); Outcome(name, None) }
            catch { case e: Throwable => Outcome(name, Some(e)) }
          }
        }
        Await.result(Future.sequence(futures), Duration.Inf)
      }
    } finally pool.shutdown()
  }
}

object PipelineOrchestrator {
  final case class Outcome(flowgroup: String, error: Option[Throwable])
}
