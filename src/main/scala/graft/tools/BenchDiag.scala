package graft.tools

/** JVM-level observability for the bench loop — DIAGNOSTIC ONLY, enabled
  * by `SPARK_GRAFT_DIAG=1`, never part of the bench JSON contract.
  *
  * Exists to answer a specific accounting question with data instead of a
  * drift note: the full-surface bench shows >2.5× per-iteration spreads on
  * the stateful/E2E gates late in a ~400-execution JVM (r12: q62
  * [10.5, 9.5, 24.6] s, c14 [10.7, 25.5, 5.4] s). The three candidate
  * mechanisms are each given a counter sampled around every timed query
  * execution, so an outlier execution can be ATTRIBUTED:
  *
  *  - GC pressure → cumulative collection time/count across all beans
  *    (`gcMs`/`gcCount`) plus post-execution heap occupancy;
  *  - state-store accumulation → the size of Spark's process-global
  *    `StateStore.loadedProviders` registry (each streaming gate's
  *    checkpoints are fresh per iteration, so stopped queries' providers
  *    are dead weight the maintenance thread still walks; read
  *    reflectively — it is a private field, and a diagnostics reader must
  *    not fork Spark surface to see it);
  *  - codegen/JIT churn → Janino compilation time and generated-class
  *    counts from Spark's public `CodegenMetrics` source.
  *
  * All readers are Try-guarded: a Spark-internal rename degrades the
  * metric to -1, never breaks the bench. */
object BenchDiag {

  final case class Snap(gcMs: Long, gcCount: Long, heapUsedMb: Long,
      stateProviders: Int, janinoMs: Long, janinoClasses: Long)

  private lazy val gcBeans = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala.toSeq
  }

  private lazy val loadedProvidersField: Option[java.lang.reflect.Field] =
    scala.util.Try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      val f = cls.getDeclaredField("loadedProviders")
      f.setAccessible(true)
      f
    }.toOption

  private def stateProviderCount: Int =
    loadedProvidersField.flatMap { f =>
      scala.util.Try {
        val cls = Class.forName(
          "org.apache.spark.sql.execution.streaming.state.StateStore$")
        val module = cls.getField("MODULE$").get(null)
        val map = f.get(module).asInstanceOf[scala.collection.mutable.HashMap[_, _]]
        // sized under the map's own monitor — the maintenance thread
        // mutates it concurrently
        map.synchronized(map.size)
      }.toOption
    }.getOrElse(-1)

  def snap(): Snap = {
    val (gMs, gN) = gcBeans.foldLeft((0L, 0L)) { case ((ms, n), b) =>
      (ms + math.max(0, b.getCollectionTime), n + math.max(0, b.getCollectionCount))
    }
    val heap = java.lang.management.ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage.getUsed / (1024 * 1024)
    val (jMs, jN) = scala.util.Try {
      val cm = org.apache.spark.metrics.source.CodegenMetrics
      // histogram of per-compilation millis: the running SUM is what shows
      // cumulative churn, so fold the counter pair (count, mean) instead
      val h = cm.METRIC_COMPILATION_TIME
      (math.round(h.getSnapshot.getMean * h.getCount), h.getCount)
    }.getOrElse((-1L, -1L))
    Snap(gMs, gN, heap, stateProviderCount, jMs, jN)
  }

  /** One compact JSON object per timed execution for `bench_full.json`'s
    * `diag` array: absolute post-execution gauges + per-execution deltas.
    * `janinoMsD` is estimated from the histogram's (mean × count) running
    * sum, so small NEGATIVE deltas appear when the mean drifts down between
    * snapshots — read it for magnitude, not sign. Query names are the bench
    * registry's own keys (no user text), safe to splice unescaped. */
  def json(iter: Int, query: String, sec: Double, before: Snap, after: Snap): String =
    s"""{"q":"$query","it":$iter,"sec":${math.round(sec * 100) / 100.0},""" +
      s""""gcMsD":${after.gcMs - before.gcMs},"gcND":${after.gcCount - before.gcCount},""" +
      s""""heapMB":${after.heapUsedMb},"providers":${after.stateProviders},""" +
      s""""janinoMsD":${after.janinoMs - before.janinoMs},"janinoClsD":${after.janinoClasses - before.janinoClasses}}"""

  /** One stderr line per timed execution: absolute gauges + deltas vs the
    * previous snapshot. Greppable prefix `[bench-diag]`. */
  def emit(iter: Int, query: String, sec: Double, before: Snap, after: Snap): Unit =
    System.err.println(
      f"[bench-diag] iter=$iter q=$query sec=$sec%.2f " +
        s"gcMsD=${after.gcMs - before.gcMs} gcND=${after.gcCount - before.gcCount} " +
        s"heapMB=${after.heapUsedMb} providers=${after.stateProviders} " +
        s"janinoMsD=${after.janinoMs - before.janinoMs} " +
        s"janinoClsD=${after.janinoClasses - before.janinoClasses}")
}
