package graft

/** The engine's warning/advisory channel — the single seam through which
  * graft emits non-fatal diagnostics: lenient-mode config advisories,
  * deprecations, data-test violation notices, version-gate bypasses.
  *
  * Default routing is BOTH slf4j (Spark's bundled log4j2 backend, logger
  * name "graft" — so embedders silence or redirect it with one standard
  * log4j rule) and a `[graft] `-prefixed stderr line (the CLI's historical
  * behavior, visible without any logging config). Embedders replace the
  * whole route with [[Log.route]] — e.g. to collect advisories into a
  * validation report, or to fail CI on any warning.
  *
  * Thread-safety: the sink is a volatile ref; `route` is a rare
  * configuration call, `warn` is read-only on the hot path.
  */
object Log {
  type Sink = String => Unit

  /** stderr + slf4j — the default CLI behavior. Presentation (the
    * `[graft] WARN` prefix) lives HERE, not in individual messages, so a
    * replacement sink receives clean text and the slf4j line carries the
    * level structurally rather than in-band. */
  val stderrAndSlf4j: Sink = { msg =>
    org.slf4j.LoggerFactory.getLogger("graft").warn(msg)
    System.err.println(s"[graft] WARN $msg")
  }

  @volatile private var sink: Sink = stderrAndSlf4j

  /** Thread-scoped overlay for [[withSink]] — a PLAIN ThreadLocal, not a
    * DynamicVariable: the latter's InheritableThreadLocal would be copied
    * into any long-lived thread Spark spawns inside the scope (listener /
    * streaming daemons) and outlive the scope there, silently swallowing
    * that thread's advisories for the rest of the JVM. With no
    * inheritance, only the calling thread is scoped; threads it spawns use
    * the global route — the conservative boundary for a diagnostics
    * channel. */
  private val scoped = new ThreadLocal[Option[Sink]] {
    override def initialValue(): Option[Sink] = None
  }

  /** Replace the PROCESS-GLOBAL warning route (pass [[stderrAndSlf4j]] to
    * restore). Two embedders calling this concurrently capture each other's
    * advisories — concurrent scopes (parallel test suites, two pipelines in
    * one JVM) should use [[withSink]] instead. */
  def route(s: Sink): Unit = { sink = s }

  /** Run `body` with `s` as this thread's warning route, restoring on exit.
    * Safe under concurrency: each thread sees its own capture; threads
    * outside the scope (including threads spawned inside it) keep the
    * global route. */
  def withSink[A](s: Sink)(body: => A): A = {
    val prev = scoped.get()
    scoped.set(Some(s))
    try body finally scoped.set(prev)
  }

  /** Emit one engine warning through the current route — the innermost
    * [[withSink]] scope if one is active on this thread, else the global
    * [[route]]. Messages arrive WITHOUT the `[graft] ` prefix — the sink
    * owns presentation. */
  def warn(msg: String): Unit = scoped.get().getOrElse(sink)(msg)
}
