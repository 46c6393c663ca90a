package graft.exec

/** Crash-forge seam for the kill-point matrix: a `Runtime.halt(137)` (the
  * in-process stand-in for SIGKILL — no shutdown hooks, no stream cleanup)
  * at a NAMED interior point of an operator, armed ONLY when the
  * `graft.crashforge` system property equals that point's name. Production
  * runs never set the property, so the check is one string compare on a
  * cold path. Points live where the nasty crash windows are — state
  * persisted but the dependent table not yet committed (e.g. the BM25
  * index swap before the hits MV lands), windows the per-table halt hook
  * cannot reach. The child JVM of a crash gate sets the property; the
  * parent detects the forge by exit code 137 plus the `HALTING at` marker
  * on stdout. */
object CrashForge {
  val prop = "graft.crashforge"
  def maybeHalt(point: String): Unit =
    if (sys.props.get(prop).contains(point)) {
      println(s"HALTING at $point")
      System.out.flush()
      Runtime.getRuntime.halt(137)
    }
}
