package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.YamlConfig

/** The engine-warning seam: embedders route advisories; lenient-mode
  * config warnings arrive through it (not bare System.err). */
class LogSpec extends AnyFunSuite {

  private def capturing[A](body: => A): (A, Seq[String]) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    Log.route(buf += _)
    try { val r = body; (r, buf.toSeq) }
    finally Log.route(Log.stderrAndSlf4j)
  }

  test("lenient unrecognized-option advisory routes through Log, strict throws") {
    val yaml =
      """pipeline: p
        |flowgroup: g
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: delta, table: t, options: {startingVerison: "3"}}
        |    target: v
        |""".stripMargin
    val (_, warnings) = capturing(YamlConfig.parseFlowGroup(yaml, lenient = true))
    assert(warnings.exists(w =>
      w.contains("startingVerison") && w.contains("unrecognized")),
      s"expected the typo'd option advisory via Log.route, got: $warnings")
    val err = intercept[YamlConfig.ConfigError] {
      YamlConfig.parseFlowGroup(yaml, lenient = false)
    }
    assert(err.getMessage.contains("startingVerison"))
  }

  test("route replacement is total: nothing reaches the replaced sink's stderr line") {
    val (_, warnings) = capturing { Log.warn("advisory one"); Log.warn("two") }
    assert(warnings == Seq("advisory one", "two"))
  }

  test("withSink scopes per thread: concurrent captures never cross") {
    // Log.route is process-global (two concurrent embedders would capture
    // each other's advisories); withSink is the concurrency-safe form —
    // two threads capturing simultaneously must each see exactly their own
    val a = scala.collection.mutable.ArrayBuffer.empty[String]
    val b = scala.collection.mutable.ArrayBuffer.empty[String]
    val gate = new java.util.concurrent.CyclicBarrier(2)
    def worker(buf: scala.collection.mutable.ArrayBuffer[String], tag: String) =
      new Thread(() => Log.withSink(buf.synchronized { m => buf += m }) {
        gate.await() // both threads inside their scopes before either emits
        (1 to 50).foreach(i => Log.warn(s"$tag-$i"))
      })
    val (t1, t2) = (worker(a, "A"), worker(b, "B"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(a.size == 50 && a.forall(_.startsWith("A-")), a.take(5))
    assert(b.size == 50 && b.forall(_.startsWith("B-")), b.take(5))
    // and the scope restores: a warn after both joins uses the global route
    val (_, global) = capturing(Log.warn("back to global"))
    assert(global == Seq("back to global"))
  }
}
