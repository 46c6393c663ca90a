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
}
