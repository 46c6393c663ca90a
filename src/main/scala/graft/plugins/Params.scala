package graft.plugins

/** Shared `parameters`-map readers for plugin transforms — one copy for
  * every plugin object in this package. */
private[plugins] object Params {
  def str(p: Map[String, Any], k: String, d: String): String =
    p.get(k).map(_.toString).getOrElse(d)
  def num(p: Map[String, Any], k: String, d: Double): Double =
    p.get(k).map(_.toString.toDouble).getOrElse(d)
  /** Refuse typo'd parameter KEYS: every knob below is a bare
    * `get(k).getOrElse(default)`, so `budget_denom:` or `frac:` would
    * silently select the default (whole-corpus sample, doubled budget).
    * Shipped plugins have a fixed knob set — unknown keys are config
    * errors, the same posture as the YAML layer's option allowlists.
    * (User-authored plugins are unaffected; this is opt-in per plugin.) */
  def requireKnown(p: Map[String, Any], plugin: String, known: String*): Unit = {
    val unknown = p.keySet -- known.toSet
    require(unknown.isEmpty,
      s"$plugin: unknown parameter(s) ${unknown.toSeq.sorted.mkString(", ")} " +
        s"(valid: ${known.sorted.mkString(", ")}) — a typo'd key would " +
        "silently fall back to the default value")
  }
}
