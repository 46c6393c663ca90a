package graft.plugins

/** Shared `parameters`-map readers for plugin transforms — one copy for
  * every plugin object in this package. */
private[plugins] object Params {
  def str(p: Map[String, Any], k: String, d: String): String =
    p.get(k).map(_.toString).getOrElse(d)
  def num(p: Map[String, Any], k: String, d: Double): Double =
    p.get(k).map(_.toString.toDouble).getOrElse(d)
}
