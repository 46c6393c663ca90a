package graft

import graft.exec.TableStore

/** Maintenance CLI — compact a warehouse's tables toward a target file size
  * (the OPTIMIZE analogue for the parquet store): frequent AvailableNow
  * microbatches leave many small part-files; compaction rewrites them
  * through the stage-and-swap path, optionally re-clustering.
  *
  * {{{
  * sbt "runMain graft.Maintain <warehouse> [table] [targetMB] [sortCol,...] [range|zorder]"
  * }}}
  */
object Maintain {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Maintain <warehouse> [table] [targetMB] [sortCol,...] [range|zorder]")
    val warehouse = args(0)
    val only = args.lift(1).filterNot(_ == "*")
    val targetBytes = args.lift(2).map(_.toLong * 1024 * 1024)
      .getOrElse(128L * 1024 * 1024)
    val sortBy = args.lift(3).map(_.split(',').toSeq).getOrElse(Nil)
    val strategy = args.lift(4).getOrElse("range")
    require(strategy == "range" || strategy == "zorder",
      s"unknown cluster strategy '$strategy' (range | zorder)")
    require(strategy == "range" || sortBy.nonEmpty,
      "zorder needs sortCol,... to interleave")

    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val store = new TableStore(spark, warehouse)
    val tables = only.map(Seq(_)).getOrElse(listTables(warehouse))
    tables.foreach { t =>
      // Compaction rewrites every part-file, which a checkpointed FILE
      // STREAM consumer would re-read wholesale. Tables already maintained
      // by merges carry the 'rewritten' marker (their stream consumers are
      // directed at the __changes companion); compacting a PRISTINE
      // append-only table converts it to that regime — warn loudly so an
      // operator doesn't silently break incremental consumers.
      if (store.getMeta(t, "rewritten").isEmpty)
        graft.Log.warn(s"compacting append-only table '$t': " +
          "any checkpointed file-stream consumer of it must be full-refreshed " +
          "(stream its __changes companion to stay incremental)")
      val before = dataFileCount(store, t)
      store.compact(t, targetBytes, sortBy, strategy)
      println(s"[graft] compacted $t: $before -> ${dataFileCount(store, t)} data files")
    }
    spark.stop()
  }

  /** Table directories under the warehouse root: any directory containing a
    * parquet file directly or Hive-style partition dirs, excluding internal
    * dirs (checkpoints, staging, sinks, reports) and `__changes` CDF
    * companions — compacting a change log would break its CDF readers for
    * no benefit (it is consumed incrementally, never scanned whole). */
  def listTables(warehouse: String): Seq[String] = {
    val root = new java.io.File(warehouse)
    def walk(dir: java.io.File, prefix: String): Seq[String] = {
      val fs = Option(dir.listFiles()).getOrElse(Array.empty)
      fs.filter(f => f.isDirectory && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_") && !f.getName.endsWith("__changes"))
        .toSeq.flatMap { d =>
        val name = if (prefix.isEmpty) d.getName else s"$prefix.${d.getName}"
        val files = Option(d.listFiles()).getOrElse(Array.empty)
        if (files.exists(f => f.isFile && f.getName.endsWith(".parquet"))) Seq(name)
        else if (files.exists(f => f.isDirectory && f.getName.contains('='))) Seq(name)
        else walk(d, name)
      }
    }
    walk(root, "")
  }

  private def dataFileCount(store: TableStore, table: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1
      else 0
    walk(new java.io.File(store.path(table)))
  }
}
