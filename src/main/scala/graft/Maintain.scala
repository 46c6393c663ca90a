package graft

import graft.exec.TableStore

/** Maintenance CLI — compact a warehouse's tables toward a target file size
  * (the OPTIMIZE analogue for the parquet store): frequent AvailableNow
  * microbatches leave many small part-files; compaction rewrites them
  * through the stage-and-swap path, optionally re-clustering.
  *
  * {{{
  * sbt "runMain graft.Maintain <warehouse> [table] [targetMB] [sortCol,...]"
  * }}}
  */
object Maintain {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Maintain <warehouse> [table] [targetMB] [sortCol,...]")
    val warehouse = args(0)
    val only = args.lift(1).filterNot(_ == "*")
    val targetBytes = args.lift(2).map(_.toLong * 1024 * 1024)
      .getOrElse(128L * 1024 * 1024)
    val sortBy = args.lift(3).map(_.split(',').toSeq).getOrElse(Nil)

    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val store = new TableStore(spark, warehouse)
    val tables = only.map(Seq(_)).getOrElse(listTables(warehouse))
    tables.foreach { t =>
      val before = dataFileCount(store, t)
      store.compact(t, targetBytes, sortBy)
      println(s"[graft] compacted $t: $before -> ${dataFileCount(store, t)} data files")
    }
    spark.stop()
  }

  /** Table directories under the warehouse root: any directory containing at
    * least one parquet file (directly or under partition dirs), excluding
    * internal dirs (checkpoints, staging, sinks, reports). */
  def listTables(warehouse: String): Seq[String] = {
    val root = new java.io.File(warehouse)
    def hasParquet(dir: java.io.File): Boolean = {
      val fs = Option(dir.listFiles()).getOrElse(Array.empty)
      fs.exists(f => f.isFile && f.getName.endsWith(".parquet")) ||
        fs.exists(f => f.isDirectory && hasParquet(f))
    }
    def walk(dir: java.io.File, prefix: String): Seq[String] = {
      val fs = Option(dir.listFiles()).getOrElse(Array.empty)
      fs.filter(f => f.isDirectory && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_")).toSeq.flatMap { d =>
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
