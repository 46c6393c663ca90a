package graft.tools

import org.apache.spark.sql.SparkSession

/** Crash-forge fixture for the c15 sustained-crawl capstone: a SECOND JVM
  * that runs one orchestrated generation against a shared warehouse and
  * HARD-HALTS (`Runtime.halt` — no shutdown hooks, no stream cleanup, the
  * closest in-process approximation of SIGKILL) the instant a named table
  * finishes writing. The parent gate then resumes the same project
  * in-process and asserts the final tables are exactly-once anyway.
  *
  * args: `<warehouse> <checkpointRoot> <yamlDir> <haltAfterTable>`.
  * Runs every `*.yaml` flowgroup in `yamlDir` (sorted) through the
  * orchestrator. Prints `HALTING after <table>` just before the halt so
  * the parent can distinguish the forged crash (exit 137) from a real
  * failure (exit 1). */
object CrawlResumeChild {
  def main(args: Array[String]): Unit = {
    val Array(wh, cp, yamlDir, haltAfter) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = new graft.exec.TableStore(spark, wh)
    val halt = new graft.exec.PipelineHooks {
      override def onTableWritten(p: String, f: String, table: String): Unit =
        if (table == haltAfter) {
          println(s"HALTING after $table")
          System.out.flush()
          Runtime.getRuntime.halt(137)
        }
    }
    val fgs = new java.io.File(yamlDir).listFiles()
      .filter(_.getName.endsWith(".yaml")).sortBy(_.getName).toSeq
      .map(f => graft.config.YamlConfig.parseFlowGroup(
        java.nio.file.Files.readString(f.toPath)))
    val orch = new graft.exec.PipelineOrchestrator(spark, store, cp, hooks = halt)
    val outcomes = orch.run(fgs)
    outcomes.find(_.error.isDefined).foreach { o =>
      System.err.println(s"CHILD FAILED ${o.flowgroup}: ${o.error.get}")
      sys.exit(1)
    }
    println("CHILD COMPLETED (halt hook never fired)")
    sys.exit(0)
  }
}
