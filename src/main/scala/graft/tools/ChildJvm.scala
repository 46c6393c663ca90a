package graft.tools

/** One shared child-JVM launcher for every crash-forge fixture
  * (CrawlResumeChild, BridgeCommitChild): C1-only JIT (the children live
  * seconds), the parent's --add-opens/--add-exports harvested so Spark's
  * reflective accesses keep working, combined stdout+stderr returned with
  * the exit code. Factored so the classpath/JVM-flag contract cannot
  * drift between the gates and the kill-matrix specs. */
object ChildJvm {
  def spawn(mainClass: String, args: Seq[String],
      extraJvmArgs: Seq[String] = Nil): (Int, String) = {
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    val cmd = (Seq(javaBin, "-Xmx4g", "-XX:TieredStopAtLevel=1") ++ addOpens ++
      extraJvmArgs ++ Seq("-cp", sys.props("java.class.path"), mainClass) ++
      args).toArray
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes, "UTF-8")
    (proc.waitFor(), out)
  }
}
