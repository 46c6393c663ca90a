package graft.exec

/** Test fixture: a SECOND JVM that grabs a table's `._writer_lock` with a
  * raw advisory file lock and holds it for `holdMs` — the foreign writer
  * the cross-process protocol exists to exclude. Prints `HELD` once the
  * lock is owned (the spec waits for it before asserting contention).
  * Test-sources only; never on the product classpath. */
object LockHolderMain {
  def main(args: Array[String]): Unit = {
    val Array(lockFile, holdMs) = args
    val p = java.nio.file.Paths.get(lockFile)
    java.nio.file.Files.createDirectories(p.getParent)
    val ch = java.nio.channels.FileChannel.open(p,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = ch.lock()
    println("HELD")
    System.out.flush()
    Thread.sleep(holdMs.toLong)
    lock.release()
    ch.close()
  }
}
