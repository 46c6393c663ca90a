package graft.exec

/** The one recursive-delete used across the engine (table drops, checkpoint
  * resets, staging cleanup). Kept deliberately dumb: local filesystem only
  * (the warehouse contract), null-safe on unreadable directories, silent on
  * already-missing paths — callers that need loudness check existence
  * themselves. */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  def deleteRecursively(path: String): Unit =
    deleteRecursively(new java.io.File(path))
}
