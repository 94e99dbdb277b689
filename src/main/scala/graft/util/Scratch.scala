package graft.util

import java.nio.file.{Files, Path}

/** Managed scratch directories for queries that need real on-disk state
  * (persisted digest stores, bucketed tables, stream checkpoints) as part
  * of their lifecycle shape. Every dir handed out here is registered for
  * recursive deletion at JVM exit, so repeated query construction (EXPLAIN
  * passes, harness re-invocations) cannot leak temp trees.
  */
object Scratch {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { p => deleteRecursively(p) }
    }))
  }

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.exists(p)) {
        Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      }
    } catch { case _: Exception => () }
  }

  /** A fresh temp directory (as a string path), cleaned up at JVM exit. */
  def dir(prefix: String): String = {
    hook
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
