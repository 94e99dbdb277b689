package graft.util

import java.nio.file.{Files, Path}

/** Managed scratch directories for queries that need real on-disk state
  * (persisted digest stores, bucketed tables, stream checkpoints) as part
  * of their lifecycle shape. Every dir handed out here is registered for
  * recursive deletion at JVM exit — the backstop — and callers have three
  * EXPLICIT lifecycles so a long-lived session doesn't accumulate temp
  * trees until exit:
  *   - [[withDir]] scopes a dir to a code block (deleted on the way out);
  *   - [[release]] drops one dir by path once its consumer is done;
  *   - [[marker]]/[[releaseSince]] bracket a unit of work (the Verify
  *     harness wraps each query: materialize the result, then drop every
  *     scratch dir that query created).
  */
object Scratch {
  // (monotonic id, path): ids make the marker/releaseSince bracket
  // immune to interleaved release() calls — a positional index would
  // shift when a PRE-mark dir is released mid-bracket and make
  // releaseSince drop the wrong entries
  private val created = scala.collection.mutable.ArrayBuffer.empty[(Long, Path)]
  private var nextId: Long = 0L

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      synchronized { created.toList }.foreach(e => deleteRecursively(e._2))
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

  /** A fresh temp directory (as a string path), cleaned up at JVM exit
    * at the latest — prefer one of the explicit lifecycles above when
    * the dir's useful life is shorter than the session's.
    */
  def dir(prefix: String): String = synchronized {
    hook
    val p = Files.createTempDirectory(prefix)
    created += ((nextId, p))
    nextId += 1
    p.toString
  }

  /** Delete a dir handed out by [[dir]] NOW and deregister it from the
    * exit hook. No-op for unknown paths.
    */
  def release(path: String): Unit = {
    val doomed = synchronized {
      val idx = created.indexWhere(_._2.toString == path)
      if (idx < 0) None else Some(created.remove(idx)._2)
    }
    doomed.foreach(deleteRecursively)
  }

  /** High-water mark (a monotonic creation id) — bracket with
    * [[releaseSince]] to drop everything a unit of work allocated.
    * Single-bracket-at-a-time semantics: dirs another thread creates
    * inside the bracket are released with it (the Verify harness, the
    * one bracketing caller, is single-threaded per query).
    */
  def marker(): Long = synchronized { nextId }

  /** Delete and deregister every dir created at or after `mark` (as
    * returned by [[marker]]). The harness teardown: run query →
    * materialize → releaseSince(mark), so per-query state doesn't
    * outlive the query.
    */
  def releaseSince(mark: Long): Unit = {
    val doomed = synchronized {
      val (drop, keep) = created.partition(_._1 >= mark)
      created.clear(); created ++= keep
      drop.toList.map(_._2)
    }
    doomed.foreach(deleteRecursively)
  }

  /** Scoped form: the dir lives exactly as long as `body`. */
  def withDir[T](prefix: String)(body: String => T): T = {
    val d = dir(prefix)
    try body(d) finally release(d)
  }

  /** Materialize `df` to a scratch parquet dir and read it back — the
    * DISK-backed analogue of `localCheckpoint(eager = true)` for a
    * result that must outlive the state it was computed from (e.g. an
    * index inside a [[withDir]] block). Unlike a local checkpoint, the
    * materialized result pins no executor storage memory for the
    * session: the backing files are plain scratch parquet, released at
    * the harness's per-query teardown like any other scratch dir.
    */
  def materialize(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val d = dir("mat")
    df.write.mode("overwrite").parquet(d)
    df.sparkSession.read.parquet(d)
  }
}
