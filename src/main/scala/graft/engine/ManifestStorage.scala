package graft.engine

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Point

/** MANIFEST-AUTHORITATIVE parquet storage — the object-store (S3/GCS)
  * commit variant of [[ParquetStorage]].
  *
  * Every commit protocol in [[ParquetStorage]] uses `FileSystem.rename`
  * as its commit point and is therefore refused on S3-style object
  * stores ([[graft.util.FsContract]]): rename there is a non-atomic
  * copy+delete per object, a directory rename can land partially, and
  * a recovery that reads directory state could misread a partial
  * commit as a completed one. This backend removes the directory
  * listing from the trust chain entirely — the Iceberg/Delta-style
  * answer (reference point for the semantics it generalizes: the
  * temp-file swap of tinyflux `storages.py:383-400`):
  *
  *   - Data files live in immutable, uniquely-named COMMIT DIRECTORIES
  *     (`c-<uuid>/`), written once and NEVER renamed or mutated. Each
  *     carries its own `_files` list (written by the committer after
  *     the write job succeeded, before anything references the dir).
  *   - The ONLY authority on what the store contains is the newest
  *     COMPLETE manifest `_manifest/<gen>`: the full list of live
  *     commit dirs (plus the idempotent-ingest token ring). Readers
  *     resolve the manifest head and read exactly the listed files —
  *     a half-written data dir, a partially-copied "rename", or a
  *     crashed writer's leftovers are INVISIBLE because nothing
  *     references them. There is no recovery step: an interrupted
  *     commit leaves orphan files (reclaimed by [[vacuum]]), never a
  *     misreadable state.
  *   - The commit point is ONE create-only publish of `_manifest/
  *     <gen+1>`. On filesystems with atomic rename the publish is
  *     tmp-write + exclusive rename (airtight even mid-write). On
  *     object stores it is a single conditional PUT (`create(p,
  *     overwrite=false)` — S3 If-None-Match, GCS if-generation-match:0,
  *     ABFS all support it): content visibility is all-or-nothing per
  *     object, and the create-only condition arbitrates racing
  *     committers. That single-object exclusive create is the ONLY
  *     filesystem primitive this backend needs — vastly weaker than
  *     the atomic+exclusive DIRECTORY rename the swap-based layout
  *     demands, which is why this backend opens where [[ParquetStorage]]
  *     refuses. Manifests additionally end in a terminator line, so
  *     even a torn manifest (a non-atomic streaming fs dying mid-PUT)
  *     parses as incomplete and is skipped, never misread.
  *
  * Concurrency: appends retry on a lost manifest race (they commute —
  * the retry re-reads the head and re-links its own already-written
  * commit dir); [[overwrite]] is optimistic-concurrency like
  * [[ParquetStorage]] — it requires the head it observed at [[load]]
  * and fails loudly with `ConcurrentModificationException` when a
  * concurrent commit landed.
  *
  * Scale shape: the manifest lists commit DIRECTORIES, not files —
  * appends rewrite O(commits), never O(files); [[compact]] folds all
  * commits into one, bounding both the manifest and the per-load
  * `_files` reads (commit-dir file lists are immutable and cached per
  * handle). Vacuum is the only deletion path and spares anything
  * referenced by the retained manifest window plus anything younger
  * than the grace period, so in-flight readers and committers are
  * never undercut.
  */
final class ManifestStorage(val spark: SparkSession, root: String) extends Storage {
  import ManifestStorage._

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val manifestDir = s"${root.stripSuffix("/")}/_manifest"
  private def rootQ = root.stripSuffix("/")

  /** Atomic-rename filesystems publish manifests by tmp+exclusive-
    * rename (complete-or-absent even while streaming); others by
    * conditional create — see the class doc.
    */
  private val renamePublish: Boolean = graft.util.FsContract.AtomicRenameSchemes(
    graft.util.FsContract.schemeOf(
      fs.makeQualified(new Path(root)).toString))

  /** gen = manifest number; commits = live commit-dir names in commit
    * order; tokens = idempotent-ingest token ring (newest last).
    */
  private case class Manifest(gen: Long, commits: Seq[String], tokens: Seq[String])

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  // Body: `C <enc dir>` per commit, `T <enc token>` per token, then
  // terminator `E <recordCount>` — a manifest without a matching
  // terminator is in-flight or torn and never trusted.
  private def render(m: Manifest): String = {
    val recs = m.commits.map(c => s"C ${enc(c)}") ++ m.tokens.map(t => s"T ${enc(t)}")
    (recs :+ s"E ${recs.size}").mkString("\n")
  }

  private def parseManifest(gen: Long, body: String): Option[Manifest] = {
    val lines = body.split("\n").filter(_.nonEmpty)
    if (lines.isEmpty || !lines.last.startsWith("E ")) None
    else if (scala.util.Try(lines.last.drop(2).trim.toInt).toOption
      .forall(_ != lines.length - 1)) None
    else Some(Manifest(gen,
      lines.filter(_.startsWith("C ")).map(l => dec(l.drop(2))).toSeq,
      lines.filter(_.startsWith("T ")).map(l => dec(l.drop(2))).toSeq))
  }

  /** Every numeric manifest slot present, VALID OR NOT — the claim
    * counter must step past a torn manifest, while [[head]] skips it.
    */
  private def listedGens(): Seq[Long] =
    if (!fs.exists(new Path(manifestDir))) Seq.empty
    else fs.listStatus(new Path(manifestDir)).toSeq
      .filterNot(_.getPath.getName.startsWith("."))
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)

  private def readManifest(gen: Long): Option[Manifest] =
    graft.util.AtomicFiles.readString(fs, new Path(s"$manifestDir/$gen"))
      .flatMap(parseManifest(gen, _))

  /** Newest COMPLETE manifest — the one thing readers trust. */
  private def head(): Option[Manifest] =
    listedGens().sorted.reverse.iterator.map(readManifest).collectFirst {
      case Some(m) => m
    }

  /** Manifest head observed at the last [[load]] — what [[overwrite]]'s
    * staleness check compares against (same contract as
    * [[ParquetStorage]]'s `observedVersion`).
    */
  @volatile private var observedGen: Long = head().map(_.gen).getOrElse(0L)

  /** Publish `m` at its slot; false = another committer won the slot.
    * This is the commit point — one exclusive single-file create.
    */
  private def tryPublish(m: Manifest): Boolean = {
    if (!fs.exists(new Path(manifestDir))) { fs.mkdirs(new Path(manifestDir)); () }
    val target = new Path(s"$manifestDir/${m.gen}")
    if (fs.exists(target)) return false
    val bytes = render(m).getBytes("UTF-8")
    if (renamePublish) {
      val tmp = new Path(manifestDir, s".tmp-${UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try { out.write(bytes); out.hsync() } finally out.close()
      // exclusive rename: false ⇒ the slot was taken while we wrote
      val won = fs.rename(tmp, target)
      if (!won && fs.exists(tmp)) { fs.delete(tmp, false); () }
      won
    } else {
      // conditional PUT: content visibility is all-or-nothing per
      // object; create-only arbitrates the slot
      try {
        val out = fs.create(target, false)
        try { out.write(bytes); out.hsync() } finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  // ---- commit-dir file lists (immutable once referenced → cacheable) ----

  private val fileListCache = scala.collection.mutable.HashMap.empty[String, Seq[String]]

  private def writeFileList(dirName: String, names: Seq[String]): Unit = {
    val body = (names.map(n => s"F ${enc(n)}") :+ s"E ${names.size}").mkString("\n")
    val out = fs.create(new Path(s"$rootQ/$dirName/_files"), true)
    try { out.write(body.getBytes("UTF-8")); out.hsync() } finally out.close()
  }

  private def commitFiles(dirName: String): Seq[String] = synchronized {
    fileListCache.getOrElseUpdate(dirName, {
      val body = graft.util.AtomicFiles.readString(fs, new Path(s"$rootQ/$dirName/_files"))
        .getOrElse(throw new java.io.IOException(
          s"manifest store at $root: referenced commit dir $dirName has no _files list"))
      val lines = body.split("\n").filter(_.nonEmpty)
      require(lines.nonEmpty && lines.last == s"E ${lines.length - 1}",
        s"manifest store at $root: torn _files list in referenced commit dir $dirName")
      lines.filter(_.startsWith("F ")).map(l => s"$rootQ/$dirName/${dec(l.drop(2))}").toSeq
    })
  }

  /** Write `df` (seq-stamped, canonical schema) as a fresh immutable
    * commit dir; returns its name. Nothing references the dir until a
    * manifest commit links it, so a crash anywhere in here leaves only
    * vacuum-able orphans — this is why the write job's internal task
    * renames need no atomicity from the filesystem.
    */
  private def writeCommitDir(df: DataFrame): String = {
    val dirName = s"c-${UUID.randomUUID()}"
    val target = s"$rootQ/$dirName"
    org.apache.spark.sql.GraftSessionBridge.rebind(
      df.sortWithinPartitions(Point.TimeCol),
      ParquetStorage.syncedMicrosWriteSession(spark))
      .write.option("compression", "snappy").parquet(target)
    val names = fs.listStatus(new Path(target)).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
        !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).sorted
    writeFileList(dirName, names)
    dirName
  }

  override protected def knownEmpty: Boolean = head().isEmpty

  override def load(): DataFrame = {
    val h = head()
    observedGen = h.map(_.gen).getOrElse(0L)
    val files = h.toSeq.flatMap(_.commits).flatMap(commitFiles)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Point.schema)
    else spark.read.schema(Point.schema).parquet(files: _*)
      .select(Point.columns.map(col): _*)
  }

  override def append(batch: DataFrame): Unit = { appendDelta(batch); () }

  override def appendDelta(batch: DataFrame,
      compactPrefixes: Option[Boolean]): Option[DataFrame] = synchronized {
    val dirName = writeCommitDir(withSeq(batch))
    commitRetry(h => Some(Manifest(h.gen + 1, h.commits :+ dirName, h.tokens)))
    Some(spark.read.schema(Point.schema).parquet(commitFiles(dirName): _*))
  }

  /** Durable exactly-once append: the token ring rides the manifest
    * itself, so "data linked" and "token recorded" are ONE atomic
    * publish — there is no crash window between them to repair (the
    * [[ParquetStorage]] replay protocol exists exactly because its
    * data rename and commit record are two steps). The ring keeps the
    * newest [[ManifestStorage.MaxTokens]] tokens; like
    * `pruneIngestCommits(keepLast)`, a replay older than the window is
    * out of contract (a checkpointed stream only ever replays its last
    * uncommitted batch).
    */
  override def appendIdempotent(batch: DataFrame, token: String): Boolean = synchronized {
    if (hasIngestCommit(token)) return false
    val dirName = writeCommitDir(withSeq(batch))
    var applied = true
    commitRetry { h =>
      if (h.tokens.contains(token)) { applied = false; None } // raced replay: drop ours
      else Some(Manifest(h.gen + 1, h.commits :+ dirName,
        (h.tokens :+ token).takeRight(MaxTokens)))
    }
    applied
  }

  override def hasIngestCommit(token: String): Boolean =
    head().exists(_.tokens.contains(token))

  /** Optimistic-concurrency replace, mirroring [[ParquetStorage]]: the
    * head must still be what this handle [[load]]ed — a concurrent
    * commit fails the claim loudly instead of being silently clobbered.
    * The old commit dirs are NOT deleted (readers may hold them);
    * they unlink logically here and physically at the next [[vacuum]].
    */
  override def overwrite(full: DataFrame): Unit = synchronized {
    // `full` may read the current files; they outlive this commit
    // (no delete happens here), so no materialization barrier needed
    val dirName = writeCommitDir(full.select(Point.columns.map(col): _*))
    val h = head().getOrElse(Manifest(0L, Seq.empty, Seq.empty))
    if (h.gen != observedGen)
      throw new java.util.ConcurrentModificationException(
        s"manifest store at $root advanced to gen ${h.gen} since this handle " +
          s"loaded gen $observedGen — reload and recompute the mutation")
    val next = Manifest(math.max(h.gen, listedGens().foldLeft(0L)(math.max)) + 1,
      Seq(dirName), h.tokens)
    if (!tryPublish(next))
      throw new java.util.ConcurrentModificationException(
        s"manifest store at $root: concurrent commit won gen ${next.gen} — " +
          "reload and recompute the mutation")
    observedGen = next.gen
    resetGen()
  }

  /** Fold every live commit into ONE — bounds the manifest and the
    * per-load `_files` reads. Concurrent-append-safe: the fold only
    * publishes against the head it read; a lost race recomputes (the
    * new head's extra commits must fold too, or they would be dropped).
    */
  def compact(maxAttempts: Int = 3): Unit = synchronized {
    var attempt = 0
    while (attempt < maxAttempts) {
      val h = head().getOrElse(return)
      if (h.commits.size <= 1) return
      val files = h.commits.flatMap(commitFiles)
      val folded = spark.read.schema(Point.schema).parquet(files: _*)
        .select(Point.columns.map(col): _*)
      val dirName = writeCommitDir(folded)
      if (tryPublish(Manifest(h.gen + 1, Seq(dirName), h.tokens))) return
      attempt += 1
    }
    throw new java.io.IOException(
      s"manifest store at $root: compaction lost the commit race $maxAttempts times")
  }

  /** Reclaim everything unreachable: commit dirs referenced by NO
    * retained manifest (head back through `keepManifests` older ones)
    * and older than `graceMs` (mtime — covers in-flight committers
    * whose manifest publish hasn't landed yet and in-flight readers
    * still scanning an old head), manifests below the retained window,
    * and aged publish temp files. The only deletion path in this
    * backend.
    */
  def vacuum(graceMs: Long = 3600000L, keepManifests: Int = 3): Unit = synchronized {
    val h = head().getOrElse(return)
    val floor = h.gen - keepManifests
    val retained = listedGens().filter(g => g >= floor && g <= h.gen)
      .flatMap(readManifest)
    val referenced = (retained.flatMap(_.commits) ++ h.commits).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    fs.listStatus(new Path(rootQ)).toSeq.foreach { s =>
      val n = s.getPath.getName
      if (s.isDirectory && n.startsWith("c-") && !referenced(n) &&
        s.getModificationTime < cutoff) { fs.delete(s.getPath, true); () }
    }
    if (fs.exists(new Path(manifestDir)))
      fs.listStatus(new Path(manifestDir)).toSeq.foreach { s =>
        val n = s.getPath.getName
        val old = scala.util.Try(n.toLong).toOption.exists(_ < floor)
        val agedTmp = n.startsWith(".tmp-") && s.getModificationTime < cutoff
        if (old || agedTmp) { fs.delete(s.getPath, false); () }
      }
  }

  /** Append-shaped commit with retry: `build` maps the fresh head to
    * the next manifest (None = abandon — the caller's work is already
    * represented). Appends commute, so losing the publish race only
    * costs a re-read + re-publish of an O(commits) text file.
    */
  private def commitRetry(build: Manifest => Option[Manifest],
      maxAttempts: Int = 50): Unit = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val h = head().getOrElse(Manifest(0L, Seq.empty, Seq.empty))
      build(h) match {
        case None => return
        case Some(m0) =>
          // step past torn/invalid slots too — they hold their number
          val m = m0.copy(gen =
            math.max(m0.gen, listedGens().foldLeft(0L)(math.max) + 1))
          if (tryPublish(m)) return
      }
      attempt += 1
      Thread.sleep(2L)
    }
    throw new java.io.IOException(
      s"manifest store at $root: lost the manifest publish race $maxAttempts times")
  }
}

object ManifestStorage {
  /** Idempotent-ingest tokens remembered in the manifest ring — the
    * replay window, same contract as
    * [[ParquetStorage.pruneIngestCommits]]'s `keepLast` (any bound ≥ 1
    * is safe for a single checkpointed stream; the slack covers many
    * interleaved streams).
    */
  val MaxTokens: Int = 1024
}
