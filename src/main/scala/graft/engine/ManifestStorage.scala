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
  *     <gen+1>`: an EXCLUSIVE create claims the slot (O_EXCL locally;
  *     `create(p, overwrite=false)` on HDFS; a conditional PUT on
  *     object-store connectors that support it — see [[tryPublish]]
  *     for the exact per-filesystem contract and the multi-writer
  *     caveat on connectors without conditional create), then the
  *     winner alone writes the content, ending in a terminator line —
  *     a manifest caught before its terminator parses as IN-FLIGHT
  *     and is skipped, never misread. That single-object exclusive
  *     create is the ONLY filesystem primitive this backend needs —
  *     vastly weaker than the atomic+exclusive DIRECTORY rename the
  *     swap-based layout demands, which is why this backend opens
  *     where [[ParquetStorage]] refuses.
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

  /** Age past which a claimed-but-contentless slot is a DEAD
    * claimant's (the window between claim and content close is
    * milliseconds of CPU work — only a process death leaves it open
    * this long). Tests shrink it via
    * `graft.storage.manifestStalePublishMs`.
    */
  private def stalePublishMs: Long =
    spark.conf.getOption("graft.storage.manifestStalePublishMs")
      .map(_.toLong).getOrElse(30000L)

  /** Highest slot a committer must claim PAST, waiting out any
    * in-flight publish first: an invalid newest slot younger than
    * [[stalePublishMs]] is a live committer between claim and content —
    * stepping past it immediately would base our manifest on the OLD
    * head, and the moment ours lands the in-flight commit (which will
    * complete successfully!) would be silently unlinked. A stale
    * invalid slot is a dead claimant's: step past it. Returns the slot
    * number to claim above (0 = none listed).
    */
  private def awaitSettledMaxGen(timeoutMs: Long = 60000L): Long = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (true) {
      val gens = listedGens()
      if (gens.isEmpty) return 0L
      val mx = gens.max
      if (readManifest(mx).isDefined) return mx
      val age = scala.util.Try(System.currentTimeMillis() -
        fs.getFileStatus(new Path(s"$manifestDir/$mx")).getModificationTime)
        .getOrElse(Long.MaxValue)
      if (age > stalePublishMs) return mx
      if (System.currentTimeMillis() > deadline)
        throw new java.io.IOException(
          s"manifest store at $root: slot $mx has been claimed but contentless " +
            s"for ${timeoutMs}ms — a wedged (not dead, not publishing) committer")
      Thread.sleep(2L)
    }
    0L // unreachable
  }

  // LAYOUT GUARD: a path holding a rename-committing ParquetStorage
  // store must not open here — with no `_manifest` the store would
  // read as EMPTY (all existing data silently invisible) and appends
  // would interleave manifest-format commits into the parquet layout.
  // The reverse guard lives in the ParquetStorage constructor. Typical
  // trigger: a store written under `assumeAtomicRename=true` opened by
  // a job that forgot the override (atPath then routes here).
  {
    val rp = new Path(root)
    if (fs.exists(rp) && !fs.exists(new Path(manifestDir))) {
      val foreign = fs.listStatus(rp).exists { s =>
        val n = s.getPath.getName
        n == "data" || n == "delta" || n == "_versions" || n.startsWith("fold-")
      }
      require(!foreign,
        s"path $root holds a rename-committing (ParquetStorage) store layout — " +
          "opening it as a manifest store would read it as empty. Open it with " +
          s"${graft.util.FsContract.OverrideKey}=true (its original mode), or " +
          "migrate by copying through a new manifest-mode path.")
    }
  }

  /** Manifest head observed at the last [[load]] — what [[overwrite]]'s
    * staleness check compares against (same contract as
    * [[ParquetStorage]]'s `observedVersion`).
    */
  @volatile private var observedGen: Long = head().map(_.gen).getOrElse(0L)

  /** Publish `m` at its slot; false = another committer won the slot.
    *
    * Two-phase on every filesystem — CLAIM then CONTENT:
    *   1. The slot is claimed by an EXCLUSIVE create of the manifest
    *      file itself. Local paths use `File.createNewFile` (O_EXCL —
    *      Hadoop's local `rename` maps to POSIX rename(2), which
    *      silently REPLACES an existing destination, so a tmp+rename
    *      publish would let two racers both "win" and one acknowledged
    *      commit vanish); HDFS-style filesystems use
    *      `create(p, overwrite=false)` (atomic-exclusive there);
    *      object stores map the same call to a conditional PUT where
    *      the connector supports it (S3A `fs.s3a.create.conditional
    *      .enabled`, GCS `if-generation-match: 0`) — on a connector
    *      WITHOUT conditional create the claim degrades to
    *      check-then-PUT, and multi-writer arbitration needs an
    *      external mutex (the Delta-on-S3 stance); single-writer
    *      deployments are safe regardless.
    *   2. The winner alone writes the content into its claimed slot.
    *      A reader that catches the window between claim and content
    *      close sees a terminator-less manifest — parsed as IN-FLIGHT,
    *      never misread — and resolves the previous head; the commit
    *      is acknowledged only after the content close succeeds. A
    *      claimant dying inside the window leaves a torn slot that
    *      readers skip and committers step past.
    */
  private def tryPublish(m: Manifest): Boolean = {
    if (!fs.exists(new Path(manifestDir))) { fs.mkdirs(new Path(manifestDir)); () }
    val target = new Path(s"$manifestDir/${m.gen}")
    if (fs.exists(target)) return false
    val uri = fs.makeQualified(target).toUri
    val claimed =
      if (uri.getScheme == null || uri.getScheme == "file")
        new java.io.File(uri.getPath).createNewFile()
      else
        try { fs.create(target, false).close(); true }
        catch { case _: java.io.IOException => false }
    if (!claimed) return false
    val out = fs.create(target, true)
    try { out.write(render(m).getBytes("UTF-8")); out.hsync() } finally out.close()
    true
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
    // wait out in-flight publishes first (ParquetStorage's claimVersion
    // spins on an unsealed head the same way): an append completing
    // under us must surface as a staleness conflict, not get unlinked
    val settled = awaitSettledMaxGen()
    val h = head().getOrElse(Manifest(0L, Seq.empty, Seq.empty))
    if (h.gen != observedGen)
      throw new java.util.ConcurrentModificationException(
        s"manifest store at $root advanced to gen ${h.gen} since this handle " +
          s"loaded gen $observedGen — reload and recompute the mutation")
    val next = Manifest(math.max(h.gen, settled) + 1, Seq(dirName), h.tokens)
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
      val settled = awaitSettledMaxGen()
      val h = head().getOrElse(return)
      if (h.commits.size <= 1) return
      val files = h.commits.flatMap(commitFiles)
      val folded = spark.read.schema(Point.schema).parquet(files: _*)
        .select(Point.columns.map(col): _*)
      val dirName = writeCommitDir(folded)
      if (tryPublish(Manifest(math.max(h.gen, settled) + 1, Seq(dirName), h.tokens)))
        return
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
        // manifests below the floor also respect the grace: a reader
        // that listed the manifest dir just before newer gens landed
        // must still be able to read the gen it resolved — deleting
        // ungraced, its head() would come up empty and the store would
        // silently read as empty mid-flight
        val old = scala.util.Try(n.toLong).toOption.exists(_ < floor) &&
          s.getModificationTime < cutoff
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
      // settle FIRST (wait out any in-flight publish, step past dead
      // claims), then read the head the new manifest builds on
      val settled = awaitSettledMaxGen()
      val h = head().getOrElse(Manifest(0L, Seq.empty, Seq.empty))
      build(h) match {
        case None => return
        case Some(m0) =>
          val m = m0.copy(gen = math.max(m0.gen, settled + 1))
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
