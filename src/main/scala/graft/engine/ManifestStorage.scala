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
  *     <gen+1>` through the engine's shared manifest protocol
  *     ([[graft.util.ManifestLog]] — claim/content two-phase, torn =
  *     in-flight, settle before step-past, post-publish lost-ack
  *     re-link). That single-object exclusive create is the ONLY
  *     filesystem primitive this backend needs — vastly weaker than
  *     the atomic+exclusive DIRECTORY rename the swap-based layout
  *     demands, which is why this backend opens where
  *     [[ParquetStorage]] refuses. On connectors without conditional
  *     create the claim degrades to check-then-PUT, so opening a
  *     WRITER there demands the deployer's explicit attestation
  *     ([[graft.util.FsContract.requireManifestWritable]]: either the
  *     connector does conditional create, or the deployment is
  *     single-writer/externally serialized).
  *
  * Concurrency: appends retry on a lost manifest race (they commute —
  * the retry re-reads the head and re-links its own already-written
  * commit dir); [[overwrite]] is optimistic-concurrency like
  * [[ParquetStorage]] — it requires the head it observed at [[load]]
  * (or the [[snapshotToken]] the mutation was planned against) and
  * fails loudly with `ConcurrentModificationException` when a
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

  // multi-writer safety on a non-native-exclusive-create scheme is a
  // deployment fact the deployer must attest to (see FsContract)
  graft.util.FsContract.requireManifestWritable(spark, root,
    "manifest-authoritative store")

  private[graft] val log = new graft.util.ManifestLog(
    fs, new Path(manifestDir), () => stalePublishMs,
    graft.util.FsContract.exclusiveCreateNative(
      graft.util.FsContract.schemeOf(root)) ||
      graft.util.FsContract.confBool(spark, graft.util.FsContract.ConditionalCreateKey))

  /** gen = manifest number; commits = live commit-dir names in commit
    * order; tokens = idempotent-ingest token ring (newest last).
    */
  private case class Manifest(gen: Long, commits: Seq[String], tokens: Seq[String])

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  // Body: `C <enc dir>` per commit, `T <enc token>` per token (the
  // terminator is ManifestLog's protocol layer)
  private def render(m: Manifest): Seq[String] =
    m.commits.map(c => s"C ${enc(c)}") ++ m.tokens.map(t => s"T ${enc(t)}")

  private def fromRecords(gen: Long, recs: Seq[String]): Manifest =
    Manifest(gen,
      recs.filter(_.startsWith("C ")).map(l => dec(l.drop(2))),
      recs.filter(_.startsWith("T ")).map(l => dec(l.drop(2))))

  /** Newest COMPLETE manifest — the one thing readers trust. */
  private def head(): Option[Manifest] =
    log.head().map { case (g, recs) => fromRecords(g, recs) }

  /** Age past which a claimed-but-contentless slot is a DEAD
    * claimant's (the window between claim and content close is
    * milliseconds of CPU work — only a process death leaves it open
    * this long). Tests shrink it via
    * `graft.storage.manifestStalePublishMs`.
    */
  private def stalePublishMs: Long =
    spark.conf.getOption("graft.storage.manifestStalePublishMs")
      .map(_.toLong).getOrElse(30000L)

  /** Idempotent-token ring capacity — [[ManifestStorage.MaxTokens]]
    * unless shrunk by the `graft.storage.manifestMaxTokens` test seam
    * (how the eviction spec exercises the REAL ring without thousands
    * of commits).
    */
  private def maxTokens: Int =
    spark.conf.getOption("graft.storage.manifestMaxTokens")
      .map(_.toInt).getOrElse(MaxTokens)

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
    log.commitRetry(
      build = (_, recs) => {
        val h = fromRecords(0L, recs)
        if (h.commits.contains(dirName)) None
        else Some(render(Manifest(0L, h.commits :+ dirName, h.tokens)))
      },
      linked = recs => recs.contains(s"C ${enc(dirName)}"))
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
    log.commitRetry(
      build = (_, recs) => {
        val h = fromRecords(0L, recs)
        if (h.commits.contains(dirName)) None // ours landed (re-link confirm path)
        else if (h.tokens.contains(token)) { applied = false; None } // raced replay
        else Some(render(Manifest(0L, h.commits :+ dirName,
          (h.tokens :+ token).takeRight(maxTokens))))
      },
      // the token is the representation currency: either our publish
      // survives (dir + token linked) or a raced replay of the same
      // token committed the batch once — both satisfy at-most-once
      linked = recs => recs.contains(s"C ${enc(dirName)}") ||
        recs.contains(s"T ${enc(token)}"))
    applied
  }

  override def hasIngestCommit(token: String): Boolean =
    head().exists(_.tokens.contains(token))

  /** Fresh snapshot token = the current committed gen, resolved NOW —
    * captured by [[graft.engine.GraftDB]] mutations BEFORE planning
    * their rewrite, so a concurrent append landing between the plan's
    * load and a later re-load cannot slip past the [[overwriteAt]]
    * staleness check (the load-twice window).
    */
  override def snapshotToken(): Long = head().map(_.gen).getOrElse(0L)

  override def overwriteAt(full: DataFrame, token: Long): Unit = synchronized {
    observedGen = token
    overwrite(full)
  }

  /** Optimistic-concurrency replace, mirroring [[ParquetStorage]]: the
    * head must still be what this handle [[load]]ed (or the
    * [[snapshotToken]] passed through [[overwriteAt]]) — a concurrent
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
    val settled = log.awaitSettledMaxGen()
    val h = head().getOrElse(Manifest(0L, Seq.empty, Seq.empty))
    if (h.gen != observedGen)
      throw new java.util.ConcurrentModificationException(
        s"manifest store at $root advanced to gen ${h.gen} since this handle " +
          s"loaded gen $observedGen — reload and recompute the mutation")
    val nextGen = math.max(h.gen, settled) + 1
    val won = log.tryPublish(nextGen, render(Manifest(nextGen, Seq(dirName), h.tokens)))
    // overwrites do NOT commute: a stepper that published against the
    // old head while this publish stalled supersedes us — surface the
    // conflict loudly instead of acknowledging an unlinked commit
    if (!won || !log.confirmOrSupersede(nextGen,
        recs => recs.contains(s"C ${enc(dirName)}")))
      throw new java.util.ConcurrentModificationException(
        s"manifest store at $root: concurrent commit won gen $nextGen — " +
          "reload and recompute the mutation")
    observedGen = nextGen
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
      val settled = log.awaitSettledMaxGen()
      val h = head().getOrElse(return)
      if (h.commits.size <= 1) return
      val files = h.commits.flatMap(commitFiles)
      val folded = spark.read.schema(Point.schema).parquet(files: _*)
        .select(Point.columns.map(col): _*)
      val dirName = writeCommitDir(folded)
      val gen = math.max(h.gen, settled) + 1
      if (log.tryPublish(gen, render(Manifest(gen, Seq(dirName), h.tokens))) &&
        log.confirmOrSupersede(gen, recs => recs.contains(s"C ${enc(dirName)}")))
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
    val retained = log.listedGens().filter(g => g >= floor && g <= h.gen)
      .flatMap(g => log.read(g).map(fromRecords(g, _)))
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
