package graft.engine

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Point

/** Storage backend contract (reference: the `Storage` ABC,
  * tinyflux/storages.py:56-167). The engine is append-optimized;
  * mutation is copy-on-write: build the full new state, then commit it
  * atomically — the analogue of the reference's temp-file swap
  * (storages.py:383-400), hardened with a backup-rename protocol so a
  * crash mid-swap never loses the primary.
  *
  * All backends speak the canonical Point schema ([[Point.schema]])
  * including the `_seq` insertion-order column.
  *
  * `_seq` assignment is generation-based and job-free: each append gets
  * a fresh generation `g` and rows carry
  * `seq = (g << 45) + monotonically_increasing_id()`. The mono id is
  * `(partitionId << 33) | rowOffset`, so ordering by `_seq` preserves
  * (batch, partition, row) order — insertion order — without any shuffle
  * AND without scanning the table for a max. One `max(_seq)` scan per
  * storage handle (lazy, first append) seeds the generation counter.
  * Bounds: ≤ 4096 partitions per appended batch, ≤ 2^18 appends above
  * the seeded high water — far beyond any realistic ingest (batches of
  * any size are fine; it is the *batch count* that is bounded).
  */
trait Storage {
  def spark: SparkSession

  /** Current state as a DataFrame in canonical Point schema. */
  def load(): DataFrame

  /** Append a batch (canonical schema WITHOUT `_seq`; seq is assigned
    * here so insertion order is a storage-level guarantee).
    */
  def append(batch: DataFrame): Unit

  /** Append with a per-call serialization override — the reference's
    * per-insert `compact_key_prefixes` (database.py:617,654). `None`
    * keeps the backend's configured default; backends with no key-prefix
    * notion (memory, parquet) ignore the flag.
    */
  def append(batch: DataFrame, compactPrefixes: Option[Boolean]): Unit = append(batch)

  /** Append AND return the seq-stamped delta plan, when the backend can
    * reproduce exactly the appended rows without re-reading the store —
    * the hook the engine's incremental index extension needs (the
    * reference extends its index in place on in-order appends,
    * index.py:429-456, database.py:1309-1310). `None` = caller must
    * treat the append as opaque (CSV assigns `_seq` as the line number
    * at read time, so its delta is not reproducible from the plan).
    * The returned plan re-evaluates the batch, so the contract assumes
    * a deterministic batch — the same assumption Spark's own task
    * retries already make for the write itself.
    */
  def appendDelta(batch: DataFrame, compactPrefixes: Option[Boolean] = None): Option[DataFrame] = {
    append(batch, compactPrefixes); None
  }

  /** IDEMPOTENT append: apply `batch` at most once per `token`, no
    * matter how many times the call is retried — the sink half of
    * exactly-once streaming ingest (the source half is a replayable
    * offset log). Returns true when the batch was applied, false when
    * this token had already committed and the call was a no-op replay.
    *
    * Base implementation remembers tokens in the handle (exactly-once
    * within the process — the right contract for the in-memory backend,
    * which dies with the JVM anyway). [[ParquetStorage]] overrides with
    * a DURABLE commit record so replays after a crash-restart dedup too.
    */
  def appendIdempotent(batch: DataFrame, token: String): Boolean = synchronized {
    if (committedTokens.contains(token)) false
    else { append(batch); committedTokens += token; true }
  }

  /** Whether `token` has already committed through [[appendIdempotent]]
    * — the pre-check a caller needs to honor ALIAS tokens (e.g. a
    * renamed token format whose old name may have committed before an
    * upgrade) without re-appending.
    */
  def hasIngestCommit(token: String): Boolean =
    synchronized { committedTokens.contains(token) }

  private val committedTokens = scala.collection.mutable.HashSet.empty[String]

  /** Replace the full state (canonical schema WITH `_seq`). */
  def overwrite(full: DataFrame): Unit

  /** Fresh optimistic-concurrency snapshot token: the storage's CURRENT
    * committed version, resolved now (one listing, no Spark job).
    * A mutation captures this BEFORE planning its rewrite and passes it
    * to [[overwriteAt]], which fails loudly if any commit landed since
    * — closing the window where a mutation that loads the store twice
    * (plan + changed-count) would otherwise adopt the SECOND load's
    * version as its staleness baseline and silently drop a concurrent
    * append that landed between the loads. Backends without
    * multi-handle versioning (memory, CSV/JSONL single-file) return 0
    * and [[overwriteAt]] degrades to plain [[overwrite]].
    */
  def snapshotToken(): Long = 0L

  /** [[overwrite]] that requires the state to still be at `token`
    * (from [[snapshotToken]]); versioned backends throw
    * `ConcurrentModificationException` on a mismatch.
    */
  def overwriteAt(full: DataFrame, token: Long): Unit = overwrite(full)

  /** op 54 access-mode guards (reference Storage ABC defaults,
    * storages.py:60-84: everything allowed; file-backed stores refuse
    * per their open mode, storages.py:233-261).
    */
  def canRead: Boolean = true
  def canAppend: Boolean = true
  def canWrite: Boolean = true

  /** Cleanup hook (reference storages.py:105-123; CSVStorage closes its
    * file handles, storages.py:312-327). Base no-op: these backends
    * hold no open handles between operations.
    */
  def close(): Unit = ()

  // Generation counter; -1 = not yet derived from storage.
  private var gen: Long = -1L

  protected def nextGen(): Long = {
    if (gen < 0) gen = (math.max(currentMaxSeq(), 0L) >>> Storage.GenShift) + 1
    else gen += 1
    gen
  }

  /** Invalidate the generation counter (state rewritten underneath). */
  protected def resetGen(): Unit = gen = -1L

  protected def withSeq(batch: DataFrame): DataFrame =
    batch.withColumn(Point.SeqCol,
      lit(nextGen() << Storage.GenShift) + monotonically_increasing_id())

  /** Internal read for seq-counter seeding — bypasses the access-mode
    * read guard (an append-only 'a' handle must still seed `_seq` from
    * the existing file; that scan is not a user read op).
    */
  protected def loadUnguarded(): DataFrame = load()

  protected def currentMaxSeq(): Long = {
    if (knownEmpty) return -1L
    // single job: max over an empty store is null, no isEmpty pre-scan
    val row = loadUnguarded().agg(max(Point.SeqCol)).head()
    if (row.isNullAt(0)) -1L else row.getLong(0)
  }

  /** Backends that can tell "no data has ever been written" without
    * running a Spark job override this so the first append on a fresh
    * store skips the max(_seq) seeding scan entirely.
    */
  protected def knownEmpty: Boolean = false
}

object Storage {
  /** Bits reserved below the generation prefix of `_seq`. */
  val GenShift: Int = 45

  /** Row-count backstop for the coordinator (WAL-style) append path —
    * override per session with conf `graft.storage.localAppendMaxRows`.
    * The byte-estimate gate admits batches ≤ files.maxPartitionBytes/8
    * (16 MB at defaults, ~10^5 small points); this cap bounds what a
    * MIS-estimated batch can materialize on the coordinator before the
    * append declines and falls back to the distributed write.
    */
  val LocalAppendMaxRows: Int = 131072

  /** Size of `batch` for append ROUTING (WAL coordinator path vs
    * distributed write, and the distributed write's file count).
    *
    * Catalyst's `stats.sizeInBytes` is correct for scans and local
    * relations but is a GARBAGE DEFAULT (≈ `defaultSizeInBytes`, i.e.
    * effectively infinite) for a `localCheckpoint`ed batch whose
    * lineage had no stats — exactly the shape every streaming
    * `foreachBatch` hands the store. That mis-estimate routed every
    * micro-batch append to the distributed path at FULL parallelism:
    * 32 one-file tasks per ~5 MB batch, delta file count +32 per
    * append, auto-compaction re-triggering every batch — measured as
    * the dominant cost of the bench's `stream_ingest_drain` (appends
    * of 0.7–2.5 s that the WAL path does in ~0.1 s).
    *
    * A checkpointed batch, however, is already MATERIALIZED in the
    * block manager, which knows its true size — so prefer that when
    * the plan is a fully-cached `LogicalRDD`. (Deserialized cache size
    * slightly overestimates raw bytes — object headers ride along —
    * which only errs toward the distributed path: safe.)
    */
  private[engine] def appendSizeEstimate(spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame): BigInt = {
    def cachedSize(lr: org.apache.spark.sql.execution.LogicalRDD): Option[BigInt] =
      spark.sparkContext.getRDDStorageInfo
        .find(_.id == lr.rdd.id)
        // fully cached only: a partially-evicted RDD's block sizes
        // would under-report and could mis-route a big batch to the
        // coordinator (the row cap still backstops that, but don't
        // lean on it)
        .filter(i => i.isCached && i.numCachedPartitions >= lr.rdd.getNumPartitions)
        .map(i => BigInt(math.max(1L, i.memSize + i.diskSize)))
    val plan = batch.queryExecution.optimizedPlan
    val materialized = plan match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => cachedSize(lr)
      // a column-pruning/renaming projection layered over the
      // checkpointed batch (a plausible refactor of the streaming
      // insert path) must not fall back to the garbage default — the
      // cached size stays an OVER-estimate when the projection only
      // narrows or renames (attribute-only exprs; anything computed
      // falls through to the Catalyst estimate)
      case org.apache.spark.sql.catalyst.plans.logical.Project(exprs,
          lr: org.apache.spark.sql.execution.LogicalRDD)
          if exprs.forall {
            case _: org.apache.spark.sql.catalyst.expressions.Attribute => true
            case a: org.apache.spark.sql.catalyst.expressions.Alias =>
              a.child.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]
            case _ => false
          } => cachedSize(lr)
      case _ => None
    }
    materialized.getOrElse(plan.stats.sizeInBytes)
  }

  /** Encode InternalRows into ONE parquet file on the driver, with no
    * Spark job, through Spark's own `ParquetWriteSupport` — so the file
    * is bit-compatible with distributed writes: same spark-schema
    * metadata, same configured timestamp encoding, same snappy codec as
    * the delta tier. The conf keys `ParquetWriteSupport.init` reads are
    * set from the live session so both write paths stay in lockstep.
    */
  private[engine] def writeParquetLocal(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType, file: String,
      rows: Iterator[org.apache.spark.sql.catalyst.InternalRow]): Unit = {
    import org.apache.parquet.column.ParquetProperties
    import org.apache.parquet.hadoop.{ParquetOutputFormat, ParquetWriter}
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
    val hc = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    ParquetWriteSupport.setSchema(schema, hc)
    // ParquetWriteSupport.init + SparkToParquetSchemaConverter read these
    // from the Hadoop conf with a bare .toBoolean/withName (the
    // distributed path's prepareWrite sets them the same way); resolve
    // each from the session so both write paths stay in lockstep.
    import org.apache.spark.sql.internal.SQLConf
    val sc = spark.sessionState.conf
    hc.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sc.getConf(SQLConf.PARQUET_WRITE_LEGACY_FORMAT).toString)
    // the store's layout contract pins stats-bearing MICROS directly in
    // this writer's own Hadoop conf — the session's encoding (which an
    // INT96 application may have chosen for ITS writes) is neither read
    // nor touched, mirroring the distributed path's dedicated pinned
    // write session
    hc.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      SQLConf.ParquetOutputTimestampType.TIMESTAMP_MICROS.toString)
    hc.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sc.getConf(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED).toString)
    hc.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sc.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    // Writer version and block/page/dictionary layout come from the same
    // Hadoop-conf keys the distributed ParquetOutputFormat reads, so a
    // session that tunes parquet.block.size or parquet.writer.version
    // gets identical file layout from both write paths.
    val writerVersion = ParquetProperties.WriterVersion.fromString(
      hc.get(ParquetOutputFormat.WRITER_VERSION,
        ParquetProperties.DEFAULT_WRITER_VERSION.toString))
    val blockSize = hc.getInt(ParquetOutputFormat.BLOCK_SIZE,
      ParquetWriter.DEFAULT_BLOCK_SIZE)
    val pageSize = hc.getInt(ParquetOutputFormat.PAGE_SIZE,
      ParquetWriter.DEFAULT_PAGE_SIZE)
    val dictPageSize = hc.getInt(ParquetOutputFormat.DICTIONARY_PAGE_SIZE,
      ParquetWriter.DEFAULT_PAGE_SIZE)
    val dictEnabled = hc.getBoolean(ParquetOutputFormat.ENABLE_DICTIONARY,
      ParquetWriter.DEFAULT_IS_DICTIONARY_ENABLED)
    val writer = new ParquetWriter[org.apache.spark.sql.catalyst.InternalRow](
      new Path(file), new ParquetWriteSupport, CompressionCodecName.SNAPPY,
      blockSize, pageSize, dictPageSize, dictEnabled, false, writerVersion, hc)
    // On failure close() still writes a footer over the partial content,
    // committing a half-append as if it succeeded — close, then delete
    // the file, then rethrow so the caller sees a clean failure.
    var ok = false
    try { rows.foreach(writer.write); ok = true }
    finally {
      try writer.close()
      finally if (!ok) {
        val p = new Path(file)
        val pfs = p.getFileSystem(hc)
        if (pfs.exists(p)) { pfs.delete(p, false); () }
      }
    }
  }
}

/** In-memory backend (reference: MemoryStorage, storages.py:436-558).
  * `append` is a true O(1) buffer push — the exact analogue of the
  * reference's list append: the seq-stamped batch plan goes into a
  * pending list and the union plan is only assembled at the next
  * `load()`. Every [[MemoryStorage.CheckpointEvery]] folded batches the
  * state takes a lineage-truncating `localCheckpoint` so long insert
  * sequences don't grow the plan unboundedly.
  */
final class MemoryStorage(val spark: SparkSession, initial: Option[DataFrame] = None) extends Storage {
  private var state: DataFrame =
    initial.getOrElse(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Point.schema))
  private val pending = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private var foldsSinceCheckpoint = 0
  private var neverWritten = initial.isEmpty
  // state is still the zero-row seed plan → the first fold can adopt the
  // batch plan directly instead of analyzing a union with an empty side
  private var stateIsSeed = initial.isEmpty

  override protected def knownEmpty: Boolean = neverWritten

  override def load(): DataFrame = synchronized {
    if (pending.nonEmpty) {
      // The seed fast path adopts the batch plan directly, skipping the
      // union with the canonical empty seed — so it must re-assert the
      // schema contract the union used to enforce.
      if (stateIsSeed) {
        val head = pending.head
        require(head.columns.sameElements(Point.columns),
          s"append batch columns ${head.columns.mkString(",")} != canonical ${Point.columns.mkString(",")}")
        // The union with the canonical seed used to coerce types too
        // (e.g. map<string,float> fields widened to double); without it
        // an off-type first batch would be adopted verbatim and surface
        // later as a ClassCastException. Cast only when types drift.
        val typesMatch = head.schema.fields.zip(Point.schema.fields)
          .forall { case (a, b) => a.dataType == b.dataType }
        pending(0) =
          if (typesMatch) head
          else head.select(Point.schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
      }
      state =
        if (stateIsSeed) pending.tail.foldLeft(pending.head)(_ unionByName _)
        else pending.foldLeft(state)(_ unionByName _)
      stateIsSeed = false
      foldsSinceCheckpoint += pending.size
      pending.clear()
      if (foldsSinceCheckpoint >= MemoryStorage.CheckpointEvery) {
        state = state.localCheckpoint(eager = false)
        foldsSinceCheckpoint = 0
      }
    }
    state
  }

  override def append(batch: DataFrame): Unit = { appendDelta(batch); () }

  override def appendDelta(batch: DataFrame, compactPrefixes: Option[Boolean]): Option[DataFrame] =
    synchronized {
      val stamped = withSeq(batch)
      pending += stamped
      neverWritten = false
      // the exact plan the next load() folds — reproducible by identity
      Some(stamped)
    }

  override def overwrite(full: DataFrame): Unit = synchronized {
    // Eager: `full` may read from the current state, which is about to
    // be replaced — materialize before the reassignment.
    state = full.select(Point.columns.map(col): _*).localCheckpoint(eager = true)
    pending.clear()
    neverWritten = false
    stateIsSeed = false
    foldsSinceCheckpoint = 0
    resetGen()
  }
}

object MemoryStorage {
  val CheckpointEvery = 16
}

/** Parquet-backed persistent storage (replaces the reference's
  * CSVStorage, storages.py:170-433, with a columnar, partitioned,
  * stats-bearing layout).
  *
  * Two-tier LSM-ish layout:
  *   - `root/data/measurement=<m>/p_date=<yyyy-MM-dd>/` — the compacted
  *     main store: partition-pruned on measurement + date, files
  *     time-sorted within partitions so Parquet row-group min/max stats
  *     answer time-range predicates (the scalable replacement for the
  *     reference's sorted-timestamp index, index.py:719-821).
  *   - `root/delta/` — flat append-only parquet. Appends land here with
  *     no dynamic-partition fan-out (a small batch writes 1 file, not
  *     measurements×dates files), still time-sorted for row-group
  *     stats. [[compact]] folds delta into the partitioned store.
  *
  * Commit protocol for mutation (reference `_swap_temp_with_primary`,
  * storages.py:383-400, hardened): write staging → rename primary+delta
  * to backups → rename staging into place → drop backups. A crash at
  * any step leaves either the old state recoverable (backups present)
  * or the new state committed; [[recover]] runs at handle open.
  */
final class ParquetStorage(val spark: SparkSession, root: String, partitioned: Boolean = true,
    autoCompactFiles: Int = ParquetStorage.DefaultAutoCompactFiles)
    extends Storage {

  // every commit protocol below (overwrite swap, fold publish,
  // _versions claim/seal, snapshot-meta moves) reads rename as an
  // atomic+exclusive transition — refuse schemes where it isn't
  graft.util.FsContract.requireAtomicRename(spark, root,
    "graft parquet store (COW commits, fold publishes, version claims)")

  // LAYOUT GUARD (mirror of ManifestStorage's): a manifest-mode store
  // opened here would read as empty — its data lives in commit dirs no
  // rename-layout tier lists — and recover()/appends would start
  // interleaving the two formats.
  require({
    val rp = new Path(root)
    val rfs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    !rfs.exists(new Path(s"$root/_manifest"))
  }, s"path $root holds a MANIFEST-authoritative store layout — open it with " +
    "GraftDB.atManifest (or atPath on its original object-store scheme), not " +
    "the rename-committing backend.")

  private val dataPath = s"$root/data"
  private val deltaPath = s"$root/delta"
  private val backupDataPath = s"$root/.backup-data"
  private val backupDeltaPath = s"$root/.backup-delta"
  private val versionsPath = s"$root/_versions"

  // ---- fold generations: `fold-<v>` sibling dirs of the data tier ----
  // A compaction fold commits its ENTIRE output as ONE directory rename
  // (staging → fold-<v>) instead of one rename per staged file — the
  // graft-log sink's marker-flip shape applied to the main store. The
  // version in the NAME is the visibility fence: a reader that resolved
  // head h skips any fold-<w> dir with w > h wholesale (no per-file add
  // declarations needed), and the publish order (meta with the drops
  // lands strictly before the dir rename) keeps every crash window
  // roll-forward-able exactly like file moves. Each fold dir is its own
  // partition-discovery root (basePath = the fold dir), so the
  // partitioned layout inside is identical to the legacy data tier's.
  private def foldPath(v: Long) = s"$root/fold-$v"
  private val FoldDirName = """fold-(\d+)""".r

  /** Committed fold generations (ver, path), version-ascending. */
  private def foldDirs(): Seq[(Long, String)] =
    if (!exists(root)) Seq.empty
    else fs.listStatus(new Path(root)).toSeq.flatMap { s =>
      s.getPath.getName match {
        case FoldDirName(v) if s.isDirectory => Some((v.toLong, s.getPath.toString))
        case _ => None
      }
    }.sortBy(_._1)
  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // Parquet INT96 — Spark's legacy default timestamp encoding — carries
  // NO column statistics, which silently voids both row-group pruning
  // on time predicates and the footer-stat retention fast path. This
  // storage layer's layout contract is stats-bearing time-sorted files,
  // so every write THIS STORE makes must resolve the standard micros
  // encoding — but outputTimestampType has no per-write form
  // (ParquetUtils.prepareWrite copies it from the SESSION conf of the
  // frame being written, unconditionally), and a library must not
  // mutate the application's session encoding even transiently (an
  // application with legacy INT96 consumers writing its OWN parquet
  // concurrently with a store ingest batch must never observe the
  // store's pin — the leak window the r14 refcounted scoped pin still
  // had). The fix is a DEDICATED WRITE SESSION: one `newSession()` per
  // application session per JVM ([[ParquetStorage.syncedMicrosWriteSession]]),
  // conf-mirrored from the parent and re-pinned at every use, and every
  // outgoing frame re-bound to it at the last moment ([[rebound]] —
  // the frame's compiled RDD[InternalRow] becomes a LogicalRDD on the
  // pinned session, zero per-row conversion, all transforms and their
  // timezone/conf semantics already resolved under the ORIGINAL
  // session). The application session's conf is never touched, there
  // is no window, and there is no restore bookkeeping to get wrong.
  // Works uniformly for frames from the app session, this handle's
  // session, and Structured Streaming foreachBatch CLONED sessions
  // (same SparkContext, which in-process frames always share). The
  // driver-local writer path ([[Storage.writeParquetLocal]]) builds
  // its own Hadoop conf and pins MICROS there directly — no session
  // involved. Nothing here depends on the pin for CORRECTNESS: reads
  // handle either encoding, and a stat-less INT96 file is simply
  // treated as boundary-straddling by [[retainBefore]], whose filtered
  // rewrite re-encodes it with stats — self-healing.
  private def rebound(df: DataFrame): DataFrame =
    org.apache.spark.sql.GraftSessionBridge.rebind(
      df, ParquetStorage.syncedMicrosWriteSession(spark))

  recover()

  // ---- multi-handle commit protocol (beyond-reference: the reference is
  // explicitly single-threaded, docs/source/tips.rst:22) ----
  //
  // NOTE: graft.streaming.GraftLog.withTopicLock implements the same
  // claim/seal chain for TOPIC maintenance with a deliberately
  // different liveness policy — heartbeat lease + timeout takeover
  // there (topics have no handle-open recovery point), open-time
  // orphan sealing here. A fix to either protocol's claim/seal core
  // should be checked against the other.
  //
  // Every WRITE claims the next slot in a version chain under
  // `_versions/`: marker `<n>` = "transition n is in flight", `<n>.done`
  // = "transition n complete". A claim of n+1 is only attempted once
  // `<n>.done` exists, and the claim itself is an atomic create-if-absent
  // — so two handles on one root can never both be inside a destructive
  // swap, and an append landing between another writer's listing and its
  // rename (the classic lost-update window) cannot happen: the swap holds
  // the chain head until it seals. Appends RETRY on contention (they
  // commute); [[overwrite]] additionally verifies the chain head still
  // equals the version it observed at [[load]] and FAILS LOUDLY when a
  // concurrent commit has landed since — the caller recomputes from
  // fresh state (optimistic concurrency, not a silent clobber).
  // Sealing prunes markers below the head, so the chain dir stays O(1).

  /** Version observed at the last [[load]] — what [[overwrite]]'s
    * staleness check compares against.
    */
  @volatile private var observedVersion: Long = latestSealed()

  private def latestVersion(): Long =
    if (!exists(versionsPath)) 0L
    else fs.listStatus(new Path(versionsPath))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripSuffix(".done").toLong).toOption)
      .foldLeft(0L)(math.max)

  /** Largest SEALED version — a load during another writer's in-flight
    * transition observes the predecessor, so the overwrite that follows
    * it correctly conflicts once that transition seals.
    */
  private def latestSealed(): Long =
    if (!exists(versionsPath)) 0L
    else fs.listStatus(new Path(versionsPath))
      .flatMap(s => Option(s.getPath.getName)
        .filter(_.endsWith(".done"))
        .flatMap(n => scala.util.Try(n.stripSuffix(".done").toLong).toOption))
      .foldLeft(0L)(math.max)

  private def isSealed(n: Long): Boolean =
    n == 0L || fs.exists(new Path(s"$versionsPath/$n.done"))

  /** Atomic create-if-absent: true iff WE created the marker. Local
    * paths use File.createNewFile (O_EXCL); others rely on the
    * FileSystem's create(overwrite=false).
    */
  private def atomicClaim(p: Path): Boolean = {
    val uri = p.toUri
    if (uri.getScheme == null || uri.getScheme == "file")
      new java.io.File(uri.getPath).createNewFile()
    else
      try { fs.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
  }

  /** Claim the next version, spinning while the chain head is another
    * writer's in-flight transition. `requireObserved` = the destructive
    * paths' staleness check: conflict → ConcurrentModificationException
    * instead of a blind retry, because the caller's input was computed
    * from a state that is no longer current.
    */
  private def claimVersion(requireObserved: Boolean, timeoutMs: Long = 30000L): Long = {
    if (!exists(versionsPath)) { fs.mkdirs(new Path(versionsPath)); () }
    val deadline = System.currentTimeMillis() + timeoutMs
    while (true) {
      val cur = latestVersion()
      if (isSealed(cur)) {
        if (requireObserved && cur != observedVersion)
          throw new java.util.ConcurrentModificationException(
            s"storage at $root advanced to v$cur since this handle loaded " +
              s"v$observedVersion — reload and recompute the mutation")
        if (atomicClaim(new Path(s"$versionsPath/${cur + 1}"))) return cur + 1
        // lost the claim race: loop — the staleness check above will
        // fire for destructive callers once the winner seals
      }
      if (System.currentTimeMillis() > deadline)
        throw new java.io.IOException(
          s"timed out waiting for in-flight commit v${latestVersion()} at $root " +
            "(crashed writer? a new handle's open-time recovery seals orphans)")
      Thread.sleep(2L)
    }
    0L // unreachable
  }

  private def sealVersion(n: Long): Unit = {
    val out = fs.create(new Path(s"$versionsPath/$n.done"), true)
    out.close()
    // NOTE: deliberately does NOT touch observedVersion. observedVersion
    // is "the state this handle's next overwrite input was computed
    // from" — only load() (and overwrite's own seal, which establishes
    // the new state the caller now holds) may advance it. If an append
    // or compaction seal advanced it, the sequence load@v5 → sibling
    // commits v6 → own append seals v7 → overwrite(state-from-v5) would
    // pass the staleness check and silently erase the sibling's v6.
    // prune the chain below the head: keep only <n> and <n>.done
    fs.listStatus(new Path(versionsPath)).foreach { s =>
      val stem = s.getPath.getName.stripSuffix(".done")
      if (scala.util.Try(stem.toLong).toOption.exists(_ < n))
        fs.delete(s.getPath, false)
    }
  }

  /** Run `body` as one claimed transition. A body failure repairs the
    * store (same open-time [[recover]] protocol) and seals anyway, so a
    * surviving sibling handle is not deadlocked behind the dead claim;
    * the original failure propagates. `adoptVersion` = the overwrite
    * path: on success the sealed version becomes this handle's observed
    * version (the caller now holds exactly the state it just committed).
    */
  private def committed[T](requireObserved: Boolean, adoptVersion: Boolean = false)(body: => T): T =
    committedVersioned(requireObserved, adoptVersion)(_ => body)

  /** [[committed]] with the claimed version number in scope — the
    * snapshot-plan maintenance ops name their `_snapmeta/<v>` entry
    * after the version their commit seals.
    */
  private def committedVersioned[T](requireObserved: Boolean,
      adoptVersion: Boolean = false)(body: Long => T): T = {
    val v = claimVersion(requireObserved)
    try { val r = body(v); sealVersion(v); if (adoptVersion) observedVersion = v; r }
    catch {
      case e: Throwable =>
        try { recover(); sealVersion(v) } catch { case _: Throwable => () }
        throw e
    }
  }

  private def exists(p: String): Boolean = fs.exists(new Path(p))

  // A fresh directory needs no max(_seq) seeding scan.
  override protected def knownEmpty: Boolean =
    !exists(dataPath) && !exists(deltaPath) && foldDirs().isEmpty

  /** Crash recovery: if the primary is missing but backups exist, the
    * previous overwrite died mid-swap — restore the backups. If the
    * primary exists, any backups/staging are stale leftovers — drop them.
    */
  // HDFS-style FileSystem signals most failures by RETURNING FALSE, not
  // throwing; an unchecked rename followed by backup deletion could
  // destroy the only surviving copy. Every step is therefore verified.
  private def renameOrThrow(src: String, dst: String): Unit =
    if (!fs.rename(new Path(src), new Path(dst)))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
  private def deleteOrThrow(p: String): Unit =
    if (exists(p) && !fs.delete(new Path(p), true))
      throw new java.io.IOException(s"delete failed: $p")

  private def recover(): Unit = {
    // An overwrite's staging→data rename is the commit point: data
    // PRESENT means the swap completed (any backups are stale
    // leftovers); data ABSENT means a pre-swap crash, and every tier
    // the dying overwrite moved aside (primary, delta, fold
    // generations) comes back from its backup. The delta restore must
    // NOT require a data backup: a delta-only store (rows inserted,
    // never compacted, no data dir yet) that crashed pre-swap leaves
    // ONLY a delta backup — keying its restore on the data backup
    // would delete the store's entire contents below.
    val preData = exists(dataPath)
    // data present + any backup present is the POST-swap overwrite
    // signature (backups are created only by overwriteInner's swap, and
    // the staging→data rename is its commit point): the dying overwrite
    // subsumed every fold input and pending drop, so the snapshot-meta
    // chain it did not live to delete is stale — detected HERE, before
    // the backups (the signature) are cleaned up below
    val postSwapOverwrite = preData && (exists(backupDataPath) ||
      exists(backupDeltaPath) || (exists(root) && fs.listStatus(new Path(root))
        .exists(_.getPath.getName.startsWith(".backup-fold-"))))
    // PRE-SWAP RESTORE ORDER: delta and fold backups come back BEFORE
    // the primary. The data restore is the restore's own commit point —
    // a crash anywhere inside THIS recovery re-enters with preData
    // still false and keeps restoring, and once data is back no
    // pre-swap backup can remain on disk. That ordering is what makes
    // the post-swap signature above SOUND: restoring data first would
    // let a crash-between-restores leave "data present + delta/fold
    // backups present", which the next recovery would misread as a
    // completed swap — deleting a LIVE snapshot-meta chain and the
    // still-unrestored backups with it.
    if (!preData && !exists(deltaPath) && exists(backupDeltaPath))
      renameOrThrow(backupDeltaPath, deltaPath)
    // Delta-compaction crash (see [[compactDelta]]): a `.staging-delta-`
    // dir is written ONLY by compactDelta, so delta missing + delta
    // backup present + that marker present can only mean a crash between
    // its two renames — restore the pre-compaction delta. (An overwrite
    // crash never leaves this combination: it stages under `.staging-`
    // without the `-delta-` infix.)
    val stagingDeltaPresent = exists(root) && fs.listStatus(new Path(root))
      .exists(_.getPath.getName.startsWith(".staging-delta-"))
    if (!exists(deltaPath) && exists(backupDeltaPath) && stagingDeltaPresent)
      renameOrThrow(backupDeltaPath, deltaPath)
    // clear the stale chain of a post-swap overwrite crash BEFORE the
    // snap-meta roll-forward below would replay it (the replay is
    // exists-checked and thus inert against destroyed dirs, but the
    // chain would linger — every load() paying its meta reads — until a
    // much later maintenance tick drained it). This runs BEFORE any
    // backup is deleted, mirroring overwriteInner's cleanup order: the
    // backups ARE the post-swap signature, so a crash anywhere in the
    // cleanup below re-enters with the signature intact and reaches
    // this line again — deleting backups first could leave a
    // signature-less stale chain that lingers instead.
    if (postSwapOverwrite && exists(snapMetaPath)) deleteOrThrow(snapMetaPath)
    // fold-generation backups follow the same commit-point verdict: a
    // pre-swap crash restores them beside the primary; a completed
    // swap's leftovers are stale (their rows live in the new primary)
    if (exists(root)) fs.listStatus(new Path(root))
      .filter(_.getPath.getName.startsWith(".backup-fold-"))
      .foreach { s =>
        val orig = s"$root/${s.getPath.getName.stripPrefix(".backup-")}"
        if (!preData && !exists(orig))
          renameOrThrow(s.getPath.toString, orig)
        else deleteOrThrow(s.getPath.toString)
      }
    // the primary comes back LAST (see the ordering note above)
    if (!preData && exists(backupDataPath))
      renameOrThrow(backupDataPath, dataPath)
    Seq(backupDataPath, backupDeltaPath).foreach(deleteOrThrow)
    // a maintenance snapshot commit that died after publishing its
    // `_snapmeta/<v>` plan but before (or during) its renames rolls
    // FORWARD here: moves are exists-checked and idempotent, and the
    // meta only ever publishes with staging complete. Metas themselves
    // stay (their drops still fence readers) until a later maintenance
    // commit's prune phase. MUST run before [[recoverRetain]]'s
    // `.retain-staging-*` cleanup: the snapshot-plan retention path
    // stages its straddler replacements under `.retain-staging-*` and
    // publishes ONLY a `_snapmeta/<v>` plan (never the legacy
    // `.retain-commit` marker), so sweeping staging dirs first would
    // destroy the staged replacement files of a published-but-
    // unexecuted commit — the meta's drops would still fence the
    // straddler originals and every surviving row would be lost.
    readSnapMetas().foreach(executeSnapMoves)
    // a LEGACY-marker straddler-rewrite that died mid-commit rolls
    // forward (and only then is remaining `.retain-staging-*` content
    // provably pre-commit garbage, safe to drop) — see [[recoverRetain]]
    recoverRetain()
    if (exists(root)) {
      val staging = fs.listStatus(new Path(root))
        .filter(_.getPath.getName.startsWith(".staging-"))
      staging.foreach(s => fs.delete(s.getPath, true))
    }
    // A writer that died INSIDE a claimed transition leaves the version
    // chain headed by an unsealed marker; the state repairs above make
    // the store consistent again, so seal the orphan — handle open is
    // the takeover point (opening a handle while another process is
    // actively committing has always been out of contract for this
    // swap-based layout; within one process, [[committed]] seals its
    // own failures).
    val head = latestVersion()
    if (head > 0 && !isSealed(head)) sealVersion(head)
  }

  // ignoreMissingFiles: USER rewrites ([[overwrite]]) and
  // idempotent-token repair still atomically REPLACE visible files; a
  // reader that listed just before such a swap must degrade to "skip
  // the vanished file", not die with FILE_NOT_EXIST mid-scan.
  // MAINTENANCE (compaction/retention) no longer unlinks a live
  // reader's files at all — see the snapshot-plan protocol below.
  private def readFiles(files: Seq[String], basePath: Option[String]): Option[DataFrame] =
    if (files.isEmpty) None
    else {
      val r = spark.read.option("ignoreMissingFiles", "true")
      Some(basePath.fold(r)(b => r.option("basePath", b))
        .parquet(files: _*).select(Point.columns.map(col): _*))
    }

  /** Union the tier read groups (legacy data, fold generations, delta)
    * into one frame — shared by [[load]] and [[compact]]'s input so the
    * read path and the fold input can never drift.
    */
  private def unionGroups(groups: List[Option[DataFrame]]): DataFrame =
    groups.flatten match {
      case Nil => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Point.schema)
      case head :: tail => tail.foldLeft(head)(_.unionByName(_))
    }

  override def load(): DataFrame = {
    // Lock-free reads vs atomic-swap user rewrites: between the listing
    // and Spark's eager footer resolution, an overwrite can rename a
    // whole tier away for a few ms — retry instead of surfacing a
    // missing path for a state that is consistent again by the next
    // beat. (Maintenance can no longer cause this: its commits never
    // unlink files a reader resolved — snapshot-plan protocol below.)
    var attempt = 0
    while (true) {
      try {
        // SNAPSHOT READ — order matters: resolve the version head, THEN
        // list, THEN read the snapshot metas. Any maintenance-staged
        // file that surfaced in the listing has its meta published
        // (meta lands strictly before its renames), so "adds newer than
        // my head" are always identifiable; "drops at or below my head"
        // are still on disk (deletion defers one further maintenance
        // commit), so subtracting them yields the exact head-time state.
        val h = latestSealed()
        observedVersion = h
        val dataListed = listFilesRec(new Path(dataPath)).map(_.toString)
        // fold generations fence WHOLESALE by the version in their
        // name: a fold-<w> dir with w > h is a newer commit's output
        // (its meta landed before the dir rename, so the drops it
        // fences are readable) — skip it without listing a file
        val foldGroups = foldDirs().filter(_._1 <= h)
          .map { case (_, dir) => dir -> listFilesRec(new Path(dir)).map(_.toString) }
        val deltaListed = listFilesRec(new Path(deltaPath)).map(_.toString)
        val metas = readSnapMetas()
        val addsAbove = metas.filter(_.ver > h).flatMap(_.moves.map(_._2)).toSet
        val dropsBelow = metas.filter(_.ver <= h).flatMap(_.drops).toSet
        def snap(listed: Seq[String]) =
          listed.filterNot(addsAbove).filterNot(dropsBelow)
        return unionGroups(
          readFiles(snap(dataListed), Some(dataPath)) ::
            foldGroups.map { case (dir, listed) =>
              readFiles(snap(listed), Some(dir)) }.toList :::
            readFiles(snap(deltaListed), None) :: Nil)
      } catch {
        case e: Exception
            if attempt < 40 && (e.isInstanceOf[java.io.FileNotFoundException] ||
              (e.isInstanceOf[org.apache.spark.sql.AnalysisException] &&
                Option(e.getMessage).exists(_.contains("PATH_NOT_FOUND")))) =>
          attempt += 1
          Thread.sleep(25L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Write in the partitioned main-store layout. (Deliberately no
    * cluster-by-partition-keys shuffle before partitionBy: measured at
    * bench scale, the exchange costs more than the task×dir small-file
    * fan-out it prevents — ~1 s shuffle vs ~0.3 s of extra renames on a
    * 100k-row fold. At cluster scale an operator folding terabytes
    * should repartition the input by (measurement, date) upstream.)
    */
  private def writePartitioned(df: DataFrame, path: String, mode: SaveMode): Unit = {
    // p_date derives BEFORE the re-bind, so the application session's
    // timezone semantics govern the partition date exactly as before
    val w = rebound(df
      .withColumn("p_date", to_date(col(Point.TimeCol)))
      .sortWithinPartitions(Point.TimeCol))
      .write.mode(mode)
    (if (partitioned) w.partitionBy(Point.MeasurementCol, "p_date") else w).parquet(path)
  }

  override def append(batch: DataFrame): Unit = { appendDelta(batch); () }

  override def appendDelta(batch: DataFrame, compactPrefixes: Option[Boolean]): Option[DataFrame] =
    synchronized { committed(requireObserved = false) {
      // Size the delta files by DATA VOLUME (Catalyst stats estimate vs
      // files.maxPartitionBytes — no job): a 10k-row batch arriving in 8
      // partitions would otherwise pay 8 task launches + 8 file commits
      // for one ~small file's worth of rows — measured ~40% of small-
      // batch append latency. Big batches keep their parallelism (the
      // size term dominates); coalesce never increases partition count.
      // Caveat: coalesce collapses the batch's last narrow stage, so a
      // heavy UNSHUFFLED pipeline feeding a tiny append runs at reduced
      // parallelism — materialize such batches first (ingest batches
      // normally already are).
      val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
      // true materialized size for checkpointed (streaming) batches,
      // Catalyst estimate otherwise — see [[Storage.appendSizeEstimate]]
      val est = Storage.appendSizeEstimate(spark, batch)
      if (maintTimings)
        System.err.println(s"[graft-maint] append est=$est splitBytes=$splitBytes " +
          s"plan=${batch.queryExecution.optimizedPlan.getClass.getSimpleName}")
      // The byte estimate routes; the ROW-COUNT cap inside
      // appendDeltaLocal backstops it — a mis-estimated wide batch
      // (Catalyst stats are estimates, not measurements) declines the
      // coordinator path (None) and falls through to the distributed
      // write instead of drive-collecting.
      (if (est <= BigInt(splitBytes / 8L)) appendDeltaLocal(batch) else None)
        .orElse {
          // Per-task target = the WAL gate (splitBytes/8, 16 MB at
          // defaults), not a full split: parquet-encoding maps is
          // CPU-bound (~25 MB/s/task measured), so sizing tasks at
          // 128 MB single-threads up to ~5 s of encode for a
          // latency-path append. Files stay ≥ the WAL gate — the delta
          // merge (compactDelta) re-sizes them for readers — and the
          // parallelism cap keeps bulk loads at split-sized-or-bigger
          // files on any real cluster.
          val perTask = math.max(1L, splitBytes / 8L)
          val nOut = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
            ((est + perTask - 1) / perTask).toLong)).toInt
          val stamped = withSeq(batch.coalesce(nOut))
          rebound(stamped.sortWithinPartitions(Point.TimeCol))
            // Delta tier optimizes append latency: snappy encodes ~3× faster
            // than Spark 4's zstd default; compaction rewrites with the
            // read-optimized default codec.
            .write.option("compression", "snappy")
            .mode(SaveMode.Append).parquet(deltaPath)
          noteDeltaFiles(nOut)
          // same plan, same source partitioning → monotonically_increasing_id
          // reproduces the written _seq values on re-evaluation
          Some(stamped)
        }
    } }

  /** WAL-style coordinator append for sub-split batches (≤ 1/8 of
    * `files.maxPartitionBytes`, 16 MB at defaults): the whole Spark
    * write machinery — job scheduling, FileFormatWriter planning,
    * Hadoop committer setup/rename — costs ~170 ms for a one-task
    * write, 10× the actual encode work of a small delta file. Small
    * appends instead collect to the coordinator (bounded by the same
    * estimate that decides the path) and encode ONE parquet file
    * directly through Spark's own `ParquetWriteSupport`, so the bytes
    * on disk are identical to a distributed write: same schema
    * metadata, same timestamp type, same row-group stats over the same
    * time-sorted layout. This is the standard LSM/commit-log shape —
    * high-frequency small appends land through the coordinator like a
    * WAL; bulk loads keep the distributed path above.
    *
    * `_seq` is `(gen << 45) + arrivalIndex` — the same total order the
    * distributed path's partition-prefixed mono-id encodes, inside the
    * same generation envelope. The returned delta is a materialized
    * LocalRelation, which the index extension re-evaluates for free.
    */
  private def appendDeltaLocal(batch: DataFrame): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
    // InternalRows end to end: one collect job, full batch parallelism
    // → seq-stamp → ParquetWriter; no external-Row conversion anywhere
    // (measured ~2× of the whole append when the map columns
    // round-trip through Scala objects). The collect is executeTake
    // (cap + 1), NOT executeCollect: the byte estimate that routed us
    // here is a Catalyst guess, and a mis-estimated wide batch must
    // not materialize unboundedly on the coordinator — past the row
    // cap we return None and the caller takes the distributed path.
    val maxRows = spark.conf.getOption("graft.storage.localAppendMaxRows")
      .map(_.toInt).getOrElse(Storage.LocalAppendMaxRows)
    val rows = timedPhase("wal-collect")(
      batch.queryExecution.executedPlan.executeTake(maxRows + 1))
    if (rows.length > maxRows) return None
    val gen = nextGen()
    val fullSchema = org.apache.spark.sql.types.StructType(
      batch.schema.fields :+ Point.schema(Point.SeqCol))
    if (rows.isEmpty)
      return Some(spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), fullSchema))
    // `_seq` by arrival index, then time-sorted nulls-first for the
    // physical layout (what sortWithinPartitions produces on the
    // distributed path) so row-group min/max stats stay tight; sortBy
    // is stable, so equal times keep arrival order
    val tIdx = batch.schema.fieldIndex(Point.TimeCol)
    val stamped = rows.zipWithIndex.map { case (r, i) =>
      (r, (gen << Storage.GenShift) + i)
    }
    val sorted = timedPhase("wal-sort")(stamped.sortBy { case (r, _) =>
      if (r.isNullAt(tIdx)) Long.MinValue else r.getLong(tIdx)
    })
    // Temp-name + rename commit: a crash or exception mid-write must
    // never leave a torn parquet file (no footer) visible to readers
    // scanning deltaPath — Spark's file listing skips dot-prefixed
    // names, and the atomic rename publishes only complete files (the
    // same contract the Hadoop committer gives the distributed path).
    val name = s"part-${java.util.UUID.randomUUID()}-local.snappy.parquet"
    val tmp = new Path(s"$deltaPath/.$name.inprogress")
    val file = new Path(s"$deltaPath/$name")
    try {
      timedPhase(s"wal-write(${rows.length})")(
        Storage.writeParquetLocal(spark, fullSchema, tmp.toString,
          sorted.iterator.map { case (r, seq) =>
            new JoinedRow(r, new GenericInternalRow(Array[Any](seq)))
          }))
      if (!fs.rename(tmp, file))
        throw new java.io.IOException(s"rename failed: $tmp -> $file")
    } catch {
      case e: Throwable =>
        if (fs.exists(tmp)) { fs.delete(tmp, false); () }
        throw e
    }
    noteDeltaFiles(1)
    // the delta plan for index extension: the file just written —
    // trivially reproducible, lazily read only if an index is live
    Some(spark.read.schema(fullSchema).parquet(file.toString))
  }

  private val commitsPath = s"$root/_ingest_commits"

  /** Durable exactly-once append: delta files named by `token`, with a
    * commit record in `_ingest_commits/` (OUTSIDE the delta dir, so
    * compaction folding token files into merged segments cannot erase
    * the commit memory). Replay protocol:
    *   1. commit record exists → no-op (the batch landed, drop the replay);
    *   2. else delete any `tok-<token>-` delta leftovers (a previous
    *      attempt died between data and record), rewrite the data via
    *      staging + rename, THEN write the record.
    * A crash at any point leaves either "no record + (partial) data" —
    * repaired by the next replay — or "record + complete data". Readers
    * racing a repair can transiently see the uncommitted batch (same
    * visibility window any delta append has); the CONVERGED state holds
    * each token's rows exactly once.
    */
  override def hasIngestCommit(token: String): Boolean = synchronized {
    val safe = token.replaceAll("[^A-Za-z0-9_\\-.]", "_")
    fs.exists(new Path(s"$commitsPath/$safe"))
  }

  override def appendIdempotent(batch: DataFrame, token: String): Boolean = synchronized {
    val safe = token.replaceAll("[^A-Za-z0-9_\\-.]", "_")
    val record = new Path(s"$commitsPath/$safe")
    if (fs.exists(record)) return false
    committed(requireObserved = false) {
    // re-check inside the claim: another handle may have landed the
    // same token while we waited for the chain head
    if (fs.exists(record)) false
    else {
    if (exists(deltaPath)) {
      fs.listStatus(new Path(deltaPath))
        .filter(_.getPath.getName.startsWith(s"tok-$safe-"))
        .foreach(s => fs.delete(s.getPath, false))
    }
    val staging = s"$root/.staging-tok-${UUID.randomUUID()}"
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    // same routing honesty as appendDelta: a checkpointed streaming
    // batch's Catalyst estimate is the garbage default, which sized
    // nOut at full parallelism — 32 near-empty token files per
    // micro-batch (see [[Storage.appendSizeEstimate]])
    val est = Storage.appendSizeEstimate(spark, batch)
    // same per-task encode target as appendDelta's distributed path
    val perTask = math.max(1L, splitBytes / 8L)
    val nOut = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
      ((est + perTask - 1) / perTask).toLong)).toInt
    rebound(withSeq(batch.coalesce(nOut)).sortWithinPartitions(Point.TimeCol))
      .write.option("compression", "snappy")
      .mode(SaveMode.Overwrite).parquet(staging)
    val files = fs.listStatus(new Path(staging)).filter(f =>
      f.isFile && !f.getPath.getName.startsWith(".") && !f.getPath.getName.startsWith("_"))
    if (!exists(deltaPath)) { fs.mkdirs(new Path(deltaPath)); () }
    files.zipWithIndex.foreach { case (f, i) =>
      renameOrThrow(f.getPath.toString, s"$deltaPath/tok-$safe-$i.snappy.parquet")
    }
    deleteOrThrow(staging)
    if (!fs.exists(new Path(commitsPath))) { fs.mkdirs(new Path(commitsPath)); () }
    fs.create(record, true).close()
    noteDeltaFiles(files.length)
    true
    } }
  }

  /** Commit-record retention: keep the `keepLast` most RECENT records,
    * ordered by file modification time (commit order regardless of
    * token naming — a variable-width "b100" token must not be judged
    * older than "b99" by a lexicographic sort), token name as the
    * equal-millisecond tiebreak (stream tokens zero-pad their batch id
    * so name order IS commit order within a stream). A checkpointed
    * stream can only ever replay its LAST uncommitted batch, so any
    * bound ≥ 1 is safe; the default gives slack for multiple
    * interleaved streams.
    *
    * INVARIANT guarded here: a commit record must OUTLIVE its token's
    * data files in the delta tier. Compaction's orphan purge treats
    * "tok file with no record" as a crashed attempt's leftover and
    * deletes it — so pruning a record whose `tok-<token>-*` files have
    * not yet been folded away would turn the next compaction into
    * silent loss of a committed batch. Such records are skipped (they
    * become prunable after any compaction folds the delta tier).
    */
  def pruneIngestCommits(keepLast: Int = 64): Unit = synchronized {
    if (!fs.exists(new Path(commitsPath))) return
    val liveTokens: Set[String] =
      if (!exists(deltaPath)) Set.empty
      else fs.listStatus(new Path(deltaPath))
        .filter(s => s.isFile && s.getPath.getName.startsWith("tok-"))
        .map(_.getPath.getName.stripPrefix("tok-")
          .replaceAll("-\\d+\\.snappy\\.parquet$", ""))
        .toSet
    val all = fs.listStatus(new Path(commitsPath))
      .sortBy(s => (s.getModificationTime, s.getPath.getName))
    all.dropRight(keepLast)
      .filterNot(s => liveTokens.contains(s.getPath.getName))
      .foreach(s => fs.delete(s.getPath, false))
  }

  /** Delete delta `tok-<token>-*` files whose commit record is ABSENT:
    * an idempotent-append attempt that crashed between renaming its data
    * into the delta tier and writing the commit record. The replay
    * normally repairs these by name — but a compaction that ran first
    * would fold the orphan rows into anonymous merged files the replay
    * can no longer find, and the re-append would land the rows twice
    * permanently. So every compaction purges orphans BEFORE reading the
    * delta tier. Safe against in-flight appends: [[appendIdempotent]]
    * renames data AND writes its record inside one claimed transition,
    * and this runs inside a claimed transition too — a record-less tok
    * file seen here can only be a crashed attempt's leftover.
    */
  private def purgeUncommittedTokenFiles(): Unit = {
    if (!exists(deltaPath)) return
    fs.listStatus(new Path(deltaPath))
      .filter(s => s.isFile && s.getPath.getName.startsWith("tok-"))
      .foreach { s =>
        val token = s.getPath.getName.stripPrefix("tok-")
          .replaceAll("-\\d+\\.snappy\\.parquet$", "")
        if (!fs.exists(new Path(s"$commitsPath/$token")))
          fs.delete(s.getPath, false)
      }
  }

  /** Fold the delta tier into the partitioned main store. Run after
    * bulk ingest (or on a schedule) so reads regain full partition
    * pruning; appends stay cheap regardless.
    *
    * Snapshot-plan commit (see the protocol notes below): the folded
    * state stages invisibly, lands via published renames, and the old
    * tiers' files become deferred drops — a reader mid-scan keeps its
    * resolved files; the next maintenance commit deletes them.
    */
  def compact(): Unit = synchronized {
    // content-preserving: serialize via the chain (no append can land
    // inside the fold) but skip the staleness check — the input is
    // read INSIDE the claim, so it cannot be stale
    committedVersioned(requireObserved = false) { v =>
      timedPhase("purge-tokens")(purgeUncommittedTokenFiles())
      val metas = timedPhase("read-metas")(readSnapMetas())
      val pendingDrops = metas.flatMap(_.drops).toSet
      val liveDelta = timedPhase("list-live")(
        liveFilesUnderClaim(deltaPath, pendingDrops))
      if (liveDelta.isEmpty) publishTickIfAgingNeeded(v, metas)
      else {
        // the fold input spans the legacy data tier AND every committed
        // fold generation (inside a claim, all fold dirs are committed)
        val liveData = liveFilesUnderClaim(dataPath, pendingDrops)
        val foldInputs = foldDirs()
          .map { case (_, dir) => dir -> liveFilesUnderClaim(dir, pendingDrops) }
        val full = timedPhase("plan") {
          unionGroups(
            readFiles(liveData, Some(dataPath)) ::
              foldInputs.map { case (dir, fls) => readFiles(fls, Some(dir)) }.toList :::
              readFiles(liveDelta, None) :: Nil)
        }
        val staging = s"$root/.staging-fold-${UUID.randomUUID()}"
        timedPhase("write")(
          writePartitioned(full.select(Point.columns.map(col): _*), staging, SaveMode.Overwrite))
        // O(1)-rename commit: the whole staged output flips live as ONE
        // directory rename to the version-named fold dir (fenced by
        // name for readers at older heads); the fold's inputs become
        // this commit's deferred drops
        timedPhase("publish") {
          publishAndExecuteSnapshot(v, Seq.empty,
            liveData ++ foldInputs.flatMap(_._2) ++ liveDelta,
            dirMoves = Seq(staging -> foldPath(v)))
        }
      }
      // prune phase at the END, after this commit's own meta is the
      // newest: deletes the drops of every OLDER meta — so a reader's
      // resolved snapshot survives until the end of the SECOND
      // maintenance commit after it resolved (the index tier's
      // keep-predecessor grace), and pending-drop garbage is bounded
      // by one commit's replaced set
      timedPhase("prune")(pruneSnapDrops())
    }
    deltaFileEstimate = 0
  }

  // Delta-tier file count, maintained incrementally (-1 = not yet
  // listed; seeded lazily with ONE listing, then bumped per append) so
  // the per-append compaction check costs no filesystem listing.
  private var deltaFileEstimate: Int = -1

  /** Test hook: the delta tier's LIVE file count (pending snapshot
    * drops excluded) — what the auto-compaction policy actually bounds.
    */
  private[graft] def liveDeltaFileCount(): Int = listedDeltaFileCount()

  private def listedDeltaFileCount(): Int =
    // LIVE files only: pending snapshot drops (replaced delta files
    // awaiting physical deletion) must not re-trigger the compaction
    // they were just produced by
    if (!exists(deltaPath)) 0
    else liveFilesUnderClaim(deltaPath).size

  private def noteDeltaFiles(n: Int): Unit = {
    if (deltaFileEstimate < 0) deltaFileEstimate = listedDeltaFileCount()
    else deltaFileEstimate += n
  }

  /** Compact WHEN the delta tier has accreted enough files — the
    * auto-compaction policy behind sustained micro-batch ingest (one
    * delta file per batch forever without it). This is a DELTA-ONLY
    * rewrite ([[compactDelta]]): cost O(delta bytes) per trigger, so
    * amortized per-append cost stays O(appended bytes) — a full
    * [[compact]] here would rewrite the whole main store every
    * `autoCompactFiles` appends, which is a scale-killer at 100 TB.
    */
  private[engine] def maybeCompactDelta(): Unit = synchronized {
    if (deltaFileEstimate < 0) deltaFileEstimate = listedDeltaFileCount()
    if (maintTimings)
      System.err.println(s"[graft-maint] auto-compact check est=$deltaFileEstimate thr=$autoCompactFiles")
    if (deltaFileEstimate >= autoCompactFiles) {
      // Choose the compaction tier at trigger time (one size listing
      // each — paid per compaction, never per append): once the delta
      // tier rivals the main store, FOLD it in (full compact) — reads
      // regain partition pruning, and the fold-at-doubling schedule
      // bounds total rewrite cost at O(N log N) over any ingest
      // history. Below that, merge delta files in place (O(delta)).
      val pendingDrops = readSnapMetas().flatMap(_.drops).toSet
      val dataBytes = liveBytes(dataPath, pendingDrops) +
        foldDirs().map { case (_, d) => liveBytes(d, pendingDrops) }.sum
      if (liveBytes(deltaPath, pendingDrops) >= dataBytes) compact()
      else compactDelta()
      deltaFileEstimate = listedDeltaFileCount()
    }
  }

  // Maintenance-tick phase timings (operator observability): set
  // `graft.storage.maintenanceTimings=true` on the session to log each
  // phase of a compaction/retention tick to stderr — the dial behind
  // the FoldProbe breakdowns in BENCH_NOTES. Zero cost when unset.
  private def maintTimings: Boolean =
    spark.conf.getOption("graft.storage.maintenanceTimings").exists(_.toBoolean)
  private def timedPhase[T](phase: String)(body: => T): T =
    if (!maintTimings) body
    else {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[graft-maint] $phase%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

  /** Merge the delta tier's many small files into few split-sized ones
    * (data tier untouched): read the live delta files, write merged
    * replacements to a staging dir, then commit via the snapshot plan —
    * merged files rename in beside the originals, the originals become
    * deferred drops. A reader that resolved the old files keeps
    * scanning them intact; the next maintenance commit deletes them.
    * `_seq` rides through unchanged, so insertion order and the
    * generation counter are unaffected.
    */
  private[engine] def compactDelta(): Unit = synchronized {
    committedVersioned(requireObserved = false) { v =>
      timedPhase("purge-tokens")(purgeUncommittedTokenFiles())
      val metas = timedPhase("read-metas")(readSnapMetas())
      val live = timedPhase("list-live")(
        liveFilesUnderClaim(deltaPath, metas.flatMap(_.drops).toSet))
      if (live.isEmpty) publishTickIfAgingNeeded(v, metas)
      else {
          val staging = s"$root/.staging-delta-${UUID.randomUUID()}"
          val (delta, nOut) = timedPhase("plan") {
            val d = spark.read.parquet(live: _*).select(Point.columns.map(col): _*)
            // merged file count by data volume, same sizing rule as appends
            val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
            val est = d.queryExecution.optimizedPlan.stats.sizeInBytes
            (d, math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
              ((est + splitBytes - 1) / splitBytes).toLong)).toInt)
          }
          timedPhase("write") {
            rebound(delta.coalesce(nOut).sortWithinPartitions(Point.TimeCol))
              .write.option("compression", "snappy")
              .mode(SaveMode.Overwrite).parquet(staging)
          }
          timedPhase("publish") {
            val moves = listFilesRec(new Path(staging)).zipWithIndex.map { case (f, i) =>
              f.toString -> s"$deltaPath/merge-$v-$i${f.getName.dropWhile(_ != '.')}"
            }
            publishAndExecuteSnapshot(v, moves, live)
            deleteOrThrow(staging)
          }
      }
      timedPhase("prune")(pruneSnapDrops()) // end-of-commit prune: see [[compact]]
    }
  }

  // ---- time-based retention --------------------------------------------
  //
  // "Expire data older than t" is the retention-policy shape every TSDB
  // user hits; an O(store) remove(TimeQuery < t) rewrite would be a
  // scale-killer at 100 TB. The layout already pays for the fast path:
  // p_date partition directories bound each file's dates, and files are
  // time-sorted with footer min/max stats — so whole partitions and
  // whole files DROP by listing + footer metadata alone, and only files
  // actually straddling the cutoff pay a filtered rewrite.

  private def retainMarker = new Path(s"$root/.retain-commit")

  /** (rows, Some((min µs, max µs, nulls))) for a parquet file, from the
    * FOOTER alone (no data IO). Row count is always present; the time
    * summary is None when the footer carries no usable statistics for
    * the time column (INT96 legacy encoding, withheld stats).
    */
  private def footerTimeSummary(p: Path): (Long, Option[(Long, Long, Long)]) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(p, spark.sparkContext.hadoopConfiguration))
    try {
      var rows = 0L; var nulls = 0L
      var min = Long.MaxValue; var max = Long.MinValue
      var usable = true
      reader.getFooter.getBlocks.asScala.foreach { b =>
        rows += b.getRowCount
        b.getColumns.asScala.find(_.getPath.toDotString == Point.TimeCol) match {
          case Some(c) =>
            val toMicros: Long => Long = c.getPrimitiveType.getLogicalTypeAnnotation match {
              case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                t.getUnit match {
                  case LogicalTypeAnnotation.TimeUnit.MICROS => identity
                  case LogicalTypeAnnotation.TimeUnit.MILLIS => _ * 1000L
                  case _ => null // NANOS: not produced by any Spark write path here
                }
              case _ => null // INT96 or unannotated: stats unusable
            }
            val st = c.getStatistics
            if (toMicros == null || st == null || st.getNumNulls < 0) usable = false
            else {
              val nn = st.getNumNulls
              if (st.hasNonNullValue) (st.genericGetMin, st.genericGetMax) match {
                case (mn: java.lang.Long, mx: java.lang.Long) =>
                  nulls += nn
                  min = math.min(min, toMicros(mn)); max = math.max(max, toMicros(mx))
                case _ => usable = false
              }
              // no recorded values: genuine only if the whole chunk is null
              else if (nn == c.getValueCount) nulls += nn
              else usable = false
            }
          case None => usable = false
        }
      }
      (rows, if (usable) Some((min, max, nulls)) else None)
    } finally reader.close()
  }

  private def dataFilesIn(dir: Path): Seq[Path] =
    fs.listStatus(dir).toSeq.filter(s => s.isFile &&
      !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
      .map(_.getPath)

  /** TIME-BASED RETENTION: remove every point whose time is strictly
    * before `cutoffMicros` (epoch µs). NULL times are KEPT — a missing
    * time cannot be proven old, the same missing→False contract as the
    * query DSL. Returns the number of points removed.
    *
    * Cost is O(dropped + straddling), never O(store):
    *   - `p_date` partition directories whose whole day could precede
    *     the cutoff (session-timezone day arithmetic, widened by a 48 h
    *     margin so timezone drift between writer and retainer can only
    *     RETAIN extra, never over-delete) are candidate-pruned by NAME;
    *     everything newer costs zero IO;
    *   - candidate files drop/keep WHOLE by parquet footer time stats
    *     alone (max < cutoff and no nulls → drop; min ≥ cutoff → keep);
    *   - only files actually straddling the cutoff (or stat-less INT96
    *     legacy files) pay a filtered COW rewrite, staged then
    *     committed via the snapshot plan (the `_snapmeta/<v>`
    *     roll-forward marker is published atomically AFTER staging
    *     completes, so a crash at any point re-converges in
    *     [[recover]]; renames are idempotent).
    *
    * SNAPSHOT-CONSISTENT vs readers: dropped whole files and replaced
    * straddlers are NOT unlinked — they become the commit's deferred
    * drops, invisible to any read that resolves a head ≥ this commit
    * but intact on disk for a reader mid-scan; the next maintenance
    * commit's prune phase deletes them (and the partition directories
    * they empty out). Serialized via the version chain like every
    * other mutation.
    */
  def retainBefore(cutoffMicros: Long): Long = synchronized {
    committedVersioned(requireObserved = false) { v =>
      val snapMetas = readSnapMetas()
      val pendingDrops = snapMetas.flatMap(_.drops).toSet
      val drops = scala.collection.mutable.ArrayBuffer.empty[String]
      var removed = 0L
      // straddler files per source dir, with the row count the
      // classification footer read already produced (so the rewrite
      // never re-opens a footer it has seen)
      val straddlers = scala.collection.mutable.LinkedHashMap.empty[String, Vector[(Path, Long)]]

      // classify the LIVE files of one directory (pending drops from
      // earlier commits are someone else's rows — not re-counted, not
      // re-classified); whole-drops defer via the snapshot plan
      def sweepDir(dir: Path): Unit = {
        dataFilesIn(dir)
          .filterNot(f => pendingDrops.contains(f.toString))
          .foreach { f =>
            footerTimeSummary(f) match {
              case (rows, Some((_, max, nulls))) if nulls == 0L && rows > 0L && max < cutoffMicros =>
                removed += rows
                drops += f.toString
              case (rows, Some((min, _, nulls))) if rows == 0L || nulls == rows || min >= cutoffMicros =>
                () // wholly kept (nulls ride along)
              case (rows, _) =>
                straddlers(dir.toString) =
                  straddlers.getOrElse(dir.toString, Vector.empty) :+ ((f, rows))
            }
          }
      }

      // the data tier spans the legacy dir plus every committed fold
      // generation — each is its own identically-shaped partition root
      val dataRoots = (dataPath +: foldDirs().map(_._2)).filter(exists)
      dataRoots.foreach { rootDir =>
        if (partitioned) {
          val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
          val cutoff = java.time.Instant.EPOCH.plus(cutoffMicros, java.time.temporal.ChronoUnit.MICROS)
          val horizon = cutoff.plus(48, java.time.temporal.ChronoUnit.HOURS)
          fs.listStatus(new Path(rootDir)).filter(_.isDirectory).foreach { m =>
            fs.listStatus(m.getPath).filter(_.isDirectory).foreach { pd =>
              val v = pd.getPath.getName.stripPrefix("p_date=")
              val candidate = scala.util.Try(java.time.LocalDate.parse(v)).toOption
                // null-date partition (__HIVE_DEFAULT_PARTITION__): null
                // times are kept, skip without reading anything
                .exists(_.atStartOfDay(zone).toInstant.isBefore(horizon))
              if (candidate) sweepDir(pd.getPath)
            }
          }
        } else sweepDir(new Path(rootDir))
      }
      if (exists(deltaPath)) {
        // purge record-less tok-* leftovers BEFORE the sweep can drop
        // or rename them: a straddler rewrite would fold a crashed
        // append's rows into an anonymous retain-* file the token replay
        // can no longer find, and the re-append would duplicate them
        // permanently — same contract as compact()/compactDelta()
        purgeUncommittedTokenFiles()
        sweepDir(new Path(deltaPath))
      }

      // straddler rewrite: stage the filtered replacements as ONE
      // partitioned directory and commit it as this version's fold
      // generation — a single `R staging → fold-<v>` rename beside the
      // drops (whole-dropped files + straddler originals) in one
      // snapshot plan, the same O(1)-rename commit shape [[compact]]
      // uses (on an object store: one metadata op, not one copy per
      // staged file). Emptied partition/measurement/tier dirs are
      // pruned when a later commit physically deletes their files
      // (pruneSnapDrops walks up from each emptied dir).
      val (strRemoved, stagingOpt) =
        timedPhase("stage-straddle")(stageStraddlers(straddlers.toMap, cutoffMicros))
      removed += strRemoved
      drops ++= straddlers.valuesIterator.flatten.map(_._1.toString)
      timedPhase("publish") {
        if (stagingOpt.isEmpty && drops.isEmpty) publishTickIfAgingNeeded(v, snapMetas)
        else publishAndExecuteSnapshot(v, Seq.empty, drops.toSeq,
          dirMoves = stagingOpt.map(st => st -> foldPath(v)).toSeq)
      }
      timedPhase("prune")(pruneSnapDrops()) // end-of-commit prune: see [[compact]]
      deltaFileEstimate = -1 // dropped delta files: re-list lazily
      removed
    }
  }

  /** Delete `dir` when it holds no data files at any depth (dot/_
    * marker files don't count); empties subtrees bottom-up. Returns
    * true when the dir is gone.
    */
  private def pruneIfNoData(dir: Path): Boolean = {
    if (!fs.exists(dir)) return true
    val keep = fs.listStatus(dir).map { e =>
      if (e.isDirectory) !pruneIfNoData(e.getPath)
      else {
        val n = e.getPath.getName
        !n.startsWith(".") && !n.startsWith("_")
      }
    }.exists(identity)
    if (!keep) { deleteOrThrow(dir.toString); true } else false
  }

  /** Filtered COW rewrite of the straddling files as ONE staged
    * partitioned directory — the caller commits it with a single
    * `R staging → fold-<v>` rename in its snapshot plan (the
    * [[compact]] fold shape; the r14 per-file `M` move list paid one
    * rename — one COPY on an object store — per staged file every
    * retention tick). Straddlers read through their TIER ROOT so the
    * Hive partition columns (measurement, p_date) survive into the
    * rewrite; delta straddlers carry all columns inline and simply fold
    * into the new generation with them. One Spark write job for the
    * whole tick instead of one per touched directory. STAGES ONLY —
    * returns (rows removed, staging root or None when nothing
    * straddled or every straddler row expired).
    */
  private def stageStraddlers(byDir: Map[String, Seq[(Path, Long)]],
      cutoffMicros: Long): (Long, Option[String]) = {
    if (byDir.isEmpty) return (0L, None)
    val before = byDir.valuesIterator.flatten.map(_._2).sum
    // QUALIFY both sides of the tier match: byDir keys arrive in two
    // forms — partition dirs come scheme-qualified from fs.listStatus
    // (`file:/...`), tier roots and the delta dir are constructed
    // unqualified strings — and a raw prefix compare would silently
    // assign a qualified data-tier straddler to NO read group (its
    // surviving rows would vanish from the staged fold while the
    // original still entered the drops: data loss, caught by the
    // partitioned-straddler-after-overwrite spec)
    val tierRoots = (dataPath +: foldDirs().map(_._2)).map(qual)
    def inTier(dir: String, tier: String) = {
      val q = qual(dir)
      q == tier || q.startsWith(tier + "/")
    }
    val qualifiedDelta = qual(deltaPath)
    val grouped = byDir.keysIterator.filter(d =>
      inTier(d, qualifiedDelta) || tierRoots.exists(inTier(d, _))).toSet
    require(grouped == byDir.keySet,
      s"retention straddler dirs outside every tier: ${byDir.keySet -- grouped}")
    val groups: List[Option[DataFrame]] =
      tierRoots.toList.map { tier =>
        val fls = byDir.collect { case (d, fs) if inTier(d, tier) => fs }
          .flatten.map(_._1.toString).toSeq
        readFiles(fls, Some(tier))
      } :+ readFiles(
        byDir.collect { case (d, fs) if inTier(d, qualifiedDelta) => fs }
          .flatten.map(_._1.toString).toSeq, None)
    val kept = unionGroups(groups)
      .filter(col(Point.TimeCol).isNull || unix_micros(col(Point.TimeCol)) >= cutoffMicros)
    val stagingRoot = s"$root/.retain-staging-${UUID.randomUUID().toString.take(8)}"
    writePartitioned(kept.select(Point.columns.map(col): _*), stagingRoot, SaveMode.Overwrite)
    val staged = listFilesRec(new Path(stagingRoot))
    if (staged.isEmpty) { // every straddler row expired: drops suffice
      deleteOrThrow(stagingRoot)
      (before, None)
    } else (before - staged.map(f => footerTimeSummary(f)._1).sum, Some(stagingRoot))
  }

  private def executeRetainPlan(dels: Seq[String], moves: Seq[(String, String)]): Unit = {
    dels.foreach { d =>
      val p = new Path(d)
      if (fs.exists(p) && !fs.delete(p, false))
        throw new java.io.IOException(s"retention: delete failed: $d")
    }
    moves.foreach { case (s, t) =>
      if (fs.exists(new Path(s))) renameOrThrow(s, t)
    }
  }

  /** Roll a crashed straddler rewrite forward: the marker only ever
    * exists with staging COMPLETE, so re-running its plan converges.
    * Without a marker, `.retain-staging-*` dirs are pre-commit garbage.
    */
  private def recoverRetain(): Unit = {
    graft.util.AtomicFiles.readString(fs, retainMarker).foreach { body =>
      def dec(p: String) = java.net.URLDecoder.decode(p, "UTF-8")
      val lines = body.split("\n").filter(_.nonEmpty)
      val dels = lines.filter(_.startsWith("D ")).map(l => dec(l.drop(2))).toSeq
      val moves = lines.filter(_.startsWith("M ")).map { l =>
        val rest = l.drop(2); val cut = rest.indexOf(' ')
        dec(rest.take(cut)) -> dec(rest.drop(cut + 1))
      }.toSeq
      executeRetainPlan(dels, moves)
      fs.delete(retainMarker, false)
      ()
    }
    if (exists(root)) fs.listStatus(new Path(root))
      .filter(_.getPath.getName.startsWith(".retain-staging-"))
      .foreach(s => fs.delete(s.getPath, true))
  }

  // ---- snapshot-consistent maintenance (the index tier's generation
  //      pattern, applied at FILE granularity) --------------------------
  //
  // Maintenance used to REPLACE visible files in place (dir swap,
  // delete + rename), so a lock-free reader that had resolved its file
  // set could transiently miss surviving rows mid-scan — the
  // documented read-vs-maintenance window. The index tier closed the
  // same window with immutable generation DIRS; the data tiers can't
  // version wholesale (retention would pay O(store) re-linking kept
  // files into each new generation), so the generation discipline
  // lands at file granularity instead: a maintenance mutation NEVER
  // unlinks a file a reader may hold. It stages its outputs invisibly
  // (dot-prefixed), publishes an atomic plan under `_snapmeta/<v>` —
  // `M src dst` lines (staged files to rename into the live dirs) and
  // `D path` lines (files this commit supersedes: left ON DISK,
  // excluded from reads at head ≥ v, physically deleted by a LATER
  // maintenance commit's prune phase, which always spares the newest
  // meta's drops) — then executes the renames and seals version v.
  //
  // A reader resolves the version head ONCE, lists the tier dirs, and
  // subtracts: adds of commits NEWER than its head (the meta is
  // published BEFORE its renames execute, so any staged file that has
  // already surfaced in a listing is provably declared in a readable
  // meta) and drops of commits AT OR BELOW its head. That is a
  // consistent snapshot at the resolved head: a maintenance commit
  // landing mid-read neither removes the snapshot's files (deletion is
  // deferred past one further maintenance commit) nor leaks its new
  // files in (version-fenced) — the same "materialize before two
  // further maintenance commits" retention contract as the index
  // generations. Crash anywhere: the meta IS the roll-forward marker
  // (renames are exists-checked and idempotent), re-executed at handle
  // open. USER rewrites ([[overwrite]]: update/remove/insert-rewrite)
  // keep the backup-rename dir swap — they replace the logical store
  // content wholesale and stay on the reference's single-writer
  // contract; it is the background MAINTENANCE ops (compaction ticks,
  // retention ticks) that must never race a serving read.

  // def, not val: recover() runs in the constructor BEFORE this class
  // body's vals would initialize
  private def snapMetaPath = s"$root/_snapmeta"

  /** `moves` = per-file renames (`M src dst` lines); `dirMoves` =
    * whole-DIRECTORY renames (`R src dst` — a fold commit's single
    * staging→fold-<v> flip); `drops` = files this commit supersedes.
    */
  private case class SnapMeta(ver: Long, moves: Seq[(String, String)],
      drops: Seq[String], dirMoves: Seq[(String, String)] = Seq.empty)

  private def qual(p: String): String = fs.makeQualified(new Path(p)).toString

  private def readSnapMetas(): Seq[SnapMeta] =
    if (!exists(snapMetaPath)) Seq.empty
    else fs.listStatus(new Path(snapMetaPath)).toSeq
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .sorted
      .flatMap { v =>
        graft.util.AtomicFiles.readString(fs, new Path(s"$snapMetaPath/$v")).map { body =>
          def dec(p: String) = java.net.URLDecoder.decode(p, "UTF-8")
          val lines = body.split("\n").filter(_.nonEmpty)
          def pair(l: String) = {
            val rest = l.drop(2); val cut = rest.indexOf(' ')
            dec(rest.take(cut)) -> dec(rest.drop(cut + 1))
          }
          val moves = lines.filter(_.startsWith("M ")).map(pair).toSeq
          val dirMoves = lines.filter(_.startsWith("R ")).map(pair).toSeq
          val drops = lines.filter(_.startsWith("D ")).map(l => dec(l.drop(2))).toSeq
          SnapMeta(v, moves, drops, dirMoves)
        }
      }

  /** Publish commit `v`'s plan atomically, then execute its renames.
    * Paths are qualified (listing-comparable) and URL-encoded (spaces
    * survive the line format — same rationale as the retention plan).
    */
  private def publishAndExecuteSnapshot(v: Long,
      moves: Seq[(String, String)], drops: Seq[String],
      dirMoves: Seq[(String, String)] = Seq.empty): Unit = {
    if (moves.isEmpty && drops.isEmpty && dirMoves.isEmpty) {
      publishTickIfAgingNeeded(v, readSnapMetas()); return
    }
    def enc(p: String) = java.net.URLEncoder.encode(qual(p), "UTF-8")
    if (!exists(snapMetaPath)) { fs.mkdirs(new Path(snapMetaPath)); () }
    val body = (dirMoves.map { case (s, t) => s"R ${enc(s)} ${enc(t)}" } ++
      moves.map { case (s, t) => s"M ${enc(s)} ${enc(t)}" } ++
      drops.map(d => s"D ${enc(d)}")).mkString("\n")
    graft.util.AtomicFiles.writeString(fs, new Path(s"$snapMetaPath/$v"), body)
    executeSnapMoves(SnapMeta(v, moves.map { case (s, t) => (qual(s), qual(t)) },
      drops.map(qual), dirMoves.map { case (s, t) => (qual(s), qual(t)) }))
  }

  /** A maintenance commit that dropped nothing still advances the meta
    * chain with an EMPTY meta when deferred drops are pending — so a
    * quiescent store ages the last commit's drops out (the prune phase
    * always spares the newest meta). Gated on pending DROPS, not mere
    * meta presence, and paired with the prune phase's drain of
    * fence-nothing metas — otherwise the chain would perpetuate itself
    * through its own ticks forever.
    */
  private def publishTickIfAgingNeeded(v: Long, metas: Seq[SnapMeta]): Unit =
    if (metas.exists(_.drops.nonEmpty)) {
      if (!exists(snapMetaPath)) { fs.mkdirs(new Path(snapMetaPath)); () }
      graft.util.AtomicFiles.writeString(fs, new Path(s"$snapMetaPath/$v"), "")
    }

  private def executeSnapMoves(m: SnapMeta): Unit = {
    // dir flips first (a fold commit's single rename; idempotent — a
    // missing src with the dst in place is an already-executed move)
    m.dirMoves.foreach { case (src, dst) =>
      if (fs.exists(new Path(src))) renameOrThrow(src, dst)
    }
    m.moves.foreach { case (src, dst) =>
      val s = new Path(src)
      if (fs.exists(s)) {
        val parent = new Path(dst).getParent
        if (parent != null && !fs.exists(parent)) { fs.mkdirs(parent); () }
        renameOrThrow(src, dst)
      }
    }
  }

  /** The prune phase every maintenance commit ENDS with (after its own
    * meta/tick is the newest): physically delete the drops of every
    * OLDER snapshot meta — whose in-flight readers have now had one
    * full maintenance commit of grace, the index tier's
    * keep-predecessor contract — then prune the dirs those deletes
    * emptied (this is where retention's partition-directory removal
    * now happens, one commit deferred). Runs inside a maintenance
    * claim; all listed metas are sealed commits whose renames have
    * executed (crashed ones roll forward at handle open).
    */
  // Minimum age a superseded file set must reach before physical
  // deletion, ON TOP of the commit-count grace: commit counting alone
  // is hollow when maintenance ticks land back-to-back (two commits
  // can seal within one slow scan), so the prune also requires the
  // superseding meta to be older than this floor. At production scale
  // maintenance ticks are minutes apart and this floor is invisible;
  // tests that assert physical aging set it to 0.
  private def dropGraceMs: Long =
    spark.conf.getOption("graft.storage.snapshotDropGraceMs")
      .map(_.toLong).getOrElse(ParquetStorage.DefaultSnapshotDropGraceMs)

  private def pruneSnapDrops(): Unit = {
    val metas = readSnapMetas()
    if (metas.isEmpty) return
    val ageCutoff = System.currentTimeMillis() - dropGraceMs
    val touched = scala.collection.mutable.LinkedHashSet.empty[Path]
    metas.dropRight(1).foreach { m =>
      val metaFile = new Path(s"$snapMetaPath/${m.ver}")
      // a meta with nothing to defer and nothing to version-fence (an
      // aged-out tick) is droppable regardless of age
      if (m.drops.isEmpty && m.moves.isEmpty && m.dirMoves.isEmpty) {
        fs.delete(metaFile, false); ()
      }
      else {
        // a FAILED stat must not count as "old enough": defaulting to
        // true would let a transient stat error physically delete a
        // superseded file set immediately, defeating the dropGraceMs
        // time floor that protects slow concurrent readers — skip this
        // meta now, a later tick retries
        val oldEnough = scala.util.Try(
          fs.getFileStatus(metaFile).getModificationTime <= ageCutoff).getOrElse(false)
        if (oldEnough) {
          m.drops.foreach { d =>
            val p = new Path(d)
            if (fs.exists(p)) {
              if (!fs.delete(p, false))
                throw new java.io.IOException(s"snapshot prune: delete failed: $d")
              Option(p.getParent).foreach { par => touched += par; () }
            }
          }
          fs.delete(metaFile, false)
          ()
        }
      }
    }
    // drain: a lone surviving meta that fences nothing (no deferred
    // drops, no adds) ends the chain — without this the tick metas
    // would keep each other alive forever, and every load() would pay
    // a meta read for a store with zero pending maintenance garbage
    readSnapMetas() match {
      case Seq(last) if last.drops.isEmpty && last.moves.isEmpty &&
          last.dirMoves.isEmpty =>
        fs.delete(new Path(s"$snapMetaPath/${last.ver}"), false); ()
      case _ => ()
    }
    // deferred empty-dir pruning, targeted at what the deletes touched:
    // walk up from each emptied dir (partition dir → measurement dir →
    // tier root), never past the store root
    val stop = qual(root)
    touched.toSeq.foreach { dir =>
      var d = dir
      while (d != null && qual(d.toString) != stop &&
          fs.exists(d) && pruneIfNoData(d))
        d = d.getParent
    }
  }

  // Scheme-split listing. Object stores: ONE recursive enumeration —
  // fs.listFiles(recursive) maps to a single paged LIST, where the
  // per-dir form would pay one round trip per partition dir (thousands
  // at 100 TB). Local filesystems: per-directory listStatus recursion —
  // there listFiles() returns LocatedFileStatus and the
  // ChecksumFileSystem computes block locations PER FILE (~6 ms each;
  // measured 1.5 s for a 244-file fold, 3x-ing the whole compaction),
  // while plain listStatus is microseconds. Hidden path COMPONENTS
  // (dot/underscore — staging dirs, Spark _temporary, marker files)
  // are filtered either way, matching what Spark's own file index
  // skips.
  private def listFilesRecStatus(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    def hidden(n: String) = n.startsWith(".") || n.startsWith("_")
    def local(d: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(d).toSeq.flatMap { s =>
        if (hidden(s.getPath.getName)) Seq.empty
        else if (s.isDirectory) local(s.getPath)
        else Seq(s)
      }
    if (!fs.exists(dir)) return Seq.empty
    val scheme = Option(dir.toUri.getScheme).getOrElse(fs.getScheme)
    if (scheme == "file") local(dir)
    else {
      val base = dir.toUri.getPath.stripSuffix("/") + "/"
      val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
      val it = fs.listFiles(dir, true)
      while (it.hasNext) {
        val s = it.next()
        val rel = s.getPath.toUri.getPath.stripPrefix(base)
        if (rel.split("/").forall(c => c.nonEmpty && !hidden(c)))
          out += s
      }
      out.result()
    }
  }

  private def listFilesRec(dir: Path): Seq[Path] = listFilesRecStatus(dir).map(_.getPath)

  /** A tier's LIVE files as seen from inside a maintenance claim: the
    * listing minus every pending drop (all metas are ≤ the claimed
    * version there). Maintenance must read through this view — a raw
    * dir read would resurrect rows a previous commit already dropped.
    */
  private def liveFilesUnderClaim(dir: String): Seq[String] =
    liveFilesUnderClaim(dir, readSnapMetas().flatMap(_.drops).toSet)

  private def liveFilesUnderClaim(dir: String, drops: Set[String]): Seq[String] =
    listFilesRec(new Path(dir)).map(_.toString).filterNot(drops)

  /** Live data bytes of a tier (pending drops excluded) — the
    * compaction tier-choice heuristic; raw `getContentSummary` would
    * double-count a tier right after its own compaction replaced files.
    */
  private def liveBytes(dir: String, drops: Set[String]): Long =
    listFilesRecStatus(new Path(dir))
      .filterNot(s => drops.contains(s.getPath.toString))
      .map(_.getLen).sum

  /** Destructive replace: claims the version chain exclusively AND
    * fails loudly ([[java.util.ConcurrentModificationException]]) when
    * any commit landed since this handle's last [[load]] — `full` was
    * computed from that load, so silently swapping it in would erase
    * the concurrent commit. The loser reloads and recomputes.
    */
  override def overwrite(full: DataFrame): Unit = synchronized {
    committed(requireObserved = true, adoptVersion = true) { overwriteInner(full) }
  }

  /** Fresh snapshot token = the largest SEALED version right now — see
    * [[Storage.snapshotToken]] for why mutations capture this before
    * planning (the load-twice window).
    */
  override def snapshotToken(): Long = synchronized { latestSealed() }

  override def overwriteAt(full: DataFrame, token: Long): Unit = synchronized {
    // rebase the staleness check on the version the mutation was
    // PLANNED against, not whatever a later load refreshed to; on a
    // conflict the caller reloads, which re-derives observedVersion
    observedVersion = token
    overwrite(full)
  }

  private def overwriteInner(full: DataFrame): Unit = {
    val staging = s"$root/.staging-${UUID.randomUUID()}"
    // Materialize BEFORE touching the primary: `full` may read from it.
    writePartitioned(full.select(Point.columns.map(col): _*), staging, SaveMode.Overwrite)
    if (exists(dataPath)) renameOrThrow(dataPath, backupDataPath)
    // fold generations were part of `full`'s input — they move aside
    // with the primary (same backup-rename swap, restored together on
    // a crash) or their rows would duplicate the rewritten store
    val foldsAside = foldDirs().map { case (v, dir) =>
      val bak = s"$root/.backup-fold-$v"
      renameOrThrow(dir, bak)
      bak
    }
    if (exists(deltaPath)) renameOrThrow(deltaPath, backupDeltaPath)
    renameOrThrow(staging, dataPath)
    // only after the new primary is verifiably in place. The snapshot
    // chain goes FIRST: the rewrite subsumed every fold input and
    // pending drop, so the metas are stale the instant the swap lands —
    // and deleting them while the backups still exist means a crash
    // anywhere in this cleanup leaves the self-identifying post-swap
    // signature (data present + backups present) that [[recover]] uses
    // to clear a chain this line never reached
    if (exists(snapMetaPath)) deleteOrThrow(snapMetaPath)
    (Seq(backupDataPath, backupDeltaPath) ++ foldsAside).foreach(deleteOrThrow)
    resetGen()
    deltaFileEstimate = 0 // delta folded into the rewritten primary
  }
}

object ParquetStorage {
  /** Delta files tolerated before an append triggers [[ParquetStorage
    * .compactDelta]]: high enough that a bounded ingest burst (the
    * bench drains ~20 micro-batches) never compacts mid-burst, low
    * enough that sustained streaming keeps per-read file listings and
    * footer reads O(32) instead of O(batches-ever).
    */
  val DefaultAutoCompactFiles = 32

  /** Minimum age of a superseded file set before its deferred physical
    * deletion — the time floor under the snapshot prune's commit-count
    * grace (see [[ParquetStorage]]'s snapshot-plan protocol notes).
    */
  val DefaultSnapshotDropGraceMs = 60000L

  /** The dedicated TIMESTAMP_MICROS write session for `parent` — ONE
    * per application session per JVM, created lazily on the first store
    * write. It shares the parent's SparkContext and SharedState
    * (newSession), so jobs, cache, and Hadoop conf are the same world,
    * and every use first MIRRORS the parent's live session conf (a
    * `newSession` seeds only from the initial SparkConf — runtime
    * `spark.conf.set` calls like a datetime rebase mode, legacy list
    * encoding, or a compression codec would otherwise silently not
    * apply to the store's distributed writes while
    * [[Storage.writeParquetLocal]] honors them) and then re-asserts
    * the pin — so the two sessions genuinely differ in EXACTLY ONE
    * key, `spark.sql.parquet.outputTimestampType`, and only writes
    * explicitly re-bound to it ([[ParquetStorage.rebound]]) ever see
    * the pin. Replaces the r14 refcounted scoped pin, whose
    * set/restore window could still expose the application's own
    * concurrent parquet writes to MICROS mid-store-write.
    */
  // WEAK keys: a JVM that churns through short-lived application
  // sessions (test harnesses, notebook servers) must not retain every
  // parent session — and its dedicated child SessionState — forever.
  // SparkSession has identity equals, so WeakHashMap's equality IS
  // identity here; the child session holds the shared context but not
  // the parent session, so the entry is collectable once the
  // application drops the parent. All access is synchronized below.
  private val writeSessions =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      org.apache.spark.sql.SparkSession]

  private val TsKey = "spark.sql.parquet.outputTimestampType"

  private[engine] def syncedMicrosWriteSession(
      parent: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    writeSessions.synchronized {
      val ws = Option(writeSessions.get(parent)).getOrElse {
        val s = parent.newSession()
        writeSessions.put(parent, s)
        s
      }
      // live mirror: copy changed keys, drop keys the parent unset
      // (static/immutable entries throw on set — skip them, they are
      // identical across sessions of one context by construction)
      val parentAll = parent.conf.getAll
      parentAll.foreach { case (k, v) =>
        if (k != TsKey && !ws.conf.getOption(k).contains(v))
          scala.util.Try(ws.conf.set(k, v))
      }
      ws.conf.getAll.keysIterator
        .filter(k => k != TsKey && !parentAll.contains(k)).toSeq
        .foreach(k => scala.util.Try(ws.conf.unset(k)))
      ws.conf.set(TsKey, "TIMESTAMP_MICROS")
      ws
    }
}
