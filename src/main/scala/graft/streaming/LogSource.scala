package graft.streaming

import java.util.{Optional => JOptional}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, ReportsSourceMetrics, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A CUSTOM DataSourceV2 streaming source — the broker-consumer shape of
  * the reference's own ingest (an MQTT subscriber loop,
  * examples/3_iot_datastore_with_mqtt.py:56-120), re-expressed as the
  * thing a Spark cluster actually consumes: a replayable, offset-addressed
  * log. The sandbox stand-in for the broker is a directory of SEALED
  * segment files (a producer publishes a batch by writing a temp file and
  * atomically renaming it in — segments are immutable once visible, the
  * Kafka log-segment contract), so offsets are stable across restarts and
  * any offset range replays bit-identically — which is exactly what the
  * checkpointed micro-batch engine needs for exactly-once.
  *
  * Wire format: one UTF-8 line per record. Segment names carry their own
  * record count (`<seq12>-<count>.seg`), so `latestOffset` is a pure
  * directory listing — no file is opened until its records are actually
  * planned into a batch (the sidecar-index idea, baked into the name).
  *
  * Scale shape: one InputPartition per segment-slice, so a 1000-executor
  * cluster drains a large backlog with segment-level parallelism; the
  * driver never reads record data, only the listing. Admission control
  * (`maxRecordsPerTrigger`) bounds each micro-batch, and
  * `SupportsTriggerAvailableNow` snapshots the backlog so AvailableNow
  * drains a static log to completion in rate-limited batches and stops.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-log")
  *     .option("path", dir).option("maxRecordsPerTrigger", 500)
  *     .load()                       // schema: offset LONG, payload STRING
  * }}}
  */
class GraftLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("partitioned", false)) GraftLog.PartitionedSchema
    else GraftLog.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    // reads carry GraftLog.Schema; a WRITE hands the query's own schema
    // through here — echo it so resolution passes, and validate the
    // payload contract at write-build time
    new GraftLogTable(new CaseInsensitiveStringMap(properties), schema)
}

object GraftLog {
  val Schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  /** Schema of a PARTITIONED topic read — (partition, offset) is the
    * record's identity, exactly Kafka's (partition, offset) pair;
    * offsets are per-partition sequences, independent across partitions.
    */
  val PartitionedSchema: StructType = StructType(Seq(
    StructField("partition", org.apache.spark.sql.types.IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  private val PartDirName = """p-(\d{4})""".r

  /** Sub-directory of topic `dir` holding partition `p`'s segment log. */
  def partitionDir(dir: String, p: Int): String = {
    require(p >= 0 && p < 10000, "partition id in [0, 10000)")
    f"${dir.stripSuffix("/")}/p-$p%04d"
  }

  /** Discover a partitioned topic's partitions: `p-NNNN` sub-dirs, by
    * id. Listing-only; a topic's partition count is normally fixed at
    * creation (the Kafka model), but a partition added later is picked
    * up by the NEXT offset poll and consumed from ITS earliest offset.
    */
  def listPartitions(dir: String, conf: Configuration): Seq[Int] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq.flatMap { st =>
      st.getPath.getName match {
        case PartDirName(id) if st.isDirectory => Some(id.toInt)
        case _ => None
      }
    }.sorted
  }

  private val SegmentName = """(\d{12})-(\d+)\.seg""".r
  private[streaming] val BasedSegmentName = """(\d{12})-b(\d+)-(\d+)\.seg""".r
  // A log-COMPACTED segment (Kafka cleanup.policy=compact output): same
  // seq and base as the segment it replaces, count = the ORIGINAL span
  // (offset arithmetic over segment boundaries never changes), `g<v>` =
  // the compaction version (each pass that rewrites a segment bumps it
  // — renames are create-only, so versions make re-compaction atomic),
  // `n<rows>` = the SURVIVING record count (statistics only — span
  // stays the offset-math currency; optional for early-format names).
  // Lines inside carry explicit "<offsetDelta>\t<record>" pairs because
  // surviving offsets have gaps. THE ONE GRAMMAR: every consumer
  // (listing, reader dispatch, retention's based() check, the
  // producer's seqGver) matches through these shared regexes.
  private[streaming] val CompactedSegmentName =
    """(\d{12})-b(\d+)-(\d+)-g(\d+)(?:-n(\d+))?\.seg""".r

  private val SinkSegmentName = """s(\d{12})-p(\d{4})-(\d+)\.seg""".r
  private val StagedSinkName = """\.sink-e(\d{12})-p\d{4}-t\d+\.staged""".r

  private[streaming] def isCompactedName(name: String): Boolean = name match {
    case CompactedSegmentName(_, _, _, _, _) => true
    case _                                   => false
  }

  /** Surviving record count of a segment — the statistics currency
    * (span = `count` stays the offset currency): compacted names carry
    * it as `-n<rows>`; everything else has rows == span.
    */
  def segmentLiveRows(s: Segment): Long = new Path(s.path).getName match {
    case CompactedSegmentName(_, _, span, _, n) =>
      Option(n).map(_.toLong).getOrElse(span.toLong)
    case _ => s.count
  }

  /** Sweep dead attempts' invisible `.sink-*.staged` leftovers in `dir`.
    * A task KILL skips `DataWriter.abort`, so a crashed attempt's
    * dot-prefixed staged file would otherwise linger forever (readers
    * never see it — no segment regex matches a dot name — but a sink
    * that runs for a year accumulates garbage). Swept: files whose
    * epoch is `upToEpoch` or OLDER and whose NAME is not in `keep` —
    * name, not full path, because listStatus returns fully-qualified
    * URIs while writer messages carry the construction-time form.
    * Future epochs are never touched. A zombie speculative task still
    * writing to a swept file keeps an unlinked inode — harmless.
    * Caller must hold the topic lock.
    */
  private[streaming] def sweepStagedLocked(dir: String, conf: Configuration,
      upToEpoch: Long, keep: Set[String]): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return 0
    var swept = 0
    fs.listStatus(p).foreach { st =>
      st.getPath.getName match {
        case StagedSinkName(e) if st.isFile && e.toLong <= upToEpoch &&
            !keep.contains(st.getPath.getName) =>
          if (fs.delete(st.getPath, false)) swept += 1
        case _ => ()
      }
    }
    swept
  }

  /** One sealed segment: sequence number, the GLOBAL offset of its
    * first record, record count, and path.
    */
  final case class Segment(seq: Long, base: Long, count: Long, path: String)

  /** List sealed segments in `dir`, sorted by sequence — the topic's
    * committed record log. Names carry counts, so this is listing-only.
    *
    * Two segment families coexist in a listing (a topic is normally
    * written by ONE of them): producer segments (`<seq>-<count>.seg`,
    * visible the instant the rename lands) and STREAMING-SINK segments
    * (`s<epoch>-p<pid>-<count>.seg`), which are visible only once their
    * epoch's `_epoch-<id>.committed` marker exists — the marker is the
    * sink's atomic publish, so a consumer can never observe a
    * half-committed epoch (and an epoch replay can clean invisible
    * leftovers without ever shrinking anyone's offsets).
    */
  def listSegments(dir: String, conf: Configuration): Seq[Segment] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Nil
    val entries = fs.listStatus(p)
    val committedEpochs = entries.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("_epoch-") && n.endsWith(".committed"))
        scala.util.Try(n.stripPrefix("_epoch-").stripSuffix(".committed").toLong).toOption
      else None
    }.toSet
    // (seq, explicitBase, count, path): producer segments carry their
    // base offset in the name (what makes RETENTION safe — deleting a
    // prefix cannot shift anyone's offsets); legacy/sink segments
    // derive bases from the running cumulative sum.
    // (seq, explicitBase, count, path, compactionVersion): a seq that
    // appears in several forms (the original plus one or more
    // compacted rewrites — superseded forms persist one pass for
    // reader grace) resolves to its HIGHEST compaction version; the
    // original counts as version 0. Compacted counts are the original
    // SPAN, so the running-offset arithmetic is version-blind.
    val raw = entries.toSeq.flatMap { st =>
      st.getPath.getName match {
        case CompactedSegmentName(seq, base, count, gver, _) if st.isFile =>
          Some((seq.toLong, Some(base.toLong), count.toLong, st.getPath.toString,
            gver.toLong))
        case BasedSegmentName(seq, base, count) if st.isFile =>
          Some((seq.toLong, Some(base.toLong), count.toLong, st.getPath.toString, 0L))
        case SegmentName(seq, count) if st.isFile =>
          Some((seq.toLong, None, count.toLong, st.getPath.toString, 0L))
        case SinkSegmentName(epoch, pid, count)
            if st.isFile && committedEpochs.contains(epoch.toLong) =>
          // epoch-major, partition-minor order; caps documented on the sink
          Some((epoch.toLong * 10000L + pid.toLong, None, count.toLong,
            st.getPath.toString, 0L))
        case _ => None
      }
    }.groupBy(_._1).valuesIterator.map(_.maxBy(_._5)).toSeq.sortBy(_._1)
    var cum = 0L
    raw.map { case (seq, explicit, count, path, _) =>
      val base = explicit.getOrElse(cum)
      require(base >= cum,
        s"segment $path declares base $base below the running offset $cum (corrupt log)")
      cum = base + count
      Segment(seq, base, count, path)
    }
  }

  /** Offset low-water persisted by [[GraftLogProducer.truncateBefore]]
    * (Kafka's logStartOffset): survives even a FULLY truncated log, so
    * neither end of the offset range ever moves backwards.
    */
  private[streaming] def logStart(dir: String, conf: Configuration): Long = {
    val p = new Path(dir, "_log_start")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) 0L
    else {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(p), "UTF-8"))
      try in.readLine().trim.toLong
      finally in.close()
    }
  }

  /** End offset of the last sealed segment = the log's latest offset. */
  def latestOffset(dir: String, conf: Configuration): Long =
    listSegments(dir, conf).lastOption.fold(logStart(dir, conf))(s => s.base + s.count)

  /** First retained record's offset (= latestOffset on an empty or
    * fully-truncated log).
    */
  def earliestOffset(dir: String, conf: Configuration): Long = {
    val segs = listSegments(dir, conf)
    math.max(logStart(dir, conf), segs.headOption.fold(0L)(_.base))
  }

  /** Highest sink epoch folded into based-name segments by
    * [[compactSinkEpochs]] (−1 if none): an epoch at or below this has
    * already been published and compacted, so a sink replay of it must
    * drop its output even though the epoch marker is gone.
    */
  private[streaming] def compactedThrough(dir: String, conf: Configuration): Long = {
    val p = new Path(dir, "_sink_compacted_through")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) -1L
    else {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(p), "UTF-8"))
      try in.readLine().trim.toLong
      finally in.close()
    }
  }

  // ---- topic maintenance lock (claim/seal version chain) ----
  //
  // The same protocol as ParquetStorage's `_versions` chain: marker
  // `_maint/<n>` = "maintenance transition n in flight", `<n>.done` =
  // complete; a claim of n+1 is attempted only once `<n>.done` exists,
  // and the claim itself is an atomic create-if-absent. Serializes the
  // topic's DESTRUCTIVE maintenance — marker compaction, retention, and
  // the sink's epoch commit — against each other: two unserialized
  // compactors could each fold a different epoch prefix and the later
  // low-water write would REGRESS `_sink_compacted_through`, letting a
  // replay of an already-compacted epoch re-publish its records
  // (duplicates). Reads stay lock-free (every individual rename is
  // atomic and both segment name forms are visible-consistent).
  //
  // Liveness after a crash mid-transition: a claim older than the lock
  // timeout is a dead process's — the next waiter seals it and takes
  // over (the topic has no "handle open" recovery point, so takeover is
  // time-based). A LIVE holder is protected by a HEARTBEAT: a daemon
  // thread refreshes the claim file's mtime every timeoutMs/4 while the
  // body runs, so "age > timeoutMs" can only be true of a holder whose
  // process died (or was suspended longer than the lease — the
  // standard lease-takeover residual risk; every maintenance step is
  // idempotent/resumable by design, so finishing a dead run's work is
  // always safe).

  private[graft] def withTopicLock[T](dir: String, conf: Configuration,
      timeoutMs: Long = 30000L)(body: => T): T = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) { fs.mkdirs(root); () }
    // Lock-marker ops bypass the checksum layer: markers are EMPTY
    // files (a checksum protects nothing), and ChecksumFileSystem's
    // `.crc` sibling is a real crash surface — its create shells out
    // to chmod on the sibling, and a holder/contender racing seal +
    // cleanup of the same claim can delete the sibling inside that
    // window, surfacing a spurious ExitCodeException ("chmod: cannot
    // access '.../.<n>.done.crc'") from a CORRECT lock protocol. Raw
    // ops have no sibling, so the race has nothing to lose.
    val mfs = fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    val md = new Path(root, "_maint")
    if (!mfs.exists(md)) { mfs.mkdirs(md); () }
    // versions parse from marker names only — the raw fs also lists
    // `.<n>[.done].crc` siblings left by pre-upgrade checksum creates,
    // which must never read as claims (hidden names are skipped here
    // and swept by the prune below)
    def head(): Long = mfs.listStatus(md)
      .filterNot(_.getPath.getName.startsWith("."))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripSuffix(".done").toLong).toOption)
      .foldLeft(0L)(math.max)
    def isSealed(n: Long): Boolean = n == 0L || mfs.exists(new Path(md, s"$n.done"))
    def atomicClaim(p: Path): Boolean = {
      val uri = p.toUri
      if (uri.getScheme == null || uri.getScheme == "file")
        new java.io.File(uri.getPath).createNewFile()
      else
        try { mfs.create(p, false).close(); true }
        catch { case _: java.io.IOException => false }
    }
    def touch(p: Path): Unit =
      try mfs.setTimes(p, System.currentTimeMillis(), -1L)
      catch { case _: Exception =>
        val uri = p.toUri
        if (uri.getScheme == null || uri.getScheme == "file") {
          new java.io.File(uri.getPath).setLastModified(System.currentTimeMillis())
          ()
        }
      }
    // seal with a short retry: even raw-fs creates can hit transient
    // local-fs errors under a takeover race; the seal is idempotent
    // (overwrite of an empty marker), so retrying is always safe
    def seal(n: Long): Unit = {
      val p = new Path(md, s"$n.done")
      var attempt = 0
      var ok = false
      while (!ok) {
        try { mfs.create(p, true).close(); ok = true }
        catch {
          case e: java.io.IOException =>
            attempt += 1
            if (attempt > 3) throw e
            Thread.sleep(5L * attempt)
        }
      }
    }
    val deadline = System.currentTimeMillis() + timeoutMs
    var v = -1L
    while (v < 0) {
      val cur = head()
      if (isSealed(cur)) {
        if (atomicClaim(new Path(md, s"${cur + 1}"))) v = cur + 1
      } else {
        // stale-claim takeover: no heartbeat for a full lease period
        // means the claimant died mid-transition
        val age = try System.currentTimeMillis() -
          mfs.getFileStatus(new Path(md, s"$cur")).getModificationTime
        catch { case _: java.io.FileNotFoundException => 0L }
        if (age > timeoutMs) seal(cur)
      }
      if (v < 0) {
        if (System.currentTimeMillis() > deadline)
          throw new java.io.IOException(
            s"timed out waiting for topic maintenance lock at $dir")
        Thread.sleep(2L)
      }
    }
    // lease heartbeat: keep the claim visibly alive while body runs
    val claimPath = new Path(md, s"$v")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beat = new Thread(() => {
      var interrupted = false
      while (!stop.get() && !interrupted) {
        try Thread.sleep(math.max(1L, timeoutMs / 4))
        catch { case _: InterruptedException => interrupted = true }
        if (!stop.get() && !interrupted) touch(claimPath)
      }
    }, s"graft-topic-lock-heartbeat-$v")
    beat.setDaemon(true)
    beat.start()
    // fencing-token check: true once a waiter has force-sealed this
    // claim (lease takeover of a holder suspended past the lease) —
    // the usurper may be mutating concurrently, so the resumed holder
    // must NOT report success. Cheap: one listing + one exists.
    def fenced(): Boolean =
      mfs.exists(new Path(md, s"$v.done")) || head() != v
    try {
      val result = body
      // check BEFORE reporting success (the "at least before sealing"
      // fence): a suspended-then-resumed holder whose lease was taken
      // over surfaces a retriable error instead of silently interleaved
      // completion. The residual window — a takeover landing between
      // this check and the caller consuming the result — is the
      // irreducible lease-protocol gap; every maintenance step stays
      // individually idempotent/resumable for exactly that reason.
      if (fenced())
        throw new java.io.IOException(
          s"topic maintenance lease at $dir was taken over during the critical " +
            "section (holder suspended past the lease); state is resumable — retry")
      result
    } finally {
      stop.set(true); beat.interrupt()
      // seal even on failure (every step is resumable; a surviving
      // sibling must not deadlock behind a dead claim), prune below head
      seal(v)
      mfs.listStatus(md).foreach { s =>
        val n = s.getPath.getName
        // pre-upgrade `.crc` siblings prune alongside their markers
        val stem0 =
          if (n.startsWith(".") && n.endsWith(".crc")) n.drop(1).dropRight(4) else n
        val stem = stem0.stripSuffix(".done")
        if (scala.util.Try(stem.toLong).toOption.exists(_ < v))
          mfs.delete(s.getPath, false)
      }
    }
  }

  /** MARKER COMPACTION — bounds the one-file-per-epoch `_epoch-*.committed`
    * growth on sink topics. Every committed epoch older than the newest
    * `keepLast` markers is folded into the producer segment form: each of
    * its `s<epoch>-p<pid>-<n>.seg` files is renamed to
    * `<seq>-b<base>-<n>.seg` (same synthesized seq = epoch·10000+pid, base
    * from the current listing), which is visible WITHOUT a marker — then
    * the `_sink_compacted_through` low-water advances and the marker is
    * deleted. Record offsets, order, and content are invariants: at every
    * instant each record is visible exactly once (sink-named under its
    * marker, or based-named), so a crash at any step leaves a consistent
    * log that the next compaction finishes. Bonus: a fully-compacted
    * prefix is in producer form, so [[GraftLogProducer.truncateBefore]]
    * retention works on sink topics too.
    *
    * CONCURRENT-SAFE: the whole pass runs inside the topic maintenance
    * lock ([[withTopicLock]]), so two maintenance processes — or a
    * maintenance run racing the sink's own epoch commit — serialize
    * instead of interleaving (an unserialized pair could regress the
    * `_sink_compacted_through` low-water and re-admit a compacted
    * epoch's replay). Returns the number of markers removed.
    */
  def compactSinkEpochs(dir: String, conf: Configuration, keepLast: Int = 32): Int = {
    graft.util.FsContract.requireAtomicRename(conf, dir,
      "graft-log sink-epoch compaction (create-only based-segment renames)")
    withTopicLock(dir, conf) { compactSinkEpochsLocked(dir, conf, keepLast) }
  }

  /** [[compactSinkEpochs]] body — caller must hold the topic lock. */
  private[streaming] def compactSinkEpochsLocked(dir: String, conf: Configuration,
      keepLast: Int): Int = {
    require(keepLast >= 1, "keepLast >= 1 (the engine can replay the newest epoch)")
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return 0
    val markers = fs.listStatus(p).flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("_epoch-") && n.endsWith(".committed"))
        scala.util.Try(n.stripPrefix("_epoch-").stripSuffix(".committed").toLong).toOption
      else None
    }.sorted.toSeq
    if (markers.size <= keepLast) return 0
    val doomed = markers.dropRight(keepLast)
    // bases come from the live listing (sink segments derive theirs from
    // the running sum); renames preserve them explicitly
    val byPath = listSegments(dir, conf).map(s => s.path -> s).toMap
    var removed = 0
    doomed.foreach { epoch =>
      fs.listStatus(p).foreach { st =>
        st.getPath.getName match {
          case SinkSegmentName(e, pid, count) if st.isFile && e.toLong == epoch =>
            val seg = byPath(st.getPath.toString)
            require(seg.seq < 1000000000000L, s"sink seq ${seg.seq} exceeds 12 digits")
            val dst = new Path(p, f"${seg.seq}%012d-b${seg.base}-${count.toLong}.seg")
            if (!fs.rename(st.getPath, dst))
              throw new java.io.IOException(s"compaction rename failed: ${st.getPath} -> $dst")
          case _ => ()
        }
      }
      // low-water BEFORE the marker delete: a crash between the two
      // leaves a marker with no sink segments — harmless, re-deleted next
      // run. MONOTONE: never write a value below the current low-water
      // (belt-and-braces — the lock already serializes writers).
      if (epoch > compactedThrough(dir, conf))
        graft.util.AtomicFiles.writeLong(fs, new Path(p, "_sink_compacted_through"), epoch)
      fs.delete(new Path(p, s"_epoch-$epoch.committed"), false)
      removed += 1
    }
    removed
  }

  // ---- log compaction (cleanup.policy=compact) -------------------------

  /** Cleaned-through offset — Kafka's cleaner checkpoint
    * (`cleaner-offset-checkpoint`): every sealed segment ENTIRELY below
    * it is CLEAN (globally deduplicated against the whole log as of the
    * pass that wrote the point, carrying a `.keys` fingerprint sidecar);
    * everything at or above it is the DIRTY suffix the next pass builds
    * its offset map from. Written LAST by a pass — after every rewrite
    * and sidecar — so its presence proves the pass completed; a crash
    * anywhere leaves a stale (lower) point and the next pass simply
    * rescans more (never a wrong answer). 0 when absent.
    */
  private[graft] def cleanerPoint(dir: String, conf: Configuration): Long =
    graft.util.AtomicFiles.readLong(
      new Path(dir).getFileSystem(conf), new Path(dir, "_cleaner_point")).getOrElse(0L)

  /** Segment-data opens since JVM start — test instrumentation proving
    * the incremental cleaner's IO bound (a pass over a mostly-clean
    * topic opens only the dirty suffix plus flagged clean segments).
    */
  private[graft] val segmentDataOpens = new java.util.concurrent.atomic.AtomicLong(0L)
  // probe counter: per-segment `.keys` sidecar reads — the small-GET
  // tier the `_keys_manifest` exists to collapse to one read per pass
  private[graft] val keySidecarReads = new java.util.concurrent.atomic.AtomicLong(0L)

  private[streaming] def keyOf(r: String): String = {
    val i = r.indexOf('\t')
    if (i < 0) r else r.substring(0, i)
  }

  private[streaming] def isTombstone(r: String): Boolean = {
    val i = r.indexOf('\t')
    i >= 0 && i == r.length - 1
  }

  /** 16-byte MD5 key fingerprint — the offset map's key (Kafka's
    * cleaner uses the same trick): memory O(distinct keys × 16 B)
    * regardless of key length, and the `.keys` sidecars store the same
    * currency so clean segments are overlap-checkable without opening
    * their data.
    */
  private def fp(r: String): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(keyOf(r).getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(d)
    (bb.getLong, bb.getLong)
  }

  private def seqGver(name: String): Option[(String, Long)] = name match {
    case CompactedSegmentName(seq, _, _, gver, _) => Some((seq, gver.toLong))
    case BasedSegmentName(seq, _, _)              => Some((seq, 0L))
    case _                                        => None
  }

  /** Read every surviving (offsetDelta, record) of a sealed segment. */
  private def readSegmentRecords(fs: FileSystem, s: Segment): Vector[(Long, String)] = {
    val gapped = isCompactedName(new Path(s.path).getName)
    segmentDataOpens.incrementAndGet()
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(new Path(s.path)), "UTF-8"))
    try {
      val out = Vector.newBuilder[(Long, String)]
      var idx = 0L
      var l = in.readLine()
      while (l != null) {
        if (gapped) {
          val t = l.indexOf('\t')
          out += ((l.substring(0, t).toLong, l.substring(t + 1)))
        } else {
          out += ((idx, l))
          idx += 1
        }
        l = in.readLine()
      }
      out.result()
    } finally in.close()
  }

  /** A clean segment's key summary: its records' distinct key
    * fingerprints plus how many of them are tombstones — everything a
    * later pass needs to decide "does this segment need a rewrite?"
    * without opening the data. Written beside the segment the pass that
    * made it clean; ~34 B per record. A missing sidecar (old-format
    * topic, crash between the rewrite and the sidecar write) just
    * degrades that segment to a conservative data read.
    */
  /** A segment's key summary, kept LAZY: `block` is the raw 32-hex
    * fp-per-line text exactly as it sits on disk. At a 2000-segment
    * topic the manifest body is tens of MB — eagerly parsing a million
    * fp lines into boxed tuples (and re-rendering them at write time)
    * would dominate a steady pass's wall, so membership tests scan the
    * fixed-width lines against pre-rendered hex keys and serialization
    * is verbatim block concatenation.
    */
  private final case class KeySummary(tombs: Long, block: String) {
    /** Structural + hex validity of every fp line. The old eager parser
      * invalidated the WHOLE summary on any malformed line, forcing a
      * conservative data open; the lazy representation must keep that
      * property — a truncated/corrupted block that silently read as
      * "no hits" would leave a superseded record in the view forever
      * (the cleaner point advances past it). Empty block = zero
      * records, valid.
      */
    lazy val wellFormed: Boolean = {
      var i = 0
      var ok = true
      while (ok && i < block.length) {
        val nl = block.indexOf('\n', i)
        val end = if (nl < 0) block.length else nl
        if (end - i != 32) ok = false
        else {
          var j = i
          while (ok && j < end) {
            val c = block.charAt(j)
            if (!(c >= '0' && c <= '9') && !(c >= 'a' && c <= 'f')) ok = false
            j += 1
          }
        }
        i = end + 1
      }
      ok
    }

    /** Does any fp line appear in `hexKeys` (32-hex-rendered)? */
    def hitsAny(hexKeys: java.util.HashSet[String]): Boolean = {
      if (hexKeys.isEmpty) return false
      var start = 0
      while (start < block.length) {
        val nl = block.indexOf('\n', start)
        val end = if (nl < 0) block.length else nl
        if (end - start == 32 && hexKeys.contains(block.substring(start, end)))
          return true
        start = end + 1
      }
      false
    }
  }

  private def hexOf(fpv: (Long, Long)): String = f"${fpv._1}%016x${fpv._2}%016x"

  private def keysPath(segPath: String) = new Path(segPath + ".keys")

  private def readKeySummary(fs: FileSystem, segPath: String): Option[KeySummary] = {
    keySidecarReads.incrementAndGet()
    graft.util.AtomicFiles.readString(fs, keysPath(segPath)).flatMap { body =>
      val nl = body.indexOf('\n')
      if (nl < 0 || !body.startsWith("tombs=")) None
      else scala.util.Try {
        KeySummary(body.substring(6, nl).toLong, body.substring(nl + 1))
      }.toOption
    }
  }

  private def writeKeySummary(fs: FileSystem, segPath: String,
      recs: Seq[(Long, String)]): KeySummary = {
    val tombs = recs.count(r => isTombstone(r._2))
    val block = {
      val sb = new StringBuilder
      recs.foreach { case (_, r) => sb ++= hexOf(fp(r)) += '\n' }
      sb.toString
    }
    graft.util.AtomicFiles.writeString(fs, keysPath(segPath), s"tombs=$tombs\n" + block)
    KeySummary(tombs, block)
  }

  // ---- per-topic keys MANIFEST (chunked) ----
  //
  // The per-segment `.keys` sidecars make clean segments skippable
  // without a data open, but a steady/quiescent pass still paid one
  // small sidecar READ per clean segment — O(segments) GETs per pass on
  // an object-store-shaped deployment (the r15 CleanerProbe's residual
  // 0.5–1.4 s at 500–2000 segments). The r16 manifest merged every
  // clean segment's summary into ONE `_keys_manifest` file — which
  // fixed the GET count but left the TRANSFER bound at O(clean
  // segments): a single growing blob (~17 KB/segment of fp lines),
  // re-read and rewritten whole every pass — ~1 GB per pass at a
  // 50k-segment topic.
  //
  // The manifest is now CHUNKED. `_keys_manifest` holds only an INDEX:
  // one ~50 B line per clean segment — (name, tombstone count, owning
  // chunk file) — and the fp blocks live in bounded chunk files under
  // `_keys_chunks/`. Entries stay keyed by segment NAME, which is
  // immutable → content-immutable (every rewrite bumps the `g<ver>` in
  // the name and publishes create-only), so neither tier needs an
  // invalidation protocol: a missing name falls back to its `.keys`
  // sidecar (the durable per-segment source — losing the manifest
  // costs one slow pass, never correctness). Per-pass transfer:
  //   - QUIESCENT pass: the index alone answers "any tombstones to
  //     age?" — zero chunk reads, zero sidecar reads, zero writes.
  //   - NON-QUIESCENT pass (something sealed): WRITES are bounded at
  //     O(touched chunks + index) — names keep their chunk, new names
  //     pack into the emptiest chunk with room or a fresh one, and
  //     only chunks whose membership changed rewrite. READS are the
  //     supersession check's: deciding "does any clean segment hold a
  //     dirty key?" needs the fp blocks, so chunks holding consulted
  //     clean names still load (lazily, one GET each) — worst-case
  //     O(clean chunk bytes), the same read the blob always paid; what
  //     the chunking removes is the blob's O(clean) REWRITE per pass
  //     and the quiescent tier's reads entirely.
  //   - a pre-chunking single-blob manifest reads as legacy once and
  //     is replaced by the chunked layout at that pass's end.
  // Chunk files publish create-only under unique names and superseded
  // ones are swept at index write; passes serialize under the topic
  // lock, so the sweep can never race another manifest reader.

  private def manifestPath(dirPath: Path) = new Path(dirPath, "_keys_manifest")
  private def chunksDirPath(dirPath: Path) = new Path(dirPath, "_keys_chunks")
  private val ManifestIndexMagic = "graftkidx1"

  /** Segments per chunk for NEW chunk packing (a chunk also absorbs
    * additions until 2× this size before a fresh one is opened). At
    * ~500 records/segment a chunk body is ~1 MB — the steady-pass
    * rewrite unit.
    */
  private[streaming] def manifestChunkSegments(conf: Configuration): Int =
    // floored: 0/negative would spin the packing loop forever
    math.max(1, conf.getInt("graft.log.manifestChunkSegments", 64))

  // probe counters: chunk-file reads/writes per pass — the transfer
  // bound CleanerProbe records (index reads ride keySidecarReads' old
  // slot: one per pass)
  private[graft] val manifestChunkReads = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] val manifestChunkWrites = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The index tier: segment name → (tombs, chunk file name). None =
    * no index (absent manifest, or a legacy single-blob manifest —
    * the caller falls back to [[readKeysManifest]]).
    */
  private def readKeysIndex(fs: FileSystem,
      dirPath: Path): Option[Map[String, (Long, String)]] =
    graft.util.AtomicFiles.readString(fs, manifestPath(dirPath)).flatMap { body =>
      if (!body.startsWith(ManifestIndexMagic)) None
      else Some {
        val out = Map.newBuilder[String, (Long, String)]
        body.split("\n").iterator.filter(_.startsWith("S ")).foreach { l =>
          val parts = l.drop(2).split(" ")
          if (parts.length == 3) scala.util.Try(parts(1).toLong).foreach { t =>
            out += parts(0) -> ((t, parts(2)))
          }
        }
        out.result()
      }
    }

  /** One chunk's entries — the legacy body format, reused verbatim. */
  private def readKeysChunk(fs: FileSystem, dirPath: Path,
      chunk: String): Map[String, KeySummary] = {
    manifestChunkReads.incrementAndGet()
    graft.util.AtomicFiles.readString(fs, new Path(chunksDirPath(dirPath), chunk))
      .map(parseManifestBody).getOrElse(Map.empty)
  }

  /** Rewrite the manifest tiers to exactly `entries`, reusing every
    * chunk whose membership is unchanged: names keep their previous
    * chunk; new names pack into the least-full surviving chunk with
    * room (< 2× the packing size) or fresh chunks; chunks whose member
    * set changed rewrite under a NEW unique name (create-only publish);
    * unreferenced chunk files are swept. Writes the index only when
    * anything changed. Returns true when a write happened.
    */
  private def writeKeysManifestChunked(fs: FileSystem, dirPath: Path,
      entries: Map[String, KeySummary],
      prevIndex: Map[String, (Long, String)], chunkSegs: Int): Boolean = {
    val prevByChunk: Map[String, Set[String]] =
      prevIndex.toSeq.groupBy(_._2._2).map { case (c, es) => c -> es.map(_._1).toSet }
    // survivors keep their chunk
    val keptByChunk = scala.collection.mutable.Map.empty[String, List[String]]
    entries.keysIterator.foreach { n =>
      prevIndex.get(n).foreach { case (_, c) =>
        keptByChunk(c) = n :: keptByChunk.getOrElse(c, Nil)
      }
    }
    // chunks whose membership shrank must rewrite; unchanged ones reuse
    val unchanged = keptByChunk.filter { case (c, kept) =>
      prevByChunk.get(c).contains(kept.toSet)
    }.keySet
    // only NEVER-ASSIGNED names repack: kept members of a shrunken
    // chunk rewrite with THEIR chunk below (routing them into repack
    // too would write each of them twice — once into a packed chunk,
    // once into the shrunken chunk's rewrite — and orphan one copy)
    val repack = entries.keysIterator.filterNot(prevIndex.contains).toSeq.sorted
    // fill the fullest surviving chunk below the absorb cap first so
    // steady passes converge to few, bounded chunks instead of one
    // sliver per pass
    val capacity = scala.collection.mutable.Map.empty[String, Int] ++
      unchanged.map(c => c -> (2 * chunkSegs - keptByChunk(c).size)).filter(_._2 > 0)
    val assignments = scala.collection.mutable.Map.empty[String, List[String]] // chunk → names
    var pending = repack
    while (pending.nonEmpty) {
      capacity.filter(_._2 > 0).toSeq.sortBy(-_._2).headOption match {
        case Some((c, room)) =>
          val take = pending.take(room)
          assignments(c) = take.toList
          capacity(c) = room - take.size
          pending = pending.drop(room)
        case None =>
          val take = pending.take(chunkSegs)
          assignments(s"c-${java.util.UUID.randomUUID()}") = take.toList
          pending = pending.drop(chunkSegs)
      }
    }
    // an absorbed-into chunk rewrites (membership grew); its kept
    // members come along
    val toWrite: Map[String, Seq[String]] =
      (keptByChunk.keySet ++ assignments.keySet)
        .filter(c => !unchanged(c) || assignments.contains(c))
        .map { c =>
          val names = keptByChunk.getOrElse(c, Nil) ++ assignments.getOrElse(c, Nil)
          c -> names.sorted
        }.toMap
    val finalAssign: Map[String, String] =
      (unchanged -- toWrite.keySet).flatMap(c =>
        keptByChunk(c).map(_ -> c)).toMap ++
        toWrite.flatMap { case (c, names) => names.map(_ -> c) }
    val indexUnchanged = toWrite.isEmpty &&
      prevIndex.keySet == entries.keySet &&
      entries.forall { case (n, ks) => prevIndex(n)._1 == ks.tombs }
    if (indexUnchanged) return false
    val cd = chunksDirPath(dirPath)
    if (!fs.exists(cd)) { fs.mkdirs(cd); () }
    // rewritten chunks publish under NEW unique names (a reused name
    // would mutate a file the index still references if the index
    // write below dies first) — the index flip is the commit point
    val renamed: Map[String, String] = toWrite.map { case (c, names) =>
      val fresh = s"c-${java.util.UUID.randomUUID()}"
      val body = new StringBuilder
      names.foreach { n =>
        val ks = entries(n)
        body ++= s"#seg $n tombs=${ks.tombs}\n" ++= ks.block
        if (!ks.block.endsWith("\n") && ks.block.nonEmpty) body += '\n'
      }
      manifestChunkWrites.incrementAndGet()
      graft.util.AtomicFiles.writeString(fs, new Path(cd, fresh), body.toString)
      c -> fresh
    }
    val assign = finalAssign.map { case (n, c) => n -> renamed.getOrElse(c, c) }
    val indexBody = (ManifestIndexMagic +:
      assign.toSeq.sortBy(_._1).map { case (n, c) =>
        s"S $n ${entries(n).tombs} $c"
      }).mkString("\n")
    graft.util.AtomicFiles.writeString(fs, manifestPath(dirPath), indexBody)
    // sweep superseded/unreferenced chunk files (safe: passes serialize
    // under the topic lock, so no reader holds the old index)
    val live = assign.values.toSet
    fs.listStatus(cd).foreach { s =>
      if (!s.getPath.getName.startsWith(".") && !live(s.getPath.getName))
        fs.delete(s.getPath, false)
    }
    true
  }

  // Parse only the `#seg <name> tombs=<t>` headers; each entry's fp
  // block is a verbatim substring slice of the body — zero per-fp work
  // at read time (a quiescent pass touches only `tombs`). The format of
  // every chunk file AND of the legacy single-blob manifest.
  private def parseManifestBody(body: String): Map[String, KeySummary] = {
    val out = Map.newBuilder[String, KeySummary]
    var pos = if (body.startsWith("#seg ")) 0
      else { val i = body.indexOf("\n#seg "); if (i < 0) body.length else i + 1 }
    while (pos < body.length) {
      val hdrEnd = body.indexOf('\n', pos)
      val end = {
        val n = body.indexOf("\n#seg ", pos)
        if (n < 0) body.length else n + 1
      }
      if (hdrEnd < 0 || hdrEnd >= end) pos = body.length
      else {
        val hdr = body.substring(pos + 5, hdrEnd) // after "#seg "
        val ti = hdr.lastIndexOf(" tombs=")
        if (ti > 0) scala.util.Try(hdr.substring(ti + 7).toLong).foreach { t =>
          out += hdr.substring(0, ti) -> KeySummary(t, body.substring(hdrEnd + 1, end))
        }
        pos = end
      }
    }
    out.result()
  }

  /** The LEGACY pre-chunking manifest: the whole body at
    * `_keys_manifest` (read once; the pass that reads it publishes the
    * chunked layout in its place).
    */
  private def readKeysManifest(fs: FileSystem,
      dirPath: Path): Map[String, KeySummary] =
    graft.util.AtomicFiles.readString(fs, manifestPath(dirPath))
      .filterNot(_.startsWith(ManifestIndexMagic))
      .map(parseManifestBody).getOrElse(Map.empty)

  /** LOG COMPACTION — Kafka's `cleanup.policy=compact`: keep only the
    * LATEST record per key across the sealed log, offsets preserved
    * with gaps, low-water unchanged. A record's key is its text up to
    * the first TAB (no TAB → the whole record is its own key — pure
    * idempotent dedup); a record that is exactly "key\t" (empty value)
    * is a TOMBSTONE. Kafka's rules, exactly:
    *
    *   - the NEWEST sealed segment is never rewritten (the
    *     active-segment rule) — its records all survive, and a
    *     tombstone there stays visible to consumers;
    *   - in the compactable region, a record survives iff its offset is
    *     the key's GLOBAL latest (a newer write anywhere — including
    *     the newest segment — supersedes it);
    *   - a LATEST tombstone survives the pass that first cleans it and
    *     is dropped by the NEXT pass — so the delete is readable for at
    *     least one full pass before the key vanishes entirely (Kafka's
    *     `delete.retention.ms` deferral, in passes instead of millis);
    *   - surviving records keep their exact offsets: a compacted
    *     segment keeps its seq, base, and SPAN, and stores explicit
    *     "<delta>\t<record>" lines, so `earliest`/`latest` offsets and
    *     every consumer checkpoint stay valid — a range read just
    *     returns fewer rows.
    *
    * INCREMENTAL — the Kafka cleaner-point shape: the [[cleanerPoint]]
    * marker splits the log into a CLEAN head (already globally
    * deduplicated; at most one record per key below the point) and the
    * DIRTY suffix sealed since the last pass. The offset map builds
    * from the dirty suffix ONLY (a clean record can only be superseded
    * by a dirty one — offsets ascend), dirty segments get the standard
    * two-phase read (map build + rewrite, Kafka's cleaner shape —
    * caching payloads between phases would make the pass's heap
    * O(topic)), and a CLEAN segment's data is opened only when its
    * `.keys` sidecar shows a key superseded in the dirty suffix or an
    * aged tombstone to drop (or the sidecar is missing — conservative
    * fallback). A topic with nothing sealed since the last pass is
    * O(listing + sidecar reads): zero segment-data opens
    * ([[segmentDataOpens]] proves the bound in LogSourceSpec). At a
    * 100×-segment topic this turns every pass from O(topic) reads into
    * O(dirty + affected-clean) — the difference between a cleaner that
    * can keep up and one that reads 99 clean segments to clean 1.
    *
    * `minDirtyRatio` (Kafka's `min.cleanable.dirty.ratio`): skip the
    * pass entirely (listing-only) while dirty records are less than
    * this fraction of the log's records — 0.0 compacts whenever
    * anything is dirty.
    *
    * Concurrency: runs under the topic maintenance lock (serialized
    * against retention and marker compaction); each rewritten segment
    * publishes as the next `-g<v>` compaction VERSION by create-only
    * rename, and the superseded form is left on disk until the NEXT
    * pass sweeps it — a lock-free reader that planned against the old
    * form mid-pass still finds its file, the same one-commit grace as
    * the parquet store's snapshot protocol. Returns records removed.
    */
  def compactTopic(dir: String, conf: Configuration,
      minDirtyRatio: Double = 0.0): Int = {
    graft.util.FsContract.requireAtomicRename(conf, dir,
      "graft-log compaction (create-only generation renames)")
    withTopicLock(dir, conf) { compactTopicLocked(dir, conf, minDirtyRatio) }
  }

  /** Compact every `p-NNNN` partition sub-log of a partitioned topic —
    * Kafka's cleaner runs per partition; each sub-log pass serializes
    * under its OWN maintenance lock (so it can run concurrently with
    * producers and maintenance on other partitions, and two processes
    * can split the partitions between them). Returns records removed
    * across all partitions.
    */
  def compactPartitions(dir: String, conf: Configuration,
      minDirtyRatio: Double = 0.0): Int =
    listPartitions(dir, conf)
      .map(p => compactTopic(partitionDir(dir, p), conf, minDirtyRatio)).sum

  private[streaming] def compactTopicLocked(dir: String, conf: Configuration,
      minDirtyRatio: Double = 0.0): Int = {
    require(minDirtyRatio >= 0.0 && minDirtyRatio <= 1.0, "minDirtyRatio in [0, 1]")
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    // sweep forms superseded by an EARLIER pass (deferred one pass so a
    // reader that planned mid-pass still found its file), then list
    val bySeq = fs.listStatus(dirPath).toSeq
      .filter(_.isFile)
      .flatMap(st => seqGver(st.getPath.getName).map { case (seq, v) =>
        (seq, v, st.getPath) })
      .groupBy(_._1)
    bySeq.valuesIterator.filter(_.size > 1).foreach { forms =>
      val keepV = forms.map(_._2).max
      forms.filter(_._2 < keepV).foreach { case (_, _, p) =>
        fs.delete(p, false)
        Seq(".idx", ".keys").foreach { suf =>
          val side = new Path(p.toString + suf)
          if (fs.exists(side)) { fs.delete(side, false); () }
        }
      }
    }
    val segs = listSegments(dir, conf)
    require(segs.forall(s => seqGver(new Path(s.path).getName).isDefined),
      "compactTopic requires base-offset producer segments " +
        "(sink topics: run compactSinkEpochs first)")
    if (segs.size <= 1) return 0
    val cp = cleanerPoint(dir, conf)
    val compactable = segs.init
    val cleanSegs = compactable.filter(s => s.base + s.count <= cp)
    val dirtySegs = segs.filter(s => s.base + s.count > cp) // incl. the newest
    val dirtyCompactable = compactable.filter(s => s.base + s.count > cp)
    // dirty-ratio trigger policy (record counts come from the NAMES —
    // listing-only): a log whose dirty fraction is below the threshold
    // skips the pass entirely
    if (minDirtyRatio > 0.0) {
      val total = segs.map(segmentLiveRows).sum
      val dirty = dirtySegs.map(segmentLiveRows).sum
      if (total > 0 && dirty.toDouble / total < minDirtyRatio) return 0
    }
    // nothing sealed since the last pass (the point already covers
    // everything below the newest segment): the previous pass applied
    // the newest segment's map to every clean segment, so no clean key
    // can be superseded — the only possible work is aging out clean
    // tombstones, which the sidecars report without a data open
    val quiescent = dirtyCompactable.isEmpty && cp >= segs.last.base
    // manifest tiers: chunked index (name → tombs + chunk) > legacy
    // single blob > nothing. Chunk bodies load LAZILY per consulted
    // name; only a segment no tier has seen falls back to its sidecar.
    val index = readKeysIndex(fs, dirPath)
    val legacyManifest: Map[String, KeySummary] =
      if (index.isDefined) Map.empty else readKeysManifest(fs, dirPath)
    val chunkCache = scala.collection.mutable.Map.empty[String, Map[String, KeySummary]]
    def manifestGet(segPath: String): Option[KeySummary] = {
      val segName = new Path(segPath).getName
      index match {
        case Some(idx) => idx.get(segName).flatMap { case (_, c) =>
          chunkCache.getOrElseUpdate(c, readKeysChunk(fs, dirPath, c)).get(segName)
        }
        case None => legacyManifest.get(segName)
      }
    }
    // QUIESCENT INDEX FAST PATH: the index alone proves there is no
    // work — every clean segment is indexed with zero tombstones, and
    // nothing dirty exists to supersede a clean key. The whole pass is
    // the listing + ONE index read: zero chunk reads, zero sidecar
    // reads, zero data opens, zero writes. (A quiescent topic whose
    // index is stale/missing falls through: the normal flow re-merges
    // the manifest below — one slow pass, not "every pass".)
    if (quiescent && index.exists(idx =>
        cleanSegs.forall(s => idx.get(new Path(s.path).getName).exists(_._1 == 0L))))
      return 0
    val cleanSummaries: Map[String, Option[KeySummary]] =
      cleanSegs.map { s =>
        s.path -> manifestGet(s.path).orElse(readKeySummary(fs, s.path))
      }.toMap
    // summaries of every compactable segment as of THIS pass's end,
    // keyed by (immutable) segment name — becomes the next manifest
    val passSummaries = scala.collection.mutable.Map.empty[String, KeySummary]
    def note(segPath: String, ks: KeySummary): Unit =
      passSummaries(new Path(segPath).getName) = ks
    // the key's latest offset in the DIRTY SUFFIX, keyed by fingerprint.
    // Segments ascend and deltas ascend within each, so a plain forward
    // scan's last write wins. Quiescent passes skip the build: the map
    // could only re-derive supersessions the previous pass already
    // applied.
    val latest = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    if (!quiescent) dirtySegs.foreach { s =>
      readSegmentRecords(fs, s).foreach { case (d, r) => latest(fp(r)) = s.base + d }
    }
    var removed = 0
    def rewrite(s: Segment, keep: Vector[(Long, String)], recs: Int): Unit = {
      val Some((seq, gver)) = seqGver(new Path(s.path).getName)
      val name = s"$seq-b${s.base}-${s.count}-g${gver + 1}-n${keep.size}.seg"
      val tmp = new Path(dirPath, s".$name.inprogress")
      val out = fs.create(tmp, true)
      try {
        keep.foreach { case (d, r) => out.write(s"$d\t$r\n".getBytes("UTF-8")) }
        out.hsync()
      } finally out.close()
      val dst = new Path(dirPath, name)
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(s"compacted segment seal failed: $name")
      // CARRY THE SEAL TIME FORWARD: time-based retention ages
      // segments by file mtime, and a rewrite stamped "now" would
      // stop retention.ms from ever expiring a repeatedly-compacted
      // segment — Kafka's cleaner preserves timestamps across
      // cleaning for exactly this reason
      fs.setTimes(dst, fs.getFileStatus(new Path(s.path)).getModificationTime, -1)
      note(dst.toString, writeKeySummary(fs, dst.toString, keep))
      removed += recs - keep.size
    }
    // DIRTY compactable segments: latest-in-map wins; a latest tombstone
    // is KEPT (it just became clean — the next pass drops it)
    dirtyCompactable.foreach { s =>
      val recs = readSegmentRecords(fs, s)
      val keep = recs.filter { case (d, r) => latest(fp(r)) == s.base + d }
      if (keep.size < recs.size) rewrite(s, keep, recs.size)
      // clean as-is; sidecar makes it skippable
      else note(s.path, writeKeySummary(fs, s.path, recs))
    }
    // CLEAN segments: data opened only when the summary (or its
    // absence) says there is work — a key superseded in the dirty
    // suffix, or a tombstone that has now been readable for a full pass
    // latest keys rendered once to the sidecar/manifest hex form — the
    // membership probe below is a fixed-width scan, no fp parsing
    val hexLatest = new java.util.HashSet[String]()
    latest.keysIterator.foreach(k => hexLatest.add(hexOf(k)))
    cleanSegs.foreach { s =>
      val needsWork = cleanSummaries(s.path) match {
        case Some(ks) if ks.wellFormed => ks.tombs > 0L || ks.hitsAny(hexLatest)
        // no sidecar, or a malformed block (the old parser's
        // whole-summary invalidation): conservative data read below
        case _ => true
      }
      if (needsWork) {
        val recs = readSegmentRecords(fs, s)
        val keep = recs.filter { case (_, r) =>
          !latest.contains(fp(r)) && !isTombstone(r)
        }
        if (keep.size < recs.size) rewrite(s, keep, recs.size)
        // sidecar was missing; restore it
        else note(s.path, writeKeySummary(fs, s.path, recs))
      } else note(s.path, cleanSummaries(s.path).get) // untouched: carry forward
    }
    // refresh the manifest to exactly this pass's compactable segments
    // (logical full replace — superseded names fall out instead of
    // accreting — but the PHYSICAL write is the chunk diff: unchanged
    // chunks are reused untouched, so a steady pass rewrites only the
    // chunks its fresh/rewritten segments touch plus the small index,
    // and a no-change pass writes nothing). A legacy single-blob
    // manifest is replaced by the chunked layout here. Ordered before
    // the cleaner point like the sidecars, but the manifest is a pure
    // cache either way — a crash between the two costs sidecar-read
    // fallbacks, never correctness.
    writeKeysManifestChunked(fs, dirPath, passSummaries.toMap,
      index.getOrElse(Map.empty), manifestChunkSegments(conf))
    // the cleaner point advances LAST — its presence proves every
    // rewrite and sidecar above completed (a crash before this line
    // leaves a stale point; the next pass rescans more, never less)
    val newCp = compactable.last.base + compactable.last.count
    if (newCp > cp)
      graft.util.AtomicFiles.writeLong(fs, new Path(dirPath, "_cleaner_point"), newCp)
    removed
  }

  /** Split a ReadMaxRows budget across topic-partitions PROPORTIONALLY
    * to backlog: floor shares first, then the remainder one slot at a
    * time in partition order to partitions with backlog left. Pure and
    * deterministic — the same (budget, backlogs) always allocates
    * identically, which is what makes a replayed batch re-plan the
    * exact same per-partition ranges. Invariants (property-tested):
    * allocations sum to min(budget, total backlog), no partition
    * exceeds its backlog, and a positive budget always makes progress.
    */
  private[graft] def distributeBudget(budget: Long,
      backlogs: Seq[(Int, Long)]): Map[Int, Long] = {
    val total = backlogs.map(_._2).sum
    if (total <= budget) return backlogs.toMap
    // BigInt for the share product: budget × backlog overflows Long
    // already at 10^9 records/trigger against a 10^10-record backlog,
    // and a wrapped-negative floor would starve the hottest partition
    val floors = scala.collection.mutable.LinkedHashMap(
      backlogs.map { case (p, b) =>
        p -> (BigInt(budget) * b / total).toLong }: _*)
    var rem = budget - floors.values.sum
    // deal the remainder ONE SLOT PER PARTITION per round, in partition
    // order, skipping partitions already at their backlog — the
    // documented round-robin fairness (the remainder can reach
    // nPartitions − 1 slots, so lumping it onto the first partition
    // with headroom would skew small-budget triggers). Floors leave
    // each partition's headroom ≥ its proportional fraction, so this
    // terminates within two rounds.
    while (rem > 0) {
      var progressed = false
      backlogs.foreach { case (p, b) =>
        if (rem > 0 && floors(p) < b) { floors(p) += 1; rem -= 1; progressed = true }
      }
      if (!progressed) rem = 0 // unreachable when total > budget; belt-and-braces
    }
    floors.toMap
  }

  /** Map the record range [start, end) onto segment slices — one input
    * partition per touched segment, line-addressed within it.
    *
    * Scale note: a slice that starts mid-segment skips lines
    * sequentially from the segment head (newline-framed records have no
    * random access), so producers should size segments near the batch
    * granularity they expect consumers to run at — the same guidance
    * Kafka gives for segment.bytes vs fetch size. A byte-offset index
    * sidecar (Kafka's .index) would remove the skip; the name-encoded
    * record count is already that idea for OFFSET discovery.
    */
  def slices(segments: Seq[Segment], start: Long, end: Long): Seq[GraftLogSlice] = {
    val out = ArrayBuffer.empty[GraftLogSlice]
    var covered = 0L
    segments.foreach { s =>
      val lo = math.max(start, s.base)
      val hi = math.min(end, s.base + s.count)
      if (lo < hi) {
        // a log-COMPACTED segment addresses records by explicit offset
        // delta (its offsets have gaps): the slice bounds become DELTA
        // bounds, baseOffset the segment base, and the reader filters —
        // "covered" counts the offset RANGE (span semantics are
        // compaction-blind; a range read of a compacted region simply
        // yields fewer rows, exactly Kafka's contract)
        if (GraftLog.isCompactedName(new Path(s.path).getName))
          out += GraftLogSlice(s.path, lo - s.base, hi - s.base, s.base, gapped = true)
        else
          out += GraftLogSlice(s.path, lo - s.base, hi - s.base, lo)
        covered += hi - lo
      }
    }
    require(start >= end || covered == end - start,
      s"offset range [$start,$end) not fully covered by sealed segments " +
        s"($covered of ${end - start} records; past the log end, or truncated " +
        "by retention while a consumer still needed it)")
    out.toSeq
  }
}

/** Producer side: publish records by sealing whole segments atomically —
  * write a dot-prefixed temp file, fsync, rename in with the count in the
  * name. Readers never see a torn segment; the offset sequence is
  * append-only.
  *
  * One live producer per topic (the Kafka partition-leader contract):
  * two producers racing the same sequence slot fail loudly on the
  * seal rename (the name already exists), never silently interleave.
  */
final class GraftLogProducer(dir: String, conf: Configuration = new Configuration()) {
  // segment seals, sparse indexes and compaction generations commit by
  // rename — refuse schemes where rename isn't atomic+exclusive
  graft.util.FsContract.requireAtomicRename(conf, dir,
    "graft-log topic (segment seals, compaction generations)")
  private val dirPath = new Path(dir)
  private val fs: FileSystem = dirPath.getFileSystem(conf)
  if (!fs.exists(dirPath)) { fs.mkdirs(dirPath); () }

  private var seq: Long =
    GraftLog.listSegments(dir, conf).lastOption.map(_.seq + 1).getOrElse(0L)

  /** Seal `records` as the next segment; returns the log's new end
    * offset. Alongside the segment, a SPARSE BYTE-OFFSET INDEX
    * (`<name>.idx`, one `recordIdx,byteOffset` line per `indexEvery`
    * records — Kafka's .index) is sealed the same tmp+rename way, so a
    * consumer slice starting mid-segment SEEKS to the nearest indexed
    * record instead of skipping lines from the head.
    */
  def publish(records: Seq[String], indexEvery: Int = 256): Long = synchronized {
    require(records.nonEmpty, "publish needs at least one record")
    require(records.forall(r => !r.contains("\n")), "records are single lines")
    require(indexEvery >= 1, "indexEvery >= 1")
    // base offset baked into the name: retention can delete a prefix of
    // segments without shifting any surviving record's offset
    val base = GraftLog.latestOffset(dir, conf)
    val name = f"$seq%012d-b$base-${records.length}.seg"
    val tmp = new Path(dirPath, s".$name.inprogress")
    val dst = new Path(dirPath, name)
    val idx = new StringBuilder
    var byteOff = 0L
    val out = fs.create(tmp, true)
    try {
      records.zipWithIndex.foreach { case (r, i) =>
        if (i % indexEvery == 0) idx ++= s"$i,$byteOff\n"
        val bytes = (r + "\n").getBytes("UTF-8")
        out.write(bytes)
        byteOff += bytes.length
      }
      out.hsync()
    } finally out.close()
    val idxTmp = new Path(dirPath, s".$name.idx.inprogress")
    val idxOut = fs.create(idxTmp, true)
    try { idxOut.write(idx.toString.getBytes("UTF-8")); idxOut.hsync() }
    finally idxOut.close()
    // index first, then the segment: a segment is never visible without
    // its index (the reverse order would leave a window where readers
    // fall back to head-skip — harmless, but why have two code paths)
    if (!fs.rename(idxTmp, new Path(dirPath, s"$name.idx")))
      throw new java.io.IOException(s"index seal failed: $idxTmp")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"segment seal failed: $tmp -> $dst")
    seq += 1
    GraftLog.latestOffset(dir, conf)
  }

  /** RETENTION: delete every segment whose records all precede
    * `offset`, and persist the new log-start low-water — safe because
    * producer segments carry their base offset in the name, so
    * surviving records keep their offsets and `latestOffset` never
    * moves backwards (a fully-truncated log still reports it from the
    * `_log_start` marker). Consumers whose checkpoints still point
    * before the new start fail LOUDLY at planInputPartitions (the
    * coverage check), exactly like a Kafka consumer past retention.
    * Only whole segments are dropped; a segment straddling `offset`
    * survives intact. Returns the number of segments deleted.
    */
  def truncateBefore(offset: Long): Int = synchronized {
    // serialized against other maintenance (marker compaction renames
    // the very segments retention lists and deletes)
    GraftLog.withTopicLock(dir, conf) { truncateBeforeLocked(offset) }
  }

  /** TIME-based retention — Kafka's `retention.ms`: delete every sealed
    * segment whose SEAL TIME (file modification time, stamped when
    * publish() renamed the segment in — an upper bound on every
    * contained record's arrival) is older than `maxAgeMs`. Segment-
    * granular exactly like Kafka: a segment drops only when its NEWEST
    * record is past the horizon, so records may outlive the horizon by
    * up to one segment's span but are never dropped early; and the cut
    * stops at the FIRST fresh segment so the retained suffix stays
    * contiguous (a clock wobble can only RETAIN more, never truncate
    * out of order). Executes as a [[truncateBefore]] at the cut — same
    * prefix-only offset semantics, same `_log_start` low-water, same
    * maintenance lock — so consumers see the standard
    * earliest-offset-advanced contract. Returns deleted segment count.
    */
  def truncateOlderThanMs(maxAgeMs: Long,
      nowMs: Long = System.currentTimeMillis()): Int = synchronized {
    require(maxAgeMs >= 0L, "maxAgeMs must be >= 0")
    GraftLog.withTopicLock(dir, conf) {
      val horizon = nowMs - maxAgeMs
      val prefix = GraftLog.listSegments(dir, conf).takeWhile(s =>
        fs.getFileStatus(new Path(s.path)).getModificationTime < horizon)
      prefix.lastOption.fold(0)(last => truncateBeforeLocked(last.base + last.count))
    }
  }

  /** SIZE-based retention — Kafka's `retention.bytes`: delete whole
    * OLDEST sealed segments while the topic's total segment bytes
    * exceed `maxBytes`. Segment-granular and never early, exactly like
    * Kafka: a topic may exceed the budget by up to one segment (a
    * segment drops only when the topic is still over budget WITHOUT
    * it), and the NEWEST segment always survives (Kafka's
    * active-segment rule — a budget of 0 truncates history, not the
    * head). The cut is a contiguous prefix by construction, and it
    * executes as a [[truncateBefore]] — same prefix-only offset
    * semantics, same `_log_start` low-water advance, same maintenance
    * lock — so consumers see the standard earliest-offset-advanced
    * contract. Returns the number of segments deleted.
    */
  def truncateToMaxBytes(maxBytes: Long): Int = synchronized {
    require(maxBytes >= 0L, "maxBytes must be >= 0")
    GraftLog.withTopicLock(dir, conf) {
      val segs = GraftLog.listSegments(dir, conf)
      val sizes = segs.map(s => fs.getFileStatus(new Path(s.path)).getLen)
      var total = sizes.sum
      var cut = 0
      // Kafka's rule exactly: a segment is deleted only when the topic
      // would STILL be at-or-over budget without it (remaining-after-
      // delete ≥ maxBytes) — "total > maxBytes" alone would drop a
      // segment whose removal lands the topic UNDER budget, deleting
      // earlier than the documented never-early contract
      while (cut < segs.size - 1 && total - sizes(cut) >= maxBytes) {
        total -= sizes(cut)
        cut += 1
      }
      if (cut == 0) 0
      else { val last = segs(cut - 1); truncateBeforeLocked(last.base + last.count) }
    }
  }

  /** LOG COMPACTION — Kafka's `cleanup.policy=compact` on this
    * producer's topic: delegates to [[GraftLog.compactTopic]] (the full
    * semantics — latest-wins per key, offsets preserved with gaps,
    * tombstone deferral, the incremental cleaner point — are documented
    * there; partitioned topics compact per sub-log via
    * [[GraftLog.compactPartitions]]). Returns records removed.
    */
  def compactTopic(minDirtyRatio: Double = 0.0): Int = synchronized {
    GraftLog.compactTopic(dir, conf, minDirtyRatio)
  }


  private def truncateBeforeLocked(offset: Long): Int = {
    val segs = GraftLog.listSegments(dir, conf)
    val doomed = segs.filter(s => s.base + s.count <= offset)
    // deleting a prefix must not shift any survivor's offset: the doomed
    // segments and the FIRST survivor must carry explicit base offsets
    // (producer/compacted form — the first based survivor re-anchors the
    // running sum for any still-markered sink segments after it)
    def based(s: GraftLog.Segment): Boolean = {
      val n = new Path(s.path).getName
      n match {
        case GraftLog.BasedSegmentName(_, _, _) => true
        case _ if GraftLog.isCompactedName(n)   => true
        case _                                  => false
      }
    }
    require(doomed.forall(based) && segs.drop(doomed.size).headOption.forall(based),
      "truncateBefore needs base-offset segment names at and after the cut " +
        "(producer topics, or sink topics past marker compaction)")
    // delete EVERY on-disk form of a doomed seq: a compacted seq keeps
    // its superseded original around for one pass of reader grace, and
    // retention must not resurrect it
    val doomedSeqs = doomed.map(s => new Path(s.path).getName.take(12)).toSet
    if (doomedSeqs.nonEmpty) fs.listStatus(dirPath).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && n.length >= 12 && doomedSeqs.contains(n.take(12)) &&
          (n.endsWith(".seg") || n.endsWith(".seg.idx") || n.endsWith(".seg.keys"))) {
        fs.delete(st.getPath, false); ()
      }
    }
    val newStart = math.max(GraftLog.logStart(dir, conf),
      doomed.lastOption.fold(0L)(s => s.base + s.count))
    if (newStart > 0L) {
      val tmp = new Path(dirPath, "._log_start.inprogress")
      val out = fs.create(tmp, true)
      try { out.write(newStart.toString.getBytes("UTF-8")); out.hsync() }
      finally out.close()
      val dst = new Path(dirPath, "_log_start")
      if (fs.exists(dst)) { fs.delete(dst, false); () }
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException("log-start marker rename failed")
    }
    doomed.size
  }
}

final class GraftLogTable(options: CaseInsensitiveStringMap,
    declaredSchema: StructType = GraftLog.Schema)
    extends Table with SupportsRead with SupportsWrite {
  private val path = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-log requires option 'path'")
    p
  }
  override def name(): String = s"graft-log:$path"
  override def schema(): StructType =
    if (declaredSchema.isEmpty) GraftLog.Schema else declaredSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        if (options.getBoolean("partitioned", false))
          new GraftLogPartitionedScan(path,
            Option(opts.get("maxRecordsPerTrigger")).map(_.toLong))
        else new GraftLogScan(path,
          Option(opts.get("maxRecordsPerTrigger")).map(_.toLong))
    }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // epoch markers and staged-segment publishes commit by rename —
    // the sink is a rename-committing surface like the producer
    graft.util.FsContract.requireAtomicRename(
      org.apache.spark.sql.SparkSession.active, path,
      "graft-log sink (epoch-marker commits, staged-segment publishes)")
    val s = info.schema()
    val keepMarkers = Option(options.get("compactMarkersAfter")).map(_.toInt).getOrElse(32)
    require(keepMarkers >= 1, "compactMarkersAfter >= 1")
    val partitioned = options.getBoolean("partitioned", false)
    if (partitioned)
      // the Kafka-producer contract: the QUERY computes the partition
      // (its hash, key routing, whatever), the sink routes each record
      // to that topic-partition's sub-log
      require(s.fields.length == 2 &&
        s.fields.head.dataType == org.apache.spark.sql.types.IntegerType &&
        s.fields(1).dataType == StringType,
        "partitioned graft-log sink takes exactly (partition INT, payload STRING); " +
          s"got $s")
    else
      require(s.fields.length == 1 && s.fields.head.dataType == StringType,
        s"graft-log sink takes exactly one STRING column (the record payload); got $s")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          if (partitioned) new GraftLogPartitionedStreamingWrite(path, keepMarkers)
          else new GraftLogStreamingWrite(path, keepMarkers)
      }
    }
  }
}

final class GraftLogScan(path: String, maxPerTrigger: Option[Long])
    extends Scan with SupportsReportStatistics {
  override def readSchema(): StructType = GraftLog.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftLogMicroBatchStream(path, maxPerTrigger)

  /** Listing-only stats (exact row count from the name-encoded counts,
    * bytes from file lengths) so Catalyst can size a topic correctly —
    * e.g. auto-broadcast a small topic joined against a big table
    * instead of treating the V2 relation as unknown/huge.
    */
  override def estimateStatistics(): Statistics = {
    val conf = new Configuration()
    val segs = GraftLog.listSegments(path, conf)
    // live rows, not offset span: a compacted segment's name carries
    // its surviving count — a heavily compacted topic must not report
    // its pre-compaction cardinality to the CBO
    val rows = segs.map(GraftLog.segmentLiveRows).sum
    val bytes =
      if (segs.isEmpty) 0L
      else {
        val fs = new Path(path).getFileSystem(conf)
        segs.map(s => try fs.getFileStatus(new Path(s.path)).getLen
          catch { case _: java.io.FileNotFoundException => 0L }).sum
      }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
    }
  }

  override def toBatch: Batch = new Batch {
    private val segments = GraftLog.listSegments(path, new Configuration())
    override def planInputPartitions(): Array[InputPartition] = {
      val lo = segments.headOption.fold(0L)(_.base)
      val hi = segments.lastOption.fold(0L)(s => s.base + s.count)
      GraftLog.slices(segments, lo, hi).toArray[InputPartition]
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftLogReaderFactory()
  }
}

/** Stream offset = count of records consumed from the log's start — a
  * single monotone long, serialized as its decimal string.
  */
final case class GraftLogOffset(records: Long) extends Offset {
  override def json(): String = records.toString
}

final class GraftLogMicroBatchStream(path: String, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow
    with ReportsSourceMetrics {
  private val conf = new Configuration()
  // AvailableNow snapshot: the backlog to drain, frozen at query start
  @volatile private var availableNowCap: Option[Long] = None

  // a fresh consumer starts at the earliest RETAINED record — on an
  // untruncated topic that is offset 0; a checkpointed consumer never
  // calls this again, so truncation can't rewind it
  override def initialOffset(): Offset =
    GraftLogOffset(GraftLog.earliestOffset(path, conf))
  override def deserializeOffset(json: String): Offset = GraftLogOffset(json.toLong)
  override def commit(end: Offset): Unit = () // retention is the producer's

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(GraftLog.latestOffset(path, conf))

  override def reportLatestOffset(): Offset =
    GraftLogOffset(GraftLog.latestOffset(path, conf))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftLogOffset].records
    val sealedEnd = GraftLog.latestOffset(path, conf)
    val capped = availableNowCap.fold(sealedEnd)(math.min(sealedEnd, _))
    val end = limit match {
      case r: ReadMaxRows     => math.min(capped, from + r.maxRows())
      case _: ReadAllAvailable => capped
      case _                   => capped
    }
    GraftLogOffset(math.max(from, end))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftLogOffset].records
    val e = end.asInstanceOf[GraftLogOffset].records
    GraftLog.slices(GraftLog.listSegments(path, conf), s, e).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory()

  /** Consumer-lag observability (Kafka's records-lag), surfaced in each
    * StreamingQueryProgress under `sources[i].metrics` — the number a
    * production operator alarms on. Listing-only, like all offset work.
    */
  override def metrics(latestConsumed: JOptional[Offset]): java.util.Map[String, String] = {
    val latest = GraftLog.latestOffset(path, conf)
    // the engine may pass back a SerializedOffset rehydrated from the
    // checkpoint log, not our class — go through the json form
    val consumed =
      if (latestConsumed.isPresent) latestConsumed.get.json().trim.toLong
      else GraftLog.earliestOffset(path, conf)
    val m = new java.util.HashMap[String, String]()
    m.put("latestOffset", latest.toString)
    m.put("consumedOffset", consumed.toString)
    m.put("backlogRecords", math.max(0L, latest - consumed).toString)
    m
  }

  override def stop(): Unit = ()
}

// ---------------------------------------------------------------------------
// PARTITIONED topics — the Kafka parallelism unit. A topic is a directory
// of `p-NNNN` sub-directories, each an independent single-writer segment
// log with its own offset sequence (N producers → N partitions, no
// cross-producer coordination). The source reads ALL partitions as one
// stream: the checkpoint offset is the per-partition offset MAP, each
// micro-batch plans one input-partition per touched segment-slice per
// topic-partition, and exactly-once holds per partition because every
// (partition, offset) range replays bit-identically from the sealed
// segments. Reference analogue: the MQTT consumer loop
// (examples/3_iot_datastore_with_mqtt.py:56-120), generalized from one
// consumer to the N-producer fan-in a production topic actually has.
// ---------------------------------------------------------------------------

/** Composite stream offset: topic-partition id → records consumed.
  * Serialized as a sorted JSON object (`{"0":12,"1":7}`) so equal
  * offsets always serialize identically — the engine compares offsets
  * by their json form when deciding whether new data exists.
  */
final case class GraftLogPartitionedOffset(parts: Map[Int, Long]) extends Offset {
  override def json(): String =
    parts.toSeq.sortBy(_._1).map { case (p, n) => s""""$p":$n""" }
      .mkString("{", ",", "}")
}

object GraftLogPartitionedOffset {
  def fromJson(s: String): GraftLogPartitionedOffset = {
    val body = s.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) GraftLogPartitionedOffset(Map.empty)
    else GraftLogPartitionedOffset(body.split(",").map { kv =>
      val i = kv.lastIndexOf(':')
      kv.substring(0, i).trim.stripPrefix("\"").stripSuffix("\"").toInt ->
        kv.substring(i + 1).trim.toLong
    }.toMap)
  }
}

final class GraftLogPartitionedScan(path: String, maxPerTrigger: Option[Long])
    extends Scan with SupportsReportStatistics {
  override def readSchema(): StructType = GraftLog.PartitionedSchema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftLogPartitionedMicroBatchStream(path, maxPerTrigger)

  override def estimateStatistics(): Statistics = {
    val conf = new Configuration()
    val (rows, bytes) = GraftLog.listPartitions(path, conf).map { p =>
      val segs = GraftLog.listSegments(GraftLog.partitionDir(path, p), conf)
      val fs = new Path(path).getFileSystem(conf)
      (segs.map(GraftLog.segmentLiveRows).sum, segs.map(s =>
        try fs.getFileStatus(new Path(s.path)).getLen
        catch { case _: java.io.FileNotFoundException => 0L }).sum)
    }.foldLeft((0L, 0L)) { case ((r, b), (r2, b2)) => (r + r2, b + b2) }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
    }
  }

  override def toBatch: Batch = new Batch {
    private val conf = new Configuration()
    override def planInputPartitions(): Array[InputPartition] =
      GraftLog.listPartitions(path, conf).flatMap { p =>
        val dir = GraftLog.partitionDir(path, p)
        val segs = GraftLog.listSegments(dir, conf)
        val lo = segs.headOption.fold(0L)(_.base)
        val hi = segs.lastOption.fold(0L)(s => s.base + s.count)
        GraftLog.slices(segs, lo, hi)
          .map(sl => GraftLogPartSlice(p, sl.file, sl.startLine, sl.endLine, sl.baseOffset, sl.gapped))
      }.toArray[InputPartition]
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftLogReaderFactory()
  }
}

final class GraftLogPartitionedMicroBatchStream(path: String, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow
    with ReportsSourceMetrics {
  private val conf = new Configuration()
  @volatile private var availableNowCap: Option[Map[Int, Long]] = None

  private def partitionEnds(): Map[Int, Long] =
    GraftLog.listPartitions(path, conf).map(p =>
      p -> GraftLog.latestOffset(GraftLog.partitionDir(path, p), conf)).toMap

  override def initialOffset(): Offset =
    GraftLogPartitionedOffset(GraftLog.listPartitions(path, conf).map(p =>
      p -> GraftLog.earliestOffset(GraftLog.partitionDir(path, p), conf)).toMap)

  override def deserializeOffset(json: String): Offset =
    GraftLogPartitionedOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(partitionEnds())

  override def reportLatestOffset(): Offset =
    GraftLogPartitionedOffset(partitionEnds())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  /** Admission control across partitions: a ReadMaxRows budget is split
    * PROPORTIONALLY to each partition's backlog (floor shares, then the
    * remainder one record at a time in partition order) — the same
    * fairness Kafka's maxOffsetsPerTrigger applies, so one hot
    * partition cannot starve the others, and the allocation is a pure
    * function of (start, listing) — deterministic under replay.
    * Partitions discovered after the checkpoint was written (absent
    * from `start`) enter at their earliest retained offset.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftLogPartitionedOffset].parts
    val sealedEnds = partitionEnds()
    val capped = availableNowCap.fold(sealedEnds)(cap =>
      sealedEnds.map { case (p, e) => p -> math.min(e, cap.getOrElse(p, 0L)) })
    val fromAll: Map[Int, Long] = capped.map { case (p, _) =>
      p -> from.getOrElse(p,
        GraftLog.earliestOffset(GraftLog.partitionDir(path, p), conf))
    }
    val backlogs = capped.toSeq.sortBy(_._1).map { case (p, e) =>
      (p, math.max(0L, e - fromAll(p)))
    }
    val ends = limit match {
      case r: ReadMaxRows =>
        val total = backlogs.map(_._2).sum
        if (total <= r.maxRows()) capped
        else GraftLog.distributeBudget(r.maxRows(), backlogs)
          .map { case (p, take) => p -> (fromAll(p) + take) }
      case _ => capped
    }
    // never move any partition backwards
    GraftLogPartitionedOffset(ends.map { case (p, e) => p -> math.max(fromAll(p), e) })
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftLogPartitionedOffset].parts
    val e = end.asInstanceOf[GraftLogPartitionedOffset].parts
    e.toSeq.sortBy(_._1).flatMap { case (p, to) =>
      val dir = GraftLog.partitionDir(path, p)
      val fromP = s.getOrElse(p, GraftLog.earliestOffset(dir, conf))
      if (fromP >= to) Nil
      else GraftLog.slices(GraftLog.listSegments(dir, conf), fromP, to)
        .map(sl => GraftLogPartSlice(p, sl.file, sl.startLine, sl.endLine, sl.baseOffset, sl.gapped))
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory()

  override def metrics(latestConsumed: JOptional[Offset]): java.util.Map[String, String] = {
    val ends = partitionEnds()
    val consumedByPart: Map[Int, Long] =
      if (latestConsumed.isPresent)
        GraftLogPartitionedOffset.fromJson(latestConsumed.get.json()).parts
      else Map.empty
    def consumedOf(p: Int): Long = consumedByPart.getOrElse(p,
      GraftLog.earliestOffset(GraftLog.partitionDir(path, p), conf))
    val latest = ends.values.sum
    val consumed = ends.keys.map(consumedOf).sum
    val m = new java.util.HashMap[String, String]()
    m.put("latestOffset", latest.toString)
    m.put("consumedOffset", consumed.toString)
    m.put("backlogRecords", math.max(0L, latest - consumed).toString)
    m.put("partitions", ends.size.toString)
    // per-partition lag — the per-topic-partition number a production
    // operator alarms on (Kafka's records-lag per partition); also the
    // direct skew signal when one producer runs hot
    ends.toSeq.sortBy(_._1).foreach { case (p, e) =>
      m.put(f"backlogRecords.p$p%04d", math.max(0L, e - consumedOf(p)).toString)
    }
    m
  }

  override def stop(): Unit = ()
}

/** The WRITE side of the connector — `df.writeStream.format("graft-log")`
  * publishes each micro-batch epoch as sealed segments, exactly once:
  *
  *   1. every task streams its rows to a DOT-PREFIXED staged file
  *      (invisible to every listing);
  *   2. the driver's epoch commit renames the staged files to
  *      `s<epoch>-p<pid>-<count>.seg` — still invisible to consumers,
  *      because sink segments only list once their epoch marker exists;
  *   3. ONE atomic marker create (`_epoch-<id>.committed`) publishes the
  *      whole epoch.
  *
  * A crash anywhere before step 3 leaves only invisible files, which the
  * epoch's replay deletes and rewrites; a replay AFTER step 3 sees the
  * marker and drops its own output — so consumers observe each epoch's
  * records exactly once and offsets never move backwards. Caps (from the
  * seq packing in [[GraftLog.listSegments]]): ≤ 10000 partitions per
  * epoch; topics are written by producers OR the sink, not both.
  *
  * Marker growth is BOUNDED: each commit ends by folding epochs older
  * than the newest `compactMarkersAfter` markers into producer-form
  * segments ([[GraftLog.compactSinkEpochs]]), so a sink that runs for a
  * year holds O(compactMarkersAfter) markers, not one per epoch ever
  * committed. Replays of a compacted epoch are still dropped via the
  * `_sink_compacted_through` low-water.
  */
final class GraftLogStreamingWrite(path: String, compactMarkersAfter: Int = 32)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftLogWriterFactory(path)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val staged = messages.collect { case m: GraftLogWriteMessage => m }
    // the whole publish (replay check → seals → marker → compaction)
    // runs under the topic maintenance lock, so an external maintenance
    // run (compaction, retention) can never interleave with an epoch
    // commit — e.g. fold segments this commit is mid-way through
    // publishing, or regress the compacted-through low-water the replay
    // check consults
    GraftLog.withTopicLock(path, conf) {
      // dead attempts' staged leftovers (task kill skips abort) — sweep
      // everything this-epoch-or-older that isn't ours
      GraftLog.sweepStagedLocked(path, conf, epochId,
        staged.map(m => new Path(m.stagedPath).getName).toSet)
      val marker = new Path(dir, s"_epoch-$epochId.committed")
      if (fs.exists(marker) || epochId <= GraftLog.compactedThrough(path, conf)) {
        // replayed epoch already published (marker live, or folded into
        // based-name segments by compaction): drop this attempt's output
        staged.foreach(m => fs.delete(new Path(m.stagedPath), false))
        return
      }
      // clean any invisible leftovers of a dead attempt, then move ours in
      if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
        st.getPath.getName match {
          case n if n.startsWith(f"s$epochId%012d-") && n.endsWith(".seg") =>
            fs.delete(st.getPath, false)
          case _ => ()
        }
      }
      staged.filter(_.count > 0L).foreach { m =>
        val dst = new Path(dir, f"s$epochId%012d-p${m.partitionId}%04d-${m.count}.seg")
        if (!fs.rename(new Path(m.stagedPath), dst))
          throw new java.io.IOException(s"sink seal failed: ${m.stagedPath} -> $dst")
      }
      staged.filter(_.count == 0L).foreach(m => fs.delete(new Path(m.stagedPath), false))
      fs.create(marker, true).close()
      // bound marker growth (already holding the lock)
      GraftLog.compactSinkEpochsLocked(path, conf, compactMarkersAfter)
      ()
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    messages.collect { case m: GraftLogWriteMessage => m }
      .foreach(m => try fs.delete(new Path(m.stagedPath), false) catch { case _: Exception => () })
  }
}

final case class GraftLogWriteMessage(partitionId: Int, count: Long,
    stagedPath: String) extends WriterCommitMessage

/** One Spark task's staged output for a PARTITIONED sink epoch: one
  * entry per topic-partition the task routed records to.
  */
final case class GraftLogPartStaged(topicPartition: Int, sparkPartitionId: Int,
    count: Long, stagedPath: String)
final case class GraftLogPartWriteMessage(entries: Seq[GraftLogPartStaged])
    extends WriterCommitMessage

/** The PARTITIONED write side — `df.writeStream.format("graft-log")
  * .option("partitioned", "true")` over (partition INT, payload STRING):
  * each task streams its rows into one dot-prefixed staged file PER
  * topic-partition it touches, and the epoch commit publishes each
  * topic-partition's sub-log independently under that sub-log's own
  * maintenance lock — seal staged files as `s<epoch>-p<sparkPid>-<n>
  * .seg` inside `p-NNNN/`, then ONE atomic marker create per sub-log.
  *
  * Exactly-once is PER PARTITION (the Kafka base contract): a crash
  * mid-commit leaves some sub-logs published (marker live — their
  * replay output is dropped) and others not (only invisible staged
  * files — replay cleans and republishes); either way each record
  * reaches its partition's consumers exactly once, and the partitioned
  * SOURCE reads every sub-log independently so no cross-partition
  * atomicity is ever assumed.
  */
final class GraftLogPartitionedStreamingWrite(path: String, compactMarkersAfter: Int = 32)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftLogPartitionedWriterFactory(path)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val fs = new Path(path).getFileSystem(conf)
    val staged = messages.collect { case m: GraftLogPartWriteMessage => m }
      .flatMap(_.entries)
    staged.groupBy(_.topicPartition).toSeq.sortBy(_._1).foreach { case (tp, entries) =>
      val dir = new Path(GraftLog.partitionDir(path, tp))
      GraftLog.withTopicLock(dir.toString, conf) {
        // sweep dead attempts' staged leftovers in this sub-log (a
        // sub-log the current epoch doesn't touch is swept the next
        // time an epoch routes records to it)
        GraftLog.sweepStagedLocked(dir.toString, conf, epochId,
          entries.map(e => new Path(e.stagedPath).getName).toSet)
        val marker = new Path(dir, s"_epoch-$epochId.committed")
        if (fs.exists(marker) ||
            epochId <= GraftLog.compactedThrough(dir.toString, conf)) {
          entries.foreach(e => fs.delete(new Path(e.stagedPath), false))
        } else {
          // clean a dead attempt's invisible leftovers, then seal ours
          if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
            st.getPath.getName match {
              case n if n.startsWith(f"s$epochId%012d-") && n.endsWith(".seg") =>
                fs.delete(st.getPath, false)
              case _ => ()
            }
          }
          entries.filter(_.count > 0L).foreach { e =>
            val dst = new Path(dir,
              f"s$epochId%012d-p${e.sparkPartitionId}%04d-${e.count}.seg")
            if (!fs.rename(new Path(e.stagedPath), dst))
              throw new java.io.IOException(s"sink seal failed: ${e.stagedPath} -> $dst")
          }
          entries.filter(_.count == 0L).foreach(e =>
            fs.delete(new Path(e.stagedPath), false))
          fs.create(marker, true).close()
          GraftLog.compactSinkEpochsLocked(dir.toString, conf, compactMarkersAfter)
          ()
        }
      }
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    messages.collect { case m: GraftLogPartWriteMessage => m }.flatMap(_.entries)
      .foreach(e => try fs.delete(new Path(e.stagedPath), false)
        catch { case _: Exception => () })
  }
}

final class GraftLogPartitionedWriterFactory(path: String) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] = {
    require(partitionId < 10000, "graft-log sink: <= 10000 spark partitions per epoch")
    new DataWriter[InternalRow] {
      private val conf = new Configuration()
      // one staged stream per topic-partition this task touches; staged
      // files live INSIDE the target sub-log so the seal is a same-dir
      // rename (atomic on every sane filesystem)
      private val open = scala.collection.mutable.LinkedHashMap
        .empty[Int, (Path, org.apache.hadoop.fs.FSDataOutputStream, Long)]
      override def write(row: InternalRow): Unit = {
        require(!row.isNullAt(0), "partitioned sink: partition must not be null")
        val tp = row.getInt(0)
        require(tp >= 0 && tp < 10000, s"partition $tp outside [0, 10000)")
        val payload = if (row.isNullAt(1)) "" else row.getUTF8String(1).toString
        require(!payload.contains("\n"), "records are single lines")
        val (p, out, n) = open.getOrElseUpdate(tp, {
          val dir = new Path(GraftLog.partitionDir(path, tp))
          val fs = dir.getFileSystem(conf)
          if (!fs.exists(dir)) { fs.mkdirs(dir); () }
          val staged = new Path(dir,
            f".sink-e$epochId%012d-p$partitionId%04d-t$taskId.staged")
          (staged, fs.create(staged, true), 0L)
        })
        out.write((payload + "\n").getBytes("UTF-8"))
        open(tp) = (p, out, n + 1)
      }
      override def commit(): WriterCommitMessage = {
        val entries = open.toSeq.map { case (tp, (p, out, n)) =>
          out.hsync(); out.close()
          GraftLogPartStaged(tp, partitionId, n, p.toString)
        }
        GraftLogPartWriteMessage(entries)
      }
      override def abort(): Unit = open.foreach { case (_, (p, out, _)) =>
        try out.close() catch { case _: Exception => () }
        try { p.getFileSystem(conf).delete(p, false); () } catch { case _: Exception => () }
      }
      override def close(): Unit = ()
    }
  }
}

final class GraftLogWriterFactory(path: String) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] = {
    require(partitionId < 10000, "graft-log sink: <= 10000 partitions per epoch")
    new DataWriter[InternalRow] {
      private val staged = new Path(path,
        f".sink-e$epochId%012d-p$partitionId%04d-t$taskId.staged")
      private val fs = staged.getFileSystem(new Configuration())
      private val out = fs.create(staged, true)
      private var count = 0L
      override def write(row: InternalRow): Unit = {
        val payload = if (row.isNullAt(0)) "" else row.getUTF8String(0).toString
        require(!payload.contains("\n"), "records are single lines")
        out.write((payload + "\n").getBytes("UTF-8"))
        count += 1
      }
      override def commit(): WriterCommitMessage = {
        out.hsync(); out.close()
        GraftLogWriteMessage(partitionId, count, staged.toString)
      }
      override def abort(): Unit = {
        try out.close() catch { case _: Exception => () }
        try { fs.delete(staged, false); () } catch { case _: Exception => () }
      }
      override def close(): Unit = ()
    }
  }
}

/** One segment slice: lines [startLine, endLine) of `file`, carrying
  * global offsets starting at `baseOffset`.
  */
/** `gapped` = a log-compacted segment: `startLine`/`endLine` are
  * OFFSET-DELTA bounds (lines carry explicit "<delta>\t<record>" pairs,
  * ascending with gaps) and `baseOffset` is the segment base; otherwise
  * they are line bounds and `baseOffset` is the first emitted offset.
  */
final case class GraftLogSlice(file: String, startLine: Long, endLine: Long,
    baseOffset: Long, gapped: Boolean = false) extends InputPartition

/** A slice of one TOPIC-PARTITION's segment: same line addressing, rows
  * additionally carry the partition id ((partition, offset) identity).
  */
final case class GraftLogPartSlice(partition: Int, file: String,
    startLine: Long, endLine: Long, baseOffset: Long,
    gapped: Boolean = false) extends InputPartition

final class GraftLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (slice, partId) = partition match {
      case s: GraftLogSlice => (s, None)
      case s: GraftLogPartSlice =>
        (GraftLogSlice(s.file, s.startLine, s.endLine, s.baseOffset, s.gapped),
          Some(s.partition))
    }
    if (slice.gapped) return new PartitionReader[InternalRow] {
      // log-compacted segment: lines are "<delta>\t<record>" with
      // ascending, GAPPED deltas; the slice bounds are delta bounds.
      // No .idx (compacted segments are already small); EOF inside the
      // range is NORMAL — compaction removed the tail records.
      private val p = new Path(slice.file)
      private val fs = p.getFileSystem(new Configuration())
      private val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(p), "UTF-8"))
      private var delta: Long = -1L
      private var rec: String = _
      private var done = false
      override def next(): Boolean = {
        if (done) return false
        var l = in.readLine()
        while (l != null) {
          val t = l.indexOf('\t')
          val d = l.substring(0, t).toLong
          if (d >= slice.endLine) { done = true; return false }
          if (d >= slice.startLine) { delta = d; rec = l.substring(t + 1); return true }
          l = in.readLine()
        }
        done = true
        false
      }
      override def get(): InternalRow = {
        val payload = UTF8String.fromString(rec)
        partId match {
          case Some(pid) => InternalRow(pid, slice.baseOffset + delta, payload)
          case None      => InternalRow(slice.baseOffset + delta, payload)
        }
      }
      override def close(): Unit = in.close()
    }
    new PartitionReader[InternalRow] {
      private val p = new Path(slice.file)
      private val fs = p.getFileSystem(new Configuration())
      // seek to the nearest indexed record at-or-before the slice start
      // (sparse .idx sidecar sealed with the segment); no index → skip
      // from the head. Either way the records read are identical.
      private val (seekRecord, seekByte) = {
        val ip = new Path(slice.file + ".idx")
        if (slice.startLine == 0L || !fs.exists(ip)) (0L, 0L)
        else {
          val br = new java.io.BufferedReader(new java.io.InputStreamReader(
            fs.open(ip), "UTF-8"))
          try {
            var best = (0L, 0L)
            var l = br.readLine()
            while (l != null) {
              val c = l.indexOf(',')
              val rec = l.substring(0, c).toLong
              if (rec <= slice.startLine && rec >= best._1) best = (rec, l.substring(c + 1).toLong)
              l = br.readLine()
            }
            best
          } finally br.close()
        }
      }
      private val in = {
        val raw = fs.open(p)
        if (seekByte > 0L) raw.seek(seekByte)
        new java.io.BufferedReader(new java.io.InputStreamReader(raw, "UTF-8"))
      }
      private var line: String = _
      private var idx: Long = seekRecord
      private var emitted: Long = 0L
      // skip the remainder to the slice start; sealed segments make
      // this deterministic
      while (idx < slice.startLine && { line = in.readLine(); line != null }) idx += 1

      override def next(): Boolean = {
        if (slice.startLine + emitted >= slice.endLine) return false
        line = in.readLine()
        if (line == null)
          throw new java.io.IOException(
            s"segment ${slice.file} shorter than its sealed count (corrupt log)")
        true
      }
      override def get(): InternalRow = {
        val payload = UTF8String.fromString(line)
        val row = partId match {
          case Some(p) => InternalRow(p, slice.baseOffset + emitted, payload)
          case None    => InternalRow(slice.baseOffset + emitted, payload)
        }
        emitted += 1
        row
      }
      override def close(): Unit = in.close()
    }
  }
}
