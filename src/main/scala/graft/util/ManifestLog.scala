package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** The engine's generic MANIFEST LOG — the create-only claim/publish
  * commit protocol shared by every manifest-authoritative tier
  * ([[graft.engine.ManifestStorage]], manifest-mode graft-log topics,
  * the manifest-mode digest store and ANN index generations). One
  * protocol, one implementation: a fix to the claim/settle/step-past/
  * re-link machinery lands everywhere at once.
  *
  * State is a totally-ordered chain of GENERATIONS under `dir/<gen>`.
  * Each generation is a small text object: caller-opaque record lines
  * plus a terminator line `E <recordCount>` appended here — a body
  * caught before its terminator (torn write, reader racing the content
  * phase) parses as IN-FLIGHT and is never trusted. The newest
  * COMPLETE generation is the only authority readers consult.
  *
  * Commit point = ONE create-only publish, two-phase on every
  * filesystem — CLAIM then CONTENT:
  *
  *   1. The slot is claimed by an EXCLUSIVE create of the manifest
  *      object itself. Local paths use `File.createNewFile` (O_EXCL —
  *      Hadoop's local `rename` maps to POSIX rename(2), which
  *      silently REPLACES an existing destination, so a tmp+rename
  *      publish would let two racers both "win" and one acknowledged
  *      commit vanish); HDFS-style filesystems use
  *      `create(p, overwrite=false)` (atomic-exclusive there); object
  *      stores map the same call to a conditional PUT where the
  *      connector supports it (S3A `fs.s3a.create.conditional
  *      .enabled`, GCS `if-generation-match: 0`). On a connector
  *      WITHOUT conditional create the claim degrades to
  *      check-then-PUT — which is why opening a manifest WRITER on
  *      such a scheme demands the deployer's explicit attestation
  *      ([[FsContract.requireManifestWritable]]), and why
  *      [[tryPublish]] re-reads its own publish when claims are not
  *      native-exclusive (`exclusiveClaims=false`): a clobbered slot
  *      is detected and retried instead of silently lost. The
  *      read-back NARROWS the check-then-PUT window (both racers
  *      reading back before the later PUT lands can still both
  *      acknowledge) — it does not close it; only conditional create
  *      or single-writer discipline does.
  *   2. The winner alone writes the content into its claimed slot,
  *      ending in the terminator. A claimant dying inside the window
  *      leaves a torn slot that readers skip and committers step past
  *      once it is stale.
  *
  * LIVENESS vs LOST-ACK: a committer finding the newest slot claimed
  * but contentless must wait out a LIVE publisher
  * ([[awaitSettledMaxGen]]) — stepping past immediately would base the
  * next generation on the OLD head and unlink the in-flight commit the
  * moment it completes. Only a claim older than `stalePublishMs` (the
  * claim-to-content window is milliseconds of CPU; only process death
  * or a long stall leaves it open) is stepped past. The step-past rule
  * leaves one narrow window — a committer stalled PAST the stale
  * window between claim and content (GC pause, VM freeze) wakes,
  * completes its content, and believes it committed while a stepper
  * already published against the old head. [[commitRetry]] closes that
  * window for COMMUTING commits: after every won publish it re-lists
  * the chain, and if a newer generation exists whose head does not
  * represent this caller's work (the `linked` predicate), it re-links
  * by looping — the acknowledged commit is re-attached instead of
  * silently lost. Non-commuting commits (optimistic overwrites) use
  * [[confirmOrSupersede]] to turn the same detection into a loud
  * failure.
  */
final class ManifestLog(fs: FileSystem, dir: Path,
    stalePublishMs: () => Long, exclusiveClaims: Boolean) {

  /** Test seam: invoked between a won claim and its content write with
    * the claimed gen — how the step-past/lost-ack specs freeze a
    * committer inside the publish window. Never set in production.
    */
  @volatile private[graft] var publishPauseHook: Option[Long => Unit] = None

  /** Test seam: invoked after the content close, before the read-back
    * verify — how the check-then-PUT clobber spec injects a racer's
    * later PUT. Never set in production.
    */
  @volatile private[graft] var publishedHook: Option[Long => Unit] = None

  /** Every numeric slot present, VALID OR NOT — the claim counter must
    * step past a torn manifest, while [[head]] skips it.
    */
  def listedGens(): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filterNot(_.getPath.getName.startsWith("."))
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)

  /** The record lines of generation `gen`, terminator-checked: None =
    * absent, torn, or in-flight.
    */
  def read(gen: Long): Option[Seq[String]] =
    AtomicFiles.readString(fs, new Path(dir, gen.toString)).flatMap(parse)

  private def parse(body: String): Option[Seq[String]] = {
    val lines = body.split("\n").filter(_.nonEmpty)
    if (lines.isEmpty || !lines.last.startsWith("E ")) None
    else if (scala.util.Try(lines.last.drop(2).trim.toInt).toOption
      .forall(_ != lines.length - 1)) None
    else Some(lines.dropRight(1).toSeq)
  }

  /** Newest COMPLETE generation — the one thing readers trust. */
  def head(): Option[(Long, Seq[String])] =
    listedGens().sorted.reverse.iterator
      .map(g => read(g).map(g -> _)).collectFirst { case Some(h) => h }

  /** Highest slot a committer must claim PAST, waiting out any
    * in-flight publish first (see class doc: stepping past a LIVE
    * publisher would unlink its commit). Returns the slot number to
    * claim above (0 = none listed).
    */
  def awaitSettledMaxGen(timeoutMs: Long = 60000L): Long = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (true) {
      val gens = listedGens()
      if (gens.isEmpty) return 0L
      val mx = gens.max
      if (read(mx).isDefined) return mx
      val age = scala.util.Try(System.currentTimeMillis() -
        fs.getFileStatus(new Path(dir, mx.toString)).getModificationTime)
        .getOrElse(Long.MaxValue)
      if (age > stalePublishMs()) return mx
      if (System.currentTimeMillis() > deadline)
        throw new java.io.IOException(
          s"manifest log at $dir: slot $mx has been claimed but contentless " +
            s"for ${timeoutMs}ms — a wedged (not dead, not publishing) committer")
      Thread.sleep(2L)
    }
    0L // unreachable
  }

  /** Publish `records` at slot `gen`; false = another committer won
    * the slot (including, when claims are not native-exclusive, a
    * check-then-PUT racer detected by the read-back — see class doc).
    */
  def tryPublish(gen: Long, records: Seq[String]): Boolean = {
    if (!fs.exists(dir)) { fs.mkdirs(dir); () }
    val target = new Path(dir, gen.toString)
    if (fs.exists(target)) return false
    val uri = fs.makeQualified(target).toUri
    val claimed =
      if (uri.getScheme == null || uri.getScheme == "file")
        new java.io.File(uri.getPath).createNewFile()
      else
        try { fs.create(target, false).close(); true }
        catch { case _: java.io.IOException => false }
    if (!claimed) return false
    publishPauseHook.foreach(_(gen))
    val body = (records :+ s"E ${records.size}").mkString("\n")
    val out = fs.create(target, true)
    try { out.write(body.getBytes("UTF-8")); out.hsync() } finally out.close()
    publishedHook.foreach(_(gen))
    if (!exclusiveClaims) {
      // check-then-PUT claims can double-win: re-read our own publish
      // (object stores are read-after-write consistent) — foreign
      // content means a racer clobbered the slot after our close; we
      // did NOT commit, and the caller retries at the next slot
      val echoed = AtomicFiles.readString(fs, target)
      if (!echoed.contains(body)) return false
    }
    true
  }

  /** Commit loop for COMMUTING commits (appends): settle, build the
    * next record set from the fresh head, publish, and — the lost-ack
    * guard — confirm after every won slot that no later generation has
    * unlinked this caller's work, re-linking by looping if one has.
    *
    * `build(headGen, headRecords)` returns the FULL record set of the
    * next generation, or None when the head already represents the
    * caller's work (nothing to publish). `linked(headRecords)` is the
    * representation test used by the post-publish confirm; it must be
    * true of any head `build` would answer None for.
    */
  def commitRetry(build: (Long, Seq[String]) => Option[Seq[String]],
      linked: Seq[String] => Boolean, maxAttempts: Int = 50): Unit = {
    var attempt = 0
    while (attempt < maxAttempts) {
      // settle FIRST (wait out any in-flight publish, step past dead
      // claims), then read the head the new manifest builds on
      val settled = awaitSettledMaxGen()
      val (hGen, hRecs) = head().getOrElse((0L, Seq.empty[String]))
      build(hGen, hRecs) match {
        case None => return
        case Some(recs) =>
          val gen = math.max(hGen, settled) + 1
          if (tryPublish(gen, recs) && confirmLinked(gen, linked)) return
      }
      attempt += 1
      Thread.sleep(2L)
    }
    throw new java.io.IOException(
      s"manifest log at $dir: lost the publish race $maxAttempts times")
  }

  /** Post-publish lost-ack check: true when gen `won` is still the
    * newest slot, or when the current head (necessarily newer) still
    * represents the caller's work per `linked`. False = a stepper
    * published against an older head and unlinked us — re-link.
    */
  private def confirmLinked(won: Long, linked: Seq[String] => Boolean): Boolean = {
    if (listedGens().forall(_ <= won)) return true
    head().exists { case (g, recs) => g >= won && linked(recs) }
  }

  /** Post-publish confirm for NON-commuting commits (optimistic
    * overwrites, pointer flips): true when the work at gen `won`
    * survives in the head per `linked`; false means a stepper
    * superseded it — the caller must surface a loud conflict, not
    * silently acknowledge.
    */
  def confirmOrSupersede(won: Long, linked: Seq[String] => Boolean): Boolean =
    confirmLinked(won, linked)
}
