package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Deduplication operators for large-scale corpus curation: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * All operators are pure DataFrame transforms with bounded shuffles —
  * candidate generation is always a bucket-equi-join (LSH band keys,
  * shared tokens, projection-grid cells), never a cross join, so cost
  * scales with corpus size and true pair density, not the corpus square.
  *
  * Hashing is md5-derived (not engine-private xxhash64) so every
  * operator is exactly reproducible in any engine with md5 — the DuckDB
  * oracle recomputes signatures bit-for-bit.
  */
object Dedup {

  /** Hash-heavy per-row stages need every core: a small corpus read
    * from one parquet file arrives as ONE partition, which would run
    * the whole md5/shingle pipeline single-threaded. Spread it before
    * the compute when the source is too small to split into >= cores
    * partitions; at real scale inputs already split and this is a no-op.
    * The probe is pure Catalyst statistics (plan-size estimate vs
    * `files.maxPartitionBytes`) — no RDD conversion, no job.
    */
  private[analytics] def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // micro-batch sizing is the engine's job
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes < BigInt(splitBytes) * p) df.repartition(p) else df
  }

  /** Exact dedup: one survivor (minimum `orderCol`) per identical
    * `keyCols` value.
    */
  def exact(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Same via groupBy (no window) — cheaper when only ids are needed:
    * map-side partial min, one shuffle, no per-group sort. The group key
    * is a sha2 digest of each key column, so the shuffle carries 32
    * bytes per key instead of whole documents.
    */
  def exactSurvivorIds(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(c => sha2(col(c).cast("string"), 256).as(s"__k_$c")): _*)
      .agg(min(idCol).as(idCol)).select(idCol)

  /** Append a batch's distinct content digests to a PERSISTED digest
    * store — the state side of incremental exact dedup: production
    * pipelines dedup each day's batch against everything already
    * ingested, and the thing that persists between runs is this
    * digest table (64-byte sha-256 rows), never the corpus. Parquet
    * append; dedup inside the batch first so the store grows by at
    * most the batch's distinct count.
    *
    * `batchTag` stamps the rows with the ingest batch/day they arrived
    * in — [[compactDigestStore]]'s retention keys off the LAST tag a
    * digest was seen with. `sidecar = true` additionally folds the
    * batch's digests into the bloom sidecar so
    * [[dedupAgainstStore]]'s skip guard stays current; `sidecarBits`
    * sizes it. SIZING IS BATCH-SIZE-AWARE (r15 BloomProbe): the guard
    * skips only when the WHOLE batch is ruled out, so a B-row clean
    * batch needs per-digest FPR ≪ 1/B — ~14+ bits/digest at B=500,
    * not the textbook ~5 (which yields low per-row rates but almost
    * never a whole-batch skip). The default 64 KB is right up to
    * ~3·10^4 digests at B=500; the 2^24 cap makes the zero-scan fast
    * path a ≤ ~10^6-digest-store feature on a FLAT store, beyond which
    * the guard degrades to always-scan by design (measure with
    * [[sidecarMightHitRate]]; a mismatched existing sidecar is
    * rebuilt at the requested size).
    *
    * `prefixLen > 0` selects the PREFIX-PARTITIONED layout (see the
    * layout note above [[digestStoreLayout]]): rows land in 16^len
    * hive partitions on the digest's leading hex chars, the sidecar is
    * per-prefix (`sidecarBits` sizes EACH prefix's bit array, and the
    * batch-size rule divides by the split: a B-row batch spreads
    * ~B/16^len digests per prefix, so per-prefix skip needs FPR ≪
    * 16^len/B — the default 2^19 bits carries ~10^5 digests PER PREFIX
    * ≈ 2.6·10^7 total at len=2 before skips fade, and the anti-join
    * stays partition-pruned regardless). The default `AutoPrefixLen`
    * adopts the store's existing layout (flat when new); an explicit
    * value must match an existing store's — layouts never mix.
    */
  def appendDigestStore(df: DataFrame, keyCols: Seq[String], path: String,
      batchTag: Long = 0L, sidecar: Boolean = false,
      sidecarBits: Int = SidecarBits, prefixLen: Int = AutoPrefixLen): Unit = {
    val spark = df.sparkSession
    val existing = digestStoreLayout(spark, path)
    val pl = prefixLen match {
      case AutoPrefixLen => existing.getOrElse(0)
      case p =>
        require(p >= 0 && p <= MaxPrefixLen,
          s"prefixLen must be in [0, $MaxPrefixLen] (0 = flat) or AutoPrefixLen; got $p")
        existing.foreach(e => require(e == p,
          s"digest store at $path has prefixLen=$e; appending with prefixLen=$p " +
            "would mix layouts in one store"))
        p
    }
    val storeKeyCols = keyCols.map(c => s"__k_$c")
    val base = df
      .select(keyCols.map(c => sha2(col(c).cast("string"), 256).as(s"__k_$c")): _*)
      .distinct()
    val digests = if (pl == 0) base
      else base.withColumn("__kp", prefixOf(storeKeyCols, pl))
    if (pl > 0 && existing.isEmpty) {
      // the explicit layout marker outlives directory shapes the
      // detection can't read (empty-after-retention, null-key-only)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      writeLayoutMarker(fs, path, pl)
    }
    // partitioned writes cluster by prefix first: without the shuffle a
    // T-task bulk load writes up to T × 16^len splinter files (32k at
    // len=3); with it, one file per TOUCHED prefix — and a small batch
    // shuffles only itself, never the store
    def clustered(d: DataFrame): DataFrame =
      if (pl == 0) d else d.repartition(col("__kp"))
    if (!sidecar) {
      val w = clustered(digests)
        .withColumn("__batch_tag", lit(batchTag))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
      (if (pl == 0) w else w.partitionBy("__kp")).parquet(path)
    } else {
      // listing of the store the current sidecar (if any) describes —
      // captured BEFORE the append so the incremental sidecar merge can
      // prove the old sidecar was current up to exactly this batch
      val preListing = storeListing(spark, path)
      // Stage-then-rename so THIS append's file set is known EXACTLY —
      // a plain `mode(Append)` + post-listing diff would race a
      // concurrent appender (its files would enter the fingerprint
      // with their digests absent from the bloom, and a later reader
      // trusting that sidecar could false-negative-skip a real
      // collision). With the staged names the fingerprint covers
      // precisely pre + ours; a racer's files make the recorded value
      // differ from the live listing at read time, so readSidecar
      // treats the sidecar as stale and the guard falls back to the
      // exact anti-join — the race degrades SAFELY in every order.
      val token = java.util.UUID.randomUUID().toString.take(12)
      val staging = path.stripSuffix("/") + s".append-staging-$token"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      try {
        val w = clustered(digests)
          .withColumn("__batch_tag", lit(batchTag))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        (if (pl == 0) w else w.partitionBy("__kp")).parquet(staging)
        // partitioned stagings nest files one level down — renames
        // preserve each file's partition dir, and the fingerprint
        // entries carry the partition-relative name
        val staged = relDataFiles(fs, new org.apache.hadoop.fs.Path(staging))
        if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
          fs.mkdirs(new org.apache.hadoop.fs.Path(path)); ()
        }
        val ours = staged.zipWithIndex.map { case ((sub, f), i) =>
          val name = s"app-$token-$i.parquet"
          val destDir =
            if (sub.isEmpty) path.stripSuffix("/")
            else s"${path.stripSuffix("/")}/$sub"
          if (sub.nonEmpty) { fs.mkdirs(new org.apache.hadoop.fs.Path(destDir)); () }
          if (!fs.rename(f.getPath,
              new org.apache.hadoop.fs.Path(s"$destDir/$name")))
            throw new java.io.IOException(s"digest append: rename failed for $name")
          (if (sub.isEmpty) name else s"$sub/$name", f.getLen)
        }
        val postFp = fingerprintOf(preListing ++ ours)
        if (pl == 0) updateDigestSidecar(spark, path, digests,
          fingerprintOf(preListing), postFp, sidecarBits)
        else updatePrefixSidecar(spark, path, digests,
          fingerprintOf(preListing), postFp, sidecarBits)
      } finally {
        if (fs.exists(new org.apache.hadoop.fs.Path(staging))) {
          fs.delete(new org.apache.hadoop.fs.Path(staging), true); ()
        }
      }
    }
  }

  // ---- digest-store lifecycle ----
  //
  // A store that only ever appends accretes one small parquet file per
  // batch forever AND is re-scanned in full by every batch's anti-join
  // even when the batch couldn't possibly collide. Two fixes, both
  // standard state-store hygiene:
  //   - [[compactDigestStore]]: fold the appends into few split-sized
  //     files, optionally dropping digests not seen since a retention
  //     tag (stale state on a rolling-window dedup contract);
  //   - a BLOOM SIDECAR (md5-derived positions, same deterministic
  //     construction as [[bloomDecontaminate]]): a KB-scale bit array
  //     over every digest in the store, consulted BEFORE the anti-join
  //     — a batch with zero possible hits skips the store read
  //     entirely. The sidecar only ever decides the SKIP; any possible
  //     hit falls through to the exact anti-join, so false positives
  //     cost a scan, never correctness.

  private def sidecarPath(path: String): String = path.stripSuffix("/") + "_bloom"

  /** Fingerprint of the store's CURRENT file listing (names + lengths,
    * md5). Written into the sidecar at build time and re-checked before
    * the skip guard trusts it: an append that didn't refresh the
    * sidecar (sidecar=false), or any out-of-band store rewrite, changes
    * the listing and voids the sidecar — the guard then falls back to
    * the exact anti-join instead of risking a bloom false NEGATIVE
    * (a skipped scan that lets duplicates through).
    */
  private def storeListing(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else relDataFiles(fs, p).map { case (sub, f) =>
      (if (sub.isEmpty) f.getPath.getName else s"$sub/${f.getPath.getName}", f.getLen)
    }
  }

  private def fingerprintOf(entries: Seq[(String, Long)]): String =
    if (entries.isEmpty) ""
    else java.security.MessageDigest.getInstance("MD5")
      .digest(entries.map { case (n, l) => s"$n:$l" }.sorted.mkString("\n")
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def storeFingerprint(spark: SparkSession, path: String): String =
    fingerprintOf(storeListing(spark, path))

  /** One combined key per store row (stores may hold composite-key
    * digests as several `__k_*` columns).
    */
  // CANONICAL column order (sorted by name): the combined key feeds
  // bloom positions and the partition prefix, and the store's appender
  // and a later reader may pass composite keyCols in different orders —
  // a caller-order key would then probe the wrong bloom bits / prune
  // the wrong partitions and let real duplicates through silently.
  // (The anti-join itself joins BY NAME and never cared about order.)
  private def storeRowKey(cols: Seq[String]): Column =
    concat_ws("", cols.sorted.map(col): _*)

  // ---- prefix-partitioned layout ----
  //
  // A FLAT digest store is re-scanned in full by every batch's
  // anti-join: at 10^9+ digests (the 100 TB corpus shape) each ingest
  // batch pays an O(store) scan + exchange, and the whole-store bloom
  // sidecar stops helping past ~10^6 digests (the 2^24 plan-literal
  // cap). The PREFIX-PARTITIONED layout fixes both bounds at once:
  // rows land in hive partitions `__kp=p<hex>` keyed by the first
  // `prefixLen` hex chars of the (combined) digest — a uniform 16^len
  // way split, since sha-256 output is uniform — and
  //   - [[dedupAgainstStore]] prunes the store side to the batch's
  //     TOUCHED prefixes with a static `__kp IN (...)` partition
  //     filter: per-batch cost is O(batch + touched-partition bytes),
  //     never O(store);
  //   - the sidecar becomes PER-PREFIX (one bit array per partition,
  //     shipped to the guard as a broadcast relation, not a plan
  //     literal — the 2^24 cap no longer applies to the store, only
  //     to each prefix), and the skip decision is per-prefix: a clean
  //     batch skips every prefix independently, so capacity scales to
  //     16^len × the flat capacity and a single collision no longer
  //     forces a whole-store scan — only that prefix's partition.
  //
  // The partition value carries a literal 'p' ("p1f", not "1f") so
  // Spark's partition-type inference can never read an all-digit
  // prefix as an integer and fold "07" into 7 — a silent value rewrite
  // that would break `IN`-pruning and let real duplicates through.

  /** Sentinel for [[appendDigestStore]]'s `prefixLen`: adopt the
    * store's existing layout (flat for a new store).
    */
  val AutoPrefixLen: Int = -1

  /** Largest accepted digest-prefix length (16^3 = 4096 partitions —
    * past that the per-partition files are too small to be worth
    * listing; at 10^10 digests prefer wider per-prefix sidecars over
    * deeper prefixes).
    */
  val MaxPrefixLen: Int = 3

  // sha-256 hex is uniform, so substring(1, len) splits the store
  // 16^len ways evenly; each key column is a FIXED-WIDTH 64-hex-char
  // sha-256 digest, so the combined key's first len ≤ 3 chars always
  // belong to the (name-sorted) first column's digest and never cross
  // a column boundary. Caveats a future edit must keep: (a) shortening
  // the stored digests below MaxPrefixLen chars breaks this; (b)
  // concat_ws SKIPS null columns, so an all-null composite key yields
  // the empty prefix — partition value "p" (handled everywhere as a
  // normal prefix; see digestStoreLayout's marker rationale)
  private def prefixOf(storeKeyCols: Seq[String], prefixLen: Int): Column =
    concat(lit("p"), substring(storeRowKey(storeKeyCols), 1, prefixLen))

  /** The store's layout: None = store absent/empty, Some(0) = flat,
    * Some(n) = prefix-partitioned with n-hex-char prefixes. A
    * partitioned store carries an explicit `_layout` marker (written at
    * creation, re-staged through compaction swaps) so the layout
    * survives states the directory shape can't answer — a retention
    * compaction that dropped every row, or a store whose only written
    * prefix is the null-key `__kp=p` (empty prefix — the dir-shape
    * fallback takes the MAX prefix length across dirs for the same
    * reason). Flat stores have no marker (pre-marker back-compat).
    */
  private[graft] def digestStoreLayout(spark: SparkSession, path: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else graft.util.AtomicFiles.readLong(fs, layoutMarkerPath(path)) match {
      case Some(pl) if pl >= 1 && pl <= MaxPrefixLen => Some(pl.toInt)
      case _ =>
        val entries = fs.listStatus(p).toSeq
        val parts = entries.filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("__kp=p"))
        if (parts.nonEmpty) {
          // the bare null-key dir `__kp=p` (empty prefix — concat_ws
          // skips null key columns) says "partitioned" but nothing
          // about the length: EXCLUDE it from inference, or a legacy
          // marker-less store whose only rows are null-keyed would
          // read as an impossible pl=0 layout
          val lens = parts.map(_.getPath.getName.stripPrefix("__kp=p").length)
            .filter(_ > 0)
          if (lens.isEmpty) Some(1) // only null-key rows on disk: any
            // length places them identically; adopt the minimal one
          else {
            val pl = lens.max
            // a stray/corrupt dir (say __kp=pdeadbeef) must not be
            // ADOPTED as the layout — appends would compute impossible
            // prefixes while the real data sits under shorter ones,
            // silently splitting the store. Fail loudly instead.
            require(pl <= MaxPrefixLen,
              s"digest store at $path: partition dirs imply prefixLen=$pl, " +
                s"outside [1, $MaxPrefixLen] — corrupt or foreign __kp= " +
                "directories; refusing to adopt an impossible layout")
            Some(pl)
          }
        } else if (entries.exists(s => s.isFile && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))) Some(0)
        else None
    }
  }

  private def layoutMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(s"${path.stripSuffix("/")}/_layout")

  private def writeLayoutMarker(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, pl: Int): Unit = {
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) {
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir)); ()
    }
    graft.util.AtomicFiles.writeLong(fs,
      new org.apache.hadoop.fs.Path(s"${dir.stripSuffix("/")}/_layout"), pl.toLong)
  }

  /** Data files of the store (or a staging dir) with their partition
    * subdir: ("", file) for flat rows, ("__kp=pXX", file) for
    * partitioned ones. Dot/underscore names are write-protocol
    * artifacts, never data — EXCEPT `__kp=` partition dirs, which the
    * flat filter would otherwise drop.
    */
  private def relDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[(String, org.apache.hadoop.fs.FileStatus)] =
    fs.listStatus(dir).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (s.isDirectory && n.startsWith("__kp="))
        fs.listStatus(s.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith(".") &&
            !f.getPath.getName.startsWith("_"))
          .map(f => (n, f))
      else if (s.isFile && !n.startsWith(".") && !n.startsWith("_")) Seq(("", s))
      else Nil
    }

  /** k-hash bloom membership test against `bitset` (an array<long>
    * column or literal) — the ONE definition of the probe arithmetic,
    * shared by every skip guard and rate measurement so a fix to the
    * indexing can never desynchronize them. NULL bitset (a prefix the
    * store has never seen, under a fingerprint-validated sidecar) tests
    * null → callers coalesce to false = provably clean.
    */
  private def bloomMightHit(bitset: Column, storeKeyCols: Seq[String],
      bits: Int, k: Int): Column = {
    def bitTest(p: Column): Column =
      call_function("shiftright",
        element_at(bitset, (p / 64).cast("int") + 1), pmod(p, lit(64)).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    (1 to k).map(h => bitTest(bloomPos(h, storeRowKey(storeKeyCols), bits)))
      .reduce(_ && _)
  }

  /** Per-prefix sidecar words as a broadcast relation (never a plan
    * literal — no size cap ties to the plan).
    */
  private def prefixSidecarDf(spark: SparkSession,
      byPrefix: Map[String, Array[Long]]): DataFrame = {
    import spark.implicits._
    broadcast(byPrefix.toSeq.map { case (pfx, w) => (pfx, w.toSeq) }
      .toDF("__kp", "__words"))
  }

  private def bloomPos(h: Int, key: Column, bits: Int): Column =
    conv(substring(md5(concat(lit(s"dsb$h:"), key)), 1, 8), 16, 10)
      .cast("long") % bits

  /** Default bits and hash count of the sidecar — 2^19 bits = 64 KB
    * of words; at 100k store digests and k=3 that is a ~8%
    * false-skip-miss rate, which only costs the occasional avoidable
    * scan. Bigger stores pass `sidecarBits` (~5 bits per expected
    * digest); the cap below bounds the broadcast literal the skip
    * guard ships with the plan.
    */
  val SidecarBits: Int = 1 << 19
  val SidecarK: Int = 3

  /** Largest sidecar accepted: 2^24 bits = 2 MB of words — still a
    * sane plan-embedded literal, good to ~3M digests at k=3.
    */
  val MaxSidecarBits: Int = 1 << 24

  private def requireSidecarBits(bits: Int): Unit =
    require(bits >= (1 << 10) && bits <= MaxSidecarBits && bits % 64 == 0,
      s"sidecarBits must be in [2^10, 2^24] and a multiple of 64; got $bits")

  /** Rebuild the sidecar from the full store (run at compaction; also
    * the fallback when no sidecar exists yet) — per-prefix bit arrays
    * for a partitioned store, one global array for a flat one. `bits`
    * sizes the new sidecar (EACH prefix's array when partitioned).
    */
  def rebuildDigestSidecar(spark: SparkSession, path: String,
      bits: Int = SidecarBits): Unit = {
    requireSidecarBits(bits)
    // listing BEFORE the scan: the fingerprint must cover at most the
    // files the rebuild read (a post-scan listing could include a
    // racer's files the bits don't) — a file landing between listing
    // and scan only widens the bits, never the claimed coverage
    val listing = storeListing(spark, path)
    if (listing.isEmpty) {
      // a data-less store (retention dropped every row) has no schema
      // to scan and nothing to summarize — drop any stale sidecar so
      // readers fall back to the (trivially empty) exact path. MUST not
      // throw: compaction calls this AFTER its swap committed.
      val sp = new org.apache.hadoop.fs.Path(sidecarPath(path))
      val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(sp)) { fs.delete(sp, true); () }
      return
    }
    val store = spark.read.parquet(path)
    val keyCols = store.columns.filter(_.startsWith("__k_")).toSeq
    if (digestStoreLayout(spark, path).exists(_ > 0)) {
      // DISTRIBUTED word fold (bit_or per (prefix, word)), so the
      // driver collect is bounded by the sidecar's own size
      // (≤ prefixes × bits/64 rows), never the store's digest count —
      // the flat path's distinct-positions collect would be O(store×k)
      // here before saturation
      val byPrefix = foldWordRows(prefixWordAgg(store, keyCols, bits), bits)
      writePrefixSidecar(spark, path, bits, byPrefix, fingerprintOf(listing))
    } else {
      val pos = store
        .select(explode(array((1 to SidecarK).map(h =>
          bloomPos(h, storeRowKey(keyCols), bits)): _*)).as("p"))
        .distinct().collect().map(_.getLong(0))
      val words = new Array[Long](bits / 64)
      pos.foreach(p => words(p.toInt / 64) |= (1L << (p.toInt % 64)))
      writeSidecar(spark, path, bits, words, fingerprintOf(listing))
    }
  }

  /** Per-(prefix, word-index) OR-folded sidecar words of `digests`
    * (which must carry `__kp`) — the distributed construction both the
    * partitioned rebuild and the partitioned incremental merge share.
    * Output rows ≤ min(digests × k, prefixes × bits/64).
    */
  private def prefixWordAgg(digests: DataFrame, keyCols: Seq[String],
      bits: Int): Array[org.apache.spark.sql.Row] =
    digests
      .select(col("__kp"), explode(array((1 to SidecarK).map(h =>
        bloomPos(h, storeRowKey(keyCols), bits)): _*)).as("p"))
      .select(col("__kp"), (col("p") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(64)).cast("int")).as("b"))
      .groupBy("__kp", "w").agg(expr("bit_or(b)").as("word"))
      .collect()

  private def foldWordRows(rows: Array[org.apache.spark.sql.Row],
      bits: Int): Seq[(String, Array[Long])] =
    rows.groupBy(_.getString(0)).map { case (pfx, rs) =>
      val words = new Array[Long](bits / 64)
      rs.foreach(r => words(r.getInt(1)) |= r.getLong(2))
      pfx -> words
    }.toSeq.sortBy(_._1)

  /** Fold a batch's digests into the existing sidecar — blooms merge
    * by OR, so the append path touches only the BATCH (one position
    * job + a 64 KB read-modify-write), never the store. The merge is
    * only sound when the old sidecar covered the store AS IT WAS
    * BEFORE this batch's append (`preAppendFp`, captured by the caller
    * before it wrote the store) — otherwise some earlier un-sidecarred
    * append would stay unrepresented and the skip guard could skip a
    * real collision. Stale / absent / differently-sized sidecar →
    * rebuild from the full store once.
    */
  private def updateDigestSidecar(spark: SparkSession, path: String,
      batchDigests: DataFrame, preAppendFp: String, postAppendFp: String,
      wantBits: Int = SidecarBits): Unit = {
    requireSidecarBits(wantBits)
    readSidecarRaw(spark, path) match {
      case Some((bits, k, words, Some(fp)))
          if bits == wantBits && k == SidecarK && fp == preAppendFp =>
        val keyCols = batchDigests.columns.filter(_.startsWith("__k_")).toSeq
        val pos = batchDigests
          .select(explode(array((1 to k).map(h =>
            bloomPos(h, storeRowKey(keyCols), bits)): _*)).as("p"))
          .distinct().collect().map(_.getLong(0))
        pos.foreach(p => words(p.toInt / 64) |= (1L << (p.toInt % 64)))
        // record the CALLER-CONSTRUCTED post-append fingerprint (pre
        // listing + this append's files), never a fresh live listing —
        // see the appendDigestStore race note
        writeSidecar(spark, path, bits, words, postAppendFp)
      case _ => rebuildDigestSidecar(spark, path, wantBits)
    }
  }

  /** [[updateDigestSidecar]] for the prefix-partitioned layout: the
    * batch's digests (carrying `__kp`) OR into their prefixes' bit
    * arrays; prefixes the store has never seen get fresh arrays. Same
    * `preAppendFp` soundness contract; same rebuild-once fallback.
    */
  private def updatePrefixSidecar(spark: SparkSession, path: String,
      batchDigests: DataFrame, preAppendFp: String, postAppendFp: String,
      wantBits: Int = SidecarBits): Unit = {
    requireSidecarBits(wantBits)
    readPrefixSidecarRaw(spark, path) match {
      case Some((bits, k, byPrefix, Some(fp)))
          if bits == wantBits && k == SidecarK && fp == preAppendFp =>
        val keyCols = batchDigests.columns.filter(_.startsWith("__k_")).toSeq
        val merged = scala.collection.mutable.Map[String, Array[Long]]() ++ byPrefix
        prefixWordAgg(batchDigests, keyCols, bits).foreach { r =>
          val words = merged.getOrElseUpdate(r.getString(0), new Array[Long](bits / 64))
          words(r.getInt(1)) |= r.getLong(2)
        }
        writePrefixSidecar(spark, path, bits, merged.toSeq.sortBy(_._1), postAppendFp)
      case _ => rebuildDigestSidecar(spark, path, wantBits)
    }
  }

  // The sidecar records the store fingerprint it was built against
  // (post-write state — callers write the store first, then the
  // sidecar), so a reader can prove the sidecar still describes the
  // store before trusting a skip decision. The fingerprint is the
  // CALLER's statement of which file set the bits cover (the rebuild
  // passes the listing it read; the incremental merge constructs
  // pre + appended) — under any race it can only mismatch the live
  // listing, which reads as "stale" and falls back to the exact path.

  /** Bit-position derivation version stamped into every sidecar. The
    * fingerprint only proves the bits cover the store's FILES — it says
    * nothing about HOW key columns fed the hash. When [[storeRowKey]]
    * canonicalized to name-sorted column order, every composite-key
    * sidecar written under caller order became silently wrong (its bits
    * sit at caller-order positions; a sorted-order probe reads
    * near-random bits, tests negative for digests that ARE stored, and
    * the guard would falsely skip the anti-join — admitted duplicates).
    * Readers treat a sidecar whose `key_order` is absent or different
    * as stale → one rebuild, never a wrong skip.
    */
  private val SidecarKeyOrder: String = "name-sorted"

  private def writeSidecar(spark: SparkSession, path: String, bits: Int,
      words: Array[Long], fp: String): Unit = {
    import spark.implicits._
    Seq((bits, SidecarK, words.toSeq, fp, SidecarKeyOrder))
      .toDF("bits", "k", "words", "store_fp", "key_order")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(sidecarPath(path))
  }

  /** A partitioned store's sidecar: one row PER PREFIX, each carrying
    * the shared (bits, k, store_fp) header. Same file as the flat
    * sidecar; the `prefix` column is what distinguishes the two
    * schemas, and each reader rejects the other's (a flat reader
    * treating one prefix's words as the whole store would
    * false-negative-skip real collisions).
    */
  private def writePrefixSidecar(spark: SparkSession, path: String, bits: Int,
      byPrefix: Seq[(String, Array[Long])], fp: String): Unit = {
    import spark.implicits._
    byPrefix.map { case (pfx, words) =>
        (bits, SidecarK, words.toSeq, fp, pfx, SidecarKeyOrder) }
      .toDF("bits", "k", "words", "store_fp", "prefix", "key_order")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(sidecarPath(path))
  }

  /** Sidecar as stored, fingerprint included, no validation. Pre-upgrade
    * sidecars (no `store_fp` column, or a `key_order` other than the
    * current [[SidecarKeyOrder]] — bits at positions today's probe
    * would not read) read as fp = None, which every consumer treats as
    * stale; a PARTITIONED store's sidecar (has `prefix`) reads as
    * None — it is not a whole-store bit array.
    */
  private def readSidecarRaw(spark: SparkSession,
      path: String): Option[(Int, Int, Array[Long], Option[String])] = {
    val p = new org.apache.hadoop.fs.Path(sidecarPath(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val sc = spark.read.parquet(sidecarPath(path))
      if (sc.columns.contains("prefix")) None
      else {
        val r = sc.head()
        val fp =
          if (sc.columns.contains("store_fp") && sc.columns.contains("key_order") &&
            r.getAs[String]("key_order") == SidecarKeyOrder)
            Some(r.getAs[String]("store_fp"))
          else None
        Some((r.getAs[Int]("bits"), r.getAs[Int]("k"),
          r.getAs[scala.collection.Seq[Long]]("words").toArray, fp))
      }
    }
  }

  /** [[readSidecarRaw]] for the per-prefix schema; a flat sidecar (no
    * `prefix` column), a pre-[[SidecarKeyOrder]] sidecar, or any
    * (bits, k, fp, key_order) disagreement between rows reads as None.
    *
    * `onlyPrefixes` prunes the `words` read to those prefixes' rows —
    * the read-only guard path never needs the whole store's arrays on
    * the driver (at MaxPrefixLen=3 / wide bits that is ~GB scale). The
    * shared header is still validated across ALL rows, via a separate
    * tiny select that never deserializes the word arrays.
    */
  private def readPrefixSidecarRaw(spark: SparkSession, path: String,
      onlyPrefixes: Option[Seq[String]] = None)
      : Option[(Int, Int, Map[String, Array[Long]], Option[String])] = {
    val p = new org.apache.hadoop.fs.Path(sidecarPath(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val sc = spark.read.parquet(sidecarPath(path))
      if (!sc.columns.contains("prefix") || !sc.columns.contains("store_fp") ||
        !sc.columns.contains("key_order")) None
      else {
        val headers = sc.select("bits", "k", "store_fp", "key_order")
          .distinct().collect()
        if (headers.length != 1 ||
          headers.head.getAs[String]("key_order") != SidecarKeyOrder) None
        else {
          val bits = headers.head.getInt(0)
          val k = headers.head.getInt(1)
          val fp = headers.head.getString(2)
          val wordRows = onlyPrefixes
            .fold(sc.select("prefix", "words"))(pfxs =>
              sc.filter(col("prefix").isin(pfxs: _*)).select("prefix", "words"))
            .collect()
          Some((bits, k,
            wordRows.map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap,
            Option(fp)))
        }
      }
    }
  }

  /** Per-prefix sidecar ONLY when it provably matches the store's
    * current contents (same fingerprint contract as [[readSidecar]]).
    * `onlyPrefixes` as in [[readPrefixSidecarRaw]] — the validation
    * still covers the WHOLE sidecar's header + the store's fingerprint,
    * only the word arrays are pruned.
    */
  private def readPrefixSidecar(spark: SparkSession, path: String,
      onlyPrefixes: Option[Seq[String]] = None)
      : Option[(Int, Int, Map[String, Array[Long]])] =
    readPrefixSidecarRaw(spark, path, onlyPrefixes) match {
      case Some((bits, k, byPrefix, Some(fp))) if fp == storeFingerprint(spark, path) =>
        Some((bits, k, byPrefix))
      case _ => None
    }

  /** Returns the sidecar ONLY when it provably matches the store's
    * current contents: the recorded fingerprint must equal the store's
    * live listing (pre-upgrade sidecars without one are treated as
    * stale). Any mismatch → None → callers rebuild or fall back to the
    * exact path.
    */
  private def readSidecar(spark: SparkSession, path: String): Option[(Int, Int, Array[Long])] =
    readSidecarRaw(spark, path) match {
      case Some((bits, k, words, Some(fp))) if fp == storeFingerprint(spark, path) =>
        Some((bits, k, words))
      case _ => None
    }

  /** Compact the digest store: one row per digest (LAST batch tag
    * wins), split-sized files, staged write + atomic swap, sidecar
    * rebuilt. `retainMinTag` drops digests whose last sighting is
    * older than the retention horizon — the rolling-window dedup
    * contract ("a duplicate of something ingested > N days ago is
    * allowed back in"), which is what keeps the store bounded over an
    * unbounded ingest history.
    */
  def compactDigestStore(spark: SparkSession, path: String,
      retainMinTag: Option[Long] = None): Unit = {
    // backup-then-swap commits by directory rename (below)
    graft.util.FsContract.requireAtomicRename(spark, path,
      "digest store compaction (backup-then-swap renames)")
    val store = spark.read.parquet(path)
    val keyCols = store.columns.filter(_.startsWith("__k_")).toSeq
    val tagged =
      if (store.columns.contains("__batch_tag")) store
      else store.withColumn("__batch_tag", lit(0L))
    val folded = tagged
      .groupBy(keyCols.map(col): _*)
      .agg(max("__batch_tag").as("__batch_tag"))
    val kept = retainMinTag.fold(folded)(t => folded.filter(col("__batch_tag") >= t))
    val staging = path.stripSuffix("/") + s".staging-${java.util.UUID.randomUUID()}"
    // layout-preserving: a partitioned store compacts to ~one file per
    // prefix (the fold dropped the partition column, so re-derive it);
    // a flat one to a single file
    val layoutPl = digestStoreLayout(spark, path).getOrElse(0)
    if (layoutPl > 0) {
      kept.withColumn("__kp", prefixOf(keyCols, layoutPl))
        .repartition(col("__kp"))
        .write.partitionBy("__kp")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staging)
      // the marker rides the swap so the layout survives even a
      // retention pass that dropped every row (a zero-row partitioned
      // write leaves no partition dirs to detect from)
      writeLayoutMarker(new org.apache.hadoop.fs.Path(staging)
        .getFileSystem(spark.sparkContext.hadoopConfiguration), staging, layoutPl)
    } else {
      kept.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staging)
    }
    backupThenSwap(spark, path, staging, "digest store compact")
    // rebuild at the size the operator chose for this store (the
    // pre-compaction sidecar's, whichever schema), defaulting for
    // stores that had none
    rebuildDigestSidecar(spark, path, storedSidecarBits(spark, path))
  }

  /** The store's configured sidecar size (either schema's header),
    * defaulting for stores that have none. Only the header's `bits` is
    * read — the words read is pruned to zero prefixes rather than
    * collecting every bit array.
    */
  private def storedSidecarBits(spark: SparkSession, path: String): Int =
    readSidecarRaw(spark, path).map(_._1)
      .orElse(readPrefixSidecarRaw(spark, path, Some(Nil)).map(_._1))
      .getOrElse(SidecarBits)

  // Backup-then-swap (same protocol as ParquetStorage.compactDelta):
  // the live store is renamed aside BEFORE the staging rename lands,
  // so no crash point loses both copies — a delete-then-rename window
  // would leave NO store at all (and readers a missing path) if the
  // process died between the two. Backup is dropped only after the
  // new store is verifiably in place.
  private def backupThenSwap(spark: SparkSession, path: String,
      staging: String, what: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def renameOrThrow(src: String, dst: String): Unit =
      if (!fs.rename(new org.apache.hadoop.fs.Path(src), new org.apache.hadoop.fs.Path(dst)))
        throw new java.io.IOException(s"$what: rename failed: $src -> $dst")
    val backup = path.stripSuffix("/") + s".backup-${java.util.UUID.randomUUID()}"
    renameOrThrow(path, backup)
    renameOrThrow(staging, path)
    if (!fs.delete(new org.apache.hadoop.fs.Path(backup), true))
      throw new java.io.IOException(s"$what: backup cleanup failed: $backup")
  }

  /** One-call layout migration — rewrite the store at `prefixLen`
    * (1..MaxPrefixLen), typically FLAT → PREFIX-PARTITIONED once a
    * store outgrows the flat tier (~10^6 digests, where the whole-store
    * sidecar saturates and every batch's anti-join pays an O(store)
    * scan). Layouts never mix within a store, so growth past the flat
    * ceiling requires exactly this rewrite; deepening an already-
    * partitioned store (len 1 → 2) is the same operation. Idempotent
    * when the store is already at `prefixLen`.
    *
    * One distributed job (same fold as [[compactDigestStore]] — the
    * rewrite deduplicates to one row per digest, keeping the newest
    * batch tag), staged invisibly with the `_layout` marker riding the
    * staging dir, committed by the same backup-then-swap renames, and
    * the sidecar rebuilt per-prefix via the distributed word fold at
    * the size the store had configured. A crash before the swap leaves
    * the flat store untouched (staging is garbage); after it, the
    * partitioned store is complete including its marker.
    */
  def migrateDigestStore(spark: SparkSession, path: String, prefixLen: Int): Unit = {
    require(prefixLen >= 1 && prefixLen <= MaxPrefixLen,
      s"migration target prefixLen must be in [1, $MaxPrefixLen]; got $prefixLen " +
        "(a partitioned store cannot migrate BACK to flat — the flat tier is " +
        "strictly less capable)")
    graft.util.FsContract.requireAtomicRename(spark, path,
      "digest store migration (backup-then-swap renames)")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    digestStoreLayout(spark, path) match {
      case None =>
        // absent/empty store: adopt the layout by marker alone — the
        // next append lands partitioned
        writeLayoutMarker(fs, path, prefixLen)
        return
      case Some(pl) if pl == prefixLen => return // idempotent
      case Some(_) => () // flat (0) or different depth: rewrite below
    }
    // capture the configured sidecar size BEFORE the swap destroys the
    // old sidecar's context
    val keepBits = storedSidecarBits(spark, path)
    val store = spark.read.parquet(path)
    val keyCols = store.columns.filter(_.startsWith("__k_")).toSeq
    val tagged =
      if (store.columns.contains("__batch_tag")) store
      else store.withColumn("__batch_tag", lit(0L))
    val folded = tagged
      .groupBy(keyCols.map(col): _*)
      .agg(max("__batch_tag").as("__batch_tag"))
    val staging = path.stripSuffix("/") + s".staging-${java.util.UUID.randomUUID()}"
    folded.withColumn("__kp", prefixOf(keyCols, prefixLen))
      .repartition(col("__kp"))
      .write.partitionBy("__kp")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staging)
    // marker rides the swap: the committed store is partitioned from
    // its first visible instant, whatever its directory shape says
    writeLayoutMarker(fs, staging, prefixLen)
    backupThenSwap(spark, path, staging, "digest store migration")
    rebuildDigestSidecar(spark, path, keepBits)
  }

  /** Survivors of a NEW batch against the persisted digest store:
    * first occurrence per digest inside the batch (min id — the
    * [[exactSurvivorIds]] rule), then an ANTI-join against the store
    * drops everything already ingested in any earlier batch. Two
    * digest-keyed shuffles, nothing corpus-sized; at 1000 executors
    * the store side is a plain parquet scan of 64-byte rows. Output:
    * the surviving ids.
    *
    * `useSidecar = true` consults the bloom sidecar first: the batch's
    * digests are tested against the broadcast bit array (one job over
    * the BATCH — never the store), and when nothing can collide the
    * returned plan contains NO store scan at all. The result is
    * identical either way — the sidecar decides only whether the
    * anti-join is provably unnecessary.
    *
    * Against a PREFIX-PARTITIONED store the anti-join's store side is
    * ALWAYS pruned to the batch's touched prefixes (a static
    * `__kp IN (...)` partition filter — per-batch cost O(batch +
    * touched-partition bytes), never O(store)), and the sidecar guard
    * upgrades from whole-batch to PER-PREFIX: each prefix the bit
    * arrays rule out drops from the scan list independently (a prefix
    * with no sidecar row holds no store digests at all — the validated
    * fingerprint covers the whole store), so one collision costs one
    * partition's scan, not the store's. The guard's bit arrays ride a
    * broadcast relation, not a plan literal — no 2^24 cap on the
    * store's total sidecar. Guard + prefix discovery run two
    * batch-sized driver jobs at plan-construction time.
    */
  def dedupAgainstStore(newBatch: DataFrame, keyCols: Seq[String], idCol: String,
      path: String, useSidecar: Boolean = false): DataFrame = {
    val spark = newBatch.sparkSession
    val digests = keyCols.map(c => sha2(col(c).cast("string"), 256).as(s"__k_$c"))
    val storeKeyCols = keyCols.map(c => s"__k_$c")
    val inBatch = newBatch.select((digests :+ col(idCol)): _*)
      .groupBy(storeKeyCols.map(col): _*)
      .agg(min(idCol).as(idCol))
    digestStoreLayout(spark, path) match {
      // a marker-preserving retention compaction can leave a layout
      // with ZERO data files — nothing can collide, and a parquet read
      // would fail schema inference
      case Some(pl) if pl > 0 && storeListing(spark, path).isEmpty =>
        inBatch.select(idCol)
      case Some(pl) if pl > 0 =>
        val batchP = inBatch.withColumn("__kp", prefixOf(storeKeyCols, pl))
        val touched = batchP.select("__kp").distinct()
          .collect().map(_.getString(0)).toSeq.sorted
        val scanPrefixes: Seq[String] =
          if (!useSidecar) touched
          // read (and collect to the driver) only the TOUCHED prefixes'
          // bit arrays — the guard's driver footprint and broadcast are
          // O(batch's prefixes × bits/8), not O(store's prefix count):
          // at 4096 wide-bit prefixes the full sidecar is ~GB scale,
          // which a small batch must never pay at plan construction
          else readPrefixSidecar(spark, path, Some(touched)) match {
            case None => touched
            case Some((bits, k, byPrefix)) =>
              // null __words (prefix absent from the store) → null
              // tests → coalesce(false): provably clean, skipped
              val mightHit = coalesce(
                bloomMightHit(col("__words"), storeKeyCols, bits, k), lit(false))
              batchP.join(prefixSidecarDf(spark, byPrefix), Seq("__kp"), "left")
                .filter(mightHit).select("__kp").distinct()
                .collect().map(_.getString(0)).toSeq.sorted
          }
        if (scanPrefixes.isEmpty) inBatch.select(idCol)
        else batchP
          .join(spark.read.parquet(path)
              .filter(col("__kp").isin(scanPrefixes: _*))
              .select(storeKeyCols.map(col): _*),
            storeKeyCols, "left_anti")
          .select(idCol)
      case _ =>
        val skip = useSidecar && readSidecar(spark, path).exists { case (bits, k, words) =>
          inBatch.filter(bloomMightHit(lit(words), storeKeyCols, bits, k))
            .limit(1).isEmpty
        }
        if (skip) inBatch.select(idCol)
        else inBatch
          .join(spark.read.parquet(path).select(storeKeyCols.map(col): _*),
            storeKeyCols, "left_anti")
          .select(idCol)
    }
  }

  /** Observability for the sidecar skip guard: the fraction of the
    * batch's distinct digests the bloom sidecar cannot rule out
    * (None = no trustworthy sidecar). 0.0 means the whole anti-join is
    * skippable; as the store grows past the sidecar's capacity
    * (~2^19 bits / k=3 → useful to ~10^5 digests) the rate saturates
    * toward 1.0 and the guard degrades gracefully to always-scan —
    * this is the number an operator watches to size the sidecar.
    */
  def sidecarMightHitRate(newBatch: DataFrame, keyCols: Seq[String],
      path: String): Option[Double] = {
    val spark = newBatch.sparkSession
    val storeKeyCols = keyCols.map(c => s"__k_$c")
    val inBatch = newBatch
      .select(keyCols.map(c => sha2(col(c).cast("string"), 256).as(s"__k_$c")): _*)
      .distinct()
    def rateOf(tested: DataFrame, mightHit: Column): Double = {
      val agg = tested.select(
        count(lit(1)).as("n"),
        sum(when(mightHit, 1L).otherwise(0L)).as("h")).head()
      if (agg.getLong(0) == 0L) 0.0 else agg.getLong(1).toDouble / agg.getLong(0)
    }
    digestStoreLayout(spark, path) match {
      case Some(pl) if pl > 0 =>
        val batchP = inBatch.withColumn("__kp", prefixOf(storeKeyCols, pl))
        // same touched-prefix pruning as the dedupAgainstStore guard:
        // the rate only tests the batch's own prefixes
        val touched = batchP.select("__kp").distinct()
          .collect().map(_.getString(0)).toSeq.sorted
        readPrefixSidecar(spark, path, Some(touched)).map { case (bits, k, byPrefix) =>
          val mightHit = coalesce(
            bloomMightHit(col("__words"), storeKeyCols, bits, k), lit(false))
          rateOf(batchP.join(prefixSidecarDf(spark, byPrefix), Seq("__kp"), "left"),
            mightHit)
        }
      case _ =>
        readSidecar(spark, path).map { case (bits, k, words) =>
          rateOf(inBatch, bloomMightHit(lit(words), storeKeyCols, bits, k))
        }
    }
  }

  /** The attribution side of exact dedup: every DROPPED row mapped to
    * the survivor it duplicates — the output lineage/debugging tables
    * and "redirect to canonical" serving paths need (exactSurvivorIds
    * alone answers "who stays", not "who replaced whom"). Same digest
    * shuffle as the survivor pass plus one digest equi-join back; rows
    * that survive do not appear. Output: (idCol, survivor_id).
    */
  def attributionMap(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val digests = keyCols.map(c => sha2(col(c).cast("string"), 256).as(s"__k_$c"))
    val keyed = df.select((digests :+ col(idCol)): _*)
    val surv = keyed.groupBy(keyCols.map(c => col(s"__k_$c")): _*)
      .agg(min(idCol).as("survivor_id"))
    keyed.join(surv, keyCols.map(c => s"__k_$c"))
      .filter(col(idCol) =!= col("survivor_id"))
      .select(col(idCol), col("survivor_id"))
  }

  /** Block-level (span) exact dedup — the fine-grained tier between
    * whole-document dedup and n-gram near-dup: cut each doc into
    * consecutive disjoint `blockLen`-token blocks ([[Curation.
    * slidingChunks]] with stride = size) and keep, per distinct block
    * TEXT, only its first occurrence in corpus order (min doc id, then
    * min block position). Returns one row per doc: total blocks and
    * blocks kept — the "how much of this doc is novel" signal used to
    * drop boilerplate-heavy docs (RefinedWeb-style line/span dedup).
    *
    * Scale shape: block identity travels as its md5 (32 bytes), never
    * the text; first-occurrence is a map-side-combinable `min(struct)`
    * groupBy on the digest + a digest equi-join back — two shuffles of
    * digests, linear in corpus size, no window over the full corpus.
    */
  def blockDedupStats(df: DataFrame, idCol: String, textCol: String,
      blockLen: Int): DataFrame = {
    val blocks = Curation.slidingChunks(spread(df), idCol, textCol,
      chunkSize = blockLen, stride = blockLen)
      .select(col(idCol), col("chunk_id"), col("chunk_md5"))
    val firsts = blocks
      .groupBy("chunk_md5")
      .agg(min(struct(col(idCol), col("chunk_id"))).as("__first"))
    blocks.join(firsts, "chunk_md5")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_blocks"),
        sum((struct(col(idCol), col("chunk_id")) === col("__first")).cast("long"))
          .as("n_kept"))
  }

  /** EXACT repeated-span EXCISION — the substring-level dedup of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better"), token-granular: every position where an
    * `spanLen`-token window's contents occur MORE THAN ONCE in the
    * corpus (any doc, including the same one) is marked duplicated,
    * and the cleaned text drops every marked token — so boilerplate,
    * quoted reposts and template spans are cut OUT of documents
    * instead of whole near-dup documents being dropped (the
    * complement of [[blockDedupStats]], which keeps block statistics,
    * and of the doc-level MinHash tier).
    *
    * Spark-first shape (the scalable stand-in for a suffix array,
    * which does not distribute): one windowed-gram explode, a
    * frequency count over gram DIGESTS (md5 — 32 bytes on the
    * shuffle, never the span text; the count is map-side combinable),
    * a digest equi-join back to the occurrences, and one per-doc
    * fold. Everything is set logic + integer positions — replayable
    * exactly by any md5-capable engine. Output: (id, n_tokens,
    * n_dup_tokens, cleaned_text) with cleaned_text the space-joined
    * surviving tokens in original order.
    */
  def exciseRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      spanLen: Int): DataFrame = {
    require(spanLen >= 1, "spanLen >= 1")
    val grams = spanGrams(spread(df), idCol, textCol, spanLen)
    val repeated = grams.groupBy("d")
      .agg(count(lit(1)).as("occ")).filter(col("occ") >= 2).select("d")
    exciseByDigests(spread(df), idCol, textCol, spanLen, grams, repeated)
  }

  /** CROSS-CORPUS span excision — decontamination at SPAN granularity:
    * cut from every training document each position covered by a
    * `spanLen`-token window whose contents appear ANYWHERE in
    * `evalDf`'s text column. Where q88/q104 FLAG contaminated docs,
    * this SALVAGES them: the quoted benchmark passage is removed, the
    * rest of the document survives into the training set. Same
    * digest-only shuffle contract as [[exciseRepeatedSpans]]; the
    * eval digest set is distinct-bounded (eval corpora are small, so
    * Catalyst broadcasts the join side). Output shape:
    * (id, n_tokens, n_dup_tokens, cleaned_text).
    */
  def exciseContaminatedSpans(df: DataFrame, idCol: String, textCol: String,
      evalDf: DataFrame, evalTextCol: String, spanLen: Int): DataFrame = {
    require(spanLen >= 1, "spanLen >= 1")
    val grams = spanGrams(spread(df), idCol, textCol, spanLen)
    val evalDigests = spanGrams(
      evalDf.select(lit(0L).as("__eid"), col(evalTextCol)), "__eid", evalTextCol, spanLen)
      .select("d").distinct()
    exciseByDigests(spread(df), idCol, textCol, spanLen, grams, evalDigests)
  }

  /** (id, p, digest) for every `spanLen`-token window start position
    * p of every doc — the shared candidate table of the excision
    * family. Digests, never span text, from here on.
    */
  private def spanGrams(src: DataFrame, idCol: String, textCol: String,
      spanLen: Int): DataFrame = {
    // null text = empty doc, not a poisoned row (split(null) is null
    // and size(null) = -1 would corrupt the token accounting)
    val w = filter(split(coalesce(col(textCol), lit("")), "\\s+"), t => t =!= "")
    src.select(col(idCol).as("id"),
        posexplode(when(size(w) >= spanLen,
          transform(sequence(lit(0), size(w) - spanLen),
            p => md5(concat_ws(" ", slice(w, p + 1, lit(spanLen))))))
          .otherwise(array().cast("array<string>"))))
      .select(col("id"), col("pos").as("p"), col("col").as("d"))
  }

  /** Cut every token position covered by a gram whose digest is in
    * `cutDigests`, and rebuild each doc's cleaned text in order.
    */
  private def exciseByDigests(src: DataFrame, idCol: String, textCol: String,
      spanLen: Int, grams: DataFrame, cutDigests: DataFrame): DataFrame = {
    val w = filter(split(coalesce(col(textCol), lit("")), "\\s+"), t => t =!= "")
    val covered = grams.join(cutDigests, "d")
      .select(col("id"), explode(sequence(col("p"), col("p") + (spanLen - 1))).as("tp"))
      .distinct()
    val cuts = covered.groupBy("id")
      .agg(sort_array(collect_set(col("tp"))).as("cut"))
    src.select(col(idCol).as("id"), w.as("w"))
      .join(cuts, Seq("id"), "left")
      .select(col("id"),
        size(col("w")).cast("long").as("n_tokens"),
        coalesce(size(col("cut")), lit(0)).cast("long").as("n_dup_tokens"),
        concat_ws(" ", filter(col("w"),
          (t, i) => !coalesce(array_contains(col("cut"), i), lit(false))))
          .as("cleaned_text"))
  }

  // ---- tokenization helpers ----

  /** Word n-gram shingles as a distinct array. Empty tokens are dropped
    * before shingling; documents with fewer than `n` words yield an
    * EMPTY array (standard n-gram semantics — no short spurious shingle).
    *
    * NOTE on the lambda's `slice(words, ...)`: a HOF lambda inlines its
    * operand subtree, so `words` (the regex split) re-evaluates once
    * per shingle — O(len·grams) tokenize per row. Two fixes were
    * measured: binding via a 1-element `transform(array(words), ...)`
    * let-trick REMOVED the re-splits but DOUBLED end-to-end wall on
    * the minhash/jaccard paths (nested-lambda plans cost more in
    * analysis/eval than the re-splits save at these document sizes);
    * binding via a projected column (the winnowFingerprints fix) needs
    * a DataFrame, not a Column. At ~50-word bench docs the re-split
    * tax is minor; for long-document corpora, project the token array
    * as a column first and shingle over that.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val words = filter(split(text, "\\s+"), w => w =!= "")
    if (n == 1) array_distinct(words)
    else
      when(size(words) < n, array().cast("array<string>"))
        .otherwise(array_distinct(
          transform(sequence(lit(0), size(words) - n),
            i => concat_ws(" ", slice(words, i + 1, lit(n))))))
  }

  /** Shared doc-frequency guard: drop posting rows whose `tokCol` value
    * appears in more than `maxDocFreq` docs — a token in d docs feeds
    * d² candidate pairs to the inverted-index join, so one corpus-wide
    * stopword/boilerplate token makes it quadratic. The hot-token list
    * is tiny by construction (only values above the cutoff), hence the
    * broadcast anti-join.
    */
  private def dropHotTokens(postings: DataFrame, tokCol: String, maxDocFreq: Option[Int]): DataFrame =
    maxDocFreq.fold(postings) { m =>
      val hot = postings.groupBy(tokCol).agg(count(lit(1)).as("df"))
        .filter(col("df") > m).select(tokCol)
      postings.join(broadcast(hot), Seq(tokCol), "left_anti")
    }

  /** Source-size bar above which a `maxDocFreq = None` caller pays one
    * measurement pass before the quadratic-risk join (var so tests can
    * force the path). Below it the plan stays job-free — a small corpus
    * cannot blow up enough to matter.
    */
  private[graft] var exactPostingWarnBytes: Long = 1L << 30

  /** One pricing aggregate over the postings: the largest document
    * frequency d (whose d² dominates an unguarded join) AND the exact
    * total join size Σ_tok df² — the F2 moment, free here because the
    * guard already pays the groupBy. (When even that groupBy is too
    * expensive — pricing a join over a corpus you haven't indexed —
    * [[Sketch.amsF2]] estimates the same Σ df² in one linear pass with
    * `depth` longs of state.)
    */
  private[graft] def maxPostingDocFreq(postings: DataFrame, tokCol: String): (Long, Long) = {
    val r = postings.groupBy(tokCol).agg(count(lit(1)).as("df"))
      .agg(max(col("df")), sum(col("df") * col("df"))).head()
    if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
  }

  /** Defensive guard for exact (unbounded-vocabulary) posting joins: a
    * caller who forgets `maxDocFreq` on a big corpus gets a LOUD
    * warning with the measured hottest-token d and its d² candidate
    * estimate, instead of silently launching a quadratic join. Costs
    * one cheap aggregate pass, and only when the source's Catalyst size
    * estimate crosses [[exactPostingWarnBytes]] — small inputs (tests,
    * exploration) stay job-free.
    */
  private def warnIfUnboundedPostings(source: DataFrame, postings: DataFrame,
      tokCol: String, op: String): Unit = {
    val estBytes = source.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes >= BigInt(exactPostingWarnBytes)) {
      val (d, f2) = maxPostingDocFreq(postings, tokCol)
      if (d > 10000)
        org.slf4j.LoggerFactory.getLogger("graft.analytics.Dedup").warn(
          s"$op: maxDocFreq=None over a ~$estBytes-byte source: the join will " +
            s"produce ~$f2 candidate rows total (Σ df²), and the hottest token " +
            s"alone appears in $d documents (~${d * d} pairs). Set maxDocFreq " +
            "to bound it (sizes are computed after the drop, so results stay " +
            "exact over the pruned vocabulary).")
    }
  }

  /** BLOOM-FILTER decontamination — the zero-join tier of the q88
    * sweep for 100-TB corpora: the eval/benchmark shingle set compiles
    * into a compact bit array CARRIED IN THE PLAN (16 KB at the 2^17
    * default — benchmarks are small by construction), and the corpus
    * side is a PURE SCAN: each document's distinct shingles test `k`
    * md5-derived bit positions — no shuffle, no join, no state ever
    * touches the corpus. The same shape as Spark's own runtime bloom
    * pushdown, made deterministic: positions are md5-derived, so the
    * filter — INCLUDING its false positives — is a pure function of
    * (evalSet, bits, k) that any engine replays bit-for-bit (the
    * oracle reproduces membership as position-subset testing, which is
    * definitionally identical to the bit test: bit p is set iff some
    * eval shingle maps to p). Returns (id, n_hits ≥ minHit); eval docs
    * flag themselves by construction — route flagged docs through the
    * exact inverted-index join ([[contaminationPairs]]) for
    * attribution and self-filtering, the classic two-phase
    * sketch-then-verify pipeline.
    */
  def bloomDecontaminate(corpus: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame, evalTextCol: String,
      n: Int, minHit: Int, bits: Int = 1 << 17, k: Int = 3): DataFrame = {
    require(bits > 0 && (bits & (bits - 1)) == 0 && bits % 64 == 0,
      "bits must be a power of two >= 64")
    require(k >= 1 && k <= 8, "k in [1, 8]")
    def posOf(h: Int, s: Column): Column =
      conv(substring(md5(concat(lit(s"bloom$h:"), s)), 1, 8), 16, 10)
        .cast("long") % bits
    // eval side: distinct shingles → k positions each → driver bitset
    // (benchmarks are small — the same broadcast-side contract as the
    // exact join's eval postings)
    val epos = evalSet
      .select(explode(array_distinct(wordShingles(col(evalTextCol), n))).as("s"))
      .select(explode(array((1 to k).map(h => posOf(h, col("s"))): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](bits / 64)
    epos.foreach(p => words(p.toInt / 64) |= (1L << (p.toInt % 64)))
    // the bitset rides as ONE shared Literal node referenced k times
    // (a projected-column binding does NOT survive here: CollapseProject
    // treats literals as cheap and re-inlines them — r18's withColumn
    // indirection was a no-op in the final plan; sharing the node keeps
    // one ArrayData either way)
    val bitset = lit(words)
    def bitTest(p: Column): Column =
      call_function("shiftright",
        element_at(bitset, (p / 64).cast("int") + 1), pmod(p, lit(64)).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    def hit(s: Column): Column =
      (1 to k).map(h => bitTest(posOf(h, s))).reduce(_ && _)
    // k md5s per shingle over a one-file corpus is single-task without
    // the spread (measured ~3.5 s serial at sf0.1); no-op at real scale.
    // n_hits is emitted THROUGH a one-element explode: a filter on a
    // generator output cannot be pushed below the Generate, so the
    // k-md5-per-shingle evaluation runs exactly ONCE per document, in
    // the spread stage — the plain `select(...).filter(...)` form let
    // the optimizer substitute the alias into the predicate and push it
    // below the spread Exchange, re-evaluating every shingle's md5s a
    // second time in the single scan task (measured: the whole bloom
    // pass ran serially there, ~3.7 s of its 4.7 s wall at sf0.1)
    spread(corpus)
      .select(col(idCol).as("id"),
        explode(array(
          size(filter(array_distinct(wordShingles(col(textCol), n)), hit _))
            .cast("long"))).as("n_hits"))
      .filter(col("n_hits") >= minHit)
  }

  /** Exact n-gram Jaccard near-dup pairs (i < j, jaccard >= threshold).
    *
    * Inverted-index pattern: explode distinct shingles, self-join on
    * the shingle (only docs SHARING a token ever meet — no cross join),
    * count intersections, compute |A∪B| = |A|+|B|−|A∩B|.
    *
    * `maxDocFreq`: the posting list of a token appearing in d docs
    * contributes d² candidate pairs — one corpus-wide stopword makes
    * the join quadratic. Setting a cutoff drops tokens whose document
    * frequency exceeds it (sizes are computed AFTER the drop, so the
    * result is the exact Jaccard over the pruned vocabulary — the
    * standard trade for corpus-scale near-dup mining). None = exact
    * over the full vocabulary.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int, threshold: Double,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val raw = spread(df).select(col(idCol).as("id"), explode(wordShingles(col(textCol), n)).as("tok"))
    if (maxDocFreq.isEmpty) warnIfUnboundedPostings(df, raw, "tok", "ngramJaccardPairs")
    val toks = dropHotTokens(raw, "tok", maxDocFreq)
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("sz"))
    val pairs = toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("id", "i").withColumnRenamed("sz", "szi"), "i")
      .join(sizes.withColumnRenamed("id", "j").withColumnRenamed("sz", "szj"), "j")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("szi") + col("szj") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")
  }

  /** Train/eval DECONTAMINATION — the cross-corpus n-gram overlap sweep
    * a training-data pipeline runs before shipping a corpus: an eval/
    * benchmark document leaking into the training set inflates scores
    * invisibly. Emits every (corpus doc, eval doc) pair sharing at
    * least `minShared` distinct word `n`-grams, with the overlap count
    * — downstream drops or audits the flagged corpus docs.
    *
    * Shape: the eval set is SMALL by construction (benchmarks), so its
    * exploded shingle postings broadcast; candidate generation is the
    * same inverted-index equi-join as [[ngramJaccardPairs]] — a corpus
    * doc only ever meets the eval docs it shares a shingle with, never
    * a cross join, and the shuffle carries (id, shingle) pairs, not
    * documents. `maxDocFreq` (doc frequency measured on the CORPUS
    * side) cuts boilerplate n-grams exactly like the within-corpus
    * guard; the eval side is never pruned — a benchmark's own phrasing
    * must stay matchable no matter how common it is in the corpus...
    * except where the corpus-side cut already removed the posting.
    */
  def contaminationPairs(corpus: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame, evalIdCol: String, evalTextCol: String,
      n: Int, minShared: Int, maxDocFreq: Option[Int] = None): DataFrame = {
    val cToks = spread(corpus).select(col(idCol).as("cid"),
      explode(wordShingles(col(textCol), n)).as("tok"))
    val kept = dropHotTokens(cToks, "tok", maxDocFreq)
    val eToks = evalSet.select(col(evalIdCol).as("eid"),
      explode(wordShingles(col(evalTextCol), n)).as("tok"))
    kept.join(broadcast(eToks), Seq("tok"))
      .groupBy("cid", "eid").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Near-dup pairs by WINNOWING-FINGERPRINT overlap — the
    * plagiarism-detection / code-clone shape: two docs pair when they
    * share at least `minShared` selected fingerprints
    * ([[TextAnalysis.winnowFingerprints]] guarantees any sufficiently
    * long shared run selects at least one common fingerprint, so
    * near-dup docs overlap heavily while unrelated docs share ~none).
    *
    * Candidate generation is the inverted-index equi-join on the
    * fingerprint — only docs SHARING one ever meet, never all-pairs.
    * `maxDocFreq` cuts boilerplate fingerprints (headers, licence
    * blocks) whose d-doc posting lists would contribute d² candidates,
    * exactly like [[ngramJaccardPairs]]'s guard.
    */
  def winnowOverlapPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Int, maxDocFreq: Option[Int] = None): DataFrame = {
    // (NOT cached: the posting table is consumed several times, but
    // with the winnowing chain's HOF-binding fix each evaluation is
    // cheap scan-parallel work — measured, a cache() here built a
    // columnar copy and halved throughput at bench scale)
    val raw = TextAnalysis.winnowFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("fp"))
    if (maxDocFreq.isEmpty) warnIfUnboundedPostings(df, raw, "fp", "winnowOverlapPairs")
    val kept = dropHotTokens(raw, "fp", maxDocFreq)
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Per-shingle base hashes for the Kirsch–Mitzenmacher family:
    * h1, h2 are independent 60-bit integers from two salted md5 digests;
    * hash_i(tok) = h1 + i·(h2 mod 2^47) gives `numHashes` permutations
    * from just TWO digests per shingle (bounded < 2^61, overflow-safe),
    * and is exactly reproducible in any md5-capable engine.
    */
  private def kmHashes(tok: Column): (Column, Column) = (
    conv(substring(md5(concat(lit("A:"), tok)), 1, 15), 16, 10).cast("long"),
    conv(substring(md5(concat(lit("B:"), tok)), 1, 15), 16, 10).cast("long") % lit(140737488355328L))

  /** MinHash signatures: signature[i] = min over shingles of hash_i.
    * One explode + one groupBy — linear in total shingle count, only two
    * md5 digests per shingle regardless of `numHashes`, and the 63 min
    * states update primitive agg buffers (an array-functional
    * formulation was measured 2× slower from per-shingle array churn).
    */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int): DataFrame = {
    val toks = spread(df).select(col(idCol).as("id"),
      explode(wordShingles(col(textCol), shingleN)).as("tok"))
    val (h1, h2) = kmHashes(col("tok"))
    val hashed = toks.select(col("id"), h1.as("h1"), h2.as("h2"))
    val mins = (0 until numHashes).map(i => min(col("h1") + lit(i.toLong) * col("h2")).as(s"h$i"))
    hashed.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash LSH candidate pairs: split the signature into `bands`
    * bands, bucket by (band index, joined band values), emit pairs
    * sharing a bucket, then estimate jaccard as matching-signature
    * fraction and filter. Probability a pair with true jaccard s
    * survives: 1 − (1 − s^r)^b with r = numHashes/bands rows per band.
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val r = numHashes / bands
    require(bands * r == numHashes, "bands must divide numHashes")
    // The signature table is consumed three times (banding + two
    // joins); cache() computes it once WITH lineage (a localCheckpoint
    // would be cheaper to clean up but loses fault tolerance — an
    // executor loss at scale could not recompute the blocks). The entry
    // lives in the session CacheManager until the caller drops it:
    // long-lived sessions issuing many dedup calls should
    // spark.catalog.clearCache() between pipelines (Verify/Bench do).
    val sig = minHashSignatures(df, idCol, textCol, shingleN, numHashes).cache()

    // Banding rows carry only (id, band, bucket) — NOT the signature:
    // candidate dedup then shuffles bare 16-byte (i,j) pairs instead of
    // two 500-byte signatures per candidate, and the signatures join
    // back afterwards from the (much smaller) sig table.
    val banded = sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => array_join(slice(col("sig"), b * r + 1, lit(r)).cast("array<string>"), ","))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .dropDuplicates("i", "j")

    // sig is one row per doc — orders of magnitude smaller than the
    // candidate set; explicit broadcast hints skip AQE's runtime
    // re-planning barrier. (At >100M docs replace with a shuffle join:
    // drop the hints, nothing else changes.)
    cand
      .join(broadcast(sig.select(col("id").as("i"), col("sig").as("sigi"))), "i")
      .join(broadcast(sig.select(col("id").as("j"), col("sig").as("sigj"))), "j")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sigi"), col("sigj"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / lit(numHashes.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select("i", "j", "est_jaccard")
  }

  /** 64-bit SimHash fingerprint per doc: each distinct token votes ±1 on
    * each bit of its md5-derived hash; fingerprint bit b = sign of the
    * vote sum. Bit b is bit (3 − b%4) of hex nibble b/4 of md5(token) —
    * a pure nibble/shift expression replicated verbatim by the oracle.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = spread(df).select(col(idCol).as("id"), explode(wordShingles(col(textCol), 1)).as("tok"))
      .withColumn("h", md5(col("tok")))
    def nib(i: Int): Column = conv(substring(col("h"), i + 1, 1), 16, 10).cast("int")
    def bit(b: Int): Column = shiftright(nib(b / 4), 3 - b % 4).bitwiseAND(1)
    val bitVotes = (0 until 64).map(b => sum(when(bit(b) === 1, 1).otherwise(-1)).as(s"b$b"))
    toks.groupBy("id").agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("id"),
        (0 until 64).map(b => when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
          .reduce((a, c) => a.bitwiseOR(c)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    *
    * Candidate generation uses (maxHamming + 1) contiguous bit-bands: by
    * pigeonhole, two hashes differing in <= maxHamming bits must agree
    * on at least one band, so banding recall is 1 BY CONSTRUCTION for
    * the declared radius — the band count is derived from the radius,
    * never fixed. (maxHamming = 3 → the classic 4×16-bit scheme.)
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val sh = simHash(df, idCol, textCol).cache() // lifecycle: see minHashLshPairs
    hammingPairs64(sh, "id", "simhash", maxHamming)
  }

  /** Hamming-banded pairs over PRECOMPUTED 64-bit hashes — the
    * candidate-generation core of [[simHashPairs]], reusable for any
    * 64-bit fingerprint family (text SimHash, image dHash): split the
    * hash into (maxHamming + 1) contiguous bit-bands; by pigeonhole two
    * hashes within the radius agree on at least one band, so the
    * bucket-equi-join's recall is 1 BY CONSTRUCTION and no pair of
    * hashes ever meets outside a shared bucket (never a cross join).
    * Output: (i, j, hamming), i < j, hamming <= maxHamming.
    */
  def hammingPairs64(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 63, "maxHamming in [0, 63]")
    val bands = maxHamming + 1
    val widths = Array.tabulate(bands)(b => 64 / bands + (if (b < 64 % bands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val bandCols = (0 until bands).map { b =>
      val mask = if (widths(b) >= 64) lit(-1L) else lit((1L << widths(b)) - 1)
      shiftrightunsigned(col("__h"), offsets(b)).bitwiseAND(mask)
    }
    val hs = hashes.select(col(idCol).as("id"), col(hashCol).as("__h"))
    val banded = hs.select(col("id"), col("__h"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        col("a.__h").as("hi"), col("b.__h").as("hj"))
      .dropDuplicates("i", "j")
      // built-in bit_count: one codegen'd Long.bitCount per pair instead
      // of a 64-term shift-add expression tree
      .withColumn("hamming",
        call_function("bit_count", col("hi").bitwiseXOR(col("hj"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("i", "j", "hamming")
  }

  /** Embedding-cosine near-dup pairs above `threshold` — EXACT result.
    *
    * Exact all-pairs similarity is dense linear algebra (a blocked
    * GEMM), not a relational join: at loose thresholds NO recall-1
    * candidate filter can prune high-dimensional data (coordinate
    * spread ~1/sqrt(d) is far below eps = sqrt(2-2t)), so expressing it
    * as a ROW-level join only adds shuffle and per-row overhead —
    * measured 3.5× slower than a dense loop. Instead this runs the
    * classic BLOCKED all-pairs scheme, fully distributed with no driver
    * materialization and no whole-matrix broadcast:
    *
    *  1. normalize in SQL, hash each row into one of B id-blocks;
    *  2. replicate each row to the B tiles (p,q), p <= q, it
    *     participates in (left role for its own row-of-tiles, right
    *     role for its column) — one shuffle, replication factor B;
    *  3. each tile task runs the tight primitive dot-product loop over
    *     its two blocks (the diagonal tile scores within-block i < j).
    *
    * Every pair of rows meets in EXACTLY one tile, so the result is
    * exact. Memory per task is ONE buffered block (~`rowsPerBlock`·d·
    * 8 B, default ~8 MB at d=128 — the tile's right rows stream past
    * it); total shuffle is B·matrix — the
    * unavoidable O(n·sqrt(work)) communication of exact all-pairs.
    * Beyond ~10M rows prefer [[epsGridCosinePairs]] /
    * [[approxCosinePairsLsh]] when the threshold allows pruning.
    */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, rowsPerBlock: Int = 8192): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("id"), l2Normalize(col(vecCol)).as("v"))
    // id ordering (for i < j pair identity) follows the id's own type —
    // string ids are first-class, anything numeric rides the long path
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.StringType =>
        blockedDenseKernel[String](base, threshold, rowsPerBlock)
      case _ =>
        blockedDenseKernel[Long](
          base.withColumn("id", col("id").cast("long")), threshold, rowsPerBlock)
    }
  }

  /** The tile-parallel dense scoring kernel shared by both id types.
    * Block count B follows the DATA (≈ n / rowsPerBlock) with a floor
    * of sqrt(2·cores) so small corpora still fan out to ≥ cores tiles;
    * tiles = B(B+1)/2. The count() that sizes the grid is one cheap
    * column-pruned scan of (id) — metadata-only on parquet.
    */
  /** Block-count rule of the dense kernel, exposed so PlanAuditSpec can
    * pin it: B follows the data (≈ n / rowsPerBlock) with a
    * sqrt(2·cores) floor, capped at 2048. A regression here either
    * explodes per-task memory (B too small → fat tiles) or shuffle
    * volume (B too large → replication factor B).
    */
  private[graft] def denseBlockCount(n: Long, rowsPerBlock: Int, parallelism: Int): Int = {
    val minBlocks = math.ceil(math.sqrt(2.0 * parallelism)).toInt
    math.max(1, math.min(2048,
      math.max((n + rowsPerBlock - 1) / rowsPerBlock, math.min(n, minBlocks.toLong)))).toInt
  }

  /** Role expansion of the dense kernel (tile replication), exposed for
    * the same audit: a row in block b is the LEFT side of tiles (b, q)
    * for q in [b, B) and the RIGHT side of tiles (p, b) for p in [0, b)
    * — every row lands in exactly B tiles, every tile pair (p ≤ q)
    * exists, so pairs meet exactly once and per-tile row count (≈ 2n/B)
    * bounds per-task memory.
    */
  private[graft] def tileExpansion(withBlk: DataFrame, nBlocks: Int): DataFrame = {
    val left = withBlk.select(col("blk").as("p"),
      explode(sequence(col("blk"), lit(nBlocks - 1))).as("q"),
      lit(true).as("isLeft"), col("id"), col("v"))
    val right = withBlk.filter(col("blk") > 0).select(
      explode(sequence(lit(0), col("blk") - 1)).as("p"), col("blk").as("q"),
      lit(false).as("isLeft"), col("id"), col("v"))
    left.unionByName(right)
  }

  /** Tile scheduling: an explicit `repartition(nTiles, p, q)` +
    * `sortWithinPartitions` + streaming `mapPartitions`, NOT a typed
    * groupByKey. Two scale reasons:
    *
    *  - AQE coalesces shuffles BY BYTES, but tile work is CPU-quadratic
    *    in rows, not byte-proportional — at moderate scale it folds all
    *    tiles into 1-2 tasks (8 MB of shuffle at sf0.1) and serializes
    *    the whole kernel. A user-numbered repartition is exempt from
    *    AQE coalescing, so parallelism stays one-task-per-tile.
    *  - Within a tile, rows arrive sorted lefts-first: only the LEFT
    *    block is buffered (~rowsPerBlock·d·8 B, default ~4 MB at
    *    d=64); right rows stream one at a time — half the old two-block
    *    footprint.
    */
  private def blockedDenseKernel[T: Ordering](base: DataFrame, threshold: Double,
      rowsPerBlock: Int)(
      implicit rowEnc: org.apache.spark.sql.Encoder[(Int, Int, Boolean, T, Seq[Double])],
      keyEnc: org.apache.spark.sql.Encoder[(Int, Int)],
      outEnc: org.apache.spark.sql.Encoder[(T, T, Double)]): DataFrame = {
    val n = base.select("id").count()
    val nBlocks = denseBlockCount(n, rowsPerBlock,
      base.sparkSession.sparkContext.defaultParallelism)
    val withBlk = base.withColumn("blk", pmod(xxhash64(col("id")), lit(nBlocks)).cast("int"))
    val ord = implicitly[Ordering[T]]
    val nTiles = nBlocks * (nBlocks + 1) / 2
    tileExpansion(withBlk, nBlocks)
      .repartition(math.min(nTiles, 4096), col("p"), col("q"))
      .sortWithinPartitions(col("p"), col("q"), col("isLeft").desc)
      .as[(Int, Int, Boolean, T, Seq[Double])]
      .mapPartitions { rows =>
        val buf = rows.buffered
        def score(a: (T, Array[Double]), b: (T, Array[Double])): Option[(T, T, Double)] = {
          val (vi, vj) = (a._2, b._2)
          var s = 0.0
          var k = 0
          while (k < vi.length) { s += vi(k) * vj(k); k += 1 }
          if (s >= threshold) {
            if (ord.lt(a._1, b._1)) Some((a._1, b._1, s)) else Some((b._1, a._1, s))
          } else None
        }
        // hash collisions can land several tiles in one partition; the
        // sort makes each tile a contiguous run, consumed in one pass
        new Iterator[(T, T, Double)] {
          private var cur: Iterator[(T, T, Double)] = Iterator.empty
          private def refill(): Unit = while (!cur.hasNext && buf.hasNext) {
            val p = buf.head._1
            val q = buf.head._2
            val ls = scala.collection.mutable.ArrayBuffer.empty[(T, Array[Double])]
            while (buf.hasNext && buf.head._1 == p && buf.head._2 == q && buf.head._3) {
              val r = buf.next(); ls += ((r._4, r._5.toArray))
            }
            cur = if (p == q) {
              // diagonal tile: within-block pairs, each once
              val arr = ls.toArray
              arr.indices.iterator.flatMap(i =>
                (i + 1 until arr.length).iterator.flatMap(j => score(arr(i), arr(j))))
            } else new Iterator[(T, T, Double)] {
              // stream this tile's right rows against the buffered lefts
              private var inner: Iterator[(T, T, Double)] = Iterator.empty
              private def step(): Unit =
                while (!inner.hasNext && buf.hasNext && buf.head._1 == p && buf.head._2 == q) {
                  val r = buf.next()
                  val b = (r._4, r._5.toArray)
                  inner = ls.iterator.flatMap(a => score(a, b))
                }
              def hasNext: Boolean = { step(); inner.hasNext }
              def next(): (T, T, Double) = { step(); inner.next() }
            }
          }
          def hasNext: Boolean = { refill(); cur.hasNext }
          def next(): (T, T, Double) = { refill(); cur.next() }
        }
      }.toDF("i", "j", "cosine")
  }

  /** Eps-grid blocked variant — recall 1 BY CONSTRUCTION, effective only
    * when the threshold is tight relative to dimensionality.
    *
    * After L2 normalization, cos(a,b) >= t implies ||a−b|| <= eps =
    * sqrt(2−2t), hence |a·p − b·p| <= eps along ANY fixed direction p
    * (Cauchy–Schwarz). Bucketing each vector by floor(coord/eps) on
    * `gridDims` fixed axes and probing the 3^gridDims neighborhood is
    * therefore exact while converting the O(n²) nested-loop self-join
    * into a shuffle equi-join on cell keys. Pruning requires eps below
    * the coordinate spread (~1/sqrt(d)) — i.e. t > 1 − 1/(2d) — or
    * low-dimensional / clustered data; otherwise everything lands in one
    * cell and [[embeddingCosinePairs]]'s dense kernel is faster.
    */
  def epsGridCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, gridDims: Int = 2): DataFrame = {
    require(threshold <= 1.0, "cosine threshold must be <= 1")
    require(gridDims >= 1 && gridDims <= 4, "gridDims in [1, 4]")
    val eps = math.sqrt(math.max(2.0 - 2.0 * threshold, 1e-12))
    val base = df.select(col(idCol).as("id"), l2Normalize(col(vecCol)).as("v"))
    def cellOf(d: Int, off: Int): Column =
      (floor(element_at(col("v"), d + 1) / lit(eps)).cast("long") + lit(off)).cast("string")
    val home = base.withColumn("cellKey",
      concat_ws(",", (0 until gridDims).map(cellOf(_, 0)): _*))
    val shifts: Seq[Seq[Int]] = (0 until gridDims).foldLeft(Seq(Seq.empty[Int])) {
      (acc, _) => acc.flatMap(s => Seq(-1, 0, 1).map(s :+ _))
    }
    val probe = base.withColumn("cellKey", explode(array(shifts.map(sh =>
      concat_ws(",", sh.zipWithIndex.map { case (off, d) => cellOf(d, off) }: _*)): _*)))
    probe.as("a").join(home.as("b"),
        col("a.cellKey") === col("b.cellKey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        col("a.v").as("vi"), col("b.v").as("vj"))
      .dropDuplicates("i", "j")
      .select(col("i"), col("j"), dot(col("vi"), col("vj")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Connected components over an undirected near-dup pair set — the
    * step that turns pairwise LSH output into dedup GROUPS (pairs alone
    * under-merge: A~B and B~C must collapse to one cluster even when
    * A~C was never emitted).
    *
    * Iterative min-label propagation: every node starts labeled with
    * its own id; each round every node takes the min of its own label
    * and its neighbors' labels; fixpoint = each component labeled by
    * its minimum member id. One equi-join + one groupBy-min per round,
    * rounds bounded by the component diameter — near-dup graphs are
    * dense clusters with tiny diameters, so this converges in a few
    * rounds. The convergence check rides the SAME aggregate (each id's
    * own previous label is tagged and compared in the groupBy), so a
    * round costs one shuffle — not the old extra join+count job. From
    * round 3 on, a pointer-jump (component := label(component),
    * Shiloach–Vishkin style) compresses label chains each round, so
    * adversarial path graphs converge in O(log diameter) rounds — the
    * same effect the large-star/small-star contraction buys, with one
    * extra equi-join only on the rounds that need it. Lineage is
    * truncated every round (localCheckpoint), so plans stay flat no
    * matter how many rounds run.
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
      edges: DataFrame, iCol: String, jCol: String, maxRounds: Int = 50): DataFrame = {
    val bidir = edges.select(col(iCol).as("a"), col(jCol).as("b"))
      .union(edges.select(col(jCol).as("a"), col(iCol).as("b")))
      .distinct().cache()
    var labels = nodes.select(col(idCol).as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      // exactly one own=true row per id, so min(when(own,…)) recovers
      // each id's previous label inside the same aggregate
      val self = labels.select(col("id"), col("component"), lit(true).as("own"))
      val msgs = bidir.join(labels.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), col("component"), lit(false).as("own"))
      // Each round's localCheckpoint blocks are released by the
      // ContextCleaner once the previous round's DataFrame becomes
      // unreachable (the rebind below) — live copies stay bounded at
      // ~2 regardless of round count.
      val next = self.unionByName(msgs)
        .groupBy("id").agg(
          min("component").as("component"),
          min(when(col("own"), col("component"))).as("prev"))
        // an id first introduced by msgs alone (edge endpoint absent
        // from `nodes`) has prev = null — that IS a change, so null
        // counts as moved; otherwise a round whose only movement is a
        // new id would read as converged and return under-merged labels
        .withColumn("moved",
          coalesce(col("component") =!= col("prev"), lit(true)))
        .localCheckpoint()
      // counts over the just-materialized checkpoint blocks: an
      // in-memory scan, no shuffle, no recomputation
      changed = next.filter(col("moved")).count()
      var updated = next.select("id", "component")
      if (changed > 0 && round >= 2) {
        // pointer jump: component := label(component). label(x) <= x
        // (own id participates in every min), so this only tightens;
        // left join + coalesce tolerates edge endpoints absent from
        // `nodes`.
        val ptr = updated.select(col("id").as("pid"), col("component").as("pcomp"))
        updated = updated.join(ptr, updated("component") === col("pid"), "left")
          .select(col("id"), coalesce(col("pcomp"), col("component")).as("component"))
          .localCheckpoint()
      }
      labels = updated
      round += 1
    }
    bidir.unpersist()
    // A silent early exit would return UNDER-MERGED labels (one real
    // cluster split in several) — fail loudly instead; raise maxRounds
    // (or pre-contract chains with large-star/small-star) if a graph
    // legitimately has a diameter this large.
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxRounds rounds " +
        s"($changed labels still changing); component diameter exceeds the bound")
    labels
  }

  /** One survivor per component: rank members by `orderCols` (e.g.
    * quality descending, id ascending) and keep rank 1 — the final
    * near-dup dedup step (cluster, then keep the best exemplar). A
    * stratum cap of 1 with the component as the stratum.
    */
  def survivorsByComponent(members: DataFrame, componentCol: String,
      orderCols: Seq[Column]): DataFrame =
    Curation.stratumCap(members, Seq(componentCol), 1, orderCols)

  /** Approximate variant: random-hyperplane sign-LSH bucketing. Recall
    * < 1 (pairs split by any hyperplane are lost) — use for tight
    * thresholds at extreme scale where even eps-grid cells overflow;
    * raise recall by unioning over several seeds.
    */
  def approxCosinePairsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, lshBits: Int = 8, seed: Int = 42): DataFrame = {
    val base = df.select(col(idCol).as("id"), l2Normalize(col(vecCol)).as("v"))
    val bucketed = base.withColumn("bucket",
      to_json(randomHyperplaneSignature(col("v"), lshBits, seed)))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        dot(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the corpus embeddings with the
    * deterministic IVF coarse quantizer, then WITHIN each cluster drop
    * every vector that has a strictly-smaller-id neighbor at cosine >=
    * `threshold`. The survivor rule is the paper's "keep one exemplar
    * per semantic-duplicate set" made order-free and engine-portable:
    * a vector survives iff no smaller id in its cell sits above the
    * threshold (single-link toward the cluster-local minimum id), so
    * the result is a pure function of the data — no iteration order,
    * no RNG — and the oracle can replay it as SQL.
    *
    * 100 TB shape: assignment is a broadcast of the tiny centroid table
    * + map-side partial min (one shuffled row per vector); candidate
    * generation is an equi-join keyed by `cell` — never corpus×corpus.
    * The within-cell quadratic is bounded by cluster size, which the
    * quantizer's k controls (cluster ~ n/k); that k-scales-with-corpus
    * contract is exactly how SemDeDup runs at web scale. Returns the
    * surviving (id, cell) rows.
    *
    * `maxCellSize` is the fat-cell guard — the cell-space analogue of
    * the posting-list `maxDocFreq`: a cell holding c vectors feeds c²
    * pair work into the within-cell join, and the sort-merge join
    * buffers one cell's full vector set in a single task, so ONE
    * degenerate cluster (duplicate-saturated corpora collapse into few
    * cells) turns the whole job quadratic-and-OOM. With a cap, cells
    * above it are EXCLUDED from pairing (all their members survive —
    * a recall sacrifice on exactly the cells whose k is mis-sized,
    * mirroring dropHotTokens' exact-over-pruned-vocabulary contract);
    * without one, a corpus whose Catalyst size estimate crosses
    * [[exactPostingWarnBytes]] pays one cheap stats pass and warns
    * LOUDLY when the largest cell exceeds [[SemanticFatCellWarn]],
    * instead of silently launching the quadratic join. The real fix at
    * scale is always a larger k (cluster ~ n/k is the paper's own
    * contract); the cap is the bound that keeps a mis-sized run alive.
    */
  def semanticDedup(emb: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, threshold: Double,
      maxCellSize: Option[Int] = None): DataFrame = {
    val assigned = Similarity.ivfAssign(emb, centroids, idCol, vecCol)
    val paired = maxCellSize match {
      case Some(m) =>
        val fat = assigned.groupBy("cell").agg(count(lit(1)).as("n"))
          .filter(col("n") > m).select("cell")
        // cell count is bounded by k (tiny): broadcast anti-join
        assigned.join(broadcast(fat), Seq("cell"), "left_anti")
      case None =>
        val estBytes = emb.queryExecution.optimizedPlan.stats.sizeInBytes
        if (estBytes >= BigInt(exactPostingWarnBytes)) {
          val r = assigned.groupBy("cell").agg(count(lit(1)).as("n"))
            .agg(max(col("n"))).head()
          val c = if (r.isNullAt(0)) 0L else r.getLong(0)
          if (c > SemanticFatCellWarn)
            org.slf4j.LoggerFactory.getLogger("graft.analytics.Dedup").warn(
              s"semanticDedup: maxCellSize=None over a ~$estBytes-byte corpus and " +
                s"the largest IVF cell holds $c vectors — that one cell alone feeds " +
                s"~${c * c} within-cell pairs (and its full vector set buffers in one " +
                "join task). Raise the quantizer's k (cluster ~ n/k) or set " +
                "maxCellSize to bound it.")
        }
        assigned
    }
    val l = paired.select(col("cell"), col("id"), col("cv"))
    val r = paired.select(col("cell"), col("id").as("id2"), col("cv").as("cv2"))
    val dominated = l.join(r, "cell")
      .filter(col("id2") < col("id") && dot(col("cv"), col("cv2")) >= threshold)
      .select("id").distinct()
    assigned.select("id", "cell").join(dominated, Seq("id"), "left_anti")
  }

  /** Cell-size bar for the unguarded-semanticDedup warning: 64k vectors
    * in one cell ≈ 4×10⁹ within-cell pairs — past any sane cluster
    * sizing, and the point where one task's join buffer stops fitting.
    */
  private val SemanticFatCellWarn = 1 << 16

  /** Edit-distance confirmation of candidate pairs — the exact final
    * tier of the dedup funnel: banding (MinHash/SimHash/winnowing)
    * proposes, Levenshtein disposes. `pairs` is any (i, j) candidate
    * table; each pair joins its two texts and computes the true edit
    * distance (codegen'd built-in, identical integer in any engine) and
    * the length-normalized ratio dist / max(len_i, len_j).
    *
    * Cost model, stated plainly: Levenshtein is O(L²) PER PAIR — which
    * is exactly why it sits BEHIND a candidate generator and never runs
    * all-pairs. The joins are id equi-joins (texts travel once per
    * side), so the stage is candidate-bound: |pairs| · L² work spread
    * over the pair partitions. Output: (i, j, dist, len_max,
    * confirmed = ratio·100 ≤ maxRatioPct) — the ratio test is kept in
    * integers (dist·100 ≤ pct·len) so no float boundary exists.
    */
  def editDistanceConfirm(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, maxRatioPct: Int = 20): DataFrame = {
    require(maxRatioPct >= 0 && maxRatioPct <= 100, "maxRatioPct in [0,100]")
    val li = docs.select(col(idCol).cast("long").as("i"), col(textCol).as("__ti"))
    val rj = docs.select(col(idCol).cast("long").as("j"), col(textCol).as("__tj"))
    pairs.select(col("i").cast("long").as("i"), col("j").cast("long").as("j"))
      .join(li, "i").join(rj, "j")
      .select(col("i"), col("j"),
        levenshtein(col("__ti"), col("__tj")).cast("long").as("dist"),
        greatest(length(col("__ti")), length(col("__tj"))).cast("long").as("len_max"))
      .withColumn("confirmed", col("dist") * 100L <= lit(maxRatioPct.toLong) * col("len_max"))
  }
}
