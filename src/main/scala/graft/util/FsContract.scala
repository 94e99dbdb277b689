package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** The engine's STORAGE CONTRACT, enforced at open.
  *
  * Every durable commit protocol in this engine uses `FileSystem
  * .rename` as its commit point, and its crash-safety proofs assume
  * HDFS rename semantics — ATOMIC (all-or-nothing, including for
  * directories) and EXCLUSIVE (rename onto an existing destination
  * fails rather than overwrites). Concretely:
  *
  *   - the parquet store's overwrite swap (`staging → data` with
  *     backup-renames as the crash signature, `Storage.overwriteInner`)
  *     and its recovery's verdicts ("data present ⇒ swap completed")
  *     read rename as a transition that either fully happened or
  *     didn't;
  *   - retention/compaction FOLD publishes commit an entire
  *     generation as ONE directory rename (`staging → fold-<v>`);
  *   - the `_versions` claim/seal chain and the graft-log's
  *     compaction-generation segment names rely on create-ONLY rename
  *     for mutual exclusion (two committers cannot both win);
  *   - the graft-log's segment seals, sparse indexes, cleaner points
  *     and streaming-sink epoch markers publish via
  *     `tmp → final-name` renames whose visibility must be
  *     all-or-nothing;
  *   - the digest store's compaction uses the same backup-then-swap
  *     directory renames.
  *
  * True on: local file, HDFS (and viewfs federation), Azure
  * ABFS/ABFSS (directory-atomic on hierarchical namespaces), WASB.
  * FALSE on S3-style object stores (s3/s3a/s3n, GCS `gs`, OSS, COS,
  * Swift): "rename" there is a non-atomic copy+delete per object, a
  * directory rename can land partially, and nothing is exclusive —
  * a crash mid-commit can be misread by recovery as a COMPLETED
  * commit and silently drop data.
  *
  * So stores and topics refuse to open on a scheme that is not known
  * to provide atomic rename. A deployment that layers atomicity on
  * top of an object store (HDFS-over-S3 gateways, a consistent
  * rename-capable connector, single-writer dev setups that accept
  * the risk) opts in explicitly with
  * `graft.storage.assumeAtomicRename=true` — on the Spark conf for
  * SparkSession-scoped opens, or the Hadoop `Configuration` for
  * producer/maintenance entry points. The override is a statement
  * about the STORE's filesystem, not a safety toggle: with it set on
  * a genuinely non-atomic store, every crash-window proof in the
  * protocols above is void.
  */
object FsContract {

  /** Config key accepting non-allowlisted schemes (value "true"). */
  val OverrideKey = "graft.storage.assumeAtomicRename"

  /** Schemes providing HDFS-style atomic + exclusive rename. */
  val AtomicRenameSchemes: Set[String] = Set(
    "file", "local", "hdfs", "viewfs", "webhdfs", "hftp",
    "abfs", "abfss", "wasb", "wasbs", "ofs", "o3fs", "alluxio")

  // ---- the MANIFEST commit contract (the weaker primitive) ----
  //
  // Manifest-authoritative backends (ManifestStorage, manifest-mode
  // graft-log topics) need only ONE filesystem primitive: an ATOMIC
  // EXCLUSIVE single-object create ("claim this slot iff it does not
  // exist"). That is strictly weaker than atomic directory rename —
  // but it is still NOT universal: stock S3A maps
  // `create(p, overwrite=false)` to a non-atomic check-then-PUT
  // unless the connector's conditional-create support is enabled
  // (`fs.s3a.create.conditional.enabled`, Hadoop 3.4.1+ on S3's
  // If-None-Match). Two concurrent committers racing a check-then-PUT
  // claim can BOTH believe they won one manifest slot — the loser's
  // acknowledged commit would be silently unlinked. So multi-writer
  // safety on a scheme outside [[AtomicRenameSchemes]] (where
  // create-exclusive is honest) is a DEPLOYMENT fact the engine
  // cannot detect from the scheme alone, and opening such a scheme
  // demands an explicit statement from the deployer:
  //
  //   - [[ConditionalCreateKey]]=true — "this store's connector maps
  //     create(overwrite=false) to a genuinely conditional PUT"
  //     (S3A with conditional create enabled, GCS if-generation-match
  //     connectors). Claims are then atomic and multi-writer safe.
  //   - [[SingleWriterKey]]=true — "exactly one writer process at a
  //     time" (or writers are serialized by an external mutex). The
  //     check-then-PUT degradation is then unreachable. Readers are
  //     always safe regardless.

  /** Config key (bool): this store's connector implements
    * `create(p, overwrite=false)` as an atomic conditional PUT.
    */
  val ConditionalCreateKey = "graft.storage.manifestConditionalCreate"

  /** Config key (bool): manifest commits on this store run
    * single-writer (or externally serialized), so non-atomic claims
    * cannot race.
    */
  val SingleWriterKey = "graft.storage.manifestSingleWriter"

  /** Is the exclusive-create CLAIM primitive trustworthy on `scheme`
    * without deployment attestation? True exactly for the filesystems
    * where `create(overwrite=false)` (or local O_EXCL) is atomic.
    */
  def exclusiveCreateNative(scheme: String): Boolean = AtomicRenameSchemes(scheme)

  /** Gate for opening a MANIFEST-committing writer: native exclusive
    * create, or one of the two attestation confs. Readers need no gate.
    */
  def requireManifestWritable(root: String, conditionalCreate: Boolean,
      singleWriter: Boolean, what: String): Unit = {
    val scheme = schemeOf(root)
    require(exclusiveCreateNative(scheme) || conditionalCreate || singleWriter,
      s"$what at '$root': scheme '$scheme' is not known to provide an ATOMIC " +
        "exclusive create, so a manifest-slot claim degrades to check-then-PUT " +
        "and two concurrent committers could both win one slot (silent loss of " +
        "an acknowledged commit). State your deployment explicitly: set " +
        s"$ConditionalCreateKey=true if the connector supports conditional " +
        s"create (e.g. S3A fs.s3a.create.conditional.enabled), or " +
        s"$SingleWriterKey=true for a single-writer/externally-serialized " +
        "deployment (readers are always safe).")
  }

  def requireManifestWritable(spark: SparkSession, root: String, what: String): Unit =
    requireManifestWritable(root,
      confBool(spark, ConditionalCreateKey), confBool(spark, SingleWriterKey), what)

  def requireManifestWritable(conf: Configuration, root: String, what: String): Unit =
    requireManifestWritable(root, conf.getBoolean(ConditionalCreateKey, false),
      conf.getBoolean(SingleWriterKey, false), what)

  private[graft] def confBool(spark: SparkSession, key: String): Boolean =
    spark.conf.get(key, "false").equalsIgnoreCase("true") ||
      spark.sparkContext.hadoopConfiguration.getBoolean(key, false)

  private val SchemeRx = "^([A-Za-z][A-Za-z0-9+.\\-]*):".r

  /** Scheme of `path` (absent → "file": bare local paths). Extracted
    * by prefix pattern like Hadoop's Path, NOT java.net.URI — a URI
    * parse that throws on an s3a path containing a space (or any
    * URI-illegal char) must read as s3a, not silently fall back to
    * "file" and bypass the gate while Hadoop happily opens the store.
    */
  def schemeOf(path: String): String =
    SchemeRx.findFirstMatchIn(path).map(_.group(1))
      .getOrElse("file").toLowerCase(java.util.Locale.ROOT)

  def requireAtomicRename(root: String, overrideAccepted: Boolean,
      what: String): Unit = {
    val scheme = schemeOf(root)
    require(overrideAccepted || AtomicRenameSchemes(scheme),
      s"$what at '$root': filesystem scheme '$scheme' is not known to provide " +
        "ATOMIC+EXCLUSIVE rename, which every commit protocol here uses as its " +
        "commit point (see graft.util.FsContract). On S3-style object stores a " +
        "crash mid-commit can be misread as a completed commit and lose data. " +
        s"If this store's filesystem does guarantee atomic rename, set " +
        s"$OverrideKey=true (Spark conf or Hadoop conf) to accept it.")
  }

  def requireAtomicRename(spark: SparkSession, root: String, what: String): Unit =
    requireAtomicRename(root,
      spark.conf.get(OverrideKey, "false").equalsIgnoreCase("true") ||
        spark.sparkContext.hadoopConfiguration.getBoolean(OverrideKey, false),
      what)

  def requireAtomicRename(conf: Configuration, root: String, what: String): Unit =
    requireAtomicRename(root, conf.getBoolean(OverrideKey, false), what)
}
