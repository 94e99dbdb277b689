package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.engine.{GraftDB, ManifestStorage, ParquetStorage}
import graft.model.Point
import graft.query._

/** A deliberately OBJECT-STORE-SHAPED local filesystem: rename is a
  * NON-ATOMIC file-at-a-time copy+delete with an injectable crash
  * point (a directory rename can land partially) and is NON-EXCLUSIVE
  * (renaming onto an existing destination overwrites). Exactly the
  * semantics [[graft.util.FsContract]] refuses for the rename-
  * committing store — what the manifest-authoritative backend must
  * stay correct on. `create(p, overwrite=false)` is honest (the one
  * primitive manifest commits need). Registered under scheme `flaky:`.
  */
class FlakyRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import FlakyRenameFileSystem._

  override def getScheme: String = "flaky"
  override def getUri: java.net.URI = java.net.URI.create("flaky:///")

  // `create(p, overwrite=false)` is a GENUINE conditional create
  // (O_EXCL claim, then the stream) — the stub models an object store
  // WITH conditional PUT (S3 If-None-Match, GCS if-generation-match 0),
  // which is what the spec's ConditionalCreateKey attestation asserts.
  // RawLocalFileSystem's own overwrite=false path is check-then-create.
  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) {
      val file = pathToFile(f)
      java.nio.file.Files.createDirectories(file.getParentFile.toPath)
      if (!file.createNewFile())
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          s"$f already exists (conditional create)")
    }
    super.create(f, permission, true, bufferSize, replication, blockSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val s = pathToFile(src)
    val d = pathToFile(dst)
    if (!s.exists()) return false
    if (s.isDirectory) { copyTree(s, d); deleteTree(s) }
    else {
      maybeCrash()
      java.nio.file.Files.createDirectories(d.getParentFile.toPath)
      java.nio.file.Files.copy(s.toPath, d.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING) // NON-exclusive
      s.delete()
    }
    true
  }

  private def copyTree(s: java.io.File, d: java.io.File): Unit = {
    java.nio.file.Files.createDirectories(d.toPath)
    Option(s.listFiles()).getOrElse(Array.empty).sortBy(_.getName).foreach { c =>
      if (c.isDirectory) copyTree(c, new java.io.File(d, c.getName))
      else {
        maybeCrash()
        java.nio.file.Files.copy(c.toPath, new java.io.File(d, c.getName).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  private def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete(); ()
  }

  private def maybeCrash(): Unit = {
    val left = crashAfterFiles.get()
    if (left >= 0) {
      if (left == 0)
        throw new java.io.IOException("simulated crash mid-rename (partial copy landed)")
      crashAfterFiles.decrementAndGet(); ()
    }
  }
}

object FlakyRenameFileSystem {
  /** -1 = disabled; n ≥ 0 = throw after n more file copies. */
  val crashAfterFiles = new java.util.concurrent.atomic.AtomicInteger(-1)
}

/** The manifest-authoritative commit protocol on a filesystem with NO
  * atomic rename: lifecycle correctness, crash windows (no state is
  * ever misread as committed), optimistic concurrency, vacuum.
  */
class ManifestStorageSpec extends SparkSpec {
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration.set("fs.flaky.impl",
    classOf[FlakyRenameFileSystem].getName)
  // the deployment attestation a manifest WRITER needs on a scheme
  // without native exclusive create: the flaky stub's
  // create(overwrite=false) genuinely IS conditional (see above)
  spark.sparkContext.hadoopConfiguration.setBoolean(
    graft.util.FsContract.ConditionalCreateKey, true)

  // the session (and its hadoopConfiguration) is shared across suites:
  // the attestation is THIS suite's deployment statement about the
  // flaky: stub, not a global fact — leaking it would let later suites'
  // refusal gates (FsContractSpec) pass schemes they must refuse
  override def afterAll(): Unit = {
    spark.sparkContext.hadoopConfiguration.unset(
      graft.util.FsContract.ConditionalCreateKey)
    super.afterAll()
  }

  private def t(s: String): Instant = Instant.parse(s)

  private def freshRoot(): String =
    "flaky:" + Files.createTempDirectory("graftmanifest").toString + "/db"

  private def seedPoints(db: GraftDB): Unit =
    db.insertMultiple(Seq(
      Point(t("2024-01-01T01:00:00Z"), "therm", Map("room" -> "bed"), Map("temp" -> 70.0)),
      Point(t("2024-01-02T01:00:00Z"), "therm", Map("room" -> "kit"), Map("temp" -> 68.0)),
      Point(t("2024-01-03T01:00:00Z"), "cpu", Map("host" -> "a"), Map("load" -> 0.5))))

  describe("the flaky filesystem itself") {
    it("directory rename genuinely lands partially on a crash (the hazard is real)") {
      val base = Files.createTempDirectory("flakyfs").toString
      val fs = new Path("flaky:" + base).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val src = new java.io.File(base, "srcdir"); src.mkdirs()
      (1 to 4).foreach(i => Files.write(new java.io.File(src, s"f$i").toPath,
        s"payload$i".getBytes("UTF-8")))
      FlakyRenameFileSystem.crashAfterFiles.set(2)
      try intercept[java.io.IOException] {
        fs.rename(new Path("flaky:" + base + "/srcdir"),
          new Path("flaky:" + base + "/dstdir"))
      } finally FlakyRenameFileSystem.crashAfterFiles.set(-1)
      val landed = Option(new java.io.File(base, "dstdir").listFiles())
        .getOrElse(Array.empty).length
      assert(landed > 0 && landed < 4,
        s"expected a PARTIAL destination, got $landed of 4 files")
      assert(new java.io.File(base, "srcdir").exists(),
        "source must survive a copy-phase crash (both halves visible at once)")
    }
  }

  describe("opening") {
    it("atPath on a no-atomic-rename scheme routes to the manifest backend; ParquetStorage still refuses") {
      val db = GraftDB.atPath(spark, freshRoot())
      assert(db.storage.isInstanceOf[ManifestStorage],
        "object-store schemes must open in manifest mode, not refuse")
      intercept[IllegalArgumentException] {
        new ParquetStorage(spark, freshRoot())
      }
      // rename-safe schemes keep the rename-committing backend
      val local = GraftDB.atPath(spark,
        Files.createTempDirectory("graftlocal").toString + "/db")
      assert(local.storage.isInstanceOf[ParquetStorage])
    }

    it("without the deployment attestation, a multi-writer-unsafe scheme refuses loudly") {
      // stock-S3A stance: no conditional create attested, no
      // single-writer declaration → a silent check-then-PUT claim
      // could lose an acknowledged commit, so the open must refuse
      // and name both attestation keys
      val hc = spark.sparkContext.hadoopConfiguration
      hc.setBoolean(graft.util.FsContract.ConditionalCreateKey, false)
      try {
        val e = intercept[IllegalArgumentException] {
          GraftDB.atPath(spark, freshRoot())
        }
        assert(e.getMessage.contains(graft.util.FsContract.ConditionalCreateKey))
        assert(e.getMessage.contains(graft.util.FsContract.SingleWriterKey))
        // either attestation opens it
        hc.setBoolean(graft.util.FsContract.SingleWriterKey, true)
        assert(GraftDB.atPath(spark, freshRoot()).storage
          .isInstanceOf[ManifestStorage])
      } finally {
        hc.setBoolean(graft.util.FsContract.ConditionalCreateKey, true)
        hc.unset(graft.util.FsContract.SingleWriterKey)
      }
    }
  }

  describe("lifecycle on a no-atomic-rename filesystem") {
    it("insert / read / update / remove / compact / retain round-trip") {
      val db = GraftDB.atPath(spark, freshRoot())
      seedPoints(db)
      assert(db.length == 3)
      assert(db.count(MeasurementQuery() === "therm") == 2)
      // update mutates through a manifest overwrite commit
      assert(db.update(TagQuery("room") === "kit", fields = Map("temp" -> 99.0)) == 1)
      assert(db.searchDF(FieldQuery("temp") === 99.0).count() == 1)
      // remove drops through the same commit path
      assert(db.remove(MeasurementQuery() === "cpu") == 1)
      assert(db.length == 2)
      // compact folds the commit list to one dir; contents unchanged
      val before = db.all().map(p => (p.time, p.measurement, p.tags, p.fields))
      db.compact()
      assert(db.all().map(p => (p.time, p.measurement, p.tags, p.fields)) == before)
      // retention falls back to the COW remove path on this backend
      assert(db.retain(t("2024-01-02T00:00:00Z")) == 1)
      assert(db.length == 1)
      assert(db.all().head.tags("room") == "kit")
    }

    it("insertion order (_seq) survives appends and folds") {
      val db = GraftDB.atPath(spark, freshRoot())
      seedPoints(db)
      db.insert(Point(t("2024-01-01T00:30:00Z"), "late", Map(), Map("v" -> 1.0)))
      // the late-inserted point is LAST in _seq order despite its time
      assert(db.all(sorted = false).map(_.measurement) ==
        Seq("therm", "therm", "cpu", "late"))
      db.compact()
      assert(db.all(sorted = false).map(_.measurement) ==
        Seq("therm", "therm", "cpu", "late"))
    }
  }

  describe("crash windows (no misread commit — the manifest is the only authority)") {
    it("a commit whose manifest publish never landed is invisible, and vacuum reclaims it") {
      val root = freshRoot()
      val db = GraftDB.atPath(spark, root)
      seedPoints(db)
      val localRoot = root.stripPrefix("flaky:")
      def manifests() = new java.io.File(localRoot, "_manifest").listFiles()
        .filter(!_.getName.startsWith(".")).map(_.getName.toLong).sorted.toSeq
      def commitDirs() = new java.io.File(localRoot).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("c-")).map(_.getName).toSet
      val headBefore = manifests().last
      val dirsBefore = commitDirs()
      // the dying writer: data dir + _files fully written, process dies
      // before the manifest publish — simulated by appending and then
      // deleting the published manifest (bit-identical on-disk state)
      db.insert(Point(t("2024-01-09T00:00:00Z"), "ghost", Map(), Map("v" -> 1.0)))
      assert(new java.io.File(s"$localRoot/_manifest/${headBefore + 1}").delete())
      val orphans = commitDirs() -- dirsBefore
      assert(orphans.size == 1, "the dead append's commit dir is on disk")
      // a fresh reader resolves the old head: the orphan is INVISIBLE
      val reader = GraftDB.atPath(spark, root)
      assert(reader.length == 3)
      assert(reader.searchDF(MeasurementQuery() === "ghost").count() == 0)
      // vacuum (grace 0) reclaims the orphan; live data untouched
      reader.storage.asInstanceOf[ManifestStorage].vacuum(graceMs = 0L)
      assert((commitDirs() -- dirsBefore).isEmpty, "orphan commit dir reclaimed")
      assert(reader.length == 3)
    }

    it("a partially-landed foreign directory (non-atomic rename debris) is invisible to readers") {
      val root = freshRoot()
      val db = GraftDB.atPath(spark, root)
      seedPoints(db)
      val localRoot = root.stripPrefix("flaky:")
      // debris: a half-copied commit-shaped dir with a torn parquet
      // file and no _files list — a directory-listing reader would
      // trip on it; a manifest reader never visits it
      val debris = new java.io.File(localRoot, "c-0000-partial-rename")
      debris.mkdirs()
      Files.write(new java.io.File(debris, "part-00000.snappy.parquet").toPath,
        Array[Byte](0x50, 0x41, 0x52)) // "PAR" — torn, no footer
      val reader = GraftDB.atPath(spark, root)
      assert(reader.length == 3)
      assert(reader.df.agg(sum(element_at(col(Point.FieldsCol), "temp"))).head().getDouble(0)
        == 138.0)
    }

    it("a torn manifest (no terminator) is skipped by readers and stepped past by committers") {
      val root = freshRoot()
      val db = GraftDB.atPath(spark, root)
      // the torn slot below is a DEAD claimant's; shrink the in-flight
      // grace so the committer's step-past is immediate in the test
      spark.conf.set("graft.storage.manifestStalePublishMs", "1")
      seedPoints(db)
      val localRoot = root.stripPrefix("flaky:")
      val head = new java.io.File(localRoot, "_manifest").listFiles()
        .filter(!_.getName.startsWith(".")).map(_.getName.toLong).max
      // a dying writer's torn manifest at head+1: valid-looking C line,
      // missing terminator
      Files.write(new java.io.File(s"$localRoot/_manifest/${head + 1}").toPath,
        "C c-does-not-exist".getBytes("UTF-8"))
      val reader = GraftDB.atPath(spark, root)
      assert(reader.length == 3, "torn manifest must not be trusted")
      // the next committer steps PAST the torn slot instead of stalling
      try {
        reader.insert(Point(t("2024-01-05T00:00:00Z"), "cpu", Map("host" -> "b"),
          Map("load" -> 0.7)))
      } finally spark.conf.unset("graft.storage.manifestStalePublishMs")
      assert(reader.length == 4)
      val gens = new java.io.File(localRoot, "_manifest").listFiles()
        .filter(!_.getName.startsWith(".")).map(_.getName.toLong)
      assert(gens.max == head + 2, "new commit lands beyond the dead slot")
    }
  }

  describe("concurrency") {
    it("two handles: appends from both land; a stale overwrite fails loudly") {
      val root = freshRoot()
      val h1 = GraftDB.atPath(spark, root)
      val h2 = GraftDB.atPath(spark, root)
      seedPoints(h1)
      h1.df.count() // h1 loads (observes the head)
      val s1 = h1.storage.asInstanceOf[ManifestStorage]
      val snap = s1.load() // h1 observes the head HERE
      // h2 commits between h1's load and h1's overwrite
      h2.insert(Point(t("2024-01-06T00:00:00Z"), "cpu", Map("host" -> "c"),
        Map("load" -> 0.9)))
      intercept[java.util.ConcurrentModificationException] {
        s1.overwrite(snap.limit(0))
      }
      // both handles' appends are visible to a fresh read
      assert(GraftDB.atPath(spark, root).length == 4)
    }

    it("idempotent appends dedup by token across handles and survive compaction") {
      val root = freshRoot()
      val h1 = GraftDB.atPath(spark, root)
      val batch = Seq((t("2024-01-07T00:00:00Z"), "m")).toDF("a", "b")
        .select(col("a").as(Point.TimeCol), col("b").as(Point.MeasurementCol),
          map().cast("map<string,string>").as(Point.TagsCol),
          map(lit("v"), lit(1.0)).as(Point.FieldsCol))
      assert(h1.storage.appendIdempotent(batch, "tok-1"))
      assert(!h1.storage.appendIdempotent(batch, "tok-1"), "replay must no-op")
      val h2 = GraftDB.atPath(spark, root)
      assert(!h2.storage.appendIdempotent(batch, "tok-1"),
        "replay from another handle must see the durable token")
      h2.compact()
      assert(!h2.storage.hasIngestCommit("tok-0"))
      assert(h2.storage.hasIngestCommit("tok-1"), "tokens survive compaction")
      assert(h2.length == 1)
    }
  }

  describe("layout guards (mixed-format opens refuse instead of reading empty)") {
    it("a rename-committing store cannot open as a manifest store, and vice versa") {
      // parquet-layout store opened in manifest mode → loud refusal
      // (silently reading as empty would hide ALL existing data)
      val proot = Files.createTempDirectory("graftmixp").toString + "/db"
      val pdb = GraftDB.atPath(spark, proot)
      seedPoints(pdb)
      val e1 = intercept[IllegalArgumentException] {
        GraftDB.atManifest(spark, proot)
      }
      assert(e1.getMessage.contains("rename-committing"))
      // manifest-layout store opened by the rename backend → same
      val mroot = Files.createTempDirectory("graftmixm").toString + "/db"
      val mdb = GraftDB.atManifest(spark, mroot)
      seedPoints(mdb)
      val e2 = intercept[IllegalArgumentException] {
        new ParquetStorage(spark, mroot)
      }
      assert(e2.getMessage.contains("MANIFEST-authoritative"))
    }
  }

  describe("publish race (two committers, one slot)") {
    it("a committer stalled past the stale window re-links its stepped-past commit (no lost ack)") {
      val root = freshRoot()
      val dbA = GraftDB.atPath(spark, root)
      seedPoints(dbA)
      // shrink the stale window so the stall is test-sized; the stall
      // itself stands in for a GC pause / VM freeze between claim and
      // content close
      spark.conf.set("graft.storage.manifestStalePublishMs", "50")
      try {
        val log = dbA.storage.asInstanceOf[ManifestStorage].log
        @volatile var stalledGen = -1L
        log.publishPauseHook = Some { gen =>
          log.publishPauseHook = None // only the first publish stalls
          stalledGen = gen
          Thread.sleep(150) // stall past the 50ms stale window
          // a second committer now sees a STALE contentless claim,
          // steps past it, and publishes against the OLD head —
          // exactly the window that silently unlinked the stalled
          // commit before the post-publish re-link guard
          GraftDB.atPath(spark, root).insert(Point(
            t("2024-02-01T00:00:00Z"), "stepper", Map(), Map("v" -> 1.0)))
        }
        dbA.insert(Point(t("2024-02-02T00:00:00Z"), "stalled", Map(), Map("v" -> 2.0)))
        assert(stalledGen > 0, "the pause hook must have fired")
      } finally spark.conf.unset("graft.storage.manifestStalePublishMs")
      val got = GraftDB.atPath(spark, root).all().map(_.measurement).toSet
      assert(got.contains("stepper"), s"stepper's commit lost: $got")
      assert(got.contains("stalled"),
        s"the stalled committer acknowledged success but its commit is unlinked: $got")
    }

    it("a check-then-PUT clobber is detected by the read-back and the append re-links") {
      // model a connector WITHOUT conditional create: claims can
      // double-win; the read-back after content close must detect the
      // foreign overwrite and report the publish as LOST, and the
      // commit loop must then re-link at the next slot
      val dir = new Path("flaky:" + Files.createTempDirectory("graftrb").toString + "/_m")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val log = new graft.util.ManifestLog(fs, dir, () => 30000L,
        exclusiveClaims = false)
      assert(log.tryPublish(1L, Seq("C base")), "uncontended publish wins")
      val localDir = dir.toUri.getPath
      log.publishedHook = Some { gen =>
        log.publishedHook = None
        // the racer's later PUT lands after our content close
        Files.write(new java.io.File(localDir, gen.toString).toPath,
          "C racer\nE 1".getBytes("UTF-8"))
      }
      assert(!log.tryPublish(2L, Seq("C base", "C ours")),
        "clobbered slot must read as a LOST publish, not an ack")
      // the commuting commit loop retries and re-links at slot 3
      log.commitRetry(
        build = (_, recs) =>
          if (recs.contains("C ours")) None else Some(recs :+ "C ours"),
        linked = _.contains("C ours"))
      val (g, recs) = log.head().get
      assert(g == 3L && recs.contains("C ours") && recs.contains("C racer"),
        s"both the racer's and our commit must survive: gen=$g recs=$recs")
    }

    it("concurrent appends from racing threads all survive — no lost manifest") {
      val root = freshRoot()
      // two handles hammer appends concurrently; every appended row
      // must be in the final state (a tmp+rename publish on local fs
      // would let both racers of one slot 'win' — POSIX rename
      // replaces — and silently drop one acknowledged commit)
      val h1 = GraftDB.atPath(spark, root)
      val h2 = GraftDB.atPath(spark, root)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def appender(h: GraftDB, tag: String) = new Thread(() => {
        try (0 until 6).foreach { i =>
          h.insert(Point(t("2024-01-01T00:00:00Z"), s"$tag$i", Map(), Map("v" -> 1.0)))
        } catch { case e: Throwable => errs.add(e) }
      })
      val ts = Seq(appender(h1, "a"), appender(h2, "b"))
      ts.foreach(_.start()); ts.foreach(_.join(120000))
      assert(errs.isEmpty, s"appender failed: ${errs.peek()}")
      val got = GraftDB.atPath(spark, root).all().map(_.measurement).toSet
      val want = (0 until 6).flatMap(i => Seq(s"a$i", s"b$i")).toSet
      assert(got == want, s"lost commits: missing ${want -- got}")
    }
  }

  describe("engine integration") {
    it("the columnar index tier works over the manifest backend (reindex, patch, invalidate)") {
      val db = GraftDB.atPath(spark, freshRoot(), autoIndex = false)
      seedPoints(db)
      db.reindex()
      assert(db.indexValid)
      // indexed read
      assert(db.count(TagQuery("room") === "kit") == 1)
      // in-order append extends the live index through appendDelta's
      // reproducible plan (same hook ParquetStorage provides)
      db.insert(Point(t("2024-01-04T00:00:00Z"), "therm", Map("room" -> "den"),
        Map("temp" -> 66.0)))
      assert(db.count(MeasurementQuery() === "therm") == 3)
      // a literal update patches the index in place and persists
      assert(db.update(TagQuery("room") === "den", fields = Map("temp" -> 67.0)) == 1)
      assert(db.searchDF(FieldQuery("temp") === 67.0).count() == 1)
      // a fresh handle sees the mutated state (all through the manifest)
      assert(GraftDB.atPath(spark, freshRoot()).length == 0) // unrelated store
    }

    it("the idempotent-token ring evicts beyond the window through the REAL manifest path") {
      val root = freshRoot()
      // shrink the ring via the conf seam so the eviction exercises the
      // production render/parse/ring machinery (MaxTokens real appends
      // through Spark would take minutes; the seam changes ONLY the
      // window size, not the code path)
      spark.conf.set("graft.storage.manifestMaxTokens", "3")
      try {
        val s = GraftDB.atPath(spark, root).storage.asInstanceOf[ManifestStorage]
        val batch = Seq((t("2024-01-07T00:00:00Z"), "m")).toDF("a", "b")
          .select(col("a").as(Point.TimeCol), col("b").as(Point.MeasurementCol),
            map().cast("map<string,string>").as(Point.TagsCol),
            map(lit("v"), lit(1.0)).as(Point.FieldsCol))
        assert(s.appendIdempotent(batch, "tok-old"))
        assert(s.hasIngestCommit("tok-old"))
        (1 to 3).foreach(i => assert(s.appendIdempotent(batch, s"tok-$i")))
        assert(!s.hasIngestCommit("tok-old"),
          "oldest token must fall out of the published ring")
        (1 to 3).foreach(i => assert(s.hasIngestCommit(s"tok-$i")))
        // an OUT-OF-WINDOW replay re-applies — the documented contract
        // boundary (a checkpointed stream never replays that far back)
        assert(s.appendIdempotent(batch, "tok-old"))
        assert(GraftDB.atPath(spark, root).length == 5)
      } finally spark.conf.unset("graft.storage.manifestMaxTokens")
    }
  }

  describe("vacuum") {
    it("keeps everything referenced by the retained manifest window, drops the rest") {
      val root = freshRoot()
      val db = GraftDB.atPath(spark, root)
      seedPoints(db)
      db.insert(Point(t("2024-01-08T00:00:00Z"), "cpu", Map(), Map("load" -> 1.0)))
      db.compact() // supersedes both append commits
      val localRoot = root.stripPrefix("flaky:")
      def commitDirs() = new java.io.File(localRoot).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("c-")).map(_.getName).toSet
      assert(commitDirs().size == 3, "two append dirs + one folded dir before vacuum")
      // an UNGRACED vacuum must keep everything: a reader that listed
      // the manifest dir a moment ago may still be reading an old gen
      def manifests() = new java.io.File(localRoot, "_manifest").listFiles()
        .filter(!_.getName.startsWith(".")).length
      val before = manifests()
      db.storage.asInstanceOf[ManifestStorage]
        .vacuum(graceMs = 3600000L, keepManifests = 0)
      assert(manifests() == before, "grace must protect young manifests too")
      assert(commitDirs().size == 3)
      // window of 0 older manifests + no grace: only the head survives
      db.storage.asInstanceOf[ManifestStorage].vacuum(graceMs = 0L, keepManifests = 0)
      assert(commitDirs().size == 1, "superseded commit dirs reclaimed")
      assert(db.length == 4, "live data untouched")
      assert(GraftDB.atPath(spark, root).length == 4)
    }
  }
}
