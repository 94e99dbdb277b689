package graft

import org.apache.spark.sql.functions._

import graft.analytics.Dedup

/** Ground-truth checks for the dedup family — especially the
  * hash-based operators (MinHash LSH, SimHash) that the SQL oracle
  * cannot replicate.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the door"
  private val nearDup = base.replace("warm", "cold") // 1-word edit
  private val nearDup2 = base.replace("quick", "fast").replace("door", "gate")
  private val unrelated =
    "spark executes distributed dataframe plans with catalyst optimizing predicate pushdown and column pruning everywhere"
  private val unrelated2 =
    "minhash signatures approximate jaccard similarity between shingled token sets using seeded hash permutations"

  private lazy val docs = Seq(
    (0L, base), (1L, nearDup), (2L, nearDup2), (3L, unrelated), (4L, unrelated2), (5L, base)
  ).toDF("doc_id", "text")

  describe("exact dedup") {
    it("keeps one survivor per identical text") {
      val ids = Dedup.exactSurvivorIds(docs, Seq("text"), "doc_id")
        .as[Long].collect().sorted
      assert(ids.toSeq == Seq(0L, 1L, 2L, 3L, 4L)) // 5 is a dup of 0
    }
    it("exact() keeps full rows") {
      assert(Dedup.exact(docs, Seq("text"), "doc_id").count() == 5)
    }
  }

  describe("incremental dedup against a persisted digest store") {
    it("new batches dedup in-batch then against everything already ingested") {
      val store = java.nio.file.Files.createTempDirectory("graftdig").toString + "/digests"
      val day1 = Seq((0L, "alpha"), (1L, "beta")).toDF("doc_id", "text")
      Dedup.appendDigestStore(day1, Seq("text"), store)
      // day 2: one cross-batch dup, one in-batch dup pair, one novel
      val day2 = Seq((10L, "alpha"), (11L, "gamma"), (12L, "gamma"), (13L, "beta"))
        .toDF("doc_id", "text")
      val surv2 = Dedup.dedupAgainstStore(day2, Seq("text"), "doc_id", store)
        .as[Long].collect().toSet
      assert(surv2 == Set(11L))
      // the store accretes day 2 — day 3 sees both days' digests
      Dedup.appendDigestStore(day2, Seq("text"), store)
      val day3 = Seq((20L, "gamma"), (21L, "delta")).toDF("doc_id", "text")
      val surv3 = Dedup.dedupAgainstStore(day3, Seq("text"), "doc_id", store)
        .as[Long].collect().toSet
      assert(surv3 == Set(21L))
    }

    it("bloom sidecar: a non-colliding batch SKIPS the store scan, results identical") {
      val store = java.nio.file.Files.createTempDirectory("graftdigsc").toString + "/digests"
      val day1 = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")).toDF("doc_id", "text")
      Dedup.appendDigestStore(day1, Seq("text"), store, batchTag = 1L, sidecar = true)
      // disjoint batch: the sidecar proves no collision is possible
      val clean = Seq((10L, "delta"), (11L, "epsilon"), (12L, "delta")).toDF("doc_id", "text")
      val guarded = Dedup.dedupAgainstStore(clean, Seq("text"), "doc_id", store,
        useSidecar = true)
      // the RETURNED PLAN contains no store relation at all
      assert(!guarded.queryExecution.sparkPlan.toString.contains("digests"),
        "skip path must not scan the digest store")
      assert(guarded.as[Long].collect().toSet ==
        Dedup.dedupAgainstStore(clean, Seq("text"), "doc_id", store)
          .as[Long].collect().toSet)
      // colliding batch: guard falls through to the exact anti-join
      val dirty = Seq((20L, "alpha"), (21L, "zeta")).toDF("doc_id", "text")
      val g2 = Dedup.dedupAgainstStore(dirty, Seq("text"), "doc_id", store,
        useSidecar = true)
      assert(g2.queryExecution.sparkPlan.toString.contains("digests"))
      assert(g2.as[Long].collect().toSet == Set(21L))
      // sidecar stays current across appends: delta is in the store now
      Dedup.appendDigestStore(clean, Seq("text"), store, batchTag = 2L, sidecar = true)
      val d3 = Seq((30L, "delta"), (31L, "eta")).toDF("doc_id", "text")
      assert(Dedup.dedupAgainstStore(d3, Seq("text"), "doc_id", store, useSidecar = true)
        .as[Long].collect().toSet == Set(31L))
    }

    it("scratch lifecycle: a scoped digest store is deleted when its scope closes") {
      val keep = graft.util.Scratch.dir("graftdigkeep") // unrelated dir survives
      val storePath = graft.util.Scratch.withDir("graftdiglife") { d =>
        val store = s"$d/digests"
        Dedup.appendDigestStore(Seq((0L, "alpha")).toDF("doc_id", "text"),
          Seq("text"), store, batchTag = 1L, sidecar = true)
        val surv = Dedup.dedupAgainstStore(
          Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"),
          Seq("text"), "doc_id", store, useSidecar = true)
          .as[Long].collect().toSet
        assert(surv === Set(2L))
        assert(new java.io.File(store).exists())
        d
      }
      // the scope closed after the result materialized: dir gone NOW,
      // not at JVM exit
      assert(!new java.io.File(storePath).exists(),
        s"scoped scratch dir survived its scope: $storePath")
      assert(new java.io.File(keep).exists(), "release must not touch other dirs")
      graft.util.Scratch.release(keep)
      assert(!new java.io.File(keep).exists())
    }

    it("a stale sidecar (append without sidecar refresh) falls back to the exact anti-join") {
      val store = java.nio.file.Files.createTempDirectory("graftdigstale").toString + "/digests"
      Dedup.appendDigestStore(Seq((0L, "alpha"), (1L, "beta")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 1L, sidecar = true)
      // append WITHOUT refreshing the sidecar: the store now holds a
      // digest the bit array knows nothing about
      Dedup.appendDigestStore(Seq((2L, "gamma")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 2L, sidecar = false)
      // probe collides ONLY with the un-sidecarred digest — a guard that
      // trusted the stale sidecar would skip the scan and let the
      // duplicate through (a bloom false NEGATIVE)
      val probe = Seq((10L, "gamma"), (11L, "novel")).toDF("doc_id", "text")
      val out = Dedup.dedupAgainstStore(probe, Seq("text"), "doc_id", store,
        useSidecar = true)
      assert(out.queryExecution.sparkPlan.toString.contains("digests"),
        "stale sidecar must void the skip guard — plan should scan the store")
      assert(out.as[Long].collect().toSet == Set(11L))
      // a sidecar-refreshing append restores the fingerprint match and
      // the skip path for genuinely clean batches
      Dedup.appendDigestStore(Seq((3L, "delta")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 3L, sidecar = true)
      val clean = Seq((20L, "epsilon")).toDF("doc_id", "text")
      val g = Dedup.dedupAgainstStore(clean, Seq("text"), "doc_id", store,
        useSidecar = true)
      assert(!g.queryExecution.sparkPlan.toString.contains("digests"))
      assert(g.as[Long].collect().toSet == Set(20L))
    }

    it("a pre-canonicalization sidecar (no key_order stamp) is stale — never trusted for a skip") {
      val store = java.nio.file.Files.createTempDirectory("graftdigko").toString + "/digests"
      Dedup.appendDigestStore(Seq((0L, "alpha"), (1L, "beta")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 1L, sidecar = true)
      // Simulate a sidecar written BEFORE the key_order stamp existed:
      // the store_fp is correct (it passes the fingerprint check — that
      // only proves file coverage), but its bits were set under a
      // different key-column order. Model the worst case — every probe
      // tests negative (all-zero words): a guard that trusted it would
      // skip the anti-join and silently admit the duplicate of "alpha".
      val sc = spark.read.parquet(store + "_bloom")
        .select("bits", "k", "words", "store_fp").head()
      Seq((sc.getInt(0), sc.getInt(1), Seq.fill(sc.getInt(0) / 64)(0L), sc.getString(3)))
        .toDF("bits", "k", "words", "store_fp")
        .coalesce(1).write.mode("overwrite").parquet(store + "_bloom")
      val probe = Seq((10L, "alpha"), (11L, "novel")).toDF("doc_id", "text")
      val out = Dedup.dedupAgainstStore(probe, Seq("text"), "doc_id", store,
        useSidecar = true)
      assert(out.queryExecution.sparkPlan.toString.contains("digests"),
        "un-stamped sidecar must read as stale — the guard must scan the store")
      assert(out.as[Long].collect().toSet == Set(11L))
    }

    it("a pre-canonicalization PER-PREFIX sidecar is equally stale (prefix pruning survives)") {
      val store = java.nio.file.Files.createTempDirectory("graftdigkop").toString + "/digests"
      Dedup.appendDigestStore(Seq((0L, "alpha"), (1L, "beta")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 1L, sidecar = true, prefixLen = 1)
      val rows = spark.read.parquet(store + "_bloom")
        .select("bits", "k", "words", "store_fp", "prefix").collect()
      rows.map(r => (r.getInt(0), r.getInt(1), Seq.fill(r.getInt(0) / 64)(0L),
          r.getString(3), r.getString(4))).toSeq
        .toDF("bits", "k", "words", "store_fp", "prefix")
        .coalesce(1).write.mode("overwrite").parquet(store + "_bloom")
      val probe = Seq((10L, "alpha"), (11L, "novel")).toDF("doc_id", "text")
      val out = Dedup.dedupAgainstStore(probe, Seq("text"), "doc_id", store,
        useSidecar = true)
      assert(out.queryExecution.sparkPlan.toString.contains("digests"),
        "un-stamped per-prefix sidecar must read as stale — the guard must scan")
      assert(out.as[Long].collect().toSet == Set(11L))
    }

    it("migrateDigestStore: a flat store re-homes to the partitioned layout mid-lifecycle") {
      val store = java.nio.file.Files.createTempDirectory("graftdigmig").toString + "/digests"
      // q169-shaped flat lifecycle: two sidecar-refreshing appends
      Dedup.appendDigestStore(Seq((0L, "alpha"), (1L, "beta")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 1L, sidecar = true)
      Dedup.appendDigestStore(Seq((2L, "gamma")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 2L, sidecar = true)
      assert(Dedup.digestStoreLayout(spark, store).contains(0))
      // one call: flat → prefixLen=2, marker + per-prefix sidecar rebuilt
      Dedup.migrateDigestStore(spark, store, prefixLen = 2)
      assert(Dedup.digestStoreLayout(spark, store).contains(2))
      // survivor-set parity: everything ingested pre-migration still dedups
      val probe = Seq((10L, "alpha"), (11L, "gamma"), (12L, "novel"))
        .toDF("doc_id", "text")
      assert(Dedup.dedupAgainstStore(probe, Seq("text"), "doc_id", store)
        .as[Long].collect().toSet == Set(12L))
      // the rebuilt PER-PREFIX sidecar carries the zero-scan skip: a
      // clean batch's plan contains no store scan at all
      val clean = Seq((20L, "epsilon")).toDF("doc_id", "text")
      val g = Dedup.dedupAgainstStore(clean, Seq("text"), "doc_id", store,
        useSidecar = true)
      assert(!g.queryExecution.sparkPlan.toString.contains("digests"),
        "post-migration per-prefix sidecar must restore the zero-scan skip")
      assert(g.as[Long].collect().toSet == Set(20L))
      // idempotent at the target layout; deepening is the same call;
      // migrating BACK to flat is refused (strictly less capable)
      Dedup.migrateDigestStore(spark, store, prefixLen = 2)
      assert(Dedup.digestStoreLayout(spark, store).contains(2))
      intercept[IllegalArgumentException] {
        Dedup.migrateDigestStore(spark, store, prefixLen = 0)
      }
      // post-migration appends + compaction keep the layout and results
      Dedup.appendDigestStore(Seq((30L, "zeta")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 3L, sidecar = true)
      Dedup.compactDigestStore(spark, store)
      assert(Dedup.digestStoreLayout(spark, store).contains(2))
      assert(Dedup.dedupAgainstStore(
          Seq((40L, "zeta"), (41L, "eta")).toDF("doc_id", "text"),
          Seq("text"), "doc_id", store, useSidecar = true)
        .as[Long].collect().toSet == Set(41L))
    }

    it("dir-shape layout fallback rejects impossible prefix lengths instead of adopting them") {
      val store = java.nio.file.Files.createTempDirectory("graftdiglay").toString + "/digests"
      assert(new java.io.File(store + "/__kp=pdeadbeef").mkdirs())
      val e = intercept[IllegalArgumentException] {
        Dedup.digestStoreLayout(spark, store)
      }
      assert(e.getMessage.contains("impossible layout"))
    }

    it("a sized-up sidecar keeps the skip alive where the default would saturate") {
      // deterministic corpus big enough to exercise sizing without
      // saturating either config outright: 4000 distinct digests
      val n = 4000
      val hist = spark.range(n).selectExpr("concat('doc-', id) AS text")
      val probe = spark.range(200)
        .selectExpr("id AS doc_id", "concat('novel-', id) AS text")
      def rateAt(bits: Int): Double = {
        val store = java.nio.file.Files.createTempDirectory(s"graftdigsz$bits")
          .toString + "/digests"
        Dedup.appendDigestStore(hist, Seq("text"), store,
          batchTag = 1L, sidecar = true, sidecarBits = bits)
        val r = Dedup.sidecarMightHitRate(probe, Seq("text"), store)
        assert(r.isDefined, s"no trusted sidecar at bits=$bits")
        // the skip guard agrees with the rate: zero rate = no store scan
        val g = Dedup.dedupAgainstStore(probe, Seq("text"), "doc_id", store,
          useSidecar = true)
        if (r.get == 0.0)
          assert(!g.queryExecution.sparkPlan.toString.contains("digests"))
        assert(g.as[Long].collect().size == 200)
        r.get
      }
      // tiny sidecar: heavily loaded by 4000 digests → high false-hit
      // rate; the sized-up sidecar drops it by orders of magnitude
      val small = rateAt(1 << 12) // 4096 bits for 4000 digests: saturated
      val big = rateAt(1 << 20)   // ~0.4% loaded
      assert(small > 0.5, s"small sidecar unexpectedly sparse: $small")
      assert(big < 0.05, s"sized-up sidecar still hot: $big")
      // out-of-range sizes fail loudly
      intercept[IllegalArgumentException] {
        Dedup.appendDigestStore(hist, Seq("text"),
          java.nio.file.Files.createTempDirectory("graftdigbad").toString + "/d",
          sidecar = true, sidecarBits = 63)
      }
    }

    it("compaction folds appends to one file; retention re-admits expired digests") {
      val store = java.nio.file.Files.createTempDirectory("graftdigc").toString + "/digests"
      Dedup.appendDigestStore(Seq((0L, "old1"), (1L, "old2")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 1L, sidecar = true)
      Dedup.appendDigestStore(Seq((2L, "new1")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 2L, sidecar = true)
      // a digest re-seen in a later batch carries the LATER tag
      Dedup.appendDigestStore(Seq((3L, "old1")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 3L, sidecar = true)
      def files(): Int = new java.io.File(store).listFiles()
        .count(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      assert(files() >= 3)
      // full-history compact: file count collapses, behavior unchanged
      Dedup.compactDigestStore(spark, store)
      assert(files() == 1)
      val probe = Seq((40L, "old2"), (41L, "novel")).toDF("doc_id", "text")
      assert(Dedup.dedupAgainstStore(probe, Seq("text"), "doc_id", store, useSidecar = true)
        .as[Long].collect().toSet == Set(41L))
      // retention at tag >= 2: old2 (last seen tag 1) is forgotten and
      // re-admitted; old1 (re-seen at tag 3) is retained and still dedups
      Dedup.compactDigestStore(spark, store, retainMinTag = Some(2L))
      val probe2 = Seq((50L, "old1"), (51L, "old2"), (52L, "new1")).toDF("doc_id", "text")
      assert(Dedup.dedupAgainstStore(probe2, Seq("text"), "doc_id", store, useSidecar = true)
        .as[Long].collect().toSet == Set(51L))
    }
  }

  describe("prefix-partitioned digest store") {
    import org.apache.spark.sql.execution.FileSourceScanExec

    // the store's scans in the (pre-AQE) physical plan, for counting
    // which partitions survived pruning
    def storeScans(df: org.apache.spark.sql.DataFrame,
        store: String): Seq[FileSourceScanExec] =
      df.queryExecution.sparkPlan.collectLeaves().collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.endsWith(store)) => f
      }

    it("full lifecycle parity with the flat layout (appends, sidecar, compact, retention)") {
      val base = java.nio.file.Files.createTempDirectory("graftdigpfx").toString
      val flat = s"$base/flat"
      val part = s"$base/part"
      val day1 = spark.range(40).selectExpr("id AS doc_id", "concat('d1-', id % 30) AS text")
      val day2 = spark.range(40, 80)
        .selectExpr("id AS doc_id", "concat('d1-', id % 45) AS text")
      val day3 = spark.range(80, 120)
        .selectExpr("id AS doc_id", "concat('d1-', id % 60) AS text")
      def run(store: String, prefixLen: Int): Seq[Set[Long]] = {
        Dedup.appendDigestStore(day1, Seq("text"), store,
          batchTag = 1L, sidecar = true, prefixLen = prefixLen)
        val s2 = Dedup.dedupAgainstStore(day2, Seq("text"), "doc_id", store,
          useSidecar = true).as[Long].collect().toSet
        Dedup.appendDigestStore(day2, Seq("text"), store, batchTag = 2L, sidecar = true)
        Dedup.compactDigestStore(spark, store)
        val s3 = Dedup.dedupAgainstStore(day3, Seq("text"), "doc_id", store,
          useSidecar = true).as[Long].collect().toSet
        Dedup.compactDigestStore(spark, store, retainMinTag = Some(2L))
        val s3b = Dedup.dedupAgainstStore(day3, Seq("text"), "doc_id", store,
          useSidecar = true).as[Long].collect().toSet
        Seq(s2, s3, s3b)
      }
      assert(run(part, prefixLen = 1) == run(flat, prefixLen = 0))
      // the layouts really are what we asked for
      assert(new java.io.File(part).listFiles().exists(_.getName.startsWith("__kp=p")))
      assert(!new java.io.File(flat).listFiles().exists(_.getName.startsWith("__kp=")))
    }

    it("anti-join store side is pruned to the batch's touched prefixes") {
      val store = java.nio.file.Files.createTempDirectory("graftdigprune")
        .toString + "/digests"
      // enough digests that all 16 len-1 prefixes are populated
      val hist = spark.range(2000).selectExpr("concat('h-', id) AS text")
      Dedup.appendDigestStore(hist, Seq("text"), store, batchTag = 1L, prefixLen = 1)
      assert(new java.io.File(store).listFiles()
        .count(_.getName.startsWith("__kp=p")) == 16)
      // a one-row batch touches exactly one prefix — WITHOUT a sidecar
      // the scan must still read only that partition
      val one = Seq((0L, "h-7")).toDF("doc_id", "text")
      val df = Dedup.dedupAgainstStore(one, Seq("text"), "doc_id", store)
      val scans = storeScans(df, store)
      assert(scans.nonEmpty, df.queryExecution.sparkPlan.toString)
      assert(scans.map(_.selectedPartitions.partitionCount).sum == 1,
        s"expected 1 scanned partition of 16: ${scans.map(_.selectedPartitions.partitionCount)}")
      assert(df.as[Long].collect().isEmpty) // it IS a duplicate
      // the pruning is a static partition filter, visible in the plan
      assert("PartitionFilters: \\[[^\\]]*__kp".r
        .findFirstIn(df.queryExecution.executedPlan.toString).isDefined ||
        df.queryExecution.sparkPlan.toString.contains("__kp"),
        df.queryExecution.sparkPlan.toString)
    }

    it("per-prefix sidecar: clean batch scans nothing; one collision scans one partition") {
      val store = java.nio.file.Files.createTempDirectory("graftdigppsc")
        .toString + "/digests"
      val hist = spark.range(2000).selectExpr("concat('h-', id) AS text")
      Dedup.appendDigestStore(hist, Seq("text"), store,
        batchTag = 1L, sidecar = true, prefixLen = 1)
      // clean batch spanning many prefixes: every prefix ruled out →
      // the returned plan contains NO store scan at all
      val clean = spark.range(200)
        .selectExpr("id AS doc_id", "concat('novel-', id) AS text")
      val g = Dedup.dedupAgainstStore(clean, Seq("text"), "doc_id", store,
        useSidecar = true)
      assert(storeScans(g, store).isEmpty,
        "clean batch against per-prefix sidecars must skip the store entirely")
      assert(g.as[Long].collect().length == 200)
      assert(Dedup.sidecarMightHitRate(clean, Seq("text"), store).contains(0.0))
      // one real duplicate: the scan comes back but only for the
      // colliding digest's prefix — the other 15 partitions stay pruned
      val dirty = clean.union(Seq((999L, "h-42")).toDF("doc_id", "text"))
      val g2 = Dedup.dedupAgainstStore(dirty, Seq("text"), "doc_id", store,
        useSidecar = true)
      // Catalyst may push the anti-join below the batch's Union and
      // clone the store scan per branch — every clone must still be
      // pruned to the single colliding prefix
      val scans = storeScans(g2, store)
      assert(scans.nonEmpty)
      assert(scans.forall(_.selectedPartitions.partitionCount == 1),
        s"one collision must scan one partition per store scan: " +
          s"${scans.map(_.selectedPartitions.partitionCount)}")
      assert(g2.as[Long].collect().length == 200) // h-42 dropped
    }

    it("layout mismatch on append fails loudly; auto adopts the existing layout") {
      val store = java.nio.file.Files.createTempDirectory("graftdigmix")
        .toString + "/digests"
      Dedup.appendDigestStore(Seq((0L, "alpha")).toDF("doc_id", "text"),
        Seq("text"), store, prefixLen = 2)
      intercept[IllegalArgumentException] {
        Dedup.appendDigestStore(Seq((1L, "beta")).toDF("doc_id", "text"),
          Seq("text"), store, prefixLen = 0)
      }
      intercept[IllegalArgumentException] {
        Dedup.appendDigestStore(Seq((1L, "beta")).toDF("doc_id", "text"),
          Seq("text"), store, prefixLen = 1)
      }
      // AutoPrefixLen follows the store's own layout
      Dedup.appendDigestStore(Seq((1L, "beta")).toDF("doc_id", "text"),
        Seq("text"), store)
      assert(Dedup.dedupAgainstStore(
        Seq((2L, "alpha"), (3L, "beta"), (4L, "novel")).toDF("doc_id", "text"),
        Seq("text"), "doc_id", store).as[Long].collect().toSet == Set(4L))
      // out-of-range lengths rejected
      intercept[IllegalArgumentException] {
        Dedup.appendDigestStore(Seq((5L, "x")).toDF("doc_id", "text"),
          Seq("text"), java.nio.file.Files.createTempDirectory("graftdigbadp")
            .toString + "/d", prefixLen = 4)
      }
    }

    it("a stale per-prefix sidecar voids the skip but keeps the prefix pruning") {
      val store = java.nio.file.Files.createTempDirectory("graftdigppstale")
        .toString + "/digests"
      Dedup.appendDigestStore(Seq((0L, "alpha"), (1L, "beta")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 1L, sidecar = true, prefixLen = 1)
      // un-sidecarred append: fingerprint mismatch voids the guard
      Dedup.appendDigestStore(Seq((2L, "gamma")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 2L, sidecar = false)
      val probe = Seq((10L, "gamma"), (11L, "novel")).toDF("doc_id", "text")
      val out = Dedup.dedupAgainstStore(probe, Seq("text"), "doc_id", store,
        useSidecar = true)
      // the guard fell back — but the scan is STILL pruned to the
      // batch's touched prefixes, never the whole store
      val scans = storeScans(out, store)
      assert(scans.nonEmpty, "stale sidecar must fall back to the anti-join")
      assert(scans.forall(_.selectedPartitions.partitionCount <= 2))
      assert(out.as[Long].collect().toSet == Set(11L))
      assert(Dedup.sidecarMightHitRate(probe, Seq("text"), store).isEmpty)
      // a sidecar-refreshing append rebuilds trust (covers gamma too)
      Dedup.appendDigestStore(Seq((3L, "delta")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 3L, sidecar = true)
      val clean = Seq((20L, "epsilon")).toDF("doc_id", "text")
      val g = Dedup.dedupAgainstStore(clean, Seq("text"), "doc_id", store,
        useSidecar = true)
      assert(storeScans(g, store).isEmpty)
      assert(g.as[Long].collect().toSet == Set(20L))
      // and gamma (absorbed by the rebuild) now dedups under the guard
      assert(Dedup.dedupAgainstStore(Seq((30L, "gamma")).toDF("doc_id", "text"),
        Seq("text"), "doc_id", store, useSidecar = true)
        .as[Long].collect().isEmpty)
    }

    it("composite keys partition on the combined digest and stay correct") {
      val store = java.nio.file.Files.createTempDirectory("graftdigpck")
        .toString + "/digests"
      val d1 = Seq((0L, "a", "x"), (1L, "a", "y")).toDF("doc_id", "t1", "t2")
      Dedup.appendDigestStore(d1, Seq("t1", "t2"), store,
        batchTag = 1L, sidecar = true, prefixLen = 2)
      val probe = Seq((10L, "a", "x"), (11L, "b", "x"), (12L, "a", "z"))
        .toDF("doc_id", "t1", "t2")
      assert(Dedup.dedupAgainstStore(probe, Seq("t1", "t2"), "doc_id", store,
        useSidecar = true).as[Long].collect().toSet == Set(11L, 12L))
      // key ORDER must not matter: the partition prefix and the bloom
      // positions derive from the name-sorted combined key, so a reader
      // passing (t2, t1) prunes the same partitions and probes the same
      // bits — a caller-order key would prune the WRONG partitions and
      // let the (a, x) duplicate through silently
      assert(Dedup.dedupAgainstStore(probe, Seq("t2", "t1"), "doc_id", store,
        useSidecar = true).as[Long].collect().toSet == Set(11L, 12L))
      assert(Dedup.dedupAgainstStore(probe, Seq("t2", "t1"), "doc_id", store)
        .as[Long].collect().toSet == Set(11L, 12L))
    }

    it("null-key digests land in the empty prefix without corrupting layout detection") {
      val store = java.nio.file.Files.createTempDirectory("graftdignull")
        .toString + "/digests"
      val d1 = Seq((0L, "alpha"), (1L, null.asInstanceOf[String]))
        .toDF("doc_id", "text")
      Dedup.appendDigestStore(d1, Seq("text"), store, batchTag = 1L,
        sidecar = true, prefixLen = 2)
      // the null digest writes `__kp=p` (empty prefix) — detection must
      // still read prefixLen=2, not "flat", or the next auto append
      // would silently mix layouts
      assert(Dedup.digestStoreLayout(spark, store).contains(2))
      Dedup.appendDigestStore(Seq((2L, "beta")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 2L, sidecar = true)
      assert(new java.io.File(store).listFiles()
        .count(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_")) == 0, "appends must stay partitioned")
      // null keys never join (SQL null semantics) — both null rows
      // survive, real duplicates still drop; same algebra as flat
      val probe = Seq((10L, "alpha"), (11L, null.asInstanceOf[String]), (12L, "new"))
        .toDF("doc_id", "text")
      assert(Dedup.dedupAgainstStore(probe, Seq("text"), "doc_id", store,
        useSidecar = true).as[Long].collect().toSet == Set(11L, 12L))
    }

    it("a retention compaction that drops every row keeps the partitioned layout") {
      val store = java.nio.file.Files.createTempDirectory("graftdigempty")
        .toString + "/digests"
      Dedup.appendDigestStore(Seq((0L, "old")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 1L, sidecar = true, prefixLen = 2)
      // horizon beyond every tag: the whole store expires — the swap
      // must still commit, the (empty) rebuild must not throw, and the
      // LAYOUT must survive via the marker (zero-row partitioned writes
      // leave no partition dirs to detect from)
      Dedup.compactDigestStore(spark, store, retainMinTag = Some(99L))
      assert(Dedup.digestStoreLayout(spark, store).contains(2),
        "empty compaction must not silently reset the layout to flat")
      // dedup against the empty store: everything survives, no crash
      val probe = Seq((10L, "old"), (11L, "new")).toDF("doc_id", "text")
      assert(Dedup.dedupAgainstStore(probe, Seq("text"), "doc_id", store,
        useSidecar = true).as[Long].collect().toSet == Set(10L, 11L))
      // and the next auto append re-populates PARTITIONED
      Dedup.appendDigestStore(Seq((20L, "fresh")).toDF("doc_id", "text"),
        Seq("text"), store, batchTag = 2L, sidecar = true)
      assert(new java.io.File(store).listFiles().exists(_.getName.startsWith("__kp=p")))
      assert(Dedup.dedupAgainstStore(
        Seq((30L, "fresh"), (31L, "other")).toDF("doc_id", "text"),
        Seq("text"), "doc_id", store, useSidecar = true)
        .as[Long].collect().toSet == Set(31L))
    }
  }

  describe("block-level span dedup") {
    it("first occurrence (min doc, then min position) survives; later copies don't") {
      val spans = Seq(
        (1L, "a b c d e f"),   // blocks (a b c)(d e f): both novel
        (2L, "a b c x y z"),   // (a b c) already owned by doc 1
        (3L, "d e f a b c"),   // both blocks seen -> nothing kept
        (4L, "a b c a b c")    // both copies lose to doc 1's block
      ).toDF("doc_id", "text")
      val out = Dedup.blockDedupStats(spans, "doc_id", "text", blockLen = 3)
        .orderBy("doc_id")
        .select("doc_id", "n_blocks", "n_kept").as[(Long, Long, Long)].collect().toSeq
      assert(out == Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 0L), (4L, 2L, 0L)))
    }
    it("a short tail block is its own span; in-doc duplicates keep only the first") {
      val spans = Seq((7L, "p q r p q r p")).toDF("doc_id", "text")
      // blocks: (p q r)(p q r)(p) — the repeat loses to position 0, the tail is novel
      val out = Dedup.blockDedupStats(spans, "doc_id", "text", blockLen = 3).head()
      assert((out.getLong(1), out.getLong(2)) == ((3L, 2L)))
    }
  }

  describe("repeated-span excision (substring-level dedup)") {
    it("cuts every position covered by a corpus-repeated window, keeps the rest in order") {
      val docs = Seq(
        (0L, "a b c d e"),        // "a b c"/"b c d" repeat in doc 1 -> only "e" survives
        (1L, "x a b c d y"),      // covered {1,2,3,4} -> "x y"
        (2L, "zz ww"),            // shorter than the span: untouched
        (3L, "m n o p m n o p")   // self-repeat covers everything -> ""
      ).toDF("doc_id", "text")
      val out = Dedup.exciseRepeatedSpans(docs, "doc_id", "text", spanLen = 3)
        .orderBy("id")
        .select("id", "n_tokens", "n_dup_tokens", "cleaned_text")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(out == Seq(
        (0L, 5L, 4L, "e"),
        (1L, 6L, 4L, "x y"),
        (2L, 2L, 0L, "zz ww"),
        (3L, 8L, 8L, "")))
    }

    it("cross-corpus variant cuts only eval-set spans — in-corpus repeats survive") {
      val train = Seq(
        (0L, "a b c d e"),        // "a b c" is in eval -> cut {0,1,2} -> "d e"
        (1L, "p q r p q r"),      // repeats IN-corpus but not in eval: untouched
        (2L, "z a b c d")         // covered {1,2,3} -> "z d"
      ).toDF("doc_id", "text")
      val eval = Seq((0L, "x y a b c")).toDF("eval_id", "text")
      val out = Dedup.exciseContaminatedSpans(train, "doc_id", "text", eval, "text", spanLen = 3)
        .orderBy("id")
        .select("id", "n_tokens", "n_dup_tokens", "cleaned_text")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(out == Seq(
        (0L, 5L, 3L, "d e"),
        (1L, 6L, 0L, "p q r p q r"),
        (2L, 5L, 3L, "z d")))
    }

    it("null text is an empty doc, not a poisoned row") {
      val docs = Seq((0L, "a b c a b c"), (1L, null.asInstanceOf[String]))
        .toDF("doc_id", "text")
      val out = Dedup.exciseRepeatedSpans(docs, "doc_id", "text", spanLen = 3)
        .orderBy("id")
        .select("id", "n_tokens", "n_dup_tokens", "cleaned_text")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(out == Seq((0L, 6L, 6L, ""), (1L, 0L, 0L, "")))
    }

    it("matches a driver-side reference interpreter on random high-collision corpora") {
      // tiny vocabulary + short docs => dense span collisions, hitting
      // every branch (no-gram docs, fully-excised docs, partial cuts,
      // in-doc repeats); the reference implementation is the spec
      val rnd = new scala.util.Random(11)
      val vocab = Vector("a", "b", "c", "d", "e")
      val spanLen = 3
      val corpus = (0L until 60L).map { id =>
        val n = rnd.nextInt(12) // 0..11 tokens
        (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // reference: count every span occurrence corpus-wide, cover, cut
      val toks = corpus.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toVector
      }.toMap
      val occ = scala.collection.mutable.Map.empty[String, Int]
      for ((_, w) <- toks; p <- 0 to w.size - spanLen)
        occ(w.slice(p, p + spanLen).mkString(" ")) =
          occ.getOrElse(w.slice(p, p + spanLen).mkString(" "), 0) + 1
      val expect = corpus.map { case (id, _) =>
        val w = toks(id)
        val covered = (0 to w.size - spanLen)
          .filter(p => occ(w.slice(p, p + spanLen).mkString(" ")) >= 2)
          .flatMap(p => p until p + spanLen).toSet
        val cleaned = w.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        (id, w.size.toLong, covered.size.toLong, cleaned.mkString(" "))
      }
      val got = Dedup.exciseRepeatedSpans(
        corpus.toDF("doc_id", "text").repartition(7), "doc_id", "text", spanLen)
        .orderBy("id")
        .select("id", "n_tokens", "n_dup_tokens", "cleaned_text")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(got === expect)
    }
  }

  describe("n-gram jaccard") {
    it("exact pairwise jaccard finds the planted near-dups and nothing else") {
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(pairs.contains((0L, 5L))) // identical
      assert(pairs.contains((0L, 1L))) // 1-word edit
      assert(!pairs.exists { case (i, j) => Set(i, j).intersect(Set(3L, 4L)).nonEmpty && Set(i, j).intersect(Set(0L, 1L, 2L, 5L)).nonEmpty })
    }
  }

  describe("document-frequency cutoff") {
    it("drops corpus-wide tokens so posting lists stay bounded; near-dups survive") {
      // plant a stopword in EVERY doc: without a cutoff it alone links
      // all 6 docs pairwise
      val noisy = docs.withColumn("text", concat(col("text"), lit(" corpusstopword")))
      val unfiltered = Dedup.ngramJaccardPairs(noisy, "doc_id", "text", n = 1, threshold = 0.01)
      assert(unfiltered.count() == 15) // all C(6,2) pairs meet via the stopword
      val cut = Dedup.ngramJaccardPairs(noisy, "doc_id", "text", n = 1, threshold = 0.5,
        maxDocFreq = Some(5))
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(cut.contains((0L, 5L)) && cut.contains((0L, 1L))) // real near-dups kept
      assert(!cut.exists { case (i, j) => Set(i, j) == Set(3L, 4L) }) // unrelated not linked
    }
  }

  describe("minhash LSH") {
    it("recalls high-jaccard pairs found by the exact operator") {
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.7)
        .select("i", "j").as[(Long, Long)].collect().toSet
      val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 128, bands = 32, threshold = 0.5)
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(exact.nonEmpty)
      assert(exact.subsetOf(lsh), s"missed: ${exact.diff(lsh)}")
    }
    it("estimated jaccard for identical docs is 1.0") {
      val est = Dedup.minHashLshPairs(docs, "doc_id", "text", threshold = 0.5)
        .filter(col("i") === 0 && col("j") === 5)
        .select("est_jaccard").as[Double].head()
      assert(est == 1.0)
    }
  }

  describe("simhash") {
    it("identical docs have identical fingerprints; unrelated docs are distant") {
      val fp = Dedup.simHash(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fp(0L) == fp(5L))
      val ham = java.lang.Long.bitCount(fp(0L) ^ fp(3L))
      assert(ham > 10, s"unrelated docs too close: hamming=$ham")
    }
    it("pair generation finds the identical pair at hamming 0") {
      val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(pairs.contains((0L, 5L)))
    }
    it("banding recall is 1 for the declared radius, including pairs beyond hamming 3") {
      // Regression: the old fixed 4x16-bit banding silently dropped
      // pairs at hamming 4..maxHamming that differed in all 4 bands.
      // Bands are now derived from the radius, so recall must be exact.
      import spark.implicits._
      val rnd = new scala.util.Random(11)
      val vocab = Array.tabulate(60)(i => s"w$i")
      val simDocs = Seq.tabulate(40) { i =>
        // overlapping windows into the vocab -> a spread of hamming distances
        val words = (0 until 30).map(k => vocab((i + k * (1 + i % 3)) % vocab.length))
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val fp = Dedup.simHash(simDocs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val h = 10
      val expect = (for {
        i <- fp.keys; j <- fp.keys if i < j
        d = java.lang.Long.bitCount(fp(i) ^ fp(j)) if d <= h
      } yield (i, j)).toSet
      assert(expect.exists { case (i, j) => java.lang.Long.bitCount(fp(i) ^ fp(j)) > 3 },
        "test is vacuous: no planted pair beyond hamming 3")
      val got = Dedup.simHashPairs(simDocs, "doc_id", "text", maxHamming = h)
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(got == expect, s"missed ${expect.diff(got)}, extra ${got.diff(expect)}")
    }
  }

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)), // cos ≈ 0.995 with 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),  // orthogonal to 0
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f))  // opposite of 0
    ).toDF("vec_id", "embedding")
  }

  describe("embedding cosine near-dup") {
    it("dense-kernel pairs above threshold (exact)") {
      val pairs = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding", threshold = 0.9)
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(pairs == Set((0L, 1L)))
    }
    it("eps-grid pairs above threshold (exact, recall 1)") {
      val pairs = Dedup.epsGridCosinePairs(vecs, "vec_id", "embedding", threshold = 0.9)
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(pairs == Set((0L, 1L)))
    }
    it("string ids are first-class in the dense kernel") {
      val sv = Seq(
        ("doc-a", Array(1.0f, 0.0f, 0.0f, 0.0f)),
        ("doc-b", Array(0.99f, 0.1f, 0.0f, 0.0f)),
        ("doc-c", Array(0.0f, 1.0f, 0.0f, 0.0f))
      ).toDF("vec_id", "embedding")
      val pairs = Dedup.embeddingCosinePairs(sv, "vec_id", "embedding", threshold = 0.9)
        .select("i", "j").as[(String, String)].collect().toSet
      assert(pairs == Set(("doc-a", "doc-b")))
    }
    it("SemDeDup survivors: within-cell smaller-id domination, cross-cell pairs ignored") {
      // two labeled clusters on the axes; 1 dominates 2 (cos ~0.999),
      // 4 dominates 5; 3 sits in cluster A at cos(1,3) ~0.7 < 0.9 so it
      // survives; cross-cell cosines never pair (5 vs 1 shares no cell)
      val sv = Seq(
        (1L, Array(1.0f, 0.0f), 0),
        (2L, Array(0.999f, 0.04f), 0),
        (3L, Array(0.7f, 0.714f), 0),
        (4L, Array(0.0f, 1.0f), 1),
        (5L, Array(0.04f, 0.999f), 1)
      ).toDF("vec_id", "embedding", "label")
      val cents = graft.analytics.Similarity.centroids(
        sv.select(col("label"),
          graft.functions.VectorFunctions.l2Normalize(col("embedding")).as("nv")),
        "label", "nv")
      val out = Dedup.semanticDedup(sv, cents, "vec_id", "embedding", threshold = 0.9)
        .select("id").as[Long].collect().toSet
      assert(out == Set(1L, 3L, 4L))
    }
    it("approximate sign-LSH variant keeps the same near-dup pair") {
      val pairs = Dedup.approxCosinePairsLsh(vecs, "vec_id", "embedding",
        threshold = 0.9, lshBits = 4)
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(pairs == Set((0L, 1L))) // near-identical vectors share all sign buckets
    }
    it("eps-grid recall matches brute force on random vectors") {
      import spark.implicits._
      val rnd = new scala.util.Random(7)
      val many = Seq.tabulate(120)(i =>
        (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
      val grid = Dedup.epsGridCosinePairs(many, "vec_id", "embedding", threshold = 0.7)
        .select("i", "j").as[(Long, Long)].collect().toSet
      // brute-force oracle computed driver-side
      val rows = many.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
        d / (na * nb)
      }
      val brute = (for {
        (i, va) <- rows; (j, vb) <- rows if i < j && cos(va, vb) >= 0.7
      } yield (i, j)).toSet
      assert(grid == brute, s"grid missed ${brute.diff(grid)}, extra ${grid.diff(brute)}")
      val kernel = Dedup.embeddingCosinePairs(many, "vec_id", "embedding", threshold = 0.7)
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(kernel == brute, s"kernel missed ${brute.diff(kernel)}, extra ${kernel.diff(brute)}")
    }
  }

  describe("decontamination (cross-corpus n-gram overlap)") {
    it("flags the corpus doc containing a benchmark phrase, not unrelated docs") {
      import spark.implicits._
      val corpus = Seq(
        (0L, base),                                    // contains the eval phrase wholesale
        (1L, unrelated),
        (2L, "totally different content about nothing shared with benchmarks at all today")
      ).toDF("doc_id", "text")
      val ev = Seq((100L, base)).toDF("eval_id", "text") // the benchmark doc
      val got = Dedup.contaminationPairs(corpus, "doc_id", "text", ev, "eval_id", "text",
        n = 3, minShared = 3)
        .select("cid", "eid").as[(Long, Long)].collect().toSet
      assert(got == Set((0L, 100L)))
    }
    it("corpus-side doc-frequency guard drops boilerplate n-grams") {
      import spark.implicits._
      val boiler = "standard license header text"
      val corpus = Seq.tabulate(10)(i => (i.toLong, s"$boiler unique body $i here now"))
        .toDF("doc_id", "text")
      val ev = Seq((100L, boiler)).toDF("eval_id", "text")
      // the boilerplate 3-grams appear in all 10 docs > maxDocFreq=5 -> no flags
      val guarded = Dedup.contaminationPairs(corpus, "doc_id", "text", ev, "eval_id", "text",
        n = 3, minShared = 1, maxDocFreq = Some(5)).count()
      assert(guarded == 0)
      // without the guard every doc flags
      val unguarded = Dedup.contaminationPairs(corpus, "doc_id", "text", ev, "eval_id", "text",
        n = 3, minShared = 1).count()
      assert(unguarded == 10)
    }
  }

  describe("unbounded-posting safety net") {
    it("measures the hottest posting list and survives the warning path unchanged") {
      import spark.implicits._
      val docs = Seq(
        (1L, "common alpha"), (2L, "common beta"), (3L, "common gamma"),
        (4L, "common delta"), (5L, "rare epsilon")).toDF("doc_id", "text")
      // the measurement the guard reports: 'common' posts in 4 docs
      val postings = docs.select(col("doc_id").as("id"),
        explode(Dedup.wordShingles(col("text"), 1)).as("tok"))
      // hottest token 'common' posts in 4 docs; total join price is the
      // exact F2: 4² + six singleton tokens (alpha..delta, rare, epsilon)
      assert(Dedup.maxPostingDocFreq(postings, "tok") == ((4L, 16L + 6L)))
      // force the >=bytes path (var is test-visible) and confirm the
      // maxDocFreq=None join still returns the same pairs — the guard
      // warns, never mutates results
      val before = Dedup.exactPostingWarnBytes
      try {
        val expected = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 1, threshold = 0.3)
          .select("i", "j").as[(Long, Long)].collect().toSet
        Dedup.exactPostingWarnBytes = 0L
        val guarded = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 1, threshold = 0.3)
          .select("i", "j").as[(Long, Long)].collect().toSet
        assert(guarded == expected)
        val w = Dedup.winnowOverlapPairs(docs, "doc_id", "text", k = 3, w = 4, minShared = 1)
        assert(w.count() >= 0) // winnow path exercises the guard too
      } finally Dedup.exactPostingWarnBytes = before
    }
  }

  describe("connected components") {
    it("labels clusters by min member and converges on dense near-dup graphs") {
      import spark.implicits._
      val nodes = (0L to 6L).toDF("doc_id")
      // two clusters {0,1,2,3} (star around 1) and {5,6}; 4 isolated
      val edges = Seq((1L, 0L), (1L, 2L), (1L, 3L), (5L, 6L)).toDF("i", "j")
      val got = Dedup.connectedComponents(nodes, "doc_id", edges, "i", "j")
        .as[(Long, Long)].collect().toMap
      assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
    }
    it("ids introduced by edges alone count as moved (no premature convergence)") {
      import spark.implicits._
      // 5 is absent from `nodes` and bridges 0 and 2. In round 0 the
      // ONLY movement is 5's first appearance (prev = null); if null
      // didn't count as moved, the loop would exit with 2 still in its
      // own component — silently under-merged.
      val nodes = Seq(0L, 1L, 2L).toDF("doc_id")
      val edges = Seq((0L, 5L), (5L, 2L)).toDF("i", "j")
      val got = Dedup.connectedComponents(nodes, "doc_id", edges, "i", "j")
        .as[(Long, Long)].collect().toMap
      assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 5L -> 0L))
    }

    it("the fused convergence check beats a join-form check's stage budget") {
      import spark.implicits._
      // private[spark] members compile to public bytecode, so the
      // listener bus is reachable reflectively: drain it BETWEEN runs
      // deterministically instead of Thread.sleep guesses.
      def drainBus(): Unit = {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethods.find(m =>
            m.getName == "waitUntilEmpty" && m.getParameterCount == 0) match {
          case Some(m) => m.invoke(bus); ()
          case None =>
            bus.getClass.getMethods
              .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 1)
              .get.invoke(bus, java.lang.Long.valueOf(30000L)); ()
        }
      }
      def countStages(f: => Unit): Int = {
        val stages = new java.util.concurrent.atomic.AtomicInteger(0)
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageSubmitted(
              s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
            stages.incrementAndGet(); ()
          }
        }
        drainBus()
        spark.sparkContext.addSparkListener(listener)
        try { f; drainBus() }
        finally spark.sparkContext.removeSparkListener(listener)
        stages.get()
      }
      val nodes = (0L to 5L).toDF("doc_id")
      val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L)).toDF("i", "j")
      // The OLD shape the fusion replaced: identical label-propagation
      // rounds, but convergence is checked by a SEPARATE two-sided
      // shuffle join + count per round. Re-built here as the
      // same-session baseline so the assertion is relative (immune to
      // planner/AQE stage-count drift across Spark versions), not a
      // hardcoded absolute.
      def joinFormCC(): Unit = {
        val bidir = edges.select(col("i").as("a"), col("j").as("b"))
          .union(edges.select(col("j").as("a"), col("i").as("b"))).distinct().cache()
        var labels = nodes.select(col("doc_id").as("id"))
          .withColumn("component", col("id")).localCheckpoint()
        var changed = 1L
        var round = 0
        while (changed > 0 && round < 50) {
          val msgs = bidir.join(labels.withColumnRenamed("id", "a"), "a")
            .select(col("b").as("id"), col("component"))
          val next = labels.select("id", "component").unionByName(msgs)
            .groupBy("id").agg(min("component").as("component"))
          // the separate convergence job re-executes the round's whole
          // aggregate inside the join before the checkpoint job runs it
          // again — exactly the double work the fused check eliminated
          changed = next.as("n").join(labels.as("o"), "id")
            .filter(col("n.component") =!= col("o.component")).count()
          labels = next.localCheckpoint()
          round += 1
        }
        bidir.unpersist(); ()
      }
      // warm both paths once so one-time planning/codegen stages don't
      // land in either measured run
      Dedup.connectedComponents(nodes, "doc_id", edges, "i", "j").count()
      joinFormCC()
      val fused = countStages {
        Dedup.connectedComponents(nodes, "doc_id", edges, "i", "j").count()
      }
      val joinForm = countStages { joinFormCC() }
      assert(fused > 0 && fused < joinForm,
        s"fused convergence check submitted $fused stages vs join-form $joinForm — " +
          "the per-round count should ride the round's aggregate, not a separate join")
    }

    it("pointer jumping converges a 200-node chain in O(log diameter) rounds") {
      import spark.implicits._
      val n = 200
      val nodes = (0L until n.toLong).toDF("doc_id")
      val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("i", "j")
      // pure min-propagation needs ~n rounds on a path graph; with the
      // round-3+ pointer jump, label chains halve each round — a
      // maxRounds this small only passes with the jump in effect
      val got = Dedup.connectedComponents(nodes, "doc_id", edges, "i", "j", maxRounds = 20)
        .as[(Long, Long)].collect()
      assert(got.length == n && got.forall(_._2 == 0L))
    }
  }
}
