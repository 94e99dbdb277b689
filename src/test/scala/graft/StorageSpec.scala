package graft

import java.nio.file.Files
import java.time.Instant

import graft.engine.{GraftDB, ParquetStorage}
import graft.model.Point
import graft.query._

/** ParquetStorage scale mechanics: predicate pushdown into the scan,
  * delta-tier appends, compaction into the partitioned store.
  */
class StorageSpec extends SparkSpec {

  // deterministic physical aging for the deferred-drop specs: the
  // production time floor (snapshot prune grace) is off here; the
  // hammer spec raises it locally to model a slow concurrent reader
  spark.conf.set("graft.storage.snapshotDropGraceMs", "0")

  private def t(s: String): Instant = Instant.parse(s)

  private def seeded(): (GraftDB, String) = {
    val dir = Files.createTempDirectory("graftstore").toString
    val db = GraftDB.atPath(spark, dir)
    db.insertMultiple(Seq(
      Point(t("2024-01-01T01:00:00Z"), "therm", Map("room" -> "bed"), Map("temp" -> 70.0)),
      Point(t("2024-01-02T01:00:00Z"), "therm", Map("room" -> "kit"), Map("temp" -> 68.0)),
      Point(t("2024-01-03T01:00:00Z"), "cpu", Map("host" -> "a"), Map("load" -> 0.5))))
    (db, dir)
  }

  describe("predicate pushdown evidence") {
    it("time predicates reach the parquet scan as PushedFilters") {
      val (db, _) = seeded()
      val plan = db.searchDF(TimeQuery() >= t("2024-01-02T00:00:00Z"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters:") &&
        plan.contains("GreaterThanOrEqual(time"), s"no time pushdown in:\n$plan")
    }
    it("compacted store scans prune on the measurement partition column") {
      val (db, _) = seeded()
      db.compact()
      val plan = db.searchDF(MeasurementQuery() === "cpu")
        .queryExecution.executedPlan.toString
      // partition filter, not a data filter: measurement is a dir column
      assert(plan.contains("PartitionFilters:") && plan.contains("measurement"),
        s"no partition pruning in:\n$plan")
      assert(db.count(MeasurementQuery() === "cpu") == 1)
    }
  }

  describe("delta tier + compaction") {
    it("appends land in delta/, compact folds them into a fold generation as ONE dir rename, contents unchanged") {
      val (db, dir) = seeded()
      assert(Files.exists(java.nio.file.Paths.get(dir, "delta")))
      assert(!Files.exists(java.nio.file.Paths.get(dir, "data")))
      def folds() = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.matches("fold-\\d+")).toSeq
      val before = db.all().map(p => (p.time, p.measurement, p.tags, p.fields))
      db.compact()
      // the fold commits as one version-named directory (O(1) renames),
      // never a per-file rename into data/
      assert(folds().size == 1)
      assert(db.all().map(p => (p.time, p.measurement, p.tags, p.fields)) == before)
      // the folded delta files are DEFERRED drops (a reader mid-scan
      // keeps its snapshot); one further maintenance tick ages them out
      // and prunes the emptied delta dir
      db.compact()
      assert(!Files.exists(java.nio.file.Paths.get(dir, "delta")))
      assert(folds().size == 1)
      // appends after compaction go back to the delta tier and unify;
      // a SECOND fold subsumes the first generation
      db.insert(Point(t("2024-01-04T01:00:00Z"), "cpu", Map("host" -> "b"), Map("load" -> 0.9)))
      assert(db.length == 4)
      assert(Files.exists(java.nio.file.Paths.get(dir, "delta")))
      val gen1 = folds().head.getName
      db.compact()
      db.compact() // age the superseded generation's drops out
      assert(folds().size == 1 && folds().head.getName != gen1,
        "a re-fold must supersede and prune the previous generation")
      assert(db.length == 4)
    }
    it("recovers from a crash mid-swap (primary renamed to backup, staging orphaned)") {
      val (db, dir) = seeded()
      db.compact()
      val before = db.all().map(p => (p.time, p.measurement, p.tags, p.fields))
      // simulate the crash window inside overwrite(): tiers moved to
      // backups (post-compact the store lives in a fold generation),
      // replacement never renamed into place
      val fold = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.matches("fold-\\d+")).head.getName
      java.nio.file.Files.move(
        java.nio.file.Paths.get(dir, fold),
        java.nio.file.Paths.get(dir, s".backup-$fold"))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, ".staging-dead"))
      // reopening runs recover(): backups restored, staging dropped
      val again = GraftDB.atPath(spark, dir)
      assert(again.all().map(p => (p.time, p.measurement, p.tags, p.fields)) == before)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, s".backup-$fold")))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, ".staging-dead")))
    }

    it("clears a stale snapshot-meta chain left by a post-swap overwrite crash") {
      val (db, dir) = seeded()
      // an overwrite (any user rewrite) commits: data/ present, chain gone
      db.update(MeasurementQuery() === "cpu", fields = Map("load" -> 0.7))
      val before = db.all().map(p => (p.time, p.measurement, p.tags, p.fields))
      // simulate the crash window AFTER the staging→data commit point
      // but BEFORE the cleanup finished: a backup still on disk (the
      // post-swap signature) and the pre-overwrite snapshot chain never
      // deleted — its fenced paths died with the swapped-out dirs
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir, ".backup-data"))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "_snapmeta"))
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_snapmeta", "3"),
        s"D ${java.net.URLEncoder.encode(s"file:$dir/delta/long-gone.parquet", "UTF-8")}\n"
          .getBytes("UTF-8"))
      // reopen: recover() sees data present + backup present → the
      // overwrite had committed, so the stale chain must drain NOW (not
      // linger as per-load meta reads until some later maintenance tick)
      val again = GraftDB.atPath(spark, dir)
      assert(again.all().map(p => (p.time, p.measurement, p.tags, p.fields)) == before)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_snapmeta")),
        "stale post-overwrite snapshot chain must be cleared at recovery")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, ".backup-data")))
    }

    it("auto-compaction bounds the delta tier's file count under sustained appends") {
      val dir = Files.createTempDirectory("graftautocompact").toString
      val st = new ParquetStorage(spark, dir, partitioned = true,
        autoCompactFiles = 8)
      val db = new GraftDB(st)
      (1 to 20).foreach { i =>
        db.insert(Point(t(f"2024-01-${i}%02dT00:00:00Z"), "m",
          Map("host" -> s"h${i % 3}"), Map("v" -> i.toDouble)))
      }
      // one delta file per append without the policy would leave 20;
      // the threshold-8 policy compacts at every 8th, so ≤ 8 LIVE remain
      val files = st.liveDeltaFileCount()
      assert(files <= 8, s"delta holds $files live files after 20 appends")
      // superseded files awaiting their deferred physical delete are
      // bounded too: at most the last compaction's replaced set
      val delta = new java.io.File(s"$dir/delta")
      val raw = if (!delta.exists) 0
        else delta.listFiles.count(f =>
          f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      assert(raw <= 16, s"delta holds $raw raw files (pending-drop garbage unbounded?)")
      // nothing lost, insertion order intact through both compactions
      assert(db.length == 20)
      val seqs = db.all(sorted = false).map(_._seq)
      assert(seqs == seqs.sorted && seqs.distinct.size == 20)
      assert(db.count(FieldQuery("v") === 20.0) == 1)
    }

    it("a fold commit crashed between meta publish and the dir-rename flip rolls forward") {
      // the O(1)-rename fold's only crash window: staging complete,
      // _snapmeta/<v> published (drops + the R dir-move line), process
      // died before the single staging→fold-<v> rename. Recovery must
      // execute the dir move FIRST (it is the commit's visibility
      // flip), or the generic .staging-* sweep would destroy the
      // entire folded store while the meta's drops still fence the
      // old delta files.
      val (db, dir) = seeded()
      val before = db.all().map(p => (p.time, p.measurement, p.tags, p.fields))
      db.close()
      val deltaFiles = Files.list(java.nio.file.Paths.get(dir, "delta")).toArray
        .map(_.toString).filter(_.endsWith(".parquet"))
      assert(deltaFiles.nonEmpty)
      // manufacture the window: stage a fold output, publish the plan
      val staging = s"$dir/.staging-fold-dead"
      spark.read.parquet(deltaFiles: _*)
        .coalesce(1).write.parquet(staging)
      val head = Files.list(java.nio.file.Paths.get(dir, "_versions")).toArray
        .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
        .filter(_.endsWith(".done")).map(_.stripSuffix(".done").toLong).max
      def enc(p: String) = java.net.URLEncoder.encode("file:" + p, "UTF-8")
      Files.createDirectories(java.nio.file.Paths.get(dir, "_snapmeta"))
      Files.write(java.nio.file.Paths.get(dir, "_snapmeta", head.toString),
        (s"R ${enc(staging)} ${enc(s"$dir/fold-$head")}\n" +
          deltaFiles.map(f => s"D ${enc(f)}").mkString("\n")).getBytes("UTF-8"))
      // handle open = recovery point: the dir move executes, the fold
      // generation is live, no rows lost
      val again = GraftDB.atPath(spark, dir)
      assert(again.all().map(p => (p.time, p.measurement, p.tags, p.fields)) == before,
        "the folded rows must survive the staging sweep")
      assert(Files.exists(java.nio.file.Paths.get(dir, s"fold-$head")))
      assert(!Files.exists(java.nio.file.Paths.get(dir, ".staging-fold-dead")))
    }

    it("recovers the delta tier from a crash mid-delta-compaction") {
      val dir = Files.createTempDirectory("graftdeltacrash").toString
      val db = GraftDB.atPath(spark, dir)
      (1 to 3).foreach { i =>
        db.insert(Point(t(f"2024-01-0${i}T00:00:00Z"), "m", Map(), Map("v" -> i.toDouble)))
      }
      val before = db.all().map(p => (p.time, p.fields))
      // simulate compactDelta dying between its two renames: delta moved
      // to backup, staged replacement never renamed into place
      java.nio.file.Files.move(
        java.nio.file.Paths.get(dir, "delta"),
        java.nio.file.Paths.get(dir, ".backup-delta"))
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir, ".staging-delta-dead"))
      val again = GraftDB.atPath(spark, dir)
      assert(again.all().map(p => (p.time, p.fields)) == before)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, ".backup-delta")))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, ".staging-delta-dead")))
    }

    it("reopening the directory sees the same data (insertion order kept)") {
      val (db, dir) = seeded()
      db.compact()
      db.insert(Point(t("2024-01-05T01:00:00Z"), "cpu", Map("host" -> "c"), Map("load" -> 1.5)))
      val again = GraftDB.atPath(spark, dir)
      assert(again.length == 4)
      assert(again.all(sorted = false).last.tags("host") == "c")
    }
  }

  describe("multi-handle commit safety (optimistic version chain)") {
    it("two handles appending concurrently lose nothing") {
      val dir = Files.createTempDirectory("graftmulti").toString
      val a = GraftDB.atPath(spark, dir)
      val b = GraftDB.atPath(spark, dir)
      val n = 12
      def writer(db: GraftDB, tag: String) = new Thread(() => {
        (0 until n).foreach { i =>
          db.insert(Point(t(f"2024-01-${i + 1}%02dT00:00:00Z"), "m",
            Map("w" -> tag), Map("v" -> i.toDouble)))
        }
      })
      val (ta, tb) = (writer(a, "a"), writer(b, "b"))
      ta.start(); tb.start(); ta.join(120000); tb.join(120000)
      assert(!ta.isAlive && !tb.isAlive)
      // every appended point survives, visible from a FRESH handle
      val again = GraftDB.atPath(spark, dir)
      assert(again.length == 2L * n)
      assert(again.count(TagQuery("w") === "a") == n)
      assert(again.count(TagQuery("w") === "b") == n)
    }

    it("a stale overwrite fails loudly instead of clobbering a concurrent commit") {
      val dir = Files.createTempDirectory("graftstale").toString
      val a = new ParquetStorage(spark, dir)
      val seedDb = GraftDB.atPath(spark, dir)
      seedDb.insert(Point(t("2024-01-01T00:00:00Z"), "m", Map(), Map("v" -> 1.0)))
      val stale = a.load() // A's view of the world, version observed here
      // B commits (an append) AFTER A's load
      val b = GraftDB.atPath(spark, dir)
      b.insert(Point(t("2024-01-02T00:00:00Z"), "m", Map(), Map("v" -> 2.0)))
      // A's swap would erase B's committed point — it must refuse
      intercept[java.util.ConcurrentModificationException] { a.overwrite(stale) }
      // nothing was destroyed; A reloads and can commit against fresh state
      val again = GraftDB.atPath(spark, dir)
      assert(again.length == 2)
      a.overwrite(a.load().filter(org.apache.spark.sql.functions
        .element_at(org.apache.spark.sql.functions.col(Point.FieldsCol), "v") =!= 1.0))
      assert(GraftDB.atPath(spark, dir).length == 1)
    }

    it("an append racing another handle's compaction survives") {
      val dir = Files.createTempDirectory("graftrace").toString
      val a = GraftDB.atPath(spark, dir)
      (1 to 6).foreach(i => a.insert(Point(t(f"2024-01-0${i}T00:00:00Z"), "m",
        Map(), Map("v" -> i.toDouble))))
      val b = GraftDB.atPath(spark, dir)
      val compactor = new Thread(() => a.compact())
      val appender = new Thread(() =>
        b.insert(Point(t("2024-02-01T00:00:00Z"), "m", Map(), Map("v" -> 99.0))))
      compactor.start(); appender.start()
      compactor.join(120000); appender.join(120000)
      assert(!compactor.isAlive && !appender.isAlive)
      val again = GraftDB.atPath(spark, dir)
      assert(again.length == 7)
      assert(again.count(FieldQuery("v") === 99.0) == 1)
    }

    it("mixed soak: two appenders + a compactor + a retrying mutator lose nothing") {
      val dir = Files.createTempDirectory("graftsoak").toString
      val a = GraftDB.atPath(spark, dir)
      val b = GraftDB.atPath(spark, dir)
      val c = GraftDB.atPath(spark, dir)
      val n = 8
      def appender(db: GraftDB, base: Int) = new Thread(() => {
        (0 until n).foreach { i =>
          db.insert(Point(t(f"2024-01-${i + 1}%02dT00:00:00Z"), "m",
            Map(), Map("v" -> (base + i).toDouble)))
        }
      })
      val compactor = new Thread(() => {
        (0 until 4).foreach { _ => c.compact(); Thread.sleep(30L) }
      })
      val ts = Seq(appender(a, 1000), appender(b, 2000), compactor)
      ts.foreach(_.start()); ts.foreach(_.join(180000))
      assert(ts.forall(!_.isAlive))
      // optimistic mutation: losers see ConcurrentModificationException
      // and retry against fresh state — never a silent clobber
      val mutator = GraftDB.atPath(spark, dir)
      var removed = -1L
      var attempts = 0
      while (removed < 0 && attempts < 10) {
        attempts += 1
        try removed = mutator.remove(FieldQuery("v") === 1000.0)
        catch { case _: java.util.ConcurrentModificationException => () }
      }
      assert(removed == 1L, s"remove landed $removed after $attempts attempts")
      val fresh = GraftDB.atPath(spark, dir)
      assert(fresh.length == 2L * n - 1)
      assert(fresh.count(FieldQuery("v") >= 2000.0) == n)
    }

    it("ingest-commit retention keeps recent tokens deduplicating; pruned history re-admits") {
      val dir = Files.createTempDirectory("graftprune").toString
      val st = new ParquetStorage(spark, dir)
      import spark.implicits._
      def batch(v: Double) = Seq((t("2024-01-01T00:00:00Z"),
        "m", Map.empty[String, String], Map("v" -> v)))
        .toDF(Point.TimeCol, Point.MeasurementCol, Point.TagsCol, Point.FieldsCol)
      // zero-padded tokens: lexicographic order == commit order
      (0 until 6).foreach(i => assert(st.appendIdempotent(batch(i), f"b$i%04d")))
      // retention only drops records whose token files have been folded
      // away — compact first (the no-compaction case is covered by the
      // prune-keeps-live-tokens spec); the fold's drops are deferred,
      // so one further tick ages the tok files out physically
      st.compact(); st.compact()
      st.pruneIngestCommits(keepLast = 2)
      // recent tokens still dedup; pruned history no longer does
      assert(!st.appendIdempotent(batch(5), "b0005"))
      assert(!st.appendIdempotent(batch(4), "b0004"))
      assert(st.appendIdempotent(batch(0), "b0000"))
    }

    it("a handle's own append does not launder the overwrite staleness check") {
      val dir = Files.createTempDirectory("graftstalelaunder").toString
      val a = new ParquetStorage(spark, dir)
      import spark.implicits._
      def batch(v: Double) = Seq((t("2024-01-01T00:00:00Z"),
        "m", Map.empty[String, String], Map("v" -> v)))
        .toDF(Point.TimeCol, Point.MeasurementCol, Point.TagsCol, Point.FieldsCol)
      a.append(batch(1.0))
      val stale = a.load() // A observes the world here (1 row)
      // B commits after A's load
      val b = GraftDB.atPath(spark, dir)
      b.insert(Point(t("2024-01-02T00:00:00Z"), "m", Map(), Map("v" -> 2.0)))
      // A's OWN append seals a newer version — it must NOT make A's
      // pre-B snapshot look current again (the lost-update laundering:
      // load@v1 → B commits v2 → own append seals v3 → overwrite(stale)
      // would erase B's row if the seal refreshed the observed version)
      a.append(batch(3.0))
      intercept[java.util.ConcurrentModificationException] { a.overwrite(stale) }
      // nothing was destroyed — B's commit and both appends survive
      val again = GraftDB.atPath(spark, dir)
      assert(again.length == 3)
      assert(again.count(FieldQuery("v") === 2.0) == 1)
      // a fresh load re-arms the handle: overwrite now succeeds
      a.overwrite(a.load())
      assert(GraftDB.atPath(spark, dir).length == 3)
    }

    it("commit retention orders by commit TIME, not token name (variable-width batch ids)") {
      val dir = Files.createTempDirectory("graftprunevw").toString
      val st = new ParquetStorage(spark, dir)
      import spark.implicits._
      def batch(v: Double) = Seq((t("2024-01-01T00:00:00Z"),
        "m", Map.empty[String, String], Map("v" -> v)))
        .toDF(Point.TimeCol, Point.MeasurementCol, Point.TagsCol, Point.FieldsCol)
      // lexicographically, "s-b10"/"s-b11" sort BEFORE "s-b9" — a
      // name-ordered prune would judge the two newest commits oldest,
      // drop one, and re-admit a post-crash replay of a recent batch
      assert(st.appendIdempotent(batch(9.0), "s-b9"))
      assert(st.appendIdempotent(batch(10.0), "s-b10"))
      assert(st.appendIdempotent(batch(11.0), "s-b11"))
      // fold token files so retention may act (+ one tick: the fold's
      // drops are deferred and must age out physically first)
      st.compact(); st.compact()
      st.pruneIngestCommits(keepLast = 2)
      assert(!st.appendIdempotent(batch(10.0), "s-b10"), "recent b10 must still dedup")
      assert(!st.appendIdempotent(batch(11.0), "s-b11"), "recent b11 must still dedup")
      assert(st.appendIdempotent(batch(9.0), "s-b9"), "only the oldest re-admits")
    }

    it("prune keeps records whose token files still live in the delta tier (no loss with purge)") {
      val dir = Files.createTempDirectory("graftprunepurge").toString
      val st = new ParquetStorage(spark, dir)
      import spark.implicits._
      def batch(v: Double) = Seq((t("2024-01-01T00:00:00Z"),
        "m", Map.empty[String, String], Map("v" -> v)))
        .toDF(Point.TimeCol, Point.MeasurementCol, Point.TagsCol, Point.FieldsCol)
      (0 until 4).foreach(i => assert(st.appendIdempotent(batch(i), f"t$i%02d")))
      // aggressive prune BEFORE any compaction: every token's data still
      // sits in the delta tier, so NO record may be dropped — otherwise
      // the next compaction's orphan purge would delete committed rows
      st.pruneIngestCommits(keepLast = 1)
      (0 until 4).foreach(i =>
        assert(!st.appendIdempotent(batch(i), f"t$i%02d"), s"t$i re-admitted while live"))
      // folds tok files away (+ one tick for the deferred physical
      // delete); rows preserved
      st.compact(); st.compact()
      assert(GraftDB.atPath(spark, dir).length == 4,
        "committed rows lost across prune + compaction")
      // with the delta tier folded AND aged out, retention drops history
      st.pruneIngestCommits(keepLast = 1)
      assert(st.appendIdempotent(batch(0), "t00"), "pruned token should re-admit")
      assert(!st.appendIdempotent(batch(3), "t03"), "newest token must survive")
    }

    it("legacy-token bridge: a pre-padding commit record dedups the padded replay") {
      val dir = Files.createTempDirectory("graftlegacy").toString
      val st = new ParquetStorage(spark, dir)
      import spark.implicits._
      val batch = Seq((t("2024-01-01T00:00:00Z"),
        "m", Map.empty[String, String], Map("v" -> 1.0)))
        .toDF(Point.TimeCol, Point.MeasurementCol, Point.TagsCol, Point.FieldsCol)
      // a batch committed under the OLD unpadded token format
      assert(st.appendIdempotent(batch, "up-b7"))
      // post-upgrade code asks about the legacy name before using the
      // padded one — the record is visible
      assert(st.hasIngestCommit("up-b7"))
      assert(!st.hasIngestCommit(f"up-b${7L}%012d"))
    }

    it("compaction purges uncommitted token files so a replay cannot double-append") {
      val dir = Files.createTempDirectory("grafttokorphan").toString
      val st = new ParquetStorage(spark, dir)
      import spark.implicits._
      def batch(v: Double) = Seq((t("2024-01-01T00:00:00Z"),
        "m", Map.empty[String, String], Map("v" -> v)))
        .toDF(Point.TimeCol, Point.MeasurementCol, Point.TagsCol, Point.FieldsCol)
      assert(st.appendIdempotent(batch(1.0), "tokA"))
      assert(st.appendIdempotent(batch(2.0), "other"))
      // simulate tokA's attempt crashing between the data rename and the
      // commit record: data present in delta, record absent
      assert(new java.io.File(s"$dir/_ingest_commits/tokA").delete())
      // compaction must NOT bake the orphan rows into anonymous merged
      // files (the replay could no longer find-and-repair them by name)
      st.compact()
      // the replay repairs and lands the batch exactly once
      assert(st.appendIdempotent(batch(1.0), "tokA"))
      val db = GraftDB.atPath(spark, dir)
      assert(db.length == 2, "orphan folded by compaction + replay = duplicate rows")
      assert(db.count(FieldQuery("v") === 1.0) == 1)
      assert(db.count(FieldQuery("v") === 2.0) == 1)
    }

    it("retention purges uncommitted token files so a replay cannot double-append") {
      val dir = Files.createTempDirectory("grafttokretain").toString
      val st = new ParquetStorage(spark, dir)
      import spark.implicits._
      // tokA's batch STRADDLES the retention cutoff: without the purge,
      // the straddler rewrite renames the orphan into retain-<token>-*
      // and the replay re-appends the whole batch — duplicating the
      // surviving row permanently
      def straddleBatch() = Seq(
        (t("2024-01-01T00:00:00Z"), "m", Map.empty[String, String], Map("v" -> 1.0)),
        (t("2024-01-03T00:00:00Z"), "m", Map.empty[String, String], Map("v" -> 2.0)))
        .toDF(Point.TimeCol, Point.MeasurementCol, Point.TagsCol, Point.FieldsCol)
      assert(st.appendIdempotent(straddleBatch(), "tokA"))
      // crash between the data rename and the commit record
      assert(new java.io.File(s"$dir/_ingest_commits/tokA").delete())
      val db = GraftDB.atPath(spark, dir)
      db.retain(t("2024-01-02T00:00:00Z"))
      // the replay repairs and lands the batch exactly once; retention
      // then owes the old row's removal on the converged state
      assert(st.appendIdempotent(straddleBatch(), "tokA"))
      assert(db.retain(t("2024-01-02T00:00:00Z")) === 1L)
      assert(db.length == 1, "orphan renamed by retention + replay = duplicate rows")
      assert(db.count(FieldQuery("v") === 2.0) == 1)
    }

    it("reopening seals an orphaned claim from a dead writer; crash recovery unregressed") {
      val (db, dir) = seeded()
      db.compact()
      val before = db.all().map(p => (p.time, p.measurement, p.tags, p.fields))
      // dead writer: claimed the next version, then the process died
      // mid-swap (primary at backup, staging orphaned, claim unsealed)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "_versions"))
      val head = new java.io.File(s"$dir/_versions").listFiles()
        .map(_.getName.stripSuffix(".done")).filter(_.forall(_.isDigit))
        .map(_.toLong).foldLeft(0L)(math.max)
      assert(new java.io.File(s"$dir/_versions/${head + 1}").createNewFile())
      val foldName = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.matches("fold-\\d+")).head.getName
      java.nio.file.Files.move(
        java.nio.file.Paths.get(dir, foldName),
        java.nio.file.Paths.get(dir, s".backup-$foldName"))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, ".staging-dead"))
      val again = GraftDB.atPath(spark, dir)
      assert(again.all().map(p => (p.time, p.measurement, p.tags, p.fields)) == before)
      // the orphan is sealed: new commits proceed without waiting
      again.insert(Point(t("2024-03-01T00:00:00Z"), "m", Map(), Map("v" -> 5.0)))
      assert(again.length == before.size + 1)
    }
  }

  describe("driver-local WAL append (sub-split batches)") {
    it("small appends land as ONE local parquet file with no distributed write job") {
      val dir = Files.createTempDirectory("graftwal").toString
      val db = GraftDB.atPath(spark, dir)
      def countJobs(f: => Unit): Int = {
        val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); ()
          }
        }
        drainListenerBus()
        spark.sparkContext.addSparkListener(listener)
        try { f; drainListenerBus() }
        finally spark.sparkContext.removeSparkListener(listener)
        jobs.get()
      }
      val jobs = countJobs {
        db.insertMultiple(Seq(
          Point(t("2024-01-02T00:00:00Z"), "m", Map("a" -> "x"), Map("v" -> 1.0)),
          Point(t("2024-01-01T00:00:00Z"), "m", Map("a" -> "y"), Map("v" -> 2.0)),
          Point(t("2024-01-03T00:00:00Z"), "m", Map.empty, Map("v" -> 3.0))))
      }
      // the local writer's only cluster work is materializing the batch
      // (executeCollect); a distributed append adds the FileFormatWriter
      // job on top. Bound, not exact: the collect may or may not launch
      // a job depending on how the batch plan collapses.
      assert(jobs <= 1, s"small append ran $jobs jobs — distributed writer engaged?")
      val local = Files.list(java.nio.file.Paths.get(dir, "delta")).toArray
        .map(_.toString).filter(_.endsWith("-local.snappy.parquet"))
      assert(local.length == 1,
        s"expected exactly one local WAL file, found ${local.toSeq}")
      // insertion order (by _seq) survives the time-sorted physical
      // layout, and a reopened handle reads the same rows
      assert(db.all(sorted = false).map(_.fields("v")) == Seq(1.0, 2.0, 3.0))
      val again = GraftDB.atPath(spark, dir)
      assert(again.all(sorted = false).map(_.fields("v")) == Seq(1.0, 2.0, 3.0))
      assert(again.all().map(_.fields("v")) == Seq(2.0, 1.0, 3.0)) // time order
    }
    it("row-count backstop: a mis-estimated batch declines the coordinator and writes distributed") {
      // the byte-estimate gate would route this tiny batch local; a
      // tightened row cap simulates the mis-estimate (estimate says
      // "small", actual rows exceed what the coordinator should hold)
      spark.conf.set("graft.storage.localAppendMaxRows", "10")
      try {
        val dir = Files.createTempDirectory("graftwalcap").toString
        val db = GraftDB.atPath(spark, dir)
        db.insertMultiple((0 until 100).map(i =>
          Point(t("2024-01-01T00:00:00Z").plusSeconds(i.toLong), "m",
            Map("a" -> s"x$i"), Map("v" -> i.toDouble))))
        val names = Files.list(java.nio.file.Paths.get(dir, "delta")).toArray.map(_.toString)
        assert(!names.exists(_.endsWith("-local.snappy.parquet")),
          s"capped batch still took the coordinator path: ${names.toSeq}")
        assert(names.exists(_.endsWith(".parquet")), s"no delta file in ${names.toSeq}")
        // nothing lost in the fallback: full content, distinct seqs
        assert(db.length == 100)
        assert(db.all(sorted = false).map(_.fields("v")) == (0 until 100).map(_.toDouble))
        // and an under-cap append still lands local afterwards
        db.insert(Point(t("2024-02-01T00:00:00Z"), "m", Map.empty, Map("v" -> -1.0)))
        val after = Files.list(java.nio.file.Paths.get(dir, "delta")).toArray.map(_.toString)
        assert(after.exists(_.endsWith("-local.snappy.parquet")))
        assert(db.length == 101)
      } finally spark.conf.unset("graft.storage.localAppendMaxRows")
    }
    it("a checkpointed streaming-shaped batch routes to the WAL — even under a pruning projection") {
      // the streaming foreachBatch shape: a localCheckpoint'ed batch
      // whose lineage has no stats. Catalyst reports the garbage
      // defaultSizeInBytes for it; appendSizeEstimate must read the
      // true materialized size from the block manager (r18 fix) — and
      // keep doing so when a column-pruning/renaming Project is layered
      // over the checkpoint (the r19 ADVICE regression: a bare-
      // LogicalRDD-only match silently re-opens the 32-file-per-batch
      // distributed-write path on any insert-path refactor)
      import spark.implicits._
      def mkBatch() = spark.createDataset((0 until 50).map(i =>
          Point(t("2024-01-01T00:00:00Z").plusSeconds(i.toLong), "m",
            Map("a" -> s"x$i"), Map("v" -> i.toDouble))))
        .toDF().drop(Point.SeqCol).localCheckpoint(true)
      val bare = mkBatch()
      val est = graft.engine.Storage.appendSizeEstimate(spark, bare)
      assert(est < BigInt(1L << 20), s"bare checkpointed batch estimate $est")
      // pruning + rename over the checkpoint: still the cached size
      val projected = mkBatch().select(col(Point.TimeCol),
        col(Point.MeasurementCol).as("m2"), col(Point.TagsCol), col(Point.FieldsCol))
      val estP = graft.engine.Storage.appendSizeEstimate(spark, projected)
      assert(estP < BigInt(1L << 20), s"projected checkpointed batch estimate $estP")
      // a COMPUTED projection cannot borrow the cached size — it must
      // fall through to Catalyst (over-estimate direction: distributed)
      val computed = mkBatch().select(col(Point.TimeCol),
        concat(col(Point.MeasurementCol), lit("x")).as(Point.MeasurementCol),
        col(Point.TagsCol), col(Point.FieldsCol))
      assert(graft.engine.Storage.appendSizeEstimate(spark, computed) >= BigInt(1L << 20))
      // and end to end: the streaming-shaped batch lands as ONE local
      // WAL file, no distributed writer
      val dir = Files.createTempDirectory("graftwalstream").toString
      val db = GraftDB.atPath(spark, dir)
      db.insertDF(mkBatch())
      val names = Files.list(java.nio.file.Paths.get(dir, "delta")).toArray.map(_.toString)
      assert(names.count(_.endsWith("-local.snappy.parquet")) == 1,
        s"streaming-shaped batch missed the WAL path: ${names.toSeq}")
    }

    it("local and distributed delta files coexist under one scan and one compaction") {
      val dir = Files.createTempDirectory("graftwalmix").toString
      val db = GraftDB.atPath(spark, dir)
      db.insert(Point(t("2024-01-01T00:00:00Z"), "m", Map("a" -> "x"), Map("v" -> 1.0)))
      // a LogicalRDD batch reports unknown stats (defaultSizeInBytes) →
      // the size gate routes it down the DISTRIBUTED writer
      val rows = spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(java.sql.Timestamp.from(t("2024-01-02T00:00:00Z")),
          "m", Map("a" -> "y"), Map("v" -> Double.box(2.0)))))
      db.insertDF(spark.createDataFrame(rows,
        org.apache.spark.sql.types.StructType(graft.model.Point.schema.filterNot(_.name == Point.SeqCol))))
      val names = Files.list(java.nio.file.Paths.get(dir, "delta")).toArray.map(_.toString)
      assert(names.exists(_.endsWith("-local.snappy.parquet")), s"no local file in ${names.toSeq}")
      assert(names.exists(n => n.endsWith(".parquet") && !n.endsWith("-local.snappy.parquet")),
        s"no distributed file in ${names.toSeq}")
      assert(db.all().map(_.fields("v")) == Seq(1.0, 2.0))
      db.compact()
      assert(db.all().map(_.fields("v")) == Seq(1.0, 2.0))
    }
  }

  describe("snapshot-consistent reads vs maintenance") {
    def pt(ts: String, v: Double) = Point(t(ts), "m", Map("k" -> "x"), Map("v" -> v))

    it("reads hammered concurrently with retention and compaction always see a consistent snapshot") {
      val dir = Files.createTempDirectory("graftsnapham").toString
      val db = GraftDB.atPath(spark, dir)
      db.insertMultiple((0 until 24).map(h => pt(f"2024-01-01T$h%02d:00:00Z", h)) ++
        (0 until 24).map(h => pt(f"2024-01-02T$h%02d:00:00Z", 100.0 + h)))
      db.compact()
      db.insertMultiple((0 until 4).map(h => pt(f"2024-01-03T$h%02d:00:00Z", 200.0 + h)))
      db.insertMultiple(Seq(pt("2024-01-04T06:00:00Z", 300.0), pt("2024-01-05T06:00:00Z", 301.0),
        pt("2024-01-05T18:00:00Z", 302.0), pt("2024-01-06T06:00:00Z", 303.0)))
      // retention progresses through NESTED states; every concurrent
      // read must be EXACTLY one of them — a maintenance swap that
      // unlinked a reader's file would surface as a partial set (rows
      // of one vanished file missing), a double-visible rewrite as
      // duplicates; both are ≠ every S_i. Interleaved compactions are
      // content-preserving and must be invisible.
      val s0: Seq[Double] = ((0 until 24).map(_.toDouble) ++ (0 until 24).map(100.0 + _) ++
        (0 until 4).map(200.0 + _) ++ Seq(300.0, 301.0, 302.0, 303.0)).sorted
      val s1 = s0.filter(_ >= 100.0)
      val s2 = s1.filter(_ >= 200.0)
      val s3 = s2.filter(_ >= 300.0)
      val s4 = s3.filter(_ >= 302.0)
      val allowed = Set(s0, s1, s2, s3, s4)
      val reader = GraftDB.atPath(spark, dir) // independent lock-free handle
      // model a slow reader against back-to-back maintenance ticks: the
      // time floor keeps superseded files on disk through the whole run
      spark.conf.set("graft.storage.snapshotDropGraceMs", "600000")
      @volatile var failure: Option[String] = None
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val rt = new Thread(() => {
        try {
          while (!stop.get && failure.isEmpty) {
            val got = reader.all().map(_.fields("v").doubleValue()).sorted
            if (!allowed.contains(got))
              failure = Some(s"inconsistent snapshot (${got.size} rows): $got")
          }
        } catch { case e: Throwable => failure = Some(s"reader died: $e") }
      })
      rt.start()
      try {
        db.retain(t("2024-01-02T00:00:00Z")); Thread.sleep(50)
        db.compact(); Thread.sleep(50)
        db.retain(t("2024-01-03T00:00:00Z")); Thread.sleep(50)
        db.compact(); Thread.sleep(50)
        db.retain(t("2024-01-04T00:00:00Z")); Thread.sleep(50)
        db.compact(); Thread.sleep(50)
        db.retain(t("2024-01-05T12:00:00Z")); Thread.sleep(50)
        db.compact()
      } finally {
        stop.set(true); rt.join(60000)
        spark.conf.set("graft.storage.snapshotDropGraceMs", "0")
      }
      assert(failure.isEmpty, failure.getOrElse(""))
      assert(reader.all().map(_.fields("v").doubleValue()).sorted == s4)
    }
  }

  describe("time-based retention") {
    def pt(ts: String, v: Double) = Point(t(ts), "m", Map("k" -> "x"), Map("v" -> v))
    def vals(db: GraftDB): Seq[Double] = db.all().map(_.fields("v").doubleValue()).sorted

    it("drops whole partitions/files by metadata, rewrites only straddlers, matches the filtered replay") {
      val dir = Files.createTempDirectory("graftretain").toString
      val db = GraftDB.atPath(spark, dir)
      // main tier: 24 hourly points on 01-01 (v 0..23) + 24 on 01-02 (v 100..123)
      db.insertMultiple((0 until 24).map(h => pt(f"2024-01-01T$h%02d:30:00Z", h)) ++
        (0 until 24).map(h => pt(f"2024-01-02T$h%02d:30:00Z", 100.0 + h)))
      db.compact()
      // delta tier: one wholly-old file, one straddling, one wholly-new
      db.insertMultiple((0 until 4).map(h => pt(f"2024-01-03T$h%02d:00:00Z", 200.0 + h)))
      db.insertMultiple(Seq(pt("2024-01-04T06:00:00Z", 300.0), pt("2024-01-05T06:00:00Z", 301.0),
        pt("2024-01-05T18:00:00Z", 302.0), pt("2024-01-06T06:00:00Z", 303.0)))
      db.insertMultiple((0 until 4).map(h => pt(f"2024-01-07T$h%02d:00:00Z", 400.0 + h)))
      import org.apache.spark.sql.functions.{col, element_at, input_file_name}
      val keepUri = spark.read.parquet(s"$dir/delta")
        .filter(element_at(col(Point.FieldsCol), "v") === 400.0)
        .select(input_file_name()).head().getString(0) // the 01-07 batch's file
      val keepPath = java.nio.file.Paths.get(new java.net.URI(keepUri))
      val keepMtime = Files.getLastModifiedTime(keepPath)

      // cutoff 1 inside 01-02: p_date=01-01 drops WHOLE (by dir+footer),
      // 01-02 is the only straddler. The drop is LOGICAL immediately
      // (reads exclude it) and physical one maintenance tick later — a
      // reader mid-scan keeps its resolved snapshot intact.
      assert(db.retain(t("2024-01-02T12:00:00Z")) === 24L + 12L)
      assert(vals(db) === ((12 until 24).map(100.0 + _) ++ (200 until 204).map(_.toDouble)
        ++ Seq(300.0, 301.0, 302.0, 303.0) ++ (400 until 404).map(_.toDouble)))

      // cutoff 2 in the delta tier: the 01-03 file drops whole, the
      // 01-04..01-06 file straddles (301.0 survives? no: 01-05T06 < 12:00
      // drops; 302/303 survive), the 01-07 file must NOT be rewritten
      assert(db.retain(t("2024-01-05T12:00:00Z")) === 12L + 4L + 2L)
      assert(vals(db) === (Seq(302.0, 303.0) ++ (400 until 404).map(_.toDouble)))
      assert(Files.exists(keepPath) && Files.getLastModifiedTime(keepPath) == keepMtime,
        "a wholly-kept delta file must not be rewritten by retention")

      // idempotent: a third retain at the same cutoff removes nothing —
      // and as a further maintenance tick it ages out the FIRST tick's
      // deferred drops: the wholly-old partition dir is now physically gone
      assert(db.retain(t("2024-01-05T12:00:00Z")) === 0L)
      assert(!Files.exists(java.nio.file.Paths.get(dir, "data", "measurement=m", "p_date=2024-01-01")),
        "wholly-old partition directory should be physically pruned after a further tick")
      // and a fresh handle sees the identical converged state
      assert(vals(GraftDB.atPath(spark, dir)) === (Seq(302.0, 303.0) ++ (400 until 404).map(_.toDouble)))
    }

    it("retain patches a live index like remove(): post-retention reads serve the filtered view") {
      val dir = Files.createTempDirectory("graftretainidx").toString
      val db = GraftDB.atPath(spark, dir)
      db.insertMultiple((0 until 12).map(h => pt(f"2024-01-01T$h%02d:00:00Z", h)) ++
        (0 until 12).map(h => pt(f"2024-01-03T$h%02d:00:00Z", 100.0 + h)))
      db.compact()
      db.reindex() // live columnar view — retention must subtract, not corrupt
      assert(db.length === 24L)
      assert(db.retain(t("2024-01-02T00:00:00Z")) === 12L)
      // all read paths agree with the filtered replay through the
      // patched index (count fast path, predicate search, full scan)
      assert(db.length === 12L)
      assert(db.count(FieldQuery("v") >= 100.0) === 12L)
      assert(db.count(FieldQuery("v") < 100.0) === 0L)
      assert(vals(db) === (100 until 112).map(_.toDouble))
    }

    it("a crashed straddler rewrite rolls forward at the next handle open") {
      val dir = Files.createTempDirectory("graftretaincrash").toString
      val db = GraftDB.atPath(spark, dir)
      db.insertMultiple(Seq(pt("2024-01-01T06:00:00Z", 1.0), pt("2024-01-02T06:00:00Z", 2.0)))
      db.close()
      val orig = Files.list(java.nio.file.Paths.get(dir, "delta")).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      assert(orig.length === 1)
      // manufacture the crash state "staging complete, marker published,
      // nothing executed": filtered replacement staged + the D/M plan
      val staging = s"$dir/.retain-staging-test/0"
      spark.read.parquet(orig.head)
        .filter(org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col(Point.TimeCol)) >=
          t("2024-01-02T00:00:00Z").getEpochSecond * 1000000L)
        .coalesce(1).write.parquet(staging)
      val staged = Files.list(java.nio.file.Paths.get(staging)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter { p => val n = p.getFileName.toString
          n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_") }
        .map(_.toString)
      assert(staged.length === 1)
      val target = s"$dir/delta/retain-test-0-0.snappy.parquet"
      def enc(p: String) = java.net.URLEncoder.encode(p, "UTF-8")
      Files.write(java.nio.file.Paths.get(dir, ".retain-commit"),
        s"D ${enc(orig.head)}\nM ${enc(staged.head)} ${enc(target)}".getBytes("UTF-8"))
      // handle open = recovery point: the plan rolls FORWARD
      val again = GraftDB.atPath(spark, dir)
      assert(vals(again) === Seq(2.0), "roll-forward should leave exactly the filtered rows")
      assert(!Files.exists(java.nio.file.Paths.get(orig.head)))
      assert(Files.exists(java.nio.file.Paths.get(target)))
      assert(!Files.exists(java.nio.file.Paths.get(dir, ".retain-commit")))
      assert(!Files.exists(java.nio.file.Paths.get(dir, ".retain-staging-test")))
    }

    it("a snapshot-plan retention commit crashed between meta publish and move execution rolls forward without losing straddler rows") {
      // The dangerous window: stageStraddlers completed (replacement
      // staged under .retain-staging-*), publishAndExecuteSnapshot
      // published _snapmeta/<v>, and the process died before (or
      // during) executeSnapMoves. Recovery MUST replay the snapmeta
      // moves BEFORE sweeping .retain-staging-* dirs — sweeping first
      // destroys the staged replacement while the meta's drops still
      // fence the straddler original, permanently losing every
      // surviving (>= cutoff) row of the straddled file.
      val dir = Files.createTempDirectory("graftsnapcrash").toString
      val db = GraftDB.atPath(spark, dir)
      db.insertMultiple(Seq(pt("2024-01-01T06:00:00Z", 1.0), pt("2024-01-02T06:00:00Z", 2.0)))
      db.close()
      val orig = Files.list(java.nio.file.Paths.get(dir, "delta")).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      assert(orig.length === 1)
      // staged filtered replacement, exactly as stageStraddlers leaves it
      val staging = s"$dir/.retain-staging-crash/0"
      spark.read.parquet(orig.head)
        .filter(org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col(Point.TimeCol)) >=
          t("2024-01-02T00:00:00Z").getEpochSecond * 1000000L)
        .coalesce(1).write.parquet(staging)
      val staged = Files.list(java.nio.file.Paths.get(staging)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter { p => val n = p.getFileName.toString
          n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_") }
        .map(_.toString)
      assert(staged.length === 1)
      // the commit's version = the sealed head (retention seals v at
      // commit end; the crash window leaves v claimed — recovery's
      // orphan-seal makes it the head either way)
      val head = Files.list(java.nio.file.Paths.get(dir, "_versions")).toArray
        .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
        .filter(_.endsWith(".done")).map(_.stripSuffix(".done").toLong).max
      val target = s"$dir/delta/retain-$head-0-0.snappy.parquet"
      // the published-but-unexecuted plan, in snapmeta's qualified form
      def enc(p: String) = java.net.URLEncoder.encode("file:" + p, "UTF-8")
      Files.createDirectories(java.nio.file.Paths.get(dir, "_snapmeta"))
      Files.write(java.nio.file.Paths.get(dir, "_snapmeta", head.toString),
        s"M ${enc(staged.head)} ${enc(target)}\nD ${enc(orig.head)}".getBytes("UTF-8"))
      // handle open = recovery point: moves replay FIRST, then staging sweep
      val again = GraftDB.atPath(spark, dir)
      assert(vals(again) === Seq(2.0),
        "the straddler's surviving rows must not be lost to the staging sweep")
      assert(Files.exists(java.nio.file.Paths.get(target)))
      assert(!Files.exists(java.nio.file.Paths.get(dir, ".retain-staging-crash")))
      // the original is fenced by the meta's drop (still on disk until a
      // later maintenance commit prunes it) — reads already exclude it
      assert(Files.exists(java.nio.file.Paths.get(orig.head)))
    }

    it("a retention tick's straddler rewrite commits as ONE fold-generation dir rename") {
      val dir = Files.createTempDirectory("graftretainfold").toString
      val db = GraftDB.atPath(spark, dir)
      db.insertMultiple(Seq(
        pt("2024-01-01T06:00:00Z", 1.0), pt("2024-01-02T06:00:00Z", 2.0),
        pt("2024-01-03T06:00:00Z", 3.0)))
      // one delta file straddles the cutoff: rows 2.0/3.0 survive
      assert(db.retain(t("2024-01-02T00:00:00Z")) === 1L)
      assert(vals(db) === Seq(2.0, 3.0))
      // the replacement landed as a version-named fold generation (one
      // staged-dir rename, the compact() commit shape) — NOT as
      // per-file retain-* renames into the live dirs
      val folds = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.matches("fold-\\d+"))
      assert(folds.length === 1, "straddler replacement must commit as a fold generation")
      def filesUnder(d: java.io.File): Seq[java.io.File] = {
        val (dirs, fs) = d.listFiles().toSeq.partition(_.isDirectory)
        fs ++ dirs.flatMap(filesUnder)
      }
      val perFile = filesUnder(new java.io.File(dir))
        .filter(f => f.getName.startsWith("retain-") && f.getName.endsWith(".parquet"))
      assert(perFile.isEmpty, s"per-file retention renames found: $perFile")
      // no leftover staging, and the state survives a reopen
      assert(!new java.io.File(dir).listFiles()
        .exists(_.getName.startsWith(".retain-staging-")))
      assert(vals(GraftDB.atPath(spark, dir)) === Seq(2.0, 3.0))
    }

    it("store writes never touch the application session's parquet encoding (dedicated pinned write session)") {
      val tsKey = "spark.sql.parquet.outputTimestampType"
      val prev = spark.conf.getOption(tsKey)
      try {
        // the APPLICATION chooses legacy INT96 for its own writes; the
        // store must neither observe it in its files nor ever flip it
        spark.conf.set(tsKey, "INT96")
        val (db, dir) = seeded()
        db.compact() // distributed fold write through the pinned session
        assert(spark.conf.get(tsKey) === "INT96",
          "store writes must never mutate the application session's encoding")
        // the fold's files still honor the store's layout contract:
        // INT64 micros with column statistics (INT96 would be stat-less)
        val fold = new java.io.File(dir).listFiles()
          .filter(f => f.isDirectory && f.getName.matches("fold-\\d+")).head
        def filesUnder(d: java.io.File): Seq[java.io.File] = {
          val (dirs, fs) = d.listFiles().toSeq.partition(_.isDirectory)
          fs ++ dirs.flatMap(filesUnder)
        }
        val pq = filesUnder(fold).filter(f =>
          f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
        val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(pq.toString),
            spark.sparkContext.hadoopConfiguration))
        try {
          val timeType = footer.getFooter.getFileMetaData.getSchema
            .getType(Array(Point.TimeCol): _*).asPrimitiveType()
          assert(timeType.getPrimitiveTypeName ===
            org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64,
            s"store file wrote ${timeType.getPrimitiveTypeName} — the app's INT96 leaked in")
        } finally footer.close()
        // and the application's own write made RIGHT AFTER a store write
        // really is INT96 — the conf it chose is fully in effect
        val appOut = Files.createTempDirectory("graftappint96").toString + "/p"
        import spark.implicits._
        Seq(java.sql.Timestamp.from(t("2024-01-01T00:00:00Z")))
          .toDF("ts").write.parquet(appOut)
        val appPq = new java.io.File(appOut).listFiles()
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
        val appFooter = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(appPq.toString),
            spark.sparkContext.hadoopConfiguration))
        try {
          assert(appFooter.getFooter.getFileMetaData.getSchema
            .getType(Array("ts"): _*).asPrimitiveType().getPrimitiveTypeName ===
            org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96)
        } finally appFooter.close()
      } finally prev match {
        case Some(v) => spark.conf.set(tsKey, v)
        case None    => spark.conf.unset(tsKey)
      }
    }

    it("a PARTITIONED data-tier straddler keeps its surviving rows through retention (post-overwrite store)") {
      // the state after any user rewrite: the store lives in the
      // partitioned data/ tier (not fold generations), whose partition
      // dirs list back scheme-QUALIFIED from the filesystem while the
      // tier root is a constructed unqualified string — the straddler
      // grouping must match them anyway (an unmatched straddler's
      // surviving rows would silently vanish: the original enters the
      // drops while the replacement fold never receives its rows)
      val dir = Files.createTempDirectory("graftretainpart").toString
      val db = GraftDB.atPath(spark, dir)
      db.insertMultiple(Seq(
        pt("2024-01-01T06:00:00Z", 1.0), pt("2024-01-02T06:00:00Z", 2.0),
        pt("2024-01-02T18:00:00Z", 3.0)))
      // force the data/ tier via a user rewrite (update -> overwrite)
      db.update(FieldQuery("v") === 1.0, fields = Map("v" -> 1.5))
      assert(Files.exists(java.nio.file.Paths.get(dir, "data")))
      assert(vals(db) === Seq(1.5, 2.0, 3.0))
      // an INTRADAY cutoff: the p_date=2024-01-02 file (2.0@06:00,
      // 3.0@18:00) STRADDLES it — the 01-01 file whole-drops, 2.0 is
      // filtered out by the rewrite, 3.0 must survive
      assert(db.retain(t("2024-01-02T12:00:00Z")) === 2L)
      assert(vals(db) === Seq(3.0),
        "surviving rows of a partitioned data-tier straddler were lost")
      // and the state survives a reopen (the fold commit is durable)
      assert(vals(GraftDB.atPath(spark, dir)) === Seq(3.0))
    }

    it("a crash in the middle of a pre-swap restore re-enters cleanly (data restores LAST)") {
      // recovery's own crash window: the previous recovery restored the
      // delta backup and died before the data backup. Re-entry must
      // finish the restore AND must not misread the intermediate state
      // as a completed swap (which would delete a live _snapmeta chain
      // and the still-unrestored backups)
      val (db, dir) = seeded()
      db.compact() // store lives in fold-1; delta emptied next tick
      val before = db.all().map(p => (p.time, p.measurement, p.tags, p.fields))
      val fold = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.matches("fold-\\d+")).head.getName
      // manufacture: pre-swap overwrite crash (fold moved aside), then
      // a FIRST recovery that died after restoring nothing — plus a
      // live _snapmeta chain from the compact tick
      java.nio.file.Files.move(
        java.nio.file.Paths.get(dir, fold),
        java.nio.file.Paths.get(dir, s".backup-$fold"))
      assert(Files.exists(java.nio.file.Paths.get(dir, "_snapmeta")),
        "precondition: the compact tick left a live snapshot chain")
      val metasBefore = new java.io.File(s"$dir/_snapmeta").listFiles().map(_.getName).toSet
      // re-entry: restores the fold, keeps the chain
      val again = GraftDB.atPath(spark, dir)
      assert(again.all().map(p => (p.time, p.measurement, p.tags, p.fields)) == before)
      assert(new java.io.File(s"$dir/_snapmeta").listFiles().map(_.getName).toSet
        === metasBefore,
        "a pre-swap restore must not drain the live snapshot-meta chain")
    }

    it("the pinned write session mirrors the app session's runtime confs (pin is the ONLY divergence)") {
      val codecKey = "spark.sql.parquet.compression.codec"
      val prev = spark.conf.getOption(codecKey)
      try {
        // a RUNTIME conf change on the app session (newSession seeds
        // only from the initial SparkConf) must still govern the
        // store's distributed writes — the r14 scoped pin honored it,
        // and the dedicated session must not silently stop
        spark.conf.set(codecKey, "gzip")
        val (db, dir) = seeded()
        db.compact() // fold write through the (mirrored) pinned session
        def filesUnder(d: java.io.File): Seq[java.io.File] = {
          val (dirs, fs) = d.listFiles().toSeq.partition(_.isDirectory)
          fs ++ dirs.flatMap(filesUnder)
        }
        val fold = new java.io.File(dir).listFiles()
          .filter(f => f.isDirectory && f.getName.matches("fold-\\d+")).head
        val names = filesUnder(fold).map(_.getName)
          .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
        assert(names.nonEmpty && names.forall(_.endsWith(".gz.parquet")),
          s"runtime codec conf not mirrored into the write session: $names")
        // ...while the one deliberate divergence still holds: MICROS
        val pq = filesUnder(fold).filter(f =>
          f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
        val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(pq.toString),
            spark.sparkContext.hadoopConfiguration))
        try assert(footer.getFooter.getFileMetaData.getSchema
          .getType(Array(Point.TimeCol): _*).asPrimitiveType().getPrimitiveTypeName ===
          org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
        finally footer.close()
        // and unsetting on the app session propagates too (back to the
        // zstd default on the next store write)
        spark.conf.unset(codecKey)
        db.insert(graft.model.Point(t("2024-02-01T00:00:00Z"), "m2",
          Map.empty, Map("v" -> 1.0)))
        db.compact()
        val fold2 = new java.io.File(dir).listFiles()
          .filter(f => f.isDirectory && f.getName.matches("fold-\\d+"))
          .maxBy(_.getName.stripPrefix("fold-").toLong)
        val names2 = filesUnder(fold2).map(_.getName)
          .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
        assert(names2.nonEmpty && names2.forall(!_.endsWith(".gz.parquet")),
          s"unset codec conf not mirrored out of the write session: $names2")
      } finally prev match {
        case Some(v) => spark.conf.set(codecKey, v)
        case None    => spark.conf.unset(codecKey)
      }
    }

    it("pre-commit retention staging (no marker) is discarded; originals survive") {
      val dir = Files.createTempDirectory("graftretainpre").toString
      val db = GraftDB.atPath(spark, dir)
      db.insertMultiple(Seq(pt("2024-01-01T06:00:00Z", 1.0), pt("2024-01-02T06:00:00Z", 2.0)))
      db.close()
      Files.createDirectories(java.nio.file.Paths.get(dir, ".retain-staging-dead", "0"))
      val again = GraftDB.atPath(spark, dir)
      assert(vals(again) === Seq(1.0, 2.0))
      assert(!Files.exists(java.nio.file.Paths.get(dir, ".retain-staging-dead")))
    }

    it("a batch arriving on a CLONED session (the foreachBatch shape) still writes stats-bearing files") {
      // Structured Streaming hands foreachBatch frames bound to the
      // stream's cloned session, whose conf carries Spark's INT96
      // default — the write pin must land on the WRITING frame's
      // session, or the primary ingest path's files arrive stat-less.
      // Evidence: a wholly-old file with usable footer time stats
      // whole-drops with NO straddler rewrite; a stat-less one would
      // pay a rewrite (leaving a retain-* replacement).
      val dir = Files.createTempDirectory("graftclonesess").toString
      val st = new ParquetStorage(spark, dir)
      val clone = spark.newSession()
      import clone.implicits._
      val batch = Seq(
        (t("2024-01-01T06:00:00Z"), "m", Map.empty[String, String], Map("v" -> 1.0)),
        (t("2024-01-01T18:00:00Z"), "m", Map.empty[String, String], Map("v" -> 2.0)))
        .toDF(Point.TimeCol, Point.MeasurementCol, Point.TagsCol, Point.FieldsCol)
      assert(batch.sparkSession ne spark)
      // force the DISTRIBUTED write path — the local WAL writer reads
      // the handle session's conf and was never exposed; the cloned
      // session's conf only reaches distributed DataFrame writes
      spark.conf.set("graft.storage.localAppendMaxRows", "0")
      try st.append(batch)
      finally spark.conf.unset("graft.storage.localAppendMaxRows")
      val db = GraftDB.atPath(spark, dir)
      assert(db.retain(t("2024-01-02T00:00:00Z")) === 2L)
      assert(db.length === 0L)
      assert(!Files.list(java.nio.file.Paths.get(dir, "delta")).toArray
        .map(_.toString).exists(_.contains("/retain-")),
        "a stats-bearing whole-drop must not pay a straddler rewrite")
    }

    it("stat-less INT96 legacy files fall back to the straddler rewrite and come back stats-bearing") {
      val dir = Files.createTempDirectory("graftretain96").toString
      val db = GraftDB.atPath(spark, dir)
      db.insertMultiple(Seq(pt("2024-01-01T06:00:00Z", 1.0), pt("2024-01-03T06:00:00Z", 2.0)))
      // manufacture the legacy encoding OUTSIDE the store (its own
      // writes scope-pin TIMESTAMP_MICROS): rewrite the delta file
      // INT96, as an older writer or an external importer would have
      val fresh = Files.list(java.nio.file.Paths.get(dir, "delta")).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      val legacyDir = Files.createTempDirectory("graftretain96legacy").toString
      try {
        spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
        spark.read.parquet(fresh: _*).coalesce(1)
          .write.mode("overwrite").parquet(legacyDir)
      } finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
      fresh.foreach(f => Files.delete(java.nio.file.Paths.get(f)))
      val legacyFile = Files.list(java.nio.file.Paths.get(legacyDir)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find { p => val n = p.getFileName.toString
          n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_") }.get
      Files.move(legacyFile,
        java.nio.file.Paths.get(dir, "delta", "part-legacy-int96.snappy.parquet"))
      val orig = Files.list(java.nio.file.Paths.get(dir, "delta")).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      // INT96 carries no stats: even though every row is ≥ the cutoff,
      // the file cannot be proven keepable and pays ONE rewrite — after
      // which it is micros-encoded and provable. The replacement lands
      // as the tick's FOLD GENERATION (the one-dir-rename commit); the
      // original stays in delta as the commit's deferred drop.
      assert(db.retain(t("2024-01-01T00:00:00Z")) === 0L)
      def foldFiles(): Set[String] = {
        def walk(d: java.io.File): Seq[java.io.File] = {
          val (dirs, fs) = d.listFiles().toSeq.partition(_.isDirectory)
          fs ++ dirs.flatMap(walk)
        }
        new java.io.File(dir).listFiles()
          .filter(f => f.isDirectory && f.getName.matches("fold-\\d+"))
          .flatMap(walk).map(_.toString)
          .filter(n => n.endsWith(".parquet") && !n.contains("/.")).toSet
      }
      val rewritten = foldFiles()
      assert(rewritten.nonEmpty, "legacy file should have been rewritten into a fold generation")
      assert(vals(db) === Seq(1.0, 2.0))
      // now provable: the same no-op retain leaves the rewritten file
      // untouched (its tick only ages out the first commit's deferred
      // drop — the stat-less original is physically gone afterwards)
      assert(db.retain(t("2024-01-01T00:00:00Z")) === 0L)
      assert(foldFiles() === rewritten)
      val afterNoop: Seq[String] =
        if (!Files.exists(java.nio.file.Paths.get(dir, "delta"))) Seq.empty
        else Files.list(java.nio.file.Paths.get(dir, "delta")).toArray.toSeq
          .map(_.toString).filter(_.endsWith(".parquet"))
      assert(afterNoop.isEmpty, "the stat-less original should have aged out of delta")
      // and a real cutoff now drops/filters exactly (another straddle:
      // the provable file pays a NEW fold rewrite, old generation drops)
      assert(db.retain(t("2024-01-02T00:00:00Z")) === 1L)
      assert(vals(db) === Seq(2.0))
    }
  }
}
