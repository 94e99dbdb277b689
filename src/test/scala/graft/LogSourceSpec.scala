package graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.engine.GraftDB
import graft.streaming.{GraftLog, GraftLogProducer, StreamingIngest}

/** The custom DataSourceV2 streaming connector (`graft-log`): sealed-
  * segment publishing, listing-only offset discovery, batch + micro-batch
  * reads, admission control, and the exactly-once contract under
  * checkpoint kill/resume with a forced batch replay.
  */
class LogSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  describe("graft-log segments") {
    it("publishes atomically; offsets come from the listing alone") {
      val dir = tmp("graftlog")
      val p = new GraftLogProducer(dir)
      assert(GraftLog.latestOffset(dir, new Configuration()) === 0L)
      assert(p.publish(Seq("a", "b", "c")) === 3L)
      assert(p.publish(Seq("d")) === 4L)
      // a torn write (temp file) is invisible to consumers
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, ".000000000099-5.seg.inprogress"),
        "x\ny\n".getBytes("UTF-8"))
      val segs = GraftLog.listSegments(dir, new Configuration())
      assert(segs.map(s => (s.seq, s.count)) === Seq((0L, 3L), (1L, 1L)))
      assert(GraftLog.latestOffset(dir, new Configuration()) === 4L)
      // a new producer on the same dir continues the sequence
      assert(new GraftLogProducer(dir).publish(Seq("e", "f")) === 6L)
    }

    it("slices an offset range onto per-segment partitions") {
      val segs = Seq(
        GraftLog.Segment(0L, 0L, 100L, "s0"),
        GraftLog.Segment(1L, 100L, 50L, "s1"),
        GraftLog.Segment(2L, 150L, 100L, "s2"))
      val sl = GraftLog.slices(segs, 80L, 180L)
      assert(sl.map(s => (s.file, s.startLine, s.endLine, s.baseOffset)) === Seq(
        ("s0", 80L, 100L, 80L), ("s1", 0L, 50L, 100L), ("s2", 0L, 30L, 150L)))
      assert(GraftLog.slices(segs, 250L, 250L).isEmpty)
      intercept[IllegalArgumentException] { GraftLog.slices(segs, 200L, 260L) }
      // a truncated prefix: offsets before the retained head are gone
      intercept[IllegalArgumentException] { GraftLog.slices(segs.drop(1), 80L, 180L) }
    }

    it("slices cover every offset exactly once over 300 random layouts and ranges") {
      val rnd = new scala.util.Random(42)
      for (trial <- 0 until 300) {
        val nSegs = rnd.nextInt(6)
        var base = rnd.nextInt(5).toLong // truncated head
        val segs = (0 until nSegs).map { i =>
          val cnt = 1L + rnd.nextInt(20)
          val s = GraftLog.Segment(i.toLong, base, cnt, s"s$trial-$i")
          base += cnt
          s
        }
        val lo = segs.headOption.fold(0L)(_.base)
        val hi = segs.lastOption.fold(lo)(s => s.base + s.count)
        val a = lo + (if (hi > lo) rnd.nextInt((hi - lo).toInt + 1) else 0)
        val b = a + (if (hi > a) rnd.nextInt((hi - a).toInt + 1) else 0)
        val sl = GraftLog.slices(segs, a, b)
        val mapped = sl.flatMap(s =>
          (s.startLine until s.endLine).map(l => (s.file, l, s.baseOffset + (l - s.startLine))))
        // bijection between [a, b) and (file, line) pairs, offsets consistent
        assert(mapped.map(_._3).sorted === (a until b).toSeq, s"trial $trial")
        mapped.foreach { case (f, line, off) =>
          val seg = segs.find(_.path == f).get
          assert(seg.base + line === off, s"trial $trial")
          assert(line >= 0 && line < seg.count, s"trial $trial")
        }
      }
    }

    it("retention: truncateBefore drops whole segments, offsets never shift") {
      val dir = tmp("graftlogret")
      val p = new GraftLogProducer(dir)
      (0 until 5).foreach(s => p.publish((s * 100 until (s + 1) * 100).map(i => s"r$i")))
      assert(GraftLog.earliestOffset(dir, new Configuration()) === 0L)
      // drop everything before 250: segments [0,100) and [100,200) go;
      // [200,300) straddles and survives intact
      assert(p.truncateBefore(250L) === 2)
      assert(GraftLog.earliestOffset(dir, new Configuration()) === 200L)
      assert(GraftLog.latestOffset(dir, new Configuration()) === 500L)
      // surviving records keep their global offsets
      val got = spark.read.format("graft-log").option("path", dir).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.head === ((200L, "r200")) && got.length === 300)
      // a consumer whose checkpoint points before the head fails loudly
      intercept[IllegalArgumentException] {
        GraftLog.slices(GraftLog.listSegments(dir, new Configuration()), 100L, 400L)
      }
      // publishing continues from the same high water
      p.publish(Seq("r500"))
      assert(GraftLog.latestOffset(dir, new Configuration()) === 501L)
      // full truncation: the low/high water survive via the marker
      assert(p.truncateBefore(501L) === 4)
      assert(GraftLog.earliestOffset(dir, new Configuration()) === 501L)
      assert(GraftLog.latestOffset(dir, new Configuration()) === 501L)
      p.publish(Seq("r501"))
      assert(spark.read.format("graft-log").option("path", dir).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq((501L, "r501")))
    }

    it("time-based retention (retention.ms): drops whole aged segments, never early, contiguous cut") {
      val dir = tmp("graftlogtret")
      val p = new GraftLogProducer(dir)
      (0 until 4).foreach(s => p.publish((s * 100 until (s + 1) * 100).map(_.toString)))
      val segs = GraftLog.listSegments(dir, new Configuration())
      assert(segs.size === 4)
      val now = System.currentTimeMillis()
      // age the first two segments past a 60 s horizon; leave the rest fresh
      val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(new Configuration())
      Seq(0, 1).foreach(i =>
        hfs.setTimes(new org.apache.hadoop.fs.Path(segs(i).path), now - 120000L, -1L))
      assert(p.truncateOlderThanMs(60000L, now) === 2)
      assert(GraftLog.earliestOffset(dir, new Configuration()) === 200L)
      assert(GraftLog.latestOffset(dir, new Configuration()) === 400L)
      // surviving records keep their global offsets
      val got = spark.read.format("graft-log").option("path", dir).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.head === ((200L, "200")) && got.length === 200)
      // never early: everything left is fresh — a second tick is a no-op
      assert(p.truncateOlderThanMs(60000L, now) === 0)
      // contiguous cut: an aged segment BEHIND a fresh one is retained
      // (the cut stops at the first fresh segment — out-of-order mtimes
      // can only retain more, never punch a hole in the offset range)
      val segs2 = GraftLog.listSegments(dir, new Configuration())
      hfs.setTimes(new org.apache.hadoop.fs.Path(segs2.last.path), now - 120000L, -1L)
      assert(p.truncateOlderThanMs(60000L, now) === 0)
      assert(GraftLog.earliestOffset(dir, new Configuration()) === 200L)
    }

    it("size-based retention (retention.bytes): drops oldest whole segments past the budget, keeps the head") {
      val dir = tmp("graftlogbret")
      val p = new GraftLogProducer(dir)
      (0 until 4).foreach(s => p.publish((s * 100 until (s + 1) * 100).map(_.toString)))
      val conf = new Configuration()
      val segs = GraftLog.listSegments(dir, conf)
      val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      val sizes = segs.map(s => hfs.getFileStatus(
        new org.apache.hadoop.fs.Path(s.path)).getLen)
      // never early: a budget covering everything deletes nothing
      assert(p.truncateToMaxBytes(sizes.sum) === 0)
      // never early, Kafka's exact rule: over budget WITH the oldest
      // segment but under budget WITHOUT it → the segment survives
      // (delete only when the remainder would still be >= the budget)
      assert(p.truncateToMaxBytes(sizes.sum - 1) === 0)
      // budget for the newest two segments: the oldest two drop WHOLE,
      // survivors keep their global offsets, low water advances
      assert(p.truncateToMaxBytes(sizes.drop(2).sum) === 2)
      assert(GraftLog.earliestOffset(dir, conf) === 200L)
      assert(GraftLog.latestOffset(dir, conf) === 400L)
      val got = spark.read.format("graft-log").option("path", dir).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.head === ((200L, "200")) && got.length === 200)
      // idempotent at the same budget
      assert(p.truncateToMaxBytes(sizes.drop(2).sum) === 0)
      // a consumer whose checkpoint points before the head fails loudly
      intercept[IllegalArgumentException] {
        GraftLog.slices(GraftLog.listSegments(dir, conf), 100L, 300L)
      }
      // the newest segment is never deleted, even at budget 0 —
      // retention bounds history, it must not truncate the head
      assert(p.truncateToMaxBytes(0L) === 1)
      assert(GraftLog.earliestOffset(dir, conf) === 300L)
      assert(GraftLog.latestOffset(dir, conf) === 400L)
      // publishing continues from the same high water
      p.publish(Seq("r400"))
      assert(GraftLog.latestOffset(dir, conf) === 401L)
    }

    it("log compaction (cleanup.policy=compact): latest-wins per key, offsets preserved with gaps, newest segment untouched") {
      val dir = tmp("graftlogcompact")
      val p = new GraftLogProducer(dir)
      val conf = new Configuration()
      // 4 segments x 10 records; key = offset % 7 (every key overwritten
      // across segments), value carries the offset so latest is provable
      (0 until 4).foreach(s =>
        p.publish((s * 10 until (s + 1) * 10).map(o => s"k${o % 7}\tv$o")))
      // keys mod 7 of offsets 30..39 = {2,3,4,5,6,0,1,2,3,4} — every
      // key's global latest lands in the newest segment, so the whole
      // 30-record head is superseded
      assert(p.compactTopic() === 30)
      // offsets, spans, and low/high water unchanged
      assert(GraftLog.earliestOffset(dir, conf) === 0L)
      assert(GraftLog.latestOffset(dir, conf) === 40L)
      val got = spark.read.format("graft-log").option("path", dir).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      // newest segment [30,40) survives whole, exact offsets intact
      assert(got === (30 until 40).map(o => (o.toLong, s"k${o % 7}\tv$o")))
      // a range read over a fully-compacted region returns zero rows but
      // covers the range (Kafka's contract — no coverage error)
      val headSlices = GraftLog.slices(GraftLog.listSegments(dir, conf), 0L, 30L)
      assert(headSlices.nonEmpty && headSlices.forall(_.gapped))
      // compaction is idempotent once clean
      assert(p.compactTopic() === 0)
      // publishing continues from the same high water
      p.publish(Seq("k0\tv40"))
      assert(GraftLog.latestOffset(dir, conf) === 41L)
    }

    it("log compaction: survivors keep exact offsets; a latest tombstone survives exactly one pass before the key vanishes") {
      val dir = tmp("graftlogcompact2")
      val p = new GraftLogProducer(dir)
      val conf = new Configuration()
      // segment 0: keys a,b,c,d; segment 1: overwrite a, tombstone b;
      // segment 2 (newest, never rewritten): overwrite c + tombstone d
      p.publish(Seq("a\t1", "b\t2", "c\t3", "d\t4"))
      p.publish(Seq("a\t5", "b\t"))
      p.publish(Seq("c\t6", "d\t"))
      // compactable = segments 0,1. All of segment 0 (a@0,b@1,c@2,d@3)
      // is superseded → 4 removed. Survivors: a@4 (global latest) AND
      // b's tombstone @5 — a latest tombstone is NOT dropped on the
      // pass that first cleans it (the delete must stay readable for
      // one full pass — Kafka's delete.retention deferral); the newest
      // segment (c@6 + d's tombstone @7) is untouched.
      assert(p.compactTopic() === 4)
      val got = spark.read.format("graft-log").option("path", dir).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === Seq((4L, "a\t5"), (5L, "b\t"), (6L, "c\t6"), (7L, "d\t")))
      // roll the log forward: b's tombstone has now been readable for a
      // full pass → ages out of the clean head; d's tombstone just
      // became clean (its segment left the newest slot this pass) and
      // gets ITS one-pass grace
      p.publish(Seq("e\t9"))
      assert(p.compactTopic() === 1) // only b's aged tombstone @5
      val got2 = spark.read.format("graft-log").option("path", dir).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got2 === Seq((4L, "a\t5"), (6L, "c\t6"), (7L, "d\t"), (8L, "e\t9")))
      // retention composes with compaction: truncating before offset 6
      // drops the (already gapped) prefix segments without offset shift
      assert(p.truncateBefore(6L) === 2)
      val got3 = spark.read.format("graft-log").option("path", dir).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got3 === Seq((6L, "c\t6"), (7L, "d\t"), (8L, "e\t9")))
      // one more roll: d's tombstone completes its grace and vanishes
      p.publish(Seq("f\t1"))
      assert(p.compactTopic() === 1)
      val got4 = spark.read.format("graft-log").option("path", dir).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got4 === Seq((6L, "c\t6"), (8L, "e\t9"), (9L, "f\t1")))
    }

    it("incremental cleaner: a pass opens only the dirty suffix; a quiescent pass opens nothing") {
      val dir = tmp("graftlogcleaner")
      val p = new GraftLogProducer(dir)
      val conf = new Configuration()
      // three sealed segments of fully distinct keys
      p.publish((0 until 10).map(i => s"a$i\tv"))
      p.publish((0 until 10).map(i => s"b$i\tv"))
      p.publish((0 until 10).map(i => s"c$i\tv"))
      // pass 1: nothing superseded; segments 0,1 become CLEAN (keyed
      // sidecars written, cleaner point at offset 20)
      assert(p.compactTopic() === 0)
      assert(GraftLog.cleanerPoint(dir, conf) === 20L)
      // seal a fourth segment of fresh keys — the only dirty data
      p.publish((0 until 10).map(i => s"d$i\tv"))
      val opens0 = GraftLog.segmentDataOpens.get()
      assert(p.compactTopic() === 0)
      // the pass read the DIRTY SUFFIX only: segment 2 + the newest
      // segment for the offset map, segment 2 again for its own
      // processing (Kafka's two-phase cleaner shape) — the two CLEAN
      // segments were answered by their sidecars, zero data opens
      assert(GraftLog.segmentDataOpens.get() - opens0 === 3L,
        "pass must not re-read clean segments whose sidecars show no work")
      assert(GraftLog.cleanerPoint(dir, conf) === 30L)
      // quiescent pass (nothing sealed since): O(listing) — zero opens
      val opens1 = GraftLog.segmentDataOpens.get()
      assert(p.compactTopic() === 0)
      assert(GraftLog.segmentDataOpens.get() - opens1 === 0L,
        "a clean topic's pass must be listing-only")
      // a dirty write that SUPERSEDES a clean key: only the one clean
      // segment whose sidecar overlaps is re-opened and rewritten
      p.publish(Seq("a3\tv2"))
      val opens2 = GraftLog.segmentDataOpens.get()
      assert(p.compactTopic() === 1) // a3@3 superseded by a3@40
      // map build: segment 3 + newest (2 opens); segment 3 processing
      // (1); the overlapping clean segment 0 (1); segments 1,2 clean
      // and untouched
      assert(GraftLog.segmentDataOpens.get() - opens2 === 4L)
      val got = spark.read.format("graft-log").option("path", dir).load()
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(!got.contains((3L, "a3\tv")) && got.contains((40L, "a3\tv2")))
      assert(got.size === 40) // 41 published, 1 superseded
      // the dirty-ratio trigger policy: 1 dirty record of 40 is below a
      // 50% threshold — the pass is skipped outright (listing-only)
      p.publish(Seq("b4\tv2"))
      val opens3 = GraftLog.segmentDataOpens.get()
      assert(p.compactTopic(minDirtyRatio = 0.5) === 0)
      assert(GraftLog.segmentDataOpens.get() - opens3 === 0L)
      assert(p.compactTopic() === 1) // default ratio 0: b4@4 superseded
    }

    it("keys-manifest: steady/quiescent passes answer clean segments from ONE merged read") {
      val dir = tmp("graftlogmanifest")
      val p = new GraftLogProducer(dir)
      val conf = new Configuration()
      val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      def manifest = new org.apache.hadoop.fs.Path(dir, "_keys_manifest")
      (0 until 20).foreach(s => p.publish((0 until 10).map(i => s"s${s}k$i\tv")))
      // first pass: sidecars written per segment AND merged into the manifest
      assert(p.compactTopic() === 0)
      assert(hfs.exists(manifest))
      // quiescent pass: zero data opens AND zero per-segment sidecar
      // reads — the listing + one manifest read is the whole pass
      val k0 = GraftLog.keySidecarReads.get()
      val o0 = GraftLog.segmentDataOpens.get()
      assert(p.compactTopic() === 0)
      assert(GraftLog.keySidecarReads.get() - k0 === 0L,
        "quiescent pass must not read per-segment sidecars")
      assert(GraftLog.segmentDataOpens.get() - o0 === 0L)
      // steady pass (one fresh segment sealed): every CLEAN segment is
      // still answered by the manifest, not O(segments) sidecar GETs
      p.publish((0 until 10).map(i => s"fresh$i\tv"))
      val k1 = GraftLog.keySidecarReads.get()
      assert(p.compactTopic() === 0)
      assert(GraftLog.keySidecarReads.get() - k1 === 0L,
        "steady pass must answer clean segments from the manifest")
      // manifest lost: the pass falls back to sidecars (one slow pass,
      // correctness unchanged) and re-merges a fresh manifest
      hfs.delete(manifest, false)
      p.publish(Seq("s3k1\tv2")) // supersede a clean key in segment 3
      val k2 = GraftLog.keySidecarReads.get()
      assert(p.compactTopic() === 1)
      assert(GraftLog.keySidecarReads.get() - k2 > 0L,
        "without a manifest, sidecars are the fallback source")
      assert(hfs.exists(manifest))
      // the rewritten segment's NEW g<ver> name is in the refreshed
      // manifest — the next pass is back to zero sidecar reads
      val k3 = GraftLog.keySidecarReads.get()
      assert(p.compactTopic() === 0)
      assert(GraftLog.keySidecarReads.get() - k3 === 0L)
      // read view reflects exactly the one supersession
      val got = spark.read.format("graft-log").option("path", dir).load()
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(!got.exists(_._2 == "s3k1\tv") && got.exists(_._2 == "s3k1\tv2"))
      assert(got.size === 210) // 211 published, 1 superseded
      // a QUIESCENT topic that loses its manifest re-merges it on the
      // very next pass (one slow pass, not "every pass until something
      // seals") — and the pass after is back to zero sidecar reads
      hfs.delete(manifest, false)
      val k4 = GraftLog.keySidecarReads.get()
      assert(p.compactTopic() === 0)
      assert(GraftLog.keySidecarReads.get() - k4 > 0L) // the one slow pass
      assert(hfs.exists(manifest), "quiescent pass must re-merge a lost manifest")
      val k5 = GraftLog.keySidecarReads.get()
      assert(p.compactTopic() === 0)
      assert(GraftLog.keySidecarReads.get() - k5 === 0L)
    }

    it("chunked manifest: quiescent passes are index-only; steady passes rewrite only touched chunks") {
      val dir = tmp("graftlogchunks")
      val conf = new Configuration()
      conf.setInt("graft.log.manifestChunkSegments", 4)
      val p = new GraftLogProducer(dir)
      val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      def chunkFiles(): Set[String] = {
        val cd = new org.apache.hadoop.fs.Path(dir, "_keys_chunks")
        if (!hfs.exists(cd)) Set.empty
        else hfs.listStatus(cd).map(_.getPath.getName)
          .filterNot(_.startsWith(".")).toSet
      }
      (0 until 16).foreach(s => p.publish((0 until 5).map(i => s"c${s}k$i\tv")))
      assert(GraftLog.compactTopic(dir, conf) === 0)
      val chunks0 = chunkFiles()
      assert(chunks0.size >= 3, s"15 clean segments at chunkSegs=4 must split: $chunks0")
      val idx = graft.util.AtomicFiles.readString(hfs,
        new org.apache.hadoop.fs.Path(dir, "_keys_manifest")).get
      assert(idx.startsWith("graftkidx1"), "manifest head file must be the index tier")
      // QUIESCENT: the index alone answers the pass — zero chunk reads,
      // zero chunk writes, zero sidecar reads, zero data opens
      val (cr0, cw0, k0, o0) = (GraftLog.manifestChunkReads.get(),
        GraftLog.manifestChunkWrites.get(), GraftLog.keySidecarReads.get(),
        GraftLog.segmentDataOpens.get())
      assert(GraftLog.compactTopic(dir, conf) === 0)
      assert(GraftLog.manifestChunkReads.get() - cr0 === 0L, "quiescent: no chunk reads")
      assert(GraftLog.manifestChunkWrites.get() - cw0 === 0L, "quiescent: no chunk writes")
      assert(GraftLog.keySidecarReads.get() - k0 === 0L)
      assert(GraftLog.segmentDataOpens.get() - o0 === 0L)
      assert(chunkFiles() == chunks0, "quiescent pass must not churn chunk files")
      // STEADY: one fresh segment seals → the pass-end refresh rewrites
      // ONLY the chunk that absorbs the new name (+ the index); every
      // other chunk file is reused untouched
      p.publish((0 until 5).map(i => s"fresh$i\tv"))
      val cw1 = GraftLog.manifestChunkWrites.get()
      assert(GraftLog.compactTopic(dir, conf) === 0)
      assert(GraftLog.manifestChunkWrites.get() - cw1 <= 2L,
        "steady pass must rewrite O(touched) chunks, not O(clean)")
      val chunks1 = chunkFiles()
      assert((chunks0 intersect chunks1).size >= chunks0.size - 2,
        s"untouched chunks must be reused verbatim: $chunks0 -> $chunks1")
      // supersede one old clean key: the affected segment rewrites to a
      // new g<ver> name; its chunk (and only its neighborhood) refreshes
      p.publish(Seq("c3k1\tv2"))
      val cw2 = GraftLog.manifestChunkWrites.get()
      assert(GraftLog.compactTopic(dir, conf) === 1)
      assert(GraftLog.manifestChunkWrites.get() - cw2 <= 3L)
      // results stay exact through all the layout churn
      val got = spark.read.format("graft-log").option("path", dir).load()
        .collect().map(_.getString(1)).toSet
      assert(!got.contains("c3k1\tv") && got.contains("c3k1\tv2"))
    }

    it("a legacy single-blob manifest reads once and is replaced by the chunked layout") {
      val dir = tmp("graftlogleg")
      val conf = new Configuration()
      val p = new GraftLogProducer(dir)
      val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      (0 until 6).foreach(s => p.publish((0 until 4).map(i => s"l${s}k$i\tv")))
      assert(GraftLog.compactTopic(dir, conf) === 0)
      // rebuild the PRE-CHUNKING on-disk state: every chunk body
      // concatenated into one `_keys_manifest` blob, no chunk dir
      val cd = new org.apache.hadoop.fs.Path(dir, "_keys_chunks")
      val blob = hfs.listStatus(cd).filterNot(_.getPath.getName.startsWith("."))
        .map(s => graft.util.AtomicFiles.readString(hfs, s.getPath).get)
        .sorted.mkString
      hfs.delete(cd, true)
      graft.util.AtomicFiles.writeString(hfs,
        new org.apache.hadoop.fs.Path(dir, "_keys_manifest"), blob)
      // the next pass answers every clean segment from the legacy blob
      // (zero sidecar reads) and publishes the chunked layout
      val k0 = GraftLog.keySidecarReads.get()
      assert(GraftLog.compactTopic(dir, conf) === 0)
      assert(GraftLog.keySidecarReads.get() - k0 === 0L,
        "legacy blob must still answer clean segments during migration")
      assert(graft.util.AtomicFiles.readString(hfs,
        new org.apache.hadoop.fs.Path(dir, "_keys_manifest")).get
        .startsWith("graftkidx1"), "migration must publish the index tier")
      assert(hfs.exists(cd), "migration must publish chunk files")
      // and the pass after that is index-only again
      val (cr1, k1) = (GraftLog.manifestChunkReads.get(), GraftLog.keySidecarReads.get())
      assert(GraftLog.compactTopic(dir, conf) === 0)
      assert(GraftLog.manifestChunkReads.get() - cr1 === 0L)
      assert(GraftLog.keySidecarReads.get() - k1 === 0L)
    }

    it("a corrupted .keys block reads as needs-work, never as no-hits") {
      val dir = tmp("graftlogcorrupt")
      val p = new GraftLogProducer(dir)
      val conf = new Configuration()
      val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      p.publish((0 until 10).map(i => s"a$i\tv"))
      p.publish((0 until 10).map(i => s"b$i\tv"))
      assert(p.compactTopic() === 0) // seg 0 clean, sidecar + manifest written
      // corrupt segment 0's sidecar AND drop the manifest: the block is
      // structurally broken (truncated line), so the lazy scan must
      // treat the summary as invalid and fall back to a data open — a
      // "no hits" reading would leave the superseded a3 in the view
      // FOREVER once the cleaner point advances
      val seg0keys = hfs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath).find(_.getName.endsWith(".keys")).get
      graft.util.AtomicFiles.writeString(hfs, seg0keys, "tombs=0\ndeadbeef\n")
      hfs.delete(new org.apache.hadoop.fs.Path(dir, "_keys_manifest"), false)
      p.publish(Seq("a3\tv2")) // supersedes a key in the corrupted segment
      assert(p.compactTopic() === 1,
        "corrupted sidecar must force the conservative data read")
      val got = spark.read.format("graft-log").option("path", dir).load()
        .collect().map(_.getString(1)).toSet
      assert(!got.contains("a3\tv") && got.contains("a3\tv2"))
    }

    it("per-partition compaction: each p-NNNN sub-log compacts independently under its own lock") {
      val dir = tmp("graftlogpartcmp")
      val conf = new Configuration()
      // two partitions, each with overlapping keys ACROSS ITS OWN
      // segments; the same key string in different partitions must NOT
      // interfere (Kafka compacts per partition)
      val p0 = new GraftLogProducer(GraftLog.partitionDir(dir, 0))
      val p1 = new GraftLogProducer(GraftLog.partitionDir(dir, 1))
      p0.publish(Seq("k0\tp0v0", "k1\tp0v0"))
      p0.publish(Seq("k0\tp0v1"))
      p0.publish(Seq("x\t1")) // newest, never rewritten
      p1.publish(Seq("k0\tp1v0", "k2\tp1v0"))
      p1.publish(Seq("y\t1")) // newest
      // partition 0 drops k0@0 (superseded by k0@2); partition 1 drops
      // nothing — its k0 is a DIFFERENT partition's key space
      assert(GraftLog.compactPartitions(dir, conf) === 1)
      val got = spark.read.format("graft-log")
        .option("path", dir).option("partitioned", "true").load()
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
      assert(got === Set(
        (0, 1L, "k1\tp0v0"), (0, 2L, "k0\tp0v1"), (0, 3L, "x\t1"),
        (1, 0L, "k0\tp1v0"), (1, 1L, "k2\tp1v0"), (1, 2L, "y\t1")))
      // idempotent per partition once clean
      assert(GraftLog.compactPartitions(dir, conf) === 0)
    }

    it("log compaction preserves segment seal times, so retention.ms still expires compacted data") {
      // truncateOlderThanMs ages segments by file mtime; a compaction
      // rewrite stamped "now" would keep refreshing the oldest
      // segment's age and retention.ms would never expire it (Kafka's
      // cleaner preserves timestamps across cleaning for this reason)
      val dir = tmp("graftcmpret")
      val p = new GraftLogProducer(dir)
      val conf = new Configuration()
      (0 until 3).foreach(s =>
        p.publish((s * 10 until (s + 1) * 10).map(o => s"k${o % 4}\tv$o")))
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      val sealMs = System.currentTimeMillis() - 100000L
      GraftLog.listSegments(dir, conf).foreach(s =>
        fs.setTimes(new org.apache.hadoop.fs.Path(s.path), sealMs, -1))
      assert(p.compactTopic() > 0) // rewrites the head segments
      // every segment (including the compacted rewrites) is older than
      // the horizon — the whole log expires; a fresh-stamped rewrite
      // would stop the contiguous cut at segment 0 and expire nothing
      assert(p.truncateOlderThanMs(50000L) === 3)
      assert(GraftLog.earliestOffset(dir, conf) === 30L)
    }

    it("log compaction: a reader planned against the pre-compaction form still reads it (one-pass grace)") {
      val dir = tmp("graftlogcompact3")
      val p = new GraftLogProducer(dir)
      val conf = new Configuration()
      (0 until 3).foreach(s =>
        p.publish((s * 10 until (s + 1) * 10).map(o => s"k${o % 4}\tv$o")))
      // plan slices against the CURRENT (uncompacted) listing — the
      // mid-scan reader's view
      val planned = GraftLog.slices(GraftLog.listSegments(dir, conf), 0L, 30L)
      assert(planned.forall(!_.gapped))
      assert(p.compactTopic() > 0)
      // the superseded originals are still on disk (swept next pass), so
      // the planned read completes with the ORIGINAL records
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      planned.foreach(sl =>
        assert(fs.exists(new org.apache.hadoop.fs.Path(sl.file)), s"planned file vanished: ${sl.file}"))
      // and the NEXT pass sweeps them
      assert(p.compactTopic() === 0)
      planned.take(2).foreach(sl => // head segments were rewritten -> originals swept
        assert(!fs.exists(new org.apache.hadoop.fs.Path(sl.file)), s"superseded form not swept: ${sl.file}"))
    }

    it("a fresh consumer on a truncated topic starts at the retained head") {
      val dir = tmp("graftlogret2")
      val p = new GraftLogProducer(dir)
      (0 until 3).foreach(s => p.publish((s * 100 until (s + 1) * 100).map(_.toString)))
      p.truncateBefore(100L)
      val db = GraftDB.inMemory(spark)
      // the closed-form transform maps retained values [100, 300)
      StreamingIngest.drainLog(spark, db, dir, maxRecordsPerTrigger = 120L,
        tmp("graftlogret2ckpt"))
      assert(db.length === 200L)
      assert(db.allDF().select(graft.model.Point.TimeCol).distinct().count() === 200L)
    }

    it("byte-offset index sidecar: mid-segment slices seek, and fall back without it") {
      val dir = tmp("graftlogidx")
      val p = new GraftLogProducer(dir)
      p.publish((0 until 1000).map(i => s"rec$i"), indexEvery = 100)
      assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".seg.idx")))
      val segs = GraftLog.listSegments(dir, new Configuration())
      assert(segs.map(_.count) === Seq(1000L)) // .idx invisible to offset discovery
      def readSlice(lo: Long, hi: Long): Seq[(Long, String)] = {
        val slice = GraftLog.slices(segs, lo, hi)
        val rf = new graft.streaming.GraftLogReaderFactory()
        slice.flatMap { s =>
          val r = rf.createReader(s)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
          while (r.next()) { val row = r.get(); out += ((row.getLong(0), row.getString(1))) }
          r.close()
          out
        }
      }
      // slice that starts mid-segment (between index points): seeks to
      // record 700's byte offset, skips 37, reads exactly [737, 742)
      assert(readSlice(737L, 742L) === (737 until 742).map(i => (i.toLong, s"rec$i")))
      // fallback: same slice with the index gone reads identically
      assert(new java.io.File(dir).listFiles().filter(_.getName.endsWith(".idx"))
        .forall(_.delete()))
      assert(readSlice(737L, 742L) === (737 until 742).map(i => (i.toLong, s"rec$i")))
    }

    it("batch-reads the whole log with global offsets") {
      val dir = tmp("graftlog")
      val p = new GraftLogProducer(dir)
      p.publish((0 until 5).map(i => s"rec$i"))
      p.publish((5 until 8).map(i => s"rec$i"))
      val got = spark.read.format("graft-log").option("path", dir).load()
        .orderBy("offset").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === (0 until 8).map(i => (i.toLong, s"rec$i")))
    }

    it("reports listing-only statistics, so a small topic auto-broadcasts") {
      val dir = tmp("graftlogstats")
      val p = new GraftLogProducer(dir)
      p.publish((0 until 50).map(i => s"k$i"))
      // exact row count and positive byte size, straight from the scan
      val stats = new graft.streaming.GraftLogScan(dir, None).estimateStatistics()
      assert(stats.numRows().getAsLong === 50L)
      assert(stats.sizeInBytes().getAsLong > 0L)
      // Catalyst sees those stats: joining the small topic against a
      // larger table picks a broadcast join with NO broadcast() hint
      val topic = spark.read.format("graft-log").option("path", dir).load()
      val big = spark.range(100000L).selectExpr("concat('k', id % 64) AS payload", "id")
      val joined = big.join(topic, "payload")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"expected auto-broadcast, got:\n$plan")
      // id%64==k occurs 1562 times, +1 for k < 100000%64 = 32
      assert(joined.count() === 50L * 1562L + 32L)
    }
  }

  describe("graft-log micro-batch stream") {
    it("drains a static log under AvailableNow in rate-limited batches") {
      val dir = tmp("graftlog")
      val p = new GraftLogProducer(dir)
      (0 until 6).foreach(s => p.publish((s * 100 until (s + 1) * 100).map(_.toString)))
      val db = GraftDB.atPath(spark, tmp("graftlogdb"))
      val ckpt = tmp("graftlogckpt")
      StreamingIngest.drainLog(spark, db, dir, maxRecordsPerTrigger = 150L, ckpt)
      assert(db.length === 600L)
      // admission control actually split the drain: >= 4 committed batches
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .count(f => f.getName.forall(_.isDigit))
      assert(commits >= 4, s"expected rate-limited batches, got $commits commits")
      // converged content is the closed form of [0, 600)
      val bySensor = db.allDF()
        .groupBy(element_at(col(graft.model.Point.TagsCol), "sensor").as("s"))
        .agg(count(lit(1)).as("n"), sum(element_at(col(graft.model.Point.FieldsCol), "v")).as("sv"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val expect = (0 until 600).groupBy(v => s"s${v % 5}")
        .map { case (k, vs) => k -> ((vs.size.toLong, vs.map(_ % 90).sum.toDouble)) }
      assert(bySensor === expect)
    }

    it("surfaces consumer lag in StreamingQueryProgress source metrics") {
      val dir = tmp("graftlogmet")
      val p = new GraftLogProducer(dir)
      (0 until 4).foreach(s => p.publish((s * 100 until (s + 1) * 100).map(_.toString)))
      val q = spark.readStream.format("graft-log")
        .option("path", dir).option("maxRecordsPerTrigger", 100L).load()
        .writeStream.format("noop")
        .option("checkpointLocation", tmp("graftlogmetckpt"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val progs = q.recentProgress.filter(_.sources.nonEmpty)
      assert(progs.nonEmpty)
      val metrics = progs.map(_.sources.head.metrics)
      // every progress carries the lag triple; the drain ends at zero backlog
      metrics.foreach { m =>
        assert(m.containsKey("backlogRecords") && m.containsKey("latestOffset")
          && m.containsKey("consumedOffset"), s"missing lag metrics: $m")
      }
      assert(metrics.last.get("backlogRecords") === "0")
      assert(metrics.last.get("consumedOffset") === "400")
      // mid-drain progress saw real positive backlog (rate-limited batches)
      assert(metrics.exists(_.get("backlogRecords").toLong > 0L))
    }

    it("kill + resume from checkpoint with a forced batch replay lands every record exactly once") {
      val dir = tmp("graftlog")
      val producer = new GraftLogProducer(dir)
      (0 until 6).foreach(s => producer.publish((s * 100 until (s + 1) * 100).map(_.toString)))
      val root = tmp("graftlogdb")
      val ckpt = tmp("graftlogckpt")
      val db = GraftDB.atPath(spark, root)
      val src = StreamingIngest.logPointsSource(spark, dir, maxRecordsPerTrigger = 150L)
      val q1 = StreamingIngest.startExactlyOnce(src, db, ckpt, "killresume")
      try {
        val deadline = System.currentTimeMillis() + 60000L
        while (db.length < 150L && System.currentTimeMillis() < deadline)
          Thread.sleep(25L)
        assert(db.length >= 150L, "first run never landed a batch")
      } finally { q1.stop(); q1.awaitTermination() }
      // wait until the checkpoint is quiescent — stop() can return a
      // beat before the micro-batch thread's last metadata write lands,
      // and mutating the log while it races would test OUR bug, not the
      // crash window
      def ids(d: String): Seq[Long] = {
        val fs = new java.io.File(s"$ckpt/$d").listFiles()
        if (fs == null) Nil
        else fs.map(_.getName).filter(_.forall(_.isDigit)).map(_.toLong).sorted.toSeq
      }
      var snap = (ids("offsets"), ids("commits"))
      var settled = false
      while (!settled) {
        Thread.sleep(200L)
        val next = (ids("offsets"), ids("commits"))
        settled = next == snap
        snap = next
      }
      // simulate the worst crash window: the append COMMITTED in the
      // store but the engine died before writing the batch's commit log
      // entry. If the kill already left an in-flight batch (offsets
      // ahead of commits) that replay is pending naturally; on a clean
      // boundary, delete the newest commit record to force one.
      val (offs, comms) = snap
      info(s"after stop: offsets=$offs commits=$comms")
      if (offs.lastOption == comms.lastOption) {
        // delete through the Hadoop FS (not java.io.File): the local
        // ChecksumFileSystem keeps a .crc sidecar whose stale presence
        // would make Spark's commit rename fail as "already exists"
        val cp = new org.apache.hadoop.fs.Path(s"$ckpt/commits/${comms.last}")
        val cfs = cp.getFileSystem(new Configuration())
        assert(cfs.delete(cp, false))
        info(s"forced replay of batch ${comms.last}")
      } else info(s"natural replay pending for batch ${offs.last}")
      // the log keeps growing while the consumer is down
      (6 until 8).foreach(s => producer.publish((s * 100 until (s + 1) * 100).map(_.toString)))
      val db2 = GraftDB.atPath(spark, root)
      val q2 = StreamingIngest.startExactlyOnce(
        StreamingIngest.logPointsSource(spark, dir, maxRecordsPerTrigger = 150L),
        db2, ckpt, "killresume")
      try {
        val deadline = System.currentTimeMillis() + 120000L
        while (db2.length < 800L && q2.exception.isEmpty &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(25L)
        assert(q2.exception.isEmpty, s"resumed query failed: ${q2.exception}")
      } finally q2.stop()
      // exactly once: 800 rows, and every value distinct (time encodes v)
      assert(db2.length === 800L)
      assert(db2.allDF().select(graft.model.Point.TimeCol).distinct().count() === 800L)
    }
  }

  describe("kill/resume soak") {
    it("four kill-resume cycles with forced replays still converge to exactly-once") {
      val dir = tmp("graftlogsoak")
      val producer = new GraftLogProducer(dir)
      val ckpt = tmp("graftlogsoakckpt")
      val root = tmp("graftlogsoakdb")
      val total = 2000L
      (0 until 10).foreach(s => producer.publish((s * 100 until (s + 1) * 100).map(_.toString)))
      def ids(d: String): Seq[Long] = {
        val fs = new java.io.File(s"$ckpt/$d").listFiles()
        if (fs == null) Nil
        else fs.map(_.getName).filter(_.forall(_.isDigit)).map(_.toLong).sorted.toSeq
      }
      var published = 10
      for (cycle <- 0 until 4) {
        val db = GraftDB.atPath(spark, root)
        val startLen = db.length
        val q = StreamingIngest.startExactlyOnce(
          StreamingIngest.logPointsSource(spark, dir, maxRecordsPerTrigger = 130L),
          db, ckpt, "soak")
        try {
          val target = if (cycle == 3) total else math.min(total, startLen + 260L)
          val deadline = System.currentTimeMillis() + 120000L
          while (db.length < target && q.exception.isEmpty &&
              System.currentTimeMillis() < deadline)
            Thread.sleep(20L)
          assert(q.exception.isEmpty, s"cycle $cycle: ${q.exception}")
        } finally { q.stop(); q.awaitTermination() }
        // quiesce, then force a replay on clean boundaries (crash window):
        // demand TWO consecutive stable snapshots — one equality can race
        // a metadata write that straddles the poll interval
        var snap = (ids("offsets"), ids("commits"))
        var stable = 0
        while (stable < 2) {
          Thread.sleep(200L)
          val next = (ids("offsets"), ids("commits"))
          if (next == snap) stable += 1 else stable = 0
          snap = next
        }
        if (cycle < 3 && snap._1.lastOption == snap._2.lastOption && snap._2.nonEmpty) {
          val cp = new org.apache.hadoop.fs.Path(s"$ckpt/commits/${snap._2.last}")
          cp.getFileSystem(new Configuration()).delete(cp, false)
        }
        // the topic keeps growing while the consumer is down
        if (published < 20) {
          (published until published + 5).foreach(s =>
            producer.publish((s * 100 until (s + 1) * 100).map(_.toString)))
          published += 5
        }
      }
      val db = GraftDB.atPath(spark, root)
      assert(db.length === total)
      assert(db.allDF().select(graft.model.Point.TimeCol).distinct().count() === total)
    }
  }

  describe("graft-log PARTITIONED topics (N producer sub-dirs as one source)") {
    import graft.streaming.{GraftLogPartitionedMicroBatchStream, GraftLogPartitionedOffset, GraftLogPartSlice}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit

    it("composite offsets round-trip; admission budget splits proportionally to backlog") {
      val topic = tmp("graftplogoff")
      val conf = new Configuration()
      new GraftLogProducer(GraftLog.partitionDir(topic, 0))
        .publish((0 until 100).map(_.toString))
      new GraftLogProducer(GraftLog.partitionDir(topic, 1))
        .publish((0 until 300).map(_.toString))
      new GraftLogProducer(GraftLog.partitionDir(topic, 2)) // exists, empty
      assert(GraftLog.listPartitions(topic, conf) === Seq(0, 1, 2))
      val stream = new GraftLogPartitionedMicroBatchStream(topic, Some(100L))
      val init = stream.initialOffset().asInstanceOf[GraftLogPartitionedOffset]
      assert(init.parts === Map(0 -> 0L, 1 -> 0L, 2 -> 0L))
      assert(GraftLogPartitionedOffset.fromJson(init.json()) === init)
      assert(init.json() === """{"0":0,"1":0,"2":0}""")
      // backlogs 100/300/0, budget 100 → proportional floors 25/75/0
      val end = stream.latestOffset(init, ReadLimit.maxRows(100L))
        .asInstanceOf[GraftLogPartitionedOffset]
      assert(end.parts === Map(0 -> 25L, 1 -> 75L, 2 -> 0L))
      // one input partition per touched (topic-partition, segment slice)
      val slices = stream.planInputPartitions(init, end)
        .map(_.asInstanceOf[GraftLogPartSlice])
      assert(slices.map(s => (s.partition, s.endLine - s.startLine)).toSeq ===
        Seq((0, 25L), (1, 75L)))
      // no limit → everything; offsets never move backwards
      val all = stream.latestOffset(end, ReadLimit.allAvailable())
        .asInstanceOf[GraftLogPartitionedOffset]
      assert(all.parts === Map(0 -> 100L, 1 -> 300L, 2 -> 0L))
      // a partition appearing AFTER the checkpoint enters at its head
      new GraftLogProducer(GraftLog.partitionDir(topic, 3))
        .publish(Seq("late"))
      val withNew = stream.latestOffset(end, ReadLimit.allAvailable())
        .asInstanceOf[GraftLogPartitionedOffset]
      assert(withNew.parts(3) === 1L)
    }

    it("budget distribution invariants hold over 500 random backlog profiles") {
      val rnd = new scala.util.Random(7)
      for (trial <- 0 until 500) {
        val nParts = 1 + rnd.nextInt(8)
        val backlogs = (0 until nParts).map(p => (p, rnd.nextInt(1000).toLong))
        val total = backlogs.map(_._2).sum
        val budget = rnd.nextInt(1200).toLong
        val alloc = GraftLog.distributeBudget(budget, backlogs)
        // exact budget use (capped by what exists), per-partition bound,
        // and determinism under recomputation
        assert(alloc.values.sum === math.min(budget, total), s"trial $trial")
        backlogs.foreach { case (p, b) =>
          assert(alloc(p) >= 0 && alloc(p) <= b, s"trial $trial p=$p")
        }
        assert(GraftLog.distributeBudget(budget, backlogs) === alloc, s"trial $trial")
        // progress: a positive budget against a non-empty backlog drains
        if (budget > 0 && total > 0) assert(alloc.values.sum > 0, s"trial $trial")
      }
      // overflow regime: budget × backlog far past Long.MaxValue — the
      // shares must stay exact, non-negative, and budget-summing
      val huge = Seq((0, 10000000000L), (1, 5000000000L), (2, 1L))
      val big = GraftLog.distributeBudget(1000000000L, huge)
      assert(big.values.sum === 1000000000L, s"overflowed shares: $big")
      huge.foreach { case (p, b) => assert(big(p) >= 0 && big(p) <= b, s"p=$p: $big") }
    }

    it("batch-reads all partitions with (partition, offset) identity") {
      val topic = tmp("graftplogbatch")
      new GraftLogProducer(GraftLog.partitionDir(topic, 0))
        .publish((0 until 4).map(i => s"a$i"))
      new GraftLogProducer(GraftLog.partitionDir(topic, 1))
        .publish((0 until 3).map(i => s"b$i"))
      val got = spark.read.format("graft-log")
        .option("path", topic).option("partitioned", "true").load()
        .orderBy("partition", "offset").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSeq
      assert(got ===
        (0 until 4).map(i => (0, i.toLong, s"a$i")) ++
          (0 until 3).map(i => (1, i.toLong, s"b$i")))
      // exact listing-only statistics across partitions
      val stats = new graft.streaming.GraftLogPartitionedScan(topic, None)
        .estimateStatistics()
      assert(stats.numRows().getAsLong === 7L)
      assert(stats.sizeInBytes().getAsLong > 0L)
    }

    it("drains a 3-partition topic under AvailableNow through the unchanged ingest graph") {
      val topic = tmp("graftplogdrain")
      (0 until 3).foreach { p =>
        val prod = new GraftLogProducer(GraftLog.partitionDir(topic, p))
        (0 until 900).filter(_ % 3 == p).grouped(150)
          .foreach(g => prod.publish(g.map(_.toString)))
      }
      val db = GraftDB.atPath(spark, tmp("graftplogdraindb"))
      val ckpt = tmp("graftplogdrainckpt")
      StreamingIngest.drainPartitionedLog(spark, db, topic,
        maxRecordsPerTrigger = 250L, ckpt)
      assert(db.length === 900L)
      // admission control split the drain into rate-limited batches
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .count(f => f.getName.forall(_.isDigit))
      assert(commits >= 4, s"expected rate-limited batches, got $commits commits")
      // converged content is the closed form of [0, 900) — independent of
      // how the budget interleaved the three partitions
      val bySensor = db.allDF()
        .groupBy(element_at(col(graft.model.Point.TagsCol), "sensor").as("s"))
        .agg(count(lit(1)).as("n"),
          sum(element_at(col(graft.model.Point.FieldsCol), "v")).as("sv"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val expect = (0 until 900).groupBy(v => s"s${v % 6}")
        .map { case (k, vs) => k -> ((vs.size.toLong, vs.map(_ % 70).sum.toDouble)) }
      assert(bySensor === expect)
    }

    it("kill + resume with a forced replay is exactly-once per partition") {
      val topic = tmp("graftplogkr")
      val producers = (0 until 3).map(p =>
        new GraftLogProducer(GraftLog.partitionDir(topic, p)))
      (0 until 3).foreach { p =>
        (0 until 1200).filter(_ % 3 == p).grouped(200)
          .foreach(g => producers(p).publish(g.map(_.toString)))
      }
      val root = tmp("graftplogkrdb")
      val ckpt = tmp("graftplogkrckpt")
      val db = GraftDB.atPath(spark, root)
      val q1 = StreamingIngest.startExactlyOnce(
        StreamingIngest.partitionedLogPointsSource(spark, topic, 300L),
        db, ckpt, "pkill")
      try {
        val deadline = System.currentTimeMillis() + 60000L
        while (db.length < 300L && System.currentTimeMillis() < deadline)
          Thread.sleep(25L)
        assert(db.length >= 300L, "first run never landed a batch")
      } finally { q1.stop(); q1.awaitTermination() }
      def ids(d: String): Seq[Long] = {
        val fs = new java.io.File(s"$ckpt/$d").listFiles()
        if (fs == null) Nil
        else fs.map(_.getName).filter(_.forall(_.isDigit)).map(_.toLong).sorted.toSeq
      }
      var snap = (ids("offsets"), ids("commits"))
      var stable = 0
      while (stable < 2) {
        Thread.sleep(200L)
        val next = (ids("offsets"), ids("commits"))
        if (next == snap) stable += 1 else stable = 0
        snap = next
      }
      // force the worst crash window on a clean boundary: the store
      // append landed but the engine's commit record didn't — the
      // replayed batch re-plans the SAME per-partition offset ranges
      if (snap._1.lastOption == snap._2.lastOption && snap._2.nonEmpty) {
        val cp = new org.apache.hadoop.fs.Path(s"$ckpt/commits/${snap._2.last}")
        cp.getFileSystem(new Configuration()).delete(cp, false)
        info(s"forced replay of batch ${snap._2.last}")
      } else info(s"natural replay pending for batch ${snap._1.last}")
      // every partition keeps growing while the consumer is down
      (0 until 3).foreach { p =>
        producers(p).publish(
          (1200 until 1500).filter(_ % 3 == p).map(_.toString))
      }
      val db2 = GraftDB.atPath(spark, root)
      val q2 = StreamingIngest.startExactlyOnce(
        StreamingIngest.partitionedLogPointsSource(spark, topic, 300L),
        db2, ckpt, "pkill")
      try {
        val deadline = System.currentTimeMillis() + 120000L
        while (db2.length < 1500L && q2.exception.isEmpty &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(25L)
        assert(q2.exception.isEmpty, s"resumed query failed: ${q2.exception}")
      } finally q2.stop()
      // exactly once across ALL partitions: 1500 rows, all values distinct
      assert(db2.length === 1500L)
      assert(db2.allDF().select(graft.model.Point.TimeCol).distinct().count() === 1500L)
    }

    it("surfaces per-partition consumer lag in source metrics") {
      val topic = tmp("graftplogmet")
      new GraftLogProducer(GraftLog.partitionDir(topic, 0))
        .publish((0 until 300).map(_.toString))
      new GraftLogProducer(GraftLog.partitionDir(topic, 1))
        .publish((0 until 100).map(_.toString))
      val q = spark.readStream.format("graft-log")
        .option("path", topic).option("partitioned", "true")
        .option("maxRecordsPerTrigger", 100L).load()
        .writeStream.format("noop")
        .option("checkpointLocation", tmp("graftplogmetck"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val metrics = q.recentProgress.filter(_.sources.nonEmpty).map(_.sources.head.metrics)
      assert(metrics.nonEmpty)
      metrics.foreach { m =>
        assert(m.containsKey("backlogRecords.p0000") &&
          m.containsKey("backlogRecords.p0001") && m.get("partitions") == "2", s"$m")
      }
      // drained: per-partition lag ends at zero; mid-drain the HOT
      // partition showed more lag than the cold one at least once
      assert(metrics.last.get("backlogRecords.p0000") === "0")
      assert(metrics.last.get("backlogRecords.p0001") === "0")
      assert(metrics.exists(m => m.get("backlogRecords.p0000").toLong >
        m.get("backlogRecords.p0001").toLong))
    }

    it("retention is per-partition: one partition truncates, siblings and offsets unaffected") {
      val topic = tmp("graftplogret")
      val producers = (0 until 2).map(p =>
        new GraftLogProducer(GraftLog.partitionDir(topic, p)))
      producers.foreach { prod =>
        (0 until 3).foreach(s => prod.publish((s * 100 until (s + 1) * 100).map(_.toString)))
      }
      // truncate partition 0's first two segments; partition 1 untouched
      assert(producers(0).truncateBefore(200L) === 2)
      val got = spark.read.format("graft-log")
        .option("path", topic).option("partitioned", "true").load()
        .orderBy("partition", "offset").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSeq
      // partition 0 keeps [200, 300) at UNSHIFTED offsets; partition 1 full
      assert(got.filter(_._1 == 0).map(_._2) === (200L until 300L))
      assert(got.filter(_._1 == 0).head._3 === "200")
      assert(got.filter(_._1 == 1).map(_._2) === (0L until 300L))
      // a fresh partitioned consumer starts at each partition's retained head
      val db = GraftDB.inMemory(spark)
      StreamingIngest.drainPartitionedLog(spark, db, topic,
        maxRecordsPerTrigger = 250L, tmp("graftplogretck"))
      assert(db.length === 400L) // 100 retained + 300 full
    }

    it("a partition added mid-stream is discovered and drained from its head") {
      val topic = tmp("graftplogadd")
      (0 until 2).foreach { p =>
        new GraftLogProducer(GraftLog.partitionDir(topic, p))
          .publish((0 until 300).filter(_ % 2 == p).map(_.toString))
      }
      val root = tmp("graftplogadddb")
      val ckpt = tmp("graftplogaddck")
      // first drain: two partitions
      val db1 = GraftDB.atPath(spark, root)
      StreamingIngest.drainPartitionedLog(spark, db1, topic, 100L, ckpt)
      assert(db1.length === 300L)
      // a THIRD producer joins; the same checkpoint resumes and picks the
      // new partition up from ITS earliest offset
      new GraftLogProducer(GraftLog.partitionDir(topic, 2))
        .publish((300 until 400).map(_.toString))
      val db2 = GraftDB.atPath(spark, root)
      StreamingIngest.drainPartitionedLog(spark, db2, topic, 100L, ckpt)
      assert(db2.length === 400L)
      assert(db2.allDF().select(graft.model.Point.TimeCol).distinct().count() === 400L)
    }

    it("multi-topic fan-in: plain + partitioned topics union into one exactly-once ingest") {
      val ta = tmp("graftmta")
      val tb = tmp("graftmtb")
      val ckpt = tmp("graftmtck")
      new GraftLogProducer(ta).publish((0 until 200).map(_.toString))
      (0 until 2).foreach { p =>
        new GraftLogProducer(GraftLog.partitionDir(tb, p))
          .publish((1000 until 1100).filter(_ % 2 == p).map(_.toString))
      }
      val db = GraftDB.inMemory(spark)
      val topics = Seq(ta -> false, tb -> true)
      StreamingIngest.drainTopics(spark, db, topics, 64L, ckpt)
      assert(db.length === 300L)
      // topic rides as a tag; per-topic counts are the published sets
      val byTopic = db.allDF()
        .groupBy(org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.col(graft.model.Point.TagsCol), "topic"))
        .count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(byTopic === Map(new java.io.File(ta).getName -> 200L,
        new java.io.File(tb).getName -> 100L))
      // continuation against the SAME checkpoint: each topic resumes from
      // its own committed offset, so only the new records land
      new GraftLogProducer(ta).publish((200 until 230).map(_.toString))
      StreamingIngest.drainTopics(spark, db, topics, 64L, ckpt)
      assert(db.length === 330L)
      assert(db.allDF().select(graft.model.Point.TimeCol).distinct().count() === 330L)
    }

    it("multi-topic kill + resume with a forced replay is exactly-once across the union's per-topic offsets") {
      val ta = tmp("graftmtkra")
      val tb = tmp("graftmtkrb")
      val ckpt = tmp("graftmtkrck")
      val root = tmp("graftmtkrdb")
      val pa = new GraftLogProducer(ta)
      (0 until 600).grouped(150).foreach(g => pa.publish(g.map(_.toString)))
      val pbs = (0 until 2).map(p => new GraftLogProducer(GraftLog.partitionDir(tb, p)))
      (0 until 2).foreach { p =>
        (600 until 1200).filter(_ % 2 == p).grouped(150)
          .foreach(g => pbs(p).publish(g.map(_.toString)))
      }
      val topics = Seq(ta -> false, tb -> true)
      val db = GraftDB.atPath(spark, root)
      // kill MID-drain: a small per-topic budget forces several batches
      val q1 = StreamingIngest.startExactlyOnce(
        StreamingIngest.multiTopicPointsSource(spark, topics, 100L),
        db, ckpt, "mtkill")
      try {
        val deadline = System.currentTimeMillis() + 60000L
        while (db.length < 200L && System.currentTimeMillis() < deadline)
          Thread.sleep(25L)
        assert(db.length >= 200L, "first run never landed a batch")
      } finally { q1.stop(); q1.awaitTermination() }
      // force the worst crash window on a clean boundary: store append
      // landed, engine commit record didn't — the replayed batch must
      // re-plan the SAME per-topic offset ranges across the union
      def ids(d: String): Seq[Long] = {
        val fs = new java.io.File(s"$ckpt/$d").listFiles()
        if (fs == null) Nil
        else fs.map(_.getName).filter(_.forall(_.isDigit)).map(_.toLong).sorted.toSeq
      }
      var snap = (ids("offsets"), ids("commits"))
      var stable = 0
      while (stable < 2) {
        Thread.sleep(200L)
        val next = (ids("offsets"), ids("commits"))
        if (next == snap) stable += 1 else stable = 0
        snap = next
      }
      if (snap._1.lastOption == snap._2.lastOption && snap._2.nonEmpty) {
        val cp = new org.apache.hadoop.fs.Path(s"$ckpt/commits/${snap._2.last}")
        cp.getFileSystem(new Configuration()).delete(cp, false)
        info(s"forced replay of batch ${snap._2.last}")
      } else info(s"natural replay pending for batch ${snap._1.last}")
      // BOTH topics keep growing while the consumer is down
      pa.publish((1200 until 1350).map(_.toString))
      (0 until 2).foreach { p =>
        pbs(p).publish((1350 until 1500).filter(_ % 2 == p).map(_.toString))
      }
      val db2 = GraftDB.atPath(spark, root)
      val q2 = StreamingIngest.startExactlyOnce(
        StreamingIngest.multiTopicPointsSource(spark, topics, 100L),
        db2, ckpt, "mtkill")
      try {
        val deadline = System.currentTimeMillis() + 120000L
        while (db2.length < 1500L && q2.exception.isEmpty &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(25L)
        assert(q2.exception.isEmpty, s"resumed query failed: ${q2.exception}")
      } finally q2.stop()
      // exactly once across the whole union: 1500 rows, all values
      // distinct (time = epoch + v·1000 and values are disjoint by topic)
      assert(db2.length === 1500L)
      assert(db2.allDF().select(graft.model.Point.TimeCol).distinct().count() === 1500L)
    }

    it("two independent consumer groups drain one topic, each exactly-once") {
      val topic = tmp("graftploggrp")
      (0 until 2).foreach { p =>
        new GraftLogProducer(GraftLog.partitionDir(topic, p))
          .publish((0 until 500).filter(_ % 2 == p).map(_.toString))
      }
      // separate checkpoints + separate stores = Kafka consumer groups;
      // the topic is immutable shared state, offsets are group-private
      val (dbA, dbB) = (GraftDB.atPath(spark, tmp("grpA")), GraftDB.atPath(spark, tmp("grpB")))
      StreamingIngest.drainPartitionedLog(spark, dbA, topic, 200L, tmp("grpAck"), "groupA")
      StreamingIngest.drainPartitionedLog(spark, dbB, topic, 130L, tmp("grpBck"), "groupB")
      assert(dbA.length === 500L && dbB.length === 500L)
      assert(dbA.allDF().select(graft.model.Point.TimeCol).distinct().count() === 500L)
      assert(dbB.allDF().select(graft.model.Point.TimeCol).distinct().count() === 500L)
    }

    it("scratch lifecycle: marker/releaseSince drops a drained topic's on-disk state") {
      val before = graft.util.Scratch.marker()
      // the Verify-harness bracket: allocate → run to completion → release
      val (topic, dbDir, ckpt) = (graft.util.Scratch.dir("graftploglt"),
        graft.util.Scratch.dir("graftplogltdb"), graft.util.Scratch.dir("graftplogltck"))
      new GraftLogProducer(GraftLog.partitionDir(topic, 0))
        .publish((0 until 60).map(_.toString))
      val db = GraftDB.atPath(spark, dbDir)
      StreamingIngest.drainPartitionedLog(spark, db, topic,
        maxRecordsPerTrigger = 50L, ckpt)
      assert(db.length === 60L)
      graft.util.Scratch.releaseSince(before)
      Seq(topic, dbDir, ckpt).foreach(d =>
        assert(!new java.io.File(d).exists(), s"scratch dir survived release: $d"))
    }

    it("partitioned SINK routes by computed partition; replays drop per partition") {
      val src = tmp("graftpsinksrc")
      val dst = tmp("graftpsinkdst")
      val ckpt = tmp("graftpsinkckpt")
      new GraftLogProducer(src).publish((0 until 200).map(_.toString))
      new GraftLogProducer(src).publish((200 until 400).map(_.toString))
      // the query computes the partition (Kafka's producer partitioner)
      def relay(): Unit = {
        val q = spark.readStream.format("graft-log")
          .option("path", src).option("maxRecordsPerTrigger", 150L).load()
          .selectExpr("cast(cast(payload AS BIGINT) % 3 AS INT) AS partition", "payload")
          .writeStream.format("graft-log")
          .option("path", dst).option("partitioned", "true")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      relay()
      val got = spark.read.format("graft-log")
        .option("path", dst).option("partitioned", "true").load()
        .orderBy("partition", "offset").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2).toInt)).toSeq
      assert(got.size === 400)
      // every record in its computed partition, offsets dense per partition
      (0 until 3).foreach { tp =>
        val inTp = got.filter(_._1 == tp)
        assert(inTp.map(_._2) === (0L until inTp.size.toLong), s"partition $tp offsets")
        assert(inTp.forall(_._3 % 3 == tp), s"partition $tp routing")
      }
      assert(got.map(_._3).sorted === (0 until 400))
      // staged files are gone; each sub-log carries its own epoch markers
      (0 until 3).foreach { tp =>
        val names = new java.io.File(GraftLog.partitionDir(dst, tp)).listFiles().map(_.getName)
        assert(!names.exists(_.contains(".staged")), s"p$tp: ${names.toSeq}")
        assert(names.exists(_.startsWith("_epoch-")), s"p$tp: ${names.toSeq}")
      }
      // force an epoch replay: per-partition markers drop the duplicate
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .filter(_.getName.forall(_.isDigit))
      val cp = new org.apache.hadoop.fs.Path(
        s"$ckpt/commits/${commits.maxBy(_.getName.toLong).getName}")
      cp.getFileSystem(new Configuration()).delete(cp, false)
      relay()
      assert(spark.read.format("graft-log").option("path", dst)
        .option("partitioned", "true").load().count() === 400L)
      // the stream keeps flowing: publish more, relay again, fan-in drains
      new GraftLogProducer(src).publish((400 until 430).map(_.toString))
      relay()
      val db = GraftDB.inMemory(spark)
      StreamingIngest.drainPartitionedLog(spark, db, dst,
        maxRecordsPerTrigger = 200L, tmp("graftpsinkdrainck"))
      assert(db.length === 430L)
      assert(db.allDF().select(graft.model.Point.TimeCol).distinct().count() === 430L)
    }
  }

  describe("graft-log streaming SINK (the write side of the connector)") {
    it("epoch commit sweeps dead attempts' staged leftovers, never future epochs") {
      val src = tmp("graftswpsrc")
      val dst = tmp("graftswpdst")
      new GraftLogProducer(src).publish((0 until 100).map(_.toString))
      // a killed task skips abort(): plant its orphan staged file (epoch
      // 0 = the first epoch this relay will commit) plus a FUTURE
      // epoch's, which the sweep must never touch
      val dstDir = new java.io.File(dst); dstDir.mkdirs()
      val orphan = new java.io.File(dstDir, ".sink-e000000000000-p9999-t7.staged")
      val future = new java.io.File(dstDir, ".sink-e000000000099-p9999-t7.staged")
      Seq(orphan, future).foreach { f =>
        val w = new java.io.FileWriter(f); w.write("zombie\n"); w.close()
      }
      val q = spark.readStream.format("graft-log")
        .option("path", src).load().selectExpr("payload")
        .writeStream.format("graft-log")
        .option("path", dst).option("checkpointLocation", tmp("graftswpck"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(!orphan.exists(), "dead attempt's staged leftover not swept")
      assert(future.exists(), "future epoch's staged file must survive")
      // the zombie's rows never became visible
      assert(spark.read.format("graft-log").option("path", dst).load()
        .count() === 100L)

      // same sweep per sub-log on the PARTITIONED sink
      val pdst = tmp("graftswppdst")
      val sub = new java.io.File(GraftLog.partitionDir(pdst, 0)); sub.mkdirs()
      val porphan = new java.io.File(sub, ".sink-e000000000000-p9999-t3.staged")
      val pw = new java.io.FileWriter(porphan); pw.write("zombie\n"); pw.close()
      val pq = spark.readStream.format("graft-log")
        .option("path", src).load()
        .selectExpr("cast(cast(payload AS BIGINT) % 2 AS INT) AS partition", "payload")
        .writeStream.format("graft-log")
        .option("path", pdst).option("partitioned", "true")
        .option("checkpointLocation", tmp("graftswppck"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      pq.awaitTermination()
      assert(!porphan.exists(), "partitioned sub-log staged leftover not swept")
      assert(spark.read.format("graft-log").option("path", pdst)
        .option("partitioned", "true").load().count() === 100L)
    }

    it("publishes epochs atomically; a forced epoch replay does not duplicate") {
      val src = tmp("graftlogsrc")
      val dst = tmp("graftlogdst")
      val ckpt = tmp("graftlogsinkckpt")
      val producer = new GraftLogProducer(src)
      (0 until 4).foreach(s => producer.publish((s * 100 until (s + 1) * 100).map(_.toString)))
      def relay(): Unit = {
        val q = spark.readStream.format("graft-log")
          .option("path", src).option("maxRecordsPerTrigger", 150L).load()
          .selectExpr("concat('v', payload) AS payload")
          .writeStream.format("graft-log")
          .option("path", dst).option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      relay()
      val readBack = spark.read.format("graft-log").option("path", dst).load()
      assert(readBack.count() === 400L)
      // every record exactly once, content transformed
      val got = readBack.select("payload").collect().map(_.getString(0)).sorted.toSeq
      assert(got === (0 until 400).map(i => s"v$i").sorted)
      // epoch markers exist; staged files are gone
      val names = new java.io.File(dst).listFiles().map(_.getName)
      assert(names.exists(_.startsWith("_epoch-")))
      assert(!names.exists(_.contains(".staged")))
      // force a replay: delete the newest CHECKPOINT commit — Spark
      // re-runs that epoch; the topic's own epoch marker dedups it
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .filter(_.getName.forall(_.isDigit))
      val newest = commits.maxBy(_.getName.toLong)
      val cp = new org.apache.hadoop.fs.Path(s"$ckpt/commits/${newest.getName}")
      cp.getFileSystem(new Configuration()).delete(cp, false)
      relay()
      assert(spark.read.format("graft-log").option("path", dst).load().count() === 400L)
      // the log keeps flowing end to end: publish more, relay again
      producer.publish((400 until 450).map(_.toString))
      relay()
      assert(spark.read.format("graft-log").option("path", dst).load().count() === 450L)
    }

    it("bounds epoch-marker growth: old epochs compact to based segments, " +
        "nothing lost, compacted replays still drop, retention works") {
      val src = tmp("graftcmpsrc")
      val dst = tmp("graftcmpdst")
      val ckpt = tmp("graftcmpckpt")
      val conf = new Configuration()
      val producer = new GraftLogProducer(src)
      producer.publish((0 until 200).map(_.toString))
      // 20 records/trigger over 200 records = 10 epochs; keep only 3 markers
      val q = spark.readStream.format("graft-log")
        .option("path", src).option("maxRecordsPerTrigger", 20L).load()
        .selectExpr("payload")
        .writeStream.format("graft-log")
        .option("path", dst).option("checkpointLocation", ckpt)
        .option("compactMarkersAfter", "3")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      def names = new java.io.File(dst).listFiles().map(_.getName).toSeq
      val markers = names.filter(_.startsWith("_epoch-"))
      assert(markers.size <= 3, s"markers not bounded: $markers")
      assert(names.exists(_.matches("""\d{12}-b\d+-\d+\.seg""")),
        "compaction produced no based segments")
      // every record exactly once, offsets dense from 0
      val rows = spark.read.format("graft-log").option("path", dst).load()
        .orderBy("offset").collect()
      assert(rows.map(_.getLong(0)).toSeq === (0L until 200L))
      assert(rows.map(_.getString(1)).toSeq === (0 until 200).map(_.toString))
      // a replay of a COMPACTED epoch (below the low-water) drops its
      // staged output instead of re-publishing
      val through = names.find(_ == "_sink_compacted_through")
      assert(through.isDefined)
      val stagedPath = new org.apache.hadoop.fs.Path(dst, ".sink-e000000000000-p0000-t9.staged")
      val fs = stagedPath.getFileSystem(conf)
      val out = fs.create(stagedPath, true); out.write("ghost\n".getBytes("UTF-8")); out.close()
      new graft.streaming.GraftLogStreamingWrite(dst, 3).commit(0L,
        Array(graft.streaming.GraftLogWriteMessage(0, 1L, stagedPath.toString)))
      assert(!fs.exists(stagedPath), "compacted-epoch replay did not drop its staging")
      assert(spark.read.format("graft-log").option("path", dst).load().count() === 200L)
      // retention now works on the compacted prefix (based names)
      val segs = GraftLog.listSegments(dst, conf)
      val firstBased = segs.takeWhile(s => new java.io.File(s.path).getName
        .matches("""\d{12}-b\d+-\d+\.seg"""))
      assert(firstBased.size >= 2, "expected a compacted prefix to truncate")
      val cut = firstBased(1).base + firstBased(1).count
      assert(new GraftLogProducer(dst).truncateBefore(cut) === 2)
      val after = spark.read.format("graft-log").option("path", dst).load()
        .orderBy("offset").collect()
      assert(after.map(_.getLong(0)).toSeq === (cut until 200L),
        "surviving offsets shifted after sink-topic retention")
      // but a cut INSIDE the still-markered tail fails loudly
      val markered = segs.filterNot(s => new java.io.File(s.path).getName
        .matches("""\d{12}-b\d+-\d+\.seg"""))
      assert(markered.nonEmpty)
      intercept[IllegalArgumentException] {
        new GraftLogProducer(dst).truncateBefore(markered.head.base + markered.head.count)
      }
    }

    it("manual compaction keeps the read view bit-identical") {
      val dst = tmp("graftcmp2")
      val ckpt = tmp("graftcmp2ckpt")
      val conf = new Configuration()
      // 5 epochs of 10 via rate-per-micro-batch for determinism
      val q = spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 10).option("numPartitions", 2).load()
        .selectExpr("cast(value AS STRING) AS payload")
        .writeStream.format("graft-log")
        .option("path", dst).option("checkpointLocation", ckpt)
        .option("compactMarkersAfter", "1000") // keep commit-path compaction out of the way
        .start()
      try {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (GraftLog.latestOffset(dst, conf) < 50L && System.nanoTime() < deadline)
          Thread.sleep(100)
        assert(GraftLog.latestOffset(dst, conf) >= 50L, "stream never reached 50 records")
      } finally { q.stop(); q.awaitTermination() }
      val before = spark.read.format("graft-log").option("path", dst).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val removed = GraftLog.compactSinkEpochs(dst, conf, keepLast = 1)
      assert(removed >= 3)
      val after = spark.read.format("graft-log").option("path", dst).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(after === before, "compaction changed the read view")
      // idempotent: nothing left to fold
      assert(GraftLog.compactSinkEpochs(dst, conf, keepLast = 1) === 0)
    }

    it("two concurrent compactors serialize: consistent listing, monotone low-water") {
      val dst = tmp("graftcmprace")
      val conf = new Configuration()
      val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(conf)
      fs.mkdirs(new org.apache.hadoop.fs.Path(dst))
      // hand-build a sink topic: 12 committed epochs, one segment each
      (0 until 12).foreach { e =>
        val seg = new org.apache.hadoop.fs.Path(dst, f"s$e%012d-p0000-5.seg")
        val out = fs.create(seg, true)
        try out.write((0 until 5).map(i => s"e$e-r$i\n").mkString.getBytes("UTF-8"))
        finally out.close()
        fs.create(new org.apache.hadoop.fs.Path(dst, s"_epoch-$e.committed"), true).close()
      }
      val before = spark.read.format("graft-log").option("path", dst).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(before.size === 60)
      // two compactors race with different retention targets — an
      // unserialized pair interleaves renames / regresses the low-water;
      // under the topic lock both complete (or no-op) cleanly
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = Seq(1, 3).map(keep => new Thread(() =>
        try { GraftLog.compactSinkEpochs(dst, conf, keepLast = keep); () }
        catch { case e: Throwable => errs.add(e); () }))
      ts.foreach(_.start()); ts.foreach(_.join(120000))
      assert(ts.forall(!_.isAlive))
      assert(errs.isEmpty, s"racing compactors failed: ${errs.toArray.toSeq}")
      // read view bit-identical; at most 3 markers survive; low-water is
      // the largest epoch either pass folded (never a smaller rewrite)
      val after = spark.read.format("graft-log").option("path", dst).load()
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(after === before, "racing compactions changed the read view")
      val markers = new java.io.File(dst).listFiles().map(_.getName)
        .filter(_.startsWith("_epoch-")).toSeq
      assert(markers.size <= 3, s"markers not bounded after race: $markers")
      assert(GraftLog.compactSinkEpochs(dst, conf, keepLast = 1) >= 0)
      val through = {
        val in = scala.io.Source.fromFile(s"$dst/_sink_compacted_through")
        try in.mkString.trim.toLong finally in.close()
      }
      assert(through === 10L, s"low-water $through != 10 (epoch 11 retained)")
      // replay of ANY compacted epoch still drops its staged output
      val stagedPath = new org.apache.hadoop.fs.Path(dst, ".sink-e000000000007-p0000-t9.staged")
      val out2 = fs.create(stagedPath, true); out2.write("ghost\n".getBytes("UTF-8")); out2.close()
      new graft.streaming.GraftLogStreamingWrite(dst, 3).commit(7L,
        Array(graft.streaming.GraftLogWriteMessage(0, 1L, stagedPath.toString)))
      assert(!fs.exists(stagedPath))
      assert(spark.read.format("graft-log").option("path", dst).load().count() === 60L)
    }

    it("upgrade bridge: a batch committed under the unpadded token is not re-appended") {
      val topic = tmp("graftupgr")
      new GraftLogProducer(topic).publish((0 until 200).map(_.toString))
      val root = tmp("graftupgrdb")
      // simulate the pre-upgrade crash window: batch 0 committed to the
      // store under the OLD token name, but Spark's checkpoint commit
      // never landed — post-upgrade, the replay of batch 0 must be a
      // no-op even though it now carries the padded token
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(new Configuration())
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/_ingest_commits"))
      fs.create(new org.apache.hadoop.fs.Path(s"$root/_ingest_commits/upg-b0"), true).close()
      val db = GraftDB.atPath(spark, root)
      StreamingIngest.drainLog(spark, db, topic, maxRecordsPerTrigger = 100L,
        tmp("graftupgrck"), streamName = "upg")
      // batch 0's 100 records were "already committed" pre-upgrade (the
      // store just doesn't hold them in this synthetic setup); batch 1's
      // 100 landed — the point is NO double-apply path exists
      assert(db.length === 100L)
    }

    it("a stale lock claim from a dead maintenance process is taken over") {
      val dst = tmp("graftcmpdead")
      val conf = new Configuration()
      val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(conf)
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dst/_maint"))
      // a dead process claimed transition 1 and never sealed it; backdate
      // the claim past the takeover age
      fs.create(new org.apache.hadoop.fs.Path(s"$dst/_maint/1"), true).close()
      new java.io.File(s"$dst/_maint/1").setLastModified(
        System.currentTimeMillis() - 3600000L)
      // a new maintenance run seals the orphan and proceeds
      val got = GraftLog.withTopicLock(dst, conf, timeoutMs = 2000L) { 42 }
      assert(got === 42)
    }

    it("a LIVE long-running lock holder heartbeats and is never taken over") {
      val dst = tmp("graftlockbeat")
      val conf = new Configuration()
      val inside = new java.util.concurrent.atomic.AtomicBoolean(false)
      val overlapped = new java.util.concurrent.atomic.AtomicBoolean(false)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      // holder works LONGER than its lease; the heartbeat keeps the
      // claim fresh so the contender must wait, not take over
      val holder = new Thread(() =>
        try GraftLog.withTopicLock(dst, conf, timeoutMs = 500L) {
          inside.set(true); Thread.sleep(1500L); inside.set(false)
        } catch { case e: Throwable => errs.add(e); () })
      val contender = new Thread(() => {
        Thread.sleep(200L) // let the holder claim first
        try GraftLog.withTopicLock(dst, conf, timeoutMs = 5000L) {
          if (inside.get()) overlapped.set(true)
        } catch { case e: Throwable => errs.add(e); () }
      })
      holder.start(); contender.start()
      holder.join(30000L); contender.join(30000L)
      assert(!holder.isAlive && !contender.isAlive)
      assert(errs.isEmpty, s"lock threads failed: ${errs.toArray.toSeq}")
      assert(!overlapped.get(), "contender entered while a live holder was inside")
    }

    it("rejects multi-column or non-string input loudly") {
      val q = spark.readStream.format("rate-micro-batch").option("rowsPerBatch", 1).load()
        .writeStream.format("graft-log")
        .option("path", tmp("graftlogbad"))
        .option("checkpointLocation", tmp("graftlogbadckpt"))
        .start()
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination(60000L)
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("STRING column")), err.getMessage)
    }
  }

  describe("idempotent append (the sink half of exactly-once)") {
    it("applies a token once, dedups replays, and survives a handle restart") {
      val root = tmp("graftidem")
      val batch = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "m",
        Map("t" -> "a"), Map("f" -> 1.0)))
        .toDF(graft.model.Point.TimeCol, graft.model.Point.MeasurementCol,
          graft.model.Point.TagsCol, graft.model.Point.FieldsCol)
      val db = GraftDB.atPath(spark, root)
      assert(db.insertDFIdempotent(batch, "b0") === true)
      assert(db.insertDFIdempotent(batch, "b0") === false)
      assert(db.length === 1L)
      // durability: a NEW handle on the same root (process restart) still
      // remembers the committed token
      val db2 = GraftDB.atPath(spark, root)
      assert(db2.insertDFIdempotent(batch, "b0") === false)
      assert(db2.insertDFIdempotent(batch, "b1") === true)
      assert(db2.length === 2L)
    }

    it("in-memory backend dedups within the handle lifetime") {
      val db = GraftDB.inMemory(spark)
      val batch = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "m",
        Map("t" -> "a"), Map("f" -> 1.0)))
        .toDF(graft.model.Point.TimeCol, graft.model.Point.MeasurementCol,
          graft.model.Point.TagsCol, graft.model.Point.FieldsCol)
      assert(db.insertDFIdempotent(batch, "x") === true)
      assert(db.insertDFIdempotent(batch, "x") === false)
      assert(db.length === 1L)
    }
  }
}
