package graft

import org.apache.hadoop.conf.Configuration

import graft.streaming.{GraftLog, GraftLogProducer}

/** Property check for the INCREMENTAL log cleaner: the production
  * implementation — cleaner point, `.keys` sidecars, quiescent
  * short-circuits, deferred superseded-form sweeps — must be
  * observationally EQUAL to a naive semantic model of
  * `cleanup.policy=compact` that rescans everything on every pass and
  * keeps no state beyond the segments themselves. The model encodes
  * the documented semantics directly:
  *
  *   - a record in a compactable (non-newest) segment survives a pass
  *     iff its offset is its key's GLOBAL latest;
  *   - a latest TOMBSTONE additionally survives until its segment has
  *     been compactable for one full prior pass (the delete.retention
  *     grace) — the model tracks a per-segment `graced` flag where the
  *     implementation tracks the cleaner point;
  *   - the newest segment is never rewritten;
  *   - surviving records keep their exact offsets; truncation drops
  *     whole segments only.
  *
  * Each scenario drives a random interleaving of keyed publishes
  * (tombstones included), compaction passes, and prefix truncations,
  * comparing the per-pass removed count at every step and the full
  * visible (offset, record) set at the end — so a divergence anywhere
  * in the incremental machinery (a sidecar that hides a needed
  * rewrite, a cleaner point advanced too far, a sweep that deletes a
  * live form) shows up as a model mismatch with the SEED in the
  * failure message.
  */
class LogCompactionPropertySpec extends SparkSpec {

  private final case class MSeg(base: Long, span: Long,
      recs: Vector[(Long, String)], graced: Boolean)

  private final class Model {
    var segs: Vector[MSeg] = Vector.empty
    private var nextOffset = 0L
    private def keyOf(r: String): String = {
      val i = r.indexOf('\t'); if (i < 0) r else r.substring(0, i)
    }
    private def isTomb(r: String): Boolean = {
      val i = r.indexOf('\t'); i >= 0 && i == r.length - 1
    }
    def publish(records: Seq[String]): Unit = {
      val base = nextOffset
      segs :+= MSeg(base, records.size.toLong,
        records.zipWithIndex.map { case (r, i) => (i.toLong, r) }.toVector,
        graced = false)
      nextOffset = base + records.size
    }
    def compact(): Int = {
      if (segs.size <= 1) return 0
      // the key's global latest offset, across ALL segments
      val latest = scala.collection.mutable.HashMap.empty[String, Long]
      segs.foreach(s => s.recs.foreach { case (d, r) => latest(keyOf(r)) = s.base + d })
      var removed = 0
      val compactable = segs.init
      val rewritten = compactable.map { s =>
        val keep = s.recs.filter { case (d, r) =>
          latest(keyOf(r)) == s.base + d && (!isTomb(r) || !s.graced)
        }
        removed += s.recs.size - keep.size
        // every compactable segment has now been seen by a pass: its
        // surviving tombstones have had their one readable pass
        MSeg(s.base, s.span, keep, graced = true)
      }
      segs = rewritten :+ segs.last
      removed
    }
    def truncateBefore(offset: Long): Int = {
      val (doomed, kept) = segs.partition(s => s.base + s.span <= offset)
      segs = kept
      doomed.size
    }
    def visible: Set[(Long, String)] =
      segs.flatMap(s => s.recs.map { case (d, r) => (s.base + d, r) }).toSet
    def boundaries: Seq[Long] = segs.map(s => s.base + s.span)
  }

  describe("incremental cleaner vs the naive full-scan model") {
    it("agrees on removed counts and the visible record set across random interleavings") {
      val conf = new Configuration()
      (1 to 20).foreach { seed =>
        val rng = new scala.util.Random(seed)
        val dir = java.nio.file.Files
          .createTempDirectory(s"graftcmpprop$seed").toString
        val p = new GraftLogProducer(dir)
        val model = new Model
        var valueCounter = 0
        def randomBatch(): Seq[String] = {
          val n = 1 + rng.nextInt(8)
          (0 until n).map { _ =>
            val k = s"k${rng.nextInt(6)}"
            if (rng.nextDouble() < 0.25) s"$k\t"
            else { valueCounter += 1; s"$k\tv$valueCounter" }
          }
        }
        // always start with one sealed segment so ops have substance
        val first = randomBatch()
        p.publish(first); model.publish(first)
        (1 to 14).foreach { _ =>
          rng.nextInt(100) match {
            case x if x < 50 =>
              val b = randomBatch()
              p.publish(b); model.publish(b)
            case x if x < 85 =>
              val got = p.compactTopic()
              val want = model.compact()
              assert(got === want,
                s"seed=$seed: compact removed $got, model says $want")
            case _ if model.boundaries.nonEmpty =>
              val cut = model.boundaries(rng.nextInt(model.boundaries.size))
              val got = p.truncateBefore(cut)
              val want = model.truncateBefore(cut)
              assert(got === want,
                s"seed=$seed: truncate($cut) dropped $got segs, model says $want")
            case _ => ()
          }
        }
        // final comparison through the PUBLIC read path (the DSv2 batch
        // read resolves the newest form of every segment, exactly what
        // a consumer sees)
        val got = spark.read.format("graft-log").option("path", dir).load()
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        assert(got === model.visible, s"seed=$seed: visible set diverged " +
          s"(impl-only: ${got -- model.visible}; model-only: ${model.visible -- got})")
        // and the log ends where the model thinks it does (an empty —
        // fully truncated — log reports its end from the low-water
        // marker, which equals the last model segment's end too)
        model.segs.lastOption.foreach { last =>
          assert(GraftLog.latestOffset(dir, conf) === last.base + last.span,
            s"seed=$seed: latest offset diverged")
        }
      }
    }

    it("converges identically after cleaner-state loss (stale point, missing sidecars)") {
      val conf = new Configuration()
      val dir = java.nio.file.Files.createTempDirectory("graftcmpstate").toString
      val p = new GraftLogProducer(dir)
      // overlapping keys + a tombstone that will sit in the clean head
      p.publish(Seq("a\t1", "b\t2", "c\t3"))
      p.publish(Seq("a\t4", "b\t"))
      p.publish(Seq("c\t5"))
      assert(p.compactTopic() === 3) // a@0,b@1,c@2 superseded; b's tombstone graced
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      def read(): Set[(Long, String)] =
        spark.read.format("graft-log").option("path", dir).load()
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val afterPass1 = read()
      assert(afterPass1 === Set((3L, "a\t4"), (4L, "b\t"), (5L, "c\t5")))
      // CLEANER-STATE LOSS: drop the point and every sidecar — as if an
      // operator restored the segment files alone from a backup
      fs.delete(new org.apache.hadoop.fs.Path(dir, "_cleaner_point"), false)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(_.getPath.getName.endsWith(".keys"))
        .foreach(s => fs.delete(s.getPath, false))
      // the next pass full-rescans (conservative fallback): no records
      // lost, none resurrected; b's tombstone is DIRTY again under the
      // reset point, so it gets its grace again rather than dropping
      assert(p.compactTopic() === 0)
      assert(read() === afterPass1)
      assert(GraftLog.cleanerPoint(dir, conf) === 5L) // point rebuilt
      // state restored: one more roll and the tombstone ages out on
      // schedule, exactly as with unbroken state
      p.publish(Seq("d\t6"))
      assert(p.compactTopic() === 1) // b's aged tombstone
      assert(read() === Set((3L, "a\t4"), (5L, "c\t5"), (6L, "d\t6")))
    }
  }
}
