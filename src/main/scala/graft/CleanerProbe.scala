package graft

import org.apache.hadoop.conf.Configuration

import graft.streaming.{GraftLog, GraftLogProducer}

/** Scratch probe for the INCREMENTAL log cleaner's IO bound at a
  * many-segment topic (the r15 cleaner-point work): seals `SEGS`
  * segments, pays the one-time full first pass, then runs steady-state
  * passes where each tick seals ONE new segment that overwrites a few
  * keys of ONE old (clean) segment — the realistic mostly-clean-topic
  * cadence. Per pass it prints wall time and the number of segment-data
  * opens ([[GraftLog.segmentDataOpens]]); the bound to verify is that a
  * steady-state pass opens O(dirty + affected-clean) segments (here:
  * map build over 2 dirty + 1 dirty rewrite + 1 overlapped clean
  * rewrite = 4), NOT O(topic) (201 with the pre-r15 full-rescan
  * cleaner — at a 100× topic, that is the difference between a cleaner
  * that keeps up and one that rereads 99% clean data every tick). Pure
  * filesystem work, no SparkSession. Not part of the driver contract.
  */
object CleanerProbe {
  def main(args: Array[String]): Unit = {
    val segs = sys.env.getOrElse("SPARK_GRAFT_CLEANER_SEGS", "200").toInt
    val per = sys.env.getOrElse("SPARK_GRAFT_CLEANER_ROWS", "500").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_CLEANER_PASSES", "10").toInt
    val dir = java.nio.file.Files.createTempDirectory("cleanerprobe").toString
    val conf = new Configuration()
    val p = new GraftLogProducer(dir, conf)
    (0 until segs).foreach(s => p.publish((0 until per).map(i => s"k${s}_$i\tv$s")))
    println(s"CLEANERPROBE segs=$segs rowsPerSeg=$per (${segs * per} records)")
    // sidecarReads: per-segment `.keys` GETs — r16's `_keys_manifest`
    // collapses the steady/quiescent tier to ~0 (one manifest read
    // replaces O(clean segments) sidecar reads; only never-manifested
    // segments fall back). chunkR/W: r17's CHUNKED manifest — a
    // quiescent pass reads the index only (chunkR 0), a steady pass
    // rewrites only the touched chunks (chunkW bounded, not O(clean))
    println("| pass | removed | dataOpens | sidecarReads | chunkR | chunkW | wall_ms |")
    println("|---|---|---|---|---|---|---|")
    def tick(kind: String, removed: => Int): Unit = {
      val o0 = GraftLog.segmentDataOpens.get()
      val k0 = GraftLog.keySidecarReads.get()
      val cr0 = GraftLog.manifestChunkReads.get()
      val cw0 = GraftLog.manifestChunkWrites.get()
      val t0 = System.nanoTime()
      val r = removed
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"| $kind | $r | ${GraftLog.segmentDataOpens.get() - o0} | " +
        f"${GraftLog.keySidecarReads.get() - k0} | " +
        f"${GraftLog.manifestChunkReads.get() - cr0} | " +
        f"${GraftLog.manifestChunkWrites.get() - cw0} | $ms%.1f |")
    }
    // one-time first pass: no cleaner point yet — the full O(topic) scan
    tick("first-pass (full scan, one-time)", p.compactTopic())
    // quiescent pass: listing + sidecars only
    tick("quiescent", p.compactTopic())
    // steady state: each tick seals one segment overwriting 25 keys of
    // one old clean segment (5% churn into the clean head)
    (0 until passes).foreach { t =>
      val victim = t % segs
      p.publish((0 until per).map { i =>
        if (i < 25) s"k${victim}_$i\tv-new$t" else s"kf${t}_$i\tvf"
      })
      tick(s"steady-$t (1 new seg, 25 keys into clean seg $victim)", p.compactTopic())
    }
    println(s"full-rescan comparison: a pre-cleaner-point pass would open " +
      s"~${segs + 1} segments' data every tick (map build) plus rewrites")
  }
}
