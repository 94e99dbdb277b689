package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the digest-store BLOOM SIDECAR's saturation curve
  * (the r14 verdict's watch item): at each store size — the bench-tier
  * store, 10×, and 100× — measure the might-hit rate a NON-COLLIDING
  * 500-row batch sees against (a) the default 2^19-bit sidecar and
  * (b) a right-sized ~5-bits-per-digest sidecar, plus whether
  * [[graft.analytics.Dedup.dedupAgainstStore]]'s returned plan really
  * skipped the store scan. MEASURED shape (r15): the default sidecar
  * gives the zero-scan skip at the bench-tier store (might-hit 0.0000,
  * plan store-scan-free), reads 0.088 at 10× (skip off — the guard is
  * whole-batch, so ANY might-hit row forces the exact anti-join) and
  * saturates to 0.998 at 100×, degrading gracefully to always-scan —
  * correctness never depends on it. Right-sizing to ~5 bits/digest
  * restores a LOW rate at 100× (0.022) but NOT the whole-batch skip:
  * skipping a B-row batch needs FPR ≪ 1/B (~14+ bits/digest at B=500),
  * and the 2^24-bit plan-literal cap means the zero-scan fast path is a
  * ≤ ~10^6-digest-store feature by design — the operator sizing rule
  * the probe exists to document. The SECOND table (r16) measures the
  * prefix-partitioned layout past that ceiling: per-prefix sidecars
  * (broadcast, no literal cap) keep the full zero-scan skip at 10^6
  * on default bits and at 10^7 with 2^21-bit prefixes, and even a
  * saturated default degrades to scanning the few false-positive
  * partitions (~1% of the store) — never O(store). Not part of the
  * driver contract.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.analytics.Dedup
    println("| store digests | sidecar bits | might-hit rate (clean batch) | plan skips store scan |")
    println("|---|---|---|---|")
    for (n <- Seq(10000, 100000, 1000000)) {
      val sized = {
        // ~5 bits/digest, power-of-two-ish, within the accepted range
        var b = 1 << 10
        while (b < n * 5 && b < Dedup.MaxSidecarBits) b <<= 1
        b
      }
      for (bits <- Seq(Dedup.SidecarBits, sized).distinct) {
        val dir = java.nio.file.Files.createTempDirectory(s"bloomprobe$n").toString + "/store"
        val store = spark.range(n).select(concat(lit("doc-"), col("id")).as("text"))
        Dedup.appendDigestStore(store, Seq("text"), dir, batchTag = 1L,
          sidecar = true, sidecarBits = bits)
        val clean = spark.range(500)
          .select(concat(lit("fresh-"), col("id")).as("text"), col("id").as("doc_id"))
        val rate = Dedup.sidecarMightHitRate(clean, Seq("text"), dir).getOrElse(-1.0)
        val plan = Dedup.dedupAgainstStore(clean, Seq("text"), "doc_id", dir,
          useSidecar = true).queryExecution.executedPlan.toString
        // match the store's full path, not the bare substring "store":
        // unrelated plan text (operator names, codecs, other paths)
        // containing "store" must not read as a spurious non-skip
        val skipped = !plan.contains(dir)
        println(f"| $n | $bits | $rate%.4f | $skipped |")
      }
    }

    // r16: the PREFIX-PARTITIONED layout past the flat ceiling. Bulk
    // load (append without the incremental merge, then ONE distributed
    // sidecar rebuild — the bulk-load shape), then measure a clean
    // 500-row batch: per-prefix might-hit rate, whether the plan scans
    // the store at all, how many of the 256 partitions a 1-duplicate
    // batch scans, and the batch's wall time — the O(batch) claim is
    // that wall stays flat from 10^6 to 10^7 store digests where the
    // flat layout above has already saturated to always-full-scan.
    println()
    println("| store digests | per-prefix bits | might-hit | clean skips store | dirty(1 dup) partitions scanned / 256 | clean dedup wall_s |")
    println("|---|---|---|---|---|---|")
    for (n <- Seq(1000000, 10000000)) {
      for (bits <- Seq(Dedup.SidecarBits, 1 << 21)) {
        val dir = java.nio.file.Files.createTempDirectory(s"bloomprobep$n").toString + "/store"
        val store = spark.range(n).select(concat(lit("doc-"), col("id")).as("text"))
        Dedup.appendDigestStore(store, Seq("text"), dir, batchTag = 1L, prefixLen = 2)
        Dedup.rebuildDigestSidecar(spark, dir, bits = bits)
        val clean = spark.range(500)
          .select(concat(lit("fresh-"), col("id")).as("text"), col("id").as("doc_id"))
        val rate = Dedup.sidecarMightHitRate(clean, Seq("text"), dir).getOrElse(-1.0)
        val t0 = System.nanoTime()
        val g = Dedup.dedupAgainstStore(clean, Seq("text"), "doc_id", dir, useSidecar = true)
        val survivors = g.count()
        val wall = (System.nanoTime() - t0) / 1e9
        require(survivors == 500L, s"clean batch lost rows: $survivors")
        val skipped = !g.queryExecution.executedPlan.toString.contains(dir)
        val dirty = clean.union(spark.range(1)
          .select(lit("doc-424242").as("text"), lit(999999999L).as("doc_id")))
        val gd = Dedup.dedupAgainstStore(dirty, Seq("text"), "doc_id", dir, useSidecar = true)
        val scanned = gd.queryExecution.sparkPlan.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(_.toString.endsWith(dir)) => f
        }.map(_.selectedPartitions.partitionCount).maxOption.getOrElse(0)
        require(gd.count() == 500L, "dirty batch must drop exactly the duplicate")
        println(f"| $n | $bits | $rate%.4f | $skipped | $scanned | $wall%.2f |")
      }
    }

    // r17: prefixLen=3 (4096 partitions) one more decade out. Sizing
    // arithmetic: 10^8 digests / 4096 prefixes ≈ 24k per prefix — a
    // 2^19-bit array carries ~21 bits/digest (skip strongly alive); the
    // fade point is ~10^9–10^10 (≈ 2.4 bits/digest at 10^10, FPR → 1),
    // where the sizing rule says widen per-prefix bits (2^21 restores
    // ~8.6 bits/digest at 10^10), not deepen the prefix — the table
    // records the measurable first half of that curve.
    println()
    println("| store digests | prefixLen | per-prefix bits | might-hit | clean skips store | dirty(1 dup) partitions scanned / 4096 | clean dedup wall_s |")
    println("|---|---|---|---|---|---|---|")
    for (n <- Seq(10000000, 100000000)) {
      val dir = java.nio.file.Files.createTempDirectory(s"bloomprobe3x$n").toString + "/store"
      val store = spark.range(n.toLong).select(concat(lit("doc-"), col("id")).as("text"))
      Dedup.appendDigestStore(store, Seq("text"), dir, batchTag = 1L, prefixLen = 3)
      Dedup.rebuildDigestSidecar(spark, dir, bits = Dedup.SidecarBits)
      val clean = spark.range(500)
        .select(concat(lit("fresh-"), col("id")).as("text"), col("id").as("doc_id"))
      val rate = Dedup.sidecarMightHitRate(clean, Seq("text"), dir).getOrElse(-1.0)
      val t0 = System.nanoTime()
      val g = Dedup.dedupAgainstStore(clean, Seq("text"), "doc_id", dir, useSidecar = true)
      val survivors = g.count()
      val wall = (System.nanoTime() - t0) / 1e9
      require(survivors == 500L, s"clean batch lost rows: $survivors")
      val skipped = !g.queryExecution.executedPlan.toString.contains(dir)
      val dirty = clean.union(spark.range(1)
        .select(lit("doc-424242").as("text"), lit(999999999L).as("doc_id")))
      val gd = Dedup.dedupAgainstStore(dirty, Seq("text"), "doc_id", dir, useSidecar = true)
      val scanned = gd.queryExecution.sparkPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.endsWith(dir)) => f
      }.map(_.selectedPartitions.partitionCount).maxOption.getOrElse(0)
      require(gd.count() == 500L, "dirty batch must drop exactly the duplicate")
      println(f"| $n | 3 | ${Dedup.SidecarBits} | $rate%.4f | $skipped | $scanned | $wall%.2f |")
    }
    spark.stop()
  }
}
