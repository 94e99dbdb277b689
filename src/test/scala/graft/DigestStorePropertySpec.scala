package graft

import org.apache.spark.sql.functions._

import graft.analytics.Dedup

/** Randomized parity for the prefix-partitioned digest store (the
  * LogCompactionPropertySpec pattern applied to the r16 layout): a flat
  * store, a partitioned store, and a store that starts FLAT and
  * MIGRATES to the partitioned layout mid-sequence, all fed the SAME
  * random op sequence, must answer every dedup step with the SAME
  * survivor set — the partition pruning, per-prefix sidecars, layout
  * marker, compaction, retention, and the migration rewrite are pure
  * physical-layout choices, invisible to the set algebra. Scenarios mix
  * single/composite keys (with the reader passing keyCols in a SHUFFLED
  * order), null keys, sidecar-refreshing and sidecar-skipping appends
  * (staleness), guarded and unguarded dedups, full-history/retention
  * compactions, and a randomly-timed migrateDigestStore — the
  * interleavings where an optimization bug would hide between green
  * example-shaped tests.
  */
class DigestStorePropertySpec extends SparkSpec {
  import spark.implicits._

  private def scenario(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val composite = rnd.nextBoolean()
    val prefixLen = 1 + rnd.nextInt(2) // 1 or 2
    val base = java.nio.file.Files.createTempDirectory(s"graftdigprop$seed").toString
    val flat = s"$base/flat"
    val part = s"$base/part"
    val mig = s"$base/mig" // starts flat, migrates at a random step
    val migrateAt = 2 + rnd.nextInt(4)
    var migrated = false
    // small universe → heavy collisions across batches; ~8% null keys
    def word(): String = {
      val r = rnd.nextInt(25)
      if (r >= 23) null else s"w$r"
    }
    var nextId = 0L
    def batch(): org.apache.spark.sql.DataFrame = {
      val n = 4 + rnd.nextInt(8)
      val rows = (0 until n).map { _ =>
        nextId += 1
        if (composite) (nextId, word(), word()) else (nextId, word(), "")
      }
      if (composite) rows.toDF("doc_id", "t1", "t2")
      else rows.map(r => (r._1, r._2)).toDF("doc_id", "t1")
    }
    val keyCols = if (composite) Seq("t1", "t2") else Seq("t1")
    var initialized = false
    var tag = 0L
    (0 until 8).foreach { i =>
      if (initialized && !migrated && i == migrateAt) {
        Dedup.migrateDigestStore(spark, mig, prefixLen)
        migrated = true
      }
      val b = batch()
      rnd.nextInt(3) match {
        case 0 if initialized => // compact, sometimes with retention
          val retain = if (rnd.nextBoolean() && tag > 1) Some(tag - 1) else None
          Dedup.compactDigestStore(spark, flat, retain)
          Dedup.compactDigestStore(spark, part, retain)
          Dedup.compactDigestStore(spark, mig, retain)
        case _ =>
          // dedup the batch against all three stores first (when they
          // exist), with independent guard choices — results must not
          // depend on the guard, the layout, the reader's keyCol order,
          // or whether/when the store migrated
          if (initialized) {
            val readerCols = rnd.shuffle(keyCols)
            val f = Dedup.dedupAgainstStore(b, keyCols, "doc_id", flat,
              useSidecar = rnd.nextBoolean()).as[Long].collect().toSet
            val p = Dedup.dedupAgainstStore(b, readerCols, "doc_id", part,
              useSidecar = rnd.nextBoolean()).as[Long].collect().toSet
            val m = Dedup.dedupAgainstStore(b, readerCols, "doc_id", mig,
              useSidecar = rnd.nextBoolean()).as[Long].collect().toSet
            assert(p == f,
              s"seed=$seed composite=$composite pl=$prefixLen: " +
                s"partitioned survivors $p != flat $f")
            assert(m == f,
              s"seed=$seed composite=$composite pl=$prefixLen migrated=$migrated: " +
                s"migrating-store survivors $m != flat $f")
          }
          tag += 1
          val sc = rnd.nextBoolean() // stale-sidecar interleavings
          Dedup.appendDigestStore(b, keyCols, flat, batchTag = tag, sidecar = sc)
          Dedup.appendDigestStore(b, keyCols, part, batchTag = tag, sidecar = sc,
            prefixLen = if (initialized) Dedup.AutoPrefixLen else prefixLen)
          // the migrating store always appends in auto mode: flat before
          // its migration, partitioned after
          Dedup.appendDigestStore(b, keyCols, mig, batchTag = tag, sidecar = sc)
          initialized = true
      }
    }
    // the partitioned store never silently degraded to flat, and the
    // migrated store's marker stuck through every later append/compact
    assert(Dedup.digestStoreLayout(spark, part).contains(prefixLen),
      s"seed=$seed: layout drifted to ${Dedup.digestStoreLayout(spark, part)}")
    val expectMig = if (migrated) Some(prefixLen) else Some(0)
    assert(Dedup.digestStoreLayout(spark, mig) == expectMig,
      s"seed=$seed: migrated-store layout ${Dedup.digestStoreLayout(spark, mig)} " +
        s"!= $expectMig (migrated=$migrated at step $migrateAt)")
  }

  describe("prefix-partitioned digest store parity (randomized)") {
    it("matches the flat layout's survivor sets over random op interleavings") {
      (1 to 8).foreach(scenario)
    }
  }
}
