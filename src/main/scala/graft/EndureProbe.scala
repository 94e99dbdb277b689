package graft

import org.apache.spark.sql.SparkSession

import graft.engine.{GraftDB, ParquetStorage}
import graft.model.Point
import graft.query._

/** Sustained-ingest endurance probe (not part of the driver contract):
  * drives hundreds of micro-batch appends through `ParquetStorage`'s
  * delta tier + auto-compaction and samples, over time,
  *
  *   - the delta tier's live file count (must stay bounded by the
  *     auto-compaction threshold — one file per batch forever without
  *     the policy), and
  *   - the p50 of a fixed point-query read (must stay FLAT — an
  *     unbounded file count would show up directly as listing + footer
  *     overhead growing with batch number).
  *
  * Prints one markdown table row per sample window for BENCH_NOTES.
  * `SPARK_GRAFT_ENDURE_BATCHES` overrides the batch count (default
  * 300), `SPARK_GRAFT_ENDURE_ROWS` the rows per batch (default 500).
  */
object EndureProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_ENDURE_BATCHES", "300").toInt
    val rowsPerBatch = sys.env.getOrElse("SPARK_GRAFT_ENDURE_ROWS", "500").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.storage.maintenanceTimings", "true")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graftendure").toString
    val st = new ParquetStorage(spark, dir) // default autoCompactFiles = 32
    val db = new GraftDB(st)
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")

    def mkBatch(b: Int) = spark.createDataset((0 until rowsPerBatch).map { i =>
      val v = b.toLong * rowsPerBatch + i
      Point(base.plusSeconds(v), "endure",
        Map("host" -> s"h${v % 5}"), Map("v" -> (v % 100).toDouble))
    }).toDF().drop(Point.SeqCol).localCheckpoint(true)

    // LIVE = what the auto-compaction policy bounds (listing minus the
    // snapshot plans' deferred drops); RAW additionally counts
    // superseded files inside their dropGraceMs retention window —
    // bounded by (grace / tick cadence) sets, pruned at ticks
    def liveDelta(): Int = st.liveDeltaFileCount()
    def rawDelta(): Int = {
      val d = new java.io.File(s"$dir/delta")
      if (!d.exists) 0
      else d.listFiles.count(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))
    }

    /** p50 of 7 runs of a fresh point query over the CURRENT store
      * state — re-planned each sample (the store's file listing is part
      * of what degrades when a delta tier is unbounded).
      */
    def readP50(): Double = {
      val times = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        db.filterPlan(TagQuery("host") === "h3").count()
        (System.nanoTime() - t0) / 1e9
      }
      times.sorted.apply(3)
    }

    db.insertDF(mkBatch(-1)) // warm the writer path (untimed)
    val sampleEvery = math.max(1, nBatches / 10)
    println("| batches | live delta files | raw (live+deferred) | p50 read (s) | append p50 (s) |")
    println("|---|---|---|---|---|")
    var appendTimes = List.empty[Double]
    (0 until nBatches).foreach { b =>
      val batch = mkBatch(b)
      val t0 = System.nanoTime()
      db.insertDF(batch)
      appendTimes ::= (System.nanoTime() - t0) / 1e9
      if ((b + 1) % sampleEvery == 0) {
        val ap50 = appendTimes.sorted.apply(appendTimes.size / 2)
        println(f"| ${b + 1} | ${liveDelta()} | ${rawDelta()} | ${readP50()}%.4f | $ap50%.4f |")
        appendTimes = Nil
      }
    }
    val rows = db.length
    val expect = (nBatches + 1).toLong * rowsPerBatch
    println(s"rows=$rows expected=$expect bounded=${liveDelta() <= ParquetStorage.DefaultAutoCompactFiles}")
    require(liveDelta() <= ParquetStorage.DefaultAutoCompactFiles,
      s"live delta unbounded: ${liveDelta()}")
    require(rows == expect, s"endurance lost rows: $rows != $expect")

    // ---- retention cost probe: O(dropped), not O(store) ----
    // Two compacted stores, one twice the other's size, each dropping
    // the SAME five days: retain cost must track the dropped data (and
    // the no-op must be metadata-speed), while the remove() equivalent
    // pays the full O(store) rewrite — the gap is the feature.
    val retainDays = sys.env.getOrElse("SPARK_GRAFT_RETAIN_DAYS", "30").toInt
    val rowsPerDay = sys.env.getOrElse("SPARK_GRAFT_RETAIN_ROWS", "10000").toInt
    def buildStore(days: Int): GraftDB = {
      val d2 = java.nio.file.Files.createTempDirectory("graftretainprobe").toString
      val s2 = GraftDB.atPath(spark, d2)
      (0 until days).foreach { day =>
        s2.insertDF(spark.createDataset((0 until rowsPerDay).map { i =>
          Point(base.plusSeconds(day * 86400L + i), "endure",
            Map("host" -> s"h${i % 5}"), Map("v" -> (i % 100).toDouble))
        }).toDF().drop(Point.SeqCol).localCheckpoint(true))
      }
      s2.compact()
      s2
    }
    def timed(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = body; (n, (System.nanoTime() - t0) / 1e9)
    }
    println("| store days | rows | op | removed | seconds |")
    println("|---|---|---|---|---|")
    Seq(retainDays, retainDays * 2).foreach { days =>
      val s2 = buildStore(days)
      val total = days.toLong * rowsPerDay
      val (n0, t0s) = timed(s2.retain(base))
      println(f"| $days | $total | retain no-op | $n0 | $t0s%.3f |")
      val (n5, t5s) = timed(s2.retain(base.plusSeconds(5L * 86400L)))
      println(f"| $days | $total | retain 5 days | $n5 | $t5s%.3f |")
      require(n5 == 5L * rowsPerDay, s"retention dropped $n5 of expected ${5L * rowsPerDay}")
    }
    // the O(store) comparison point: the same 5-day drop as a remove()
    val sRm = buildStore(retainDays)
    val (nRm, tRm) = timed(sRm.remove(TimeQuery() < base.plusSeconds(5L * 86400L)))
    println(f"| $retainDays | ${retainDays.toLong * rowsPerDay} | remove() equivalent | $nRm | $tRm%.3f |")

    // ---- snapshot-meta chain endurance: hundreds of maintenance ticks
    // on one live store. Every tick is a maintenance commit (alternating
    // compaction and retention, with fresh appends so retention always
    // has straddlers to rewrite); the protocol's health invariants are
    //   - the `_snapmeta` chain DRAINS (ticks must not keep each other
    //     alive — the r13 drain rule),
    //   - on-disk file count stays BOUNDED (deferred drops are pruned,
    //     no leak), and
    //   - `load()` cost stays FLAT (the read resolves one head + one
    //     listing + the chain — a growing chain would show up here).
    // dropGraceMs=0 exercises the prune/drain logic every tick (the
    // production floor only defers, never changes, what gets deleted).
    val ticks = sys.env.getOrElse("SPARK_GRAFT_ENDURE_TICKS", "500").toInt
    spark.conf.set("graft.storage.snapshotDropGraceMs", "0")
    val d4 = java.nio.file.Files.createTempDirectory("graftsnapchain").toString
    val s4 = GraftDB.atPath(spark, d4)
    def snapMetas(): Int = {
      val d = new java.io.File(s"$d4/_snapmeta")
      if (!d.exists) 0 else d.listFiles.count(_.isFile)
    }
    def diskFiles(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isFile) { if (f.getName.startsWith(".") || f.getName.startsWith("_")) 0 else 1 }
        else if (f.isDirectory && !f.getName.startsWith(".") &&
          f.getName != "_versions" && f.getName != "_snapmeta" && f.getName != "_commits")
          Option(f.listFiles).fold(0)(_.map(walk).sum)
        else 0
      walk(new java.io.File(d4))
    }
    def loadP50(): Double = {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        s4.allDF(sorted = false).count()
        (System.nanoTime() - t0) / 1e9
      }
      times.sorted.apply(2)
    }
    val tickRows = 200
    val keepHours = 10L
    println(s"snapshot-chain endurance: $ticks ticks, dropGraceMs=0")
    println("| tick | snap metas | disk files | rows | load p50 (s) |")
    println("|---|---|---|---|---|")
    val tickEvery = math.max(1, ticks / 10)
    (1 to ticks).foreach { t =>
      s4.insertDF(spark.createDataset((0 until tickRows).map { i =>
        Point(base.plusSeconds(t * 3600L + i), "chain",
          Map("host" -> s"h${i % 3}"), Map("v" -> i.toDouble))
      }).toDF().drop(Point.SeqCol).localCheckpoint(true))
      if (t % 2 == 0) s4.compact()
      else s4.retain(base.plusSeconds(math.max(0L, t - keepHours) * 3600L))
      if (t % tickEvery == 0)
        println(f"| $t | ${snapMetas()} | ${diskFiles()} | ${s4.length} | ${loadP50()}%.4f |")
    }
    // quiesce: two content-free maintenance ticks age the final drops
    // out and the drain rule must empty the chain entirely
    s4.compact(); s4.compact()
    val finalMetas = snapMetas()
    val finalFiles = diskFiles()
    println(s"final: snap metas=$finalMetas disk files=$finalFiles rows=${s4.length}")
    require(finalMetas == 0, s"snapshot chain failed to drain: $finalMetas metas remain")
    // exact survivors: the LAST retention tick (largest odd t) cut
    // batches below t - keepHours; everything from that batch through
    // the final tick's insert survives
    val lastRetain = if (ticks % 2 == 1) ticks else ticks - 1
    val firstKept = math.max(1, lastRetain - keepHours.toInt)
    val expectRows = (ticks - firstKept + 1).toLong * tickRows
    require(s4.length == expectRows,
      s"chain store rows ${s4.length} != expected $expectRows")
    spark.stop()
  }
}
