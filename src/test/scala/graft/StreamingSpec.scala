package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.engine.GraftDB
import graft.model.Point
import graft.query._
import graft.streaming.StreamingIngest

/** Structured Streaming ingest + watermark semantics: MemoryStream →
  * checkpointed foreachBatch append into GraftDB, out-of-order
  * acceptance, late-data drop under a watermark, and dedup within the
  * watermark horizon.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (time, measurement, room, temp) -> canonical Point columns (no _seq)
  private def canonical(rows: org.apache.spark.sql.DataFrame) =
    rows.select(
      col("time"),
      col("m").as(Point.MeasurementCol),
      map(lit("room"), col("room")).as(Point.TagsCol),
      map(lit("temp"), col("temp")).as(Point.FieldsCol))

  describe("streaming ingest into GraftDB") {
    it("appends micro-batches via foreachBatch, accepting out-of-order times") {
      val mem = MemoryStream[(Timestamp, String, String, Double)](spark)
      val db = GraftDB.inMemory(spark)
      val ckpt = java.nio.file.Files.createTempDirectory("graftckpt").toString
      val q = StreamingIngest.start(
        canonical(mem.toDF().toDF("time", "m", "room", "temp")), db, ckpt,
        lateness = "1 hour")
      try {
        mem.addData(
          (ts("2024-01-01 10:00:00"), "therm", "bed", 70.0),
          (ts("2024-01-01 11:00:00"), "therm", "bed", 71.0))
        q.processAllAvailable()
        // out-of-order batch: earlier event time after later ones
        mem.addData((ts("2024-01-01 09:00:00"), "therm", "kitchen", 68.0))
        q.processAllAvailable()
        assert(db.length == 3)
        // accepted and queryable; time order independent of arrival order
        assert(db.all().map(_.time.toString).head == "2024-01-01T09:00:00Z")
        // insertion (arrival) order preserved by _seq generations
        assert(db.all(sorted = false).map(_.tags("room")) == Seq("bed", "bed", "kitchen"))
        assert(db.count(FieldQuery("temp") >= 70.0) == 2)
      } finally q.stop()
    }

    it("checkpoint resume: a restarted query continues from committed offsets, no reprocessing") {
      val mem = MemoryStream[(Timestamp, String, String, Double)](spark)
      val db = GraftDB.inMemory(spark)
      val ckpt = java.nio.file.Files.createTempDirectory("graftckpt").toString
      val stream = canonical(mem.toDF().toDF("time", "m", "room", "temp"))
      val q1 = StreamingIngest.start(stream, db, ckpt)
      try {
        mem.addData((ts("2024-01-01 10:00:00"), "therm", "bed", 70.0))
        q1.processAllAvailable()
        assert(db.length == 1)
      } finally q1.stop()
      // restart against the SAME checkpoint: batch 0 must not re-run
      val q2 = StreamingIngest.start(stream, db, ckpt)
      try {
        mem.addData((ts("2024-01-01 11:00:00"), "therm", "bed", 71.0))
        q2.processAllAvailable()
        assert(db.length == 2) // 1 old + 1 new, old batch NOT reprocessed
        assert(db.getFieldValues("temp").map(_.doubleValue).sorted == Seq(70.0, 71.0))
      } finally q2.stop()
    }

    it("dedupKeys drops duplicate arrivals within the watermark") {
      val mem = MemoryStream[(Timestamp, String, String, Double)](spark)
      val db = GraftDB.inMemory(spark)
      val ckpt = java.nio.file.Files.createTempDirectory("graftckpt").toString
      val q = StreamingIngest.start(
        canonical(mem.toDF().toDF("time", "m", "room", "temp")), db, ckpt,
        lateness = "1 hour", dedupKeys = Seq(Point.TimeCol, Point.MeasurementCol))
      try {
        mem.addData(
          (ts("2024-01-01 10:00:00"), "therm", "bed", 70.0),
          (ts("2024-01-01 10:00:00"), "therm", "bed", 70.0)) // in-batch dup
        q.processAllAvailable()
        mem.addData((ts("2024-01-01 10:00:00"), "therm", "bed", 70.0)) // redelivery
        q.processAllAvailable()
        assert(db.length == 1)
      } finally q.stop()
    }
  }

  describe("non-file source (socket)") {
    it("a socket stream drives the same ingest graph — the broker-consumer shape") {
      // a local line server standing in for a broker: the reference's
      // own ingest is an MQTT consumer loop; socket is Spark's
      // built-in non-file test source
      val server = new java.net.ServerSocket(0)
      val lines = (0 until 25).map(i =>
        f"2024-01-01T00:$i%02d:00Z,therm,room$i,$i.5")
      val writer = new Thread(() => {
        try {
          val sock = server.accept()
          val out = new java.io.PrintWriter(sock.getOutputStream, true)
          lines.foreach(out.println)
          out.flush()
          // keep the connection open until the test is done reading
          Thread.sleep(30000L)
          sock.close()
        } catch { case _: Exception => () }
      })
      writer.setDaemon(true)
      writer.start()
      val db = GraftDB.inMemory(spark)
      val ckpt = java.nio.file.Files.createTempDirectory("graftsockckpt").toString
      val raw = spark.readStream.format("socket")
        .option("host", "localhost").option("port", server.getLocalPort).load()
      val parsed = raw.select(split(col("value"), ",").as("f"))
        .select(
          to_timestamp(col("f").getItem(0)).as(Point.TimeCol),
          col("f").getItem(1).as(Point.MeasurementCol),
          map(lit("room"), col("f").getItem(2)).as(Point.TagsCol),
          map(lit("temp"), col("f").getItem(3).cast("double")).as(Point.FieldsCol))
      val q = StreamingIngest.start(parsed, db, ckpt)
      try {
        val deadline = System.currentTimeMillis() + 60000L
        while (db.length < lines.size && q.exception.isEmpty &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(100L)
        assert(q.exception.isEmpty, s"query died: ${q.exception}")
      } finally { q.stop(); server.close() }
      assert(db.length == 25)
      assert(db.count(FieldQuery("temp") === 7.5) == 1)
      assert(db.count(TagQuery("room") === "room13") == 1)
      assert(db.getTimestamps().max == java.time.Instant.parse("2024-01-01T00:24:00Z"))
    }
  }

  describe("sustained ingest endurance (auto-compaction under streaming)") {
    it("bounded delta file count and intact contents after many streamed micro-batches") {
      // physical aging is asserted below, so the deletion time floor
      // must be off — own the conf here (save/restore) instead of
      // depending on StorageSpec having set it on the shared session
      val prevGrace = spark.conf.getOption("graft.storage.snapshotDropGraceMs")
      spark.conf.set("graft.storage.snapshotDropGraceMs", "0")
      try {
      val mem = MemoryStream[(Timestamp, String, String, Double)](spark)
      val dir = java.nio.file.Files.createTempDirectory("graftendure").toString
      val db = new GraftDB(new graft.engine.ParquetStorage(spark, dir,
        partitioned = true, autoCompactFiles = 8))
      val ckpt = java.nio.file.Files.createTempDirectory("graftendureckpt").toString
      val q = StreamingIngest.start(
        canonical(mem.toDF().toDF("time", "m", "room", "temp")), db, ckpt)
      val nBatches = 60
      try {
        (0 until nBatches).foreach { b =>
          mem.addData((new Timestamp(1704067200000L + b * 60000L), "m", s"r${b % 4}", b.toDouble))
          q.processAllAvailable() // force ONE micro-batch (= one append) per event
        }
      } finally q.stop()
      // one delta file per batch forever without the policy — 60 here;
      // the threshold-8 auto-compaction must keep the tier bounded.
      // The policy bounds LIVE files (what readers scan); physically
      // the dir also holds the last merge's replaced originals until
      // the next maintenance commit prunes them (the keep-predecessor
      // grace), so the physical bound is threshold + one merge's
      // inputs + the merged output.
      val live = db.storage.asInstanceOf[graft.engine.ParquetStorage]
        .liveDeltaFileCount()
      assert(live <= 8, s"delta holds $live LIVE files after $nBatches streamed batches")
      val delta = new java.io.File(s"$dir/delta")
      val files = if (!delta.exists) 0
        else delta.listFiles.count(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_"))
      assert(files <= 8 + 8 + 1,
        s"delta holds $files physical files after $nBatches streamed batches")
      // nothing lost across the repeated compactions, order intact
      assert(db.length == nBatches)
      val seqs = db.all(sorted = false).map(_._seq)
      assert(seqs == seqs.sorted && seqs.distinct.size == nBatches)
      assert(db.getFieldValues("temp").map(_.doubleValue) == (0 until nBatches).map(_.toDouble))
      } finally prevGrace match {
        case Some(v) => spark.conf.set("graft.storage.snapshotDropGraceMs", v)
        case None => spark.conf.unset("graft.storage.snapshotDropGraceMs")
      }
    }
  }

  describe("non-file source (rate-micro-batch generator)") {
    it("the same ingest graph consumes a generator source — no file ever read") {
      val db = GraftDB.inMemory(spark)
      val ckpt = java.nio.file.Files.createTempDirectory("rateckpt").toString
      StreamingIngest.ingestRate(spark, db, rowsPerBatch = 100, totalRows = 350L, ckpt)
      // converged exactly to the filtered prefix, however many triggers fired
      assert(db.length == 350)
      // closed-form content: value %7 tags, %100 fields, value-second times
      assert(db.count(TagQuery("sensor") === "s3") == 50)
      assert(db.count(FieldQuery("v") === 99.0) == 3) // values 99, 199, 299
      val times = db.getTimestamps()
      assert(times.min == java.time.Instant.ofEpochMilli(StreamingIngest.RateEpochMs))
      assert(times.max == java.time.Instant.ofEpochMilli(StreamingIngest.RateEpochMs + 349000L))
      // and the store is fully queryable like any batch-ingested one
      db.reindex()
      assert(db.count(TagQuery("sensor") === "s0") == 50)
    }
  }

  describe("sliding and session windows") {
    it("sliding windows overlap; each event lands in windowLen/slide windows") {
      val mem = MemoryStream[(Timestamp, String, String, Double)](spark)
      val agg = StreamingIngest.slidingAgg(
        mem.toDF().toDF("time", "m", "room", "temp"),
        "time", windowLen = "1 hour", slide = "30 minutes", lateness = "0 seconds",
        groupCols = Seq("m"), aggs = Seq("count(1)" -> "n"))
      val q = agg.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("slide_sink").start()
      try {
        mem.addData((ts("2024-01-01 10:40:00"), "therm", "bed", 70.0))
        q.processAllAvailable()
        mem.addData((ts("2024-01-01 13:00:00"), "therm", "bed", 71.0)) // close both windows
        q.processAllAvailable()
        val wins = spark.table("slide_sink")
          .select(col("win.start").cast("string"), col("n"))
          .as[(String, Long)].collect().toMap
        // 10:40 lands in [10:00,11:00) and [10:30,11:30)
        assert(wins.keySet.intersect(Set("2024-01-01 10:00:00", "2024-01-01 10:30:00"))
          == Set("2024-01-01 10:00:00", "2024-01-01 10:30:00"))
        assert(wins("2024-01-01 10:00:00") == 1L && wins("2024-01-01 10:30:00") == 1L)
      } finally q.stop()
    }

    it("session windows merge events within the gap and close after it") {
      val mem = MemoryStream[(Timestamp, String, String, Double)](spark)
      val agg = StreamingIngest.sessionAgg(
        mem.toDF().toDF("time", "m", "room", "temp"),
        "time", gap = "10 minutes", lateness = "0 seconds",
        groupCols = Seq("room"), aggs = Seq("count(1)" -> "n", "sum(temp)" -> "s"))
      val q = agg.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("sess_sink").start()
      try {
        mem.addData(
          (ts("2024-01-01 10:00:00"), "therm", "bed", 1.0),
          (ts("2024-01-01 10:05:00"), "therm", "bed", 2.0),  // merges (within 10m)
          (ts("2024-01-01 10:30:00"), "therm", "bed", 4.0))  // new session
        q.processAllAvailable()
        mem.addData((ts("2024-01-01 12:00:00"), "therm", "bed", 8.0)) // advance watermark
        q.processAllAvailable()
        val sessions = spark.table("sess_sink")
          .select(col("win.start").cast("string"), col("n"), col("s"))
          .as[(String, Long, Double)].collect().map { case (k, n, s) => (k, (n, s)) }.toMap
        assert(sessions("2024-01-01 10:00:00") == ((2L, 3.0))) // merged pair
        assert(sessions("2024-01-01 10:30:00") == ((1L, 4.0)))
      } finally q.stop()
    }

    it("an event at EXACTLY gap distance still merges (adjacency, q89's oracle rule)") {
      // Spark merges ADJACENT [t, t+gap) windows, not just overlapping
      // ones — verified here because the q89 oracle must break only on
      // diff STRICTLY greater than the gap to agree at the boundary
      val mem = MemoryStream[(Timestamp, String, String, Double)](spark)
      val agg = StreamingIngest.sessionAgg(
        mem.toDF().toDF("time", "m", "room", "temp"),
        "time", gap = "10 minutes", lateness = "0 seconds",
        groupCols = Seq("room"), aggs = Seq("count(1)" -> "n"))
      val q = agg.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("sess_edge_sink").start()
      try {
        mem.addData(
          (ts("2024-01-01 10:00:00"), "therm", "bed", 1.0),
          (ts("2024-01-01 10:10:00"), "therm", "bed", 2.0), // exactly the gap away
          (ts("2024-01-01 10:20:01"), "therm", "bed", 4.0)) // 1s past it: new session
        q.processAllAvailable()
        mem.addData((ts("2024-01-01 12:00:00"), "therm", "bed", 8.0))
        q.processAllAvailable()
        val sessions = spark.table("sess_edge_sink")
          .select(col("win.start").cast("string"), col("n"))
          .as[(String, Long)].collect().toMap
        assert(sessions.get("2024-01-01 10:00:00").contains(2L)) // merged at the boundary
        assert(sessions.get("2024-01-01 10:20:01").contains(1L))
        assert(!sessions.contains("2024-01-01 10:10:00"))
      } finally q.stop()
    }
  }

  describe("custom state (mapGroupsWithState)") {
    it("maintains running count and latest-by-event-time value across batches") {
      val mem = MemoryStream[(Timestamp, String, String, Double)](spark)
      val stats = StreamingIngest.seriesStats(
        mem.toDF().toDF("time", "m", "room", "temp"), "room", "time", "temp")
      val q = stats.toDF().writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("stats_sink").start()
      try {
        mem.addData(
          (ts("2024-01-01 10:00:00"), "therm", "bed", 70.0),
          (ts("2024-01-01 11:00:00"), "therm", "bed", 71.0),
          (ts("2024-01-01 10:30:00"), "therm", "kit", 65.0))
        q.processAllAvailable()
        // second batch: late row for bed (older than 11:00) + kit update —
        // state persists across batches
        mem.addData(
          (ts("2024-01-01 09:00:00"), "therm", "bed", 1.0),   // late: counted, value kept
          (ts("2024-01-01 12:00:00"), "therm", "kit", 66.0))
        q.processAllAvailable()
        val last = spark.table("stats_sink")
          .groupBy("key").agg(max_by(struct(col("count"), col("lastValue")), col("count")).as("s"))
          .select(col("key"), col("s.count"), col("s.lastValue"))
          .as[(String, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
        assert(last("bed") == ((3L, 71.0))) // late 09:00 row counted but not latest
        assert(last("kit") == ((2L, 66.0)))
      } finally q.stop()
    }

    it("evicts state for series silent past the TTL (EventTimeTimeout)") {
      val mem = MemoryStream[(Timestamp, String, String, Double)](spark)
      val stats = StreamingIngest.seriesStats(
        mem.toDF().toDF("time", "m", "room", "temp"), "room", "time", "temp",
        stateTtl = Some("1 hour"), lateness = "0 seconds")
      val q = stats.toDF().writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("ttl_sink").start()
      try {
        mem.addData(
          (ts("2024-01-01 10:00:00"), "therm", "bed", 70.0),
          (ts("2024-01-01 10:00:00"), "therm", "kit", 60.0))
        q.processAllAvailable()
        // advance the watermark to 13:00 via kit alone — far past bed's
        // 11:00 timeout, so bed's state record is evicted
        mem.addData((ts("2024-01-01 13:00:00"), "therm", "kit", 61.0))
        q.processAllAvailable()
        // bed returns AFTER eviction: its count restarts at 1 — a live
        // (un-evicted) state would have continued to 2
        mem.addData((ts("2024-01-01 13:30:00"), "therm", "bed", 75.0))
        q.processAllAvailable()
        val bedCounts = spark.table("ttl_sink").filter(col("key") === "bed")
          .select("count").as[Long].collect().toSeq
        assert(bedCounts.sorted == Seq(1L, 1L))
        // kit stayed within its TTL the whole time: state persisted
        val kitMax = spark.table("ttl_sink").filter(col("key") === "kit")
          .agg(max("count")).as[Long].head()
        assert(kitMax == 2L)
      } finally q.stop()
    }
  }

  describe("watermarked tumbling aggregation (append mode)") {
    it("emits a window when the watermark passes it and drops later-than-horizon events") {
      val mem = MemoryStream[(Timestamp, String, String, Double)](spark)
      val agg = StreamingIngest.tumblingAgg(
        mem.toDF().toDF("time", "m", "room", "temp"),
        "time", windowLen = "1 hour", lateness = "30 minutes",
        groupCols = Seq("m"), aggs = Seq("count(1)" -> "n", "sum(temp)" -> "sum_temp"))
      val q = agg.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("wm_sink").start()
      try {
        mem.addData(
          (ts("2024-01-01 10:10:00"), "therm", "bed", 70.0),
          (ts("2024-01-01 10:20:00"), "therm", "bed", 72.0))
        q.processAllAvailable()
        // watermark = max(10:20) - 30m = 09:50 -> 10:00 window still open
        assert(spark.table("wm_sink").count() == 0)
        // advance event time past 11:30 -> watermark 11:05 closes the 10:00 window
        mem.addData((ts("2024-01-01 11:35:00"), "therm", "bed", 69.0))
        q.processAllAvailable()
        val closed = spark.table("wm_sink")
          .select(col("win.start").cast("string"), col("n"), col("sum_temp"))
          .as[(String, Long, Double)].collect().map { case (k, n, s) => (k, (n, s)) }.toMap
        assert(closed == Map("2024-01-01 10:00:00" -> ((2L, 142.0))))
        // a LATE event for the closed window (behind the watermark) is dropped
        mem.addData((ts("2024-01-01 10:25:00"), "therm", "bed", 100.0))
        q.processAllAvailable()
        mem.addData((ts("2024-01-01 13:00:00"), "therm", "bed", 65.0)) // close 11:00 window
        q.processAllAvailable()
        val after = spark.table("wm_sink")
          .select(col("win.start").cast("string"), col("n"), col("sum_temp"))
          .as[(String, Long, Double)].collect().map { case (k, n, s) => (k, (n, s)) }.toMap
        // 10:00 window unchanged (late event dropped); 11:00 window emitted with only 11:35
        assert(after("2024-01-01 10:00:00") == ((2L, 142.0)))
        assert(after("2024-01-01 11:00:00") == ((1L, 69.0)))
      } finally q.stop()
    }
  }

  describe("watermarked stream-stream join") {
    it("matches rows within the time bound per key; state is watermark-bounded") {
      val clicks = MemoryStream[(Timestamp, String)](spark)
      val imps = MemoryStream[(Timestamp, String)](spark)
      val joined = StreamingIngest.streamStreamJoin(
        clicks.toDF().toDF("ctime", "user"),
        imps.toDF().toDF("itime", "user"),
        keyCols = Seq("user"),
        leftTimeCol = "ctime", rightTimeCol = "itime",
        lowerBound = "10 minutes", upperBound = "10 minutes",
        lateness = "1 minute")
      val q = joined.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("ssj_sink").start()
      try {
        clicks.addData((ts("2024-01-01 10:05:00"), "u1"), (ts("2024-01-01 10:05:00"), "u2"))
        imps.addData(
          (ts("2024-01-01 10:00:00"), "u1"),  // within 10m of u1 click
          (ts("2024-01-01 09:00:00"), "u1"),  // outside the bound
          (ts("2024-01-01 10:00:00"), "u3"))  // no matching key
        q.processAllAvailable()
        val got = spark.table("ssj_sink")
          .select(col("user"), col("ctime").cast("string"), col("itime").cast("string"))
          .as[(String, String, String)].collect().toSet
        assert(got == Set(("u1", "2024-01-01 10:05:00", "2024-01-01 10:00:00")))
      } finally q.stop()
    }
  }

  describe("watermarked streaming dedup") {
    it("first arrival per key passes; later duplicates drop, in-batch and across batches") {
      val mem = MemoryStream[(Timestamp, String, String, Double)](spark)
      val dd = StreamingIngest.streamDedup(
        mem.toDF().toDF("time", "m", "room", "temp"),
        keyCols = Seq("m", "room"), timeCol = "time", lateness = "10 minutes")
      val q = dd.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("dedup_sink").start()
      try {
        mem.addData(
          (ts("2024-01-01 10:00:00"), "therm", "bed", 70.0),
          (ts("2024-01-01 10:01:00"), "therm", "bed", 71.0),     // in-batch dup
          (ts("2024-01-01 10:02:00"), "therm", "kitchen", 68.0))
        q.processAllAvailable()
        mem.addData((ts("2024-01-01 10:03:00"), "therm", "bed", 72.0)) // cross-batch dup
        q.processAllAvailable()
        val rows = spark.table("dedup_sink").select("m", "room")
          .as[(String, String)].collect().toSeq
        assert(rows.size == 2)
        assert(rows.toSet == Set(("therm", "bed"), ("therm", "kitchen")))
        // the projection inside streamDedup keeps keys + event time only
        assert(spark.table("dedup_sink").columns.toSet == Set("m", "room", "time"))
      } finally q.stop()
    }
  }
}
