package graft

import java.nio.file.Files
import java.time.Instant

import graft.engine.GraftDB
import graft.model.Point
import graft.query._

/** End-to-end DB-op coverage mirroring the reference's test_tinyflux.py
  * (memory backend) and test_storages.py (persistent backend).
  */
class GraftDBSpec extends SparkSpec {

  private def t(s: String): Instant = Instant.parse(s)

  private def freshDb(): GraftDB = {
    val d = GraftDB.inMemory(spark)
    d.insertMultiple(Seq(
      Point(t("2024-01-03T00:00:00Z"), "therm", Map("room" -> "bed"), Map("temp" -> 70.0)),
      Point(t("2024-01-01T00:00:00Z"), "therm", Map("room" -> "kitchen"), Map("temp" -> 68.0)),
      Point(t("2024-01-02T00:00:00Z"), "cpu", Map("host" -> "a"), Map("load" -> 0.5))
    ))
    d
  }

  describe("insert / scan") {
    it("assigns insertion-order _seq and len counts all") {
      val db = freshDb()
      assert(db.length == 3)
      assert(db.all(sorted = false).map(_.measurement) == Seq("therm", "therm", "cpu"))
    }
    it("all(sorted=true) is time order; sorted=false insertion order") {
      val db = freshDb()
      assert(db.all().map(_.time) == Seq(
        t("2024-01-01T00:00:00Z"), t("2024-01-02T00:00:00Z"), t("2024-01-03T00:00:00Z")))
      assert(db.all(sorted = false).head.time == t("2024-01-03T00:00:00Z"))
    }
    it("single insert appends after existing seqs") {
      val db = freshDb()
      db.insert(Point(t("2024-01-04T00:00:00Z"), "cpu", fields = Map("load" -> 0.9)))
      assert(db.length == 4)
      assert(db.get(FieldQuery("load") === 0.9).isDefined)
      val seqs = db.all(sorted = false).map(_._seq)
      assert(seqs == seqs.sorted && seqs.distinct.size == 4)
    }
  }

  describe("get / contains / count / select") {
    it("get returns FIRST match in insertion order") {
      val db = freshDb()
      val p = db.get(MeasurementQuery() === "therm")
      assert(p.exists(_.tags("room") == "bed")) // inserted first
    }
    it("contains early-exit and count") {
      val db = freshDb()
      assert(db.contains(FieldQuery("temp") > 69.0))
      assert(!db.contains(FieldQuery("temp") > 99.0))
      assert(db.count(MeasurementQuery() === "therm") == 2)
    }
    it("select projects dotted keys, missing → null") {
      val db = freshDb()
      val rows = db.selectDF(Seq("measurement", "tags.room", "fields.load")).collect()
      assert(rows.length == 3)
      assert(rows(0).getString(0) == "therm" && rows(0).getString(1) == "bed" && rows(0).isNullAt(2))
      assert(rows(2).getString(0) == "cpu" && rows(2).isNullAt(1) && rows(2).getDouble(2) == 0.5)
    }
  }

  describe("edge cases (reference test_tinyflux.py parity)") {
    it("ops on an empty database") {
      val db = GraftDB.inMemory(spark)
      assert(db.length == 0)
      assert(db.all().isEmpty)
      assert(db.get(Noop).isEmpty)
      assert(!db.contains(FieldQuery("x").exists()))
      assert(db.count(Noop) == 0)
      assert(db.update(Noop, fields = Map("x" -> 1.0)) == 0)
      assert(db.remove(Noop) == 0)
      assert(db.getMeasurements.isEmpty && db.getTagKeys().isEmpty)
    }
    it("remove_all truncates; inserts still work after") {
      val db = freshDb()
      db.removeAll()
      assert(db.length == 0)
      db.insert(Point(t("2024-02-01T00:00:00Z"), "m", Map(), Map("v" -> 1.0)))
      assert(db.length == 1)
    }
    it("update matching nothing returns 0 and changes nothing") {
      val db = freshDb()
      val before = db.all()
      assert(db.update(TagQuery("room") === "attic", fields = Map("temp" -> 1.0)) == 0)
      assert(db.all() == before)
    }
    it("measurement view: iterator, updateAll, metadata scoping") {
      val db = freshDb()
      val m = db.measurement("therm")
      assert(m.iterator.size == 2)
      assert(m.updateAll(tags = Map("unit" -> "F")) == 2)
      assert(db.count(TagQuery("unit") === "F") == 2) // cpu untouched
      assert(m.getFieldKeys == Seq("temp"))
      assert(db.measurement("cpu").getTagKeys == Seq("host"))
      // view of a measurement with no points behaves as empty
      val ghost = db.measurement("nope")
      assert(ghost.length == 0 && ghost.all().isEmpty)
    }
    it("insert returns 1 and insert_multiple the batch size (database.py:621,656)") {
      val db = GraftDB.inMemory(spark)
      assert(db.insert(Point(t("2024-01-01T00:00:00Z"), "m", fields = Map("v" -> 1.0))) == 1)
      assert(db.insertMultiple(Seq(
        Point(t("2024-01-02T00:00:00Z"), "m", fields = Map("v" -> 2.0)),
        Point(t("2024-01-03T00:00:00Z"), "m", fields = Map("v" -> 3.0)))) == 2)
      assert(db.insertMultiple(Nil) == 0)
      assert(db.measurement("m2")
        .insert(Point(t("2024-01-04T00:00:00Z"), fields = Map("v" -> 4.0))) == 1)
      assert(db.length == 4)
    }
    it("per-call compact_key_prefixes overrides the storage default (database.py:617,654)") {
      val f = Files.createTempFile("graftcsv", ".csv")
      val db = GraftDB.atCsv(spark, f.toString)
      db.insert(Point(t("2024-01-01T00:00:00Z"), "m", Map("room" -> "bed"), Map("temp" -> 1.0)))
      db.insert(Point(t("2024-01-02T00:00:00Z"), "m", Map("room" -> "kit"), Map("temp" -> 2.0)),
        compactKeyPrefixes = Some(true))
      val lines = java.nio.file.Files.readAllLines(f)
      assert(lines.get(0).contains("_tag_room") && lines.get(0).contains("_field_temp"))
      assert(lines.get(1).contains("t_room") && lines.get(1).contains("f_temp"))
      // the mixed-prefix file reads back uniformly — the reader
      // classifies per key (point.py:257-278)
      assert(db.count(TagQuery("room").exists()) == 2)
      assert(db.getFieldValues("temp").map(_.doubleValue) == Seq(1.0, 2.0))
    }
    it("naive wall-clock times convert local -> UTC at insert (database.py:1276, time.rst)") {
      val db = GraftDB.inMemory(spark)
      val wall = java.time.LocalDateTime.of(2024, 1, 1, 12, 30, 0)
      // default zone: the reference's astimezone(utc) on a naive
      // datetime assumes the system zone
      db.insert(Point.local(wall, "m", fields = Map("v" -> 1.0)))
      val stored = db.get(FieldQuery("v") === 1.0).get.time
      assert(stored == wall.atZone(java.time.ZoneId.systemDefault()).toInstant)
      // explicit observation zone, DST-aware conversion
      val ny = java.time.ZoneId.of("America/New_York")
      db.insert(Point.local(wall, "m", fields = Map("v" -> 2.0), zone = ny))
      assert(db.get(FieldQuery("v") === 2.0).get.time ==
        java.time.Instant.parse("2024-01-01T17:30:00Z")) // EST = UTC-5
      val nySummer = java.time.LocalDateTime.of(2024, 7, 1, 12, 30, 0)
      db.insert(Point.local(nySummer, "m", fields = Map("v" -> 3.0), zone = ny))
      assert(db.get(FieldQuery("v") === 3.0).get.time ==
        java.time.Instant.parse("2024-07-01T16:30:00Z")) // EDT = UTC-4
    }
    it("insert validates: null measurement rejected, null time defaults to now") {
      val db = GraftDB.inMemory(spark)
      intercept[IllegalArgumentException] {
        db.insert(Point(t("2024-01-01T00:00:00Z"), null, Map(), Map("v" -> 1.0)))
      }
      db.insert(Point(null, "m", Map(), Map("v" -> 1.0)))
      assert(db.get(Noop).get.time != null)
    }
  }

  describe("reindex (columnarized query view)") {
    it("preserves full query semantics through the indexed layout") {
      val db = freshDb()
      db.insert(Point(t("2024-01-05T00:00:00Z"), "therm",
        Map("room" -> null), Map("temp" -> null))) // present-but-null values
      def snapshot() = Seq(
        db.search(TagQuery("room") === "bed").map(_._seq),
        db.search(TagQuery("room") =!= "bed").map(_._seq),   // present-null => true
        db.search(~(TagQuery("room") === "bed")).map(_._seq), // missing-key => true
        db.search(TagQuery("room").exists()).map(_._seq),
        db.search(FieldQuery("temp").exists()).map(_._seq),
        db.search(FieldQuery("temp") >= 69.0).map(_._seq),
        db.search((FieldQuery("temp") >= 60.0) & (TagQuery("room") === "kitchen")).map(_._seq),
        db.search(TagQuery("room").matches("b.")).map(_._seq),
        Seq(db.count(MeasurementQuery() === "therm")),
        db.get(TagQuery("host") === "a").map(_._seq).toSeq)
      val before = snapshot()
      db.reindex()
      assert(snapshot() == before)
    }
    it("a time-ordered append extends the index in place — delta-only work") {
      val db = freshDb() // times 2024-01-01..03, keys room/host, temp/load
      db.reindex()
      assert(db.indexValid)
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
      val newPoint = Point(t("2024-01-07T00:00:00Z"), "therm",
        Map("room" -> "attic", "wing" -> "east"),
        Map("temp" -> 50.0, "hum" -> 0.3))
      val extensionJobs = countJobs { db.insert(newPoint) }
      assert(db.indexValid, "in-order append must extend the index, not invalidate it")
      // delta-only budget, asserted RELATIVE to a full rebuild of the
      // same end state in the same session (absolute job counts drift
      // with AQE): the extension runs one stats pass + one cache
      // materialization over the 1-row delta; the rebuild re-scans the
      // whole store for keys, cache and bounds.
      val db2 = freshDb()
      db2.insert(newPoint) // un-indexed plain append
      val rebuildJobs = countJobs { db2.reindex() }
      assert(extensionJobs < rebuildJobs,
        s"extension ran $extensionJobs jobs vs full rebuild $rebuildJobs — must touch only the delta")
      assert(db.length == 4)
      assert(db.count(TagQuery("room") === "attic") == 1)
      // brand-new keys get fresh slots and are queryable...
      assert(db.count(TagQuery("wing") === "east") == 1)
      assert(db.count(FieldQuery("hum") >= 0.0) == 1)
      // ...and exists()/NOT hold for OLD rows, which must read the new
      // slots as presence=FALSE (a null presence bit would drop them)
      assert(db.count(TagQuery("wing").exists()) == 1)
      assert(db.count(~TagQuery("wing").exists()) == 3)
      // the zonemap adopted the delta's max: a range past the OLD max
      // must find the new row (stale bounds would prune it to empty)
      assert(db.count(TimeQuery() >= t("2024-01-05T00:00:00Z")) == 1)
      // old data still fully queryable through the extended view
      assert(db.count(FieldQuery("temp") >= 60.0) == 2)
    }
    it("an out-of-order append declines extension and invalidates") {
      val db = freshDb()
      db.reindex()
      db.insert(Point(t("2023-12-01T00:00:00Z"), "therm",
        Map("room" -> "attic"), Map("temp" -> 1.0)))
      assert(!db.indexValid)
      assert(db.count(TagQuery("room") === "attic") == 1)
      assert(db.length == 4)
    }
    it("autoIndex: a read finding no live index rebuilds it transparently (auto_index parity)") {
      val db = GraftDB.inMemory(spark, autoIndex = true)
      db.insertMultiple(Seq(
        Point(t("2024-01-03T00:00:00Z"), "therm", Map("room" -> "bed"), Map("temp" -> 70.0)),
        Point(t("2024-01-01T00:00:00Z"), "therm", Map("room" -> "kitchen"), Map("temp" -> 68.0)),
        Point(t("2024-01-02T00:00:00Z"), "cpu", Map("host" -> "a"), Map("load" -> 0.5))))
      assert(!db.indexValid)
      // read op → lazy build (decorators.py:50-51), correct result
      assert(db.count(TagQuery("room") === "bed") == 1)
      assert(db.indexValid)
      // an out-of-order insert invalidates...
      db.insert(Point(t("2023-12-01T00:00:00Z"), "therm",
        Map("room" -> "attic"), Map("temp" -> 1.0)))
      assert(!db.indexValid)
      // ...and the NEXT read rebuilds before filtering — the inserted
      // point is found with no explicit reindex anywhere
      assert(db.count(TagQuery("room") === "attic") == 1)
      assert(db.indexValid)
      assert(db.length == 4)
    }
    it("remove subtracts from the live index instead of invalidating (reference index patch)") {
      val db = freshDb()
      db.reindex()
      assert(db.remove(TagQuery("room") === "bed") == 1)
      assert(db.indexValid, "remove must patch the index view, not invalidate it")
      assert(db.length == 2)
      assert(db.count(TagQuery("room") === "bed") == 0)
      assert(db.count(MeasurementQuery() === "therm") == 1)
      // a null-evaluating predicate (missing key) must neither remove
      // rows nor corrupt the patched view's null semantics
      assert(db.remove(FieldQuery("nope") > 0.0) == 0)
      assert(db.count(~TagQuery("room").exists()) == 1) // cpu row keeps NOT semantics
      // dropMeasurement patches too
      assert(db.dropMeasurement("cpu") == 1)
      assert(db.indexValid)
      assert(db.search(Noop).map(_.tags("room")) == Seq("kitchen"))
    }
    it("literal update patches the live index instead of invalidating (reference reposition)") {
      val db = freshDb()
      db.reindex()
      // literal tag+field update on matches; 'unit' is a brand-new key
      assert(db.update(MeasurementQuery() === "therm",
        tags = Map("unit" -> "F"), fields = Map("temp" -> 0.0)) == 2)
      assert(db.indexValid, "literal update must patch the index view, not invalidate it")
      assert(db.count(FieldQuery("temp") === 0.0) == 2)
      assert(db.count(TagQuery("unit") === "F") == 2)
      // the new key got a fresh slot; unmatched rows read presence=FALSE
      assert(db.count(TagQuery("unit").exists()) == 2)
      assert(db.count(~TagQuery("unit").exists()) == 1)
      // unset clears the key on matches only
      assert(db.update(TagQuery("room") === "bed", unsetFields = Seq("temp")) == 1)
      assert(db.indexValid)
      assert(db.count(FieldQuery("temp").exists()) == 1)
      // time reposition PAST the old zonemap max: stale bounds would
      // prove the range empty and silently drop the row
      assert(db.update(TagQuery("room") === "bed",
        time = Some(t("2024-02-01T00:00:00Z"))) == 1)
      assert(db.indexValid)
      assert(db.count(TimeQuery() >= t("2024-01-20T00:00:00Z")) == 1)
      // callable updates have no slot translation: still invalidate
      db.updateWith(MeasurementQuery() === "cpu",
        time = Some(_ => org.apache.spark.sql.functions.lit(
          java.sql.Timestamp.from(t("2024-03-01T00:00:00Z")))))
      assert(!db.indexValid)
      assert(db.count(TimeQuery() >= t("2024-02-15T00:00:00Z")) == 1)
    }
    it("is invalidated by writes (results stay correct after update/insert)") {
      val db = freshDb()
      db.reindex()
      assert(db.count(TagQuery("room") === "attic") == 0)
      db.insert(Point(t("2024-01-06T00:00:00Z"), "therm",
        Map("room" -> "attic"), Map("temp" -> 50.0)))
      assert(db.count(TagQuery("room") === "attic") == 1)
      db.reindex()
      assert(db.update(TagQuery("room") === "attic", fields = Map("temp" -> 55.0)) == 1)
      assert(db.count(FieldQuery("temp") === 55.0) == 1)
      assert(db.remove(TagQuery("room") === "attic") == 1)
      assert(db.count(TagQuery("room") === "attic") == 0)
    }
  }

  describe("update") {
    it("merges tags/fields on matches only, returns changed count") {
      val db = freshDb()
      val n = db.update(MeasurementQuery() === "therm",
        tags = Map("unit" -> "F"), fields = Map("temp" -> 0.0))
      assert(n == 2)
      val therms = db.search(MeasurementQuery() === "therm")
      assert(therms.forall(p => p.tags("unit") == "F" && p.fields("temp") == 0.0))
      val cpu = db.get(MeasurementQuery() === "cpu").get
      assert(!cpu.tags.contains("unit") && cpu.fields("load") == 0.5)
    }
    it("unset removes keys; update time/measurement rewrites attributes") {
      val db = freshDb()
      db.update(TagQuery("room") === "bed", unsetTags = Seq("room"),
        time = Some(t("2020-01-01T00:00:00Z")), measurement = Some("archived"))
      val p = db.get(MeasurementQuery() === "archived").get
      assert(!p.tags.contains("room") && p.time == t("2020-01-01T00:00:00Z"))
      assert(db.count(MeasurementQuery() === "therm") == 1)
    }
    it("updateAll hits everything") {
      val db = freshDb()
      assert(db.updateAll(tags = Map("seen" -> "y")) == 3)
      assert(db.count(TagQuery("seen") === "y") == 3)
    }
    it("counts only points that actually changed (reference semantics)") {
      val db = freshDb()
      // therm temps are 70.0 and 68.0 — setting temp=70 changes only one
      assert(db.update(MeasurementQuery() === "therm", fields = Map("temp" -> 70.0)) == 1)
      // repeating it is a no-op
      assert(db.update(MeasurementQuery() === "therm", fields = Map("temp" -> 70.0)) == 0)
    }
    it("update guarded by a time query applies ALL parts when rewriting time") {
      // Regression: with sequential withColumn the predicate re-resolved
      // against the already-updated time column, silently skipping the
      // tag update for rows whose NEW time no longer matched.
      val db = freshDb()
      val n = db.update(TimeQuery() >= t("2024-01-02T00:00:00Z"),
        time = Some(t("2020-01-01T00:00:00Z")), tags = Map("late" -> "y"))
      assert(n == 2)
      val moved = db.search(TagQuery("late") === "y")
      assert(moved.size == 2 && moved.forall(_.time == t("2020-01-01T00:00:00Z")))
    }
    it("callable update transforms values as Column expressions") {
      import org.apache.spark.sql.functions._
      val db = freshDb()
      val n = db.updateWith(MeasurementQuery() === "therm",
        fields = Some(f => transform_values(f,
          (k, v) => when(k === "temp", v * 2).otherwise(v))))
      assert(n == 2)
      assert(db.getFieldValues("temp").map(_.doubleValue).sorted == Seq(136.0, 140.0))
    }
  }

  describe("remove / drop") {
    it("remove anti-filters and reports count") {
      val db = freshDb()
      assert(db.remove(FieldQuery("temp") < 69.0) == 1)
      assert(db.length == 2)
      assert(db.remove(FieldQuery("temp") < 69.0) == 0)
    }
    it("removeAll truncates; dropMeasurement drops one table") {
      val db = freshDb()
      assert(db.dropMeasurement("therm") == 2)
      assert(db.getMeasurements == Seq("cpu"))
      db.removeAll()
      assert(db.length == 0)
    }
  }

  describe("metadata getters") {
    it("measurements / field keys / tag keys sorted distinct") {
      val db = freshDb()
      assert(db.getMeasurements == Seq("cpu", "therm"))
      assert(db.getFieldKeys() == Seq("load", "temp"))
      assert(db.getTagKeys() == Seq("host", "room"))
      assert(db.getFieldKeys(Some("cpu")) == Seq("load"))
    }
    it("field values in insertion order, absent-key rows skipped") {
      val db = freshDb()
      assert(db.getFieldValues("temp").map(_.doubleValue) == Seq(70.0, 68.0))
    }
    it("tag values per key, nulls first") {
      val db = freshDb()
      db.insert(Point(t("2024-01-05T00:00:00Z"), "therm", Map("room" -> null)))
      val vals = db.getTagValues(Seq("room"))
      assert(vals("room") == Seq(null, "bed", "kitchen"))
      assert(db.getTagValues(Seq("missing"))("missing").isEmpty)
    }
    it("timestamps in insertion order") {
      val db = freshDb()
      assert(db.getTimestamps().map(_.toString.take(10)) ==
        Seq("2024-01-03", "2024-01-01", "2024-01-02"))
    }
  }

  describe("measurement view") {
    it("scopes every op to the named measurement") {
      val db = freshDb()
      val m = db.measurement("therm")
      assert(m.length == 2)
      m.insert(Point(t("2024-01-06T00:00:00Z"), fields = Map("temp" -> 72.0)))
      assert(m.length == 3 && db.length == 4)
      assert(m.get(FieldQuery("temp") === 72.0).exists(_.measurement == "therm"))
      assert(m.count(FieldQuery("temp") >= 68.0) == 3)
      assert(m.removeAll() == 3)
      assert(db.length == 1)
    }
  }

  describe("zonemap time bounds (reindex tier)") {
    it("short-circuits provably-empty time ranges to a zero-job LocalRelation") {
      val db = GraftDB.inMemory(spark)
      db.insertMultiple(Seq(
        Point(t("2024-01-01T00:00:00Z"), "m", Map("u" -> "a"), Map("x" -> 1.0)),
        Point(t("2024-01-10T00:00:00Z"), "m", Map("u" -> "b"), Map("x" -> 2.0))))
      db.reindex()
      // past the data's max time → empty, answered without a scan
      val out = db.filterPlan((TimeQuery() >= t("2024-02-01T00:00:00Z")) &
        (TimeQuery() <= t("2024-02-01T01:00:00Z")))
      assert(out.queryExecution.optimizedPlan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
      assert(out.count() == 0)
      // self-contradictory range → empty the same way
      assert(db.search((TimeQuery() >= t("2024-01-05T00:00:00Z")) &
        (TimeQuery() <= t("2024-01-02T00:00:00Z"))).isEmpty)
      // an OR with a non-time side must NOT short-circuit
      assert(db.count((TimeQuery() >= t("2024-02-01T00:00:00Z")) | (TagQuery("u") === "a")) == 1)
      // NOT over a time predicate is conservatively unbounded
      assert(db.count(~(TimeQuery() >= t("2024-02-01T00:00:00Z"))) == 2)
      // in-range queries still scan normally
      assert(db.count(TimeQuery() >= t("2024-01-05T00:00:00Z")) == 1)
      // an in-order append extends the zonemap bounds in place
      db.insert(Point(t("2024-03-01T00:00:00Z"), "m", fields = Map("x" -> 3.0)))
      assert(db.count(TimeQuery() >= t("2024-02-01T00:00:00Z")) == 1)
      db.reindex()
      assert(db.count(TimeQuery() >= t("2024-02-01T00:00:00Z")) == 1)
      // sub-microsecond nanos: the compiled literal floors to micros,
      // so the zonemap must floor too — a raw-Instant comparison would
      // over-prune this query, which still matches the max-time row
      assert(db.count(TimeQuery() >= t("2024-03-01T00:00:00Z").plusNanos(500)) == 1)
    }
  }

  describe("reindex cardinality guard (hot-slot cap, cold tail via maps)") {
    // The reference's dict index tolerates arbitrary key drift
    // (index.py:112-114); the columnarized view must too: above the
    // slot cap only the hottest keys get flat columns and the cold
    // tail compiles through map access, so a schemaless store that
    // drifted to thousands of distinct keys cannot analysis-explode
    // the cached plan.
    it("a 5000-distinct-key store reindexes to a bounded view and stays correct") {
      val db = GraftDB.inMemory(spark)
      val base = t("2024-01-01T00:00:00Z")
      db.insertMultiple((0 until 5000).map { i =>
        Point(base.plusSeconds(i.toLong), "m",
          Map("host" -> s"h${i % 3}"),
          Map(s"k_$i" -> i.toDouble, "hot" -> (i % 10).toDouble))
      })
      db.reindex()
      assert(db.indexComplete.contains(false),
        "5000 keys must exceed the default 256-slot cap")
      val width = db.indexColumnCount.get
      assert(width <= 3 + 2 * GraftDB.DefaultMaxColumnarKeys + 2,
        s"cached view has $width columns — the cap did not hold")
      // hot keys (every row carries them) answer through slots...
      assert(db.count(TagQuery("host") === "h1") == 1667)
      assert(db.count(FieldQuery("hot") === 7.0) == 500)
      // ...cold singleton keys answer through the map fallback
      assert(db.count(FieldQuery("k_123") === 123.0) == 1)
      assert(db.count(FieldQuery("k_123").exists()) == 1)
      assert(db.count(~FieldQuery("k_123").exists()) == 4999)
      // output maps arrive intact through the passthrough projection
      val p = db.get(FieldQuery("k_77") === 77.0).get
      assert(p.fields("k_77") == 77.0 && p.fields("hot") == 7.0
        && p.tags("host") == s"h${77 % 3}")
    }
    it("capped layout: in-order append extends without slot growth; update invalidates") {
      spark.conf.set("graft.index.maxColumnarKeys", "8")
      try {
        val db = GraftDB.inMemory(spark)
        val base = t("2024-01-01T00:00:00Z")
        db.insertMultiple((0 until 60).map { i =>
          Point(base.plusSeconds(i.toLong), "m",
            Map("host" -> s"h${i % 2}"), Map(s"k_$i" -> i.toDouble))
        })
        db.reindex()
        assert(db.indexComplete.contains(false))
        val widthBefore = db.indexColumnCount.get
        // a time-ordered append with a brand-new key extends in place —
        // the new key rides the cold tail, no slot (column) growth
        db.insert(Point(base.plusSeconds(3600L), "m",
          Map("host" -> "h9"), Map("k_new" -> 1.0)))
        assert(db.indexValid, "in-order append must extend, not invalidate")
        assert(db.indexComplete.contains(false))
        assert(db.indexColumnCount.get == widthBefore,
          "cold-tail keys must not grow the capped layout")
        assert(db.count(FieldQuery("k_new") === 1.0) == 1)
        assert(db.count(TagQuery("host") === "h9") == 1)
        assert(db.count(~FieldQuery("k_new").exists()) == 60)
        // a literal update invalidates a capped index (a slot-only
        // patch would leave the retained map columns stale)
        assert(db.update(FieldQuery("k_7") === 7.0, fields = Map("k_7" -> 70.0)) == 1)
        assert(!db.indexValid)
        db.reindex()
        assert(db.count(FieldQuery("k_7") === 70.0) == 1)
        // below the cap the layout stays complete and primitives-only
        val small = freshDb()
        small.reindex()
        assert(small.indexComplete.contains(true))
      } finally spark.conf.unset("graft.index.maxColumnarKeys")
    }
  }

  describe("index observability + prepared queries") {
    it("indexValid tracks the reindex/write lifecycle; prepared plans answer repeatedly") {
      val db = GraftDB.inMemory(spark)
      db.insert(Point(t("2024-01-01T00:00:00Z"), "m", Map("u" -> "a"), Map("x" -> 1.0)))
      assert(!db.indexValid)
      db.reindex()
      assert(db.indexValid)
      val prepared = db.prepare(FieldQuery("x") >= 1.0)
      assert(prepared.count() == 1 && prepared.count() == 1)
      db.insert(Point(t("2024-01-02T00:00:00Z"), "m", Map("u" -> "b"), Map("x" -> 2.0)))
      assert(db.indexValid) // in-order append extended it in place
      assert(db.prepare(FieldQuery("x") >= 1.0).count() == 2)
      db.insert(Point(t("2023-06-01T00:00:00Z"), "m", Map("u" -> "c"), Map("x" -> 3.0)))
      assert(!db.indexValid) // out-of-order write invalidated it
      assert(db.prepare(FieldQuery("x") >= 1.0).count() == 3)
    }
  }

  describe("parquet storage") {
    it("round-trips through a partitioned parquet layout with atomic overwrite") {
      val root = Files.createTempDirectory("graftpq").toString
      val db = GraftDB.atPath(spark, root)
      db.insertMultiple(Seq(
        Point(t("2024-01-01T10:00:00Z"), "a", Map("k" -> "v"), Map("x" -> 1.0)),
        Point(t("2024-01-02T10:00:00Z"), "b", fields = Map("x" -> 2.0))))
      assert(db.length == 2)
      db.insert(Point(t("2024-01-03T10:00:00Z"), "a", fields = Map("x" -> 3.0)))
      assert(db.length == 3)
      // reopen fresh handle on same path
      val db2 = GraftDB.atPath(spark, root)
      assert(db2.count(MeasurementQuery() === "a") == 2)
      // copy-on-write update then remove survive reopen
      db2.update(FieldQuery("x") === 1.0, fields = Map("x" -> 10.0))
      assert(GraftDB.atPath(spark, root).get(FieldQuery("x") === 10.0).isDefined)
      db2.remove(MeasurementQuery() === "b")
      assert(GraftDB.atPath(spark, root).length == 2)
    }

    it("snapshots an append history at a seq watermark, as an isolated branch") {
      val db = GraftDB.inMemory(spark)
      db.insertMultiple(Seq(
        Point(t("2024-01-01T10:00:00Z"), "a", fields = Map("x" -> 1.0)),
        Point(t("2024-01-02T10:00:00Z"), "a", fields = Map("x" -> 2.0))))
      val mark = db.seqWatermark
      db.insert(Point(t("2024-01-03T10:00:00Z"), "b", fields = Map("x" -> 3.0)))
      val snap = db.snapshotAt(mark)
      // the branch sees exactly the pre-append state...
      assert(snap.length == 2 && db.length == 3)
      assert(snap.getMeasurements == Seq("a"))
      // ...and its mutations never reach the origin
      snap.update(FieldQuery("x") === 1.0, fields = Map("x" -> 99.0))
      assert(snap.get(FieldQuery("x") === 99.0).isDefined)
      assert(db.get(FieldQuery("x") === 99.0).isEmpty)
      assert(db.length == 3)
    }
  }
}
