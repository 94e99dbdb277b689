package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.examples.Examples
import graft.model.Point

/** Smoke-runs the four reference example programs end-to-end against
  * the driver testdata — the migration story executed, not just
  * documented.
  */
class ExamplesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  it("examples 1+2: load external data, then run the analytics workflow in-engine") {
    val db = Examples.loading(spark, sf, Files.createTempDirectory("graftex").toString)
    assert(db.length == 501)
    val (measurements, unhealthy, daily, smoothed) = Examples.analytics(db)
    assert(measurements.sorted == Seq("aqi", "locations"))
    assert(unhealthy > 0)
    assert(daily.count() > 0 && smoothed.count() == 500)
  }

  it("example 3: continuous IoT ingest through a checkpointed stream") {
    val mem = MemoryStream[(Timestamp, Double)](spark)
    val stream = mem.toDF().toDF("time", "temp").select(
      col("time"),
      lit("sensor").as(Point.MeasurementCol),
      map(lit("device"), lit("t1")).as(Point.TagsCol),
      map(lit("temp"), col("temp")).as(Point.FieldsCol))
    val db = graft.engine.GraftDB.inMemory(spark)
    val q = Examples.iotIngest(spark, stream,
      db, Files.createTempDirectory("graftexckpt").toString)
    try {
      mem.addData((Timestamp.from(Instant.parse("2024-01-01T00:00:00Z")), 70.1))
      mem.addData((Timestamp.from(Instant.parse("2024-01-01T00:00:05Z")), 70.7))
      q.processAllAvailable()
      assert(db.length == 2)
    } finally q.stop()
  }

  it("example 4: incremental backup exports only points since the watermark") {
    val db = Examples.loading(spark, sf, Files.createTempDirectory("graftex4").toString)
    val out = Files.createTempFile("graftbackup", ".csv").toString
    val all = Examples.incrementalBackup(db, Instant.EPOCH, out)
    assert(all == 501)
    // reference engine must be able to read its own format back
    assert(graft.sources.ReferenceCsv.read(spark, out).count() == 501)
    // advancing the watermark past the data exports nothing new
    assert(Examples.incrementalBackup(db, Instant.parse("2030-01-01T00:00:00Z"), out) == 0)
  }

  it("example 5: the curation pipeline narrows monotonically and packs the selection") {
    val (packed, counts) = Examples.curationPipeline(spark, sf, tokenBudget = 5000L)
    val byStage = counts.toMap
    assert(byStage("corpus") >= byStage("exact_dedup"))
    assert(byStage("exact_dedup") >= byStage("near_dedup"))
    assert(byStage("near_dedup") >= byStage("quality"))
    assert(byStage("quality") >= byStage("budget"))
    assert(byStage("budget") > 0)
    // every selected doc landed in exactly one chunk
    assert(packed.count() == byStage("budget"))
    assert(packed.select("chunk_id").distinct().count() >= 1)
  }

  it("example 6: the video pipeline dedups reposted clips and survives corrupt assets") {
    import graft.multimodal.Multimodal
    val clipA = Multimodal.encodeMjpegAvi(10, Seq(10, 12, 90, 91, 20, 22))
    val clipB = Multimodal.encodeMjpegAvi(25, Seq(200, 201, 50))
    val assets = Seq(
      (1L, clipA),
      (2L, clipA),                  // repost of clip 1 — dedups away
      (3L, clipB),
      (4L, "junk".getBytes("UTF-8")) // corrupt — flagged, not fatal
    ).toDF("asset_id", "payload")
    val (kept, counts) = Examples.videoPipeline(spark, assets, cutThreshold = 50)
    val byStage = counts.toMap
    assert(byStage("assets") == 4)
    assert(byStage("decoded_frames") == 15) // 6 + 6 + 3
    assert(byStage("corrupt_assets") == 1)
    // scenes: clipA has cuts at idx 2 and 4 (3 scenes x 2 copies),
    // clipB at idx 2 (2 scenes) -> 8 representatives
    assert(byStage("scene_representatives") == 8)
    // the reposted clip's 3 representatives share lumas with the
    // original's -> 5 distinct survive
    assert(byStage("deduped_frames") == 5)
    // survivors are the FIRST occurrence: all of asset 1's reps stay
    assert(kept.filter(col("asset_id") === 1L).count() == 3)
    assert(kept.filter(col("asset_id") === 2L).count() == 0)
  }

  it("MIGRATION.md snippets execute as written (doc-driven, no API gaps)") {
    import graft.engine.GraftDB
    import graft.query._
    val t0 = Instant.parse("2024-01-01T00:00:00Z")
    val db = GraftDB.inMemory(spark)
    // "Insert" section
    assert(db.insert(Point(Instant.parse("2024-01-02T00:00:00Z"), "temperature",
      Map("sensor" -> "living_room", "unit" -> "celsius"),
      Map("value" -> 23.2))) == 1)
    val points = Seq(
      Point(Instant.parse("2024-01-03T00:00:00Z"), "temperature",
        Map("sensor" -> "bedroom"), Map("value" -> 26.0)),
      Point(Instant.parse("2024-01-04T00:00:00Z"), "temperature",
        Map("sensor" -> "living_room"), Map("value" -> 19.5)))
    assert(db.insertMultiple(points) == points.size)
    db.insert(Point.local(java.time.LocalDateTime.of(2024, 1, 1, 12, 30, 0),
      "temperature", fields = Map("value" -> 23.2)))
    // "Query DSL" section — each form as documented
    val q1 = (TimeQuery() >= t0) & (TagQuery("sensor") === "living_room") &
      (FieldQuery("value") > 20)
    assert(db.count(q1) == 1)
    val q2 = ~(TagQuery("unit") === "celsius") // true when the tag is missing
    assert(db.count(q2) == 3)
    assert(db.count(TagQuery("sensor").matches("living.*", flags = "i")) == 2)
    assert(db.count(FieldQuery("value").test(v => v > 20)) == 3)
    assert(db.count((FieldQuery("value").map(v => v * 9 / 5 + 32) > 70)) == 3)
    // "Read ops" section
    assert(db.all().size == 4 && db.length == 4)
    assert(db.search(q1).size == 1)
    assert(db.get(q1).isDefined && db.contains(q1))
    assert(db.selectDF(Seq("time", "tags.sensor", "fields.value"), Noop).count() == 4)
    assert(db.getMeasurements == Seq("temperature"))
    assert(db.getFieldKeys() == Seq("value"))
    assert(db.getTagValues(Seq("sensor")).apply("sensor").contains("bedroom"))
    assert(db.getFieldValues("value").size == 4)
    assert(db.getTimestamps().size == 4)
    // "Mutations" section
    assert(db.update(TagQuery("sensor") === "bedroom",
      tags = Map("unit" -> "F"), fields = Map("value" -> 0.0)) == 1)
    assert(db.updateWith(TagQuery("sensor") === "bedroom", fields = Some(f =>
      transform_values(f, (k, v) => when(k === "value", v * 2).otherwise(v)))) == 0)
    db.updateAll(tags = Map("seen" -> "y"))
    assert(db.count(TagQuery("seen") === "y") == 4)
    assert(db.remove(FieldQuery("value") === 0.0) == 1)
    // "Measurements" section
    val m = db.measurement("temperature")
    assert(m.length == 3 && m.iterator.hasNext)
    assert(m.search(FieldQuery("value") > 20).nonEmpty)
    // "Index" section
    db.reindex()
    assert(db.count(TagQuery("sensor") === "living_room") == 2)
    // "Export back to the reference" + snapshot sections
    val out = Files.createTempFile("graftmig", ".csv").toString
    graft.sources.ReferenceCsv.writeFile(db.df, out)
    assert(GraftDB.atCsv(spark, out, readOnly = true).length == 3)
    val mark = db.seqWatermark
    db.insert(Point(Instant.parse("2024-02-01T00:00:00Z"), "temperature",
      Map(), Map("value" -> 1.0)))
    assert(db.snapshotAt(mark).length == 3 && db.length == 4)
  }

  it("example 7: broker-shaped topic drains with exactly-once appends") {
    import graft.streaming.GraftLogProducer
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val topic = tmp("ex7topic")
    val producer = new GraftLogProducer(topic)
    (0 until 4).foreach(s => producer.publish((s * 250 until (s + 1) * 250).map(_.toString)))
    val db = Examples.brokerPipeline(spark, topic, tmp("ex7db"), tmp("ex7ckpt"),
      maxPerTrigger = 300L)
    assert(db.length == 1000L)
    // closed-form content: field v = value % 90, sensor s(v % 5)
    assert(db.count(graft.query.TagQuery("sensor") === "s0") == 200L)
    assert(db.count(graft.query.FieldQuery("v") === 89.0) ==
      (0 until 1000).count(_ % 90 == 89))
  }

  it("example 8: the ANN lifecycle trains once, appends, serves from disk, and rerank dominates") {
    graft.util.Scratch.withDir("ex8specidx") { idx =>
      val (corpusN, shortN, refined) = Examples.annServing(
        spark, "/root/testdata/sf0.001", idx)
      assert(corpusN === 500L)
      // 3 queries × R=50 shortlist (probed lists hold enough candidates)
      assert(shortN === 150L)
      val rows = refined.select("qid", "id", "rank").collect()
      assert(rows.length === 30)          // 3 queries × top-10
      // the refined ranks are exact-cosine order — rank 1 of a query
      // that is ITS OWN corpus member must be itself
      val self = rows.filter(r => r.getInt(2) == 1).map(r => (r.getLong(0), r.getLong(1)))
      assert(self.forall { case (q, id) => q == id })
    }
  }

  it("example 9: the retention tick expires exactly the pre-watermark points") {
    val db = Examples.loading(spark, sf, graft.util.Scratch.dir("ex9db"))
    val watermark = Instant.parse("2024-01-15T00:00:00Z")
    val expected = db.count(graft.query.TimeQuery() < watermark)
    assert(expected > 0L, "fixture should hold pre-watermark points")
    val (before, removed, after) = Examples.retentionTick(db, watermark)
    assert(removed === expected && after === before - removed)
    assert(db.count(graft.query.TimeQuery() < watermark) === 0L)
    assert(db.count(graft.query.TimeQuery() >= watermark) === after)
  }
}
