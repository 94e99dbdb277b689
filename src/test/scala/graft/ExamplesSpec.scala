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
}
