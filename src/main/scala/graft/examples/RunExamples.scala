package graft.examples

import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Point
import graft.streaming.{GraftLog, GraftLogProducer}

/** The README quickstart: runs examples 1–8 end-to-end in one JVM.
  *
  *   sbt "runMain graft.examples.RunExamples"            # sf0.001
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.examples.RunExamples"
  *
  * One line of output per example — what the reference's example
  * programs print, produced by this engine's public API. All scratch
  * state is released before exit.
  */
object RunExamples {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mark = graft.util.Scratch.marker()

    // 1: build a database from external tabular data
    val db = Examples.loading(spark, sfDir, graft.util.Scratch.dir("ex1db"))
    println(s"[example 1] loaded ${db.length} points into " +
      s"${db.getMeasurements.mkString("/")} measurements")

    // 2: the analytics workflow, in-engine
    val (measurements, unhealthy, daily, smoothed) = Examples.analytics(db)
    println(s"[example 2] measurements=$measurements unhealthyWindows=$unhealthy " +
      s"dailyRollupRows=${daily.count()} movingAvgRows=${smoothed.count()}")

    // 3: continuous ingest (a rate stream standing in for the MQTT feed)
    val iotDb = graft.engine.GraftDB.inMemory(spark)
    graft.streaming.StreamingIngest.ingestRate(spark, iotDb,
      rowsPerBatch = 500, totalRows = 2000L, graft.util.Scratch.dir("ex3ckpt"))
    println(s"[example 3] streamed ${iotDb.length} points through checkpointed ingest")

    // 4: incremental backup since a watermark, in the reference's format
    val backupFile = graft.util.Scratch.dir("ex4") + "/backup.csv"
    val n = Examples.incrementalBackup(db, Instant.parse("2024-01-15T00:00:00Z"), backupFile)
    println(s"[example 4] backed up $n points newer than the watermark to reference CSV")

    // 5: the LLM training-data curation pipeline
    val (packed, counts) = Examples.curationPipeline(spark, sfDir)
    println(s"[example 5] curation funnel ${counts.map { case (k, v) => s"$k=$v" }
      .mkString(" -> ")} chunks=${packed.select("chunk_id").distinct().count()}")

    // 6: the video curation pipeline over synthetic MJPEG-in-AVI assets
    // (a clip, its repost, and a corrupt container)
    import spark.implicits._
    val clipA = graft.multimodal.Multimodal.encodeMjpegAvi(10, Seq(10, 12, 90, 91, 20, 22))
    val clipB = graft.multimodal.Multimodal.encodeMjpegAvi(25, Seq(200, 201, 50))
    val assets = Seq((1L, clipA), (2L, clipA), (3L, clipB),
      (4L, "junk".getBytes("UTF-8"))).toDF("asset_id", "payload")
    val (kept, vcounts) = Examples.videoPipeline(spark, assets)
    println(s"[example 6] video funnel ${vcounts.map { case (k, v) => s"$k=$v" }
      .mkString(" -> ")} keptFrames=${kept.count()}")

    // 7: broker-shaped topic (graft-log) drained with exactly-once appends,
    // across a PARTITIONED 3-producer topic — each producer re-publishes
    // an overlapping slice (at-least-once upstream, the MQTT reality)
    // and per-partition LOG COMPACTION dedups each sub-log before the
    // drain, so the store converges to exactly one point per value
    val topic = graft.util.Scratch.dir("ex7topic")
    (0 until 3).foreach { p =>
      val prod = new GraftLogProducer(GraftLog.partitionDir(topic, p))
      val vs = (0 until 900).filter(_ % 3 == p).map(_.toString)
      prod.publish(vs.take(200))
      prod.publish(vs.drop(150)) // 50 values re-delivered
      ()
    }
    val compacted = GraftLog.compactPartitions(topic,
      spark.sparkContext.hadoopConfiguration)
    val brokerDb = graft.engine.GraftDB.atPath(spark, graft.util.Scratch.dir("ex7db"))
    graft.streaming.StreamingIngest.drainPartitionedLog(spark, brokerDb, topic,
      maxRecordsPerTrigger = 400L, graft.util.Scratch.dir("ex7ckpt"))
    println(s"[example 7] compacted $compacted re-delivered records, drained " +
      s"${brokerDb.length} from a 3-partition topic, exactly once")

    // 8: the ANN serving lifecycle — train once on a sample, persist the
    // index, append the rest with frozen quantizers, serve from disk,
    // exact-rerank the shortlist
    val (corpusN, shortN, refined) = Examples.annServing(
      spark, sfDir, graft.util.Scratch.dir("ex8idx"))
    println(s"[example 8] ANN lifecycle corpus=$corpusN -> shortlist=$shortN " +
      s"-> refined top-10 rows=${refined.count()}")

    // 9: the retention-policy tick — expire pre-watermark points as a
    // layout operation (partition/footer drops, not a store rewrite)
    val (before9, removed9, after9) = Examples.retentionTick(
      db, Instant.parse("2024-01-15T00:00:00Z"))
    println(s"[example 9] retention expired $removed9 of $before9 points " +
      s"older than the watermark; $after9 remain")

    graft.util.Scratch.releaseSince(mark)
    spark.stop()
  }
}
