package graft

import org.apache.spark.sql.SparkSession

import graft.engine.GraftDB
import graft.model.Point
import graft.sources.Tables

/** Scratch phase-breakdown probe for the Bench streaming-ingest metric
  * (not part of the driver contract): separates micro-batch ENGINE cost
  * (trigger planning, state, sink commit) from STORAGE append cost by
  * timing (a) the real StreamingIngest drain, (b) a tight loop of
  * direct insertDF calls over the same chunking, and (c) per-batch
  * wall times inside both.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.storage.maintenanceTimings", "true")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val pointData = Tables.eventsAsPoints(spark, sfDir)
      .limit(100000).as[Point].collect().toSeq
    val nChunks = sys.env.getOrElse("SPARK_GRAFT_PROBE_CHUNKS", "20").toInt
    val chunks = pointData.grouped(math.max(100, pointData.size / nChunks)).toSeq
    println(s"PROBE chunks=${chunks.size} rows=${pointData.size}")

    // (b) direct insertDF loop — storage cost only, no streaming engine
    (1 to 2).foreach { round =>
      val dest = java.nio.file.Files.createTempDirectory("probe-direct").toString
      val db = GraftDB.atPath(spark, dest)
      db.insertDF(spark.createDataset(chunks.head).toDF().drop(Point.SeqCol)
        .localCheckpoint(true)) // warm
      val t0 = System.nanoTime()
      chunks.tail.foreach { c =>
        val b0 = System.nanoTime()
        val df = spark.createDataset(c).toDF().drop(Point.SeqCol).localCheckpoint(true)
        val b1 = System.nanoTime()
        db.insertDF(df)
        val b2 = System.nanoTime()
        System.err.println(f"PROBE direct batch stage=${(b1 - b0) / 1e9}%.3f append=${(b2 - b1) / 1e9}%.3f")
      }
      val total = (System.nanoTime() - t0) / 1e9
      val rows = pointData.size - chunks.head.size
      println(f"PROBE direct_round$round $total%.3f s rate=${rows / total}%.0f rows/s")
    }

    // (a) the real streaming drain, exactly as Bench runs it.
    // SPARK_GRAFT_PROBE_PIN_MICROS re-applies the OLD session-wide
    // TIMESTAMP_MICROS pin (pre-r13 behavior) for A/B timing of the
    // scoped per-write pin — it does NOT select INT96.
    if (sys.env.contains("SPARK_GRAFT_PROBE_PIN_MICROS"))
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    (1 to 2).foreach { round =>
      val src = MemoryStream[Point](spark)
      val stream = src.toDS().toDF().drop(Point.SeqCol)
      val ckpt = java.nio.file.Files.createTempDirectory("probe-ckpt").toString
      val dest = java.nio.file.Files.createTempDirectory("probe-stream").toString
      val sdb = GraftDB.atPath(spark, dest)
      // StreamingIngest.start's exact graph, instrumented per batch:
      // checkpoint vs append vs (total − sum) = engine overhead
      val q = stream.withWatermark(Point.TimeCol, "10 minutes").writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val b0 = System.nanoTime()
          val ck = batch.localCheckpoint(true)
          val b1 = System.nanoTime()
          sdb.insertDF(ck)
          val b2 = System.nanoTime()
          System.err.println(
            f"PROBE drain batch ck=${(b1 - b0) / 1e9}%.3f append=${(b2 - b1) / 1e9}%.3f")
        }
        .start()
      src.addData(chunks.head)
      q.processAllAvailable()
      val t0 = System.nanoTime()
      chunks.tail.foreach(src.addData(_))
      q.processAllAvailable()
      val total = (System.nanoTime() - t0) / 1e9
      q.stop()
      val rows = pointData.size - chunks.head.size
      println(f"PROBE stream_round$round $total%.3f s rate=${rows / total}%.0f rows/s")
    }
    spark.stop()
  }
}
