package graft

import org.apache.spark.sql.SparkSession

import graft.engine.GraftDB
import graft.model.Point
import graft.sources.Tables

/** Scratch probe for the auto-compaction FOLD cost inside sustained
  * micro-batch ingest (the stream_ingest_drain tier's maintenance
  * tick): replays the drain's append cadence with
  * `graft.storage.maintenanceTimings` on, so the batch that trips the
  * delta compaction prints its per-phase breakdown (purge / meta read /
  * listing / read-plan / write job / publish / prune). Not part of the
  * driver contract.
  */
object FoldProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.storage.maintenanceTimings", "true")
    import spark.implicits._

    val pointData = Tables.eventsAsPoints(spark, sfDir)
      .limit(100000).as[Point].collect().toSeq
    val chunks = pointData.grouped(math.max(100, pointData.size / 40)).toSeq
    println(s"PROBE chunks=${chunks.size} rows=${pointData.size}")

    (1 to 2).foreach { round =>
      val dest = java.nio.file.Files.createTempDirectory("probe-fold").toString
      val db = GraftDB.atPath(spark, dest)
      chunks.zipWithIndex.foreach { case (c, i) =>
        val df = spark.createDataset(c).toDF().drop(Point.SeqCol).localCheckpoint(true)
        val t0 = System.nanoTime()
        db.insertDF(df)
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt > 0.15) println(f"PROBE round$round batch$i%3d ${dt}%.3f s  <- fold tick")
      }
      db.close()
    }
    spark.stop()
  }
}
