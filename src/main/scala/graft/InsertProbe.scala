package graft

import org.apache.spark.sql.SparkSession

import graft.engine.GraftDB
import graft.sources.Tables

/** Scratch phase-breakdown probe for the Bench insert metrics (not part
  * of the driver contract): times each sub-phase of the three insert
  * paths so optimization targets the real cost, not a guess.
  */
object InsertProbe {
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
    import org.apache.spark.sql.functions.col
    import graft.model.Point

    val pts = Tables.eventsAsPoints(spark, sfDir).coalesce(8).cache()
    pts.count()
    val batch = pts.limit(10000).drop("_seq").cache()
    batch.count()

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name $s%.4f"); s
    }

    // warm all writer paths
    val warmDir = java.nio.file.Files.createTempDirectory("probe-warm").toString
    GraftDB.atPath(spark, warmDir).insertDF(batch)
    val warmCsv = java.nio.file.Files.createTempFile("probe-warm", ".csv")
    GraftDB.atCsv(spark, warmCsv.toString).insertDF(batch)
    GraftDB.inMemory(spark).insertDF(batch)

    (1 to 3).foreach { i =>
      println(s"--- round $i ---")
      // memory phases
      val mem = GraftDB.inMemory(spark)
      time("mem.insertDF")(mem.insertDF(batch))
      time("mem.df")(mem.df: Unit)

      // parquet phases
      val root = java.nio.file.Files.createTempDirectory("probe-pq").toString
      val pq = GraftDB.atPath(spark, root)
      time("pq.insertDF.total")(pq.insertDF(batch))
      // piecewise: plan assembly vs write job
      val root2 = java.nio.file.Files.createTempDirectory("probe-pq2").toString
      time("pq.planOnly") {
        val b2 = batch.coalesce(1)
          .withColumn(Point.SeqCol, org.apache.spark.sql.functions
            .monotonically_increasing_id())
          .sortWithinPartitions(Point.TimeCol)
        b2.queryExecution.executedPlan: Unit
      }
      time("pq.rawWrite.snappy") {
        batch.coalesce(1)
          .withColumn(Point.SeqCol, org.apache.spark.sql.functions
            .monotonically_increasing_id())
          .sortWithinPartitions(Point.TimeCol)
          .write.option("compression", "snappy").parquet(s"$root2/delta")
      }
      val root3 = java.nio.file.Files.createTempDirectory("probe-pq3").toString
      time("pq.rawWrite.nosort") {
        batch.coalesce(1)
          .withColumn(Point.SeqCol, org.apache.spark.sql.functions
            .monotonically_increasing_id())
          .write.option("compression", "snappy").parquet(s"$root3/delta")
      }
      val root4 = java.nio.file.Files.createTempDirectory("probe-pq4").toString
      time("pq.rawWrite.uncompressed") {
        batch.coalesce(1)
          .withColumn(Point.SeqCol, org.apache.spark.sql.functions
            .monotonically_increasing_id())
          .sortWithinPartitions(Point.TimeCol)
          .write.option("compression", "none").parquet(s"$root4/delta")
      }

      // csv phases
      val csvPath = java.nio.file.Files.createTempFile("probe-csv", ".csv")
      val cdb = GraftDB.atCsv(spark, csvPath.toString)
      time("csv.insertDF.total")(cdb.insertDF(batch))
      time("csv.toLines.count") {
        graft.sources.ReferenceCsv.toLines(
          batch.withColumn(Point.SeqCol, org.apache.spark.sql.functions
            .monotonically_increasing_id()))
          .coalesce(1).count(): Unit
      }
      time("csv.collectLines") {
        graft.sources.ReferenceCsv.toLines(
          batch.withColumn(Point.SeqCol, org.apache.spark.sql.functions
            .monotonically_increasing_id()))
          .coalesce(1).collect(): Unit
      }
      // how much does fsync cost?
      val csvPath2 = java.nio.file.Files.createTempFile("probe-csv2", ".csv")
      val cdb2 = GraftDB.atCsv(spark, csvPath2.toString, flushOnInsert = false)
      time("csv.insertDF.noflush")(cdb2.insertDF(batch))
      spark.sql(s"select 1").collect() // keepalive noop
    }
    spark.stop()
  }
}
