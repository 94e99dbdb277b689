package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (round 18, not part of the driver contract): what
  * `optimizedPlan.stats.sizeInBytes` — the estimate that routes
  * [[graft.engine.Storage]] appends between the coordinator WAL path
  * and the distributed write — reports for the batch shapes the
  * engine actually sees: a cached Dataset, a fresh createDataset, and
  * a `localCheckpoint(true)` (the streaming foreachBatch shape).
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.model.Point
    import graft.sources.Tables

    val pts = Tables.eventsAsPoints(spark, sfDir).limit(5000)
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val st = df.queryExecution.optimizedPlan.stats
      println(s"STATS $name sizeInBytes=${st.sizeInBytes} rowCount=${st.rowCount} " +
        s"partitions=${df.rdd.getNumPartitions}")
    }
    show("plain limit(5000) scan", pts.drop(Point.SeqCol))
    val collected = pts.as[Point].collect().toSeq
    show("createDataset(5000)", spark.createDataset(collected).toDF().drop(Point.SeqCol))
    show("localCheckpoint(5000)",
      spark.createDataset(collected).toDF().drop(Point.SeqCol).localCheckpoint(true))
    val cached = spark.createDataset(collected).toDF().drop(Point.SeqCol).cache()
    cached.count()
    show("cached(5000)", cached)
    spark.stop()
  }
}
