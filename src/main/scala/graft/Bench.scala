package graft

import org.apache.spark.sql.SparkSession

import graft.engine.GraftDB
import graft.query._
import graft.sources.Tables

/** Benchmark main. Mirrors the reference's own benchmark shapes
  * (reference: performance_tests/benchmark.py:303-316 — tag-equality
  * lookup, 1-range time query, ~50% field filter, complex compound)
  * against the events table mapped to Points, plus the headline
  * analytics operators, at SPARK_GRAFT_SF_DIR scale.
  *
  * Point queries run over an in-memory cached DataFrame (the analogue
  * of the reference's MemoryStorage + valid index) and are timed as
  * repeat-averages because per-query time at this scale is dominated
  * by fixed planning overhead that amortizes in any real workload.
  * Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":"..."}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    def timeAvg(name: String, reps: Int)(f: => Unit): Unit = {
      f // warm (fills caches, compiles codegen)
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      results(name) = (System.nanoTime() - t0) / 1e9 / reps
    }
    def timeOnce(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      results(name) = (System.nanoTime() - t0) / 1e9
    }

    // ---- reference-parity point queries (cached memory "storage") ----
    // Few fat cached partitions: per-task overhead dominates sub-second
    // queries, and cached-batch min/max stats still prune within them.
    val pts = Tables.eventsAsPoints(spark, sfDir).coalesce(8).cache()
    pts.count() // materialize the cache = the reference's index build
    val db = GraftDB.fromDataFrame(pts)
    // AQE re-plans add fixed stages that cost more than they save on
    // point queries over cached data; re-enabled for the analytics set.
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    val t1 = java.time.Instant.parse("2024-01-10T00:00:00Z")
    val t2 = java.time.Instant.parse("2024-01-10T01:00:00Z")

    timeAvg("point_lookup_tag_eq", 10) {
      db.search(TagQuery("user") === "7")
    }
    timeAvg("time_range_1h", 10) {
      db.search((TimeQuery() >= t1) & (TimeQuery() <= t2))
    }
    timeAvg("field_filter_half", 10) {
      db.search(FieldQuery("value") >= 100.0)
    }
    timeAvg("complex_2field_tag", 10) {
      db.search((FieldQuery("value") >= 50.0) & (FieldQuery("value") <= 150.0) &
        (TagQuery("user") === "3"))
    }
    timeAvg("count_filtered", 10) {
      db.count(FieldQuery("value") >= 100.0)
    }

    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // ---- ingest throughput (batch insert into the memory backend) ----
    {
      val batch = pts.limit(10000).drop("_seq")
      val mem = GraftDB.inMemory(spark)
      timeOnce("insert_10k_memory") { mem.insertDF(batch) }
      val tmp = java.nio.file.Files.createTempDirectory("graftbench").toString
      val pq = GraftDB.atPath(spark, tmp)
      timeOnce("insert_10k_parquet") { pq.insertDF(batch) }
    }

    // ---- headline analytics at scale ----
    def run(name: String): Unit =
      timeOnce(name) { SparkEntry.queries(name)(spark, sfDir).count(): Unit }

    Seq(
      "q30_agg_pricing", "q32_join_multiway", "q33_window_rank", "q34_topk",
      "q40_window_tumbling", "q41_asof_join",
      "q50_dedup_exact", "q57_minhash_pairs", "q58_embedding_near_dup", "q59_ann_topk"
    ).foreach(run)

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.6f" }.mkString("{", ",", "}")
    val total = results.values.sum
    println(f"""{"metric":"total","value":$total%.6f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
