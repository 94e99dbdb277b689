package graft

import org.apache.spark.sql.functions._

/** Measures the PQ/ADC compression-vs-recall trade behind the
  * BENCH_NOTES table: exact-top-10 recall of `Similarity.pqTopK`
  * against `bruteForceTopK` across subspace splits (m × subDim), on
  * the sf0.001 embeddings with label-derived codebooks. Scratch
  * measurement main, same role as QueryProbe/StreamProbe.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding"))
    val exact = graft.analytics.Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "qid", 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
    for ((m, sd) <- Seq((4, 16), (8, 8), (16, 4), (32, 2))) {
      val cb = graft.analytics.Similarity.pqCodebooks(e, "label", "embedding", m, sd)
      val pq = graft.analytics.Similarity.pqTopK(e, q, cb, "vec_id", "embedding", "qid", 10, m, sd)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
      println(s"PQPROBE m=$m subDim=$sd recall=${(pq intersect exact).size.toDouble / exact.size}")
    }
    spark.stop()
  }
}
