package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed physical layout — the co-located-join tier of the storage
  * story: write both sides of a recurring big join bucketed (and
  * bucket-sorted) on the join key, and every later join between them
  * plans WITHOUT an Exchange on either side — the scan's bucket layout
  * already satisfies the join's required HashPartitioning. At 100 TB
  * this converts the nightly fact⋈fact join from two full shuffles
  * into zero; the write-side cost is paid once per table lifetime,
  * exactly like the IVF persisted layout amortizes its quantizer
  * (`Similarity.ivfPersist`). PlanAuditSpec pins the zero-exchange
  * claim; q103 runs the result under the cross-engine oracle.
  */
object Bucketing {

  /** Write `df` as an EXTERNAL bucketed table (parquet at `path`,
    * registered as `name` so the bucket spec survives in the catalog —
    * Spark only honors bucket layouts through the table catalog, a
    * bare `spark.read.parquet` would rediscover files but not the
    * spec). Buckets are sorted on the key, so bucketed sort-merge
    * joins read presorted runs.
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
      keyCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write.format("parquet")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(name)
  }

  /** Equi-join two co-bucketed tables on their shared bucket key. The
    * `merge` hint pins sort-merge (a broadcast would also be correct
    * but wouldn't exercise the co-located layout); with matching
    * bucket counts on the key, the plan carries NO Exchange below the
    * join.
    */
  def cogroupedJoin(spark: SparkSession, left: String, right: String,
      keyCol: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), keyCol)
}
