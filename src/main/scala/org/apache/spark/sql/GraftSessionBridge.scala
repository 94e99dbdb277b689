package org.apache.spark.sql

/** Session re-binding for graft's storage layer (the one
  * `private[sql]` doorway this library uses, hence the package).
  *
  * WHY: Spark's parquet write path reads `outputTimestampType` from the
  * session conf of the DataFrame being written
  * (`ParquetUtils.prepareWrite` copies
  * `spark.sql.parquet.outputTimestampType` from the session's SQLConf
  * into the job's Hadoop conf unconditionally — there is no per-write
  * `.option(...)` form). graft's ParquetStorage REQUIRES stats-bearing
  * TIMESTAMP_MICROS files (its whole time-pruning layout contract), but
  * must not mutate the APPLICATION's session encoding even transiently
  * — an application with legacy INT96 consumers writing its own parquet
  * concurrently with a store ingest batch must never observe the
  * store's pin. So the store keeps one dedicated `newSession()` pinned
  * to MICROS and re-binds each outgoing frame to it here: the frame's
  * already-compiled `RDD[InternalRow]` (computed lazily, under ITS OWN
  * session's plan and conf) becomes a `LogicalRDD` on the pinned
  * session, and the write command then resolves its parquet conf from
  * the pinned session. Zero per-row conversion — the InternalRows pass
  * through untouched (`df.rdd` would round-trip every row through
  * external `Row` objects, measured ~2× on map-heavy point batches).
  */
object GraftSessionBridge {
  def rebind(df: DataFrame, to: SparkSession): DataFrame = {
    if (df.sparkSession eq to) df
    else {
      val target = to.asInstanceOf[classic.SparkSession]
      target.internalCreateDataFrame(
        df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd,
        df.schema)
    }
  }
}
