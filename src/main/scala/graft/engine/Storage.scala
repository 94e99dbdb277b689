package graft.engine

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Point

/** Storage backend contract (reference: the `Storage` ABC,
  * tinyflux/storages.py:56-167). The engine is append-optimized;
  * mutation is copy-on-write: build the full new state, then commit it
  * atomically — the exact analogue of the reference's temp-file swap
  * (storages.py:383-400).
  *
  * All backends speak the canonical Point schema ([[Point.schema]])
  * including the `_seq` insertion-order column.
  */
trait Storage {
  def spark: SparkSession

  /** Current state as a DataFrame in canonical Point schema. */
  def load(): DataFrame

  /** Append a batch (canonical schema WITHOUT `_seq`; seq is assigned
    * here so insertion order is a storage-level guarantee).
    */
  def append(batch: DataFrame): Unit

  /** Replace the full state (canonical schema WITH `_seq`). */
  def overwrite(full: DataFrame): Unit

  /** Assign `_seq` above the current maximum without a global sort:
    * `monotonically_increasing_id` is (partitionId << 33 | row-offset),
    * so ordering by it preserves input order across partitions with no
    * shuffle — the scale-safe way to carry insertion order.
    */
  protected def withSeq(batch: DataFrame, base: Long): DataFrame =
    batch.withColumn(Point.SeqCol, lit(base + 1) + monotonically_increasing_id())

  protected def currentMaxSeq(): Long = {
    val df = load()
    if (df.isEmpty) -1L
    else df.agg(max(Point.SeqCol)).head.getLong(0)
  }
}

/** In-memory backend (reference: MemoryStorage, storages.py:436-558).
  * State is a cached DataFrame; `localCheckpoint` truncates lineage so
  * long insert sequences don't grow the plan unboundedly.
  */
final class MemoryStorage(val spark: SparkSession, initial: Option[DataFrame] = None) extends Storage {
  private var state: DataFrame =
    initial.getOrElse(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Point.schema))

  override def load(): DataFrame = state

  override def append(batch: DataFrame): Unit = synchronized {
    val next = state.unionByName(withSeq(batch, currentMaxSeq()))
    state = next.localCheckpoint(eager = true)
  }

  override def overwrite(full: DataFrame): Unit = synchronized {
    state = full.select(Point.columns.map(col): _*).localCheckpoint(eager = true)
  }
}

/** Parquet-backed persistent storage (replaces the reference's
  * CSVStorage, storages.py:170-433, with a columnar, partitioned,
  * stats-bearing layout).
  *
  * Layout: `root/data/measurement=<m>/p_date=<yyyy-MM-dd>/` parquet files,
  * files time-sorted within partitions so Parquet row-group min/max
  * stats answer time-range predicates — the scalable replacement for
  * the reference's sorted-timestamp index (index.py:719-821).
  *
  * Commit protocol for mutation: write the new state to a staging dir,
  * then swap directories — same contract as the reference's
  * `_swap_temp_with_primary` (storages.py:383-400).
  */
final class ParquetStorage(val spark: SparkSession, root: String, partitioned: Boolean = true)
    extends Storage {

  private val dataPath = s"$root/data"
  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists: Boolean = fs.exists(new Path(dataPath))

  // `_seq` high-water mark, scanned once per handle then maintained
  // incrementally so appends don't re-aggregate the whole table.
  private var seqHighWater: Long = Long.MinValue
  private def maxSeqCached(): Long = {
    if (seqHighWater == Long.MinValue) seqHighWater = currentMaxSeq()
    seqHighWater
  }

  override def load(): DataFrame =
    if (!exists) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Point.schema)
    else spark.read.parquet(dataPath).select(Point.columns.map(col): _*)

  private def write(df: DataFrame, path: String, mode: SaveMode): Unit = {
    val w = df
      .withColumn("p_date", to_date(col(Point.TimeCol)))
      .sortWithinPartitions(Point.TimeCol)
      .write.mode(mode)
    (if (partitioned) w.partitionBy(Point.MeasurementCol, "p_date") else w).parquet(path)
  }

  override def append(batch: DataFrame): Unit = synchronized {
    val base = maxSeqCached()
    val withIds = withSeq(batch, base).cache()
    write(withIds, dataPath, SaveMode.Append)
    seqHighWater = withIds.agg(max(Point.SeqCol)).head.getLong(0)
    withIds.unpersist()
  }

  override def overwrite(full: DataFrame): Unit = synchronized {
    val staging = s"$root/.staging-${UUID.randomUUID()}"
    // Materialize BEFORE touching the primary: `full` may read from it.
    write(full.select(Point.columns.map(col): _*), staging, SaveMode.Overwrite)
    val dst = new Path(dataPath)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(new Path(staging), dst)
    seqHighWater = Long.MinValue // rewrite may have changed the set
  }
}
