package graft.engine

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Point

/** JSON-lines storage — the interchange tier. LLM-data pipelines speak
  * sharded JSONL; this backend lets a GraftDB live directly on a
  * directory of it: every engine operator works over the files, appends
  * land as new shards, and any external tool can read or produce the
  * data with a line-oriented JSON parser.
  *
  * Line format (one object per point):
  * {{{ {"t_us":1672531200000000,"m":"cpu","tags":{"host":"a"},
  *      "fields":{"v":1.5},"_seq":35184372088832} }}}
  *
  * Design choices, deliberately different from the CSV compat tier
  * (`CsvStorage` mirrors the reference's single-file format and python
  * open() semantics, storages.py:170-433):
  *   - `t_us` is epoch MICROSECONDS — the library's cross-engine time
  *     currency — not an ISO string: integer round-trip is exact under
  *     every JSON parser, immune to format/zone dialects.
  *   - `_seq` is STORED, not derived from line order: shards have no
  *     global order, so insertion order must travel with the data (the
  *     same reason ParquetStorage stamps it at append).
  *   - A directory of shards, not one file: appends are distributed
  *     writes of new part files — no read-modify-write, full scan
  *     parallelism at any size.
  *
  * Mutation commit reuses the staging + backup-rename protocol
  * (reference `_swap_temp_with_primary`, storages.py:383-400, hardened
  * as in ParquetStorage): crash mid-swap leaves the old state
  * recoverable; [[recover]] runs at handle open.
  */
final class JsonlStorage(val spark: SparkSession, root: String) extends Storage {

  private val dataPath = s"$root/data"
  private val backupPath = s"$root/.backup-data"
  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  recover()

  private def exists(p: String): Boolean = fs.exists(new Path(p))
  override protected def knownEmpty: Boolean = !exists(dataPath)

  private def renameOrThrow(src: String, dst: String): Unit =
    if (!fs.rename(new Path(src), new Path(dst)))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
  private def deleteOrThrow(p: String): Unit =
    if (exists(p) && !fs.delete(new Path(p), true))
      throw new java.io.IOException(s"delete failed: $p")

  private def recover(): Unit = {
    if (!exists(dataPath) && exists(backupPath)) renameOrThrow(backupPath, dataPath)
    deleteOrThrow(backupPath)
    if (exists(root))
      fs.listStatus(new Path(root))
        .filter(_.getPath.getName.startsWith(".staging-"))
        .foreach(s => fs.delete(s.getPath, true))
  }

  override def load(): DataFrame =
    if (knownEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Point.schema)
    else
      spark.read.schema(JsonlStorage.wireSchema).json(dataPath)
        .select(
          timestamp_micros(col("t_us")).as(Point.TimeCol),
          col("m").as(Point.MeasurementCol),
          // absent keys in a line mean empty maps, not nulls — the
          // canonical schema declares both maps non-nullable
          coalesce(col("tags"), map().cast("map<string,string>")).as(Point.TagsCol),
          coalesce(col("fields"), map().cast("map<string,double>")).as(Point.FieldsCol),
          col(Point.SeqCol))

  override def append(batch: DataFrame): Unit = { appendDelta(batch); () }

  override def appendDelta(batch: DataFrame, compactPrefixes: Option[Boolean]): Option[DataFrame] =
    synchronized {
      val stamped = withSeq(batch)
      toWire(stamped).write.mode(SaveMode.Append).json(dataPath)
      // same plan, same source partitioning → the mono-id _seq values
      // reproduce on re-evaluation (the ParquetStorage contract)
      Some(stamped)
    }

  private def toWire(df: DataFrame): DataFrame =
    df.select(
      unix_micros(col(Point.TimeCol)).as("t_us"),
      col(Point.MeasurementCol).as("m"),
      col(Point.TagsCol).as("tags"),
      col(Point.FieldsCol).as("fields"),
      col(Point.SeqCol))

  override def overwrite(full: DataFrame): Unit = synchronized {
    val staging = s"$root/.staging-${UUID.randomUUID()}"
    // materialize BEFORE touching the primary: `full` may read from it
    toWire(full.select(Point.columns.map(col): _*))
      .write.mode(SaveMode.Overwrite).json(staging)
    if (exists(dataPath)) renameOrThrow(dataPath, backupPath)
    renameOrThrow(staging, dataPath)
    deleteOrThrow(backupPath)
    resetGen()
  }
}

object JsonlStorage {
  /** On-the-wire JSON schema. `_seq` rides in every line; tags/fields
    * may be absent (empty maps are not serialized by `to_json`-style
    * writers in other tools — tolerate it).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("t_us", LongType, nullable = false),
    StructField("m", StringType, nullable = false),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = true)),
    StructField("fields", MapType(StringType, DoubleType, valueContainsNull = true)),
    StructField(Point.SeqCol, LongType, nullable = false)
  ))
}
