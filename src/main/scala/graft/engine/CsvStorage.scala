package graft.engine

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Point
import graft.sources.ReferenceCsv

/** Storage backend speaking the reference's own CSV file format
  * (storages.py:170-433) — point a GraftDB at an existing reference
  * data file and every operator works on it unchanged; mutations write
  * the file back in the same format, so the reference can reopen it.
  *
  * Ops 49/50 (CSV append / sequential read): appends go straight to the
  * end of the file in batch order — insertion order IS file order, so
  * `_seq` is simply the line number assigned at read. Mutations use the
  * reference's own temp-write-then-swap commit (storages.py:383-400)
  * via an atomic move.
  *
  * This is the migration/compat tier, driver-side by design (one CSV
  * file is single-node data by definition); ParquetStorage is the scale
  * tier.
  */
final class CsvStorage(val spark: SparkSession, path: String,
    compactPrefixes: Boolean = false, readOnly: Boolean = false) extends Storage {

  private def p = Paths.get(path)

  // op 54 precondition guards (storages.py:233-261): a read-only handle
  // refuses every mutation before touching the file.
  private def guardWrite(): Unit =
    if (readOnly) throw new UnsupportedOperationException(
      s"storage at $path was opened read-only")

  override protected def knownEmpty: Boolean = !Files.exists(p) || Files.size(p) == 0

  override def load(): DataFrame =
    if (knownEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Point.schema)
    else ReferenceCsv.read(spark, path)

  override def append(batch: DataFrame): Unit = append(batch, None)

  /** Per-call prefix override (reference database.py:617,654): a file
    * may legally mix `_tag_`/`t_` row styles — the reader classifies
    * per key (point.py:257-278) — so per-append compaction is safe.
    */
  override def append(batch: DataFrame, perCall: Option[Boolean]): Unit = synchronized {
    guardWrite()
    ReferenceCsv.appendFile(batch, path, perCall.getOrElse(compactPrefixes))
  }

  override def overwrite(full: DataFrame): Unit = synchronized {
    guardWrite()
    val tmp = Paths.get(path + ".graft-tmp")
    // materialize to the temp file BEFORE touching the primary (the
    // plan may read from it), then swap atomically
    ReferenceCsv.writeFile(full.select(Point.columns.map(org.apache.spark.sql.functions.col): _*)
      .orderBy(Point.SeqCol), tmp.toString, compactPrefixes)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    resetGen()
  }
}
