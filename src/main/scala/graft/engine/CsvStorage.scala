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
    compactPrefixes: Boolean = false, readOnly: Boolean = false,
    accessMode: String = "r+",
    // reference CSVStorage tuning kwargs (storages.py:184-193):
    // flush_on_insert (flush + fsync per append batch), encoding
    // (python None = platform default; here an explicit charset),
    // newline (python open() translation mode; "" is the csv-correct
    // default — see ReferenceCsv.rowTerminator), and create_dirs
    // (python default False: a creating mode with a missing parent
    // directory raises, exactly like open())
    flushOnInsert: Boolean = true,
    encoding: String = "UTF-8",
    newline: String = "",
    createDirs: Boolean = false) extends Storage {

  /** Effective file mode — python open() semantics, matching the
    * reference's `access_mode` kwarg (storages.py:196-231):
    * 'r' read-only; 'r+' read+append+rewrite (the default); 'w'/'w+'
    * truncate on open; 'a'/'a+' append-only. `readOnly = true` is the
    * pre-existing shorthand for "r".
    */
  val mode: String = if (readOnly) "r" else accessMode
  require(Set("r", "r+", "w", "w+", "a", "a+").contains(mode),
    s"invalid access mode '$mode' (want r, r+, w, w+, a or a+)")

  private def p = Paths.get(path)

  // python open() side effects at handle creation (storages.py:218-225):
  // 'w'/'w+' truncate; any of +/w/a creates a missing file; bare 'r'
  // on a missing file fails like FileNotFoundError.
  if (mode.startsWith("w") && Files.exists(p)) Files.write(p, Array.emptyByteArray)
  else if (mode != "r" && !Files.exists(p)) {
    if (p.getParent != null && !Files.exists(p.getParent)) {
      // reference create_file(path, create_dirs) (storages.py:34-52,220):
      // parents are only created when asked; otherwise fail like open()
      if (createDirs) Files.createDirectories(p.getParent)
      else throw new java.io.FileNotFoundException(
        s"parent directory missing for $path (pass createDirs = true to create it)")
    }
    Files.createFile(p)
  } else if (mode == "r" && !Files.exists(p))
    throw new java.io.FileNotFoundException(s"no such file: $path (mode 'r' does not create)")

  // op 54 precondition guards (storages.py:233-261): a handle refuses
  // disallowed ops before touching the file.
  override def canRead: Boolean = Set("r", "r+", "w+", "a+").contains(mode)
  override def canAppend: Boolean = mode != "r"
  override def canWrite: Boolean = Set("r+", "w", "w+").contains(mode)

  private def guard(ok: Boolean, what: String): Unit =
    if (!ok) throw new UnsupportedOperationException(
      s"""cannot $what the database at $path: access mode is "$mode"""")

  override protected def knownEmpty: Boolean = !Files.exists(p) || Files.size(p) == 0

  override protected def loadUnguarded(): DataFrame =
    if (knownEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Point.schema)
    else ReferenceCsv.read(spark, path, encoding = encoding)

  override def load(): DataFrame = { guard(canRead, "read"); loadUnguarded() }

  override def append(batch: DataFrame): Unit = append(batch, None)

  /** Per-call prefix override (reference database.py:617,654): a file
    * may legally mix `_tag_`/`t_` row styles — the reader classifies
    * per key (point.py:257-278) — so per-append compaction is safe.
    */
  override def append(batch: DataFrame, perCall: Option[Boolean]): Unit = synchronized {
    guard(canAppend, "append to")
    ReferenceCsv.appendFile(batch, path, perCall.getOrElse(compactPrefixes),
      encoding, flushOnInsert, newline)
  }

  override def overwrite(full: DataFrame): Unit = synchronized {
    guard(canWrite, "rewrite")
    val tmp = Paths.get(path + ".graft-tmp")
    // materialize to the temp file BEFORE touching the primary (the
    // plan may read from it), then swap atomically
    ReferenceCsv.writeFile(full.select(Point.columns.map(org.apache.spark.sql.functions.col): _*)
      .orderBy(Point.SeqCol), tmp.toString, compactPrefixes, encoding, flushOnInsert, newline)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    resetGen()
  }
}
