package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.model.Point

/** Bidirectional serde for the reference's on-disk CSV row format
  * (point.py:307-367 serialize, point.py:236-305 deserialize;
  * storages.py:170-433), so existing reference data files load into
  * this engine and exported data loads back into the reference.
  *
  * Row shape: `iso-naive-utc-time, measurement, (tagKey, tagVal)*,
  * (fieldKey, fieldVal)*` where
  *   - tag keys carry prefix `_tag_` (default) or `t_` (compact), field
  *     keys `_field_` / `f_` (point.py:104-107); classification follows
  *     the reference's exact rule — second char 't' → default tag
  *     prefix, leading 't' → compact tag, second char 'f' → default
  *     field, else compact field (point.py:257-278);
  *   - `_none` encodes None for time/measurement/values (point.py:99);
  *   - field values are written `str(float(v))` and read back as int
  *     (digit-only), float, or None (point.py:279-300);
  *   - times are naive-UTC `datetime.isoformat()` — microseconds
  *     printed only when non-zero (point.py:320-325).
  *
  * Parsing is pure Catalyst: Spark's CSV reader handles quoting, then
  * higher-order functions assemble the kv pairs into the tag/field
  * maps — no UDFs, fully codegen'd, scales to any number of files.
  */
object ReferenceCsv {

  private val NoneStr = "_none"

  /** Initial kv-column guess per row (2 keys+values per tag/field).
    * [[read]] widens automatically when a file's rows exceed it.
    */
  val DefaultMaxPairs = 64

  /** Read reference-format CSV file(s) into the canonical Point schema.
    * `_seq` is assigned in file order (the reference's insertion order).
    *
    * Width safety: the reader parses with a fixed-width schema, and a
    * row WIDER than the schema would be silently truncated — data loss
    * on migration. The parser's corrupt-record column carries the raw
    * record of every length-mismatched row; if any such record's
    * quote-aware token count exceeds the schema width, the width guess
    * doubles and the read retries. The recursion terminates at the
    * file's true width. Compat tier: per-file cost, not a cluster path.
    */
  def read(spark: SparkSession, path: String, maxPairs: Int = DefaultMaxPairs,
      encoding: String = "UTF-8"): DataFrame = {
    val width = 2 + 2 * maxPairs
    val corruptCol = "_graft_corrupt"
    val schema = StructType(
      (0 until width).map(i => StructField(s"c$i", StringType)) :+
        StructField(corruptCol, StringType))
    val raw = spark.read
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      // reference CSVStorage `encoding` kwarg (storages.py:188,224-226)
      .option("encoding", encoding)
      // python's csv module escapes quotes by doubling them
      .option("escape", "\"")
      // quoted cells may contain raw newlines (QUOTE_MINIMAL writes
      // them verbatim); without multiLine the reader would split the
      // record at the newline. Compat tier: single-threaded per file.
      // Known fidelity limit: the parser normalizes line separators
      // INSIDE quoted cells to "\n" — a value containing "\r\n" reads
      // back with "\n" (python's csv preserves it verbatim). "\n"
      // itself round-trips exactly.
      .option("multiLine", "true")
      // sentinel nullValue: only \u0001 cells (never produced by the
      // reference serializer) map to null, so '_none' etc. stay intact.
      // Note univocity parses an UNQUOTED empty token to null regardless
      // of nullValue — which is why truncation detection below reads the
      // raw record, not the parsed cells.
      .option("nullValue", "\u0001")
      // univocity flags every row whose token count differs from the
      // schema width (the common ragged NARROW rows included) and hands
      // back the raw record here — the only place a trailing EMPTY
      // token is still visible.
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema)
      .csv(path)

    // A row is truncated only when its quote-aware token count exceeds
    // the schema width. Counting on the raw record (strip quoted cells,
    // then count structural commas) sees empty trailing tokens that the
    // parsed columns cannot (unquoted empty parses to null — a final
    // empty tag VALUE would otherwise slip past and lose its tail).
    val tokenCount = size(split(
      regexp_replace(col(corruptCol), "\"(?:[^\"]|\"\")*\"", "q"), ",", -1))
    // c0 rides along (un-prunably, inside the aggregate) because Spark
    // refuses scans whose only referenced column is the corrupt-record
    // column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    // sum() is null over zero rows (a file of blank lines parses to an
    // empty frame while Files.size > 0) — coalesce, don't NPE
    val probeRow = raw.agg(
      sum(when(col(corruptCol).isNotNull && tokenCount > width, 1).otherwise(0)).as("n"),
      count(col("c0"))).head()
    if (!probeRow.isNullAt(0) && probeRow.getLong(0) > 0)
      return read(spark, path, maxPairs * 2, encoding)

    // kv cells as one array; schema-padding nulls and genuine empty
    // cells both normalize to "" — pairs are then kept by non-empty KEY
    // (keys are always prefixed, so "" is never a real key), which
    // preserves genuinely-empty VALUES
    val cells = array((2 until width).map(i => coalesce(col(s"c$i"), lit(""))): _*)
    val pairs = filter(
      transform(sequence(lit(0), lit(maxPairs - 1)),
        i => struct(element_at(cells, i * 2 + 1).as("k"), element_at(cells, i * 2 + 2).as("v"))),
      p => p.getField("k") =!= "")

    def second(c: Column): Column = substring(c, 2, 1)
    // reference order: second char 't' → default tag prefix; else
    // leading 't' → compact tag; else it's a field (point.py:257-264)
    val isTag = (e: Column) => second(e.getField("k")) === "t" ||
      substring(e.getField("k"), 1, 1) === "t"

    val tagEntries = transform(filter(pairs, isTag), e => {
      val k = e.getField("k")
      val v = e.getField("v")
      struct(
        when(second(k) === "t", substring(k, 6, Int.MaxValue))   // "_tag_"
          .otherwise(substring(k, 3, Int.MaxValue)).as("k"),      // "t_"
        when(v === NoneStr, lit(null).cast("string")).otherwise(v).as("v"))
    })
    val fieldEntries = transform(filter(pairs, e => !isTag(e)), e => {
      val k = e.getField("k")
      val v = e.getField("v")
      struct(
        when(second(k) === "f", substring(k, 8, Int.MaxValue))   // "_field_"
          .otherwise(substring(k, 3, Int.MaxValue)).as("k"),      // "f_"
        // int-or-float both land in double; unparseable → null, like
        // the reference's try/except (point.py:293-297). Guarded cast:
        // ANSI mode would otherwise throw on malformed input.
        when(v.rlike("^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"), v.cast("double"))
          .otherwise(lit(null).cast("double")).as("v"))
    })

    raw.select(
      // '_none' encodes a None time (point.py:320-325); try_to_timestamp
      // also nulls malformed cells instead of throwing under ANSI mode
      when(col("c0") === NoneStr, lit(null).cast("timestamp"))
        .otherwise(try_to_timestamp(col("c0"))).as(Point.TimeCol),
      when(col("c1") === NoneStr, lit(null).cast("string"))
        .otherwise(col("c1")).as(Point.MeasurementCol),
      map_from_entries(tagEntries).as(Point.TagsCol),
      map_from_entries(fieldEntries).as(Point.FieldsCol),
      monotonically_increasing_id().as(Point.SeqCol))
  }

  /** Canonical-schema DataFrame → reference-format CSV lines (one
    * string column `line`), QUOTE_MINIMAL-escaped like python's csv
    * module. Write with `.write.text(dir)` for the distributed path, or
    * [[writeFile]] for a single reference-readable file.
    *
    * Float values are encoded with Java's shortest-round-trip `Double`
    * repr; python reads either notation back to the identical double.
    */
  def toLines(points: DataFrame, compactPrefixes: Boolean = false): DataFrame =
    points.orderBy(Point.SeqCol).select(lineCol(compactPrefixes).as("line"))

  /** The single formatting expression behind BOTH serialization paths
    * (distributed [[toLines]] job and the job-free small-batch fold in
    * [[streamTo]]) — one source of truth for the reference's row format.
    */
  private def lineCol(compactPrefixes: Boolean): Column = {
    val tagPrefix = if (compactPrefixes) "t_" else "_tag_"
    val fieldPrefix = if (compactPrefixes) "f_" else "_field_"

    // python csv QUOTE_MINIMAL: quote only when the cell contains
    // delimiter/quote/newline; embedded quotes are doubled. Substring
    // probes, not a regex: this runs per cell on the serialization hot
    // path and the regex engine is ~2× the cost of 4 contains scans.
    def q(c: Column): Column =
      when(c.contains(",") || c.contains("\"") || c.contains("\r") || c.contains("\n"),
        concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\"")))
        .otherwise(c)

    // naive-UTC isoformat, micros only when non-zero
    val micros = expr(s"unix_micros(${Point.TimeCol}) % 1000000")
    val timeStr = when(col(Point.TimeCol).isNull, lit(NoneStr))
      .otherwise(when(micros === 0, date_format(col(Point.TimeCol), "yyyy-MM-dd'T'HH:mm:ss"))
        .otherwise(date_format(col(Point.TimeCol), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")))

    val measurementStr = coalesce(col(Point.MeasurementCol), lit(NoneStr))

    // timeStr is ISO-format or `_none` and a double's shortest repr is
    // [0-9.eE+-]/Infinity/NaN — neither can contain a quotable char, so
    // those cells skip the QUOTE_MINIMAL probe entirely. Keys and string
    // values are user data and keep it.
    def kvCellsQuotedKey(mapCol: String, prefix: String, fmt: Column => Column,
        quoteValue: Boolean): Column =
      flatten(transform(map_entries(col(mapCol)), e => array(
        q(concat(lit(prefix), e.getField("key"))),
        if (quoteValue) q(coalesce(fmt(e.getField("value")), lit(NoneStr)))
        else coalesce(fmt(e.getField("value")), lit(NoneStr)))))

    val cells = concat(
      array(timeStr, q(measurementStr)),
      kvCellsQuotedKey(Point.TagsCol, tagPrefix, v => v, quoteValue = true),
      kvCellsQuotedKey(Point.FieldsCol, fieldPrefix, v => v.cast("string"), quoteValue = false))

    array_join(cells, ",")
  }

  /** Stream the lines into ONE local CSV file (the reference's storage
    * unit) in insertion order — driver-side but memory-bounded
    * (toLocalIterator), intended for export/migration of result sets
    * that a single reference instance can hold anyway.
    */
  def writeFile(points: DataFrame, path: String, compactPrefixes: Boolean = false,
      encoding: String = "UTF-8", flushOnInsert: Boolean = true,
      newline: String = ""): Unit =
    streamTo(points, path, append = false, compactPrefixes, encoding, flushOnInsert, newline)

  /** Append rows (in batch order) to an existing reference CSV file. */
  def appendFile(points: DataFrame, path: String, compactPrefixes: Boolean = false,
      encoding: String = "UTF-8", flushOnInsert: Boolean = true,
      newline: String = ""): Unit =
    streamTo(points, path, append = true, compactPrefixes, encoding, flushOnInsert, newline)

  /** The reference opens its file with python `open(newline=...)`
    * (storages.py:191,224-226) and the csv module emits `\r\n` row
    * terminators; python then TRANSLATES each written `\n` per the
    * newline mode. Mirror that translation on our terminator:
    * "" or "\n" → no translation (the sane default, what csv docs
    * demand); null (python None) → `\n` becomes the platform separator;
    * "\r"/"\r\n" → `\n` becomes that string (the classic footgun that
    * yields `\r\r\n` on disk — preserved for fidelity, not recommended).
    */
  private def rowTerminator(newline: String): String = newline match {
    case "" | "\n"         => "\r\n"
    case null              => "\r" + System.lineSeparator()
    case "\r" | "\r\n"     => "\r" + newline
    case other => throw new IllegalArgumentException(
      s"illegal newline value '$other' (python open() allows None, '', '\\n', '\\r', '\\r\\n')")
  }

  private def streamTo(points: DataFrame, path: String, append: Boolean,
      compactPrefixes: Boolean, encoding: String, flushOnInsert: Boolean,
      newline: String): Unit = {
    import scala.jdk.CollectionConverters._
    val withSeq =
      if (points.columns.contains(Point.SeqCol)) points
      else points.withColumn(Point.SeqCol, monotonically_increasing_id())
    val p = java.nio.file.Paths.get(path)
    val terminator = rowTerminator(newline)
    // A file whose last line lacks a terminator (hand-edited, partial
    // copy) would otherwise have the first appended record glued onto
    // it — complete the line before appending.
    val needsSeparator = append && java.nio.file.Files.exists(p) &&
      java.nio.file.Files.size(p) > 0 && {
        val ch = java.nio.channels.FileChannel.open(p, java.nio.file.StandardOpenOption.READ)
        try {
          val buf = java.nio.ByteBuffer.allocate(1)
          ch.read(buf, java.nio.file.Files.size(p) - 1)
          buf.flip(); buf.get() != '\n'.toByte
        } finally ch.close()
      }
    // FileOutputStream (not Files.newBufferedWriter) so the fsync knob
    // has a file descriptor to sync — the reference's flush_on_insert
    // does flush + os.fsync per batch (storages.py:302-308)
    val fos = new java.io.FileOutputStream(path, append)
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(fos, java.nio.charset.Charset.forName(encoding)))
    if (needsSeparator) out.write(terminator)
    // coalesce(1) after the sort: partition merge order is partition
    // index order, which under the sort's range partitioning IS the
    // global order — and toLocalIterator then streams ONE job instead
    // of one sequential job per shuffle partition (which dominates
    // wall-clock for small batches), still memory-bounded.
    try {
      val lines = localLines(points, compactPrefixes).getOrElse(
        toLines(withSeq, compactPrefixes).coalesce(1).toLocalIterator().asScala
          .map(_.getString(0)))
      lines.foreach { s => out.write(s); out.write(terminator) }
      out.flush()
      if (flushOnInsert) fos.getFD.sync()
    } finally out.close()
  }

  /** Driver-side serialization for sub-split batches (≤ 1/8 of
    * `files.maxPartitionBytes`): collect the batch as InternalRows (one
    * job at the batch's own parallelism, bounded by the same size
    * estimate that picks the path), then evaluate THE SAME [[lineCol]]
    * expression the distributed path runs — analyzed against the batch
    * schema, bound, and compiled to a codegen'd `UnsafeProjection` —
    * row by row on the driver. Zero extra jobs, no external-Row
    * conversion, single-sourced formatting. A small CSV append thus
    * pays one narrow collect instead of a format+sort+stream job.
    * Returns None (→ distributed path) for larger batches.
    */
  private def localLines(points: DataFrame, compactPrefixes: Boolean): Option[Iterator[String]] = {
    import org.apache.spark.sql.catalyst.expressions.{BindReferences, UnsafeProjection}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = points.sparkSession
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val est = points.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est > BigInt(splitBytes / 8L)) return None
    val rows = points.queryExecution.executedPlan.executeCollect()
    // insertion order: explicit `_seq` when present (collect order of an
    // unsorted plan is partition order, not seq order), else the arrival
    // order the mono-id sort on the distributed path would produce
    val ordered =
      if (points.columns.contains(Point.SeqCol)) {
        val sIdx = points.schema.fieldIndex(Point.SeqCol)
        rows.sortBy(_.getLong(sIdx))
      } else rows
    val boundBytes = boundLineExprBytes(points, compactPrefixes)
    // The tree contains higher-order functions (`transform` over map
    // entries), which are CodegenFallback: even inside a "codegen'd"
    // projection their subtrees run interpreted eval on the EXPRESSION
    // INSTANCES themselves, and those instances carry mutable eval
    // state — RegExpReplace's pattern + result buffer, and each lambda's
    // NamedLambdaVariable argument slot (an AtomicReference). A
    // projection is therefore thread-confined ONLY if its tree is
    // private to it, and TreeNode.clone() does NOT provide that: it
    // re-instantiates nodes with the same constructor args, so the
    // clones SHARE the original's AtomicReference cells. Use the same
    // isolation mechanism Spark uses to ship plans to tasks — Java
    // serialization: each deserialization materializes a fully private
    // object graph. One projection per deserialized tree, never shared
    // across threads (the chunk-parallel path below, or two GraftDB
    // handles appending concurrently).
    def freshProj() = {
      val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(boundBytes))
      val tree = try in.readObject()
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression]
      finally in.close()
      UnsafeProjection.create(Seq(tree))
    }
    val n = ordered.length
    val chunk = 2048
    if (n <= chunk) {
      val proj = freshProj()
      Some(ordered.iterator.map(r => proj(r).getUTF8String(0).toString))
    } else {
      // the per-row format eval (~10 µs: date_format + per-cell quote
      // probes + double repr) dominates past a few thousand rows —
      // spread the chunks over driver cores, one projection instance
      // per chunk (projections reuse an internal row buffer and carry
      // CodegenFallback expression state; see freshProj). Output lands
      // by index, so order is preserved.
      val nChunks = (n + chunk - 1) / chunk
      // instantiate on this thread: generated-class lookup is cheap and
      // keeps concurrent codegen out of the picture
      val projs = Array.fill(nChunks)(freshProj())
      val out = new Array[String](n)
      java.util.stream.IntStream.range(0, nChunks).parallel().forEach { c =>
        val proj = projs(c)
        var i = c * chunk
        val end = math.min(i + chunk, n)
        while (i < end) {
          out(i) = proj(ordered(i)).getUTF8String(0).toString
          i += 1
        }
      }
      Some(out.iterator)
    }
  }

  // SERIALIZED bound line expressions per (schema, prefixes, analysis
  // confs): analysis + binding of the ~100-node formatting tree costs
  // more than evaluating it over a small batch, and the result is
  // deterministic per key. Analysis bakes MORE than the timezone into
  // the tree (ANSI cast mode picks cast node behavior, the legacy
  // time-parser policy picks formatter classes), so every conf that can
  // change the analyzed expression is part of the key — a conf flipped
  // mid-session gets a fresh tree, not a stale cached one. Cached as
  // bytes, not as a live tree — see freshProj: every consumer must
  // deserialize its own private copy, so caching a shared instance
  // would be an invitation to reintroduce the lambda-state race.
  // Deserializing the tree costs ~1 ms, far under one analysis.
  private val boundLineCache =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.types.StructType,
      Boolean, String, Boolean, String), Array[Byte]]

  private def boundLineExprBytes(points: DataFrame, compactPrefixes: Boolean): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.BindReferences
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = points.sparkSession
    val sc = spark.sessionState.conf
    val tz = sc.sessionLocalTimeZone
    val ansi = sc.ansiEnabled
    val timeParser = sc.getConf(
      org.apache.spark.sql.internal.SQLConf.LEGACY_TIME_PARSER_POLICY).toString
    boundLineCache.getOrElseUpdate((points.schema, compactPrefixes, tz, ansi, timeParser), {
      // resolve lineCol against an empty relation of the batch schema —
      // analysis fills in timezones etc. exactly as the distributed plan
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), points.schema)
      val analyzed = empty.select(lineCol(compactPrefixes).as("line"))
        .queryExecution.analyzed.asInstanceOf[Project]
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.ObjectOutputStream(bos)
      try out.writeObject(
        BindReferences.bindReference(analyzed.projectList.head, analyzed.child.output))
      finally out.close()
      bos.toByteArray
    })
  }
}
