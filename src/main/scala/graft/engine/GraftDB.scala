package graft.engine

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Point
import graft.query.{IndexedLayout, Noop, Q, QueryCompiler, TimeBounds, TimeQuery}

/** The engine facade — every core operator of the reference database
  * (SURVEY.md §2.1 ops 1-24; reference: tinyflux/database.py) expressed
  * as declarative DataFrame transforms so Catalyst plans them.
  *
  * DataFrame-first: each op has a `...DF` form returning an unexecuted
  * DataFrame (composable, scale-safe) plus, where the reference returns
  * materialized values, a convenience form that collects. On a cluster
  * the DF forms are the API; collects are driver-side conveniences for
  * small results/metadata only.
  *
  * `autoIndex` mirrors the reference's `auto_index` kwarg
  * (database.py:84-98, decorators.py:50-51): a filtered read that finds
  * no live index triggers `reindex()` transparently before running, so
  * an insert→search sequence is index-accelerated with no explicit
  * reindex call — the reference's default ergonomics. The build is LAZY
  * (first read, not open — the reference builds at open,
  * database.py:113-115; deferring to first read is the same observable
  * read behavior without charging jobs to handles that never read).
  * Default false: on a shared cluster an implicit full-store index
  * build inside an arbitrary read is a surprising cost spike, so the
  * Spark-native default keeps index builds explicit; pass
  * `autoIndex = true` for drop-in reference parity.
  */
final class GraftDB(val storage: Storage, val autoIndex: Boolean = false) {
  val spark: SparkSession = storage.spark
  import spark.implicits._

  // Map-literal merges in update() rely on last-wins dedup.
  spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")

  private var isOpen = true

  /** `db.close()` (database.py:190-208): release the index cache, let
    * the storage clean up, and refuse subsequent ops. Idempotent. Use
    * [[GraftDB.using]] as the context-manager analogue (`with TinyFlux
    * (...) as db:`).
    */
  def close(): Unit = if (isOpen) {
    invalidateIndex()
    storage.close()
    isOpen = false
  }

  /** True until [[close]] — reference `TinyFlux._open`. */
  def open: Boolean = isOpen

  private def guardOpen(): Unit =
    if (!isOpen) throw new IllegalStateException(
      "database is closed (reference database.py:190-208)")

  def df: DataFrame = { guardOpen(); storage.load() }

  /** High-water mark of the `_seq` insertion-order key (−1 when empty):
    * capture it, keep appending, and [[snapshotAt]] that mark later —
    * the seq column makes append histories naturally versioned. One
    * `max` scan (same cost class as `length`).
    */
  def seqWatermark: Long = {
    val row = df.agg(max(Point.SeqCol)).head()
    if (row.isNullAt(0)) -1L else row.getLong(0)
  }

  /** Branch the database at a [[seqWatermark]]: an independent
    * in-memory GraftDB over exactly the rows with `_seq <= seq` — a
    * consistent read view while ingest keeps appending, and a safe
    * sandbox (its mutations copy-on-write into the branch, never the
    * origin). Exact time travel for append-only histories; `update`/
    * `remove`/`overwrite` rewrite rows in place (COW semantics, the
    * reference's model too), so pre-mutation row VERSIONS are not
    * retained — branch before mutating if you need the pre-image.
    *
    * The branch reads the origin's storage LAZILY: it stays valid
    * across origin appends, but a later COW rewrite (update/remove/
    * overwrite/compact) of a file-backed origin replaces the files an
    * unmaterialized branch still references — collect or cache the
    * branch first if it must outlive origin mutations.
    */
  def snapshotAt(seq: Long): GraftDB =
    GraftDB.fromDataFrame(df.filter(col(Point.SeqCol) <= seq), autoIndex)

  /** Migrate the full state into another backend — parquet → JSONL for
    * interchange, CSV → parquet to leave the compat tier, anything →
    * memory for a hot working set. `_seq` travels, so insertion-order
    * semantics survive the move. One distributed write through the
    * target's own commit protocol; returns a GraftDB on the target.
    */
  def copyTo(target: Storage): GraftDB = {
    guardOpen()
    target.overwrite(df)
    new GraftDB(target, autoIndex)
  }

  // reindex() state: a cached view with hot map keys columnarized, the
  // layout telling the compiler which flat columns to read, the data's
  // global time bounds (the zonemap tier — see [[TimeBounds]]), the
  // cached segments backing the view (the reindex base plus one cached
  // slice per in-order append folded in by [[tryExtendIndex]]) so
  // invalidation releases every piece, and the count of remove-patches
  // stacked on the view (each remove adds one Filter node — see
  // [[patchIndexAfterRemove]]) so the plan depth stays bounded.
  private case class IndexState(view: DataFrame, layout: IndexedLayout,
      timeBounds: Option[(Instant, Instant)], cached: List[DataFrame],
      patches: Int = 0)
  private var indexedState: Option[IndexState] = None

  private def invalidateIndex(): Unit = {
    indexedState.foreach(_.cached.foreach(_.unpersist(false)))
    indexedState = None
  }

  private def cond(q: Q): Column =
    QueryCompiler.compile(q, indexedState.fold(IndexedLayout.empty)(_.layout))

  // Mutation paths rewrite the RAW frame (no index columns), so their
  // predicate must be compiled without the indexed layout.
  private def rawCond(q: Q): Column = QueryCompiler.compile(q)

  /** Filtered scan in canonical Point schema — the shared core of
    * search/get/count/contains. Against the indexed view the predicate
    * reads only flat atomic columns and the tag/field MAPS ARE REBUILT
    * from the slot columns for MATCHED rows only — the unindexed path
    * would materialize two MapType columns for every scanned row before
    * the filter even runs, which dominates point-query latency on a
    * cached working set (the cache also shrinks to primitives-only).
    */
  private[graft] def filterPlan(q: Q): DataFrame = {
    guardOpen()
    // auto_index read path (decorators.py:50-51): a filtered read with
    // no live index rebuilds it first, then runs indexed.
    if (autoIndex && indexedState.isEmpty) reindex()
    indexedState
  } match {
    case None => df.filter(cond(q)).select(Point.columns.map(col): _*)
    case Some(IndexState(_, _, Some((lo, hi)), _, _)) if TimeBounds.provablyEmpty(q, lo, hi) =>
      // zonemap shortcut: the time predicate cannot overlap the data —
      // answer from a LocalRelation, zero jobs (the reference's index
      // bisect returns [] without touching a single point).
      GraftDB.emptyLocal(spark)
    case Some(IndexState(idf, layout, _, _, _)) =>
      // complete layout: maps are rebuilt from the slot columns (the
      // view doesn't store them). Incomplete (cardinality-capped)
      // layout: the view KEPT the map columns — pass them through,
      // since the slots cover only the hot keys.
      val (tagsOut, fieldsOut) =
        if (layout.complete)
          (GraftDB.rebuildMap(layout.tagSlots, "__tv_", "__tp_", "string"),
            GraftDB.rebuildMap(layout.fieldSlots, "__fv_", "__fp_", "double"))
        else (col(Point.TagsCol), col(Point.FieldsCol))
      idf.filter(cond(q)).select(
        col(Point.TimeCol),
        col(Point.MeasurementCol),
        tagsOut.as(Point.TagsCol),
        fieldsOut.as(Point.FieldsCol),
        col(Point.SeqCol))
  }

  private def toPoint(r: Row): Point = Point(
    time = r.getAs[java.sql.Timestamp](Point.TimeCol).toInstant,
    measurement = r.getAs[String](Point.MeasurementCol),
    tags = Option(r.getAs[Map[String, String]](Point.TagsCol)).getOrElse(Map.empty),
    fields = Option(r.getAs[Map[String, java.lang.Double]](Point.FieldsCol)).getOrElse(Map.empty),
    _seq = r.getAs[Long](Point.SeqCol)
  )

  // ---- read ops (ops 1-8) ------------------------------------------------

  /** op 1 `all` (database.py:173-188): full scan, time-sorted by default,
    * insertion order with sorted=false.
    */
  def allDF(sorted: Boolean = true): DataFrame =
    if (sorted) df.orderBy(Point.TimeCol, Point.SeqCol) else df.orderBy(Point.SeqCol)

  def all(sorted: Boolean = true): Seq[Point] = sortCollected(df.collect().map(toPoint), sorted)

  /** Collect-form results sort on the driver: the result already fits
    * driver memory by contract, so a cluster-wide range-partitioned
    * sort (shuffle) for presentation order would be pure overhead. The
    * DF forms keep declarative orderBy for composition.
    */
  private def sortCollected(pts: Array[Point], sorted: Boolean): Seq[Point] =
    (if (sorted) pts.sortBy(p => (p.time.getEpochSecond, p.time.getNano.toLong, p._seq))
     else pts.sortBy(_._seq)).toSeq

  /** op 2 `__iter__` (database.py:143-146): lazy scan. */
  def iterator: Iterator[Point] = iteratorFor(Noop)

  private[engine] def iteratorFor(q: Q): Iterator[Point] = {
    import scala.jdk.CollectionConverters._
    filterPlan(q).orderBy(Point.SeqCol).toLocalIterator().asScala.map(toPoint)
  }

  /** op 3 `__len__` (database.py:148-155): answered from the live
    * index view when one exists (the reference's `len(self._index)`
    * fast path, database.py:151-152) — a count over cached primitive
    * columns instead of a storage re-scan; the view always reflects
    * the full state (extensions unioned, removals patched).
    */
  def length: Long = { guardOpen(); indexedState.fold(df.count())(_.view.count()) }

  /** op 4 `search` (database.py:740-828). */
  def searchDF(q: Q, sorted: Boolean = true): DataFrame = {
    val filtered = filterPlan(q)
    if (sorted) filtered.orderBy(Point.TimeCol, Point.SeqCol) else filtered.orderBy(Point.SeqCol)
  }

  def search(q: Q, sorted: Boolean = true): Seq[Point] =
    sortCollected(filterPlan(q).collect().map(toPoint), sorted)

  /** op 5 `get` (database.py:315-386): FIRST match in insertion order —
    * `_seq` ascending, limit 1 (Spark plans a stop-early TakeOrdered).
    */
  def get(q: Q): Option[Point] =
    filterPlan(q).orderBy(Point.SeqCol).limit(1).collect().headOption.map(toPoint)

  /** op 6 `contains` (database.py:209-251): early-exit existence test. */
  def contains(q: Q): Boolean = !filterPlan(q).isEmpty

  /** op 7 `count` (database.py:253-291). */
  def count(q: Q): Long = filterPlan(q).count()

  /** op 8 `select` (database.py:830-974): project dotted keys
    * `time` / `measurement` / `tags.X` / `fields.Y`; a missing key
    * yields null — `element_at` gives exactly that.
    */
  def selectDF(keys: Seq[String], q: Q = Noop): DataFrame = {
    val cols = keys.map {
      case "time"        => col(Point.TimeCol).as("time")
      case "measurement" => col(Point.MeasurementCol).as("measurement")
      case k if k.startsWith("tags.") =>
        element_at(col(Point.TagsCol), k.stripPrefix("tags.")).as(k)
      case k if k.startsWith("fields.") =>
        element_at(col(Point.FieldsCol), k.stripPrefix("fields.")).as(k)
      case k => throw new IllegalArgumentException(
        s"invalid select key '$k' (want time|measurement|tags.X|fields.Y)")
    }
    filterPlan(q).orderBy(Point.SeqCol).select(cols: _*)
  }

  // ---- write ops (ops 9-15) ----------------------------------------------

  /** ops 9-10 `insert` / `insert_multiple` (database.py:600-656):
    * UTC-normalized, batched append; returns the number of points
    * inserted (reference database.py:621,656 — `insert` → 1,
    * `insert_multiple` → the batch size). `compactKeyPrefixes` is the
    * reference's per-insert serialization flag (database.py:617,654) —
    * honored by the CSV backend, ignored where prefixes don't exist.
    */
  def insert(p: Point, measurement: Option[String] = None,
      compactKeyPrefixes: Option[Boolean] = None): Int =
    insertMultiple(Seq(p), measurement, compactKeyPrefixes)

  def insertMultiple(ps: Seq[Point], measurement: Option[String] = None,
      compactKeyPrefixes: Option[Boolean] = None): Int = {
    val now = Instant.now()
    val normalized = ps.map { p0 =>
      val p1 = if (p0.time == null) p0.copy(time = now) else p0
      Point.validate(measurement.fold(p1)(m => p1.copy(measurement = m)))
    }
    insertDF(spark.createDataset(normalized).toDF()
      .select(Point.columns.filterNot(_ == Point.SeqCol).map(col): _*),
      compactKeyPrefixes)
    normalized.size
  }

  /** Bulk ingest of an already-distributed batch (canonical schema sans
    * `_seq`) — the cluster-scale insert path. No count is returned: the
    * batch's size is unknown without an extra job, and the caller holds
    * the DataFrame to count if it cares.
    */
  def insertDF(batch: DataFrame, compactKeyPrefixes: Option[Boolean] = None): Unit = {
    guardOpen()
    indexedState match {
      case None => storage.append(batch, compactKeyPrefixes)
      case Some(st) =>
        // try to extend the live index in place (reference
        // index.py:429-456: an in-order append extends the index instead
        // of invalidating it; database.py:1309-1310)
        storage.appendDelta(batch, compactKeyPrefixes) match {
          case Some(delta) => if (!tryExtendIndex(st, delta)) invalidateIndex()
          case None        => invalidateIndex() // already appended; opaque delta
        }
    }
    // Auto-compaction: sustained micro-batch ingest accretes one delta
    // file per append forever without it. Deferred while an index is
    // live (its cached slices pin specific delta files); appends past
    // MaxIndexDeltaSegments invalidate the index, and compaction then
    // catches up on the next insert.
    if (indexedState.isEmpty) storage match {
      case p: ParquetStorage => p.maybeCompactDelta()
      case _                 => ()
    }
  }

  /** Exactly-once ingest: [[insertDF]] semantics, applied AT MOST ONCE
    * per `token` however often the call is replayed — the sink the
    * checkpointed streaming engine needs when a crash can re-run a
    * micro-batch whose append already landed. Returns whether the batch
    * was applied (false = deduplicated replay). The parquet backend
    * makes the token commit durable; see
    * [[Storage.appendIdempotent]].
    */
  /** Whether an idempotent-insert token has already committed —
    * lets callers honor alias token names (see
    * [[Storage.hasIngestCommit]]).
    */
  def hasIngestCommit(token: String): Boolean = {
    guardOpen(); storage.hasIngestCommit(token)
  }

  def insertDFIdempotent(batch: DataFrame, token: String): Boolean = {
    guardOpen()
    val applied = storage.appendIdempotent(batch, token)
    if (applied) {
      // token appends carry no reproducible delta plan; the live index
      // falls back to the invalidate-on-write contract
      if (indexedState.isDefined) invalidateIndex()
      else storage match {
        case p: ParquetStorage => p.maybeCompactDelta()
        case _                 => ()
      }
    }
    applied
  }

  /** How many delta segments an index may accumulate before an append
    * invalidates instead of extending: each extension unions one more
    * cached slice into the view, and an unbounded chain would grow the
    * plan (and per-query planning time) with the append count. 16 deep
    * costs nothing measurable; past it, fall back to the pre-existing
    * invalidate-on-write contract (the caller reindexes as before).
    */
  private val MaxIndexDeltaSegments = 16

  /** Fold an appended delta into the live index when the append is
    * time-ordered (delta min-time >= indexed max-time): the reference's
    * in-place index extension (index.py:429-456), re-expressed as a
    * cached columnar slice unioned under the existing cached view.
    * New tag/field keys extend the slot layout (old rows get typed-null
    * values and FALSE presence — null presence would break NOT/exists
    * semantics); the zonemap keeps its lower bound and adopts the
    * delta's max. Everything runs over the DELTA only — two jobs (one
    * stats pass, one cache materialization), never a full-store rescan.
    * Returns false when the append is out-of-order (or otherwise not
    * extendable) and the caller must invalidate.
    */
  private def tryExtendIndex(st: IndexState, delta: DataFrame): Boolean = {
    if (st.cached.size > MaxIndexDeltaSegments) return false
    // one job over the delta: time bounds, row count, and key universe
    val stats = delta.agg(
      min(col(Point.TimeCol)), max(col(Point.TimeCol)),
      org.apache.spark.sql.functions.count(lit(1)),
      array_distinct(flatten(collect_list(map_keys(col(Point.TagsCol))))),
      array_distinct(flatten(collect_list(map_keys(col(Point.FieldsCol)))))).head()
    if (stats.getLong(2) == 0L) return true // empty batch: index untouched
    if (stats.isNullAt(0)) return false     // null times: not orderable
    val lo = stats.getTimestamp(0).toInstant
    val hi = stats.getTimestamp(1).toInstant
    val inOrder = st.timeBounds.forall { case (_, oldHi) => !lo.isBefore(oldHi) }
    if (!inOrder) return false
    // Incomplete (cardinality-capped) layout: brand-new keys do NOT
    // earn slots — they are cold by definition and the compiler's map
    // fallback covers them (the view kept the map columns). A complete
    // layout must extend, or the new keys would wrongly compile to
    // constant-absent.
    val newTagKeys =
      if (!st.layout.complete) Nil
      else stats.getSeq[String](3).filterNot(st.layout.tagSlots.contains).sorted
    val newFieldKeys =
      if (!st.layout.complete) Nil
      else stats.getSeq[String](4).filterNot(st.layout.fieldSlots.contains).sorted
    val tagSlots = st.layout.tagSlots ++
      newTagKeys.zipWithIndex.map { case (k, i) => k -> (st.layout.tagSlots.size + i) }
    val fieldSlots = st.layout.fieldSlots ++
      newFieldKeys.zipWithIndex.map { case (k, i) => k -> (st.layout.fieldSlots.size + i) }
    // existing view rows never carry the new keys: typed-null value,
    // explicit FALSE presence (unionByName's null-fill would null the
    // presence bit, and ~exists() over null-presence rows drops rows
    // that must be kept)
    val oldExtended = st.view.select(
      st.view.columns.map(col).toSeq ++
        newTagKeys.map(k => lit(null).cast("string").as(s"__tv_${tagSlots(k)}")) ++
        newTagKeys.map(k => lit(false).as(s"__tp_${tagSlots(k)}")) ++
        newFieldKeys.map(k => lit(null).cast("double").as(s"__fv_${fieldSlots(k)}")) ++
        newFieldKeys.map(k => lit(false).as(s"__fp_${fieldSlots(k)}")): _*)
    val deltaCols = Seq(col(Point.TimeCol), col(Point.MeasurementCol), col(Point.SeqCol)) ++
      tagSlots.toSeq.sortBy(_._2).flatMap { case (k, i) => Seq(
        element_at(col(Point.TagsCol), k).as(s"__tv_$i"),
        map_contains_key(col(Point.TagsCol), k).as(s"__tp_$i")) } ++
      fieldSlots.toSeq.sortBy(_._2).flatMap { case (k, i) => Seq(
        element_at(col(Point.FieldsCol), k).as(s"__fv_$i"),
        map_contains_key(col(Point.FieldsCol), k).as(s"__fp_$i")) } ++
      (if (st.layout.complete) Nil else Seq(col(Point.TagsCol), col(Point.FieldsCol)))
    // time-sorted within partitions so cached-batch min/max stats prune
    // inside the delta too; no repartition — an append stays O(batch)
    val deltaView = delta.select(deltaCols: _*)
      .sortWithinPartitions(Point.TimeCol).cache()
    deltaView.count() // materialize NOW, while the batch plan is current
    indexedState = Some(IndexState(
      oldExtended.unionByName(deltaView),
      IndexedLayout(tagSlots, fieldSlots, complete = st.layout.complete),
      Some((st.timeBounds.fold(lo)(_._1), hi)),
      st.cached :+ deltaView,
      // patches stack UNDER the union — carry the count so interleaved
      // remove/append sequences cannot grow plan depth unboundedly
      st.patches))
    true
  }

  /** op 11/12 `update` / `update_all` (database.py:976-1062): rewrite
    * matching rows; tags/fields are merged (dict.update semantics),
    * `unset*` keys dropped. Copy-on-write commit, the analogue of the
    * temp-swap (§3.3). Returns the number of points actually CHANGED —
    * reference semantics (database.py:1148-1223 tracks a before-image
    * per point) — not merely matched.
    */
  def update(
      q: Q,
      time: Option[Instant] = None,
      measurement: Option[String] = None,
      tags: Map[String, String] = Map.empty,
      fields: Map[String, Double] = Map.empty,
      unsetTags: Seq[String] = Nil,
      unsetFields: Seq[String] = Nil
  ): Long = {
    // snapshot token BEFORE planning: this method loads the store twice
    // (plan + changed-count) — a concurrent append landing between the
    // loads must fail the overwrite's staleness check, not be adopted
    // as the baseline by the second load
    val tok = storage.snapshotToken()
    val c = rawCond(q)
    val (updated, changedCond) = GraftDB.updatePlan(df, c,
      time.map(t => (_: Column) => lit(java.sql.Timestamp.from(t))),
      measurement.map(m => (_: Column) => lit(m)),
      GraftDB.mergeMapFn(tags, unsetTags),
      GraftDB.mergeMapFn(fields, unsetFields))
    val changed = df.filter(coalesce(c, lit(false)) && changedCond).count()
    if (changed > 0) {
      // literal updates translate to slot columns — patch the live
      // index in place instead of discarding it (the reference
      // repositions its entries on update, index.py:504-514, 897-935)
      patchIndexAfterUpdate(q, time, measurement, tags, fields, unsetTags, unsetFields)
      storage.overwriteAt(updated, tok)
    }
    changed
  }

  /** In-place index patch for LITERAL updates: one stacked projection
    * over the live view rewrites matched rows' flat columns — time and
    * measurement directly, each updated tag/field as (value, TRUE)
    * into its slot, each unset key as (typed-null, FALSE). Brand-new
    * keys extend the slot layout exactly like [[tryExtendIndex]] (old
    * rows read value-null/presence-FALSE). The zonemap WIDENS to admit
    * an updated time (a superset of the true bounds stays sound for
    * the emptiness proof). Callable updates ([[updateWith]]) keep
    * invalidate — an arbitrary map transform has no slot translation.
    * Catalyst note: predicates over patched columns become CASE
    * expressions after pushdown, which cached-batch min/max pruning
    * simply declines to prune — stale-stat pruning is impossible by
    * construction.
    */
  private def patchIndexAfterUpdate(
      q: Q, time: Option[Instant], measurement: Option[String],
      tags: Map[String, String], fields: Map[String, Double],
      unsetTags: Seq[String], unsetFields: Seq[String]): Unit = indexedState match {
    // complete layouts only: an incomplete (cardinality-capped) view
    // retains the raw map columns for the cold tail, and a slot-only
    // patch would leave those maps stale — invalidate instead (the
    // reference's own update path fully rebuilds too,
    // database.py:1583-1591; auto_index re-reads on next search).
    case Some(st) if st.patches < MaxIndexPatches && st.layout.complete =>
      val newTagKeys = tags.keys.filterNot(st.layout.tagSlots.contains).toSeq.sorted
      val newFieldKeys = fields.keys.filterNot(st.layout.fieldSlots.contains).toSeq.sorted
      val tagSlots = st.layout.tagSlots ++
        newTagKeys.zipWithIndex.map { case (k, i) => k -> (st.layout.tagSlots.size + i) }
      val fieldSlots = st.layout.fieldSlots ++
        newFieldKeys.zipWithIndex.map { case (k, i) => k -> (st.layout.fieldSlots.size + i) }
      // rows that never carried a brand-new key: typed-null, FALSE (a
      // null presence bit would break NOT/exists — same rule as
      // tryExtendIndex)
      val base = st.view.select(
        st.view.columns.map(col).toSeq ++
          newTagKeys.map(k => lit(null).cast("string").as(s"__tv_${tagSlots(k)}")) ++
          newTagKeys.map(k => lit(false).as(s"__tp_${tagSlots(k)}")) ++
          newFieldKeys.map(k => lit(null).cast("double").as(s"__fv_${fieldSlots(k)}")) ++
          newFieldKeys.map(k => lit(false).as(s"__fp_${fieldSlots(k)}")): _*)
      // the match predicate compiles against the PRE-extension layout
      // (complete, so keys absent from it are genuinely missing)
      val m = coalesce(QueryCompiler.compile(q, st.layout), lit(false))
      // update() semantics: updates win over unset for a key in both
      val clearTags = unsetTags.filterNot(tags.contains).filter(tagSlots.contains)
      val clearFields = unsetFields.filterNot(fields.contains).filter(fieldSlots.contains)
      val replacements: Map[String, Column] =
        time.map(t => Point.TimeCol ->
          when(m, lit(java.sql.Timestamp.from(t))).otherwise(col(Point.TimeCol))).toMap ++
        measurement.map(v => Point.MeasurementCol ->
          when(m, lit(v)).otherwise(col(Point.MeasurementCol))).toMap ++
        tags.flatMap { case (k, v) =>
          val i = tagSlots(k)
          Seq(s"__tv_$i" -> when(m, lit(v)).otherwise(col(s"__tv_$i")),
            s"__tp_$i" -> when(m, lit(true)).otherwise(col(s"__tp_$i")))
        } ++
        clearTags.flatMap { k =>
          val i = tagSlots(k)
          Seq(s"__tv_$i" -> when(m, lit(null).cast("string")).otherwise(col(s"__tv_$i")),
            s"__tp_$i" -> when(m, lit(false)).otherwise(col(s"__tp_$i")))
        } ++
        fields.flatMap { case (k, v) =>
          val i = fieldSlots(k)
          Seq(s"__fv_$i" -> when(m, lit(v)).otherwise(col(s"__fv_$i")),
            s"__fp_$i" -> when(m, lit(true)).otherwise(col(s"__fp_$i")))
        } ++
        clearFields.flatMap { k =>
          val i = fieldSlots(k)
          Seq(s"__fv_$i" -> when(m, lit(null).cast("double")).otherwise(col(s"__fv_$i")),
            s"__fp_$i" -> when(m, lit(false)).otherwise(col(s"__fp_$i")))
        }
      val patched = base.select(base.columns.map(n =>
        replacements.getOrElse(n, col(n)).as(n)): _*)
      val bounds = (st.timeBounds, time) match {
        case (Some((lo, hi)), Some(t)) =>
          Some((if (t.isBefore(lo)) t else lo, if (t.isAfter(hi)) t else hi))
        case (b, _) => b
      }
      indexedState = Some(st.copy(view = patched,
        layout = IndexedLayout(tagSlots, fieldSlots, complete = true),
        timeBounds = bounds, patches = st.patches + 1))
    case Some(_) => invalidateIndex()
    case None    => ()
  }

  /** Callable-update form (reference `update(fields=lambda …)`,
    * database.py:1064-1225): each transform maps the OLD attribute
    * column to its new value as a Column expression — declarative, so it
    * stays inside codegen, unlike the reference's opaque lambdas.
    */
  def updateWith(
      q: Q,
      time: Option[Column => Column] = None,
      measurement: Option[Column => Column] = None,
      tags: Option[Column => Column] = None,
      fields: Option[Column => Column] = None
  ): Long = {
    val tok = storage.snapshotToken() // before planning — see update()
    val c = rawCond(q)
    val (updated, changedCond) = GraftDB.updatePlan(df, c, time, measurement, tags, fields)
    val changed = df.filter(coalesce(c, lit(false)) && changedCond).count()
    if (changed > 0) { invalidateIndex(); storage.overwriteAt(updated, tok) }
    changed
  }

  def updateAll(
      time: Option[Instant] = None,
      measurement: Option[String] = None,
      tags: Map[String, String] = Map.empty,
      fields: Map[String, Double] = Map.empty,
      unsetTags: Seq[String] = Nil,
      unsetFields: Seq[String] = Nil
  ): Long = update(Noop, time, measurement, tags, fields, unsetTags, unsetFields)

  /** Pure (non-persisting) form of the literal update transform — also
    * the unit the oracle checks.
    */
  def updatedDF(
      base: DataFrame,
      c: Column,
      time: Option[Instant],
      measurement: Option[String],
      tags: Map[String, String],
      fields: Map[String, Double],
      unsetTags: Seq[String],
      unsetFields: Seq[String]
  ): DataFrame = GraftDB.updatePlan(base, c,
    time.map(t => (_: Column) => lit(java.sql.Timestamp.from(t))),
    measurement.map(m => (_: Column) => lit(m)),
    GraftDB.mergeMapFn(tags, unsetTags),
    GraftDB.mergeMapFn(fields, unsetFields))._1

  /** Pure (non-persisting) form of the CALLABLE update transform
    * (reference `update(fields=lambda …)`) — also the unit the q91
    * oracle checks with CASE arithmetic.
    */
  def updatedWithDF(
      base: DataFrame,
      c: Column,
      time: Option[Column => Column] = None,
      measurement: Option[Column => Column] = None,
      tags: Option[Column => Column] = None,
      fields: Option[Column => Column] = None
  ): DataFrame = GraftDB.updatePlan(base, c, time, measurement, tags, fields)._1

  /** How many remove-patches an index view may stack before a remove
    * invalidates instead of patching: each patch adds one Filter node
    * over the cached segments, and an unbounded chain would grow plan
    * (and per-query planning) depth with the remove count — the same
    * bound rationale as [[MaxIndexDeltaSegments]].
    */
  private val MaxIndexPatches = 16

  /** Subtract a removal from the live index instead of discarding it —
    * the analogue of the reference PATCHING its postings on remove
    * (index.py:476-484, 823-895) rather than invalidating. The cached
    * columnar segments stay cached untouched; the view gains one
    * anti-filter compiled against the INDEXED layout (the same compiler
    * contract that makes q03 ≡ q83). Time bounds are kept as-is: a
    * removal can only shrink the true range, and the zonemap's
    * emptiness proof is sound for any superset of the actual bounds.
    *
    * Caveat (documented, loud-failure): the cached segments snapshot
    * the pre-remove storage files. On a file-backed store the remove
    * rewrites those files, so if a cached block is ever LOST and must
    * recompute (executor loss on a cluster; never in local mode), the
    * scan fails loudly with the stale file list — the caller reindexes.
    * It cannot return wrong data.
    */
  private def patchIndexAfterRemove(q: Q): Unit = indexedState match {
    case Some(st) if st.patches < MaxIndexPatches =>
      val drop = coalesce(QueryCompiler.compile(q, st.layout), lit(false))
      indexedState = Some(st.copy(view = st.view.filter(!drop), patches = st.patches + 1))
    case Some(_) => invalidateIndex()
    case None    => ()
  }

  /** op 13 `remove` (database.py:707-725): anti-filter rewrite. */
  def remove(q: Q): Long = {
    val tok = storage.snapshotToken() // before planning — see update()
    // keep-set negation must coerce null→false first: a bare !c is null
    // (row silently dropped = data loss) for rows where the predicate
    // null-evaluates, e.g. a missing map key
    val c = coalesce(rawCond(q), lit(false))
    val removed = df.filter(c).count()
    if (removed > 0) { patchIndexAfterRemove(q); storage.overwriteAt(df.filter(!c), tok) }
    removed
  }

  /** op 14 `remove_all` (database.py:727-738). */
  def removeAll(): Unit = { invalidateIndex(); storage.overwrite(df.limit(0)) }

  /** op 15 `drop_measurement` (database.py:293-313): same subtract-
    * patch treatment as [[remove]] (the measurement leaf compiles to a
    * flat column on both layouts).
    */
  def dropMeasurement(name: String): Long = {
    val tok = storage.snapshotToken() // before planning — see update()
    val c = coalesce(col(Point.MeasurementCol) === name, lit(false))
    val removed = df.filter(c).count()
    if (removed > 0) {
      patchIndexAfterRemove(graft.query.MeasurementQuery() === name)
      storage.overwriteAt(df.filter(!c), tok)
    }
    removed
  }

  // ---- metadata ops (ops 16-21) -------------------------------------------

  private def scoped(measurement: Option[String]): DataFrame =
    measurement.fold(df)(m => df.filter(col(Point.MeasurementCol) === m))

  /** op 16 `get_measurements` (database.py:459-477). */
  def measurementsDF: DataFrame =
    df.select(Point.MeasurementCol).distinct().orderBy(Point.MeasurementCol)

  def getMeasurements: Seq[String] = measurementsDF.as[String].collect().toSeq

  /** op 17 `get_field_keys` (database.py:388-419). */
  def fieldKeysDF(measurement: Option[String] = None): DataFrame =
    scoped(measurement).select(explode(map_keys(col(Point.FieldsCol))).as("field_key"))
      .distinct().orderBy("field_key")

  def getFieldKeys(measurement: Option[String] = None): Seq[String] =
    fieldKeysDF(measurement).as[String].collect().toSeq

  /** op 18 `get_tag_keys` (database.py:479-510). */
  def tagKeysDF(measurement: Option[String] = None): DataFrame =
    scoped(measurement).select(explode(map_keys(col(Point.TagsCol))).as("tag_key"))
      .distinct().orderBy("tag_key")

  def getTagKeys(measurement: Option[String] = None): Seq[String] =
    tagKeysDF(measurement).as[String].collect().toSeq

  /** op 19 `get_field_values` (database.py:421-457): values of one field
    * key in INSERTION order; rows lacking the key are skipped (not null).
    */
  def fieldValuesDF(fieldKey: String, measurement: Option[String] = None): DataFrame =
    scoped(measurement)
      .filter(map_contains_key(col(Point.FieldsCol), fieldKey))
      .orderBy(Point.SeqCol)
      .select(element_at(col(Point.FieldsCol), fieldKey).as(fieldKey))

  def getFieldValues(fieldKey: String, measurement: Option[String] = None): Seq[java.lang.Double] =
    fieldValuesDF(fieldKey, measurement).collect().toSeq.map(r =>
      if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0)))

  /** op 20 `get_tag_values` (database.py:512-558): distinct values per
    * requested key (all keys when none requested), nulls first.
    */
  def tagValuesDF(tagKeys: Seq[String] = Nil, measurement: Option[String] = None): DataFrame = {
    val exploded = scoped(measurement)
      .select(explode(col(Point.TagsCol)).as(Seq("tag_key", "tag_value")))
    val filtered = if (tagKeys.isEmpty) exploded else exploded.filter(col("tag_key").isin(tagKeys: _*))
    filtered.distinct().orderBy(col("tag_key"), col("tag_value").asc_nulls_first)
  }

  def getTagValues(tagKeys: Seq[String] = Nil, measurement: Option[String] = None): Map[String, Seq[String]] = {
    val base = tagValuesDF(tagKeys, measurement).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    // requested-but-absent keys present with empty value lists, as in the reference
    tagKeys.foldLeft(base)((acc, k) => if (acc.contains(k)) acc else acc + (k -> Seq.empty))
  }

  /** op 21 `get_timestamps` (database.py:560-598): insertion order. */
  def timestampsDF(measurement: Option[String] = None): DataFrame =
    scoped(measurement).orderBy(Point.SeqCol).select(Point.TimeCol)

  def getTimestamps(measurement: Option[String] = None): Seq[Instant] =
    timestampsDF(measurement).collect().toSeq.map(_.getAs[java.sql.Timestamp](0).toInstant)

  /** Fold the parquet delta tier into the partitioned main store (see
    * [[ParquetStorage.compact]]); invalidates any built index FIRST —
    * compaction deletes the files a cached view's snapshot lists.
    * No-op on non-parquet backends.
    */
  def compact(): Unit = {
    guardOpen()
    invalidateIndex()
    storage match {
      case p: ParquetStorage  => p.compact()
      case m: ManifestStorage => m.compact()
      case _                  => ()
    }
  }

  /** TIME-BASED RETENTION — remove every point with time < `olderThan`
    * (the InfluxDB retention-policy shape the reference's data model
    * mimics: "expire data older than 90 days"). NULL times are kept,
    * matching the DSL's missing→False contract, so `retain(t)` always
    * equals `remove(TimeQuery() < t)` in RESULT. In COST they differ
    * completely on the parquet backend: [[ParquetStorage.retainBefore]]
    * drops whole time partitions and whole delta files by directory
    * listing + parquet footer stats — O(dropped + straddling), never
    * O(store) — with a filtered rewrite only for files straddling the
    * cutoff. Other backends fall back to the remove() COW rewrite.
    * Returns the number of points removed.
    */
  def retain(olderThan: Instant): Long = {
    guardOpen()
    storage match {
      case p: ParquetStorage =>
        val micros = Math.addExact(
          Math.multiplyExact(olderThan.getEpochSecond, 1000000L),
          olderThan.getNano / 1000L)
        val removed = p.retainBefore(micros)
        // same index treatment as remove(): subtract the dropped range
        // from the live view (or invalidate past the patch budget)
        if (removed > 0) patchIndexAfterRemove(TimeQuery() < olderThan)
        removed
      case _ => remove(TimeQuery() < olderThan)
    }
  }

  /** op 22 `measurement` (database.py:658-685): named table view. */
  def measurement(name: String): Measurement = new Measurement(this, name)

  /** Index observability (reference `db.index.valid`,
    * database.py:123-141): true iff a reindex()-built view is live —
    * i.e. no write has invalidated it.
    */
  def indexValid: Boolean = indexedState.isDefined

  /** Index-shape observability (and the cardinality-guard audit hooks):
    * width of the live cached view in columns, and whether the layout
    * columnarized EVERY key (false ⇒ the cap kicked in and the cold
    * tail rides map access).
    */
  def indexColumnCount: Option[Int] = indexedState.map(_.view.columns.length)
  def indexComplete: Option[Boolean] = indexedState.map(_.layout.complete)

  /** Precompiled query — the analogue of the reference holding a
    * compiled query object and re-running it against its index
    * (queries.py:471-504 SimpleQuery). The returned DataFrame memoizes
    * its analyzed/optimized/physical plan, so repeated actions pay
    * execution only, not re-planning. Valid until the next write
    * (which invalidates the index the plan may reference) — re-prepare
    * after mutations, exactly as the reference re-resolves after its
    * index invalidates.
    */
  def prepare(q: Q): DataFrame = filterPlan(q)

  /** op 23 `reindex` (database.py:687-705): build the engine's index —
    * a cached view with every tag/field key columnarized into flat
    * value/presence columns (slot-numbered to dodge key-name escaping).
    * Predicates then scan pruned atomic columns with cached-batch
    * min/max stats instead of decoding MapType per row — the columnar
    * analogue of the reference's inverted index. Parquet-tier pruning
    * (partitioning + row-group stats) is unaffected and needs no index;
    * this accelerates the hot cached working set. A TIME-ORDERED append
    * extends the index in place ([[tryExtendIndex]] — the reference's
    * in-order index extension, index.py:429-456); any other write
    * invalidates it, mirroring the reference's index invalidation
    * (database.py:1280-1289).
    */
  def reindex(): Unit = {
    invalidateIndex()
    // ONE key-discovery job for both universes (was two explode+distinct
    // jobs): kind-tagged keys explode together, one grouped shuffle —
    // the scalable shape (per-row arrays never accumulate in one
    // buffer, unlike a collect_list agg), half the build's job count.
    // The count per key is free on the same shuffle (partial agg) and
    // feeds the cardinality guard below.
    val keyRows = df.select(explode(concat(
        transform(map_keys(col(Point.TagsCol)), k => struct(lit("t").as("kind"), k.as("k"))),
        transform(map_keys(col(Point.FieldsCol)), k => struct(lit("f").as("kind"), k.as("k")))))
        .as("e"))
      .select(col("e.kind"), col("e.k"))
      .groupBy("kind", "k").agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // CARDINALITY GUARD: every columnarized key costs two flat columns
    // in the cached view, and a schemaless store that drifted to 10k+
    // distinct keys would otherwise build a 20k-column plan — Catalyst
    // analysis blowup before any data moves (the reference's dict index
    // is cardinality-proof, index.py:112-114; this is our equivalent).
    // Above the cap, only the hottest keys by row frequency get slots;
    // the cold tail compiles through map access (IndexedLayout
    // .complete = false), so the MAP columns stay in the cached view.
    val maxSlots = math.max(1, spark.conf.getOption("graft.index.maxColumnarKeys")
      .map(_.toInt).getOrElse(GraftDB.DefaultMaxColumnarKeys))
    val complete = keyRows.length <= maxSlots
    val hot =
      if (complete) keyRows
      else keyRows.sortBy { case (kind, k, n) => (-n, kind, k) }.take(maxSlots)
    val tagKeys = hot.collect { case ("t", k, _) => k }.sorted.toSeq
    val fieldKeys = hot.collect { case ("f", k, _) => k }.sorted.toSeq
    // Primitives-only cache when the layout is COMPLETE: the map
    // columns are NOT stored — the slots cover every key, and
    // filterPlan rebuilds the maps for matched rows. Cached batches
    // hold only atomic columns, so scans never pay per-row map
    // materialization and the cache is roughly half the size. An
    // INCOMPLETE layout keeps the two map columns so cold-tail keys
    // filter (and project) straight off the maps.
    val cols = Seq(col(Point.TimeCol), col(Point.MeasurementCol), col(Point.SeqCol)) ++
      tagKeys.zipWithIndex.flatMap { case (k, i) => Seq(
        element_at(col(Point.TagsCol), k).as(s"__tv_$i"),
        map_contains_key(col(Point.TagsCol), k).as(s"__tp_$i")) } ++
      fieldKeys.zipWithIndex.flatMap { case (k, i) => Seq(
        element_at(col(Point.FieldsCol), k).as(s"__fv_$i"),
        map_contains_key(col(Point.FieldsCol), k).as(s"__fp_$i")) } ++
      (if (complete) Nil else Seq(col(Point.TagsCol), col(Point.FieldsCol)))
    // Time-sorted layout: cached-batch min/max stats on `time` then
    // prune range queries to the few batches that overlap — the columnar
    // analogue of the reference's sorted-timestamp index binary search
    // (index.py:719-821; its reindex also re-sorts the full store).
    // Partition count follows the DATA SIZE (Catalyst stats estimate /
    // files.maxPartitionBytes — no RDD conversion, no job) so per-task
    // scheduling overhead doesn't grow with shuffle.partitions on
    // sub-second point queries, and cached batches stay ~split-sized
    // at scale.
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val sized = math.max(1L, math.min(Int.MaxValue.toLong,
      ((estBytes + splitBytes - 1) / splitBytes).toLong)).toInt
    // Floor at a modest slice of the cores: the size estimate alone
    // gives a hot-but-small working set only 1-2 partitions, leaving
    // the rest of the executor idle on every point query (measured 2×
    // on sf0.1: 38 ms → 19 ms with a 16-task wave, and finer
    // time-range partitions prune better too). The size term dominates
    // at real scale, keeping cached batches ~split-sized; the cap keeps
    // tiny test datasets from paying 100s of empty-task launches.
    val nParts = math.max(sized, math.min(spark.sparkContext.defaultParallelism, 16))
    val idf = df.select(cols: _*)
      .repartitionByRange(nParts, col(Point.TimeCol))
      .sortWithinPartitions(Point.TimeCol)
      .cache()
    idf.count()
    // zonemap tier: global [min,max] time, read off the fresh cache
    val bounds = idf.agg(min(Point.TimeCol), max(Point.TimeCol)).head() match {
      case r if r.isNullAt(0) => None
      case r => Some((r.getTimestamp(0).toInstant, r.getTimestamp(1).toInstant))
    }
    indexedState = Some(IndexState(idf,
      IndexedLayout(tagKeys.zipWithIndex.toMap, fieldKeys.zipWithIndex.toMap,
        complete = complete),
      bounds, List(idf)))
  }
}

object GraftDB {

  /** Cap on columnarized index slots (override per session with conf
    * `graft.index.maxColumnarKeys`). Each slot is two flat columns in
    * the cached view; 256 hot keys → ~515 columns, comfortably inside
    * Catalyst's analysis budget, while a schemaless store drifted to
    * 10k distinct keys stays indexable (cold tail via map access).
    */
  val DefaultMaxColumnarKeys = 256

  /** Canonical-schema empty result as a LocalRelation: collecting it
    * launches no job at all (unlike an empty RDD scan, which still
    * schedules a stage).
    */
  private[engine] def emptyLocal(spark: SparkSession): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), Point.schema)

  /** Rebuild a map column from slot-numbered (value, presence) flat
    * columns: keep slots whose presence bit is set (a key may be present
    * with a NULL value, so presence — not value non-nullness — decides
    * membership). Runs only on rows that survived the filter; key order
    * is slot order (alphabetical), which is content-equivalent to the
    * source map.
    */
  private[engine] def rebuildMap(slots: Map[String, Int], vPrefix: String, pPrefix: String,
      valueType: String): Column =
    if (slots.isEmpty)
      map_from_arrays(lit(Array.empty[String]), lit(Array.empty[String]).cast(s"array<$valueType>"))
    else {
      // concat of per-slot conditional singleton arrays, NOT a
      // filter/transform lambda chain: higher-order functions fall out
      // of whole-stage codegen, and this projection runs per matched row
      // on the wide-output queries (~50% selectivity scans).
      val entries = slots.toSeq.sortBy(_._1).map { case (k, i) =>
        val one = array(struct(lit(k).as("k"), col(s"$vPrefix$i").as("v")))
        when(col(s"$pPrefix$i"), one).otherwise(slice(one, 1, 0))
      }
      map_from_entries(concat(entries: _*))
    }

  /** dict.update + unset semantics on a map column as a transform. */
  private[engine] def mergeMapFn(updates: Map[String, _], unset: Seq[String]): Option[Column => Column] =
    if (updates.isEmpty && unset.isEmpty) None
    else Some { mapCol =>
      val dropped = (updates.keySet ++ unset).toSeq
      val kept = map_filter(mapCol, (k, _) => !k.isin(dropped: _*))
      if (updates.isEmpty) kept
      else map_concat(kept,
        map(updates.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))
    }

  /** Build (updated projection, changed-row predicate), both evaluated
    * against the PRE-update row in one `select`. The match predicate is
    * computed once and every new value derives from the old columns —
    * sequential `withColumn` would re-resolve the predicate against
    * already-updated attributes (an update setting `time` guarded by a
    * time query would then mis-evaluate its tag/field clauses; the
    * reference evaluates the query once per point and applies all
    * updates atomically, database.py:1148-1223).
    */
  private[engine] def updatePlan(
      base: DataFrame,
      c: Column,
      time: Option[Column => Column],
      measurement: Option[Column => Column],
      tags: Option[Column => Column],
      fields: Option[Column => Column]
  ): (DataFrame, Column) = {
    val m = coalesce(c, lit(false))
    def upd(name: String, fn: Option[Column => Column]): Column =
      fn.fold(col(name))(f => when(m, f(col(name))).otherwise(col(name)))
    val news: Map[String, Column] = Map(
      Point.TimeCol -> upd(Point.TimeCol, time),
      Point.MeasurementCol -> upd(Point.MeasurementCol, measurement),
      Point.TagsCol -> upd(Point.TagsCol, tags),
      Point.FieldsCol -> upd(Point.FieldsCol, fields))
    // MapType has no direct equality in Spark; compare canonical sorted
    // entry arrays (null-safe) to detect actual change.
    def mapDiff(name: String): Column =
      !(array_sort(map_entries(col(name))) <=> array_sort(map_entries(news(name))))
    val diffs = Seq(
      time.map(_ => !(col(Point.TimeCol) <=> news(Point.TimeCol))),
      measurement.map(_ => !(col(Point.MeasurementCol) <=> news(Point.MeasurementCol))),
      tags.map(_ => mapDiff(Point.TagsCol)),
      fields.map(_ => mapDiff(Point.FieldsCol))).flatten
    val changed = diffs.reduceOption(_ || _).getOrElse(lit(false))
    val updated = base.select(Point.columns.map(n => news.getOrElse(n, col(n)).as(n)): _*)
    (updated, changed)
  }

  /** In-memory database (reference MemoryStorage). */
  def inMemory(spark: SparkSession, autoIndex: Boolean = false): GraftDB =
    new GraftDB(new MemoryStorage(spark), autoIndex)

  /** In-memory database seeded from an existing canonical-schema DF. */
  def fromDataFrame(df: DataFrame, autoIndex: Boolean = false): GraftDB =
    new GraftDB(new MemoryStorage(df.sparkSession, Some(df)), autoIndex)

  /** Database on a reference-format CSV file (drop-in migration: open
    * an existing tinyflux data file directly). `accessMode` mirrors the
    * reference's `access_mode` kwarg (storages.py:196-261): 'r', 'r+'
    * (default), 'w', 'w+', 'a', 'a+' with python open() semantics.
    */
  def atCsv(spark: SparkSession, path: String, compactPrefixes: Boolean = false,
      readOnly: Boolean = false, accessMode: String = "r+",
      flushOnInsert: Boolean = true, encoding: String = "UTF-8",
      newline: String = "", createDirs: Boolean = false,
      autoIndex: Boolean = false): GraftDB =
    new GraftDB(new CsvStorage(spark, path, compactPrefixes, readOnly, accessMode,
      flushOnInsert, encoding, newline, createDirs), autoIndex)

  /** Context-manager analogue of `with TinyFlux(...) as db:`
    * (database.py:126-146) — close() is guaranteed on exit.
    */
  def using[A](db: GraftDB)(f: GraftDB => A): A =
    try f(db) finally db.close()

  /** Parquet-backed persistent database (reference CSVStorage).
    *
    * On filesystems WITHOUT atomic+exclusive rename (S3-style object
    * stores — see [[graft.util.FsContract]]) this opens the
    * MANIFEST-AUTHORITATIVE backend instead of refusing: readers
    * resolve a committed manifest rather than directory listings, and
    * the commit point is one create-only object publish, the primitive
    * those stores do provide ([[ManifestStorage]]). Deployments that
    * layered atomic rename on top of an object store and set
    * `graft.storage.assumeAtomicRename` keep the rename-committing
    * [[ParquetStorage]] exactly as before.
    */
  def atPath(spark: SparkSession, root: String, partitioned: Boolean = true,
      autoIndex: Boolean = false): GraftDB = {
    val renameSafe = graft.util.FsContract.AtomicRenameSchemes(
      graft.util.FsContract.schemeOf(root)) ||
      spark.conf.get(graft.util.FsContract.OverrideKey, "false")
        .equalsIgnoreCase("true") ||
      spark.sparkContext.hadoopConfiguration
        .getBoolean(graft.util.FsContract.OverrideKey, false)
    if (renameSafe)
      new GraftDB(new ParquetStorage(spark, root, partitioned), autoIndex)
    else new GraftDB(new ManifestStorage(spark, root), autoIndex)
  }

  /** Force the manifest-authoritative backend on any filesystem —
    * object stores (its reason to exist) or rename-capable ones (where
    * its publish path uses tmp+exclusive-rename and is airtight; the
    * mode every [[ManifestStorage]] crash-window spec runs in).
    */
  def atManifest(spark: SparkSession, root: String, autoIndex: Boolean = false): GraftDB =
    new GraftDB(new ManifestStorage(spark, root), autoIndex)

  /** Database on a directory of JSON-lines shards — the interchange
    * tier for LLM-data tooling (see [[JsonlStorage]] for the line
    * format and why `_seq` travels in the data).
    */
  def atJsonl(spark: SparkSession, root: String, autoIndex: Boolean = false): GraftDB =
    new GraftDB(new JsonlStorage(spark, root), autoIndex)
}
