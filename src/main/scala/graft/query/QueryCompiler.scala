package graft.query

import java.sql.Timestamp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Point

/** Lowers a [[Q]] AST to one Catalyst `Column`.
  *
  * This is the whole "optimizer story" of the engine: by emitting a
  * plain declarative boolean expression, every reference index trick
  * (SURVEY.md §2.3/§4 — sorted-timestamp bisect, inverted tag index,
  * posting-set algebra) is subsumed by Catalyst predicate pushdown,
  * Parquet row-group stats and partition pruning. No custom Rule needed.
  *
  * The non-trivial part is Boolean semantics: the reference evaluates
  * missing keys / failed comparisons to False and composes `~` over
  * that (queries.py:243-250, 471-482), whereas Spark uses three-valued
  * logic where null-out comparisons disappear under a filter AND flip
  * to null (not true) under NOT.
  *
  * Placement of the null→False coercion matters for SCALE: under AND/OR
  * at a top-level Filter, null already behaves exactly like False (only
  * true rows survive; null&&x / null||false stay non-true), and a bare
  * `time >= lit` comparison translates to a Parquet `PushedFilters`
  * entry — but `coalesce(cmp, false)` does NOT (the source API has no
  * such filter), which would silently disable row-group pruning on
  * every predicate. So leaves compile BARE, and the single place where
  * null and False genuinely differ — under `~` — wraps its operand in
  * `coalesce(…, false)` before negating, making `!` a faithful
  * complement of the evaluated-to-False semantics.
  */
object QueryCompiler {

  /** Compile to a non-null boolean Column (never null for any row). */
  def compile(q: Q): Column = compile(q, IndexedLayout.empty)

  /** Layout-aware compile: leaves over keys that [[IndexedLayout]] has
    * columnarized read the flat value/presence columns instead of map
    * lookups — same semantics, but the scan touches only the pruned
    * atomic columns (the cached-plan analogue of the reference's
    * inverted index, index.py:506-580).
    */
  def compile(q: Q, layout: IndexedLayout): Column = q match {
    case Noop      => lit(true)
    case And(l, r) => compile(l, layout) && compile(r, layout)
    case Or(l, r)  => compile(l, layout) || compile(r, layout)
    case Not(i)    => !coalesce(compile(i, layout), lit(false))
    case leaf      => leafCol(leaf, layout)
  }

  // A COMPLETE layout columnarized every key in the data (reindex always
  // does; any write invalidates it), so a key it doesn't know is absent
  // from every row: value resolves null, presence false — letting the
  // indexed view drop the map columns entirely.
  private def tagVal(key: String)(implicit layout: IndexedLayout): Column =
    layout.tagValue(key).getOrElse(
      if (layout.complete) lit(null).cast("string")
      else element_at(col(Point.TagsCol), key))
  private def fieldVal(key: String)(implicit layout: IndexedLayout): Column =
    layout.fieldValue(key).getOrElse(
      if (layout.complete) lit(null).cast("double")
      else element_at(col(Point.FieldsCol), key))
  private def tagHas(key: String)(implicit layout: IndexedLayout): Column =
    layout.tagPresent(key).getOrElse(
      if (layout.complete) lit(false)
      else map_contains_key(col(Point.TagsCol), key))
  private def fieldHas(key: String)(implicit layout: IndexedLayout): Column =
    layout.fieldPresent(key).getOrElse(
      if (layout.complete) lit(false)
      else map_contains_key(col(Point.FieldsCol), key))

  private def cmp(c: Column, op: CmpOp, rhs: Column): Column = op match {
    case CmpOp.Eq => c === rhs
    case CmpOp.Lt => c < rhs
    case CmpOp.Le => c <= rhs
    case CmpOp.Gt => c > rhs
    case CmpOp.Ge => c >= rhs
    case CmpOp.Ne => c =!= rhs // callers with map semantics override (see neOnMap)
  }

  /** Reference `!=` on tags/fields: key must resolve (missing → False),
    * but a present-and-null value compares True (Python `None != x`).
    * `!(v <=> rhs)` is exactly that: null-safe-equal is false for null
    * vs literal, negated → true.
    */
  private def neOnMap(present: Column, value: Column, rhs: Column): Column =
    present && !(value <=> rhs)

  /** Python-`re.match` anchors at the start only; `re.search` is
    * substring. Java `rlike` is substring, so `matches` compiles to a
    * start-anchored non-capturing group (queries.py:692). `flags` become
    * an inline group prefix (`(?i)` etc.) — the reference's `re`-flags
    * argument (queries.py:680-722).
    */
  private def regex(c: Column, rx: String, anchored: Boolean, flags: String = ""): Column = {
    require(flags.forall("idmsuxU".contains(_)), s"unsupported regex flags '$flags'")
    val prefix = if (flags.isEmpty) "" else s"(?$flags)"
    if (anchored) c.rlike(prefix + "^(?:" + rx + ")") else c.rlike(prefix + rx)
  }

  private def leafCol(q: Q, l: IndexedLayout): Column = {
    implicit val layout: IndexedLayout = l
    q match {
      case TimeCmp(op, rhs) =>
        cmp(col(Point.TimeCol), op, lit(Timestamp.from(rhs)))

      case TimeTest(f) =>
        val u = udf((t: Timestamp) =>
          try f(t.toInstant) catch { case _: Exception => false })
        u(col(Point.TimeCol))

      case TimeMapCmp(f, op, rhs) =>
        // exception in the map path → null → coalesced False, the
        // reference's try/except path resolution (queries.py:471-504)
        val u = udf((t: Timestamp) =>
          try java.lang.Double.valueOf(f(t.toInstant))
          catch { case _: Exception => null.asInstanceOf[java.lang.Double] })
        cmp(u(col(Point.TimeCol)), op, lit(rhs))

      case MeasurementCmp(op, rhs) =>
        cmp(col(Point.MeasurementCol), op, lit(rhs))

      case MeasurementRegex(rx, anchored, flags) =>
        regex(col(Point.MeasurementCol), rx, anchored, flags)

      case MeasurementTest(f) =>
        val u = udf((m: String) => try f(m) catch { case _: Exception => false })
        u(col(Point.MeasurementCol))

      case MeasurementMapCmp(f, op, rhs) =>
        val u = udf((m: String) =>
          try f(m) catch { case _: Exception => null })
        cmp(u(col(Point.MeasurementCol)), op, lit(rhs))

      case TagCmp(key, CmpOp.Ne, rhs) =>
        neOnMap(tagHas(key), tagVal(key), lit(rhs))

      case TagCmp(key, op, rhs) =>
        cmp(tagVal(key), op, lit(rhs))

      case TagExists(key) =>
        // key-presence, NOT non-nullness: a tag may be present with a
        // null value (point.py:49-50).
        tagHas(key)

      case TagRegex(key, rx, anchored, flags) =>
        regex(tagVal(key), rx, anchored, flags)

      case TagTest(key, f) =>
        val u = udf((v: String) => try f(v) catch { case _: Exception => false })
        tagHas(key) && u(tagVal(key))

      case TagMapCmp(key, f, op, rhs) =>
        val u = udf((v: String) =>
          try f(v) catch { case _: Exception => null })
        cmp(u(tagVal(key)), op, lit(rhs))

      case DeadPath => lit(false)

      case FieldCmp(key, CmpOp.Ne, rhs) =>
        neOnMap(fieldHas(key), fieldVal(key), lit(rhs))

      case FieldCmp(key, op, rhs) =>
        cmp(fieldVal(key), op, lit(rhs))

      case FieldExists(key) =>
        fieldHas(key)

      case FieldTest(key, f) =>
        // exception inside the user predicate → False, matching the
        // reference's try/except evaluation (queries.py:243-250).
        val u = udf((v: java.lang.Double) => try f(v) catch { case _: Exception => false })
        fieldHas(key) && u(fieldVal(key))

      case FieldMapCmp(key, f, op, rhs) =>
        // exception in the (possibly chained) map → null → False under
        // the filter, like the other map families; a bare f(v) would
        // instead fail the whole task
        val u = udf((v: Double) =>
          try java.lang.Double.valueOf(f(v))
          catch { case _: Exception => null.asInstanceOf[java.lang.Double] })
        cmp(u(fieldVal(key)), op, lit(rhs))

      case Noop | And(_, _) | Or(_, _) | Not(_) =>
        throw new IllegalStateException(s"not a leaf: $q")
    }
  }
}

/** Driver-side time-interval analysis over a [[Q]] AST — the zonemap
  * tier of the index: `reindex()` records the data's global [min,max]
  * time, and a query whose time predicate provably cannot overlap it
  * short-circuits to an empty LocalRelation with ZERO jobs launched.
  * This is the exact analogue of the reference's sorted-index bisect
  * answering an out-of-range time query without touching points
  * (index.py:719-821), and of Parquet row-group min/max pruning one
  * level up. Analysis is conservative: anything it cannot bound is
  * "unbounded", which only forfeits the shortcut, never correctness.
  */
object TimeBounds {
  import java.time.Instant

  /** Closed over-approximation `[lo, hi]` of the times rows matching
    * `q` can have; `None` = unbounded on that side. Strict comparisons
    * widen to closed ones (safe); `Not`/tests/maps are unbounded.
    */
  // The compiled predicate compares against lit(Timestamp) at
  // MICROSECOND precision (TimestampType truncates), so the analysis
  // must truncate the same way — comparing raw nanosecond Instants
  // could prune a query whose floored literal still matches rows.
  private def us(t: Instant): Instant =
    t.truncatedTo(java.time.temporal.ChronoUnit.MICROS)

  private def interval(q: Q): (Option[Instant], Option[Instant]) = q match {
    case TimeCmp(CmpOp.Eq, t)               => (Some(us(t)), Some(us(t)))
    case TimeCmp(CmpOp.Ge | CmpOp.Gt, t)    => (Some(us(t)), None)
    case TimeCmp(CmpOp.Le | CmpOp.Lt, t)    => (None, Some(us(t)))
    case And(l, r) =>
      val ((ll, lh), (rl, rh)) = (interval(l), interval(r))
      (maxOpt(ll, rl), minOpt(lh, rh))
    case Or(l, r) =>
      val ((ll, lh), (rl, rh)) = (interval(l), interval(r))
      (for (a <- ll; b <- rl) yield if (a.isBefore(b)) a else b,
       for (a <- lh; b <- rh) yield if (a.isAfter(b)) a else b)
    case _ => (None, None)
  }

  private def maxOpt(a: Option[Instant], b: Option[Instant]) =
    (a.toSeq ++ b.toSeq).reduceOption((x, y) => if (x.isAfter(y)) x else y)
  private def minOpt(a: Option[Instant], b: Option[Instant]) =
    (a.toSeq ++ b.toSeq).reduceOption((x, y) => if (x.isBefore(y)) x else y)

  /** True iff no row with time in `[dataMin, dataMax]` can match `q`. */
  def provablyEmpty(q: Q, dataMin: Instant, dataMax: Instant): Boolean = {
    val (lo, hi) = interval(q)
    lo.exists(l => hi.exists(h => l.isAfter(h))) || // self-contradictory range
    lo.exists(_.isAfter(dataMax)) ||
    hi.exists(_.isBefore(dataMin))
  }
}

/** Which tag/field keys have been columnarized by `GraftDB.reindex()`
  * into flat value/presence columns (slot-numbered to dodge key-name
  * escaping), and the column-name scheme for them.
  *
  * `complete` = the slots cover EVERY key present in the data (true for
  * reindex-built layouts, which enumerate all keys and are invalidated
  * by writes). A complete layout needs no map-column fallback, so the
  * cached view can omit the map columns altogether.
  */
final case class IndexedLayout(
    tagSlots: Map[String, Int],
    fieldSlots: Map[String, Int],
    complete: Boolean = false) {
  def tagValue(key: String): Option[Column] = tagSlots.get(key).map(i => col(s"__tv_$i"))
  def tagPresent(key: String): Option[Column] = tagSlots.get(key).map(i => col(s"__tp_$i"))
  def fieldValue(key: String): Option[Column] = fieldSlots.get(key).map(i => col(s"__fv_$i"))
  def fieldPresent(key: String): Option[Column] = fieldSlots.get(key).map(i => col(s"__fp_$i"))
}

object IndexedLayout {
  val empty: IndexedLayout = IndexedLayout(Map.empty, Map.empty)
}
