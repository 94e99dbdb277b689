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

  private def tagVal(key: String)(implicit layout: IndexedLayout): Column =
    layout.tagValue(key).getOrElse(element_at(col(Point.TagsCol), key))
  private def fieldVal(key: String)(implicit layout: IndexedLayout): Column =
    layout.fieldValue(key).getOrElse(element_at(col(Point.FieldsCol), key))
  private def tagHas(key: String)(implicit layout: IndexedLayout): Column =
    layout.tagPresent(key).getOrElse(map_contains_key(col(Point.TagsCol), key))
  private def fieldHas(key: String)(implicit layout: IndexedLayout): Column =
    layout.fieldPresent(key).getOrElse(map_contains_key(col(Point.FieldsCol), key))

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
        val u = udf((v: Double) => f(v))
        cmp(u(fieldVal(key)), op, lit(rhs))

      case Noop | And(_, _) | Or(_, _) | Not(_) =>
        throw new IllegalStateException(s"not a leaf: $q")
    }
  }
}

/** Which tag/field keys have been columnarized by `GraftDB.reindex()`
  * into flat value/presence columns (slot-numbered to dodge key-name
  * escaping), and the column-name scheme for them.
  */
final case class IndexedLayout(tagSlots: Map[String, Int], fieldSlots: Map[String, Int]) {
  def tagValue(key: String): Option[Column] = tagSlots.get(key).map(i => col(s"__tv_$i"))
  def tagPresent(key: String): Option[Column] = tagSlots.get(key).map(i => col(s"__tp_$i"))
  def fieldValue(key: String): Option[Column] = fieldSlots.get(key).map(i => col(s"__fv_$i"))
  def fieldPresent(key: String): Option[Column] = fieldSlots.get(key).map(i => col(s"__fp_$i"))
}

object IndexedLayout {
  val empty: IndexedLayout = IndexedLayout(Map.empty, Map.empty)
}
