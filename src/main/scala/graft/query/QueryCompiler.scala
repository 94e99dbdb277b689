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
  * to null (not true) under NOT. Every leaf is therefore coalesced to a
  * non-null boolean before any composition, making `!` a faithful
  * complement.
  */
object QueryCompiler {

  /** Compile to a non-null boolean Column (never null for any row). */
  def compile(q: Q): Column = q match {
    case Noop      => lit(true)
    case And(l, r) => compile(l) && compile(r)
    case Or(l, r)  => compile(l) || compile(r)
    case Not(i)    => !compile(i)
    case leaf      => coalesce(leafCol(leaf), lit(false))
  }

  private def tagVal(key: String): Column = element_at(col(Point.TagsCol), key)
  private def fieldVal(key: String): Column = element_at(col(Point.FieldsCol), key)

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
  private def neOnMap(mapCol: Column, key: String, value: Column, rhs: Column): Column =
    map_contains_key(mapCol, key) && !(value <=> rhs)

  /** Python-`re.match` anchors at the start only; `re.search` is
    * substring. Java `rlike` is substring, so `matches` compiles to a
    * start-anchored non-capturing group (queries.py:692).
    */
  private def regex(c: Column, rx: String, anchored: Boolean): Column =
    if (anchored) c.rlike("^(?:" + rx + ")") else c.rlike(rx)

  private def leafCol(q: Q): Column = q match {
    case TimeCmp(op, rhs) =>
      cmp(col(Point.TimeCol), op, lit(Timestamp.from(rhs)))

    case MeasurementCmp(op, rhs) =>
      cmp(col(Point.MeasurementCol), op, lit(rhs))

    case MeasurementRegex(rx, anchored) =>
      regex(col(Point.MeasurementCol), rx, anchored)

    case TagCmp(key, CmpOp.Ne, rhs) =>
      neOnMap(col(Point.TagsCol), key, tagVal(key), lit(rhs))

    case TagCmp(key, op, rhs) =>
      cmp(tagVal(key), op, lit(rhs))

    case TagExists(key) =>
      // key-presence, NOT non-nullness: a tag may be present with a
      // null value (point.py:49-50).
      map_contains_key(col(Point.TagsCol), key)

    case TagRegex(key, rx, anchored) =>
      regex(tagVal(key), rx, anchored)

    case TagTest(key, f) =>
      val u = udf((v: String) => try f(v) catch { case _: Exception => false })
      map_contains_key(col(Point.TagsCol), key) && u(tagVal(key))

    case FieldCmp(key, CmpOp.Ne, rhs) =>
      neOnMap(col(Point.FieldsCol), key, fieldVal(key), lit(rhs))

    case FieldCmp(key, op, rhs) =>
      cmp(fieldVal(key), op, lit(rhs))

    case FieldExists(key) =>
      map_contains_key(col(Point.FieldsCol), key)

    case FieldTest(key, f) =>
      // exception inside the user predicate → False, matching the
      // reference's try/except evaluation (queries.py:243-250).
      val u = udf((v: java.lang.Double) => try f(v) catch { case _: Exception => false })
      map_contains_key(col(Point.FieldsCol), key) && u(fieldVal(key))

    case FieldMapCmp(key, f, op, rhs) =>
      val u = udf((v: Double) => f(v))
      cmp(u(fieldVal(key)), op, lit(rhs))

    case Noop | And(_, _) | Or(_, _) | Not(_) =>
      throw new IllegalStateException(s"not a leaf: $q")
  }
}
