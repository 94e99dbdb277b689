package graft

import java.time.Instant

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.engine.GraftDB
import graft.model.Point
import graft.query._

/** Property test: the Catalyst compilation of EVERY query AST must
  * agree with a direct Scala interpreter of the reference's evaluation
  * rules (queries.py:243-250, 471-504 — resolve path, apply operator,
  * any error → False) on a corpus covering missing keys, present-null
  * values, and both measurements.
  */
class QuerySemanticsPropertySpec extends SparkSpec {

  private def t(s: String): Instant = Instant.parse(s)

  // corpus: every combination class — value present / present-null /
  // missing, across two tag keys and two field keys
  private lazy val pts: Seq[Point] = Seq(
    Point(t("2024-01-01T00:00:00Z"), "m1", Map("a" -> "x", "b" -> "y"), Map("f" -> 1.0, "g" -> 2.0), 0L),
    Point(t("2024-01-02T00:00:00Z"), "m1", Map("a" -> null), Map("f" -> null), 1L),
    Point(t("2024-01-03T00:00:00Z"), "m2", Map("b" -> "x"), Map("g" -> -1.0), 2L),
    Point(t("2024-01-04T00:00:00Z"), "m2", Map.empty, Map.empty, 3L),
    Point(t("2024-01-05T00:00:00Z"), "m3", Map("a" -> "xx", "b" -> null), Map("f" -> 0.0), 4L)
  )

  private lazy val db: GraftDB = {
    val d = GraftDB.inMemory(spark)
    d.insertMultiple(pts.map(_.copy(_seq = 0L)))
    d
  }
  // insertion rank identifies points (seq values are generation-coded)
  private lazy val rank: Map[Long, Int] =
    db.all(sorted = false).map(_._seq).zipWithIndex.toMap

  // ---- the reference-semantics interpreter ----

  private def cmpOp[T](op: CmpOp, a: T, b: T)(implicit o: Ordering[T]): Boolean = op match {
    case CmpOp.Eq => o.equiv(a, b)
    case CmpOp.Ne => !o.equiv(a, b)
    case CmpOp.Lt => o.lt(a, b)
    case CmpOp.Le => o.lteq(a, b)
    case CmpOp.Gt => o.gt(a, b)
    case CmpOp.Ge => o.gteq(a, b)
  }

  private def evalRef(q: Q, p: Point): Boolean = q match {
    case Noop       => true
    case And(l, r)  => evalRef(l, p) && evalRef(r, p)
    case Or(l, r)   => evalRef(l, p) || evalRef(r, p)
    case Not(i)     => !evalRef(i, p)
    case DeadPath   => false

    case TimeCmp(op, rhs) => cmpOp(op, p.time, rhs)(Ordering.by(_.toEpochMilli))
    case TimeTest(f) => try f(p.time) catch { case _: Exception => false }
    case TimeMapCmp(f, op, rhs) =>
      try cmpOp(op, f(p.time), rhs) catch { case _: Exception => false }

    case MeasurementCmp(op, rhs) => cmpOp(op, p.measurement, rhs)
    case MeasurementRegex(rx, anchored, flags) => regexRef(p.measurement, rx, anchored, flags)
    case MeasurementTest(f) => try f(p.measurement) catch { case _: Exception => false }
    case MeasurementMapCmp(f, op, rhs) =>
      try cmpOp(op, f(p.measurement), rhs) catch { case _: Exception => false }

    // tag/field leaves: missing key → False; present-null: == False,
    // != True, ordered/regex/test raise → False (python None semantics)
    case TagCmp(key, op, rhs) => p.tags.get(key) match {
      case None            => false
      case Some(null)      => op == CmpOp.Ne
      case Some(v)         => cmpOp(op, v, rhs)
    }
    case TagExists(key) => p.tags.contains(key)
    case TagRegex(key, rx, anchored, flags) => p.tags.get(key) match {
      case Some(v) if v != null => regexRef(v, rx, anchored, flags)
      case _                    => false
    }
    case TagTest(key, f) => p.tags.get(key) match {
      case Some(v) => try f(v) catch { case _: Exception => false }
      case None    => false
    }
    case TagMapCmp(key, f, op, rhs) => p.tags.get(key) match {
      case Some(v) => try cmpOp(op, f(v), rhs) catch { case _: Exception => false }
      case None    => false
    }

    case FieldCmp(key, op, rhs) => p.fields.get(key) match {
      case None            => false
      case Some(null)      => op == CmpOp.Ne
      case Some(v)         => cmpOp(op, v.doubleValue, rhs)
    }
    case FieldExists(key) => p.fields.contains(key)
    case FieldTest(key, f) => p.fields.get(key) match {
      case Some(v) => try f(v) catch { case _: Exception => false }
      case None    => false
    }
    case FieldMapCmp(key, f, op, rhs) => p.fields.get(key) match {
      case Some(v) if v != null => try cmpOp(op, f(v.doubleValue), rhs) catch { case _: Exception => false }
      case _                    => false
    }

    case other => fail(s"generator produced unhandled leaf $other")
  }

  private def regexRef(v: String, rx: String, anchored: Boolean, flags: String): Boolean = {
    if (v == null) return false
    val p = java.util.regex.Pattern.compile((if (flags.isEmpty) "" else s"(?$flags)") + rx)
    val m = p.matcher(v)
    if (anchored) m.lookingAt() else m.find()
  }

  // ---- AST generator ----

  private val genOp: Gen[CmpOp] =
    Gen.oneOf(CmpOp.Eq, CmpOp.Ne, CmpOp.Lt, CmpOp.Le, CmpOp.Gt, CmpOp.Ge)
  private val genTagKey = Gen.oneOf("a", "b", "zz")      // zz never present
  private val genFieldKey = Gen.oneOf("f", "g", "zz")
  private val genTagVal = Gen.oneOf("x", "y", "xx", "q")
  private val genFieldVal = Gen.oneOf(-1.0, 0.0, 1.0, 2.0)
  private val genTime = Gen.oneOf(
    t("2024-01-01T00:00:00Z"), t("2024-01-03T00:00:00Z"), t("2024-01-06T00:00:00Z"))

  // map/test function pools — shared verbatim by the interpreter (via
  // the AST) and the compiled UDF, so only EVALUATION RULES can differ.
  // Chained .map().map() composes into the same leaf the builders
  // produce, so composed entries cover the callable-path-chain surface.
  // substring(0,2) throws on length-1 strings, _.reverse NPEs on null:
  // both exercise the exception→False rule. 1.0/v at v=0 is +Infinity
  // (not NaN — IEEE-identical ordering in both engines).
  private val tagFns: Seq[String => String] = Seq(
    (s: String) => s.toUpperCase,
    (s: String) => s.reverse,
    (s: String) => s.substring(0, 2),
    ((s: String) => s.toUpperCase) andThen ((s: String) => s.reverse))
  private val fieldFns: Seq[Double => Double] = Seq(
    (v: Double) => v * 2,
    (v: Double) => v - 1.0,
    (v: Double) => 1.0 / v,
    ((v: Double) => v * 2) andThen ((v: Double) => v - 1.0))
  private val timeFns: Seq[Instant => Double] = Seq(
    (i: Instant) => i.atZone(java.time.ZoneOffset.UTC).getDayOfMonth.toDouble,
    (i: Instant) => i.getEpochSecond.toDouble % 7)
  private val measFns: Seq[String => String] = Seq(
    (s: String) => s.toUpperCase,
    (s: String) => s.substring(1))

  private val genLeaf: Gen[Q] = Gen.oneOf(
    for { op <- genOp; rhs <- genTime } yield TimeCmp(op, rhs),
    for { op <- genOp; m <- Gen.oneOf("m1", "m2", "mX") } yield MeasurementCmp(op, m),
    for { rx <- Gen.oneOf("m", "1", "X"); a <- Gen.oneOf(true, false) }
      yield MeasurementRegex(rx, a),
    for { k <- genTagKey; op <- genOp; v <- genTagVal } yield TagCmp(k, op, v),
    genTagKey.map(TagExists),
    for { k <- genTagKey; rx <- Gen.oneOf("x", "X", "x+"); a <- Gen.oneOf(true, false);
          fl <- Gen.oneOf("", "i") } yield TagRegex(k, rx, a, fl),
    for { k <- genFieldKey; op <- genOp; v <- genFieldVal } yield FieldCmp(k, op, v),
    genFieldKey.map(FieldExists),
    // test/map escape hatches, all four families
    for { k <- genTagKey; f <- Gen.oneOf(tagFns); op <- genOp; v <- Gen.oneOf("X", "YX", "xx") }
      yield TagMapCmp(k, f, op, v),
    for { k <- genTagKey; f <- Gen.oneOf(tagFns) }
      yield TagTest(k, (v: String) => f(v).nonEmpty),
    for { k <- genFieldKey; f <- Gen.oneOf(fieldFns); op <- genOp; v <- genFieldVal }
      yield FieldMapCmp(k, f, op, v),
    for { k <- genFieldKey; c <- genFieldVal }
      yield FieldTest(k, (v: java.lang.Double) => v.doubleValue >= c),
    for { f <- Gen.oneOf(timeFns); op <- genOp; v <- Gen.oneOf(1.0, 3.0, 5.0) }
      yield TimeMapCmp(f, op, v),
    for { c <- genTime } yield TimeTest((i: Instant) => i.isAfter(c)),
    for { f <- Gen.oneOf(measFns); op <- genOp; v <- Gen.oneOf("M1", "2", "mX") }
      yield MeasurementMapCmp(f, op, v),
    Gen.const(MeasurementTest((s: String) => s.endsWith("1"))),
    Gen.const(Noop))

  private def genQ(depth: Int): Gen[Q] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      2 -> (for { l <- genQ(depth - 1); r <- genQ(depth - 1) } yield And(l, r)),
      2 -> (for { l <- genQ(depth - 1); r <- genQ(depth - 1) } yield Or(l, r)),
      2 -> genQ(depth - 1).map(Not(_)))

  it("compiled evaluation equals the reference interpreter on every random AST") {
    val queries = Gen.listOfN(120, genQ(3))
      .apply(Gen.Parameters.default, Seed(42L)).get
    val expected = queries.map(q => pts.filter(p => evalRef(q, p)).map(_._seq).toSet)
    val actual = queries.map(q => db.search(q).map(p => rank(p._seq).toLong).toSet)
    queries.lazyZip(expected).lazyZip(actual).foreach { (q, e, a) =>
      assert(a == e, s"mismatch for $q: compiled=$a reference=$e")
    }
  }

  it("deeper ASTs (depth 4) also agree, across seeds") {
    (1L to 4L).foreach { seed =>
      val queries = Gen.listOfN(15, genQ(4))
        .apply(Gen.Parameters.default, Seed(seed)).get
      queries.foreach { q =>
        val e = pts.filter(p => evalRef(q, p)).map(_._seq).toSet
        val a = db.search(q).map(p => rank(p._seq).toLong).toSet
        assert(a == e, s"mismatch for $q (seed $seed): compiled=$a reference=$e")
      }
    }
  }
}
