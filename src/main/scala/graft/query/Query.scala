package graft.query

import java.time.Instant

/** The query DSL — a declarative AST mirroring the reference's four
  * query families (`TimeQuery`, `MeasurementQuery`, `TagQuery`,
  * `FieldQuery`; reference: tinyflux/queries.py:761-874) and its
  * combinators (`& | ~`, queries.py:128-171).
  *
  * The AST is deliberately tiny and data-only: all execution semantics
  * live in [[QueryCompiler]], which lowers a [[Q]] to a single Catalyst
  * `Column` so the whole predicate participates in pushdown, pruning and
  * whole-stage codegen (SURVEY.md §4 — the reference's hand-rolled index
  * becomes Catalyst's job).
  *
  * Semantics preserved from the reference (queries.py:243-250, 471-482):
  *   - missing tag/field key  → predicate is False (not null);
  *   - comparison with a null value → False, EXCEPT `!=` which is True
  *     for a present-but-null value (Python `None != x` is True);
  *   - `~q` negates the above (so `~(tag == v)` is True for points
  *     lacking the tag);
  *   - `exists()` is key-presence, not non-nullness (point.py:49-50);
  *   - `matches` anchors at the start only (Python `re.match`);
  *     `search` is substring (queries.py:680-722).
  */
sealed trait Q extends Serializable {
  def &(that: Q): Q = And(this, that)
  def |(that: Q): Q = Or(this, that)
  def unary_~ : Q = Not(this)
}

final case class And(l: Q, r: Q) extends Q
final case class Or(l: Q, r: Q) extends Q
final case class Not(q: Q) extends Q

/** Constant-true predicate (reference: queries.py:724-736). */
case object Noop extends Q

/** Python `re`-module numeric flag constants and their translation to
  * JVM inline-regex letters, so a migrating `matches(rx, re.I | re.S)`
  * call keeps working verbatim (reference queries.py:680-722 passes the
  * int straight to `re.match`/`re.search`).
  *
  *   - M(8)→m, S(16)→s, X(64)→x map one-to-one;
  *   - I(2)→"iu": python 3's re.I case-folds UNICODE ('Ä' matches 'ä');
  *     Java's bare (?i) folds ASCII only, so UNICODE_CASE rides along —
  *     EXCEPT under I|A, where python folds ASCII only → bare "i";
  *   - U(32)→"U" (UNICODE_CHARACTER_CLASS, implies u): python 3 str
  *     patterns have unicode \\w/\\b semantics, which re.U reasserts;
  *   - A(256): ASCII-only classes ARE Java's default — translates to
  *     nothing; combining it with U is rejected exactly as python's
  *     `re` rejects A|U as incompatible;
  *   - L(4): locale-dependent matching has no JVM analogue — rejected
  *     loudly rather than silently altering semantics (python itself
  *     restricts it to bytes patterns).
  */
object PyRegexFlags {
  val I = 2; val L = 4; val M = 8; val S = 16; val U = 32; val X = 64; val A = 256

  def toInline(flags: Int): String = {
    require(flags >= 0 && (flags & ~(I | M | S | U | X | A)) == 0,
      s"unsupported python regex flag bits in $flags (supported: re.I, re.M, re.S, re.U, re.X, re.A)")
    require((flags & A) == 0 || (flags & U) == 0,
      "re.A and re.U are incompatible (python raises ValueError)")
    val sb = new StringBuilder
    // re.I alone folds UNICODE in python 3, but re.I|re.A restricts the
    // fold to ASCII — which is Java's bare (?i) — so only ride
    // UNICODE_CASE along when the A bit is absent.
    if ((flags & I) != 0) sb ++= (if ((flags & A) != 0) "i" else "iu")
    if ((flags & M) != 0) sb += 'm'
    if ((flags & S) != 0) sb += 's'
    if ((flags & U) != 0) sb += 'U'
    if ((flags & X) != 0) sb += 'x'
    sb.result()
  }
}

sealed trait CmpOp
object CmpOp {
  case object Eq extends CmpOp
  case object Ne extends CmpOp
  case object Lt extends CmpOp
  case object Le extends CmpOp
  case object Gt extends CmpOp
  case object Ge extends CmpOp
}

// ---- leaves -------------------------------------------------------------

final case class TimeCmp(op: CmpOp, rhs: Instant) extends Q
final case class MeasurementCmp(op: CmpOp, rhs: String) extends Q
final case class MeasurementRegex(rx: String, anchored: Boolean, flags: String = "") extends Q

final case class TagCmp(key: String, op: CmpOp, rhs: String) extends Q
final case class TagExists(key: String) extends Q
final case class TagRegex(key: String, rx: String, anchored: Boolean, flags: String = "") extends Q

/** `test`/`map` on the Time family (reference queries.py:648-674,
  * 738-758 offers them on all four query types). UDF-based — outside
  * codegen — so prefer the declarative comparisons when possible.
  */
final case class TimeTest(f: Instant => Boolean) extends Q
final case class TimeMapCmp(f: Instant => Double, op: CmpOp, rhs: Double) extends Q

final case class MeasurementTest(f: String => Boolean) extends Q
final case class MeasurementMapCmp(f: String => String, op: CmpOp, rhs: String) extends Q

/** `map(func)` then compare on a tag value. */
final case class TagMapCmp(key: String, f: String => String, op: CmpOp, rhs: String) extends Q

/** A multi-step key path on flat tag/field maps. The reference permits
  * constructing `TagQuery().a.b`, but on any schema-valid data (tags are
  * str→str, fields str→float, point.py:360-418) the second step raises
  * inside its try/except and the predicate is False for every point —
  * this leaf reproduces exactly that (queries.py:243-250, 484-504).
  */
case object DeadPath extends Q

/** Arbitrary user predicate on the resolved tag value (reference
  * `.test(func)`, queries.py:648-674). Runs as a UDF — outside codegen —
  * so prefer the declarative leaves when possible.
  */
final case class TagTest(key: String, f: String => Boolean) extends Q

final case class FieldCmp(key: String, op: CmpOp, rhs: Double) extends Q
final case class FieldExists(key: String) extends Q
final case class FieldTest(key: String, f: java.lang.Double => Boolean) extends Q

/** Reference `.map(func)` then compare (queries.py:738-758): transform
  * the resolved field value before the comparison.
  */
final case class FieldMapCmp(key: String, f: Double => Double, op: CmpOp, rhs: Double) extends Q

// ---- builders (ergonomic front-end mirroring the reference API) ---------

/** `TimeQuery() >= t` etc. Scala cannot overload `==`/`!=`, so the
  * Spark-style `===`/`=!=` stand in for the reference's `==`/`!=`.
  */
final class TimeQuery {
  def ===(t: Instant): Q = TimeCmp(CmpOp.Eq, t)
  def =!=(t: Instant): Q = TimeCmp(CmpOp.Ne, t)
  def <(t: Instant): Q = TimeCmp(CmpOp.Lt, t)
  def <=(t: Instant): Q = TimeCmp(CmpOp.Le, t)
  def >(t: Instant): Q = TimeCmp(CmpOp.Gt, t)
  def >=(t: Instant): Q = TimeCmp(CmpOp.Ge, t)
  def test(f: Instant => Boolean): Q = TimeTest(f)
  /** `TimeQuery().map(_.atZone(UTC).getHour.toDouble) === 3` — the
    * reference's `map(lambda t: t.hour) == 3` shape (queries.py:738-758).
    */
  def map(f: Instant => Double): MappedTimeQuery = new MappedTimeQuery(f)
}
object TimeQuery { def apply(): TimeQuery = new TimeQuery }

final class MappedTimeQuery(f: Instant => Double) {
  def ===(v: Double): Q = TimeMapCmp(f, CmpOp.Eq, v)
  def =!=(v: Double): Q = TimeMapCmp(f, CmpOp.Ne, v)
  def <(v: Double): Q = TimeMapCmp(f, CmpOp.Lt, v)
  def <=(v: Double): Q = TimeMapCmp(f, CmpOp.Le, v)
  def >(v: Double): Q = TimeMapCmp(f, CmpOp.Gt, v)
  def >=(v: Double): Q = TimeMapCmp(f, CmpOp.Ge, v)
  /** Callable path steps chain (reference queries.py:484-504 allows any
    * number of callables before the comparison) — composition, no new
    * AST node.
    */
  def map(g: Double => Double): MappedTimeQuery = new MappedTimeQuery(t => g(f(t)))
  def test(t: Double => Boolean): Q = TimeTest(i => t(f(i)))
}

final class MeasurementQuery {
  def ===(m: String): Q = MeasurementCmp(CmpOp.Eq, m)
  def =!=(m: String): Q = MeasurementCmp(CmpOp.Ne, m)
  def <(m: String): Q = MeasurementCmp(CmpOp.Lt, m)
  def <=(m: String): Q = MeasurementCmp(CmpOp.Le, m)
  def >(m: String): Q = MeasurementCmp(CmpOp.Gt, m)
  def >=(m: String): Q = MeasurementCmp(CmpOp.Ge, m)
  /** `flags` are inline-regex letters (`"i"`, `"is"`, …), mirroring the
    * reference's `re`-module flags argument (queries.py:680-722).
    */
  def matches(rx: String, flags: String = ""): Q = MeasurementRegex(rx, anchored = true, flags)
  def search(rx: String, flags: String = ""): Q = MeasurementRegex(rx, anchored = false, flags)
  /** Python-numeric flag overloads (`re.I | re.S` style) for migration
    * fidelity — translated to inline letters via [[PyRegexFlags]].
    */
  def matches(rx: String, flags: Int): Q = matches(rx, PyRegexFlags.toInline(flags))
  def search(rx: String, flags: Int): Q = search(rx, PyRegexFlags.toInline(flags))
  def test(f: String => Boolean): Q = MeasurementTest(f)
  def map(f: String => String): MappedMeasurementQuery = new MappedMeasurementQuery(f)
}
object MeasurementQuery { def apply(): MeasurementQuery = new MeasurementQuery }

final class MappedMeasurementQuery(f: String => String) {
  def ===(v: String): Q = MeasurementMapCmp(f, CmpOp.Eq, v)
  def =!=(v: String): Q = MeasurementMapCmp(f, CmpOp.Ne, v)
  def <(v: String): Q = MeasurementMapCmp(f, CmpOp.Lt, v)
  def <=(v: String): Q = MeasurementMapCmp(f, CmpOp.Le, v)
  def >(v: String): Q = MeasurementMapCmp(f, CmpOp.Gt, v)
  def >=(v: String): Q = MeasurementMapCmp(f, CmpOp.Ge, v)
  /** Chained callable path step (queries.py:484-504). */
  def map(g: String => String): MappedMeasurementQuery = new MappedMeasurementQuery(m => g(f(m)))
  def test(t: String => Boolean): Q = MeasurementTest(m => t(f(m)))
}

/** `TagQuery("city") === "LA"` ≙ reference `TagQuery().city == "LA"`. */
final class TagQuery(key: String) {
  def ===(v: String): Q = TagCmp(key, CmpOp.Eq, v)
  def =!=(v: String): Q = TagCmp(key, CmpOp.Ne, v)
  def <(v: String): Q = TagCmp(key, CmpOp.Lt, v)
  def <=(v: String): Q = TagCmp(key, CmpOp.Le, v)
  def >(v: String): Q = TagCmp(key, CmpOp.Gt, v)
  def >=(v: String): Q = TagCmp(key, CmpOp.Ge, v)
  def exists(): Q = TagExists(key)
  def matches(rx: String, flags: String = ""): Q = TagRegex(key, rx, anchored = true, flags)
  def search(rx: String, flags: String = ""): Q = TagRegex(key, rx, anchored = false, flags)
  /** Python-numeric flag overloads (`re.I | re.S` style) — see
    * [[PyRegexFlags]].
    */
  def matches(rx: String, flags: Int): Q = matches(rx, PyRegexFlags.toInline(flags))
  def search(rx: String, flags: Int): Q = search(rx, PyRegexFlags.toInline(flags))
  def test(f: String => Boolean): Q = TagTest(key, f)
  def map(f: String => String): MappedTagQuery = new MappedTagQuery(key, f)
  /** Multi-step path — constant-False on schema-valid flat tags, as in
    * the reference (see [[DeadPath]]).
    */
  def sub(subKey: String): DeadPathQuery = new DeadPathQuery
}
object TagQuery { def apply(key: String): TagQuery = new TagQuery(key) }

final class MappedTagQuery(key: String, f: String => String) {
  def ===(v: String): Q = TagMapCmp(key, f, CmpOp.Eq, v)
  def =!=(v: String): Q = TagMapCmp(key, f, CmpOp.Ne, v)
  def <(v: String): Q = TagMapCmp(key, f, CmpOp.Lt, v)
  def <=(v: String): Q = TagMapCmp(key, f, CmpOp.Le, v)
  def >(v: String): Q = TagMapCmp(key, f, CmpOp.Gt, v)
  def >=(v: String): Q = TagMapCmp(key, f, CmpOp.Ge, v)
  /** Chained callable path step (queries.py:484-504): a second `map`
    * composes; `test` after `map` evaluates the user predicate on the
    * mapped value — an exception anywhere in the chain → False, the
    * reference's try/except path resolution.
    */
  def map(g: String => String): MappedTagQuery = new MappedTagQuery(key, v => g(f(v)))
  def test(t: String => Boolean): Q = TagTest(key, v => t(f(v)))
}

/** Every comparison on a dead (multi-step) path is False — the
  * reference's try/except evaluation over a failed path resolution.
  */
final class DeadPathQuery {
  def ===(v: Any): Q = DeadPath
  def =!=(v: Any): Q = DeadPath
  def <(v: Any): Q = DeadPath
  def <=(v: Any): Q = DeadPath
  def >(v: Any): Q = DeadPath
  def >=(v: Any): Q = DeadPath
  def exists(): Q = DeadPath
  def test(f: Any => Boolean): Q = DeadPath
}

final class FieldQuery(key: String) {
  def ===(v: Double): Q = FieldCmp(key, CmpOp.Eq, v)
  def =!=(v: Double): Q = FieldCmp(key, CmpOp.Ne, v)
  def <(v: Double): Q = FieldCmp(key, CmpOp.Lt, v)
  def <=(v: Double): Q = FieldCmp(key, CmpOp.Le, v)
  def >(v: Double): Q = FieldCmp(key, CmpOp.Gt, v)
  def >=(v: Double): Q = FieldCmp(key, CmpOp.Ge, v)
  def exists(): Q = FieldExists(key)
  def test(f: java.lang.Double => Boolean): Q = FieldTest(key, f)
  def map(f: Double => Double): MappedFieldQuery = new MappedFieldQuery(key, f)
  /** Multi-step path — constant-False on schema-valid flat fields. */
  def sub(subKey: String): DeadPathQuery = new DeadPathQuery
}
object FieldQuery { def apply(key: String): FieldQuery = new FieldQuery(key) }

final class MappedFieldQuery(key: String, f: Double => Double) {
  def ===(v: Double): Q = FieldMapCmp(key, f, CmpOp.Eq, v)
  def =!=(v: Double): Q = FieldMapCmp(key, f, CmpOp.Ne, v)
  def <(v: Double): Q = FieldMapCmp(key, f, CmpOp.Lt, v)
  def <=(v: Double): Q = FieldMapCmp(key, f, CmpOp.Le, v)
  def >(v: Double): Q = FieldMapCmp(key, f, CmpOp.Gt, v)
  def >=(v: Double): Q = FieldMapCmp(key, f, CmpOp.Ge, v)
  /** Chained callable path step (queries.py:484-504). The null guard
    * mirrors the reference: mapping a present-but-None field value
    * raises inside its try/except → False.
    */
  def map(g: Double => Double): MappedFieldQuery = new MappedFieldQuery(key, v => g(f(v)))
  def test(t: Double => Boolean): Q = FieldTest(key, v => v != null && t(f(v)))
}
