package graft

import java.time.Instant

import graft.engine.GraftDB
import graft.model.Point
import graft.query._

/** Predicate-DSL semantics vs the reference's edge cases
  * (tinyflux tests/test_queries.py; FIXTURES.md §5).
  */
class QueryCompilerSpec extends SparkSpec {

  private def t(s: String): Instant = Instant.parse(s)

  private lazy val db: GraftDB = {
    val d = GraftDB.inMemory(spark)
    d.insertMultiple(Seq(
      // p0: full point
      Point(t("2024-01-01T00:00:00Z"), "m1",
        Map("city" -> "LA", "zone" -> "a"), Map("temp" -> 70.0, "aqi" -> 112.0)),
      // p1: tag present with NULL value; field present with NULL value
      Point(t("2024-01-02T00:00:00Z"), "m1",
        Map("city" -> null), Map("temp" -> null)),
      // p2: missing keys entirely, other measurement
      Point(t("2024-01-03T00:00:00Z"), "m2",
        Map("zone" -> "b"), Map("aqi" -> 40.0))
    ))
    d
  }

  // `_seq` values are an implementation detail (generation-prefixed);
  // tests identify points by insertion RANK, which `_seq` ordering defines.
  private lazy val rank: Map[Long, Long] =
    db.all(sorted = false).map(_._seq).sorted.zipWithIndex
      .map { case (s, i) => (s, i.toLong) }.toMap
  private def ids(q: Q): Set[Long] = db.search(q).map(p => rank(p._seq)).toSet

  describe("comparison semantics") {
    it("eq on tag") { assert(ids(TagQuery("city") === "LA") == Set(0)) }
    it("eq on missing key is False") { assert(ids(TagQuery("nope") === "x") == Set.empty[Long]) }
    it("eq on null value is False") { assert(!ids(TagQuery("city") === "LA").contains(1)) }

    it("ne: missing key is False, present-null is True (Python None != x)") {
      // p0 city=LA → False; p1 city=null → True; p2 no city key → False
      assert(ids(TagQuery("city") =!= "LA") == Set(1))
      assert(ids(TagQuery("city") =!= "SF") == Set(0, 1))
    }

    it("field ne mirrors tag ne") {
      assert(ids(FieldQuery("temp") =!= 70.0) == Set(1))
    }

    it("ordered comparisons propagate null/missing to False") {
      assert(ids(FieldQuery("temp") >= 50.0) == Set(0))
      assert(ids(FieldQuery("aqi") < 100.0) == Set(2))
      // lexicographic on tags
      assert(ids(TagQuery("zone") > "a") == Set(2))
    }

    it("time comparisons") {
      assert(ids(TimeQuery() >= t("2024-01-02T00:00:00Z")) == Set(1, 2))
      assert(ids((TimeQuery() > t("2024-01-01T00:00:00Z")) & (TimeQuery() < t("2024-01-03T00:00:00Z"))) == Set(1))
      assert(ids(TimeQuery() === t("2024-01-01T00:00:00Z")) == Set(0))
    }
  }

  describe("NOT composes over missing-key→False") {
    it("~(tag == v) is True for points lacking the key") {
      assert(ids(~(TagQuery("city") === "LA")) == Set(1, 2))
    }
    it("~exists") {
      assert(ids(~TagQuery("city").exists()) == Set(2))
    }
    it("double negation is identity") {
      assert(ids(~(~(TagQuery("city") === "LA"))) == ids(TagQuery("city") === "LA"))
    }
  }

  describe("exists is key-presence, not non-nullness") {
    it("tag present with null value exists") {
      assert(ids(TagQuery("city").exists()) == Set(0, 1))
    }
    it("field present with null value exists") {
      assert(ids(FieldQuery("temp").exists()) == Set(0, 1))
    }
  }

  describe("regex") {
    it("matches anchors at start only (re.match)") {
      assert(ids(TagQuery("city").matches("L")) == Set(0))   // prefix ok
      assert(ids(TagQuery("city").matches("A")) == Set.empty[Long]) // not at start
      assert(ids(MeasurementQuery().matches("m")) == Set(0, 1, 2))
    }
    it("search is substring (re.search)") {
      assert(ids(TagQuery("city").search("A")) == Set(0))
      assert(ids(MeasurementQuery().search("2")) == Set(2))
    }
  }

  describe("test/map escape hatches") {
    it("field test function") {
      assert(ids(FieldQuery("aqi").test(v => v != null && v > 100)) == Set(0))
    }
    it("test exception → False (reference try/except)") {
      assert(ids(FieldQuery("temp").test(v => v.doubleValue() > 0)) == Set(0)) // NPE on p1 → false
    }
    it("map then compare") {
      assert(ids(FieldQuery("temp").map(_ * 2) === 140.0) == Set(0))
    }
  }

  describe("test/map on Time and Measurement (reference parity)") {
    it("TimeQuery().test with a user predicate") {
      val cut = t("2024-01-01T12:00:00Z") // bound locally: the closure must not capture the suite
      assert(ids(TimeQuery().test(_.isAfter(cut))) == Set(1, 2))
    }
    it("TimeQuery().map projects then compares (day-of-month == 2)") {
      val dayOfMonth = TimeQuery().map(i =>
        i.atZone(java.time.ZoneOffset.UTC).getDayOfMonth.toDouble)
      assert(ids(dayOfMonth === 2.0) == Set(1))
      assert(ids(dayOfMonth >= 2.0) == Set(1, 2))
    }
    it("MeasurementQuery().test and .map") {
      assert(ids(MeasurementQuery().test(_.endsWith("1"))) == Set(0, 1))
      assert(ids(MeasurementQuery().map(_.toUpperCase) === "M2") == Set(2))
    }
    it("TagQuery.map transforms the value before comparing") {
      assert(ids(TagQuery("city").map(_.toLowerCase) === "la") == Set(0))
      // null value: map-UDF yields null -> coalesced False, no crash
      assert(!ids(TagQuery("city").map(_.toLowerCase) === "x").contains(1))
    }
  }

  describe("callable path chains (map-in-path, queries.py:484-504)") {
    it("chained maps compose before the comparison") {
      assert(ids(FieldQuery("temp").map(_ * 2).map(_ - 40.0) === 100.0) == Set(0))
      assert(ids(TagQuery("city").map(_.toLowerCase).map(_.reverse) === "al") == Set(0))
      assert(ids(MeasurementQuery().map(_.toUpperCase).map(_.stripPrefix("M")) === "2") == Set(2))
      val dayOfMonth = TimeQuery().map(i =>
        i.atZone(java.time.ZoneOffset.UTC).getDayOfMonth.toDouble)
      assert(ids(dayOfMonth.map(_ * 10) === 20.0) == Set(1))
    }
    it("test after map evaluates on the mapped value; null/missing → False") {
      assert(ids(FieldQuery("temp").map(_ / 10).test(_ > 6.9)) == Set(0)) // p1 null, p2 missing → False
      assert(ids(TagQuery("city").map(_.toLowerCase).test(_.startsWith("l"))) == Set(0))
      assert(ids(MeasurementQuery().map(_.toUpperCase).test(_ == "M1")) == Set(0, 1))
    }
    it("exception anywhere in the chain → False, not a task failure") {
      assert(ids(TagQuery("city")
        .map(v => if (v == "LA") throw new RuntimeException("boom") else v) === "x")
        == Set.empty[Long])
      assert(ids(FieldQuery("temp")
        .map(v => if (v > 0) throw new RuntimeException("boom") else v) === 0.0)
        == Set.empty[Long])
    }
  }

  describe("regex flags") {
    it("(?i) case-insensitive matches and search") {
      assert(ids(TagQuery("city").matches("la", flags = "i")) == Set(0))
      assert(ids(TagQuery("city").matches("la")) == Set.empty[Long])
      assert(ids(MeasurementQuery().search("M", flags = "i")) == Set(0, 1, 2))
      assert(ids(MeasurementQuery().search("M")) == Set.empty[Long])
    }
    it("rejects unknown flags eagerly") {
      intercept[IllegalArgumentException] {
        db.search(TagQuery("city").matches("x", flags = "q"))
      }
    }
    it("python-numeric flags translate (re.I | re.S etc., queries.py:680-722)") {
      assert(ids(TagQuery("city").matches("la", flags = PyRegexFlags.I)) == Set(0))
      assert(ids(MeasurementQuery().search("M", flags = PyRegexFlags.I)) == Set(0, 1, 2))
      // re.A is the JVM default — no-op; combined bits compose
      assert(ids(TagQuery("city").search("a", flags = PyRegexFlags.I | PyRegexFlags.A
        | PyRegexFlags.S)) == Set(0))
      assert(PyRegexFlags.toInline(PyRegexFlags.I | PyRegexFlags.M | PyRegexFlags.S
        | PyRegexFlags.U | PyRegexFlags.X) == "iumsUx")
      // python 3 fidelity: re.I folds unicode case; re.U restores
      // unicode \w/\b classes (Java (?U) implies (?u))
      assert(ids(TagQuery("city").matches("lA", flags = PyRegexFlags.I)) == Set(0))
      // locale flag has no JVM analogue — loud rejection, not silence
      intercept[IllegalArgumentException] { PyRegexFlags.toInline(PyRegexFlags.L) }
      intercept[IllegalArgumentException] { PyRegexFlags.toInline(1024) }
      // A and U are incompatible, as in python's re
      intercept[IllegalArgumentException] {
        PyRegexFlags.toInline(PyRegexFlags.A | PyRegexFlags.U)
      }
    }
    it("re.I|re.A folds ASCII only, as python's re.A demands") {
      assert(PyRegexFlags.toInline(PyRegexFlags.I) == "iu")
      assert(PyRegexFlags.toInline(PyRegexFlags.I | PyRegexFlags.A) == "i")
      // bare re.I folds unicode ('ä' matches 'Ä'); re.I|re.A must NOT
      // (python restricts the fold to ASCII), while ASCII still folds
      assert("Ä".matches("(?" + PyRegexFlags.toInline(PyRegexFlags.I) + ")ä"))
      assert(!"Ä".matches("(?" + PyRegexFlags.toInline(PyRegexFlags.I | PyRegexFlags.A) + ")ä"))
      assert("LA".matches("(?" + PyRegexFlags.toInline(PyRegexFlags.I | PyRegexFlags.A) + ")la"))
    }
  }

  describe("multi-step paths (dead on flat schema, as in the reference)") {
    it("TagQuery.sub / FieldQuery.sub compare False for every point") {
      assert(ids(TagQuery("city").sub("deep") === "x") == Set.empty[Long])
      assert(ids(FieldQuery("temp").sub("deep") > 0.0) == Set.empty[Long])
      // and ~ still composes to True everywhere
      assert(ids(~(TagQuery("city").sub("deep") === "x")) == Set(0L, 1L, 2L))
    }
  }

  describe("compound queries") {
    it("and / or / noop") {
      assert(ids((TagQuery("zone") === "a") | (TagQuery("zone") === "b")) == Set(0, 2))
      assert(ids((MeasurementQuery() === "m1") & FieldQuery("aqi").exists()) == Set(0))
      assert(ids(Noop) == Set(0L, 1L, 2L))
    }
    it("De Morgan holds under coalesced semantics") {
      val a = TagQuery("city") === "LA"
      val b = FieldQuery("aqi") > 100.0
      assert(ids(~(a & b)) == ids(~a | ~b))
      assert(ids(~(a | b)) == ids(~a & ~b))
    }
  }
}
