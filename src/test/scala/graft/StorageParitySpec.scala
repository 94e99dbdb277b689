package graft

import java.nio.file.Files
import java.time.Instant

import graft.engine.GraftDB
import graft.model.Point
import graft.query._

/** Cross-backend parity: the same op sequence through MemoryStorage,
  * ParquetStorage, and CsvStorage must produce identical results — the
  * Spark analogue of the reference's index-vs-storage parity tests
  * (tests/test_tinyflux.py:1507), extended across all three backends
  * and through the mutation + reindex lifecycle.
  */
class StorageParitySpec extends SparkSpec {

  private def t(s: String) = Instant.parse(s)

  private val seed = Seq(
    Point(t("2024-01-01T00:00:00Z"), "cpu", Map("host" -> "a"), Map("v" -> 1.0)),
    Point(t("2024-01-02T00:00:00Z"), "cpu", Map("host" -> "b", "dc" -> "e1"), Map("v" -> 2.0, "w" -> 9.5)),
    Point(t("2024-01-03T00:00:00Z"), "mem", Map("host" -> "a"), Map("v" -> 3.0)),
    Point(t("2024-01-04T00:00:00Z"), "mem", Map("host" -> null), Map("v" -> null)),
    Point(t("2024-01-05T00:00:00Z"), "disk", Map(), Map("v" -> 2.0)))

  private def fresh(): Seq[(String, GraftDB)] = Seq(
    "memory" -> GraftDB.inMemory(spark),
    "parquet" -> GraftDB.atPath(spark, Files.createTempDirectory("graftparity").toString),
    "csv" -> GraftDB.atCsv(spark, Files.createTempFile("graftparity", ".csv").toString))

  private def canon(ps: Seq[Point]) =
    ps.map(p => (p.time, p.measurement, p.tags, p.fields)).sortBy(_._1)

  it("every read/metadata/mutation op agrees across all three backends") {
    val dbs = fresh()
    dbs.foreach { case (_, db) => db.insertMultiple(seed) }

    def assertAllEqual[A](label: String)(f: GraftDB => A): Unit = {
      val results = dbs.map { case (name, db) => name -> f(db) }
      val (refName, ref) = results.head
      results.tail.foreach { case (name, r) =>
        assert(r == ref, s"$label: $name disagrees with $refName")
      }
    }

    val q = (FieldQuery("v") >= 2.0) & ~(TagQuery("host") === "b")
    assertAllEqual("search")(db => canon(db.search(q)))
    assertAllEqual("count")(_.count(q))
    assertAllEqual("contains")(_.contains(TagQuery("dc").exists()))
    assertAllEqual("get")(_.get(MeasurementQuery() === "mem").map(p => (p.time, p.fields)))
    assertAllEqual("measurements")(_.getMeasurements)
    assertAllEqual("field_keys")(_.getFieldKeys())
    assertAllEqual("tag_keys")(_.getTagKeys())
    assertAllEqual("tag_values")(_.getTagValues(Seq("host")))
    assertAllEqual("field_values")(_.getFieldValues("v"))
    assertAllEqual("timestamps")(_.getTimestamps())

    // reindex must not change any answer (indexed vs raw path parity)
    dbs.foreach { case (_, db) => db.reindex() }
    assertAllEqual("search_indexed")(db => canon(db.search(q)))
    assertAllEqual("count_indexed")(_.count(q))
    assertAllEqual("zonemap_empty")(_.count(TimeQuery() >= t("2025-01-01T00:00:00Z")))

    // mutations: update + remove + drop, then re-check the full state
    assertAllEqual("update_changed")(_.update(MeasurementQuery() === "cpu",
      tags = Map("upd" -> "y"), fields = Map("v" -> 10.0)))
    assertAllEqual("remove_count")(_.remove(FieldQuery("w") =!= 9.5))
    assertAllEqual("drop_count")(_.dropMeasurement("disk"))
    assertAllEqual("final_state")(db => canon(db.all()))
    assertAllEqual("final_len")(_.length)
  }
}
