package graft

import java.nio.file.{Files, Paths}
import java.time.Instant

import scala.jdk.CollectionConverters._

import graft.engine.GraftDB
import graft.model.Point
import graft.query._

/** JSONL interchange tier: exact round-trip through the line format,
  * tolerance for externally-produced lines, and mutation commit.
  */
class JsonlStorageSpec extends SparkSpec {

  private def t(s: String): Instant = Instant.parse(s)

  private val pts = Seq(
    Point(t("2024-03-01T00:00:00.123456Z"), "cpu",
      Map("host" -> "a", "dc" -> null), Map("load" -> 0.5, "nul" -> null)),
    Point(t("2024-03-01T00:00:01Z"), "cpu", Map("host" -> "ü\"é"), Map("load" -> 1.5)),
    Point(t("2024-03-01T00:00:02Z"), "mem", Map.empty, Map.empty))

  describe("jsonl storage") {
    it("round-trips points exactly, including microseconds, unicode, and null map values") {
      val dir = Files.createTempDirectory("graftjsonl").toString
      val db = GraftDB.atJsonl(spark, dir)
      db.insertMultiple(pts)
      val again = GraftDB.atJsonl(spark, dir) // fresh handle, re-read from disk
      val got = again.all().map(p => (p.time, p.measurement, p.tags, p.fields))
      assert(got === pts.map(p => (p.time, p.measurement, p.tags, p.fields)))
    }

    it("keeps insertion order across appends and handle reopen") {
      val dir = Files.createTempDirectory("graftjsonl").toString
      val db = GraftDB.atJsonl(spark, dir)
      db.insertMultiple(pts.take(2))
      db.insert(pts(2))
      val reopened = GraftDB.atJsonl(spark, dir)
      reopened.insert(Point(t("2024-03-01T00:00:03Z"), "mem", Map.empty, Map("m" -> 9.0)))
      assert(reopened.all().map(_.measurement) === Seq("cpu", "cpu", "mem", "mem"))
      assert(reopened.get(MeasurementQuery() === "mem").get.fields === Map.empty)
    }

    it("writes self-describing lines any JSON tool can parse") {
      val dir = Files.createTempDirectory("graftjsonl").toString
      GraftDB.atJsonl(spark, dir).insert(pts(1))
      val lines = Files.list(Paths.get(dir, "data")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".json"))
        .flatMap(f => Files.readAllLines(f).asScala)
        .toSeq
      assert(lines.size === 1)
      val l = lines.head
      assert(l.contains("\"t_us\":1709251201000000") && l.contains("\"m\":\"cpu\""))
      assert(l.contains("\"_seq\":")) // order travels with the data
    }

    it("reads externally-produced lines with absent tags/fields keys") {
      val dir = Files.createTempDirectory("graftjsonl").toString
      Files.createDirectories(Paths.get(dir, "data"))
      Files.writeString(Paths.get(dir, "data", "ext.json"),
        """{"t_us":1709251200000000,"m":"ext","_seq":1}
          |{"t_us":1709251201000000,"m":"ext","fields":{"x":2.0},"_seq":2}
          |""".stripMargin)
      val db = GraftDB.atJsonl(spark, dir)
      val got = db.all()
      assert(got.map(_.measurement) === Seq("ext", "ext"))
      assert(got.head.tags === Map.empty && got.head.fields === Map.empty)
      assert(got(1).fields === Map("x" -> 2.0))
    }

    it("copyTo migrates across backends with _seq and content intact") {
      import graft.engine.{JsonlStorage, MemoryStorage}
      val src = Files.createTempDirectory("graftsrc").toString
      val db = GraftDB.atPath(spark, src) // parquet origin
      db.insertMultiple(pts)
      val jdir = Files.createTempDirectory("graftdst").toString
      val viaJsonl = db.copyTo(new JsonlStorage(spark, jdir))
      val inMem = viaJsonl.copyTo(new MemoryStorage(spark))
      def canon(g: GraftDB) = g.all(sorted = false)
        .map(p => (p.time, p.measurement, p.tags, p.fields, p._seq))
      assert(canon(viaJsonl) === canon(db))
      assert(canon(inMem) === canon(db))
    }

    it("commits mutations atomically and survives reopen") {
      val dir = Files.createTempDirectory("graftjsonl").toString
      val db = GraftDB.atJsonl(spark, dir)
      db.insertMultiple(pts)
      val n = db.update(MeasurementQuery() === "cpu", fields = Map("load" -> 9.9))
      assert(n === 2)
      db.remove(MeasurementQuery() === "mem")
      val again = GraftDB.atJsonl(spark, dir)
      assert(again.length === 2)
      assert(again.all().forall(_.fields("load") == 9.9))
      // no stale staging/backup dirs left behind
      val leftovers = Files.list(Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString)
        .filter(nm => nm.startsWith(".staging-") || nm.startsWith(".backup-")).toSeq
      assert(leftovers.isEmpty)
    }
  }
}
