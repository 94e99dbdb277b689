package graft

import java.nio.file.Files
import java.time.Instant

import graft.engine.{GraftDB, ParquetStorage}
import graft.model.Point
import graft.query._

/** ParquetStorage scale mechanics: predicate pushdown into the scan,
  * delta-tier appends, compaction into the partitioned store.
  */
class StorageSpec extends SparkSpec {

  private def t(s: String): Instant = Instant.parse(s)

  private def seeded(): (GraftDB, String) = {
    val dir = Files.createTempDirectory("graftstore").toString
    val db = GraftDB.atPath(spark, dir)
    db.insertMultiple(Seq(
      Point(t("2024-01-01T01:00:00Z"), "therm", Map("room" -> "bed"), Map("temp" -> 70.0)),
      Point(t("2024-01-02T01:00:00Z"), "therm", Map("room" -> "kit"), Map("temp" -> 68.0)),
      Point(t("2024-01-03T01:00:00Z"), "cpu", Map("host" -> "a"), Map("load" -> 0.5))))
    (db, dir)
  }

  describe("predicate pushdown evidence") {
    it("time predicates reach the parquet scan as PushedFilters") {
      val (db, _) = seeded()
      val plan = db.searchDF(TimeQuery() >= t("2024-01-02T00:00:00Z"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters:") &&
        plan.contains("GreaterThanOrEqual(time"), s"no time pushdown in:\n$plan")
    }
    it("compacted store scans prune on the measurement partition column") {
      val (db, _) = seeded()
      db.compact()
      val plan = db.searchDF(MeasurementQuery() === "cpu")
        .queryExecution.executedPlan.toString
      // partition filter, not a data filter: measurement is a dir column
      assert(plan.contains("PartitionFilters:") && plan.contains("measurement"),
        s"no partition pruning in:\n$plan")
      assert(db.count(MeasurementQuery() === "cpu") == 1)
    }
  }

  describe("delta tier + compaction") {
    it("appends land in delta/, compact folds them into data/, contents unchanged") {
      val (db, dir) = seeded()
      assert(Files.exists(java.nio.file.Paths.get(dir, "delta")))
      assert(!Files.exists(java.nio.file.Paths.get(dir, "data")))
      val before = db.all().map(p => (p.time, p.measurement, p.tags, p.fields))
      db.compact()
      assert(Files.exists(java.nio.file.Paths.get(dir, "data")))
      assert(!Files.exists(java.nio.file.Paths.get(dir, "delta")))
      assert(db.all().map(p => (p.time, p.measurement, p.tags, p.fields)) == before)
      // appends after compaction go back to the delta tier and unify
      db.insert(Point(t("2024-01-04T01:00:00Z"), "cpu", Map("host" -> "b"), Map("load" -> 0.9)))
      assert(db.length == 4)
      assert(Files.exists(java.nio.file.Paths.get(dir, "delta")))
    }
    it("recovers from a crash mid-swap (primary renamed to backup, staging orphaned)") {
      val (db, dir) = seeded()
      db.compact()
      val before = db.all().map(p => (p.time, p.measurement, p.tags, p.fields))
      // simulate the crash window inside overwrite(): primary moved to
      // backup, replacement never renamed into place
      val data = java.nio.file.Paths.get(dir, "data")
      val backup = java.nio.file.Paths.get(dir, ".backup-data")
      java.nio.file.Files.move(data, backup)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, ".staging-dead"))
      // reopening runs recover(): backup restored, staging dropped
      val again = GraftDB.atPath(spark, dir)
      assert(again.all().map(p => (p.time, p.measurement, p.tags, p.fields)) == before)
      assert(!java.nio.file.Files.exists(backup))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, ".staging-dead")))
    }

    it("reopening the directory sees the same data (insertion order kept)") {
      val (db, dir) = seeded()
      db.compact()
      db.insert(Point(t("2024-01-05T01:00:00Z"), "cpu", Map("host" -> "c"), Map("load" -> 1.5)))
      val again = GraftDB.atPath(spark, dir)
      assert(again.length == 4)
      assert(again.all(sorted = false).last.tags("host") == "c")
    }
  }
}
