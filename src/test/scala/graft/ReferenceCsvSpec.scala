package graft

import java.nio.file.Files
import java.time.Instant

import graft.model.Point
import graft.sources.ReferenceCsv

/** Reference-CSV serde fidelity, mirroring the serializer cases in the
  * reference's tests/test_point.py (zero values, None values, empty
  * strings, compact prefixes) plus CSV quoting.
  */
class ReferenceCsvSpec extends SparkSpec {

  private def writeTemp(lines: Seq[String]): String = {
    val f = Files.createTempFile("refcsv", ".csv")
    Files.write(f, String.join("\r\n", lines: _*).getBytes("UTF-8"))
    f.toString
  }

  private def collectPoints(path: String) = {
    ReferenceCsv.read(spark, path)
      .orderBy("_seq")
      .collect()
      .map { r =>
        (Option(r.getAs[java.sql.Timestamp]("time")).map(_.toInstant.toString).orNull,
          r.getAs[String]("measurement"),
          Option(r.getAs[Map[String, String]]("tags")).getOrElse(Map.empty),
          Option(r.getAs[Map[String, java.lang.Double]]("fields")).getOrElse(Map.empty))
      }
  }

  describe("reading reference-format rows") {
    it("parses default prefixes, _none sentinels, ints, floats and empty strings") {
      val p = writeTemp(Seq(
        // zero-valued field, int-encoded field, None field, empty tag value
        "2024-01-01T00:00:00,therm,_tag_room,bed,_tag_label,,_field_temp,0.0,_field_n,5,_field_gone,_none",
        // measurement _none, tag value _none, float with micros time
        "2024-01-02T03:04:05.123456,_none,_tag_room,_none,_field_temp,70.5"))
      val pts = collectPoints(p)
      assert(pts.length == 2)
      assert(pts(0) == (("2024-01-01T00:00:00Z", "therm",
        Map("room" -> "bed", "label" -> ""),
        Map("temp" -> java.lang.Double.valueOf(0.0),
          "n" -> java.lang.Double.valueOf(5.0), "gone" -> null))))
      assert(pts(1)._1 == "2024-01-02T03:04:05.123456Z")
      assert(pts(1)._2 == null)
      assert(pts(1)._3 == Map("room" -> null))
      assert(pts(1)._4 == Map("temp" -> java.lang.Double.valueOf(70.5)))
    }
    it("'_none' and malformed times parse to null instead of failing the load") {
      val p = writeTemp(Seq(
        "_none,m,_field_v,1.0",
        "not-a-time,m,_field_v,2.0",
        "2024-01-01T00:00:00,m,_field_v,3.0"))
      val pts = collectPoints(p)
      assert(pts.length == 3)
      assert(pts(0)._1 == null && pts(1)._1 == null && pts(2)._1 != null)
      assert(pts.map(_._4("v").doubleValue).toSeq == Seq(1.0, 2.0, 3.0))
    }
    it("parses compact prefixes (t_/f_)") {
      val p = writeTemp(Seq("2024-01-01T00:00:00,m,t_a,x,f_b,1.5"))
      val pts = collectPoints(p)
      assert(pts(0)._3 == Map("a" -> "x"))
      assert(pts(0)._4 == Map("b" -> java.lang.Double.valueOf(1.5)))
    }
    it("handles quoted cells containing commas and quotes") {
      val p = writeTemp(Seq(
        """2024-01-01T00:00:00,"m,with comma",_tag_note,"say ""hi"", ok",_field_v,1.0"""))
      val pts = collectPoints(p)
      assert(pts(0)._2 == "m,with comma")
      assert(pts(0)._3 == Map("note" -> "say \"hi\", ok"))
    }
  }

  describe("reference-written file") {
    it("parses rows exactly as the reference serializer emits them") {
      // byte-for-byte what point.py:_serialize_to_list + csv.writer
      // produce for zero/None/empty/comma/exponent/compact cases
      val p = writeTemp(Seq(
        "2024-01-01T00:00:00,therm,_tag_room,bed,_tag_label,,_field_temp,0.0,_field_n,5.0,_field_gone,_none",
        "2024-01-02T03:04:05.123456,\"m,comma\",_tag_note,\"say \"\"hi\"\", ok\",_tag_room,_none,_field_temp,70.5",
        "2024-01-03T00:00:00,x,_field_neg,-3.25,_field_exp,1e-07",
        "2024-01-01T00:00:00,therm,t_room,bed,t_label,,f_temp,0.0,f_n,5.0,f_gone,_none"))
      val pts = collectPoints(p)
      assert(pts.length == 4)
      assert(pts(0)._4 == Map("temp" -> java.lang.Double.valueOf(0.0),
        "n" -> java.lang.Double.valueOf(5.0), "gone" -> null))
      assert(pts(1)._2 == "m,comma")
      assert(pts(1)._3 == Map("note" -> "say \"hi\", ok", "room" -> null))
      assert(pts(2)._4 == Map("neg" -> java.lang.Double.valueOf(-3.25),
        "exp" -> java.lang.Double.valueOf(1e-7)))
      assert(pts(3) == pts(0)) // compact prefixes decode identically
    }
  }

  describe("round trip") {
    it("write -> read preserves every point, including edge values") {
      val src = writeTemp(Seq(
        "2024-01-01T00:00:00,therm,_tag_room,bed,_tag_label,,_field_temp,0.0,_field_gone,_none",
        "2024-01-02T03:04:05.123456,_none,_tag_room,_none,_field_temp,70.5",
        "2024-01-03T00:00:00,\"m,x\",_tag_note,\"say \"\"hi\"\"\",_field_v,-3.25"))
      val df = ReferenceCsv.read(spark, src)
      val out = Files.createTempFile("refcsv-out", ".csv").toString
      ReferenceCsv.writeFile(df, out)
      val again = collectPoints(out)
      assert(again.toSeq == collectPoints(src).toSeq)
    }
    it("GraftDB runs directly on a reference CSV file: insert, query, update, reopen") {
      import java.time.Instant
      import graft.engine.GraftDB
      import graft.model.Point
      import graft.query._
      val f = Files.createTempFile("refdb", ".csv")
      Files.delete(f)
      val db = GraftDB.atCsv(spark, f.toString)
      db.insertMultiple(Seq(
        Point(Instant.parse("2024-01-01T00:00:00Z"), "therm", Map("room" -> "bed"), Map("temp" -> 70.0)),
        Point(Instant.parse("2024-01-02T00:00:00Z"), "therm", Map("room" -> "kit"), Map("temp" -> 68.0))))
      db.insert(Point(Instant.parse("2024-01-03T00:00:00Z"), "cpu", Map("host" -> "a"), Map("load" -> 0.5)))
      assert(db.length == 3)
      assert(db.count(MeasurementQuery() === "therm") == 2)
      assert(db.update(TagQuery("room") === "bed", fields = Map("temp" -> 71.0)) == 1)
      // reopen from the file: same contents (format survived the swap)
      val db2 = GraftDB.atCsv(spark, f.toString)
      assert(db2.length == 3)
      assert(db2.get(TagQuery("room") === "bed").get.fields("temp") == 71.0)
      assert(db2.remove(MeasurementQuery() === "cpu") == 1)
      assert(GraftDB.atCsv(spark, f.toString).length == 2)
    }

    it("round-trips a non-UTF8 encoding end to end (storages.py encoding kwarg)") {
      import graft.engine.GraftDB
      import graft.query._
      val f = Files.createTempFile("refcsvenc", ".csv")
      Files.delete(f)
      val db = GraftDB.atCsv(spark, f.toString, encoding = "ISO-8859-1")
      db.insert(Point(Instant.parse("2024-01-01T00:00:00Z"), "café",
        Map("ciudad" -> "münchen"), Map("temp" -> 1.5)))
      // the bytes on disk are latin-1 (é = one byte, not utf-8's two):
      // decoding as latin-1 recovers the text, decoding as utf-8 mangles
      val asLatin = new String(Files.readAllBytes(f), "ISO-8859-1")
      val asUtf = new String(Files.readAllBytes(f), "UTF-8")
      assert(asLatin.contains("café") && asLatin.contains("münchen"))
      assert(!asUtf.contains("café"))
      val again = GraftDB.atCsv(spark, f.toString, encoding = "ISO-8859-1")
      val p = again.all().head
      assert(p.measurement == "café" && p.tags("ciudad") == "münchen")
      // the rewrite path (update → temp-swap) keeps the encoding too
      assert(again.update(TagQuery("ciudad") === "münchen", fields = Map("temp" -> 2.0)) == 1)
      assert(GraftDB.atCsv(spark, f.toString, encoding = "ISO-8859-1")
        .get(TagQuery("ciudad") === "münchen").get.fields("temp") == 2.0)
    }

    it("flush_on_insert=false persists identically (fsync is the only difference)") {
      import graft.engine.GraftDB
      import graft.query._
      val f = Files.createTempFile("refcsvflush", ".csv")
      Files.delete(f)
      val db = GraftDB.atCsv(spark, f.toString, flushOnInsert = false)
      db.insertMultiple(Seq(
        Point(Instant.parse("2024-01-01T00:00:00Z"), "m", fields = Map("v" -> 1.0)),
        Point(Instant.parse("2024-01-02T00:00:00Z"), "m", fields = Map("v" -> 2.0))))
      assert(GraftDB.atCsv(spark, f.toString).count(FieldQuery("v") >= 1.0) == 2)
    }

    it("create_dirs=false fails on a missing parent like python open(); true creates it") {
      import graft.engine.GraftDB
      val base = Files.createTempDirectory("refcsvdirs")
      val nested = base.resolve("a/b/data.csv").toString
      intercept[java.io.FileNotFoundException] {
        GraftDB.atCsv(spark, nested)
      }
      val db = GraftDB.atCsv(spark, nested, createDirs = true)
      db.insert(Point(Instant.parse("2024-01-01T00:00:00Z"), "m", fields = Map("v" -> 1.0)))
      assert(GraftDB.atCsv(spark, nested).length == 1)
    }

    it("newline translation mirrors python open(): default stays \\r\\n, '\\r\\n' doubles") {
      val src = writeTemp(Seq("2024-01-01T00:00:00,m,_field_v,1.0"))
      val df = ReferenceCsv.read(spark, src)
      val out = Files.createTempFile("refcsvnl", ".csv").toString
      ReferenceCsv.writeFile(df, out)
      val bytes = new String(Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
      assert(bytes.endsWith("\r\n") && !bytes.endsWith("\r\r\n"))
      // the python footgun, preserved for fidelity: open(newline='\r\n')
      // translates the csv module's \n, leaving \r\r\n on disk
      ReferenceCsv.writeFile(df, out, newline = "\r\n")
      assert(new String(Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
        .endsWith("\r\r\n"))
      intercept[IllegalArgumentException] {
        ReferenceCsv.writeFile(df, out, newline = "bogus")
      }
    }

    it("read-only handles refuse mutation before touching the file (op 54)") {
      import graft.engine.GraftDB
      import graft.query._
      val p = writeTemp(Seq("2024-01-01T00:00:00,m,_tag_a,x,_field_b,1.5"))
      val db = GraftDB.atCsv(spark, p, readOnly = true)
      assert(db.length == 1) // reads fine
      intercept[UnsupportedOperationException] {
        db.insert(graft.model.Point(java.time.Instant.now(), "m", Map(), Map("b" -> 2.0)))
      }
      intercept[UnsupportedOperationException] { db.removeAll() }
      assert(GraftDB.atCsv(spark, p).length == 1) // file untouched
    }

    it("file modes guard per op like python open() (op 54, storages.py:196-261)") {
      import graft.engine.GraftDB
      import graft.query._
      def pt(v: Double) =
        graft.model.Point(java.time.Instant.parse("2024-01-01T00:00:00Z"), "m",
          Map(), Map("b" -> v))
      val p = writeTemp(Seq("2024-01-01T00:00:00,m,_tag_a,x,_field_b,1.5"))

      // 'a': append-only — insert lands after existing rows, reads and
      // rewrites refuse
      val a = GraftDB.atCsv(spark, p, accessMode = "a")
      a.insert(pt(2.0))
      intercept[UnsupportedOperationException] { a.length }
      intercept[UnsupportedOperationException] { a.removeAll() }

      // 'a+': read + append, still no rewrite
      val ap = GraftDB.atCsv(spark, p, accessMode = "a+")
      assert(ap.length == 2)
      ap.insert(pt(3.0))
      assert(ap.getFieldValues("b").map(_.doubleValue) == Seq(1.5, 2.0, 3.0))
      intercept[UnsupportedOperationException] { ap.update(FieldQuery("b") === 3.0, fields = Map("b" -> 9.0)) }

      // 'w': truncates on open, append + rewrite ok, read refuses
      val w = GraftDB.atCsv(spark, p, accessMode = "w")
      w.insert(pt(7.0))
      intercept[UnsupportedOperationException] { w.length }
      assert(GraftDB.atCsv(spark, p, accessMode = "r").getFieldValues("b")
        .map(_.doubleValue) == Seq(7.0)) // the truncation really happened

      // 'w+': full access, truncates on open
      val wp = GraftDB.atCsv(spark, p, accessMode = "w+")
      assert(wp.length == 0)
      wp.insert(pt(8.0))
      assert(wp.update(FieldQuery("b") === 8.0, fields = Map("b" -> 9.0)) == 1)
      assert(wp.getFieldValues("b").map(_.doubleValue) == Seq(9.0))

      // invalid mode and 'r' on a missing file fail fast
      intercept[IllegalArgumentException] { GraftDB.atCsv(spark, p, accessMode = "x") }
      intercept[java.io.FileNotFoundException] {
        GraftDB.atCsv(spark, p + ".does-not-exist", accessMode = "r")
      }
      // '+'-modes create a missing file like python open()
      val fresh = p + ".fresh"
      assert(GraftDB.atCsv(spark, fresh, accessMode = "r+").length == 0)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(fresh)))
    }

    it("close() refuses further ops; using() closes on exit (database.py:126-208)") {
      import graft.engine.GraftDB
      val p = writeTemp(Seq("2024-01-01T00:00:00,m,_tag_a,x,_field_b,1.5"))
      val db = GraftDB.atCsv(spark, p)
      assert(db.open && db.length == 1)
      db.close()
      db.close() // idempotent
      assert(!db.open)
      intercept[IllegalStateException] { db.length }
      intercept[IllegalStateException] {
        db.insert(graft.model.Point(java.time.Instant.now(), "m", Map(), Map("b" -> 2.0)))
      }
      intercept[IllegalStateException] { db.compact() }
      val n = GraftDB.using(GraftDB.atCsv(spark, p)) { d => d.length }
      assert(n == 1)
    }

    it("round-trips 200 seeded-random points with adversarial strings and values") {
      val rnd = new scala.util.Random(20260812L)
      // NOTE: no "\r\n" case — Spark's CSV parser (univocity) normalizes
      // line separators INSIDE quoted cells to "\n" on read, a known
      // fidelity limit documented on ReferenceCsv.read; bare "\n" is
      // preserved and covered here.
      val trickyStrings = Seq(
        "plain", "has,comma", "has\"quote", "wrapped \"both\", really",
        "line\nbreak", "", " leading space", "trailing ",
        "ünïcödé ✓", "_none_not_sentinel", "tab\there", "a,b\",\"c")
      def str() = trickyStrings(rnd.nextInt(trickyStrings.length)) + rnd.nextInt(100)
      def tagVal(): String = if (rnd.nextInt(8) == 0) null else str()
      def fieldVal(): java.lang.Double = rnd.nextInt(6) match {
        case 0 => null
        case 1 => Double.box(rnd.nextInt(1000).toDouble)  // int-like
        case 2 => Double.box(-rnd.nextDouble() * 1e-7)    // exponent repr
        case 3 => Double.box(rnd.nextDouble() * 1e15)
        case _ => Double.box(rnd.nextDouble() * 200 - 100)
      }
      val pts = (0 until 200).map { i =>
        val micros = if (rnd.nextBoolean()) 0 else rnd.nextInt(1000000)
        Point(
          time = Instant.ofEpochSecond(1700000000L + rnd.nextInt(10000000), micros * 1000L),
          measurement = if (rnd.nextInt(10) == 0) Point.DefaultMeasurement else str(),
          tags = (0 until rnd.nextInt(4)).map(k => s"t$k${str()}" -> tagVal()).toMap,
          fields = (0 until rnd.nextInt(4)).map(k => s"f$k" -> fieldVal()).toMap,
          _seq = i.toLong)
      }
      val path = Files.createTempFile("graftprop", ".csv").toString
      val df = spark.createDataFrame(spark.sparkContext.parallelize(
        pts.map(p => org.apache.spark.sql.Row(
          java.sql.Timestamp.from(p.time), p.measurement, p.tags, p.fields, p._seq))),
        Point.schema)
      ReferenceCsv.writeFile(df, path)
      val back = ReferenceCsv.read(spark, path).collect().sortBy(_.getAs[Long](Point.SeqCol))
        .map(r => (r.getAs[java.sql.Timestamp](Point.TimeCol).toInstant,
          r.getAs[String](Point.MeasurementCol),
          Option(r.getAs[Map[String, String]](Point.TagsCol)).getOrElse(Map.empty),
          Option(r.getAs[Map[String, java.lang.Double]](Point.FieldsCol)).getOrElse(Map.empty)))
      assert(back.length == pts.length)
      pts.zip(back).foreach { case (p, (t, m, tg, fl)) =>
        assert(t == p.time, s"time for seq ${p._seq}")
        assert(m == p.measurement, s"measurement for seq ${p._seq}")
        assert(tg == p.tags, s"tags for seq ${p._seq}")
        assert(fl == p.fields, s"fields for seq ${p._seq}")
      }
    }

    it("driver-side small-batch serialization is byte-identical to the distributed formatter") {
      // enough rows to cross the parallel-chunk boundary (2048/chunk) so
      // the multi-threaded driver path proves ordering too; built from a
      // LOCAL collection (LocalRelation, exact size stats) so the size
      // gate actually routes it down the driver-side path — a parallelize
      // batch reports unknown stats and takes the distributed writer
      val rnd = new scala.util.Random(20260813L)
      val tricky = Seq("plain", "has,comma", "has\"quote", "a\nb", "ünïcödé ✓", "", " sp ")
      val pts = (0 until 5000).map { i =>
        Point(
          time = if (i % 97 == 0) null
            else Instant.ofEpochSecond(1700000000L + rnd.nextInt(1000000), rnd.nextInt(1000000) * 1000L),
          measurement = if (i % 11 == 0) Point.DefaultMeasurement else tricky(rnd.nextInt(tricky.length)) + i,
          tags = (0 until rnd.nextInt(3)).map(k => s"t$k" -> (if (rnd.nextInt(7) == 0) null else tricky(rnd.nextInt(tricky.length)))).toMap,
          fields = (0 until rnd.nextInt(3)).map(k => s"f$k" -> (rnd.nextInt(5) match {
            case 0 => null
            case 1 => Double.box(rnd.nextInt(1000).toDouble)
            case _ => Double.box(rnd.nextDouble() * 1e6 - 5e5)
          })).toMap,
          _seq = i.toLong)
      }
      val df = spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(pts.map(p => org.apache.spark.sql.Row(
          Option(p.time).map(java.sql.Timestamp.from).orNull,
          p.measurement, p.tags, p.fields, p._seq))).asJava,
        Point.schema)
      val path = Files.createTempFile("graftlocalcsv", ".csv").toString
      ReferenceCsv.writeFile(df, path)
      val fileLines = new String(Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
        .split("\r\n", -1).toSeq.dropRight(1) // trailing terminator
      val expected = ReferenceCsv.toLines(df).collect().map(_.getString(0)).toSeq
      assert(fileLines.length == expected.length)
      fileLines.zip(expected).zipWithIndex.foreach { case ((got, want), i) =>
        assert(got == want, s"line $i diverges between driver-side and distributed formatting")
      }
    }

    it("compact-prefix export reads back identically") {
      val src = writeTemp(Seq("2024-01-01T00:00:00,m,_tag_a,x,_field_b,1.5"))
      val df = ReferenceCsv.read(spark, src)
      val out = Files.createTempFile("refcsv-out", ".csv").toString
      ReferenceCsv.writeFile(df, out, compactPrefixes = true)
      val line = new String(Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8").trim
      assert(line == "2024-01-01T00:00:00,m,t_a,x,f_b,1.5")
    }

    it("rows wider than the width guess auto-widen instead of silently truncating") {
      // 70 fields + 5 tags = 75 pairs > DefaultMaxPairs(64): the first
      // parse fills its last cell, forcing the doubled retry
      val tags = (0 until 5).map(i => s"_tag_t$i,v$i").mkString(",")
      val fields = (0 until 70).map(i => s"_field_f$i,$i.5").mkString(",")
      val src = writeTemp(Seq(
        s"2024-01-01T00:00:00,wide,$tags,$fields",
        "2024-01-02T00:00:00,narrow,_tag_a,x,_field_b,1.0"))
      val back = ReferenceCsv.read(spark, src).orderBy(Point.SeqCol).collect()
      val wide = Option(back(0).getAs[Map[String, java.lang.Double]](Point.FieldsCol)).get
      assert(wide.size == 70 && wide("f69") == 69.5)
      assert(back(0).getAs[Map[String, String]](Point.TagsCol).size == 5)
      assert(back(1).getAs[Map[String, java.lang.Double]](Point.FieldsCol) == Map("b" -> 1.0))
    }

    it("a file of only blank lines reads as empty (probe must not NPE on zero rows)") {
      // Files.size > 0 so knownEmpty is false, but the CSV parser skips
      // blank lines -> zero rows; sum() over zero rows is null
      val src = writeTemp(Seq("", "", ""))
      assert(ReferenceCsv.read(spark, src).count() == 0)
    }

    it("auto-widen fires when the final schema cell holds an EMPTY tag value") {
      // The widen probe must distinguish an empty-string cell (present,
      // row may be truncated) from schema padding (absent, null). A
      // nullValue="" parse folds both to null and this row's third tag
      // would be silently lost.
      val src = writeTemp(Seq(
        "2024-01-01T00:00:00,m,_tag_a,x,_tag_b,,_tag_c,z"))
      val back = ReferenceCsv.read(spark, src, maxPairs = 2).collect()
      val tags = back(0).getAs[Map[String, String]](Point.TagsCol)
      assert(tags == Map("a" -> "x", "b" -> "", "c" -> "z"))
    }
  }
}
