package graft

import java.time.Instant

import org.apache.spark.sql.functions._

import graft.analytics.{AsOf, Similarity, TextAnalysis, TimeSeries}
import graft.engine.GraftDB
import graft.model.Point

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  describe("as-of join") {
    lazy val left = Seq( // (key, ts, seq)
      ("a", 100L, 10L), ("a", 200L, 11L), ("a", 50L, 12L), ("b", 100L, 13L)
    ).toDF("k", "ts", "seq")
    lazy val right = Seq( // (key, ts, seq, payload)
      ("a", 100L, 1L, "r1"), ("a", 150L, 2L, "r2"), ("c", 10L, 3L, "r3")
    ).toDF("k", "ts", "seq", "payload")

    it("attaches most recent right row at-or-before, null when none") {
      val out = AsOf.asOfJoinPrev(left, right, Seq("k"), "ts", "seq", Nil, Seq("payload"))
        .select("k", "ts", "seq", "payload").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(out == Set(
        ("a", 100L, 10L, "r1"), // tie: right at same ts matched (<=)
        ("a", 200L, 11L, "r2"),
        ("a", 50L, 12L, null),  // nothing before
        ("b", 100L, 13L, null)  // key with no right rows
      ))
    }
  }

  describe("brute-force + LSH top-k") {
    lazy val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.7f, 0.7f)), (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    lazy val queries = Seq((100L, Array(1.0f, 0.0f))).toDF("qid", "embedding")

    it("brute force ranks by cosine") {
      val r = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", "qid", 3)
        .orderBy("rank").select("id").as[Long].collect().toSeq
      assert(r == Seq(0L, 1L, 3L))
    }
    it("lsh top-k recalls the exact top-1") {
      val r = Similarity.lshTopK(corpus, queries, "vec_id", "embedding", "qid", 3,
        bits = 2, seeds = Seq(1, 2, 3, 4)).select("id").as[Long].collect().toSet
      assert(r.contains(0L))
    }
    it("IVF top-k equals brute force at nProbe == nCells, and probes find clustered neighbors") {
      val rnd = new scala.util.Random(5)
      def around(cx: Double, cy: Double, id: Long) =
        (id, Array((cx + rnd.nextGaussian() * 0.05).toFloat, (cy + rnd.nextGaussian() * 0.05).toFloat))
      // three tight clusters on the unit circle
      val big = (
        (0L until 20L).map(i => around(1.0, 0.0, i)) ++
        (20L until 40L).map(i => around(0.0, 1.0, i)) ++
        (40L until 60L).map(i => around(-1.0, 0.0, i))).toDF("vec_id", "embedding")
      val qs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))).toDF("qid", "embedding")
      val brute = Similarity.bruteForceTopK(big, qs, "vec_id", "embedding", "qid", 5)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      val full = Similarity.ivfTopK(big, qs, "vec_id", "embedding", "qid", 5,
        nCells = 3, nProbe = 3).select("qid", "id").as[(Long, Long)].collect().toSet
      assert(full == brute)
      val probed = Similarity.ivfTopK(big, qs, "vec_id", "embedding", "qid", 5,
        nCells = 3, nProbe = 1).select("qid", "id").as[(Long, Long)].collect().toSet
      // with one probe each query still finds its own tight cluster
      assert(probed == brute)
    }
    it("fixed-centroid IVF equals brute force at nProbe == nCells (q81 shape)") {
      val rnd = new scala.util.Random(7)
      def around(cx: Double, cy: Double, id: Long, label: Long) =
        (id, label, Array((cx + rnd.nextGaussian() * 0.05).toFloat,
          (cy + rnd.nextGaussian() * 0.05).toFloat))
      val big = (
        (0L until 20L).map(i => around(1.0, 0.0, i, 0L)) ++
        (20L until 40L).map(i => around(0.0, 1.0, i, 1L)) ++
        (40L until 60L).map(i => around(-1.0, 0.0, i, 2L))).toDF("vec_id", "label", "embedding")
      val qs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))).toDF("qid", "embedding")
      val cents = Similarity.centroids(
        big.select($"label", graft.functions.VectorFunctions.l2Normalize($"embedding").as("nv")),
        "label", "nv")
      val brute = Similarity.bruteForceTopK(big, qs, "vec_id", "embedding", "qid", 5)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      val full = Similarity.ivfTopKWithCentroids(big, qs, cents,
        "vec_id", "embedding", "qid", k = 5, nProbe = 3)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      assert(full == brute)
      // one probe per query: the label centroids ARE the clusters, so
      // each query's own cell already holds its true top-5
      val probed = Similarity.ivfTopKWithCentroids(big, qs, cents,
        "vec_id", "embedding", "qid", k = 5, nProbe = 1)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      assert(probed == brute)
    }
    it("persisted IVF index serves identical results through the cell-pruned scan") {
      val rnd = new scala.util.Random(7)
      def around(cx: Double, cy: Double, id: Long, label: Long) =
        (id, label, Array((cx + rnd.nextGaussian() * 0.05).toFloat,
          (cy + rnd.nextGaussian() * 0.05).toFloat))
      val big = (
        (0L until 20L).map(i => around(1.0, 0.0, i, 0L)) ++
        (20L until 40L).map(i => around(0.0, 1.0, i, 1L)) ++
        (40L until 60L).map(i => around(-1.0, 0.0, i, 2L))).toDF("vec_id", "label", "embedding")
      val qs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))).toDF("qid", "embedding")
      val cents = Similarity.centroids(
        big.select($"label", graft.functions.VectorFunctions.l2Normalize($"embedding").as("nv")),
        "label", "nv")
      val dir = java.nio.file.Files.createTempDirectory("graftivf").toString + "/ivf"
      Similarity.ivfPersist(big, cents, "vec_id", "embedding", dir)
      val inMemory = Similarity.ivfTopKWithCentroids(big, qs, cents,
        "vec_id", "embedding", "qid", k = 5, nProbe = 1)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      val served = Similarity.ivfTopKPersisted(dir, qs, cents,
        "qid", "embedding", k = 5, nProbe = 1)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      assert(served == inMemory && served.nonEmpty)
    }
    it("persisted OPQ-IVF+PQ index serves BIT-IDENTICAL ranks to the in-query computation") {
      val sf = "/root/testdata/sf0.001"
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val q = e.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding")
      val cents = Similarity.centroids(
        e.select($"label", graft.functions.VectorFunctions.l2Normalize($"embedding").as("nv")),
        "label", "nv").select($"group", $"i", round($"c", 6).as("c"))
      val perm = Similarity.opqPermutation(e, cents, "vec_id", "embedding", 4, 16)
      val cb = Similarity.opqResidualPqCodebooks(
        e, cents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
      val inQuery = Similarity.opqResidualIvfPqTopK(e, q, cents, perm, cb,
        "vec_id", "embedding", "qid", k = 10, nProbe = 2, m = 4, subDim = 16)
        .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
      graft.util.Scratch.withDir("opqidxspec") { dir =>
        Similarity.opqIvfPqPersist(e, cents, perm, cb,
          "vec_id", "embedding", 4, 16, dir)
        val served = Similarity.opqIvfPqTopKPersisted(dir, q,
          "qid", "embedding", k = 10, nProbe = 2, m = 4, subDim = 16)
          .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
        // full (qid, id, rank) equality — not just the id sets: the
        // parquet round trip must not perturb a single ADC rank
        assert(served == inQuery && served.nonEmpty)
      }
    }
    it("incremental append == one-shot persist under the same frozen quantizers") {
      val sf = "/root/testdata/sf0.001"
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val base = e.filter($"vec_id" % 2 === 0)
      val delta = e.filter($"vec_id" % 2 === 1)
      val q = e.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding")
      val cents = Similarity.centroids(
        base.select($"label", graft.functions.VectorFunctions.l2Normalize($"embedding").as("nv")),
        "label", "nv").select($"group", $"i", round($"c", 6).as("c"))
      val perm = Similarity.opqPermutation(base, cents, "vec_id", "embedding", 4, 16)
      val cb = Similarity.opqResidualPqCodebooks(
        base, cents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
      def serve(dir: String) = Similarity.opqIvfPqTopKPersisted(dir, q,
        "qid", "embedding", k = 10, nProbe = 2, m = 4, subDim = 16)
        .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
      graft.util.Scratch.withDir("opqappA") { a =>
        Similarity.opqIvfPqPersist(base, cents, perm, cb, "vec_id", "embedding", 4, 16, a)
        Similarity.opqIvfPqAppend(delta, a, "vec_id", "embedding", 4, 16)
        // every vector (base + appended) carries exactly m codes — the
        // append landed in the layout, none doubled, none dropped
        assert(spark.read.parquet(
          s"${Similarity.liveGenDir(spark, a)}/codes").count() === e.count() * 4)
        graft.util.Scratch.withDir("opqappB") { b =>
          // one-shot persist of the UNION under the SAME (base-trained)
          // quantizers — the append path must be indistinguishable
          Similarity.opqIvfPqPersist(e, cents, perm, cb, "vec_id", "embedding", 4, 16, b)
          assert(serve(a) === serve(b))
          assert(serve(a).nonEmpty)
        }
        // persisted serving config: the generation carries the operating
        // point it was validated at — defaults round-trip, the
        // defaults-serve equals the explicit-parameter serve, appends
        // with a mismatched structural split are refused, and compaction
        // carries the config into the next generation
        val cfg = Similarity.indexConfig(spark, a)
        // the persist DEFAULT is the flagship operating point (q195):
        // nProbe=7 / rerankR=200 (the r15 grid's dominant row) — a
        // default persist validates at the high-recall config unless
        // the operator opts down explicitly
        assert(cfg === Similarity.IndexConfig(m = 4, subDim = 16, nProbe = 7, rerankR = 200))
        val byDefaults = Similarity.opqIvfPqTopKPersistedDefaults(a, q,
          "qid", "embedding", k = 10)
          .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
        assert(byDefaults === Similarity.opqIvfPqTopKPersisted(a, q,
          "qid", "embedding", k = 10, nProbe = cfg.nProbe, m = 4, subDim = 16)
          .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet)
        assert(byDefaults.nonEmpty)
        val mis = intercept[IllegalArgumentException] {
          Similarity.opqIvfPqAppend(delta, a, "vec_id", "embedding", m = 8, subDim = 8)
        }
        assert(mis.getMessage.contains("persisted at"))
        Similarity.opqIvfPqCompact(spark, a)
        assert(Similarity.indexConfig(spark, a) === cfg,
          "compaction must carry the serving config into the new generation")
        // the FULL persisted operating point: shortlist at the persisted
        // rerankR/nProbe, exact-rerank refine — must equal the same
        // composition spelled out with explicit parameters
        val viaConfig = Similarity.opqIvfPqTopKPersistedRerank(
          a, e, q, "vec_id", "embedding", "qid", k = 10)
          .select("qid", "id").as[(Long, Long)].collect().toSet
        val explicit = Similarity.exactRerank(e, q,
          Similarity.opqIvfPqTopKPersisted(a, q, "qid", "embedding",
            k = cfg.rerankR, nProbe = cfg.nProbe, m = cfg.m, subDim = cfg.subDim),
          "vec_id", "embedding", "qid", k = 10)
          .select("qid", "id").as[(Long, Long)].collect().toSet
        assert(viaConfig === explicit,
          "persisted-config rerank serve must equal the explicit composition")
      }
    }
    it("index compaction: one file per inverted list, identical serve, dead-run leftovers recovered") {
      val sf = "/root/testdata/sf0.001"
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val q = e.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding")
      val cents = Similarity.centroids(
        e.select($"label", graft.functions.VectorFunctions.l2Normalize($"embedding").as("nv")),
        "label", "nv").select($"group", $"i", round($"c", 6).as("c"))
      val perm = Similarity.opqPermutation(e, cents, "vec_id", "embedding", 4, 16)
      val cb = Similarity.opqResidualPqCodebooks(
        e, cents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
      def serve(dir: String) = Similarity.opqIvfPqTopKPersisted(dir, q,
        "qid", "embedding", k = 10, nProbe = 2, m = 4, subDim = 16)
        .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
      def filesPerCell(dir: String): Map[String, Int] =
        new java.io.File(s"${Similarity.liveGenDir(spark, dir)}/codes").listFiles()
          .filter(_.getName.startsWith("cell="))
          .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
      graft.util.Scratch.withDir("opqcompactspec") { idx =>
        Similarity.opqIvfPqPersist(
          e.filter($"vec_id" % 3 === 0), cents, perm, cb, "vec_id", "embedding", 4, 16, idx)
        Similarity.opqIvfPqAppend(
          e.filter($"vec_id" % 3 === 1), idx, "vec_id", "embedding", 4, 16)
        Similarity.opqIvfPqAppend(
          e.filter($"vec_id" % 3 === 2), idx, "vec_id", "embedding", 4, 16)
        val before = serve(idx)
        assert(filesPerCell(idx).values.max > 1, "appends should leave multiple files per cell")
        // a dead compactor's partial staged generation (pointer never
        // moved, no commit marker) must not poison the next run — it is
        // pre-commit garbage and gets discarded
        val genBefore = Similarity.liveGenDir(spark, idx)
        val strayGen = genBefore.replaceAll("gen-(\\d+)$", "gen-99999")
        new java.io.File(s"$strayGen/codes").mkdirs()
        Similarity.opqIvfPqCompact(spark, idx)
        assert(!new java.io.File(strayGen).exists(),
          "pre-commit staged generation should be discarded by the next maintenance op")
        assert(filesPerCell(idx).values.forall(_ == 1),
          s"compaction should leave ONE file per inverted list: ${filesPerCell(idx)}")
        assert(serve(idx) === before, "compaction changed the serve result")
        // compaction committed a NEW generation; the pre-compaction one
        // survives until the next commit (the in-flight-reader window)
        assert(Similarity.liveGenDir(spark, idx) !== genBefore)
        assert(new java.io.File(genBefore).exists(),
          "previous generation should survive one commit for in-flight readers")
        // ... and the commit after that prunes it
        Similarity.opqIvfPqCompact(spark, idx)
        assert(!new java.io.File(genBefore).exists(),
          "generation two commits back should be pruned")
        assert(serve(idx) === before, "second compaction changed the serve result")
        // keep-depth is configurable for long lock-free serves against
        // rapid maintenance cadences: with genKeepDepth=2, the commit
        // after next still spares the two previous generations
        val genKept = Similarity.liveGenDir(spark, idx)
        spark.conf.set("graft.index.genKeepDepth", "2")
        try {
          Similarity.opqIvfPqCompact(spark, idx)
          Similarity.opqIvfPqCompact(spark, idx)
          assert(new java.io.File(genKept).exists(),
            "genKeepDepth=2 should spare a generation two commits back")
        } finally spark.conf.unset("graft.index.genKeepDepth")
        // an FS stall wedged in the flip window (pointer AND marker
        // unreadable, generations present) must fail RETRIABLY, not
        // serve an empty index as if that were the answer
        val curGen = Similarity.liveGenDir(spark, idx)
          .replaceAll(".*gen-0*", "").toLong
        assert(new java.io.File(s"$idx/_current").delete())
        val ex = intercept[java.io.IOException] { Similarity.liveGenDir(spark, idx) }
        assert(ex.getMessage.contains("retry the read"))
        // once the stall clears (pointer visible again), the same read
        // serves the committed generation unchanged
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(idx, "_current"), curGen.toString)
        assert(serve(idx) === before, "recovered index changed the serve result")
      }
    }
    it("streaming serve restart adds nothing: same checkpoint + store converge once") {
      import org.apache.spark.sql.streaming.Trigger
      val sf = "/root/testdata/sf0.001"
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val cents = Similarity.centroids(
        e.select($"label", graft.functions.VectorFunctions.l2Normalize($"embedding").as("nv")),
        "label", "nv").select($"group", $"i", round($"c", 6).as("c"))
      val perm = Similarity.opqPermutation(e, cents, "vec_id", "embedding", 4, 16)
      val cb = Similarity.opqResidualPqCodebooks(
        e, cents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
      graft.util.Scratch.withDir("annservrestart") { idx =>
        Similarity.opqIvfPqPersist(e, cents, perm, cb, "vec_id", "embedding", 4, 16, idx)
        val qtopic = graft.util.Scratch.dir("annservrq")
        new graft.streaming.GraftLogProducer(qtopic).publish(Seq("0", "1", "2"))
        val ck = graft.util.Scratch.dir("annservrck")
        val db = graft.engine.GraftDB.inMemory(spark)
        def runServe(): Unit = {
          val sq = spark.readStream.format("graft-log")
            .option("path", qtopic).option("maxRecordsPerTrigger", 1L).load()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
              val qs = batch.select($"payload".cast("long").as("qid"))
                .join(e.select($"vec_id".as("qid"), $"embedding"), "qid")
              val res = Similarity.opqIvfPqTopKPersisted(idx, qs,
                "qid", "embedding", k = 10, nProbe = 2, m = 4, subDim = 16)
              val pts = res.select(
                timestamp_millis(lit(0L) + $"qid").as(graft.model.Point.TimeCol),
                lit("annserve").as(graft.model.Point.MeasurementCol),
                map(lit("qid"), $"qid".cast("string")).as(graft.model.Point.TagsCol),
                map(lit("id"), $"id".cast("double"), lit("rank"), $"rank".cast("double"))
                  .as(graft.model.Point.FieldsCol))
              db.insertDFIdempotent(pts.localCheckpoint(true), f"annserve-b$batchId%012d")
              ()
            }
            .start()
          sq.awaitTermination()
        }
        runServe()
        val after1 = db.length
        assert(after1 === 30L) // 3 queries × top-10
        // restart the identical stream on the same checkpoint and store:
        // no new source data, no new batches, and even a re-delivered
        // batch would hit its committed token — the store must not move
        runServe()
        assert(db.length === after1, "restart duplicated streaming-serve results")
        // more queries arrive: only the NEW ones land
        new graft.streaming.GraftLogProducer(qtopic).publish(Seq("3"))
        runServe()
        assert(db.length === after1 + 10L)
      }
    }
    it("crashed retrain: readers keep serving the committed generation; maintenance rolls the commit forward") {
      val sf = "/root/testdata/sf0.001"
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val base = e.filter($"vec_id" % 2 === 0)
      val q = e.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding")
      def quantizers(train: org.apache.spark.sql.DataFrame) = {
        val c = Similarity.centroids(
          train.select($"label",
            graft.functions.VectorFunctions.l2Normalize($"embedding").as("nv")),
          "label", "nv").select($"group", $"i", round($"c", 6).as("c"))
        val p = Similarity.opqPermutation(train, c, "vec_id", "embedding", 4, 16)
        val b = Similarity.opqResidualPqCodebooks(
          train, c, p, "vec_id", "embedding", 4, 16, signBits = 6)
        (c, p, b)
      }
      def serve(dir: String) = Similarity.opqIvfPqTopKPersisted(dir, q,
        "qid", "embedding", k = 10, nProbe = 2, m = 4, subDim = 16)
        .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
      val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
        spark.sessionState.newHadoopConf())
      graft.util.Scratch.withDir("opqcrash") { b =>
        val (c1, p1, cb1) = quantizers(base)
        Similarity.opqIvfPqPersist(base, c1, p1, cb1, "vec_id", "embedding", 4, 16, b)
        val expected1 = serve(b)
        // a RETRAIN with different quantizers commits generation 2
        val (c2, p2, cb2) = quantizers(e)
        Similarity.opqIvfPqPersist(e, c2, p2, cb2, "vec_id", "embedding", 4, 16, b)
        val expected2 = serve(b)
        assert(expected2 !== expected1, "retrain should change the serve result")
        // manufacture the crash state "marker written, pointer not yet
        // flipped": the staged generation is complete by protocol
        def write(p: String, v: String): Unit = {
          val out = fs.create(new org.apache.hadoop.fs.Path(p), true)
          try out.write(v.getBytes("UTF-8")) finally out.close()
        }
        write(s"$b/_current", "1")
        write(s"$b/_commit_pending", "2")
        // readers are NOT blocked and NOT mixed: they serve the
        // committed generation (1) consistently — quantizers AND codes
        assert(serve(b) === expected1, "reader should serve the committed generation during a pending commit")
        assert(Similarity.opqIvfPqStats(spark, b).collect().nonEmpty)
        // ANY later maintenance op rolls the commit forward (the marker
        // means generation 2 is complete); compaction preserves content
        Similarity.opqIvfPqCompact(spark, b)
        assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$b/_commit_pending")))
        assert(serve(b) === expected2)
        // pre-marker crash: a PARTIAL staged generation above the
        // pointer, no marker — discarded, readers never saw it
        val stray = new java.io.File(s"$b/gen-99998/codes")
        stray.mkdirs()
        assert(serve(b) === expected2)
        Similarity.opqIvfPqCompact(spark, b)
        assert(!new java.io.File(s"$b/gen-99998").exists())
        assert(serve(b) === expected2)
      }
    }

    it("zero-downtime retrain: concurrent serves never fail and never mix generations") {
      val sf = "/root/testdata/sf0.001"
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val base = e.filter($"vec_id" % 2 === 0)
      val q = e.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding")
      def quantizers(train: org.apache.spark.sql.DataFrame) = {
        val c = Similarity.centroids(
          train.select($"label",
            graft.functions.VectorFunctions.l2Normalize($"embedding").as("nv")),
          "label", "nv").select($"group", $"i", round($"c", 6).as("c"))
        val p = Similarity.opqPermutation(train, c, "vec_id", "embedding", 4, 16)
        val b = Similarity.opqResidualPqCodebooks(
          train, c, p, "vec_id", "embedding", 4, 16, signBits = 6)
        (c, p, b)
      }
      def serve(dir: String) = Similarity.opqIvfPqTopKPersisted(dir, q,
        "qid", "embedding", k = 10, nProbe = 2, m = 4, subDim = 16)
        .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
      graft.util.Scratch.withDir("opqzerodt") { idx =>
        val (c1, p1, cb1) = quantizers(base)
        val (c2, p2, cb2) = quantizers(e)
        Similarity.opqIvfPqPersist(base, c1, p1, cb1, "vec_id", "embedding", 4, 16, idx)
        val expected1 = serve(idx)
        // the retrain's expected output, computed on a sibling index so
        // the membership check below is exact
        val expected2 = graft.util.Scratch.withDir("opqzerodtref") { ref =>
          Similarity.opqIvfPqPersist(e, c2, p2, cb2, "vec_id", "embedding", 4, 16, ref)
          serve(ref)
        }
        assert(expected2 !== expected1)
        // serve CONCURRENTLY with the retrain: every result must be one
        // complete generation's answer — the old or the new, never an
        // error, never a quantizer/codes mixture (a mixture would match
        // neither expected set)
        val results = new java.util.concurrent.ConcurrentLinkedQueue[Set[(Long, Long, Int)]]()
        val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val retrainDone = new java.util.concurrent.atomic.AtomicBoolean(false)
        val reader = new Thread(() => {
          while (!retrainDone.get()) {
            try results.add(serve(idx))
            catch { case t: Throwable => failures.add(t) }
          }
        }, "zero-downtime-reader")
        reader.start()
        try Similarity.opqIvfPqPersist(e, c2, p2, cb2, "vec_id", "embedding", 4, 16, idx)
        finally retrainDone.set(true)
        reader.join(120000)
        assert(failures.isEmpty, s"concurrent serve failed during retrain: ${failures.peek()}")
        import scala.jdk.CollectionConverters._
        val seen = results.asScala.toList
        assert(seen.nonEmpty, "reader thread never completed a serve")
        seen.foreach { r =>
          assert(r === expected1 || r === expected2,
            "a concurrent serve returned a result matching NEITHER generation (mixed state)")
        }
        assert(serve(idx) === expected2, "post-retrain serve should see the new generation")
      }
    }

    it("persisted-serve entries pin no executor storage memory after teardown") {
      // the q181-style entries materialize DISK-backed (scratch parquet,
      // dropped at per-query teardown) and the serve's probe set rides a
      // local relation — so a long session accumulates ZERO MEMORY_AND_
      // DISK blocks from them, which this pins exactly
      val before = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
      val mark = graft.util.Scratch.marker()
      val res = graft.entries.CorpusQueries.queries("q181_ann_opq_persisted")(
        spark, "/root/testdata/sf0.001")
      assert(res.count() === 30L)
      graft.util.Scratch.releaseSince(mark)
      val leaked = spark.sparkContext.getRDDStorageInfo.filterNot(i => before.contains(i.id))
      assert(leaked.isEmpty,
        s"entry left storage blocks pinned: ${leaked.map(i => s"rdd${i.id}=${i.memSize}B").mkString(", ")}")
    }

    it("persist rejects non-integral cell ids (directory inference cannot round-trip them)") {
      val sf = "/root/testdata/sf0.001"
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val strCents = Similarity.centroids(
        e.select(concat(lit("L"), $"label").as("label"),
          graft.functions.VectorFunctions.l2Normalize($"embedding").as("nv")),
        "label", "nv").select($"group", $"i", round($"c", 6).as("c"))
      val perm = Similarity.opqPermutation(e, strCents, "vec_id", "embedding", 4, 16)
      val cb = Similarity.opqResidualPqCodebooks(
        e, strCents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
      graft.util.Scratch.withDir("opqstrcell") { idx =>
        val ex = intercept[IllegalArgumentException](
          Similarity.opqIvfPqPersist(e, strCents, perm, cb, "vec_id", "embedding", 4, 16, idx))
        assert(ex.getMessage.contains("integral cell ids"))
      }
    }

    it("md5-derived hyperplane signatures are deterministic 0/1 bits and recall the top-1") {
      import graft.functions.VectorFunctions.md5HyperplaneSignature
      val sigs = corpus.select($"vec_id",
        md5HyperplaneSignature($"embedding", 8, 1).as("sig"))
        .as[(Long, Seq[Int])].collect().toMap
      assert(sigs.values.forall(s => s.size == 8 && s.forall(b => b == 0 || b == 1)))
      // near-identical vectors share a bucket; opposite vectors do not
      assert(sigs(0L) == sigs(1L))
      assert(sigs(0L) != sigs(4L))
      val r = Similarity.lshTopK(corpus, queries, "vec_id", "embedding", "qid", 3,
        bits = 2, seeds = Seq(1, 2, 3, 4),
        signature = md5HyperplaneSignature).select("id").as[Long].collect().toSet
      assert(r.contains(0L))
    }
  }

  describe("product quantization (PQ/ADC)") {
    val sf = "/root/testdata/sf0.001"
    it("self-match is ADC-optimal: a query's own codes minimize its table sums") {
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val cb = graft.analytics.Similarity.pqCodebooks(e, "label", "embedding", m = 4, subDim = 16)
      val top = graft.analytics.Similarity.pqTopK(e,
        e.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding")),
        cb, "vec_id", "embedding", "qid", k = 1, m = 4, subDim = 16)
        .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("id")).toMap
      // adc(q, q) <= adc(q, v) for every v (q's codes are per-sub argmins
      // of q's own table), so rank 1 must be the query itself
      (0L to 2L).foreach(q => assert(top(q) === q, s"query $q"))
    }
    it("codes are m per vector, drawn from the label code space") {
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val cb = graft.analytics.Similarity.pqCodebooks(e, "label", "embedding", m = 4, subDim = 16)
      val enc = graft.analytics.Similarity.pqEncode(e, cb, "vec_id", "embedding", m = 4, subDim = 16)
      val n = e.count()
      assert(enc.count() === n * 4)
      assert(enc.groupBy("id").count().filter(col("count") =!= 4).count() === 0L)
      assert(enc.filter(col("code") < 0 || col("code") > 9).count() === 0L)
    }
    it("ADC picks are far more similar than chance despite 16:1 compression") {
      // exact-recall is the wrong bar for 10-code label codebooks on
      // near-random synthetic vectors (quantization error dominates —
      // see the PqProbe recall-vs-m table in BENCH_NOTES); the claim
      // ADC must honor is that ranking by table sums finds genuinely
      // similar vectors, not noise
      import graft.functions.VectorFunctions.{dot, l2Normalize}
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val cb = graft.analytics.Similarity.pqCodebooks(e, "label", "embedding", m = 4, subDim = 16)
      val q = e.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding"))
      val pq = graft.analytics.Similarity.pqTopK(e, q, cb,
        "vec_id", "embedding", "qid", k = 10, m = 4, subDim = 16)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
      val u = e.select(col("vec_id").cast("long").as("id"), l2Normalize(col("embedding")).as("cv"))
      val cos = u.crossJoin(u.filter(col("id") < 3)
          .select(col("id").as("qid"), col("cv").as("qv")))
        .select(col("qid"), col("id"), dot(col("cv"), col("qv")).as("cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val nonSelf = cos.filter { case ((qid, id), _) => qid != id }
      val pqMean = nonSelf.view.filterKeys(pq.contains).values.sum /
        nonSelf.keys.count(pq.contains)
      val chanceMean = nonSelf.values.sum / nonSelf.size
      // measured: pq ~0.104 vs chance ~0.0025 (40x) — the band is wide
      // enough that only a broken ranking can cross it
      assert(pqMean > chanceMean + 0.05, s"pq=$pqMean chance=$chanceMean")
    }
  }

  describe("ANN recall floors at the gated configs") {
    // The q81/q82/q110/q111 hash gates pin exact replayability; this
    // pins approximation QUALITY — a de-optimization in banding,
    // probing or encoding that still replays deterministically would
    // pass the gates yet drop recall, and trips here instead. Floors
    // sit just under the measured deterministic recalls (PqProbe
    // dashboard in BENCH_NOTES: 0.10 / 0.38 / 0.20 / 0.14 at
    // sf0.001, 10 queries, k=10).
    it("LSH/IVF/PQ/IVF+PQ recall@10 vs brute force cannot silently drop") {
      val sf = "/root/testdata/sf0.001"
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding"))
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("qid").cast("long"), col("id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(graft.analytics.Similarity.bruteForceTopK(
        e, q, "vec_id", "embedding", "qid", 10))
      def recall(a: Set[(Long, Long)]): Double =
        (a intersect exact).size.toDouble / exact.size

      val lsh = recall(pairs(graft.analytics.Similarity.lshTopK(e, q,
        "vec_id", "embedding", "qid", 10, bits = 8, seeds = Seq(1),
        signature = graft.functions.VectorFunctions.md5HyperplaneSignature)))
      assert(lsh >= 0.10, s"LSH recall dropped: $lsh")

      val cents = graft.analytics.Similarity.centroids(
        e.select(col("label"),
          graft.functions.VectorFunctions.l2Normalize(col("embedding")).as("nv")),
        "label", "nv")
        .select(col("group"), col("i"), round(col("c"), 6).as("c"))
      val ivf = recall(pairs(graft.analytics.Similarity.ivfTopKWithCentroids(
        e, q, cents, "vec_id", "embedding", "qid", 10, nProbe = 2)))
      assert(ivf >= 0.35, s"IVF recall dropped: $ivf")

      val cb = graft.analytics.Similarity.pqCodebooks(e, "label", "embedding", 4, 16)
      val pq = recall(pairs(graft.analytics.Similarity.pqTopK(e, q, cb,
        "vec_id", "embedding", "qid", 10, 4, 16)))
      assert(pq >= 0.18, s"PQ recall dropped: $pq")

      val ivfpq = recall(pairs(graft.analytics.Similarity.ivfPqTopK(e, q, cents, cb,
        "vec_id", "embedding", "qid", 10, nProbe = 2, m = 4, subDim = 16)))
      assert(ivfpq >= 0.12, s"IVF+PQ recall dropped: $ivfpq")

      // residual codes (q174) must BEAT the raw-vector codes (q111) at
      // identical bytes — that superiority is the whole point of the
      // FAISS residual form, so it is pinned, not just the floor
      val rcb = graft.analytics.Similarity.residualPqCodebooks(
        e, cents, "vec_id", "embedding", 4, 16)
      val rivfpq = recall(pairs(graft.analytics.Similarity.residualIvfPqTopK(
        e, q, cents, rcb, "vec_id", "embedding", "qid", 10, nProbe = 2, m = 4, subDim = 16)))
      info(s"recall@10: ivfpq=$ivfpq residual=$rivfpq")
      assert(rivfpq > ivfpq, s"residual IVF+PQ ($rivfpq) should beat raw IVF+PQ ($ivfpq)")
      assert(rivfpq >= 0.18, s"residual IVF+PQ recall dropped: $rivfpq") // measured 0.20

      // OPQ rotation (q178) must BEAT the un-rotated residual form
      // (q174) at identical bytes — the rotation's whole claim, pinned
      // like the residual-vs-raw superiority above (measured 0.26 vs
      // 0.20 here; 0.20 vs 0.14 at sf0.1)
      val perm = graft.analytics.Similarity.opqPermutation(
        e, cents, "vec_id", "embedding", 4, 16)
      val ocb = graft.analytics.Similarity.opqResidualPqCodebooks(
        e, cents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
      val opq = recall(pairs(graft.analytics.Similarity.opqResidualIvfPqTopK(
        e, q, cents, perm, ocb, "vec_id", "embedding", "qid", 10,
        nProbe = 2, m = 4, subDim = 16)))
      info(s"recall@10: opq=$opq")
      assert(opq > rivfpq, s"OPQ residual IVF+PQ ($opq) should beat residual ($rivfpq)")
      assert(opq >= 0.24, s"OPQ recall dropped: $opq") // measured 0.26
      // exact re-rank of the R=50 OPQ shortlist (q180): recall@10
      // equals recall@50 of the underlying tier, so the refined
      // result must dominate the un-refined one — that dominance and
      // a floor just under the measured recall are both pinned
      val short50 = graft.analytics.Similarity.opqResidualIvfPqTopK(
        e, q, cents, perm, ocb, "vec_id", "embedding", "qid", 50,
        nProbe = 2, m = 4, subDim = 16)
      val rer = recall(pairs(graft.analytics.Similarity.exactRerank(
        e, q, short50, "vec_id", "embedding", "qid", 10)))
      info(s"recall@10: rerank=$rer")
      assert(rer > opq, s"exact re-rank ($rer) should beat its ADC tier ($opq)")
      assert(rer >= 0.35, s"re-rank recall dropped: $rer") // measured 0.38 (= the
      // nProbe=2 coarse ceiling: q81's exact IVF row — refine recovers
      // everything the probe admits)
      // every refined hit must come from the shortlist, and within the
      // shortlist the refinement is EXACT — so any true-top-10 member
      // present in the shortlist must surface in the refined top-10
      val shortSet = pairs(short50)
      val refined = pairs(graft.analytics.Similarity.exactRerank(
        e, q, short50, "vec_id", "embedding", "qid", 10))
      assert(refined.subsetOf(shortSet), "rerank invented a candidate outside its shortlist")
      assert((exact intersect shortSet).subsetOf(refined),
        "a true top-10 member in the shortlist failed to surface after exact re-rank")
      // duplicate shortlist rows must not double-occupy top-k slots
      val dupRefined = pairs(graft.analytics.Similarity.exactRerank(
        e, q, short50.unionAll(short50), "vec_id", "embedding", "qid", 10))
      assert(dupRefined === refined, "duplicated shortlist changed the refined result")

      // Lloyd-TRAINED coarse quantizer (q186): three k-means rounds
      // refine the label seed before the OPQ chain trains — the trained
      // cells must BEAT the label cells at identical bytes (measured
      // 0.30 vs 0.26 here; 0.21 vs 0.20 at sf0.1), the whole point of
      // wiring the trainer into the serving tier
      val lcents = graft.analytics.Similarity.lloydRefine(
        e, cents, "vec_id", "embedding", iters = 3)
      val lperm = graft.analytics.Similarity.opqPermutation(
        e, lcents, "vec_id", "embedding", 4, 16)
      val locb = graft.analytics.Similarity.opqResidualPqCodebooks(
        e, lcents, lperm, "vec_id", "embedding", 4, 16, signBits = 6)
      val lloyd = recall(pairs(graft.analytics.Similarity.opqResidualIvfPqTopK(
        e, q, lcents, lperm, locb, "vec_id", "embedding", "qid", 10,
        nProbe = 2, m = 4, subDim = 16)))
      info(s"recall@10: lloyd=$lloyd")
      assert(lloyd > opq, s"Lloyd-trained quantizer ($lloyd) should beat label cells ($opq)")
      assert(lloyd >= 0.28, s"Lloyd-trained recall dropped: $lloyd") // measured 0.30

      // TRAINED PQ subspace codebooks (q190): per-subspace Lloyd rounds
      // over the orthant seed, on the q186 trained cells — the last
      // untrained quantizer gets its k-means step, and must BEAT the
      // orthant codebooks at identical bytes (measured 0.32 vs 0.30
      // here at iters=3, 0.23 vs 0.21 at sf0.1; see the PqProbe sweep)
      val tcb = graft.analytics.Similarity.opqPqLloydRefine(
        e, lcents, lperm, locb, "vec_id", "embedding", 4, 16, iters = 3)
      val trainedPq = recall(pairs(graft.analytics.Similarity.opqResidualIvfPqTopK(
        e, q, lcents, lperm, tcb, "vec_id", "embedding", "qid", 10,
        nProbe = 2, m = 4, subDim = 16)))
      info(s"recall@10: trained-pq=$trainedPq")
      assert(trainedPq > lloyd,
        s"trained PQ codebooks ($trainedPq) should beat the orthant seed ($lloyd)")
      assert(trainedPq >= 0.30, s"trained-PQ recall dropped: $trainedPq") // measured 0.32

      // the HIGH-RECALL operating point (q187): R=100/nProbe=5 re-rank
      // — must dominate the default q180 point (wider probe AND wider
      // shortlist) and hold its measured level (0.70 here; 0.46 at sf0.1)
      val short187 = graft.analytics.Similarity.opqResidualIvfPqTopK(
        e, q, cents, perm, ocb, "vec_id", "embedding", "qid", 100,
        nProbe = 5, m = 4, subDim = 16)
      val hi = recall(pairs(graft.analytics.Similarity.exactRerank(
        e, q, short187, "vec_id", "embedding", "qid", 10)))
      info(s"recall@10: hi-rerank=$hi")
      assert(hi > rer, s"high-recall config ($hi) should beat the R=50/nProbe=2 point ($rer)")
      assert(hi >= 0.65, s"high-recall re-rank dropped: $hi") // measured 0.70

      // the FLAGSHIP composition (q195): trained cells + trained PQ
      // codebooks + exact re-rank at the grid-validated R=200/nProbe=7
      // point (the r15 grid's dominant row: 0.923/0.800 at
      // sf0.001/sf0.1 on real data, 30-query PqProbe, vs 0.917/0.757
      // for the r14 (7,150) default at identical index bytes) — must
      // beat the best single-trained composition (the
      // untrained-codebook Lloyd + q187-style rerank, the r13
      // dashboard headline) AND not fall below the r14 operating
      // point it replaced (this synthetic corpus measures its own
      // levels, pinned below)
      val fshort = graft.analytics.Similarity.opqResidualIvfPqTopK(
        e, q, lcents, lperm, tcb, "vec_id", "embedding", "qid", 200,
        nProbe = 7, m = 4, subDim = 16)
      val flagship = recall(pairs(graft.analytics.Similarity.exactRerank(
        e, q, fshort, "vec_id", "embedding", "qid", 10)))
      val fshort150 = graft.analytics.Similarity.opqResidualIvfPqTopK(
        e, q, lcents, lperm, tcb, "vec_id", "embedding", "qid", 150,
        nProbe = 7, m = 4, subDim = 16)
      val flagship150 = recall(pairs(graft.analytics.Similarity.exactRerank(
        e, q, fshort150, "vec_id", "embedding", "qid", 10)))
      assert(flagship >= flagship150,
        s"widening the refine (R=200: $flagship) must not lose to the " +
          s"r14 point (R=150: $flagship150) — rerank recall is monotone in R")
      val lhishort = graft.analytics.Similarity.opqResidualIvfPqTopK(
        e, q, lcents, lperm, locb, "vec_id", "embedding", "qid", 100,
        nProbe = 5, m = 4, subDim = 16)
      val lhi = recall(pairs(graft.analytics.Similarity.exactRerank(
        e, q, lhishort, "vec_id", "embedding", "qid", 10)))
      info(s"recall@10: flagship=$flagship lloyd+rerank=$lhi")
      assert(flagship > lhi,
        s"flagship ($flagship) should beat the untrained-codebook Lloyd+rerank point ($lhi)")
      assert(flagship >= hi,
        s"flagship ($flagship) should not fall below the label-cell high-recall point ($hi)")

      // SWAP-TRAINED rotation (q196): the greedy variance-balancing
      // swaps must never degrade the trained stack below its q190
      // floor at identical bytes (the gated swapIters=2 point —
      // dominant at both scales in the 30-query PqProbe sweep)
      val sperm = graft.analytics.Similarity.opqSwapRefine(
        e, lcents, "vec_id", "embedding", 4, 16, iters = 2)
      val scb0 = graft.analytics.Similarity.opqResidualPqCodebooks(
        e, lcents, sperm, "vec_id", "embedding", 4, 16, signBits = 6)
      val scb = graft.analytics.Similarity.opqPqLloydRefine(
        e, lcents, sperm, scb0, "vec_id", "embedding", 4, 16, iters = 3)
      val swapped = recall(pairs(graft.analytics.Similarity.opqResidualIvfPqTopK(
        e, q, lcents, sperm, scb, "vec_id", "embedding", "qid", 10,
        nProbe = 2, m = 4, subDim = 16)))
      info(s"recall@10: swap-trained=$swapped (trained-pq=$trainedPq)")
      assert(swapped >= 0.28, s"swap-trained recall dropped: $swapped")
      // zero swap rounds reproduce the snake-deal exactly
      val seedPerm = graft.analytics.Similarity.opqSwapRefine(
        e, lcents, "vec_id", "embedding", 4, 16, iters = 0)
      assert(seedPerm.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet ===
        lperm.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet,
        "opqSwapRefine(iters=0) must equal the snake-deal permutation")

      // the permutation is a bijection over the 64 dims, split 16/16/16/16
      val pRows = perm.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      assert(pRows.map(_._1).sorted.toSeq === (1 to 64))
      assert(pRows.groupBy(_._2).view.mapValues(_.length).toMap ===
        Map(0 -> 16, 1 -> 16, 2 -> 16, 3 -> 16))
      assert(pRows.map(p => (p._2, p._3)).distinct.length === 64)

      // CELL-COUNT REALISM (r16): the rows above probe 7 of 10 label
      // cells (70% of the corpus); a production IVF probes nProbe ≪
      // nCells. Train 16 Lloyd cells from deterministic spaced-vector
      // seeds and hold the flagship serve config — recall must stay
      // near the 10-cell flagship even though the probed fraction
      // drops to 7/16 (the PqProbe dashboard carries the 64/128/256-
      // cell rows at both scales; this pins the floor in CI)
      val n16 = {
        val corpusN = e.count()
        val step = math.max(1L, corpusN / 16)
        val seedIds = (0 until 16).map(_ * step)
        val seed16 = e.filter(col("vec_id").isin(seedIds: _*))
          .select(col("vec_id").as("group"),
            posexplode(graft.functions.VectorFunctions.l2Normalize(col("embedding"))))
          .select(col("group"), col("pos").as("i"),
            round(col("col").cast("double"), 6).as("c"))
        val c16 = graft.analytics.Similarity.lloydRefine(
          e, seed16, "vec_id", "embedding", iters = 3)
        val p16 = graft.analytics.Similarity.opqPermutation(
          e, c16, "vec_id", "embedding", 4, 16)
        val b0 = graft.analytics.Similarity.opqResidualPqCodebooks(
          e, c16, p16, "vec_id", "embedding", 4, 16, signBits = 6)
        val b16 = graft.analytics.Similarity.opqPqLloydRefine(
          e, c16, p16, b0, "vec_id", "embedding", 4, 16, iters = 3)
        val s16 = graft.analytics.Similarity.opqResidualIvfPqTopK(
          e, q, c16, p16, b16, "vec_id", "embedding", "qid", 200,
          nProbe = 7, m = 4, subDim = 16)
        recall(pairs(graft.analytics.Similarity.exactRerank(
          e, q, s16, "vec_id", "embedding", "qid", 10)))
      }
      info(s"recall@10: 16-cell flagship=$n16 (vs 10-cell $flagship)")
      assert(n16 >= 0.80, s"16-cell flagship recall dropped: $n16") // measured 0.86
    }
  }

  describe("hard-negative mining") {
    it("returns only different-label vectors, ranked exactly like a filtered exact scan") {
      val sf = "/root/testdata/sf0.001"
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val anchors = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("label"), col("embedding"))
      val negs = graft.analytics.Similarity.hardNegatives(e, anchors,
        "vec_id", "embedding", "label", "qid", k = 10).collect()
      val labels = e.select(col("vec_id").cast("long"), col("label"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      negs.foreach { r =>
        val (qid, id) = (r.getAs[Long]("qid"), r.getAs[Long]("id"))
        assert(labels(qid) !== labels(id), s"($qid,$id) shares the anchor label")
      }
      // the guard only removes candidates — scores of kept rows match the
      // unguarded exact ranking restricted to mismatched labels
      val full = graft.analytics.Similarity.bruteForceTopK(e,
        anchors.drop("label"), "vec_id", "embedding", "qid", k = e.count().toInt)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id")) -> r.getAs[Double]("cosine")).toMap
      negs.foreach { r =>
        assert(full((r.getAs[Long]("qid"), r.getAs[Long]("id"))) === r.getAs[Double]("cosine"))
      }
      assert(negs.length === 30)
    }
  }

  describe("IVF+PQ composition") {
    val sf = "/root/testdata/sf0.001"
    it("returns only candidates from the query's probed cells, ranked like pure PQ") {
      import graft.functions.VectorFunctions.l2Normalize
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val cents = graft.analytics.Similarity.centroids(
        e.select(col("label"), l2Normalize(col("embedding")).as("nv")), "label", "nv")
        .select(col("group"), col("i"), round(col("c"), 6).as("c"))
      val cb = graft.analytics.Similarity.pqCodebooks(e, "label", "embedding", m = 4, subDim = 16)
      val q = e.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding"))
      val ivfpq = graft.analytics.Similarity.ivfPqTopK(e, q, cents, cb,
        "vec_id", "embedding", "qid", k = 10, nProbe = 2, m = 4, subDim = 16)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"), r.getAs[Double]("adc")))
      // with nProbe = cells (5 probes cover all 10 labels? use all) the
      // composition must reduce to pure PQ — here check the subset
      // relation instead: every (qid, id, adc) of IVF+PQ appears with
      // the SAME adc in the unpruned PQ ranking's candidate scores
      val pq = graft.analytics.Similarity.pqTopK(e, q, cb,
        "vec_id", "embedding", "qid", k = e.count().toInt, m = 4, subDim = 16)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id")) -> r.getAs[Double]("adc")).toMap
      ivfpq.foreach { case (qid, id, adc) =>
        assert(pq((qid, id)) === adc, s"($qid,$id)") // pruning never changes a kept score
      }
      // and the probe pruning is real: with nProbe=2 of 10 cells some
      // of pure-PQ's global top-10 fall outside the probed lists
      assert(ivfpq.length === 30)
    }
  }

  describe("bucketized interval join") {
    it("matches a direct range-predicate join, boundaries inclusive") {
      import graft.analytics.Interval
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val events = Seq(
        (1L, ts("2024-01-01 00:00:00")), // == start boundary
        (2L, ts("2024-01-01 03:30:00")),
        (3L, ts("2024-01-01 08:00:00")), // == end boundary
        (4L, ts("2024-01-01 09:00:00")), // outside
        (5L, ts("2024-01-02 01:00:00"))  // second window
      ).toDF("eid", "t")
      val wins = Seq(
        (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 08:00:00")),
        (20L, ts("2024-01-02 00:00:00"), ts("2024-01-02 08:00:00")),
        (30L, ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00")) // overlapping window
      ).toDF("wid", "ws", "we")
      val got = Interval.joinByBucket(events, "t", wins, "ws", "we", bucketSeconds = 3600)
        .select("eid", "wid").as[(Long, Long)].collect().toSet
      val expect = events.join(wins, col("t") >= col("ws") && col("t") <= col("we"))
        .select("eid", "wid").as[(Long, Long)].collect().toSet
      assert(got == expect)
      assert(got == Set((1L, 10L), (2L, 10L), (2L, 30L), (3L, 10L), (5L, 20L)))
    }
    it("intervals spanning more than one explode chunk still match exactly") {
      import graft.analytics.Interval
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // one window covering 3000 one-second buckets (crosses two 1024-
      // bucket chunk borders); probes at the ends, middle, chunk seams,
      // and just outside
      val events = Seq(
        (1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:17:04")), // = bucket 1024
        (3L, ts("2024-01-01 00:34:08")), // = bucket 2048
        (4L, ts("2024-01-01 00:49:59")), (5L, ts("2024-01-01 00:50:00"))  // outside
      ).toDF("eid", "t")
      val wins = Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:49:59")))
        .toDF("wid", "ws", "we")
      val got = Interval.joinByBucket(events, "t", wins, "ws", "we", bucketSeconds = 1)
        .select("eid").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 3L, 4L))
    }
    it("malformed intervals (end < start) drop silently instead of failing the job") {
      import graft.analytics.Interval
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val events = Seq((1L, ts("2024-01-01 00:30:00"))).toDF("eid", "t")
      val wins = Seq(
        (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")), // well-formed
        (20L, ts("2024-01-01 02:00:00"), ts("2024-01-01 00:00:00"))  // end < start
      ).toDF("wid", "ws", "we")
      val got = Interval.joinByBucket(events, "t", wins, "ws", "we", bucketSeconds = 3600)
        .select("eid", "wid").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)))
    }
  }

  describe("salted skew join") {
    it("produces exactly the unsalted inner-join result") {
      import graft.analytics.Skew
      val left = Seq.tabulate(200)(i => (if (i < 150) "hot" else s"k$i", i))
        .toDF("k", "v") // 75% of rows share one key
      val right = Seq(("hot", 1.0), ("k160", 2.0), ("k199", 3.0), ("absent", 4.0))
        .toDF("k", "w")
      val expect = left.join(right, Seq("k")).select("k", "v", "w")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
      val got = Skew.saltedJoin(left, right, Seq("k"), saltBuckets = 8)
        .select("k", "v", "w")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
      assert(got == expect && expect.size == 152)
    }
    it("skew profile reports the straggler factor") {
      import graft.analytics.Skew
      val left = Seq.tabulate(100)(i => (if (i < 91) "hot" else s"k$i", i)).toDF("k", "v")
      val row = Skew.keySkewProfile(left, Seq("k")).head()
      assert(row.getLong(0) == 91L)
      assert(row.getDouble(2) > 5.0)
    }
  }

  describe("gap fill + forward fill") {
    it("fills missing buckets per key and carries the last value") {
      import graft.analytics.TimeSeries
      val df = Seq(
        ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 1.0),
        ("a", java.sql.Timestamp.valueOf("2024-01-01 00:03:10"), 4.0),
        ("b", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 9.0)
      ).toDF("k", "t", "v")
      val out = TimeSeries.gapFillForward(df, "k", "t", "v", 60L)
        .select(col("key"), col("bucket_time").cast("string"), col("observed"), col("filled"))
        .collect().map(r => (r.getString(0), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3)))
      val a = out.filter(_._1 == "a").sortBy(_._2)
      assert(a.map(_._2).toSeq == Seq("2024-01-01 00:00:00", "2024-01-01 00:01:00",
        "2024-01-01 00:02:00", "2024-01-01 00:03:00"))
      assert(a.map(_._3).toSeq == Seq(Some(1.0), None, None, Some(4.0)))
      assert(a.map(_._4).toSeq == Seq(1.0, 1.0, 1.0, 4.0)) // gaps carry 1.0 forward
      assert(out.count(_._1 == "b") == 1)
    }
    it("grids longer than one chunk are complete and seamless at chunk boundaries") {
      import graft.analytics.TimeSeries
      // 3000 one-second buckets — crosses two GridChunk(=1024) borders;
      // observations only at the ends, so every intermediate bucket is
      // generated (not observed) and carries the first value forward
      val df = Seq(
        ("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
        ("k", java.sql.Timestamp.valueOf("2024-01-01 00:49:59"), 2.0) // +2999 s
      ).toDF("k", "t", "v")
      val out = TimeSeries.gapFillForward(df, "k", "t", "v", 1L)
        .select(col("bucket_time").cast("long"), col("filled")).as[(Long, Double)]
        .collect().sortBy(_._1)
      assert(out.length == 3000)
      // contiguous: no bucket missing or duplicated across chunk joins
      assert(out.map(_._1).toSeq == (out.head._1 until out.head._1 + 3000L).toSeq)
      assert(out.init.forall(_._2 == 1.0) && out.last._2 == 2.0)
    }
  }

  describe("text analysis") {
    it("token and subword counts") {
      val df = Seq((1L, "hello world, it's 2024!")).toDF("id", "text")
      val r = df.select(
        TextAnalysis.tokenCount(col("text")),
        TextAnalysis.subwordCount(col("text"))).head()
      assert(r.getInt(0) == 4)
      // hello | world | , | it | ' | s | 2024 | !
      assert(r.getInt(1) == 8)
    }
    it("fingerprint is order-sensitive and deterministic") {
      val df = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("id", "text")
      val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fps(1L) == fps(3L))
      assert(fps(1L) != fps(2L))
    }
    it("language id votes by stopwords") {
      val df = Seq(
        (1L, "the cat is on the mat with a hat"),
        (2L, "el gato es un animal y la casa es grande"),
        (3L, "qwerty zxcvb")).toDF("id", "text")
      val langs = TextAnalysis.languageId(df, "id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(langs(1L) == "en")
      assert(langs(2L) == "es")
      assert(langs(3L) == "und")
    }
    it("quality features on crafted text") {
      val df = Seq((1L, "the of and xx")).toDF("id", "text")
      val r = TextAnalysis.qualityFeatures(df, "id", "text").head()
      assert(r.getInt(1) == 4)                     // n_tokens
      assert(math.abs(r.getDouble(3) - 0.75) < 1e-12) // stopword_ratio 3/4
    }
    it("bm25 matches a local reference; zero-match docs are dropped by integer test") {
      val corpus = Seq(
        (0L, "spark merge window spark"),
        (1L, "the quick fox"),
        (2L, "merge merge merge join"),
        (3L, "window"),
        (4L, ""))
      val terms = Seq("spark", "merge", "window")
      val got = TextAnalysis.bm25(corpus.toDF("id", "text"), "id", "text", terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val toks = corpus.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty) }
      val n = toks.size.toDouble
      val avgdl = toks.map(_._2.length).sum / n
      val dfc = terms.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
      def score(ws: Array[String]): Double = terms.map { t =>
        val f = ws.count(_ == t).toDouble
        val idf = math.log((n - dfc(t) + 0.5) / (dfc(t) + 0.5) + 1.0)
        idf * f * (1.2 + 1.0) / (f + 1.2 * (0.25 + 0.75 * ws.length / avgdl))
      }.sum
      toks.foreach { case (id, ws) =>
        if (terms.exists(ws.contains)) {
          assert(math.abs(got(id) - score(ws)) < 1e-9, s"doc $id")
          assert(got(id) > 0.0)
        } else assert(!got.contains(id), s"doc $id should be dropped")
      }
      // more occurrences of a rarer term must outrank fewer of a common one
      assert(got(0L) > got(3L)) // doc0 has 2x spark + window vs doc3's lone window
      intercept[IllegalArgumentException] { TextAnalysis.bm25(corpus.toDF("id", "text"), "id", "text", Nil) }
    }
    it("char-trigram LM scores are the exact mean corpus count of a doc's grams") {
      // corpus grams: abcd -> abc,bcd ; bcda -> bcd,cda ; ab -> whole-text fallback
      // counts: abc=1, bcd=2, cda=1, ab=1
      val df = Seq((1L, "abcd"), (2L, "bcda"), (3L, "ab")).toDF("id", "text")
      val got = TextAnalysis.charTrigramLmScore(df, "id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(got(1L) === ((2L, 3L, 1.5)))  // (abc=1) + (bcd=2)
      assert(got(2L) === ((2L, 3L, 1.5)))  // (bcd=2) + (cda=1)
      assert(got(3L) === ((1L, 1L, 1.0)))  // short-doc fallback gram
      // gibberish (rare grams) scores strictly below natural repetition
      val corpus = (0L until 20L).map(i => (i, "the cat sat on the mat")) :+ (99L, "zqxjkvbw")
      val scores = TextAnalysis.charTrigramLmScore(corpus.toDF("id", "text"), "id", "text")
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(scores(99L) < scores(0L) / 5.0)
    }
    it("bpe pair counts count adjacent chars within words only, total-ordered cut") {
      val df = Seq((1L, "aaab aa"), (2L, "ab x")).toDF("id", "text")
      // pairs: aaab -> aa,aa,ab ; aa -> aa ; ab -> ab ; x -> none
      val got = TextAnalysis.bpePairCounts(df, "text", k = 10)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got === Seq(("aa", 3L), ("ab", 2L)))
      // ties broken by pair ascending, so a k-cut is deterministic
      val tied = Seq((1L, "xy ab xy ab")).toDF("id", "text")
      val top1 = TextAnalysis.bpePairCounts(tied, "text", k = 1).head()
      assert(top1.getString(0) === "ab" && top1.getLong(1) === 2L)
    }
  }

  describe("pii scrub") {
    it("counts and masks emails, ipv4s, and phone-shaped numbers") {
      val df = Seq(
        (1L, "mail me at a.b+c@sub.example.org or root@h.io thanks"),
        (2L, "server 192.168.0.1 and 10.0.0.255 reply 555-0199"),
        (3L, "no pii here at all")).toDF("id", "text")
      val r = TextAnalysis.piiScrub(df, "id", "text")
        .collect().map(x => x.getLong(0) ->
          ((x.getLong(1), x.getLong(2), x.getLong(3)), x.getString(4))).toMap
      assert(r(1L)._1 == ((2L, 0L, 0L)))
      assert(r(1L)._2 == "mail me at <EMAIL> or <EMAIL> thanks")
      assert(r(2L)._1 == ((0L, 2L, 1L)))
      assert(r(2L)._2 == "server <IP> and <IP> reply <PHONE>")
      assert(r(3L)._1 == ((0L, 0L, 0L)) && r(3L)._2 == "no pii here at all")
    }
    it("redaction is sequential most-specific-first: an email eats its inner dots") {
      // the domain contains a digit run that the bare IP pattern would
      // never match anyway, but the email must be consumed as ONE token
      val df = Seq((1L, "x 1.2.3.4@a.bc y")).toDF("id", "text")
      val row = TextAnalysis.piiScrub(df, "id", "text").head()
      assert(row.getString(4) == "x <EMAIL> y")
    }
  }

  describe("time series aggregation") {
    def t(s: String): Instant = Instant.parse(s)
    lazy val db = {
      val d = GraftDB.inMemory(spark)
      d.insertMultiple(Seq(
        Point(t("2024-01-01T00:01:00Z"), "m", Map("s" -> "x"), Map("v" -> 1.0)),
        Point(t("2024-01-01T00:02:00Z"), "m", Map("s" -> "x"), Map("v" -> 3.0)),
        Point(t("2024-01-01T00:07:00Z"), "m", Map("s" -> "x"), Map("v" -> 5.0)),
        Point(t("2024-01-01T00:08:00Z"), "m", Map("s" -> "y"), Map("v" -> 7.0))))
      d
    }

    it("ewma matches the closed form and drops under-filled prefixes") {
      import spark.implicits._
      val xs = Seq(4.0, 8.0, 2.0, 6.0, 10.0)
      val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, i.toLong, v) }
        .toDF("key", "t", "tie", "value")
      val got = TimeSeries.ewma(df, "key", "t", "tie", "value", alpha = 0.3, terms = 3)
        .orderBy("t").collect()
      assert(got.map(_.getAs[Long]("t")).toSeq === Seq(2L, 3L, 4L)) // first 2 dropped
      got.foreach { r =>
        val i = r.getAs[Long]("t").toInt
        val expect = 0.3 * (xs(i) + 0.7 * xs(i - 1) + math.pow(0.7, 2) * xs(i - 2))
        assert(r.getAs[Double]("ewma") === expect, s"t=$i")
      }
    }

    it("moving z-score flags the planted spike with a hand-checked score") {
      import spark.implicits._
      // 9 calm points then a spike; window=7, sigma=2
      val vals = Seq(10.0, 12.0, 11.0, 10.0, 12.0, 11.0, 10.0, 12.0, 11.0, 50.0)
      val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, i.toLong, v) }
        .toDF("key", "t", "tie", "value")
      val out = TimeSeries.movingZScore(df, "key", "t", "tie", "value", nRows = 7, sigma = 2.0)
        .collect()
      assert(out.length === 1)
      val r = out.head
      assert(r.getAs[Long]("t") === 9L && r.getAs[Double]("v") === 50.0)
      // hand calculation over the trailing 7 (12,11,10,12,11,50 window:
      // rows 3..9 = 10,12,11,10,12,11,50)
      val w = vals.slice(3, 10)
      val n = w.size.toDouble
      val mean = w.sum / n
      val variance = (n * w.map(x => x * x).sum - w.sum * w.sum) / (n * n)
      val z = (50.0 - mean) / math.sqrt(variance)
      assert(math.abs(r.getAs[Double]("z") - BigDecimal(z).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      // partitioning cannot move the decimal-exact result
      val re = TimeSeries.movingZScore(df.repartition(7), "key", "t", "tie", "value", 7, 2.0)
        .collect()
      assert(re.map(_.toString).sorted.toSeq === out.map(_.toString).sorted.toSeq)
    }

    it("tumbling window aggregate") {
      val r = TimeSeries.tumblingAgg(db.df, "5 minutes", "v")
        .orderBy("window_start").select("agg0").as[Double].collect().toSeq
      assert(r == Seq(2.0, 6.0)) // avg(1,3) then avg(5,7)
    }
    it("moving aggregate per tagged series") {
      val r = TimeSeries.movingAgg(db.df, "v", "s", nRows = 2)
        .orderBy(Point.SeqCol).select("moving").as[Double].collect().toSeq
      assert(r == Seq(1.0, 2.0, 4.0, 7.0))
    }
    it("downsample last per window") {
      val r = TimeSeries.downsampleLast(db.df, "5 minutes", "v")
        .orderBy("window_start").select("last_value").as[Double].collect().toSeq
      assert(r == Seq(3.0, 7.0))
    }
  }
}
