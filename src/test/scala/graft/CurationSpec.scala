package graft

import org.apache.spark.sql.functions._

import graft.analytics.{Curation, Dedup}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  describe("deterministic hash sampling") {
    lazy val docs = (0L until 1000L).map(i => (i, s"doc $i")).toDF("id", "text")

    it("is stable across runs and cluster layouts") {
      val a = Curation.hashSample(docs, "id", 10).select("id").as[Long].collect().sorted
      val b = Curation.hashSample(docs.repartition(7), "id", 10)
        .select("id").as[Long].collect().sorted
      assert(a.sameElements(b))
      assert(a.nonEmpty && a.length < 250) // ~10% of 1000, generous bound
    }

    it("splits are disjoint, exhaustive, and roughly proportioned") {
      val (tr, va, te) = Curation.hashSplit(docs, "id", 80, 10)
      val (nTr, nVa, nTe) = (tr.count(), va.count(), te.count())
      assert(nTr + nVa + nTe == 1000)
      assert(nTr > 700 && nVa > 50 && nTe > 50)
      // different salts give independent assignments
      val sample = Curation.hashSample(docs, "id", 10).select("id").as[Long].collect().toSet
      val trainIds = tr.select("id").as[Long].collect().toSet
      assert(sample.exists(trainIds.contains) && sample.exists(id => !trainIds.contains(id)))
    }
  }

  describe("weighted source mixture") {
    it("keeps each source at ~its rate, deterministically; 0 drops, 1 keeps all") {
      val docs = (0L until 3000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
      val mixed = Curation.weightedMixture(docs, "id", "src",
        weights = Map("s0" -> 0.0, "s1" -> 1.0), defaultWeight = 0.3)
      val bySrc = mixed.groupBy("src").count().as[(String, Long)].collect().toMap
      assert(!bySrc.contains("s0"))               // rate 0: dropped entirely
      assert(bySrc("s1") == 1000L)                // rate 1: kept in full
      assert(bySrc("s2") > 200 && bySrc("s2") < 400) // ~30% default
      // deterministic across layouts (same rows, any partitioning)
      val again = Curation.weightedMixture(docs.repartition(7), "id", "src",
        weights = Map("s0" -> 0.0, "s1" -> 1.0), defaultWeight = 0.3)
        .select("id").as[Long].collect().sorted
      assert(again.sameElements(mixed.select("id").as[Long].collect().sorted))
      // a truncation-hazard rate (0.3*1000 = 299.999... in binary)
      // rounds to the exact per-mille threshold, matching hashSample's
      // bucket arithmetic at the equivalent percentage
      val viaSample = Curation.hashSample(
        docs.withColumnRenamed("id", "doc"), "doc", 30, salt = "mixture").count()
      val viaMixture = Curation.weightedMixture(docs, "id", "src",
        weights = Map.empty, defaultWeight = 0.3).count()
      // hashSample uses 100 buckets vs our 1000 — counts differ slightly,
      // but the 0.3 threshold must be 300/1000, i.e. no truncation to 299
      assert(viaMixture >= viaSample - 100 && viaMixture <= viaSample + 100)
      intercept[IllegalArgumentException] {
        Curation.weightedMixture(docs, "id", "src", Map("s0" -> 1.5))
      }
    }
  }

  describe("per-stratum quota") {
    it("keeps exactly k per stratum in the declared order") {
      val df = Seq(
        ("s1", 1L, 10L), ("s1", 2L, 30L), ("s1", 3L, 20L), ("s1", 4L, 30L),
        ("s2", 5L, 5L)
      ).toDF("src", "id", "len")
      val out = Curation.stratumCap(df, Seq("src"), 2, Seq(col("len").desc, col("id")))
        .select("id").as[Long].collect().toSet
      // s1: len-30 rows win, id 2 before id 4; s2: lone row survives
      assert(out == Set(2L, 4L, 5L))
    }
  }

  describe("sessionization") {
    it("breaks sessions on gaps > threshold with deterministic ties") {
      val gap = 1800L * 1000000L
      val e = Seq( // (user, ts_us, event_id)
        (1L, 0L, 1L), (1L, gap, 2L),          // within: gap == threshold
        (1L, 2 * gap + 1, 3L),                // new session: gap+1 beyond
        (1L, 2 * gap + 1, 4L),                // tie stays in same session
        (2L, 5L, 5L)
      ).toDF("user_id", "ts_us", "event_id")
      val out = Curation.sessionStats(e, "user_id", "ts_us", "event_id", gap)
        .select("user_id", "session_seq", "n_events", "start_us", "end_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(out == Set(
        (1L, 1L, 2L, 0L, gap),
        (1L, 2L, 2L, 2 * gap + 1, 2 * gap + 1),
        (2L, 1L, 1L, 5L, 5L)))
    }
  }

  describe("session funnel") {
    it("advances only on strictly-later events, first-match semantics") {
      val e = Seq( // (user, ts, id, type)
        // session A: full ordered funnel
        (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
        // session B: click BEFORE signup, purchase simultaneous with click
        (2L, 10L, 4L, "click"), (2L, 20L, 5L, "signup"), (2L, 20L, 6L, "purchase"),
        // session C: signup only
        (3L, 10L, 7L, "signup")
      ).toDF("user_id", "ts_us", "event_id", "event_type")
      val r = Curation.sessionFunnel(e, "user_id", "ts_us", "event_id", "event_type",
        gapUs = 1000L, steps = Seq("signup", "click", "purchase")).head()
      assert(r.getAs[Long]("n_sessions") === 3L)
      assert(r.getAs[Long]("reached_1") === 3L) // all three signed up
      assert(r.getAs[Long]("reached_2") === 1L) // only A clicked after signup
      assert(r.getAs[Long]("reached_3") === 1L) // only A purchased after that
    }
  }

  describe("retention cohorts") {
    it("buckets users by first day and counts exactly") {
      val day = 86400000000L
      val e = Seq( // user 1 active day 0 and 2; user 2 active day 1 only
        (1L, 0L), (1L, 10L), (1L, 2 * day), (2L, day + 5L)
      ).toDF("user_id", "ts_us")
      val got = Curation.retentionCohorts(e, "user_id", "ts_us", maxOffsetDays = 7)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
    }
  }

  describe("stratified sampling") {
    it("takes k per stratum, stable across partitionings") {
      val df = (0L until 300L).map(i => (s"s${i % 3}", i)).toDF("src", "id")
      val a = Curation.stratifiedSample(df, Seq("src"), 5, "id")
        .select("id").as[Long].collect().sorted
      val b = Curation.stratifiedSample(df.repartition(11), Seq("src"), 5, "id")
        .select("id").as[Long].collect().sorted
      assert(a.length == 15 && a.sameElements(b))
    }
  }

  describe("centroids and vocabulary") {
    it("computes element-wise per-group embedding means") {
      val df = Seq((0, Seq(1.0f, 3.0f)), (0, Seq(3.0f, 5.0f)), (1, Seq(2.0f, 2.0f)))
        .toDF("label", "embedding")
      val out = graft.analytics.Similarity.centroids(df, "label", "embedding")
        .as[(Int, Int, Double)].collect().toSet
      assert(out == Set((0, 0, 2.0), (0, 1, 4.0), (1, 0, 2.0), (1, 1, 2.0)))
    }

    it("ranks vocabulary by document frequency with deterministic cutoff") {
      val df = Seq((1L, "a a b"), (2L, "a c"), (3L, "b a")).toDF("doc_id", "text")
      val out = graft.analytics.TextAnalysis.vocabulary(df, "doc_id", "text", k = 2)
        .as[(String, Long, Long)].collect()
      assert(out.toSeq == Seq(("a", 3L, 4L), ("b", 2L, 2L)))
    }
  }

  describe("sequence packing") {
    it("chunks each shard's token stream at the budget; docs straddle boundaries") {
      val df = Seq( // (source, doc_id, n_tokens)
        ("a", 1L, 900L), ("a", 2L, 900L), ("a", 3L, 900L), ("a", 4L, 100L),
        ("b", 5L, 5000L), ("b", 6L, 1L)
      ).toDF("source", "doc_id", "n_tokens")
      val out = Curation.packChunks(df, Seq("source"), "doc_id", "n_tokens", 2000L)
        .select("doc_id", "chunk_id").as[(Long, Long)].collect().toMap
      // a: starts at 0, 900, 1800, 2700 -> chunks 0,0,0,1
      // b: oversized doc starts chunk 0; next doc starts at 5000 -> chunk 2
      assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L, 6L -> 2L))
    }
  }

  describe("sliding token-window chunking") {
    it("emits windows every stride, truncating at the doc end; empty docs emit none") {
      val df = Seq((1L, "a b c d e f g"), (2L, "x y"), (3L, "  ")).toDF("id", "text")
      val out = Curation.slidingChunks(df, "id", "text", chunkSize = 4, stride = 2)
        .orderBy("id", "chunk_id")
        .select("id", "chunk_id", "n_tokens").as[(Long, Long, Long)].collect().toSeq
      // doc1: starts 0,2,4,6 over 7 tokens -> sizes 4,4,3,1; doc2: one window of 2
      assert(out == Seq((1L, 0L, 4L), (1L, 1L, 4L), (1L, 2L, 3L), (1L, 3L, 1L), (2L, 0L, 2L)))
      // chunk content hash matches the sliced text exactly
      val first = Curation.slidingChunks(df, "id", "text", 4, 2)
        .filter(col("id") === 1L && col("chunk_id") === 1L).select("chunk_md5").head().getString(0)
      val expected = df.sparkSession.range(1).select(md5(lit("c d e f"))).head().getString(0)
      assert(first == expected)
    }
    it("stride = chunkSize gives disjoint blocks covering every token once") {
      val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
      val out = Curation.slidingChunks(df, "id", "text", chunkSize = 3, stride = 3)
        .select("n_tokens").as[Long].collect().toSeq
      assert(out.sorted == Seq(1L, 3L, 3L, 3L) && out.sum == 10L)
      intercept[IllegalArgumentException] {
        Curation.slidingChunks(df, "id", "text", chunkSize = 2, stride = 3)
      }
    }
  }

  describe("greedy token-budget selection") {
    lazy val docs = (0L until 500L)
      .map(i => (i, (i * 37 % 90) + 5, ((i * 13) % 100) / 100.0))
      .toDF("id", "w", "q")
    lazy val order = Seq(col("q").desc, col("id"))

    it("matches the naive single-window running sum exactly") {
      val got = Curation.budgetSelect(docs, order, "w", budget = 4000L, numPartitions = 8)
        .select("id").as[Long].collect().sorted
      val naive = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val ref = docs.withColumn("cum", sum(col("w")).over(naive))
        .filter(col("cum") <= 4000L).select("id").as[Long].collect().sorted
      assert(got.sameElements(ref) && got.nonEmpty && got.length < 500)
    }

    it("is layout-independent and handles the budget extremes") {
      val a = Curation.budgetSelect(docs, order, "w", 4000L, numPartitions = 8)
        .select("id").as[Long].collect().sorted
      val b = Curation.budgetSelect(docs.repartition(11), order, "w", 4000L, numPartitions = 8)
        .select("id").as[Long].collect().sorted
      assert(a.sameElements(b))
      assert(Curation.budgetSelect(docs, order, "w", Long.MaxValue, 8).count() == 500)
      assert(Curation.budgetSelect(docs, order, "w", 0L, 8).count() == 0)
    }
  }

  describe("weighted systematic sampling") {
    import spark.implicits._
    it("picks exactly the boundary-crossing rows, totalW div step of them") {
      val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1000L), (5L, 1L), (6L, 1L))
        .toDF("id", "w")
      val got = graft.analytics.Curation.weightedSystematicSample(
        df, Seq(col("id")), "w", step = 500L)
        .select("id").as[Long].collect().toSet
      // cum = 1,2,3,1003,1004,1005: only the heavy row crosses (500 and
      // 1000); picks == totalW div step == 2 boundaries, one row
      assert(got === Set(4L))
      // each boundary is crossed exactly once (positive weights), so
      // over a spread input the pick COUNT is exactly totalW div step
      val spread = (1L to 300L).map(i => (i, i % 7 + 1L)).toDF("id", "w")
      val totalW = spread.agg(sum("w")).head().getLong(0)
      val picks = graft.analytics.Curation.weightedSystematicSample(
        spread, Seq(col("id")), "w", step = 100L).count()
      assert(picks === totalW / 100L)
      // partitioning cannot move the integer running sum
      val a = graft.analytics.Curation.weightedSystematicSample(
        spread.repartition(13), Seq(col("id")), "w", step = 100L)
        .select("id").as[Long].collect().sorted.toSeq
      val b = graft.analytics.Curation.weightedSystematicSample(
        spread.repartition(1), Seq(col("id")), "w", step = 100L)
        .select("id").as[Long].collect().sorted.toSeq
      assert(a === b)
    }
  }

  describe("edge cases") {
    it("empty inputs flow through sessionize, components, and sampling") {
      val noEvents = Seq.empty[(Long, Long, Long)].toDF("user_id", "ts_us", "event_id")
      assert(Curation.sessionStats(noEvents, "user_id", "ts_us", "event_id", 1L).count() == 0)
      val noNodes = Seq.empty[Long].toDF("id")
      val noEdges = Seq.empty[(Long, Long)].toDF("i", "j")
      assert(Dedup.connectedComponents(noNodes, "id", noEdges, "i", "j").count() == 0)
      val docs = (0L until 50L).map(i => (i, "x")).toDF("id", "text")
      assert(Curation.hashSample(docs, "id", 0).count() == 0)
      assert(Curation.hashSample(docs, "id", 100).count() == 50)
    }
  }

  describe("connected components + survivors") {
    it("merges transitive near-dup pairs and labels singletons") {
      val nodes = (1L to 7L).toDF("id")
      // two chains (1-2-3, 5-6) and singletons 4, 7; edge direction mixed
      val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("i", "j")
      val comps = Dedup.connectedComponents(nodes, "id", edges, "i", "j")
        .as[(Long, Long)].collect().toMap
      assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
    }

    it("converges on a long chain (diameter > 1 round)") {
      val n = 40L
      val nodes = (1L to n).toDF("id")
      val edges = (1L until n).map(i => (i, i + 1)).toDF("i", "j")
      val comps = Dedup.connectedComponents(nodes, "id", edges, "i", "j")
        .as[(Long, Long)].collect()
      assert(comps.length == n && comps.forall(_._2 == 1L))
    }

    it("keeps the best exemplar per component") {
      val members = Seq( // (id, component, quality)
        (1L, 1L, 10L), (2L, 1L, 30L), (3L, 1L, 30L), (4L, 4L, 1L)
      ).toDF("doc_id", "component", "q")
      val out = Dedup.survivorsByComponent(members, "component",
        Seq(col("q").desc, col("doc_id"))).select("doc_id").as[Long].collect().toSet
      assert(out == Set(2L, 4L)) // q tie broken by lower id
    }
  }
}
