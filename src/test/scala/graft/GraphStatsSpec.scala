package graft

import org.apache.spark.sql.functions._

import graft.analytics.{Graph, Stats, TextAnalysis}

/** Integer PageRank, deterministic two-variable stats, and TF-IDF
  * retrieval: hand-computable fixtures plus the partitioning-invariance
  * property every "deterministic" claim rests on.
  */
class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference PageRank in the exact integer semantics. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2).map(e => (e._1 min e._2, e._1 max e._2)).distinct
    val dir = und ++ und.map(_.swap)
    val deg = dir.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr = deg.map { case (k, _) => k -> 1000000L }
    for (_ <- 1 to iters) {
      val inflow = dir.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / deg(u) }.sum
      }
      pr = deg.map { case (k, _) => k -> (150000L + 85L * inflow.getOrElse(k, 0L) / 100L) }
    }
    pr
  }

  describe("pageRankMicro") {
    it("matches the integer reference on a hub-and-chain graph") {
      val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (5L, 6L), (6L, 7L))
      val got = Graph.pageRankMicro(edges.toDF("i", "j"), "i", "j", iterations = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === refPageRank(edges, 3))
      // the hub outranks every leaf
      assert(got(1L) > got(2L) && got(1L) > got(7L))
    }

    it("is invariant to edge orientation, duplication, and partitioning") {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      val a = Graph.pageRankMicro(edges.toDF("i", "j").repartition(7), "i", "j", 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val flipped = (edges.map(_.swap) ++ edges).toDF("i", "j").repartition(2)
      val b = Graph.pageRankMicro(flipped, "i", "j", 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(a === b)
    }

    it("gives uniform rank on a regular graph (triangle)") {
      val got = Graph.pageRankMicro(
        Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("i", "j"), "i", "j", 3)
        .collect().map(_.getLong(1)).toSet
      assert(got === Set(1000000L))
    }
  }

  describe("corrRegression") {
    it("recovers a perfect positive line") {
      val df = (1 to 100).map(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
      val r = Stats.corrRegression(df, col("x"), col("y")).head()
      assert(r.getAs[Long]("n") === 100L)
      assert(r.getAs[Double]("corr") === 1.0)
      assert(r.getAs[Double]("slope") === 3.0)
      assert(r.getAs[Double]("intercept") === 7.0)
    }

    it("recovers a perfect negative line and is partitioning-invariant") {
      val pts = (1 to 500).map(i => (i.toDouble, -0.5 * i + 100.0))
      val a = Stats.corrRegression(pts.toDF("x", "y").repartition(1),
        col("x"), col("y")).head()
      val b = Stats.corrRegression(
        scala.util.Random.shuffle(pts).toDF("x", "y").repartition(13),
        col("x"), col("y")).head()
      assert(a === b)
      assert(a.getAs[Double]("corr") === -1.0)
    }

    it("drops incomplete observation pairs from n and the moments") {
      val df = Seq[(java.lang.Double, java.lang.Double)](
        (1.0, 2.0), (2.0, null), (null, 3.0), (3.0, 6.0), (5.0, 10.0))
        .toDF("x", "y")
      val r = Stats.corrRegression(df, col("x"), col("y")).head()
      assert(r.getAs[Long]("n") === 3L)
      assert(r.getAs[Double]("corr") === 1.0) // (1,2),(3,6),(5,10) are collinear
    }
  }

  describe("spearman") {
    it("is 1 on a monotone relation and -1 on a reversed one, regardless of scale") {
      val df = (1 to 200).map(i => (i.toDouble, math.exp(i / 50.0), -i * 3.0, i.toLong))
        .toDF("x", "up", "down", "id")
      val a = Stats.spearman(df, col("x"), col("up"), col("id")).head()
      assert(a.getAs[Long]("sum_d2") === 0L && a.getAs[Double]("rho") === 1.0)
      val b = Stats.spearman(df, col("x"), col("down"), col("id")).head()
      assert(b.getAs[Double]("rho") === -1.0)
    }

    it("matches a driver-side reference on tied data") {
      val rows = Seq((1.0, 5.0, 1L), (1.0, 3.0, 2L), (2.0, 5.0, 3L), (0.5, 4.0, 4L))
      val got = Stats.spearman(rows.toDF("x", "y", "id"),
        col("x"), col("y"), col("id")).head()
      // tie-broken ranks by (value, id): x -> [2,3,4,1], y -> [3,1,4,2]
      val d2 = Seq((2 - 3), (3 - 1), (4 - 4), (1 - 2)).map(d => d * d).sum
      assert(got.getAs[Long]("sum_d2") === d2.toLong)
    }
  }

  describe("aucByScore") {
    it("is 1.0 for a perfect ranker, 0.5 for score-blind labels with full ties") {
      val perfect = (1 to 100).map(i => (i.toLong, i > 50)).toDF("s", "label")
      val p = Stats.aucByScore(perfect, col("s"), col("label")).head()
      assert(p.getAs[Double]("auc") === 1.0)
      val allTied = (1 to 100).map(i => (7L, i % 2 == 0)).toDF("s", "label")
      val t = Stats.aucByScore(allTied, col("s"), col("label")).head()
      assert(t.getAs[Double]("auc") === 0.5)
    }

    it("matches the pairwise definition on a small mixed case") {
      val rows = Seq((3L, true), (2L, false), (3L, false), (1L, false), (5L, true))
        .toDF("s", "label")
      val r = Stats.aucByScore(rows, col("s"), col("label")).head()
      // pairs (pos, neg): (3;2)win (3;3)tie (3;1)win, (5;2)(5;3)(5;1) wins
      // U = 5 + 0.5 -> AUC = 5.5 / 6
      assert(r.getAs[Long]("u2") === 11L)
      assert(r.getAs[Double]("auc") === 11.0 / 12.0)
    }
  }

  describe("derivative and time-weighted average") {
    import graft.analytics.TimeSeries

    it("derivative computes per-second rates, null on first rows and zero gaps") {
      val e = Seq( // (key, ts_us, id, v)
        ("a", 0L, 1L, 10.0), ("a", 2000000L, 2L, 14.0), ("a", 2000000L, 3L, 99.0),
        ("b", 0L, 4L, 1.0)
      ).toDF("k", "ts_us", "id", "v")
      val got = TimeSeries.derivative(e, "k", "ts_us", "id", "v")
        .orderBy("id").select("rate_per_s").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      assert(got.toSeq === Seq(None, Some(2.0), None, None))
    }

    it("linear gap-fill interpolates between surrounding observations") {
      import graft.analytics.TimeSeries
      val e = Seq(
        ("a", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0L)), 1.0),
        ("a", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(30L)), 7.0))
        .toDF("k", "time", "v")
      val got = TimeSeries.gapFillLinear(e, "k", "time", "v", stepSeconds = 10L)
        .orderBy("bucket_us").select("filled").collect().map(_.getDouble(0))
      assert(got.toSeq === Seq(1.0, 3.0, 5.0, 7.0))
    }

    it("time-weighted average holds each value until the next point in-window") {
      // window 10s: v=2 for 6s then v=10 for 3s (last point weightless)
      val e = Seq(
        ("a", 0L, 1L, 2.0), ("a", 6000000L, 2L, 10.0), ("a", 9000000L, 3L, 7.0),
        ("a", 10000000L, 4L, 5.0) // alone in the next window -> null twa
      ).toDF("k", "ts_us", "id", "v")
      val got = TimeSeries.timeWeightedAvg(e, "k", "ts_us", "id", "v",
        windowUs = 10000000L)
        .orderBy("window_start_us").collect()
      val twa0 = got(0).getAs[Double]("twa")
      assert(twa0 === BigDecimal((2.0 * 6 + 10.0 * 3) / 9.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(got(1).isNullAt(got(1).fieldIndex("twa")))
    }
  }

  describe("rollingMedian") {
    it("matches a driver-side sliding median, odd and even frames") {
      import graft.analytics.TimeSeries
      val vals = Seq(5.0, 1.0, 4.0, 2.0, 3.0, 9.0, 0.0)
      val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
        .toDF("key", "ord", "v")
      val got = TimeSeries.rollingMedian(df, "key", Seq(col("ord")), "v", nRows = 4)
        .orderBy("ord").select("rolling_median").collect().map(_.getDouble(0))
      val expect = vals.indices.map { i =>
        val frame = vals.slice(math.max(0, i - 3), i + 1).sorted
        val n = frame.size
        if (n % 2 == 1) frame(n / 2) else (frame(n / 2 - 1) + frame(n / 2)) / 2.0
      }
      assert(got.toSeq === expect)
    }
  }

  describe("profile") {
    it("reports nulls, exact distincts, and numeric ranges per column") {
      val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, null), (2L, "b"), (null, "a"))
        .toDF("num", "str")
      val rows = Stats.profile(df).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)))).toMap
      assert(rows("num") === ((4L, 1L, 2L, Some(1.0), Some(2.0))))
      assert(rows("str") === ((4L, 1L, 2L, None, None)))
    }
  }

  describe("jlProjectQuantized") {
    it("matches a driver-side reference projection, exactly") {
      import graft.analytics.Similarity
      val vecs = Seq((1L, Array(0.5f, -1.25f, 2.0f)), (2L, Array(0.0f, 3.5f, -0.75f)))
      val got = Similarity.jlProjectQuantized(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", outDim = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      val md = java.security.MessageDigest.getInstance("MD5")
      def sign(o: Int, i: Int): Long = {
        val hex = md.digest(s"jl:$o:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        (java.lang.Long.parseLong(hex, 16) % 2L) * 2L - 1L
      }
      val ref = (for ((id, v) <- vecs; o <- 0 until 4) yield {
        (id, o) -> v.zipWithIndex.map { case (x, i) =>
          math.floor(x.toDouble * 1e6).toLong * sign(o, i)
        }.sum
      }).toMap
      assert(got === ref)
    }

    it("preserves cosine structure approximately at moderate outDim") {
      import graft.analytics.Similarity
      // two near-parallel vectors and one orthogonal-ish third: after
      // projection the parallel pair must stay the closest pair
      val d = 64
      val base = Array.tabulate(d)(i => math.sin(i * 0.7).toFloat)
      val near = base.map(x => x * 1.02f)
      val far = Array.tabulate(d)(i => math.cos(i * 1.3).toFloat)
      val df = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
      val proj = Similarity.jlProjectQuantized(df, "vec_id", "embedding", outDim = 16)
        .collect().groupBy(_.getLong(0))
        .map { case (id, rows) => id -> rows.sortBy(_.getInt(1)).map(_.getLong(2).toDouble) }
      def cos(a: Seq[Double], b: Seq[Double]) = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
      }
      assert(cos(proj(1L).toSeq, proj(2L).toSeq) > cos(proj(1L).toSeq, proj(3L).toSeq))
    }
  }

  describe("editDistanceConfirm") {
    it("computes true distances and the integer ratio verdict") {
      import graft.analytics.Dedup
      val docs = Seq(
        (1L, "the quick brown fox"), (2L, "the quick brown fax"),
        (3L, "something else entirely here")).toDF("doc_id", "text")
      val pairs = Seq((1L, 2L), (1L, 3L)).toDF("i", "j")
      val got = Dedup.editDistanceConfirm(pairs, docs, "doc_id", "text", maxRatioPct = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getBoolean(4))).toMap
      assert(got((1L, 2L)) === ((1L, true))) // one substitution over 19 chars
      val (d13, ok13) = got((1L, 3L))
      assert(d13 > 5L && !ok13)
    }
  }

  describe("tfidfTopK") {
    it("ranks the doc sharing rare terms above one sharing common terms") {
      // 'zeta' appears in q and d1 only (rare, high idf); 'alpha'
      // everywhere (idf 0 at ln(4/4)) — d1 must win despite d2's
      // higher raw overlap on common terms
      val corpus = Seq(
        (1L, "zeta alpha"),
        (2L, "alpha alpha alpha alpha"),
        (3L, "alpha beta")).toDF("doc_id", "text")
      val q = Seq((10L, "zeta alpha")).toDF("doc_id", "text")
      // idf over corpus+... df from CORPUS postings only: alpha df=3 of
      // n=3 -> idf 0; zeta df=1 -> ln(3) high; beta df=1
      val got = TextAnalysis.tfidfTopK(corpus, "doc_id", "text", q, "doc_id", "text", k = 2)
        .orderBy("rank").collect()
      assert(got.head.getAs[Long]("id") === 1L)
      assert(got.head.getAs[Int]("rank") === 1)
    }

    it("applies the document-frequency guard to both sides") {
      val corpus = Seq(
        (1L, "common rare"), (2L, "common"), (3L, "common"), (4L, "common"),
        (5L, "other")).toDF("doc_id", "text")
      val q = Seq((9L, "common rare")).toDF("doc_id", "text")
      val got = TextAnalysis.tfidfTopK(corpus, "doc_id", "text", q, "doc_id", "text",
        k = 5, maxDocFreq = Some(2))
        .collect()
      // 'common' (df=4) is guarded out -> only doc 1 matches via 'rare'
      assert(got.map(_.getAs[Long]("id")).toSet === Set(1L))
    }
  }
}
