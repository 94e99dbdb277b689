package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.analytics.{Curation, Stats, TimeSeries}

/** Mathematical invariants of the deterministic statistics tier over
  * generated data (fixed-seed scalacheck draws, the repo's established
  * pattern) — the properties a formula refactor must not break. Also
  * the driver-contract consistency check: every declared query has an
  * oracle and vice versa (a half-registered query would silently
  * weaken the correctness gate).
  */
class StatsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  describe("driver contract consistency") {
    it("queries and oracleSql declare exactly the same names") {
      assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
      assert(SparkEntry.queries.nonEmpty)
    }
  }

  private val xyGen = for {
    n <- Gen.choose(8, 60)
    xs <- Gen.listOfN(n, Gen.choose(-500.0, 500.0))
    ys <- Gen.listOfN(n, Gen.choose(-500.0, 500.0))
  } yield xs.zip(ys)

  describe("corrRegression invariants") {
    it("correlation is invariant under positive affine maps of x") {
      for (seed <- 1L to 6L) {
        val pts = draw(xyGen, seed)
        val (a, b) = (draw(Gen.choose(0.5, 4.0), seed + 100),
          draw(Gen.choose(-50.0, 50.0), seed + 200))
        val df = pts.toDF("x", "y")
        val c1 = Stats.corrRegression(df, col("x"), col("y"))
          .head().getAs[Double]("corr")
        val c2 = Stats.corrRegression(df, col("x") * a + b, col("y"))
          .head().getAs[Double]("corr")
        // quantization moves each x by <1e-6; correlation moves by
        // O(quantization/spread) — 3dp agreement is the robust check
        assert(math.abs(c1 - c2) < 1e-3, s"seed $seed: corr drifted $c1 vs $c2")
      }
    }
  }

  describe("cusum invariants") {
    it("the changepoint location is invariant to constant value shifts") {
      for (seed <- 1L to 6L) {
        val pts = draw(xyGen, seed)
        val shift = draw(Gen.choose(-100.0, 100.0), seed + 300)
        val rows = pts.zipWithIndex.map { case ((v, _), i) => ("k", i.toLong, i.toLong, v) }
        val df = rows.toDF("key", "ts_us", "id", "v")
        val p1 = TimeSeries.cusumChangepoint(df, "key", "ts_us", "id", "v").head()
        val p2 = TimeSeries.cusumChangepoint(
          df.withColumn("v", col("v") + shift), "key", "ts_us", "id", "v").head()
        // n·P_k − k·S is exactly invariant under v -> v + c (the
        // per-row micro-quantization of c is identical for every row)
        assert(p1.getAs[Long]("peak_ts_us") === p2.getAs[Long]("peak_ts_us"),
          s"seed $seed: peak moved")
      }
    }
  }

  describe("histogram invariants") {
    it("counts partition the input: sum of bins == rows, cum is monotone") {
      for (seed <- 1L to 8L) {
        val vs = draw(Gen.nonEmptyListOf(Gen.choose(-50.0, 400.0)), seed)
        val rows = Stats.histogram(vs.toDF("v"), col("v"), lo = 0.0,
          width = 25.0, nBins = 12).orderBy("bucket").collect()
        assert(rows.map(_.getAs[Long]("n")).sum === vs.size.toLong)
        val cums = rows.map(_.getAs[Long]("cum_n"))
        assert(cums.zip(cums.tail).forall { case (x, y) => x <= y })
        assert(cums.last === vs.size.toLong)
      }
    }
  }

  describe("funnel reference property") {
    val evGen = for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        t <- Gen.choose(0L, 50L)
        k <- Gen.oneOf("a", "b", "c", "x")
      } yield (u, t, k))
    } yield evs.zipWithIndex.map { case ((u, t, k), i) => (u, t, i.toLong, k) }

    it("matches a driver-side subsequence scan on random event streams") {
      for (seed <- 1L to 10L) {
        val evs = draw(evGen, seed)
        val df = evs.toDF("user_id", "ts_us", "event_id", "event_type")
        val gap = 10L
        val got = Curation.sessionFunnel(df, "user_id", "ts_us", "event_id",
          "event_type", gap, Seq("a", "b", "c")).head()
        // driver reference: sessionize by gap, then the first-match
        // strictly-after subsequence scan per session
        val sessions = evs.groupBy(_._1).values.flatMap { es =>
          val sorted = es.sortBy(e => (e._2, e._3))
          val buf = scala.collection.mutable.ArrayBuffer(
            scala.collection.mutable.ArrayBuffer(sorted.head))
          sorted.sliding(2).foreach {
            case Seq(p, c) =>
              if (c._2 - p._2 > gap) buf += scala.collection.mutable.ArrayBuffer(c)
              else buf.last += c
            case _ =>
          }
          buf.map(_.toSeq)
        }.toSeq
        def reach(s: Seq[(Long, Long, Long, String)]): Int = {
          var bound = Long.MinValue
          var stage = 0
          for (step <- Seq("a", "b", "c")) {
            val hit = s.filter(e => e._4 == step && (stage == 0 || e._2 > bound))
              .map(_._2).sorted.headOption
            hit match {
              case Some(t) => bound = t; stage += 1
              case None => return stage
            }
          }
          stage
        }
        val stages = sessions.map(reach)
        assert(got.getAs[Long]("n_sessions") === sessions.size.toLong, s"seed $seed")
        assert(got.getAs[Long]("reached_1") === stages.count(_ >= 1).toLong, s"seed $seed")
        assert(got.getAs[Long]("reached_2") === stages.count(_ >= 2).toLong, s"seed $seed")
        assert(got.getAs[Long]("reached_3") === stages.count(_ >= 3).toLong, s"seed $seed")
      }
    }
  }
}
