package graft

import org.apache.spark.sql.functions._

import graft.analytics.Sketch

/** KMV cardinality sketch: exactness below saturation, set-function
  * determinism (order/partitioning invariance), lossless merge, and
  * estimator accuracy at saturation.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  describe("kmv distinct sketch") {
    it("is exact below saturation (sketch holds every distinct value)") {
      val df = (1L to 100L).map(i => i % 10).toDF("v") // 10 distinct, many dups
      val r = Sketch.kmvDistinct(df, col("v"), k = 256).head()
      assert(r.getAs[Long]("k_used") === 10L)
      assert(r.getAs[Double]("est_distinct") === 10.0)
    }

    it("is a set function: row order and partitioning cannot move the estimate") {
      val vals = (1L to 5000L).map(i => i * 7919L % 4999L)
      val a = Sketch.kmvSketch(vals.toDF("v").repartition(1), col("v"), k = 64)
        .head().getAs[org.apache.spark.sql.Row]("sketch").getSeq[Long](0)
      val b = Sketch.kmvSketch(scala.util.Random.shuffle(vals).toDF("v").repartition(13),
        col("v"), k = 64)
        .head().getAs[org.apache.spark.sql.Row]("sketch").getSeq[Long](0)
      assert(a === b)
    }

    it("merges losslessly: union sketch == merge of part sketches") {
      val left = (1L to 3000L).toDF("v")
      val right = (2000L to 5000L).toDF("v") // overlapping ranges
      val whole = Sketch.kmvSketch(left.union(right), col("v"), k = 128)
        .head().getAs[org.apache.spark.sql.Row]("sketch").getSeq[Long](0)
      val merged = Sketch.mergeSketches(
        Sketch.kmvSketch(left, col("v"), k = 128)
          .union(Sketch.kmvSketch(right, col("v"), k = 128)), k = 128)
        .head().getAs[org.apache.spark.sql.Row]("sketch").getSeq[Long](0)
      assert(whole === merged)
    }

    it("set ops are exact below saturation; saturated intersection tracks true jaccard") {
      // A = {1..20}, B = {11..30}: |A∪B| = 30, |A∩B| = 10 — unsaturated
      // at k=64, so everything is exact
      val a = (1L to 20L).toDF("v")
      val b = (11L to 30L).toDF("v")
      val r = Sketch.kmvSetOps(a, col("v"), b, col("v"), k = 64).head()
      assert(r.getAs[Long]("k_union") === 30L)
      assert(r.getAs[Long]("n_common") === 10L)
      assert(r.getAs[Double]("est_union") === 30.0)
      assert(r.getAs[Double]("est_intersection") === 10.0)
      assert(math.abs(r.getAs[Double]("jaccard") - 10.0 / 30.0) < 1e-12)
      // saturated: 5000 ∪ 5000 with 50% overlap at k=256 — estimates
      // must land within loose KMV bounds of the truth
      val bigA = (1L to 5000L).toDF("v")
      val bigB = (2501L to 7500L).toDF("v") // union 7500, intersection 2500
      val s = Sketch.kmvSetOps(bigA, col("v"), bigB, col("v"), k = 256).head()
      assert(math.abs(s.getAs[Double]("est_union") - 7500.0) / 7500.0 < 0.25,
        s.toString)
      assert(math.abs(s.getAs[Double]("est_intersection") - 2500.0) / 2500.0 < 0.4,
        s.toString)
      // empty sides: zero union, zero intersection, zero jaccard — no NaN
      val empty = Seq.empty[Long].toDF("v")
      val z = Sketch.kmvSetOps(empty, col("v"), empty, col("v"), k = 16).head()
      assert(z.getAs[Long]("k_union") === 0L)
      assert(z.getAs[Double]("est_union") === 0.0)
      assert(z.getAs[Double]("est_intersection") === 0.0)
      assert(z.getAs[Double]("jaccard") === 0.0)
    }

    it("priority sampling: exact below k, unbiased-ish above, deterministic under shuffling") {
      // n <= k: tau = 0, estimate == exact total (in micro-units)
      val small = (1L to 20L).map(i => (i, i * 10.0)).toDF("id", "w")
      val r = Sketch.prioritySampleSum(small, "id", col("w"), k = 64).head()
      assert(r.getAs[Long]("k_sample") === 20L)
      assert(r.getAs[Long]("tau_micro") === 0L)
      assert(r.getAs[Long]("est_total_micro") === (1L to 20L).map(_ * 10L * 1000000L).sum)
      // n >> k: estimate lands within a loose band of the truth and is
      // invariant to row order / partitioning (set function)
      val vals = (1L to 3000L).map(i => (i, (i % 97 + 1).toDouble))
      val truth = vals.map(_._2).sum
      val a = Sketch.prioritySampleSum(vals.toDF("id", "w").repartition(1),
        "id", col("w"), k = 128).head().getAs[Long]("est_total_micro")
      val b = Sketch.prioritySampleSum(
        scala.util.Random.shuffle(vals).toDF("id", "w").repartition(13),
        "id", col("w"), k = 128).head().getAs[Long]("est_total_micro")
      assert(a === b)
      assert(math.abs(a / 1e6 - truth) / truth < 0.35, s"est=${a / 1e6} truth=$truth")
    }

    it("priority sampling clamps out-of-contract weights at MaxMicroRepresentable") {
      // a weight above 9e12 would overflow ⌊w·10^6⌋ as a long; the
      // clamp pins it at exactly 9e18 micro-units on both engines
      val r = Sketch.prioritySampleSum(
        Seq((1L, 5.0e13)).toDF("id", "w"), "id", col("w"), k = 64).head()
      assert(r.getAs[Long]("k_sample") === 1L)
      assert(r.getAs[Long]("tau_micro") === 0L)
      assert(r.getAs[Long]("est_total_micro") === 9000000000000000000L)
    }

    it("grouped priority sampling matches the global sketch per group; under-k groups exact") {
      val vals = (1L to 900L).map(i => (s"g${i % 3}", i, (i % 50 + 1).toDouble)) ++
        (9000L to 9004L).map(i => ("tiny", i, 7.0)) // 5-row group: exact
      val df = vals.toDF("g", "id", "w").repartition(11)
      val grouped = Sketch.prioritySampleSumByGroup(df, "g", "id", col("w"), k = 64)
        .collect().map(r => r.getAs[String]("group") ->
          (r.getAs[Long]("k_sample"), r.getAs[Long]("tau_micro"), r.getAs[Long]("est_total_micro")))
        .toMap
      // each group independently equals the ungrouped sketch run on it
      for (g <- Seq("g0", "g1", "g2", "tiny")) {
        val solo = Sketch.prioritySampleSum(df.filter(col("g") === g), "id", col("w"), k = 64)
          .head()
        assert(grouped(g) === ((solo.getAs[Long]("k_sample"),
          solo.getAs[Long]("tau_micro"), solo.getAs[Long]("est_total_micro"))), g)
      }
      // the under-k group is exact
      assert(grouped("tiny") === ((5L, 0L, 5L * 7L * 1000000L)))
    }

    it("set ops match a driver-side reference implementation on saturated inputs") {
      // reference: the exact same md5-derived hashing and bottom-k set
      // logic, computed independently in plain Scala
      def h32(v: Long): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"kmv:$v".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        java.lang.Long.parseLong(hex, 16)
      }
      val k = 64
      val aVals = (1L to 800L).map(_ * 3L)
      val bVals = (1L to 800L).map(_ * 2L) // overlap at multiples of 6
      val aH = aVals.map(h32).distinct.sorted.take(k)
      val bH = bVals.map(h32).distinct.sorted.take(k)
      val u = (aH ++ bH).distinct.sorted.take(k)
      val common = u.count(h => aH.contains(h) && bH.contains(h))
      val estU = if (u.size < k) u.size.toDouble else (k - 1).toDouble * 4294967296.0 / u.last
      val r = Sketch.kmvSetOps(aVals.toDF("v"), col("v"), bVals.toDF("v"), col("v"), k).head()
      assert(r.getAs[Long]("k_union") === u.size.toLong)
      assert(r.getAs[Long]("kth_hash") === u.last)
      assert(r.getAs[Long]("n_common") === common.toLong)
      assert(r.getAs[Double]("est_union") === estU)
      assert(r.getAs[Double]("jaccard") === common.toDouble / u.size)
    }

    it("TopKByPriority state estimates identically to the batch sketch, dedupes redelivery") {
      import graft.analytics.{PriVal, TopKByPriority}
      val k = 32
      val vals = (1L to 500L).map(i => (i, (i % 23 + 1).toDouble))
      val df = vals.toDF("id", "w").repartition(9)
      val withPri = df.select(
        (col("w") / ((Sketch.hash32(col("id"), "ps") + 1L) / lit(4294967296.0))).as("pri"),
        col("id"), col("w").as("wt"))
      val agg = udaf(new TopKByPriority(k + 1),
        org.apache.spark.sql.Encoders.product[PriVal])
      // redeliver every row twice: the id-dedupe must make it a no-op
      val redelivered = withPri.union(withPri)
      val viaState = Sketch.priorityEstimateFromItems(
        redelivered.agg(agg(col("pri"), col("id"), col("wt")).as("sk"))
          .select(col("sk.items").as("items")), "items", k).head()
      val viaBatch = Sketch.prioritySampleSum(df, "id", col("w"), k).head()
      assert(viaState.getAs[Long]("k_sample") === viaBatch.getAs[Long]("k_sample"))
      assert(viaState.getAs[Long]("tau_micro") === viaBatch.getAs[Long]("tau_micro"))
      assert(viaState.getAs[Long]("est_total_micro") === viaBatch.getAs[Long]("est_total_micro"))
    }

    it("countmin never underestimates, and collides into overestimates when squeezed") {
      // 200 distinct tokens into a deliberately tiny 2x8 sketch: every
      // cell is shared, so estimates must EXCEED exact counts — the
      // upper-bound property under maximal pressure
      val toks = (1 to 1000).map(i => s"t${i % 200}").toDF("tok")
      val sketch = Sketch.countMinSketch(toks, col("tok"), depth = 2, width = 8)
      val probes = Seq("t0", "t1", "t5", "t199")
      val est = Sketch.countMinEstimate(sketch, probes, depth = 2, width = 8)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = toks.groupBy("tok").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      probes.foreach { t =>
        assert(est(t) >= exact(t), s"$t underestimated")
      }
      assert(probes.exists(t => est(t) > exact(t)), "a 2x8 sketch of 200 keys must collide")
      // at a sane size the same estimates are exact for these counts
      val wide = Sketch.countMinSketch(toks, col("tok"), depth = 4, width = 4096)
      val est2 = Sketch.countMinEstimate(wide, probes, depth = 4, width = 4096)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      probes.foreach(t => assert(est2(t) === exact(t)))
    }

    it("countmin merges cell-wise: merged sketch == sketch of the union") {
      val a = (1 to 300).map(i => s"x${i % 40}").toDF("tok")
      val b = (1 to 500).map(i => s"x${i % 70}").toDF("tok")
      def cells(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val whole = cells(Sketch.countMinSketch(a.union(b), col("tok"), 3, 64))
      val merged = cells(Sketch.mergeCountMin(
        Sketch.countMinSketch(a, col("tok"), 3, 64)
          .union(Sketch.countMinSketch(b, col("tok"), 3, 64))))
      assert(whole === merged)
    }

    it("ams f2 estimates self-join size unbiasedly on a spread multiset") {
      // 500 keys with counts 1..4 (no heavy hitters, so the 2/depth
      // variance bound is meaningful): exact F2 = sum c^2; md5 makes
      // the single realized estimate deterministic, so the band holds
      // run to run
      val toks = (1 to 500).flatMap(i => Seq.fill(i % 4 + 1)(s"k$i")).toDF("tok")
      val exact = (1 to 500).map(i => math.pow(i % 4 + 1, 2)).sum
      val est = Sketch.amsF2(toks, col("tok"), depth = 48)
        .head().getAs[Double]("est_f2")
      assert(math.abs(est / exact - 1.0) < 0.4, s"est=$est exact=$exact")
      // integer row sums are order-free: partitioning cannot move it
      val est2 = Sketch.amsF2(toks.repartition(11), col("tok"), depth = 48)
        .head().getAs[Double]("est_f2")
      assert(est2 === est)
    }

    it("estimates saturated cardinality within KMV error bounds") {
      // 5000 distinct values, k=256: stderr ~ 1/sqrt(k-1) ~ 6.3%; the
      // md5 hashing makes the single realized estimate deterministic,
      // so a generous 4-sigma band is a stable assertion, not a flake
      val df = (1L to 5000L).toDF("v")
      val r = Sketch.kmvDistinct(df, col("v"), k = 256).head()
      assert(r.getAs[Long]("k_used") === 256L)
      val est = r.getAs[Double]("est_distinct")
      assert(est > 5000.0 * 0.75 && est < 5000.0 * 1.25, s"est=$est")
    }
  }

  describe("countmin bulk estimates") {
    it("the DF probe form agrees with the Seq form and never undercounts") {
      val toks = (1 to 400).flatMap(i => Seq.fill(i % 5 + 1)(s"w${i % 40}")).toDF("tok")
      val sketch = Sketch.countMinSketch(toks, col("tok"), depth = 4, width = 32)
      val terms = (0 until 40).map(i => s"w$i")
      val seqForm = Sketch.countMinEstimate(sketch, terms, depth = 4, width = 32)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val dfForm = Sketch.countMinEstimateDF(sketch, terms.toDF("term"), depth = 4, width = 32)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(seqForm === dfForm)
      val exact = toks.groupBy("tok").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (t, c) => assert(dfForm(t) >= c, s"undercount for $t") }
    }
  }

  describe("bottom-k quantile sketch") {
    it("is deterministic under shuffling and lands near the true quantiles") {
      val rows = (1L to 20000L).map(i => (i, (i * 7919L % 9973L).toDouble))
      val a = Sketch.bottomKQuantiles(rows.toDF("id", "v").repartition(1),
        "id", col("v"), k = 1024).head()
      val b = Sketch.bottomKQuantiles(
        scala.util.Random.shuffle(rows).toDF("id", "v").repartition(17),
        "id", col("v"), k = 1024).head()
      assert(a === b)
      assert(a.getAs[Long]("n_sample") === 1024L)
      // v is ~uniform on [0, 9973): p50 ≈ 4986, p90 ≈ 8975; the
      // md5-fixed sample makes the realized error deterministic, so a
      // generous band (~4 sigma at k=1024) is a stable assertion
      assert(math.abs(a.getAs[Double]("est_p500") - 4986.0) < 800.0)
      assert(math.abs(a.getAs[Double]("est_p900") - 8975.0) < 500.0)
    }
  }

  describe("grouped bottom-k quantile sketch") {
    it("matches the ungrouped sketch on a single group and is partition-invariant") {
      val rows = (1L to 8000L).map(i => ("only", i, (i % 997L).toDouble))
      val grouped = Sketch.bottomKQuantilesByGroup(
        rows.toDF("g", "id", "v").repartition(13), "g", "id", col("v"), k = 512).head()
      val flat = Sketch.bottomKQuantiles(
        rows.map(r => (r._2, r._3)).toDF("id", "v"), "id", col("v"), k = 512).head()
      assert(grouped.getAs[Long]("n_sample") === flat.getAs[Long]("n_sample"))
      assert(grouped.getAs[Double]("est_p500") === flat.getAs[Double]("est_p500"))
      assert(grouped.getAs[Double]("est_p990") === flat.getAs[Double]("est_p990"))
    }

    it("samples exactly k per group and under-k groups are exact") {
      val rows = (1L to 1000L).map(i => (s"g${i % 2}", i, i.toDouble)) ++
        Seq(("tiny", 5000L, 42.0), ("tiny", 5001L, 44.0))
      val got = Sketch.bottomKQuantilesByGroup(
        rows.toDF("g", "id", "v"), "g", "id", col("v"), k = 64)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Double]("est_p500"))).toMap
      assert(got("g0")._1 === 64L && got("g1")._1 === 64L)
      assert(got("tiny") === ((2L, 43.0))) // below k: the sample IS the data
    }
  }

  describe("hll merge and grouping") {
    it("merged per-slice registers estimate exactly what the whole estimates") {
      val left = (1L to 3000L).toDF("v")
      val right = (2000L to 5000L).toDF("v")
      val whole = Sketch.hllDistinct(left.union(right), col("v")).head()
      val merged = Sketch.hllEstimate(Sketch.mergeHllRegisters(
        Sketch.hllRegisters(left, col("v"))
          .union(Sketch.hllRegisters(right, col("v"))))).head()
      assert(whole === merged)
    }

    it("the grouped form matches the global sketch per group") {
      val rows = (1L to 4000L).map(i => (s"g${i % 3}", i))
      val grouped = Sketch.hllDistinctByGroup(rows.toDF("g", "v").repartition(7),
        "g", col("v")).collect()
        .map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
      for (g <- Seq("g0", "g1", "g2")) {
        val solo = Sketch.hllDistinct(
          rows.filter(_._1 == g).map(_._2).toDF("v"), col("v"))
          .head().getAs[Double]("est_distinct")
        assert(grouped(g) === solo, s"group $g")
      }
    }
  }

  describe("hyperloglog") {
    it("estimates large cardinality within HLL error bounds") {
      // p=8 -> m=256 registers, relative error ~1.04/sqrt(256) = 6.5%;
      // md5 hashing makes the one realized estimate deterministic, so
      // a 4-sigma band is stable
      val df = (1L to 20000L).toDF("v")
      val est = Sketch.hllDistinct(df, col("v"), p = 8)
        .head().getAs[Double]("est_distinct")
      assert(est > 20000.0 * 0.74 && est < 20000.0 * 1.26, s"est=$est")
    }

    it("takes the small-range correction branch at low cardinality") {
      val df = (1L to 30L).flatMap(i => Seq.fill(10)(i)).toDF("v") // 30 distinct
      val r = Sketch.hllDistinct(df, col("v"), p = 8).head()
      val zeros = r.getAs[Long]("n_zero_regs")
      assert(zeros > 200L) // most registers untouched
      // linear-counting estimate: m * ln(m / V), rounded 4dp
      val expect = BigDecimal(256.0 * math.log(256.0 / zeros))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("est_distinct") === expect)
    }

    it("is a set function: duplicates, order, and partitioning cannot move it") {
      val vals = (1L to 3000L).map(i => i * 104729L % 997L)
      val a = Sketch.hllDistinct(vals.toDF("v").repartition(1), col("v")).head()
      val b = Sketch.hllDistinct(
        scala.util.Random.shuffle(vals ++ vals).toDF("v").repartition(17),
        col("v")).head()
      assert(a === b)
    }

    it("registers agree with a driver-side reference implementation") {
      val vals = (1L to 400L).toSeq
      val got = Sketch.hllRegisters(vals.toDF("v"), col("v"), p = 8)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val md = java.security.MessageDigest.getInstance("MD5")
      val ref = vals.map { v =>
        val hex = md.digest(s"hll:$v".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        val h = java.lang.Long.parseLong(hex, 16)
        val b = h >>> 24
        val rem = h & 0xffffffL
        val bitLen = if (rem == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(rem)
        (b, 25 - bitLen)
      }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
      assert(got === ref)
    }
  }
}
