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
}
