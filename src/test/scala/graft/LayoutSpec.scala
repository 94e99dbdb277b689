package graft

import org.apache.spark.sql.functions._

import graft.analytics.Layout

/** Z-order layout: Morton-code correctness against a bit-by-bit Scala
  * reference, aligned-bucket rectangle guarantees, and the data-skipping
  * property a z-ordered file layout exists to provide.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Bit-by-bit reference interleave (independent of the magic-number
    * spread in the implementation).
    */
  private def mortonRef(x: Int, y: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1).toLong << (2 * i) | ((y >> i) & 1).toLong << (2 * i + 1)
    }

  describe("zorderValue") {
    it("matches the bit-by-bit reference on random 16-bit pairs") {
      val rnd = new scala.util.Random(7)
      val pairs = Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536))) ++
        Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2))
      val got = pairs.toDF("x", "y")
        .select(col("x"), col("y"),
          Layout.zorderValue(col("x").cast("long"), col("y").cast("long")).as("z"))
        .collect()
      got.foreach { r =>
        assert(r.getLong(2) === mortonRef(r.getInt(0), r.getInt(1)),
          s"morton(${r.getInt(0)}, ${r.getInt(1)})")
      }
    }

    it("masks inputs above 16 bits instead of corrupting neighbor bits") {
      val r = Seq((65536L + 5L, 3L)).toDF("x", "y")
        .select(Layout.zorderValue(col("x"), col("y"))).head()
      assert(r.getLong(0) === mortonRef(5, 3))
    }
  }

  describe("zorderBucketStats") {
    it("aligned z-prefix buckets are exact 2^k x 2^k rectangles") {
      // full 32x32 grid; prefixShift=4 -> each bucket is 16 consecutive
      // z values = an aligned 4x4 square, 64 buckets total
      val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
        .toDF("x", "y")
      val stats = Layout.zorderBucketStats(grid, col("x"), col("y"), prefixShift = 4)
        .collect()
      assert(stats.length === 64)
      stats.foreach { r =>
        assert(r.getAs[Long]("n_rows") === 16L)
        assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") === 3L)
        assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") === 3L)
      }
    }
  }

  describe("zorderLayout") {
    it("bounds BOTH dimensions per partition, so either-axis slab predicates skip") {
      val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
        .toDF("x", "y")
      def boxes(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .collect()

      val zBoxes = boxes(Layout.zorderLayout(grid, col("x"), col("y"), numFiles = 16))
      val xBoxes = boxes(grid.repartitionByRange(16, col("x")))
      assert(zBoxes.length === 16)

      // a y-slab predicate y in [8, 11]: every x-sorted partition holds
      // the full y range (zero skipping); the z layout bounds y too, so
      // most partitions' boxes miss the slab entirely
      def hitsY(rs: Array[org.apache.spark.sql.Row]) =
        rs.count(r => r.getAs[Long]("y0") <= 11L && r.getAs[Long]("y1") >= 8L)
      assert(hitsY(xBoxes) === xBoxes.length, "x-sort cannot skip on y")
      assert(hitsY(zBoxes) <= 8, s"z-layout should skip most partitions, hit ${hitsY(zBoxes)}")

      // and unlike a y-sort, the SAME layout also skips on x slabs
      def hitsX(rs: Array[org.apache.spark.sql.Row]) =
        rs.count(r => r.getAs[Long]("x0") <= 11L && r.getAs[Long]("x1") >= 8L)
      assert(hitsX(zBoxes) <= 8, s"z-layout should skip on x too, hit ${hitsX(zBoxes)}")
    }
  }
}
