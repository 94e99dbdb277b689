package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data-layout operators: Z-order (Morton) clustering for
  * multi-dimensional data skipping — the technique behind Delta Lake's
  * `OPTIMIZE ZORDER BY` and ClickHouse/Databricks multi-dim layouts.
  *
  * Why it matters at 100 TB: parquet row-group pruning only skips on
  * per-file/per-row-group min-max ranges, and a file layout sorted on
  * ONE key leaves every OTHER key's range unbounded per file. Writing
  * files in Z-value order gives every file a bounded rectangle in
  * (x, y) space, so a conjunctive 2-d predicate prunes on BOTH
  * dimensions from footer stats alone — the scan reads O(result)
  * files, not O(corpus).
  *
  * Everything here is integer bit-twiddling on `Column`s (the classic
  * magic-number bit spread), fully inside whole-stage codegen and
  * exactly reproducible in any engine with shift/and/or — which is how
  * the DuckDB oracle replays it bit-for-bit.
  */
object Layout {

  /** Spread the low 16 bits of `c` so bit i lands at bit 2i (zeros
    * interleaved): the standard mask-and-shift Morton expansion. Input
    * is masked to 16 bits, so any long is safe.
    */
  def spreadBits16(c: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
      .foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (s, mask)) =>
        x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(mask))
      }

  /** 2-d Morton code: x in even bits, y in odd bits (each dimension
    * pre-quantized to ≤16 bits by the caller). Interleaving means a
    * prefix of the Z-value bounds BOTH coordinates — contiguous
    * Z-ranges are rectangles.
    */
  def zorderValue(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** Cluster `df` for writing: range-partition on the Z-value of the
    * two quantized dimensions and sort within partitions, so each
    * output file covers a contiguous Z-range = a bounded rectangle.
    * This is the write-side half; the read side is plain Spark —
    * footer min/max stats on the original columns do the pruning.
    */
  def zorderLayout(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame = {
    require(numFiles >= 1, "numFiles >= 1")
    val z = zorderValue(x, y)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** Audit view of a Z-layout: bucket rows by Z-value prefix (the
    * file-assignment a [[zorderLayout]] write would make with
    * `2^(totalBits - prefixShift)` files) and report each bucket's
    * bounding box in the two quantized dimensions. On a good layout
    * every bucket's box is small on BOTH axes — this is the property
    * the oracle checks exactly, and the property that makes 2-d
    * predicates prune.
    */
  def zorderBucketStats(df: DataFrame, x: Column, y: Column, prefixShift: Int): DataFrame = {
    val z = zorderValue(x, y)
    df.select(shiftright(z, prefixShift).as("bucket"), x.as("xq"), y.as("yq"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("xq").as("min_x"), max("xq").as("max_x"),
        min("yq").as("min_y"), max("yq").as("max_y"))
      .orderBy("bucket")
  }
}
