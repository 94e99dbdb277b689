package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV buffer: at most k smallest DISTINCT hash values seen, unordered
  * until `finish`.
  */
final case class KmvBuf(items: Seq[Long])

/** Bounded min-k-distinct as a real AGGREGATE — the KMV (k minimum
  * values) cardinality sketch's core op. Map-side partials keep ≤ k
  * distinct hashes per input partition, so the shuffle carries
  * k·partitions longs for ANY input size — cardinality estimation in
  * one pass with no corpus-wide DISTINCT shuffle. The buffer is a
  * SET-function of the input (k smallest distinct values), so the
  * result is independent of row order and partitioning — exactly
  * reproducible anywhere, unlike HLL sketches whose estimates are
  * implementation-defined.
  *
  * Buffer ops are O(k) per row (k is small: 256–4096); the `contains`
  * probe short-circuits duplicates, which dominate once the sketch
  * saturates on heavy-hitter-skewed inputs.
  */
final class MinKDistinct(k: Int) extends Aggregator[Long, KmvBuf, KmvBuf]
    with Serializable {
  require(k >= 1, "kmv needs k >= 1")

  override def zero: KmvBuf = KmvBuf(Nil)

  override def reduce(buf: KmvBuf, x: Long): KmvBuf =
    if (buf.items.contains(x)) buf
    else if (buf.items.size < k) KmvBuf(x +: buf.items)
    else {
      val mx = buf.items.max
      if (x < mx) KmvBuf(x +: buf.items.filterNot(_ == mx)) else buf
    }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    KmvBuf((a.items ++ b.items).distinct.sorted.take(k))

  override def finish(buf: KmvBuf): KmvBuf = KmvBuf(buf.items.sorted)

  override def bufferEncoder: org.apache.spark.sql.Encoder[KmvBuf] =
    Encoders.product[KmvBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[KmvBuf] =
    Encoders.product[KmvBuf]
}

/** Distributed cardinality sketching. The classic use at corpus scale:
  * "how many distinct (user, day) pairs / URLs / shingles are there"
  * without paying a corpus-wide distinct — the KMV estimate reads off
  * k smallest hashes, and sketches of disjoint scans merge losslessly
  * (the union's k smallest distinct hashes are computable from the
  * parts' sketches), so per-partition/per-day sketches roll up.
  *
  * Hashing is md5-derived 32-bit like the rest of the library, so the
  * whole sketch — k minimums included — is exactly reproducible by any
  * md5-capable engine, estimate and all: the DuckDB oracle replays it
  * bit-for-bit. (Estimator: with R_k = kth smallest hash / 2^32 the
  * uniform order-statistic estimate is (k−1)/R_k; below saturation the
  * sketch holds every distinct value, so the count is exact.)
  */
object Sketch {

  /** 32-bit md5-derived hash of `value` as a long in [0, 2^32). */
  def hash32(value: Column, salt: String = "kmv"): Column =
    conv(substring(md5(concat(lit(s"$salt:"), value.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** One-row distinct-count estimate of `value` over `df`:
    * (k_used, kth_hash, est_distinct). One pass, k·partitions longs on
    * the shuffle, never a DISTINCT over the input.
    */
  def kmvDistinct(df: DataFrame, value: Column, k: Int, salt: String = "kmv"): DataFrame = {
    val sk = kmvSketch(df, value, k, salt)
    sk.select(
        size(col("sketch.items")).cast("long").as("k_used"),
        element_at(col("sketch.items"), -1).as("kth_hash"))
      .select(col("k_used"), col("kth_hash"),
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
            col("kth_hash").cast("double"))
          .as("est_distinct"))
  }

  /** The raw sketch (one row, `sketch.items` = sorted k smallest
    * distinct hashes) — keep per-slice sketches and union them later
    * via [[mergeSketches]].
    */
  def kmvSketch(df: DataFrame, value: Column, k: Int, salt: String = "kmv"): DataFrame = {
    val agg = udaf(new MinKDistinct(k))
    df.select(hash32(value, salt).as("h")).agg(agg(col("h")).as("sketch"))
  }

  /** Lossless union of per-slice sketches built with the same k/salt:
    * distinct-merge the item arrays and keep the k smallest — the
    * exact sketch of the concatenated inputs.
    */
  def mergeSketches(sketches: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new MinKDistinct(k))
    sketches.select(explode(col("sketch.items")).as("h"))
      .agg(agg(col("h")).as("sketch"))
  }
}
