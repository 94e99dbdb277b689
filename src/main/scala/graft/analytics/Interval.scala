package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) joins — matching instants to [start, end] windows.
  *
  * With an equi-key alongside the range predicate Spark already plans a
  * fine join (sort-merge on the key, range as residual). The hard case
  * is KEYLESS: `ts BETWEEN start AND end` alone plans a broadcast
  * nested loop — O(|left|·|right|) condition evaluations, a scale
  * killer once the window table stops being tiny.
  *
  * [[joinByBucket]] makes it a shuffle EQUI-join: bucket time into
  * `bucketSeconds` cells, explode each interval over the buckets it
  * covers, join on the bucket, filter the exact containment. Each left
  * row sits in exactly one bucket, so no duplicate pairs arise; cost is
  * |left| + Σ interval_span/bucket rows — linear, partitionable, and
  * skew-safe for bounded interval lengths (pick bucketSeconds near the
  * typical interval length so each interval explodes to ~1–2 rows).
  */
object Interval {

  /** Inner interval join: rows of `left` whose `tsCol` (TimestampType)
    * falls within [`startCol`, `endCol`] of `right` (inclusive).
    * Output: all left columns + all right columns.
    */
  def joinByBucket(left: DataFrame, tsCol: String,
      right: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds > 0")
    val b = lit(bucketSeconds)
    val lb = left.withColumn("__b", (unix_timestamp(col(tsCol)) / b).cast("long"))
    // Two-level explode bounds the per-row array: one sequence(lo, hi)
    // materializes an interval's WHOLE bucket list as a single array
    // (a year-long interval at 1 s buckets = 31M elements in one row)
    // before exploding; chunked, no array exceeds 1024 elements while
    // the exploded rows are identical. Well-chosen bucketSeconds still
    // means ~1-2 buckets per interval — this only de-fangs the misuse.
    val lo = (unix_timestamp(col(startCol)) / b).cast("long")
    val hi = (unix_timestamp(col(endCol)) / b).cast("long")
    val chunk = lit(1024L)
    val rb = right
      // end < start can never match any instant; the stepless sequence
      // used to drop such rows silently (descending range), but the
      // stepped one throws at runtime — keep the drop-silently contract
      .filter(hi >= lo)
      .withColumn("__hi", hi)
      .withColumn("__cs", explode(sequence(lo, col("__hi"), chunk)))
      .withColumn("__b", explode(sequence(col("__cs"), least(col("__cs") + chunk - 1, col("__hi")))))
      .drop("__cs", "__hi")
    lb.join(rb, Seq("__b"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__b")
  }
}
