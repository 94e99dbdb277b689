package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the manual salting pattern for
  * when AQE's runtime skew-join splitting isn't available (non-AQE
  * engines, deterministic plans) or a key's skew is known up front.
  *
  * A hot key (one user with 10% of a 100 TB fact table) turns a hash
  * join into one straggler task. Salting splits each left key into
  * `saltBuckets` sub-keys and replicates the right side once per
  * bucket, so the hot key's rows spread over `saltBuckets` tasks. The
  * trade: the right side shuffles `saltBuckets`× its size — use for
  * fact-to-dimension joins where the right side is modest but too big
  * (or too dynamic) to broadcast.
  */
object Skew {

  /** Inner-join `left` and `right` on `keys` with left-side salting.
    *
    * The salt is a deterministic hash of the left row's whole tuple
    * (pmod(xxhash64(all left columns), buckets)) rather than rand(), so
    * the plan stays reproducible and re-executable (speculative retries
    * see the same salt).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets >= 1")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(saltBuckets.toLong)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Per-key frequency profile — use to decide whether (and how hard)
    * to salt: the ratio max/avg is the straggler factor an unsalted
    * join would see.
    */
  def keySkewProfile(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(
        max("n").as("max_key_rows"),
        avg("n").as("avg_key_rows"),
        (max("n") / avg("n")).as("straggler_factor"))
}
