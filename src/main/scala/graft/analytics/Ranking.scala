package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking.
  *
  * A bare `Window.orderBy` (no partition key) is the textbook
  * scale-killer: Catalyst inserts an Exchange SinglePartition and the
  * whole table serializes through ONE task. This module computes the
  * same global ranks with the work spread over every partition:
  *
  *  1. `repartitionByRange` on the ordering key — ONE shuffle; range
  *     partition p holds strictly earlier keys than partition p+1;
  *  2. partition-local numbering from physical iteration order:
  *     `monotonically_increasing_id()` over the partition-sorted data
  *     carries the partition id in its upper 31 bits and a contiguous
  *     0-based record number in its lower 33 — a window-free local
  *     row number (the projection stays above the sort because the
  *     expression is nondeterministic, so Catalyst cannot reorder it);
  *  3. offset correction: per-partition counts (a tiny map-side agg on
  *     `spark_partition_id()`, sharing the step-1 shuffle via exchange
  *     reuse) are cumulated into start offsets — numPartitions rows —
  *     and broadcast-joined back.
  *
  * global row_number = partition offset + local record number + 1.
  * Derived ranks (ntile, percent_rank — and rank/dense_rank when the
  * ordering key is total) are pure expressions over that row number and
  * the total count, so they inherit the distributed plan.
  */
object Ranking {

  private val LocalMask = (1L << 33) - 1

  /** Appends a global `row_number` (named `outCol`) ordered by `order`,
    * computed in every partition as documented above. When `totalCol`
    * is set, the total row count rides along as an extra column (free:
    * it falls out of the same offsets aggregate).
    *
    * `order` must be a TOTAL order (break ties with a unique key) —
    * same contract as making any global row_number deterministic.
    *
    * COMPOSITION CONTRACT: correctness of the offsets join relies on
    * the range exchange being planned ONCE and reused across the two
    * internal branches — which holds because the exchange's subtree is
    * deterministic and canonically equal (and exchange reuse is on,
    * the Spark default). The OUTPUT, however, carries nondeterministic
    * ids: an exchange built over this frame canonicalizes UNEQUAL
    * across plan branches, so a downstream plan consuming the ranked
    * frame in two branches of one action (self-join, rank-of-ranked)
    * re-executes it twice with independently sampled boundaries and
    * the two copies can disagree. Either consume the frame in one
    * branch, join independent rankings by a unique key (see
    * Stats.spearman), or `localCheckpoint()` it first. PlanAuditSpec
    * pins the ReusedExchange for the single-level shape.
    */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column], outCol: String,
      numPartitions: Int = 0, totalCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, order: _*)
    // Offsets branch: counts only depend on the range partitioning, so
    // it reads spark_partition_id() straight off the reused exchange —
    // no sort, no ids. The cumulative window runs over `parts` rows.
    val byPid = Window.orderBy("__pid")
    val offsets = ranged
      .groupBy(spark_partition_id().as("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum("__cnt").over(byPid.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot", sum("__cnt").over(
        byPid.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__pid", "__off", "__tot")
    val numbered = ranged
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
    val joined = numbered.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + col("__mid").bitwiseAND(lit(LocalMask)) + lit(1L))
    totalCol.fold(joined.drop("__pid", "__mid", "__off", "__tot")) { t =>
      joined.withColumnRenamed("__tot", t).drop("__pid", "__mid", "__off")
    }
  }

  /** Spark `ntile(k)` semantics from a global row number and total
    * count: the first (n mod k) tiles hold ceil(n/k) rows, the rest
    * floor(n/k). Pure long arithmetic — no window.
    */
  def ntileFromRowNumber(rn: Column, total: Column, k: Int): Column = {
    // Column `/` is DOUBLE division in Spark SQL — every quotient here
    // must be floored to stay on integer tile arithmetic.
    val base = floor(total / lit(k.toLong)) // floor tile size
    val rem = total % lit(k.toLong) // number of fat (base+1) tiles
    when(rn <= (base + 1) * rem, floor((rn - 1) / (base + 1)) + 1)
      .otherwise(floor((rn - 1 - rem) / greatest(base, lit(1L))) + 1)
  }

  /** Spark `percent_rank` from a global rank and total count:
    * (rank − 1) / (n − 1), defined as 0 for a single row.
    */
  def percentRankFromRank(rank: Column, total: Column): Column =
    when(total <= 1, lit(0.0))
      .otherwise((rank - 1).cast("double") / (total - 1).cast("double"))
}
