package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins and window operators the reference lacks
  * (SURVEY.md §2.5) but any TSDB-shaped workload needs.
  */
object AsOf {

  /** As-of join: for each left row, attach the most recent right row
    * with `right.tsCol <= left.tsCol` (ties broken by `seqCol`,
    * right-row-first-wins like a `<=` range), equi-matched on `keys`.
    *
    * Implementation is the scale-correct union-window pattern: ONE
    * shuffle on the key (no O(n·m) range-join explosion, no broadcast
    * requirement on either side). Both inputs are tagged, unioned,
    * sorted within key partitions, and the right-side payload is
    * carried forward with `last(_, ignoreNulls)` over an unbounded
    * preceding frame. This holds at 100 TB as long as single keys fit
    * a partition (skewed keys → salt the key first).
    *
    * `leftCols`/`rightPayload`: columns to keep. The right payload
    * columns come back null when no as-of match exists.
    */
  def asOfJoinPrev(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      seqCol: String,
      leftCols: Seq[String],
      rightPayload: Seq[String]
  ): DataFrame = {
    val l = left.select(
      (keys :+ tsCol :+ seqCol).map(col) ++
        leftCols.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) :+
        lit(1).as("__side"): _*)
    val r = right.select(
      (keys :+ tsCol :+ seqCol).map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"__r_$c")) :+
        lit(0).as("__side"): _*)

    // Right rows sort before left rows at identical (ts, seq) so a
    // right event at exactly the left timestamp is matched (<= semantics).
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(seqCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Carry ONE struct of the whole right payload (non-null exactly on
    // right rows) with a single last(ignoreNulls): all payload columns
    // come from the SAME as-of row. Carrying each column independently
    // would back-fill a legitimately-null payload column from an older
    // right row, mixing columns of different rows.
    val payloadStruct = when(col("__side") === 0,
      struct(rightPayload.map(c => col(s"__r_$c").as(c)): _*))
    val carried = l.unionByName(r)
      .withColumn("__c", last(payloadStruct, ignoreNulls = true).over(w))

    carried
      .filter(col("__side") === 1)
      .select(
        (keys :+ tsCol :+ seqCol).map(col) ++
          leftCols.map(col) ++
          rightPayload.map(c => col("__c").getField(c).as(c)): _*)
  }
}
