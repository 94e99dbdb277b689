package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate: the unit the bounded top-k aggregator ranks.
  * Ordering contract (matches `row_number() OVER (ORDER BY score DESC,
  * id ASC)`): higher score wins; equal scores break toward the smaller
  * id — a total order over distinct (score, id) pairs, so the selected
  * set and its ranks are exactly what the window formulation produces.
  */
final case class Scored(score: Double, id: Long)

/** Aggregation buffer: at most k best-so-far candidates, unordered. */
final case class TopKBuf(items: Seq[Scored])

/** Bounded top-k as a real AGGREGATE — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(qid))` on unbounded inputs.
  * The window form funnels every row of a partition key through ONE
  * task to number them; as an Aggregator the partial/merge machinery
  * keeps ≤ k candidates per (key, input-partition) on the map side, so
  * the shuffle carries k·partitions rows per key instead of the whole
  * input, and no task ever holds more than 2k buffer entries. This is
  * preference order (b) of the custom-operator policy: a typed
  * aggregation function, not a mapPartitions kernel.
  *
  * Buffer ops are O(k) per row over a k-bounded Seq — for ANN-scale k
  * (tens) the cost is a few compares per input row, dominated by the
  * dot product that feeds it.
  */
final class TopKByScore(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf]
    with Serializable {
  require(k >= 1, "top-k needs k >= 1")

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: TopKBuf = TopKBuf(Nil)

  override def reduce(buf: TopKBuf, x: Scored): TopKBuf =
    if (buf.items.size < k) TopKBuf(x +: buf.items)
    else {
      // ids are unique within a group, so `worst` occurs exactly once
      val worst = buf.items.reduce((a, b) => if (better(a, b)) b else a)
      if (better(x, worst)) TopKBuf(x +: buf.items.filterNot(_ == worst))
      else buf
    }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf((a.items ++ b.items).sortWith(better).take(k))

  /** Rank order (score desc, id asc) — rank = 1-based position. */
  override def finish(buf: TopKBuf): TopKBuf = TopKBuf(buf.items.sortWith(better))

  override def bufferEncoder: org.apache.spark.sql.Encoder[TopKBuf] =
    Encoders.product[TopKBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[TopKBuf] =
    Encoders.product[TopKBuf]
}

object TopK {
  /** `topK(k)(scoreCol, idCol)` → `array<struct<score,id>>` of the k
    * best (score desc, id asc), already rank-ordered. Ids must be
    * integral (cast upstream): at candidate-generation scale an 8-byte
    * surrogate id is what belongs on the shuffle anyway.
    */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKByScore(k), Encoders.product[Scored])(score, id).getField("items")
}
