package graft

import org.scalatest.funspec.AnyFunSpec

import graft.functions.{Scored, TopKBuf, TopKByScore}

/** Pure-JVM property check of the bounded top-k aggregator against the
  * window semantics it replaces: for ANY input (ties included), ANY
  * partitioning of the input, and ANY merge order, the aggregate must
  * equal `row_number() OVER (ORDER BY score DESC, id ASC) <= k` — the
  * exact selection AND rank order. This is the algebraic contract that
  * makes the map-side partial/merge machinery safe to trust at any
  * scale. Deterministic seeded cases, no Spark session needed (the
  * Aggregator is plain Scala); the Spark-side integration sits under
  * the q59/q81/q82 oracles and PlanAuditSpec.
  */
class TopKSpec extends AnyFunSpec {

  private def reference(xs: Seq[Scored], k: Int): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  // scores drawn from a SMALL value set so ties are common; ids unique
  private def genCase(rnd: scala.util.Random): (List[Scored], Int) = {
    val n = rnd.nextInt(61)
    val xs = List.tabulate(n)(i => Scored(rnd.nextInt(6) / 2.0, i.toLong))
    (rnd.shuffle(xs), 1 + rnd.nextInt(12))
  }

  it("reduce+merge under any partitioning/order equals the sorted-window top-k") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val (xs, k) = genCase(rnd)
      val agg = new TopKByScore(k)
      // random partitioning of the input into 1..6 slices
      val slices = xs.groupBy(_ => rnd.nextInt(1 + rnd.nextInt(6))).values.toList
      // reduce each slice, then merge in shuffled order
      val partials = slices.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(agg.zero :: partials).reduce(agg.merge)
      val got = agg.finish(merged).items
      assert(got == reference(xs, k),
        s"k=$k slices=${slices.size}\n got=$got\n want=${reference(xs, k)}")
    }
  }

  it("finish is rank-ordered (score desc, id asc) and bounded by k") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val (xs, k) = genCase(rnd)
      val agg = new TopKByScore(k)
      val out = agg.finish(xs.foldLeft(agg.zero)(agg.reduce)).items
      assert(out.size == math.min(k, xs.size))
      assert(out == out.sortBy(s => (-s.score, s.id)))
    }
  }

  it("merge is associative-in-effect: tree vs linear fold agree") {
    val rnd = new scala.util.Random(13)
    (1 to 200).foreach { _ =>
      val (xs, k) = genCase(rnd)
      val agg = new TopKByScore(k)
      val singles = xs.map(x => agg.reduce(agg.zero, x))
      val linear = singles.foldLeft(agg.zero)(agg.merge)
      def tree(bs: List[TopKBuf]): TopKBuf = bs match {
        case Nil      => agg.zero
        case b :: Nil => b
        case _ =>
          val (l, r) = rnd.shuffle(bs).splitAt(bs.size / 2)
          agg.merge(tree(l), tree(r))
      }
      assert(agg.finish(linear).items == agg.finish(tree(singles)).items)
    }
  }
}
