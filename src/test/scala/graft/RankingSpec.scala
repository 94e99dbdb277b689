package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.Ranking

/** Pins the distributed global-ranking module (q78) against the
  * single-partition window oracle: identical ranks, and the rank work
  * provably executed in more than one task.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  // values with heavy ties on the primary key force the tie-break path
  private lazy val rows = {
    val rnd = new scala.util.Random(3)
    Seq.tabulate(5000)(i => (i.toLong, rnd.nextInt(40).toDouble))
      .toDF("id", "score").repartition(8)
  }

  describe("withGlobalRowNumber") {
    it("matches the global window row_number exactly (desc order, tie-broken)") {
      val order = Seq(col("score").desc, col("id"))
      val got = Ranking.withGlobalRowNumber(rows, order, "rn")
        .select("id", "rn").as[(Long, Long)].collect().toMap
      val want = rows.withColumn("rn",
          row_number().over(Window.orderBy(col("score").desc, col("id"))).cast("long"))
        .select("id", "rn").as[(Long, Long)].collect().toMap
      assert(got == want)
    }

    it("runs the numbering in more than one task (no single-partition funnel)") {
      val order = Seq(col("score").desc, col("id"))
      val nTasks = Ranking.withGlobalRowNumber(rows, order, "rn", numPartitions = 8)
        .select(spark_partition_id().as("pid")).distinct().count()
      assert(nTasks > 1, s"rank work collapsed to $nTasks task(s)")
    }

    it("totalCol carries the exact row count to every row") {
      val out = Ranking.withGlobalRowNumber(rows, Seq(col("id")), "rn",
        totalCol = Some("tot"))
      assert(out.select("tot").distinct().as[Long].collect().toSeq == Seq(5000L))
    }

    it("handles an empty input and a single row") {
      val empty = rows.filter(lit(false))
      assert(Ranking.withGlobalRowNumber(empty, Seq(col("id")), "rn").count() == 0)
      val one = rows.limit(1)
      val r = Ranking.withGlobalRowNumber(one, Seq(col("id")), "rn",
        totalCol = Some("tot")).select("rn", "tot").as[(Long, Long)].head()
      assert(r == ((1L, 1L)))
    }
  }

  describe("derived ranks") {
    it("ntileFromRowNumber matches ntile() for k not dividing n and k > n") {
      for (k <- Seq(3, 4, 7, 6000)) {
        val w = Window.orderBy(col("score").desc, col("id"))
        val want = rows.select(col("id"), ntile(k).over(w).cast("long").as("t"))
          .as[(Long, Long)].collect().toMap
        val ranked = Ranking.withGlobalRowNumber(rows,
          Seq(col("score").desc, col("id")), "rn", totalCol = Some("tot"))
        val got = ranked.select(col("id"),
            Ranking.ntileFromRowNumber(col("rn"), col("tot"), k).cast("long").as("t"))
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"ntile($k) diverged")
      }
    }

    it("percentRankFromRank matches percent_rank() and is 0 for a single row") {
      val w = Window.orderBy(col("score").desc, col("id"))
      val want = rows.select(col("id"), percent_rank().over(w).as("p"))
        .as[(Long, Double)].collect().toMap
      val ranked = Ranking.withGlobalRowNumber(rows,
        Seq(col("score").desc, col("id")), "rn", totalCol = Some("tot"))
      val got = ranked.select(col("id"),
          Ranking.percentRankFromRank(col("rn"), col("tot")).as("p"))
        .as[(Long, Double)].collect().toMap
      assert(got == want)
      val single = Ranking.withGlobalRowNumber(rows.limit(1), Seq(col("id")), "rn",
        totalCol = Some("tot"))
      assert(single.select(Ranking.percentRankFromRank(col("rn"), col("tot")))
        .as[Double].head() == 0.0)
    }
  }
}
