package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge DataFrames — the natural companions to the
  * dedup pipeline's near-duplicate graph (connected components live in
  * [[Dedup.connectedComponents]]; this module holds the score-propagation
  * family).
  */
object Graph {

  /** Integer-exact PageRank over an UNDIRECTED edge set, fixed iteration
    * count. Scores are kept in integer micro-units (1.0 ≡ 1,000,000) and
    * every per-iteration op is integer arithmetic:
    *
    *   pr'(i) = (1−d)·10^6  +  d · Σ_{j∈N(i)} (pr(j) div deg(j))
    *
    * with d applied as ·85 div 100 AFTER the integer sum — so the result
    * is a deterministic function of the edge SET: long sums are
    * associative/commutative, no float enters until the caller divides
    * by 10^6 for display. That makes a 3-iteration rank replayable
    * bit-for-bit by any engine with integer division — and the oracle
    * gates the propagation structure itself, not a float tolerance.
    *
    * Scale shape: each iteration is ONE equi-join of the (id, pr, deg)
    * rank table against the edge list plus ONE groupBy-sum — the same
    * per-round cost as [[Dedup.connectedComponents]]; no collect, no
    * whole-graph state on any single node. Dangling nodes cannot exist:
    * the node set is derived from the undirected edges, so deg ≥ 1.
    *
    * `edges` needs columns (`srcCol`, `dstCol`) with one row per
    * undirected pair (i < j convention fine — both directions are
    * materialized here). Self-loops are dropped. Output: (id, pr_micro)
    * after `iterations` rounds, pr_micro ≥ 150000.
    */
  def pageRankMicro(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 20, "iterations in [1,20]")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0,100]")
    val base = (100 - dampingPct) * 10000L // (1−d)·10^6
    // canonicalize orientation BEFORE distinct so (i,j) and (j,i) are
    // the same undirected edge — degrees must not double-count
    val und = edges.filter(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .distinct()
    // both directions once, CACHED: every iteration (and the degree
    // computation) re-reads this — without the persist each round would
    // re-execute the full upstream plan (for q122 that upstream is the
    // MinHash LSH banding join, once per round)
    val dir = und.select(col("u"), col("v"))
      .unionByName(und.select(col("v").as("u"), col("u").as("v")))
      .persist()
    try {
      val deg = dir.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
      var pr = deg.withColumn("pr", lit(1000000L))
      for (round <- 1 to iterations) {
        // truncate lineage on long runs the same way connectedComponents
        // does — plan depth stays bounded, integer values are unaffected
        if (round % 5 == 0) pr = pr.localCheckpoint(eager = false)
        // contribution of j to each neighbor: pr(j) div deg(j) — the
        // integer share; join edges (u=j) → route to v, sum per v
        val contrib = pr.select(col("id").as("u"),
            expr("pr div deg").as("share"))
          .join(dir, "u")
          .groupBy(col("v").as("id")).agg(sum("share").as("inflow"))
        pr = deg.join(contrib, Seq("id"), "left")
          .select(col("id"), col("deg"),
            (lit(base) + expr(s"${dampingPct}L * coalesce(inflow, 0L) div 100"))
              .as("pr"))
      }
      // materialize the final ranks (one row per node — executor-side
      // blocks, never the driver) so unpersisting the edge cache below
      // cannot force a from-scratch recompute when the caller acts
      pr.select(col("id"), col("pr").as("pr_micro"))
        .localCheckpoint(eager = true)
    } finally {
      dir.unpersist(blocking = false)
    }
  }
}
