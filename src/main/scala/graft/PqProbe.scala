package graft

import org.apache.spark.sql.functions._

/** ANN recall dashboard (scratch measurement main, same role as
  * QueryProbe/StreamProbe): recall@10 of every approximate family
  * against `Similarity.bruteForceTopK` ground truth, at the GATED
  * configurations (q82 LSH bits=8/1 seed, q81 IVF label-centroids
  * nProbe=2, q110 PQ m=4×16, q111 IVF+PQ composition), plus the PQ
  * subspace-split sweep behind the original BENCH_NOTES compression
  * table. Run with SPARK_GRAFT_SF_DIR=sf0.1 for the round-over-round
  * dashboard row; the suite asserts floors for the same configs on a
  * synthetic clustered corpus (AnalyticsSpec "recall floors").
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "10").toInt
    val k = 10
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding"))
    val corpusN = e.count()
    val exact = graft.analytics.Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "qid", k)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet

    def recall(approx: Set[(Long, Long)]): Double =
      (approx intersect exact).size.toDouble / exact.size
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("qid").cast("long"), col("id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    println(s"ANNPROBE sf=$sf corpus=$corpusN queries=$nQueries k=$k")
    println("| family | gated config | recall@10 |")
    println("|---|---|---|")

    // q82: sign-LSH, md5 hyperplanes, 8 bits, one band
    val lsh = pairs(graft.analytics.Similarity.lshTopK(e, q,
      "vec_id", "embedding", "qid", k, bits = 8, seeds = Seq(1),
      signature = graft.functions.VectorFunctions.md5HyperplaneSignature))
    println(f"| LSH (q82) | bits=8, 1 band | ${recall(lsh)}%.3f |")

    // q81: IVF with deterministic label centroids, nProbe=2
    val cents = graft.analytics.Similarity.centroids(
      e.select(col("label"),
        graft.functions.VectorFunctions.l2Normalize(col("embedding")).as("nv")),
      "label", "nv")
      .select(col("group"), col("i"), round(col("c"), 6).as("c"))
    val ivf = pairs(graft.analytics.Similarity.ivfTopKWithCentroids(e, q, cents,
      "vec_id", "embedding", "qid", k, nProbe = 2))
    println(f"| IVF (q81) | label cells, nProbe=2 | ${recall(ivf)}%.3f |")

    // q110: PQ/ADC, m=4 x subDim=16
    val cb = graft.analytics.Similarity.pqCodebooks(e, "label", "embedding", 4, 16)
    val pq = pairs(graft.analytics.Similarity.pqTopK(e, q, cb,
      "vec_id", "embedding", "qid", k, 4, 16))
    println(f"| PQ (q110) | m=4, subDim=16 | ${recall(pq)}%.3f |")

    // q111: IVF+PQ composition
    val ivfpq = pairs(graft.analytics.Similarity.ivfPqTopK(e, q, cents, cb,
      "vec_id", "embedding", "qid", k, nProbe = 2, m = 4, subDim = 16))
    println(f"| IVF+PQ (q111) | nProbe=2, m=4x16 | ${recall(ivfpq)}%.3f |")

    // q174: residual IVF+PQ (orthant-trained residual codebooks) —
    // identical bytes per vector as q111; the residual form's whole
    // claim is a higher number on this row
    val rcb = graft.analytics.Similarity.residualPqCodebooks(
      e, cents, "vec_id", "embedding", 4, 16)
    val rivfpq = pairs(graft.analytics.Similarity.residualIvfPqTopK(e, q, cents, rcb,
      "vec_id", "embedding", "qid", k, nProbe = 2, m = 4, subDim = 16))
    println(f"| residual IVF+PQ (q174) | nProbe=2, m=4x16, residual codes | ${recall(rivfpq)}%.3f |")

    // q178: OPQ rotation (variance-balancing permutation, Ge et al.)
    // over the residual form, 6 orthant bits (64 codes — still one
    // byte, identical storage); the claim is a strictly higher number
    // than the q174 row at both scales (measured 0.260/0.200 vs
    // 0.200/0.140 at sf0.001/sf0.1)
    val perm = graft.analytics.Similarity.opqPermutation(e, cents, "vec_id", "embedding", 4, 16)
    val ocb = graft.analytics.Similarity.opqResidualPqCodebooks(
      e, cents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
    val orivfpq = pairs(graft.analytics.Similarity.opqResidualIvfPqTopK(e, q, cents, perm, ocb,
      "vec_id", "embedding", "qid", k, nProbe = 2, m = 4, subDim = 16))
    println(f"| OPQ residual IVF+PQ (q178) | nProbe=2, m=4x16, OPQ perm, 6 sign bits | ${recall(orivfpq)}%.3f |")

    // q180: exact re-rank of the q178 shortlist (R=50) — the refine
    // stage; recall@10 here equals recall@50 of the q178 tier, the
    // single biggest recall lever at the cost of 50 raw-vector reads
    // per query
    val short50 = graft.analytics.Similarity.opqResidualIvfPqTopK(e, q, cents, perm, ocb,
      "vec_id", "embedding", "qid", k = 50, nProbe = 2, m = 4, subDim = 16)
    val rerank = pairs(graft.analytics.Similarity.exactRerank(e, q, short50,
      "vec_id", "embedding", "qid", k))
    println(f"| exact re-rank of q178 shortlist (q180) | R=50, nProbe=2, m=4x16 | ${recall(rerank)}%.3f |")

    // refine-ceiling sweep: with the refine stage fixed at R=50, the
    // re-ranked recall tracks COARSE-PROBE COVERAGE — at nProbe=2 it
    // sits at the q81 exact-IVF ceiling, and raising nProbe moves the
    // ceiling itself (the quantization term is already recovered), so
    // a user tunes recall with nProbe/R, not with bigger codes
    for ((np, r) <- Seq((2, 50), (3, 50), (5, 50), (5, 100))) {
      val sl = graft.analytics.Similarity.opqResidualIvfPqTopK(e, q, cents, perm, ocb,
        "vec_id", "embedding", "qid", k = r, nProbe = np, m = 4, subDim = 16)
      val rr = pairs(graft.analytics.Similarity.exactRerank(e, q, sl,
        "vec_id", "embedding", "qid", k))
      println(f"| re-rank sweep | R=$r, nProbe=$np | ${recall(rr)}%.3f |")
    }

    // q186: TRAINED coarse quantizer — Lloyd rounds refine the
    // label-seeded centroids (the q100 k-means step) before the OPQ
    // chain trains against them; probe coverage is the binding recall
    // lever (the (nProbe, R) sweep above), and better cells raise it at
    // zero serve cost. The claim is a strictly higher number than the
    // q178 row at identical bytes — the gated config is iters=3
    // (measured 0.300/0.210 vs 0.260/0.200 at sf0.001/sf0.1; the iter
    // sweep below shows the trajectory at both scales).
    for (it <- Seq(1, 2, 3, 5)) {
      val lc = graft.analytics.Similarity.lloydRefine(e, cents, "vec_id", "embedding", iters = it)
      val lp = graft.analytics.Similarity.opqPermutation(e, lc, "vec_id", "embedding", 4, 16)
      val lb = graft.analytics.Similarity.opqResidualPqCodebooks(
        e, lc, lp, "vec_id", "embedding", 4, 16, signBits = 6)
      val lr = pairs(graft.analytics.Similarity.opqResidualIvfPqTopK(e, q, lc, lp, lb,
        "vec_id", "embedding", "qid", k, nProbe = 2, m = 4, subDim = 16))
      println(f"| Lloyd iter sweep | iters=$it, nProbe=2 | ${recall(lr)}%.3f |")
    }
    val lcents = graft.analytics.Similarity.lloydRefine(
      e, cents, "vec_id", "embedding", iters = 3)
    val lperm = graft.analytics.Similarity.opqPermutation(e, lcents, "vec_id", "embedding", 4, 16)
    val locb = graft.analytics.Similarity.opqResidualPqCodebooks(
      e, lcents, lperm, "vec_id", "embedding", 4, 16, signBits = 6)
    val lloyd = pairs(graft.analytics.Similarity.opqResidualIvfPqTopK(e, q, lcents, lperm, locb,
      "vec_id", "embedding", "qid", k, nProbe = 2, m = 4, subDim = 16))
    println(f"| Lloyd-trained OPQ residual IVF+PQ (q186) | 3 Lloyd iters, nProbe=2, m=4x16 | ${recall(lloyd)}%.3f |")

    // q190: TRAINED PQ subspace codebooks — per-subspace Lloyd rounds
    // over the orthant seed, composed with the Lloyd coarse quantizer
    // (q186's cells): the last untrained quantizer in the stack gets
    // its k-means step. The claim is a strictly higher number than the
    // q186 row at identical bytes (gated iters=3: 0.320/0.230 vs
    // 0.300/0.210 at sf0.001/sf0.1); the sweep shows the trajectory.
    // iters=1 reads higher at sf0.1 (0.240) but BELOW q186 at sf0.001
    // (0.270 vs 0.300) — iters=3 is the dominant point at both scales.
    for (it <- Seq(1, 2, 3)) {
      val tcb = graft.analytics.Similarity.opqPqLloydRefine(
        e, lcents, lperm, locb, "vec_id", "embedding", 4, 16, iters = it)
      val tr = pairs(graft.analytics.Similarity.opqResidualIvfPqTopK(e, q, lcents, lperm, tcb,
        "vec_id", "embedding", "qid", k, nProbe = 2, m = 4, subDim = 16))
      println(f"| PQ-train iter sweep (q190) | pqIters=$it, 3 Lloyd cell iters, nProbe=2 | ${recall(tr)}%.3f |")
    }

    // q187: the HIGH-RECALL serving operating point — R=100/nProbe=5
    // re-rank over the label-quantizer OPQ tier (the sweep's best row,
    // gated so the quality config is hash-pinned, not just swept)
    val short187 = graft.analytics.Similarity.opqResidualIvfPqTopK(e, q, cents, perm, ocb,
      "vec_id", "embedding", "qid", k = 100, nProbe = 5, m = 4, subDim = 16)
    val hi = pairs(graft.analytics.Similarity.exactRerank(e, q, short187,
      "vec_id", "embedding", "qid", k))
    println(f"| high-recall re-rank (q187) | R=100, nProbe=5, m=4x16 | ${recall(hi)}%.3f |")

    // Lloyd + the high-recall refine stage composed — the quality
    // ceiling of the full trained serving stack
    val lshort = graft.analytics.Similarity.opqResidualIvfPqTopK(e, q, lcents, lperm, locb,
      "vec_id", "embedding", "qid", k = 100, nProbe = 5, m = 4, subDim = 16)
    val lhi = pairs(graft.analytics.Similarity.exactRerank(e, q, lshort,
      "vec_id", "embedding", "qid", k))
    println(f"| Lloyd + high-recall re-rank | 3 Lloyd iters, R=100, nProbe=5 | ${recall(lhi)}%.3f |")

    // q195 FLAGSHIP: every quantizer trained (3 Lloyd cell rounds + 3
    // per-subspace PQ rounds) + the high-recall refine — the composed
    // stack a production user deploys, gated end-to-end through the
    // persisted-config serve (persist defaults nProbe=7/rerankR=200).
    // The grid that selected the flagship config: trained codebooks
    // sharpen the ADC shortlist but need a refine wider than q187's
    // R=100 to dominate at sf0.1 — the r15 grid moved the dominant
    // row from (R=150, nProbe=7) [30-query 0.917/0.757] to (R=200,
    // nProbe=7) [0.923/0.800], identical index bytes, R serve-time
    // only; that is the gated q195 / persist-default config
    val ftcb = graft.analytics.Similarity.opqPqLloydRefine(
      e, lcents, lperm, locb, "vec_id", "embedding", 4, 16, iters = 3)
    for ((np, r) <- Seq((5, 100), (5, 150), (7, 100), (7, 150), (7, 200))) {
      val fshort = graft.analytics.Similarity.opqResidualIvfPqTopK(e, q, lcents, lperm, ftcb,
        "vec_id", "embedding", "qid", k = r, nProbe = np, m = 4, subDim = 16)
      val fl = pairs(graft.analytics.Similarity.exactRerank(e, q, fshort,
        "vec_id", "embedding", "qid", k))
      val tag = if (np == 7 && r == 200) "FLAGSHIP (q195, gated)" else "flagship sweep"
      println(f"| $tag | pqIters=3, R=$r, nProbe=$np | ${recall(fl)}%.3f |")
    }

    // q196: SWAP-TRAINED rotation — greedy cross-subspace dimension
    // swaps balancing per-subspace residual variance (the OPQ rotate
    // step on the permutation subgroup), composed with the trained
    // cells + trained PQ codebooks at the q190 serve point; sweep shows
    // the iteration trajectory (0 = snake-deal seed = the q190 row)
    for (it <- Seq(0, 2, 4, 8, 16)) {
      val sperm = graft.analytics.Similarity.opqSwapRefine(
        e, lcents, "vec_id", "embedding", 4, 16, iters = it)
      val scb0 = graft.analytics.Similarity.opqResidualPqCodebooks(
        e, lcents, sperm, "vec_id", "embedding", 4, 16, signBits = 6)
      val scb = graft.analytics.Similarity.opqPqLloydRefine(
        e, lcents, sperm, scb0, "vec_id", "embedding", 4, 16, iters = 3)
      val sr = pairs(graft.analytics.Similarity.opqResidualIvfPqTopK(e, q, lcents, sperm, scb,
        "vec_id", "embedding", "qid", k, nProbe = 2, m = 4, subDim = 16))
      println(f"| swap-train sweep (q196) | swapIters=$it, pqIters=3, 3 Lloyd iters, nProbe=2 | ${recall(sr)}%.3f |")
    }

    // FLAGSHIP × SWAP grid (r15): the swap-trained rotation composed
    // with the FULL trained stack AT THE RERANK OPERATING POINTS —
    // the grid that decided the persisted default's rotation.
    // VERDICT (30 queries): swap LOSES AT SCALE (sf0.1) at every
    // rerank point (0.720 at (7,150), 0.777 at (7,200) vs the
    // snake-deal's 0.757/0.800) while roughly tying at sf0.001 (0.913
    // at (7,150); 0.930 vs 0.923 at (7,200), a within-noise edge at 30
    // queries) — the refine recovers the ADC quantization error the
    // rotation reduces, so rotation quality stops binding once R is
    // wide — and it surfaced (7,200) as the new dominant snake-deal
    // row (0.923/0.800), promoted to the q195/persist default on the
    // sf0.1 evidence (swapIters=0 == snake-deal == flagship rows above)
    for (si <- Seq(0, 2, 4)) {
      val gperm = graft.analytics.Similarity.opqSwapRefine(
        e, lcents, "vec_id", "embedding", 4, 16, iters = si)
      val gcb0 = graft.analytics.Similarity.opqResidualPqCodebooks(
        e, lcents, gperm, "vec_id", "embedding", 4, 16, signBits = 6)
      val gcb = graft.analytics.Similarity.opqPqLloydRefine(
        e, lcents, gperm, gcb0, "vec_id", "embedding", 4, 16, iters = 3)
      for ((np, r) <- Seq((5, 100), (7, 150), (7, 200))) {
        val gshort = graft.analytics.Similarity.opqResidualIvfPqTopK(e, q, lcents, gperm, gcb,
          "vec_id", "embedding", "qid", k = r, nProbe = np, m = 4, subDim = 16)
        val gl = pairs(graft.analytics.Similarity.exactRerank(e, q, gshort,
          "vec_id", "embedding", "qid", k))
        println(f"| flagship x swap grid | swapIters=$si, pqIters=3, R=$r, nProbe=$np | ${recall(gl)}%.3f |")
      }
    }

    // CELL-COUNT REALISM (r16): the label quantizer yields 10 cells,
    // so the flagship's nProbe=7 probes 70% of the corpus — at corpus
    // scale an IVF has ~sqrt(N) cells and nProbe ≪ nCells probes a few
    // percent. Train nCells Lloyd cells from deterministic spaced-
    // vector seeds (every (N/nCells)-th vector — k-means++-ish spread
    // without randomness) and re-run the FLAGSHIP serve config
    // unchanged: the claim is recall holding (or degrading gracefully)
    // while the probed fraction collapses toward the production shape.
    {
      import graft.functions.VectorFunctions.l2Normalize
      for (nc <- Seq(16, 64, 128, 256) if nc.toLong < corpusN) {
        val step = math.max(1L, corpusN / nc)
        val seedIds = (0 until nc).map(_ * step)
        val seed = e.filter(col("vec_id").isin(seedIds: _*))
          .select(col("vec_id").as("group"), posexplode(l2Normalize(col("embedding"))))
          .select(col("group"), col("pos").as("i"),
            round(col("col").cast("double"), 6).as("c"))
        val nce = graft.analytics.Similarity.lloydRefine(
          e, seed, "vec_id", "embedding", iters = 3)
        val np2 = graft.analytics.Similarity.opqPermutation(
          e, nce, "vec_id", "embedding", 4, 16)
        val nb0 = graft.analytics.Similarity.opqResidualPqCodebooks(
          e, nce, np2, "vec_id", "embedding", 4, 16, signBits = 6)
        val nb = graft.analytics.Similarity.opqPqLloydRefine(
          e, nce, np2, nb0, "vec_id", "embedding", 4, 16, iters = 3)
        // two operating points per cell count: the flagship's literal
        // nProbe=7 (probed fraction collapses with nCells — recall
        // decays, the expected IVF tradeoff) and nProbe scaled to a
        // constant 25% probed fraction (recall should ride back toward
        // the refine ceiling — the knob a production deployment turns
        // as its index grows)
        for (np <- Seq(7, math.max(7, nc / 4)).distinct) {
          val nshort = graft.analytics.Similarity.opqResidualIvfPqTopK(e, q, nce, np2, nb,
            "vec_id", "embedding", "qid", k = 200, nProbe = np, m = 4, subDim = 16)
          val nfl = pairs(graft.analytics.Similarity.exactRerank(e, q, nshort,
            "vec_id", "embedding", "qid", k))
          println(f"| cell-count realism | nCells=$nc, nProbe=$np, R=200 " +
            f"(probes ${np * 100.0 / nc}%.1f%% of cells) | ${recall(nfl)}%.3f |")
        }
      }
    }

    // the original compression sweep: recall across subspace splits
    for ((m, sd) <- Seq((4, 16), (8, 8), (16, 4), (32, 2))) {
      val cbs = graft.analytics.Similarity.pqCodebooks(e, "label", "embedding", m, sd)
      val r = pairs(graft.analytics.Similarity.pqTopK(e, q, cbs,
        "vec_id", "embedding", "qid", k, m, sd))
      println(f"| PQ sweep | m=$m, subDim=$sd | ${recall(r)}%.3f |")
    }
    spark.stop()
  }
}
