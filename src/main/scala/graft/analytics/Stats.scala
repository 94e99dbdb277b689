package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic two-variable statistics. Spark's own `corr`/`covar_*`
  * sum doubles, so their low bits depend on partitioning and AQE; these
  * variants quantize each observation ONCE (floor of an IEEE product —
  * identical on any engine evaluating the same double expression) and
  * push all aggregation through integer/decimal sums, which are
  * associative. The five sufficient statistics (n, Σx, Σy, Σxy, Σx²,
  * Σy²) condense map-side, so the shuffle carries one row per
  * partition at any scale; the only float math happens once, on the
  * single aggregated row.
  */
object Stats {

  /** Pearson correlation + least-squares slope/intercept of y on x,
    * exact-deterministic: x and y are quantized to integer micro-units
    * via floor(v·10^6) per row, moments are exact DECIMAL(38,0) sums,
    * and the closed-form estimates are computed on the one result row.
    * Output: (n, corr, slope, intercept), floats rounded to 6dp.
    */
  def corrRegression(df: DataFrame, x: Column, y: Column): DataFrame = {
    val d380 = DecimalType(38, 0)
    val xi = floor(x.cast("double") * 1e6).cast("long")
    val yi = floor(y.cast("double") * 1e6).cast("long")
    val agg = df.select(xi.as("xi"), yi.as("yi"))
      // complete observation pairs only — n must count exactly the rows
      // the moment sums saw
      .filter(col("xi").isNotNull && col("yi").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(col("xi").cast(d380)).as("sx"),
        sum(col("yi").cast(d380)).as("sy"),
        sum(col("xi").cast(d380) * col("yi").cast(d380)).as("sxy"),
        sum(col("xi").cast(d380) * col("xi").cast(d380)).as("sxx"),
        sum(col("yi").cast(d380) * col("yi").cast(d380)).as("syy"))
    // cov and variances share the n·Σab − Σa·Σb shape; all still exact
    // decimal — one double division/sqrt each at the very end
    val covN = (col("n").cast(d380) * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val varXN = (col("n").cast(d380) * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val varYN = (col("n").cast(d380) * col("syy") - col("sy") * col("sy"))
      .cast("double")
    agg.select(col("n"),
      round(covN / sqrt(varXN * varYN), 6).as("corr"),
      round(covN / varXN, 6).as("slope"),
      round((col("sy").cast("double") - covN / varXN * col("sx").cast("double"))
        / col("n").cast("double") / 1e6, 6).as("intercept"))
  }

  /** Spearman rank correlation, deterministic variant: ranks are
    * GLOBAL row numbers under a total order (`tie` breaks value ties),
    * so ranks are a permutation of 1..n exactly and the classic
    * ρ = 1 − 6·Σd²/(n(n²−1)) closed form applies with INTEGER Σd² —
    * order-free, bit-replayable (average-rank tie handling would put
    * floats in every rank; the tie-broken variant keeps the whole
    * pipeline integer until the one-row division).
    *
    * Scale shape: each rank assignment is [[Ranking.withGlobalRowNumber]]
    * — range partition + partition-offset correction, never an
    * Exchange SinglePartition over the data. Output one row:
    * (n, sum_d2, rho).
    */
  def spearman(df: DataFrame, x: Column, y: Column, tie: Column): DataFrame = {
    val d380 = DecimalType(38, 0)
    val obs = df.select(x.as("x"), y.as("y"), tie.as("t"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    // TWO INDEPENDENT single-level rankings joined on the unique tie
    // key — deliberately NOT rank-then-rank-the-output: a ranked frame
    // carries nondeterministic ids whose exprIds defeat canonical
    // equality, so an exchange built OVER it is not reused across plan
    // branches and each branch re-executes with freshly sampled range
    // boundaries (see Ranking.withGlobalRowNumber's composition
    // contract — this was observed as run-to-run rank drift)
    val rx = Ranking.withGlobalRowNumber(obs.select("x", "t"),
      Seq(col("x"), col("t")), "rx").select("t", "rx")
    val ry = Ranking.withGlobalRowNumber(obs.select("y", "t"),
      Seq(col("y"), col("t")), "ry").select("t", "ry")
    rx.join(ry, "t").agg(count(lit(1)).as("n"),
        sum(((col("rx") - col("ry")) * (col("rx") - col("ry"))).cast(d380)).as("sum_d2"))
      .select(col("n"), col("sum_d2").cast("long").as("sum_d2"),
        round(lit(1.0) - lit(6.0) * col("sum_d2").cast("double") /
          (col("n").cast(d380) * (col("n").cast(d380) * col("n").cast(d380) - 1))
            .cast("double"), 6).as("rho"))
  }

  /** Equi-width histogram with CLAMPED overflow AND underflow bins —
    * the distribution-shape staple: bucket = clamp(floor((v−lo)/width),
    * 0, nBins−1), counts exact, cumulative counts over the ≤nBins
    * result rows (the tiny window — never over data). BOTH tails clamp:
    * values ≥ lo + nBins·width land in bucket nBins−1, and values
    * BELOW `lo` land in bucket 0 — so the first bin's count includes
    * any underflow, mirroring the last bin's overflow (callers who
    * want open tails should pre-filter to [lo, lo + nBins·width)).
    * Empty buckets are emitted with n = 0 so the shape is complete.
    * Output: (bucket, lo_edge, hi_edge, n, cum_n).
    */
  def histogram(df: DataFrame, value: Column, lo: Double, width: Double,
      nBins: Int): DataFrame = {
    require(nBins >= 1 && width > 0, "nBins >= 1, width > 0")
    val spark = df.sparkSession
    val bucket = least(greatest(floor((value.cast("double") - lo) / width), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("int")
    val counts = df.select(bucket.as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val all = spark.range(nBins).select(col("id").cast("int").as("bucket"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    all.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (lit(lo) + col("bucket") * width).as("lo_edge"),
        (lit(lo) + (col("bucket") + 1) * width).as("hi_edge"),
        coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("cum_n", sum("n").over(w))
  }

  /** [[corrRegression]] per group — the per-series linear TREND table
    * ("is each series drifting, and how fast"): identical micro-unit
    * quantization and decimal moments, keyed by `groupCol`; one shuffle
    * whose width is the group count, closed-form floats once per group
    * row. Output: (group, n, corr, slope, intercept).
    */
  def corrRegressionByGroup(df: DataFrame, groupCol: String,
      x: Column, y: Column): DataFrame = {
    val d380 = DecimalType(38, 0)
    val xi = floor(x.cast("double") * 1e6).cast("long")
    val yi = floor(y.cast("double") * 1e6).cast("long")
    val agg = df.select(col(groupCol).as("group"), xi.as("xi"), yi.as("yi"))
      .filter(col("xi").isNotNull && col("yi").isNotNull)
      .groupBy("group")
      .agg(count(lit(1)).as("n"),
        sum(col("xi").cast(d380)).as("sx"),
        sum(col("yi").cast(d380)).as("sy"),
        sum(col("xi").cast(d380) * col("yi").cast(d380)).as("sxy"),
        sum(col("xi").cast(d380) * col("xi").cast(d380)).as("sxx"),
        sum(col("yi").cast(d380) * col("yi").cast(d380)).as("syy"))
    val covN = (col("n").cast(d380) * col("sxy") - col("sx") * col("sy")).cast("double")
    val varXN = (col("n").cast(d380) * col("sxx") - col("sx") * col("sx")).cast("double")
    val varYN = (col("n").cast(d380) * col("syy") - col("sy") * col("sy")).cast("double")
    agg.select(col("group"), col("n"),
      round(covN / sqrt(varXN * varYN), 6).as("corr"),
      round(covN / varXN, 6).as("slope"),
      round((col("sy").cast("double") - covN / varXN * col("sx").cast("double"))
        / col("n").cast("double") / 1e6, 6).as("intercept"))
  }

  /** Lagged cross-correlation of two integer-valued series on a shared
    * dense index — "does series A lead series B by k steps": for each
    * lag, Pearson over pairs (x_d, y_{d+lag}). The caller supplies
    * DENSE aligned series (missing steps already zero-filled) as
    * (d, x) and (d, y); counts stay integers so every moment is an
    * exact decimal sum, and the one closed-form division per lag row
    * is the only float. Each lag is one equi-join on the shifted index
    * plus a one-row aggregate; lags are a tiny driver-side loop over
    * lazy plans. Output: (lag, n, corr).
    */
  def crossCorrelation(a: DataFrame, b: DataFrame, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.size <= 32, "1-32 lags")
    val d380 = DecimalType(38, 0)
    val perLag = lags.map { lag =>
      val joined = a.select(col("d"), col("x"))
        .join(b.select((col("d") - lag).as("d"), col("y")), "d")
      val agg = joined.agg(count(lit(1)).as("n"),
        sum(col("x").cast(d380)).as("sx"), sum(col("y").cast(d380)).as("sy"),
        sum((col("x").cast(d380) * col("y").cast(d380))).as("sxy"),
        sum((col("x").cast(d380) * col("x").cast(d380))).as("sxx"),
        sum((col("y").cast(d380) * col("y").cast(d380))).as("syy"))
      val covN = (col("n").cast(d380) * col("sxy") - col("sx") * col("sy")).cast("double")
      val varX = (col("n").cast(d380) * col("sxx") - col("sx") * col("sx")).cast("double")
      val varY = (col("n").cast(d380) * col("syy") - col("sy") * col("sy")).cast("double")
      agg.select(lit(lag).as("lag"), col("n"),
        round(covN / sqrt(varX * varY), 6).as("corr"))
    }
    perLag.reduce(_ unionByName _)
  }

  /** One-pass data profile — the quality report a pipeline runs before
    * trusting a new table: per column, row count, null count, exact
    * distinct count, and numeric min/max (null for non-numeric
    * columns). ONE scan: all per-column aggregates ride a single
    * `agg` (Catalyst plans the multi-`countDistinct` via Expand — a
    * |columns|× row multiplication map-side, still one pass over
    * storage), then the one result row unpivots to per-column rows.
    * Timestamps should be projected to epoch micros by the caller —
    * the engine's cross-engine time currency.
    */
  def profile(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val (mn, mx) = f.dataType match {
        case _: NumericType => (min(c).cast("double"), max(c).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      Seq(count(c).as(s"__cnt_${f.name}"),
        countDistinct(c).as(s"__dst_${f.name}"),
        mn.as(s"__min_${f.name}"), mx.as(s"__max_${f.name}"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs.toSeq: _*)
    val perCol = fields.map { f =>
      struct(lit(f.name).as("col"), col("__n").as("n"),
        (col("__n") - col(s"__cnt_${f.name}")).as("n_nulls"),
        col(s"__dst_${f.name}").as("n_distinct"),
        col(s"__min_${f.name}").as("min_num"), col(s"__max_${f.name}").as("max_num"))
    }
    one.select(explode(array(perCol.toSeq: _*)).as("p")).select("p.*")
  }

  /** Tie-aware exact AUC (Mann–Whitney) of an INTEGER score against a
    * boolean label — the evaluation step for any ranking-style quality
    * model. Instead of the pairwise pos×neg join, scores condense to
    * distinct-score rows (one groupBy with map-side combine), a
    * cumulative window runs over THOSE (bounded by distinct scores,
    * never corpus rows), and
    * {{{ 2U = Σ_s np(s)·(2·nn_below(s) + nn(s)) }}}
    * counts wins twice and ties once — all integer, so AUC = 2U /
    * (2·np·nn) is a one-row division of exact longs. Output:
    * (n_pos, n_neg, u2, auc).
    */
  def aucByScore(df: DataFrame, score: Column, label: Column): DataFrame = {
    val d380 = DecimalType(38, 0)
    val g = df.select(score.cast("long").as("s"),
        when(label, 1L).otherwise(0L).as("p"))
      .groupBy("s").agg(sum("p").as("np"), (count(lit(1)) - sum("p")).as("nn"))
    // cumulative negatives strictly below each score: a window over the
    // DISTINCT-score table — its width is the score cardinality, which
    // a bounded integer score keeps small at any corpus size
    val w = org.apache.spark.sql.expressions.Window.orderBy("s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    g.withColumn("nn_below", coalesce(sum("nn").over(w), lit(0L)))
      .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
        sum((col("np") * (col("nn_below") * 2L + col("nn"))).cast(d380)).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2").cast("long").as("u2"),
        (col("u2").cast("double") /
          (col("n_pos") * col("n_neg") * 2L).cast("double")).as("auc"))
  }
}
