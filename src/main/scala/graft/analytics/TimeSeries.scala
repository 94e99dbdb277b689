package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Point

/** Time-series aggregation over canonical Point DataFrames — the
  * grouped/windowed analytics the reference delegates to client-side
  * pandas (SURVEY.md §2.5), provided here as engine operators.
  */
object TimeSeries {

  /** Max elements per generated grid array in [[gapFillForward]]. */
  val GridChunk: Long = 1024L

  /** Tumbling-window aggregate of one field, optionally keyed by a tag.
    * Uses Spark's `window()` so the same expression works in batch and
    * Structured Streaming (with a watermark upstream).
    */
  def tumblingAgg(points: DataFrame, every: String, fieldKey: String,
      tagKey: Option[String] = None,
      aggs: Seq[Column => Column] = Seq(c => avg(c))): DataFrame = {
    val v = element_at(col(Point.FieldsCol), fieldKey)
    val keys = Seq(window(col(Point.TimeCol), every).as("win"), col(Point.MeasurementCol)) ++
      tagKey.map(k => element_at(col(Point.TagsCol), k).as(k))
    points
      .groupBy(keys: _*)
      .agg(aggs.head(v).as("agg0"), aggs.tail.zipWithIndex.map { case (a, i) => a(v).as(s"agg${i + 1}") }: _*)
      .withColumn("window_start", col("win.start")).drop("win")
  }

  /** Moving aggregate over the last `nRows` points per (measurement,
    * tag) series, ordered by time then insertion seq.
    */
  def movingAgg(points: DataFrame, fieldKey: String, tagKey: String, nRows: Int,
      agg: Column => Column = c => avg(c)): DataFrame = {
    val w = Window
      .partitionBy(col(Point.MeasurementCol), element_at(col(Point.TagsCol), tagKey))
      .orderBy(col(Point.TimeCol), col(Point.SeqCol))
      .rowsBetween(-(nRows - 1), Window.currentRow)
    points.withColumn("moving", agg(element_at(col(Point.FieldsCol), fieldKey)).over(w))
  }

  /** Exact rolling MEDIAN over the last `nRows` rows per key — the
    * robust alternative to the moving mean (a single spike cannot drag
    * it). Mean-family moving aggregates stream through `WindowExec`
    * with O(1) state; an exact order statistic needs the frame's
    * VALUES, so this collects the ≤ `nRows`-element frame, sorts it,
    * and indexes the middle — per-row cost O(nRows·log nRows) with
    * `nRows` bounded and tiny, still one hash shuffle by key and a
    * streaming window, nothing corpus-sized buffered.
    *
    * Sorting the frame makes the median a SET function of the frame —
    * row order inside the frame cannot move it — and the even-case
    * midpoint is one IEEE add + halve: bit-identical on any engine.
    * (For percentile-of-stream at corpus scale use the sketch tier;
    * this is the exact small-window primitive.)
    *
    * NULL CONTRACT: the median is taken over the NON-NULL values of
    * the frame — `collect_list` drops nulls, and `n` is the size of
    * that null-free list, so a frame of `nRows` rows with k nulls
    * yields the median of the remaining `nRows − k` values (an
    * all-null frame yields an empty list and a null median). Engines
    * whose list aggregation KEEPS nulls (e.g. DuckDB's `list()`)
    * diverge on nullable inputs — when replaying against such an
    * oracle, pre-filter nulls on both sides or feed a non-null
    * column. The q125 gate feeds a non-null fixture by construction.
    */
  def rollingMedian(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      valueCol: String, nRows: Int): DataFrame = {
    require(nRows >= 1, "nRows >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(-(nRows - 1), Window.currentRow)
    val arr = array_sort(collect_list(col(valueCol)).over(w))
    val n = size(arr)
    val median = when(n % 2 === 1,
        element_at(arr, ((n + 1) / 2).cast("int")))
      .otherwise((element_at(arr, (n / 2).cast("int")) +
        element_at(arr, (n / 2 + 1).cast("int"))) / 2.0)
    df.withColumn("rolling_median", median)
  }

  /** Moving z-score anomaly detection — the classic TSDB alerting
    * primitive (is this point > `sigma` standard deviations from its
    * trailing window?), built ENGINE-EXACT: the window sum and
    * sum-of-squares accumulate as DECIMALS (associative, order-free —
    * a double accumulation would differ between engines by summation
    * order), convert to double only at the final closed-form
    * `(n·Σx² − (Σx)²)/n²` variance — every input to the float math is
    * an exact integerized decimal, so the z-score is bit-identical in
    * any engine, and the anomaly set replays exactly.
    *
    * Scale shape: one key shuffle (the same gaps-and-islands contract
    * as sessionize); the frame is row-bounded so state per key is
    * O(window). Ties inside the frame order break on `tieCol`.
    */
  def movingZScore(df: DataFrame, keyCol: String, orderCol: String, tieCol: String,
      valueCol: String, nRows: Int, sigma: Double): DataFrame = {
    require(nRows >= 2, "z-score needs a window of at least 2 rows")
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol), col(tieCol))
      .rowsBetween(-(nRows - 1), Window.currentRow)
    val vDec = col(valueCol).cast("decimal(18,2)")
    val v2Dec = (vDec * vDec).cast("decimal(30,4)")
    val n = count(lit(1)).over(w).cast("double")
    val s1 = sum(vDec).over(w).cast("double")
    val s2 = sum(v2Dec).over(w).cast("double")
    val variance = (n * s2 - s1 * s1) / (n * n)
    val z = (vDec.cast("double") - s1 / n) / sqrt(variance)
    df.select(col(keyCol), col(orderCol), col(tieCol), vDec.cast("double").as("v"),
        n.as("wn"), z.as("z"))
      .filter(col("wn") >= nRows && abs(col("z")) > sigma)
      .select(col(keyCol), col(orderCol), col(tieCol), col("v"), round(col("z"), 6).as("z"))
  }

  /** Truncated exponentially-weighted moving average — the smoothing
    * primitive behind TSDB dashboards and alert baselines:
    * {{{ y_i = α · Σ_{j<W} (1−α)^j · x_{i−j} }}}
    * The W decay powers are SCALA-SIDE literals (serialized as
    * round-trippable shortest-repr doubles) and the sum is a fixed
    * left-associated chain, so the expression tree — and therefore the
    * IEEE result — is identical in any engine; no recursion, no pow()
    * in the plan (libm pow is not correctly rounded and differs across
    * engines). Rows with fewer than W antecedents are dropped rather
    * than renormalized. One key shuffle, O(W) lags per row.
    */
  def ewma(df: DataFrame, keyCol: String, orderCol: String, tieCol: String,
      valueCol: String, alpha: Double, terms: Int): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, "alpha in (0, 1)")
    require(terms >= 1, "terms >= 1")
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol), col(tieCol))
    val d = 1.0 - alpha
    val weighted = (0 until terms).map { j =>
      lit(math.pow(d, j)) * lag(col(valueCol).cast("double"), j).over(w)
    }.reduce(_ + _)
    df.select(col(keyCol), col(orderCol), col(tieCol),
        (lit(alpha) * weighted).as("ewma"),
        row_number().over(w).as("__rn"))
      .filter(col("__rn") >= terms)
      .drop("__rn")
  }

  /** Per-series rate of change — the TSDB `DERIVATIVE` op (counter
    * rates, throughput from totals): (v − lag(v)) / Δt-seconds per
    * consecutive pair under (`orderCol`, `tieCol`) order. One hash
    * shuffle by key, a streaming lag window. First row per key and
    * zero-Δt ties yield null (a 0-denominator is reported as missing,
    * not ±Inf). Both engines evaluate the identical IEEE expression on
    * identical inputs — bit-replayable with no rounding.
    */
  def derivative(df: DataFrame, keyCol: String, tsUsCol: String, tieCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(tieCol))
    val dv = col(valueCol) - lag(col(valueCol), 1).over(w)
    val dtUs = col(tsUsCol) - lag(col(tsUsCol), 1).over(w)
    df.withColumn("rate_per_s",
      when(dtUs > 0L, dv / (dtUs.cast("double") / 1e6)))
  }

  /** Per-series time-weighted average over tumbling windows — the TSDB
    * `INTEGRAL`/TWA op (duty cycles, mean-state-over-time, where the
    * plain AVG over-weights bursts). Last-observation-carried-forward
    * weighting WITHIN the window: each point holds its value until the
    * next point of the same (key, window); the window's last point
    * carries no weight (no successor inside it — stated, deterministic
    * semantics rather than a hidden extrapolation).
    *
    * Exactness: values quantize once to micro-units, each weight is an
    * integer microsecond span, the per-window Σ vµ·Δtµs and Σ Δtµs are
    * DECIMAL sums (order-free), and ONE double division per window row
    * produces the average. Output: (key, window_start_us, n_points,
    * twa — null for single-point windows with zero carried time).
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsUsCol: String, tieCol: String,
      valueCol: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs > 0")
    val d380 = org.apache.spark.sql.types.DecimalType(38, 0)
    // integer window floor: ts − (ts mod w) — Column `/` is double
    // division, never use it on the bucket math
    val winStart = col(tsUsCol).cast("long") - pmod(col(tsUsCol).cast("long"), lit(windowUs))
    val w = Window.partitionBy(col(keyCol), col("__win"))
      .orderBy(col(tsUsCol), col(tieCol))
    val vMicro = floor(col(valueCol).cast("double") * 1e6).cast("long")
    val dtUs = lead(col(tsUsCol), 1).over(w) - col(tsUsCol)
    df.withColumn("__win", winStart)
      .select(col(keyCol), col("__win"),
        vMicro.as("__v"), coalesce(dtUs, lit(0L)).as("__dt"))
      .groupBy(col(keyCol), col("__win").as("window_start_us"))
      .agg(count(lit(1)).as("n_points"),
        sum((col("__v") * col("__dt")).cast(d380)).as("__vdt"),
        sum(col("__dt").cast(d380)).as("__t"))
      .select(col(keyCol), col("window_start_us"), col("n_points"),
        when(col("__t") > 0,
          round(col("__vdt").cast("double") / col("__t").cast("double") / 1e6, 6))
          .as("twa"))
  }

  /** Downsample: last point per tumbling window per series — the
    * classic TSDB retention/rollup primitive. max_by keeps it a single
    * hash aggregate (no sort, no window).
    */
  def downsampleLast(points: DataFrame, every: String, fieldKey: String): DataFrame =
    points
      .groupBy(window(col(Point.TimeCol), every).as("win"), col(Point.MeasurementCol))
      .agg(max_by(element_at(col(Point.FieldsCol), fieldKey),
        struct(col(Point.TimeCol), col(Point.SeqCol))).as("last_value"))
      .withColumn("window_start", col("win.start")).drop("win")

  /** Gap-fill + forward-fill: resample each key's series onto a regular
    * `stepSeconds` grid between its own min and max bucket, carrying the
    * last observed value across empty buckets.
    *
    * Plan shape (scale audit): one aggregate to bucket the raw rows
    * (map-side partial), one per-key grid generated with
    * `sequence()`+explode (rows ∝ output grid, not input), one shuffle
    * to join observations onto the grid, and one in-partition window
    * for the forward fill — no driver-side loops, every stage keyed by
    * the series key so 100k series parallelize across the cluster.
    */
  def gapFillForward(df: DataFrame, keyCol: String, timeCol: String,
      valueCol: String, stepSeconds: Long): DataFrame = {
    val step = lit(stepSeconds)
    // floor division (cast truncates toward zero — wrong for pre-1970 epochs)
    val bucket = floor(unix_timestamp(col(timeCol)) / step).cast("long") * step
    // last observation per (key, bucket); ties on the timestamp break
    // deterministically by value so the result is run-stable
    val obs = df
      .groupBy(col(keyCol).as("key"), bucket.as("bucket"))
      .agg(max_by(col(valueCol), struct(col(timeCol), col(valueCol))).as("v"))
    // Per-key regular grid spanning that key's observed range.
    // Two-level generation bounds array sizes: a single
    // sequence(lo, hi, step) materializes the key's ENTIRE grid as one
    // array in one row (a year at 1 s step = 31M elements — an
    // executor-killing object, and >2^31 overflows outright). Chunked,
    // no intermediate array exceeds GridChunk elements while the
    // exploded row count is identical.
    val chunk = lit(stepSeconds * TimeSeries.GridChunk)
    val grid = obs.groupBy("key")
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(col("key"), col("hi"),
        explode(sequence(col("lo"), col("hi"), chunk)).as("cstart"))
      .select(col("key"),
        explode(sequence(col("cstart"),
          least(col("cstart") + chunk - step, col("hi")), step)).as("bucket"))
    val w = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "bucket"), "left")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("key"), timestamp_seconds(col("bucket")).as("bucket_time"),
        col("v").as("observed"), col("filled"))
  }

  /** CUSUM changepoint detection, integer-exact: for each series, the
    * point where the cumulative deviation from the series mean peaks —
    * the classic level-shift detector. The float-free trick: instead of
    * Σᵢ(xᵢ − μ) (a float mean in every term), scale by n —
    * {{{ C'ₖ = n·Pₖ − k·S,   Pₖ = Σ_{i≤k} xµᵢ,  S = P_n }}}
    * which is n·Σ(xᵢ−μ) exactly, in micro-unit integers end to end.
    * argmax |C'| = argmax |CUSUM|. Running sums are sequential window
    * arithmetic (identical order on any engine); sums ride DECIMAL.
    * One hash shuffle by key + a streaming window + a per-key argmax.
    * Output: (key, peak_ts_us, peak_seq = k at the peak, cusum_scaled)
    * with ties broken toward the earliest point.
    */
  def cusumChangepoint(df: DataFrame, keyCol: String, tsUsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val d380 = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val vMicro = floor(col(valueCol).cast("double") * 1e6).cast("long").cast(d380)
    val scored = df
      .withColumn("__p", sum(vMicro).over(run))
      .withColumn("__k", count(lit(1)).over(run))
      .withColumn("__s", sum(vMicro).over(all))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__c", col("__n") * col("__p") - col("__k") * col("__s"))
    scored
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(
          abs(col("__c")).desc, col(tsUsCol), col(tieCol))))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col(tsUsCol).cast("long").as("peak_ts_us"),
        col("__k").as("peak_seq"), col("__c").cast("long").as("cusum_scaled"))
  }

  /** [[gapFillForward]]'s LINEAR sibling — the TSDB `fill(linear)`:
    * missing grid points interpolate between the surrounding
    * observations instead of holding the last one. Same per-key grid
    * and join; two extra window passes carry (previous, next)
    * observation value+bucket, and the interpolation is one fixed IEEE
    * expression — identical on any engine evaluating the same inputs,
    * no rounding needed. The grid spans each key's OBSERVED range, so
    * every grid point has both neighbors by construction (no
    * extrapolation branch exists to diverge on). Output:
    * (key, bucket_us, observed, filled).
    */
  def gapFillLinear(df: DataFrame, keyCol: String, timeCol: String,
      valueCol: String, stepSeconds: Long): DataFrame = {
    val step = lit(stepSeconds)
    val bucket = floor(unix_timestamp(col(timeCol)) / step).cast("long") * step
    val obs = df
      .groupBy(col(keyCol).as("key"), bucket.as("bucket"))
      .agg(max_by(col(valueCol), struct(col(timeCol), col(valueCol))).as("v"))
    val chunk = lit(stepSeconds * TimeSeries.GridChunk)
    val grid = obs.groupBy("key")
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(col("key"), col("hi"),
        explode(sequence(col("lo"), col("hi"), chunk)).as("cstart"))
      .select(col("key"),
        explode(sequence(col("cstart"),
          least(col("cstart") + chunk - step, col("hi")), step)).as("bucket"))
    val wb = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("v").isNotNull, col("bucket"))
    grid.join(obs, Seq("key", "bucket"), "left")
      .withColumn("__pv", last(col("v"), ignoreNulls = true).over(wb))
      .withColumn("__pb", last(obsBucket, ignoreNulls = true).over(wb))
      .withColumn("__nv", first(col("v"), ignoreNulls = true).over(wf))
      .withColumn("__nb", first(obsBucket, ignoreNulls = true).over(wf))
      .select(col("key"), (col("bucket") * 1000000L).as("bucket_us"),
        col("v").as("observed"),
        when(col("v").isNotNull, col("v"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            ((col("bucket") - col("__pb")).cast("double") /
              (col("__nb") - col("__pb")).cast("double")))
          .as("filled"))
  }
}
