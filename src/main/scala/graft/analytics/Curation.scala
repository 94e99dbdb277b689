package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs after dedup:
  * deterministic sampling, per-source quota capping, and sessionization.
  *
  * All are single-shuffle declarative transforms. Sampling is HASH
  * based, not `rand()`: the same row lands in the same split on every
  * run, on any cluster size, with no seed-plumbing — the standard way
  * production pipelines make train/eval splits reproducible (and the
  * only way an external engine can replay the split bit-for-bit).
  * Hashing is md5-derived like the rest of the library, so the DuckDB
  * oracle verifies membership exactly.
  */
object Curation {

  /** Uniform bucket in [0, buckets) from the md5 of `salt:id` — a pure
    * projection (no shuffle, no state). Different salts give independent
    * splits; the first 8 hex chars (32 bits) keep the value exact in a
    * signed 64-bit int in every engine.
    */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(lit(s"$salt:"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep ~pct% of rows, deterministically. Filter is a scan-level
    * predicate: at 100 TB this is a full scan, nothing more.
    */
  def hashSample(df: DataFrame, idCol: String, pct: Int, salt: String = "sample"): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct in [0, 100]")
    df.filter(hashBucket(col(idCol), salt, 100) < pct)
  }

  /** Weighted source-mixture sampling — the corpus-mixing step of a
    * training-data pipeline: keep each row with the RATE its source was
    * assigned (weights in [0,1]; unlisted sources keep `defaultWeight`).
    * Deterministic per (salt, id) via per-mille hash buckets, so the
    * mixture reproduces exactly across runs and engines; the retention
    * test is a pure scan predicate — at 100 TB this is a full scan,
    * nothing more. Pair with [[stratumCap]] when a source needs a hard
    * row CAP rather than a rate.
    */
  def weightedMixture(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = "mixture"): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(w => w >= 0.0 && w <= 1.0),
      "mixture weights must be rates in [0, 1]")
    val bucket = hashBucket(col(idCol), salt, 1000)
    val rate = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    // round, don't truncate: 0.3*1000 is 299.999… in binary and Spark's
    // cast truncates while other engines round — rounding both sides
    // keeps the per-mille threshold integer-exact for any weight
    df.filter(bucket < round(rate * lit(1000.0)).cast("long"))
  }

  /** Disjoint train/validation/test split by hash bucket — one scan,
    * three filters, no shuffle, stable across runs.
    */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int, validPct: Int,
      salt: String = "split"): (DataFrame, DataFrame, DataFrame) = {
    require(trainPct + validPct <= 100, "train + valid must be <= 100")
    val b = hashBucket(col(idCol), salt, 100)
    (df.filter(b < trainPct),
     df.filter(b >= trainPct && b < trainPct + validPct),
     df.filter(b >= trainPct + validPct))
  }

  /** Per-stratum quota: keep the top `k` rows of each stratum by
    * `orderCols` (e.g. cap each domain/source at k docs, best-quality
    * first — the standard guard against one crawl domain dominating a
    * corpus). One hash-partition shuffle on the stratum + in-partition
    * sort; rank-k early-stops per group. A pathologically hot stratum
    * (one domain = half the corpus) is the documented skew case — cap
    * it upstream with [[hashSample]] or salt via [[Skew]].
    */
  def stratumCap(df: DataFrame, stratumCols: Seq[String], k: Int,
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(stratumCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** Deterministic stratified sample: `k` rows per stratum, chosen by
    * md5-hash order — the reproducible replacement for per-stratum
    * reservoir sampling (same rows every run, any cluster layout).
    */
  def stratifiedSample(df: DataFrame, stratumCols: Seq[String], k: Int,
      idCol: String, salt: String = "strat"): DataFrame =
    stratumCap(df, stratumCols, k,
      Seq(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))), col(idCol)))

  /** Gap-based sessionization: rows of one `keyCol` whose successive
    * `tsCol` (epoch micros) differ by more than `gapUs` start a new
    * session; `session_seq` numbers sessions per key from 1. Window
    * tie-break on `tieCol` keeps lag() deterministic under equal
    * timestamps. Single shuffle on the key; session assignment and the
    * cumulative-sum numbering happen inside one partition-local sort —
    * the classic "gaps and islands" plan, skew-tolerant for any key
    * whose per-key history fits a partition.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val brk = when(prev.isNull || col(tsCol) - prev > gapUs, 1).otherwise(0)
    df.withColumn("session_seq",
      sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session-level rollup: one row per (key, session) with event count
    * and [start, end] micros.
    */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapUs: Long): DataFrame =
    sessionize(df, keyCol, tsCol, tieCol, gapUs)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_us"),
        max(col(tsCol)).as("end_us"))

  /** Ordered funnel over sessions: how many sessions reach step 1,
    * then step 2 STRICTLY AFTER their step-1 time, and so on — the
    * conversion question behind every event pipeline. Subsequence
    * semantics, first-match: s₁ = min time of steps(0); sₖ = min time
    * of steps(k−1) with t > sₖ₋₁ (strict — a simultaneous event does
    * not advance the funnel; deterministic, no tie coin-flips).
    *
    * One aggregation pass PER STEP over the sessionized events (k
    * passes for a k-step funnel, each a session-key groupBy with the
    * prior stage times broadcast back via an equi-join) — never a
    * per-session collect or UDF ordering. Output one row:
    * (n_sessions, reached_1..reached_k).
    */
  def sessionFunnel(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      typeCol: String, gapUs: Long, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8, "funnel wants 1-8 steps")
    val sess = sessionize(df, keyCol, tsCol, tieCol, gapUs)
      .select(col(keyCol).as("__k"), col("session_seq").as("__s"),
        col(typeCol).as("__t"), col(tsCol).cast("long").as("__ts"))
    var acc = sess.groupBy("__k", "__s")
      .agg(min(when(col("__t") === steps.head, col("__ts"))).as("s1"))
    for (k <- 2 to steps.size) {
      val carried = (1 until k).map(i => first(col(s"s$i")).as(s"s$i"))
      acc = sess.join(acc, Seq("__k", "__s"))
        .groupBy("__k", "__s")
        .agg(carried.head, carried.tail :+
          min(when(col("__t") === steps(k - 1) && col("__ts") > col(s"s${k - 1}"),
            col("__ts"))).as(s"s$k"): _*)
    }
    acc.agg(count(lit(1)).as("n_sessions"),
      steps.indices.map(i =>
        sum(when(col(s"s${i + 1}").isNotNull, 1L).otherwise(0L)).as(s"reached_${i + 1}")): _*)
  }

  /** Retention cohorts: users bucketed by their FIRST active day, then
    * distinct-user counts per (cohort day, day offset) — the retention
    * triangle. Day indices are integer floors of epoch micros; all
    * counts exact. Two aggregations and an equi-join on the user key;
    * the (user, day) distinct condenses map-side. Output:
    * (cohort_day, day_offset, n_users).
    */
  def retentionCohorts(df: DataFrame, userCol: String, tsUsCol: String,
      maxOffsetDays: Int = 7, dayUs: Long = 86400000000L): DataFrame = {
    val ts = col(tsUsCol).cast("long")
    // integer day floor: (ts − ts mod day) is an exact multiple of day,
    // so the double division below is exact (quotient ≪ 2^53)
    val day = ((ts - pmod(ts, lit(dayUs))) / lit(dayUs.toDouble)).cast("long")
    val userDays = df.select(col(userCol).as("__u"), day.as("__d")).distinct()
    val cohorts = userDays.groupBy("__u").agg(min("__d").as("cohort_day"))
    userDays.join(cohorts, "__u")
      .withColumn("day_offset", col("__d") - col("cohort_day"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("__u").as("n_users"))
  }

  /** Greedy token-budget selection: walk the corpus in `order` (e.g.
    * quality desc) and keep rows while the running `weightCol` total
    * stays ≤ `budget` — "fill the training budget with the best docs",
    * the data-selection step between scoring and training.
    *
    * A naive global running sum is a bare `Window.orderBy` — an
    * Exchange SinglePartition that serializes the corpus through one
    * task. Here the cutoff is found the way [[Ranking]] computes global
    * ranks: range-partition on `order` (one shuffle), aggregate
    * per-partition weight totals (numPartitions rows, reusing the same
    * exchange), prefix-sum those into partition offsets, and decide
    * WHOLE partitions by metadata — a partition whose offset+total fits
    * the budget is kept outright, one past the budget is dropped
    * outright. Only the single partition straddling the boundary pays a
    * per-row running sum, over its own rows alone. At 100 TB that is:
    * every partition one broadcast-join filter, plus one partition's
    * local window.
    *
    * `order` must be a total order (tie-break on a unique key) and
    * `weightCol` non-negative — same contract as any deterministic
    * greedy selection. Returns the input columns unchanged.
    */
  def budgetSelect(df: DataFrame, order: Seq[Column], weightCol: String,
      budget: Long, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, order: _*)
    val byPid = Window.orderBy("__pid")
    val offsets = ranged
      .groupBy(spark_partition_id().as("__pid")).agg(sum(col(weightCol)).as("__wtot"))
      .withColumn("__woff", coalesce(
        sum("__wtot").over(byPid.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__woff", "__wtot")
    val tagged = ranged.withColumn("__pid", spark_partition_id())
      .join(broadcast(offsets), "__pid")
    val keepWhole = tagged.filter(col("__woff") + col("__wtot") <= budget)
    val w = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val straddleKept = tagged
      .filter(col("__woff") < budget && col("__woff") + col("__wtot") > budget)
      .withColumn("__cum", col("__woff") + sum(col(weightCol)).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
    val cols = df.columns.map(col).toSeq
    keepWhole.select(cols: _*).unionAll(straddleKept.select(cols: _*))
  }

  /** Distributed running sum over a TOTAL order — the q94 partition-
    * offset machinery generalized to materialize the cumulative weight
    * for EVERY row (budgetSelect can skip whole partitions; samplers
    * need each row's cum): range-partition on the order, per-partition
    * window in parallel, per-partition offsets broadcast back. No
    * single-partition pass over the data at any size.
    */
  private def withRunningSum(df: DataFrame, order: Seq[Column], weightCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, order: _*)
    val byPid = Window.orderBy("__pid")
    val offsets = ranged
      .groupBy(spark_partition_id().as("__pid")).agg(sum(col(weightCol)).as("__wtot"))
      .withColumn("__woff", coalesce(
        sum("__wtot").over(byPid.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__woff")
    val w = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.withColumn("__pid", spark_partition_id())
      .join(broadcast(offsets), "__pid")
      .withColumn("__cum", col("__woff") + sum(col(weightCol)).over(w))
      .drop("__pid", "__woff")
  }

  /** Weighted systematic sampling: walk the corpus in a fixed total
    * order accumulating integer weights, pick every row where the
    * running sum crosses a multiple of `step` — selection probability
    * proportional to weight (a doc twice as long is twice as likely to
    * straddle a boundary), expected picks = Σw / step, and everything
    * is integer arithmetic over a total order: deterministic,
    * engine-exact, no float keys, no rejection loop. The
    * length-proportional sampler a curation pipeline wants when
    * "sample 1M tokens" matters more than "sample 1M documents".
    * Weights must be non-negative (zero-weight rows are never picked).
    */
  def weightedSystematicSample(df: DataFrame, order: Seq[Column], weightCol: String,
      step: Long): DataFrame = {
    require(step >= 1, "step >= 1")
    withRunningSum(df, order, weightCol)
      .filter(expr(s"__cum div $step") > expr(s"(__cum - $weightCol) div $step"))
      .drop("__cum")
  }

  /** Sliding token-window chunking (RAG / context-window prep): cut each
    * doc's whitespace tokens into windows of `chunkSize` tokens starting
    * every `stride` tokens (stride < chunkSize ⇒ overlapping windows,
    * the standard retrieval-chunking shape; stride = chunkSize ⇒
    * disjoint blocks). One row per (doc, chunk) with the chunk's token
    * count and content md5 — the join currency for block-level dedup
    * and embedding pipelines, engine-portable for exact replay.
    *
    * Start positions are `0, stride, 2·stride, …` while < the doc's
    * token count; the final windows truncate at the doc end (no
    * padding). Empty docs produce no chunks. Pure per-row explode —
    * scan-parallel, no shuffle; output size is rows × (len/stride).
    */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      "want 1 <= stride <= chunkSize")
    val toks = TextAnalysis.tokens(col(textCol))
    val starts = when(size(toks) === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), size(toks) - 1, lit(stride)))
    df.select(col(idCol), toks.as("__toks"), posexplode(starts).as(Seq("chunk_id", "__start")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        least(lit(chunkSize), size(col("__toks")) - col("__start")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(chunkSize))))
          .as("chunk_md5"))
  }

  /** Sequence packing (training-batch prep): within each shard, lay the
    * docs end-to-end in `orderCol` order and cut the stream into chunks
    * of `budget` weight (tokens); a doc's `chunk_id` is the chunk its
    * START lands in — the standard concat-then-chunk packing, where a
    * doc may straddle a boundary and chunks are dense (no padding-only
    * bins). Shard-parallel by construction: packing is per partition
    * key (source, shard hash, …), which is how distributed pipelines
    * pack — one global stream would serialize on a single task.
    */
  def packChunks(df: DataFrame, shardCols: Seq[String], orderCol: String,
      weightCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("chunk_id",
      floor((sum(col(weightCol)).over(w) - col(weightCol)) / lit(budget)))
  }
}
