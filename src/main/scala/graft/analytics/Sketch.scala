package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV buffer: at most k smallest DISTINCT hash values seen, unordered
  * until `finish`.
  */
final case class KmvBuf(items: Seq[Long])

/** Bounded min-k-distinct as a real AGGREGATE — the KMV (k minimum
  * values) cardinality sketch's core op. Map-side partials keep ≤ k
  * distinct hashes per input partition, so the shuffle carries
  * k·partitions longs for ANY input size — cardinality estimation in
  * one pass with no corpus-wide DISTINCT shuffle. The buffer is a
  * SET-function of the input (k smallest distinct values), so the
  * result is independent of row order and partitioning — exactly
  * reproducible anywhere, unlike HLL sketches whose estimates are
  * implementation-defined.
  *
  * Buffer ops are O(k) per row (k is small: 256–4096); the `contains`
  * probe short-circuits duplicates, which dominate once the sketch
  * saturates on heavy-hitter-skewed inputs.
  */
/** One (row-key hash, value) observation for [[BottomKByHash]]. */
final case class HashVal(h: Long, v: Double)

/** Buffer/result of [[BottomKByHash]]: ≤ k observations with the
  * smallest distinct hashes, hash-sorted at finish.
  */
final case class BkBuf(items: Seq[HashVal])

/** Bottom-k-by-hash VALUE sample as an aggregate — the grouped form of
  * the [[Sketch.bottomKQuantiles]] sampling primitive: per group, keep
  * the `k` observations whose (unique) row-key hashes are smallest.
  * A set function of the group's key set (order/partition free),
  * losslessly mergeable, map-side bounded at k per partition — the
  * "deterministic uniform sample per key" building block for per-key
  * quantiles/means at any scale. Hash ties (only possible if row keys
  * collide) keep the first-seen value; with 60-bit key hashes that is
  * a non-event.
  */
final class BottomKByHash(k: Int) extends Aggregator[HashVal, BkBuf, BkBuf]
    with Serializable {
  require(k >= 1, "bottom-k needs k >= 1")

  override def zero: BkBuf = BkBuf(Nil)

  override def reduce(buf: BkBuf, x: HashVal): BkBuf =
    if (buf.items.exists(_.h == x.h)) buf
    else if (buf.items.size < k) BkBuf(x +: buf.items)
    else {
      val mx = buf.items.maxBy(_.h)
      if (x.h < mx.h) BkBuf(x +: buf.items.filterNot(_.h == mx.h)) else buf
    }

  override def merge(a: BkBuf, b: BkBuf): BkBuf =
    BkBuf((a.items ++ b.items).distinctBy(_.h).sortBy(_.h).take(k))

  override def finish(buf: BkBuf): BkBuf = BkBuf(buf.items.sortBy(_.h))

  override def bufferEncoder: org.apache.spark.sql.Encoder[BkBuf] =
    Encoders.product[BkBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[BkBuf] =
    Encoders.product[BkBuf]
}

/** One priority-sample entry: md5-derived priority, row id (the total
  * tie-break), weight.
  */
final case class PriVal(pri: Double, id: Long, wt: Double)
final case class PriBuf(items: Seq[PriVal])

/** Top-(k+1)-by-priority sample state — the STREAMED form of
  * [[Sketch.prioritySampleSum]]'s TakeOrdered(k+1): keeps the k+1
  * entries highest by (priority desc, id asc), deduped by id (an
  * at-least-once source redelivering a row must not re-sample it), so
  * a Complete-mode stream lands SAMPLE-IDENTICAL to the batch sketch.
  * State is ≤ k+1 small rows per group.
  */
final class TopKByPriority(kPlus1: Int) extends Aggregator[PriVal, PriBuf, PriBuf]
    with Serializable {
  require(kPlus1 >= 2, "top-k-by-priority needs k+1 >= 2")
  private val ord: Ordering[PriVal] = Ordering.by(p => (-p.pri, p.id))

  override def zero: PriBuf = PriBuf(Nil)

  override def reduce(buf: PriBuf, x: PriVal): PriBuf =
    if (buf.items.exists(_.id == x.id)) buf
    else if (buf.items.size < kPlus1) PriBuf(x +: buf.items)
    else {
      val worst = buf.items.max(ord)
      if (ord.lt(x, worst)) PriBuf(x +: buf.items.filterNot(_.id == worst.id))
      else buf
    }

  override def merge(a: PriBuf, b: PriBuf): PriBuf =
    PriBuf((a.items ++ b.items).distinctBy(_.id).sorted(ord).take(kPlus1))

  override def finish(buf: PriBuf): PriBuf = PriBuf(buf.items.sorted(ord))

  override def bufferEncoder: org.apache.spark.sql.Encoder[PriBuf] =
    Encoders.product[PriBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[PriBuf] =
    Encoders.product[PriBuf]
}

final class MinKDistinct(k: Int) extends Aggregator[Long, KmvBuf, KmvBuf]
    with Serializable {
  require(k >= 1, "kmv needs k >= 1")

  override def zero: KmvBuf = KmvBuf(Nil)

  override def reduce(buf: KmvBuf, x: Long): KmvBuf =
    if (buf.items.contains(x)) buf
    else if (buf.items.size < k) KmvBuf(x +: buf.items)
    else {
      val mx = buf.items.max
      if (x < mx) KmvBuf(x +: buf.items.filterNot(_ == mx)) else buf
    }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    KmvBuf((a.items ++ b.items).distinct.sorted.take(k))

  override def finish(buf: KmvBuf): KmvBuf = KmvBuf(buf.items.sorted)

  override def bufferEncoder: org.apache.spark.sql.Encoder[KmvBuf] =
    Encoders.product[KmvBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[KmvBuf] =
    Encoders.product[KmvBuf]
}

/** Distributed cardinality sketching. The classic use at corpus scale:
  * "how many distinct (user, day) pairs / URLs / shingles are there"
  * without paying a corpus-wide distinct — the KMV estimate reads off
  * k smallest hashes, and sketches of disjoint scans merge losslessly
  * (the union's k smallest distinct hashes are computable from the
  * parts' sketches), so per-partition/per-day sketches roll up.
  *
  * Hashing is md5-derived 32-bit like the rest of the library, so the
  * whole sketch — k minimums included — is exactly reproducible by any
  * md5-capable engine, estimate and all: the DuckDB oracle replays it
  * bit-for-bit. (Estimator: with R_k = kth smallest hash / 2^32 the
  * uniform order-statistic estimate is (k−1)/R_k; below saturation the
  * sketch holds every distinct value, so the count is exact.)
  */
object Sketch {

  /** 32-bit md5-derived hash of `value` as a long in [0, 2^32). */
  def hash32(value: Column, salt: String = "kmv"): Column =
    conv(substring(md5(concat(lit(s"$salt:"), value.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** One-row distinct-count estimate of `value` over `df`:
    * (k_used, kth_hash, est_distinct). One pass, k·partitions longs on
    * the shuffle, never a DISTINCT over the input.
    */
  def kmvDistinct(df: DataFrame, value: Column, k: Int, salt: String = "kmv"): DataFrame = {
    val sk = kmvSketch(df, value, k, salt)
    sk.select(
        size(col("sketch.items")).cast("long").as("k_used"),
        // try_: an empty input has no k-th hash — null, not an ANSI
        // array-index error (k_used = 0 routes the exact branch anyway)
        try_element_at(col("sketch.items"), lit(-1)).as("kth_hash"))
      .select(col("k_used"), col("kth_hash"),
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
            col("kth_hash").cast("double"))
          .as("est_distinct"))
  }

  /** The raw sketch (one row, `sketch.items` = sorted k smallest
    * distinct hashes) — keep per-slice sketches and union them later
    * via [[mergeSketches]].
    */
  def kmvSketch(df: DataFrame, value: Column, k: Int, salt: String = "kmv"): DataFrame = {
    val agg = udaf(new MinKDistinct(k))
    df.select(hash32(value, salt).as("h")).agg(agg(col("h")).as("sketch"))
  }

  /** KMV SET-OPERATION estimates over two coordinated sketches — the
    * theta-sketch algebra tier: because both sides hash with the SAME
    * salt, their bottom-k samples are coordinated, and the k smallest
    * hashes of the UNION give
    *
    *   est_union        = (k−1)·2^32 / R_k          (usual KMV),
    *   jaccard ρ        = |{h ∈ U_k : h ∈ A ∧ h ∈ B}| / |U_k|,
    *   est_intersection = ρ · est_union
    *
    * — "how many distinct users did BOTH" answered from two KB-sized
    * sketches, no corpus DISTINCT, no join of the raw sides. Below
    * saturation everything is exact. Deterministic like the rest of
    * the sketch tier: md5 hashes, set logic, one closed-form float —
    * the oracle replays sample AND estimates. Output one row:
    * (k_union, kth_hash, n_common, est_union, est_intersection,
    * jaccard).
    */
  def kmvSetOps(dfA: DataFrame, valueA: Column, dfB: DataFrame, valueB: Column,
      k: Int, salt: String = "kmv"): DataFrame = {
    require(k >= 2, "k >= 2")
    val a = kmvSketch(dfA, valueA, k, salt).select(col("sketch.items").as("ia"))
    val b = kmvSketch(dfB, valueB, k, salt).select(col("sketch.items").as("ib"))
    val estU = when(col("k_union") < k, col("k_union").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
        col("kth_hash").cast("double"))
    a.crossJoin(b)
      .select(col("ia"), col("ib"),
        slice(array_sort(array_distinct(concat(col("ia"), col("ib")))), 1, k).as("u"))
      .select(
        size(col("u")).cast("long").as("k_union"),
        // try_: an empty union (both sides empty) has no k-th hash —
        // null, not an ANSI array-index error
        try_element_at(col("u"), lit(-1)).as("kth_hash"),
        size(filter(col("u"), h =>
          array_contains(col("ia"), h) && array_contains(col("ib"), h)))
          .cast("long").as("n_common"))
      .select(col("k_union"), col("kth_hash"), col("n_common"),
        estU.as("est_union"),
        // guard the empty-union case: 0/0 would be NaN, and an empty
        // union genuinely has zero intersection and zero similarity
        when(col("k_union") === 0L, lit(0.0))
          .otherwise(col("n_common").cast("double") / col("k_union").cast("double") * estU)
          .as("est_intersection"),
        when(col("k_union") === 0L, lit(0.0))
          .otherwise(col("n_common").cast("double") / col("k_union").cast("double"))
          .as("jaccard"))
  }

  /** PRIORITY SAMPLING (Duffield–Lund–Thorup) — the subset-SUM
    * sketch: a k-row weighted sample from which ANY subset's total
    * weight is estimated unbiasedly,
    *
    *   u_i   = (hash32(id)+1) / 2^32          (md5-derived uniform),
    *   pri_i = w_i / u_i,
    *   S     = top-k by priority, τ = (k+1)-th priority (0 if n ≤ k),
    *   est   = Σ_{i∈S} max(w_i, τ)            (exact when n ≤ k).
    *
    * "Total tokens in this slice" answerable from k rows instead of a
    * corpus scan. Determinism contract like the rest of the sketch
    * tier: the uniform is integer-derived, the top-k cut totally
    * ordered by (priority desc, id), and the estimate sums INTEGER
    * micro-units (⌊max(w,τ)·10^6⌋) — so sample AND estimate replay
    * exactly in any md5-capable engine, no float-summation-order
    * divergence. Priorities are w/u with u as small as 2^-32, so τ can
    * exceed what micro-units represent in a signed 64-bit long; both
    * τ and max(w,τ) are clamped at [[MaxMicroRepresentable]] (9·10^12,
    * i.e. 9·10^18 micro-units < Long.Max) BEFORE the ·10^6 — the same
    * `least` appears in the oracle SQL, so non-ANSI Spark clamping vs
    * DuckDB overflow can never diverge. Plan shape: pure scan →
    * TakeOrdered(k+1) (bounded per-partition heaps, never a full
    * sort) → one k-row aggregate.
    * Output one row: (k_sample, tau_micro, est_total_micro).
    */
  /** Largest value the micro-unit (·10^6, floor, cast long) contract can
    * carry: 9·10^12 → 9·10^18 micro-units, exactly representable as a
    * double and below Long.MaxValue. Values above it clamp identically
    * in the engine and the oracle.
    */
  val MaxMicroRepresentable: Double = 9.0e12

  private def microClamp(v: Column): Column =
    floor(least(v, lit(MaxMicroRepresentable)) * 1e6).cast("long")

  def prioritySampleSum(df: DataFrame, idCol: String, weight: Column, k: Int,
      salt: String = "ps"): DataFrame = {
    require(k >= 1, "k >= 1")
    val prid = df.select(col(idCol).cast("long").as("id"),
        weight.cast("double").as("wt"),
        ((hash32(col(idCol), salt) + 1L) / lit(4294967296.0)).as("u"))
      .select(col("id"), col("wt"), (col("wt") / col("u")).as("pri"))
    val topK1 = prid.orderBy(col("pri").desc, col("id")).limit(k + 1)
      .agg(count(lit(1)).as("n_top"), min("pri").as("min_pri"))
      .select(when(col("n_top") === (k + 1), col("min_pri"))
        .otherwise(lit(0.0)).as("tau"))
    prid.orderBy(col("pri").desc, col("id")).limit(k)
      .crossJoin(broadcast(topK1))
      .agg(count(lit(1)).as("k_sample"),
        min(microClamp(col("tau"))).as("tau_micro"),
        sum(microClamp(greatest(col("wt"), col("tau"))))
          .as("est_total_micro"))
  }

  /** Estimate tail of the priority sample, from a FINISHED
    * [[TopKByPriority]] state (`itemsCol` = the sorted top-(k+1)
    * (pri, id, wt) list): the same (k_sample, tau_micro,
    * est_total_micro) row [[prioritySampleSum]] emits — so a streamed
    * state estimates through identical math.
    */
  def priorityEstimateFromItems(df: DataFrame, itemsCol: String, k: Int): DataFrame = {
    val items = col(itemsCol)
    val tau = when(size(items) === (k + 1),
      element_at(items, k + 1).getField("pri")).otherwise(lit(0.0))
    df.select(
      least(size(items), lit(k)).cast("long").as("k_sample"),
      microClamp(tau).as("tau_micro"),
      aggregate(slice(items, 1, k), lit(0L), (acc, x) =>
        acc + microClamp(greatest(x.getField("wt"), tau)))
        .as("est_total_micro"))
  }

  /** Per-group [[prioritySampleSum]] — "estimated total tokens PER
    * SOURCE" from ≤ k sampled rows per group: rank by priority inside
    * each group (one key shuffle; WindowGroupLimit early-stops at
    * k+1), τ_g = each group's (k+1)-th priority (0 for under-k
    * groups, which are therefore EXACT), estimate per group =
    * Σ max(w, τ_g) over its top-k in integer micro-units. Output:
    * (group, k_sample, tau_micro, est_total_micro).
    */
  def prioritySampleSumByGroup(df: DataFrame, groupCol: String, idCol: String,
      weight: Column, k: Int, salt: String = "ps"): DataFrame = {
    require(k >= 1, "k >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("group").orderBy(col("pri").desc, col("id"))
    df.select(col(groupCol).as("group"), col(idCol).cast("long").as("id"),
        weight.cast("double").as("wt"),
        ((hash32(col(idCol), salt) + 1L) / lit(4294967296.0)).as("u"))
      .select(col("group"), col("id"), col("wt"), (col("wt") / col("u")).as("pri"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k + 1)
      .groupBy("group")
      .agg(
        sum(when(col("rn") <= k, 1L).otherwise(0L)).as("k_sample"),
        // the group's tau: its (k+1)-th priority, 0 when under k+1 rows
        max(when(col("rn") === (k + 1), col("pri")).otherwise(lit(0.0))).as("__tau"),
        // tau is an aggregate of the SAME group, so max(w, tau) folds
        // after the agg over the carried ≤ k-element weight list
        sort_array(collect_list(when(col("rn") <= k, col("wt"))), asc = false)
          .as("__ws"))
      .select(col("group"), col("k_sample"),
        microClamp(col("__tau")).as("tau_micro"),
        aggregate(col("__ws"), lit(0L), (acc, x) =>
          acc + microClamp(greatest(x, col("__tau"))))
          .as("est_total_micro"))
  }

  /** CountMin frequency sketch: `depth` independent md5-derived hash
    * rows of `width` counters; every item occurrence increments one
    * cell per row, and `estimate(x) = min_j cell[j][h_j(x)]` — an
    * upper bound on the true count that is tight unless x collides in
    * EVERY row. depth×width cells bound the state (a few KB) no matter
    * the corpus; the groupBy's map-side combine condenses each
    * partition to its touched cells, so the shuffle carries ≤
    * depth·width rows per partition at any scale. Like [[kmvDistinct]]
    * the whole sketch is a deterministic function of the input
    * multiset (md5 positions, integer counts) — the oracle replays
    * cells AND estimates exactly, collision-induced overestimates
    * included.
    * Output: (j, p, c) cell rows.
    */
  def countMinSketch(df: DataFrame, item: Column, depth: Int, width: Int,
      salt: String = "cm"): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width >= 1")
    // depth md5s per row is hash-heavy per-row work: a small single-file
    // source would run it one-threaded (Dedup.spread rationale; no-op on
    // streaming inputs and on sources already split across the cores)
    Dedup.spread(df).select(posexplode(transform(sequence(lit(0), lit(depth - 1)),
        j => cmPos(item, j, width, salt))))
      .select(col("pos").as("j"), col("col").as("p"))
      .groupBy("j", "p").agg(count(lit(1)).as("c"))
  }

  private def cmPos(item: Column, j: Column, width: Int, salt: String): Column =
    pmod(conv(substring(md5(concat(lit(salt), j.cast("string"), lit(":"),
      item.cast("string"))), 1, 8), 16, 10).cast("long"), lit(width.toLong))

  /** Point estimates for `terms` against a [[countMinSketch]]: min over
    * the depth rows, absent cells counting 0. The probe table is
    * depth×|terms| rows — broadcast-tiny.
    */
  def countMinEstimate(sketch: DataFrame, terms: Seq[String], depth: Int, width: Int,
      salt: String = "cm"): DataFrame = {
    require(terms.nonEmpty, "need at least one probe term")
    val spark = sketch.sparkSession
    import spark.implicits._
    countMinEstimateDF(sketch, broadcast(terms.toDF("term")), depth, width, salt)
  }

  /** [[countMinEstimate]] for a DataFrame of probe terms (column
    * `term`) — the bulk form: estimate EVERY distinct item in one join
    * against the depth×width cell table. The cell side is sketch-sized
    * (KBs) whatever the corpus, so Catalyst broadcasts it and the probe
    * side streams — estimating a billion distinct terms is a scan, not
    * a shuffle. This is the candidate generator of the heavy-hitters
    * pattern: CM estimates never UNDERcount, so `est >= T` keeps every
    * true heavy hitter (recall 1 by construction) and an exact count of
    * the candidates alone confirms or kills each.
    */
  def countMinEstimateDF(sketch: DataFrame, terms: DataFrame, depth: Int, width: Int,
      salt: String = "cm"): DataFrame = {
    val probe = terms
      .select(col("term"), posexplode(transform(sequence(lit(0), lit(depth - 1)),
        j => cmPos(col("term"), j, width, salt))))
      .select(col("term"), col("pos").as("j"), col("col").as("p"))
    probe.join(broadcast(sketch), Seq("j", "p"), "left")
      .groupBy("term").agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** AMS (Alon–Matias–Szegedy) F2 sketch: `depth` independent
    * md5-derived ±1 hash rows; row j accumulates S_j = Σ sign_j(x)
    * over all OCCURRENCES, and F2 = Σ_x count(x)² — the SELF-JOIN SIZE
    * of an equi-join on x — is estimated UNBIASEDLY by the mean of
    * S_j² (E[S²] = F2; Var shrinks as 2/depth, though heavy-hitter
    * inputs where F4 ≈ F2² keep relative error material — the
    * estimator's published behavior). This is the quantity the
    * posting-list guards exist to bound: one linear pass prices an
    * inverted-index join's output before running it. Every S_j is an
    * integer sum (order-free) and the only float op is the final
    * division by `depth`, so the estimate is a deterministic function
    * of the input multiset — oracle-replayable like the other
    * sketches. State: `depth` longs. Output: one row (est_f2 double).
    */
  def amsF2(df: DataFrame, item: Column, depth: Int = 48, salt: String = "ams"): DataFrame = {
    require(depth >= 1, "depth >= 1")
    val signs = transform(sequence(lit(0), lit(depth - 1)), j =>
      pmod(conv(substring(md5(concat(lit(salt), j.cast("string"), lit(":"),
        item.cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L)) * 2L - 1L)
    // 48 md5s per row over a one-file source ran the whole pass in a
    // single task (measured 13.6 s single-threaded at sf0.1) — spread
    // first, same rationale as the dedup/text hash pipelines
    Dedup.spread(df).select(posexplode(signs))
      .select(col("pos").as("j"), col("col").as("s"))
      .groupBy("j").agg(sum("s").as("sj"))
      .agg(sum(col("sj") * col("sj")).as("tot"))
      .select((col("tot").cast("double") / depth).as("est_f2"))
  }

  /** HyperLogLog registers over `value`: `m = 2^p` buckets, each
    * holding the max "rank" (leading-zero count + 1 of the hash suffix)
    * seen — the classic cardinality sketch, here built integer-exact:
    * bucket = top p bits of the 32-bit md5 hash, rank derives from the
    * binary LENGTH of the (32−p)-bit suffix (no float log anywhere), and
    * max() is idempotent so no DISTINCT pass is needed. The groupBy's
    * map-side combine condenses every partition to ≤ m rows, so the
    * shuffle carries m·partitions small ints for any input size.
    * Output: (b, r) rows for NON-EMPTY buckets only.
    */
  def hllRegisters(df: DataFrame, value: Column, p: Int = 8,
      salt: String = "hll"): DataFrame = {
    require(p >= 4 && p <= 16, "hll precision p in [4,16]")
    val sufBits = 32 - p
    val h = hash32(value, salt)
    val bucket = shiftright(h, sufBits)
    val rem = h.bitwiseAND(lit((1L << sufBits) - 1L))
    // rank = 1 + leading zeros of the suffix = (sufBits+1) − bit_length;
    // bin() drops leading zeros, so length(bin(rem)) IS bit_length —
    // integer everywhere, no log2 at power-of-two boundaries
    val rank = lit(sufBits + 1) -
      when(rem === 0L, lit(0)).otherwise(length(bin(rem)))
    df.select(bucket.as("b"), rank.as("r"))
      .groupBy("b").agg(max("r").cast("int").as("r"))
  }

  /** One-row HLL cardinality estimate with the standard small-range
    * correction. The harmonic denominator Σ 2^(−r_b) is computed as the
    * INTEGER Σ 2^(maxRank − r_b) (empty buckets contribute 2^maxRank),
    * so everything up to the final one-row float formula is exact and
    * order-free — the estimate, correction branch included, is a
    * deterministic function of the input set that any md5-capable
    * engine replays bit-for-bit. Output:
    * (n_zero_regs, z_scaled, est_distinct).
    */
  def hllDistinct(df: DataFrame, value: Column, p: Int = 8,
      salt: String = "hll"): DataFrame =
    hllEstimate(hllRegisters(df, value, p, salt), p)

  /** The estimate tail of [[hllDistinct]], taking a (b, r) register
    * table — so registers maintained INCREMENTALLY (a streaming
    * Complete-mode max aggregate, or per-slice register tables merged
    * by `groupBy(b).max(r)`) estimate through the identical math.
    */
  def hllEstimate(regs: DataFrame, p: Int = 8): DataFrame = {
    val m = 1 << p
    val maxRank = 32 - p + 1
    // alpha_m per Flajolet et al. 2007: the closed form is only valid
    // for m >= 128 (p >= 7); the small-m constants below are the
    // paper's tabulated values — without them p=4/5/6 estimates carry
    // up to ~7% bias beyond the correction range
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    // every empty bucket contributes rank 0 → 2^maxRank scaled; count
    // them from the register count rather than generating m rows
    val rawEst = lit(alpha * m * m) * lit(math.pow(2.0, maxRank)) /
      col("z_scaled").cast("double")
    regs.agg(count(lit(1)).as("n_regs"),
        sum(expr(s"shiftleft(1L, $maxRank - r)")).as("z_nonzero"))
      .select(
        (lit(m) - coalesce(col("n_regs"), lit(0L))).cast("long").as("n_zero_regs"),
        (coalesce(col("z_nonzero"), lit(0L)) +
          (lit(m.toLong) - coalesce(col("n_regs"), lit(0L))) * (1L << maxRank))
          .as("z_scaled"))
      .select(col("n_zero_regs"), col("z_scaled"),
        round(
          when(col("n_zero_regs") > 0 && rawEst <= lit(2.5 * m),
            lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero_regs").cast("double")))
          .otherwise(rawEst), 4).as("est_distinct"))
  }

  /** Bottom-k-by-hash quantile sketch — the fourth sketch family
    * (cardinality KMV/HLL, frequency CountMin, join-size AMS F2, and
    * now quantiles): a deterministic uniform sample of `k` rows — the
    * ones whose md5-derived 60-bit row-key hash is smallest — and the
    * exact interpolated quantiles OF THAT SAMPLE as the estimates.
    * Bottom-k hash sampling is the classic coordinated-sampling
    * primitive: a SET function of the row-key set (order/partition
    * free), mergeable (the union's bottom-k is computable from parts'
    * bottom-ks), and exactly replayable by any md5-capable engine —
    * so the oracle gates the sampling AND the estimate, not a
    * tolerance band.
    *
    * Plan shape: hashes ride a TakeOrdered(k) (bounded, per-partition
    * top-k then one k-row merge — never a full sort), the ≤k sample
    * joins back by hash (60-bit keys: collision-free in practice, and
    * any collision only widens the sample by a row), and one aggregate
    * computes the percentiles. Output: one row
    * (n_sample, est_p050, est_p090, est_p099).
    */
  def bottomKQuantiles(df: DataFrame, idCol: String, value: Column, k: Int,
      probs: Seq[Double] = Seq(0.5, 0.9, 0.99), salt: String = "bks"): DataFrame = {
    require(k >= 1, "k >= 1")
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1), "probs in [0,1]")
    val hashed = df.select(
      conv(substring(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 15), 16, 10)
        .cast("long").as("__h"),
      value.as("__v"))
    // DISTINCT before the limit: duplicate ids hash identically, and
    // without the dedup the bottom-k rows could cover < k distinct
    // keys (and the join back would fan out inconsistently with the
    // deduping BottomKByHash aggregator used by the grouped/streaming
    // variants). With distinct hashes the sample is exactly "all rows
    // whose key-hash is among the k smallest distinct hashes" — still
    // a set function of the row-key set.
    val bottom = hashed.select("__h").distinct().orderBy("__h").limit(k)
    val sample = hashed.join(broadcast(bottom), "__h")
    val aggs = probs.map(p =>
      round(expr(s"percentile(__v, $p)"), 6)
        .as(f"est_p${math.round(p * 1000)}%03d"))
    sample.agg(count(lit(1)).as("n_sample"), aggs: _*)
  }

  /** Per-group quantile estimates from [[BottomKByHash]] samples —
    * "p50/p90/p99 per service" at any scale: each group carries ≤ k
    * sampled values through the aggregate (k·groups·partitions rows on
    * the shuffle bound), then the ≤k-element samples explode and one
    * small aggregate computes the interpolated quantiles per group.
    * Deterministic end to end like [[bottomKQuantiles]]. Output:
    * (group, n_sample, est_p###...).
    */
  def bottomKQuantilesByGroup(df: DataFrame, groupCol: String, idCol: String,
      value: Column, k: Int, probs: Seq[Double] = Seq(0.5, 0.9, 0.99),
      salt: String = "bks"): DataFrame = {
    require(k >= 1, "k >= 1")
    val agg = udaf(new BottomKByHash(k), Encoders.product[HashVal])
    val sampled = df.select(col(groupCol).as("group"),
        conv(substring(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 15), 16, 10)
          .cast("long").as("h"),
        value.cast("double").as("v"))
      .groupBy("group").agg(agg(col("h"), col("v")).as("sk"))
    val aggs = probs.map(p =>
      round(expr(s"percentile(__v, $p)"), 6).as(f"est_p${math.round(p * 1000)}%03d"))
    sampled.select(col("group"), explode(col("sk.items.v")).as("__v"))
      .groupBy("group")
      .agg(count(lit(1)).as("n_sample"), aggs: _*)
  }

  /** Lossless union of CountMin sketches built with the same
    * depth/width/salt: cell-wise sum — the sketch of the concatenated
    * inputs, exactly (counts are linear).
    */
  def mergeCountMin(sketches: DataFrame): DataFrame =
    sketches.groupBy("j", "p").agg(sum("c").as("c"))

  /** Lossless union of HLL register tables built with the same p/salt:
    * register-wise max — exactly the register table of the concatenated
    * inputs (max is idempotent and commutative), so per-slice register
    * tables roll up through [[hllEstimate]] with zero loss.
    */
  def mergeHllRegisters(registers: DataFrame): DataFrame =
    registers.groupBy("b").agg(max("r").cast("int").as("r"))

  /** Per-group HLL cardinality table — the grouped sibling of
    * [[hllDistinct]] (and of the KMV q132 shape): ≤ m register rows
    * per (group, partition) on the shuffle, one estimate row per
    * group. Output: (group, n_zero_regs, z_scaled, est_distinct).
    */
  def hllDistinctByGroup(df: DataFrame, groupCol: String, value: Column,
      p: Int = 8, salt: String = "hll"): DataFrame = {
    require(p >= 4 && p <= 16, "hll precision p in [4,16]")
    val m = 1 << p
    val maxRank = 32 - p + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val sufBits = 32 - p
    val h = hash32(value, salt)
    val rem = h.bitwiseAND(lit((1L << sufBits) - 1L))
    val rank = lit(sufBits + 1) -
      when(rem === 0L, lit(0)).otherwise(length(bin(rem)))
    val regs = df.select(col(groupCol).as("group"),
        shiftright(h, sufBits).as("b"), rank.as("r"))
      .groupBy("group", "b").agg(max("r").cast("int").as("r"))
    val rawEst = lit(alpha * m * m) * lit(math.pow(2.0, maxRank)) /
      col("z_scaled").cast("double")
    regs.groupBy("group")
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(s"shiftleft(1L, $maxRank - r)")).as("z_nonzero"))
      .select(col("group"),
        (lit(m) - col("n_regs")).cast("long").as("n_zero_regs"),
        (col("z_nonzero") + (lit(m.toLong) - col("n_regs")) * (1L << maxRank))
          .as("z_scaled"))
      .select(col("group"), col("n_zero_regs"), col("z_scaled"),
        round(
          when(col("n_zero_regs") > 0 && rawEst <= lit(2.5 * m),
            lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero_regs").cast("double")))
          .otherwise(rawEst), 4).as("est_distinct"))
  }

  /** Lossless union of per-slice sketches built with the same k/salt:
    * distinct-merge the item arrays and keep the k smallest — the
    * exact sketch of the concatenated inputs.
    */
  def mergeSketches(sketches: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new MinKDistinct(k))
    sketches.select(explode(col("sketch.items")).as("h"))
      .agg(agg(col("h")).as("sketch"))
  }
}
