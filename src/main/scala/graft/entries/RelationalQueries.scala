package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.{AsOf, Ranking}
import graft.sources.Tables

/** Beyond-reference relational + time-series operators (SURVEY.md §2.5)
  * over the TPC-H-ish tables and events.
  *
  * Float-parity discipline: every SUM is computed over DECIMAL (exact,
  * order-independent) and cast to DOUBLE at the end on BOTH engines;
  * raw doubles are only passed through or combined with single
  * deterministic arithmetic ops. Every integral output is cast to
  * BIGINT. Every query is totally ordered.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // grouped aggregation, partial-agg friendly (TPC-H Q1 shape)
    "q30_agg_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(28,6)"))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // broadcast hash join: fact ⋈ small dim
    "q31_join_broadcast" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // multi-way join: one fact shuffle, dims broadcast
    "q32_join_multiway" -> ((s, dir) => {
      val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    // ranking window function
    "q33_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // top-k (plans as TakeOrderedAndProject — no full sort at scale)
    "q34_topk" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)),

    // set op: EXCEPT
    "q35_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(col("o_custkey").as("custkey")).distinct()
        .except(o.filter(col("o_totalprice") > 150000)
          .select(col("o_custkey").as("custkey")).distinct())
        .orderBy("custkey")
    }),

    // set op: INTERSECT
    "q36_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
        .intersect(o.select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    }),

    // anti join (customers with no orders)
    "q37_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    }),

    // EXISTS / semi-join: customers with at least one urgent order
    "q75_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    }),

    // ranking-function family beyond row_number: ntile quartiles,
    // dense_rank, percent_rank over one ordered window. A GLOBAL
    // ranking inherently serializes into one task — correctness
    // surface here; at scale rank within partitions or use range
    // partitioning + offset correction.
    "q76_ranking" -> ((s, dir) => {
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          dense_rank().over(w).cast("long").as("drank"),
          percent_rank().over(w).as("prank"))
        .orderBy("o_orderkey")
    }),

    // the SAME global ranking, scale-safe: partition-local numbering
    // after a range repartition + broadcast offset correction (see
    // Ranking.scaladoc) — rank work runs in EVERY partition instead of
    // one. The ordering is total (o_orderkey breaks ties), so
    // dense_rank == row_number and ntile/percent_rank are pure
    // expressions over (row_number, total). Shares q76's oracle shape,
    // proving the distributed form reproduces the global window exactly.
    "q78_ranking_scalable" -> ((s, dir) => {
      val ranked = Ranking.withGlobalRowNumber(t(s, dir, "orders"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), "rn",
        totalCol = Some("n_total"))
      ranked.select(col("o_orderkey"),
          Ranking.ntileFromRowNumber(col("rn"), col("n_total"), 4)
            .cast("long").as("quartile"),
          col("rn").as("drank"),
          Ranking.percentRankFromRank(col("rn"), col("n_total")).as("prank"))
        .orderBy("o_orderkey")
    }),

    // pivot: per-priority order counts as columns (CASE-WHEN aggregate)
    "q77_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("status"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .withColumnsRenamed(Map(
          "1-URGENT" -> "p1", "2-HIGH" -> "p2", "3-MEDIUM" -> "p3",
          "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5"))
        .na.fill(0L, Seq("p1", "p2", "p3", "p4", "p5"))
        .orderBy("status")),

    // ROLLUP subtotals
    "q38_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // CUBE
    "q39_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    // tumbling time window over the event stream (batch form of the
    // streaming window() aggregation)
    "q40_window_tumbling" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("time"), "1 day").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(unix_micros(col("win.start")).as("day_us"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("day_us", "event_type")),

    // q40 executed through the STREAMING engine: file stream source →
    // micro-batch planner → windowed agg → memory sink (Complete mode
    // so every window emits on the finite stream). Same oracle as q40.
    "q45_stream_tumbling" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamingIngest
      val agg = StreamingIngest.tumblingAgg(
        StreamingIngest.eventsStream(s, dir), "time",
        windowLen = "1 day", lateness = "1 hour",
        groupCols = Seq("event_type"),
        aggs = Seq(
          "count(1)" -> "n",
          "cast(sum(cast(value as decimal(18,2))) as double)" -> "sum_value"))
      StreamingIngest.runToTable(agg, "q45_sink", OutputMode.Complete())
        .select(unix_micros(col("win.start")).as("day_us"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("day_us", "event_type")
    }),

    // sliding windows through the STREAMING engine (q45's pattern):
    // 1-day windows every 12 hours, so each event lands in exactly two
    // overlapping windows — the overlap replication is what
    // distinguishes this from q45's tumbling shape. Epoch-aligned
    // window starts are replayed arithmetically by the oracle.
    "q87_stream_sliding" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamingIngest
      val agg = StreamingIngest.slidingAgg(
        StreamingIngest.eventsStream(s, dir), "time",
        windowLen = "1 day", slide = "12 hours", lateness = "1 hour",
        groupCols = Seq("event_type"),
        aggs = Seq(
          "count(1)" -> "n",
          "cast(sum(cast(value as decimal(18,2))) as double)" -> "sum_value"))
      StreamingIngest.runToTable(agg, "q87_sink", OutputMode.Complete())
        .select(unix_micros(col("win.start")).as("wstart_us"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("wstart_us", "event_type")
    }),

    // SESSION windows through the STREAMING engine: per-user sessions
    // close after a 1-hour quiet gap; the state store merges windows
    // dynamically. The oracle replays the same sessions as batch
    // gaps-and-islands (lag + running break-sum), pinning start = first
    // event, end = last event + gap, per-session count and value sum —
    // including the boundary rule: an event at EXACTLY gap distance
    // still merges (Spark merges adjacent [t, t+gap) windows;
    // StreamingSpec pins this empirically), so the oracle breaks only
    // on diff STRICTLY greater than the gap.
    "q89_stream_session" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamingIngest
      val agg = StreamingIngest.sessionAgg(
        StreamingIngest.eventsStream(s, dir), "time",
        gap = "1 hour", lateness = "1 hour",
        groupCols = Seq("user_id"),
        aggs = Seq(
          "count(1)" -> "n",
          "cast(sum(cast(value as decimal(18,2))) as double)" -> "sum_value"))
      StreamingIngest.runToTable(agg, "q89_sink", OutputMode.Complete())
        .select(unix_micros(col("win.start")).as("wstart_us"),
          unix_micros(col("win.end")).as("wend_us"),
          col("user_id"), col("n"), col("sum_value"))
        .orderBy("user_id", "wstart_us")
    }),

    // watermarked stream-stream interval join through the REAL
    // micro-batch engine (two file-stream sources → symmetric join
    // state → append sink): purchases matched to same-user views
    // within ±1 hour. The finite AvailableNow run arrives as one batch
    // (watermark 0, nothing late), so the result equals the batch
    // interval join the oracle computes — what the query pins is that
    // the streaming JOIN OPERATOR (state store, two watermarks, range
    // condition) reproduces batch semantics exactly.
    "q80_stream_stream_join" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamingIngest
      val ev = StreamingIngest.eventsStream(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("time").as("ptime"), col("event_id").as("pid"))
      val views = StreamingIngest.eventsStream(s, dir)
        .filter(col("event_type") === "view")
        .select(col("user_id"), col("time").as("vtime"), col("event_id").as("vid"))
      val joined = StreamingIngest.streamStreamJoin(
        purchases, views, keyCols = Seq("user_id"),
        leftTimeCol = "ptime", rightTimeCol = "vtime",
        lowerBound = "1 hour", upperBound = "1 hour", lateness = "1 hour")
      StreamingIngest.runToTable(joined, "q80_sink", OutputMode.Append())
        .select("pid", "vid").orderBy("pid", "vid")
    }),

    // watermarked STREAMING dedup through the real micro-batch engine:
    // first-arrival-wins per (user, event_type, day) via
    // dropDuplicatesWithinWatermark state — the streaming form of exact
    // dedup. The projection keeps only the key columns, so the emitted
    // rows are key-determined (it cannot matter WHICH duplicate won) and
    // the oracle is the batch DISTINCT over the same keys: what the
    // query pins is that the state-store dedup emits every key exactly
    // once — no key lost, none doubled. day_us is integer epoch-micros
    // arithmetic, replayed exactly by the oracle.
    // Lateness must COVER the key granularity for the DISTINCT
    // equivalence to survive multi-micro-batch ingestion: keys are DAY
    // buckets, so a watermark tighter than 24h+slack would evict a
    // day's key state mid-day and re-emit the same key if the source
    // ever split across batches (maxFilesPerTrigger, multi-file scale
    // factors). 25 hours = one day + the events data's max in-day skew.
    "q95_stream_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamingIngest
      val ev = StreamingIngest.eventsStream(s, dir)
        .withColumn("day_us", col("ts_us") - col("ts_us") % 86400000000L)
      val dd = StreamingIngest.streamDedup(ev,
        keyCols = Seq("user_id", "event_type", "day_us"),
        timeCol = "time", lateness = "25 hours")
      StreamingIngest.runToTable(dd, "q95_sink", OutputMode.Append())
        .select("user_id", "event_type", "day_us")
        .orderBy("user_id", "event_type", "day_us")
    }),

    // native session_window ≡ gaps-and-islands INCLUDING the boundary
    // case: Spark merges a new event into the open session when its
    // start <= current session end, so two events exactly `gap` apart
    // DO merge — the same inclusive rule as the lag+cumsum break
    // (diff > gap) used by this oracle and by q65/Curation.sessionize.
    // SessionBoundarySpec pins the diff == gap case empirically for
    // both formulations.
    "q73_session_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("time"), "30 minutes").as("win"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts_us")).as("start_us"))
        .select(col("user_id"), col("n_events"), col("start_us"))
        .orderBy("user_id", "start_us")),

    // distinct aggregation (expand-based two-phase distinct agg)
    "q49_distinct_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // keyless interval join via time-bucketized equi-join (the
    // nested-loop-free range join): events against derived 8-hour
    // maintenance windows, one per observed day
    "q48_interval_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val wins = e.select(date_trunc("day", col("time")).as("wstart")).distinct()
        .withColumn("wend", col("wstart") + expr("INTERVAL 8 HOURS"))
      graft.analytics.Interval.joinByBucket(e, "time", wins, "wstart", "wend",
          bucketSeconds = 6 * 3600)
        .groupBy(unix_micros(col("wstart")).as("wstart_us"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("wstart_us")
    }),

    // exact percentiles per group (continuous interpolation — same
    // definition as DuckDB quantile_cont; rounded 6dp on both sides to
    // absorb float noise in the interpolation arithmetic)
    "q47_quantiles" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy("event_type")),

    // gap-fill + forward-fill: per-event-type daily series on a regular
    // grid, carrying the last observed value across empty days
    "q46_gap_fill" -> ((s, dir) => {
      graft.analytics.TimeSeries.gapFillForward(
        Tables.events(s, dir), "event_type", "time", "value", 86400L)
        .select(col("key"),
          (unix_timestamp(col("bucket_time")) * 1000000L).as("bucket_us"),
          col("observed"), col("filled"))
        .orderBy("key", "bucket_us")
    }),

    // as-of join: each purchase ← user's most recent signup at-or-before
    "q41_asof_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts_us"), col("event_id"), col("ts_us").as("signup_us"))
      AsOf.asOfJoinPrev(purchases, signups,
          keys = Seq("user_id"), tsCol = "ts_us", seqCol = "event_id",
          leftCols = Nil, rightPayload = Seq("signup_us"))
        .select("event_id", "signup_us").orderBy("event_id")
    }),

    // analytic window: lag delta per user series
    "q42_lag_delta" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(s, dir)
        .select(col("event_id"), (col("value") - lag("value", 1).over(w)).as("dv"))
        .orderBy("event_id")
    }),

    // moving frame aggregate (exact via decimal)
    "q43_moving_sum" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(-2, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"),
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("mv"))
        .orderBy("event_id")
    }),

    // scalar function surface
    "q44_scalar_fns" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri"),
        year(col("o_orderdate")).cast("long").as("yr"),
        substring(col("o_orderstatus"), 1, 1).as("st"),
        length(col("o_orderpriority")).cast("long").as("prilen"))
        .orderBy("o_orderkey")),

    // retention downsample: last point per day per series (max_by —
    // single hash aggregate, no sort/window)
    "q71_downsample" -> ((s, dir) =>
      graft.analytics.TimeSeries.downsampleLast(
        Tables.eventsAsPoints(s, dir), "1 day", "value")
        .select(col("measurement"),
          unix_micros(col("window_start")).as("win_us"), col("last_value"))
        .orderBy("measurement", "win_us")),

    // co-located BUCKETED join: both sides written bucketed+sorted on
    // the join key (the once-per-lifetime layout cost), then joined
    // with NO exchange below the join (PlanAudit pins that) — same
    // result as q31's broadcast form, proven by sharing its oracle
    "q103_bucketed_join" -> ((s, dir) => {
      val base = graft.util.Scratch.dir("graftbucketq")
      graft.sources.Bucketing.writeBucketed(
        t(s, dir, "orders").select(col("o_custkey").as("custkey"), col("o_totalprice")),
        "g103_orders", s"$base/orders", "custkey", 8)
      graft.sources.Bucketing.writeBucketed(
        t(s, dir, "customer").select(col("c_custkey").as("custkey"), col("c_mktsegment")),
        "g103_customer", s"$base/customer", "custkey", 8)
      graft.sources.Bucketing.cogroupedJoin(s, "g103_orders", "g103_customer", "custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // Z-order layout audit: Morton-interleave (user bucket, hour
    // bucket), bucket rows by Z-prefix (the file assignment a z-ordered
    // write would make) and report each bucket's 2-d bounding box —
    // the oracle replays the bit-twiddling exactly, so the clustering
    // property the scan prunes on is itself hash-gated
    "q105_zorder_stats" -> ((s, dir) =>
      graft.analytics.Layout.zorderBucketStats(Tables.events(s, dir),
        pmod(col("user_id"), lit(1024L)),
        pmod(expr("ts_us div 3600000000"), lit(1024L)),
        prefixShift = 14)),

    // stream-static enrichment: the event STREAM joins a broadcast
    // nation dim per micro-batch (no stream shuffle, no join state),
    // then aggregates — oracle is the equivalent batch join, so the
    // streaming decoration path is hash-gated end to end
    "q108_stream_enrich" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamingIngest
      val dim = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val enriched = StreamingIngest.enrichmentJoin(
        StreamingIngest.eventsStream(s, dir), dim,
        pmod(col("user_id"), lit(25L)) === col("n_nationkey"))
      val agg = enriched.groupBy("n_name")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      StreamingIngest.runToTable(agg, "q108_sink", OutputMode.Complete())
        .orderBy("n_name")
    }),

    // KMV cardinality sketch of distinct (user, day) pairs — one pass,
    // k·partitions longs on the shuffle, never a corpus-wide DISTINCT;
    // md5-derived hashes make the k minimums (and so the estimate)
    // bit-reproducible, so even the APPROXIMATION is oracle-exact
    "q109_kmv_distinct" -> ((s, dir) =>
      graft.analytics.Sketch.kmvDistinct(
        Tables.events(s, dir),
        concat(col("user_id").cast("string"), lit(":"),
          expr("ts_us div 86400000000").cast("string")),
        k = 256)),

    // moving z-score anomaly flagging: decimal-exact trailing-window
    // moments, closed-form variance in double only at the end — the
    // oracle recomputes every z bit-for-bit, so the flagged anomaly
    // SET (not just counts) is under the gate
    "q116_moving_anomaly" -> ((s, dir) =>
      graft.analytics.TimeSeries.movingZScore(
        Tables.events(s, dir).select(col("event_type"), col("ts_us"), col("event_id"), col("value")),
        keyCol = "event_type", orderCol = "ts_us", tieCol = "event_id",
        valueCol = "value", nRows = 7, sigma = 2.0)
        .orderBy("event_type", "ts_us", "event_id")),

    // truncated EWMA smoothing: decay powers are Scala-side literals
    // interpolated into BOTH plans, the sum a fixed left-assoc chain —
    // identical IEEE trees, so the smoothed series replays bit-for-bit
    "q117_ewma" -> ((s, dir) =>
      graft.analytics.TimeSeries.ewma(
        Tables.events(s, dir).select(col("event_type"), col("ts_us"), col("event_id"), col("value")),
        keyCol = "event_type", orderCol = "ts_us", tieCol = "event_id",
        valueCol = "value", alpha = 0.3, terms = 8)
        .orderBy("event_type", "ts_us", "event_id")),

    // the KMV sketch as a STREAMING aggregate: the same MinKDistinct
    // Aggregator runs inside the micro-batch engine (Complete mode), so
    // the sketch maintains itself incrementally as events arrive —
    // merge-associativity is what makes that free. Oracle = q109's
    // batch SQL: the streamed sketch must land bit-identical
    "q112_stream_kmv" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamingIngest
      val k = 256
      val stream = StreamingIngest.eventsStream(s, dir)
        .select(graft.analytics.Sketch.hash32(
          concat(col("user_id").cast("string"), lit(":"),
            expr("ts_us div 86400000000").cast("string"))).as("h"))
      val kmv = org.apache.spark.sql.functions.udaf(new graft.analytics.MinKDistinct(k))
      val agg = stream.agg(kmv(col("h")).as("sketch"))
      StreamingIngest.runToTable(agg, "q112_sink", OutputMode.Complete())
        .select(size(col("sketch.items")).cast("long").as("k_used"),
          element_at(col("sketch.items"), -1).as("kth_hash"))
        .select(col("k_used"), col("kth_hash"),
          when(col("k_used") < k, col("k_used").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
              col("kth_hash").cast("double"))
            .as("est_distinct"))
    }),

    // salting must be semantics-preserving: the salted fact-dim join
    // aggregates to exactly what the plain join produces
    "q72_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("orderkey"), col("l_quantity"))
      val ords = t(s, dir, "orders")
        .select(col("o_orderkey").as("orderkey"), col("o_orderpriority"))
      graft.analytics.Skew.saltedJoin(li, ords, Seq("orderkey"), saltBuckets = 8)
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .orderBy("pri")
    }),

    // deterministic two-variable statistics: Pearson corr + OLS line of
    // event value against props length — observations quantized ONCE to
    // integer micro-units (floor of an IEEE product, identical on both
    // engines), moments as exact decimal sums, floats only on the one
    // result row. Spark's own corr() would be partitioning-dependent in
    // its low bits; this is replayable bit-for-bit.
    "q123_corr_events" -> ((s, dir) =>
      graft.analytics.Stats.corrRegression(t(s, dir, "events"),
        col("value"), length(col("props")))),

    // exact rolling median of the last 5 values per event_type series:
    // the sorted-frame order statistic is a set function of the frame,
    // so both engines index identical arrays; the even-case midpoint is
    // one IEEE add+halve — no rounding needed anywhere
    "q125_rolling_median" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("ts_us"), col("event_type"), col("value"))
      graft.analytics.TimeSeries.rollingMedian(e, "event_type",
        Seq(col("ts_us"), col("event_id")), "value", nRows = 5)
        .select(col("event_id"), col("rolling_median"))
        .orderBy("event_id")
    }),

    // Spearman rho with tie-broken total-order ranks: both rankings are
    // permutations of 1..n, sum_d2 is integer, and the one-row closed
    // form divides exact longs — the scale story is that ranks come
    // from the range-partitioned global row-number machinery, never an
    // Exchange SinglePartition (PlanAudit asserts this for q78)
    "q127_spearman" -> ((s, dir) =>
      graft.analytics.Stats.spearman(t(s, dir, "events"),
        col("value"), length(col("props")), col("event_id"))),

    // the CountMin sketch maintains itself over the STREAM (Complete-
    // mode cells aggregate through the real micro-batch engine) and
    // must land cell-identical to the batch sketch — q112's contract,
    // for frequencies instead of cardinality
    "q126_stream_countmin" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamingIngest
      val (depth, width) = (4, 64)
      val stream = StreamingIngest.eventsStream(s, dir).select(col("event_type"))
      val cells = graft.analytics.Sketch.countMinSketch(stream, col("event_type"),
        depth, width)
      val done = StreamingIngest.runToTable(cells, "q126_sink", OutputMode.Complete())
      graft.analytics.Sketch.countMinEstimate(done,
        Seq("click", "error", "purchase", "signup", "view", "zzz"), depth, width)
        .orderBy("term")
    }),

    // per-slice KMV sketches (one per event_type) merged losslessly
    // must estimate EXACTLY what a direct global sketch estimates —
    // the rollup contract that makes per-day/per-source sketch tables
    // usable; the oracle computes the direct sketch, so any merge loss
    // hash-mismatches
    "q130_sketch_rollup" -> ((s, dir) => {
      val k = 256
      val e = Tables.events(s, dir)
      val v = graft.analytics.Sketch.hash32(
        concat(col("user_id").cast("string"), lit(":"),
          expr("ts_us div 86400000000").cast("string")))
      val kmv = udaf(new graft.analytics.MinKDistinct(k))
      val perSlice = e.select(col("event_type"), v.as("h"))
        .groupBy("event_type").agg(kmv(col("h")).as("sketch"))
      graft.analytics.Sketch.mergeSketches(perSlice, k)
        .select(size(col("sketch.items")).cast("long").as("k_used"),
          element_at(col("sketch.items"), -1).as("kth_hash"))
        .select(col("k_used"), col("kth_hash"),
          when(col("k_used") < k, col("k_used").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
              col("kth_hash").cast("double"))
            .as("est_distinct"))
    }),

    // HLL registers maintained over the STREAM (Complete-mode max
    // aggregate, ≤256 rows of state) — must estimate identically to
    // the batch registers; the streaming third of the sketch family
    // (q112 KMV, q126 CountMin, this)
    "q131_stream_hll" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamingIngest
      val stream = StreamingIngest.eventsStream(s, dir)
        .select(concat(col("user_id").cast("string"), lit(":"),
          expr("ts_us div 86400000000").cast("string")).as("v"))
      val regs = graft.analytics.Sketch.hllRegisters(stream, col("v"), p = 8)
      val done = StreamingIngest.runToTable(regs, "q131_sink", OutputMode.Complete())
      graft.analytics.Sketch.hllEstimate(done, p = 8)
    }),

    // the per-slice sketch TABLE (q130 gates the rollup): one saturated
    // KMV estimate per event_type — k·slices state total, the shape a
    // per-day/per-source cardinality dashboard reads
    "q132_kmv_by_slice" -> ((s, dir) => {
      val k = 256
      val e = Tables.events(s, dir)
      val v = graft.analytics.Sketch.hash32(
        concat(col("user_id").cast("string"), lit(":"),
          expr("ts_us div 86400000000").cast("string")))
      val kmv = udaf(new graft.analytics.MinKDistinct(k))
      e.select(col("event_type"), v.as("h"))
        .groupBy("event_type").agg(kmv(col("h")).as("sketch"))
        .select(col("event_type"),
          size(col("sketch.items")).cast("long").as("k_used"),
          element_at(col("sketch.items"), -1).as("kth_hash"))
        .select(col("event_type"), col("k_used"), col("kth_hash"),
          when(col("k_used") < k, col("k_used").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
              col("kth_hash").cast("double"))
            .as("est_distinct"))
        .orderBy("event_type")
    }),

    // the trust-a-new-table profile: per-column nulls, exact distincts,
    // numeric ranges — ONE scan (multi-countDistinct Expand), ts
    // projected to epoch micros first (the cross-engine currency)
    "q135_profile" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      graft.analytics.Stats.profile(e)
        .withColumn("min_num", round(col("min_num"), 6))
        .withColumn("max_num", round(col("max_num"), 6))
        .orderBy("col")
    }),

    // ordered conversion funnel over 30-min sessions: signup -> click
    // -> purchase with strictly-increasing times — first-match
    // subsequence semantics, every count integer
    "q137_funnel" -> ((s, dir) =>
      graft.analytics.Curation.sessionFunnel(
        Tables.events(s, dir).select(col("user_id"), col("ts_us"),
          col("event_id"), col("event_type")),
        "user_id", "ts_us", "event_id", "event_type",
        gapUs = 1800000000L, steps = Seq("signup", "click", "purchase"))),

    // the retention triangle: first-active-day cohorts x day offsets,
    // exact distinct users per cell
    "q138_retention" -> ((s, dir) =>
      graft.analytics.Curation.retentionCohorts(
        Tables.events(s, dir), "user_id", "ts_us", maxOffsetDays = 7)
        .orderBy("cohort_day", "day_offset")),

    // TSDB DERIVATIVE: per-series rate of change between consecutive
    // points; both engines evaluate the identical IEEE expression, so
    // the raw doubles hash-match with no rounding
    "q139_derivative" -> ((s, dir) =>
      graft.analytics.TimeSeries.derivative(
        Tables.events(s, dir).select(col("event_id"), col("ts_us"),
          col("event_type"), col("value")),
        "event_type", "ts_us", "event_id", "value")
        .select(col("event_id"), col("rate_per_s"))
        .orderBy("event_id")),

    // fill(linear): missing daily grid points interpolate between the
    // surrounding observations — one fixed IEEE expression per gap,
    // both neighbors guaranteed by the observed-range grid. The user
    // filter SPARSIFIES the series so real gaps exist: the oracle
    // checks interpolated values, not just pass-through observations.
    "q141_gap_fill_linear" -> ((s, dir) =>
      graft.analytics.TimeSeries.gapFillLinear(
        Tables.events(s, dir).filter(col("user_id") % 37 === 0),
        "event_type", "time", "value", stepSeconds = 86400L)
        .orderBy("key", "bucket_us")),

    // fourth sketch family: quantile estimation from a deterministic
    // bottom-k-by-hash sample — the sampling AND the interpolated
    // estimates replay exactly (no tolerance band), with the exact
    // full-data quantiles alongside for the error story
    "q148_quantile_sketch" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val est = graft.analytics.Sketch.bottomKQuantiles(e, "event_id", col("value"), k = 512)
      val exact = e.agg(
        round(expr("percentile(value, 0.5)"), 6).as("exact_p500"),
        round(expr("percentile(value, 0.9)"), 6).as("exact_p900"),
        round(expr("percentile(value, 0.99)"), 6).as("exact_p990"))
      est.crossJoin(exact)
    }),

    // the quantile sketch MAINTAINS ITSELF over the stream (the
    // BottomKByHash aggregate in Complete mode) and must land
    // sample-identical to the batch sketch — the fourth streamed
    // sketch (KMV q112, CountMin q126, HLL q131, quantiles here)
    "q154_stream_quantile_sketch" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamingIngest
      val k = 512
      val agg = udaf(new graft.analytics.BottomKByHash(k),
        org.apache.spark.sql.Encoders.product[graft.analytics.HashVal])
      val stream = StreamingIngest.eventsStream(s, dir)
        .select(
          conv(substring(md5(concat(lit("bks:"), col("event_id").cast("string"))), 1, 15), 16, 10)
            .cast("long").as("h"),
          col("value").cast("double").as("v"))
      val sk = stream.agg(agg(col("h"), col("v")).as("sk"))
      val done = StreamingIngest.runToTable(sk, "q154_sink", OutputMode.Complete())
      done.select(explode(col("sk.items.v")).as("__v"))
        .agg(count(lit(1)).as("n_sample"),
          round(expr("percentile(__v, 0.5)"), 6).as("est_p500"),
          round(expr("percentile(__v, 0.9)"), 6).as("est_p900"),
          round(expr("percentile(__v, 0.99)"), 6).as("est_p990"))
    }),

    // the STREAMED priority sample — the subset-sum sketch maintains
    // itself over the stream (TopKByPriority state, <= k+1 rows,
    // deduped by id so at-least-once redelivery cannot re-sample) and
    // must land sample-identical to the batch math; fifth streamed
    // sketch family (KMV q112, CountMin q126, HLL q131, quantiles
    // q154, subset-sum here)
    "q168_stream_priority_sample" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamingIngest
      import graft.analytics.{PriVal, Sketch, TopKByPriority}
      val k = 64
      val agg = udaf(new TopKByPriority(k + 1),
        org.apache.spark.sql.Encoders.product[PriVal])
      val wt = (col("event_id") % 50 + 1).cast("double")
      val stream = StreamingIngest.eventsStream(s, dir)
        .select(
          (wt / ((Sketch.hash32(col("event_id"), "ps") + 1L) / lit(4294967296.0)))
            .as("pri"),
          col("event_id").cast("long").as("id"),
          wt.as("wt"))
      val sk = stream.agg(agg(col("pri"), col("id"), col("wt")).as("sk"))
      val done = StreamingIngest.runToTable(sk, "q168_sink", OutputMode.Complete())
      Sketch.priorityEstimateFromItems(done.select(col("sk.items").as("items")),
        "items", k)
    }),

    // the GROUPED streaming quantile sketch — "p99 per service,
    // continuously maintained": one BottomKByHash state per group in
    // Complete mode (≤k rows each), landing sample-identical to the
    // batch q149 — so the per-group family now also has all three
    // forms (batch q149, streamed here, and the mergeable per-slice
    // shape via the aggregator's buffers)
    "q160_stream_group_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamingIngest
      val k = 256
      val agg = udaf(new graft.analytics.BottomKByHash(k),
        org.apache.spark.sql.Encoders.product[graft.analytics.HashVal])
      val stream = StreamingIngest.eventsStream(s, dir)
        .select(col("event_type").as("g"),
          conv(substring(md5(concat(lit("bks:"), col("event_id").cast("string"))), 1, 15), 16, 10)
            .cast("long").as("h"),
          col("value").cast("double").as("v"))
      val sk = stream.groupBy("g").agg(agg(col("h"), col("v")).as("sk"))
      val done = StreamingIngest.runToTable(sk, "q160_sink", OutputMode.Complete())
      done.select(col("g"), explode(col("sk.items.v")).as("__v"))
        .groupBy("g")
        .agg(count(lit(1)).as("n_sample"),
          round(expr("percentile(__v, 0.5)"), 6).as("est_p500"),
          round(expr("percentile(__v, 0.9)"), 6).as("est_p900"),
          round(expr("percentile(__v, 0.99)"), 6).as("est_p990"))
        .withColumnRenamed("g", "group")
        .orderBy("group")
    }),

    // NON-FILE streaming source: the rate-micro-batch GENERATOR drives
    // the exact same checkpointed foreachBatch ingest graph as the
    // file/MemoryStream tiers (q45/q95/q108) — proving the graph is
    // source-agnostic (the reference's own ingest is a broker consumer
    // loop, examples/3_iot_datastore_with_mqtt.py). The generator's
    // value->point transform is closed-form, the stream filters to the
    // prefix [0, 3000), so the converged store is deterministic and
    // the oracle replays it from range() alone — no file is ever read.
    "q157_stream_rate_ingest" -> ((s, dir) => {
      import graft.streaming.StreamingIngest
      val db = graft.engine.GraftDB.inMemory(s)
      val ckpt = graft.util.Scratch.dir("rateckpt")
      StreamingIngest.ingestRate(s, db, rowsPerBatch = 500, totalRows = 3000L, ckpt)
      db.allDF()
        .groupBy(element_at(col(graft.model.Point.TagsCol), "sensor").as("sensor"))
        .agg(count(lit(1)).as("n"),
          sum(element_at(col(graft.model.Point.FieldsCol), "v")).cast("long").as("sum_v"),
          unix_millis(min(col(graft.model.Point.TimeCol))).as("min_ts_ms"),
          unix_millis(max(col(graft.model.Point.TimeCol))).as("max_ts_ms"))
        .orderBy("sensor")
    }),

    // BROKER ingest through the CUSTOM DataSourceV2 connector
    // (`graft-log`, streaming/LogSource.scala): a producer seals the
    // deterministic prefix [0, 2400) into immutable segment files (the
    // reference's MQTT consumer shape, examples/3_iot_datastore_with_
    // mqtt.py:56-120, re-expressed as a replayable offset log), and
    // Trigger.AvailableNow + admission control (700 records/trigger)
    // drain it through the EXACTLY-ONCE foreachBatch append graph into
    // a parquet-backed store — durable per-batch tokens dedup any
    // replay, so the converged state is the closed form of the
    // published set and the oracle replays it from range() alone.
    "q171_stream_log_ingest" -> ((s, dir) => {
      import graft.streaming.{GraftLogProducer, StreamingIngest}
      val log = graft.util.Scratch.dir("graftlogq")
      val producer = new GraftLogProducer(log)
      (0 until 6).foreach(seg =>
        producer.publish((seg * 400 until (seg + 1) * 400).map(_.toString)))
      val db = graft.engine.GraftDB.atPath(s, graft.util.Scratch.dir("graftlogqdb"))
      StreamingIngest.drainLog(s, db, log, maxRecordsPerTrigger = 700L,
        graft.util.Scratch.dir("graftlogqckpt"))
      db.allDF()
        .groupBy(element_at(col(graft.model.Point.TagsCol), "sensor").as("sensor"))
        .agg(count(lit(1)).as("n"),
          sum(element_at(col(graft.model.Point.FieldsCol), "v")).cast("long").as("sum_v"),
          unix_millis(min(col(graft.model.Point.TimeCol))).as("min_ts_ms"),
          unix_millis(max(col(graft.model.Point.TimeCol))).as("max_ts_ms"))
        .orderBy("sensor")
    }),

    // COMPACTED-TOPIC drain — Kafka's cleanup.policy=compact completes
    // the retention triple beside retention.ms/retention.bytes:
    // overlapping publishes write each value in [0, 900) one to four
    // times across five segments; compactTopic() keeps only each
    // record's LATEST occurrence (keyless records: the record is its
    // own key — pure idempotent dedup), never rewrites the newest
    // segment, and preserves surviving offsets with gaps — then the
    // UNCHANGED q171 exactly-once ingest graph drains the compacted
    // topic and converges to exactly one point per value. A failed
    // drop (duplicates) or an over-drop both shift the per-sensor
    // counts, so the compaction semantics are under the hash gate.
    "q197_stream_log_compacted" -> ((s, dir) => {
      import graft.streaming.{GraftLogProducer, StreamingIngest}
      val log = graft.util.Scratch.dir("graftlogcmp")
      val producer = new GraftLogProducer(log)
      // segments 0..3 overlap their successors by 100 values; the
      // newest segment repeats [800, 900) once more
      (0 until 4).foreach(seg =>
        producer.publish((seg * 200 until seg * 200 + 300).map(_.toString)))
      producer.publish((800 until 900).map(_.toString))
      producer.compactTopic()
      val db = graft.engine.GraftDB.atPath(s, graft.util.Scratch.dir("graftlogcmpdb"))
      StreamingIngest.drainLog(s, db, log, maxRecordsPerTrigger = 700L,
        graft.util.Scratch.dir("graftlogcmpckpt"))
      db.allDF()
        .groupBy(element_at(col(graft.model.Point.TagsCol), "sensor").as("sensor"))
        .agg(count(lit(1)).as("n"),
          sum(element_at(col(graft.model.Point.FieldsCol), "v")).cast("long").as("sum_v"),
          unix_millis(min(col(graft.model.Point.TimeCol))).as("min_ts_ms"),
          unix_millis(max(col(graft.model.Point.TimeCol))).as("max_ts_ms"))
        .orderBy("sensor")
    }),

    // COMPACT,DELETE composition — Kafka's combined
    // `cleanup.policy=compact,delete`, the common production setting,
    // gated as ONE topic lifecycle: overlapping publishes write each
    // value in [0, 600) once or twice across five segments (seg s =
    // [s*100, s*100+200)); compactTopic() keeps each value's LATEST
    // occurrence (seal times carried forward — the r14 fix this entry
    // puts under the hash gate); then retention.ms
    // (truncateOlderThanMs at deterministic seal stamps) expires the
    // two oldest COMPACTED segments; the unchanged q171 exactly-once
    // graph drains the remainder. Survivors = values whose latest
    // occurrence sits at offset >= 400 = exactly [200, 600) — an
    // under-carried seal time (retention expiring nothing, extra
    // rows) or an over-drop (missing rows) both shift the closed form.
    "q198_stream_log_compact_delete" -> ((s, dir) => {
      import graft.streaming.{GraftLog, GraftLogProducer, StreamingIngest}
      val log = graft.util.Scratch.dir("graftlogcmpdel")
      val producer = new GraftLogProducer(log)
      (0 until 5).foreach(seg =>
        producer.publish((seg * 100 until seg * 100 + 200).map(_.toString)))
      // deterministic seal times: segment i sealed at t0 + i minutes-ish
      val conf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(log).getFileSystem(conf)
      val t0 = 1704067200000L
      GraftLog.listSegments(log, conf).zipWithIndex.foreach { case (seg, i) =>
        fs.setTimes(new org.apache.hadoop.fs.Path(seg.path), t0 + i * 1000000L, -1)
      }
      producer.compactTopic()
      // horizon t0+1.5e6 lands between segment 1 and segment 2's seal
      // stamps — the COMPACTED rewrites must still carry them
      producer.truncateOlderThanMs(maxAgeMs = 8500000L, nowMs = t0 + 10000000L)
      val db = graft.engine.GraftDB.atPath(s, graft.util.Scratch.dir("graftlogcmpdeldb"))
      StreamingIngest.drainLog(s, db, log, maxRecordsPerTrigger = 700L,
        graft.util.Scratch.dir("graftlogcmpdelckpt"))
      db.allDF()
        .groupBy(element_at(col(graft.model.Point.TagsCol), "sensor").as("sensor"))
        .agg(count(lit(1)).as("n"),
          sum(element_at(col(graft.model.Point.FieldsCol), "v")).cast("long").as("sum_v"),
          unix_millis(min(col(graft.model.Point.TimeCol))).as("min_ts_ms"),
          unix_millis(max(col(graft.model.Point.TimeCol))).as("max_ts_ms"))
        .orderBy("sensor")
    }),

    // PER-PARTITION compaction — Kafka's cleaner runs per partition:
    // three p-NNNN sub-logs each publish their residue class of
    // [0, 900) with overlapping segments (each value once or twice),
    // GraftLog.compactPartitions dedups each sub-log independently
    // under its OWN maintenance lock, and the PARTITIONED source
    // drains the union through the exactly-once graph — converging to
    // exactly one point per value. Cross-partition interference (one
    // partition's pass dropping another's records) or a failed
    // per-partition dedup both shift the closed form.
    "q199_stream_log_partitioned_compacted" -> ((s, dir) => {
      import graft.streaming.{GraftLog, GraftLogProducer, StreamingIngest}
      val topic = graft.util.Scratch.dir("graftplogcmp")
      (0 until 3).foreach { p =>
        val prod = new GraftLogProducer(GraftLog.partitionDir(topic, p))
        val vs = (0 until 900).filter(_ % 3 == p).map(_.toString)
        prod.publish(vs.slice(0, 150))
        prod.publish(vs.slice(100, 250)) // re-publishes 50 overlap values
        prod.publish(vs.slice(200, 300)) // newest: 50 more overlaps
      }
      GraftLog.compactPartitions(topic, s.sparkContext.hadoopConfiguration)
      val db = graft.engine.GraftDB.atPath(s, graft.util.Scratch.dir("graftplogcmpdb"))
      StreamingIngest.drainPartitionedLog(s, db, topic,
        maxRecordsPerTrigger = 500L, graft.util.Scratch.dir("graftplogcmpckpt"))
      db.allDF()
        .groupBy(element_at(col(graft.model.Point.TagsCol), "sensor").as("sensor"))
        .agg(count(lit(1)).as("n"),
          sum(element_at(col(graft.model.Point.FieldsCol), "v")).cast("long").as("sum_v"),
          unix_millis(min(col(graft.model.Point.TimeCol))).as("min_ts_ms"),
          unix_millis(max(col(graft.model.Point.TimeCol))).as("max_ts_ms"))
        .orderBy("sensor")
    }),

    // SOCKET ingest under the oracle (was suite-only): an in-process
    // line server pushes the deterministic prefix [0, 1500) over TCP
    // and Spark's socket source drives the SAME checkpointed ingest
    // graph — the literal broker-consumer loop. Distinct closed-form
    // constants from q157/q171 so each source's gate is its own.
    "q172_stream_socket_ingest" -> ((s, dir) => {
      import graft.streaming.StreamingIngest
      val db = graft.engine.GraftDB.inMemory(s)
      StreamingIngest.ingestSocketValues(s, db, total = 1500,
        graft.util.Scratch.dir("sockckpt"))
      db.allDF()
        .groupBy(element_at(col(graft.model.Point.TagsCol), "sensor").as("sensor"))
        .agg(count(lit(1)).as("n"),
          sum(element_at(col(graft.model.Point.FieldsCol), "v")).cast("long").as("sum_v"),
          unix_millis(min(col(graft.model.Point.TimeCol))).as("min_ts_ms"),
          unix_millis(max(col(graft.model.Point.TimeCol))).as("max_ts_ms"))
        .orderBy("sensor")
    }),

    // the connector ROUND TRIP under the oracle: producer seals
    // [0, 1800) into topic A; a relay stream (graft-log SOURCE →
    // closed-form transform v→3v+1 → graft-log SINK, epoch-marker
    // exactly-once) publishes topic B; the exactly-once ingest drains
    // topic B into a store. Three commit protocols compose — offset
    // replay, epoch markers, batch tokens — and the converged state is
    // still a pure function of range(0, 1800).
    "q176_stream_log_relay" -> ((s, dir) => {
      import graft.streaming.{GraftLogProducer, StreamingIngest}
      val topicA = graft.util.Scratch.dir("graftrelayA")
      val topicB = graft.util.Scratch.dir("graftrelayB")
      val producer = new GraftLogProducer(topicA)
      (0 until 6).foreach(seg =>
        producer.publish((seg * 300 until (seg + 1) * 300).map(_.toString)))
      val relay = s.readStream.format("graft-log")
        .option("path", topicA).option("maxRecordsPerTrigger", 500L).load()
        .selectExpr("cast(cast(payload as bigint) * 3 + 1 as string) AS payload")
        .writeStream.format("graft-log")
        .option("path", topicB)
        .option("checkpointLocation", graft.util.Scratch.dir("graftrelayck1"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      relay.awaitTermination()
      val db = graft.engine.GraftDB.inMemory(s)
      StreamingIngest.drainLog(s, db, topicB, maxRecordsPerTrigger = 700L,
        graft.util.Scratch.dir("graftrelayck2"))
      db.allDF()
        .groupBy(element_at(col(graft.model.Point.TagsCol), "sensor").as("sensor"))
        .agg(count(lit(1)).as("n"),
          sum(element_at(col(graft.model.Point.FieldsCol), "v")).cast("long").as("sum_v"))
        .orderBy("sensor")
    }),

    // PARTITIONED topic fan-in — the Kafka parallelism unit the single-
    // directory q171 lacks: three producer sub-dirs (p-0000..p-0002)
    // read as ONE `graft-log` source with a per-partition composite
    // offset (replayable per partition, one Spark input partition per
    // topic-partition segment slice), drained through the UNCHANGED
    // exactly-once ingest graph. Partition p holds the values v ≡ p
    // (mod 3) of [0, 1800), so the union is [0, 1800) no matter how
    // the proportional admission budget interleaved the partitions —
    // and the oracle replays the converged state from range() alone.
    "q177_stream_log_partitioned" -> ((s, dir) => {
      import graft.streaming.{GraftLog, GraftLogProducer, StreamingIngest}
      val topic = graft.util.Scratch.dir("graftplogq")
      (0 until 3).foreach { p =>
        val prod = new GraftLogProducer(GraftLog.partitionDir(topic, p))
        (0 until 1800).filter(_ % 3 == p).grouped(200)
          .foreach(g => prod.publish(g.map(_.toString)))
      }
      val db = graft.engine.GraftDB.atPath(s, graft.util.Scratch.dir("graftplogqdb"))
      StreamingIngest.drainPartitionedLog(s, db, topic,
        maxRecordsPerTrigger = 500L, graft.util.Scratch.dir("graftplogqckpt"))
      db.allDF()
        .groupBy(element_at(col(graft.model.Point.TagsCol), "sensor").as("sensor"))
        .agg(count(lit(1)).as("n"),
          sum(element_at(col(graft.model.Point.FieldsCol), "v")).cast("long").as("sum_v"),
          unix_millis(min(col(graft.model.Point.TimeCol))).as("min_ts_ms"),
          unix_millis(max(col(graft.model.Point.TimeCol))).as("max_ts_ms"))
        .orderBy("sensor")
    }),

    // the PARTITIONED round trip — four commit protocols composed: a
    // single-dir topic A replays by offset; a relay stream computes
    // v→7v+3 AND the record's target partition (v % 4, the Kafka
    // producer-partitioner contract) and publishes through the
    // PARTITIONED sink (per-sub-log epoch markers, exactly-once per
    // partition); the partitioned source fans the 4 sub-logs back in
    // under composite offsets; the token-committed ingest lands the
    // converged state. Still a pure function of range(0, 1500).
    "q179_stream_log_partitioned_relay" -> ((s, dir) => {
      import graft.streaming.{GraftLogProducer, StreamingIngest}
      val topicA = graft.util.Scratch.dir("graftprelayA")
      val topicB = graft.util.Scratch.dir("graftprelayB")
      val producer = new GraftLogProducer(topicA)
      (0 until 5).foreach(seg =>
        producer.publish((seg * 300 until (seg + 1) * 300).map(_.toString)))
      val relay = s.readStream.format("graft-log")
        .option("path", topicA).option("maxRecordsPerTrigger", 400L).load()
        .selectExpr(
          "cast(cast(payload AS BIGINT) % 4 AS INT) AS partition",
          "cast(cast(payload AS BIGINT) * 7 + 3 AS STRING) AS payload")
        .writeStream.format("graft-log")
        .option("path", topicB).option("partitioned", "true")
        .option("checkpointLocation", graft.util.Scratch.dir("graftprelayck1"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      relay.awaitTermination()
      val db = graft.engine.GraftDB.inMemory(s)
      StreamingIngest.drainPartitionedLog(s, db, topicB,
        maxRecordsPerTrigger = 600L, graft.util.Scratch.dir("graftprelayck2"))
      db.allDF()
        .groupBy(element_at(col(graft.model.Point.TagsCol), "sensor").as("sensor"))
        .agg(count(lit(1)).as("n"),
          sum(element_at(col(graft.model.Point.FieldsCol), "v")).cast("long").as("sum_v"))
        .orderBy("sensor")
    }),

    // MULTI-TOPIC FAN-IN under the oracle — Kafka's subscribe-to-many
    // over MIXED topic kinds: a PLAIN topic "alpha" (values [0, 900))
    // and a PARTITIONED topic "beta" (values [900, 1500) split v % 2
    // across two sub-logs) union as ONE streaming query; Spark's
    // offset log keeps each unioned source's offset separately inside
    // the single checkpoint, and the per-batch token protocol holds
    // for the union — so the converged store is a pure function of
    // the two ranges, independent of interleaving, budget cuts, or
    // partition routing. The kill/resume form (stop mid-drain, forced
    // replay, resume on the union's per-topic offsets) is pinned in
    // LogSourceSpec.
    "q189_stream_multi_topic" -> ((s, dir) => {
      import graft.streaming.{GraftLog, GraftLogProducer, StreamingIngest}
      val base = graft.util.Scratch.dir("graftmtq")
      val alpha = s"$base/alpha"
      val beta = s"$base/beta"
      val pa = new GraftLogProducer(alpha)
      (0 until 900).grouped(250).foreach(g => pa.publish(g.map(_.toString)))
      (0 until 2).foreach { part =>
        val prod = new GraftLogProducer(GraftLog.partitionDir(beta, part))
        (900 until 1500).filter(_ % 2 == part).grouped(200)
          .foreach(g => prod.publish(g.map(_.toString)))
      }
      val db = graft.engine.GraftDB.atPath(s, graft.util.Scratch.dir("graftmtqdb"))
      StreamingIngest.drainTopics(s, db,
        Seq(alpha -> false, beta -> true),
        maxRecordsPerTrigger = 400L, graft.util.Scratch.dir("graftmtqckpt"))
      db.allDF()
        .groupBy(
          element_at(col(graft.model.Point.TagsCol), "topic").as("topic"),
          element_at(col(graft.model.Point.TagsCol), "sensor").as("sensor"))
        .agg(count(lit(1)).as("n"),
          sum(element_at(col(graft.model.Point.FieldsCol), "v")).cast("long").as("sum_v"))
        .orderBy("topic", "sensor")
    }),

    // KMV set algebra — theta-sketch-style union/intersection/Jaccard
    // estimates from two COORDINATED bottom-k samples ("how many
    // distinct users did BOTH signup and purchase" from two KB
    // sketches, no corpus DISTINCT, no raw join); the oracle replays
    // the coordinated samples and the closed-form estimators
    "q164_kmv_set_ops" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      graft.analytics.Sketch.kmvSetOps(
        e.filter(col("event_type") === "signup"), col("user_id"),
        e.filter(col("event_type") === "purchase"), col("user_id"), k = 256)
    }),

    // day-of-week SEASONALITY profile — the TSDB capacity-planning
    // staple ("is weekend traffic different"): per (series, dow) count
    // and mean, with the sum carried as DECIMAL (order-free, exact)
    // and the mean a raw quotient of deterministic values — engine-
    // exact end to end. One bounded-width shuffle (series × 7 rows).
    "q170_seasonality" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("value").isNotNull && col("ts_us").isNotNull)
        .groupBy(col("event_type"),
          ((expr("ts_us div 86400000000") + 3) % 7).cast("long").as("dow"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_v"))
        .select(col("event_type"), col("dow"), col("n"), col("sum_v"),
          (col("sum_v") / col("n")).as("mean_v"))
        .orderBy("event_type", "dow")),

    // per-slice HLL cardinality table — the grouped sibling of q121
    // (and the HLL counterpart of the KMV slice table q132)
    "q155_hll_by_slice" -> ((s, dir) =>
      graft.analytics.Sketch.hllDistinctByGroup(
        Tables.events(s, dir).select(col("event_type"),
          concat(col("user_id").cast("string"), lit(":"),
            expr("ts_us div 86400000000").cast("string")).as("v")),
        "event_type", col("v"), p = 8)
        .orderBy("group")),

    // distribution shape: equi-width value histogram with a clamped
    // overflow bin, empty bins emitted, exact cumulative counts
    "q150_histogram" -> ((s, dir) =>
      graft.analytics.Stats.histogram(
        Tables.events(s, dir).filter(col("value").isNotNull),
        col("value"), lo = 0.0, width = 25.0, nBins = 12)
        .orderBy("bucket")),

    // per-series linear TREND: slope/corr of value against event time
    // (seconds) for every event_type — the drift monitor; same
    // micro-unit + decimal-moment exactness as q123, keyed
    // x = seconds since a FIXED epoch shift (2023-11-14): micro
    // quantization then needs only ~1e12-scale integers, so the
    // decimal-38 moment sums hold to 1e9-row groups — raw epoch
    // seconds would overflow n·Σx² at ~1e4 rows/group
    "q151_trend_by_series" -> ((s, dir) =>
      graft.analytics.Stats.corrRegressionByGroup(
        Tables.events(s, dir), "event_type",
        expr("ts_us div 1000000 - 1700000000L"), col("value"))
        .orderBy("group")),

    // the GROUPED quantile sketch: per-type p50/p90/p99 from k=256
    // bottom-k-by-hash samples riding a bounded aggregate — the
    // "p99 per service" shape; deterministic like q148, per key
    "q149_group_quantile_sketch" -> ((s, dir) =>
      graft.analytics.Sketch.bottomKQuantilesByGroup(
        Tables.events(s, dir).select(col("event_type"), col("event_id"), col("value")),
        "event_type", "event_id", col("value"), k = 256)
        .orderBy("group")),

    // lead-lag analysis: does signup volume lead purchase volume —
    // Pearson between dense daily count series at lags 0..3; counts
    // stay integers, one closed-form division per lag row
    "q145_cross_corr" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val day = expr("ts_us div 86400000000")
      val rng = e.agg(min(day).as("lo"), max(day).as("hi"))
      val grid = rng.select(explode(sequence(col("lo"), col("hi"))).as("d"))
      def dense(t: String, out: String) = {
        val c = e.filter(col("event_type") === t)
          .groupBy(day.as("d")).agg(count(lit(1)).as("c"))
        grid.join(c, Seq("d"), "left")
          .select(col("d"), coalesce(col("c"), lit(0L)).as(out))
      }
      graft.analytics.Stats.crossCorrelation(
        dense("signup", "x"), dense("purchase", "y"), lags = Seq(0, 1, 2, 3))
        .orderBy("lag")
    }),

    // CUSUM changepoint, float-free: n·P_k − k·S is exactly n·Σ(x−μ),
    // so the peak deviation point is located in pure integers — the
    // level-shift detector with no float mean in any term
    "q142_cusum" -> ((s, dir) =>
      graft.analytics.TimeSeries.cusumChangepoint(
        Tables.events(s, dir).select(col("event_type"), col("ts_us"),
          col("event_id"), col("value")),
        "event_type", "ts_us", "event_id", "value")
        .orderBy("event_type")),

    // TSDB INTEGRAL/time-weighted average over 1h tumbling windows:
    // LOCF weighting inside the window, micro-quantized values x
    // integer spans summed as decimals, one division per window row
    "q140_twa" -> ((s, dir) =>
      graft.analytics.TimeSeries.timeWeightedAvg(
        Tables.events(s, dir).select(col("event_id"), col("ts_us"),
          col("event_type"), col("value")),
        "event_type", "ts_us", "event_id", "value", windowUs = 3600000000L)
        .orderBy("event_type", "window_start_us"))
  )

  val oracleSql: Map[String, String] = Map(
    "q30_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q31_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q32_join_multiway" ->
      """SELECT r_name, n_name, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q33_window_rank" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) s
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q34_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "q35_except" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
        |ORDER BY custkey""".stripMargin,
    "q36_intersect" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,
    "q75_semi_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q76_ranking" ->
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
        |  percent_rank() OVER w AS prank
        |FROM orders WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q78_ranking_scalable" ->
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
        |  percent_rank() OVER w AS prank
        |FROM orders WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q77_pivot" ->
      """SELECT o_orderstatus AS status,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS p1,
        |  count(*) FILTER (o_orderpriority = '2-HIGH') AS p2,
        |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
        |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
        |  count(*) FILTER (o_orderpriority = '5-LOW') AS p5
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,
    "q37_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q38_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q39_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q40_window_tumbling" ->
      """SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day_us, event_type""".stripMargin,
    "q45_stream_tumbling" ->
      """SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day_us, event_type""".stripMargin,
    "q49_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q87_stream_sliding" ->
      """WITH e AS (SELECT event_type, value, epoch_us(ts) // 1000000 AS sec FROM events),
        |w AS (SELECT event_type, value,
        |  unnest([(sec // 43200) * 43200, (sec // 43200) * 43200 - 43200]) AS wstart FROM e)
        |SELECT wstart * 1000000 AS wstart_us, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY wstart_us, event_type""".stripMargin,
    "q89_stream_session" ->
      """WITH e AS (SELECT user_id, value, epoch_us(ts) AS us FROM events),
        |b AS (SELECT user_id, value, us,
        |  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 3600000000 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |g AS (SELECT user_id, value, us,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS grp FROM b)
        |SELECT min(us) AS wstart_us, max(us) + 3600000000 AS wend_us, user_id,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, grp ORDER BY user_id, wstart_us""".stripMargin,

    "q80_stream_stream_join" ->
      """SELECT p.event_id AS pid, v.event_id AS vid
        |FROM events p JOIN events v ON p.user_id = v.user_id
        |  AND p.event_type = 'purchase' AND v.event_type = 'view'
        |  AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts + INTERVAL 1 HOUR
        |ORDER BY pid, vid""".stripMargin,
    "q95_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type,
        |  epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us
        |FROM events ORDER BY user_id, event_type, day_us""".stripMargin,
    "q73_session_window" ->
      """WITH m AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |b AS (SELECT user_id, event_id, ts_us,
        |  CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS brk
        |  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT user_id, ts_us,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM b)
        |SELECT user_id, count(*) AS n_events, min(ts_us) AS start_us
        |FROM s GROUP BY user_id, session_seq ORDER BY user_id, start_us""".stripMargin,
    "q48_interval_join" ->
      """WITH w AS (SELECT DISTINCT date_trunc('day', ts) AS wstart FROM events),
        |j AS (SELECT epoch_us(w.wstart) AS wstart_us, e.value
        |      FROM events e JOIN w ON e.ts >= w.wstart AND e.ts <= w.wstart + INTERVAL 8 HOUR)
        |SELECT wstart_us, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q47_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q46_gap_fill" ->
      """WITH obs AS (
        |  SELECT event_type AS key, (CAST(epoch(ts) AS BIGINT) // 86400) * 86400 AS bucket,
        |         arg_max(value, ts) AS v
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT key, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1),
        |grid AS (SELECT key, unnest(range(lo, hi + 86400, 86400)) AS bucket FROM rng),
        |j AS (SELECT g.key, g.bucket, o.v FROM grid g LEFT JOIN obs o USING (key, bucket)),
        |f AS (SELECT key, bucket, v AS observed,
        |      last_value(v IGNORE NULLS) OVER (PARTITION BY key ORDER BY bucket
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled FROM j)
        |SELECT key, bucket * 1000000 AS bucket_us, observed, filled
        |FROM f ORDER BY key, bucket_us""".stripMargin,
    "q41_asof_join" ->
      """SELECT e.event_id,
        |  (SELECT max(epoch_us(e2.ts)) FROM events e2
        |   WHERE e2.user_id = e.user_id AND e2.event_type = 'signup'
        |     AND (e2.ts < e.ts OR (e2.ts = e.ts AND e2.event_id <= e.event_id))) AS signup_us
        |FROM events e WHERE e.event_type = 'purchase' ORDER BY e.event_id""".stripMargin,
    "q42_lag_delta" ->
      """SELECT event_id,
        |  value - lag(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS dv
        |FROM events ORDER BY event_id""".stripMargin,
    "q43_moving_sum" ->
      """SELECT event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mv
        |FROM events ORDER BY event_id""".stripMargin,
    "q44_scalar_fns" ->
      """SELECT o_orderkey, upper(o_orderpriority) AS pri,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  substr(o_orderstatus, 1, 1) AS st,
        |  CAST(length(o_orderpriority) AS BIGINT) AS prilen
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q71_downsample" ->
      """WITH e AS (SELECT event_type AS measurement, epoch_us(ts) AS ts_us, value, event_id FROM events),
        |w AS (SELECT measurement, (ts_us // 86400000000) * 86400000000 AS win_us, ts_us, value, event_id FROM e),
        |r AS (SELECT measurement, win_us, value,
        |  row_number() OVER (PARTITION BY measurement, win_us ORDER BY ts_us DESC, event_id DESC) AS rn FROM w)
        |SELECT measurement, win_us, value AS last_value FROM r WHERE rn = 1
        |ORDER BY measurement, win_us""".stripMargin,
    "q103_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q72_salted_join" ->
      """SELECT o.o_orderpriority AS pri, count(*) AS n,
        |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY pri""".stripMargin,
    "q105_zorder_stats" ->
      """WITH e AS (SELECT (user_id % 1024) AS xq,
        |                  ((epoch_us(ts) // 3600000000) % 1024) AS yq FROM events),
        |s0 AS (SELECT xq, yq, (xq & 65535) AS a, (yq & 65535) AS b FROM e),
        |s1 AS (SELECT xq, yq, ((a | (a << 8)) & 16711935) AS a, ((b | (b << 8)) & 16711935) AS b FROM s0),
        |s2 AS (SELECT xq, yq, ((a | (a << 4)) & 252645135) AS a, ((b | (b << 4)) & 252645135) AS b FROM s1),
        |s3 AS (SELECT xq, yq, ((a | (a << 2)) & 858993459) AS a, ((b | (b << 2)) & 858993459) AS b FROM s2),
        |s4 AS (SELECT xq, yq, ((a | (a << 1)) & 1431655765) AS a, ((b | (b << 1)) & 1431655765) AS b FROM s3),
        |z AS (SELECT xq, yq, (a | (b << 1)) AS zval FROM s4)
        |SELECT (zval >> 14) AS bucket, count(*) AS n_rows,
        |  min(xq) AS min_x, max(xq) AS max_x, min(yq) AS min_y, max(yq) AS max_y
        |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q108_stream_enrich" ->
      """SELECT n_name, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN nation ON user_id % 25 = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q170_seasonality" ->
      """SELECT event_type,
        |  CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS BIGINT) AS dow,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_v
        |FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q164_kmv_set_ops" ->
      """WITH av AS (SELECT DISTINCT CAST('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
        |            FROM events WHERE event_type = 'signup'),
        |a AS (SELECT h FROM av ORDER BY h LIMIT 256),
        |bv AS (SELECT DISTINCT CAST('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
        |            FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT h FROM bv ORDER BY h LIMIT 256),
        |u AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b) ORDER BY h LIMIT 256),
        |m AS (SELECT count(*) AS k_union, max(h) AS kth_hash,
        |        sum(CASE WHEN h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)
        |            THEN 1 ELSE 0 END) AS n_common FROM u),
        |e AS (SELECT *, CASE WHEN k_union < 256 THEN CAST(k_union AS DOUBLE)
        |        ELSE 255.0 * 4294967296.0 / kth_hash END AS est_union FROM m)
        |SELECT CAST(k_union AS BIGINT) AS k_union, kth_hash,
        |  CAST(n_common AS BIGINT) AS n_common, est_union,
        |  CASE WHEN k_union = 0 THEN 0.0
        |       ELSE CAST(n_common AS DOUBLE) / CAST(k_union AS DOUBLE) * est_union
        |  END AS est_intersection,
        |  CASE WHEN k_union = 0 THEN 0.0
        |       ELSE CAST(n_common AS DOUBLE) / CAST(k_union AS DOUBLE)
        |  END AS jaccard
        |FROM e""".stripMargin,
    "q109_kmv_distinct" ->
      """WITH v AS (SELECT DISTINCT CAST('0x' || substring(md5(
        |    'kmv:' || CAST(user_id AS VARCHAR) || ':' ||
        |    CAST(epoch_us(ts) // 86400000000 AS VARCHAR)), 1, 8) AS BIGINT) AS h
        |  FROM events),
        |k AS (SELECT h FROM v ORDER BY h LIMIT 256)
        |SELECT count(*) AS k_used, max(h) AS kth_hash,
        |  CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
        |       ELSE 255.0 * 4294967296.0 / max(h) END AS est_distinct
        |FROM k""".stripMargin,
    "q117_ewma" -> {
      // SAME Scala-computed literals as the query: Double.toString is
      // shortest-round-trip, DuckDB parses it back to the identical bits
      val termSql = (0 until 8).map(j =>
        s"${math.pow(0.7, j)} * lag(v, $j) OVER fr").mkString(" + ")
      s"""WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id,
         |           CAST(value AS DOUBLE) AS v FROM events),
         |w AS (SELECT event_type, ts_us, event_id,
         |  0.3 * ($termSql) AS ewma,
         |  row_number() OVER fr AS rn
         |  FROM e WINDOW fr AS (PARTITION BY event_type ORDER BY ts_us, event_id))
         |SELECT event_type, ts_us, event_id, ewma FROM w WHERE rn >= 8
         |ORDER BY event_type, ts_us, event_id""".stripMargin
    },
    "q116_moving_anomaly" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id,
        |           CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |w AS (SELECT event_type, ts_us, event_id, v,
        |  CAST(count(*) OVER fr AS DOUBLE) AS wn,
        |  CAST(sum(v) OVER fr AS DOUBLE) AS s1,
        |  CAST(sum(CAST(v*v AS DECIMAL(30,4))) OVER fr AS DOUBLE) AS s2
        |  FROM e WINDOW fr AS (PARTITION BY event_type ORDER BY ts_us, event_id
        |                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |z AS (SELECT event_type, ts_us, event_id, CAST(v AS DOUBLE) AS v, wn,
        |  (CAST(v AS DOUBLE) - s1/wn) / sqrt((wn*s2 - s1*s1)/(wn*wn)) AS z FROM w)
        |SELECT event_type, ts_us, event_id, v, round(z, 6) AS z
        |FROM z WHERE wn >= 7 AND abs(z) > 2.0
        |ORDER BY event_type, ts_us, event_id""".stripMargin,
    // identical to q109's oracle by design: the streamed sketch must
    // land bit-identical to the batch one
    "q112_stream_kmv" ->
      """WITH v AS (SELECT DISTINCT CAST('0x' || substring(md5(
        |    'kmv:' || CAST(user_id AS VARCHAR) || ':' ||
        |    CAST(epoch_us(ts) // 86400000000 AS VARCHAR)), 1, 8) AS BIGINT) AS h
        |  FROM events),
        |k AS (SELECT h FROM v ORDER BY h LIMIT 256)
        |SELECT count(*) AS k_used, max(h) AS kth_hash,
        |  CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
        |       ELSE 255.0 * 4294967296.0 / max(h) END AS est_distinct
        |FROM k""".stripMargin,
    // micro-unit quantization (floor of the same IEEE product) then
    // HUGEINT moment sums — exact and order-free like Spark's decimal
    // sums; the closed-form floats evaluate once, on one row
    "q123_corr_events" ->
      """WITH q AS (SELECT CAST(floor(value * 1e6) AS BIGINT) AS xi,
        |                  CAST(floor(length(props) * 1e6) AS BIGINT) AS yi
        |           FROM events WHERE value IS NOT NULL AND props IS NOT NULL),
        |a AS (SELECT count(*) AS n,
        |  sum(CAST(xi AS HUGEINT)) AS sx, sum(CAST(yi AS HUGEINT)) AS sy,
        |  sum(CAST(xi AS HUGEINT) * yi) AS sxy,
        |  sum(CAST(xi AS HUGEINT) * xi) AS sxx,
        |  sum(CAST(yi AS HUGEINT) * yi) AS syy FROM q)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
        |  round((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
        |    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 1e6, 6) AS intercept
        |FROM a""".stripMargin,
    // sorted 5-row frame, middle element(s) — list() frames match
    // collect_list because the column is null-free in this table
    "q125_rolling_median" ->
      """WITH w AS (SELECT event_id,
        |  list_sort(list(value) OVER (PARTITION BY event_type
        |    ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM events)
        |SELECT event_id,
        |  CASE WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2]
        |       ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1]) / 2.0 END AS rolling_median
        |FROM w ORDER BY event_id""".stripMargin,
    "q127_spearman" ->
      """WITH o AS (SELECT value AS x, length(props) AS y, event_id AS t FROM events
        |           WHERE value IS NOT NULL AND props IS NOT NULL),
        |r AS (SELECT row_number() OVER (ORDER BY x, t) AS rx,
        |             row_number() OVER (ORDER BY y, t) AS ry FROM o),
        |a AS (SELECT count(*) AS n,
        |             sum(CAST((rx - ry) * (rx - ry) AS HUGEINT)) AS sum_d2 FROM r)
        |SELECT CAST(n AS BIGINT) AS n, CAST(sum_d2 AS BIGINT) AS sum_d2,
        |  round(1.0 - 6.0 * CAST(sum_d2 AS DOUBLE) /
        |    CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * n - 1) AS DOUBLE), 6) AS rho
        |FROM a""".stripMargin,
    // the streamed cells must equal the batch sketch of the same rows
    "q126_stream_countmin" ->
      """WITH cells AS (SELECT j,
        |  CAST('0x' || substring(md5('cm' || CAST(j AS VARCHAR) || ':' || event_type), 1, 8) AS BIGINT) % 64 AS p,
        |  count(*) AS c
        |  FROM events, generate_series(0, 3) g(j) GROUP BY 1, 2),
        |terms(term) AS (VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view'), ('zzz')),
        |probe AS (SELECT term, j,
        |  CAST('0x' || substring(md5('cm' || CAST(j AS VARCHAR) || ':' || term), 1, 8) AS BIGINT) % 64 AS p
        |  FROM terms, generate_series(0, 3) g(j))
        |SELECT term, CAST(min(COALESCE(c, 0)) AS BIGINT) AS est
        |FROM probe LEFT JOIN cells USING (j, p) GROUP BY term ORDER BY term""".stripMargin,
    // the DIRECT global sketch — merge losslessness is exactly what
    // equality against the per-slice-merged Spark result checks
    "q130_sketch_rollup" ->
      """WITH v AS (SELECT DISTINCT CAST('0x' || substring(md5(
        |    'kmv:' || CAST(user_id AS VARCHAR) || ':' ||
        |    CAST(epoch_us(ts) // 86400000000 AS VARCHAR)), 1, 8) AS BIGINT) AS h
        |  FROM events),
        |k AS (SELECT h FROM v ORDER BY h LIMIT 256)
        |SELECT count(*) AS k_used, max(h) AS kth_hash,
        |  CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
        |       ELSE 255.0 * 4294967296.0 / max(h) END AS est_distinct
        |FROM k""".stripMargin,
    // identical math to q121's oracle, over the streamed value set
    "q131_stream_hll" ->
      """WITH h AS (SELECT CAST('0x' || substring(md5(
        |    'hll:' || CAST(user_id AS VARCHAR) || ':' ||
        |    CAST(epoch_us(ts) // 86400000000 AS VARCHAR)), 1, 8) AS BIGINT) AS h
        |  FROM events),
        |br AS (SELECT h // 16777216 AS b, h % 16777216 AS rem FROM h),
        |regs AS (SELECT b, max(25 - CASE WHEN rem = 0 THEN 0 ELSE length(bin(rem)) END) AS r
        |         FROM br GROUP BY 1),
        |a AS (SELECT 256 - count(*) AS n_zero_regs,
        |  CAST(sum(1::BIGINT << (25 - r)) + (256 - count(*)) * 33554432 AS BIGINT) AS z_scaled
        |  FROM regs)
        |SELECT CAST(n_zero_regs AS BIGINT) AS n_zero_regs, z_scaled,
        |  round(CASE WHEN n_zero_regs > 0 AND
        |      (0.7213/(1 + 1.079/256)) * 256 * 256 * 33554432.0 / z_scaled <= 640.0
        |    THEN 256.0 * ln(256.0 / n_zero_regs)
        |    ELSE (0.7213/(1 + 1.079/256)) * 256 * 256 * 33554432.0 / z_scaled
        |    END, 4) AS est_distinct
        |FROM a""".stripMargin,
    "q132_kmv_by_slice" ->
      """WITH v AS (SELECT DISTINCT event_type, CAST('0x' || substring(md5(
        |    'kmv:' || CAST(user_id AS VARCHAR) || ':' ||
        |    CAST(epoch_us(ts) // 86400000000 AS VARCHAR)), 1, 8) AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM v),
        |k AS (SELECT event_type, h FROM r WHERE rn <= 256)
        |SELECT event_type, count(*) AS k_used, max(h) AS kth_hash,
        |  CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
        |       ELSE 255.0 * 4294967296.0 / max(h) END AS est_distinct
        |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q135_profile" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props FROM events),
        |p AS (
        |  SELECT 'event_id' AS col, count(*) AS n, count(*) - count(event_id) AS n_nulls,
        |    count(DISTINCT event_id) AS n_distinct,
        |    round(CAST(min(event_id) AS DOUBLE), 6) AS min_num, round(CAST(max(event_id) AS DOUBLE), 6) AS max_num FROM e
        |  UNION ALL
        |  SELECT 'ts_us', count(*), count(*) - count(ts_us), count(DISTINCT ts_us),
        |    round(CAST(min(ts_us) AS DOUBLE), 6), round(CAST(max(ts_us) AS DOUBLE), 6) FROM e
        |  UNION ALL
        |  SELECT 'user_id', count(*), count(*) - count(user_id), count(DISTINCT user_id),
        |    round(CAST(min(user_id) AS DOUBLE), 6), round(CAST(max(user_id) AS DOUBLE), 6) FROM e
        |  UNION ALL
        |  SELECT 'event_type', count(*), count(*) - count(event_type), count(DISTINCT event_type),
        |    NULL, NULL FROM e
        |  UNION ALL
        |  SELECT 'value', count(*), count(*) - count(value), count(DISTINCT value),
        |    round(min(value), 6), round(max(value), 6) FROM e
        |  UNION ALL
        |  SELECT 'props', count(*), count(*) - count(props), count(DISTINCT props),
        |    NULL, NULL FROM e)
        |SELECT col, CAST(n AS BIGINT) AS n, CAST(n_nulls AS BIGINT) AS n_nulls,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  CAST(min_num AS DOUBLE) AS min_num, CAST(max_num AS DOUBLE) AS max_num
        |FROM p ORDER BY col""".stripMargin,
    "q141_gap_fill_linear" ->
      """WITH obs AS (
        |  SELECT event_type AS key, (CAST(epoch(ts) AS BIGINT) // 86400) * 86400 AS bucket,
        |         arg_max(value, ts) AS v
        |  FROM events WHERE user_id % 37 = 0 GROUP BY 1, 2),
        |rng AS (SELECT key, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1),
        |grid AS (SELECT key, unnest(range(lo, hi + 86400, 86400)) AS bucket FROM rng),
        |j AS (SELECT g.key, g.bucket, o.v FROM grid g LEFT JOIN obs o USING (key, bucket)),
        |f AS (SELECT key, bucket, v,
        |  last_value(v IGNORE NULLS) OVER wb AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wb AS pb,
        |  first_value(v IGNORE NULLS) OVER wf AS nv,
        |  first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wf AS nb
        |  FROM j
        |  WINDOW wb AS (PARTITION BY key ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY key ORDER BY bucket
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT key, bucket * 1000000 AS bucket_us, v AS observed,
        |  CASE WHEN v IS NOT NULL THEN v
        |       ELSE pv + (nv - pv) * (CAST(bucket - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))
        |  END AS filled
        |FROM f ORDER BY key, bucket_us""".stripMargin,
    // identical to q148's estimate CTE by construction: the streamed
    // sample must equal the batch bottom-k sample
    "q154_stream_quantile_sketch" ->
      """WITH h AS (SELECT CAST('0x' || substring(md5('bks:' || CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS h,
        |             value AS v FROM events),
        |k AS (SELECT DISTINCT h FROM h ORDER BY h LIMIT 512),
        |s AS (SELECT v FROM h JOIN k USING (h))
        |SELECT CAST(count(*) AS BIGINT) AS n_sample,
        |  round(quantile_cont(v, 0.5), 6) AS est_p500,
        |  round(quantile_cont(v, 0.9), 6) AS est_p900,
        |  round(quantile_cont(v, 0.99), 6) AS est_p990
        |FROM s""".stripMargin,
    // the rate generator's value->point transform replayed from
    // range(): sensor = 's'||(value%7), v = value%100,
    // ts_ms = epoch(2024-01-01) + value*1000
    "q157_stream_rate_ingest" ->
      """WITH v AS (SELECT unnest(range(0, 3000)) AS value)
        |SELECT 's' || CAST(value % 7 AS VARCHAR) AS sensor,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value % 100) AS BIGINT) AS sum_v,
        |  CAST(min(1704067200000 + value * 1000) AS BIGINT) AS min_ts_ms,
        |  CAST(max(1704067200000 + value * 1000) AS BIGINT) AS max_ts_ms
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "q171_stream_log_ingest" ->
      """WITH v AS (SELECT unnest(range(0, 2400)) AS value)
        |SELECT 's' || CAST(value % 5 AS VARCHAR) AS sensor,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value % 90) AS BIGINT) AS sum_v,
        |  CAST(min(1704067200000 + value * 1000) AS BIGINT) AS min_ts_ms,
        |  CAST(max(1704067200000 + value * 1000) AS BIGINT) AS max_ts_ms
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    // compaction keeps exactly one occurrence of each value in [0, 900):
    // the converged ingest is the same closed form as q171 over the
    // deduplicated value set
    "q197_stream_log_compacted" ->
      """WITH v AS (SELECT unnest(range(0, 900)) AS value)
        |SELECT 's' || CAST(value % 5 AS VARCHAR) AS sensor,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value % 90) AS BIGINT) AS sum_v,
        |  CAST(min(1704067200000 + value * 1000) AS BIGINT) AS min_ts_ms,
        |  CAST(max(1704067200000 + value * 1000) AS BIGINT) AS max_ts_ms
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    // compact,delete: survivors are the values whose LATEST occurrence
    // has offset >= 400 (the retention cut) — closed form [200, 600)
    "q198_stream_log_compact_delete" ->
      """WITH v AS (SELECT unnest(range(200, 600)) AS value)
        |SELECT 's' || CAST(value % 5 AS VARCHAR) AS sensor,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value % 90) AS BIGINT) AS sum_v,
        |  CAST(min(1704067200000 + value * 1000) AS BIGINT) AS min_ts_ms,
        |  CAST(max(1704067200000 + value * 1000) AS BIGINT) AS max_ts_ms
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-partition compaction keeps exactly one occurrence of each
    // value in [0, 900) across the three residue-class sub-logs; the
    // partitioned drain's transform (s'||v%6, v%70) over the union
    "q199_stream_log_partitioned_compacted" ->
      """WITH v AS (SELECT unnest(range(0, 900)) AS value)
        |SELECT 's' || CAST(value % 6 AS VARCHAR) AS sensor,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value % 70) AS BIGINT) AS sum_v,
        |  CAST(min(1704067200000 + value * 1000) AS BIGINT) AS min_ts_ms,
        |  CAST(max(1704067200000 + value * 1000) AS BIGINT) AS max_ts_ms
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "q176_stream_log_relay" ->
      """WITH v AS (SELECT unnest(range(0, 1800)) * 3 + 1 AS value)
        |SELECT 's' || CAST(value % 5 AS VARCHAR) AS sensor,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value % 90) AS BIGINT) AS sum_v
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    // the partitioned-topic transform: sensor = 's'||(v%6), v%70,
    // ts_ms = epoch(2024-01-01) + v*1000 over the partitions' union
    "q177_stream_log_partitioned" ->
      """WITH v AS (SELECT unnest(range(0, 1800)) AS value)
        |SELECT 's' || CAST(value % 6 AS VARCHAR) AS sensor,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value % 70) AS BIGINT) AS sum_v,
        |  CAST(min(1704067200000 + value * 1000) AS BIGINT) AS min_ts_ms,
        |  CAST(max(1704067200000 + value * 1000) AS BIGINT) AS max_ts_ms
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    // partitioned relay: the union of the 4 sub-logs is {7v+3} over
    // range(0, 1500) regardless of routing or batch cuts
    "q179_stream_log_partitioned_relay" ->
      """WITH v AS (SELECT unnest(range(0, 1500)) * 7 + 3 AS value)
        |SELECT 's' || CAST(value % 6 AS VARCHAR) AS sensor,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value % 70) AS BIGINT) AS sum_v
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    // multi-topic fan-in: alpha carries [0, 900), beta [900, 1500);
    // the mlog transform tags (topic, sensor='s'||v%4) with field v%50
    "q189_stream_multi_topic" ->
      """WITH v AS (SELECT unnest(range(0, 1500)) AS value)
        |SELECT CASE WHEN value < 900 THEN 'alpha' ELSE 'beta' END AS topic,
        |  's' || CAST(value % 4 AS VARCHAR) AS sensor,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value % 50) AS BIGINT) AS sum_v
        |FROM v GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q172_stream_socket_ingest" ->
      """WITH v AS (SELECT unnest(range(0, 1500)) AS value)
        |SELECT 's' || CAST(value % 6 AS VARCHAR) AS sensor,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value % 80) AS BIGINT) AS sum_v,
        |  CAST(min(1704067200000 + value * 1000) AS BIGINT) AS min_ts_ms,
        |  CAST(max(1704067200000 + value * 1000) AS BIGINT) AS max_ts_ms
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "q155_hll_by_slice" ->
      """WITH h AS (SELECT event_type AS g, CAST('0x' || substring(md5(
        |    'hll:' || CAST(user_id AS VARCHAR) || ':' ||
        |    CAST(epoch_us(ts) // 86400000000 AS VARCHAR)), 1, 8) AS BIGINT) AS h
        |  FROM events),
        |br AS (SELECT g, h // 16777216 AS b, h % 16777216 AS rem FROM h),
        |regs AS (SELECT g, b, max(25 - CASE WHEN rem = 0 THEN 0 ELSE length(bin(rem)) END) AS r
        |         FROM br GROUP BY 1, 2),
        |a AS (SELECT g, 256 - count(*) AS n_zero_regs,
        |  CAST(sum(1::BIGINT << (25 - r)) + (256 - count(*)) * 33554432 AS BIGINT) AS z_scaled
        |  FROM regs GROUP BY g)
        |SELECT g AS "group", CAST(n_zero_regs AS BIGINT) AS n_zero_regs, z_scaled,
        |  round(CASE WHEN n_zero_regs > 0 AND
        |      (0.7213/(1 + 1.079/256)) * 256 * 256 * 33554432.0 / z_scaled <= 640.0
        |    THEN 256.0 * ln(256.0 / n_zero_regs)
        |    ELSE (0.7213/(1 + 1.079/256)) * 256 * 256 * 33554432.0 / z_scaled
        |    END, 4) AS est_distinct
        |FROM a ORDER BY "group"""".stripMargin,
    "q150_histogram" ->
      """WITH b AS (SELECT CAST(least(greatest(floor((value - 0.0) / 25.0), 0), 11) AS INTEGER) AS bucket
        |           FROM events WHERE value IS NOT NULL),
        |c AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1),
        |allb AS (SELECT CAST(unnest(range(0, 12)) AS INTEGER) AS bucket)
        |SELECT a.bucket, 0.0 + a.bucket * 25.0 AS lo_edge, 0.0 + (a.bucket + 1) * 25.0 AS hi_edge,
        |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
        |  CAST(sum(COALESCE(c.n, 0)) OVER (ORDER BY a.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
        |FROM allb a LEFT JOIN c USING (bucket) ORDER BY bucket""".stripMargin,
    "q151_trend_by_series" ->
      """WITH q AS (SELECT event_type AS g,
        |    CAST(floor(CAST(epoch_us(ts) // 1000000 - 1700000000 AS DOUBLE) * 1e6) AS BIGINT) AS xi,
        |    CAST(floor(value * 1e6) AS BIGINT) AS yi
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |a AS (SELECT g, count(*) AS n,
        |  sum(CAST(xi AS HUGEINT)) AS sx, sum(CAST(yi AS HUGEINT)) AS sy,
        |  sum(CAST(xi AS HUGEINT) * yi) AS sxy,
        |  sum(CAST(xi AS HUGEINT) * xi) AS sxx,
        |  sum(CAST(yi AS HUGEINT) * yi) AS syy FROM q GROUP BY g)
        |SELECT g AS "group", CAST(n AS BIGINT) AS n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
        |  round((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
        |    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 1e6, 6) AS intercept
        |FROM a ORDER BY "group"""".stripMargin,
    "q149_group_quantile_sketch" ->
      """WITH h AS (SELECT event_type AS g,
        |    CAST('0x' || substring(md5('bks:' || CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS h,
        |    value AS v FROM events),
        |r AS (SELECT g, h, v, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h),
        |s AS (SELECT g, v FROM r WHERE rn <= 256)
        |SELECT g AS "group", CAST(count(*) AS BIGINT) AS n_sample,
        |  round(quantile_cont(v, 0.5), 6) AS est_p500,
        |  round(quantile_cont(v, 0.9), 6) AS est_p900,
        |  round(quantile_cont(v, 0.99), 6) AS est_p990
        |FROM s GROUP BY g ORDER BY "group"""".stripMargin,
    // the q166 estimator replayed over events (weight = event_id%50+1)
    "q168_stream_priority_sample" ->
      """WITH p AS (SELECT event_id AS id,
        |    CAST(event_id % 50 + 1 AS DOUBLE) AS wt,
        |    CAST(event_id % 50 + 1 AS DOUBLE) /
        |      ((CAST('0x' || substring(md5('ps:' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) + 1)
        |        / 4294967296.0) AS pri
        |  FROM events),
        |t1 AS (SELECT count(*) AS n_top, min(pri) AS min_pri
        |       FROM (SELECT pri FROM p ORDER BY pri DESC, id LIMIT 65)),
        |tau AS (SELECT CASE WHEN n_top = 65 THEN min_pri ELSE 0.0 END AS tau FROM t1),
        |s AS (SELECT id, wt FROM p ORDER BY pri DESC, id LIMIT 64)
        |SELECT CAST(count(*) AS BIGINT) AS k_sample,
        |  CAST(min(floor(least(tau, 9e12) * 1e6)) AS BIGINT) AS tau_micro,
        |  CAST(sum(CAST(floor(least(greatest(wt, tau), 9e12) * 1e6) AS BIGINT)) AS BIGINT) AS est_total_micro
        |FROM s, tau""".stripMargin,
    // identical to q149's CTEs by construction: the streamed grouped
    // samples must equal the batch per-group bottom-k samples
    "q160_stream_group_quantiles" ->
      """WITH h AS (SELECT event_type AS g,
        |    CAST('0x' || substring(md5('bks:' || CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS h,
        |    value AS v FROM events),
        |r AS (SELECT g, h, v, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h),
        |s AS (SELECT g, v FROM r WHERE rn <= 256)
        |SELECT g AS "group", CAST(count(*) AS BIGINT) AS n_sample,
        |  round(quantile_cont(v, 0.5), 6) AS est_p500,
        |  round(quantile_cont(v, 0.9), 6) AS est_p900,
        |  round(quantile_cont(v, 0.99), 6) AS est_p990
        |FROM s GROUP BY g ORDER BY "group"""".stripMargin,
    "q148_quantile_sketch" ->
      """WITH h AS (SELECT CAST('0x' || substring(md5('bks:' || CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS h,
        |             value AS v FROM events),
        |k AS (SELECT DISTINCT h FROM h ORDER BY h LIMIT 512),
        |s AS (SELECT v FROM h JOIN k USING (h)),
        |est AS (SELECT count(*) AS n_sample,
        |  round(quantile_cont(v, 0.5), 6) AS est_p500,
        |  round(quantile_cont(v, 0.9), 6) AS est_p900,
        |  round(quantile_cont(v, 0.99), 6) AS est_p990 FROM s),
        |ex AS (SELECT round(quantile_cont(value, 0.5), 6) AS exact_p500,
        |  round(quantile_cont(value, 0.9), 6) AS exact_p900,
        |  round(quantile_cont(value, 0.99), 6) AS exact_p990 FROM events)
        |SELECT CAST(n_sample AS BIGINT) AS n_sample, est_p500, est_p900, est_p990,
        |  exact_p500, exact_p900, exact_p990
        |FROM est, ex""".stripMargin,
    "q145_cross_corr" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d, event_type FROM events),
        |rng AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
        |grid AS (SELECT unnest(range(lo, hi + 1)) AS d FROM rng),
        |sa AS (SELECT d, count(*) AS c FROM e WHERE event_type = 'signup' GROUP BY 1),
        |sb AS (SELECT d, count(*) AS c FROM e WHERE event_type = 'purchase' GROUP BY 1),
        |xa AS (SELECT g.d, COALESCE(sa.c, 0) AS x FROM grid g LEFT JOIN sa USING (d)),
        |yb AS (SELECT g.d, COALESCE(sb.c, 0) AS y FROM grid g LEFT JOIN sb USING (d)),
        |lags(lag) AS (VALUES (0), (1), (2), (3)),
        |j AS (SELECT l.lag, xa.x, yb.y FROM lags l
        |      CROSS JOIN xa JOIN yb ON yb.d = xa.d + l.lag),
        |m AS (SELECT lag, count(*) AS n,
        |        sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |        sum(CAST(x AS HUGEINT) * y) AS sxy,
        |        sum(CAST(x AS HUGEINT) * x) AS sxx,
        |        sum(CAST(y AS HUGEINT) * y) AS syy
        |      FROM j GROUP BY 1)
        |SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr
        |FROM m ORDER BY lag""".stripMargin,
    "q142_cusum" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id,
        |             CAST(floor(value * 1e6) AS BIGINT) AS vm FROM events),
        |x AS (SELECT event_type, ts_us, event_id,
        |  sum(CAST(vm AS HUGEINT)) OVER (PARTITION BY event_type ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS p,
        |  count(*) OVER (PARTITION BY event_type ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS k,
        |  sum(CAST(vm AS HUGEINT)) OVER (PARTITION BY event_type) AS s,
        |  count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e),
        |c AS (SELECT event_type, ts_us, event_id, k, n * p - k * s AS cval FROM x),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY abs(cval) DESC, ts_us, event_id) AS rn FROM c)
        |SELECT event_type, CAST(ts_us AS BIGINT) AS peak_ts_us,
        |  CAST(k AS BIGINT) AS peak_seq, CAST(cval AS BIGINT) AS cusum_scaled
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q137_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |x AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 1800000000
        |        THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sess FROM x),
        |a1 AS (SELECT user_id, sess,
        |         min(CASE WHEN event_type = 'signup' THEN ts_us END) AS s1
        |       FROM s GROUP BY 1, 2),
        |a2 AS (SELECT s.user_id, s.sess, any_value(a1.s1) AS s1,
        |         min(CASE WHEN s.event_type = 'click' AND s.ts_us > a1.s1 THEN s.ts_us END) AS s2
        |       FROM s JOIN a1 USING (user_id, sess) GROUP BY 1, 2),
        |a3 AS (SELECT s.user_id, s.sess, any_value(a2.s1) AS s1, any_value(a2.s2) AS s2,
        |         min(CASE WHEN s.event_type = 'purchase' AND s.ts_us > a2.s2 THEN s.ts_us END) AS s3
        |       FROM s JOIN a2 USING (user_id, sess) GROUP BY 1, 2)
        |SELECT count(*) AS n_sessions,
        |  CAST(sum(CASE WHEN s1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS reached_1,
        |  CAST(sum(CASE WHEN s2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS reached_2,
        |  CAST(sum(CASE WHEN s3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS reached_3
        |FROM a3""".stripMargin,
    "q138_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS d FROM events),
        |c AS (SELECT u, min(d) AS cohort_day FROM ud GROUP BY 1)
        |SELECT cohort_day, d - cohort_day AS day_offset,
        |  CAST(count(DISTINCT u) AS BIGINT) AS n_users
        |FROM ud JOIN c USING (u) WHERE d - cohort_day <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q139_derivative" ->
      """SELECT event_id,
        |  CASE WHEN ts_us - lag(ts_us) OVER w > 0
        |    THEN (value - lag(value) OVER w) / (CAST(ts_us - lag(ts_us) OVER w AS DOUBLE) / 1e6)
        |  END AS rate_per_s
        |FROM (SELECT event_id, event_type, epoch_us(ts) AS ts_us, value FROM events)
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id)
        |ORDER BY event_id""".stripMargin,
    "q140_twa" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us,
        |             CAST(floor(value * 1e6) AS BIGINT) AS vm FROM events),
        |x AS (SELECT event_type, ts_us - ts_us % 3600000000 AS win, vm,
        |        COALESCE(lead(ts_us) OVER (PARTITION BY event_type, ts_us - ts_us % 3600000000
        |          ORDER BY ts_us, event_id) - ts_us, 0) AS dt
        |      FROM e),
        |g AS (SELECT event_type, win AS window_start_us, count(*) AS n_points,
        |        sum(CAST(vm AS HUGEINT) * dt) AS vdt, sum(CAST(dt AS HUGEINT)) AS t
        |      FROM x GROUP BY 1, 2)
        |SELECT event_type, window_start_us, CAST(n_points AS BIGINT) AS n_points,
        |  CASE WHEN t > 0 THEN round(CAST(vdt AS DOUBLE) / CAST(t AS DOUBLE) / 1e6, 6) END AS twa
        |FROM g ORDER BY event_type, window_start_us""".stripMargin
  )
}
