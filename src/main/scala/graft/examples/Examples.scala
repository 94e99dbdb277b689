package graft.examples

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.TimeSeries
import graft.engine.GraftDB
import graft.model.Point
import graft.query._
import graft.sources.{ReferenceCsv, Tables}
import graft.streaming.StreamingIngest

/** The reference's four example programs re-expressed on this engine —
  * the migration story end-to-end (reference: `examples/`):
  *
  *   1. `1_initializing_and_loading_new_db.ipynb` — build a database
  *      from external tabular data, two measurements, bulk + single
  *      inserts.
  *   2. `2_analytics_workflow.ipynb` — time-window queries, metadata
  *      introspection, then aggregation/moving averages. The reference
  *      collects points and does the math in pandas; here the same
  *      analysis stays IN the engine as DataFrame transforms.
  *   3. `3_iot_datastore_with_mqtt.py` — a continuously-fed datastore.
  *      The MQTT callback loop becomes Structured Streaming ingest with
  *      checkpointing (any stream source; the example uses a file/
  *      memory stream).
  *   4. `4_backing_up_tinyflux_at_the_edge.py` — periodic incremental
  *      backup of "points since the last backup" to an external store,
  *      via a time query + reference-CSV export.
  *
  * Each `run` returns the result the reference example prints, so
  * `ExamplesSpec` smoke-checks all four.
  */
object Examples {

  /** Example 1: load external tabular data as Points (events table
    * standing in for the AQI CSV), two measurements, bulk + single
    * insert, persistent parquet store.
    */
  def loading(spark: SparkSession, sfDir: String, dbDir: String): GraftDB = {
    val db = GraftDB.atPath(spark, dbDir)
    // bulk measurement: map source rows to canonical Points (the
    // notebook's row->Point loop, as one declarative projection)
    val aqi = Tables.events(spark, sfDir).limit(500).select(
      col("time"),
      lit("aqi").as(Point.MeasurementCol),
      map(lit("site"), col("user_id").cast("string")).as(Point.TagsCol),
      map(lit("aqi"), col("value")).as(Point.FieldsCol))
    db.insertDF(aqi)
    // second measurement via the single-insert path (the geojson loop)
    db.insert(Point(Instant.parse("2019-01-01T08:00:00Z"), "locations",
      Map("site" -> "1"), Map("latitude" -> 37.77, "longitude" -> -122.42)))
    db
  }

  /** Example 2: the analytics workflow — metadata introspection, a
    * windowed compound query, and a per-site daily rollup + moving
    * average computed in-engine (the reference exports to pandas).
    */
  def analytics(db: GraftDB): (Seq[String], Long, DataFrame, DataFrame) = {
    val measurements = db.getMeasurements
    val t0 = Instant.parse("2024-01-05T00:00:00Z")
    val t1 = Instant.parse("2024-01-20T00:00:00Z")
    val windowed = (TimeQuery() >= t0) & (TimeQuery() < t1) & (FieldQuery("aqi") >= 100.0)
    val unhealthyDays = db.count(windowed)
    // daily mean per site, and a 7-point moving average — the
    // notebook's get_moving_average, distributed
    val perSite = db.measurement("aqi").searchDF(Noop)
    val daily = TimeSeries.tumblingAgg(perSite, "1 day", "aqi", tagKey = Some("site"))
    val smoothed = TimeSeries.movingAgg(perSite, "aqi", tagKey = "site", nRows = 7)
    (measurements, unhealthyDays, daily, smoothed)
  }

  /** Example 3: continuous ingest — the MQTT on_message callback is a
    * streaming source feeding checkpointed micro-batch appends.
    */
  def iotIngest(spark: SparkSession, stream: DataFrame, db: GraftDB, ckptDir: String) =
    StreamingIngest.start(stream, db, ckptDir, lateness = "10 minutes")

  /** Example 4: incremental backup — everything newer than the last
    * backup watermark exported in the reference's own file format (the
    * role influx plays in the original example).
    */
  def incrementalBackup(db: GraftDB, lastBackup: Instant, outFile: String): Long = {
    val fresh = db.searchDF(TimeQuery() > lastBackup)
    val n = fresh.count()
    if (n > 0) ReferenceCsv.writeFile(fresh, outFile)
    n
  }

  /** Example 5 (beyond the reference): the training-data curation
    * pipeline as a user writes it — the composition every LLM-data team
    * ships, in ~ten lines of public API:
    *
    *   1. exact-dedup the corpus (keep first occurrence);
    *   2. near-dup sweep: MinHash candidates confirmed by edit
    *      distance, drop the confirmed smaller-id twins;
    *   3. model-quality filter (hashed-linear classifier keep set);
    *   4. fill a token budget with the best-scoring survivors;
    *   5. pack the selection into training chunks.
    *
    * Returns (selected docs with chunk ids, per-stage row counts) so
    * the spec can assert the funnel narrows monotonically.
    */
  def curationPipeline(spark: SparkSession, sfDir: String,
      tokenBudget: Long = 20000L): (DataFrame, Seq[(String, Long)]) = {
    import graft.analytics.{Curation, Dedup, TextAnalysis}
    val docs = Tables.table(spark, sfDir, "documents")

    val survivors = Dedup.exactSurvivorIds(docs, Seq("text"), "doc_id")
    val d1 = docs.join(survivors, "doc_id")

    val candidates = Dedup.minHashLshPairs(d1, "doc_id", "text",
      shingleN = 3, numHashes = 63, bands = 21, threshold = 0.5)
    val confirmedDups = Dedup.editDistanceConfirm(
        candidates.select("i", "j"), d1, "doc_id", "text", maxRatioPct = 20)
      .filter(col("confirmed")).select(col("j").as("doc_id")).distinct()
    val d2 = d1.join(confirmedDups, Seq("doc_id"), "left_anti")

    val quality = TextAnalysis.hashedLinearQuality(d2, "doc_id", "text")
      .filter(col("keep"))
      .select(col("doc_id"), col("n_tokens"), col("score"))
    val d3 = d2.select("doc_id", "source").join(quality, "doc_id")

    val selected = Curation.budgetSelect(
      d3.select(col("doc_id"), col("n_tokens"), col("score")),
      Seq(col("score").desc, col("doc_id")), "n_tokens", budget = tokenBudget)

    val packed = Curation.packChunks(
      selected.join(d3.select("doc_id", "source"), "doc_id"),
      Seq("source"), "doc_id", "n_tokens", budget = 2000L)

    val counts = Seq(
      "corpus" -> docs.count(), "exact_dedup" -> d1.count(),
      "near_dedup" -> d2.count(), "quality" -> d3.count(),
      "budget" -> selected.count())
    (packed, counts)
  }

  /** Example 6 — the VIDEO curation pipeline (the multimodal sibling
    * of example 5), composed from the public API over real
    * MJPEG-in-AVI assets:
    *   1. demux + per-frame JPEG decode (`sampleMjpegAviFrames`) —
    *      corrupt containers flag, they don't kill the sweep;
    *   2. scene segmentation + representative selection
    *      (`sceneRepresentatives`);
    *   3. exact frame dedup ACROSS assets by decoded luma signature
    *      (reposted clips collapse to one representative).
    *
    * Returns (kept representative frames, per-stage counts) so the
    * spec can assert the funnel narrows and corrupt assets survive
    * as flags.
    */
  def videoPipeline(spark: SparkSession, assets: DataFrame,
      cutThreshold: Int = 50): (DataFrame, Seq[(String, Long)]) = {
    import graft.analytics.Dedup
    import graft.multimodal.Multimodal
    val frames = Multimodal.sampleMjpegAviFrames(assets, "asset_id", "payload", stride = 1)
    val decoded = frames.filter(col("decode_ok"))
    val reps = Multimodal.sceneRepresentatives(decoded, cutThreshold)
      .filter(col("is_representative"))
      .select(col("asset_id"), col("scene_id"), col("frame_idx"),
        col("ts_ms"), col("luma"))
    // cross-asset frame dedup: a reposted clip shares its scene's
    // luma signature — keep the first (asset, frame) per signature
    val surv = Dedup.exactSurvivorIds(
      reps.withColumn("id", col("asset_id") * 1000000L + col("frame_idx")),
      Seq("luma"), "id")
    val kept = reps
      .withColumn("id", col("asset_id") * 1000000L + col("frame_idx"))
      .join(surv, "id").drop("id")
    val counts = Seq(
      "assets" -> assets.count(),
      "decoded_frames" -> decoded.count(),
      "corrupt_assets" -> frames.filter(!col("decode_ok")).select("asset_id").distinct().count(),
      "scene_representatives" -> reps.count(),
      "deduped_frames" -> kept.count())
    (kept, counts)
  }

  /** Example 7: the reference's MQTT example, production-grade — a
    * broker-shaped topic (the `graft-log` DataSourceV2 connector:
    * sealed segments, replayable offsets, admission control) drained
    * into a durable store with EXACTLY-ONCE appends, so a crash between
    * the sink write and the engine's commit record replays the batch
    * without duplicating it. `publish` is what the producer side calls
    * (the on_message half of examples/3_iot_datastore_with_mqtt.py);
    * `drain` is the consumer.
    */
  def brokerPipeline(spark: SparkSession, topicDir: String, dbDir: String,
      ckptDir: String, maxPerTrigger: Long = 1000L): GraftDB = {
    val db = GraftDB.atPath(spark, dbDir)
    StreamingIngest.drainLog(spark, db, topicDir, maxPerTrigger, ckptDir,
      streamName = "example7")
    db
  }

  /** Example 8 — the ANN serving lifecycle over the embeddings table,
    * end to end: train the quantizers ONCE on an early sample, persist
    * the index (codes as cell-partitioned parquet), encode-and-append
    * the rest of the corpus with the frozen quantizers, then serve a
    * query batch from the on-disk index and exact-rerank the ADC
    * shortlist against the raw vectors. Returns (corpus size, served
    * shortlist size, refined top-k rows) — the FAISS
    * train/add/search/refine cadence, each stage the gated operator
    * (q178/q181/q182/q180).
    */
  def annServing(spark: SparkSession, sfDir: String, indexDir: String,
      k: Int = 10, shortlistR: Int = 50): (Long, Long, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions.{col, round => rnd}
    val Similarity = graft.analytics.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val sample = e.filter(col("vec_id") % 2 === 0)
    val rest = e.filter(col("vec_id") % 2 === 1)
    val nv = graft.functions.VectorFunctions.l2Normalize(col("embedding"))
    val cents = Similarity.centroids(
      sample.select(col("label"), nv.as("nv")), "label", "nv")
      .select(col("group"), col("i"), rnd(col("c"), 6).as("c"))
    val perm = Similarity.opqPermutation(sample, cents, "vec_id", "embedding", 4, 16)
    val cb = Similarity.opqResidualPqCodebooks(
      sample, cents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
    Similarity.opqIvfPqPersist(sample, cents, perm, cb,
      "vec_id", "embedding", 4, 16, indexDir)           // train + persist once
    Similarity.opqIvfPqAppend(rest, indexDir,
      "vec_id", "embedding", 4, 16)                     // add() the rest, frozen quantizers
    val queries = e.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding"))
    // an explicit cheaper shortlist point (the knobs stay available)...
    val shortlist = Similarity.opqIvfPqTopKPersisted(indexDir, queries,
      "qid", "embedding", k = shortlistR, nProbe = 2, m = 4, subDim = 16)
    // ...and the ZERO-KNOB serve: the full shortlist+refine composition
    // at the index's own persisted config (the q195 flagship default,
    // nProbe=7/rerankR=200) — an operator deploys with no out-of-band
    // parameters at all
    val refined = Similarity.opqIvfPqTopKPersistedRerank(indexDir, e, queries,
      "vec_id", "embedding", "qid", k)
    (e.count(), shortlist.count(), refined)
  }

  /** Example 9 — the nightly RETENTION TICK: expire every point older
    * than the watermark as a LAYOUT operation (whole time partitions
    * and whole delta files drop by directory listing + parquet footer
    * stats; only cutoff-straddling files pay a filtered rewrite) —
    * never the O(store) scan-and-rewrite `remove(TimeQuery() < t)`
    * costs. The compact first folds the delta tier so history sits in
    * droppable `p_date` partitions — the production cadence: compact
    * on ingest quiesce, retain on the policy schedule.
    * Returns (points before, points expired, points after).
    */
  def retentionTick(db: GraftDB, olderThan: Instant): (Long, Long, Long) = {
    db.compact()
    val before = db.length
    val removed = db.retain(olderThan)
    (before, removed, db.length)
  }
}
