package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.engine.GraftDB
import graft.model.Point

/** Structured Streaming ingest — the continuous counterpart of the
  * reference's MQTT ingest loop (examples/3_iot_datastore_with_mqtt.py:
  * 56-120, a callback appending each arriving point).
  *
  * Design: a stream of canonical-schema rows (sans `_seq`) is appended
  * into a [[GraftDB]] storage by checkpointed `foreachBatch` — each
  * micro-batch is one storage append (one seq generation, one delta
  * file on the parquet backend), giving at-least-once ingest that
  * resumes from the checkpoint after a crash.
  *
  * Out-of-order policy (replacing reference op 47, database.py:
  * 1280-1289 — "append anyway, invalidate the index"): appends are
  * accepted in any time order; each batch is time-sorted within its
  * delta file so Parquet row-group stats stay tight, and any built
  * columnarized index is invalidated by the append exactly as the
  * reference invalidates its sorted-timestamp index. BOUNDED lateness
  * is enforced only where unbounded state would otherwise accumulate:
  * watermarked deduplication and windowed aggregation drop events
  * later than the declared horizon — that is Spark's (and this
  * engine's) scalable replacement for the reference's unbounded
  * out-of-order tolerance, which a 100 TB stream cannot afford.
  */
/** Running state of one series: point count + latest-by-event-time value. */
final case class SeriesStats(key: String, count: Long,
    lastTime: java.sql.Timestamp, lastValue: Double)

object StreamingIngest {

  /** Start checkpointed ingest of `stream` (canonical Point schema
    * without `_seq`) into `db`. `dedupKeys` non-empty enables
    * watermarked exactly-once-per-key ingest: duplicates arriving
    * within `lateness` of the max seen event time are dropped (the
    * at-least-once-source → effectively-once pattern); state for older
    * keys is reclaimed by the watermark.
    */
  def start(
      stream: DataFrame,
      db: GraftDB,
      checkpointDir: String,
      lateness: String = "10 minutes",
      dedupKeys: Seq[String] = Nil,
      trigger: Trigger = Trigger.ProcessingTime(0L)
  ): StreamingQuery = {
    val marked = stream.withWatermark(Point.TimeCol, lateness)
    val deduped =
      if (dedupKeys.isEmpty) marked
      else marked.dropDuplicatesWithinWatermark(dedupKeys.head, dedupKeys.tail: _*)
    deduped.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      // A micro-batch frame is only valid during its batch (and any
      // upstream state-store work must complete within it), so
      // materialize eagerly before handing the storage a lazy handle.
      .foreachBatch { (batch: DataFrame, _: Long) =>
        db.insertDF(batch.localCheckpoint(true))
      }
      .start()
  }

  /** EXACTLY-ONCE variant of [[start]]: same source → transform →
    * foreachBatch append graph, with the append made idempotent by a
    * durable per-batch token ([[GraftDB.insertDFIdempotent]]). The
    * micro-batch engine replays an uncommitted batch after a crash with
    * the SAME batchId and — for a replayable source like `graft-log` —
    * the same offset range and content; the token `"<streamName>-b<id>"`
    * then dedups the replayed append, so the converged store holds each
    * record exactly once. `streamName` scopes tokens when several
    * streams feed one store; it must be stable across restarts (the
    * checkpoint is what makes batchId stable). The batch id is
    * zero-padded to 12 digits so token names sort in commit order —
    * the equal-width contract [[graft.engine.ParquetStorage
    * .pruneIngestCommits]]'s name-ordered retention relies on
    * (un-padded, "b100" sorts before "b99" and pruning could drop a
    * recent batch's commit record, re-admitting a post-crash replay).
    */
  def startExactlyOnce(
      stream: DataFrame,
      db: GraftDB,
      checkpointDir: String,
      streamName: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)
  ): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // legacy-token bridge: a checkpoint that committed this batch
        // under the pre-padding token name ("<name>-b<id>") before an
        // upgrade, then crashed before Spark's own commit log entry,
        // replays here with the NEW padded name — honor the old
        // record so the upgrade cannot double-append the batch
        if (!db.hasIngestCommit(s"$streamName-b$batchId")) {
          db.insertDFIdempotent(batch.localCheckpoint(true),
            f"$streamName-b$batchId%012d")
          ()
        }
      }
      .start()

  /** Watermarked tumbling-window aggregation in APPEND mode: a window
    * row is emitted once, when the watermark passes its end; events
    * arriving later than `lateness` behind the stream's max event time
    * are dropped. State is bounded by (lateness / window) open windows
    * per group — the scalable form of the reference's "re-sort on every
    * out-of-order append".
    */
  def tumblingAgg(
      stream: DataFrame,
      timeCol: String,
      windowLen: String,
      lateness: String,
      groupCols: Seq[String],
      aggs: Seq[(String, String)] // (aggExpr, alias)
  ): DataFrame = {
    val first = expr(aggs.head._1).as(aggs.head._2)
    val rest = aggs.tail.map { case (e, a) => expr(e).as(a) }
    stream
      .withWatermark(timeCol, lateness)
      .groupBy(window(col(timeCol), windowLen).as("win") +: groupCols.map(col): _*)
      .agg(first, rest: _*)
  }

  /** Sliding-window variant: overlapping windows of `windowLen` every
    * `slide`. Same watermark/append semantics as [[tumblingAgg]]; state
    * per group is (lateness + windowLen) / slide open windows.
    */
  def slidingAgg(
      stream: DataFrame,
      timeCol: String,
      windowLen: String,
      slide: String,
      lateness: String,
      groupCols: Seq[String],
      aggs: Seq[(String, String)]
  ): DataFrame = {
    val first = expr(aggs.head._1).as(aggs.head._2)
    val rest = aggs.tail.map { case (e, a) => expr(e).as(a) }
    stream
      .withWatermark(timeCol, lateness)
      .groupBy(window(col(timeCol), windowLen, slide).as("win") +: groupCols.map(col): _*)
      .agg(first, rest: _*)
  }

  /** Session windows: events within `gap` of each other merge into one
    * variable-length session per group (the streaming sessionization
    * primitive); a session closes — and emits, in append mode — when
    * the watermark passes its end + gap.
    */
  def sessionAgg(
      stream: DataFrame,
      timeCol: String,
      gap: String,
      lateness: String,
      groupCols: Seq[String],
      aggs: Seq[(String, String)]
  ): DataFrame = {
    val first = expr(aggs.head._1).as(aggs.head._2)
    val rest = aggs.tail.map { case (e, a) => expr(e).as(a) }
    stream
      .withWatermark(timeCol, lateness)
      .groupBy(session_window(col(timeCol), gap).as("win") +: groupCols.map(col): _*)
      .agg(first, rest: _*)
  }

  /** Watermarked streaming deduplication — the streaming form of exact
    * dedup (`Dedup.exactSurvivorIds`): the FIRST arrival of each key
    * combination passes through, later arrivals are dropped. Uses
    * `dropDuplicatesWithinWatermark`, so per-key state lives only until
    * the watermark passes `lateness` beyond its first arrival — bounded
    * state no matter how many distinct keys the stream carries over its
    * lifetime (a plain `dropDuplicates` would hold every key forever).
    * The projection keeps only `keyCols` + the event-time column: the
    * state store then carries keys, not payloads, and every emitted row
    * is key-determined (duplicates agree on the keys by definition), so
    * downstream results don't depend on WHICH duplicate won the race.
    */
  def streamDedup(
      stream: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      lateness: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "streamDedup needs at least one key column")
    stream
      .withWatermark(timeCol, lateness)
      .select((keyCols :+ timeCol).distinct.map(col): _*)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /** Watermarked stream-stream inner join: rows of `left` and `right`
    * sharing `keyCols` match when the right event time falls within
    * [left − lowerBound, left + upperBound]. Both sides carry
    * watermarks, so the join state for expired time ranges is evicted —
    * bounded memory no matter how long the streams run (an unbounded
    * stream-stream join would hold both inputs forever). This is the
    * streaming form of the batch interval join (`analytics/Interval`),
    * e.g. joining a clicks stream to an impressions stream within a
    * ±attribution window.
    */
  def streamStreamJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      lowerBound: String,
      upperBound: String,
      lateness: String
  ): DataFrame = {
    val l = left.withWatermark(leftTimeCol, lateness)
    val r = right.withWatermark(rightTimeCol, lateness)
    val keyCond = keyCols.map(k => l(k) === r(k)).reduce(_ && _)
    val timeCond =
      r(rightTimeCol) >= l(leftTimeCol) - expr(s"INTERVAL $lowerBound") &&
      r(rightTimeCol) <= l(leftTimeCol) + expr(s"INTERVAL $upperBound")
    // keep one copy of each key column (inner join: they are equal)
    keyCols.foldLeft(l.join(r, keyCond && timeCond))((df, k) => df.drop(r(k)))
  }

  /** Stream-static enrichment join: every micro-batch of the stream
    * joins a static reference table that is BROADCAST, so the stream
    * side never shuffles and no join state accrues (unlike
    * stream-stream joins, the static side is re-resolvable per batch).
    * The standard way a pipeline decorates an event stream with
    * dimension data — at 1000 executors the dim rides the broadcast,
    * the stream stays partition-local end to end.
    */
  def enrichmentJoin(stream: DataFrame, dim: DataFrame, cond: Column): DataFrame =
    stream.join(broadcast(dim), cond)

  /** Continuously-maintained per-series stats via custom state
    * (`flatMapGroupsWithState`): for each key, the running point count
    * and the LATEST (by event time) value — the streaming
    * materialization of "current value of every series", which the
    * reference can only answer with a full scan. Run in Update output
    * mode; state is one small record per live series.
    *
    * `stateTtl` bounds state for unbounded key spaces: a series that
    * stays silent for `stateTtl` past its last event (by watermark — so
    * `stream` gets a `lateness` watermark when a TTL is set) has its
    * state evicted. Without a TTL, dead series accumulate state forever
    * — fine for a fixed sensor fleet, not for 100 TB of churning keys.
    */
  def seriesStats(
      stream: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      stateTtl: Option[String] = None,
      lateness: String = "10 minutes"
  ): org.apache.spark.sql.Dataset[SeriesStats] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val src = stateTtl.fold(stream)(_ => stream.withWatermark(timeCol, lateness))
    val timeoutConf =
      stateTtl.fold(GroupStateTimeout.NoTimeout)(_ => GroupStateTimeout.EventTimeTimeout)
    src
      .select(col(keyCol).cast("string"), col(timeCol), col(valueCol).cast("double"))
      .as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SeriesStats, SeriesStats](OutputMode.Update, timeoutConf) {
        (key, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed lastTime + ttl with no new events: the
            // series is dead — drop its state, emit nothing
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(SeriesStats(key, 0L, null, Double.NaN))
            val next = rows.foldLeft(prev) { (acc, r) =>
              val (_, t, v) = r
              if (acc.lastTime == null || !t.before(acc.lastTime))
                SeriesStats(key, acc.count + 1, t, v)
              else acc.copy(count = acc.count + 1) // late row: count it, keep newer value
            }
            state.update(next)
            // timeout base must exceed the current watermark (Spark
            // rejects a timestamp at-or-below it); a series whose last
            // event already trails the watermark still gets a full TTL
            // from NOW, not instant eviction
            stateTtl.foreach { ttl =>
              val base = math.max(next.lastTime.getTime, state.getCurrentWatermarkMs() + 1L)
              state.setTimeoutTimestamp(base, ttl)
            }
            Iterator.single(next)
          }
      }
  }

  /** The events table as an unbounded stream (file source) — the same
    * column bridging as [[graft.sources.Tables.events]].
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the file source wants a directory: glob the single events file
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .withColumn("ts_us", graft.sources.Tables.tsMicros(schema))
      .withColumn("time", timestamp_micros(col("ts_us")))
  }

  /** Epoch millis of 2024-01-01T00:00:00Z — the deterministic rate
    * stream's time origin.
    */
  val RateEpochMs: Long = 1704067200000L

  /** A NON-FILE streaming source: Spark's `rate-micro-batch` generator
    * (exactly `rowsPerBatch` rows per trigger, `value` a gapless
    * monotonic long) mapped to canonical Point rows by a CLOSED-FORM
    * transform of `value` — time, tag and field are all pure integer
    * functions of it, so the stream's content is deterministic and an
    * oracle can replay the final ingested state from `range()` alone.
    * `maxRows` bounds the prefix: rows with value ≥ maxRows are
    * filtered out in the STREAM graph, so however many batches run,
    * the ingested set converges to exactly [0, maxRows). This is the
    * honest sandbox stand-in for a broker source (Kafka/MQTT — the
    * reference's own ingest loop is an MQTT consumer,
    * examples/3_iot_datastore_with_mqtt.py:56-120): unbounded,
    * arriving in micro-batches, never touching the filesystem.
    */
  def ratePointsSource(spark: SparkSession, rowsPerBatch: Int, maxRows: Long,
      numPartitions: Int = 4): DataFrame =
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toLong)
      .option("numPartitions", numPartitions.toLong)
      .option("startTimestamp", 0L)
      .load()
      .filter(col("value") < maxRows)
      .select(
        timestamp_millis(lit(RateEpochMs) + col("value") * 1000L).as(Point.TimeCol),
        lit("rate").as(Point.MeasurementCol),
        map(lit("sensor"), concat(lit("s"), col("value") % 7)).as(Point.TagsCol),
        map(lit("v"), (col("value") % 100).cast("double")).as(Point.FieldsCol))

  /** The graft-log topic as a stream of canonical Point rows: payload
    * lines are decimal values and the value→point transform is CLOSED
    * FORM (time, tag, field are integer functions of it), so however
    * the log was segmented or batched, the converged ingested state is
    * a pure function of the published value set — which is what lets a
    * SQL oracle replay broker ingest from `range()` alone.
    */
  def logPointsSource(spark: SparkSession, dir: String,
      maxRecordsPerTrigger: Long): DataFrame =
    spark.readStream.format("graft-log")
      .option("path", dir)
      .option("maxRecordsPerTrigger", maxRecordsPerTrigger)
      .load()
      .select(col("payload").cast("long").as("v"))
      .select(
        timestamp_millis(lit(RateEpochMs) + col("v") * 1000L).as(Point.TimeCol),
        lit("log").as(Point.MeasurementCol),
        map(lit("sensor"), concat(lit("s"), col("v") % 5)).as(Point.TagsCol),
        map(lit("v"), (col("v") % 90).cast("double")).as(Point.FieldsCol))

  /** Drain a STATIC graft-log topic into `db` exactly once: the
    * [[startExactlyOnce]] graph under Trigger.AvailableNow — the
    * source's admission control slices the backlog into rate-limited
    * micro-batches, the AvailableNow snapshot stops the query when the
    * prefix is consumed, and the per-batch tokens make the append path
    * idempotent under replay.
    */
  def drainLog(spark: SparkSession, db: GraftDB, dir: String,
      maxRecordsPerTrigger: Long, checkpointDir: String,
      streamName: String = "graftlog"): Unit = {
    val q = startExactlyOnce(logPointsSource(spark, dir, maxRecordsPerTrigger),
      db, checkpointDir, streamName, Trigger.AvailableNow())
    q.awaitTermination()
  }

  /** A PARTITIONED graft-log topic (N producer sub-dirs fanned in as
    * one source) as a stream of canonical Point rows — the same closed
    * value→point form as [[logPointsSource]] with its own constants
    * (measurement "plog", 6 sensors), so the converged state stays a
    * pure function of the union of the partitions' published value
    * sets regardless of partition count, interleaving, or batch cuts.
    */
  def partitionedLogPointsSource(spark: SparkSession, dir: String,
      maxRecordsPerTrigger: Long): DataFrame =
    spark.readStream.format("graft-log")
      .option("path", dir)
      .option("partitioned", "true")
      .option("maxRecordsPerTrigger", maxRecordsPerTrigger)
      .load()
      .select(col("payload").cast("long").as("v"))
      .select(
        timestamp_millis(lit(RateEpochMs) + col("v") * 1000L).as(Point.TimeCol),
        lit("plog").as(Point.MeasurementCol),
        map(lit("sensor"), concat(lit("s"), col("v") % 6)).as(Point.TagsCol),
        map(lit("v"), (col("v") % 70).cast("double")).as(Point.FieldsCol))

  /** [[drainLog]] for a partitioned topic: the composite per-partition
    * offset replays each (partition, range) bit-identically, so the
    * same exactly-once token protocol holds per partition.
    */
  def drainPartitionedLog(spark: SparkSession, db: GraftDB, dir: String,
      maxRecordsPerTrigger: Long, checkpointDir: String,
      streamName: String = "graftplog"): Unit = {
    val q = startExactlyOnce(
      partitionedLogPointsSource(spark, dir, maxRecordsPerTrigger),
      db, checkpointDir, streamName, Trigger.AvailableNow())
    q.awaitTermination()
  }

  /** MULTI-TOPIC FAN-IN — Kafka's subscribe-to-many: N independent
    * topics (plain or partitioned, mixed freely) unioned as ONE
    * streaming query. Spark's offset log stores each unioned source's
    * offset SEPARATELY inside the single checkpoint, so a kill/resume
    * replays every topic from its own committed position and the
    * per-batch token protocol downstream stays exactly-once for the
    * union. `maxRecordsPerTrigger` is a PER-TOPIC admission budget
    * (each source plans its own slice). Each record maps in closed
    * form from (topic name, value) — topic as a tag — so the converged
    * state is a pure function of the topics' published value sets,
    * independent of interleaving or batch cuts.
    */
  def multiTopicPointsSource(spark: SparkSession,
      topics: Seq[(String, Boolean)], maxRecordsPerTrigger: Long): DataFrame = {
    require(topics.nonEmpty, "at least one topic")
    topics.map { case (dir, partitioned) =>
      val topicName = new java.io.File(dir).getName
      spark.readStream.format("graft-log")
        .option("path", dir)
        .option("partitioned", partitioned.toString)
        .option("maxRecordsPerTrigger", maxRecordsPerTrigger)
        .load()
        .select(col("payload").cast("long").as("v"))
        .select(
          timestamp_millis(lit(RateEpochMs) + col("v") * 1000L).as(Point.TimeCol),
          lit("mlog").as(Point.MeasurementCol),
          map(lit("topic"), lit(topicName),
            lit("sensor"), concat(lit("s"), col("v") % 4)).as(Point.TagsCol),
          map(lit("v"), (col("v") % 50).cast("double")).as(Point.FieldsCol))
    }.reduce(_ unionAll _)
  }

  /** [[drainLog]] over a multi-topic union: one checkpoint, one token
    * stream, per-topic offset replay.
    */
  def drainTopics(spark: SparkSession, db: GraftDB,
      topics: Seq[(String, Boolean)], maxRecordsPerTrigger: Long,
      checkpointDir: String, streamName: String = "graftmlog"): Unit = {
    val q = startExactlyOnce(
      multiTopicPointsSource(spark, topics, maxRecordsPerTrigger),
      db, checkpointDir, streamName, Trigger.AvailableNow())
    q.awaitTermination()
  }

  /** Drive [[start]] from the rate source until the full deterministic
    * prefix has landed in `db`, then stop the query. Proves the ingest
    * graph is source-agnostic: the SAME checkpointed foreachBatch
    * append consumes a generator source here and file/MemoryStream
    * sources elsewhere — nothing in the graph knows the source kind.
    * The wait polls the engine's own `length` fast path; because the
    * stream filters to value < totalRows, the state CONVERGES to
    * exactly totalRows rows no matter how many triggers fire.
    */
  def ingestRate(spark: SparkSession, db: GraftDB, rowsPerBatch: Int,
      totalRows: Long, checkpointDir: String, timeoutMs: Long = 120000L): Unit = {
    val q = start(ratePointsSource(spark, rowsPerBatch, totalRows), db, checkpointDir)
    try {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (db.length < totalRows && System.currentTimeMillis() < deadline)
        Thread.sleep(50L)
    } finally q.stop()
    val n = db.length
    require(n == totalRows, s"rate ingest landed $n of $totalRows rows")
  }

  /** The socket source's closed-form value→point transform — same
    * determinism contract as [[logPointsSource]] / [[ratePointsSource]]
    * (distinct constants per source so a cross-wired graph cannot pass
    * the wrong gate): lines are decimal values; time/tag/field are
    * integer functions of the value.
    */
  def socketValuesSource(spark: SparkSession, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", "localhost").option("port", port).load()
      .select(col("value").cast("long").as("v"))
      .filter(col("v").isNotNull)
      .select(
        timestamp_millis(lit(RateEpochMs) + col("v") * 1000L).as(Point.TimeCol),
        lit("sock").as(Point.MeasurementCol),
        map(lit("sensor"), concat(lit("s"), col("v") % 6)).as(Point.TagsCol),
        map(lit("v"), (col("v") % 80).cast("double")).as(Point.FieldsCol))

  /** Drive [[start]] from an in-process line server over a TCP socket —
    * the literal broker-consumer shape (a server pushes lines, the
    * engine subscribes) — until the deterministic prefix [0, total) has
    * landed in `db`. The socket source is not replayable, so this is
    * the at-least-once tier: within one run each line is delivered
    * once, and the converged store is the closed form of the pushed
    * set; replayable exactly-once is the `graft-log` connector's job.
    */
  def ingestSocketValues(spark: SparkSession, db: GraftDB, total: Int,
      checkpointDir: String, timeoutMs: Long = 120000L): Unit = {
    val server = new java.net.ServerSocket(0)
    val writer = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        (0 until total).foreach(v => out.println(v))
        out.flush()
        Thread.sleep(timeoutMs) // hold the connection until the reader is done
        sock.close()
      } catch { case _: Exception => () }
    })
    writer.setDaemon(true)
    writer.start()
    val q = start(socketValuesSource(spark, server.getLocalPort), db, checkpointDir)
    try {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (db.length < total && q.exception.isEmpty &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(50L)
      q.exception.foreach(e => throw e)
    } finally { q.stop(); server.close() }
    val n = db.length
    require(n == total, s"socket ingest landed $n of $total rows")
  }

  /** Run a finite streaming query to completion (Trigger.AvailableNow →
    * memory sink) and return the result table — used to declare
    * batch-comparable streaming queries that genuinely execute through
    * the streaming engine (micro-batch planner, state store,
    * watermarks).
    */
  def runToTable(result: DataFrame, sinkName: String, mode: OutputMode): DataFrame = {
    val q = result.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    result.sparkSession.table(sinkName)
  }
}
