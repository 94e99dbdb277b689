package graft

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.GraftDB
import graft.model.Point
import graft.query._
import graft.sources.Tables

/** Driver contract — one `queries` entry (+ DuckDB oracle) per operator
  * from SURVEY.md §2. The events table is mapped to Points by
  * [[Tables.eventsAsPoints]]; `ts_us` (epoch microseconds, exact
  * bigint) is the cross-engine time representation, and every query is
  * deterministically ordered on both sides.
  */
object SparkEntry {

  private def pts(s: SparkSession, dir: String): DataFrame = Tables.eventsAsPoints(s, dir)
  private def rdb(s: SparkSession, dir: String): GraftDB = GraftDB.fromDataFrame(pts(s, dir))

  /** Points → flat (event_id, ts_us, measurement, value) for comparison. */
  private def flat(points: DataFrame): DataFrame = points.select(
    col(Point.SeqCol).as("event_id"),
    unix_micros(col(Point.TimeCol)).as("ts_us"),
    col(Point.MeasurementCol).as("measurement"),
    element_at(col(Point.FieldsCol), "value").as("value"))

  private def ids(points: DataFrame): DataFrame =
    points.select(col(Point.SeqCol).as("event_id")).orderBy("event_id")

  private val T1 = Instant.parse("2024-01-05T00:00:00Z")
  private val T2 = Instant.parse("2024-01-15T00:00:00Z")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_search_time_tag")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = coreQueries ++
    graft.entries.RelationalQueries.queries ++ graft.entries.CorpusQueries.queries

  private val coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- core ops (SURVEY §2.1) over events-as-points ----
    "q01_all" -> ((s, dir) =>
      flat(rdb(s, dir).allDF(sorted = true)).orderBy("ts_us", "event_id")),

    "q02_count_all" -> ((s, dir) => {
      import s.implicits._
      Seq(rdb(s, dir).length).toDF("n")
    }),

    "q03_search_time_tag" -> ((s, dir) =>
      flat(rdb(s, dir).searchDF(
        (TimeQuery() >= T1) & (TimeQuery() < T2) & (TagQuery("user") === "7")))
        .orderBy("ts_us", "event_id")),

    "q04_get_first" -> ((s, dir) =>
      flat(rdb(s, dir).searchDF(
        (MeasurementQuery() === "purchase") & (FieldQuery("value") >= 100.0),
        sorted = false).limit(1))
        .select("event_id", "value")),

    "q05_contains" -> ((s, dir) => {
      import s.implicits._
      Seq(rdb(s, dir).contains(
        (MeasurementQuery() === "error") & (FieldQuery("value") > 190.0))).toDF("found")
    }),

    "q06_count_matches" -> ((s, dir) => {
      import s.implicits._
      Seq(rdb(s, dir).count(FieldQuery("value") >= 50.0)).toDF("n")
    }),

    "q07_select" -> ((s, dir) =>
      rdb(s, dir).selectDF(Seq("time", "tags.user", "fields.value"),
          MeasurementQuery() === "click")
        .select(
          unix_micros(col("time")).as("ts_us"),
          col("`tags.user`").as("usr"),
          col("`fields.value`").as("value"))
        .orderBy("ts_us", "usr", "value")),

    "q08_measurements" -> ((s, dir) => rdb(s, dir).measurementsDF),

    "q09_field_keys" -> ((s, dir) => rdb(s, dir).fieldKeysDF()),

    "q10_field_values" -> ((s, dir) => rdb(s, dir).fieldValuesDF("value")),

    "q11_tag_values" -> ((s, dir) => rdb(s, dir).tagValuesDF(Seq("user"))),

    "q12_timestamps" -> ((s, dir) =>
      rdb(s, dir).timestampsDF().select(unix_micros(col("time")).as("ts_us"))),

    "q13_measurement_view" -> ((s, dir) =>
      flat(rdb(s, dir).measurement("view").searchDF(FieldQuery("value") > 150.0))
        .orderBy("ts_us", "event_id")),

    "q14_update" -> ((s, dir) => {
      val db = rdb(s, dir)
      val c = QueryCompiler.compile((TagQuery("user") === "3") & (MeasurementQuery() === "click"))
      db.updatedDF(db.df, c, None, None, Map.empty, Map("k" -> 0.0), Nil, Nil)
        .select(col(Point.SeqCol).as("event_id"),
          element_at(col(Point.FieldsCol), "k").as("k"))
        .orderBy("event_id")
    }),

    // op 11's CALLABLE form (reference update(fields=lambda ...)): the
    // transform maps the whole fields dict — every key doubles on
    // matched rows — replayed by the oracle as CASE arithmetic per key
    "q91_update_callable" -> ((s, dir) => {
      val db = rdb(s, dir)
      val c = QueryCompiler.compile(
        (MeasurementQuery() === "click") & (FieldQuery("value") >= 100.0))
      db.updatedWithDF(db.df, c,
        fields = Some(m => transform_values(m, (_, v) => v * 2.0)))
        .select(col(Point.SeqCol).as("event_id"),
          element_at(col(Point.FieldsCol), "value").as("value"),
          element_at(col(Point.FieldsCol), "k").as("k"))
        .orderBy("event_id")
    }),

    "q15_remove" -> ((s, dir) => {
      val db = rdb(s, dir)
      db.remove(FieldQuery("value") < 10.0)
      ids(db.df)
    }),

    // op 2's LAZY iteration (reference __iter__, database.py:157-171)
    // driven end to end: toLocalIterator pulls partitions on demand in
    // `_seq` order; the gate re-materializes exactly what the iterator
    // yielded, so ordering, completeness and field access all sit under
    // the cross-engine hash
    "q191_iterate" -> ((s, dir) => {
      import s.implicits._
      rdb(s, dir).iterator.map(p => (p._seq,
          java.time.temporal.ChronoUnit.MICROS.between(Instant.EPOCH, p.time),
          p.measurement, p.fields.get("value").map(_.doubleValue)))
        .toSeq.toDF("event_id", "ts_us", "measurement", "value")
        .orderBy("ts_us", "event_id")
    }),

    // op 12 `update_all` (database.py:1049-1062): the persisting path —
    // every point gains field k, then the store is read back
    "q192_update_all" -> ((s, dir) => {
      val db = rdb(s, dir)
      db.updateAll(fields = Map("k" -> 1.0))
      db.df.select(col(Point.SeqCol).as("event_id"),
          element_at(col(Point.FieldsCol), "k").as("k"))
        .orderBy("event_id")
    }),

    // op 14 `remove_all` (database.py:727-738): persisting truncate;
    // the read-back must be empty through every read path
    "q193_remove_all" -> ((s, dir) => {
      import s.implicits._
      val db = rdb(s, dir)
      db.removeAll()
      Seq(db.length).toDF("n")
    }),

    "q16_drop_measurement" -> ((s, dir) => {
      val db = rdb(s, dir)
      db.dropMeasurement("error")
      ids(db.df)
    }),

    // ---- predicate-DSL semantics (SURVEY §2.2) ----
    "q17_not_missing_key" -> ((s, dir) =>
      ids(rdb(s, dir).searchDF(~(TagQuery("bucket") === "high")))),

    "q18_ne_missing_key" -> ((s, dir) =>
      ids(rdb(s, dir).searchDF(TagQuery("bucket") =!= "low"))),

    "q19_exists" -> ((s, dir) =>
      ids(rdb(s, dir).searchDF(TagQuery("bucket").exists()))),

    "q20_regex_match" -> ((s, dir) =>
      ids(rdb(s, dir).searchDF(MeasurementQuery().matches("cl.*")))),

    "q21_regex_search" -> ((s, dir) =>
      ids(rdb(s, dir).searchDF(TagQuery("user").search("1")))),

    "q22_regex_flags" -> ((s, dir) =>
      ids(rdb(s, dir).searchDF(MeasurementQuery().search("CL", flags = "i")))),

    "q23_time_map" -> ((s, dir) =>
      ids(rdb(s, dir).searchDF(TimeQuery().map(
        _.atZone(java.time.ZoneOffset.UTC).getHour.toDouble) === 3.0))),

    // q03 through a BUILT INDEX (op 23): reindex columnarizes every
    // tag/field key into the primitives-only cached view and the
    // compiler retargets leaves at flat slot columns, maps rebuilt for
    // matched rows only — same oracle as q03, so the indexed read path
    // (slot compilation, presence bits, map rebuild) sits under the
    // cross-engine hash gate, not just ScalaTest.
    "q83_search_indexed" -> ((s, dir) => {
      val db = rdb(s, dir)
      db.reindex()
      flat(db.searchDF(
        (TimeQuery() >= T1) & (TimeQuery() < T2) & (TagQuery("user") === "7")))
        .orderBy("ts_us", "event_id")
    }),

    // the auto_index read path (decorators.py:50-51) under the oracle:
    // NO explicit reindex anywhere — the first search builds the index
    // lazily, the insert invalidates (or extends) it, and the second
    // search transparently rebuilds before filtering, so its result
    // must include the inserted point. The inserted `_seq` is the
    // generation envelope's first slot ((1<<45) + 0 — Storage.withSeq
    // over a fresh 1-row batch), a constant the oracle replays
    // literally; q03's result is the other UNION branch.
    "q101_search_autoindex" -> ((s, dir) => {
      val db = GraftDB.fromDataFrame(pts(s, dir), autoIndex = true)
      val q = (TimeQuery() >= T1) & (TimeQuery() < T2) & (TagQuery("user") === "7")
      db.search(q) // read #1: lazily builds the index
      db.insert(graft.model.Point(Instant.parse("2024-01-10T12:00:00Z"), "synthetic",
        Map("user" -> "7"), Map("value" -> 123.45)))
      flat(db.searchDF(q)).orderBy("ts_us", "event_id")
    }),

    // TIME-BASED RETENTION on the persistent store — the InfluxDB
    // retention-policy shape ("expire data older than t") as an
    // O(dropped + straddling) layout operation, NOT an O(store)
    // rewrite: whole p_date partitions and whole delta files drop by
    // directory listing + parquet footer time stats; only files
    // straddling the cutoff pay a filtered rewrite (StorageSpec pins
    // that kept files are not rewritten). The lifecycle below drives
    // every path — partition drop, straddling-partition rewrite, delta
    // whole-file drop, delta straddle, delta keep — across two
    // successive cutoffs, and the surviving store must equal the
    // oracle's filtered replay exactly.
    "q188_retain" -> ((s, dir) => {
      val p = pts(s, dir).drop(Point.SeqCol)
      val tUs = unix_micros(col(Point.TimeCol))
      def us(iso: String) = Instant.parse(iso).getEpochSecond * 1000000L
      val db = GraftDB.atPath(s, graft.util.Scratch.dir("retainstore") + "/db")
      // main tier: everything before 01-03, folded into p_date partitions
      db.insertDF(p.filter(tUs < us("2024-01-03T00:00:00Z")))
      db.compact()
      // delta tier: one wholly-old file, one straddling the second
      // cutoff, one wholly-new
      db.insertDF(p.filter(tUs >= us("2024-01-03T00:00:00Z") && tUs < us("2024-01-04T00:00:00Z")))
      db.insertDF(p.filter(tUs >= us("2024-01-04T00:00:00Z") && tUs < us("2024-01-06T00:00:00Z")))
      db.insertDF(p.filter(tUs >= us("2024-01-06T00:00:00Z")))
      // cutoff 1 falls INSIDE partition 2024-01-02: drops p_date=01-01
      // whole, rewrites only the straddling 01-02 partition
      db.retain(Instant.parse("2024-01-02T12:00:00Z"))
      // cutoff 2 exercises the delta tier: 01-03 file drops whole,
      // the 01-04..01-06 file straddles, the ≥01-06 file is untouched
      db.retain(Instant.parse("2024-01-05T12:00:00Z"))
      db.df.select(
        unix_micros(col(Point.TimeCol)).as("ts_us"),
        col(Point.MeasurementCol).as("measurement"),
        element_at(col(Point.TagsCol), "user").as("usr"),
        element_at(col(Point.FieldsCol), "value").as("value"))
        .orderBy("ts_us", "measurement", "usr", "value")
    }),

    // MANIFEST-AUTHORITATIVE store lifecycle (the object-store commit
    // variant, [[graft.engine.ManifestStorage]]): two appends land as
    // two manifest generations, a persisting update and a remove land
    // as optimistic-concurrency overwrite commits, compact() folds the
    // commit list to one dir, and vacuum(0) physically reclaims every
    // superseded commit — then the read-back (resolved purely through
    // the manifest head, never a directory listing) must equal the
    // oracle's filtered replay. The q188 shape re-pointed at the
    // backend that opens where rename-committing storage refuses
    // (S3-style schemes); q14 + q15's mutation semantics compose on
    // top so the manifest overwrite path sits under the hash gate.
    "q200_manifest_lifecycle" -> ((s, dir) => {
      val p = pts(s, dir).drop(Point.SeqCol)
      val tUs = unix_micros(col(Point.TimeCol))
      val cut = Instant.parse("2024-01-05T00:00:00Z").getEpochSecond * 1000000L
      val db = GraftDB.atManifest(s, graft.util.Scratch.dir("maniflife") + "/db")
      db.insertDF(p.filter(tUs < cut))
      db.insertDF(p.filter(tUs >= cut))
      // q14's mutation, persisted: k := 0 on user-3 clicks
      db.update((TagQuery("user") === "3") & (MeasurementQuery() === "click"),
        fields = Map("k" -> 0.0))
      // q15's removal through the same manifest overwrite path
      db.remove(FieldQuery("value") < 10.0)
      db.compact()
      db.storage.asInstanceOf[graft.engine.ManifestStorage].vacuum(graceMs = 0L)
      db.df.select(
        unix_micros(col(Point.TimeCol)).as("ts_us"),
        col(Point.MeasurementCol).as("measurement"),
        element_at(col(Point.TagsCol), "user").as("usr"),
        element_at(col(Point.FieldsCol), "k").as("k"),
        element_at(col(Point.FieldsCol), "value").as("value"))
        .orderBy("ts_us", "measurement", "usr", "value", "k")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_all" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, event_type AS measurement, value
        |FROM events ORDER BY ts_us, event_id""".stripMargin,
    "q02_count_all" -> "SELECT count(*) AS n FROM events",
    "q03_search_time_tag" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, event_type AS measurement, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |  AND user_id = 7
        |ORDER BY ts_us, event_id""".stripMargin,
    "q04_get_first" ->
      """SELECT event_id, value FROM events
        |WHERE event_type = 'purchase' AND value >= 100
        |ORDER BY event_id LIMIT 1""".stripMargin,
    "q05_contains" ->
      "SELECT count(*) > 0 AS found FROM events WHERE event_type = 'error' AND value > 190",
    "q06_count_matches" -> "SELECT count(*) AS n FROM events WHERE value >= 50",
    "q07_select" ->
      """SELECT epoch_us(ts) AS ts_us, CAST(user_id AS VARCHAR) AS usr, value
        |FROM events WHERE event_type = 'click' ORDER BY ts_us, usr, value""".stripMargin,
    "q08_measurements" ->
      "SELECT DISTINCT event_type AS measurement FROM events ORDER BY measurement",
    "q09_field_keys" ->
      """SELECT 'k' AS field_key UNION ALL SELECT 'user_id' UNION ALL SELECT 'value'
        |ORDER BY field_key""".stripMargin,
    "q10_field_values" -> "SELECT value FROM events ORDER BY event_id",
    "q11_tag_values" ->
      """SELECT DISTINCT 'user' AS tag_key, CAST(user_id AS VARCHAR) AS tag_value
        |FROM events ORDER BY tag_key, tag_value""".stripMargin,
    "q12_timestamps" -> "SELECT epoch_us(ts) AS ts_us FROM events ORDER BY event_id",
    "q13_measurement_view" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, event_type AS measurement, value
        |FROM events WHERE event_type = 'view' AND value > 150
        |ORDER BY ts_us, event_id""".stripMargin,
    "q14_update" ->
      """SELECT event_id,
        |  CASE WHEN user_id = 3 AND event_type = 'click' THEN 0.0
        |       ELSE CAST(json_extract_string(props, '$.k') AS DOUBLE) END AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q91_update_callable" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'click' AND value >= 100 THEN value * 2
        |       ELSE value END AS value,
        |  CASE WHEN event_type = 'click' AND value >= 100
        |       THEN CAST(json_extract_string(props, '$.k') AS DOUBLE) * 2
        |       ELSE CAST(json_extract_string(props, '$.k') AS DOUBLE) END AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q15_remove" ->
      "SELECT event_id FROM events WHERE NOT (value < 10) ORDER BY event_id",
    "q191_iterate" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, event_type AS measurement, value
        |FROM events ORDER BY ts_us, event_id""".stripMargin,
    "q192_update_all" ->
      "SELECT event_id, 1.0 AS k FROM events ORDER BY event_id",
    "q193_remove_all" ->
      "SELECT count(*) AS n FROM events WHERE 1 = 0",
    "q16_drop_measurement" ->
      "SELECT event_id FROM events WHERE event_type <> 'error' ORDER BY event_id",
    "q17_not_missing_key" ->
      "SELECT event_id FROM events WHERE value < 100 ORDER BY event_id",
    "q18_ne_missing_key" ->
      "SELECT event_id FROM events WHERE value >= 100 ORDER BY event_id",
    "q19_exists" ->
      "SELECT event_id FROM events WHERE value >= 100 ORDER BY event_id",
    "q20_regex_match" ->
      "SELECT event_id FROM events WHERE event_type LIKE 'cl%' ORDER BY event_id",
    "q21_regex_search" ->
      "SELECT event_id FROM events WHERE CAST(user_id AS VARCHAR) LIKE '%1%' ORDER BY event_id",
    "q22_regex_flags" ->
      "SELECT event_id FROM events WHERE regexp_matches(event_type, '(?i)CL') ORDER BY event_id",
    "q23_time_map" ->
      "SELECT event_id FROM events WHERE EXTRACT(hour FROM ts) = 3 ORDER BY event_id",
    "q83_search_indexed" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, event_type AS measurement, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |  AND user_id = 7
        |ORDER BY ts_us, event_id""".stripMargin,
    "q101_search_autoindex" ->
      """SELECT * FROM (
        |  SELECT event_id, epoch_us(ts) AS ts_us, event_type AS measurement, value
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |    AND user_id = 7
        |  UNION ALL
        |  SELECT CAST(35184372088832 AS BIGINT) AS event_id,
        |    epoch_us(TIMESTAMP '2024-01-10 12:00:00') AS ts_us,
        |    'synthetic' AS measurement, CAST(123.45 AS DOUBLE) AS value
        |) ORDER BY ts_us, event_id""".stripMargin,
    // retention == the filtered replay: retain(t) must equal
    // remove(time < t) in result, however many partition drops /
    // footer drops / straddler rewrites produced it
    "q188_retain" ->
      """SELECT epoch_us(ts) AS ts_us, event_type AS measurement,
        |  CAST(user_id AS VARCHAR) AS usr, value
        |FROM events WHERE NOT (ts < TIMESTAMP '2024-01-05 12:00:00')
        |ORDER BY ts_us, measurement, usr, value""".stripMargin,
    // the manifest-mode lifecycle == q14's update + q15's removal
    // replayed over the full table, whatever commit machinery produced
    // the surviving store
    "q200_manifest_lifecycle" ->
      """SELECT epoch_us(ts) AS ts_us, event_type AS measurement,
        |  CAST(user_id AS VARCHAR) AS usr,
        |  CASE WHEN user_id = 3 AND event_type = 'click' THEN 0.0
        |       ELSE CAST(json_extract_string(props, '$.k') AS DOUBLE) END AS k,
        |  value
        |FROM events WHERE NOT (value < 10)
        |ORDER BY ts_us, measurement, usr, value, k""".stripMargin
  ) ++ graft.entries.RelationalQueries.oracleSql ++ graft.entries.CorpusQueries.oracleSql
}
