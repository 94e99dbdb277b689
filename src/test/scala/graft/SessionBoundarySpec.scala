package graft

import org.apache.spark.sql.functions._

import graft.analytics.Curation

/** Pins the boundary semantics of the two sessionization formulations
  * at an inter-event gap of EXACTLY the session gap:
  *
  *  - Spark's native `session_window` merges a new event into the open
  *    session when its start is <= the current session end, so two
  *    events exactly `gap` apart DO merge (inclusive break: only
  *    diff > gap starts a new session). Verified empirically here.
  *  - The lag+cumsum formulation in [[Curation.sessionize]] (and q65)
  *    breaks on the same inclusive rule (diff > gap), so the two
  *    formulations agree everywhere, including the boundary.
  *
  * q73's oracle SQL encodes the inclusive rule (`diff > gap`) to match
  * session_window; this spec is the executable form of that equivalence.
  */
class SessionBoundarySpec extends SparkSpec {
  import spark.implicits._

  private val gapUs = 1800000000L // 30 minutes in microseconds

  // user 1: two events exactly 30 min apart (the boundary case)
  // user 2: two events 30 min minus 1 us apart (inside the gap)
  // user 3: two events 30 min plus 1 us apart (outside the gap)
  private lazy val events = Seq(
    (1L, 0L, 1L), (1L, gapUs, 2L),
    (2L, 0L, 3L), (2L, gapUs - 1L, 4L),
    (3L, 0L, 5L), (3L, gapUs + 1L, 6L)
  ).toDF("user_id", "ts_us", "event_id")
    .withColumn("time", timestamp_micros(col("ts_us")))

  describe("session_window vs lag+cumsum at diff == gap") {
    it("session_window merges the exact-gap pair (inclusive break: diff > gap splits)") {
      val sessions = events
        .groupBy(session_window(col("time"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), max("n_events").as("max_n"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(sessions(1L) == ((1L, 2L)), "exact-gap pair must merge into one session")
      assert(sessions(2L) == ((1L, 2L)), "inside-gap pair must merge")
      assert(sessions(3L) == ((2L, 1L)), "outside-gap pair must split")
    }

    it("Curation.sessionize merges the exact-gap pair (inclusive > break)") {
      val sessions = Curation.sessionStats(events, "user_id", "ts_us", "event_id", gapUs)
        .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sessions(1L) == 1L, "exact-gap pair merges under the lag-based rule")
      assert(sessions(2L) == 1L)
      assert(sessions(3L) == 2L)
    }

    it("the inclusive lag+cumsum form (q73 oracle shape) matches session_window everywhere") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val inclusive = events
        .withColumn("brk", when(lag(col("ts_us"), 1).over(w).isNull
          .or(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs), 1).otherwise(0))
        .withColumn("session_seq", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"), min("ts_us").as("start_us"))
        .select("user_id", "n_events", "start_us")
      val native = events
        .groupBy(session_window(col("time"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), min("ts_us").as("start_us"))
        .select("user_id", "n_events", "start_us")
      assert(inclusive.except(native).isEmpty && native.except(inclusive).isEmpty)
    }
  }
}
