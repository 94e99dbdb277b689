package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Point

/** Loaders for the driver testdata (`TESTDATA.md`) plus the canonical
  * events→Point mapping used by the oracle queries.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Epoch-microsecond bigint from the events `ts` field, robust to the
    * generator's timestamp encoding (it has shipped BOTH across driver
    * rounds): TIMESTAMP(NANOS) — unreadable by Spark's parquet reader
    * except as a raw nanosecond long via `nanosAsLong` — divides to
    * micros (the same truncation DuckDB applies to nanos); plain
    * TIMESTAMP[us] (NTZ or LTZ) converts directly — sessions run UTC,
    * so naive == UTC, the same convention DuckDB's `epoch_us` uses.
    * `ts_us` (exact bigint) is the cross-engine comparison currency.
    */
  private[graft] def tsMicros(schema: org.apache.spark.sql.types.StructType):
      org.apache.spark.sql.Column =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw
      .withColumn("ts_us", tsMicros(raw.schema))
      .withColumn("time", timestamp_micros(col("ts_us")))
  }

  /** Events as canonical Points:
    *   - time         = ts truncated to micros
    *   - measurement  = event_type
    *   - _seq         = event_id (the generator's insertion order)
    *   - tags         = user (user_id as string),
    *                    bucket = "high" ONLY when value >= 100 (a
    *                    deliberately sometimes-missing key so the
    *                    missing-key→False / ~q→True semantics are
    *                    exercised against real data)
    *   - fields       = value, user_id, k (parsed from the props JSON)
    */
  def eventsAsPoints(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
    e.select(
      col("time"),
      col("event_type").as(Point.MeasurementCol),
      when(col("value") >= 100,
        map(
          lit("user"), col("user_id").cast("string"),
          lit("bucket"), lit("high")))
        .otherwise(map(lit("user"), col("user_id").cast("string")))
        .as(Point.TagsCol),
      map(
        lit("value"), col("value"),
        lit("user_id"), col("user_id").cast("double"),
        lit("k"), get_json_object(col("props"), "$.k").cast("double")
      ).as(Point.FieldsCol),
      col("event_id").as(Point.SeqCol)
    )
  }
}
