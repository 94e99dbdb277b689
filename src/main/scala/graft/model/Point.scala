package graft.model

import java.time.Instant

import org.apache.spark.sql.types._

/** The canonical data unit of the engine — a time-stamped, schemaless
  * observation, mirroring the reference's Point
  * (reference: tinyflux/point.py:84-143).
  *
  * Design notes (SURVEY.md §1.5):
  *   - `tags` are low-cardinality string dimensions
  *     (map value may be null, point.py:49-50);
  *   - `fields` are numeric measures (map value may be null; ints are
  *     normalized to doubles exactly like the reference's
  *     `str(float(v))` round-trip, point.py:354);
  *   - `_seq` is an engine-added monotone insertion-order key: Spark has
  *     no "storage order", so insertion-order semantics (`get`,
  *     `get_field_values`, `sorted=False`) are carried by an explicit
  *     column assigned at ingest.
  */
final case class Point(
    time: Instant,
    measurement: String = Point.DefaultMeasurement,
    tags: Map[String, String] = Map.empty,
    fields: Map[String, java.lang.Double] = Map.empty,
    _seq: Long = -1L
) {
  def withSeq(s: Long): Point = copy(_seq = s)
}

object Point {
  val DefaultMeasurement = "_default"

  /** Point carrying a NAIVE wall-clock timestamp — the reference's rule
    * for zone-less datetimes at insert: interpret them as LOCAL time
    * and convert to UTC (database.py:1276 — `astimezone(timezone.utc)`
    * on a naive datetime assumes the system zone; docs/source/time.rst
    * examples 2-3). A migrating caller holding wall-clock times gets
    * the same conversion instead of silently storing wall time as UTC.
    * Pass `zone` explicitly when the observation's locale is not the
    * JVM's default zone.
    */
  def local(time: java.time.LocalDateTime,
      measurement: String = DefaultMeasurement,
      tags: Map[String, String] = Map.empty,
      fields: Map[String, java.lang.Double] = Map.empty,
      zone: java.time.ZoneId = java.time.ZoneId.systemDefault()): Point =
    Point(time.atZone(zone).toInstant, measurement, tags, fields)

  val TimeCol = "time"
  val MeasurementCol = "measurement"
  val TagsCol = "tags"
  val FieldsCol = "fields"
  val SeqCol = "_seq"

  /** Canonical engine schema. MapType is the Spark answer to
    * "schemaless": per-row variable key sets without per-measurement
    * schemas (reference: tinyflux/database.py:60-62).
    */
  val schema: StructType = StructType(Seq(
    StructField(TimeCol, TimestampType, nullable = false),
    StructField(MeasurementCol, StringType, nullable = false),
    StructField(TagsCol, MapType(StringType, StringType, valueContainsNull = true), nullable = false),
    StructField(FieldsCol, MapType(StringType, DoubleType, valueContainsNull = true), nullable = false),
    StructField(SeqCol, LongType, nullable = false)
  ))

  val columns: Seq[String] = Seq(TimeCol, MeasurementCol, TagsCol, FieldsCol, SeqCol)

  /** Validation mirroring the reference's constructor checks
    * (tinyflux/point.py:32-81): tag keys/values strings (null value ok),
    * field values numeric-or-null, booleans rejected (enforced by the
    * type system here — `java.lang.Double` admits no Boolean).
    */
  def validate(p: Point): Point = {
    require(p.time != null, "Point.time must not be null")
    require(p.measurement != null, "Point.measurement must not be null")
    require(p.tags != null && p.tags.keys.forall(_ != null), "tag keys must be non-null strings")
    require(p.fields != null && p.fields.keys.forall(_ != null), "field keys must be non-null strings")
    p
  }
}
