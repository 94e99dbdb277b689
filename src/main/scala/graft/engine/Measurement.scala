package graft.engine

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame}

import graft.model.Point
import graft.query.{MeasurementQuery, Noop, Q}

/** A named-table view over the parent database — every operation is the
  * parent's with an implicit `measurement == name` conjunct, exactly the
  * reference's Measurement delegation (tinyflux/measurement.py:37-395).
  * "Analogous to a table in a traditional RDBMS" (measurement.py:3-5);
  * physically it is a partition-pruned scan, not a copy.
  */
final class Measurement(db: GraftDB, val name: String) {
  private def conj(q: Q): Q = q match {
    case Noop => MeasurementQuery() === name
    case other => (MeasurementQuery() === name) & other
  }

  def allDF(sorted: Boolean = true): DataFrame = db.searchDF(conj(Noop), sorted)
  def all(sorted: Boolean = true): Seq[Point] = db.search(conj(Noop), sorted)
  def length: Long = db.count(conj(Noop))

  /** `__iter__` (measurement.py:78-83): lazy scan of this measurement
    * (toLocalIterator — one partition in driver memory at a time).
    */
  def iterator: Iterator[Point] = db.iteratorFor(conj(Noop))

  def searchDF(q: Q, sorted: Boolean = true): DataFrame = db.searchDF(conj(q), sorted)
  def search(q: Q, sorted: Boolean = true): Seq[Point] = db.search(conj(q), sorted)
  def get(q: Q): Option[Point] = db.get(conj(q))
  def contains(q: Q): Boolean = db.contains(conj(q))
  def count(q: Q): Long = db.count(conj(q))
  def selectDF(keys: Seq[String], q: Q = Noop): DataFrame = db.selectDF(keys, conj(q))

  /** `insert`/`insert_multiple` (measurement.py:192-258): forced to this
    * measurement name; returns the inserted count like the parent.
    */
  def insert(p: Point, compactKeyPrefixes: Option[Boolean] = None): Int =
    db.insert(p, Some(name), compactKeyPrefixes)
  def insertMultiple(ps: Seq[Point], compactKeyPrefixes: Option[Boolean] = None): Int =
    db.insertMultiple(ps, Some(name), compactKeyPrefixes)

  def update(
      q: Q,
      time: Option[Instant] = None,
      measurement: Option[String] = None,
      tags: Map[String, String] = Map.empty,
      fields: Map[String, Double] = Map.empty,
      unsetTags: Seq[String] = Nil,
      unsetFields: Seq[String] = Nil
  ): Long = db.update(conj(q), time, measurement, tags, fields, unsetTags, unsetFields)

  def updateWith(
      q: Q,
      time: Option[Column => Column] = None,
      measurement: Option[Column => Column] = None,
      tags: Option[Column => Column] = None,
      fields: Option[Column => Column] = None
  ): Long = db.updateWith(conj(q), time, measurement, tags, fields)

  /** `update_all` (measurement.py:363-395): every point of this view. */
  def updateAll(
      time: Option[Instant] = None,
      measurement: Option[String] = None,
      tags: Map[String, String] = Map.empty,
      fields: Map[String, Double] = Map.empty,
      unsetTags: Seq[String] = Nil,
      unsetFields: Seq[String] = Nil
  ): Long = update(Noop, time, measurement, tags, fields, unsetTags, unsetFields)

  def remove(q: Q): Long = db.remove(conj(q))
  def removeAll(): Long = db.dropMeasurement(name)

  def getFieldKeys: Seq[String] = db.getFieldKeys(Some(name))
  def getTagKeys: Seq[String] = db.getTagKeys(Some(name))
  def getFieldValues(fieldKey: String): Seq[java.lang.Double] = db.getFieldValues(fieldKey, Some(name))
  def getTagValues(tagKeys: Seq[String] = Nil): Map[String, Seq[String]] = db.getTagValues(tagKeys, Some(name))
  def getTimestamps: Seq[Instant] = db.getTimestamps(Some(name))
}
