package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for the 100 TB training-data
  * pipeline: payloads are opaque `binary` columns with a typed metadata
  * struct riding alongside; every filter/dedup/fingerprint op is a
  * codegen'd expression over the bytes, and the only stage that needs a
  * real media codec (decode) is an isolated per-partition batch stage
  * with the codec stubbed (none ships in this environment) behind a
  * deterministic fake.
  *
  * Schema pattern:
  * {{{
  *   asset_id   bigint
  *   payload    binary        -- raw bytes, column-pruned when untouched
  *   meta       struct<mime string, n_bytes bigint, source string>
  * }}}
  * Parquet stores the binary column page-compressed and column-pruned:
  * metadata-only scans never read payload bytes — the property that
  * makes 100 TB of assets queryable.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("source", StringType)))

  /** Magic-byte MIME sniff — pure expressions over the payload prefix
    * (the binary analogue of file(1)); unknown prefixes → null.
    */
  def sniffMime(payload: Column): Column = {
    def pfx(bytes: Int*): Column =
      substring(payload, 1, bytes.length) === lit(bytes.map(_.toByte).toArray)
    when(pfx(0xFF, 0xD8, 0xFF), "image/jpeg")
      .when(pfx(0x89, 0x50, 0x4E, 0x47), "image/png")
      .when(pfx(0x47, 0x49, 0x46, 0x38), "image/gif")
      .when(pfx(0x52, 0x49, 0x46, 0x46), "audio/wav") // RIFF container
      .when(pfx(0x49, 0x44, 0x33), "audio/mpeg")      // ID3
      .when(pfx(0x25, 0x50, 0x44, 0x46), "application/pdf")
      .otherwise(lit(null).cast("string"))
  }

  /** Content-addressed identity for exact dedup: sha-256 hex of the
    * payload — group/join on the 64-char digest, never on raw bytes, so
    * the dedup shuffle carries 64 bytes per asset, not the asset.
    */
  def contentHash(payload: Column): Column = sha2(payload, 256)

  /** Typed metadata struct derived from the payload. */
  def metaOf(payload: Column, source: Column): Column =
    struct(
      sniffMime(payload).as("mime"),
      length(payload).cast("long").as("n_bytes"),
      source.as("source"))

  /** Size/type quality gate — the binary analogue of text quality
    * filtering: known type, size within [minBytes, maxBytes].
    */
  def qualityFilter(meta: Column, minBytes: Long, maxBytes: Long): Column =
    meta.getField("mime").isNotNull &&
      meta.getField("n_bytes").between(minBytes, maxBytes)

  /** 64-bit payload fingerprint for cheap near-identity bucketing:
    * xxhash64 of the bytes (content hash is for identity; this is for
    * partitioning/sampling keys).
    */
  def fingerprint64(payload: Column): Column = xxhash64(payload)

  // ---- decode stage (per-partition batch plumbing; codec stubbed) ----

  /** Decoded-image features. In production `decodeBatch` calls a real
    * codec; this environment ships none, so the decode is a STUB with a
    * deterministic fake derived from the payload bytes — the Spark-side
    * plumbing (schema, per-partition batching, column pruning before
    * the expensive stage) is the real, tested artifact.
    */
  final case class ImageFeatures(asset_id: Long, width: Int, height: Int, brightness: Double)

  /** STUB decode of one batch of payloads. Replace the body with a real
    * codec (e.g. TwelveMonkeys ImageIO) in production; the deterministic
    * fake maps payload bytes → plausible feature values so downstream
    * logic and tests exercise real data flow.
    */
  private def decodeBatch(batch: Iterator[(Long, Array[Byte])]): Iterator[ImageFeatures] =
    batch.map { case (id, bytes) =>
      // ??? <- real codec goes here; deterministic fake below
      val h = java.util.Arrays.hashCode(bytes)
      val w = 64 + math.abs(h % 1024)
      val ht = 64 + math.abs((h / 1024) % 1024)
      val brightness = (math.abs(h % 25600) / 100.0) / 256.0
      ImageFeatures(id, w, ht, brightness)
    }

  /** Per-partition batched decode: prunes to (id, payload) BEFORE the
    * expensive stage (so Parquet reads only those columns), then runs
    * the codec once per partition-batch — the Scala analogue of a
    * pandas-batched UDF stage. Output is a typed Dataset joined back by
    * asset_id when features need to sit beside the metadata.
    */
  def decodeImageFeatures(assets: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodeBatch)
      .toDF()
  }
}
