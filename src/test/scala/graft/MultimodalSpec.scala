package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Binary-column (multimodal) operators: magic-byte sniffing, content
  * hashing, quality gating, and the batched decode-stage plumbing.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def bytes(prefix: Seq[Int], body: String): Array[Byte] =
    prefix.map(_.toByte).toArray ++ body.getBytes("UTF-8")

  private lazy val assets = Seq(
    (1L, bytes(Seq(0xFF, 0xD8, 0xFF), "a jpeg payload")),
    (2L, bytes(Seq(0x89, 0x50, 0x4E, 0x47), "a png payload")),
    (3L, bytes(Seq(0x52, 0x49, 0x46, 0x46), "wav-ish payload")),
    (4L, bytes(Seq(0x25, 0x50, 0x44, 0x46), "pdf payload")),
    (5L, "no magic at all".getBytes("UTF-8")),
    (6L, bytes(Seq(0xFF, 0xD8, 0xFF), "a jpeg payload")) // dup of 1
  ).toDF("asset_id", "payload")

  describe("mime sniffing") {
    it("classifies by magic bytes; unknown -> null") {
      val mimes = assets.select(col("asset_id"), Multimodal.sniffMime(col("payload")).as("m"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(mimes(1L) == "image/jpeg" && mimes(2L) == "image/png")
      assert(mimes(3L) == "audio/wav" && mimes(4L) == "application/pdf")
      assert(mimes(5L) == null && mimes(6L) == "image/jpeg")
    }
  }

  describe("content hashing and dedup") {
    it("identical payloads share a digest; distinct differ") {
      val hashes = assets.select(col("asset_id"), Multimodal.contentHash(col("payload")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(hashes(1L) == hashes(6L))
      assert(hashes.values.toSet.size == 5)
      assert(hashes(1L).matches("[0-9a-f]{64}"))
    }
  }

  describe("metadata + quality gate") {
    it("builds the typed meta struct and filters on type/size") {
      val withMeta = assets.withColumn("meta",
        Multimodal.metaOf(col("payload"), lit("test")))
      // known-type assets within [10, 40] bytes
      val kept = withMeta.filter(Multimodal.qualityFilter(col("meta"), 10, 40))
        .select("asset_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 3L, 4L, 6L)) // 5 has null mime
      val meta1 = withMeta.filter(col("asset_id") === 1).select("meta.*").head()
      assert(meta1.getAs[String]("mime") == "image/jpeg")
      assert(meta1.getAs[Long]("n_bytes") == 17L)
      assert(meta1.getAs[String]("source") == "test")
    }
  }

  describe("decode stage (stubbed codec, real plumbing)") {
    it("produces deterministic typed features for every asset, joinable by id") {
      val feats = Multimodal.decodeImageFeatures(assets, "asset_id", "payload")
      assert(feats.columns.toSeq == Seq("asset_id", "width", "height", "brightness"))
      assert(feats.count() == 6)
      val rows = feats.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
      // deterministic: identical payloads -> identical features
      assert(rows(1L) == rows(6L))
      assert(rows.values.forall { case (w, h, b) => w >= 64 && h >= 64 && b >= 0.0 && b <= 1.0 })
      // second run identical (stub is a pure function of the bytes)
      val again = Multimodal.decodeImageFeatures(assets, "asset_id", "payload")
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
      assert(again == rows)
      // join-back shape: features sit beside metadata
      val joined = assets.withColumn("meta", Multimodal.metaOf(col("payload"), lit("t")))
        .join(feats, "asset_id")
      assert(joined.count() == 6 && joined.columns.contains("width"))
    }
  }
}
