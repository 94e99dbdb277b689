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

  describe("decode stage (javax.imageio codec, per-partition batches)") {
    it("decodes PNG fixtures to exact dimensions, band counts and brightness") {
      import spark.implicits._
      val fixtures = Seq(
        (0L, Multimodal.encodePng(3, 5, 0x804020, "rgb")),
        (1L, Multimodal.encodePng(40, 7, 0x112233, "argb")),
        (2L, Multimodal.encodePng(9, 9, 0x606060, "gray")),
        (3L, "definitely not an image".getBytes("UTF-8")),
        // a TRUNCATED png header: IOException path, not the null path
        (4L, Multimodal.encodePng(8, 8, 0x010203, "rgb").take(20)))
      val df = spark.createDataset(fixtures).toDF("asset_id", "payload").repartition(3)
      val feats = Multimodal.decodeImageFeatures(df, "asset_id", "payload")
      assert(feats.columns.toSeq ==
        Seq("asset_id", "decode_ok", "width", "height", "channels", "brightness"))
      val rows = feats.collect().map(r => r.getLong(0) -> r).toMap
      assert(rows(0L).getBoolean(1) && rows(0L).getInt(2) == 3 && rows(0L).getInt(3) == 5
        && rows(0L).getInt(4) == 3)
      // PNG is lossless: solid RGB round-trips exactly
      assert(math.abs(rows(0L).getDouble(5) - (0x80 + 0x40 + 0x20) / 3.0 / 255.0) < 1e-12)
      assert(rows(1L).getBoolean(1) && rows(1L).getInt(2) == 40 && rows(1L).getInt(4) == 4)
      assert(math.abs(rows(1L).getDouble(5) - (0x11 + 0x22 + 0x33) / 3.0 / 255.0) < 1e-12)
      assert(rows(2L).getBoolean(1) && rows(2L).getInt(4) == 1)
      // corrupt payloads flag, carry nulls, and never throw
      Seq(3L, 4L).foreach { id =>
        assert(!rows(id).getBoolean(1) && rows(id).isNullAt(2) && rows(id).isNullAt(3)
          && rows(id).isNullAt(4) && rows(id).isNullAt(5))
      }
    }
    it("decode is format-agnostic: BMP, GIF and JPEG payloads all decode through the same stage") {
      import spark.implicits._
      def encodeAs(fmt: String, w: Int, h: Int, gray: Int): Array[Byte] = {
        val im = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        for (y <- 0 until h; x <- 0 until w) im.getRaster.setSample(x, y, 0, gray)
        val bos = new java.io.ByteArrayOutputStream()
        assert(javax.imageio.ImageIO.write(im, fmt, bos), s"no $fmt writer")
        bos.toByteArray
      }
      val fixtures = Seq(
        (0L, encodeAs("bmp", 6, 4, 120)),
        (1L, encodeAs("gif", 5, 7, 200)),
        (2L, encodeAs("jpg", 8, 8, 64)))
      val df = spark.createDataset(fixtures).toDF("asset_id", "payload").repartition(2)
      val rows = Multimodal.decodeImageFeatures(df, "asset_id", "payload")
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(rows(0L).getBoolean(1) && rows(0L).getInt(2) == 6 && rows(0L).getInt(3) == 4)
      assert(rows(1L).getBoolean(1) && rows(1L).getInt(2) == 5 && rows(1L).getInt(3) == 7)
      assert(rows(2L).getBoolean(1) && rows(2L).getInt(2) == 8 && rows(2L).getInt(3) == 8)
      // brightness reads through getRGB, which gamma-converts gray
      // rasters to sRGB — so for these gray fixtures only pin that
      // brightness is present, sane, and identical where the payload
      // pipelines agree (exact raster-level round-trip is pinned by
      // the MJPEG tier, which reads the raster directly)
      Seq(0L, 1L, 2L).foreach { id =>
        val b = rows(id).getDouble(5)
        assert(b > 0.0 && b < 1.0, s"asset $id brightness $b")
      }
    }

    it("decodes WAV fixtures exactly, peak scan survives chunk boundaries and sign") {
      import spark.implicits._
      // 6000 stereo frames = 24000 PCM bytes: the peak sample sits past
      // the decoder's 8192-byte chunk boundary, and it is NEGATIVE —
      // both the chunked scan and the abs() path are exercised
      val big = new Array[Short](12000)
      big(9001) = -12345
      val fixtures = Seq(
        (0L, Multimodal.encodeWavPcm16(8000, 1, Array[Short](0, 7, -3, 0))),
        (1L, Multimodal.encodeWavPcm16(44100, 2, big)),
        (2L, "not audio".getBytes("UTF-8")),
        // truncated RIFF header: the IOException path
        (3L, Multimodal.encodeWavPcm16(8000, 1, Array[Short](1, 2, 3)).take(10)))
      val feats = Multimodal.decodeAudioFeatures(
        spark.createDataset(fixtures).toDF("asset_id", "payload").repartition(2),
        "asset_id", "payload")
      val rows = feats.collect().map(r => r.getLong(0) -> r).toMap
      assert(rows(0L).getBoolean(1) && rows(0L).getInt(2) == 8000 && rows(0L).getInt(3) == 1
        && rows(0L).getInt(4) == 16 && rows(0L).getLong(5) == 4L && rows(0L).getInt(6) == 7)
      assert(rows(1L).getBoolean(1) && rows(1L).getInt(3) == 2
        && rows(1L).getLong(5) == 6000L && rows(1L).getInt(6) == 12345)
      Seq(2L, 3L).foreach { id =>
        assert(!rows(id).getBoolean(1) && rows(id).isNullAt(2) && rows(id).isNullAt(6))
      }
    }
    it("keeps the original plumbing contract: typed features joinable by id") {
      val feats = Multimodal.decodeImageFeatures(assets, "asset_id", "payload")
      assert(feats.count() == 6)
      // the text payloads in `assets` are not images — all flagged, none fatal
      assert(feats.filter(col("decode_ok")).count() == 0)
      val joined = assets.withColumn("meta", Multimodal.metaOf(col("payload"), lit("t")))
        .join(feats, "asset_id")
      assert(joined.count() == 6 && joined.columns.contains("width"))
    }
  }

  describe("image resize (real decode, integer nearest-neighbor)") {
    it("maps pixels by integer coordinates and re-encodes a decodable PNG") {
      // a 4x4 image, left half red, right half blue: nearest-neighbor
      // to 2x2 must sample pixels (0,0),(2,0),(0,2),(2,2) exactly
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 4)
        img.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val assets = Seq((1L, bos.toByteArray), (2L, Array[Byte](9, 9)))
        .toDF("asset_id", "payload")
      val rows = Multimodal.resizeImages(assets, "asset_id", "payload", 2, 2)
        .orderBy("asset_id").collect()
      assert(rows(0).getBoolean(1))
      assert(rows(0).getInt(4) === 0xff0000)  // px_00 = red
      assert(rows(0).getInt(5) === 0x0000ff)  // px_center = (1,1) -> src (2,2) = blue
      // the re-encoded payload decodes with the normal image tier
      val rt = Multimodal.decodeImageFeatures(
        Seq((1L, rows(0).getAs[Array[Byte]]("payload"))).toDF("asset_id", "payload"),
        "asset_id", "payload").head()
      assert(rt.getAs[Boolean]("decode_ok") && rt.getAs[Int]("width") === 2)
      assert(!rows(1).getBoolean(1)) // corrupt flagged, not fatal
    }
  }

  describe("video frame sampling (stub codec, real plumbing)") {
    it("samples every stride-th frame with integer timestamps") {
      val assets = Seq(
        (1L, Multimodal.encodeGvid(fps = 25, lumas = Seq(10, 20, 30, 40, 50))),
        (2L, Array[Byte](1, 2, 3))).toDF("asset_id", "payload")
      val got = Multimodal.sampleVideoFrames(assets, "asset_id", "payload", stride = 2)
        .orderBy("asset_id", "frame_idx").collect()
      val ok = got.filter(_.getBoolean(1))
      assert(ok.map(r => (r.getInt(2), r.getLong(3), r.getInt(4))).toSeq ===
        Seq((0, 0L, 10), (2, 80L, 30), (4, 160L, 50)))
      val bad = got.filter(!_.getBoolean(1))
      assert(bad.map(_.getLong(0)).toSeq === Seq(2L) && bad.head.isNullAt(2))
    }

    it("round-trips the GVID fixture exactly at stride 1") {
      val lumas = (0 until 300).map(i => (i * 7) % 256)
      val assets = Seq((7L, Multimodal.encodeGvid(30, lumas))).toDF("asset_id", "payload")
      val got = Multimodal.sampleVideoFrames(assets, "asset_id", "payload", stride = 1)
        .orderBy("frame_idx").collect()
      assert(got.length === 300)
      assert(got.map(_.getInt(4)).toSeq === lumas)
      assert(got(299).getLong(3) === 299L * 1000L / 30L)
    }
  }

  describe("video frame sampling (REAL container: MJPEG-in-AVI)") {
    it("demuxes a real AVI and decodes every JPEG frame exactly at stride 1") {
      val lumas = (0 until 48).map(i => (i * 11) % 256)
      val assets = Seq((3L, Multimodal.encodeMjpegAvi(25, lumas)))
        .toDF("asset_id", "payload")
      val got = Multimodal.sampleMjpegAviFrames(assets, "asset_id", "payload", stride = 1)
        .orderBy("frame_idx").collect()
      assert(got.length === 48)
      assert(got.forall(_.getBoolean(1)))
      // uniform-gray JPEG round-trips exactly — decoded luma IS the input
      assert(got.map(_.getInt(4)).toSeq === lumas)
      // ts off the container's rational rate: i*1000*scale div rate
      assert(got.map(_.getLong(3)).toSeq === (0 until 48).map(_ * 1000L / 25L))
    }

    it("scene cuts flag per-asset luma jumps; first frame is never a cut") {
      val frames = Seq(
        (1L, 0, 0L, 10), (1L, 1, 100L, 10), (1L, 2, 200L, 80),
        (1L, 3, 300L, 82), (1L, 4, 400L, 20),
        (2L, 0, 0L, 200), (2L, 1, 50L, 140))
        .toDF("asset_id", "frame_idx", "ts_ms", "luma")
      val got = Multimodal.sceneCuts(frames, threshold = 50)
        .orderBy("asset_id", "frame_idx")
        .select("asset_id", "frame_idx", "is_cut").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSeq
      assert(got === Seq(
        (1L, 0, false), (1L, 1, false), (1L, 2, true), (1L, 3, false), (1L, 4, true),
        (2L, 0, false), (2L, 1, true)))
    }

    it("scene representatives: running cut count segments; first frame of each scene wins") {
      val frames = Seq(
        (1L, 0, 0L, 10), (1L, 1, 100L, 10), (1L, 2, 200L, 80),
        (1L, 3, 300L, 82), (1L, 4, 400L, 20))
        .toDF("asset_id", "frame_idx", "ts_ms", "luma")
      val got = Multimodal.sceneRepresentatives(frames, threshold = 50)
        .orderBy("frame_idx")
        .select("frame_idx", "scene_id", "is_representative").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2))).toSeq
      assert(got === Seq((0, 0L, true), (1, 0L, false), (2, 1L, true), (3, 1L, false), (4, 2L, true)))
    }

    it("strides, flags corrupt containers, and flags a single bad frame without hiding the rest") {
      val good = Multimodal.encodeMjpegAvi(10, Seq(10, 20, 30, 40, 50))
      // corrupt ONE frame in a valid container: zero out the middle
      // 00dc chunk's JPEG magic so demux succeeds but decode fails
      val oneBad = Multimodal.encodeMjpegAvi(10, Seq(10, 20, 30, 40, 50))
      val idx = {
        // find the third 00dc occurrence
        def find(from: Int, needle: String): Int = {
          val n = needle.getBytes("US-ASCII")
          (from until oneBad.length - n.length).find(i => n.indices.forall(j => oneBad(i + j) == n(j))).getOrElse(-1)
        }
        val f1 = find(0, "00dc"); val f2 = find(f1 + 4, "00dc"); find(f2 + 4, "00dc")
      }
      oneBad(idx + 8) = 0; oneBad(idx + 9) = 0 // clobber SOI marker
      val assets = Seq(
        (0L, good),
        (1L, oneBad),
        (2L, "junk".getBytes("UTF-8")),
        (3L, Multimodal.encodeGvid(10, Seq(1, 2, 3)))) // video, wrong container
        .toDF("asset_id", "payload").repartition(2)
      val got = Multimodal.sampleMjpegAviFrames(assets, "asset_id", "payload", stride = 2)
        .orderBy("asset_id", "frame_idx").collect()
      val byId = got.groupBy(_.getLong(0))
      // stride 2 over 5 frames -> idx 0,2,4
      assert(byId(0L).map(r => (r.getInt(2), r.getInt(4))).toSeq === Seq((0, 10), (2, 30), (4, 50)))
      // asset 1: frame 2 is the clobbered one — flagged, idx/ts kept, others intact
      val a1 = byId(1L).map(r => (r.getInt(2), r.getBoolean(1))).toSeq
      assert(a1 === Seq((0, true), (2, false), (4, true)))
      assert(byId(1L).find(_.getInt(2) == 2).get.isNullAt(4))
      // corrupt containers: single false row each, null frame fields
      Seq(2L, 3L).foreach { id =>
        assert(byId(id).length === 1 && !byId(id).head.getBoolean(1) && byId(id).head.isNullAt(2))
      }
    }

    it("demuxes an audio-first AVI: video at stream 01, frames as 01dc") {
      def u16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def u32(v: Long): Array[Byte] = Array(
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
        fcc(id) ++ u32(body.length.toLong) ++ body ++ pad
      }
      def list(kind: String, body: Array[Byte]): Array[Byte] =
        fcc("LIST") ++ u32((body.length + 4).toLong) ++ fcc(kind) ++ body
      val lumas = Seq(15, 45, 75)
      val jpegs = lumas.map { g =>
        val im = new java.awt.image.BufferedImage(16, 16,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val r = im.getRaster
        for (y <- 0 until 16; x <- 0 until 16) r.setSample(x, y, 0, g)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "jpg", bos)
        bos.toByteArray
      }
      val strhAud = chunk("strh",
        fcc("auds") ++ fcc("    ") ++ u32(0L) ++ u16(0) ++ u16(0) ++
        u32(0L) ++ u32(1L) ++ u32(8000L) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(0L))
      val strfAud = chunk("strf", u32(0L) ++ u32(0L))
      val strhVid = chunk("strh",
        fcc("vids") ++ fcc("MJPG") ++ u32(0L) ++ u16(0) ++ u16(0) ++
        u32(0L) ++ u32(1L) ++ u32(10L) ++
        u32(0L) ++ u32(jpegs.length.toLong) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++
        u16(0) ++ u16(0) ++ u16(16) ++ u16(16))
      val strfVid = chunk("strf",
        u32(40L) ++ u32(16L) ++ u32(16L) ++ u16(1) ++ u16(24) ++
        fcc("MJPG") ++ u32((16 * 16 * 3).toLong) ++ Array.fill(16)(0.toByte))
      val avih = chunk("avih",
        u32(100000L) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++
        u32(jpegs.length.toLong) ++ u32(0L) ++ u32(2L) ++ u32(0L) ++
        u32(16L) ++ u32(16L) ++ Array.fill(16)(0.toByte))
      val hdrl = list("hdrl", avih ++ list("strl", strhAud ++ strfAud) ++
        list("strl", strhVid ++ strfVid))
      // movi interleaves audio (00wb, stream 0) with video frames (01dc)
      val audioChunk = chunk("00wb", Array.fill(32)(7.toByte))
      val movi = list("movi",
        jpegs.flatMap(f => audioChunk ++ chunk("01dc", f)).toArray)
      val payload = fcc("AVI ") ++ hdrl ++ movi
      val avi = fcc("RIFF") ++ u32(payload.length.toLong) ++ payload
      val got = Multimodal.sampleMjpegAviFrames(
        Seq((9L, avi)).toDF("asset_id", "payload"), "asset_id", "payload", stride = 1)
        .orderBy("frame_idx").collect()
      assert(got.length === 3)
      assert(got.forall(_.getBoolean(1)))
      assert(got.map(_.getInt(4)).toSeq === lumas)
      assert(got.map(_.getLong(3)).toSeq === Seq(0L, 100L, 200L))
    }

    it("fails soft (one flagged row) on a container nesting 200k LISTs — no stack overflow") {
      val n = 200000
      val bytes = new Array[Byte](12 + 12 * n)
      def put(off: Int, s: String): Unit = {
        val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, bytes, off, 4)
      }
      def putU32(off: Int, v: Long): Unit = {
        bytes(off) = (v & 0xff).toByte; bytes(off + 1) = ((v >> 8) & 0xff).toByte
        bytes(off + 2) = ((v >> 16) & 0xff).toByte; bytes(off + 3) = ((v >> 24) & 0xff).toByte
      }
      put(0, "RIFF"); putU32(4, (bytes.length - 8).toLong); put(8, "AVI ")
      var off = 12
      while (off < bytes.length) {
        put(off, "LIST"); putU32(off + 4, (bytes.length - off - 8).toLong); put(off + 8, "deep")
        off += 12
      }
      val got = Multimodal.sampleMjpegAviFrames(
        Seq((5L, bytes)).toDF("asset_id", "payload"), "asset_id", "payload", stride = 1)
        .collect()
      assert(got.length === 1 && !got.head.getBoolean(1) && got.head.isNullAt(2))
    }

    it("dHash: closed-form on PNG, resize-invariant, JPEG-stable, scenes far apart") {
      import graft.multimodal.Multimodal
      val scenes = Seq((2, 0), (5, 3), (7, 1))
      // scenes are mutually distant in dHash space BY the closed form —
      // the a priori guarantee the pair ground truth rests on
      for (Seq((pa, qa), (pb, qb)) <- scenes.combinations(2)) {
        val d = java.lang.Long.bitCount(
          Multimodal.cellPatternDHash(pa, qa) ^ Multimodal.cellPatternDHash(pb, qb))
        assert(d > 12, s"scenes ($pa,$qa) and ($pb,$qb) only $d bits apart")
      }
      val assets = scenes.zipWithIndex.flatMap { case ((p, q), k) =>
        Seq(
          (k * 3L, Multimodal.encodeCellPattern(10, p, q, "png")),
          (k * 3L + 1, Multimodal.encodeCellPattern(5, p, q, "png")), // re-rendered smaller
          (k * 3L + 2, Multimodal.encodeCellPattern(10, p, q, "jpg"))) // lossy re-encode
      } :+ ((90L, "not an image".getBytes("UTF-8")))
      val df = assets.toDF("asset_id", "payload").repartition(3)
      val hashes = Multimodal.dHash64(df, "asset_id", "payload")
        .collect().map(r => r.getLong(0) ->
          (if (r.getBoolean(1)) Some(r.getLong(2)) else None)).toMap
      // lossless variants hit the closed form exactly; resize is a no-op
      scenes.zipWithIndex.foreach { case ((p, q), k) =>
        val expect = Multimodal.cellPatternDHash(p, q)
        assert(hashes(k * 3L) === Some(expect))
        assert(hashes(k * 3L + 1) === Some(expect))
        // JPEG: within a tight radius of the closed form
        val jd = java.lang.Long.bitCount(hashes(k * 3L + 2).get ^ expect)
        assert(jd <= 6, s"jpeg variant of scene $k drifted $jd bits")
      }
      assert(hashes(90L).isEmpty)
      // pairing: exactly the within-scene triangles, corrupt asset absent
      val pairs = Multimodal.perceptualDupPairs(df, "asset_id", "payload", maxHamming = 12)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expectPairs = (0 until 3).flatMap { k =>
        val b = k * 3L
        Seq((b, b + 1), (b, b + 2), (b + 1, b + 2))
      }.toSet
      assert(pairs === expectPairs)
    }

    it("flags a parsed container with zero video frames instead of dropping the asset") {
      val empty = Multimodal.encodeMjpegAvi(10, Seq.empty)
      val got = Multimodal.sampleMjpegAviFrames(
        Seq((6L, empty)).toDF("asset_id", "payload"), "asset_id", "payload", stride = 1)
        .collect()
      assert(got.length === 1 && !got.head.getBoolean(1) && got.head.isNullAt(2))
    }
  }
}
