package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for the 100 TB training-data
  * pipeline: payloads are opaque `binary` columns with a typed metadata
  * struct riding alongside; every filter/dedup/fingerprint op is a
  * codegen'd expression over the bytes, and the only stage that needs a
  * real media codec (decode) is an isolated per-partition batch stage
  * backed by the JDK's `javax.imageio` readers (PNG/JPEG/GIF/BMP, zero
  * added dependencies); exotic formats would swap in a richer codec at
  * the same seam.
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

  // ---- decode stage (per-partition batch plumbing; real JDK codec) ----

  /** Decoded-image features. `decode_ok = false` (payload not a
    * decodable image) carries nulls for the pixel-derived columns —
    * downstream quality gates filter on the flag instead of dying on
    * the first corrupt asset in a 100 TB sweep.
    */
  final case class ImageFeatures(asset_id: Long, decode_ok: Boolean,
      width: Option[Int], height: Option[Int], channels: Option[Int],
      brightness: Option[Double])

  /** Decode one batch of payloads with the JDK's `javax.imageio` codecs
    * (PNG/JPEG/GIF/BMP ship with every JRE — no added dependency).
    * Features: dimensions, raster band count (3 = RGB, 4 = RGBA,
    * 1 = grayscale), and mean luminance over a bounded ≤64×64 probe
    * grid — O(1) per asset regardless of resolution, so a 100-megapixel
    * outlier cannot stall its partition. Undecodable or truncated
    * payloads yield the failure row, never an exception.
    */
  private def decodeBatch(batch: Iterator[(Long, Array[Byte])]): Iterator[ImageFeatures] =
    batch.map { case (id, bytes) =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) ImageFeatures(id, decode_ok = false, None, None, None, None)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val bands = img.getRaster.getNumBands
          val sx = math.max(1, w / 64)
          val sy = math.max(1, h / 64)
          var sum = 0.0
          var n = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0 / 255.0
              n += 1
              x += sx
            }
            y += sy
          }
          ImageFeatures(id, decode_ok = true, Some(w), Some(h), Some(bands),
            Some(if (n == 0) 0.0 else sum / n))
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          ImageFeatures(id, decode_ok = false, None, None, None, None)
      }
    }

  /** Deterministic PNG fixture (driver/test side): a `width`×`height`
    * solid-color image. `kind` picks the raster type the decoder will
    * see back: "rgb" → 3 bands, "argb" → 4, "gray" → 1. PNG is
    * lossless, so an RGB/ARGB fixture round-trips its exact color —
    * which makes decoded brightness exactly (r+g+b)/3/255.
    */
  def encodePng(width: Int, height: Int, rgb: Int, kind: String = "rgb"): Array[Byte] = {
    import java.awt.image.BufferedImage
    val imageType = kind match {
      case "rgb"  => BufferedImage.TYPE_INT_RGB
      case "argb" => BufferedImage.TYPE_INT_ARGB
      case "gray" => BufferedImage.TYPE_BYTE_GRAY
      case other  => throw new IllegalArgumentException(s"unknown fixture kind '$other'")
    }
    val img = new BufferedImage(width, height, imageType)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, 0xFF000000 | rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit difference hash (dHash) row: the perceptual fingerprint
    * that survives re-encoding and resizing, unlike the exact
    * [[fingerprint64]] (xxhash64 of the BYTES, which any quality
    * change breaks). Failure contract as everywhere in this tier: an
    * undecodable payload flags instead of throwing.
    */
  final case class PerceptualHash(asset_id: Long, decode_ok: Boolean, dhash: Option[Long])

  /** dHash: area-average the decoded image onto a 9×8 luma grid
    * (integer BT.601 over every pixel of each cell — resolution-
    * invariant by construction, no interpolation kernel to disagree
    * about), then bit gy·8+gx = cell(gx) > cell(gx+1) within the row.
    * The classic re-encoded/rescaled-duplicate detector for scraped
    * image corpora: JPEG noise moves cell AVERAGES by a few luma
    * levels, so comparisons with any real margin are stable, while the
    * byte-level hash changes completely. Decode runs batched
    * per-partition (the codec seam); everything downstream is columnar.
    */
  def dHash64(assets: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try {
          val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (im == null) PerceptualHash(id, decode_ok = false, None)
          else {
            val w = im.getWidth; val h = im.getHeight
            val gw = 9; val gh = 8
            val cell = Array.ofDim[Long](gh, gw)
            var gy = 0
            while (gy < gh) {
              var gx = 0
              while (gx < gw) {
                val x0 = gx * w / gw; val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
                val y0 = gy * h / gh; val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
                var sum = 0L; var n = 0L
                var y = y0
                while (y < math.min(y1, h)) {
                  var x = x0
                  while (x < math.min(x1, w)) {
                    val rgb = im.getRGB(x, y)
                    sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                      114L * (rgb & 0xff)) / 1000L
                    n += 1; x += 1
                  }
                  y += 1
                }
                cell(gy)(gx) = if (n == 0) 0L else sum / n
                gx += 1
              }
              gy += 1
            }
            var hash = 0L
            gy = 0
            while (gy < gh) {
              var gx = 0
              while (gx < 8) {
                if (cell(gy)(gx) > cell(gy)(gx + 1)) hash |= (1L << (gy * 8 + gx))
                gx += 1
              }
              gy += 1
            }
            PerceptualHash(id, decode_ok = true, Some(hash))
          }
        } catch {
          case scala.util.control.NonFatal(_) => PerceptualHash(id, decode_ok = false, None)
        }
      })
      .toDF()
  }

  /** Perceptual near-dup pairs: decode → [[dHash64]] → Hamming-banded
    * bucket join ([[graft.analytics.Dedup.hammingPairs64]], the q56
    * machinery — recall 1 for the radius, never a cross join).
    * Undecodable assets are excluded (they have no perceptual
    * identity; route them through the exact byte hash instead).
    * Output: (i, j, hamming).
    */
  def perceptualDupPairs(assets: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int): DataFrame =
    graft.analytics.Dedup.hammingPairs64(
      dHash64(assets, idCol, payloadCol).filter(col("decode_ok")),
      "asset_id", "dhash", maxHamming)

  /** Deterministic PATTERNED fixture for the perceptual tier: 9×8 flat
    * cells of `cellPx`×`cellPx` pixels; row gy's cell lumas are a
    * margin-25 permutation 20 + 25·((gx·p + gy + q) mod 9), so every
    * adjacent-cell comparison has ≥ 25 levels of margin — far above
    * JPEG's few-level noise on near-flat cells — and the expected
    * dHash is the closed form of (p, q) alone, independent of cellPx
    * and of the encode format. `p` must be coprime to 9.
    */
  def encodeCellPattern(cellPx: Int, p: Int, q: Int, format: String): Array[Byte] = {
    require(cellPx >= 1, "cellPx >= 1")
    require(p % 3 != 0, "p must be coprime to 9")
    val w = 9 * cellPx; val h = 8 * cellPx
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = im.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val gx = x / cellPx; val gy = y / cellPx
        r.setSample(x, y, 0, 20 + 25 * ((gx * p + gy + q) % 9))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, format, bos)
    bos.toByteArray
  }

  /** The closed-form dHash of an [[encodeCellPattern]] fixture. */
  def cellPatternDHash(p: Int, q: Int): Long = {
    var hash = 0L
    for (gy <- 0 until 8; gx <- 0 until 8)
      if ((gx * p + gy + q) % 9 > ((gx + 1) * p + gy + q) % 9)
        hash |= (1L << (gy * 8 + gx))
    hash
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

  /** Decoded-audio features, same failure contract as [[ImageFeatures]]:
    * a corrupt payload flips the flag instead of killing the sweep.
    * All features are INTEGER (rate, channels, bits, frames, peak |PCM|
    * sample) so fixture ground truth is exact, not float-fuzzy.
    */
  final case class AudioFeatures(asset_id: Long, decode_ok: Boolean,
      sample_rate: Option[Int], channels: Option[Int], bits: Option[Int],
      n_frames: Option[Long], peak: Option[Int])

  /** Decode one batch with the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * ship with every JRE — no added dependency, same zero-dep policy as
    * the image path). Peak amplitude scans the PCM16 stream in
    * fixed-size chunks — O(frames) but constant memory, so an hour-long
    * outlier cannot blow its partition's heap.
    */
  private def decodeAudioBatch(batch: Iterator[(Long, Array[Byte])]): Iterator[AudioFeatures] =
    batch.map { case (id, bytes) =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = ais.getFormat
          val frames = ais.getFrameLength
          var peak = 0
          val buf = new Array[Byte](8192)
          var read = ais.read(buf)
          var carry = -1 // low byte of a sample split across chunk boundaries
          while (read > 0) {
            var i = 0
            if (carry >= 0 && read > 0) {
              val s = (buf(0) << 8) | carry
              peak = math.max(peak, math.abs(s))
              carry = -1
              i = 1
            }
            while (i + 1 < read) {
              // PCM16 little-endian: low byte then signed high byte
              val s = (buf(i + 1) << 8) | (buf(i) & 0xFF)
              peak = math.max(peak, math.abs(s))
              i += 2
            }
            if (i < read) carry = buf(i) & 0xFF
            read = ais.read(buf)
          }
          AudioFeatures(id, decode_ok = true, Some(f.getSampleRate.toInt),
            Some(f.getChannels), Some(f.getSampleSizeInBits), Some(frames), Some(peak))
        } finally ais.close()
      } catch {
        case scala.util.control.NonFatal(_) =>
          AudioFeatures(id, decode_ok = false, None, None, None, None, None)
      }
    }

  /** Deterministic WAV fixture (PCM16): `samples` interleaved across
    * `channels`, written through the JDK's own RIFF writer so the
    * decoder sees a real container, not a hand-rolled header.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.length % channels == 0, "samples must cover whole frames")
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Per-partition batched audio decode — same stage shape (prune to
    * (id, payload), codec once per batch) as [[decodeImageFeatures]].
    */
  def decodeAudioFeatures(assets: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodeAudioBatch)
      .toDF()
  }

  /** A resized image: the re-encoded PNG payload plus its verified
    * dimensions and a deterministic corner/center pixel probe (packed
    * RGB) — integer evidence an oracle can state in closed form for
    * solid-color fixtures.
    */
  final case class ResizedImage(asset_id: Long, decode_ok: Boolean,
      out_width: Option[Int], out_height: Option[Int],
      px_00: Option[Int], px_center: Option[Int], payload: Array[Byte])

  /** REAL image resize — decode via `javax.imageio`, NEAREST-NEIGHBOR
    * resample by explicit integer pixel mapping
    * (src = (dst·srcDim) div dstDim — pure int math, no rendering
    * pipeline, so the output pixels are bit-deterministic on any JVM),
    * re-encode as PNG. The thumbnail/normalize pre-pass of a
    * multimodal pipeline, batched per partition like the other decode
    * tiers; corrupt payloads flip the flag and carry an empty payload.
    */
  def resizeImages(assets: DataFrame, idCol: String, payloadCol: String,
      outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1, "output dims >= 1")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) ResizedImage(id, decode_ok = false, None, None, None, None, Array.emptyByteArray)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val out = new java.awt.image.BufferedImage(outW, outH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < outH) {
              val sy = (y * h) / outH
              var x = 0
              while (x < outW) {
                out.setRGB(x, y, img.getRGB((x * w) / outW, sy) & 0xffffff)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ResizedImage(id, decode_ok = true, Some(outW), Some(outH),
              Some(out.getRGB(0, 0) & 0xffffff),
              Some(out.getRGB(outW / 2, outH / 2) & 0xffffff),
              bos.toByteArray)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            ResizedImage(id, decode_ok = false, None, None, None, None, Array.emptyByteArray)
        }
      })
      .toDF()
  }

  // ---- video frame sampling (STUB CODEC, real plumbing) ----
  //
  // The JDK ships no video codec and this container has no ffmpeg, so
  // the DECODE here is a deterministic fake: the "GVID" fixture
  // container (magic + fps + frame count + one packed luma per frame)
  // stands in for a real demuxer, exactly the stub contract the image/
  // audio tiers would use without their JDK codecs. Everything AROUND
  // the codec is real and is what this op tests: payload pruning,
  // per-partition batching, the one-row-PER-SAMPLED-FRAME output shape
  // (frame sampling is a flatMap, unlike the 1:1 image/audio ops), the
  // integer timestamp math, and the corrupt-payload failure flag.
  // Swapping in a real demuxer means replacing parseGvid's body.

  /** One sampled frame; a corrupt payload yields a single
    * decode_ok = false row with null frame fields so the asset stays
    * visible downstream.
    */
  final case class VideoFrame(asset_id: Long, decode_ok: Boolean,
      frame_idx: Option[Int], ts_ms: Option[Long], luma: Option[Int])

  /** Deterministic GVID fixture: "GVID" magic, unsigned-short fps and
    * frame count, then one byte-packed luma (0-255) per frame.
    */
  def encodeGvid(fps: Int, lumas: Seq[Int]): Array[Byte] = {
    require(fps > 0 && fps <= 0xffff && lumas.size <= 0xffff, "gvid bounds")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("GVID".getBytes("US-ASCII"))
    bos.write(fps >> 8); bos.write(fps & 0xff)
    bos.write(lumas.size >> 8); bos.write(lumas.size & 0xff)
    lumas.foreach(l => bos.write(l & 0xff))
    bos.toByteArray
  }

  private def parseGvid(bytes: Array[Byte]): Option[(Int, Array[Int])] =
    if (bytes.length < 8 || new String(bytes.take(4), "US-ASCII") != "GVID") None
    else {
      val fps = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
      val n = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
      if (fps == 0 || bytes.length < 8 + n) None
      else Some((fps, Array.tabulate(n)(i => bytes(8 + i) & 0xff)))
    }

  /** Frame-sample every `stride`-th frame of each video asset: one
    * output row per KEPT frame with its integer timestamp
    * (frame·1000 div fps) and the stubbed per-frame feature. Batched
    * per-partition flatMap — the demux cost amortizes per batch and a
    * long asset fans out rows without buffering the whole frame set
    * anywhere (the iterator is lazy per asset).
    */
  def sampleVideoFrames(assets: DataFrame, idCol: String, payloadCol: String,
      stride: Int): DataFrame = {
    require(stride >= 1, "stride >= 1")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseGvid(bytes) match {
          case Some((fps, lumas)) =>
            (0 until lumas.length by stride).iterator.map(i =>
              VideoFrame(id, decode_ok = true, Some(i),
                Some(i.toLong * 1000L / fps), Some(lumas(i))))
          case None =>
            Iterator.single(VideoFrame(id, decode_ok = false, None, None, None))
        }
      })
      .toDF()
  }

  // ---- video frame sampling (REAL container: MJPEG-in-AVI) ----
  //
  // The real-format tier of the video path: a genuine RIFF/AVI
  // demuxer (chunk walker, not a byte scan) over Motion-JPEG streams —
  // the one video format the stock JDK can fully decode, because every
  // frame is an ordinary JPEG for `javax.imageio`. The GVID stub above
  // remains the corrupt-path fixture codec; this tier is what real
  // MJPEG assets (IP cameras, legacy captures) go through. Frame
  // timestamps come from the stream header's RATIONAL rate
  // (ts_ms = idx·1000·scale div rate) — integer math off the
  // container's own clock, no float.

  /** Minimal-but-REAL MJPEG-in-AVI muxer for fixtures and tests:
    * RIFF('AVI ') { LIST hdrl { avih, LIST strl { strh(vids/MJPG,
    * scale=1, rate=fps), strf(BITMAPINFOHEADER/MJPG) } },
    * LIST movi { one '00dc' JPEG chunk per frame } } — word-aligned
    * chunks, little-endian sizes, playable by any AVI demuxer. Each
    * frame is a uniform-gray `w`×`h` JPEG encoded by `javax.imageio`
    * (uniform gray survives JPEG quantization EXACTLY — verified for
    * all 256 levels — which is what lets an oracle pin the decoded
    * luma in closed form).
    */
  def encodeMjpegAvi(fps: Int, frameLumas: Seq[Int], w: Int = 16, h: Int = 16): Array[Byte] = {
    require(fps > 0, "fps > 0")
    val frames = frameLumas.map { g =>
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = im.getRaster
      var y = 0
      while (y < h) { var x = 0; while (x < w) { r.setSample(x, y, 0, g & 0xff); x += 1 }; y += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
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
    val n = frames.length
    val avih = chunk("avih",
      u32(1000000L / fps) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++ // usec/frame, maxbps, pad, flags
      u32(n.toLong) ++ u32(0L) ++ u32(1L) ++ u32(0L) ++       // total frames, initial, streams, bufsize
      u32(w.toLong) ++ u32(h.toLong) ++ Array.fill(16)(0.toByte)) // dims + reserved[4]
    val strh = chunk("strh",
      fcc("vids") ++ fcc("MJPG") ++ u32(0L) ++ u16(0) ++ u16(0) ++ // type, handler, flags, prio, lang
      u32(0L) ++ u32(1L) ++ u32(fps.toLong) ++                    // initial, SCALE, RATE
      u32(0L) ++ u32(n.toLong) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++ // start, length, bufsize, quality, samplesize
      u16(0) ++ u16(0) ++ u16(w) ++ u16(h))                       // rcFrame
    val strf = chunk("strf",
      u32(40L) ++ u32(w.toLong) ++ u32(h.toLong) ++ u16(1) ++ u16(24) ++
      fcc("MJPG") ++ u32((w * h * 3).toLong) ++ Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val payload = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ u32(payload.length.toLong) ++ payload
  }

  /** Real RIFF/AVI demux: walk the chunk tree (no byte scanning), pull
    * the first video stream's rational frame rate from `strh` and every
    * `00dc`/`00db` frame payload from LIST movi. Returns
    * (rate, scale, frames) — ts of frame i is i·1000·scale div rate.
    * Any structural violation (bad magic, truncated chunk, no video
    * stream, zero rate) → None.
    */
  private[multimodal] def parseMjpegAvi(bytes: Array[Byte]): Option[(Long, Long, Vector[Array[Byte]])] = {
    def rU32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
      ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def fccAt(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (bytes.length < 12 || fccAt(0) != "RIFF" || fccAt(8) != "AVI ") return None
    var rate = 0L
    var scale = 0L
    var strhSeen = 0      // strl LISTs appear in stream order: Nth strh = stream N
    var videoStream = -1  // index of the first 'vids' stream (its frames are 'NNdc'/'NNdb')
    val frames = Vector.newBuilder[Array[Byte]]
    var ok = true
    // Iterative chunk walk over [off, end) with an explicit region stack —
    // a corrupt container nesting thousands of LISTs must fail soft
    // (ok=false / zero frames), never StackOverflowError out of the
    // NonFatal handler in the decode stage.
    var off = 12
    var end = bytes.length
    val parentEnds = new java.util.ArrayDeque[Integer]()
    while (ok && (off + 8 <= end || !parentEnds.isEmpty)) {
      if (off + 8 > end) {
        if (off > end) ok = false // misaligned child overran its LIST
        else { off = end; end = parentEnds.pop() } // LIST exhausted: resume parent
      } else {
        val id = fccAt(off)
        val sz = rU32(off + 4)
        val body = off + 8
        if (sz < 0 || body + sz > end) ok = false
        else id match {
          case "LIST" if sz >= 4 =>
            parentEnds.push(end) // descend: children end exactly at body+sz
            end = body + sz.toInt
            off = body + 4 // skip the 4cc list type
          case _ =>
            id match {
              case "strh" =>
                if (sz >= 28 && fccAt(body) == "vids" && videoStream < 0) {
                  videoStream = strhSeen
                  scale = rU32(body + 20)
                  rate = rU32(body + 24)
                }
                strhSeen += 1
              case _ if id(0).isDigit && id(1).isDigit &&
                  (id.endsWith("dc") || id.endsWith("db")) =>
                // frame chunk: keep only the video stream's (audio-first
                // containers put vids at stream 01 — matching a hardcoded
                // '00' would silently drop every frame)
                if ((id(0) - '0') * 10 + (id(1) - '0') == videoStream)
                  frames += java.util.Arrays.copyOfRange(bytes, body, body + sz.toInt)
              case _ => () // avih/strf/idx1/JUNK/audio chunks: structure-checked, skipped
            }
            off = body + sz.toInt + (sz.toInt & 1) // word alignment
        }
      }
    }
    if (ok && off > end) ok = false
    if (!ok || rate <= 0L || scale <= 0L) None
    else Some((rate, scale, frames.result()))
  }

  /** Integer BT.601 luma of the decoded frame's center pixel — exact
    * integer math; single-band (grayscale) images ARE the luma.
    */
  private def centerLuma(im: java.awt.image.BufferedImage): Int = {
    val x = im.getWidth / 2; val y = im.getHeight / 2
    if (im.getRaster.getNumBands == 1) im.getRaster.getSample(x, y, 0)
    else {
      val rgb = im.getRGB(x, y)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
    }
  }

  /** Scene-cut detection over a decoded frame table — the standard
    * video-preprocessing step before "sample one frame per scene" in
    * a training-data pipeline: per asset, frames are ordered by index
    * and a cut is flagged where the luma feature jumps by at least
    * `threshold` against the previous frame (first frame: no previous,
    * diff null, not a cut). Pure window arithmetic over the table the
    * decode stage already produced — one hash shuffle by asset, no
    * re-decode; at 1000 executors each asset's frames sort locally
    * within its partition.
    */
  def sceneCuts(frames: DataFrame, threshold: Int): DataFrame = {
    require(threshold >= 1, "threshold >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("asset_id").orderBy("frame_idx")
    frames
      .withColumn("diff", abs(col("luma") - lag(col("luma"), 1).over(w)))
      .withColumn("is_cut", coalesce(col("diff") >= threshold, lit(false)))
  }

  /** Scene segmentation + representative-frame selection — the full
    * video curation pre-pass composed from the decode and cut stages:
    * frames get a scene id (running count of cuts, per asset, in
    * frame order) and the FIRST frame of each scene is its
    * representative (what a training pipeline embeds/captions instead
    * of every near-identical frame). Window arithmetic over the
    * decoded frame table; one hash shuffle by asset.
    */
  def sceneRepresentatives(frames: DataFrame, threshold: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("asset_id").orderBy("frame_idx")
    sceneCuts(frames, threshold)
      .withColumn("scene_id", sum(col("is_cut").cast("int")).over(w))
      .withColumn("is_representative",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("asset_id", "scene_id").orderBy("frame_idx")) === 1)
  }

  /** Frame-sample every `stride`-th frame of each MJPEG-in-AVI asset —
    * the REAL-format sibling of [[sampleVideoFrames]], same contract:
    * one row per kept frame (flatMap fan-out), integer timestamps from
    * the stream's rational rate, corrupt CONTAINER → one decode_ok =
    * false row, corrupt individual FRAME → that frame's row flagged
    * false (idx/ts kept, luma null) so a single bad frame in a long
    * asset cannot hide the rest. Demux + JPEG decode run batched
    * per-partition (`mapPartitions`) — the correct seam for a codec no
    * Catalyst expression can express; everything else stays columnar.
    */
  def sampleMjpegAviFrames(assets: DataFrame, idCol: String, payloadCol: String,
      stride: Int): DataFrame = {
    require(stride >= 1, "stride >= 1")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseMjpegAvi(bytes) match {
          // parsed header but zero video frames (e.g. frames belong to a
          // stream we don't track, or an empty movi): flag it rather
          // than letting the asset silently vanish from the output
          case Some((_, _, frames)) if frames.isEmpty =>
            Iterator.single(VideoFrame(id, decode_ok = false, None, None, None))
          case Some((rate, scale, frames)) =>
            (0 until frames.length by stride).iterator.map { i =>
              val ts = i.toLong * 1000L * scale / rate
              try {
                val im = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(frames(i)))
                if (im == null) VideoFrame(id, decode_ok = false, Some(i), Some(ts), None)
                else VideoFrame(id, decode_ok = true, Some(i), Some(ts), Some(centerLuma(im)))
              } catch {
                case scala.util.control.NonFatal(_) =>
                  VideoFrame(id, decode_ok = false, Some(i), Some(ts), None)
              }
            }
          case None =>
            Iterator.single(VideoFrame(id, decode_ok = false, None, None, None))
        }
      })
      .toDF()
  }
}
