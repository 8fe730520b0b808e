package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** L5 (SURVEY.md §2.9): multimodal columns — rows that carry text, an
  * embedding vector, typed metadata, and an opaque binary payload side by
  * side.
  *
  * The media itself is opaque `BinaryType`; this module provides the
  * Spark-side plumbing (schema, join, struct metadata, partition-friendly
  * batch decode). Container-format METADATA parsing is real —
  * [[parseImageMeta]] reads PNG IHDR and JPEG SOF dimensions,
  * [[parseAudioMeta]] walks WAV/RIFF chunks for channels/rate/duration,
  * both from raw bytes with no libraries — and so is sample/pixel
  * DECODE wherever no third-party codec is needed: WAV PCM
  * ([[decodePcmSamples]], 16-bit signed LE + 8-bit unsigned), 24-bit
  * uncompressed BMP ([[decodeBmp24]]), and non-interlaced 8-bit
  * truecolor PNG ([[decodePng]] — IDAT is zlib DEFLATE, which the JDK
  * itself ships as `java.util.zip.Inflater`, and the five per-row
  * filters are byte arithmetic), and JPEG — baseline AND progressive
  * ([[Jpeg.decodeJpeg]] — canonical Huffman, dequant, separable IDCT,
  * fixed-point color, and SOF2's multi-scan successive approximation
  * are all plain arithmetic), and GIF87a/89a ([[Gif.decodeGif]] —
  * variable-width LZW is plain bit arithmetic, palettes and interlace
  * are byte walking), and MJPEG video in AVI ([[Avi]] — RIFF chunk
  * walking over per-frame JPEGs, demuxed and frame-sampled by
  * [[videoFrameStats]]), each hash-checked end to end by its declared
  * query. Only formats that genuinely need an external codec
  * (inter-frame-predicted video, learned feature extractors) remain
  * behind the deterministic [[decodeFeatures]] stand-in, whose tests
  * pin the plumbing: schema, batch shape, row alignment.
  *
  * Scale posture: documents⋈embeddings is a key-to-key shuffle join on
  * the id (both sides bucketable by that id at 100 TB); decode runs via
  * `mapPartitions` so per-partition codec state is initialized once per
  * task, never per row.
  */
object Multimodal {

  /** documents joined with embeddings (doc_id = vec_id), with a synthetic
    * deterministic binary payload (fixtures ship no real media bytes) and
    * a typed metadata struct.
    */
  def assets(t: Tables): DataFrame =
    t.documents
      .join(t.embeddings, col("doc_id") === col("vec_id"))
      .withColumn("payload", unhex(md5(col("text"))))
      .withColumn("meta", struct(
        col("lang"), col("source"), col("n_chars"), col("label")))

  /** L5 declared query: the multimodal row surface, flattened to
    * oracle-comparable scalars (binary surfaced as hex head + length).
    */
  def l5Multimodal(spark: SparkSession, dir: String): DataFrame =
    assets(Tables(spark, dir))
      .select(
        col("doc_id"), col("meta.lang").as("lang"), col("meta.source").as("source"),
        col("meta.label").as("label"),
        size(col("embedding")).as("emb_dim"),
        length(col("payload")).as("payload_len"),
        substring(hex(col("payload")), 1, 16).as("payload_hex_head"))
      .orderBy(col("doc_id"))

  /** Typed output row of [[decodeFeatures]]. */
  final case class MediaFeature(doc_id: Long, payload_len: Int, feature: Seq[Double])

  /** Output schema of [[decodeFeatures]] (the [[MediaFeature]] encoder's). */
  val featureSchema: StructType =
    org.apache.spark.sql.Encoders.product[MediaFeature].schema

  /** Sniff-and-decode over every format the engine decodes for real:
    * magic-byte dispatch to BMP24 / truecolor PNG / JPEG (baseline +
    * progressive) / GIF87a+89a. `None` for unrecognized or malformed
    * bytes — the shared total-function contract of all the codecs.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 4) return None
    val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff; val b2 = bytes(2) & 0xff
    if (b0 == 'B' && b1 == 'M') decodeBmp24(bytes)
    else if (b0 == 0x89 && b1 == 'P' && b2 == 'N') decodePng(bytes)
    else if (b0 == 0xff && b1 == 0xd8) Jpeg.decodeJpeg(bytes)
    else if (b0 == 'G' && b1 == 'I' && b2 == 'F') Gif.decodeGif(bytes)
    else None
  }

  /** REAL nearest-neighbor resample of a packed-RGB pixel array: output
    * pixel (x₂, y₂) reads source pixel (⌊x₂·w/w₂⌋, ⌊y₂·h/h₂⌋) — the
    * standard index mapping, exact in integers (so an oracle can replay
    * it), correct for up- AND down-scale, and the kernel every
    * training-data pipeline reaches for when bilinear fidelity doesn't
    * matter (thumbnailing before a learned filter).
    */
  def resizeNearest(px: Array[Int], w: Int, h: Int, w2: Int, h2: Int): Array[Int] = {
    require(w > 0 && h > 0 && px.length == w * h,
      s"bad source: ${w}x$h with ${if (px == null) -1 else px.length} pixels")
    require(w2 > 0 && h2 > 0, s"bad target ${w2}x$h2")
    // mirror the decoders' pre-allocation posture: cap the target
    // surface before new Array (w2*h2 as Int could overflow negative)
    require(w2.toLong * h2 <= Gif.MaxDecodeTotalPixels,
      s"target ${w2}x$h2 exceeds pixel budget")
    val out = new Array[Int](w2 * h2)
    var y2 = 0
    while (y2 < h2) {
      val rowBase = (y2.toLong * h / h2).toInt * w
      var x2 = 0
      while (x2 < w2) {
        out(y2 * w2 + x2) = px(rowBase + (x2.toLong * w / w2).toInt)
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  /** One row of [[resizeImages]]: source dims surface for lineage;
    * `payload` is the re-encoded resized image, null when the input
    * didn't decode (the row survives — curation filters decide).
    */
  final case class ResizedImage(doc_id: Long, src_w: Option[Int],
                                src_h: Option[Int], payload: Array[Byte])

  /** REAL resize stage — the operator the [[resizePayload]] byte-stub
    * stood in for, for every format the engine decodes: sniff + decode
    * ([[decodeImage]]), nearest-neighbor resample to `w2`×`h2`
    * ([[resizeNearest]]), re-encode as BMP24 (the engine's canonical
    * uncompressed interchange encoding — downstream stages re-decode it
    * with [[decodeBmp24]], so codec stages compose). Undecodable
    * payloads degrade to a null-payload row instead of throwing.
    *
    * Scale posture: identical to [[imagePixelStats]] — typed
    * `mapPartitions`, no shuffle, decode state per task not per row.
    */
  def resizeImages(assets: DataFrame, w2: Int, h2: Int): DataFrame = {
    require(w2 > 0 && h2 > 0, s"bad target ${w2}x$h2")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeImage(bytes) match {
          case Some((w, h, px)) =>
            ResizedImage(id, Some(w), Some(h),
              buildBmp24(resizeNearest(px, w, h, w2, h2), w2, h2))
          case None => ResizedImage(id, None, None, null)
        }
      })
      .toDF()
  }

  /** Per-doc output row of the resize-stats declared query. */
  final case class ResizeStats(doc_id: Long, src_w: Option[Int], src_h: Option[Int],
                               width: Option[Int], height: Option[Int],
                               n_pixels: Option[Long], mean_r: Option[Long],
                               mean_g: Option[Long], mean_b: Option[Long])

  /** Deterministic per-doc BMP synthesis for the declared resize query —
    * fresh channel constants so it can't mask `l5_image_stats`: doc d is
    * (8 + d mod 8) × (4 + d mod 4) with row-major pixel i carrying
    * r = (d·29 + i·31 + 47) mod 256, g = (d·37 + i·41 + 89) mod 256,
    * b = (d·43 + i·53 + 3) mod 256.
    */
  def synthResizeAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val w = (8 + d % 8).toInt
        val h = (4 + d % 4).toInt
        val px = Array.tabulate(w * h) { i =>
          val r = ((d * 29 + i * 31 + 47) % 256).toInt
          val g = ((d * 37 + i * 41 + 89) % 256).toInt
          val b = ((d * 43 + i * 53 + 3) % 256).toInt
          (r << 16) | (g << 8) | b
        }
        (d, buildBmp24(px, w, h))
      })
      .toDF("doc_id", "payload")
  }

  /** L5j declared query: decode → nearest-neighbor resize to 5×3 →
    * BMP re-encode → re-decode → channel means. The oracle replays the
    * index mapping ⌊x₂·w/5⌋, ⌊y₂·h/3⌋ plus the channel formula, so a
    * defect in the resample arithmetic, either BMP codec direction, or
    * the format sniff surfaces as a hash mismatch.
    */
  def l5ResizeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    resizeImages(synthResizeAssets(Tables(spark, dir)), 5, 3)
      .select(col("doc_id"), col("src_w"), col("src_h"), col("payload"))
      .as[(Long, Option[Int], Option[Int], Array[Byte])]
      .mapPartitions(_.map { case (id, sw, sh, bytes) =>
        decodeBmp24(bytes) match {
          case Some((w, h, px)) if px.nonEmpty =>
            val (r, g, b) = channelMeans(px)
            ResizeStats(id, sw, sh, Some(w), Some(h), Some(px.length.toLong),
              Some(r), Some(g), Some(b))
          case _ => ResizeStats(id, sw, sh, None, None, None, None, None, None)
        }
      })
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** BYTE STUB: "resize" an OPAQUE media payload — for formats the
    * engine decodes, [[resizeImages]] is the real decode → resample →
    * re-encode stage; this stand-in (crop to `targetBytes`) remains for
    * opaque payloads only. Replaces `payload` in place so codec stages
    * compose (resize → frame-sample operates on the resized bytes).
    */
  def resizePayload(assets: DataFrame, targetBytes: Int): DataFrame =
    assets.withColumn("payload", substring(col("payload"), 1, targetBytes))

  /** STUB CODEC: "frame-sample" — every `stride`-th 4-byte block of the
    * payload as a frame array (a real codec would emit decoded frames).
    * Pure higher-order expressions, so sampling runs inside codegen.
    */
  def frameSample(assets: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"frameSample stride must be positive, got $stride")
    val block = 4 * stride
    val payload = col("payload")
    // a frame exists at every block start with 4 sample bytes available,
    // including a final partial block: n = floor((len-4)/block) + 1
    val nFrames = (floor((length(payload) - lit(4)) / lit(block)) + lit(1)).cast("int")
    assets.withColumn("frames",
      when(length(payload) >= 4,
        transform(sequence(lit(1), nFrames),
          i => payload.substr((i - lit(1)) * lit(block) + lit(1), lit(4))))
        .otherwise(array().cast("array<binary>")))
  }

  /** Parsed container metadata of one image payload. Option fields:
    * None for unrecognized bytes (the row survives — curation filters
    * decide, the parser never throws).
    */
  final case class ImageMeta(doc_id: Long, format: Option[String],
                             width: Option[Int], height: Option[Int])

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** REAL image-container parser — no media libraries required, because
    * dimensions live in the first bytes of the container, not the pixel
    * stream:
    *
    *  - PNG: the 8-byte signature is followed immediately by the IHDR
    *    chunk, whose first 8 data bytes are width/height (big-endian,
    *    PNG spec §11.2.2) — fixed offsets 16 and 20.
    *  - JPEG: after the FFD8 SOI marker, segments are (FF, marker,
    *    16-bit length) — walk them to the first SOF frame header
    *    (FFC0–FFCF excluding C4/C8/CC, ITU T.81 §B.2.2), which carries
    *    height then width after the precision byte.
    *  - GIF: the GIF87a/GIF89a signature is followed immediately by the
    *    logical-screen width/height (little-endian u16, spec §18).
    *
    * This walk is the cheap first pass (format sniffing + resolution —
    * what a curation pipeline filters on — without touching the pixel
    * stream); full pixel decode lives in [[decodePng]] and
    * [[Jpeg.decodeJpeg]]. Returns None on anything unrecognized or
    * truncated rather than throwing.
    */
  def parseImageMeta(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (bytes.length >= 24 && bytes.take(8).sameElements(pngSig) &&
        new String(bytes.slice(12, 16), "US-ASCII") == "IHDR") {
      Some(("png", u32be(bytes, 16), u32be(bytes, 20)))
    } else if (bytes.length >= 13 && {
        val sig = new String(bytes, 0, 6, "US-ASCII")
        sig == "GIF87a" || sig == "GIF89a"
      }) {
      // GIF: logical-screen dims are little-endian u16 right after the
      // signature (spec §18); pixel decode lives in [[Gif.decodeGif]]
      Some(("gif", u16le(bytes, 6), u16le(bytes, 8)))
    } else if (bytes.length >= 4 &&
        (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < bytes.length && (bytes(i) & 0xff) == 0xff) {
        val marker = bytes(i + 1) & 0xff
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof)
          return Some(("jpeg", u16be(bytes, i + 7), u16be(bytes, i + 5)))
        i += 2 + u16be(bytes, i + 2) // segment length includes its own 2 bytes
      }
      None
    } else None
  }

  /** EXIF orientation of a JPEG payload — the APP1/TIFF walk
    * [[parseImageMeta]]'s segment scan stopped short of, needed because
    * real-world camera files store the SENSOR's pixel grid and record
    * the rotation here: orientations 5–8 mean the display dimensions
    * are the SOF dimensions TRANSPOSED. Byte-walking only, no library:
    * APP1 (FFE1) with the `Exif\0\0` header, then a TIFF structure —
    * `II`/`MM` byte-order mark (both endiannesses handled), magic 42,
    * IFD0 offset, 12-byte IFD entries scanned for tag 0x0112
    * (Orientation, SHORT, value 1..8, stored left-justified in the
    * entry's value field in the declared byte order). Every offset is
    * bounds-checked against the APP1 segment; anything malformed — or
    * simply absent, the common case for web images — returns None,
    * never throws. Pixel decode ([[Jpeg.decodeJpeg]]) deliberately
    * ignores orientation (it skips APPn segments); metadata surfaces it
    * so a pipeline can transpose or route.
    */
  def parseExifOrientation(bytes: Array[Byte]): Option[Int] = {
    if (bytes.length < 4 ||
        (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    val exifSig = Array[Byte]('E', 'x', 'i', 'f', 0, 0)
    var i = 2
    while (i + 4 <= bytes.length && (bytes(i) & 0xff) == 0xff) {
      val marker = bytes(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // entropy data: no APP1
      val len = u16be(bytes, i + 2)
      if (len < 2 || i + 2L + len > bytes.length) return None
      if (marker == 0xe1 && len >= 2 + 6 + 8 &&
          bytes.slice(i + 4, i + 10).sameElements(exifSig)) {
        val t = i + 10 // TIFF base
        val end = i + 2 + len
        val le = bytes(t) == 'I' && bytes(t + 1) == 'I'
        val be = bytes(t) == 'M' && bytes(t + 1) == 'M'
        if (!le && !be) return None
        def u16(o: Int): Int =
          if (o + 1 >= end) -1
          else if (le) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
          else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
        def u32(o: Int): Long =
          if (o + 3 >= end) -1L
          else if (le) (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
            ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
          else ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
            ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
        if (u16(t + 2) != 42) return None
        val ifdOff = u32(t + 4)
        if (ifdOff < 8 || t + ifdOff + 2 > end) return None
        val ifd = t + ifdOff.toInt
        val n = u16(ifd)
        var e = 0
        while (e >= 0 && e < n) {
          val off = ifd + 2 + e * 12
          if (off + 12 > end) return None
          if (u16(off) == 0x0112) {
            if (u16(off + 2) != 3 || u32(off + 4) != 1L) return None
            val v = u16(off + 8)
            return if (v >= 1 && v <= 8) Some(v) else None
          }
          e += 1
        }
        return None
      }
      i += 2 + len
    }
    None
  }

  /** [[parseImageMeta]] with orientation applied: (format, DISPLAY
    * width, DISPLAY height, orientation). For JPEGs carrying EXIF
    * orientation 5–8 (the 90°-rotation family) the SOF dimensions are
    * transposed to what a viewer shows; PNGs and EXIF-less JPEGs report
    * orientation 1 with dimensions unchanged.
    */
  def parseImageMetaOriented(bytes: Array[Byte]): Option[(String, Int, Int, Int)] =
    parseImageMeta(bytes).map { case (fmt, w, h) =>
      val o = if (fmt == "jpeg") parseExifOrientation(bytes).getOrElse(1) else 1
      if (o >= 5) (fmt, h, w, o) else (fmt, w, h, o)
    }

  /** Parsed container metadata of one audio payload (see
    * [[parseAudioMeta]]). */
  final case class AudioMeta(doc_id: Long, format: Option[String],
                             channels: Option[Int], sample_rate: Option[Int],
                             bits: Option[Int], duration_ms: Option[Long])

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** REAL audio-container parser (WAV/RIFF) — like [[parseImageMeta]],
    * everything a curation filter needs lives in the container header,
    * not the sample stream: RIFF/WAVE magic, then a chunk walk
    * (4-byte id + little-endian u32 size, data padded to even) to the
    * `fmt ` chunk for channels/sample-rate/bit-depth and the `data`
    * chunk for payload size; duration = data bytes over the stored byte
    * rate. Returns None for unrecognized or truncated bytes — the row
    * survives, filters decide.
    */
  def parseAudioMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def tag(i: Int): String = new String(bytes.slice(i, i + 4), "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Long)] = None // channels, rate, bits, byteRate
    var dataSize: Option[Long] = None
    while (i + 8 <= bytes.length && (fmt.isEmpty || dataSize.isEmpty)) {
      val id = tag(i)
      val size = u32le(bytes, i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= bytes.length)
        fmt = Some((u16le(bytes, i + 10), u16le(bytes, i + 12).toInt,
          u16le(bytes, i + 22), u32le(bytes, i + 16)))
      if (id == "data") dataSize = Some(size)
      // advance in LONG: a corrupt u32 size near 2^32 would wrap an Int
      // step negative and spin this walk forever (padded to even length)
      val adv = 8L + size + (size & 1L)
      i = if (adv > bytes.length - i) bytes.length else i + adv.toInt
    }
    for {
      (ch, rate, bits, byteRate) <- fmt
      d <- dataSize
      if ch > 0 && rate > 0 && byteRate > 0
    } yield (ch, rate, bits, d * 1000L / byteRate)
  }

  /** Audio metadata over the asset frame — same typed-mapPartitions
    * shape as [[imageMeta]]. */
  def audioMeta(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseAudioMeta(bytes) match {
          case Some((ch, rate, bits, ms)) =>
            AudioMeta(id, Some("wav"), Some(ch), Some(rate), Some(bits), Some(ms))
          case None => AudioMeta(id, None, None, None, None, None)
        }
      })
      .toDF()
  }

  /** Image metadata over the asset frame — the same typed-mapPartitions
    * shape as [[decodeFeatures]] (parser state is trivial here, but a
    * real codec registry would initialize per partition in the same
    * place).
    */
  def imageMeta(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseImageMeta(bytes) match {
          case Some((f, w, h)) => ImageMeta(id, Some(f), Some(w), Some(h))
          case None            => ImageMeta(id, None, None, None)
        }
      })
      .toDF()
  }

  /** REAL WAV PCM encoder — canonical 44-byte RIFF/WAVE header (fmt
    * chunk first, then data) over 16-bit little-endian signed samples,
    * interleaved when channels > 1. No codec libraries required:
    * uncompressed PCM IS the byte layout. Inverse of
    * [[decodePcmSamples]] (LlmOpsSpec pins the round-trip).
    */
  def buildWavPcm16(samples: Array[Short], channels: Int = 1,
                    sampleRate: Int = 8000): Array[Byte] = {
    require(channels > 0, s"channels must be positive, got $channels")
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM format code
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL G.711 µ-law expansion (ITU-T G.711, the CCITT reference
    * shape): complement, then mantissa·8 + bias 0x84 shifted by the
    * segment, sign from the top bit. Pure integer bit arithmetic — an
    * oracle can replay it — and pinned in spec against the standard's
    * own reference points (0xFF → 0, 0x80 → 32124).
    */
  def ulawToLinear(code: Int): Int = {
    val u = ~code & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** REAL G.711 A-law expansion (ITU-T G.711): XOR 0x55, then the
    * three-arm segment decode; A-law's sign convention is the top bit
    * SET for positive. Reference points pinned in spec: 0x55 → −8,
    * 0xAA → 32256.
    */
  def alawToLinear(code: Int): Int = {
    val a = code ^ 0x55
    val seg = (a & 0x70) >> 4
    val t0 = (a & 0x0f) << 4
    val t = seg match {
      case 0 => t0 + 8
      case 1 => t0 + 0x108
      case s => (t0 + 0x108) << (s - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  /** WAV writer for G.711 streams: same RIFF layout as
    * [[buildWavPcm16]] but format tag 6 (A-law) or 7 (µ-law) at 8 bits
    * per sample — the telephony container every call-center corpus
    * arrives in.
    */
  def buildWavG711(codes: Array[Byte], aLaw: Boolean, channels: Int = 1,
                   sampleRate: Int = 8000): Array[Byte] = {
    require(channels > 0, s"channels must be positive, got $channels")
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    val bb = java.nio.ByteBuffer.allocate(44 + codes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + codes.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(if (aLaw) 6 else 7)      // G.711 format codes
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels)     // byte rate (1 byte/sample)
      .putShort(channels.toShort)        // block align
      .putShort(8)                       // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(codes.length)
    bb.put(codes)
    bb.array()
  }

  /** REAL WAV sample decoder — the first concrete codec behind the
    * decode-stub interface (uncompressed PCM needs no codec library:
    * the sample stream IS the byte layout, and G.711's companded bytes
    * expand with pure bit arithmetic). Same chunk walk as
    * [[parseAudioMeta]], plus the format gates a decoder needs and the
    * metadata pass doesn't: PCM format code 1 at 16-bit (signed LE) or
    * 8-bit depth — 8-bit WAV is UNSIGNED centered at 128 (the format's
    * own quirk), returned re-centered to −128..127 so downstream stats
    * treat both depths uniformly — and G.711 codes 6 (A-law) / 7
    * (µ-law) at 8-bit, expanded to 13/14-bit linear via
    * [[alawToLinear]]/[[ulawToLinear]]. Other codecs or depths →
    * None (the row survives, filters decide); the data chunk must be
    * fully present (truncated → None). Returns ALL samples interleaved
    * (channel de-interleaving is a caller concern; RMS/peak are
    * channel-agnostic).
    */
  def decodePcmSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    def tag(i: Int): String = new String(bytes.slice(i, i + 4), "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmtTag = 0; var bits = 0
    var channels = 0; var blockAlign = 0
    var data: Option[(Int, Int)] = None // offset, size
    while (i + 8 <= bytes.length && (bits == 0 || data.isEmpty)) {
      val id = tag(i)
      val size = u32le(bytes, i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= bytes.length) {
        val f = u16le(bytes, i + 8)
        val b = u16le(bytes, i + 22)
        if ((f == 1 && (b == 16 || b == 8)) || ((f == 6 || f == 7) && b == 8) ||
            (f == 0x11 && b == 4)) {
          fmtTag = f; bits = b
          channels = u16le(bytes, i + 10)
          blockAlign = u16le(bytes, i + 20)
        }
      }
      if (id == "data" && size <= Int.MaxValue.toLong &&
          i + 8 + size <= bytes.length)
        data = Some((i + 8, size.toInt))
      // LONG advance — same corrupt-size spin guard as parseAudioMeta
      val adv = 8L + size + (size & 1L)
      i = if (adv > bytes.length - i) bytes.length else i + adv.toInt
    }
    data match {
      case Some((off, size)) if bits != 0 => fmtTag match {
        case 1 if bits == 16 =>
          Some(Array.tabulate(size / 2) { j =>
            ((bytes(off + 2 * j) & 0xff) | (bytes(off + 2 * j + 1) << 8)).toShort.toInt
          })
        case 1 => Some(Array.tabulate(size) { j => (bytes(off + j) & 0xff) - 128 })
        case 6 => Some(Array.tabulate(size) { j => alawToLinear(bytes(off + j) & 0xff) })
        case 7 => Some(Array.tabulate(size) { j => ulawToLinear(bytes(off + j) & 0xff) })
        case _ => decodeImaData(bytes, off, size, channels, blockAlign)
      }
      case _ => None
    }
  }

  /** IMA/DVI ADPCM step-size table (the 89-entry standard table). */
  private[graft] val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** IMA step-index adjustment per 4-bit code. */
  private[graft] val ImaIndexTable: Array[Int] = Array(
    -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** IMA ADPCM `data` chunk decode (WAV format tag 0x11, MONO): the
    * stream is independent fixed-size blocks, each opening with its own
    * 4-byte state header — predictor int16 LE, step index u8 (≤ 88),
    * reserved — followed by two 4-bit codes per byte, LOW nibble first.
    * Per code: diff = step/8 (+step/4 if bit0)(+step/2 if bit1)(+step
    * if bit2), subtracted when bit3 is set, predictor clamped to int16,
    * index moved by the adjustment table and clamped to 0..88. The
    * header sample itself is emitted first — (blockAlign−4)·2+1 samples
    * per block. Strict gates: mono only, block-aligned data size,
    * legal header index — anything else None (the row survives).
    */
  private def decodeImaData(bytes: Array[Byte], off: Int, size: Int,
                            channels: Int, blockAlign: Int): Option[Array[Int]] = {
    if (channels != 1 || blockAlign < 8 || size % blockAlign != 0) return None
    val nBlocks = size / blockAlign
    val perBlock = (blockAlign - 4) * 2 + 1
    val out = new Array[Int](nBlocks * perBlock)
    var o = 0
    var b = 0
    while (b < nBlocks) {
      val base = off + b * blockAlign
      var pred = ((bytes(base) & 0xff) | (bytes(base + 1) << 8)).toShort.toInt
      var index = bytes(base + 2) & 0xff
      if (index > 88) return None
      out(o) = pred; o += 1
      var j = 0
      while (j < blockAlign - 4) {
        val byte = bytes(base + 4 + j) & 0xff
        var half = 0
        while (half < 2) {
          val n = if (half == 0) byte & 0x0f else byte >> 4
          val step = ImaStepTable(index)
          var diff = step >> 3
          if ((n & 1) != 0) diff += step >> 2
          if ((n & 2) != 0) diff += step >> 1
          if ((n & 4) != 0) diff += step
          pred = if ((n & 8) != 0) pred - diff else pred + diff
          if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
          index += ImaIndexTable(n)
          if (index < 0) index = 0 else if (index > 88) index = 88
          out(o) = pred; o += 1
          half += 1
        }
        j += 1
      }
      b += 1
    }
    Some(out)
  }

  /** WAV writer for IMA ADPCM streams (format tag 0x11, mono): the
    * 20-byte fmt chunk (cbSize 2 + samplesPerBlock extension) and one
    * fixed-size block per (predictor, step index, nibbles) triple —
    * nibbles packed LOW first, values 0..15. The builder writes
    * arbitrary code streams, which is what lets the declared query
    * synthesize the closed-form-replayable family while the decoder
    * runs the full general table machinery.
    */
  def buildWavIma(blocks: Seq[(Short, Int, Array[Byte])], blockAlign: Int,
                  sampleRate: Int = 8000): Array[Byte] = {
    require(blockAlign >= 8, s"blockAlign must be >= 8, got $blockAlign")
    require(blocks.nonEmpty, "at least one block")
    blocks.foreach { case (_, idx, nibbles) =>
      require(idx >= 0 && idx <= 88, s"step index out of range: $idx")
      require(nibbles.length == (blockAlign - 4) * 2,
        s"expected ${(blockAlign - 4) * 2} nibbles, got ${nibbles.length}")
      require(nibbles.forall(n => n >= 0 && n <= 15), "nibbles must be 0..15")
    }
    val perBlock = (blockAlign - 4) * 2 + 1
    val dataSize = blocks.length * blockAlign
    val bb = java.nio.ByteBuffer.allocate(48 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(40 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11)                    // IMA ADPCM
      .putShort(1).putInt(sampleRate)    // mono
      .putInt(sampleRate * blockAlign / perBlock) // approx byte rate
      .putShort(blockAlign.toShort)
      .putShort(4)                       // bits per sample
      .putShort(2)                       // cbSize
      .putShort(perBlock.toShort)        // samplesPerBlock
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    blocks.foreach { case (s0, idx, nibbles) =>
      bb.putShort(s0).put(idx.toByte).put(0.toByte)
      var j = 0
      while (j < nibbles.length) {
        bb.put((nibbles(j) | (nibbles(j + 1) << 4)).toByte)
        j += 2
      }
    }
    bb.array()
  }

  /** REAL BMP encoder — BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER,
    * 24-bit uncompressed pixels in the format's actual layout: BGR byte
    * order, rows bottom-up, each row padded to a 4-byte boundary.
    * `pixels` is row-major TOP-DOWN 0xRRGGBB. Inverse of
    * [[decodeBmp24]] (LlmOpsSpec pins the round-trip, padding
    * included).
    */
  def buildBmp24(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(pixels.length == width * height,
      s"expected ${width * height} pixels, got ${pixels.length}")
    val stride = (width * 3 + 3) & ~3 // rows pad to 4-byte boundaries
    val dataSize = stride * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel-array offset
      .putInt(40).putInt(width).putInt(height) // positive = bottom-up
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- height - 1 to 0 by -1) { // bottom-up
      for (x <- 0 until width) {
        val p = pixels(row * width + x)
        bb.put((p & 0xff).toByte)          // B
          .put(((p >> 8) & 0xff).toByte)   // G
          .put(((p >> 16) & 0xff).toByte)  // R
      }
      var pad = stride - width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
    }
    bb.array()
  }

  /** REAL BMP pixel decoder — the image-side counterpart of
    * [[decodePcmSamples]] (uncompressed 24-bit BMP needs no codec
    * library either: the pixel array IS the byte layout, modulo the
    * format's three genuine quirks — BGR order, 4-byte row padding,
    * and bottom-up rows when biHeight > 0 / top-down when negative,
    * both handled). Gates: "BM" magic, 24 bpp, BI_RGB (uncompressed),
    * pixel array fully present. Returns (width, height, row-major
    * TOP-DOWN 0xRRGGBB) or None — the row survives, filters decide.
    */
  def decodeBmp24(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte)
      return None
    val off = u32le(bytes, 10).toInt
    val width = u32le(bytes, 18).toInt
    val rawH = u32le(bytes, 22).toInt // signed: negative = top-down
    val bpp = u16le(bytes, 28)
    val compression = u32le(bytes, 30)
    val topDown = rawH < 0
    val height = if (rawH == Int.MinValue) return None else math.abs(rawH)
    if (width <= 0 || height == 0 || bpp != 24 || compression != 0L) return None
    // dimension sanity BEFORE any Int arithmetic can overflow: the file
    // itself bounds the pixel array, so dims past bytes.length are
    // malformed by construction (never throw, never wrap)
    if (width.toLong * 3 + 3 > Int.MaxValue ||
        width.toLong * height > Int.MaxValue) return None
    val stride = (width * 3 + 3) & ~3
    if (off < 54 || off.toLong + stride.toLong * height > bytes.length) return None
    val out = new Array[Int](width * height)
    for (row <- 0 until height) {
      val srcRow = if (topDown) row else height - 1 - row
      val base = off + srcRow * stride
      for (x <- 0 until width) {
        val i = base + x * 3
        out(row * width + x) =
          ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 1) & 0xff) << 8) |
            (bytes(i) & 0xff)
      }
    }
    Some((width, height, out))
  }

  /** PNG CRC32 of chunk type + data (the spec's per-chunk checksum). */
  private def pngCrc(typ: Array[Byte], data: Array[Byte], dataLen: Int): Int = {
    val crc = new java.util.zip.CRC32
    crc.update(typ)
    crc.update(data, 0, dataLen)
    crc.getValue.toInt
  }

  /** Paeth predictor (PNG spec §9.4): the closest of left/up/up-left to
    * the linear estimate a + b − c, ties resolved left, up, up-left.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** REAL PNG encoder — 8-bit truecolor (color type 2), non-interlaced,
    * one zlib-deflated IDAT, per-chunk CRC32. Library-free in the same
    * sense as [[buildBmp24]]: `java.util.zip.Deflater` IS the JDK, and
    * DEFLATE is the only compression PNG has. Each scanline carries a
    * filter byte; `filterOf(row)` picks the filter type (0–4), default
    * cycles through all five so a corpus round-trip exercises every
    * reversal path including Paeth. `pixels` row-major TOP-DOWN
    * 0xRRGGBB. Inverse of [[decodePng]] (LlmOpsSpec pins the
    * round-trip per filter type).
    */
  def buildPng(pixels: Array[Int], width: Int, height: Int,
               filterOf: Int => Int = _ % 5): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(pixels.length == width * height,
      s"expected ${width * height} pixels, got ${pixels.length}")
    val bpp = 3
    val stride = width * bpp
    // raw scanlines → filtered scanlines (1 filter byte + stride each)
    val raw = Array.ofDim[Byte](height, stride)
    for (row <- 0 until height; x <- 0 until width) {
      val p = pixels(row * width + x)
      raw(row)(x * 3) = ((p >> 16) & 0xff).toByte
      raw(row)(x * 3 + 1) = ((p >> 8) & 0xff).toByte
      raw(row)(x * 3 + 2) = (p & 0xff).toByte
    }
    val filtered = new Array[Byte](height * (1 + stride))
    for (row <- 0 until height) {
      val f = filterOf(row)
      require(f >= 0 && f <= 4, s"filter type must be 0..4, got $f")
      val base = row * (1 + stride)
      filtered(base) = f.toByte
      val cur = raw(row)
      val prior = if (row > 0) raw(row - 1) else null
      for (i <- 0 until stride) {
        val x = cur(i) & 0xff
        val left = if (i >= bpp) cur(i - bpp) & 0xff else 0
        val up = if (prior != null) prior(i) & 0xff else 0
        val ul = if (prior != null && i >= bpp) prior(i - bpp) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x - left
          case 2 => x - up
          case 3 => x - (left + up) / 2
          case 4 => x - paeth(left, up, ul)
        }
        filtered(base + 1 + i) = (v & 0xff).toByte
      }
    }
    // zlib-wrapped DEFLATE (RFC 1950 — what IDAT requires and what
    // Deflater produces by default)
    val deflater = new java.util.zip.Deflater
    deflater.setInput(filtered)
    deflater.finish()
    val zbuf = new Array[Byte](filtered.length + 64 + filtered.length / 2)
    var zlen = 0
    while (!deflater.finished)
      zlen += deflater.deflate(zbuf, zlen, zbuf.length - zlen)
    deflater.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    val out = java.nio.ByteBuffer.allocate(
      8 + (12 + 13) + (12 + zlen) + 12)
    out.put(PngSig)
    def chunk(typ: String, data: Array[Byte], len: Int): Unit = {
      val t = typ.getBytes("US-ASCII")
      out.putInt(len).put(t).put(data, 0, len).putInt(pngCrc(t, data, len))
    }
    chunk("IHDR", ihdr, 13)
    chunk("IDAT", zbuf, zlen)
    chunk("IEND", Array.empty, 0)
    out.array()
  }

  /** REAL PNG pixel decoder — non-interlaced 8-bit truecolor, the path
    * [[parseImageMeta]]'s metadata walk stopped short of. No image
    * library: IDAT is zlib DEFLATE (`java.util.zip.Inflater`, JDK
    * builtin) and the five per-row filters (None/Sub/Up/Average/Paeth,
    * spec §9) are byte arithmetic. Gates: signature, IHDR with bit
    * depth 8 + color type 2 + compression 0 + filter method 0 +
    * interlace 0, per-chunk CRC32 verified, inflated size exactly
    * h·(1 + 3w), every filter byte in 0–4. Anything else — truncated
    * chunks, wrapping u32 lengths, corrupt CRC, palette/alpha/16-bit/
    * Adam7 streams — returns None, never throws: the row survives,
    * filters decide. Output (width, height, row-major TOP-DOWN
    * 0xRRGGBB), same contract as [[decodeBmp24]].
    */
  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 8 + 25 || !bytes.take(8).sameElements(PngSig)) return None
    var i = 8
    var dims: Option[(Int, Int)] = None
    val idat = new java.io.ByteArrayOutputStream
    var ended = false
    var valid = true
    while (valid && !ended && i + 12 <= bytes.length) {
      val len = u32be(bytes, i)
      val typ = new String(bytes.slice(i + 4, i + 8), "US-ASCII")
      // u32 length is unsigned; a negative Int or a chunk running past
      // the buffer is malformed (and would wrap the walk) — stop
      if (len < 0 || i + 12L + len > bytes.length) { valid = false }
      else {
        val data = bytes.slice(i + 8, i + 8 + len)
        if (pngCrc(typ.getBytes("US-ASCII"), data, len) != u32be(bytes, i + 8 + len))
          valid = false
        else typ match {
          case "IHDR" =>
            if (len != 13) valid = false
            else {
              val w = u32be(data, 0); val h = u32be(data, 4)
              val ok = w > 0 && h > 0 &&
                data(8) == 8 && data(9) == 2 && // depth 8, truecolor
                data(10) == 0 && data(11) == 0 && data(12) == 0 &&
                w.toLong * 3 + 1 <= Int.MaxValue &&
                h.toLong * (1 + w.toLong * 3) <= Int.MaxValue &&
                w.toLong * h <= Int.MaxValue
              if (ok) dims = Some((w, h)) else valid = false
            }
          case "IDAT" => idat.write(data, 0, len)
          case "IEND" => ended = true
          case _      => () // ancillary chunks: CRC-checked, ignored
        }
        i += 12 + len
      }
    }
    if (!valid || !ended || dims.isEmpty || idat.size == 0) return None
    val (w, h) = dims.get
    val stride = w * 3
    val expected = h * (1 + stride)
    val filtered = new Array[Byte](expected)
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    val n = try {
      var off = 0
      while (off < expected && !inflater.finished) {
        val k = inflater.inflate(filtered, off, expected - off)
        if (k == 0 && inflater.needsInput) return None // truncated stream
        off += k
      }
      // a valid stream must END here: more data means a size mismatch
      if (!inflater.finished && inflater.inflate(new Array[Byte](1)) > 0)
        return None
      off
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (n != expected) return None
    // reverse per-row filters in place (recon bytes overwrite filtered)
    val out = new Array[Int](w * h)
    for (row <- 0 until h) {
      val base = row * (1 + stride)
      val f = filtered(base) & 0xff
      if (f > 4) return None
      val pbase = base - (1 + stride)
      for (i2 <- 0 until stride) {
        val x = filtered(base + 1 + i2) & 0xff
        val left = if (i2 >= 3) filtered(base + 1 + i2 - 3) & 0xff else 0
        val up = if (row > 0) filtered(pbase + 1 + i2) & 0xff else 0
        val ul = if (row > 0 && i2 >= 3) filtered(pbase + 1 + i2 - 3) & 0xff else 0
        val recon = f match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 => x + paeth(left, up, ul)
        }
        filtered(base + 1 + i2) = (recon & 0xff).toByte
      }
      for (x <- 0 until w) {
        val j = base + 1 + x * 3
        out(row * w + x) = ((filtered(j) & 0xff) << 16) |
          ((filtered(j + 1) & 0xff) << 8) | (filtered(j + 2) & 0xff)
      }
    }
    Some((w, h, out))
  }

  /** Decoded-pixel stats row of [[imagePixelStats]]: all-BIGINT channel
    * means (exact floor DIV), null stats for undecodable payloads.
    */
  final case class ImagePixelStats(doc_id: Long, width: Option[Int],
                                   height: Option[Int], n_pixels: Option[Long],
                                   mean_r: Option[Long], mean_g: Option[Long],
                                   mean_b: Option[Long])

  /** Per-asset channel statistics over decoded image payloads — the
    * image twin of [[audioPcmStats]] (typed mapPartitions, integer
    * stats, undecodable rows survive with nulls). `decode` picks the
    * codec: [[decodeBmp24]] (default) or [[decodePng]] — both emit the
    * same (w, h, top-down 0xRRGGBB) contract.
    */
  /** Floor channel means of a packed-RGB pixel array — ONE definition
    * of the mean convention shared by every pixel-stats surface
    * (image, resize, video, animated GIF), so the oracle-replayed
    * arithmetic can't silently diverge between them.
    */
  private[graft] def channelMeans(px: Array[Int]): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    px.foreach { p =>
      r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
    }
    val n = px.length.toLong
    (r / n, g / n, b / n)
  }

  def imagePixelStats(assets: DataFrame,
                      decode: Array[Byte] => Option[(Int, Int, Array[Int])] = decodeBmp24): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decode(bytes) match {
          case Some((w, h, px)) if px.nonEmpty =>
            val (r, g, b) = channelMeans(px)
            ImagePixelStats(id, Some(w), Some(h), Some(px.length.toLong),
              Some(r), Some(g), Some(b))
          case _ => ImagePixelStats(id, None, None, None, None, None, None)
        }
      })
      .toDF()
  }

  /** Deterministic per-doc BMP synthesis for the declared image-decode
    * query — the [[synthWavAssets]] trick on the image side: doc d is a
    * (8 + d mod 8) × (4 + d mod 4) bitmap whose row-major pixel i has
    * channels r = (d·7 + i·13 + 101) mod 256, g = (d·11 + i·17 + 53)
    * mod 256, b = (d·13 + i·19 + 29) mod 256 — pure integer arithmetic
    * the oracle replays, while the engine round-trips it through REAL
    * BMP bytes (BGR, bottom-up, padded rows); any layout defect in the
    * decoder surfaces as a hash mismatch.
    */
  def synthBmpAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val w = (8 + d % 8).toInt
        val h = (4 + d % 4).toInt
        val px = Array.tabulate(w * h) { i =>
          val r = ((d * 7 + i * 13 + 101) % 256).toInt
          val g = ((d * 11 + i * 17 + 53) % 256).toInt
          val b = ((d * 13 + i * 19 + 29) % 256).toInt
          (r << 16) | (g << 8) | b
        }
        (d, buildBmp24(px, w, h))
      })
      .toDF("doc_id", "payload")
  }

  /** L5c declared query: channel-mean stats of the synthesized BMP
    * corpus, decoded from the actual BMP bytes (see [[synthBmpAssets]]).
    */
  def l5ImageStats(spark: SparkSession, dir: String): DataFrame =
    imagePixelStats(synthBmpAssets(Tables(spark, dir)))
      .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
        col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("doc_id"))

  /** Deterministic per-doc PNG synthesis for the declared PNG-decode
    * query — the [[synthBmpAssets]] trick through a COMPRESSED
    * container: doc d is a (5 + d mod 7) × (3 + d mod 5) truecolor PNG
    * whose row-major pixel i has channels r = (d·5 + i·11 + 7) mod 256,
    * g = (d·17 + i·3 + 83) mod 256, b = (d·23 + i·29 + 131) mod 256,
    * encoded with per-row filter type (d + row) mod 5 — so the corpus
    * exercises ALL five filter reversals (Paeth included) and the
    * DEFLATE round-trip, while the oracle replays the pure integer
    * formula; any defect in the inflate or filter arithmetic surfaces
    * as a hash mismatch.
    */
  def synthPngAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val w = (5 + d % 7).toInt
        val h = (3 + d % 5).toInt
        val px = Array.tabulate(w * h) { i =>
          val r = ((d * 5 + i * 11 + 7) % 256).toInt
          val g = ((d * 17 + i * 3 + 83) % 256).toInt
          val b = ((d * 23 + i * 29 + 131) % 256).toInt
          (r << 16) | (g << 8) | b
        }
        (d, buildPng(px, w, h, row => ((d + row) % 5).toInt))
      })
      .toDF("doc_id", "payload")
  }

  /** L5d declared query: channel-mean stats of the synthesized PNG
    * corpus, decoded from the actual compressed PNG bytes (IDAT
    * inflate + per-row filter reversal — see [[decodePng]]).
    */
  def l5PngStats(spark: SparkSession, dir: String): DataFrame =
    imagePixelStats(synthPngAssets(Tables(spark, dir)), decodePng)
      .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
        col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("doc_id"))

  /** Deterministic per-doc JPEG synthesis for the declared JPEG-decode
    * query — the [[synthPngAssets]] trick through an ENTROPY-CODED
    * container (see [[Jpeg]]): doc d cycles through the three decoder
    * arms by d mod 3 —
    *
    *  - d≡0: GRAYSCALE, 8·(1 + (d/3) mod 3) × 8·(1 + (d/3) mod 2),
    *    each 8×8 block k constant Y(d,k);
    *  - d≡1: 4:4:4 COLOR, same dimensions, block k constant
    *    (Y, Cb, Cr)(d,k);
    *  - d≡2: 4:2:0 COLOR, 16·(1 + d mod 2) × 16, each 16×16 MCU k
    *    constant (Y, Cb, Cr)(d,k) — chroma constant per 2×2, so
    *    replication upsampling is lossless;
    *
    * with Y = (d·7 + k·29 + 31) mod 256, Cb = (d·11 + k·17 + 57) mod
    * 256, Cr = (d·13 + k·23 + 94) mod 256. Block-constant images
    * round-trip EXACTLY through the full Huffman+DCT pipeline under
    * [[Jpeg.SynthQ]] (DC quantum 8 — see the [[Jpeg]] exactness
    * contract), and the fixed-point YCbCr→RGB step is a pure integer
    * formula, so the DuckDB oracle replays the expected channel means
    * exactly; any defect in the entropy decode, dequantization, IDCT
    * rounding, upsampling, or color conversion surfaces as a hash
    * mismatch. Restart intervals are exercised too: docs with
    * d mod 5 == 0 encode with DRI = 1 (an RSTn between every MCU).
    */
  def synthJpegAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val ri = if (d % 5 == 0) 1 else 0
        def yOf(k: Int) = ((d * 7 + k * 29 + 31) % 256).toInt
        def cbOf(k: Int) = ((d * 11 + k * 17 + 57) % 256).toInt
        def crOf(k: Int) = ((d * 13 + k * 23 + 94) % 256).toInt
        val bytes = (d % 3) match {
          case 2 =>
            val w = (16 * (1 + d % 2)).toInt; val h = 16
            val bx = w / 16
            val y = Array.tabulate(w * h)(i => yOf((i % w) / 16 + (i / w) / 16 * bx))
            val cb = Array.tabulate(w / 2 * (h / 2))(i => cbOf((i % (w / 2)) / 8 + (i / (w / 2)) / 8 * bx))
            val cr = Array.tabulate(w / 2 * (h / 2))(i => crOf((i % (w / 2)) / 8 + (i / (w / 2)) / 8 * bx))
            Jpeg.buildJpeg420(y, cb, cr, w, h, restartInterval = ri)
          case 1 =>
            val w = (8 * (1 + (d / 3) % 3)).toInt; val h = (8 * (1 + (d / 3) % 2)).toInt
            val bx = w / 8
            def blk(i: Int) = (i % w) / 8 + (i / w) / 8 * bx
            val y = Array.tabulate(w * h)(i => yOf(blk(i)))
            val cb = Array.tabulate(w * h)(i => cbOf(blk(i)))
            val cr = Array.tabulate(w * h)(i => crOf(blk(i)))
            Jpeg.buildJpeg444(y, cb, cr, w, h, restartInterval = ri)
          case _ =>
            val w = (8 * (1 + (d / 3) % 3)).toInt; val h = (8 * (1 + (d / 3) % 2)).toInt
            val bx = w / 8
            val y = Array.tabulate(w * h)(i => yOf((i % w) / 8 + (i / w) / 8 * bx))
            Jpeg.buildJpegGray(y, w, h, restartInterval = ri)
        }
        (d, bytes)
      })
      .toDF("doc_id", "payload")
  }

  /** L5e declared query: channel-mean stats of the synthesized JPEG
    * corpus, decoded from the actual entropy-coded bytes (Huffman +
    * dequant + IDCT + fixed-point color — see [[Jpeg.decodeJpeg]]).
    */
  def l5JpegStats(spark: SparkSession, dir: String): DataFrame =
    imagePixelStats(synthJpegAssets(Tables(spark, dir)), Jpeg.decodeJpeg)
      .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
        col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("doc_id"))

  /** Deterministic per-doc PROGRESSIVE-JPEG synthesis — the
    * [[synthJpegAssets]] trick through SOF2's multi-scan pipeline: the
    * same three sampling arms (by d mod 3), but encoded with the
    * progressive scan script (interleaved DC first at Al=1, DC
    * refinement, per-component AC first + AC refinement with
    * cross-block EOB runs — for block-constant images the AC scans are
    * pure EOB-run accumulation over every block of the component, so
    * the EOBn extension coding is exercised corpus-wide). Dimensions
    * and constants differ from the sequential corpus so the two
    * declared queries can't mask each other:
    *
    *  - d≡0: GRAYSCALE, 8·(1 + (d/3) mod 2) × 8·(1 + (d/3) mod 3);
    *  - d≡1: 4:4:4 COLOR, same dimensions;
    *  - d≡2: 4:2:0 COLOR, 16 × 16·(1 + d mod 2) — a single MCU COLUMN,
    *    so multi-MCU docs exercise the vertical MCU order;
    *
    * with block/MCU k: Y = (d·19 + k·37 + 23) mod 256, Cb = (d·29 +
    * k·41 + 11) mod 256, Cr = (d·31 + k·43 + 201) mod 256. Docs with
    * d mod 7 == 0 encode with DRI = 1, putting RSTn markers (with
    * EOB-run flushes) inside every scan of the chain. Block-constant
    * exactness survives successive approximation (see [[Jpeg]]), so
    * the DuckDB oracle replays the per-block formula exactly.
    */
  def synthJpegProgressiveAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val ri = if (d % 7 == 0) 1 else 0
        def yOf(k: Int) = ((d * 19 + k * 37 + 23) % 256).toInt
        def cbOf(k: Int) = ((d * 29 + k * 41 + 11) % 256).toInt
        def crOf(k: Int) = ((d * 31 + k * 43 + 201) % 256).toInt
        val bytes = (d % 3) match {
          case 2 =>
            val w = 16; val h = (16 * (1 + d % 2)).toInt
            val y = Array.tabulate(w * h)(i => yOf(i / w / 16))
            val cb = Array.tabulate(w / 2 * (h / 2))(i => cbOf(i / (w / 2) / 8))
            val cr = Array.tabulate(w / 2 * (h / 2))(i => crOf(i / (w / 2) / 8))
            Jpeg.buildJpeg420(y, cb, cr, w, h, restartInterval = ri, progressive = true)
          case 1 =>
            val w = (8 * (1 + (d / 3) % 2)).toInt; val h = (8 * (1 + (d / 3) % 3)).toInt
            val bx = w / 8
            def blk(i: Int) = (i % w) / 8 + (i / w) / 8 * bx
            val y = Array.tabulate(w * h)(i => yOf(blk(i)))
            val cb = Array.tabulate(w * h)(i => cbOf(blk(i)))
            val cr = Array.tabulate(w * h)(i => crOf(blk(i)))
            Jpeg.buildJpeg444(y, cb, cr, w, h, restartInterval = ri, progressive = true)
          case _ =>
            val w = (8 * (1 + (d / 3) % 2)).toInt; val h = (8 * (1 + (d / 3) % 3)).toInt
            val bx = w / 8
            val y = Array.tabulate(w * h)(i => yOf((i % w) / 8 + (i / w) / 8 * bx))
            Jpeg.buildJpegGray(y, w, h, restartInterval = ri, progressive = true)
        }
        (d, bytes)
      })
      .toDF("doc_id", "payload")
  }

  /** L5f declared query: channel-mean stats of the synthesized
    * PROGRESSIVE JPEG corpus, decoded from the actual multi-scan SOF2
    * bytes (DC/AC first + refinement scans, EOB runs — see
    * [[Jpeg.decodeJpeg]]).
    */
  def l5JpegProgressive(spark: SparkSession, dir: String): DataFrame =
    imagePixelStats(synthJpegProgressiveAssets(Tables(spark, dir)), Jpeg.decodeJpeg)
      .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
        col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("doc_id"))

  /** Deterministic per-doc GIF synthesis for the declared GIF-decode
    * query — the [[synthPngAssets]] trick through an LZW-compressed
    * PALETTE container (see [[Gif]]): doc d is a
    * (4 + d mod 9) × (3 + d mod 6) frame over a P = 3 + d mod 14 color
    * palette whose entry j has channels r = (d·3 + j·7 + 11) mod 256,
    * g = (d·5 + j·13 + 101) mod 256, b = (d·7 + j·19 + 59) mod 256, and
    * pixel i carries index (d + i·5) mod P — so each pixel's RGB is a
    * pure integer formula of (d, i) the oracle replays, while the
    * engine round-trips it through REAL GIF bytes: variable-width LZW
    * (palette sizes 3..16 span min code sizes 2..4), GIF89a with a
    * Graphic Control Extension on even docs vs bare GIF87a on odd, and
    * 4-pass INTERLACED row order when d mod 3 == 0; any defect in the
    * LZW table walk, code-width growth, sub-block reassembly, palette
    * lookup, or interlace reordering surfaces as a hash mismatch.
    */
  def synthGifAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val w = (4 + d % 9).toInt
        val h = (3 + d % 6).toInt
        val p = (3 + d % 14).toInt
        val palette = Array.tabulate(p) { j =>
          val r = ((d * 3 + j * 7 + 11) % 256).toInt
          val g = ((d * 5 + j * 13 + 101) % 256).toInt
          val b = ((d * 7 + j * 19 + 59) % 256).toInt
          (r << 16) | (g << 8) | b
        }
        val idx = Array.tabulate(w * h)(i => ((d + i * 5) % p).toInt)
        (d, Gif.buildGif(idx, w, h, palette,
          interlaced = d % 3 == 0, version89 = d % 2 == 0))
      })
      .toDF("doc_id", "payload")
  }

  /** L5h declared query: channel-mean stats of the synthesized GIF
    * corpus, decoded from the actual LZW-compressed bytes (sub-block
    * reassembly + variable-width LZW + palette + interlace — see
    * [[Gif.decodeGif]]).
    */
  def l5GifStats(spark: SparkSession, dir: String): DataFrame =
    imagePixelStats(synthGifAssets(Tables(spark, dir)), Gif.decodeGif)
      .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
        col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("doc_id"))

  /** Decoded-sample stats row of [[audioPcmStats]]: all-BIGINT integer
    * stats (exact on any engine), null stats for undecodable payloads.
    */
  final case class AudioPcmStats(doc_id: Long, n_samples: Option[Long],
                                 mean_square: Option[Long], peak: Option[Long],
                                 rms: Option[Long])

  /** Per-asset PCM sample statistics over decoded WAV payloads — the
    * same typed-mapPartitions shape as [[audioMeta]] (per-partition
    * codec init, encoder-serialized rows). Integer outputs only:
    * mean_square = Σs² DIV n (Σs² ≤ n·2³⁰ — overflow-free in Long for
    * any real corpus), peak = max |s|, rms = ⌊√mean_square⌋ (exact in
    * double below 2⁵³, so floor is engine-independent). Undecodable
    * payloads keep their row with null stats — filters decide.
    */
  def audioPcmStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodePcmSamples(bytes) match {
          case Some(s) if s.nonEmpty =>
            val sumSq = s.foldLeft(0L)((a, v) => a + v.toLong * v)
            val ms = sumSq / s.length
            AudioPcmStats(id, Some(s.length.toLong), Some(ms),
              Some(s.foldLeft(0L)((a, v) => math.max(a, math.abs(v.toLong)))),
              Some(math.sqrt(ms.toDouble).toLong))
          case _ => AudioPcmStats(id, None, None, None, None)
        }
      })
      .toDF()
  }

  /** Deterministic per-doc WAV synthesis for the declared decode query:
    * doc d carries 64 + (d mod 64) mono 16-bit samples with
    * s(d, i) = ((d·2654435761 + i·40503 + 12345) mod 2¹⁶) − 2¹⁵ —
    * pure integer arithmetic the DuckDB oracle replays EXACTLY, so the
    * oracle checks the real decode path end to end: the engine ENCODES
    * these samples to RIFF bytes and then reads them back through
    * [[decodePcmSamples]]; any header-walk or sample-extraction defect
    * surfaces as a hash mismatch against the oracle's formula replay.
    */
  def synthWavAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val n = (64 + d % 64).toInt
        val samples = Array.tabulate(n) { i =>
          ((d * 2654435761L + i * 40503L + 12345L) % 65536L - 32768L).toShort
        }
        (d, buildWavPcm16(samples))
      })
      .toDF("doc_id", "payload")
  }

  /** L5b declared query: RMS/peak stats of the synthesized WAV corpus,
    * decoded from the actual RIFF bytes (see [[synthWavAssets]]).
    */
  def l5AudioRms(spark: SparkSession, dir: String): DataFrame =
    audioPcmStats(synthWavAssets(Tables(spark, dir)))
      .select(col("doc_id"), col("n_samples"), col("mean_square"),
        col("peak"), col("rms"))
      .orderBy(col("doc_id"))

  /** Deterministic per-doc G.711 WAV synthesis for the declared
    * telephony-decode query: doc d carries 48 + (d mod 32) companded
    * bytes c(d, i) = (d·31 + i·7 + 3) mod 256 — covering the full code
    * alphabet of both laws — wrapped as µ-law (format tag 7) on even
    * docs and A-law (tag 6) on odd. The engine walks the RIFF header,
    * dispatches on the format tag, and expands every byte through the
    * real G.711 arithmetic; the oracle replays the complement/XOR +
    * segment-shift formula in SQL, so a defect in either expansion
    * (or in the tag dispatch) is a hash mismatch.
    */
  def synthG711Assets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val n = (48 + d % 32).toInt
        val codes = Array.tabulate(n)(i => ((d * 31 + i * 7 + 3) % 256).toByte)
        (d, buildWavG711(codes, aLaw = d % 2 != 0))
      })
      .toDF("doc_id", "payload")
  }

  /** L5k declared query: RMS/peak stats of the synthesized G.711 corpus,
    * expanded from actual companded telephony bytes (see
    * [[synthG711Assets]]).
    */
  def l5G711Rms(spark: SparkSession, dir: String): DataFrame =
    audioPcmStats(synthG711Assets(Tables(spark, dir)))
      .withColumn("codec",
        when(col("doc_id") % 2 === 0, lit("ulaw")).otherwise(lit("alaw")))
      .select(col("doc_id"), col("codec"), col("n_samples"),
        col("mean_square"), col("peak"), col("rms"))
      .orderBy(col("doc_id"))

  /** Deterministic per-doc IMA ADPCM synthesis for the declared
    * compressed-audio query — the [[Mpeg1.PPicture]] trick on the
    * audio side: the DECODER runs the full general machinery (step
    * table, index table, both clamps, per-block state headers), while
    * the SYNTHESIS stays inside the family whose decode is closed-form
    * — step index 0 with codes from {0,1,2,3,8,9,10,11}, whose index
    * adjustment is −1 (clamped at 0 forever) and whose deltas at step
    * 7 are exactly ±{0,1,3,4}. Doc d is 2 + d mod 3 independent
    * blocks at blockAlign 12 (17 samples each); block b opens at
    * s0 = ((d·13 + b·47) mod 512) − 256 and code j takes family index
    * (d + b·3 + j·5) mod 8 — drift ≤ 16·4 on |s0| ≤ 256, so neither
    * clamp ever fires and the oracle replays sample j as
    * s0 + Σ_{t≤j} delta(t), a window cumsum. A defect in the step
    * machinery, nibble order, block-state reset, or header parse
    * shifts the stats and fails the hash gate.
    */
  def synthAdpcmAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val nBlocks = (2 + d % 3).toInt
        val blocks = (0 until nBlocks).map { b =>
          val s0 = ((d * 13 + b * 47) % 512 - 256).toShort
          val nibbles = Array.tabulate(16) { j =>
            val idx = ((d + b * 3 + j * 5) % 8).toInt
            (if (idx < 4) idx else idx + 4).toByte
          }
          (s0, 0, nibbles)
        }
        (d, buildWavIma(blocks, blockAlign = 12))
      })
      .toDF("doc_id", "payload")
  }

  /** L5r declared query: RMS/peak stats of the synthesized IMA ADPCM
    * corpus, decoded through the real block/step machinery (see
    * [[synthAdpcmAssets]]/[[audioPcmStats]]).
    */
  def l5AdpcmRms(spark: SparkSession, dir: String): DataFrame =
    audioPcmStats(synthAdpcmAssets(Tables(spark, dir)))
      .select(col("doc_id"), col("n_samples"),
        col("mean_square"), col("peak"), col("rms"))
      .orderBy(col("doc_id"))

  /** Per-sampled-frame pixel stats of one video payload. Option fields
    * are None (one row, frame_idx None) for unrecognized/corrupt
    * containers — the row survives, curation filters decide.
    */
  final case class VideoFrameStats(doc_id: Long, frame_idx: Option[Int],
                                   width: Option[Int], height: Option[Int],
                                   n_pixels: Option[Long],
                                   mean_r: Option[Long], mean_g: Option[Long],
                                   mean_b: Option[Long])

  /** REAL frame-sample over MJPEG AVI payloads — the operator the
    * [[frameSample]] byte-stub stood in for: demux the RIFF container
    * ([[Avi.decodeAvi]]), keep every `stride`-th frame (indices 0,
    * stride, 2·stride, …, the decimation every video curation pipeline
    * applies before feature extraction), decode each kept frame through
    * the engine's own JPEG codec, and emit per-frame channel means.
    * A payload that isn't a well-formed MJPEG AVI — or whose sampled
    * frame isn't a decodable JPEG — degrades to a None row instead of
    * throwing, the decoder discipline every codec here follows.
    *
    * Scale posture: identical to [[imagePixelStats]] — typed
    * `mapPartitions` so demux state initializes once per task, one
    * input row fanning out to ≤ ⌈frames/stride⌉ output rows; no
    * shuffle is introduced (the fan-out is map-side).
    */
  def videoFrameStats(assets: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"videoFrameStats stride must be positive, got $stride")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Avi.decodeAvi(bytes) match {
          case Some((_, frames)) if frames.nonEmpty =>
            (0 until frames.length by stride).map { fi =>
              Jpeg.decodeJpeg(frames(fi)) match {
                case Some((w, h, px)) if px.nonEmpty =>
                  val (r, g, b) = channelMeans(px)
                  VideoFrameStats(id, Some(fi), Some(w), Some(h),
                    Some(px.length.toLong), Some(r), Some(g), Some(b))
                case _ =>
                  VideoFrameStats(id, Some(fi), None, None, None, None, None, None)
              }
            }
          case _ =>
            Seq(VideoFrameStats(id, None, None, None, None, None, None, None))
        }
      })
      .toDF()
  }

  /** Deterministic per-doc MJPEG-AVI synthesis for the declared
    * video-decode query — the [[synthJpegAssets]] trick lifted to a
    * CONTAINER OF CONTAINERS: doc d is an AVI with 2 + d mod 4 frames,
    * each frame a block-constant JPEG (grayscale on even docs, 4:4:4
    * color on odd) of (8·(1 + d mod 2)) × (8·(1 + ⌊d/2⌋ mod 2)) pixels,
    * where frame f's block k carries Y = (d·7 + f·31 + k·29 + 19) mod
    * 256, Cb = (d·11 + f·37 + k·17 + 57) mod 256, Cr = (d·13 + f·41 +
    * k·23 + 94) mod 256. Block-constant frames round-trip EXACTLY under
    * SynthQ (the [[Jpeg]] exactness contract), the RIFF walk is pure
    * byte arithmetic, and odd-length frames (Huffman output parity is
    * data-dependent) exercise the word-alignment pad — so the oracle
    * replays the per-block integer formula while the engine demuxes a
    * genuine container and entropy-decodes genuine JPEG bytes; any
    * defect in either layer is a hash mismatch.
    */
  def synthAviAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val nf = (2 + d % 4).toInt
        val w = (8 * (1 + d % 2)).toInt
        val h = (8 * (1 + (d / 2) % 2)).toInt
        val bx = w / 8
        def blk(i: Int) = (i % w) / 8 + (i / w) / 8 * bx
        val frames = (0 until nf).map { f =>
          def yOf(k: Int) = ((d * 7 + f * 31 + k * 29 + 19) % 256).toInt
          if (d % 2 == 0) {
            Jpeg.buildJpegGray(Array.tabulate(w * h)(i => yOf(blk(i))), w, h)
          } else {
            def cbOf(k: Int) = ((d * 11 + f * 37 + k * 17 + 57) % 256).toInt
            def crOf(k: Int) = ((d * 13 + f * 41 + k * 23 + 94) % 256).toInt
            Jpeg.buildJpeg444(
              Array.tabulate(w * h)(i => yOf(blk(i))),
              Array.tabulate(w * h)(i => cbOf(blk(i))),
              Array.tabulate(w * h)(i => crOf(blk(i))), w, h)
          }
        }
        (d, Avi.buildAviMjpeg(w, h, rate = 30, scale = 1, frames.toIndexedSeq))
      })
      .toDF("doc_id", "payload")
  }

  /** L5i declared query: every-2nd-frame sample of the synthesized
    * MJPEG-AVI corpus, each sampled frame entropy-decoded back to
    * channel means (see [[synthAviAssets]]/[[videoFrameStats]]).
    */
  def l5VideoFrames(spark: SparkSession, dir: String): DataFrame =
    videoFrameStats(synthAviAssets(Tables(spark, dir)), stride = 2)
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("n_pixels"), col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** REAL frame-sample over MPEG-1 VIDEO payloads — [[videoFrameStats]]
    * for an actual broadcast codec with full I/P/B/D picture support
    * ([[Mpeg1.decodeMpeg1Frames]]: sequence/GOP/picture/slice/
    * macroblock layers, DC+AC VLC entropy decode, dequant with
    * mismatch control, forward/backward motion compensation,
    * bidirectional interpolation, anchor reordering to display order,
    * the shared 8×8 IDCT, 4:2:0 chroma — and D trick-mode pictures).
    * Frame indices are DISPLAY order; nonconforming streams degrade
    * to one None row (the [[Mpeg1]] scope contract). Same scale shape
    * as every decode
    * here: stateless typed `mapPartitions`, map-side fan-out, no
    * shuffle introduced.
    */
  def mpeg1FrameStats(assets: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"mpeg1FrameStats stride must be positive, got $stride")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Mpeg1.decodeMpeg1Frames(bytes) match {
          case Some((w, h, frames)) if frames.nonEmpty =>
            (0 until frames.length by stride).map { fi =>
              val px = frames(fi)
              val (r, g, b) = channelMeans(px)
              VideoFrameStats(id, Some(fi), Some(w), Some(h),
                Some(px.length.toLong), Some(r), Some(g), Some(b))
            }
          case _ =>
            Seq(VideoFrameStats(id, None, None, None, None, None, None, None))
        }
      })
      .toDF()
  }

  /** Deterministic per-doc MPEG-1 synthesis for the declared
    * I-frame-video query — the [[synthAviAssets]] trick on a real
    * broadcast bitstream: doc d is an intra-only elementary stream of
    * 2 + d mod 3 pictures at (16·(1 + d mod 2)) × (16·(1 + ⌊d/2⌋ mod
    * 2)), where picture f's 8×8 luma block k carries Y = (d·7 + f·29 +
    * k·31 + 23) mod 256 and macroblock m carries Cb = (d·11 + f·37 +
    * m·17 + 61) mod 256, Cr = (d·13 + f·41 + m·19 + 96) mod 256.
    * DC-only blocks reconstruct EXACTLY (flat block ⇒ no AC; DC quant
    * is the fixed 8), 4:2:0 replication is exact on MB-constant chroma,
    * and the RGB step is the shared fixed-point formula — so the oracle
    * replays the per-(frame, block) integer arithmetic while the engine
    * entropy-decodes genuine MPEG-1 bits: slice structure, DC
    * prediction chains, VLC sizes, the IDCT.
    */
  def synthMpeg1Assets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val nf = (2 + d % 3).toInt
        val w = (16 * (1 + d % 2)).toInt
        val h = (16 * (1 + (d / 2) % 2)).toInt
        val bw = w / 8; val mbW = w / 16
        val frames = (0 until nf).map { f =>
          Mpeg1.Mpeg1Frame(
            Array.tabulate(bw * (h / 8))(k => ((d * 7 + f * 29 + k * 31 + 23) % 256).toInt),
            Array.tabulate(mbW * (h / 16))(m => ((d * 11 + f * 37 + m * 17 + 61) % 256).toInt),
            Array.tabulate(mbW * (h / 16))(m => ((d * 13 + f * 41 + m * 19 + 96) % 256).toInt))
        }
        (d, Mpeg1.buildMpeg1I(w, h, frames.toIndexedSeq))
      })
      .toDF("doc_id", "payload")
  }

  /** L5m declared query: every-2nd-picture sample of the synthesized
    * intra-only MPEG-1 corpus (see [[synthMpeg1Assets]]/
    * [[mpeg1FrameStats]]).
    */
  def l5Mpeg1Frames(spark: SparkSession, dir: String): DataFrame =
    mpeg1FrameStats(synthMpeg1Assets(Tables(spark, dir)), stride = 2)
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("n_pixels"), col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Deterministic per-doc I+P MPEG-1 synthesis for the declared
    * PREDICTED-video query: doc d opens with one intra picture (luma
    * block k: Y₀ = 40 + (d·7 + k·31 + 23) mod 176 — clamp-free headroom
    * for the delta drift; chroma per MB m as in [[synthMpeg1Assets]],
    * constant across pictures) followed by 1 + d mod 3 zero-motion P
    * pictures whose block-k luma delta at picture j is
    * D = s·(3 + 2·((d + j·5 + k·3) mod 4)), s = +1 iff (d+j+k) even —
    * odd deltas in ±{3,5,7,9}, the exactly-reconstructable residual
    * family of [[Mpeg1.PPicture]]. The decoder must run the REAL P
    * path — macroblock-type, CBP, dct_coeff_first escapes, non-intra
    * dequant, residual IDCT, prediction add — and the oracle replays
    * Y_f(k) = Y₀(k) + Σ_{j≤f} D(d,j,k) as a window cumsum.
    */
  def synthMpeg1PAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val np = (1 + d % 3).toInt
        val w = (16 * (1 + d % 2)).toInt
        val h = (16 * (1 + (d / 2) % 2)).toInt
        val bw = w / 8; val mbW = w / 16
        val i0 = Mpeg1.IPicture(Mpeg1.Mpeg1Frame(
          Array.tabulate(bw * (h / 8))(k => (40 + (d * 7 + k * 31 + 23) % 176).toInt),
          Array.tabulate(mbW * (h / 16))(m => ((d * 11 + m * 17 + 61) % 256).toInt),
          Array.tabulate(mbW * (h / 16))(m => ((d * 13 + m * 19 + 96) % 256).toInt)))
        val ps = (1 to np).map { j =>
          Mpeg1.PPicture(Array.tabulate(bw * (h / 8)) { k =>
            val mag = (3 + 2 * ((d + j * 5 + k * 3) % 4)).toInt
            if ((d + j + k) % 2 == 0) mag else -mag
          })
        }
        (d, Mpeg1.buildMpeg1(w, h, i0 +: ps))
      })
      .toDF("doc_id", "payload")
  }

  /** L5n declared query: EVERY picture of the synthesized I+P MPEG-1
    * corpus (stride 1 — the P chaining is the point), channel means per
    * reconstructed frame.
    */
  def l5Mpeg1PFrames(spark: SparkSession, dir: String): DataFrame =
    mpeg1FrameStats(synthMpeg1PAssets(Tables(spark, dir)), stride = 1)
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("n_pixels"), col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Deterministic per-doc I+P+B MPEG-1 synthesis for the declared
    * BIDIRECTIONAL-video query: doc d is the decode-order stream
    * [I, P, B₁ … B_nB] (nB = 1 + d mod 3) whose DISPLAY order is
    * I, B₁ … B_nB, P — the decoder must run the REAL B path: the
    * B macroblock-type VLC, backward f_code parse, past/future anchor
    * slots, display reordering, and bidirectional interpolation.
    * Luma: I block k carries Y₀ = 40 + (d·7 + k·31 + 23) mod 140
    * (headroom so every arm stays clamp-free); the P delta is
    * D_P = s·(3 + 2·((d + k·3) mod 4)) with s = +1 iff (d+k) even, so
    * Y_P = Y₀ + D_P. B_j predicts by mode (d+j) mod 3 — 0: forward
    * (= Y₀), 1: backward (= Y_P), 2: interpolated
    * (= (Y₀+Y_P+1) >> 1, the standard's round-half-away average) —
    * and adds, when (d+j) is even, the coded odd residual
    * D_B = s·(3 + 2·((d + j·5 + k·3) mod 4)), s = +1 iff (d+j+k)
    * even. Chroma is constant per macroblock across pictures (as in
    * [[synthMpeg1Assets]]), so every prediction arm reproduces it
    * exactly. The oracle replays the display-order arithmetic; a
    * defect in any B-layer — type table, vector predictors, the
    * interpolation rounding, the reorder — is a hash mismatch.
    */
  def synthMpeg1BAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val nB = (1 + d % 3).toInt
        val w = (16 * (1 + d % 2)).toInt
        val h = (16 * (1 + (d / 2) % 2)).toInt
        val bw = w / 8; val mbW = w / 16
        val nBlk = bw * (h / 8)
        val i0 = Mpeg1.IPicture(Mpeg1.Mpeg1Frame(
          Array.tabulate(nBlk)(k => (40 + (d * 7 + k * 31 + 23) % 140).toInt),
          Array.tabulate(mbW * (h / 16))(m => ((d * 11 + m * 17 + 61) % 256).toInt),
          Array.tabulate(mbW * (h / 16))(m => ((d * 13 + m * 19 + 96) % 256).toInt)))
        val p = Mpeg1.PPicture(Array.tabulate(nBlk) { k =>
          val mag = (3 + 2 * ((d + k * 3) % 4)).toInt
          if ((d + k) % 2 == 0) mag else -mag
        })
        val bs = (1 to nB).map { j =>
          val mode = ((d + j) % 3 + 1).toInt // 1 fwd, 2 bwd, 3 interp
          val deltas =
            if ((d + j) % 2 == 0) Array.tabulate(nBlk) { k =>
              val mag = (3 + 2 * ((d + j * 5 + k * 3) % 4)).toInt
              if ((d + j + k) % 2 == 0) mag else -mag
            } else null
          Mpeg1.BPicture(mode, deltas)
        }
        (d, Mpeg1.buildMpeg1(w, h, (i0: Mpeg1.Mp1Picture) +: p +: bs))
      })
      .toDF("doc_id", "payload")
  }

  /** L5o declared query: EVERY display-order frame of the synthesized
    * I+P+B MPEG-1 corpus (the reorder is the point), channel means per
    * reconstructed frame.
    */
  def l5Mpeg1BFrames(spark: SparkSession, dir: String): DataFrame =
    mpeg1FrameStats(synthMpeg1BAssets(Tables(spark, dir)), stride = 1)
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("n_pixels"), col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Deterministic per-doc all-D MPEG-1 synthesis for the declared
    * TRICK-MODE-video query — the fourth and last 11172-2 picture
    * type: doc d is an all-D elementary stream of 2 + d mod 3
    * pictures at the [[synthMpeg1Assets]] dimensions, where picture
    * f's 8×8 luma block k carries Y = (d·5 + f·23 + k·37 + 11) mod
    * 256 and macroblock m carries Cb = (d·17 + f·31 + m·13 + 42) mod
    * 256, Cr = (d·19 + f·43 + m·29 + 77) mod 256 (fresh constants vs
    * the intra query so the two can't mask each other). D blocks are
    * DC-only BY SYNTAX — no AC scan, no end_of_block, an
    * end_of_macroblock marker per macroblock, the single-entry
    * macroblock-type table — so the engine exercises the one
    * picture-type grammar the I/P/B queries cannot reach, while the
    * oracle replays the same flat-block integer arithmetic.
    */
  def synthMpeg1DAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val nf = (2 + d % 3).toInt
        val w = (16 * (1 + d % 2)).toInt
        val h = (16 * (1 + (d / 2) % 2)).toInt
        val bw = w / 8; val mbW = w / 16
        val pics = (0 until nf).map { f =>
          Mpeg1.DPicture(Mpeg1.Mpeg1Frame(
            Array.tabulate(bw * (h / 8))(k => ((d * 5 + f * 23 + k * 37 + 11) % 256).toInt),
            Array.tabulate(mbW * (h / 16))(m => ((d * 17 + f * 31 + m * 13 + 42) % 256).toInt),
            Array.tabulate(mbW * (h / 16))(m => ((d * 19 + f * 43 + m * 29 + 77) % 256).toInt)))
        }
        (d, Mpeg1.buildMpeg1(w, h, pics.toIndexedSeq))
      })
      .toDF("doc_id", "payload")
  }

  /** L5p declared query: every-2nd-picture sample of the synthesized
    * all-D MPEG-1 corpus (see [[synthMpeg1DAssets]]/
    * [[mpeg1FrameStats]]).
    */
  def l5Mpeg1DFrames(spark: SparkSession, dir: String): DataFrame =
    mpeg1FrameStats(synthMpeg1DAssets(Tables(spark, dir)), stride = 2)
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("n_pixels"), col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Deterministic per-doc gzip synthesis for the declared
    * INGESTION query: doc d's text is split at the character midpoint
    * into two records, each serialized as its own gzip member
    * ([[Gzip.buildGzipMember]] — deterministic MTIME-0 header, raw
    * DEFLATE, CRC32+ISIZE trailer) and CONCATENATED — the WARC/WET
    * record layout a crawl pipeline actually ingests. Splitting at a
    * CHARACTER boundary keeps the two members' UTF-8 bytes
    * concatenation-safe, so decode must reassemble the exact original
    * text.
    */
  def synthGzipAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (d, text) =>
        val half = text.length / 2
        (d, Gzip.buildGzip(Seq(
          text.substring(0, half).getBytes("UTF-8"),
          text.substring(half).getBytes("UTF-8"))))
      })
      .toDF("doc_id", "payload")
  }

  /** L5q declared query: decode the synthesized two-member gzip corpus
    * back to text ([[Gzip.decodeGzip]] — full header/trailer
    * verification, multi-member reassembly) and pin the round-trip
    * with the decoded text's LENGTH and MD5 — a single corrupted byte,
    * member boundary slip, or framing misparse shifts the digest and
    * fails the hash gate. Same degradation contract as every codec
    * stage: an undecodable payload yields one null row. Scale shape:
    * stateless `mapPartitions` decode, narrow projection, the only
    * exchange is the output sort.
    */
  def l5GzipText(spark: SparkSession, dir: String): DataFrame =
    gzipTextStats(synthGzipAssets(Tables(spark, dir)))
      .orderBy(col("doc_id"))

  /** Decode gzip'd text payloads to (member count, length, md5) rows —
    * the batch operator [[l5GzipText]] declares and the T22 streaming
    * ingestion arm applies unchanged to each micro-batch (stateless
    * per-payload transform, no shuffle introduced).
    */
  def gzipTextStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (d, payload) =>
        Gzip.decodeGzip(payload) match {
          case Some((members, data)) =>
            (d, Some(members), Some(new String(data, "UTF-8")))
          case None => (d, None: Option[Int], None: Option[String])
        }
      })
      .toDF("doc_id", "n_members", "text")
      .select(col("doc_id"), col("n_members"),
        length(col("text")).as("n_chars"), md5(col("text")).as("text_md5"))
  }

  /** REAL frame-sample over MS-RLE8 AVI payloads — the third
    * in-container video arm ([[Avi.decodeAviRle8]]: palettized
    * run-length opcodes over a persistent canvas, where frame 0 is a
    * keyframe and every later frame arrives as a temporal DELTA whose
    * skip escapes retain previous-frame pixels). Emits per-frame
    * channel means for EVERY frame; a payload that isn't a well-formed
    * RLE8 AVI yields one None row. Same scale shape as every decode:
    * stateless typed `mapPartitions`, map-side fan-out, no shuffle.
    */
  def rle8FrameStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Avi.decodeAviRle8(bytes) match {
          case Some((w, h, frames)) if frames.nonEmpty =>
            frames.indices.map { fi =>
              val px = frames(fi)
              val (r, g, b) = channelMeans(px)
              VideoFrameStats(id, Some(fi), Some(w), Some(h),
                Some(px.length.toLong), Some(r), Some(g), Some(b))
            }
          case _ =>
            Seq(VideoFrameStats(id, None, None, None, None, None, None, None))
        }
      })
      .toDF()
  }

  /** Deterministic per-doc MS-RLE8 synthesis for the declared
    * delta-video query: doc d is 2 + d mod 3 frames at
    * (8 + d mod 8) × (4 + d mod 4) over a 16-color palette
    * p(k) = ((d·29 + k·31 + 47) mod 256, (d·37 + k·41 + 89) mod 256,
    * (d·43 + k·53 + 3) mod 256); pixel i of frame f carries index
    * idx = (d·3 + ⌊i/4⌋ + f·((⌊i/4⌋ + d) mod 3)) mod 16 — the
    * ⌊i/4⌋ term makes real runs, and the f-term leaves every third
    * pixel-group CONSTANT across frames, so the builder's delta
    * encoder emits genuine skip escapes and early EOLs the decoder's
    * canvas must honor (a decoder that clears or mis-advances the
    * canvas breaks exactly those pixels). The oracle replays the
    * palette + index arithmetic per (frame, pixel).
    */
  def synthRle8Assets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val nf = (2 + d % 3).toInt
        val w = (8 + d % 8).toInt
        val h = (4 + d % 4).toInt
        val palette = Array.tabulate(16) { k =>
          (((d * 29 + k * 31 + 47) % 256).toInt << 16) |
            (((d * 37 + k * 41 + 89) % 256).toInt << 8) |
            ((d * 43 + k * 53 + 3) % 256).toInt
        }
        val frames = (0 until nf).map { f =>
          Array.tabulate(w * h) { i =>
            ((d * 3 + i / 4 + f * ((i / 4 + d) % 3)) % 16).toInt
          }
        }
        (d, Avi.buildAviRle8(w, h, rate = 15, scale = 1, palette, frames))
      })
      .toDF("doc_id", "payload")
  }

  /** L5s declared query: every frame of the synthesized MS-RLE8
    * corpus, decoded through the real opcode/canvas machinery (see
    * [[synthRle8Assets]]/[[rle8FrameStats]]).
    */
  def l5Rle8Frames(spark: SparkSession, dir: String): DataFrame =
    rle8FrameStats(synthRle8Assets(Tables(spark, dir)))
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("n_pixels"), col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** REAL frame-sample over ANIMATED GIF payloads — the
    * [[videoFrameStats]] twin for the web's other ubiquitous motion
    * container: composite every frame onto the logical-screen canvas
    * with full GCE semantics ([[Gif.decodeGifFrames]] — per-frame
    * rects, transparency, disposal 0–3, local palettes), keep every
    * `stride`-th composited frame, and emit per-frame channel means.
    * Same degradation contract: a payload that isn't a well-formed GIF
    * yields one None row.
    */
  def gifFrameStats(assets: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"gifFrameStats stride must be positive, got $stride")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Gif.decodeGifFrames(bytes) match {
          case Some((w, h, frames, _)) if frames.nonEmpty =>
            (0 until frames.length by stride).map { fi =>
              val px = frames(fi)
              val (r, g, b) = channelMeans(px)
              VideoFrameStats(id, Some(fi), Some(w), Some(h),
                Some(px.length.toLong), Some(r), Some(g), Some(b))
            }
          case _ =>
            Seq(VideoFrameStats(id, None, None, None, None, None, None, None))
        }
      })
      .toDF()
  }

  /** Deterministic per-doc ANIMATED-GIF synthesis for the declared
    * animation query — built so last-writer-wins composition has a
    * CLOSED FORM the oracle can replay: doc d is a (6 + d mod 6) ×
    * (4 + d mod 4) screen with 2 + d mod 3 frames; frame g is a
    * full-height rect of width W−g at (0,0) whose local pixel i carries
    * palette index (d + g·7 + i·5) mod P, P = 4 + d mod 12, palette
    * entry j = ((d·11 + j·3 + 17) mod 256, (d·13 + j·23 + 41) mod 256,
    * (d·17 + j·29 + 103) mod 256). Because frame widths shrink by one
    * per frame, composited frame f shows frame g* = min(f, W−x−1) at
    * column x — a pure integer expression — with local index
    * y·(W−g*) + x. Every 3rd doc interlaces its frames (4-pass row
    * order inside each RECT), and all docs carry the NETSCAPE loop
    * block and per-frame GCEs the decoder must walk.
    */
  def synthAnimGifAssets(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    graft.Engine.parallelFloor(t.documents.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { d =>
        val p = (4 + d % 12).toInt
        val w = (6 + d % 6).toInt
        val h = (4 + d % 4).toInt
        val nf = (2 + d % 3).toInt
        val pal = Array.tabulate(p) { j =>
          val r = ((d * 11 + j * 3 + 17) % 256).toInt
          val g = ((d * 13 + j * 23 + 41) % 256).toInt
          val b = ((d * 17 + j * 29 + 103) % 256).toInt
          (r << 16) | (g << 8) | b
        }
        val frames = (0 until nf).map { g =>
          val fw = w - g
          Gif.GifFrame(
            Array.tabulate(fw * h)(i => ((d + g * 7 + i * 5) % p).toInt),
            left = 0, top = 0, w = fw, h = h,
            interlaced = d % 3 == 0)
        }
        (d, Gif.buildAnimatedGif(w, h, pal, frames))
      })
      .toDF("doc_id", "payload")
  }

  /** L5l declared query: every-2nd-frame sample of the synthesized
    * animated-GIF corpus, each composited frame reduced to channel
    * means (see [[synthAnimGifAssets]]/[[gifFrameStats]]).
    */
  def l5GifFrames(spark: SparkSession, dir: String): DataFrame =
    gifFrameStats(synthAnimGifAssets(Tables(spark, dir)), stride = 2)
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("n_pixels"), col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Batch "decode / feature-extract" over the binary payload column.
    *
    * STUB CODEC for formats that genuinely need a codec library
    * (inter-frame-predicted video — H.26x/VP9/AV1 — and learned feature
    * extractors) — WAV PCM, BMP24, truecolor PNG, baseline+progressive
    * JPEG, GIF and MJPEG-AVI video decode are REAL, see
    * [[decodePcmSamples]]/[[decodeBmp24]]/[[decodePng]]/
    * [[Jpeg.decodeJpeg]]/[[Gif.decodeGif]]/[[videoFrameStats]]; the
    * stand-in emits a deterministic 4-d feature from the payload bytes
    * so the distributed plumbing — per-partition batching, binary
    * traversal, schema of the result — is real and testable.
    */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    // typed Dataset.mapPartitions: keeps the encoder-serialized path (no
    // Row boxing through an RDD hop, schema visible to Catalyst) while
    // preserving the per-partition init-once property a codec needs
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init happens here (codec handles, model sessions)
        rows.map { case (id, bytes) =>
          MediaFeature(id, bytes.length, bytes.take(4).map(b => (b & 0xff) / 255.0).toSeq)
        }
      }
      .toDF()
  }
}
