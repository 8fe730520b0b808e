package graft.operators

import java.io.ByteArrayOutputStream

/** Library-free AVI (RIFF) container codec — the video side of the
  * engine's real-decode family (WAV/BMP/PNG/JPEG/GIF), carrying TWO
  * in-container codecs: MJPEG (one complete JPEG per `movi` chunk,
  * decoded by [[Jpeg]]) and MS-RLE8 ([[decodeAviRle8]] — 8-bit
  * palettized run-length opcodes with TEMPORAL DELTA frames over a
  * persistent canvas, the classic Windows codec). The container layer
  * is pure byte walking — fourcc checks, little-endian u32 sizes,
  * word-aligned chunk padding, and the optional `rec ` grouping lists
  * that interleaved AVIs wrap frames in. No codec library is involved
  * at either end (the JDK ships neither an AVI muxer nor a demuxer).
  * Video whose frames need a transform-domain inter predictor (H.26x,
  * VP9, AV1) stays behind the documented stand-in — though see
  * [[Mpeg1]] for the real MPEG-1 I/P/B/D path.
  *
  * Structure written and read (OpenDML/AVI 1.0, the public RIFF layout):
  *
  * {{{
  * RIFF('AVI '
  *   LIST('hdrl'
  *     avih(56)                     — µs/frame, total frames, dims
  *     LIST('strl' strh(56) strf(40)))  — 'vids'/'MJPG', rate/scale, BITMAPINFOHEADER
  *   LIST('movi' { '00dc'(jpeg) | LIST('rec ' ...) }*)
  *   idx1({fourcc, flags, offset, size}*))
  * }}}
  *
  * Reader contract (the [[Multimodal]] decoder discipline): total
  * function, `None` for anything malformed — truncated sizes, wrong
  * fourccs, chunk sizes overrunning their parent, missing headers —
  * and hostile headers are rejected BEFORE any proportional allocation
  * (frame count and per-frame size are bounds-checked against the
  * actual byte budget, so a 50-byte file claiming 2^31 frames cannot
  * allocate). The reader ignores `idx1` and walks `movi` directly:
  * indexes are advisory in AVI 1.0 and absent in many writers, while
  * the chunk stream is the ground truth.
  */
object Avi {

  /** Stream metadata recovered from the `hdrl` list. `rate`/`scale` is
    * the frame-rate fraction exactly as strh carries it (fps =
    * rate/scale); `totalFrames` is the DECLARED count from avih, which
    * [[decodeAvi]] cross-checks against the frames actually present.
    */
  final case class AviMeta(width: Int, height: Int, rate: Int, scale: Int,
                           totalFrames: Int)

  private val MaxFrames = 1 << 20 // hostile-header cap, checked vs remaining bytes too
  // LIST nesting cap: the walk recurses once per LIST level and a
  // 12-byte header buys a level, so a ~KB file of nested 'rec ' lists
  // would otherwise drive a StackOverflowError (an Error — it escapes
  // the catch and breaks the None-never-throw contract). Real AVIs
  // nest 3 deep (RIFF > hdrl/movi > strl/rec).
  private val MaxListDepth = 64

  // ---------------------------------------------------------------- writer

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  private def u32le(v: Long): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def u16le(v: Int): Array[Byte] = Array[Byte](v.toByte, (v >> 8).toByte)

  private def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + 9)
    out.write(fourcc(cc)); out.write(u32le(body.length.toLong))
    out.write(body)
    if ((body.length & 1) == 1) out.write(0) // RIFF word alignment
    out.toByteArray
  }

  private def list(kind: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + 13)
    out.write(fourcc("LIST")); out.write(u32le(body.length + 4L))
    out.write(fourcc(kind)); out.write(body)
    // list bodies here are always even (every child is padded)
    out.toByteArray
  }

  /** Serialize frames (each a complete JPEG) into a standards-shaped
    * MJPEG AVI: one `vids`/`MJPG` stream, `00dc` frame chunks, and an
    * `idx1` keyframe index (every MJPEG frame is a keyframe). Frames
    * with odd byte length get the RIFF pad byte — real muxers hit this
    * constantly and sloppy readers break on it, so the writer never
    * avoids it.
    */
  def buildAviMjpeg(width: Int, height: Int, rate: Int, scale: Int,
                    frames: IndexedSeq[Array[Byte]]): Array[Byte] = {
    val strf = { // BITMAPINFOHEADER for the decompressed frames
      val b = new ByteArrayOutputStream(40)
      b.write(u32le(40))                  // biSize
      b.write(u32le(width.toLong)); b.write(u32le(height.toLong))
      b.write(u16le(1)); b.write(u16le(24)) // biPlanes, biBitCount
      b.write(fourcc("MJPG"))             // biCompression
      b.write(u32le(width.toLong * height * 3)) // biSizeImage
      b.write(u32le(0)); b.write(u32le(0)) // XPelsPerMeter, YPels
      b.write(u32le(0)); b.write(u32le(0)) // biClrUsed, biClrImportant
      b.toByteArray
    }
    assembleAvi(width, height, rate, scale, "MJPG", strf, frames)
  }

  /** Shared RIFF/AVI assembly: avih + one vids strl (handler `fcc`,
    * stream format `strf`) + movi with one `00dc` chunk per frame +
    * idx1. The MJPEG and RLE8 builders differ only in strf and
    * payload encoding.
    */
  private def assembleAvi(width: Int, height: Int, rate: Int, scale: Int,
                          fcc: String, strf: Array[Byte],
                          frames: IndexedSeq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rate > 0 && scale > 0, s"bad rate $rate/$scale")
    // avih dwMicroSecPerFrame is a u32 field; clamp rather than let the
    // Long→Int cast wrap for extreme rate/scale (metadata-only — the
    // reader derives fps from strh rate/scale — but other readers don't)
    val usPerFrame =
      math.min(scale.toLong * 1000000L / rate, 0xffffffffL)

    val avih = {
      val b = new ByteArrayOutputStream(56)
      b.write(u32le(usPerFrame.toLong))   // dwMicroSecPerFrame
      b.write(u32le(0)); b.write(u32le(0)) // dwMaxBytesPerSec, dwPaddingGranularity
      b.write(u32le(0x10))                // dwFlags: AVIF_HASINDEX
      b.write(u32le(frames.length.toLong)) // dwTotalFrames
      b.write(u32le(0))                   // dwInitialFrames
      b.write(u32le(1))                   // dwStreams
      b.write(u32le(0))                   // dwSuggestedBufferSize
      b.write(u32le(width.toLong)); b.write(u32le(height.toLong))
      (0 until 4).foreach(_ => b.write(u32le(0))) // dwReserved
      b.toByteArray
    }
    val strh = {
      val b = new ByteArrayOutputStream(56)
      b.write(fourcc("vids")); b.write(fourcc(fcc))
      b.write(u32le(0))                   // dwFlags
      b.write(u16le(0)); b.write(u16le(0)) // wPriority, wLanguage
      b.write(u32le(0))                   // dwInitialFrames
      b.write(u32le(scale.toLong)); b.write(u32le(rate.toLong))
      b.write(u32le(0))                   // dwStart
      b.write(u32le(frames.length.toLong)) // dwLength (frames)
      b.write(u32le(0))                   // dwSuggestedBufferSize
      b.write(u32le(0xffffffffL))         // dwQuality (-1: default)
      b.write(u32le(0))                   // dwSampleSize (0: one sample per chunk)
      b.write(u16le(0)); b.write(u16le(0)) // rcFrame left, top
      b.write(u16le(width)); b.write(u16le(height))
      b.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))

    val moviBody = new ByteArrayOutputStream()
    // idx1 offsets are relative to the 'movi' fourcc position (the
    // common convention; readers must also accept absolute offsets,
    // ours ignores idx1 entirely)
    val offsets = frames.map { f =>
      val off = moviBody.size() + 4 // +4: offset counts from the 'movi' fourcc
      moviBody.write(chunk("00dc", f))
      off
    }
    val movi = list("movi", moviBody.toByteArray)

    val idx1 = {
      val b = new ByteArrayOutputStream(frames.length * 16)
      frames.indices.foreach { i =>
        b.write(fourcc("00dc"))
        b.write(u32le(0x10)) // AVIIF_KEYFRAME
        b.write(u32le(offsets(i).toLong))
        b.write(u32le(frames(i).length.toLong))
      }
      b.toByteArray
    }

    val riffBody = new ByteArrayOutputStream()
    riffBody.write(fourcc("AVI "))
    riffBody.write(hdrl); riffBody.write(movi); riffBody.write(chunk("idx1", idx1))
    val out = new ByteArrayOutputStream(riffBody.size() + 8)
    out.write(fourcc("RIFF")); out.write(u32le(riffBody.size().toLong))
    out.write(riffBody.toByteArray)
    out.toByteArray
  }

  /** MS-RLE8 AVI builder (biCompression 1, 8-bit palettized) — the
    * OTHER classic AVI codec next to MJPEG, and the one with temporal
    * structure: frame 0 is a keyframe, later frames are encoded as
    * DELTAS against the previous frame (unchanged spans become
    * position-skip escapes and early end-of-lines; the decoder's
    * canvas retains them). `frames` are TOP-DOWN row-major palette
    * indices; `palette` is 0xRRGGBB, at most 256 entries.
    */
  def buildAviRle8(width: Int, height: Int, rate: Int, scale: Int,
                   palette: Array[Int],
                   frames: IndexedSeq[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(palette.nonEmpty && palette.length <= 256,
      s"palette must have 1..256 entries, got ${palette.length}")
    require(frames.nonEmpty, "at least one frame")
    frames.foreach { f =>
      require(f.length == width * height, "frame grid must match dims")
      require(f.forall(i => i >= 0 && i < palette.length),
        "indices must address the palette")
    }
    val strf = {
      val b = new ByteArrayOutputStream(40 + palette.length * 4)
      b.write(u32le(40))
      b.write(u32le(width.toLong)); b.write(u32le(height.toLong))
      b.write(u16le(1)); b.write(u16le(8))  // biPlanes, biBitCount 8
      b.write(u32le(1))                     // biCompression: BI_RLE8
      b.write(u32le(width.toLong * height))
      b.write(u32le(0)); b.write(u32le(0))
      b.write(u32le(palette.length.toLong)) // biClrUsed
      b.write(u32le(0))
      palette.foreach { p =>                // RGBQUAD: B, G, R, reserved
        b.write(p & 0xff); b.write((p >> 8) & 0xff)
        b.write((p >> 16) & 0xff); b.write(0)
      }
      b.toByteArray
    }
    val payloads = frames.zipWithIndex.map { case (f, i) =>
      encodeRle8Frame(f, if (i == 0) null else frames(i - 1), width, height)
    }
    assembleAvi(width, height, rate, scale, "mrle", strf, payloads)
  }

  /** One RLE8 frame: bottom-up rows, encoded runs for changed spans,
    * position-skip escapes (00 02 dx dy) for interior unchanged spans,
    * an early end-of-line when the row's remainder is unchanged, EOF
    * after the last row. `prev == null` encodes a keyframe (every
    * pixel written).
    */
  private[graft] def encodeRle8Frame(cur: Array[Int], prev: Array[Int],
                                         w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(w * h / 4 + 16)
    var yb = 0
    while (yb < h) {
      val base = (h - 1 - yb) * w // canvas rows are top-down, RLE bottom-up
      var x = 0
      var rowOpen = true
      while (x < w && rowOpen) {
        if (prev != null && cur(base + x) == prev(base + x)) {
          var s = 0
          while (x + s < w && cur(base + x + s) == prev(base + x + s)) s += 1
          if (x + s == w) rowOpen = false // rest of row unchanged: EOL skips it
          else {
            var left = s
            while (left > 0) {
              val d = math.min(left, 255)
              out.write(0); out.write(2); out.write(d); out.write(0)
              left -= d
            }
            x += s
          }
        } else {
          val v = cur(base + x)
          var r = 1
          while (x + r < w && cur(base + x + r) == v && r < 255) r += 1
          out.write(r); out.write(v)
          x += r
        }
      }
      if (yb < h - 1) { out.write(0); out.write(0) } // EOL
      yb += 1
    }
    out.write(0); out.write(1) // EOF
    out.toByteArray
  }

  // ---------------------------------------------------------------- reader

  private final class AErr extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new AErr

  /** Full demux result: metadata, the stream's biCompression value
    * (fourcc as LE u32, or the small BI_* codes), the 0xRRGGBB palette
    * when the format is 8-bit palettized (null otherwise), and the raw
    * frame payloads.
    */
  final case class AviStream(meta: AviMeta, compression: Long,
                             palette: Array[Int],
                             frames: IndexedSeq[Array[Byte]])

  /** Demux an AVI: stream metadata + every video frame's bytes in
    * stream order. `None` for malformed input. Frames come
    * from `00dc`/`00db` chunks of stream 0 inside `movi` (descending
    * into `rec ` grouping lists); empty placeholder chunks (size 0,
    * dropped-frame convention) are skipped. The declared frame count
    * must match the frames present — a container whose index lies about
    * its length is malformed, not partially decodable.
    */
  def decodeAvi(bytes: Array[Byte]): Option[(AviMeta, IndexedSeq[Array[Byte]])] =
    decodeAviStream(bytes).map(s => (s.meta, s.frames))

  /** [[decodeAvi]] plus the stream-format details an in-container
    * codec needs (biCompression + palette) — see [[AviStream]].
    */
  def decodeAviStream(bytes: Array[Byte]): Option[AviStream] = {
    if (bytes == null || bytes.length < 12) return None
    def u32(i: Int): Long = {
      if (i < 0 || i + 4 > bytes.length) fail()
      (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    }
    def cc(i: Int): String = {
      if (i < 0 || i + 4 > bytes.length) fail()
      new String(bytes, i, 4, "US-ASCII")
    }
    def u16(i: Int): Int = {
      if (i < 0 || i + 2 > bytes.length) fail()
      (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    }
    try {
      if (cc(0) != "RIFF" || cc(8) != "AVI ") return None
      val riffEnd = {
        val sz = u32(4)
        if (sz < 4 || 8 + sz > bytes.length) fail()
        (8 + sz).toInt
      }

      var width = -1; var height = -1; var rate = -1; var scale = -1
      var total = -1
      var sawVids = false
      var wantStrf = false // capture the strf FOLLOWING the first vids strh
      var compression = -1L
      var palette: Array[Int] = null
      var seen = 0 // every stream-0 video chunk, dropped-frame placeholders included
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

      // Walk one chunk sequence [pos, end); inMovi activates frame capture.
      def walk(pos0: Int, end: Int, inMovi: Boolean, depth: Int): Unit = {
        if (depth > MaxListDepth) fail()
        var pos = pos0
        while (pos + 8 <= end) {
          val id = cc(pos)
          val sz = u32(pos + 4)
          val body = pos + 8
          if (sz > end - body) fail() // chunk overruns its parent
          val bodyEnd = body + sz.toInt
          if (id == "LIST") {
            if (sz < 4) fail()
            val kind = cc(body)
            val isMovi = kind == "movi" || kind == "rec "
            walk(body + 4, bodyEnd, inMovi || isMovi, depth + 1)
          } else if (id == "avih") {
            if (sz < 40) fail()
            total = u32(body + 16).toInt
            width = u32(body + 32).toInt
            height = u32(body + 36).toInt
          } else if (id == "strh") {
            if (sz < 36) fail()
            if (cc(body) == "vids") {
              // only the first video stream drives rate/scale
              if (!sawVids) {
                sawVids = true
                wantStrf = true
                scale = u32(body + 20).toInt
                rate = u32(body + 24).toInt
              }
            }
          } else if (id == "strf" && wantStrf) {
            wantStrf = false
            if (sz < 40) fail()
            compression = u32(body + 16)
            val bitCount = u16(body + 14)
            if (bitCount == 8) {
              val clrUsed = u32(body + 32).toInt
              val n = if (clrUsed == 0) 256 else clrUsed
              if (n < 0 || n > 256 || body + 40 + 4L * n > bodyEnd) fail()
              palette = Array.tabulate(n) { k =>
                val p = body + 40 + 4 * k // RGBQUAD: B, G, R, reserved
                ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 1) & 0xff) << 8) |
                  (bytes(p) & 0xff)
              }
            }
          } else if (inMovi && id.length == 4 &&
                     id(0) == '0' && id(1) == '0' &&
                     (id.substring(2) == "dc" || id.substring(2) == "db")) {
            if (seen >= MaxFrames) fail()
            seen += 1
            // size-0 chunks are the dropped-frame convention: they count
            // toward the declared total but carry no decodable payload
            if (sz > 0) frames += java.util.Arrays.copyOfRange(bytes, body, bodyEnd)
          } // unknown chunks (idx1, JUNK, vprp, other streams) skip silently
          pos = bodyEnd + (sz.toInt & 1) // word alignment
        }
        if (pos != end) fail() // trailing garbage inside a list
      }

      walk(12, riffEnd, inMovi = false, depth = 0)

      if (!sawVids || width <= 0 || height <= 0 || rate <= 0 || scale <= 0) return None
      if (total != seen) return None
      Some(AviStream(AviMeta(width, height, rate, scale, total),
        compression, palette, frames.toIndexedSeq))
    } catch { case _: AErr | _: ArrayIndexOutOfBoundsException => None }
  }

  /** Decode an MS-RLE8 AVI to packed-RGB frames (top-down row-major):
    * demux, gate on biCompression 1 with an 8-bit palette, then run
    * every frame's opcode stream over a PERSISTENT canvas — encoded
    * runs and absolute spans write pixels; end-of-line, the
    * position-skip escape (00 02 dx dy) and end-of-frame leave skipped
    * pixels at their previous-frame values (palette index 0 before the
    * first frame), which is exactly the format's temporal-delta
    * semantics. Strict gates: run/skip past the row or frame bounds,
    * an index outside the palette, a frame without EOF, trailing bytes
    * after EOF, or a frame/pixel budget breach → None.
    */
  def decodeAviRle8(bytes: Array[Byte],
                    maxTotalPixels: Long = 1L << 26): Option[(Int, Int, IndexedSeq[Array[Int]])] =
    decodeAviStream(bytes) match {
      case Some(AviStream(meta, 1L, palette, frames))
          if palette != null && meta.width > 0 && meta.height > 0 =>
        try {
          val w = meta.width; val h = meta.height
          if (w.toLong * h > maxTotalPixels) fail()
          if (frames.length.toLong * w * h > maxTotalPixels) fail()
          val canvas = new Array[Int](w * h) // palette indices, top-down
          val out = IndexedSeq.newBuilder[Array[Int]]
          frames.foreach { data =>
            var pos = 0
            var x = 0; var yb = 0 // yb counts from the BOTTOM row
            def byteAt(i: Int): Int = {
              if (i >= data.length) fail()
              data(i) & 0xff
            }
            var done = false
            while (!done) {
              val b0 = byteAt(pos); val b1 = byteAt(pos + 1); pos += 2
              if (b0 > 0) { // encoded run
                if (b1 >= palette.length) fail()
                if (x + b0 > w || yb >= h) fail()
                val base = (h - 1 - yb) * w
                var k = 0
                while (k < b0) { canvas(base + x + k) = b1; k += 1 }
                x += b0
              } else b1 match {
                case 0 => x = 0; yb += 1; if (yb > h) fail() // EOL
                case 1 => done = true                        // EOF
                case 2 =>                                    // position skip
                  val dx = byteAt(pos); val dy = byteAt(pos + 1); pos += 2
                  x += dx; yb += dy
                  if (x > w || yb > h) fail()
                case n =>                                    // absolute span
                  if (x + n > w || yb >= h) fail()
                  val base = (h - 1 - yb) * w
                  var k = 0
                  while (k < n) {
                    val v = byteAt(pos + k)
                    if (v >= palette.length) fail()
                    canvas(base + x + k) = v
                    k += 1
                  }
                  pos += n + (n & 1) // absolute spans pad to word
                  x += n
              }
            }
            if (pos != data.length) fail() // trailing bytes after EOF
            out += canvas.map(i => palette(i))
          }
          Some((w, h, out.result()))
        } catch { case _: AErr | _: ArrayIndexOutOfBoundsException => None }
      case _ => None
    }
}
