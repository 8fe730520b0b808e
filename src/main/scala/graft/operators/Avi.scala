package graft.operators

import java.io.ByteArrayOutputStream

/** Library-free AVI (RIFF) container codec for MJPEG video — the video
  * side of the engine's real-decode family (WAV/BMP/PNG/JPEG/GIF), and
  * the piece that retires the frame-sample stand-in: an MJPEG AVI is a
  * RIFF chunk tree whose `movi` list carries one complete JPEG per
  * frame, so with [[Jpeg]] already a real codec, "video decode" is pure
  * byte walking — fourcc checks, little-endian u32 sizes, word-aligned
  * chunk padding, and the optional `rec ` grouping lists that
  * interleaved AVIs wrap frames in. No codec library is involved at
  * either end (the JDK ships neither an AVI muxer nor a demuxer), which
  * is exactly why this format is the honest scope boundary: video whose
  * frames need an inter-frame predictor (H.26x, VP9, AV1) stays behind
  * the documented stand-in, while the dominant "bag of JPEGs" container
  * used by cameras and capture rigs decodes for real.
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
      b.write(fourcc("vids")); b.write(fourcc("MJPG"))
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

  // ---------------------------------------------------------------- reader

  private final class AErr extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new AErr

  /** Demux an MJPEG AVI: stream metadata + every video frame's bytes in
    * stream order. `None` for malformed or non-MJPEG input. Frames come
    * from `00dc`/`00db` chunks of stream 0 inside `movi` (descending
    * into `rec ` grouping lists); empty placeholder chunks (size 0,
    * dropped-frame convention) are skipped. The declared frame count
    * must match the frames present — a container whose index lies about
    * its length is malformed, not partially decodable.
    */
  def decodeAvi(bytes: Array[Byte]): Option[(AviMeta, IndexedSeq[Array[Byte]])] = {
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
                scale = u32(body + 20).toInt
                rate = u32(body + 24).toInt
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
      Some((AviMeta(width, height, rate, scale, total), frames.toIndexedSeq))
    } catch { case _: AErr | _: ArrayIndexOutOfBoundsException => None }
  }
}
