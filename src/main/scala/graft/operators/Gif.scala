package graft.operators

import scala.util.control.NonFatal

/** L5h (SURVEY.md §2.9): REAL GIF87a/89a codec — the third "needs a
  * codec library" stand-in felled by the same argument as PNG and
  * JPEG: GIF's only compression is LZW, which is plain bit arithmetic
  * (variable-width codes packed LSB-first, a 4096-entry string table,
  * clear-code resets), and everything around it is fixed-layout byte
  * walking. Implemented library-free like [[Multimodal.decodePng]] /
  * [[Jpeg.decodeJpeg]] and hash-checked end to end by the declared
  * `l5_gif_stats` query; LlmOpsSpec additionally pins REAL-WORLD
  * interop both directions against the JDK's independent ImageIO GIF
  * codec (encoder bytes → ImageIO decode, ImageIO bytes → this
  * decoder), so the variable-width/clear-code rules are calibrated
  * against a second implementation, not just round-tripped against
  * themselves.
  *
  * Decoder scope (everything else returns None, never throws):
  *  - GIF87a and GIF89a signatures;
  *  - global and local color tables (local overrides global);
  *  - interlaced and non-interlaced frames;
  *  - extension blocks (GCE/comment/application/plain-text) parsed and
  *    skipped — for THIS entry point transparency and animation
  *    composition are out of scope: the FIRST image frame is decoded,
  *    and it must cover the full logical screen (left = top = 0, frame
  *    dims == screen dims), the thumbnailer contract. ANIMATED GIFs
  *    decode through [[decodeGifFrames]], which composites every frame
  *    onto the logical-screen canvas with full GCE semantics —
  *    transparency, per-frame rects, disposal 0–3 (leave /
  *    restore-to-background / restore-to-previous), local palettes —
  *    and is what [[Multimodal.gifFrameStats]] frame-samples;
  *  - dimension cap before allocation ([[MaxDecodePixels]], the
  *    [[Jpeg]] hostile-header posture — a 13-byte header can declare a
  *    4G-pixel screen).
  * Malformed streams — bad signature, truncated blocks, out-of-range
  * LZW codes, pixel over/underflow, palette-exceeding indices — gate
  * to None.
  *
  * Output contract matches the other image decoders: (width, height,
  * row-major top-down 0xRRGGBB). GIF is lossless over its palette, so
  * encode→decode round-trips are exact by construction — what lets the
  * declared query's oracle replay the palette formula directly.
  */
object Gif {

  private val MaxDecodePixels: Long = 1L << 26

  /** Row emission order of a 4-pass interlaced frame (spec §20):
    * every 8th row from 0, from 4, every 4th from 2, every 2nd from 1.
    */
  private[operators] def interlaceRows(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var n = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var r = start
      while (r < h) { out(n) = r; n += 1; r += step }
    }
    out
  }

  private final class GErr extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new GErr

  // ------------------------------------------------------------------
  // LZW (GIF variant): variable-width codes, LSB-first bit packing,
  // table codes 0..4095, CLEAR = 2^mcs, EOI = CLEAR+1. Width-growth
  // convention (the giflib/ImageIO-compatible one — the fencepost every
  // GIF implementation must agree on): the code written while the next
  // free slot EQUALS 2^width is still w bits wide; width w+1 starts
  // with the FOLLOWING code. Encoder: check next-free (pre-insert)
  // ≥ 2^width after each write. Decoder: its table lags the encoder's
  // by one entry (an entry completes only when the next code arrives),
  // so it checks next-free == 2^width after each insert — the two rules
  // land the boundary on the same code. LlmOpsSpec pins this alignment
  // BOTH directions against the JDK's independent ImageIO GIF codec,
  // not just against this file's own round-trip.
  // ------------------------------------------------------------------

  /** Compress palette indices; returns the raw LZW byte stream (not yet
    * chunked into sub-blocks).
    */
  private def lzwCompress(indices: Array[Int], mcs: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    val clear = 1 << mcs
    val eoi = clear + 1
    var next = eoi + 1
    var acc = 0L; var nbits = 0
    var width = mcs + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits; nbits += width
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
      // post-write, PRE-insert next-free check (see the section doc):
      // the code emitted while next == 2^width keeps the old width
      if (next >= (1 << width) && width < 12) width += 1
    }
    val dict = new java.util.HashMap[Long, Integer]
    put(clear)
    var prefix = -1
    var i = 0
    while (i < indices.length) {
      val sym = indices(i)
      if (prefix < 0) prefix = sym
      else {
        val key = (prefix.toLong << 12) | sym
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          put(prefix)
          if (next < 4096) {
            dict.put(key, next)
            next += 1
          } else {
            put(clear)
            dict.clear(); next = eoi + 1; width = mcs + 1
          }
          prefix = sym
        }
      }
      i += 1
    }
    if (prefix >= 0) put(prefix)
    put(eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** Decompress exactly `n` palette indices from the concatenated LZW
    * sub-block bytes; any structural defect (code beyond the table,
    * missing data, output overflow) → [[fail]].
    */
  private def lzwDecompress(data: Array[Byte], mcs: Int, n: Int): Array[Int] = {
    if (mcs < 2 || mcs > 8) fail()
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val stack = new Array[Int](4096)
    val out = new Array[Int](n)
    var outN = 0
    var width = mcs + 1
    var next = eoi + 1
    var acc = 0L; var nbits = 0; var pos = 0
    def read(): Int = {
      while (nbits < width) {
        if (pos >= data.length) fail()
        acc |= (data(pos) & 0xffL) << nbits
        nbits += 8; pos += 1
      }
      val c = (acc & ((1 << width) - 1)).toInt
      acc >>= width; nbits -= width
      c
    }
    def emitSeq(code: Int): Int = { // returns the sequence's first symbol
      var sp = 0
      var c = code
      while (c >= clear + 2) { // expand chain (root symbols are < clear)
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
        if (sp >= stack.length) fail()
      }
      val first = c
      if (outN + 1 + sp > n) fail() // frame overflow
      out(outN) = first; outN += 1
      while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
      first
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == clear) {
        next = eoi + 1; width = mcs + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        if (code >= clear) fail() // first code after clear must be a root
        emitSeq(code)
        prev = code
      } else {
        if (code > next || (code == next && next >= 4096)) fail()
        val first =
          if (code < next) emitSeq(code)
          else { // code == next: the KwKwK case
            var sp = 0
            var c = prev
            while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
            val f = c
            if (outN + 2 + sp > n) fail()
            out(outN) = f; outN += 1
            while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
            out(outN) = f; outN += 1
            f
          }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          // post-insert check (see the section doc): the decoder's table
          // lags the encoder's by one entry, so checking its own
          // next-free == 2^width here lands the width boundary on the
          // same code the encoder's pre-insert ≥ rule does
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
      if (outN > n) fail()
    }
    if (outN != n) fail()
    out
  }

  // ------------------------------------------------------------------
  // Encoder
  // ------------------------------------------------------------------

  /** Build a GIF from palette indices. `palette` is 0xRRGGBB entries
    * (2..256); the color table is padded to the next power of two ≥ 2
    * as the format requires. `version89` adds a Graphic Control
    * Extension (delay 0, no transparency) — the 89a-only block the
    * decoder must parse past.
    */
  def buildGif(indices: Array[Int], w: Int, h: Int, palette: Array[Int],
               interlaced: Boolean = false, version89: Boolean = true): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535, s"bad dimensions ${w}x$h")
    require(indices.length == w * h, s"expected ${w * h} indices, got ${indices.length}")
    require(palette.length >= 2 && palette.length <= 256,
      s"palette must have 2..256 entries, got ${palette.length}")
    require(indices.forall(i => i >= 0 && i < palette.length), "index out of palette")
    // color table size: 2^(bits) ≥ palette size; LZW min code size ≥ 2
    var bits = 1
    while ((1 << bits) < palette.length) bits += 1
    val mcs = math.max(2, bits)
    val out = new java.io.ByteArrayOutputStream
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write((if (version89) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0x80 | ((bits - 1) & 7)) // GCT present, size 2^bits
    out.write(0) // background color index
    out.write(0) // aspect
    for (j <- 0 until (1 << bits)) {
      val p = if (j < palette.length) palette(j) else 0
      out.write((p >> 16) & 0xff); out.write((p >> 8) & 0xff); out.write(p & 0xff)
    }
    if (version89) { // GCE: the extension block decoders must walk past
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); u16(0); out.write(0) // no disposal, delay 0, no transparency
      out.write(0)
    }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(if (interlaced) 0x40 else 0) // no LCT
    val rows = if (interlaced) interlaceRows(h) else Array.range(0, h)
    val ordered = new Array[Int](w * h)
    var k = 0
    for (r <- rows) { System.arraycopy(indices, r * w, ordered, k, w); k += w }
    out.write(mcs)
    val lzw = lzwCompress(ordered, mcs)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len)
      out.write(lzw, off, len)
      off += len
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  /** REAL GIF pixel decoder — see the object doc for scope. Output
    * (width, height, row-major top-down 0xRRGGBB), the
    * [[Multimodal.decodeBmp24]] contract.
    */
  def decodeGif(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    try {
      if (bytes.length < 13) return None
      val sig = new String(bytes, 0, 6, "US-ASCII")
      if (sig != "GIF87a" && sig != "GIF89a") return None
      def u16(i: Int): Int = {
        if (i + 1 >= bytes.length) fail()
        (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
      }
      val sw = u16(6); val sh = u16(8)
      if (sw == 0 || sh == 0) return None
      if (sw.toLong * sh > MaxDecodePixels) return None
      val packed = bytes(10) & 0xff
      var pos = 13
      def readColorTable(n: Int): Array[Int] = {
        if (pos + 3 * n > bytes.length) fail()
        val t = Array.tabulate(n) { j =>
          val b = pos + 3 * j
          ((bytes(b) & 0xff) << 16) | ((bytes(b + 1) & 0xff) << 8) | (bytes(b + 2) & 0xff)
        }
        pos += 3 * n
        t
      }
      val gct = if ((packed & 0x80) != 0) readColorTable(1 << ((packed & 7) + 1)) else null
      def skipSubBlocks(): Unit = {
        var len = if (pos < bytes.length) bytes(pos) & 0xff else fail()
        pos += 1
        while (len != 0) {
          pos += len
          if (pos >= bytes.length) fail()
          len = bytes(pos) & 0xff
          pos += 1
        }
      }
      while (true) {
        if (pos >= bytes.length) fail()
        val b = bytes(pos) & 0xff; pos += 1
        b match {
          case 0x3b => return None // trailer before any image frame
          case 0x21 => // extension: label + sub-blocks, parsed and skipped
            if (pos >= bytes.length) fail()
            pos += 1 // label
            skipSubBlocks()
          case 0x2c =>
            val left = u16(pos); val top = u16(pos + 2)
            val fw = u16(pos + 4); val fh = u16(pos + 6)
            val ip = bytes(pos + 8) & 0xff
            pos += 9
            // first-frame-covers-screen scope (object doc)
            if (left != 0 || top != 0 || fw != sw || fh != sh) return None
            val lct = if ((ip & 0x80) != 0) readColorTable(1 << ((ip & 7) + 1)) else null
            val table = if (lct != null) lct else gct
            if (table == null) return None // no color table at all
            val interlaced = (ip & 0x40) != 0
            if (pos >= bytes.length) fail()
            val mcs = bytes(pos) & 0xff; pos += 1
            val lzw = new java.io.ByteArrayOutputStream
            var len = if (pos < bytes.length) bytes(pos) & 0xff else fail()
            pos += 1
            while (len != 0) {
              if (pos + len > bytes.length) fail()
              lzw.write(bytes, pos, len)
              pos += len
              if (pos >= bytes.length) fail()
              len = bytes(pos) & 0xff
              pos += 1
            }
            val idx = lzwDecompress(lzw.toByteArray, mcs, fw * fh)
            val out = new Array[Int](fw * fh)
            val rows = if (interlaced) interlaceRows(fh) else Array.range(0, fh)
            var k = 0
            for (r <- rows) {
              var x = 0
              while (x < fw) {
                val i = idx(k); k += 1
                if (i >= table.length) fail()
                out(r * fw + x) = table(i)
                x += 1
              }
            }
            return Some((fw, fh, out))
          case _ => fail()
        }
      }
      None // unreachable
    } catch { case NonFatal(_) => None }
  }

  // ------------------------------------------------------------------
  // Animation: multi-frame encode + composited decode
  // ------------------------------------------------------------------

  /** One frame of an animated GIF as the encoder takes it: palette
    * `indices` for a `w`×`h` rect at (`left`, `top`) on the logical
    * screen, GCE fields (disposal 0–3, delay in centiseconds,
    * `transparentIndex` ≥ 0 marks that palette index as transparent),
    * optional local palette overriding the global one.
    */
  final case class GifFrame(indices: Array[Int], left: Int, top: Int,
                            w: Int, h: Int, delayCs: Int = 0, disposal: Int = 0,
                            localPalette: Option[Array[Int]] = None,
                            transparentIndex: Int = -1, interlaced: Boolean = false)

  /** Build an ANIMATED GIF89a: global palette, NETSCAPE2.0 loop
    * extension (the de-facto-standard application block animation
    * needs), then per frame a Graphic Control Extension (disposal /
    * delay / transparency) + image descriptor (+ optional local color
    * table) + LZW data. Single-frame output degenerates to a plain
    * 89a file [[decodeGif]] reads.
    */
  def buildAnimatedGif(sw: Int, sh: Int, palette: Array[Int],
                       frames: Seq[GifFrame], loop: Boolean = true): Array[Byte] = {
    require(sw > 0 && sh > 0 && sw <= 65535 && sh <= 65535, s"bad screen ${sw}x$sh")
    require(frames.nonEmpty, "animated GIF needs at least one frame")
    require(palette.length >= 2 && palette.length <= 256,
      s"palette must have 2..256 entries, got ${palette.length}")
    var bits = 1
    while ((1 << bits) < palette.length) bits += 1
    val out = new java.io.ByteArrayOutputStream
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def colorTable(p: Array[Int], b: Int): Unit =
      for (j <- 0 until (1 << b)) {
        val c = if (j < p.length) p(j) else 0
        out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
      }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(sw); u16(sh)
    out.write(0x80 | ((bits - 1) & 7))
    out.write(0); out.write(0) // background index, aspect
    colorTable(palette, bits)
    if (loop) { // NETSCAPE2.0 application extension: loop forever
      out.write(0x21); out.write(0xff); out.write(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      out.write(3); out.write(1); u16(0); out.write(0)
    }
    frames.foreach { f =>
      require(f.w > 0 && f.h > 0 && f.left >= 0 && f.top >= 0 &&
        f.left + f.w <= sw && f.top + f.h <= sh,
        s"frame rect ${f.w}x${f.h}@(${f.left},${f.top}) outside ${sw}x$sh")
      require(f.indices.length == f.w * f.h,
        s"expected ${f.w * f.h} indices, got ${f.indices.length}")
      require(f.disposal >= 0 && f.disposal <= 3, s"bad disposal ${f.disposal}")
      val pal = f.localPalette.getOrElse(palette)
      require(f.transparentIndex < pal.length,
        s"transparent index ${f.transparentIndex} outside palette of ${pal.length}")
      require(f.indices.forall(i => i >= 0 && i < pal.length), "index out of palette")
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write((f.disposal << 2) | (if (f.transparentIndex >= 0) 1 else 0))
      u16(f.delayCs)
      out.write(if (f.transparentIndex >= 0) f.transparentIndex else 0)
      out.write(0)
      out.write(0x2c)
      u16(f.left); u16(f.top); u16(f.w); u16(f.h)
      val lctBits = f.localPalette.map { lp =>
        require(lp.length >= 2 && lp.length <= 256, "bad local palette")
        var b = 1; while ((1 << b) < lp.length) b += 1; b
      }
      out.write((if (f.interlaced) 0x40 else 0) |
        lctBits.map(b => 0x80 | ((b - 1) & 7)).getOrElse(0))
      lctBits.foreach(b => colorTable(f.localPalette.get, b))
      val rows = if (f.interlaced) interlaceRows(f.h) else Array.range(0, f.h)
      val ordered = new Array[Int](f.w * f.h)
      var k = 0
      for (r <- rows) { System.arraycopy(f.indices, r * f.w, ordered, k, f.w); k += f.w }
      val mcs = math.max(2, lctBits.getOrElse(bits))
      out.write(mcs)
      val lzw = lzwCompress(ordered, mcs)
      var off = 0
      while (off < lzw.length) {
        val len = math.min(255, lzw.length - off)
        out.write(len); out.write(lzw, off, len)
        off += len
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  private val MaxDecodeFrames = 4096

  /** Total-retention cap for [[decodeGifFrames]]: the per-frame
    * dimension cap bounds ONE canvas, but composited decode retains a
    * canvas clone per frame, so a few-KB file declaring a large screen
    * with many one-pixel frames would otherwise retain
    * frames × screen × 4 bytes — an OutOfMemoryError is an Error that
    * escapes the NonFatal catch and breaks the None-never-throw
    * contract. Checked BEFORE each frame's snapshot ([[Jpeg]]'s
    * cap-before-allocation posture); ~256 MB of int canvases.
    */
  val MaxDecodeTotalPixels: Long = 1L << 26

  /** REAL animated-GIF decoder — COMPOSITED frames, the semantics a
    * viewer shows (and a frame-sampling curation stage wants), not the
    * raw per-frame rects: a logical-screen canvas starts as the
    * background color (GCT[bg] — or black without a GCT), each frame
    * draws its rect (transparent pixels leave the canvas through), the
    * canvas is snapshotted as that frame's output, and the frame's
    * DISPOSAL then runs — 0/1 leave, 2 restores the rect to background,
    * 3 restores the canvas the frame drew over. Returns (screen w,
    * screen h, one full-canvas 0xRRGGBB image per frame, per-frame
    * delay cs). Scope gates (None, never a throw): frames must fit the
    * screen, ≤ [[MaxDecodeFrames]] frames, dimension cap before
    * allocation, the [[decodeGif]] malformed-stream gates. The
    * single-frame [[decodeGif]] keeps its stricter thumbnailer
    * contract untouched.
    */
  def decodeGifFrames(bytes: Array[Byte]): Option[(Int, Int, IndexedSeq[Array[Int]], IndexedSeq[Int])] =
    decodeGifFrames(bytes, MaxDecodeTotalPixels)

  /** Cap-parameterized form so the retention gate is testable without
    * allocating hundreds of MB; production callers use the default.
    */
  private[graft] def decodeGifFrames(bytes: Array[Byte], maxTotalPixels: Long): Option[(Int, Int, IndexedSeq[Array[Int]], IndexedSeq[Int])] = {
    try {
      if (bytes.length < 13) return None
      val sig = new String(bytes, 0, 6, "US-ASCII")
      if (sig != "GIF87a" && sig != "GIF89a") return None
      def u16(i: Int): Int = {
        if (i + 1 >= bytes.length) fail()
        (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
      }
      val sw = u16(6); val sh = u16(8)
      if (sw == 0 || sh == 0) return None
      if (sw.toLong * sh > MaxDecodePixels) return None
      val packed = bytes(10) & 0xff
      val bgIndex = bytes(11) & 0xff
      var pos = 13
      def readColorTable(n: Int): Array[Int] = {
        if (pos + 3 * n > bytes.length) fail()
        val t = Array.tabulate(n) { j =>
          val b = pos + 3 * j
          ((bytes(b) & 0xff) << 16) | ((bytes(b + 1) & 0xff) << 8) | (bytes(b + 2) & 0xff)
        }
        pos += 3 * n
        t
      }
      val gct = if ((packed & 0x80) != 0) readColorTable(1 << ((packed & 7) + 1)) else null
      val bg = if (gct != null && bgIndex < gct.length) gct(bgIndex) else 0
      val canvas = Array.fill(sw * sh)(bg)
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      val delays = scala.collection.mutable.ArrayBuffer.empty[Int]
      // pending GCE state, consumed by the next image descriptor
      var disposal = 0; var delayCs = 0; var transparent = -1
      while (true) {
        if (pos >= bytes.length) fail()
        val b = bytes(pos) & 0xff; pos += 1
        b match {
          case 0x3b =>
            return if (frames.isEmpty) None
            else Some((sw, sh, frames.toIndexedSeq, delays.toIndexedSeq))
          case 0x21 =>
            if (pos >= bytes.length) fail()
            val label = bytes(pos) & 0xff; pos += 1
            if (label == 0xf9) { // Graphic Control Extension
              if (pos + 6 > bytes.length) fail()
              if ((bytes(pos) & 0xff) != 4) fail()
              val flags = bytes(pos + 1) & 0xff
              disposal = (flags >> 2) & 7
              if (disposal > 3) fail() // 4..7 are reserved
              delayCs = (bytes(pos + 2) & 0xff) | ((bytes(pos + 3) & 0xff) << 8)
              transparent = if ((flags & 1) != 0) bytes(pos + 4) & 0xff else -1
              pos += 5
              if ((bytes(pos) & 0xff) != 0) fail()
              pos += 1
            } else { // other extensions: skip sub-blocks
              var len = if (pos < bytes.length) bytes(pos) & 0xff else fail()
              pos += 1
              while (len != 0) {
                pos += len
                if (pos >= bytes.length) fail()
                len = bytes(pos) & 0xff
                pos += 1
              }
            }
          case 0x2c =>
            if (frames.length >= MaxDecodeFrames) fail()
            // retention gate BEFORE this frame's canvas snapshot: the
            // frames already kept, +1 for this frame's clone, and +1
            // more only when disposal-3 actually snapshots the canvas.
            // A single-frame GIF therefore gets the same per-screen
            // budget as the still path (MaxDecodePixels == this cap).
            val willRetain =
              frames.length + 1L + (if (disposal == 3) 1L else 0L)
            if (willRetain * sw * sh > maxTotalPixels) fail()
            val left = u16(pos); val top = u16(pos + 2)
            val fw = u16(pos + 4); val fh = u16(pos + 6)
            val ip = bytes(pos + 8) & 0xff
            pos += 9
            if (fw == 0 || fh == 0 || left + fw > sw || top + fh > sh) fail()
            val lct = if ((ip & 0x80) != 0) readColorTable(1 << ((ip & 7) + 1)) else null
            val table = if (lct != null) lct else gct
            if (table == null) fail()
            val interlaced = (ip & 0x40) != 0
            if (pos >= bytes.length) fail()
            val mcs = bytes(pos) & 0xff; pos += 1
            val lzw = new java.io.ByteArrayOutputStream
            var len = if (pos < bytes.length) bytes(pos) & 0xff else fail()
            pos += 1
            while (len != 0) {
              if (pos + len > bytes.length) fail()
              lzw.write(bytes, pos, len)
              pos += len
              if (pos >= bytes.length) fail()
              len = bytes(pos) & 0xff
              pos += 1
            }
            val idx = lzwDecompress(lzw.toByteArray, mcs, fw * fh)
            val saved = if (disposal == 3) canvas.clone() else null
            val rows = if (interlaced) interlaceRows(fh) else Array.range(0, fh)
            var k = 0
            for (r <- rows) {
              var x = 0
              while (x < fw) {
                val i = idx(k); k += 1
                if (i != transparent) {
                  if (i >= table.length) fail()
                  canvas((top + r) * sw + (left + x)) = table(i)
                }
                x += 1
              }
            }
            frames += canvas.clone()
            delays += delayCs
            disposal match {
              case 2 =>
                for (r <- 0 until fh; x <- 0 until fw)
                  canvas((top + r) * sw + (left + x)) = bg
              case 3 => System.arraycopy(saved, 0, canvas, 0, canvas.length)
              case _ => ()
            }
            disposal = 0; delayCs = 0; transparent = -1
          case _ => fail()
        }
      }
      None // unreachable
    } catch { case NonFatal(_) => None }
  }
}
