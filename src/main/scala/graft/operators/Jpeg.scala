package graft.operators

import scala.util.control.NonFatal

/** L5e (SURVEY.md §2.9): REAL baseline JPEG codec — the format the L5
  * row previously stubbed ("entropy-coded DCT genuinely needs a codec
  * library"). It does not: every stage of baseline sequential JPEG
  * (ITU T.81) is plain arithmetic — canonical Huffman coding over the
  * Annex K table spec, zigzag run-length coding, dequantization, and a
  * separable 8×8 DCT — so, like the WAV/BMP/PNG codecs in
  * [[Multimodal]], it is implemented library-free and hash-checked end
  * to end by a declared query.
  *
  * Decoder scope (everything else returns None, never throws):
  * baseline/extended-sequential Huffman scans (SOF0/SOF1), 8-bit
  * precision, 1-component grayscale or 3-component YCbCr with any
  * sampling factors in 1..4 (4:4:4, 4:2:0, 4:2:2, … — chroma is
  * upsampled by sample replication), single interleaved scan, restart
  * intervals (DRI/RSTn), 0xFF00 byte stuffing. Progressive (SOF2),
  * arithmetic coding (SOF9+), 12-bit, hierarchical, and multi-scan
  * streams are gated to None — honest scope, loudly documented.
  *
  * Color convention (shared with the declared query's oracle): the
  * YCbCr→RGB step is FIXED-POINT — 16-bit scaled BT.601 coefficients,
  * floor shift over a biased non-negative intermediate — so the decoded
  * RGB is a pure integer formula of (Y, Cb, Cr) that a SQL oracle
  * replays exactly:
  *   R = clamp((Y·65536 + 91881·(Cr−128) + 32768 + 2²⁴ >> 16) − 256)
  *   G = clamp((Y·65536 − 22554·(Cb−128) − 46802·(Cr−128) + 32768 + 2²⁴ >> 16) − 256)
  *   B = clamp((Y·65536 + 116130·(Cb−128) + 32768 + 2²⁴ >> 16) − 256)
  * (the +2²⁴ bias keeps the shifted value non-negative, so an
  * arithmetic shift, a floor division, and a truncating division all
  * agree — the oracle's `//` needs no negative-division caveats).
  *
  * Exactness contract the declared query rides on: a block whose
  * samples are constant c has DC = 8·(c−128) and all-zero AC after the
  * forward DCT; with DC quantum 8 the quantized DC is exactly c−128,
  * and the inverse path reproduces c bit-for-bit (the separable DCT's
  * rounding error is ~1e-13, far below the 0.5 rounding threshold).
  * So block-constant images round-trip EXACTLY through the full
  * encoder/decoder — Huffman, stuffing, restarts included — while the
  * oracle replays the per-block formula (LlmOpsSpec pins the exact
  * round-trip for gray, 4:4:4 and 4:2:0, and a near-identity bound for
  * arbitrary images under all-ones quantization).
  */
object Jpeg {

  /** Zigzag scan: zigzag position → natural (row-major v·8+u) index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Quant table (zigzag order) for the declared synth corpus: DC
    * quantum 8 (so constant blocks round-trip exactly, see object doc),
    * AC quantum 16 (all-zero for constant blocks anyway).
    */
  val SynthQ: Array[Int] = { val a = Array.fill(64)(16); a(0) = 8; a }

  /** All-ones table: near-lossless, exercises every AC Huffman path. */
  val FlatQ: Array[Int] = Array.fill(64)(1)

  // Annex K (ITU T.81 §K.3.3) Huffman table specs: counts(l) = number of
  // codes of length l+1 (l in 0..15), then symbols in code order.
  private val DcLumaCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcChromaCounts = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcValues = (0 to 11).toArray
  private val AcLumaCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcLumaValues = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromaCounts = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcChromaValues = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical-code encoder table: symbol → (code, length). */
  private final class HuffEnc(counts: Array[Int], symbols: Array[Int]) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < counts(l - 1)) {
          val s = symbols(k); codeOf(s) = code; lenOf(s) = l
          code += 1; k += 1; i += 1
        }
        code <<= 1; l += 1
      }
    }
  }

  private val EncDcLuma = new HuffEnc(DcLumaCounts, DcValues)
  private val EncDcChroma = new HuffEnc(DcChromaCounts, DcValues)
  private val EncAcLuma = new HuffEnc(AcLumaCounts, AcLumaValues)
  private val EncAcChroma = new HuffEnc(AcChromaCounts, AcChromaValues)

  /** Canonical decode table (T.81 F.2.2.3 mincode/maxcode/valptr). */
  private final class HuffDec(counts: Array[Int], val symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k; minCode(l) = code
        code += counts(l - 1); k += counts(l - 1)
        maxCode(l) = code - 1 // < minCode when the length is empty
        code <<= 1; l += 1
      }
    }
  }

  /** Separable DCT basis M(u)(x) = 0.5·c(u)·cos((2x+1)uπ/16). */
  private val M: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Forward DCT of a level-shifted 8×8 block (row-major y·8+x) into
    * natural-order coefficients S(v·8+u) — two passes over [[M]].
    */
  private def fdct(block: Array[Double]): Array[Double] = {
    val t = new Array[Double](64) // t(y·8+u) = Σ_x M(u,x)·f(y,x)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += M(u)(x) * block(y * 8 + x); x += 1 }
        t(y * 8 + u) = s; u += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var yy = 0
        while (yy < 8) { s += M(v)(yy) * t(yy * 8 + u); yy += 1 }
        out(v * 8 + u) = s; u += 1
      }
      v += 1
    }
    out
  }

  /** Inverse DCT of natural-order coefficients to samples (+128,
    * rounded, clamped to 0..255).
    */
  private def idct(coef: Array[Int]): Array[Int] = {
    val t = new Array[Double](64) // t(v·8+x) = Σ_u M(u,x)·S(v,u)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += M(u)(x) * coef(v * 8 + u); u += 1 }
        t(v * 8 + x) = s; x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) { s += M(vv)(y) * t(vv * 8 + x); vv += 1 }
        val p = Math.round(s + 128.0).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
    out
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** The shared fixed-point YCbCr→RGB step (see object doc) — public so
    * specs and synth oracles derive expected RGB from the same formula.
    */
  def yccToRgb(y: Int, cb: Int, cr: Int): Int = {
    val bias = 256 << 16
    val r = clamp255(((y * 65536 + 91881 * (cr - 128) + 32768 + bias) >> 16) - 256)
    val g = clamp255(((y * 65536 - 22554 * (cb - 128) - 46802 * (cr - 128) + 32768 + bias) >> 16) - 256)
    val b = clamp255(((y * 65536 + 116130 * (cb - 128) + 32768 + bias) >> 16) - 256)
    (r << 16) | (g << 8) | b
  }

  /** Fixed-point BT.601 RGB→YCbCr (encoder side; integer weights sum to
    * 65536 so Y stays in range without clamping — clamped anyway).
    */
  def rgbToYcc(rgb: Int): (Int, Int, Int) = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    val y = clamp255((19595 * r + 38470 * g + 7471 * b + 32768) >> 16)
    val bias = 256 << 16
    val cb = clamp255((((-11059 * r - 21709 * g + 32768 * b + 32768 + bias) >> 16) - 256) + 128)
    val cr = clamp255((((32768 * r - 27439 * g - 5329 * b + 32768 + bias) >> 16) - 256) + 128)
    (y, cb, cr)
  }

  // ------------------------------------------------------------------
  // Encoder
  // ------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { putBit((code >> i) & 1); i -= 1 }
    }
    private def putBit(b: Int): Unit = {
      buf = (buf << 1) | b; cnt += 1
      if (cnt == 8) {
        out.write(buf)
        if (buf == 0xff) out.write(0) // byte stuffing (T.81 §B.1.1.5)
        buf = 0; cnt = 0
      }
    }
    /** Pad to a byte boundary with 1-bits (T.81 §B.2.5 convention). */
    def flush(): Unit = while (cnt != 0) putBit(1)
  }

  private def bitCategory(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** One encoder component: a sample plane already padded to the MCU
    * grid, with its sampling factors and table selectors.
    */
  private final case class CompIn(plane: Array[Int], planeW: Int,
                                  hi: Int, vi: Int, qSel: Int, luma: Boolean)

  /** Edge-replicate `src` (sw×sh, row-major) to tw×th. */
  private def padPlane(src: Array[Int], sw: Int, sh: Int, tw: Int, th: Int): Array[Int] = {
    val out = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val sy = if (y < sh) y else sh - 1
      var x = 0
      while (x < tw) {
        out(y * tw + x) = src(sy * sw + (if (x < sw) x else sw - 1))
        x += 1
      }
      y += 1
    }
    out
  }

  private def encodeBlock(bw: BitWriter, plane: Array[Int], planeW: Int,
                          x0: Int, y0: Int, qt: Array[Int],
                          dcT: HuffEnc, acT: HuffEnc, pred: Int): Int = {
    val block = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        block(y * 8 + x) = plane((y0 + y) * planeW + x0 + x) - 128.0
        x += 1
      }
      y += 1
    }
    val s = fdct(block)
    val q = new Array[Int](64) // zigzag order
    var k = 0
    while (k < 64) { q(k) = Math.round(s(Zigzag(k)) / qt(k)).toInt; k += 1 }
    // DC
    val diff = q(0) - pred
    val ds = bitCategory(diff)
    bw.put(dcT.codeOf(ds), dcT.lenOf(ds))
    if (ds > 0) bw.put(if (diff < 0) diff + (1 << ds) - 1 else diff, ds)
    // AC run-length
    var run = 0
    k = 1
    while (k < 64) {
      if (q(k) == 0) run += 1
      else {
        while (run > 15) { bw.put(acT.codeOf(0xf0), acT.lenOf(0xf0)); run -= 16 }
        val as = bitCategory(q(k))
        val rs = (run << 4) | as
        bw.put(acT.codeOf(rs), acT.lenOf(rs))
        bw.put(if (q(k) < 0) q(k) + (1 << as) - 1 else q(k), as)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(acT.codeOf(0x00), acT.lenOf(0x00)) // EOB
    q(0)
  }

  /** Shared encoder core: interleaved baseline scan over the given
    * components (already MCU-padded), Annex K Huffman tables, optional
    * restart interval. Emits a structurally standard JFIF-less stream:
    * SOI, DQT(s), SOF0, DHT(s), [DRI], SOS, entropy data, EOI.
    */
  private def encodeInternal(w: Int, h: Int, comps: Array[CompIn],
                             qts: Array[Array[Int]], restartInterval: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535, s"bad dimensions ${w}x$h")
    require(restartInterval >= 0 && restartInterval <= 65535, s"bad DRI $restartInterval")
    qts.foreach(q => require(q.length == 64 && q.forall(v => v >= 1 && v <= 255),
      "quant entries must be 1..255 (8-bit DQT)"))
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m); val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff); body.foreach(out.write)
    }
    marker(0xd8) // SOI
    qts.zipWithIndex.foreach { case (q, i) => seg(0xdb, Array(i) ++ q) }
    val sof = Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, comps.length) ++
      comps.zipWithIndex.flatMap { case (c, i) => Array(i + 1, (c.hi << 4) | c.vi, c.qSel) }
    seg(0xc0, sof)
    val useChroma = comps.exists(!_.luma)
    def dhtBody(cls: Int, id: Int, counts: Array[Int], vals: Array[Int]) =
      Array((cls << 4) | id) ++ counts ++ vals
    seg(0xc4, dhtBody(0, 0, DcLumaCounts, DcValues) ++ dhtBody(1, 0, AcLumaCounts, AcLumaValues) ++
      (if (useChroma) dhtBody(0, 1, DcChromaCounts, DcValues) ++ dhtBody(1, 1, AcChromaCounts, AcChromaValues)
       else Array.empty[Int]))
    if (restartInterval > 0) seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    seg(0xda, Array(comps.length) ++
      comps.zipWithIndex.flatMap { case (c, i) =>
        val t = if (c.luma) 0 else 1; Array(i + 1, (t << 4) | t)
      } ++ Array(0, 63, 0)) // Ss, Se, AhAl
    val maxH = comps.map(_.hi).max
    val maxV = comps.map(_.vi).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    val bw = new BitWriter(out)
    val preds = new Array[Int](comps.length)
    var rst = 0
    var sinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          bw.flush(); marker(0xd0 + rst); rst = (rst + 1) & 7
          java.util.Arrays.fill(preds, 0); sinceRestart = 0
        }
        var c = 0
        while (c < comps.length) {
          val ci = comps(c)
          val (dcT, acT) = if (ci.luma) (EncDcLuma, EncAcLuma) else (EncDcChroma, EncAcChroma)
          var by = 0
          while (by < ci.vi) {
            var bx = 0
            while (bx < ci.hi) {
              preds(c) = encodeBlock(bw, ci.plane, ci.planeW,
                (mx * ci.hi + bx) * 8, (my * ci.vi + by) * 8,
                qts(ci.qSel), dcT, acT, preds(c))
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        sinceRestart += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Grayscale baseline JPEG from a w×h luma plane (values 0..255). */
  def buildJpegGray(yPlane: Array[Int], w: Int, h: Int,
                    qLuma: Array[Int] = SynthQ, restartInterval: Int = 0): Array[Byte] = {
    require(yPlane.length == w * h, s"expected ${w * h} samples, got ${yPlane.length}")
    val pw = (w + 7) / 8 * 8; val ph = (h + 7) / 8 * 8
    encodeInternal(w, h, Array(CompIn(padPlane(yPlane, w, h, pw, ph), pw, 1, 1, 0, luma = true)),
      Array(qLuma), restartInterval)
  }

  /** 4:4:4 color baseline JPEG from full-resolution Y/Cb/Cr planes. */
  def buildJpeg444(y: Array[Int], cb: Array[Int], cr: Array[Int], w: Int, h: Int,
                   qLuma: Array[Int] = SynthQ, qChroma: Array[Int] = SynthQ,
                   restartInterval: Int = 0): Array[Byte] = {
    require(y.length == w * h && cb.length == w * h && cr.length == w * h,
      s"expected ${w * h} samples per plane")
    val pw = (w + 7) / 8 * 8; val ph = (h + 7) / 8 * 8
    encodeInternal(w, h, Array(
      CompIn(padPlane(y, w, h, pw, ph), pw, 1, 1, 0, luma = true),
      CompIn(padPlane(cb, w, h, pw, ph), pw, 1, 1, 1, luma = false),
      CompIn(padPlane(cr, w, h, pw, ph), pw, 1, 1, 1, luma = false)),
      Array(qLuma, qChroma), restartInterval)
  }

  /** 4:2:0 color baseline JPEG: full-resolution luma + half-resolution
    * (⌈w/2⌉×⌈h/2⌉) chroma planes — the subsampling every camera JPEG
    * uses. The decoder reconstructs chroma by replication, so images
    * whose chroma is constant per 2×2 round-trip exactly.
    */
  def buildJpeg420(y: Array[Int], cbHalf: Array[Int], crHalf: Array[Int], w: Int, h: Int,
                   qLuma: Array[Int] = SynthQ, qChroma: Array[Int] = SynthQ,
                   restartInterval: Int = 0): Array[Byte] = {
    val hw = (w + 1) / 2; val hh = (h + 1) / 2
    require(y.length == w * h, s"expected ${w * h} luma samples, got ${y.length}")
    require(cbHalf.length == hw * hh && crHalf.length == hw * hh,
      s"expected ${hw * hh} chroma samples per half plane")
    val pw = (w + 15) / 16 * 16; val ph = (h + 15) / 16 * 16
    encodeInternal(w, h, Array(
      CompIn(padPlane(y, w, h, pw, ph), pw, 2, 2, 0, luma = true),
      CompIn(padPlane(cbHalf, hw, hh, pw / 2, ph / 2), pw / 2, 1, 1, 1, luma = false),
      CompIn(padPlane(crHalf, hw, hh, pw / 2, ph / 2), pw / 2, 1, 1, 1, luma = false)),
      Array(qLuma, qChroma), restartInterval)
  }

  /** Convenience: 4:4:4 JPEG from packed 0xRRGGBB pixels (fixed-point
    * BT.601 forward conversion).
    */
  def buildJpegRgb(pixels: Array[Int], w: Int, h: Int,
                   qLuma: Array[Int] = SynthQ, qChroma: Array[Int] = SynthQ,
                   restartInterval: Int = 0): Array[Byte] = {
    require(pixels.length == w * h, s"expected ${w * h} pixels, got ${pixels.length}")
    val y = new Array[Int](w * h); val cb = new Array[Int](w * h); val cr = new Array[Int](w * h)
    var i = 0
    while (i < pixels.length) {
      val (yy, cbb, crr) = rgbToYcc(pixels(i))
      y(i) = yy; cb(i) = cbb; cr(i) = crr; i += 1
    }
    buildJpeg444(y, cb, cr, w, h, qLuma, qChroma, restartInterval)
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  private final class JErr extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new JErr

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var cnt = 0
    private var cur = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) fail()
        cur = data(pos) & 0xff; pos += 1
        if (cur == 0xff) {
          if (pos >= data.length || data(pos) != 0) fail() // marker mid-entropy
          pos += 1 // stuffed zero
        }
        cnt = 8
      }
      cnt -= 1
      (cur >> cnt) & 1
    }
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def align(): Unit = cnt = 0
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def huffDecode(br: BitReader, t: HuffDec): Int = {
    var code = br.nextBit()
    var l = 1
    while (code > t.maxCode(l)) {
      l += 1
      if (l > 16) fail()
      code = (code << 1) | br.nextBit()
    }
    val idx = t.valPtr(l) + code - t.minCode(l)
    if (idx < 0 || idx >= t.symbols.length) fail()
    t.symbols(idx)
  }

  private final case class CompOut(hi: Int, vi: Int, qSel: Int,
                                   var dcSel: Int = -1, var acSel: Int = -1,
                                   var plane: Array[Int] = null, var planeW: Int = 0)

  /** Decode one entropy-coded block into `coef` (natural order,
    * dequantized); returns the new DC predictor.
    */
  private def decodeBlock(br: BitReader, dcT: HuffDec, acT: HuffDec,
                          qt: Array[Int], pred: Int, coef: Array[Int]): Int = {
    java.util.Arrays.fill(coef, 0)
    val ds = huffDecode(br, dcT)
    if (ds > 11) fail()
    val dc = pred + extend(br.receive(ds), ds)
    coef(0) = dc * qt(0)
    var k = 1
    while (k < 64) {
      val rs = huffDecode(br, acT)
      val r = rs >> 4; val s = rs & 15
      if (s == 0) {
        if (r == 15) k += 16 // ZRL
        else k = 64 // EOB
      } else {
        k += r
        if (k > 63 || s > 10) fail()
        coef(Zigzag(k)) = extend(br.receive(s), s) * qt(k)
        k += 1
      }
    }
    dc
  }

  /** REAL baseline JPEG pixel decoder — see the object doc for scope
    * and the None-not-throw gates. Output contract matches
    * [[Multimodal.decodeBmp24]]/[[Multimodal.decodePng]]:
    * (width, height, row-major top-down 0xRRGGBB).
    */
  def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    try {
      if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
      var pos = 2
      val qts = new Array[Array[Int]](4)
      val dcTabs = new Array[HuffDec](4)
      val acTabs = new Array[HuffDec](4)
      var comps: Array[CompOut] = null
      var w = 0; var h = 0
      var restartInterval = 0
      var scanned = false
      var result: Array[Int] = null

      def u16(i: Int): Int = {
        if (i + 1 >= bytes.length) fail()
        ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
      }

      var done = false
      while (!done) {
        // marker scan: skip fill bytes (T.81 allows repeated 0xFF)
        if (pos >= bytes.length) fail()
        if ((bytes(pos) & 0xff) != 0xff) fail()
        while (pos < bytes.length && (bytes(pos) & 0xff) == 0xff) pos += 1
        if (pos >= bytes.length) fail()
        val m = bytes(pos) & 0xff; pos += 1
        m match {
          case 0xd9 => done = true // EOI
          case 0xdb => // DQT
            val len = u16(pos); val end = pos + len
            if (end > bytes.length) fail()
            pos += 2
            while (pos < end) {
              val pq = (bytes(pos) & 0xff) >> 4
              val tq = bytes(pos) & 0x0f
              if (pq > 1 || tq > 3) fail()
              pos += 1
              val q = new Array[Int](64)
              var i = 0
              while (i < 64) {
                if (pq == 0) { q(i) = bytes(pos) & 0xff; pos += 1 }
                else { q(i) = u16(pos); pos += 2 }
                if (q(i) == 0) fail()
                i += 1
              }
              if (pos > end) fail()
              qts(tq) = q
            }
          case 0xc4 => // DHT
            val len = u16(pos); val end = pos + len
            if (end > bytes.length) fail()
            pos += 2
            while (pos < end) {
              val cls = (bytes(pos) & 0xff) >> 4
              val id = bytes(pos) & 0x0f
              if (cls > 1 || id > 3) fail()
              pos += 1
              if (pos + 16 > end) fail()
              val counts = Array.tabulate(16)(i => bytes(pos + i) & 0xff)
              pos += 16
              val n = counts.sum
              if (n > 256 || pos + n > end) fail()
              val syms = Array.tabulate(n)(i => bytes(pos + i) & 0xff)
              pos += n
              val t = new HuffDec(counts, syms)
              if (cls == 0) dcTabs(id) = t else acTabs(id) = t
            }
          case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
            if (comps != null) fail()
            val len = u16(pos)
            if (pos + len > bytes.length) fail()
            val p = pos + 2
            if ((bytes(p) & 0xff) != 8) return None // 12-bit → unsupported
            h = u16(p + 1); w = u16(p + 3)
            val nc = bytes(p + 5) & 0xff
            if (w == 0 || h == 0 || (nc != 1 && nc != 3)) return None
            if (w.toLong * h > Int.MaxValue / 4) return None
            if (len != 8 + 3 * nc) fail()
            comps = Array.tabulate(nc) { i =>
              val b = p + 6 + 3 * i
              val hv = bytes(b + 1) & 0xff
              val hi = hv >> 4; val vi = hv & 15
              val tq = bytes(b + 2) & 0xff
              if (hi < 1 || hi > 4 || vi < 1 || vi > 4 || tq > 3) fail()
              CompOut(hi, vi, tq)
            }
            pos += len
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // progressive / lossless / arithmetic / hierarchical
          case 0xdd => // DRI
            if (u16(pos) != 4) fail()
            restartInterval = u16(pos + 2)
            pos += 4
          case 0xda => // SOS
            if (comps == null || scanned) fail()
            val len = u16(pos)
            if (pos + len > bytes.length) fail()
            val p = pos + 2
            val ns = bytes(p) & 0xff
            // single interleaved scan over every frame component only
            if (ns != comps.length || len != 6 + 2 * ns) fail()
            var i = 0
            while (i < ns) {
              val sel = bytes(p + 1 + 2 * i + 1) & 0xff
              comps(i).dcSel = sel >> 4
              comps(i).acSel = sel & 15
              if (comps(i).dcSel > 3 || comps(i).acSel > 3) fail()
              i += 1
            }
            // baseline spectral selection / successive approximation
            if ((bytes(p + 1 + 2 * ns) & 0xff) != 0 ||
                (bytes(p + 2 + 2 * ns) & 0xff) != 63 ||
                (bytes(p + 3 + 2 * ns) & 0xff) != 0) return None
            pos += len
            // --- entropy-coded scan ---
            val maxH = comps.map(_.hi).max
            val maxV = comps.map(_.vi).max
            val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
            val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
            comps.foreach { c =>
              c.planeW = mcusX * c.hi * 8
              c.plane = new Array[Int](c.planeW * mcusY * c.vi * 8)
              if (qts(c.qSel) == null || dcTabs(c.dcSel) == null || acTabs(c.acSel) == null) fail()
            }
            val br = new BitReader(bytes, pos)
            val preds = new Array[Int](comps.length)
            val coef = new Array[Int](64)
            var rstExpect = 0
            var sinceRestart = 0
            var my = 0
            while (my < mcusY) {
              var mx = 0
              while (mx < mcusX) {
                if (restartInterval > 0 && sinceRestart == restartInterval) {
                  br.align()
                  if (br.pos + 1 >= bytes.length || (bytes(br.pos) & 0xff) != 0xff ||
                      (bytes(br.pos + 1) & 0xff) != 0xd0 + rstExpect) fail()
                  br.pos += 2
                  rstExpect = (rstExpect + 1) & 7
                  java.util.Arrays.fill(preds, 0)
                  sinceRestart = 0
                }
                var c = 0
                while (c < comps.length) {
                  val ci = comps(c)
                  var by = 0
                  while (by < ci.vi) {
                    var bx = 0
                    while (bx < ci.hi) {
                      preds(c) = decodeBlock(br, dcTabs(ci.dcSel), acTabs(ci.acSel),
                        qts(ci.qSel), preds(c), coef)
                      val px = idct(coef)
                      val x0 = (mx * ci.hi + bx) * 8
                      val y0 = (my * ci.vi + by) * 8
                      var yy = 0
                      while (yy < 8) {
                        var xx = 0
                        while (xx < 8) {
                          ci.plane((y0 + yy) * ci.planeW + x0 + xx) = px(yy * 8 + xx)
                          xx += 1
                        }
                        yy += 1
                      }
                      bx += 1
                    }
                    by += 1
                  }
                  c += 1
                }
                sinceRestart += 1
                mx += 1
              }
              my += 1
            }
            // assemble RGB with replication upsampling
            result = new Array[Int](w * h)
            val gray = comps.length == 1
            var y2 = 0
            while (y2 < h) {
              var x2 = 0
              while (x2 < w) {
                val pix =
                  if (gray) {
                    val c0 = comps(0)
                    val v = c0.plane((y2 * c0.vi / maxV) * c0.planeW + x2 * c0.hi / maxH)
                    (v << 16) | (v << 8) | v
                  } else {
                    def samp(c: CompOut) =
                      c.plane((y2 * c.vi / maxV) * c.planeW + x2 * c.hi / maxH)
                    yccToRgb(samp(comps(0)), samp(comps(1)), samp(comps(2)))
                  }
                result(y2 * w + x2) = pix
                x2 += 1
              }
              y2 += 1
            }
            scanned = true
            pos = br.pos
          case x if x >= 0xd0 && x <= 0xd7 => fail() // RST outside a scan
          case 0x01 => () // TEM — standalone, no segment
          case _ => // APPn / COM / other segments: skip by length
            val len = u16(pos)
            if (len < 2 || pos + len > bytes.length) fail()
            pos += len
        }
      }
      if (!scanned || result == null) None else Some((w, h, result))
    } catch { case NonFatal(_) => None }
  }
}
