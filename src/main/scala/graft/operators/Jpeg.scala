package graft.operators

import scala.util.control.NonFatal

/** L5e (SURVEY.md §2.9): REAL baseline + progressive JPEG codec — the
  * format the L5 row previously stubbed ("entropy-coded DCT genuinely
  * needs a codec library"). It does not: every stage of JPEG
  * (ITU T.81) is plain arithmetic — canonical Huffman coding over the
  * Annex K table spec, zigzag run-length coding, dequantization, and a
  * separable 8×8 DCT — so, like the WAV/BMP/PNG codecs in
  * [[Multimodal]], it is implemented library-free and hash-checked end
  * to end by declared queries.
  *
  * Decoder scope (everything else returns None, never throws):
  *  - baseline/extended-sequential Huffman scans (SOF0/SOF1) — a
  *    single interleaved scan OR multiple non-/partially-interleaved
  *    scans (one component subset each; every component coded exactly
  *    once, T.81 §A.2), and
  *  - PROGRESSIVE Huffman scans (SOF2): spectral selection AND
  *    successive approximation — DC first/refine scans (interleaved or
  *    single-component), AC first/refine scans (single-component,
  *    non-interleaved block raster over the ceil grid) with EOB-run
  *    accumulation across blocks and the G.1.2.3 correction-bit walk;
  * both with 8-bit precision, 1-component grayscale or 3-component
  * YCbCr with any sampling factors in 1..4 (4:4:4, 4:2:0, 4:2:2, … —
  * chroma is upsampled by sample replication), restart intervals
  * (DRI/RSTn), 0xFF00 byte stuffing. Arithmetic coding (SOF9+),
  * 12-bit, lossless and hierarchical streams are gated to None —
  * honest scope, loudly documented. Hostile-header safety: dimensions
  * and total coefficient storage are capped BEFORE any allocation
  * ([[MaxDecodePixels]]/[[MaxDecodeCoefInts]]) so a tiny crafted
  * header cannot drive multi-GB allocations whose OutOfMemoryError
  * would escape the NonFatal catch.
  *
  * Architecture: scans accumulate QUANTIZED zigzag-order coefficients
  * per component (progressive refinement operates in the quantized
  * domain, T.81 §G); dequantization + IDCT + upsampling + color run
  * once at EOI. The sequential path uses the same storage, so
  * progressive-vs-sequential equality is exact by construction when
  * the coefficients agree — LlmOpsSpec pins decode(progressive bytes)
  * == decode(sequential bytes) bit-for-bit on random images.
  *
  * Color convention (shared with the declared queries' oracles): the
  * YCbCr→RGB step is FIXED-POINT — 16-bit scaled BT.601 coefficients,
  * floor shift over a biased non-negative intermediate — so the decoded
  * RGB is a pure integer formula of (Y, Cb, Cr) that a SQL oracle
  * replays exactly:
  *   R = clamp((Y·65536 + 91881·(Cr−128) + 32768 + 2²⁴ >> 16) − 256)
  *   G = clamp((Y·65536 − 22554·(Cb−128) − 46802·(Cr−128) + 32768 + 2²⁴ >> 16) − 256)
  *   B = clamp((Y·65536 + 116130·(Cb−128) + 32768 + 2²⁴ >> 16) − 256)
  * (the +2²⁴ bias keeps the shifted value non-negative, so an
  * arithmetic shift, a floor division, and a truncating division all
  * agree — the oracle's `//` needs no negative-division caveats.)
  *
  * Exactness contract the declared queries ride on: a block whose
  * samples are constant c has DC = 8·(c−128) and all-zero AC after the
  * forward DCT; with DC quantum 8 the quantized DC is exactly c−128,
  * and the inverse path reproduces c bit-for-bit (the separable DCT's
  * rounding error is ~1e-13, far below the 0.5 rounding threshold).
  * This survives successive approximation too: the DC first scan codes
  * dc >> Al (arithmetic shift) and refinement ORs the dropped bit back
  * — exact for either sign in two's complement. So block-constant
  * images round-trip EXACTLY through both the sequential and the
  * progressive pipeline — Huffman, stuffing, restarts, EOB runs
  * included — while the oracle replays the per-block formula.
  */
object Jpeg {

  /** Zigzag scan: zigzag position → natural (row-major v·8+u) index. */
  private[operators] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Quant table (zigzag order) for the declared synth corpora: DC
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

  // The Annex K AC tables are SEQUENTIAL-mode tables: their alphabet is
  // {EOB, ZRL} ∪ (run 0..15 × size 1..10) — the progressive EOBn
  // symbols ((n<<4)|0 for n = 1..14, coding EOB runs of 2..32767
  // blocks, T.81 §G.1.2.2) have NO code in them, and their code space
  // is full (the last length-16 code is 0xFFFE), so they can't be
  // extended. Real encoders ship custom tables for progressive scans;
  // this one is hand-shaped for the common case (EOB runs and small
  // sizes short, the 146 rare symbols at length 12) with Kraft sum
  // 0.9888 ≤ 1 — verified canonical by the HuffEnc overflow guard.
  private val ProgAcCounts = Array(0, 1, 2, 3, 4, 5, 4, 5, 6, 0, 0, 146, 0, 0, 0, 0)
  private val ProgAcValues: Array[Int] = {
    val head = Array(0x00, 0x01, 0x10, 0x02, 0x11, 0x20, 0x03, 0x21, 0x30, 0x12,
      0x40, 0x31, 0x04, 0x13, 0x22, 0x50, 0x41, 0x05, 0xf0, 0x60, 0x51, 0x14, 0x23, 0x06,
      0x70, 0x61, 0x32, 0x15, 0x07, 0x24)
    val all = ((0 to 14).map(_ << 4) ++ Seq(0xf0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toArray
    head ++ all.filterNot(head.contains).sorted
  }

  /** Canonical-code encoder table: symbol → (code, length). */
  private final class HuffEnc(counts: Array[Int], symbols: Array[Int]) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      require(counts.sum == symbols.length, "huffman spec count/value mismatch")
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < counts(l - 1)) {
          val s = symbols(k); codeOf(s) = code; lenOf(s) = l
          code += 1; k += 1; i += 1
        }
        require(code <= (1 << l), s"huffman code space overflow at length $l")
        code <<= 1; l += 1
      }
    }
    /** Emit the symbol's code — a symbol absent from the table is an
      * encoder bug that would silently corrupt the stream (the round-14
      * EOBn-vs-Annex-K lesson), so it fails loudly instead.
      */
    def putSym(bw: BitWriter, s: Int): Unit = {
      require(lenOf(s) > 0, f"symbol 0x$s%02x has no code in this huffman table")
      bw.put(codeOf(s), lenOf(s))
    }
  }

  private val EncDcLuma = new HuffEnc(DcLumaCounts, DcValues)
  private val EncDcChroma = new HuffEnc(DcChromaCounts, DcValues)
  private val EncAcLuma = new HuffEnc(AcLumaCounts, AcLumaValues)
  private val EncAcChroma = new HuffEnc(AcChromaCounts, AcChromaValues)
  private val EncAcProg = new HuffEnc(ProgAcCounts, ProgAcValues)

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
  private[operators] def idct(coef: Array[Int]): Array[Int] = {
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
    def putBit(b: Int): Unit = {
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

  /** Emit the s-bit two's-complement-style value code (T.81 F.1.2.1):
    * negative values code as v + 2^s − 1.
    */
  private def putVal(bw: BitWriter, v: Int, s: Int): Unit =
    if (s > 0) bw.put(if (v < 0) v + (1 << s) - 1 else v, s)

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

  /** FDCT + quantize one 8×8 block into `out(off..off+63)` in ZIGZAG
    * order (both scan emitters consume zigzag positions directly).
    */
  private def quantizeBlockInto(plane: Array[Int], planeW: Int, x0: Int, y0: Int,
                                qt: Array[Int], out: Array[Int], off: Int): Unit = {
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
    var k = 0
    while (k < 64) { out(off + k) = Math.round(s(Zigzag(k)) / qt(k)).toInt; k += 1 }
  }

  /** Sequential-mode emission of one quantized block (zigzag order at
    * `off`): DC diff + AC run-length. Returns the new DC predictor.
    */
  private def emitSeqBlock(bw: BitWriter, q: Array[Int], off: Int,
                           dcT: HuffEnc, acT: HuffEnc, pred: Int): Int = {
    val diff = q(off) - pred
    val ds = bitCategory(diff)
    dcT.putSym(bw, ds)
    putVal(bw, diff, ds)
    var run = 0
    var k = 1
    while (k < 64) {
      if (q(off + k) == 0) run += 1
      else {
        while (run > 15) { acT.putSym(bw, 0xf0); run -= 16 }
        val as = bitCategory(q(off + k))
        acT.putSym(bw, (run << 4) | as)
        putVal(bw, q(off + k), as)
        run = 0
      }
      k += 1
    }
    if (run > 0) acT.putSym(bw, 0x00) // EOB
    q(off)
  }

  /** EOB-run + buffered-correction-bit state for progressive AC scans
    * (T.81 §G.1.2.2-3). `bump` marks the current block (or its tail)
    * as covered by the pending EOB run, keeping its already-buffered
    * correction bits attached; `flushEob` emits the EOBn code, its
    * extension bits, then the attached correction bits — exactly the
    * order the decoder consumes them in.
    */
  private final class EobState(bw: BitWriter, acT: HuffEnc) {
    private var run = 0
    // TWO buffers, not one (the round-14 bug that cost an afternoon):
    // `be` holds correction bits attached to the PENDING EOB run —
    // the decoder reads those right after the EOBn code, one per
    // already-nonzero coefficient of each covered block; `br` holds
    // the CURRENT segment's correction bits — the decoder reads those
    // AFTER the next emitted code (ZRL or run/1+sign) while it walks
    // the run span. Conflating them puts a correction bit where the
    // decoder expects a Huffman code.
    private val be = new scala.collection.mutable.ArrayBuffer[Int]
    private val br = new scala.collection.mutable.ArrayBuffer[Int]
    def appendBit(b: Int): Unit = br += b
    def flushBits(): Unit = { br.foreach(bw.putBit); br.clear() }
    def hasPendingBits: Boolean = br.nonEmpty
    def bump(): Unit = {
      run += 1; be ++= br; br.clear()
      if (run == 0x7fff) flushEob()
    }
    def flushEob(): Unit = {
      if (run > 0) {
        val n = 31 - Integer.numberOfLeadingZeros(run)
        acT.putSym(bw, n << 4)
        if (n > 0) bw.put(run - (1 << n), n)
        run = 0
      }
      be.foreach(bw.putBit); be.clear()
    }
  }

  /** Shared encoder core. Emits a structurally standard stream: SOI,
    * DQT(s), SOF0/SOF2, DHT(s), [DRI], then one interleaved scan
    * (sequential; or one full-band scan PER COMPONENT when
    * `interleaved = false` — the legal multi-scan baseline layout) or
    * the progressive scan script — interleaved DC
    * first (Al=1) + DC refinement, then per component AC first
    * (Ss=1..63, Al=1) + AC refinement — and EOI.
    */
  private def encodeInternal(w: Int, h: Int, comps: Array[CompIn],
                             qts: Array[Array[Int]], restartInterval: Int,
                             progressive: Boolean,
                             interleaved: Boolean = true): Array[Byte] = {
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
    seg(if (progressive) 0xc2 else 0xc0, sof)
    val useChroma = comps.exists(!_.luma)
    def dhtBody(cls: Int, id: Int, counts: Array[Int], vals: Array[Int]) =
      Array((cls << 4) | id) ++ counts ++ vals
    // progressive files carry the EOBn-capable AC table as id 0 (every
    // AC scan selects it); sequential files carry the Annex K pair
    seg(0xc4, dhtBody(0, 0, DcLumaCounts, DcValues) ++
      (if (progressive) dhtBody(1, 0, ProgAcCounts, ProgAcValues)
       else dhtBody(1, 0, AcLumaCounts, AcLumaValues)) ++
      (if (useChroma) dhtBody(0, 1, DcChromaCounts, DcValues) ++
        (if (progressive) Array.empty[Int]
         else dhtBody(1, 1, AcChromaCounts, AcChromaValues))
       else Array.empty[Int]))
    if (restartInterval > 0) seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff))

    val maxH = comps.map(_.hi).max
    val maxV = comps.map(_.vi).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    // phase 1: quantized zigzag coefficients per component, full grid
    val blocksW = comps.map(c => mcusX * c.hi)
    val blocksH = comps.map(c => mcusY * c.vi)
    val coefs: Array[Array[Int]] = comps.indices.toArray.map { c =>
      val bwc = blocksW(c); val bhc = blocksH(c)
      val arr = new Array[Int](bwc * bhc * 64)
      var by = 0
      while (by < bhc) {
        var bx = 0
        while (bx < bwc) {
          quantizeBlockInto(comps(c).plane, comps(c).planeW, bx * 8, by * 8,
            qts(comps(c).qSel), arr, (by * bwc + bx) * 64)
          bx += 1
        }
        by += 1
      }
      arr
    }
    // coded (ceil) grid for non-interleaved scans — can be SMALLER than
    // the interleaved grid for subsampled frames (T.81 §A.2.2)
    val codedW = comps.map(c => ((w * c.hi + maxH - 1) / maxH + 7) / 8)
    val codedH = comps.map(c => ((h * c.vi + maxV - 1) / maxV + 7) / 8)

    def sos(compIdxs: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit =
      seg(0xda, Array(compIdxs.length) ++
        compIdxs.flatMap { i =>
          val t = if (comps(i).luma) 0 else 1
          // progressive AC scans all select the shared EOBn table (id 0)
          Array(i + 1, (t << 4) | (if (progressive) 0 else t))
        } ++ Array(ss, se, (ah << 4) | al))

    var rst = 0
    def emitRst(bw: BitWriter): Unit = {
      bw.flush(); marker(0xd0 + rst); rst = (rst + 1) & 7
    }

    /** Interleaved MCU walk shared by the sequential scan and the
      * progressive DC scans: `block(bw, compIdx, coefOffset)` does the
      * per-block emission; `resetPred` fires at scan start + restarts.
      */
    def mcuScan(block: (BitWriter, Int, Int) => Unit, resetPred: () => Unit): Unit = {
      val bw = new BitWriter(out)
      rst = 0
      resetPred()
      var sinceRestart = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && sinceRestart == restartInterval) {
            emitRst(bw); resetPred(); sinceRestart = 0
          }
          var c = 0
          while (c < comps.length) {
            var by = 0
            while (by < comps(c).vi) {
              var bx = 0
              while (bx < comps(c).hi) {
                block(bw, c, (((my * comps(c).vi + by) * blocksW(c)) + mx * comps(c).hi + bx) * 64)
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
    }

    if (!progressive && interleaved) {
      sos(comps.indices, 0, 63, 0, 0)
      val preds = new Array[Int](comps.length)
      mcuScan(
        (bw, c, off) => {
          val (dcT, acT) = if (comps(c).luma) (EncDcLuma, EncAcLuma) else (EncDcChroma, EncAcChroma)
          preds(c) = emitSeqBlock(bw, coefs(c), off, dcT, acT, preds(c))
        },
        () => java.util.Arrays.fill(preds, 0))
    } else if (!progressive) {
      // NON-interleaved sequential: one full-band scan per component,
      // block raster over the CODED (ceil) grid, per-scan DC predictor,
      // restart interval counting data units (= blocks) — the legal
      // multi-scan baseline layout the decoder's ADVICE-r14 item covers.
      comps.indices.foreach { c =>
        sos(Seq(c), 0, 63, 0, 0)
        val bw = new BitWriter(out)
        rst = 0
        val (dcT, acT) =
          if (comps(c).luma) (EncDcLuma, EncAcLuma) else (EncDcChroma, EncAcChroma)
        var pred = 0
        var sinceRestart = 0
        var by = 0
        while (by < codedH(c)) {
          var bx = 0
          while (bx < codedW(c)) {
            if (restartInterval > 0 && sinceRestart == restartInterval) {
              emitRst(bw); pred = 0; sinceRestart = 0
            }
            pred = emitSeqBlock(bw, coefs(c), (by * blocksW(c) + bx) * 64, dcT, acT, pred)
            sinceRestart += 1
            bx += 1
          }
          by += 1
        }
        bw.flush()
      }
    } else {
      val AlDc = 1; val AlAc = 1
      // --- DC first scan (interleaved, point transform Al=1) ---
      sos(comps.indices, 0, 0, 0, AlDc)
      val preds = new Array[Int](comps.length)
      mcuScan(
        (bw, c, off) => {
          val dcT = if (comps(c).luma) EncDcLuma else EncDcChroma
          val v = coefs(c)(off) >> AlDc // arithmetic shift = the DC point transform
          val diff = v - preds(c); preds(c) = v
          val ds = bitCategory(diff)
          dcT.putSym(bw, ds)
          putVal(bw, diff, ds)
        },
        () => java.util.Arrays.fill(preds, 0))
      // --- DC refinement scan (one raw bit per block) ---
      sos(comps.indices, 0, 0, AlDc, 0)
      mcuScan((bw, c, off) => bw.putBit((coefs(c)(off) >> 0) & 1), () => ())
      // --- per component: AC first + AC refinement (non-interleaved) ---
      comps.indices.foreach { c =>
        val acT = EncAcProg // shared EOBn-capable table, id 0
        // block raster over the CODED grid, restart every ri blocks
        def acScan(perBlock: (BitWriter, EobState, Int) => Unit): Unit = {
          val bw = new BitWriter(out)
          rst = 0
          val eob = new EobState(bw, acT)
          var sinceRestart = 0
          var by = 0
          while (by < codedH(c)) {
            var bx = 0
            while (bx < codedW(c)) {
              if (restartInterval > 0 && sinceRestart == restartInterval) {
                eob.flushEob(); emitRst(bw); sinceRestart = 0
              }
              perBlock(bw, eob, (by * blocksW(c) + bx) * 64)
              sinceRestart += 1
              bx += 1
            }
            by += 1
          }
          eob.flushEob()
          bw.flush()
        }
        // AC first: band 1..63 at precision Al=1
        sos(Seq(c), 1, 63, 0, AlAc)
        acScan { (bw, eob, off) =>
          val q = coefs(c)
          var last = 0
          var k = 1
          while (k <= 63) {
            if (math.abs(q(off + k)) >> AlAc != 0) last = k
            k += 1
          }
          if (last == 0) eob.bump()
          else {
            eob.flushEob()
            var r = 0
            k = 1
            while (k <= last) {
              val t = q(off + k)
              val a = math.abs(t) >> AlAc
              if (a == 0) r += 1
              else {
                while (r > 15) { acT.putSym(bw, 0xf0); r -= 16 }
                val s = bitCategory(a)
                acT.putSym(bw, (r << 4) | s)
                putVal(bw, if (t < 0) -a else a, s)
                r = 0
              }
              k += 1
            }
            if (last < 63) eob.bump()
          }
        }
        // AC refinement: Al 1 → 0, the G.1.2.3 correction-bit pass
        sos(Seq(c), 1, 63, AlAc, 0)
        acScan { (bw, eob, off) =>
          val q = coefs(c)
          // last NEW nonzero (|v| at this precision == 1): zeros beyond
          // it fold into the EOB run instead of ZRLs
          var lastNew = 0
          var k = 1
          while (k <= 63) { if (math.abs(q(off + k)) == 1) lastNew = k; k += 1 }
          var r = 0
          var emitted = false
          k = 1
          while (k <= 63) {
            val t = q(off + k)
            val a = math.abs(t)
            if (a == 0) r += 1
            else {
              while (r > 15 && k <= lastNew) {
                eob.flushEob()
                acT.putSym(bw, 0xf0)
                r -= 16
                eob.flushBits()
                emitted = true
              }
              if (a > 1) eob.appendBit(a & 1) // old nonzero: correction bit
              else {
                eob.flushEob()
                acT.putSym(bw, (r << 4) | 1)
                bw.putBit(if (t > 0) 1 else 0)
                r = 0
                eob.flushBits()
                emitted = true
              }
            }
            k += 1
          }
          if (r > 0 || eob.hasPendingBits || !emitted) eob.bump()
        }
      }
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Grayscale JPEG from a w×h luma plane (values 0..255). */
  def buildJpegGray(yPlane: Array[Int], w: Int, h: Int,
                    qLuma: Array[Int] = SynthQ, restartInterval: Int = 0,
                    progressive: Boolean = false): Array[Byte] = {
    require(yPlane.length == w * h, s"expected ${w * h} samples, got ${yPlane.length}")
    val pw = (w + 7) / 8 * 8; val ph = (h + 7) / 8 * 8
    encodeInternal(w, h, Array(CompIn(padPlane(yPlane, w, h, pw, ph), pw, 1, 1, 0, luma = true)),
      Array(qLuma), restartInterval, progressive)
  }

  /** 4:4:4 color JPEG from full-resolution Y/Cb/Cr planes. */
  def buildJpeg444(y: Array[Int], cb: Array[Int], cr: Array[Int], w: Int, h: Int,
                   qLuma: Array[Int] = SynthQ, qChroma: Array[Int] = SynthQ,
                   restartInterval: Int = 0, progressive: Boolean = false,
                   interleaved: Boolean = true): Array[Byte] = {
    require(y.length == w * h && cb.length == w * h && cr.length == w * h,
      s"expected ${w * h} samples per plane")
    val pw = (w + 7) / 8 * 8; val ph = (h + 7) / 8 * 8
    encodeInternal(w, h, Array(
      CompIn(padPlane(y, w, h, pw, ph), pw, 1, 1, 0, luma = true),
      CompIn(padPlane(cb, w, h, pw, ph), pw, 1, 1, 1, luma = false),
      CompIn(padPlane(cr, w, h, pw, ph), pw, 1, 1, 1, luma = false)),
      Array(qLuma, qChroma), restartInterval, progressive, interleaved)
  }

  /** 4:2:0 color JPEG: full-resolution luma + half-resolution
    * (⌈w/2⌉×⌈h/2⌉) chroma planes — the subsampling every camera JPEG
    * uses. The decoder reconstructs chroma by replication, so images
    * whose chroma is constant per 2×2 round-trip exactly.
    */
  def buildJpeg420(y: Array[Int], cbHalf: Array[Int], crHalf: Array[Int], w: Int, h: Int,
                   qLuma: Array[Int] = SynthQ, qChroma: Array[Int] = SynthQ,
                   restartInterval: Int = 0, progressive: Boolean = false,
                   interleaved: Boolean = true): Array[Byte] = {
    val hw = (w + 1) / 2; val hh = (h + 1) / 2
    require(y.length == w * h, s"expected ${w * h} luma samples, got ${y.length}")
    require(cbHalf.length == hw * hh && crHalf.length == hw * hh,
      s"expected ${hw * hh} chroma samples per half plane")
    val pw = (w + 15) / 16 * 16; val ph = (h + 15) / 16 * 16
    encodeInternal(w, h, Array(
      CompIn(padPlane(y, w, h, pw, ph), pw, 2, 2, 0, luma = true),
      CompIn(padPlane(cbHalf, hw, hh, pw / 2, ph / 2), pw / 2, 1, 1, 1, luma = false),
      CompIn(padPlane(crHalf, hw, hh, pw / 2, ph / 2), pw / 2, 1, 1, 1, luma = false)),
      Array(qLuma, qChroma), restartInterval, progressive, interleaved)
  }

  /** Convenience: 4:4:4 JPEG from packed 0xRRGGBB pixels (fixed-point
    * BT.601 forward conversion).
    */
  def buildJpegRgb(pixels: Array[Int], w: Int, h: Int,
                   qLuma: Array[Int] = SynthQ, qChroma: Array[Int] = SynthQ,
                   restartInterval: Int = 0, progressive: Boolean = false): Array[Byte] = {
    require(pixels.length == w * h, s"expected ${w * h} pixels, got ${pixels.length}")
    val y = new Array[Int](w * h); val cb = new Array[Int](w * h); val cr = new Array[Int](w * h)
    var i = 0
    while (i < pixels.length) {
      val (yy, cbb, crr) = rgbToYcc(pixels(i))
      y(i) = yy; cb(i) = cbb; cr(i) = crr; i += 1
    }
    buildJpeg444(y, cb, cr, w, h, qLuma, qChroma, restartInterval, progressive)
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

  /** One frame component: sampling spec + accumulated QUANTIZED
    * zigzag-order coefficients over the full interleaved block grid
    * (`blocksW`×`blocksH`); `codedW/H` is the smaller ceil grid that
    * non-interleaved scans walk (T.81 §A.2.2).
    */
  private final class FrameComp(val id: Int, val hi: Int, val vi: Int, val qSel: Int) {
    var blocksW = 0; var blocksH = 0
    var codedW = 0; var codedH = 0
    var coefs: Array[Int] = null
    /** Sequential mode: this component's (single) scan has been decoded.
      * T.81 sequential streams code each component in exactly one scan —
      * interleaved (all in one) or per-component; a second scan touching
      * an already-coded component is malformed.
      */
    var coded = false
  }

  /** Decode allocation caps — a ~50-byte crafted header is enough to
    * declare huge dimensions (progressive EOB runs make giant-dim
    * tiny-byte files LEGAL, so no byte-length heuristic applies), and
    * OutOfMemoryError from the resulting multi-GB coefficient arrays is
    * an Error that escapes the NonFatal catch and breaks the
    * None-never-throw contract. Cap before allocating: ≤64M pixels
    * (covers any real camera frame; 8192×8192) and ≤128M ints (512 MB)
    * of total coefficient storage across components — above either,
    * decode returns None. Planes and the packed-RGB result are bounded
    * by the same two numbers, so the whole decode working set is capped
    * by construction.
    */
  private val MaxDecodePixels: Long = 1L << 26
  private val MaxDecodeCoefInts: Long = 128L << 20

  /** Sequential block decode into zigzag storage (no dequant here —
    * dequantization happens once at EOI, shared with progressive).
    */
  private def seqBlock(br: BitReader, dcT: HuffDec, acT: HuffDec,
                       coefs: Array[Int], off: Int, pred: Int): Int = {
    val ds = huffDecode(br, dcT)
    if (ds > 11) fail()
    val dc = pred + extend(br.receive(ds), ds)
    coefs(off) = dc
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
        coefs(off + k) = extend(br.receive(s), s)
        k += 1
      }
    }
    dc
  }

  /** Progressive AC first scan, one block (T.81 §G.1.2.2). */
  private def acFirst(br: BitReader, acT: HuffDec, coefs: Array[Int], off: Int,
                      ss: Int, se: Int, al: Int, st: ScanState): Unit = {
    if (st.eobrun > 0) { st.eobrun -= 1; return }
    var k = ss
    while (k <= se) {
      val rs = huffDecode(br, acT)
      val r = rs >> 4; val s = rs & 15
      if (s == 0) {
        if (r == 15) k += 16 // ZRL
        else { st.eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0) - 1; return }
      } else {
        k += r
        if (k > se || s > 10) fail()
        coefs(off + k) = extend(br.receive(s), s) << al
        k += 1
      }
    }
  }

  /** Progressive AC refinement scan, one block — the correction-bit
    * walk of T.81 §G.1.2.3: runs count still-zero coefficients, each
    * already-nonzero coefficient passed consumes one correction bit,
    * EOB-covered blocks still carry correction bits for their nonzeros.
    */
  private def acRefine(br: BitReader, acT: HuffDec, coefs: Array[Int], off: Int,
                       ss: Int, se: Int, al: Int, st: ScanState): Unit = {
    val p1 = 1 << al; val m1 = -1 << al
    var k = ss
    def refineAt(idx: Int): Unit = {
      val cur = coefs(idx)
      if (br.nextBit() == 1 && (cur & p1) == 0)
        coefs(idx) = if (cur >= 0) cur + p1 else cur + m1
    }
    if (st.eobrun == 0) {
      var inEob = false
      while (!inEob && k <= se) {
        val rs = huffDecode(br, acT)
        var r = rs >> 4; val s = rs & 15
        var newval = 0
        if (s == 0) {
          if (r != 15) {
            st.eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
            inEob = true // tail below refines the rest and consumes one
          }
          // r == 15: ZRL — skip 16 still-zero coefficients, no new value
        } else {
          if (s != 1) fail()
          newval = if (br.nextBit() == 1) p1 else m1
        }
        if (!inEob) {
          var placed = false
          while (!placed && k <= se) {
            if (coefs(off + k) != 0) { refineAt(off + k); k += 1 }
            else if (r == 0) {
              if (newval != 0) coefs(off + k) = newval
              k += 1
              placed = true
            } else { r -= 1; k += 1 }
          }
        }
      }
    }
    if (st.eobrun > 0) {
      while (k <= se) {
        if (coefs(off + k) != 0) refineAt(off + k)
        k += 1
      }
      st.eobrun -= 1
    }
  }

  /** Per-scan mutable state: DC predictors + the AC EOB run counter
    * (both reset at restart markers).
    */
  private final class ScanState(n: Int) {
    val preds = new Array[Int](n)
    var eobrun = 0
    def reset(): Unit = { java.util.Arrays.fill(preds, 0); eobrun = 0 }
  }

  /** REAL JPEG pixel decoder — baseline AND progressive; see the object
    * doc for scope and the None-not-throw gates. Output contract
    * matches [[Multimodal.decodeBmp24]]/[[Multimodal.decodePng]]:
    * (width, height, row-major top-down 0xRRGGBB).
    */
  def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    try {
      if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
      var pos = 2
      val qts = new Array[Array[Int]](4)
      val dcTabs = new Array[HuffDec](4)
      val acTabs = new Array[HuffDec](4)
      var comps: Array[FrameComp] = null
      var w = 0; var h = 0
      var maxH = 1; var maxV = 1
      var mcusX = 0; var mcusY = 0
      var progressive = false
      var restartInterval = 0
      var scanCount = 0
      var done = false

      def u16(i: Int): Int = {
        if (i + 1 >= bytes.length) fail()
        ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
      }

      while (!done) {
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
          case 0xc0 | 0xc1 | 0xc2 => // SOF0 baseline / SOF1 ext seq / SOF2 progressive
            if (comps != null) fail()
            progressive = m == 0xc2
            val len = u16(pos)
            if (pos + len > bytes.length) fail()
            val p = pos + 2
            if ((bytes(p) & 0xff) != 8) return None // 12-bit → unsupported
            h = u16(p + 1); w = u16(p + 3)
            val nc = bytes(p + 5) & 0xff
            if (w == 0 || h == 0 || (nc != 1 && nc != 3)) return None
            if (w.toLong * h > MaxDecodePixels) return None
            if (len != 8 + 3 * nc) fail()
            comps = Array.tabulate(nc) { i =>
              val b = p + 6 + 3 * i
              val hv = bytes(b + 1) & 0xff
              val hi = hv >> 4; val vi = hv & 15
              val tq = bytes(b + 2) & 0xff
              if (hi < 1 || hi > 4 || vi < 1 || vi > 4 || tq > 3) fail()
              new FrameComp(bytes(b) & 0xff, hi, vi, tq)
            }
            maxH = comps.map(_.hi).max
            maxV = comps.map(_.vi).max
            mcusX = (w + 8 * maxH - 1) / (8 * maxH)
            mcusY = (h + 8 * maxV - 1) / (8 * maxV)
            comps.foreach { c =>
              c.blocksW = mcusX * c.hi; c.blocksH = mcusY * c.vi
              c.codedW = ((w * c.hi + maxH - 1) / maxH + 7) / 8
              c.codedH = ((h * c.vi + maxV - 1) / maxV + 7) / 8
            }
            if (comps.map(c => c.blocksW.toLong * c.blocksH * 64).sum >
                MaxDecodeCoefInts) return None
            comps.foreach(c => c.coefs = new Array[Int](c.blocksW * c.blocksH * 64))
            pos += len
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // lossless / arithmetic / differential / hierarchical
          case 0xdd => // DRI
            if (u16(pos) != 4) fail()
            restartInterval = u16(pos + 2)
            pos += 4
          case 0xda => // SOS
            if (comps == null) fail()
            val len = u16(pos)
            if (pos + len > bytes.length) fail()
            val p = pos + 2
            val ns = bytes(p) & 0xff
            if (ns < 1 || ns > comps.length || len != 6 + 2 * ns) fail()
            val scanComps = new Array[FrameComp](ns)
            val dcSel = new Array[Int](ns)
            val acSel = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cid = bytes(p + 1 + 2 * i) & 0xff
              val sel = bytes(p + 2 + 2 * i) & 0xff
              val fc = comps.find(_.id == cid).getOrElse(fail())
              if (scanComps.take(i).contains(fc)) fail()
              // sequential: each component is coded by exactly ONE scan
              // (interleaved or per-component, T.81 §A.2) — a repeat is
              // malformed; the per-component form is what legal
              // NON-interleaved sequential files (one SOS per component)
              // use, previously rejected here against the documented scope
              if (!progressive) {
                if (fc.coded) fail()
                fc.coded = true
              }
              scanComps(i) = fc
              dcSel(i) = sel >> 4; acSel(i) = sel & 15
              if (dcSel(i) > 3 || acSel(i) > 3) fail()
              i += 1
            }
            val ss = bytes(p + 1 + 2 * ns) & 0xff
            val se = bytes(p + 2 + 2 * ns) & 0xff
            val ahAl = bytes(p + 3 + 2 * ns) & 0xff
            val ah = ahAl >> 4; val al = ahAl & 15
            val dcScan = ss == 0 && se == 0
            if (!progressive) {
              if (ss != 0 || se != 63 || ah != 0 || al != 0) return None
            } else {
              // DC scans: band (0,0); AC scans: single component, band
              // inside 1..63. Successive approximation steps by 1 bit.
              if (!dcScan && (ns != 1 || ss < 1 || se < ss || se > 63)) fail()
              if (al > 13 || (ah != 0 && ah != al + 1)) fail()
            }
            pos += len
            val st = new ScanState(ns)
            val br = new BitReader(bytes, pos)
            var rstExpect = 0
            var sinceRestart = 0
            def atRestart(): Unit = {
              br.align()
              if (br.pos + 1 >= bytes.length || (bytes(br.pos) & 0xff) != 0xff ||
                  (bytes(br.pos + 1) & 0xff) != 0xd0 + rstExpect) fail()
              br.pos += 2
              rstExpect = (rstExpect + 1) & 7
              st.reset()
              sinceRestart = 0
            }
            def decodeUnit(ci: Int, off: Int): Unit = {
              val c = scanComps(ci)
              if (!progressive) {
                if (dcTabs(dcSel(ci)) == null || acTabs(acSel(ci)) == null) fail()
                st.preds(ci) = seqBlock(br, dcTabs(dcSel(ci)), acTabs(acSel(ci)),
                  c.coefs, off, st.preds(ci))
              } else if (dcScan) {
                if (ah == 0) {
                  if (dcTabs(dcSel(ci)) == null) fail()
                  val ds = huffDecode(br, dcTabs(dcSel(ci)))
                  if (ds > 11) fail()
                  st.preds(ci) += extend(br.receive(ds), ds)
                  c.coefs(off) = st.preds(ci) << al
                } else {
                  if (br.nextBit() == 1) c.coefs(off) |= (1 << al)
                }
              } else {
                if (acTabs(acSel(ci)) == null) fail()
                if (ah == 0) acFirst(br, acTabs(acSel(ci)), c.coefs, off, ss, se, al, st)
                else acRefine(br, acTabs(acSel(ci)), c.coefs, off, ss, se, al, st)
              }
            }
            if (ns > 1) {
              // interleaved MCU order over the full grid
              var my = 0
              while (my < mcusY) {
                var mx = 0
                while (mx < mcusX) {
                  if (restartInterval > 0 && sinceRestart == restartInterval) atRestart()
                  var ci = 0
                  while (ci < ns) {
                    val c = scanComps(ci)
                    var by = 0
                    while (by < c.vi) {
                      var bx = 0
                      while (bx < c.hi) {
                        decodeUnit(ci,
                          (((my * c.vi + by) * c.blocksW) + mx * c.hi + bx) * 64)
                        bx += 1
                      }
                      by += 1
                    }
                    ci += 1
                  }
                  sinceRestart += 1
                  mx += 1
                }
                my += 1
              }
            } else {
              // non-interleaved: block raster over the ceil grid; the
              // restart interval counts data units (= blocks)
              val c = scanComps(0)
              var by = 0
              while (by < c.codedH) {
                var bx = 0
                while (bx < c.codedW) {
                  if (restartInterval > 0 && sinceRestart == restartInterval) atRestart()
                  decodeUnit(0, (by * c.blocksW + bx) * 64)
                  sinceRestart += 1
                  bx += 1
                }
                by += 1
              }
            }
            scanCount += 1
            pos = br.pos
          case x if x >= 0xd0 && x <= 0xd7 => fail() // RST outside a scan
          case 0x01 => () // TEM — standalone, no segment
          case _ => // APPn / COM / other segments: skip by length
            val len = u16(pos)
            if (len < 2 || pos + len > bytes.length) fail()
            pos += len
        }
      }
      if (comps == null || scanCount == 0) return None
      // sequential: every component must have been coded by some scan —
      // a missing plane would silently assemble as black
      if (!progressive && comps.exists(!_.coded)) return None
      // --- assembly at EOI: dequantize + IDCT + upsample + color ---
      val planes = comps.map { c =>
        val qt = qts(c.qSel)
        if (qt == null) fail()
        val planeW = c.blocksW * 8
        val plane = new Array[Int](planeW * c.blocksH * 8)
        val nat = new Array[Int](64)
        var by = 0
        while (by < c.blocksH) {
          var bx = 0
          while (bx < c.blocksW) {
            val off = (by * c.blocksW + bx) * 64
            var k = 0
            while (k < 64) { nat(Zigzag(k)) = c.coefs(off + k) * qt(k); k += 1 }
            val px = idct(nat)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                plane((by * 8 + yy) * planeW + bx * 8 + xx) = px(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        plane
      }
      val result = new Array[Int](w * h)
      val gray = comps.length == 1
      var y2 = 0
      while (y2 < h) {
        var x2 = 0
        while (x2 < w) {
          def samp(i: Int) =
            planes(i)((y2 * comps(i).vi / maxV) * (comps(i).blocksW * 8) + x2 * comps(i).hi / maxH)
          val pix =
            if (gray) { val v = samp(0); (v << 16) | (v << 8) | v }
            else yccToRgb(samp(0), samp(1), samp(2))
          result(y2 * w + x2) = pix
          x2 += 1
        }
        y2 += 1
      }
      Some((w, h, result))
    } catch { case NonFatal(_) => None }
  }
}
