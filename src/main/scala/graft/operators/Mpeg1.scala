package graft.operators

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

/** REAL MPEG-1 video (ISO/IEC 11172-2) — I-, P- AND B-picture decode
  * + a conforming encoder, the second genuine video codec arm next to
  * the MJPEG-AVI path (see [[Avi]]): sequence/GOP/picture/slice/
  * macroblock layers, the standard DC-size, AC run-level,
  * macroblock-type (I, P and B tables), CBP and motion-vector VLC
  * families, default and stream-loaded quantizer matrices,
  * dequantization with the oddification (mismatch-control) rule,
  * FORWARD AND BACKWARD MOTION COMPENSATION (full- and half-pel with
  * the standard's round-half-away averaging, f_code modular vector
  * reconstruction, per-direction predictor state, skipped-macroblock
  * semantics — zero-MV reference copy in P, previous-macroblock
  * mode/vector reuse in B — and intra refresh inside predicted
  * pictures), BIDIRECTIONAL INTERPOLATION (the per-sample
  * round-half-away average of the two predictions), anchor-frame
  * reordering (decode order I P B B … emits display order I B B P …:
  * past/future reference slots, held anchors flushed on the next
  * anchor and at sequence end), non-intra residual blocks
  * (dct_coeff_first, flat-16 default matrix) added onto the
  * prediction, and the shared 8×8 IDCT from [[Jpeg]] for intra
  * blocks — MPEG-1's DCT is the same transform with an
  * un-level-shifted DC, so `Jpeg.idct(coefs with DC−1024)`
  * reconstructs intra samples bit-exactly (the DC basis contributes
  * DC/8 uniformly; subtracting 1024 = 128·8 converts to JPEG's +128
  * convention); residuals go through their own unshifted rounding IDCT.
  *
  * Scope contract: ALL FOUR 11172-2 picture types decode — I, P, B,
  * and D (the DC-only trick-mode type: single-entry macroblock_type
  * table B.4, DC-only blocks with no end_of_block, the
  * end_of_macroblock marker bit). The remaining None-gates are all
  * NONCONFORMING streams, not format subsets: a sequence mixing D
  * with non-D pictures (11172-2 §2.4.1 requires a D sequence to be
  * all-D), a B picture arriving before two decoded anchors (a
  * broken-link open GOP after a splice), and an AC-coefficient prefix
  * longer than the implemented 13-bit table entries plus the
  * fixed-format ESCAPE form — any conforming encoder can escape-code
  * the rare longer entries, and this encoder always does.
  *
  * Hostile-input posture matches the other codecs: dimension and
  * retention caps checked BEFORE any allocation, every parse error is
  * the single internal exception mapped to None, and the adversarial
  * fuzz suite (PropertiesSpec) pins never-throws over mutations,
  * truncations, and random bytes.
  */
object Mpeg1 {

  private final class MErr extends Exception(null, null, false, false)
  private def fail(): Nothing = throw new MErr

  /** Per-frame pixel cap, checked before plane allocation. */
  val MaxDecodePixels: Long = 1L << 26
  /** Frame-count cap per stream. */
  val MaxDecodeFrames = 4096
  /** Total retained-pixel budget across all decoded frames. */
  val MaxDecodeTotalPixels: Long = 1L << 26

  /** Default intra quantizer matrix (11172-2 §2.4.3.2), raster order. */
  private[operators] val DefaultIntraQ: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  /** Default non-intra quantizer matrix: flat 16 (11172-2 2.4.3.3). */
  private[operators] val DefaultNonIntraQ: Array[Int] = Array.fill(64)(16)

  // ------------------------------------------------------------------
  // VLC tables (code-string → value), decoded by longest-prefix walk
  // ------------------------------------------------------------------

  /** A canonical VLC table: (len, code) → value, plus the max length. */
  private final class Vlc(entries: Seq[(String, Int)]) {
    val maxLen: Int = entries.map(_._1.length).max
    private val m: Map[(Int, Int), Int] =
      entries.map { case (s, v) => ((s.length, Integer.parseInt(s, 2)), v) }.toMap
    def decode(br: BitReader): Int = {
      var code = 0; var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.bit(); len += 1
        m.get((len, code)) match {
          case Some(v) => return v
          case None    => ()
        }
      }
      fail()
    }
  }

  /** Macroblock address increment (11172-2 table B.1). Escape adds 33
    * and re-reads; stuffing is discarded.
    */
  private val AddrEscape = -1
  private val AddrStuffing = -2
  private val AddrIncVlc = new Vlc(Seq(
    "1" -> 1, "011" -> 2, "010" -> 3, "0011" -> 4, "0010" -> 5,
    "00011" -> 6, "00010" -> 7, "0000111" -> 8, "0000110" -> 9,
    "00001011" -> 10, "00001010" -> 11, "00001001" -> 12, "00001000" -> 13,
    "00000111" -> 14, "00000110" -> 15,
    "0000010111" -> 16, "0000010110" -> 17, "0000010101" -> 18,
    "0000010100" -> 19, "0000010011" -> 20, "0000010010" -> 21,
    "00000100011" -> 22, "00000100010" -> 23, "00000100001" -> 24,
    "00000100000" -> 25, "00000011111" -> 26, "00000011110" -> 27,
    "00000011101" -> 28, "00000011100" -> 29, "00000011011" -> 30,
    "00000011010" -> 31, "00000011001" -> 32, "00000011000" -> 33,
    "00000001000" -> AddrEscape, "00000001111" -> AddrStuffing))

  /** dct_dc_size, luminance (table B.5a). */
  private val DcSizeLumaVlc = new Vlc(Seq(
    "100" -> 0, "00" -> 1, "01" -> 2, "101" -> 3, "110" -> 4,
    "1110" -> 5, "11110" -> 6, "111110" -> 7, "1111110" -> 8))

  /** dct_dc_size, chrominance (table B.5b). */
  private val DcSizeChromaVlc = new Vlc(Seq(
    "00" -> 0, "01" -> 1, "10" -> 2, "110" -> 3, "1110" -> 4,
    "11110" -> 5, "111110" -> 6, "1111110" -> 7, "11111110" -> 8))

  /** P-picture macroblock_type (table B.2b), as a flag mask:
    * 8 = quantizer present, 4 = forward MC, 2 = coded pattern, 1 = intra.
    */
  private val PTypeVlc = new Vlc(Seq(
    "1" -> 6, "01" -> 2, "001" -> 4, "00011" -> 1,
    "00010" -> 10, "000010" -> 14, "000001" -> 9))

  /** B-picture macroblock_type (table B.2c), as a flag mask:
    * 16 = quantizer present, 8 = forward MC, 4 = backward MC,
    * 2 = coded pattern, 1 = intra. Every non-intra entry carries at
    * least one MC direction — B pictures have no No-MC type.
    */
  private val BTypeVlc = new Vlc(Seq(
    "10" -> 12, "11" -> 14, "010" -> 4, "011" -> 6,
    "0010" -> 8, "0011" -> 10, "00011" -> 1,
    "00010" -> 22, "000011" -> 26, "000010" -> 30, "000001" -> 17))

  /** coded_block_pattern (table B.3) — cbp 0 has no code. */
  private val CbpVlc = new Vlc(Seq(
    "111" -> 60,
    "1101" -> 4, "1100" -> 8, "1011" -> 16, "1010" -> 32,
    "10011" -> 12, "10010" -> 48, "10001" -> 20, "10000" -> 40,
    "01111" -> 28, "01110" -> 44, "01101" -> 52, "01100" -> 56,
    "01011" -> 1, "01010" -> 61, "01001" -> 2, "01000" -> 62,
    "001111" -> 24, "001110" -> 36, "001101" -> 3, "001100" -> 63,
    "0010111" -> 5, "0010110" -> 9, "0010101" -> 17, "0010100" -> 33,
    "0010011" -> 6, "0010010" -> 10, "0010001" -> 18, "0010000" -> 34,
    "00011111" -> 7, "00011110" -> 11, "00011101" -> 19, "00011100" -> 35,
    "00011011" -> 13, "00011010" -> 49, "00011001" -> 21, "00011000" -> 41,
    "00010111" -> 14, "00010110" -> 50, "00010101" -> 22, "00010100" -> 42,
    "00010011" -> 15, "00010010" -> 51, "00010001" -> 23, "00010000" -> 43,
    "00001111" -> 25, "00001110" -> 37, "00001101" -> 26, "00001100" -> 38,
    "00001011" -> 29, "00001010" -> 45, "00001001" -> 53, "00001000" -> 57,
    "00000111" -> 30, "00000110" -> 46, "00000101" -> 54, "00000100" -> 58,
    "000000111" -> 31, "000000110" -> 47, "000000101" -> 55,
    "000000100" -> 59, "000000011" -> 27, "000000010" -> 39))

  /** motion_code magnitude VLC (table B.4); the sign bit follows any
    * nonzero code, and fCode−1 residual bits follow when forward_f > 1.
    */
  private val MvVlc = new Vlc(Seq(
    "1" -> 0, "01" -> 1, "001" -> 2, "0001" -> 3, "000011" -> 4,
    "0000101" -> 5, "0000100" -> 6, "0000011" -> 7,
    "000001011" -> 8, "000001010" -> 9, "000001001" -> 10,
    "0000010001" -> 11, "0000010000" -> 12, "0000001111" -> 13,
    "0000001110" -> 14, "0000001101" -> 15, "0000001100" -> 16))

  /** dct_coeff_next run/level VLC (table B.5c), implemented through its
    * 13-bit codes; value = run·256 + level (level sign read separately).
    * EOB and ESCAPE are sentinels. Longer codes gate to None — see the
    * object doc's scope contract; this encoder escape-codes everything.
    */
  private val CoefEob = -1
  private val CoefEscape = -2
  private val CoefVlc = new Vlc(Seq(
    "10" -> CoefEob, "000001" -> CoefEscape,
    "11" -> (0 * 256 + 1), "011" -> (1 * 256 + 1), "0100" -> (0 * 256 + 2),
    "0101" -> (2 * 256 + 1), "00101" -> (0 * 256 + 3), "00111" -> (3 * 256 + 1),
    "00110" -> (4 * 256 + 1), "000110" -> (1 * 256 + 2), "000111" -> (5 * 256 + 1),
    "000101" -> (6 * 256 + 1), "000100" -> (7 * 256 + 1),
    "0000110" -> (0 * 256 + 4), "0000100" -> (2 * 256 + 2),
    "0000111" -> (8 * 256 + 1), "0000101" -> (9 * 256 + 1),
    "00100110" -> (0 * 256 + 5), "00100001" -> (0 * 256 + 6),
    "00100101" -> (1 * 256 + 3), "00100100" -> (3 * 256 + 2),
    "00100111" -> (10 * 256 + 1), "00100011" -> (11 * 256 + 1),
    "00100010" -> (12 * 256 + 1), "00100000" -> (13 * 256 + 1),
    "0000001010" -> (0 * 256 + 7), "0000001100" -> (1 * 256 + 4),
    "0000001011" -> (2 * 256 + 3), "0000001111" -> (4 * 256 + 2),
    "0000001001" -> (5 * 256 + 2), "0000001110" -> (14 * 256 + 1),
    "0000001101" -> (15 * 256 + 1), "0000001000" -> (16 * 256 + 1),
    "000000011101" -> (0 * 256 + 8), "000000011000" -> (0 * 256 + 9),
    "000000010011" -> (0 * 256 + 10), "000000010000" -> (0 * 256 + 11),
    "000000011011" -> (1 * 256 + 5), "000000010100" -> (2 * 256 + 4),
    "000000011100" -> (3 * 256 + 3), "000000010010" -> (4 * 256 + 3),
    "000000011110" -> (6 * 256 + 2), "000000010101" -> (7 * 256 + 2),
    "000000010001" -> (8 * 256 + 2), "000000011111" -> (17 * 256 + 1),
    "000000011010" -> (18 * 256 + 1), "000000011001" -> (19 * 256 + 1),
    "000000010111" -> (20 * 256 + 1), "000000010110" -> (21 * 256 + 1),
    "0000000011010" -> (0 * 256 + 12), "0000000011001" -> (0 * 256 + 13),
    "0000000011000" -> (0 * 256 + 14), "0000000010111" -> (0 * 256 + 15),
    "0000000010110" -> (1 * 256 + 6), "0000000010101" -> (1 * 256 + 7),
    "0000000010100" -> (2 * 256 + 5), "0000000010011" -> (3 * 256 + 4),
    "0000000010010" -> (5 * 256 + 3), "0000000010001" -> (9 * 256 + 2),
    "0000000010000" -> (10 * 256 + 2), "0000000011111" -> (22 * 256 + 1),
    "0000000011110" -> (23 * 256 + 1), "0000000011101" -> (24 * 256 + 1),
    "0000000011100" -> (25 * 256 + 1), "0000000011011" -> (26 * 256 + 1)))

  // ------------------------------------------------------------------
  // Bit I/O
  // ------------------------------------------------------------------

  private final class BitReader(bytes: Array[Byte]) {
    var bytePos = 0
    var bitPos = 0 // bits consumed of bytes(bytePos), 0..7

    def bit(): Int = {
      if (bytePos >= bytes.length) fail()
      val b = (bytes(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def mark(): Long = bytePos.toLong * 8 + bitPos
    def reset(m: Long): Unit = { bytePos = (m / 8).toInt; bitPos = (m % 8).toInt }

    /** True when the next 23 bits are zero (a start-code prefix follows)
      * or the stream is exhausted — the slice-termination condition.
      */
    def at23Zeros(): Boolean = {
      val m = mark()
      var i = 0; var zeros = true
      try {
        while (i < 23 && zeros) { if (bit() != 0) zeros = false; i += 1 }
      } catch { case _: MErr => zeros = true } // EOF inside the window
      reset(m)
      zeros
    }

    /** Byte-align, then scan to the next 00 00 01 xx start code and
      * consume it. Returns the code byte, or -1 at end of stream.
      */
    def nextStartCode(): Int = {
      if (bitPos != 0) { bitPos = 0; bytePos += 1 }
      var p = bytePos
      while (p + 3 < bytes.length &&
        !(bytes(p) == 0 && bytes(p + 1) == 0 && bytes(p + 2) == 1)) p += 1
      if (p + 3 >= bytes.length) { bytePos = bytes.length; -1 }
      else { bytePos = p + 4; bitPos = 0; bytes(p + 3) & 0xff }
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var buf = 0
    private var cnt = 0
    def putBit(b: Int): Unit = {
      buf = (buf << 1) | (b & 1); cnt += 1
      if (cnt == 8) { out.write(buf); buf = 0; cnt = 0 }
    }
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { putBit((v >> i) & 1); i -= 1 }
    }
    def align(): Unit = while (cnt != 0) putBit(0)
    def startCode(code: Int): Unit = {
      align(); out.write(0); out.write(0); out.write(1); out.write(code)
    }
    def toBytes: Array[Byte] = { align(); out.toByteArray }
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  /** Decode an MPEG-1 video elementary stream (I, P, B and D
    * pictures) into packed-RGB frames in DISPLAY order
    * (display-cropped). None on nonconforming streams — see the
    * object doc's scope contract.
    */
  def decodeMpeg1Frames(bytes: Array[Byte],
      maxTotalPixels: Long = MaxDecodeTotalPixels)
      : Option[(Int, Int, IndexedSeq[Array[Int]])] = {
    if (bytes == null || bytes.length < 16) return None
    try {
      val br = new BitReader(bytes)
      if (br.nextStartCode() != 0xb3) fail()
      val w = br.bits(12); val h = br.bits(12)
      if (w == 0 || h == 0) fail()
      if (w.toLong * h > MaxDecodePixels) fail()
      val aspect = br.bits(4); val rate = br.bits(4)
      if (aspect == 0 || rate == 0 || rate > 8) fail() // forbidden codes
      br.bits(18)
      if (br.bit() != 1) fail() // marker bit
      br.bits(10); br.bit()
      def loadMatrix(): Array[Int] = {
        val a = new Array[Int](64)
        var i = 0
        while (i < 64) {
          val v = br.bits(8); if (v == 0) fail()
          a(Jpeg.Zigzag(i)) = v; i += 1
        }
        a
      }
      val intraQ = if (br.bit() == 1) loadMatrix() else DefaultIntraQ
      val nonIntraQ = if (br.bit() == 1) loadMatrix() else DefaultNonIntraQ

      val mbW = (w + 15) / 16; val mbH = (h + 15) / 16
      if (mbH > 175) fail() // slice vertical_position is 8 bits, 1..175
      // Display-order output with the standard two-slot anchor reorder:
      // `future` is the most recent anchor (the P reference and the B
      // backward reference), `past` the one before it (the B forward
      // reference). An anchor is EMITTED when the next anchor arrives
      // (the B pictures between them display first) and the last one
      // at sequence end; B pictures emit immediately.
      val frames = ArrayBuffer.empty[Array[Int]]
      var past: Planes = null
      var future: Planes = null
      var nPics = 0 // decoded pictures — every one reaches the output
      // 11172-2 §2.4.1: a sequence containing D pictures contains ONLY
      // D pictures — a mix is nonconforming and gates to None
      var sawD = false; var sawNonD = false
      var done = false
      while (!done) {
        br.nextStartCode() match {
          case -1 | 0xb7 => done = true // EOF / sequence_end
          case 0xb8 => br.bits(27)      // GOP: time_code+closed+broken
          case 0xb2 | 0xb5 => ()        // user data / extension: skip to next code
          case 0xb3 =>                  // repeated sequence header: dims must hold
            if (br.bits(12) != w || br.bits(12) != h) fail()
          case 0x00 =>                  // picture
            if (nPics >= MaxDecodeFrames) fail()
            if ((nPics + 1L) * w * h > maxTotalPixels) fail()
            br.bits(10) // temporal_reference (reorder is rule-driven)
            val ptype = br.bits(3)
            if (ptype < 1 || ptype > 4) fail() // forbidden type codes
            if (ptype == 4) sawD = true else sawNonD = true
            if (sawD && sawNonD) return None // mixed D/non-D sequence
            if (ptype == 2 && future == null) fail() // P needs a reference
            if (ptype == 3 && (past == null || future == null)) return None
            br.bits(16)
            var fullPelF = false; var fCodeF = 1
            var fullPelB = false; var fCodeB = 1
            if (ptype == 2 || ptype == 3) {
              fullPelF = br.bit() == 1
              fCodeF = br.bits(3); if (fCodeF == 0) fail()
            }
            if (ptype == 3) {
              fullPelB = br.bit() == 1
              fCodeB = br.bits(3); if (fCodeB == 0) fail()
            }
            while (br.bit() == 1) br.bits(8) // extra_information_picture
            val rec = decodePicture(br, mbW, mbH, intraQ, nonIntraQ,
              ptype, fullPelF, fCodeF, fullPelB, fCodeB,
              fwdRef = if (ptype == 3) past else future,
              bwdRef = if (ptype == 3) future else null)
            nPics += 1
            if (ptype == 3 || ptype == 4) frames += toRgb(rec, w, h, mbW)
            else {
              // D pictures are never references (§2.4.4.1) and emit
              // immediately above; anchors hold until the next anchor
              if (future != null) frames += toRgb(future, w, h, mbW)
              past = future; future = rec
            }
          case _ => fail()
        }
      }
      if (future != null) frames += toRgb(future, w, h, mbW)
      if (frames.isEmpty) None else Some((w, h, frames.toIndexedSeq))
    } catch { case NonFatal(_) => None }
  }

  /** Reconstructed picture planes at full macroblock-grid size. */
  private final case class Planes(y: Array[Int], cb: Array[Int], cr: Array[Int])

  /** Crop to display size + 4:2:0 replication + the shared RGB step. */
  private def toRgb(p: Planes, w: Int, h: Int, mbW: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) = Jpeg.yccToRgb(p.y(y * mbW * 16 + x),
          p.cb((y / 2) * mbW * 8 + x / 2), p.cr((y / 2) * mbW * 8 + x / 2))
        x += 1
      }
      y += 1
    }
    out
  }

  /** All slices of one picture (I, P, B or D) → reconstructed planes
    * at full macroblock-grid size. Coverage is strict: every
    * macroblock decoded (or legally skipped, P/B only) exactly once.
    * `fwdRef` is the forward reference (the previous anchor for P,
    * the PAST anchor for B), `bwdRef` the backward reference (B only,
    * the FUTURE anchor).
    */
  private def decodePicture(br: BitReader, mbW: Int, mbH: Int,
      intraQ: Array[Int], nonIntraQ: Array[Int], ptype: Int,
      fullPelF: Boolean, fCodeF: Int, fullPelB: Boolean, fCodeB: Int,
      fwdRef: Planes, bwdRef: Planes): Planes = {
    val isD = ptype == 4
    val intra = ptype == 1 || isD // D pictures are all-intra, DC-only
    val isB = ptype == 3
    val lw = mbW * 16; val cw = mbW * 8
    val cur = Planes(new Array[Int](lw * mbH * 16),
      new Array[Int](cw * mbH * 8), new Array[Int](cw * mbH * 8))
    val covered = new Array[Boolean](mbW * mbH)
    var nCovered = 0

    def place(samples: Array[Int], plane: Array[Int], planeW: Int,
              x0: Int, y0: Int): Unit = {
      var yy = 0
      while (yy < 8) {
        System.arraycopy(samples, yy * 8, plane, (y0 + yy) * planeW + x0, 8)
        yy += 1
      }
    }

    /** 16×16 luma + 8×8 chroma copy from the forward reference at zero
      * MV — the P skipped-macroblock reconstruction.
      */
    def copyFromPrev(addr: Int): Unit = {
      val mx = addr % mbW; val my = addr / mbW
      var yy = 0
      while (yy < 16) {
        val off = (my * 16 + yy) * lw + mx * 16
        System.arraycopy(fwdRef.y, off, cur.y, off, 16)
        yy += 1
      }
      yy = 0
      while (yy < 8) {
        val off = (my * 8 + yy) * cw + mx * 8
        System.arraycopy(fwdRef.cb, off, cur.cb, off, 8)
        System.arraycopy(fwdRef.cr, off, cur.cr, off, 8)
        yy += 1
      }
    }

    /** Full macroblock prediction (16×16 luma + two 8×8 chroma) from
      * the active directions in CODED half-pel units; both on means
      * bidirectional interpolation — the per-sample round-half-away
      * average (11172-2 2.4.4.3; pels are non-negative, so +1 >> 1).
      * Chroma vectors are the luma ones halved with truncation toward
      * zero, per the standard's integer division.
      */
    def predictMb(mbX: Int, mbY: Int, useF: Boolean, fh: Int, fv: Int,
        useB: Boolean, bh: Int, bv: Int)
        : (Array[Int], Array[Int], Array[Int]) = {
      def one(ref: Planes, dxH: Int, dyH: Int) = (
        predictBlock(ref.y, lw, mbH * 16, mbX * 16, mbY * 16, 16, dxH, dyH),
        predictBlock(ref.cb, cw, mbH * 8, mbX * 8, mbY * 8, 8, dxH / 2, dyH / 2),
        predictBlock(ref.cr, cw, mbH * 8, mbX * 8, mbY * 8, 8, dxH / 2, dyH / 2))
      def avg(a: Array[Int], b: Array[Int]): Array[Int] = {
        val out = new Array[Int](a.length)
        var i = 0
        while (i < a.length) { out(i) = (a(i) + b(i) + 1) >> 1; i += 1 }
        out
      }
      val f =
        if (useF) one(fwdRef, if (fullPelF) fh * 2 else fh,
          if (fullPelF) fv * 2 else fv)
        else null
      val b =
        if (useB) one(bwdRef, if (fullPelB) bh * 2 else bh,
          if (fullPelB) bv * 2 else bv)
        else null
      if (f != null && b != null) (avg(f._1, b._1), avg(f._2, b._2), avg(f._3, b._3))
      else if (f != null) f
      else if (b != null) b
      else fail()
    }

    var sliceLoop = true
    while (sliceLoop) {
      val m = br.mark()
      val code = br.nextStartCode()
      if (code >= 0x01 && code <= 0xaf) {
        val mbRow = code - 1
        if (mbRow >= mbH) fail()
        var q = br.bits(5); if (q == 0) fail()
        while (br.bit() == 1) br.bits(8) // extra_information_slice
        // DC predictors (reset at slice start and after any non-intra
        // or skipped macroblock) and MV predictors (reset at slice
        // start, after intra, and — P only — after skip and No-MC
        // macroblocks; B skip REUSES the previous macroblock's
        // direction flags and vectors, 11172-2 2.4.4.4)
        val pred = Array(1024, 1024, 1024)
        var dcValid = false
        var mvFH = 0; var mvFV = 0 // forward predictor pair
        var mvBH = 0; var mvBV = 0 // backward predictor pair (B only)
        var prevFwd = false; var prevBwd = false // last MB's directions
        var mbAddr = mbRow * mbW - 1
        var first = true
        var mbLoop = true
        while (mbLoop) {
          var inc = 0
          var more = true
          while (more) {
            AddrIncVlc.decode(br) match {
              case AddrStuffing => ()
              case AddrEscape   => inc += 33
              case v            => inc += v; more = false
            }
          }
          // a slice must start at its row's first column (coverage)
          if (first && mbAddr + inc != mbRow * mbW) fail()
          if (inc > 1) {
            // skipped macroblocks: forbidden in I pictures and as the
            // first macroblock of a slice; in P they copy the forward
            // reference at zero MV, in B they repeat the previous
            // macroblock's prediction (same directions, same vectors,
            // no residual — so the MB before a skip cannot be intra)
            if (intra || first) fail()
            if (isB && !prevFwd && !prevBwd) fail()
            var a = mbAddr + 1
            while (a < mbAddr + inc) {
              if (a >= mbW * mbH || covered(a)) fail()
              covered(a) = true; nCovered += 1
              if (isB) {
                val (py, pcb, pcr) = predictMb(a % mbW, a / mbW,
                  prevFwd, mvFH, mvFV, prevBwd, mvBH, mvBV)
                var yy = 0
                while (yy < 16) {
                  System.arraycopy(py, yy * 16, cur.y,
                    ((a / mbW) * 16 + yy) * lw + (a % mbW) * 16, 16)
                  yy += 1
                }
                place(pcb, cur.cb, cw, (a % mbW) * 8, (a / mbW) * 8)
                place(pcr, cur.cr, cw, (a % mbW) * 8, (a / mbW) * 8)
              } else copyFromPrev(a)
              a += 1
            }
            dcValid = false
            if (!isB) { mvFH = 0; mvFV = 0 }
          }
          first = false
          mbAddr += inc
          if (mbAddr >= mbW * mbH) fail()
          if (covered(mbAddr)) fail()
          covered(mbAddr) = true; nCovered += 1

          // macroblock_type
          var quantF = false; var fwdF = false; var bwdF = false
          var codedF = false; var intraF = false
          if (isD) {
            // D pictures: table B.4 has the single entry '1' (intra,
            // no quant variant)
            intraF = true
            if (br.bit() != 1) fail()
          } else if (intra) {
            // I pictures: '1' intra, '01' intra + quant
            intraF = true
            if (br.bit() != 1) {
              if (br.bit() != 1) fail()
              quantF = true
            }
          } else if (isB) {
            val t = BTypeVlc.decode(br)
            quantF = (t & 16) != 0; fwdF = (t & 8) != 0
            bwdF = (t & 4) != 0; codedF = (t & 2) != 0
            intraF = (t & 1) != 0
          } else {
            val t = PTypeVlc.decode(br)
            quantF = (t & 8) != 0; fwdF = (t & 4) != 0
            codedF = (t & 2) != 0; intraF = (t & 1) != 0
          }
          if (quantF) { q = br.bits(5); if (q == 0) fail() }

          val mbX = mbAddr % mbW; val mbY = mbAddr / mbW
          if (intraF) {
            if (!dcValid) { pred(0) = 1024; pred(1) = 1024; pred(2) = 1024 }
            dcValid = true
            mvFH = 0; mvFV = 0; mvBH = 0; mvBV = 0
            prevFwd = false; prevBwd = false
            var b = 0
            while (b < 6) {
              val comp = if (b < 4) 0 else b - 3
              val samples =
                if (isD) decodeDcOnlyBlock(br, comp, pred)
                else decodeIntraBlock(br, comp, q, intraQ, pred)
              if (b < 4)
                place(samples, cur.y, lw, mbX * 16 + (b % 2) * 8,
                  mbY * 16 + (b / 2) * 8)
              else
                place(samples, if (b == 4) cur.cb else cur.cr, cw,
                  mbX * 8, mbY * 8)
              b += 1
            }
            // end_of_macroblock marker, D pictures only (§2.4.2.7)
            if (isD && br.bit() != 1) fail()
          } else {
            dcValid = false
            if (fwdF) {
              mvFH = decodeMv(br, fCodeF, mvFH)
              mvFV = decodeMv(br, fCodeF, mvFV)
            } else if (!isB) { mvFH = 0; mvFV = 0 } // P No-MC resets
            if (bwdF) {
              mvBH = decodeMv(br, fCodeB, mvBH)
              mvBV = decodeMv(br, fCodeB, mvBV)
            }
            prevFwd = fwdF; prevBwd = bwdF
            // P always predicts forward (No-MC is the zero vector)
            val (py, pcb, pcr) = predictMb(mbX, mbY,
              useF = !isB || fwdF, mvFH, mvFV,
              useB = isB && bwdF, mvBH, mvBV)
            val cbp = if (codedF) CbpVlc.decode(br) else 0
            var b = 0
            while (b < 6) {
              val res: Array[Int] =
                if ((cbp & (32 >> b)) != 0)
                  idctResidual(decodeNonIntraBlock(br, q, nonIntraQ))
                else null
              val out = new Array[Int](64)
              var i = 0
              while (i < 64) {
                val base =
                  if (b < 4) py(((b / 2) * 8 + i / 8) * 16 + (b % 2) * 8 + i % 8)
                  else if (b == 4) pcb(i)
                  else pcr(i)
                val v = base + (if (res == null) 0 else res(i))
                out(i) = if (v < 0) 0 else if (v > 255) 255 else v
                i += 1
              }
              if (b < 4)
                place(out, cur.y, lw, mbX * 16 + (b % 2) * 8,
                  mbY * 16 + (b / 2) * 8)
              else
                place(out, if (b == 4) cur.cb else cur.cr, cw, mbX * 8, mbY * 8)
              b += 1
            }
          }
          if (br.at23Zeros()) mbLoop = false
        }
      } else {
        br.reset(m) // not a slice: the caller dispatches this code
        sliceLoop = false
      }
    }
    if (nCovered != mbW * mbH) fail() // every macroblock exactly once
    cur
  }

  /** One forward motion-vector component: magnitude VLC + sign +
    * residual bits, reconstructed with the 11172-2 2.4.4.2 modular
    * wrap into [−16f, 16f−1]. Returned in the coded unit (half-pel, or
    * full-pel under the picture's full_pel flag — the caller scales).
    */
  private def decodeMv(br: BitReader, fCode: Int, pred: Int): Int = {
    val mag = MvVlc.decode(br)
    val code = if (mag == 0) 0 else if (br.bit() == 1) -mag else mag
    val f = 1 << (fCode - 1)
    val delta =
      if (code == 0) 0
      else {
        val r = if (f > 1) br.bits(fCode - 1) else 0
        val v = 1 + (mag - 1) * f + r
        if (code < 0) -v else v
      }
    var nv = pred + delta
    val range = 16 * f
    if (nv > range - 1) nv -= 2 * range
    if (nv < -range) nv += 2 * range
    nv
  }

  /** size×size forward prediction from the reference plane at a
    * half-pel displacement; half-sample positions average with the
    * standard's round-half-away (pels are non-negative, so +1 >> 1 /
    * +2 >> 2). Vectors pointing outside the reference gate to None.
    */
  private def predictBlock(plane: Array[Int], planeW: Int, planeH: Int,
      x0: Int, y0: Int, size: Int, dHalfX: Int, dHalfY: Int): Array[Int] = {
    val ix = x0 + (dHalfX >> 1); val iy = y0 + (dHalfY >> 1)
    val hx = dHalfX & 1; val hy = dHalfY & 1
    if (ix < 0 || iy < 0 || ix + size + hx > planeW || iy + size + hy > planeH)
      fail()
    val out = new Array[Int](size * size)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        val a = plane((iy + y) * planeW + ix + x)
        out(y * size + x) =
          if (hx == 0 && hy == 0) a
          else if (hx == 1 && hy == 0)
            (a + plane((iy + y) * planeW + ix + x + 1) + 1) >> 1
          else if (hx == 0 && hy == 1)
            (a + plane((iy + y + 1) * planeW + ix + x) + 1) >> 1
          else
            (a + plane((iy + y) * planeW + ix + x + 1) +
              plane((iy + y + 1) * planeW + ix + x) +
              plane((iy + y + 1) * planeW + ix + x + 1) + 2) >> 2
        x += 1
      }
      y += 1
    }
    out
  }

  /** One non-intra block: dct_coeff_first (where '1'+sign is (0, ±1)
    * and EOB cannot occur) then dct_coeff_next to EOB; non-intra
    * dequant (2·L + sign, flat-16 default matrix) with oddification.
    * Returns RAW coefficients (raster order) for [[idctResidual]].
    */
  private def decodeNonIntraBlock(br: BitReader, q: Int,
      w: Array[Int]): Array[Int] = {
    val coefs = new Array[Int](64)
    var zz = -1
    val m = br.mark()
    if (br.bit() == 1) {
      val level = if (br.bit() == 1) -1 else 1
      zz = 0
      coefs(Jpeg.Zigzag(0)) = dequantNonIntra(level, q, w, 0)
    } else {
      br.reset(m)
      CoefVlc.decode(br) match {
        case CoefEob => fail() // EOB cannot be the first coefficient
        case CoefEscape =>
          val run = br.bits(6)
          val level = escapeLevel(br)
          zz = run
          if (zz > 63) fail()
          coefs(Jpeg.Zigzag(zz)) = dequantNonIntra(level, q, w, zz)
        case rl =>
          val run = rl >> 8; val mag = rl & 0xff
          val level = if (br.bit() == 1) -mag else mag
          zz = run
          if (zz > 63) fail()
          coefs(Jpeg.Zigzag(zz)) = dequantNonIntra(level, q, w, zz)
      }
    }
    var eob = false
    while (!eob) {
      CoefVlc.decode(br) match {
        case CoefEob => eob = true
        case CoefEscape =>
          val run = br.bits(6)
          val level = escapeLevel(br)
          zz += run + 1
          if (zz > 63) fail()
          coefs(Jpeg.Zigzag(zz)) = dequantNonIntra(level, q, w, zz)
        case rl =>
          val run = rl >> 8; val mag = rl & 0xff
          val level = if (br.bit() == 1) -mag else mag
          zz += run + 1
          if (zz > 63) fail()
          coefs(Jpeg.Zigzag(zz)) = dequantNonIntra(level, q, w, zz)
      }
    }
    coefs
  }

  /** ESCAPE-coded level: 8-bit signed, with the 16-bit double-byte
    * forms for |level| ≥ 128.
    */
  private def escapeLevel(br: BitReader): Int = {
    val l8 = br.bits(8)
    val level =
      if (l8 == 0) { val b = br.bits(8); if (b < 128) fail(); b }
      else if (l8 == 128) { val b = br.bits(8); b - 256 }
      else if (l8 < 128) l8
      else l8 - 256
    if (level == 0) fail()
    level
  }

  /** Non-intra dequant: ((2·L + Sign(L))·q·W)/16 truncated toward
    * zero, forced odd, saturated.
    */
  private def dequantNonIntra(level: Int, q: Int, w: Array[Int], zz: Int): Int = {
    var v = (2 * level + Integer.signum(level)) * q * w(Jpeg.Zigzag(zz)) / 16
    if ((v & 1) == 0) v -= Integer.signum(v)
    if (v > 2047) 2047 else if (v < -2048) -2048 else v
  }

  // IDCT basis for residual blocks (no +128, no clamp — residuals are
  // signed corrections added to the motion-compensated prediction)
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Inverse DCT of a RESIDUAL block: rounded, unshifted, unclamped
    * (the pixel clamp happens after adding the prediction).
    */
  private def idctResidual(coef: Array[Int]): Array[Int] = {
    val t = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += Basis(u)(x) * coef(v * 8 + u); u += 1 }
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
        while (vv < 8) { s += Basis(vv)(y) * t(vv * 8 + x); vv += 1 }
        out(y * 8 + x) = Math.round(s).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** One intra block: DC size/differential + AC run-levels to EOB,
    * dequantized with oddification, through the shared IDCT.
    */
  private def decodeIntraBlock(br: BitReader, comp: Int, q: Int,
      intraQ: Array[Int], pred: Array[Int]): Array[Int] = {
    val coefs = new Array[Int](64)
    val size = (if (comp == 0) DcSizeLumaVlc else DcSizeChromaVlc).decode(br)
    val diff =
      if (size == 0) 0
      else {
        val v = br.bits(size)
        if ((v & (1 << (size - 1))) != 0) v else v - (1 << size) + 1
      }
    var dc = pred(comp) + diff * 8
    // clamp keeps a hostile differential chain inside coefficient range
    if (dc > 2047) dc = 2047 else if (dc < -2048) dc = -2048
    pred(comp) = dc
    coefs(0) = dc
    var zz = 0
    var eob = false
    while (!eob) {
      CoefVlc.decode(br) match {
        case CoefEob => eob = true
        case CoefEscape =>
          val run = br.bits(6)
          val l8 = br.bits(8)
          val level =
            if (l8 == 0) { val b = br.bits(8); if (b < 128) fail(); b }
            else if (l8 == 128) { val b = br.bits(8); b - 256 }
            else if (l8 < 128) l8
            else l8 - 256
          zz += run + 1
          if (zz > 63 || level == 0) fail()
          coefs(Jpeg.Zigzag(zz)) = dequantIntra(level, q, intraQ, zz)
        case rl =>
          val run = rl >> 8; val mag = rl & 0xff
          val level = if (br.bit() == 1) -mag else mag
          zz += run + 1
          if (zz > 63) fail()
          coefs(Jpeg.Zigzag(zz)) = dequantIntra(level, q, intraQ, zz)
      }
    }
    // shared IDCT: MPEG's un-shifted DC minus 1024 == JPEG's +128 form
    coefs(0) -= 1024
    Jpeg.idct(coefs)
  }

  /** One D-picture block: DC size/differential ONLY — no AC scan and
    * no end_of_block (11172-2 block() syntax under picture_coding_type
    * 4); the same DC-prediction chain and fixed step-8 DC quant as
    * intra blocks, through the shared IDCT (a DC-only block is flat,
    * so the transform is exact).
    */
  private def decodeDcOnlyBlock(br: BitReader, comp: Int,
      pred: Array[Int]): Array[Int] = {
    val coefs = new Array[Int](64)
    val size = (if (comp == 0) DcSizeLumaVlc else DcSizeChromaVlc).decode(br)
    val diff =
      if (size == 0) 0
      else {
        val v = br.bits(size)
        if ((v & (1 << (size - 1))) != 0) v else v - (1 << size) + 1
      }
    var dc = pred(comp) + diff * 8
    if (dc > 2047) dc = 2047 else if (dc < -2048) dc = -2048
    pred(comp) = dc
    coefs(0) = dc - 1024 // shared IDCT's +128 convention (see intra)
    Jpeg.idct(coefs)
  }

  /** Intra dequant: (2·level·q·W)/16 truncated toward zero, forced odd
    * (mismatch control), saturated to the coefficient range.
    */
  private def dequantIntra(level: Int, q: Int, intraQ: Array[Int], zz: Int): Int = {
    var v = 2 * level * q * intraQ(Jpeg.Zigzag(zz)) / 16
    if ((v & 1) == 0) v -= Integer.signum(v)
    if (v > 2047) 2047 else if (v < -2048) -2048 else v
  }

  // ------------------------------------------------------------------
  // Encoder (I-frames, block-constant-friendly but general DC-wise)
  // ------------------------------------------------------------------

  /** One frame for [[buildMpeg1I]]: per-8×8-block luma values
    * ((mbW·2)·(mbH·2), row-major) and per-macroblock chroma values
    * (mbW·mbH each), all 0..255 — DC-only blocks, which round-trip
    * EXACTLY through quant 8 and the IDCT (flat blocks have no AC).
    */
  final case class Mpeg1Frame(yDc: Array[Int], cbDc: Array[Int], crDc: Array[Int])

  /** One picture for [[buildMpeg1]]: intra, or zero-MV predicted. */
  sealed trait Mp1Picture
  /** Intra picture carrying the [[Mpeg1Frame]] grids. */
  final case class IPicture(f: Mpeg1Frame) extends Mp1Picture
  /** Predicted picture, zero motion: per-8×8-block ODD luma deltas in
    * ±{3, 5, 7, …} (chroma unchanged). Every macroblock is a No-MC
    * Coded macroblock (type '01'), CBP 60 (the four luma blocks),
    * residual DC escape-coded with level (|D|−1)/2·sign(D) — which
    * dequantizes (q 8, flat-16 matrix, oddification) to 16·L±7, whose
    * DC-only residual IDCT rounds to exactly D per pixel. The delta
    * algebra is therefore closed-form replayable by an oracle.
    */
  final case class PPicture(yDelta: Array[Int]) extends Mp1Picture
  /** Bidirectional picture, zero motion: `mode` 1 = forward-only
    * (predicts from the PAST anchor), 2 = backward-only (the FUTURE
    * anchor), 3 = interpolated (the per-sample round-half-away average
    * of both). `yDelta` is null for a not-coded picture, else the
    * [[PPicture]] odd-delta residual family on the four luma blocks.
    * Passed in DECODE order (after the two anchors it references); the
    * builder assigns display-order temporal references.
    */
  final case class BPicture(mode: Int, yDelta: Array[Int]) extends Mp1Picture
  /** DC-only trick-mode picture (type 4) carrying the same
    * [[Mpeg1Frame]] grids as an intra picture — blocks code the DC
    * chain only (no AC, no EOB) and each macroblock ends with the
    * end_of_macroblock marker. A stream with any D picture must be
    * ALL D pictures (11172-2 §2.4.1), which [[buildMpeg1]] enforces.
    */
  final case class DPicture(f: Mpeg1Frame) extends Mp1Picture

  /** Serialize intra frames into a conforming MPEG-1 video elementary
    * stream — the I-only form of [[buildMpeg1]].
    */
  def buildMpeg1I(width: Int, height: Int,
      frames: IndexedSeq[Mpeg1Frame]): Array[Byte] =
    buildMpeg1(width, height, frames.map(IPicture))

  /** Serialize an I/P/B (or all-D) picture sequence (DECODE order)
    * into a conforming MPEG-1 video elementary stream: sequence
    * header (default matrices), GOP, one slice per macroblock row,
    * display-order temporal references derived from the decode-order
    * structure (the B pictures following an anchor display BEFORE
    * it). The first picture must be intra; every B picture must
    * follow at least two anchors; D pictures may only appear in an
    * all-D sequence (where display order is decode order).
    */
  def buildMpeg1(width: Int, height: Int,
      pics: IndexedSeq[Mp1Picture]): Array[Byte] = {
    require(width > 0 && height > 0 && width % 16 == 0 && height % 16 == 0,
      s"builder requires macroblock-aligned dims, got ${width}x$height")
    require(pics.nonEmpty, "at least one picture")
    val anyD = pics.exists(_.isInstanceOf[DPicture])
    require(!anyD || pics.forall(_.isInstanceOf[DPicture]),
      "a sequence with D pictures must be all-D (11172-2 2.4.1)")
    require(anyD || pics.head.isInstanceOf[IPicture],
      "first picture must be intra")
    val mbW = width / 16; val mbH = height / 16
    require(mbH <= 175, s"height $height exceeds slice vertical-position range")
    var anchorsSeen = 0
    pics.foreach {
      case DPicture(f) =>
        require(f.yDc.length == mbW * 2 * mbH * 2 &&
          f.cbDc.length == mbW * mbH && f.crDc.length == mbW * mbH,
          "frame grids must match dimensions")
      case IPicture(f) =>
        require(f.yDc.length == mbW * 2 * mbH * 2 &&
          f.cbDc.length == mbW * mbH && f.crDc.length == mbW * mbH,
          "frame grids must match dimensions")
        anchorsSeen += 1
      case PPicture(d) =>
        require(d.length == mbW * 2 * mbH * 2, "delta grid must match dims")
        require(d.forall(v => (v % 2 != 0) && math.abs(v) >= 3 &&
          math.abs(v) <= 255), "P deltas must be odd with 3 <= |D| <= 255")
        anchorsSeen += 1
      case BPicture(mode, d) =>
        require(mode >= 1 && mode <= 3, s"B mode must be 1..3, got $mode")
        require(anchorsSeen >= 2, "B pictures need two preceding anchors")
        if (d != null) {
          require(d.length == mbW * 2 * mbH * 2, "delta grid must match dims")
          require(d.forall(v => (v % 2 != 0) && math.abs(v) >= 3 &&
            math.abs(v) <= 255), "B deltas must be odd with 3 <= |D| <= 255")
        }
    }
    // Display-order temporal references from decode order: each
    // anchor's tr clears the B run that follows it (those Bs display
    // between the PREVIOUS anchor and this one).
    val trs = new Array[Int](pics.length)
    var lastAnchorTr = -1
    var i = 0
    while (i < pics.length) {
      var nB = 0
      while (i + 1 + nB < pics.length &&
        pics(i + 1 + nB).isInstanceOf[BPicture]) nB += 1
      trs(i) = lastAnchorTr + 1 + nB
      var k = 0
      while (k < nB) { trs(i + 1 + k) = lastAnchorTr + 1 + k; k += 1 }
      lastAnchorTr = trs(i)
      i += 1 + nB
    }
    val bw = new BitWriter
    bw.startCode(0xb3)
    bw.putBits(width, 12); bw.putBits(height, 12)
    bw.putBits(1, 4)         // pel aspect 1:1
    bw.putBits(5, 4)         // picture_rate code 5 = 30 fps
    bw.putBits(0x3ffff, 18)  // bit_rate: variable
    bw.putBit(1)             // marker
    bw.putBits(0, 10); bw.putBit(0)
    bw.putBit(0); bw.putBit(0) // default quant matrices
    bw.startCode(0xb8)
    // time_code: drop 0, hh 0, mm 0, marker 1, ss 0, ff 0
    bw.putBit(0); bw.putBits(0, 5); bw.putBits(0, 6); bw.putBit(1)
    bw.putBits(0, 6); bw.putBits(0, 6)
    bw.putBit(1); bw.putBit(0) // closed_gop, broken_link

    def putDcDiff(diff: Int, chroma: Boolean): Unit = {
      val size = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (codes, lens): (Array[Int], Array[Int]) =
        if (chroma) (Array(0, 1, 2, 6, 14, 30, 62, 126, 254),
          Array(2, 2, 2, 3, 4, 5, 6, 7, 8))
        else (Array(4, 0, 1, 5, 6, 14, 30, 62, 126),
          Array(3, 2, 2, 3, 3, 4, 5, 6, 7))
      bw.putBits(codes(size), lens(size))
      if (size > 0)
        bw.putBits(if (diff > 0) diff else diff + (1 << size) - 1, size)
    }

    pics.zipWithIndex.foreach { case (pic, idx) =>
      bw.startCode(0x00)
      bw.putBits(trs(idx) % 1024, 10)
      bw.putBits(pic match {
        case _: IPicture => 1
        case _: PPicture => 2
        case _: BPicture => 3
        case _: DPicture => 4
      }, 3)
      bw.putBits(0xffff, 16)  // vbv_delay
      pic match {
        case _: PPicture =>
          bw.putBit(0)        // full_pel_forward_vector: half-pel units
          bw.putBits(1, 3)    // forward_f_code 1
        case _: BPicture =>
          bw.putBit(0); bw.putBits(1, 3) // forward: half-pel, f_code 1
          bw.putBit(0); bw.putBits(1, 3) // backward: half-pel, f_code 1
        case _ => ()
      }
      bw.putBit(0)            // extra_bit_picture
      var row = 0
      while (row < mbH) {
        bw.startCode(row + 1)
        bw.putBits(8, 5)      // quantizer_scale
        bw.putBit(0)          // extra_bit_slice
        var predY = 128; var predCb = 128; var predCr = 128
        var mbX = 0
        while (mbX < mbW) {
          bw.putBit(1)        // address increment 1
          pic match {
            case DPicture(f) =>
              bw.putBit(1)    // type: the single table-B.4 entry
              var b = 0
              while (b < 4) {
                val v = f.yDc((row * 2 + b / 2) * mbW * 2 + mbX * 2 + b % 2)
                putDcDiff(v - predY, chroma = false); predY = v
                b += 1       // DC only: no AC run-levels, no EOB
              }
              val cb = f.cbDc(row * mbW + mbX)
              putDcDiff(cb - predCb, chroma = true); predCb = cb
              val cr = f.crDc(row * mbW + mbX)
              putDcDiff(cr - predCr, chroma = true); predCr = cr
              bw.putBit(1)    // end_of_macroblock
            case IPicture(f) =>
              bw.putBit(1)    // type: intra
              var b = 0
              while (b < 4) {
                val v = f.yDc((row * 2 + b / 2) * mbW * 2 + mbX * 2 + b % 2)
                putDcDiff(v - predY, chroma = false); predY = v
                bw.putBits(2, 2) // EOB
                b += 1
              }
              val cb = f.cbDc(row * mbW + mbX)
              putDcDiff(cb - predCb, chroma = true); predCb = cb
              bw.putBits(2, 2)
              val cr = f.crDc(row * mbW + mbX)
              putDcDiff(cr - predCr, chroma = true); predCr = cr
              bw.putBits(2, 2)
            case PPicture(deltas) =>
              bw.putBits(1, 2)  // type '01': No MC, coded
              bw.putBits(7, 3)  // CBP 60 = '111' (four luma blocks)
              var b = 0
              while (b < 4) {
                val d = deltas((row * 2 + b / 2) * mbW * 2 + mbX * 2 + b % 2)
                val level = if (d > 0) (d - 1) / 2 else (d + 1) / 2
                bw.putBits(1, 6)  // dct_coeff ESCAPE
                bw.putBits(0, 6)  // run 0
                bw.putBits(level & 0xff, 8)
                bw.putBits(2, 2)  // EOB
                b += 1
              }
            case BPicture(mode, deltas) =>
              // macroblock_type (table B.2c): zero-MV prediction in
              // the given direction(s), coded iff deltas are present
              val coded = deltas != null
              mode match {
                case 1 => bw.putBits(if (coded) 3 else 2, 4) // fwd
                case 2 => bw.putBits(if (coded) 3 else 2, 3) // bwd
                case _ => bw.putBits(if (coded) 3 else 2, 2) // interp
              }
              // motion_code 0 ('1') per active direction component —
              // predictors start at 0 each slice, so these stay zero
              if (mode != 2) { bw.putBit(1); bw.putBit(1) }
              if (mode != 1) { bw.putBit(1); bw.putBit(1) }
              if (coded) {
                bw.putBits(7, 3) // CBP 60 (four luma blocks)
                var b = 0
                while (b < 4) {
                  val d = deltas((row * 2 + b / 2) * mbW * 2 + mbX * 2 + b % 2)
                  val level = if (d > 0) (d - 1) / 2 else (d + 1) / 2
                  bw.putBits(1, 6); bw.putBits(0, 6)
                  bw.putBits(level & 0xff, 8)
                  bw.putBits(2, 2)
                  b += 1
                }
              }
          }
          mbX += 1
        }
        row += 1
      }
    }
    bw.startCode(0xb7)
    bw.toBytes
  }
}
