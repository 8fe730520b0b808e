package graft.operators

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

/** REAL MPEG-1 video (ISO/IEC 11172-2) — INTRA-ONLY decode + a conforming
  * I-frame encoder, the second genuine video codec arm next to the
  * MJPEG-AVI path (see [[Avi]]): sequence/GOP/picture/slice/macroblock
  * layers, the standard DC-size and AC run-level VLC families, default
  * and stream-loaded intra quantizer matrices, dequantization with the
  * oddification (mismatch-control) rule, and the shared 8×8 IDCT from
  * [[Jpeg]] — MPEG-1's DCT is the same transform with an un-level-shifted
  * DC, so `Jpeg.idct(coefs with DC−1024)` reconstructs MPEG samples
  * bit-exactly (the DC basis contributes DC/8 uniformly; subtracting
  * 1024 = 128·8 converts to JPEG's +128 convention).
  *
  * Scope contract (the codec-family narrowing discipline): streams whose
  * pictures are ALL intra-coded (type I) decode fully; the first P/B
  * picture gates the WHOLE stream to None — inter-frame prediction is
  * the one video feature this engine still stands in for, now at
  * PICTURE granularity instead of format granularity. Two more
  * documented bounds: (a) the AC coefficient VLC table is implemented
  * through its 13-bit codes plus the fixed-format ESCAPE form — any
  * conforming encoder can escape-code the rare longer entries, and this
  * encoder always does; an unmatched longer prefix gates to None;
  * (b) macroblock address increments ≠ 1 (legal syntax, but skipped
  * macroblocks are forbidden in I pictures) gate to None.
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

  /** Decode an MPEG-1 video elementary stream of INTRA pictures into
    * packed-RGB frames (display-cropped). None on anything else — see
    * the object doc's scope contract.
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
      val intraQ =
        if (br.bit() == 1) {
          val a = new Array[Int](64)
          var i = 0
          while (i < 64) {
            val v = br.bits(8); if (v == 0) fail()
            a(Jpeg.Zigzag(i)) = v; i += 1
          }
          a
        } else DefaultIntraQ
      if (br.bit() == 1) { var i = 0; while (i < 64) { br.bits(8); i += 1 } }

      val mbW = (w + 15) / 16; val mbH = (h + 15) / 16
      if (mbH > 175) fail() // slice vertical_position is 8 bits, 1..175
      val frames = ArrayBuffer.empty[Array[Int]]
      var done = false
      while (!done) {
        br.nextStartCode() match {
          case -1 | 0xb7 => done = true // EOF / sequence_end
          case 0xb8 => br.bits(27)      // GOP: time_code+closed+broken
          case 0xb2 | 0xb5 => ()        // user data / extension: skip to next code
          case 0xb3 =>                  // repeated sequence header: dims must hold
            if (br.bits(12) != w || br.bits(12) != h) fail()
          case 0x00 =>                  // picture
            if (frames.length >= MaxDecodeFrames) fail()
            if ((frames.length + 1L) * w * h > maxTotalPixels) fail()
            br.bits(10)
            if (br.bits(3) != 1) return None // inter-coded picture: gate
            br.bits(16)
            while (br.bit() == 1) br.bits(8) // extra_information_picture
            frames += decodePicture(br, w, h, mbW, mbH, intraQ)
          case _ => fail()
        }
      }
      if (frames.isEmpty) None else Some((w, h, frames.toIndexedSeq))
    } catch { case NonFatal(_) => None }
  }

  /** All slices of one intra picture → packed-RGB display pixels. */
  private def decodePicture(br: BitReader, w: Int, h: Int,
      mbW: Int, mbH: Int, intraQ: Array[Int]): Array[Int] = {
    val yPlane = new Array[Int](mbW * 16 * mbH * 16)
    val cbPlane = new Array[Int](mbW * 8 * mbH * 8)
    val crPlane = new Array[Int](mbW * 8 * mbH * 8)
    val covered = new Array[Boolean](mbW * mbH)
    var nCovered = 0
    var sliceLoop = true
    while (sliceLoop) {
      val m = br.mark()
      val code = br.nextStartCode()
      if (code >= 0x01 && code <= 0xaf) {
        val mbRow = code - 1
        if (mbRow >= mbH) fail()
        var q = br.bits(5); if (q == 0) fail()
        while (br.bit() == 1) br.bits(8) // extra_information_slice
        // DC predictors reset at slice start (128·8 = 1024)
        val pred = Array(1024, 1024, 1024)
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
          // skipped macroblocks are forbidden in I pictures; a slice
          // must also start at its row's first column for full coverage
          if (inc != 1 || (first && mbAddr + inc != mbRow * mbW)) fail()
          first = false
          mbAddr += inc
          if (mbAddr >= mbW * mbH) fail()
          if (covered(mbAddr)) fail()
          covered(mbAddr) = true; nCovered += 1
          // macroblock_type, I pictures: '1' intra, '01' intra + quant
          if (br.bit() != 1) {
            if (br.bit() != 1) fail()
            q = br.bits(5); if (q == 0) fail()
          }
          val mbX = mbAddr % mbW; val mbY = mbAddr / mbW
          var b = 0
          while (b < 6) {
            val comp = if (b < 4) 0 else b - 3 // 0=Y, 1=Cb, 2=Cr
            val samples = decodeIntraBlock(br, comp, q, intraQ, pred)
            if (b < 4) {
              val x0 = mbX * 16 + (b % 2) * 8; val y0 = mbY * 16 + (b / 2) * 8
              var yy = 0
              while (yy < 8) {
                System.arraycopy(samples, yy * 8, yPlane,
                  (y0 + yy) * mbW * 16 + x0, 8)
                yy += 1
              }
            } else {
              val plane = if (b == 4) cbPlane else crPlane
              val x0 = mbX * 8; val y0 = mbY * 8
              var yy = 0
              while (yy < 8) {
                System.arraycopy(samples, yy * 8, plane,
                  (y0 + yy) * mbW * 8 + x0, 8)
                yy += 1
              }
            }
            b += 1
          }
          if (br.at23Zeros()) mbLoop = false
        }
      } else {
        br.reset(m) // not a slice: the caller dispatches this code
        sliceLoop = false
      }
    }
    if (nCovered != mbW * mbH) fail() // every macroblock exactly once
    // crop + 4:2:0 chroma replication + shared fixed-point RGB step
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) = Jpeg.yccToRgb(yPlane(y * mbW * 16 + x),
          cbPlane((y / 2) * mbW * 8 + x / 2), crPlane((y / 2) * mbW * 8 + x / 2))
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

  /** Serialize intra frames into a conforming MPEG-1 video elementary
    * stream: sequence header (default matrices), GOP, one picture per
    * frame, one slice per macroblock row, every macroblock intra.
    */
  def buildMpeg1I(width: Int, height: Int,
      frames: IndexedSeq[Mpeg1Frame]): Array[Byte] = {
    require(width > 0 && height > 0 && width % 16 == 0 && height % 16 == 0,
      s"builder requires macroblock-aligned dims, got ${width}x$height")
    require(frames.nonEmpty, "at least one frame")
    val mbW = width / 16; val mbH = height / 16
    require(mbH <= 175, s"height $height exceeds slice vertical-position range")
    frames.foreach { f =>
      require(f.yDc.length == mbW * 2 * mbH * 2 &&
        f.cbDc.length == mbW * mbH && f.crDc.length == mbW * mbH,
        "frame grids must match dimensions")
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

    frames.zipWithIndex.foreach { case (f, idx) =>
      bw.startCode(0x00)
      bw.putBits(idx % 1024, 10)
      bw.putBits(1, 3)        // I picture
      bw.putBits(0xffff, 16)  // vbv_delay
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
          bw.putBit(1)        // type: intra
          var b = 0
          while (b < 4) {
            val v = f.yDc((row * 2 + b / 2) * mbW * 2 + mbX * 2 + b % 2)
            putDcDiff(v - predY, chroma = false); predY = v
            bw.putBits(2, 2)  // EOB
            b += 1
          }
          val cb = f.cbDc(row * mbW + mbX)
          putDcDiff(cb - predCb, chroma = true); predCb = cb
          bw.putBits(2, 2)
          val cr = f.crDc(row * mbW + mbX)
          putDcDiff(cr - predCr, chroma = true); predCr = cr
          bw.putBits(2, 2)
          mbX += 1
        }
        row += 1
      }
    }
    bw.startCode(0xb7)
    bw.toBytes
  }
}
