package graft.operators

import scala.util.control.NonFatal

/** REAL gzip (RFC 1952) member codec — the ingestion format of the
  * crawl corpora an LLM curation pipeline actually reads (WARC/WET
  * dumps are CONCATENATED gzip members, one per record, so
  * multi-member decode is the load-bearing case, not a curiosity).
  * Library-free in the same sense as the PNG codec
  * ([[Multimodal.decodePng]]): the raw-DEFLATE body rides
  * `java.util.zip.Inflater(nowrap)`, which IS the JDK, while every
  * byte of gzip framing — magic, CM, the five FLG fields (FTEXT,
  * FHCRC, FEXTRA, FNAME, FCOMMENT), MTIME/XFL/OS, the optional
  * zero-terminated strings, the CRC16 header check, and the CRC32 +
  * ISIZE trailer — is parsed and VERIFIED here.
  *
  * Hostile-input posture matches the image/video codecs: the output
  * budget is enforced DURING inflation (a 60-byte compression bomb
  * declaring 4 GiB cannot allocate it), reserved FLG bits gate, a
  * wrong header CRC16, body CRC32, or ISIZE gates, truncation gates,
  * trailing non-gzip garbage gates, and every parse error is one
  * internal exception mapped to None — never a throw (fuzz-pinned in
  * PropertiesSpec).
  */
object Gzip {

  private final class GErr extends Exception(null, null, false, false)
  private def fail(): Nothing = throw new GErr

  /** Decoded-output budget across all members, enforced mid-inflate. */
  val MaxDecodeBytes: Long = 1L << 26

  /** Decode a stream of one or more CONCATENATED gzip members.
    * Returns (member count, decoded bytes in member order); None on
    * anything malformed — see the object doc.
    */
  def decodeGzip(bytes: Array[Byte],
                 maxOut: Long = MaxDecodeBytes): Option[(Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 18) return None // min complete member
    try {
      val out = new java.io.ByteArrayOutputStream(256)
      var pos = 0
      var members = 0
      def u8(): Int = {
        if (pos >= bytes.length) fail()
        val v = bytes(pos) & 0xff; pos += 1; v
      }
      def u16(): Int = u8() | (u8() << 8)
      def u32(): Long = u16().toLong | (u16().toLong << 16)
      while (pos < bytes.length) {
        val headerStart = pos
        if (u8() != 0x1f || u8() != 0x8b) fail() // magic
        if (u8() != 8) fail()                    // CM: deflate only
        val flg = u8()
        if ((flg & 0xe0) != 0) fail()            // reserved bits
        u32()                                    // MTIME
        u8(); u8()                               // XFL, OS
        if ((flg & 4) != 0) {                    // FEXTRA
          val xlen = u16()
          if (pos + xlen > bytes.length) fail()
          pos += xlen
        }
        def skipZString(): Unit = {
          while (pos < bytes.length && bytes(pos) != 0) pos += 1
          if (pos >= bytes.length) fail()
          pos += 1
        }
        if ((flg & 8) != 0) skipZString()        // FNAME
        if ((flg & 16) != 0) skipZString()       // FCOMMENT
        if ((flg & 2) != 0) {                    // FHCRC: CRC16 of header
          val c = new java.util.zip.CRC32
          c.update(bytes, headerStart, pos - headerStart)
          if (u16() != (c.getValue & 0xffff).toInt) fail()
        }
        // raw DEFLATE body — budget enforced per inflate() call
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(bytes, pos, bytes.length - pos)
          val crc = new java.util.zip.CRC32
          var memberLen = 0L
          val buf = new Array[Byte](8192)
          while (!inf.finished) {
            val k = try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => fail() }
            if (k == 0 && !inf.finished) fail()  // truncated / stalled
            if (out.size.toLong + k > maxOut) fail() // bomb gate
            out.write(buf, 0, k)
            crc.update(buf, 0, k)
            memberLen += k
          }
          pos += inf.getBytesRead.toInt
          if (u32() != crc.getValue) fail()      // trailer CRC32
          if (u32() != (memberLen & 0xffffffffL)) fail() // ISIZE mod 2^32
          members += 1
        } finally inf.end()
      }
      if (members == 0) None else Some((members, out.toByteArray))
    } catch { case NonFatal(_) => None }
  }

  /** Serialize one gzip member (MTIME 0, XFL 0, OS 255 — the
    * deterministic header a reproducible pipeline writes). The
    * optional fields exist so the spec can exercise every FLG path
    * the decoder verifies.
    */
  def buildGzipMember(data: Array[Byte], fname: Option[String] = None,
                      comment: Option[String] = None,
                      extra: Option[Array[Byte]] = None,
                      headerCrc: Boolean = false): Array[Byte] = {
    require(data != null, "data must not be null")
    val b = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    def u16(v: Int): Unit = { b.write(v & 0xff); b.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = { u16((v & 0xffff).toInt); u16(((v >> 16) & 0xffff).toInt) }
    b.write(0x1f); b.write(0x8b); b.write(8)
    var flg = 0
    if (headerCrc) flg |= 2
    if (extra.nonEmpty) flg |= 4
    if (fname.nonEmpty) flg |= 8
    if (comment.nonEmpty) flg |= 16
    b.write(flg)
    u32(0L)       // MTIME: 0, reproducible
    b.write(0)    // XFL
    b.write(255)  // OS: unknown
    extra.foreach { x => u16(x.length); b.write(x, 0, x.length) }
    fname.foreach { s => b.write(s.getBytes("ISO-8859-1")); b.write(0) }
    comment.foreach { s => b.write(s.getBytes("ISO-8859-1")); b.write(0) }
    if (headerCrc) {
      val c = new java.util.zip.CRC32
      val hdr = b.toByteArray
      c.update(hdr, 0, hdr.length)
      u16((c.getValue & 0xffff).toInt)
    }
    val def_ = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    def_.setInput(data); def_.finish()
    val buf = new Array[Byte](8192)
    while (!def_.finished) {
      val k = def_.deflate(buf)
      b.write(buf, 0, k)
    }
    def_.end()
    val crc = new java.util.zip.CRC32
    crc.update(data)
    u32(crc.getValue)
    u32(data.length.toLong & 0xffffffffL)
    b.toByteArray
  }

  /** Concatenate per-record members — the WARC/WET layout. */
  def buildGzip(records: Seq[Array[Byte]]): Array[Byte] = {
    require(records.nonEmpty, "at least one record")
    val b = new java.io.ByteArrayOutputStream
    records.foreach(r => b.write(buildGzipMember(r)))
    b.toByteArray
  }
}
