package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal PNG codec for 8-bit truecolor (color type 2) images — pure
  * JVM on top of the JDK's native zlib (`Deflater`/`Inflater`) and
  * `CRC32`, the fourth hand-rolled codec after [[WavCodec]],
  * [[AviCodec]] and [[GifCodec]], with the same strict bounds-checked
  * fail-loud discipline. It replaces `javax.imageio` behind
  * q71/q101/q186: a single-threaded microbench of the exact generator
  * shape (10k docs, 16–48 px RGB) put `ImageIO.write` at 1.78 s and
  * `ImageIO.read` at 0.67 s against ~0.1 s for the actual IDAT
  * deflate/inflate work — the tax is reader/writer service plumbing
  * and per-pixel `setRGB`/`getRGB` raster access, none of which a
  * fixed-layout codec needs. Container size is NOT part of any query
  * contract (q71's gate explicitly excludes `n_bytes` as
  * writer-specific); dimensions and the lossless pixel round-trip are,
  * and MultimodalSpec cross-decodes both directions against ImageIO so
  * the codecs can never drift apart silently.
  *
  * Layout written by [[Encoder]]: signature, IHDR (8-bit, color type
  * 2, no interlace), ONE IDAT holding the zlib stream of
  * filter-0-prefixed scanlines, IEND — every chunk CRC'd. The
  * [[Decoder]] accepts any spec-conforming truecolor stream (multiple
  * IDATs, all five row filters — the JDK writer emits adaptive
  * filters, which the cross-check exercises), validating chunk CRCs
  * and the exact decompressed length.
  */
object PngCodec {

  private val Magic = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
    .map(_.toByte)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed PNG container: $msg")

  /** Parsed IHDR surface — what a metadata pass (q71) needs. */
  final case class PngHeader(width: Int, height: Int,
                             bitDepth: Int, colorType: Int)

  /** Parse + CRC-validate the signature and IHDR ONLY — the header
    * cost model for a metadata pass over 100 TB of blobs (never
    * touches IDAT). Fails loudly on any corruption, including an IHDR
    * whose CRC does not match (so a bit-flipped width can never be
    * echoed as truth).
    */
  def header(bytes: Array[Byte]): PngHeader = {
    if (bytes.length < 33) fail("truncated container")
    var i = 0
    while (i < 8) {
      if (bytes(i) != Magic(i)) fail("missing PNG signature")
      i += 1
    }
    val len = be32(bytes, 8)
    if (len != 13) fail(s"IHDR length $len != 13")
    if (!(bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
          bytes(15) == 'R')) fail("first chunk is not IHDR")
    val crc = new CRC32
    crc.update(bytes, 12, 4 + 13)
    if (crc.getValue.toInt != be32(bytes, 29)) fail("IHDR CRC mismatch")
    val w = be32(bytes, 16)
    val h = be32(bytes, 20)
    if (w <= 0 || h <= 0) fail(s"non-positive dimensions ${w}x$h")
    PngHeader(w, h, bytes(24) & 0xff, bytes(25) & 0xff)
  }

  private def be32(b: Array[Byte], off: Int): Int = {
    if (off + 4 > b.length) fail("truncated 32-bit field")
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  }

  /** Reusable single-threaded encoder: 8-bit truecolor, filter 0 on
    * every row, one zlib IDAT of STORED blocks (`NO_COMPRESSION` — the
    * PNG analog of WavCodec's raw PCM and AviCodec's raw DIB: a fully
    * spec-valid zlib stream whose compression level, a knob every
    * writer exposes, is traded for encode speed; measured at sf1 the
    * stored stream took the q71 generator from 7.1 to 1.0 task-s over
    * BEST_SPEED while the container stays byte-for-byte consumable by
    * `ImageIO.read` — MultimodalSpec pins that, and pins the Decoder
    * against the JDK writer's genuinely COMPRESSED adaptive-filter
    * streams so the inflate/unfilter paths stay exercised). The
    * Deflater, the scanline buffer and the output buffer are allocated
    * once per task/partition and reused across docs.
    */
  final class Encoder {
    private val deflater = new Deflater(Deflater.NO_COMPRESSION)
    private var raw = new Array[Byte](1 << 14) // filtered scanlines
    private var zBuf = new Array[Byte](1 << 14) // deflated stream
    private var out = new Array[Byte](1 << 14) // final container
    private val crc = new CRC32

    /** Encode a w×h raster of 0xRRGGBB ints (row-major in the first
      * w·h slots — the array may be a larger reusable buffer) into a
      * PNG container (a fresh copy; internal buffers are reused by the
      * next call).
      */
    def encodeRgb(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
      require(w > 0 && h > 0, s"non-positive dimensions ${w}x$h")
      require(rgb.length >= w * h, s"raster length ${rgb.length} < ${w}x$h")
      val stride = 1 + 3 * w
      val rawLen = stride * h
      if (raw.length < rawLen) raw = new Array[Byte](Integer.highestOneBit(rawLen) << 1)
      var p = 0
      var i = 0
      var y = 0
      while (y < h) {
        raw(p) = 0 // filter: None
        p += 1
        var x = 0
        while (x < w) {
          val v = rgb(i)
          raw(p) = ((v >> 16) & 0xff).toByte
          raw(p + 1) = ((v >> 8) & 0xff).toByte
          raw(p + 2) = (v & 0xff).toByte
          p += 3; i += 1; x += 1
        }
        y += 1
      }
      deflater.reset()
      deflater.setInput(raw, 0, rawLen)
      deflater.finish()
      var zLen = 0
      while (!deflater.finished()) {
        if (zLen == zBuf.length) zBuf = java.util.Arrays.copyOf(zBuf, zBuf.length * 2)
        zLen += deflater.deflate(zBuf, zLen, zBuf.length - zLen)
      }
      val total = 8 + (12 + 13) + (12 + zLen) + 12
      if (out.length < total) out = new Array[Byte](Integer.highestOneBit(total) << 1)
      System.arraycopy(Magic, 0, out, 0, 8)
      var o = 8
      def be(v: Int, at: Int): Unit = {
        out(at) = (v >>> 24).toByte; out(at + 1) = (v >>> 16).toByte
        out(at + 2) = (v >>> 8).toByte; out(at + 3) = v.toByte
      }
      def chunk(tag: String, data: Array[Byte], dOff: Int, dLen: Int): Unit = {
        be(dLen, o)
        out(o + 4) = tag(0).toByte; out(o + 5) = tag(1).toByte
        out(o + 6) = tag(2).toByte; out(o + 7) = tag(3).toByte
        System.arraycopy(data, dOff, out, o + 8, dLen)
        crc.reset()
        crc.update(out, o + 4, 4 + dLen)
        be(crc.getValue.toInt, o + 8 + dLen)
        o += 12 + dLen
      }
      val ihdr = new Array[Byte](13)
      ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
      ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
      ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
      ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
      ihdr(8) = 8 // bit depth
      ihdr(9) = 2 // color type: truecolor
      // compression 0, filter 0, interlace 0 already zero
      chunk("IHDR", ihdr, 0, 13)
      chunk("IDAT", zBuf, 0, zLen)
      chunk("IEND", Array.emptyByteArray, 0, 0)
      java.util.Arrays.copyOf(out, o)
    }
  }

  /** Reusable single-threaded decoder for 8-bit truecolor streams:
    * walks chunks (CRC-validated), concatenates IDATs, inflates, and
    * un-filters all five PNG row filters into a 0xRRGGBB int raster.
    * Exception contract identical to [[WavCodec.decode]].
    */
  final class Decoder {
    private val inflater = new Inflater
    private var zBuf = new Array[Byte](1 << 14) // concatenated IDATs
    private var raw = new Array[Byte](1 << 14) // inflated scanlines
    private var rgb = new Array[Int](1 << 12)
    private val crc = new CRC32

    /** Decode; returns (w, h, raster) — the raster array is REUSED by
      * the next call, so callers consume it before decoding again.
      */
    def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) =
      try decodeStrict(bytes)
      catch {
        case e: IllegalArgumentException => throw e
        case scala.util.control.NonFatal(e) =>
          fail(s"unexpected parse failure: ${e.getClass.getSimpleName}")
      }

    private def decodeStrict(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val hd = header(bytes)
      if (hd.bitDepth != 8 || hd.colorType != 2)
        fail(s"unsupported format: depth ${hd.bitDepth} color ${hd.colorType}" +
          " (only 8-bit truecolor)")
      val w = hd.width; val h = hd.height
      if (w.toLong * h > (1L << 26)) fail(s"implausible raster ${w}x$h")
      // chunk walk: collect IDAT payloads, stop at IEND
      var pos = 33 // end of IHDR chunk
      var zLen = 0
      var sawEnd = false
      while (!sawEnd) {
        if (pos + 8 > bytes.length) fail("truncated chunk header")
        val len = be32(bytes, pos)
        if (len < 0 || pos + 12L + len > bytes.length)
          fail(s"chunk length $len exceeds container")
        val tag = new String(bytes, pos + 4, 4, "US-ASCII")
        crc.reset()
        crc.update(bytes, pos + 4, 4 + len)
        if (crc.getValue.toInt != be32(bytes, pos + 8 + len))
          fail(s"$tag CRC mismatch")
        tag match {
          case "IDAT" =>
            if (zLen + len > zBuf.length) {
              var n = zBuf.length
              while (n < zLen + len) n <<= 1
              zBuf = java.util.Arrays.copyOf(zBuf, n)
            }
            System.arraycopy(bytes, pos + 8, zBuf, zLen, len)
            zLen += len
          case "IEND" => sawEnd = true
          case "IHDR" => fail("duplicate IHDR")
          case _ => () // ancillary chunk (already CRC-checked): skip
        }
        pos += 12 + len
      }
      if (zLen == 0) fail("no IDAT chunk")
      val stride = 1 + 3 * w
      val rawLen = stride * h
      if (raw.length < rawLen) raw = new Array[Byte](Integer.highestOneBit(rawLen) << 1)
      inflater.reset()
      inflater.setInput(zBuf, 0, zLen)
      var got = 0
      while (got < rawLen && !inflater.finished()) {
        val n = inflater.inflate(raw, got, rawLen - got)
        if (n == 0 && inflater.needsInput())
          fail("zlib stream ended before the raster was complete")
        got += n
      }
      if (got != rawLen)
        fail(s"decompressed $got bytes for a $rawLen-byte raster")
      // a conforming stream is now exactly consumed (trailing adler
      // bytes are read by the inflater itself)
      // un-filter in place, row by row (bpp = 3)
      if (rgb.length < w * h) rgb = new Array[Int](Integer.highestOneBit(w * h) << 1)
      var y = 0
      while (y < h) {
        val rowOff = y * stride + 1
        val priorOff = rowOff - stride
        val filter = raw(rowOff - 1) & 0xff
        var i = 0
        filter match {
          case 0 => ()
          case 1 => // Sub
            i = 3
            while (i < 3 * w) {
              raw(rowOff + i) =
                ((raw(rowOff + i) & 0xff) + (raw(rowOff + i - 3) & 0xff)).toByte
              i += 1
            }
          case 2 => // Up
            if (y > 0) {
              i = 0
              while (i < 3 * w) {
                raw(rowOff + i) =
                  ((raw(rowOff + i) & 0xff) + (raw(priorOff + i) & 0xff)).toByte
                i += 1
              }
            }
          case 3 => // Average
            i = 0
            while (i < 3 * w) {
              val left = if (i >= 3) raw(rowOff + i - 3) & 0xff else 0
              val up = if (y > 0) raw(priorOff + i) & 0xff else 0
              raw(rowOff + i) =
                ((raw(rowOff + i) & 0xff) + ((left + up) >> 1)).toByte
              i += 1
            }
          case 4 => // Paeth
            i = 0
            while (i < 3 * w) {
              val a = if (i >= 3) raw(rowOff + i - 3) & 0xff else 0
              val b = if (y > 0) raw(priorOff + i) & 0xff else 0
              val c = if (i >= 3 && y > 0) raw(priorOff + i - 3) & 0xff else 0
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b)
              val pc = math.abs(p - c)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              raw(rowOff + i) = ((raw(rowOff + i) & 0xff) + pred).toByte
              i += 1
            }
          case f => fail(s"unknown row filter $f")
        }
        var x = 0
        var p = rowOff
        val outOff = y * w
        while (x < w) {
          rgb(outOff + x) = ((raw(p) & 0xff) << 16) |
            ((raw(p + 1) & 0xff) << 8) | (raw(p + 2) & 0xff)
          p += 3; x += 1
        }
        y += 1
      }
      (w, h, rgb)
    }
  }
}
