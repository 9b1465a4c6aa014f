package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal AVI (RIFF) video container codec — pure JVM, zero
  * dependencies: the video twin of the JDK-backed PNG/GIF/WAV codecs
  * behind q71/q109/q118. Frames are stored UNCOMPRESSED (`DIB `
  * handler, `BI_RGB` 24-bit bottom-up bitmaps, the classic
  * video-for-windows layout every AVI player accepts), which is what
  * makes the multi-frame pixel round-trip EXACT — an MJPEG variant
  * would put a lossy codec between the generator and the oracle and
  * forfeit the closed-form gate (VERDICT r11 item 8).
  *
  * Layout written by [[encode]] (and required, structurally, by
  * [[decode]] — the parser walks real RIFF chunks and fails loudly on
  * anything malformed rather than echoing):
  *
  * {{{
  * RIFF <sz> 'AVI '
  *   LIST 192 'hdrl'
  *     avih 56          main header: µs/frame, total frames, w, h
  *     LIST 116 'strl'
  *       strh 56        'vids'/'DIB ', scale/rate (fps), length
  *       strf 40        BITMAPINFOHEADER: 24 bpp, BI_RGB, bottom-up
  *   LIST <sz> 'movi'
  *     00db <stride·h>  one uncompressed frame per chunk
  * }}}
  *
  * Total size is therefore the CLOSED FORM
  * `224 + nFrames · (8 + stride(w) · h)` with
  * `stride(w) = ceil(3·w / 4) · 4` — the q40 oracle predicts the
  * container's byte count exactly, something the PNG path (q71) cannot
  * do because a general-purpose encoder's output size is
  * implementation-specific.
  */
object AviCodec {

  /** Container metadata as carried by the headers. `usPerFrame` is the
    * avih µs/frame = strh dwScale with dwRate fixed at 1,000,000 —
    * so fps = 1e6 / usPerFrame exactly.
    */
  case class AviMeta(width: Int, height: Int, usPerFrame: Long, nFrames: Int)

  /** Decoded clip: frames as packed 0xRRGGBB ints, row-major,
    * TOP-DOWN (the bottom-up DIB storage is undone by the codec).
    */
  case class AviClip(meta: AviMeta, frames: IndexedSeq[Array[Int]])

  /** Bytes per stored row: 3 bytes/pixel padded to a 4-byte boundary
    * (the DIB rule; also what makes the q40 size formula exact).
    */
  def stride(w: Int): Int = ((w * 3 + 3) / 4) * 4

  /** The closed-form container size [[encode]] produces. */
  def encodedSize(w: Int, h: Int, nFrames: Int): Int =
    224 + nFrames * (8 + stride(w) * h)

  private val Rate = 1000000L // strh dwRate; dwScale carries µs/frame

  def encode(w: Int, h: Int, usPerFrame: Long,
             frames: IndexedSeq[Array[Int]]): Array[Byte] = {
    require(w > 0 && h > 0 && frames.nonEmpty, "empty clip")
    // strh's rcFrame carries the dims as 16-bit shorts, and the header
    // fields are unsigned 32-bit — validate instead of truncating (a
    // silently-wrapped value would decode to DIFFERENT metadata than
    // was encoded, violating the fail-loud codec discipline)
    require(w <= 0x7fff && h <= 0x7fff, s"dimensions exceed rcFrame range: ${w}x$h")
    require(usPerFrame > 0 && usPerFrame <= 0xffffffffL,
      s"usPerFrame out of u32 range: $usPerFrame")
    require(224L + frames.length.toLong * (8L + stride(w).toLong * h) <= Int.MaxValue,
      "container exceeds 2 GiB — split the clip")
    require(frames.forall(_.length == w * h), "frame size mismatch")
    val fb = stride(w) * h
    val buf = ByteBuffer.allocate(encodedSize(w, h, frames.length))
      .order(ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = { buf.put(s.getBytes("US-ASCII")): Unit }
    fcc("RIFF"); buf.putInt(buf.capacity - 8); fcc("AVI ")
    // --- LIST hdrl -------------------------------------------------
    fcc("LIST"); buf.putInt(192); fcc("hdrl")
    fcc("avih"); buf.putInt(56)
    buf.putInt(usPerFrame.toInt)  // dwMicroSecPerFrame
    buf.putInt(0)                 // dwMaxBytesPerSec
    buf.putInt(0)                 // dwPaddingGranularity
    buf.putInt(0)                 // dwFlags
    buf.putInt(frames.length)     // dwTotalFrames
    buf.putInt(0)                 // dwInitialFrames
    buf.putInt(1)                 // dwStreams
    buf.putInt(fb + 8)            // dwSuggestedBufferSize
    buf.putInt(w); buf.putInt(h)
    (0 until 4).foreach(_ => buf.putInt(0)) // dwReserved
    fcc("LIST"); buf.putInt(116); fcc("strl")
    fcc("strh"); buf.putInt(56)
    fcc("vids"); fcc("DIB ")
    buf.putInt(0)                 // dwFlags
    buf.putShort(0); buf.putShort(0) // wPriority, wLanguage
    buf.putInt(0)                 // dwInitialFrames
    buf.putInt(usPerFrame.toInt)  // dwScale
    buf.putInt(Rate.toInt)        // dwRate — fps = rate/scale
    buf.putInt(0)                 // dwStart
    buf.putInt(frames.length)     // dwLength
    buf.putInt(fb + 8)            // dwSuggestedBufferSize
    buf.putInt(0)                 // dwQuality
    buf.putInt(0)                 // dwSampleSize
    buf.putShort(0); buf.putShort(0) // rcFrame left, top
    buf.putShort(w.toShort); buf.putShort(h.toShort)
    fcc("strf"); buf.putInt(40)
    buf.putInt(40)                // biSize
    buf.putInt(w); buf.putInt(h)  // positive height = bottom-up
    buf.putShort(1)               // biPlanes
    buf.putShort(24)              // biBitCount
    buf.putInt(0)                 // biCompression = BI_RGB
    buf.putInt(fb)                // biSizeImage
    buf.putInt(0); buf.putInt(0)  // pels/meter
    buf.putInt(0); buf.putInt(0)  // clrUsed, clrImportant
    // --- LIST movi -------------------------------------------------
    fcc("LIST"); buf.putInt(4 + frames.length * (8 + fb)); fcc("movi")
    frames.foreach { px =>
      fcc("00db"); buf.putInt(fb)
      var y = h - 1 // DIB rows run bottom-up
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val p = px(y * w + x)
          buf.put((p & 0xff).toByte)         // B
          buf.put(((p >> 8) & 0xff).toByte)  // G
          buf.put(((p >> 16) & 0xff).toByte) // R
          x += 1
        }
        var pad = stride(w) - 3 * w
        while (pad > 0) { buf.put(0.toByte): Unit; pad -= 1 }
        y -= 1
      }
    }
    require(buf.remaining == 0, s"writer layout drift: ${buf.remaining} left")
    buf.array
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed AVI container: $msg")

  /** Strict structural parse. Everything the headers assert is
    * cross-checked against what the movi list actually contains, so a
    * truncated or bit-flipped container fails loudly instead of
    * echoing plausible metadata (the q71/q109/q118 corrupt-container
    * discipline).
    *
    * Exception contract: a malformed container ALWAYS surfaces as
    * `IllegalArgumentException` — guaranteed structurally (bounded
    * chunk walks, length-validated header chunks, Long-width size
    * math, depth-capped list nesting) plus a NonFatal backstop — so
    * a quarantining consumer ([[graft.streaming.StreamingCorpus]]
    * `mediaMonitor`) can catch ONE exception type and know no forged
    * byte pattern kills its stream some other way.
    */
  def decode(bytes: Array[Byte]): AviClip =
    try decodeStrict(bytes)
    catch {
      case e: IllegalArgumentException => throw e
      case scala.util.control.NonFatal(e) =>
        fail(s"unexpected parse failure: ${e.getClass.getSimpleName}")
    }

  private def decodeStrict(bytes: Array[Byte]): AviClip = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fcc(): String = {
      if (buf.remaining < 4) fail("truncated fourcc")
      val a = new Array[Byte](4); buf.get(a); new String(a, "US-ASCII")
    }
    def u32(): Long = {
      if (buf.remaining < 4) fail("truncated size field")
      buf.getInt.toLong & 0xffffffffL
    }
    // Chunk-size reads for WALKS must be bounds-checked BEFORE any
    // position arithmetic: a forged size like 0xFFFFFFFF wraps negative
    // through .toInt, and the skip `pos + sz + (sz & 1)` can then
    // advance by ZERO — an infinite loop, the one failure mode worse
    // than a wrong answer (a quarantining stream consumer would hang,
    // not flag). Bounded size ⇒ every skip strictly advances.
    def chunkSize(): Int = {
      val sz = u32()
      if (sz > buf.remaining) fail(s"chunk size $sz exceeds container")
      sz.toInt
    }
    if (fcc() != "RIFF") fail("missing RIFF magic")
    val riffSize = u32()
    if (riffSize != bytes.length - 8) fail("RIFF size != payload size")
    if (fcc() != "AVI ") fail("not an AVI form")

    var meta: AviMeta = null
    var strhFrames = -1
    var biW = -1; var biH = -1
    val frames = IndexedSeq.newBuilder[Array[Int]]
    var nMovi = 0

    def parseHdrl(end: Int, depth: Int): Unit = while (buf.position() < end) {
      fcc() match {
        case "avih" =>
          val sz = chunkSize(); val at = buf.position()
          if (sz < 40) fail("avih too short")
          val usPerFrame = u32()      // dwMicroSecPerFrame, offset 0
          buf.position(at + 16)       // skip to dwTotalFrames
          val totalFrames = u32().toInt
          buf.position(at + 32)       // skip to dwWidth/dwHeight
          val w = u32().toInt; val h = u32().toInt
          meta = AviMeta(w, h, usPerFrame, totalFrames)
          buf.position(math.min(at + sz + (sz & 1), buf.limit())) // RIFF pad rule
        case "LIST" =>
          val sz = chunkSize(); val at = buf.position()
          // real AVIs nest hdrl→strl (2 deep); a forged container of
          // endlessly nested lists must fail, not overflow the stack
          if (depth >= 8) fail("list nesting too deep")
          if (fcc() != "strl") fail("unexpected LIST in hdrl")
          parseHdrl(at + sz, depth + 1)
        case "strh" =>
          val sz = chunkSize(); val at = buf.position()
          if (sz < 56) fail("strh too short")
          if (fcc() != "vids") fail("first stream is not video")
          if (fcc() != "DIB ") fail("unsupported video handler")
          buf.position(at + 32)
          strhFrames = u32().toInt
          buf.position(math.min(at + sz + (sz & 1), buf.limit())) // RIFF pad rule
        case "strf" =>
          val sz = chunkSize(); val at = buf.position()
          if (sz < 40) fail("strf too short")
          if (u32() != 40) fail("unexpected BITMAPINFOHEADER size")
          biW = u32().toInt; biH = u32().toInt
          if (biW <= 0 || biH <= 0 || biW > 0x7fff || biH > 0x7fff)
            fail(s"implausible strf dimensions: ${biW}x$biH")
          buf.position(at + 14)
          if ((buf.getShort.toInt & 0xffff) != 24) fail("not 24 bpp")
          if (u32() != 0) fail("compressed frames unsupported (not BI_RGB)")
          buf.position(math.min(at + sz + (sz & 1), buf.limit())) // RIFF pad rule
        case _ =>
          val sz = chunkSize()
          buf.position(math.min(buf.position() + sz + (sz & 1), buf.limit()))
      }
    }

    def parseMovi(end: Int): Unit = while (buf.position() < end) {
      val id = fcc(); val sz = chunkSize()
      if (id == "00db" || id == "00dc") {
        if (meta == null || biW <= 0) fail("frame chunk before headers")
        val st = stride(biW)
        // Long-width compare: forged dims whose 32-bit product wraps
        // must not slip past the size check into the allocation below
        if (sz.toLong != st.toLong * biH) fail("frame chunk size != stride·height")
        if (buf.remaining < sz) fail("truncated frame payload")
        val px = new Array[Int](biW * biH)
        var y = biH - 1
        while (y >= 0) {
          var x = 0
          while (x < biW) {
            val b = buf.get() & 0xff; val g = buf.get() & 0xff
            val r = buf.get() & 0xff
            px(y * biW + x) = (r << 16) | (g << 8) | b
            x += 1
          }
          buf.position(buf.position() + (st - 3 * biW))
          y -= 1
        }
        frames += px
        nMovi += 1
      } else buf.position(math.min(buf.position() + sz + (sz & 1), buf.limit()))
    }

    while (buf.remaining >= 8) {
      fcc() match {
        case "LIST" =>
          val sz = chunkSize(); val at = buf.position()
          fcc() match {
            case "hdrl" => parseHdrl(at + sz, 0)
            case "movi" => parseMovi(at + sz)
            case _ => // RIFF pad rule, clamped like every other skip
              buf.position(math.min(at + sz + (sz & 1), buf.limit()))
          }
        case _ =>
          val sz = chunkSize()
          buf.position(math.min(buf.position() + sz + (sz & 1), buf.limit()))
      }
    }
    if (meta == null) fail("no avih header")
    if (biW != meta.width || biH != meta.height)
      fail("strf dimensions disagree with avih")
    if (nMovi == 0) fail("no frames in movi list")
    if (nMovi != meta.nFrames || nMovi != strhFrames)
      fail(s"frame count mismatch: movi=$nMovi avih=${meta.nFrames} strh=$strhFrames")
    AviClip(meta, frames.result())
  }
}
