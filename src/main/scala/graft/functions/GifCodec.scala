package graft.functions

/** Minimal GIF89a codec — pure JVM, zero dependencies: the animated-
  * image sibling of [[WavCodec]]/[[AviCodec]], sharing their strict
  * bounds-checked fail-loud parsing discipline. It replaces the
  * `javax.imageio` path behind q109: a single-threaded microbench of
  * the exact q109 shape (20k docs, 16×16 constant-gray frames) put the
  * JDK ImageIO GIF WRITER at 11.5 s and the reader at 0.8 s — 93% of
  * the codec tax was `writeToSequence`'s per-frame metadata merge,
  * palette machinery and stream plumbing, none of which this fixed-
  * palette encoder needs. The LZW bitstreams both sides produce/consume
  * are real (MultimodalSpec cross-decodes this encoder's output with
  * the JDK reader, and this decoder against the JDK writer's output —
  * interlaced! — so the two codecs can never drift apart silently; the
  * WavCodec cross-check precedent).
  *
  * Layout written by [[Encoder]] — canonical GIF89a, one 256-entry
  * identity GRAYSCALE global color table (palette[i] = (i,i,i), so a
  * palette index IS its gray level — the invariant the JDK writer also
  * maintains for TYPE_BYTE_GRAY input and the reason q109's
  * raster-sample mean equals the generator's gray):
  *
  * {{{
  * 'GIF89a'  LSD(w,h,GCT=256)  GCT[768]
  * per frame:  GCE(delay cs)  ImageDescriptor(0,0,w,h, no-LCT,
  *             non-interlaced)  LZW(minCode=8) sub-blocks  0x00
  * trailer 0x3B
  * }}}
  *
  * The [[Sampler]] side is stride-aware: q109 keeps every second frame,
  * so non-sampled frames are SKIPPED at sub-block granularity (length
  * hops, zero LZW work), and sampled frames decode in O(#codes) rather
  * than O(#pixels) — each LZW dictionary entry tracks the LENGTH and
  * INDEX-SUM of the string it denotes, so emitting a code accumulates
  * its whole run in O(1). A mean over palette indices needs nothing
  * else; no frame buffer is ever materialized (and interlace — which
  * the JDK writer emits — is a pixel PERMUTATION, so sums are immune).
  */
object GifCodec {

  private val U16Limit = 65536L // delay and dimension fields are u16

  /** One sampled frame: descriptor dimensions, the GCE delay that
    * governs it, and the sum of its decoded palette indices (for a
    * grayscale-ramp palette: the sum of gray levels).
    */
  final case class FrameSample(frameIdx: Int, delayCs: Int,
                               width: Int, height: Int, indexSum: Long)

  /** Decoded sampling result: total frame count (every image
    * descriptor in the container) + every stride-th frame's sample.
    */
  final case class GifSamples(nFrames: Int, samples: Array[FrameSample])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed GIF container: $msg")

  /** Reusable single-threaded encoder for fixed-size 8-bit-indexed
    * frames over the identity grayscale palette. One instance per
    * task/partition; every scratch buffer (LZW hash table, bit packer,
    * output) is allocated once and reused across docs.
    */
  final class Encoder(w: Int, h: Int) {
    require(w > 0 && w < U16Limit && h > 0 && h < U16Limit,
      s"frame dimensions out of GIF u16 range: ${w}x$h")

    // identity grayscale GCT: palette[i] = (i,i,i) — index == gray
    private val gct = {
      val t = new Array[Byte](768)
      var i = 0
      while (i < 256) {
        t(3 * i) = i.toByte; t(3 * i + 1) = i.toByte; t(3 * i + 2) = i.toByte
        i += 1
      }
      t
    }

    // growing output buffer, reused across docs (toByteArray copies out)
    private var out = new Array[Byte](4096)
    private var len = 0
    private var frames = 0

    // open-addressed LZW dictionary: key = (prefixCode << 8 | pixel),
    // value = code; -1 = empty. 8192 slots for ≤4096 live entries keeps
    // the load factor ≤ 0.5. Cleared per clear-code (table resets are
    // rare: ≤ one per 3839 emitted codes).
    private val HashBits = 13
    private val hashKey = new Array[Int](1 << HashBits)
    private val hashVal = new Array[Int](1 << HashBits)

    // LSB-first bit packer + pending 255-byte sub-block
    private var bitBuf = 0L
    private var bitCnt = 0
    private val block = new Array[Byte](255)
    private var blockLen = 0

    private def ensure(n: Int): Unit =
      if (len + n > out.length)
        out = java.util.Arrays.copyOf(out, math.max(out.length * 2, len + n))

    private def u8(v: Int): Unit = { ensure(1); out(len) = v.toByte; len += 1 }
    private def u16le(v: Int): Unit = {
      ensure(2)
      out(len) = (v & 0xff).toByte; out(len + 1) = ((v >> 8) & 0xff).toByte
      len += 2
    }

    /** Reset and write header + logical screen descriptor + GCT. */
    def begin(): Unit = {
      len = 0; frames = 0
      ensure(13 + 768)
      "GIF89a".getBytes("US-ASCII").foreach(b => { out(len) = b; len += 1 })
      u16le(w); u16le(h)
      u8(0xF7) // GCT present, 8-bit color resolution, 256-entry table
      u8(0)    // background color index
      u8(0)    // pixel aspect ratio
      System.arraycopy(gct, 0, out, len, 768); len += 768
    }

    private def flushSubBlock(): Unit =
      if (blockLen > 0) {
        ensure(1 + blockLen)
        out(len) = blockLen.toByte; len += 1
        System.arraycopy(block, 0, out, len, blockLen); len += blockLen
        blockLen = 0
      }

    private def putCode(code: Int, codeSize: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        block(blockLen) = (bitBuf & 0xff).toByte
        blockLen += 1
        if (blockLen == 255) flushSubBlock()
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }

    /** Append one frame: `pixels` is the w·h row-major palette-index
      * raster (LZW-compressed for real — no byte-template shortcuts),
      * `delayCs` the GraphicControlExtension delay in centiseconds.
      */
    def addFrame(pixels: Array[Byte], delayCs: Int): Unit = {
      require(pixels.length == w * h,
        s"raster length ${pixels.length} != ${w}x$h")
      require(delayCs >= 0 && delayCs < U16Limit,
        s"delay out of GIF u16 range: $delayCs")
      // GraphicControlExtension: disposal none, no transparency
      u8(0x21); u8(0xF9); u8(4); u8(0); u16le(delayCs); u8(0); u8(0)
      // image descriptor: full canvas, no LCT, non-interlaced
      u8(0x2C); u16le(0); u16le(0); u16le(w); u16le(h); u8(0)
      // LZW, 8-bit min code size over the 256-entry palette
      val minCode = 8
      u8(minCode)
      val clear = 1 << minCode
      val eoi = clear + 1
      var nextCode = eoi + 1
      var codeSize = minCode + 1
      java.util.Arrays.fill(hashKey, -1)
      bitBuf = 0L; bitCnt = 0; blockLen = 0
      putCode(clear, codeSize)
      var cur = pixels(0) & 0xff
      var i = 1
      while (i < pixels.length) {
        val c = pixels(i) & 0xff
        val key = (cur << 8) | c
        // probe the dictionary for (cur, c)
        var slot = (key * 0x9E3779B9) >>> (32 - HashBits)
        var found = -1
        var probing = true
        while (probing) {
          val k = hashKey(slot)
          if (k == key) { found = hashVal(slot); probing = false }
          else if (k == -1) probing = false
          else slot = (slot + 1) & ((1 << HashBits) - 1)
        }
        if (found >= 0) cur = found
        else {
          putCode(cur, codeSize)
          if (nextCode < 4096) {
            hashKey(slot) = key; hashVal(slot) = nextCode
            // the decoder widens when ITS next free code no longer fits
            // the current width; mirror that exactly
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
            nextCode += 1
          } else {
            // table full: reset (deferred-clear-free stream — every
            // decoder, including ours and the JDK's, handles this)
            putCode(clear, codeSize)
            java.util.Arrays.fill(hashKey, -1)
            nextCode = eoi + 1
            codeSize = minCode + 1
          }
          cur = c
        }
        i += 1
      }
      putCode(cur, codeSize)
      putCode(eoi, codeSize)
      if (bitCnt > 0) { // flush the final partial byte
        block(blockLen) = (bitBuf & 0xff).toByte
        blockLen += 1
        if (blockLen == 255) flushSubBlock()
      }
      flushSubBlock()
      u8(0) // block terminator
      frames += 1
    }

    /** Write the trailer and return the container (a fresh copy; the
      * internal buffer is reused by the next [[begin]]).
      */
    def finish(): Array[Byte] = {
      require(frames > 0, "GIF with zero frames")
      u8(0x3B)
      java.util.Arrays.copyOf(out, len)
    }
  }

  /** Reusable single-threaded stride-sampling decoder. One instance per
    * task/partition; the LZW dictionary arrays are allocated once.
    *
    * Exception contract (identical to [[WavCodec.decode]]): a malformed
    * or truncated container ALWAYS surfaces as
    * `IllegalArgumentException` — every read is bounds-guarded and
    * every skip strictly advances, plus a NonFatal backstop.
    */
  final class Sampler {
    // per-code string metadata: emitting code k appends a known string;
    // we only ever need its length, its index-sum, and its first index
    private val prefixLen = new Array[Int](4096)
    private val prefixSum = new Array[Long](4096)
    private val firstIdx = new Array[Int](4096)
    private val samples = new scala.collection.mutable.ArrayBuffer[FrameSample]

    // parse cursor over the container being sampled (single-threaded
    // reuse, like the Encoder's scratch buffers)
    private var bytes: Array[Byte] = null
    private var pos = 0

    private def u8(): Int = {
      if (pos >= bytes.length) fail("truncated container")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    private def u16le(): Int = { val lo = u8(); lo | (u8() << 8) }
    private def skip(n: Int): Unit = {
      if (pos + n > bytes.length) fail("truncated container")
      pos += n
    }
    private def skipSubBlocks(): Unit = {
      var l = u8()
      while (l != 0) { skip(l); l = u8() }
    }

    def sample(payload: Array[Byte], stride: Int): GifSamples =
      try sampleStrict(payload, stride)
      catch {
        case e: IllegalArgumentException => throw e
        case scala.util.control.NonFatal(e) =>
          fail(s"unexpected parse failure: ${e.getClass.getSimpleName}")
      } finally bytes = null

    private def sampleStrict(payload: Array[Byte], stride: Int): GifSamples = {
      require(stride > 0, s"stride must be positive: $stride")
      bytes = payload
      pos = 0
      if (payload.length < 6 ||
          !(payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
            payload(3) == '8' && (payload(4) == '7' || payload(4) == '9') &&
            payload(5) == 'a')) fail("missing GIF87a/GIF89a magic")
      pos = 6
      u16le(); u16le() // logical screen w,h (frames carry their own)
      val lsdPacked = u8()
      u8(); u8() // background color, aspect ratio
      if ((lsdPacked & 0x80) != 0) skip(3 << ((lsdPacked & 7) + 1))
      samples.clear()
      var nFrames = 0
      var pendingDelay = -1 // GCE applies to the NEXT image only
      var done = false
      while (!done) {
        u8() match {
          case 0x3B => done = true
          case 0x21 => // extension block
            val label = u8()
            if (label == 0xF9) {
              if (u8() != 4) fail("GraphicControlExtension size != 4")
              u8() // packed (disposal/transparency) — irrelevant to sums
              pendingDelay = u16le()
              u8() // transparent color index
              skipSubBlocks() // the mandatory terminator (and any junk)
            } else skipSubBlocks()
          case 0x2C => // image descriptor
            u16le(); u16le() // left, top — sums don't care where
            val fw = u16le(); val fh = u16le()
            if (fw == 0 || fh == 0) fail("zero-sized frame")
            val packed = u8()
            if ((packed & 0x80) != 0) skip(3 << ((packed & 7) + 1))
            if (nFrames % stride == 0) {
              if (pendingDelay < 0)
                fail(s"frame $nFrames has no GraphicControlExtension")
              val sum = lzwIndexSum(fw.toLong * fh)
              samples += FrameSample(nFrames, pendingDelay, fw, fh, sum)
            } else { u8(); skipSubBlocks() } // min-code byte + data hop
            pendingDelay = -1
            nFrames += 1
          case b => fail(f"unexpected block introducer 0x$b%02x")
        }
      }
      if (nFrames == 0) fail("GIF with zero frames")
      GifSamples(nFrames, samples.toArray)
    }

    /** Decode one frame's LZW stream (cursor at the min-code byte),
      * accumulating the SUM of emitted palette indices, and verify
      * exactly `expectPixels` indices were emitted (a truncated or
      * forged stream that ends early fails loudly instead of yielding
      * a plausible partial sum). O(#codes): each dictionary entry
      * carries the length/sum/first-index of its string. Leaves the
      * cursor just past the frame's block terminator.
      */
    private def lzwIndexSum(expectPixels: Long): Long = {
      val minCode = u8()
      if (minCode < 2 || minCode > 8) fail(s"LZW min code size $minCode")
      val clear = 1 << minCode
      val eoi = clear + 1
      var i = 0
      while (i < clear) {
        prefixLen(i) = 1; prefixSum(i) = i.toLong; firstIdx(i) = i
        i += 1
      }
      var nextCode = eoi + 1
      var codeSize = minCode + 1
      var prev = -1
      var sum = 0L
      var emitted = 0L
      var bitBuf = 0L
      var bitCnt = 0
      var blockRem = 0 // bytes left in the current sub-block
      var finished = false
      while (!finished) {
        while (bitCnt < codeSize) {
          if (blockRem == 0) {
            blockRem = u8()
            if (blockRem == 0) fail("LZW stream ended before EOI code")
          }
          bitBuf |= (u8().toLong << bitCnt)
          blockRem -= 1
          bitCnt += 8
        }
        val code = (bitBuf & ((1L << codeSize) - 1)).toInt
        bitBuf >>>= codeSize
        bitCnt -= codeSize
        if (code == clear) {
          nextCode = eoi + 1
          codeSize = minCode + 1
          prev = -1
        } else if (code == eoi) {
          finished = true
        } else if (prev == -1) {
          // first code after (implicit) clear must be a root
          if (code >= clear) fail(s"non-root code $code after clear")
          sum += code; emitted += 1
          prev = code
        } else {
          var emitLen = 0L
          var emitSum = 0L
          if (code < nextCode) {
            emitLen = prefixLen(code); emitSum = prefixSum(code)
            if (nextCode < 4096) {
              prefixLen(nextCode) = prefixLen(prev) + 1
              prefixSum(nextCode) = prefixSum(prev) + firstIdx(code)
              firstIdx(nextCode) = firstIdx(prev)
              nextCode += 1
            }
          } else if (code == nextCode && nextCode < 4096) {
            // KwKwK: the entry being defined is the one emitted
            prefixLen(nextCode) = prefixLen(prev) + 1
            prefixSum(nextCode) = prefixSum(prev) + firstIdx(prev)
            firstIdx(nextCode) = firstIdx(prev)
            emitLen = prefixLen(nextCode); emitSum = prefixSum(nextCode)
            nextCode += 1
          } else fail(s"LZW code $code beyond table size $nextCode")
          sum += emitSum; emitted += emitLen
          prev = code
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        if (emitted > expectPixels)
          fail(s"LZW emitted $emitted indices for $expectPixels pixels")
      }
      if (emitted != expectPixels)
        fail(s"LZW emitted $emitted indices for $expectPixels pixels")
      // drain the data stream: residual bytes of the current sub-block
      // are bit padding by spec; then sub-blocks until the terminator
      if (blockRem > 0) skip(blockRem)
      skipSubBlocks()
      sum
    }
  }
}
