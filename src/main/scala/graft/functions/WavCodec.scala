package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal WAV (RIFF/WAVE) PCM16 codec — pure JVM, zero dependencies:
  * the audio sibling of [[AviCodec]], sharing its strict bounds-checked
  * RIFF chunk-walking discipline. It replaces the
  * `javax.sound.sampled.AudioSystem` path behind q118/q130: the JDK's
  * reader/writer run a GLOBALLY SYNCHRONIZED service-provider lookup
  * per call, which convoys on a single-JVM lock when the per-doc codec
  * work fans out across all local cores (measured 56×/50× task-time
  * inflation at sf0.5, SCALE.md §20/§24). A hand-rolled header walk has
  * no lock — the media scan parallelizes like the PNG/GIF/AVI twins.
  *
  * Layout written by [[encode]] — the canonical 44-byte-header WAV, the
  * exact layout `AudioSystem.write(..., Type.WAVE, ...)` produces for
  * 16-bit signed little-endian mono PCM (MultimodalSpec cross-checks
  * one container against the JDK parser so the two encoders can never
  * drift apart silently):
  *
  * {{{
  * RIFF <sz> 'WAVE'
  *   fmt  16          wFormatTag=1 (PCM), channels, rate,
  *                    byteRate, blockAlign, 16 bits/sample
  *   data <2·n>       little-endian signed 16-bit samples
  * }}}
  *
  * Total size is the CLOSED FORM `44 + 2·n` for n mono samples — like
  * AVI (and unlike the PNG path) the container's byte count is exactly
  * predictable from the sample count.
  */
object WavCodec {

  /** Container metadata as carried by the fmt header; `nFrames` is the
    * data-chunk length over blockAlign (for mono PCM16: samples).
    */
  case class WavMeta(sampleRate: Int, bits: Int, channels: Int, nFrames: Int)

  /** Decoded clip: interleaved signed 16-bit samples. */
  case class WavClip(meta: WavMeta, samples: Array[Short])

  /** The closed-form container size [[encode]] produces for n mono
    * PCM16 samples: 12 RIFF + 24 fmt + 8 data header + 2·n payload.
    */
  def encodedSize(n: Int): Int = 44 + 2 * n

  /** Integer signal features over decoded samples — (Σ|sample|,
    * sign-transition count): the q118 feature pair, kept here so the
    * batch query and the streaming `audioMonitor` share ONE copy of
    * the math and can never silently diverge.
    */
  def features(samples: Array[Short]): (Long, Long) = {
    var sumAbs = 0L
    var transitions = 0L
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toInt
      sumAbs += math.abs(v)
      if (i > 0 && ((v > 0) != (samples(i - 1).toInt > 0))) transitions += 1
      i += 1
    }
    (sumAbs, transitions)
  }

  /** Encode mono 16-bit signed PCM into a canonical RIFF/WAVE
    * container. Validates ranges instead of truncating (the [[AviCodec]]
    * fail-loud encoder discipline: a silently-wrapped header field
    * would decode to DIFFERENT metadata than was encoded).
    */
  def encode(sampleRate: Int, pcm: Array[Short]): Array[Byte] = {
    require(pcm.nonEmpty, "empty clip")
    require(sampleRate > 0, s"sample rate out of range: $sampleRate")
    // 2 GiB caps the single-container allocation like AviCodec's bound
    require(44L + 2L * pcm.length <= Int.MaxValue,
      "container exceeds 2 GiB — split the clip")
    val buf = ByteBuffer.allocate(encodedSize(pcm.length))
      .order(ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = { buf.put(s.getBytes("US-ASCII")): Unit }
    fcc("RIFF"); buf.putInt(buf.capacity - 8); fcc("WAVE")
    fcc("fmt "); buf.putInt(16)
    buf.putShort(1)                // wFormatTag = PCM
    buf.putShort(1)                // nChannels = mono
    buf.putInt(sampleRate)
    // byteRate = rate · blockAlign, written as the u32 bit pattern via
    // explicit Long math (Int `rate * 2` would overflow for rates >
    // 2^30 and only coincidentally serialize to the same bits)
    buf.putInt((sampleRate.toLong * 2).toInt)
    buf.putShort(2)                // blockAlign = channels · bits/8
    buf.putShort(16)               // bits per sample
    fcc("data"); buf.putInt(2 * pcm.length)
    var i = 0
    while (i < pcm.length) { buf.putShort(pcm(i)); i += 1 }
    require(buf.remaining == 0, s"writer layout drift: ${buf.remaining} left")
    buf.array
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed WAV container: $msg")

  /** Strict structural parse. Everything the fmt header asserts is
    * cross-checked internally (blockAlign vs channels·bits, byteRate vs
    * rate·blockAlign, data length vs blockAlign) so a truncated or
    * bit-flipped container fails loudly instead of echoing plausible
    * metadata — the q40/q71/q109 corrupt-container discipline.
    *
    * Exception contract (identical to [[AviCodec.decode]]): a malformed
    * container ALWAYS surfaces as `IllegalArgumentException` —
    * guaranteed structurally (bounded chunk walks whose skips strictly
    * advance, length-validated header chunks) plus a NonFatal backstop —
    * so a quarantining consumer can catch ONE exception type and know
    * no forged byte pattern kills its stream some other way.
    */
  def decode(bytes: Array[Byte]): WavClip =
    try decodeStrict(bytes)
    catch {
      case e: IllegalArgumentException => throw e
      case scala.util.control.NonFatal(e) =>
        fail(s"unexpected parse failure: ${e.getClass.getSimpleName}")
    }

  private def decodeStrict(bytes: Array[Byte]): WavClip = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fcc(): String = {
      if (buf.remaining < 4) fail("truncated fourcc")
      val a = new Array[Byte](4); buf.get(a); new String(a, "US-ASCII")
    }
    def u32(): Long = {
      if (buf.remaining < 4) fail("truncated size field")
      buf.getInt.toLong & 0xffffffffL
    }
    def u16(): Int = {
      if (buf.remaining < 2) fail("truncated u16 field")
      buf.getShort.toInt & 0xffff
    }
    // Bounded BEFORE any position arithmetic — a forged size like
    // 0xFFFFFFFF wraps negative through .toInt and the pad-inclusive
    // skip could advance by ZERO (an infinite loop, the failure mode
    // worse than a wrong answer). Bounded size ⇒ every skip advances.
    def chunkSize(): Int = {
      val sz = u32()
      if (sz > buf.remaining) fail(s"chunk size $sz exceeds container")
      sz.toInt
    }
    if (fcc() != "RIFF") fail("missing RIFF magic")
    val riffSize = u32()
    if (riffSize != bytes.length - 8) fail("RIFF size != payload size")
    if (fcc() != "WAVE") fail("not a WAVE form")

    var meta: WavMeta = null
    var blockAlign = -1
    var samples: Array[Short] = null

    while (buf.remaining >= 8) {
      fcc() match {
        case "fmt " =>
          if (meta != null) fail("duplicate fmt chunk")
          val sz = chunkSize(); val at = buf.position()
          if (sz < 16) fail("fmt chunk too short")
          if (u16() != 1) fail("compressed audio unsupported (not PCM)")
          val channels = u16()
          if (channels < 1 || channels > 64) fail(s"implausible channel count: $channels")
          val rate = u32()
          if (rate < 1 || rate > Int.MaxValue) fail(s"implausible sample rate: $rate")
          val byteRate = u32()
          blockAlign = u16()
          val bits = u16()
          if (bits != 16) fail(s"only 16-bit PCM supported, got $bits")
          // internal consistency — a bit-flipped header field cannot
          // pass silently when the derived fields no longer agree
          if (blockAlign != channels * 2)
            fail(s"blockAlign $blockAlign != channels·2")
          if (byteRate != rate * blockAlign)
            fail(s"byteRate $byteRate != rate·blockAlign")
          meta = WavMeta(rate.toInt, bits, channels, -1)
          // clamped like the unknown-chunk skip: an odd-sized fmt chunk
          // ending flush with the container must not overshoot the limit
          buf.position(math.min(at + sz + (sz & 1), buf.limit())) // RIFF pad rule
        case "data" =>
          if (meta == null) fail("data chunk before fmt header")
          if (samples != null) fail("duplicate data chunk")
          val sz = chunkSize()
          if (sz == 0) fail("empty data chunk")
          if (sz % blockAlign != 0)
            fail(s"data length $sz not a multiple of blockAlign $blockAlign")
          val n = sz / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort; i += 1 }
          // no pad skip: sz is a multiple of the even blockAlign, so
          // the RIFF odd-size pad rule cannot apply to 16-bit data
          samples = out
          meta = meta.copy(nFrames = sz / blockAlign)
        case _ =>
          val sz = chunkSize()
          buf.position(math.min(buf.position() + sz + (sz & 1), buf.limit()))
      }
    }
    if (meta == null) fail("no fmt header")
    if (samples == null) fail("no data chunk")
    // the chunk walk stops when < 8 bytes remain; any leftover means a
    // forged chunk size re-framed trailing payload bytes as a chunk tail
    // (e.g. a bit-flip that SHRINKS the data size would otherwise decode
    // fewer samples and pass) — the RIFF-size check pins total length
    // only, so the fail-loud contract needs this explicit zero-remainder
    if (buf.remaining != 0)
      fail(s"${buf.remaining} trailing bytes after final chunk")
    WavClip(meta, samples)
  }
}
