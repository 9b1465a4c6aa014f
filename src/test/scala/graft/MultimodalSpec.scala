package graft

import graft.queries.MultimodalQueries
import graft.queries.MultimodalQueries.{MediaCodecStub, MediaIn}

/** A SUBSTITUTE codec pushed through the q40/q55 decode seam by the
  * swap test below — deliberately different arithmetic from
  * [[MediaCodecStub]] (it reads every byte, not just the first), so
  * matching outputs can only mean the query plumbing called THIS
  * decoder. Top-level object: the closure serializes into executor
  * tasks without dragging the test class along.
  */
object AltTestCodec {
  import graft.queries.MultimodalQueries.MediaMeta
  def decode(m: MediaIn): MediaMeta = {
    var s = 0L
    var i = 0
    while (i < m.payload.length) { s += (m.payload(i) & 0xff); i += 1 }
    MediaMeta(m.doc_id, m.payload.length.toLong,
      width = 32L + s % 911L, height = 32L + (s * 13L) % 499L,
      format = "alt")
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("the decode seam is config-only: a substitute codec drops into " +
    "q40/q55 with zero query-code changes and its outputs round-trip") {
    // q40 through the seam: every output row must equal the substitute
    // decoder applied driver-side to the same payload — proof the
    // query plumbing is decoder-agnostic (the real-codec swap claim)
    val texts = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expected = texts.map { case (id, t) =>
      id -> AltTestCodec.decode(MediaIn(id, t.getBytes("UTF-8")))
    }.toMap
    val got = MultimodalQueries.q40With(spark, sf)(AltTestCodec.decode)
      .as[MultimodalQueries.MediaMeta].collect()
    assert(got.length == expected.size)
    got.foreach { m => assert(m == expected(m.doc_id), s"doc ${m.doc_id}") }
    assert(got.forall(_.format == "alt")) // the stub never says "alt"
    // q55 through the same seam: the resize arithmetic downstream of
    // the decoder consumes the SUBSTITUTE's dimensions
    val resized = MultimodalQueries.q55With(spark, sf)(AltTestCodec.decode)
      .select($"doc_id", $"width", $"height", $"resize_h")
      .as[(Long, Long, Long, Long)].collect()
    assert(resized.nonEmpty)
    resized.foreach { case (id, w, h, rh) =>
      val e = expected(id)
      assert(w == e.width && h == e.height)
      assert(rh == math.round(e.height * MultimodalQueries.ResizeW.toDouble / e.width))
    }
  }

  test("codec stub is deterministic and total") {
    val m = MediaIn(7L, "hello world".getBytes("UTF-8"))
    val d1 = MediaCodecStub.decode(m)
    val d2 = MediaCodecStub.decode(m)
    assert(d1 == d2)
    assert(d1.n_bytes == 11L)
    assert(d1.width >= 64 && d1.width < 64 + 577)
    assert(d1.height >= 64 && d1.height < 64 + 353)
    assert(MediaCodecStub.Formats.contains(d1.format))
    // empty payload doesn't crash the decode path
    assert(MediaCodecStub.decode(MediaIn(8L, Array.emptyByteArray)).n_bytes == 0L)
  }

  test("q40 decode keeps one output row per payload with the typed schema") {
    val out = MultimodalQueries.q40(spark, sf)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "format"))
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == n)
    assert(out.select($"doc_id").distinct().count() == n)
  }

  test("q71 real decode: actual PNG containers, header-parsed dims, stub-compatible shape") {
    // the generated payloads are REAL PNGs: magic bytes present
    val sample = MultimodalQueries.realPngMedia(spark, sf).head(3)
    val pngMagic = Array(0x89, 'P', 'N', 'G').map(_.toByte)
    sample.foreach { m =>
      assert(m.payload.take(4).sameElements(pngMagic))
      // and decodeReal shares the stub's exact I/O shape: MediaIn in,
      // MediaMeta out — the swap-in claim, exercised
      val meta: MultimodalQueries.MediaMeta = MultimodalQueries.decodeReal(m)
      assert(meta.doc_id == m.doc_id && meta.format == "png")
      assert(meta.width == 16 + m.doc_id % 32)
      assert(meta.height == 16 + (m.doc_id * 7) % 32)
    }
    // the decoder PARSES, it does not echo: corrupting the IHDR width
    // field changes the decoded width (or fails) — either way the
    // id-derived value is no longer returned
    val m0 = sample.head
    val corrupted = m0.payload.clone()
    corrupted(19) = (corrupted(19) ^ 0x01).toByte // IHDR width low byte
    val echoed =
      try MultimodalQueries.decodeReal(MediaIn(m0.doc_id, corrupted))
        .width == 16 + m0.doc_id % 32
      catch { case _: Exception => false }
    assert(!echoed, "decode echoed id-derived dims for a corrupted container")
  }

  test("q101 aHash reads the decoded raster: a one-pixel edit flips the hash, " +
    "brightness-shifted twins collapse") {
    // recompute one image's hash through the same JVM path, then
    // through a brightness-shifted and a structurally-edited raster —
    // invariance and sensitivity are the aHash contract
    def ahash(img: java.awt.image.BufferedImage): (Long, Long) = {
      val w = img.getWidth; val h = img.getHeight
      val bms = new Array[Long](64)
      for (b <- 0 until 64) {
        val bx = b % 8; val by = b / 8
        val xs = bx * w / 8 until (bx + 1) * w / 8
        val ys = by * h / 8 until (by + 1) * h / 8
        val vals = for (y <- ys; x <- xs) yield (img.getRGB(x, y) & 0xffffff).toLong
        bms(b) = vals.sum / vals.length
      }
      val g = bms.sum / 64
      var hi = 0L; var lo = 0L
      for (b <- 0 until 64) if (bms(b) > g) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      (hi, lo)
    }
    def gen(id: Long, shift: Int): java.awt.image.BufferedImage = {
      val w = (16 + id % 32).toInt; val h = (16 + (id * 7) % 32).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((id + shift + x * 31L + y * 17L) % 0xffffff).toInt)
      img
    }
    val base = ahash(gen(5L, 0))
    assert(ahash(gen(5L, 1000)) == base, "brightness shift must cancel")
    val edited = gen(5L, 0)
    edited.setRGB(0, 0, 0xffffff) // one saturated pixel skews block (0,0)
    assert(ahash(edited) != base, "structural edit must flip the hash")
    // and the corpus query agrees with itself: every doc in a hash
    // group reports the same n_same, groups of >1 are flagged
    val rows = MultimodalQueries.q101(spark, sf)
      .select($"ahash_hi", $"ahash_lo", $"n_same", $"has_perceptual_dup")
      .as[(Long, Long, Long, Boolean)].collect()
    val byHash = rows.groupBy(r => (r._1, r._2))
    byHash.foreach { case (_, g2) =>
      assert(g2.map(_._3).toSet.size == 1 && g2.head._3 == g2.length)
      assert(g2.forall(_._4 == (g2.length > 1)))
    }
    assert(rows.exists(_._4))
  }

  test("q41 frame sampling emits ceil(n_bytes/step) frames per doc") {
    val out = MultimodalQueries.q41(spark, sf)
      .groupBy("doc_id").count()
      .join(MultimodalQueries.q40(spark, sf), "doc_id")
      .select($"count", $"n_bytes").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (frames, bytes) =>
      assert(frames == (bytes + MultimodalQueries.FrameStep - 1) / MultimodalQueries.FrameStep)
    }
  }

  test("q109 real frame sampling: actual animated GIFs, stride-sampled " +
    "decoded frames, q41-compatible shape, corrupt container fails") {
    import MultimodalQueries._
    // the generated payloads are REAL animated GIFs: magic + trailer
    val sample = realGifMedia(spark, sf).head(3)
    sample.foreach { m =>
      assert(new String(m.payload.take(6), "US-ASCII").startsWith("GIF8"))
    }
    // the stub (q41) and real (q109) samplers share the plumbing
    // contract: rows keyed (doc_id, frame_idx) + a per-frame value,
    // stride-bounded count per doc — swap-in-the-real-thing means the
    // downstream schema shape survives the swap
    assert(MultimodalQueries.q41(spark, sf).columns.take(2).toSeq ==
      Seq("doc_id", "frame_idx"))
    val out = MultimodalQueries.q109(spark, sf)
    assert(out.columns.toSeq == Seq("doc_id", "n_frames", "frame_idx",
      "delay_cs", "ts_cs", "gray"))
    val rows = out
      .select($"doc_id", $"n_frames", $"frame_idx", $"delay_cs", $"gray")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nf, f, delay, gray) =>
      assert(nf == GifFramesBase + id % GifFramesMod) // count from container
      assert(f % FrameStride == 0 && f < nf)
      assert(delay == GifDelayBase + id % GifDelayMod) // metadata round-trip
      assert(gray == (id + 7 * f) % 256) // raster round-trip, palette-exact
    }
    // per-doc sampled count is ceil(nf / stride) — the q41 stride law
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val nf = rs.head._2
      assert(rs.length == (nf + FrameStride - 1) / FrameStride)
    }
    // truncating the container mid-stream must fail the decode loudly,
    // not silently emit fewer frames as if the doc had them
    val m0 = sample.head
    val truncated = m0.payload.take(m0.payload.length / 2)
    val quiet =
      try {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(truncated))
        val r = javax.imageio.ImageIO.getImageReaders(in).next()
        r.setInput(in)
        val nf = r.getNumImages(true)
        (0 until nf).foreach(r.read)
        nf.toLong == GifFramesBase + m0.doc_id % GifFramesMod
      } catch { case _: Exception => false }
    assert(!quiet, "truncated GIF decoded as if complete")
  }

  test("q118 WAV: container is genuine RIFF/WAVE, features match the " +
    "generator closed form, corrupt container fails loudly") {
    import MultimodalQueries._
    val sample = realWavMedia(spark, sf).take(8)
    assert(sample.nonEmpty)
    sample.foreach { m =>
      // real container bytes: RIFF magic + WAVE form type
      assert(new String(m.payload.take(4), "US-ASCII") == "RIFF")
      assert(new String(m.payload.slice(8, 12), "US-ASCII") == "WAVE")
    }
    val rows = q118(spark, sf)
      .select($"doc_id", $"n_samples", $"sample_rate", $"bits", $"channels",
        $"sum_abs", $"n_transitions")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == Tables.load(spark, sf, "documents").count())
    rows.foreach { case (id, n, rate, bits, ch, sumAbs, trans) =>
      val amp = WavAmpBase + (id % WavAmpMod) * WavAmpStep
      val halfP = WavHalfPBase + id % WavHalfPMod
      assert(n == WavLenBase + (id % WavLenMod) * WavLenStep)
      assert(rate == WavRate && bits == 16L && ch == 1L)
      assert(sumAbs == n * amp)     // PCM round-trip, sample-exact
      assert(trans == (n - 1) / halfP) // endianness/sign preserved
    }
    // a truncated container must fail the header parse or the frame
    // read, never echo plausible features
    val m0 = sample.head
    val truncated = m0.payload.take(20) // cuts inside the fmt chunk
    val quiet =
      try {
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(truncated)).readAllBytes()
        true
      } catch { case _: Exception => false }
    assert(!quiet, "truncated WAV decoded as if complete")
  }
}
