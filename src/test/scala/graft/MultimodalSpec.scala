package graft

import graft.functions.AviCodec
import graft.queries.MultimodalQueries
import graft.queries.MultimodalQueries.MediaIn
import org.apache.spark.sql.functions.octet_length

/** A SUBSTITUTE codec pushed through the q40 decode seam by the swap
  * test below — deliberately different arithmetic from the real AVI
  * parse (it sums every byte instead of walking RIFF chunks), so
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

  /** The q55 seam's substitute: a synthetic one-frame clip whose
    * dimensions and pixels derive from the byte sum — nothing the AVI
    * parser would ever produce, so q55 outputs matching the
    * driver-side prediction prove the clip seam called this decoder.
    */
  def decodeClip(bytes: Array[Byte]): AviCodec.AviClip = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    val w = (8 + s % 8).toInt; val h = (8 + s % 5).toInt
    val px = Array.tabulate(w * h)(j => ((s + 131L * j) % 0xffffff).toInt)
    AviCodec.AviClip(AviCodec.AviMeta(w, h, 1000L, 1), IndexedSeq(px))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("the decode seam is config-only: a substitute codec drops into " +
    "q40/q55 with zero query-code changes and its outputs round-trip") {
    // q40 through the seam: every output row must equal the substitute
    // decoder applied driver-side to the same payload — proof the
    // query plumbing is decoder-agnostic (the payload is rebuilt
    // driver-side from the pure generator, the realPngMedia trick the
    // AVI path shares by construction)
    val ids = Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    val expected = ids.map { id =>
      id -> AltTestCodec.decode(MediaIn(id, MultimodalQueries.aviPayload(id)))
    }.toMap
    val got = MultimodalQueries.q40With(spark, sf)(AltTestCodec.decode)
      .as[MultimodalQueries.MediaMeta].collect()
    assert(got.length == expected.size)
    got.foreach { m => assert(m == expected(m.doc_id), s"doc ${m.doc_id}") }
    assert(got.forall(_.format == "alt")) // the real parse never says "alt"
    // q55 through the clip seam: the resize + feature arithmetic
    // downstream of the decoder consumes the SUBSTITUTE's clip
    val resized = MultimodalQueries.q55With(spark, sf)(AltTestCodec.decodeClip)
      .select($"doc_id", $"width", $"height", $"resize_h")
      .as[(Long, Long, Long, Long)].collect()
    assert(resized.nonEmpty)
    resized.foreach { case (id, w, h, rh) =>
      val clip = AltTestCodec.decodeClip(MultimodalQueries.aviPayload(id))
      assert(w == clip.meta.width && h == clip.meta.height)
      assert(rh == math.round(
        clip.meta.height * MultimodalQueries.ResizeW.toDouble / clip.meta.width))
    }
  }

  test("AVI codec: encode→decode round-trips meta and every pixel; " +
    "the container is genuine RIFF and the size closed form is exact") {
    import MultimodalQueries._
    for (id <- Seq(0L, 3L, 17L, 118L, 9999L)) {
      val bytes = aviPayload(id)
      // real container bytes: RIFF magic + AVI form type
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") == "AVI ")
      // the closed form the q40 oracle relies on IS the payload size
      assert(bytes.length ==
        AviCodec.encodedSize(aviW(id), aviH(id), aviFrames(id)))
      val clip = AviCodec.decode(bytes)
      assert(clip.meta.width == aviW(id) && clip.meta.height == aviH(id))
      assert(clip.meta.nFrames == aviFrames(id))
      assert(clip.meta.usPerFrame == aviUsPerFrame(id)) // fps round-trip
      assert(clip.frames.length == aviFrames(id))
      // pixel-exact round-trip through the bottom-up BGR DIB layout
      clip.frames.zipWithIndex.foreach { case (px, f) =>
        var y = 0
        while (y < aviH(id)) {
          var x = 0
          while (x < aviW(id)) {
            assert(px(y * aviW(id) + x) == aviPixel(id, f, x, y),
              s"doc $id frame $f pixel ($x,$y)")
            x += 1
          }
          y += 1
        }
      }
    }
  }

  test("AVI codec: corrupt containers fail loudly, never echo") {
    import MultimodalQueries._
    val bytes = aviPayload(42L)
    // truncation mid-movi: the RIFF size check fires
    intercept[IllegalArgumentException] {
      AviCodec.decode(bytes.take(bytes.length / 2))
    }
    // a bit-flip in the avih width makes headers disagree with strf
    val flipped = bytes.clone()
    flipped(64) = (flipped(64) ^ 0x01).toByte // avih dwWidth low byte
    val echoed =
      try AviCodec.decode(flipped).meta.width == aviW(42L)
      catch { case _: IllegalArgumentException => false }
    assert(!echoed, "decode echoed id-derived dims for a corrupted container")
    // frame-count lie: strh/avih vs movi mismatch is cross-checked
    val lied = bytes.clone()
    lied(48) = (lied(48) ^ 0x01).toByte // avih dwTotalFrames low byte
    intercept[IllegalArgumentException] { AviCodec.decode(lied) }
    // forged SKIP-branch chunk with size 0xFFFFFFF8: the fourcc is
    // junked so the top-level walk takes its default skip, and the
    // size wraps to -8 through .toInt — exactly cancelling the 8-byte
    // chunk-header read, so the unbounded walk re-parses the same
    // bytes FOREVER (a hang, which a quarantining stream consumer
    // can't flag; the frame branch's own size check never runs on a
    // skip). Must fail loudly instead.
    val forged = bytes.clone()
    val moviOff = 212 // the top-level 'LIST <sz> movi' header
    "JUNK".getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) =>
      forged(moviOff + i) = b
    }
    Array(0xf8, 0xff, 0xff, 0xff).zipWithIndex.foreach { case (b, i) =>
      forged(moviOff + 4 + i) = b.toByte
    }
    intercept[IllegalArgumentException] { AviCodec.decode(forged) }
    // deeply nested forged LIST/strl headers must fail the depth cap,
    // never overflow the stack (StackOverflowError is uncatchable for
    // the quarantine path)
    val nested = java.nio.ByteBuffer.allocate(8 + 4 + 12 * 64 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nested.put("RIFF".getBytes("US-ASCII"))
    nested.putInt(nested.capacity - 8)
    nested.put("AVI ".getBytes("US-ASCII"))
    var levelLen = nested.capacity - 12 - 8 // outer hdrl list content
    nested.put("LIST".getBytes("US-ASCII")); nested.putInt(levelLen)
    nested.put("hdrl".getBytes("US-ASCII"))
    (0 until 63).foreach { _ =>
      levelLen -= 12
      nested.put("LIST".getBytes("US-ASCII")); nested.putInt(levelLen)
      nested.put("strl".getBytes("US-ASCII"))
    }
    val ex = intercept[IllegalArgumentException] {
      AviCodec.decode(nested.array)
    }
    assert(ex.getMessage.contains("nesting too deep"))
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

  test("q41 byte-stride sampling emits ceil(n_bytes/step) rows per doc") {
    // n_bytes comes straight from the text payload q41 samples — q40
    // moved to real AVI containers, so its metadata no longer
    // describes q41's input (the r12 decoupling)
    val out = MultimodalQueries.q41(spark, sf)
      .groupBy("doc_id").count()
      .join(Tables.load(spark, sf, "documents")
        .select($"doc_id", octet_length($"text".cast("binary"))
          .cast("long").as("n_bytes")), "doc_id")
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

  test("PngCodec cross-codec pins: JDK ImageIO reads the hand-rolled " +
    "encoder's containers pixel-exactly; the Decoder reads the JDK " +
    "writer's (adaptive filters); corruption fails loudly") {
    import graft.functions.PngCodec
    javax.imageio.ImageIO.setUseCache(false)
    val enc = new PngCodec.Encoder
    val dec = new PngCodec.Decoder
    // (1) our encoder through the REFERENCE codec, on the real q71
    // generator pattern plus asymmetric dims
    Seq((3L, 19, 37), (7L, 47, 16), (11L, 1, 5)).foreach { case (id, w, h) =>
      val rgb = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        ((id + x * 31L + y * 17L) % 0xffffff).toInt
      }
      val ours = enc.encodeRgb(w, h, rgb)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ours))
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xffffff) == rgb(y * w + x),
          s"pixel ($x,$y) drifted through the JDK reader")
      // header() agrees without touching IDAT
      val hd = PngCodec.header(ours)
      assert(hd.width == w && hd.height == h &&
        hd.bitDepth == 8 && hd.colorType == 2)
      // (2) round-trip through our own decoder
      val (dw, dh, px) = dec.decodeRgb(ours)
      assert(dw == w && dh == h)
      assert(px.take(w * h).sameElements(rgb))
      // (3) the JDK WRITER's container (adaptive row filters) through
      // our decoder — the reverse direction
      val jimg = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        jimg.setRGB(x, y, rgb(y * w + x))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(jimg, "png", bos)
      val (jw, jh, jpx) = dec.decodeRgb(bos.toByteArray)
      assert(jw == w && jh == h)
      assert(jpx.take(w * h).sameElements(rgb),
        "JDK-written (adaptive-filter) raster drifted through the Decoder")
    }
    // (4) corruption fails loudly: every truncation prefix, a flipped
    // IHDR byte (the CRC pin), and a flipped IDAT payload byte
    val base = enc.encodeRgb(8, 8, Array.tabulate(64)(i => i * 1000))
    (1 until base.length).foreach { cut =>
      intercept[IllegalArgumentException] {
        dec.decodeRgb(base.take(cut)): Unit
      }: Unit
    }
    val flippedIhdr = base.clone(); flippedIhdr(19) = (flippedIhdr(19) ^ 1).toByte
    intercept[IllegalArgumentException] { PngCodec.header(flippedIhdr): Unit }: Unit
    val flippedIdat = base.clone(); flippedIdat(40) = (flippedIdat(40) ^ 1).toByte
    intercept[IllegalArgumentException] { dec.decodeRgb(flippedIdat): Unit }: Unit
  }

  test("GifCodec cross-codec pins: JDK ImageIO reads the hand-rolled " +
    "encoder's containers; the Sampler reads the JDK writer's; both " +
    "agree on arbitrary rasters; truncation fails loudly") {
    import graft.functions.GifCodec
    javax.imageio.ImageIO.setUseCache(false)
    // (1) our encoder's output through the REFERENCE codec: frame
    // count, GCE delay metadata, and every raster sample round-trip
    val enc = new GifCodec.Encoder(16, 16)
    val jdkReader =
      javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    def jdkDecode(payload: Array[Byte]): (Int, Seq[(Long, Long)]) = {
      // (nFrames, per-frame (delay, rasterSum)) via javax.imageio
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        jdkReader.setInput(in)
        val nf = jdkReader.getNumImages(true)
        (nf, (0 until nf).map { f =>
          val img = jdkReader.read(f)
          var sum = 0L
          for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
            sum += img.getRaster.getSample(x, y, 0)
          val gce = jdkReader.getImageMetadata(f)
            .getAsTree("javax_imageio_gif_image_1.0")
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            .getElementsByTagName("GraphicControlExtension").item(0)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          (gce.getAttribute("delayTime").toLong, sum)
        })
      } finally in.close()
    }
    // arbitrary (NOT constant-gray) rasters: a mixed-period pattern
    // that exercises dictionary growth and the KwKwK corner, one
    // gradient frame, one constant frame
    val frames = Array(
      Array.tabulate(256)(i => ((i * 7 + i / 16) % 256).toByte),
      Array.tabulate(256)(i => (i % 256).toByte),
      Array.fill(256)(42.toByte),
      Array.tabulate(256)(i => (if (i % 3 == 0) 5 else i % 11).toByte))
    val delays = Array(3, 7, 11, 2)
    enc.begin()
    frames.zip(delays).foreach { case (px, d) => enc.addFrame(px, d) }
    val ours = enc.finish()
    val (jnf, jframes) = jdkDecode(ours)
    assert(jnf == 4)
    jframes.zipWithIndex.foreach { case ((delay, sum), f) =>
      assert(delay == delays(f).toLong)
      assert(sum == frames(f).map(_ & 0xff).map(_.toLong).sum,
        s"frame $f raster sum drifted through the JDK reader")
    }
    // (2) the Sampler over the SAME container at stride 1 agrees
    val sampler = new GifCodec.Sampler
    val s1 = sampler.sample(ours, 1)
    assert(s1.nFrames == 4)
    s1.samples.foreach { fr =>
      assert(fr.width == 16 && fr.height == 16)
      assert(fr.delayCs == delays(fr.frameIdx))
      assert(fr.indexSum ==
        frames(fr.frameIdx).map(_ & 0xff).map(_.toLong).sum)
    }
    // stride 2 keeps exactly frames 0 and 2
    assert(sampler.sample(ours, 2).samples.map(_.frameIdx).toSeq == Seq(0, 2))
    // (3) the Sampler over the JDK WRITER's container (interlaced,
    // TYPE_BYTE_GRAY palette) — the reverse direction of pin (1)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val typeSpec = new javax.imageio.ImageTypeSpecifier(img)
    val meta = writer.getDefaultImageMetadata(typeSpec, param)
    val fmt = meta.getNativeMetadataFormatName
    val root = meta.getAsTree(fmt)
      .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    root.getElementsByTagName("GraphicControlExtension").item(0)
      .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      .setAttribute("delayTime", "9")
    meta.setFromTree(fmt, root)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { px =>
      for (y <- 0 until 16; x <- 0 until 16)
        img.getRaster.setSample(x, y, 0, px(y * 16 + x) & 0xff)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), param)
    }
    writer.endWriteSequence()
    ios.close()
    val theirs = bos.toByteArray
    val s2 = sampler.sample(theirs, 1)
    assert(s2.nFrames == 4)
    s2.samples.foreach { fr =>
      assert(fr.delayCs == 9)
      assert(fr.indexSum ==
        frames(fr.frameIdx).map(_ & 0xff).map(_.toLong).sum,
        s"frame ${fr.frameIdx} index sum drifted through the Sampler " +
          "on a JDK-written (interlaced) stream")
    }
    // (4) truncation fails loudly at EVERY prefix length — never a
    // silent partial answer (the WavCodec exception contract)
    (1 until ours.length).foreach { cut =>
      intercept[IllegalArgumentException] {
        sampler.sample(ours.take(cut), 2): Unit
      }: Unit
    }
    // a forged trailer position (trailer byte flipped to an image
    // introducer) cannot loop or succeed either
    val forged = ours.clone()
    forged(forged.length - 1) = 0x2C.toByte
    intercept[IllegalArgumentException] { sampler.sample(forged, 1): Unit }: Unit
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
    intercept[IllegalArgumentException] {
      graft.functions.WavCodec.decode(truncated)
    }
  }

  test("WavCodec encoder layout matches the JDK's WAV writer/parser " +
    "byte-for-byte (independent oracle: AudioSystem must read our " +
    "container back to the identical format + PCM payload)") {
    import graft.functions.WavCodec
    // one driver-side cross-check — the JDK's synchronized provider
    // lookup is exactly why the hot path no longer calls AudioSystem,
    // but as a spec-only oracle it proves the two encoders can't drift
    val pcm = Array.tabulate(321)(i => ((i * 37) % 1500 - 700).toShort)
    val bytes = WavCodec.encode(8000, pcm)
    assert(bytes.length == WavCodec.encodedSize(pcm.length))
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      assert(fmt.getSampleRate == 8000f && fmt.getSampleSizeInBits == 16 &&
        fmt.getChannels == 1 && !fmt.isBigEndian)
      assert(ais.getFrameLength == pcm.length.toLong)
      val raw = ais.readAllBytes()
      assert(raw.length == 2 * pcm.length)
      pcm.indices.foreach { i =>
        val v = ((raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xff)).toShort
        assert(v == pcm(i), s"PCM drift at sample $i")
      }
      // and the JDK's own writer produces the identical container for
      // the identical PCM — the layouts are byte-for-byte the same
      val fmt2 = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val raw2 = new Array[Byte](2 * pcm.length)
      pcm.indices.foreach { i =>
        raw2(2 * i) = (pcm(i) & 0xff).toByte
        raw2(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw2), fmt2, pcm.length.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      assert(java.util.Arrays.equals(bos.toByteArray, bytes),
        "WavCodec container differs from the JDK writer's layout")
    } finally ais.close()
  }

  test("WavCodec strict parse: forged sizes, header inconsistencies, " +
    "and structural corruption all fail loudly as IllegalArgumentException") {
    import graft.functions.WavCodec
    import java.nio.{ByteBuffer, ByteOrder}
    val good = WavCodec.encode(8000, Array.tabulate(100)(i => (i - 50).toShort))
    def mut(f: ByteBuffer => Unit): Array[Byte] = {
      val b = good.clone()
      f(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)); b
    }
    // bad magic / form type
    intercept[IllegalArgumentException] { WavCodec.decode(mut(_.put(0, 'X'.toByte))) }
    intercept[IllegalArgumentException] { WavCodec.decode(mut(_.put(8, 'X'.toByte))) }
    // RIFF size lies about the payload
    intercept[IllegalArgumentException] { WavCodec.decode(mut(_.putInt(4, 7))) }
    // forged fmt chunk size 0xFFFFFFF8 — the wrap-to-negative pattern
    // that used to hang the AVI walk; must fail, never loop
    intercept[IllegalArgumentException] { WavCodec.decode(mut(_.putInt(16, 0xFFFFFFF8))) }
    // blockAlign / byteRate inconsistent with channels·bits
    intercept[IllegalArgumentException] { WavCodec.decode(mut(_.putShort(32, 4.toShort))) }
    intercept[IllegalArgumentException] { WavCodec.decode(mut(_.putInt(28, 999))) }
    // 8-bit sample size unsupported
    intercept[IllegalArgumentException] { WavCodec.decode(mut(_.putShort(34, 8.toShort))) }
    // data length not a multiple of blockAlign
    intercept[IllegalArgumentException] { WavCodec.decode(mut(_.putInt(40, 199))) }
    // data length SHRUNK by one sample (still even, still <= remaining):
    // the RIFF-size check pins only total length, so without the
    // trailing-bytes rule this decoded 99 samples with ok=true — the
    // r13 ADVICE hole; must fail naming the 2 leftover bytes
    val shrunkErr = intercept[IllegalArgumentException] {
      WavCodec.decode(mut(_.putInt(40, 198)))
    }
    assert(shrunkErr.getMessage.contains("trailing bytes"))
    // compressed format tag
    intercept[IllegalArgumentException] { WavCodec.decode(mut(_.putShort(20, 2.toShort))) }
    // empty input and garbage input
    intercept[IllegalArgumentException] { WavCodec.decode(Array.emptyByteArray) }
    intercept[IllegalArgumentException] { WavCodec.decode(Array.fill(64)(0x5a.toByte)) }
    // an unknown odd-sized chunk between fmt and data is skipped with
    // the RIFF pad byte and the container still decodes
    val n = 10
    val withJunk = {
      val pcm = Array.tabulate(n)(i => i.toShort)
      val base = WavCodec.encode(8000, pcm)
      val junk = Array[Byte]('j', 'u', 'n', 'k', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
      val out = ByteBuffer.allocate(base.length + junk.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      out.put(base, 0, 36)            // RIFF..WAVE + fmt chunk
      out.put(junk)                   // 'junk' sz=5 + 5 bytes + pad
      out.put(base, 36, base.length - 36) // data chunk
      val arr = out.array
      ByteBuffer.wrap(arr).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(4, arr.length - 8)    // re-true the RIFF size
      arr
    }
    val clip = WavCodec.decode(withJunk)
    assert(clip.meta.nFrames == n && clip.samples.length == n)
    assert(clip.samples.zipWithIndex.forall { case (v, i) => v.toInt == i })
  }
}
