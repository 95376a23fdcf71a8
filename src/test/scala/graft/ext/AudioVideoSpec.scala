package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Pins the WAV PCM codec against the JDK's independent javax.sound
  * reader (the JpegCodecSpec/ImageIO discipline applied to audio) and
  * the MP4/ISO-BMFF header walk against hand-constructed boxes.
  */
class AudioVideoSpec extends AnyFunSuite {

  private def tone16(f: Int, c: Int): Int = ((f * 31 + c * 997 + 7) % 4001) - 2000
  private def tone8(f: Int, c: Int): Int = ((f * 13 + c * 101 + 3) % 241) - 120

  test("encodeWav → decodeWavSamples roundtrips 16-bit stereo exactly") {
    val nf = 777
    val bytes = Multimodal.encodeWav(16000, 16, 2, nf, tone16)
    val Some((rate, bits, nch, s)) = Multimodal.decodeWavSamples(bytes)
    assert((rate, bits, nch) === ((16000, 16, 2)))
    assert(s.length === nf * 2)
    for (f <- 0 until nf; c <- 0 until 2)
      assert(s(f * 2 + c) === tone16(f, c), s"frame $f ch $c")
  }

  test("encodeWav → decodeWavSamples roundtrips 8-bit mono exactly") {
    val nf = 500
    val bytes = Multimodal.encodeWav(8000, 8, 1, nf, tone8)
    val Some((rate, bits, nch, s)) = Multimodal.decodeWavSamples(bytes)
    assert((rate, bits, nch) === ((8000, 8, 1)))
    assert(s.toSeq === (0 until nf).map(tone8(_, 0)))
  }

  test("javax.sound (independent JDK reader) opens encodeWav output with matching format and PCM bytes") {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    for ((bits, nch, enc) <- Seq(
        (16, 2, AudioFormat.Encoding.PCM_SIGNED),
        (8, 1, AudioFormat.Encoding.PCM_UNSIGNED))) {
      val nf = 321
      val tone = if (bits == 16) tone16 _ else tone8 _
      val bytes = Multimodal.encodeWav(22050, bits, nch, nf, tone)
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getEncoding === enc)
      assert(fmt.getSampleRate === 22050.0f)
      assert(fmt.getSampleSizeInBits === bits)
      assert(fmt.getChannels === nch)
      assert(ais.getFrameLength === nf.toLong)
      val raw = ais.readAllBytes()
      // the JDK reader's raw PCM stream must be byte-identical to our
      // data chunk (the last dataLen bytes of the encoding)
      assert(raw.toSeq === bytes.takeRight(nf * nch * bits / 8).toSeq)
    }
  }

  test("decodeWavSamples rejects non-PCM, odd depths, and truncated chunks") {
    val good = Multimodal.encodeWav(8000, 16, 1, 10, tone16)
    assert(Multimodal.decodeWavSamples(good).isDefined)
    val nonPcm = good.clone(); nonPcm(20) = 3 // wFormatTag = IEEE float
    assert(Multimodal.decodeWavSamples(nonPcm) === None)
    val bad24 = good.clone(); bad24(34) = 24 // bits/sample
    assert(Multimodal.decodeWavSamples(bad24) === None)
    assert(Multimodal.decodeWavSamples(good.take(30)) === None)
    assert(Multimodal.decodeWavSamples("RIFFxxxxWAVE but then garbage bytes".getBytes("UTF-8")) === None)
  }

  test("decodeWavSamples skips unknown chunks and honors odd-length padding") {
    // hand-build: RIFF/WAVE + LIST chunk of ODD length 3 (padded to 4) +
    // fmt + data — the walker must land on fmt/data despite the detour
    val body = new java.io.ByteArrayOutputStream()
    def ascii(s: String) = body.write(s.getBytes("US-ASCII"))
    def le16(v: Int) = { body.write(v & 0xff); body.write((v >> 8) & 0xff) }
    def le32(v: Int) = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    ascii("LIST"); le32(3); body.write(Array[Byte](1, 2, 3, 0)) // odd + pad
    ascii("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(8000); le16(1); le16(8)
    ascii("data"); le32(4); body.write(Array[Byte](0, 64, 127.toByte, 128.toByte))
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val b = body.toByteArray
    out.write(Array[Byte]((4 + b.length & 0xff).toByte, 0, 0, 0)); out.write("WAVE".getBytes("US-ASCII"))
    out.write(b)
    val Some((rate, bits, nch, s)) = Multimodal.decodeWavSamples(out.toByteArray)
    assert((rate, bits, nch) === ((8000, 8, 1)))
    assert(s.toSeq === Seq(-128, -64, -1, 0)) // 8-bit unsigned, centered
  }

  /** Minimal valid MP4: ftyp + moov[mvhd(v0) + trak[tkhd(v0)]]. */
  private def mp4(w: Int, h: Int, durMs: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int) = out.write(Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
    def ascii(s: String) = out.write(s.getBytes("US-ASCII"))
    def zeros(n: Int) = out.write(new Array[Byte](n))
    be32(16); ascii("ftyp"); ascii("isom"); be32(0x200)
    be32(8 + 108 + 100); ascii("moov")
    be32(108); ascii("mvhd"); be32(0); be32(0); be32(0); be32(1000); be32(durMs)
    be32(0x00010000); out.write(1); out.write(0); zeros(2 + 8)
    be32(0x00010000); be32(0); be32(0); be32(0); be32(0x00010000); be32(0); be32(0); be32(0); be32(0x40000000)
    zeros(24); be32(2)
    be32(100); ascii("trak")
    be32(92); ascii("tkhd"); be32(7); be32(0); be32(0); be32(1); be32(0); be32(durMs); zeros(8)
    zeros(2 + 2 + 2 + 2)
    be32(0x00010000); be32(0); be32(0); be32(0); be32(0x00010000); be32(0); be32(0); be32(0); be32(0x40000000)
    be32(w << 16); be32(h << 16)
    out.toByteArray
  }

  test("decodeHeader walks MP4 boxes to tkhd dims and mvhd duration") {
    assert(Multimodal.decodeHeader(mp4(1920, 1080, 37500)) === Some(("mp4", 1920, 1080, 37)))
    assert(Multimodal.decodeHeader(mp4(640, 480, 999)) === Some(("mp4", 640, 480, 0)))
    // truncated moov → None, not a throw
    assert(Multimodal.decodeHeader(mp4(640, 480, 1000).take(40)) === None)
  }

  test("JPEG header walk skips standalone markers (TEM, stray SOI) without misreading a length") {
    // SOI + TEM (standalone) + stray SOI + SOF0 — the old walker read
    // TEM's following bytes as a length and could skip past the SOF
    val p = Array[Int](
      0xff, 0xd8, 0xff, 0x01, 0xff, 0xd8,
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 77, 0x01, 0x2c, 0x03,
      0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)
    assert(Multimodal.decodeHeader(p) === Some(("jpeg", 300, 77, 3)))
  }

  private def apx(f: Int, x: Int, y: Int): Int = ((f * 53 + x * 11 + y * 17 + 5) % 256)

  test("encodeGifAnimated → decodeGifFrames roundtrips every frame exactly") {
    val (w, h, nf) = (11, 7, 5)
    val bytes = Multimodal.encodeGifAnimated(w, h, nf, apx)
    val Some((dw, dh, frames)) = Multimodal.decodeGifFrames(bytes)
    assert((dw, dh, frames.length) === ((w, h, nf)))
    for (f <- 0 until nf; y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert(frames(f)((y * w + x) * 3 + c) === apx(f, x, y), s"f=$f ($x,$y,$c)")
    // the still decoder reads frame 0 of the same bytes
    val Some((sw, sh, sch, first)) = Multimodal.decodePixels(bytes)
    assert((sw, sh, sch) === ((w, h, 3)))
    assert(first.toSeq === frames(0).toSeq)
  }

  test("JDK ImageIO (independent reader) plays our animated GIF frame-by-frame identically") {
    val (w, h, nf) = (13, 9, 4)
    val bytes = Multimodal.encodeGifAnimated(w, h, nf, apx)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(reader.getNumImages(true) === nf)
    val Some((_, _, frames)) = Multimodal.decodeGifFrames(bytes)
    for (f <- 0 until nf) {
      val img = reader.read(f)
      assert(img.getWidth === w && img.getHeight === h, s"frame $f dims")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert((frames(f)((y * w + x) * 3), frames(f)((y * w + x) * 3 + 1),
          frames(f)((y * w + x) * 3 + 2)) ===
          (((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)), s"frame $f ($x,$y)")
      }
    }
    reader.dispose()
  }

  test("decodeGifFrames refuses sub-rectangle frames instead of mis-compositing") {
    val bytes = Multimodal.encodeGifAnimated(8, 6, 2, apx)
    // corrupt frame 0's descriptor left coordinate (descriptor follows the
    // header + GCT + NETSCAPE ext + GCE; find the first 0x2c)
    var i = 13 + 768
    while ((bytes(i) & 0xff) != 0x2c) i += 1
    val bad = bytes.clone()
    bad(i + 1) = 1 // left = 1
    assert(Multimodal.decodeGifFrames(bad) === None)
    // truncation never throws
    for (n <- 0 until bytes.length by 7) Multimodal.decodeGifFrames(bytes.take(n))
  }

  test("imageEmbed pools patch sums under the fixed integer projection") {
    // 4x2 image, 1 channel, pixel value = x + 10*y → each grid cell is a
    // single pixel; embedding k = Σ_j A[k][j]·pix(j)
    val pix = Array.tabulate(8)(i => (i % 4) + 10 * (i / 4))
    val e = Multimodal.imageEmbed(4, 2, 1, pix)
    for (k <- 0 until Multimodal.featureDim) {
      val want = (0 until 8).map(j => ((((k * 7 + j * 3) % 5) - 2) * pix(j)).toLong).sum
      assert(e(k) === want.toFloat, s"dim $k")
    }
  }

  test("encodeMp4 → decodeMp4Samples roundtrips stts runs, stsz sizes and stss sync samples") {
    val runs = Array((3, 100), (2, 250), (4, 40))
    val sizes = Array(11, 22, 33, 44, 55, 66, 77, 88, 99)
    val bytes = Multimodal.encodeMp4(320, 240, 600, runs, sizes, syncEvery = 3)
    val Some((ts, deltas, dsizes, sync)) = Multimodal.decodeMp4Samples(bytes)
    assert(ts === 600)
    assert(deltas.toSeq === Seq(100, 100, 100, 250, 250, 40, 40, 40, 40))
    assert(dsizes.toSeq === sizes.toSeq)
    assert(sync.toSeq === Seq(1, 4, 7)) // 1-based, every 3rd
    // the existing header walk reads consistent dims + whole seconds off
    // the same bytes (total duration 1140 ticks / timescale 600 → 1 s)
    assert(Multimodal.decodeHeader(bytes) === Some(("mp4", 320, 240, 1)))
  }

  test("decodeMp4Samples handles uniform stsz and rejects malformed tables without throwing") {
    val good = Multimodal.encodeMp4(64, 48, 1000, Array((4, 10)), Array(1, 2, 3, 4), 2)
    var i = 0
    var stsz = -1
    while (stsz < 0 && i + 8 <= good.length) {
      if (good(i + 4) == 's' && good(i + 5) == 't' && good(i + 6) == 's' && good(i + 7) == 'z') stsz = i
      i += 1
    }
    // rewrite sample_size (stsz+12..15) from 0 to 9 → uniform form wins
    // over the now-ignored per-sample table
    val uni = good.clone()
    uni(stsz + 15) = 9
    val Some((_, _, s0, _)) = Multimodal.decodeMp4Samples(uni)
    assert(s0.toSeq === Seq(9, 9, 9, 9))
    // stsz count mismatched against stts total → None
    val bad = good.clone()
    bad(stsz + 19) = 7 // sample_count 4 → 7
    assert(Multimodal.decodeMp4Samples(bad) === None)
    // truncation never throws
    for (n <- 0 until good.length by 5) Multimodal.decodeMp4Samples(good.take(n))
    assert(Multimodal.decodeMp4Samples("not an mp4 at all, truly not".getBytes("UTF-8")) === None)
    // a hostile box size near Int.MaxValue must not overflow the walk
    // (i + sz wrapping negative would throw out-of-bounds, not None)
    val hostile = good.clone()
    val moov = {
      var j = 0; var at = -1
      while (at < 0 && j + 8 <= hostile.length) {
        if (hostile(j + 4) == 'm' && hostile(j + 5) == 'o' && hostile(j + 6) == 'o'
          && hostile(j + 7) == 'v') at = j
        j += 1
      }
      at
    }
    // rewrite a PRECEDING box's size to 0x7FFFFFF0 so the walk must
    // reject it before reaching moov
    hostile(0) = 0x7f; hostile(1) = 0xff.toByte; hostile(2) = 0xff.toByte; hostile(3) = 0xf0.toByte
    assert(moov > 0)
    assert(Multimodal.decodeMp4Samples(hostile) === None)
    assert(Multimodal.decodeHeader(hostile) === None)
  }

  test("downsampleSums computes exact boxcar block sums per channel, dropping the partial tail") {
    // stereo interleave: L(f) = f, R(f) = 100 - f; 7 frames, factor 3 → 2 blocks
    val s = (0 until 7).flatMap(f => Seq(f, 100 - f)).toArray
    val out = Multimodal.downsampleSums(2, s, 3)
    assert(out(0).toSeq === Seq(0L + 1 + 2, 3L + 4 + 5))
    assert(out(1).toSeq === Seq(100L + 99 + 98, 97L + 96 + 95))
  }

  test("autocorrelation argmax recovers the planted period on the x_audio_pitch construction") {
    // the query's exact formula: period p = id%8+4, n = id%40+60 frames of
    // odd never-zero values with a QUADRATIC phase scramble — a pure
    // linear phase makes a smooth ramp whose lag-2 autocorrelation beats
    // the aligned lag; with j²·41 in the phase, r(p) wins on EVERY id
    // (measured exact on ids 0..20000).
    var hit = 0
    val ids = 0L until 400L
    for (id <- ids) {
      val p = (id % 8 + 4).toInt
      val n = (id % 40 + 60).toInt
      val ss = Array.tabulate(n) { f =>
        val j = (f % p).toLong
        2 * ((id * 31 + j * j * 41 + j * 97) % 100).toInt + 1 - 100
      }
      val best = (2 to 16).maxBy { lag =>
        var r = 0L
        var i = 0
        while (i + lag < n) { r += ss(i).toLong * ss(i + lag); i += 1 }
        (r, -lag)
      }
      if (best == p) hit += 1
    }
    assert(hit === 400, s"pitch detection hit only $hit/400 planted periods")
  }
}
