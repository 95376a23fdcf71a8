package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzzing of the media codecs — the CrawlPropertySpec
  * discipline applied to pixels and PCM: RANDOMIZED content and shapes
  * (seeded, so failures reproduce) through encode→decode, pinned
  * against the JDK's independent implementations (ImageIO, javax.sound)
  * in BOTH directions. The existing codec specs pin constructed formula
  * images; random structure exercises filter choices, huffman code
  * shapes, LZW dictionary growth and upsampling phases those formulas
  * can miss.
  */
class MediaPropertySpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  // ------------------------------------------------------------------ PNG

  test("PNG: random images/filters round-trip ours and ImageIO reads them identically") {
    val r = rng(0xA11CE)
    for (trial <- 0 until 24) {
      val w = 1 + r.nextInt(23)
      val h = 1 + r.nextInt(17)
      val ch = 1 + r.nextInt(4)
      val pix = Array.fill(w * h * ch)(r.nextInt(256))
      val filters = Array.fill(h)(r.nextInt(5))
      val bytes = Multimodal.encodePng(w, h, ch,
        (x, y, c) => pix((y * w + x) * ch + c), y => filters(y))
      val Some((dw, dh, dch, mine)) = Multimodal.decodePixels(bytes)
      assert((dw, dh, dch) === ((w, h, ch)), s"trial $trial")
      assert(mine.toSeq === pix.toSeq, s"trial $trial own round-trip")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth === w && img.getHeight === h, s"trial $trial")
      val raster = img.getRaster
      assert(raster.getNumBands === ch, s"trial $trial bands")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert(raster.getSample(x, y, c) === pix((y * w + x) * ch + c),
          s"trial $trial ($x,$y,$c) ch=$ch")
    }
  }

  test("PNG: our decoder reads ImageIO-written random gray/RGB/ARGB identically") {
    import java.awt.image.BufferedImage
    val r = rng(0xB0B)
    for (trial <- 0 until 12) {
      val w = 1 + r.nextInt(21)
      val h = 1 + r.nextInt(15)
      val (typ, ch) = r.nextInt(3) match {
        case 0 => (BufferedImage.TYPE_BYTE_GRAY, 1)
        case 1 => (BufferedImage.TYPE_3BYTE_BGR, 3)
        case _ => (BufferedImage.TYPE_INT_ARGB, 4)
      }
      val pix = Array.fill(w * h * ch)(r.nextInt(256))
      val img = new BufferedImage(w, h, typ)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        img.getRaster.setSample(x, y, c, pix((y * w + x) * ch + c))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      val Some((dw, dh, dch, mine)) = Multimodal.decodePixels(out.toByteArray)
      assert((dw, dh, dch) === ((w, h, ch)), s"trial $trial")
      // compare against the JDK's raster bands (its ARGB raster order is
      // R,G,B,A — same band indexing both sides)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert(mine((y * w + x) * ch + c) === img.getRaster.getSample(x, y, c),
          s"trial $trial ($x,$y,$c) ch=$ch")
    }
  }

  // ------------------------------------------------------------------ JPEG

  test("JPEG: random content — ImageIO decodes our bytes bit-identically to our decoder") {
    val r = rng(0xCAFE)
    for (trial <- 0 until 8) {
      val w = 1 + r.nextInt(30)
      val h = 1 + r.nextInt(22)
      val ch = if (r.nextBoolean()) 1 else 3
      val pix = Array.fill(w * h * ch)(r.nextInt(256))
      val bytes = Jpeg.encode(w, h, ch, (x, y, c) => pix((y * w + x) * ch + c), Jpeg.qStandard)
      val Some((dw, dh, dch, mine)) = Multimodal.decodePixels(bytes)
      assert((dw, dh, dch) === ((w, h, ch)), s"trial $trial")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth === w && img.getHeight === h, s"trial $trial")
      for (y <- 0 until h; x <- 0 until w)
        if (ch == 1)
          assert(mine(y * w + x) === img.getRaster.getSample(x, y, 0), s"trial $trial ($x,$y)")
        else {
          val rgb = img.getRGB(x, y)
          val o = (y * w + x) * 3
          assert((mine(o), mine(o + 1), mine(o + 2)) ===
            (((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)), s"trial $trial ($x,$y)")
        }
    }
  }

  test("JPEG: our decoder reads ImageIO-written random gray and 4:2:0 color bit-identically") {
    import java.awt.image.BufferedImage
    val r = rng(0xD00D)
    for (trial <- 0 until 8) {
      val w = 1 + r.nextInt(26)
      val h = 1 + r.nextInt(19)
      val gray = r.nextBoolean()
      val img = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        if (gray) img.getRaster.setSample(x, y, 0, r.nextInt(256))
        else img.setRGB(x, y, r.nextInt(1 << 24))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpeg", out))
      val bytes = out.toByteArray
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val Some((dw, dh, dch, mine)) = Multimodal.decodePixels(bytes)
      assert((dw, dh, dch) === ((w, h, if (gray) 1 else 3)), s"trial $trial")
      for (y <- 0 until h; x <- 0 until w)
        if (gray)
          assert(mine(y * w + x) === back.getRaster.getSample(x, y, 0),
            s"trial $trial ($x,$y) gray $w x $h")
        else {
          val rgb = back.getRGB(x, y)
          val o = (y * w + x) * 3
          assert((mine(o), mine(o + 1), mine(o + 2)) ===
            (((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)),
            s"trial $trial ($x,$y) color $w x $h")
        }
    }
  }

  // ------------------------------------------------------------------ GIF

  test("GIF: random gray images and animations — ours and ImageIO agree frame-by-frame") {
    val r = rng(0xF00D)
    for (trial <- 0 until 8) {
      val w = 1 + r.nextInt(40)
      val h = 1 + r.nextInt(30)
      val pix = Array.fill(w * h)(r.nextInt(256))
      val bytes = Multimodal.encodeGif(w, h, (x, y) => pix(y * w + x))
      val Some((dw, dh, dch, mine)) = Multimodal.decodePixels(bytes)
      assert((dw, dh, dch) === ((w, h, 3)), s"trial $trial")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"trial $trial")
      for (y <- 0 until h; x <- 0 until w) {
        val v = pix(y * w + x)
        val o = (y * w + x) * 3
        assert((mine(o), mine(o + 1), mine(o + 2)) === ((v, v, v)), s"trial $trial ($x,$y)")
        val rgb = img.getRGB(x, y)
        assert((((rgb >> 16) & 0xff), ((rgb >> 8) & 0xff), (rgb & 0xff)) === ((v, v, v)),
          s"trial $trial ImageIO ($x,$y)")
      }
    }
    // random ANIMATION: every frame through both readers
    val (w, h, nf) = (11, 7, 3)
    val fpix = Array.fill(nf, w * h)(r.nextInt(256))
    val bytes = Multimodal.encodeGifAnimated(w, h, nf, (f, x, y) => fpix(f)(y * w + x))
    val Some((_, _, frames)) = Multimodal.decodeGifFrames(bytes)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(reader.getNumImages(true) === nf)
    for (f <- 0 until nf) {
      val img = reader.read(f)
      for (y <- 0 until h; x <- 0 until w) {
        val v = fpix(f)(y * w + x)
        assert(frames(f)((y * w + x) * 3) === v, s"frame $f ($x,$y) ours")
        assert(((img.getRGB(x, y) >> 16) & 0xff) === v, s"frame $f ($x,$y) ImageIO")
      }
    }
    reader.dispose()
  }

  test("GIF: our decoder reads ImageIO-written random gray identically") {
    val r = rng(0xFEED)
    for (trial <- 0 until 6) {
      val w = 1 + r.nextInt(30)
      val h = 1 + r.nextInt(24)
      val pix = Array.fill(w * h)(r.nextInt(256))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, pix(y * w + x))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", out))
      val Some((dw, dh, dch, mine)) = Multimodal.decodePixels(out.toByteArray)
      assert((dw, dh, dch) === ((w, h, 3)), s"trial $trial")
      for (y <- 0 until h; x <- 0 until w) {
        val v = pix(y * w + x)
        val o = (y * w + x) * 3
        assert((mine(o), mine(o + 1), mine(o + 2)) === ((v, v, v)), s"trial $trial ($x,$y)")
      }
    }
  }

  // ------------------------------------------------------------------ WAV

  test("WAV: random PCM — javax.sound opens ours; ours reads javax.sound's") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val r = rng(0xBEEF)
    for (trial <- 0 until 10) {
      val rate = Seq(8000, 16000, 22050, 44100)(r.nextInt(4))
      val bits = if (r.nextBoolean()) 8 else 16
      val nch = 1 + r.nextInt(2)
      val nf = 1 + r.nextInt(400)
      val lo = if (bits == 8) -128 else -32768
      val hi = if (bits == 8) 127 else 32767
      val samples = Array.fill(nf * nch)(lo + r.nextInt(hi - lo + 1))
      // ours -> javax.sound
      val bytes = Multimodal.encodeWav(rate, bits, nch, nf, (f, c) => samples(f * nch + c))
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      assert(ais.getFormat.getSampleRate === rate.toFloat, s"trial $trial")
      assert(ais.getFormat.getSampleSizeInBits === bits && ais.getFormat.getChannels === nch)
      assert(ais.getFrameLength === nf.toLong)
      assert(ais.readAllBytes().toSeq === bytes.takeRight(nf * nch * bits / 8).toSeq,
        s"trial $trial PCM bytes")
      // javax.sound -> ours
      val fmt = new AudioFormat(
        if (bits == 8) AudioFormat.Encoding.PCM_UNSIGNED else AudioFormat.Encoding.PCM_SIGNED,
        rate.toFloat, bits, nch, nch * bits / 8, rate.toFloat, false)
      val pcm = new Array[Byte](nf * nch * bits / 8)
      var i = 0
      samples.foreach { s =>
        if (bits == 8) { pcm(i) = (s + 128).toByte; i += 1 }
        else { pcm(i) = (s & 0xff).toByte; pcm(i + 1) = ((s >> 8) & 0xff).toByte; i += 2 }
      }
      val src = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nf.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(src, AudioFileFormat.Type.WAVE, out)
      val Some((drate, dbits, dnch, ds)) = Multimodal.decodeWavSamples(out.toByteArray)
      assert((drate, dbits, dnch) === ((rate, bits, nch)), s"trial $trial")
      assert(ds.toSeq === samples.toSeq, s"trial $trial samples")
    }
  }
}
