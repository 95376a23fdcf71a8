package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The progressive (SOF2) decode path, pinned three independent ways:
  * (1) our progressive encoder's output must decode pixel-identical to
  * the BASELINE encoding of the same image (progressive only reorders
  * coefficient transmission — same quantized values, same IDCT); (2) the
  * JDK's libjpeg-based ImageIO writer in progressive mode (its standard
  * 10-scan script WITH AC successive approximation — refinement scans,
  * EOB runs) must decode bit-identical to ImageIO's own reader; (3) the
  * constant-block/unit-quantizer construction stays mathematically exact
  * through the progressive path, keeping the DuckDB oracle valid.
  */
class ProgressiveJpegSpec extends AnyFunSuite {

  private def blockVal(seed: Long)(bx: Int, by: Int): Int =
    ((seed * 29 + bx * 31 + by * 47) % 256).toInt

  private def px(seed: Long)(x: Int, y: Int, c: Int): Int =
    ((seed * 31 + x * 7 + y * 13 + c * 101) % 256).toInt

  private def writeProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  private def isSof2(p: Array[Byte]): Boolean = {
    var i = 2
    while (i + 4 <= p.length && (p(i) & 0xff) == 0xff) {
      val m = p(i + 1) & 0xff
      if (m == 0xc2) return true
      if (m == 0xc0 || m == 0xc1 || m == 0xda) return false
      i += 2 + (((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff))
    }
    false
  }

  test("our progressive encoding decodes pixel-identical to the baseline encoding (gray and RGB)") {
    for (ch <- Seq(1, 3); (w, h) <- Seq((8, 8), (17, 9), (32, 24), (40, 33))) {
      val base = Jpeg.encode(w, h, ch, px(ch * 3L + w), Jpeg.qStandard)
      val prog = Jpeg.encodeProgressive(w, h, ch, px(ch * 3L + w), Jpeg.qStandard)
      assert(isSof2(prog) && !isSof2(base))
      val Some((_, _, _, basePix)) = Jpeg.decode(base)
      val Some((dw, dh, dch, progPix)) = Jpeg.decode(prog)
      assert((dw, dh, dch) === ((w, h, ch)))
      assert(progPix.toSeq === basePix.toSeq, s"ch=$ch $w x $h")
    }
  }

  test("unit-quantizer constant-block images roundtrip EXACTLY through the progressive path") {
    for (ch <- Seq(1, 3); (wb, hb) <- Seq((1, 1), (3, 2), (2, 4))) {
      val (w, h) = (wb * 8, hb * 8)
      val bytes = Jpeg.encodeProgressive(w, h, ch,
        (x, y, _) => blockVal(ch * 10L + wb)(x / 8, y / 8), Jpeg.qUnit)
      val Some((dw, dh, dch, pix)) = Multimodal.decodePixels(bytes)
      assert((dw, dh, dch) === ((w, h, ch)))
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert(pix((y * w + x) * ch + c) === blockVal(ch * 10L + wb)(x / 8, y / 8),
          s"($x,$y,$c) ch=$ch")
    }
  }

  test("ImageIO (independent JDK decoder) reads OUR progressive bytes to the exact constant-block formula") {
    for (ch <- Seq(1, 3)) {
      val (w, h) = (24, 16)
      val bytes = Jpeg.encodeProgressive(w, h, ch,
        (x, y, _) => blockVal(7L + ch)(x / 8, y / 8), Jpeg.qUnit)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected our progressive JPEG (ch=$ch)")
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val want = blockVal(7L + ch)(x / 8, y / 8)
        if (ch == 1) assert(img.getRaster.getSample(x, y, 0) === want, s"($x,$y) gray")
        else {
          val rgb = img.getRGB(x, y)
          assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) === ((want, want, want)),
            s"($x,$y) rgb")
        }
      }
    }
  }

  test("our decoder reads ImageIO's progressive GRAYSCALE bytes (AC successive approximation) identically") {
    for ((w, h) <- Seq((21, 14), (8, 8), (33, 40))) {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, px(11L + w)(x, y, 0))
      val bytes = writeProgressive(img)
      assert(isSof2(bytes), "JDK writer did not produce SOF2")
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val Some((dw, dh, dch, mine)) = Multimodal.decodePixels(bytes)
      assert((dw, dh, dch) === ((w, h, 1)))
      for (y <- 0 until h; x <- 0 until w)
        assert(mine(y * w + x) === back.getRaster.getSample(x, y, 0), s"($x,$y) $w x $h")
    }
  }

  test("our decoder reads ImageIO's progressive subsampled COLOR bytes identically (4:2:0 + AC refine)") {
    for ((w, h) <- Seq((20, 12), (17, 9), (32, 24))) {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (px(5L + w)(x, y, 0) << 16) | (px(5L + w)(x, y, 1) << 8) | px(5L + w)(x, y, 2))
      val bytes = writeProgressive(img)
      assert(isSof2(bytes), "JDK writer did not produce SOF2")
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val Some((dw, dh, dch, mine)) = Multimodal.decodePixels(bytes)
      assert((dw, dh, dch) === ((w, h, 3)))
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val rgb = back.getRGB(x, y)
        val ref = c match { case 0 => (rgb >> 16) & 0xff; case 1 => (rgb >> 8) & 0xff; case _ => rgb & 0xff }
        assert(mine((y * w + x) * 3 + c) === ref, s"($x,$y,$c) $w x $h")
      }
    }
  }

  test("EOB runs spanning many blocks decode correctly (sparse high-frequency content)") {
    // one isolated bright pixel in a large flat image: after quantization
    // most blocks carry zero AC in both bands, so the encoder emits EOBn
    // runs spanning dozens of blocks — the decoder's eobrun accounting is
    // load-bearing, and a correct result matches the baseline encoding
    val (w, h) = (64, 48)
    def f(x: Int, y: Int, c: Int): Int = if (x == 20 && y == 11) 255 else 64
    val base = Jpeg.encode(w, h, 1, f, Jpeg.qStandard)
    val prog = Jpeg.encodeProgressive(w, h, 1, f, Jpeg.qStandard)
    assert(prog.length < base.length) // EOBn runs must actually compress
    val Some((_, _, _, basePix)) = Jpeg.decode(base)
    val Some((_, _, _, progPix)) = Jpeg.decode(prog)
    assert(progPix.toSeq === basePix.toSeq)
  }

  test("progressive restart markers (DRI + RSTn in every scan) decode identically") {
    // restart intervals force byte-alignment, DC-predictor resets and
    // EOB-run flushes mid-scan in all four scan types — the decoder's
    // progressive restart path is load-bearing here, and both our decoder
    // and ImageIO must agree with the restart-free encoding
    for (ch <- Seq(1, 3); ri <- Seq(1, 3, 7)) {
      val (w, h) = (40, 33) // 5x5 blocks: several restarts per scan
      val plain = Jpeg.encodeProgressive(w, h, ch, px(17L + ri), Jpeg.qStandard)
      val rst = Jpeg.encodeProgressive(w, h, ch, px(17L + ri), Jpeg.qStandard, restartInterval = ri)
      assert(rst.length > plain.length) // markers actually present
      val Some((_, _, _, a)) = Jpeg.decode(plain)
      val Some((dw, dh, dch, b)) = Jpeg.decode(rst)
      assert((dw, dh, dch) === ((w, h, ch)))
      assert(b.toSeq === a.toSeq, s"ch=$ch ri=$ri")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rst))
      assert(img != null && img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        // gray reads the RAW raster sample — getRGB would gamma-convert
        if (ch == 1) assert(b(y * w + x) === img.getRaster.getSample(x, y, 0), s"($x,$y) ri=$ri")
        else {
          val rgb = img.getRGB(x, y)
          assert((b((y * w + x) * 3), b((y * w + x) * 3 + 1), b((y * w + x) * 3 + 2)) ===
            (((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)), s"($x,$y) ri=$ri")
        }
      }
    }
  }

  test("audioEmbed pools the loudness envelope into 8 integer windows") {
    // 16 frames, 2 channels: window of frame f is f/2; channel 0 only
    val nf = 16
    val samples = Array.tabulate(nf * 2)(i => if (i % 2 == 0) (i / 2) - 8 else 999)
    val e = Multimodal.audioEmbed(2, samples)
    for (k <- 0 until 8) {
      val want = (0 until nf).filter(_ * 8 / nf == k).map(f => math.abs(f - 8).toLong).sum
      assert(e(k) === want.toFloat, s"window $k")
    }
  }

  test("progressive malformed payloads degrade to None, never throw") {
    val good = Jpeg.encodeProgressive(16, 16, 3, px(9L), Jpeg.qStandard)
    for (n <- 0 until good.length) Jpeg.decode(java.util.Arrays.copyOf(good, n))
    var s = 0x9e3779b9L
    for (_ <- 0 until 500) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val pos = math.floorMod(s >> 16, good.length.toLong).toInt
      val bad = good.clone()
      bad(pos) = (s >> 40).toByte
      Jpeg.decode(bad) // Some(garbage) or None — never an exception
    }
  }
}
