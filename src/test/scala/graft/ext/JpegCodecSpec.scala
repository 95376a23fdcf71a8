package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM baseline JPEG codec, cross-checked against the JDK's own
  * ImageIO JPEG implementation (libjpeg-based — an independent encoder AND
  * decoder) in both directions, plus the mathematically-lossless
  * constant-block/unit-quantizer construction the exact DuckDB oracle
  * (x_multimodal_jpeg) rides on.
  */
class JpegCodecSpec extends AnyFunSuite {

  /** block-constant formula: every 8×8 block holds one value */
  private def blockVal(seed: Long)(bx: Int, by: Int): Int =
    ((seed * 29 + bx * 31 + by * 47) % 256).toInt

  /** general-content formula (varies inside blocks) */
  private def px(seed: Long)(x: Int, y: Int, c: Int): Int =
    ((seed * 31 + x * 7 + y * 13 + c * 101) % 256).toInt

  test("unit-quantizer constant-block images roundtrip EXACTLY (gray and RGB)") {
    for (ch <- Seq(1, 3); (wb, hb) <- Seq((1, 1), (3, 2), (2, 4))) {
      val (w, h) = (wb * 8, hb * 8)
      // gray-in-RGB (R=G=B) keeps the color transform exact: Y=v, Cb=Cr=128
      val bytes = Jpeg.encode(w, h, ch,
        (x, y, _) => blockVal(ch * 10L + wb)(x / 8, y / 8), Jpeg.qUnit)
      val Some((dw, dh, dch, pix)) = Multimodal.decodePixels(bytes)
      assert((dw, dh, dch) === ((w, h, ch)), s"dims ch=$ch $w x $h")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert(pix((y * w + x) * ch + c) === blockVal(ch * 10L + wb)(x / 8, y / 8),
          s"($x,$y,$c) ch=$ch")
    }
  }

  test("ImageIO (independent JDK decoder) reads the constant-block file to the exact formula") {
    // the losslessness claim is mathematical, not implementation-private:
    // an INDEPENDENT decoder reconstructs the same exact pixels
    for (ch <- Seq(1, 3)) {
      val (w, h) = (24, 16)
      val bytes = Jpeg.encode(w, h, ch, (x, y, _) => blockVal(7L + ch)(x / 8, y / 8), Jpeg.qUnit)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected our JPEG (ch=$ch)")
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

  test("ImageIO decodes our GENERAL-content bytes identically to our decoder (islow parity)") {
    // non-constant blocks + a real quantizer: every IDCT path, the huffman
    // coder, and (for color) the fixed-point YCbCr->RGB all participate;
    // bit-identical output means our integer arithmetic IS the reference
    // arithmetic, not merely close to it
    for (ch <- Seq(1, 3); (w, h) <- Seq((8, 8), (17, 9), (32, 24))) {
      val bytes = Jpeg.encode(w, h, ch, px(ch * 3L + w), Jpeg.qStandard)
      val Some((dw, dh, dch, mine)) = Multimodal.decodePixels(bytes)
      assert((dw, dh, dch) === ((w, h, ch)))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w)
        if (ch == 1)
          assert(mine(y * w + x) === img.getRaster.getSample(x, y, 0), s"($x,$y) gray $w x $h")
        else {
          val rgb = img.getRGB(x, y)
          val o = (y * w + x) * 3
          assert((mine(o), mine(o + 1), mine(o + 2)) ===
            (((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)), s"($x,$y) color $w x $h")
        }
    }
  }

  test("our decoder reads ImageIO's (independent JDK encoder) grayscale bytes identically") {
    val (w, h) = (21, 14)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, px(11L)(x, y, 0))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpeg", out))
    val bytes = out.toByteArray
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val Some((dw, dh, dch, mine)) = Multimodal.decodePixels(bytes)
    assert((dw, dh, dch) === ((w, h, 1)))
    for (y <- 0 until h; x <- 0 until w)
      assert(mine(y * w + x) === back.getRaster.getSample(x, y, 0), s"($x,$y)")
  }

  test("our decoder reads ImageIO's subsampled (4:2:0) color bytes identically (fancy upsampling parity)") {
    // the JDK writer subsamples chroma 2x2 by default; its reader applies
    // the triangular ("fancy") upsampling filter — our decoder implements
    // the same integer filter, so even subsampled color is bit-identical
    for ((w, h) <- Seq((20, 12), (17, 9), (8, 8))) {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (px(3L + w)(x, y, 0) << 16) | (px(3L + w)(x, y, 1) << 8) | px(3L + w)(x, y, 2))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpeg", out))
      val bytes = out.toByteArray
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

  test("header decode reports jpeg dimensions and component count") {
    val bytes = Jpeg.encode(40, 24, 3, px(1L), Jpeg.qStandard)
    assert(Multimodal.decodeHeader(bytes) === Some(("jpeg", 40, 24, 3)))
    val gray = Jpeg.encode(16, 8, 1, px(2L), Jpeg.qStandard)
    assert(Multimodal.decodeHeader(gray) === Some(("jpeg", 16, 8, 1)))
  }

  test("malformed payloads degrade to None, never throw") {
    val good = Jpeg.encode(16, 16, 3, px(9L), Jpeg.qStandard)
    assert(Jpeg.decode(Array.emptyByteArray).isEmpty)
    assert(Jpeg.decode("definitely not a jpeg".getBytes).isEmpty)
    assert(Jpeg.decode(good.take(6)).isEmpty) // truncated before any table
    assert(Jpeg.decode(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty) // empty
    // truncated mid-entropy-data: decoder pads with zero bits; must not throw
    Jpeg.decode(good.dropRight(10))
    val corrupt = good.clone()
    corrupt(good.length / 2) = (corrupt(good.length / 2) ^ 0x55).toByte
    Jpeg.decode(corrupt) // garbage coefficients or None — never an exception
  }

  test("fuzz: every truncation point and a seeded corruption sweep degrade, never throw") {
    val good = Jpeg.encode(16, 16, 3, px(13L), Jpeg.qStandard)
    // every prefix: lying length fields / half-read segments must bail
    for (n <- 0 until good.length) Jpeg.decode(java.util.Arrays.copyOf(good, n))
    // deterministic LCG byte corruptions, one per position class
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
