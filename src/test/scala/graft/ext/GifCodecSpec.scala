package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM GIF LZW codec, cross-checked against the JDK's ImageIO
  * GIF implementation in both directions. Image sizes are chosen to push
  * the LZW code width across the 9→10→11→12-bit boundaries and into the
  * 4096-entry dictionary reset, where variable-width misalignments hide.
  */
class GifCodecSpec extends AnyFunSuite {

  private def px(seed: Long)(x: Int, y: Int): Int =
    ((seed * 37 + x * 11 + y * 17) % 256).toInt

  test("encode/decode round-trips across code-width boundaries and dict reset") {
    for ((w, h) <- Seq((1, 1), (7, 3), (16, 16), (40, 30), (64, 64), (120, 90))) {
      val bytes = Multimodal.encodeGif(w, h, px(w * 100L + h))
      val Some((dw, dh, dch, pix)) = Multimodal.decodePixels(bytes)
      assert((dw, dh, dch) === ((w, h, 3)), s"dims $w x $h")
      var bad = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        if (pix(y * w * 3 + x * 3 + c) != px(w * 100L + h)(x, y)) bad += 1
      assert(bad === 0, s"$bad wrong pixels at $w x $h")
    }
  }

  test("highly repetitive image (deep LZW chains) round-trips") {
    // few distinct values -> long dictionary chains and the KwKwK case
    val f = (x: Int, y: Int) => (x / 16 + y / 16) % 4 * 60
    val bytes = Multimodal.encodeGif(96, 96, f)
    val Some((_, _, _, pix)) = Multimodal.decodePixels(bytes)
    for (y <- 0 until 96; x <- 0 until 96)
      assert(pix(y * 96 * 3 + x * 3) === f(x, y), s"($x,$y)")
  }

  test("ImageIO (independent JDK decoder) reads our encoder's bytes identically") {
    for ((w, h) <- Seq((9, 6), (64, 64), (90, 80))) {
      val bytes = Multimodal.encodeGif(w, h, px(7L))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected our GIF ($w x $h)")
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val v = px(7L)(x, y)
        assert((((argb >> 16) & 0xff), ((argb >> 8) & 0xff), (argb & 0xff)) === ((v, v, v)),
          s"($x,$y) at $w x $h")
      }
    }
  }

  test("our decoder reads ImageIO's (independent JDK encoder) bytes identically") {
    for ((w, h) <- Seq((11, 8), (64, 64), (90, 80))) {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, px(3L)(x, y))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", out))
      val Some((dw, dh, dch, pix)) = Multimodal.decodePixels(out.toByteArray)
      assert((dw, dh, dch) === ((w, h, 3)))
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(3L)(x, y)
        assert((pix(y * w * 3 + x * 3), pix(y * w * 3 + x * 3 + 1), pix(y * w * 3 + x * 3 + 2))
          === ((v, v, v)), s"($x,$y) at $w x $h")
      }
    }
  }

  test("malformed GIF payloads degrade to None, never throw") {
    val good = Multimodal.encodeGif(12, 9, px(1L))
    assert(Multimodal.decodePixels("GIF89a junk".getBytes).isEmpty)
    assert(Multimodal.decodePixels(good.take(20)).isEmpty) // truncated in GCT
    assert(Multimodal.decodePixels(good.dropRight(6)).isEmpty) // truncated LZW
    val noImage = good.take(13 + 768) ++ Array[Byte](0x3b) // header+GCT, trailer only
    assert(Multimodal.decodePixels(noImage).isEmpty)
  }
}
