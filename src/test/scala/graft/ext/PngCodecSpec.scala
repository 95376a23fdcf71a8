package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM PNG pixel codec, cross-checked against the JDK's own
  * ImageIO PNG implementation (an independent encoder AND decoder that
  * ships with Java) — so a bug in our filter arithmetic can't hide behind
  * a matching bug in our own round-trip.
  */
class PngCodecSpec extends AnyFunSuite {

  private def px(seed: Long)(x: Int, y: Int, c: Int): Int =
    ((seed * 31 + x * 7 + y * 13 + c * 101) % 256).toInt

  test("encode/decode round-trips every filter type, channel count, and odd sizes") {
    for {
      ch <- 1 to 4
      (w, h) <- Seq((1, 1), (1, 7), (7, 1), (5, 5), (16, 3), (13, 11))
      filt <- 0 to 5 // 5 = rotate through all filters row by row
    } {
      val f: Int => Int = if (filt == 5) y => y % 5 else _ => filt
      val bytes = Multimodal.encodePng(w, h, ch, px(w * 1000L + h * 10 + ch), f)
      val Some((dw, dh, dch, pix)) = Multimodal.decodePixels(bytes)
      assert((dw, dh, dch) === ((w, h, ch)), s"dims for ch=$ch w=$w h=$h filt=$filt")
      val want = for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        yield px(w * 1000L + h * 10 + ch)(x, y, c)
      assert(pix.toSeq === want, s"pixels for ch=$ch w=$w h=$h filt=$filt")
    }
  }

  test("ImageIO (independent JDK decoder) reads our encoder's bytes identically") {
    for (ch <- Seq(1, 3, 4); filt <- 0 to 4) {
      val (w, h) = (9, 6)
      val bytes = Multimodal.encodePng(w, h, ch, px(ch * 7L), _ => filt)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected our PNG (ch=$ch filt=$filt)")
      assert(img.getWidth === w && img.getHeight === h)
      val raster = img.getRaster
      assert(raster.getNumBands === ch, s"band count ch=$ch")
      // raw raster samples: no color-space conversion (getRGB would put
      // gray PNGs through a linear-gray→sRGB gamma ramp)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert(raster.getSample(x, y, c) === px(ch * 7L)(x, y, c),
          s"($x,$y,$c) ch=$ch filt=$filt")
    }
  }

  test("our decoder reads ImageIO's (independent JDK encoder) bytes identically") {
    val (w, h) = (11, 8)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (px(5L)(x, y, 0) << 16) | (px(5L)(x, y, 1) << 8) | px(5L)(x, y, 2))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val Some((dw, dh, dch, pix)) = Multimodal.decodePixels(out.toByteArray)
    assert((dw, dh, dch) === ((w, h, 3)))
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert(pix(y * w * 3 + x * 3 + c) === px(5L)(x, y, c), s"($x,$y,$c)")
  }

  test("malformed payloads degrade to None, never throw") {
    val good = Multimodal.encodePng(6, 6, 3, px(1L))
    assert(Multimodal.decodePixels(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodePixels("not a png at all".getBytes).isEmpty)
    assert(Multimodal.decodePixels(good.take(20)).isEmpty) // truncated mid-IHDR
    assert(Multimodal.decodePixels(good.dropRight(15)).isEmpty) // IEND gone
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x55).toByte // IDAT garbage
    // either the zlib stream breaks (None) or a filter byte goes out of
    // range — never an exception
    Multimodal.decodePixels(corrupt)
    val badDepth = good.clone()
    badDepth(24) = 16 // bit depth 16: unsupported, must refuse not misparse
    assert(Multimodal.decodePixels(badDepth).isEmpty)
  }

  test("pixelStats sums match the formula exactly and flow unknowns as zero rows") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.encodePng(4, 3, 2, px(1L), y => y % 5), "png"),
      Multimodal.MediaRow(2L, "opaque".getBytes, "bin"))
    val out = Multimodal.pixelStats(rows.toDS()).collect().map(r => r.id -> r).toMap
    val s = out(1L)
    assert((s.width, s.height, s.channels, s.n_pixels) === ((4, 3, 2, 12L)))
    val want0 = (for (y <- 0 until 3; x <- 0 until 4) yield px(1L)(x, y, 0)).sum.toLong
    val want1 = (for (y <- 0 until 3; x <- 0 until 4) yield px(1L)(x, y, 1)).sum.toLong
    assert(s.c0_sum === want0 && s.c1_sum === want1 && s.c2_sum == null && s.c3_sum == null)
    val u = out(2L)
    assert(u.channels === 0 && u.c0_sum == null)
  }
}
