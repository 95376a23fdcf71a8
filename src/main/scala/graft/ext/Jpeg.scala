package graft.ext

/** Pure-JVM baseline JFIF (JPEG) codec — the third REAL pixel codec next
  * to the PNG (Inflater + scanline filters) and GIF (LZW) decoders in
  * [[Multimodal]], covering the dominant real-world image format in any
  * large multimodal crawl. Everything here derives from the public JPEG
  * standard (ITU-T T.81): baseline DCT, Huffman entropy coding, and the
  * integer "islow" IDCT + YCbCr→RGB fixed-point arithmetic of the public
  * JPEG reference implementation — implemented to be BIT-IDENTICAL to it,
  * so decode output matches the JDK's independent ImageIO reader exactly
  * (pinned in JpegCodecSpec, both directions).
  *
  * Decoder: baseline sequential SOF0/SOF1 AND progressive SOF2 —
  * arbitrary DQT/DHT (tables are read from the stream, never assumed),
  * per-component sampling factors 1..2 (4:4:4, 4:2:2, 4:2:0), restart
  * markers, grayscale and YCbCr color. Progressive streams accumulate
  * zigzag coefficients across any legal scan script (spectral selection
  * + successive approximation: DC first/refine, AC first/refine with EOB
  * runs, T.81 G.2) and reconstruct at EOI — pinned bit-identical to the
  * JDK's libjpeg-based reader on its own 10-scan progressive output
  * (ProgressiveJpegSpec). 12-bit, arithmetic coding and hierarchical
  * modes return None and fall back to the header-only path.
  *
  * Encoder: baseline, grayscale or 4:4:4 YCbCr, caller-supplied
  * quantization table. Entropy tables are uniform-length canonical Huffman
  * codes (12 DC categories at 4 bits, all 162 AC symbols at 8 bits) —
  * valid, self-describing via DHT, and immune to table-transcription
  * drift; production would ship the Annex K defaults or per-image
  * optimized tables, which changes SIZE, not correctness.
  *
  * EXACT-ORACLE DISCIPLINE (the x_multimodal_pixels pattern, adapted to a
  * lossy codec): with a UNIT quantization table and an image whose 8×8
  * blocks are each CONSTANT, the roundtrip is mathematically lossless —
  * a constant block's FDCT is DC-only (DC = 8·(v−128), every AC exactly
  * 0), quantization by 1 preserves it, and any correctly-rounded IDCT
  * reconstructs the flat block exactly. The decoded channel sums are
  * therefore formula-derivable in DuckDB with no decoder in the loop
  * (x_multimodal_jpeg), for THIS decoder and for ImageIO alike.
  */
object Jpeg {

  // -- shared tables ---------------------------------------------------

  /** Zig-zag index → natural (row-major) position, T.81 Figure 5. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** All-ones quantization table: lossless for constant 8×8 blocks. */
  val qUnit: Array[Int] = Array.fill(64)(1)

  /** The T.81 Annex K luminance quantization table (natural order) — the
    * general-content default for the encoder.
    */
  val qStandard: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  // -- decoder ----------------------------------------------------------

  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    // canonical code reconstruction (T.81 C.2): mincode/maxcode/valptr
    // per length, decoded bit-serially — simple and exactly the spec.
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l); k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(i: Int): Int = vals(i) & 0xff
  }

  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var cnt = 0
    var sawMarker = false

    /** next entropy-coded bit; 0xFF00 unstuffs, a real marker ends data */
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= p.length) { sawMarker = true; return 0 }
        var b = p(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val n = if (pos < p.length) p(pos) & 0xff else 0xd9
          if (n == 0x00) pos += 1 // stuffed
          else { sawMarker = true; b = 0 } // marker: pad with zeros
        }
        acc = b; cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }

    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def decodeHuff(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (code <= h.maxCode(l)) return h.value(h.valPtr(l) + code - h.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      -1 // invalid stream
    }

    /** byte-align and consume an RSTn marker if present */
    def restart(): Boolean = {
      cnt = 0; sawMarker = false
      while (pos + 1 < p.length && (p(pos) & 0xff) == 0xff && (p(pos + 1) & 0xff) == 0xff)
        pos += 1 // fill bytes
      if (pos + 1 < p.length && (p(pos) & 0xff) == 0xff
          && ((p(pos + 1) & 0xff) & 0xf8) == 0xd0) { pos += 2; true }
      else false
    }
  }

  /** T.81 F.2.2.1 EXTEND: map `v` in `n` bits to its signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0 || v >= (1 << (n - 1))) v else v - (1 << n) + 1

  // islow IDCT fixed-point constants (CONST_BITS = 13), from the public
  // reference implementation of the Loeffler–Ligtenberg–Moshovitz IDCT —
  // the arithmetic libjpeg's default path uses, replicated bit-exactly.
  private val ConstBits = 13
  private val Pass1Bits = 2
  private val F_0_298631336 = 2446
  private val F_0_390180644 = 3196
  private val F_0_541196100 = 4433
  private val F_0_765366865 = 6270
  private val F_0_899976223 = 7373
  private val F_1_175875602 = 9633
  private val F_1_501321110 = 12299
  private val F_1_847759065 = 15137
  private val F_1_961570560 = 16069
  private val F_2_053119869 = 16819
  private val F_2_562915447 = 20995
  private val F_3_072711026 = 25172

  @inline private def descale(x: Long, n: Int): Int = ((x + (1L << (n - 1))) >> n).toInt

  /** 2-D integer IDCT on one dequantized 8×8 block (natural order), output
    * level-shifted to 0..255 samples. Bit-identical to the reference
    * "islow" path: 32-bit×13-bit products, DESCALE rounding, the all-zero-
    * AC column shortcut (which equals the general path exactly).
    */
  private def idctBlock(in: Array[Int], out: Array[Int]): Unit = {
    val ws = new Array[Int](64)
    var c = 0
    while (c < 8) { // pass 1: columns
      if (in(8 + c) == 0 && in(16 + c) == 0 && in(24 + c) == 0 && in(32 + c) == 0 &&
          in(40 + c) == 0 && in(48 + c) == 0 && in(56 + c) == 0) {
        val dc = in(c) << Pass1Bits
        var i = 0
        while (i < 8) { ws(8 * i + c) = dc; i += 1 }
      } else {
        var z2 = in(16 + c).toLong; var z3 = in(48 + c).toLong
        var z1 = (z2 + z3) * F_0_541196100
        val t2 = z1 + z3 * (-F_1_847759065)
        val t3 = z1 + z2 * F_0_765366865
        z2 = in(c).toLong; z3 = in(32 + c).toLong
        val t0 = (z2 + z3) << ConstBits
        val t1 = (z2 - z3) << ConstBits
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var s0 = in(56 + c).toLong; var s1 = in(40 + c).toLong
        var s2 = in(24 + c).toLong; var s3 = in(8 + c).toLong
        z1 = s0 + s3; z2 = s1 + s2
        z3 = s0 + s2; var z4 = s1 + s3
        val z5 = (z3 + z4) * F_1_175875602
        s0 *= F_0_298631336; s1 *= F_2_053119869; s2 *= F_3_072711026; s3 *= F_1_501321110
        z1 *= -F_0_899976223; z2 *= -F_2_562915447; z3 *= -F_1_961570560; z4 *= -F_0_390180644
        z3 += z5; z4 += z5
        s0 += z1 + z3; s1 += z2 + z4; s2 += z2 + z3; s3 += z1 + z4
        ws(c) = descale(t10 + s3, ConstBits - Pass1Bits)
        ws(56 + c) = descale(t10 - s3, ConstBits - Pass1Bits)
        ws(8 + c) = descale(t11 + s2, ConstBits - Pass1Bits)
        ws(48 + c) = descale(t11 - s2, ConstBits - Pass1Bits)
        ws(16 + c) = descale(t12 + s1, ConstBits - Pass1Bits)
        ws(40 + c) = descale(t12 - s1, ConstBits - Pass1Bits)
        ws(24 + c) = descale(t13 + s0, ConstBits - Pass1Bits)
        ws(32 + c) = descale(t13 - s0, ConstBits - Pass1Bits)
      }
      c += 1
    }
    var r = 0
    while (r < 8) { // pass 2: rows
      val o = 8 * r
      var z2 = ws(o + 2).toLong; var z3 = ws(o + 6).toLong
      var z1 = (z2 + z3) * F_0_541196100
      val t2 = z1 + z3 * (-F_1_847759065)
      val t3 = z1 + z2 * F_0_765366865
      val t0 = (ws(o) + ws(o + 4)).toLong << ConstBits
      val t1 = (ws(o) - ws(o + 4)).toLong << ConstBits
      val t10 = t0 + t3; val t13 = t0 - t3
      val t11 = t1 + t2; val t12 = t1 - t2
      var s0 = ws(o + 7).toLong; var s1 = ws(o + 5).toLong
      var s2 = ws(o + 3).toLong; var s3 = ws(o + 1).toLong
      z1 = s0 + s3; z2 = s1 + s2
      z3 = s0 + s2; var z4 = s1 + s3
      val z5 = (z3 + z4) * F_1_175875602
      s0 *= F_0_298631336; s1 *= F_2_053119869; s2 *= F_3_072711026; s3 *= F_1_501321110
      z1 *= -F_0_899976223; z2 *= -F_2_562915447; z3 *= -F_1_961570560; z4 *= -F_0_390180644
      z3 += z5; z4 += z5
      s0 += z1 + z3; s1 += z2 + z4; s2 += z2 + z3; s3 += z1 + z4
      val sh = ConstBits + Pass1Bits + 3
      @inline def samp(v: Long): Int = {
        val x = descale(v, sh) + 128
        if (x < 0) 0 else if (x > 255) 255 else x
      }
      out(o) = samp(t10 + s3); out(o + 7) = samp(t10 - s3)
      out(o + 1) = samp(t11 + s2); out(o + 6) = samp(t11 - s2)
      out(o + 2) = samp(t12 + s1); out(o + 5) = samp(t12 - s1)
      out(o + 3) = samp(t13 + s0); out(o + 4) = samp(t13 - s0)
      r += 1
    }
  }

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab = 0; var acTab = 0; var dcPred = 0
    var plane: Array[Int] = _ // padded (wb*8) x (hb*8) samples
    var wPix = 0 // padded plane width in samples
    // progressive state: per-block coefficients in ZIGZAG order (the
    // order every scan codes them in), padded MCU block grid (bw × bh)
    // and the non-interleaved scan grid (bwS × bhS — T.81 A.2.2: a
    // single-component scan covers only ceil(ceil(dim·f/max)/8) blocks)
    var coefZ: Array[Int] = _
    var bw = 0; var bh = 0; var bwS = 0; var bhS = 0
  }

  /** Decode a baseline JFIF payload → (width, height, channels, pixels) in
    * the [[Multimodal.decodePixels]] row-major x-then-channel layout;
    * None for anything outside baseline support (progressive, 12-bit,
    * arithmetic coding, >2 sampling factors, truncated streams).
    */
  def decode(p: Array[Byte]): Option[(Int, Int, Int, Array[Int])] =
    // belt-and-braces on top of the per-segment bounds checks: adversarial
    // length fields must degrade to None, never escape as an exception
    // (the decodePixels family contract)
    try decodeImpl(p)
    catch {
      case _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None
    }

  private def decodeImpl(p: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    val qt = Array.ofDim[Int](4, 64)
    val dcHuff = new Array[Huff](4)
    val acHuff = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var maxH = 1; var maxV = 1; var mcusX = 0; var mcusY = 0
    var restartInterval = 0
    var progressive = false
    var anyScan = false
    var i = 2
    while (i + 2 <= p.length) {
      if ((p(i) & 0xff) != 0xff) return None
      val m = p(i + 1) & 0xff
      if (m == 0xd9) // EOI: for progressive, all scans are in — reconstruct
        return if (progressive && anyScan) finishProgressive(w, h, comps, qt, maxH, maxV)
          else None
      if (m >= 0xd0 && m <= 0xd7) { i += 2 } // standalone RSTn between segments
      else {
        if (i + 4 > p.length) return None
        val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
        val seg = i + 4
        // the whole declared segment must be present before any payload read
        if (len < 2 || seg + len - 2 > p.length) return None
        var advanced = false
        m match {
          case 0xdb => // DQT: one or more tables; 8-bit precision only
            var j = seg
            while (j < seg + len - 2) {
              val pq = (p(j) & 0xff) >> 4; val tq = p(j) & 0x0f
              if (pq != 0 || tq > 3 || j + 65 > p.length) return None
              var k = 0
              while (k < 64) { qt(tq)(ZigZag(k)) = p(j + 1 + k) & 0xff; k += 1 }
              j += 65
            }
          case 0xc4 => // DHT
            var j = seg
            while (j < seg + len - 2) {
              val tc = (p(j) & 0xff) >> 4; val th = p(j) & 0x0f
              if (th > 3 || j + 17 > p.length) return None
              val bits = new Array[Int](17)
              var total = 0
              var k = 1
              while (k <= 16) { bits(k) = p(j + k) & 0xff; total += bits(k); k += 1 }
              if (j + 17 + total > p.length) return None
              val vals = java.util.Arrays.copyOfRange(p, j + 17, j + 17 + total)
              val t = new Huff(bits, vals)
              if (tc == 0) dcHuff(th) = t else acHuff(th) = t
              j += 17 + total
            }
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 sequential, SOF2 progressive
            if (len < 8 || (p(seg) & 0xff) != 8) return None // 8-bit samples only
            h = ((p(seg + 1) & 0xff) << 8) | (p(seg + 2) & 0xff)
            w = ((p(seg + 3) & 0xff) << 8) | (p(seg + 4) & 0xff)
            val nc = p(seg + 5) & 0xff
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3) || len < 8 + 3 * nc) return None
            if (w.toLong * h > (1L << 26)) return None // decode-bomb cap
            comps = Array.tabulate(nc) { k =>
              val o = seg + 6 + 3 * k
              val c = Comp(p(o) & 0xff, (p(o + 1) & 0xff) >> 4, p(o + 1) & 0x0f, p(o + 2) & 0xff)
              if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2) return None
              c
            }
            maxH = comps.map(_.h).max; maxV = comps.map(_.v).max
            mcusX = (w + 8 * maxH - 1) / (8 * maxH)
            mcusY = (h + 8 * maxV - 1) / (8 * maxV)
            progressive = m == 0xc2
            if (progressive) comps.foreach { c =>
              c.bw = mcusX * c.h; c.bh = mcusY * c.v
              c.coefZ = new Array[Int](c.bw * c.bh * 64)
              val cw = (w * c.h + maxH - 1) / maxH
              val chh = (h * c.v + maxV - 1) / maxV
              c.bwS = (cw + 7) / 8; c.bhS = (chh + 7) / 8
            }
          case 0xdd => // DRI
            restartInterval = ((p(seg) & 0xff) << 8) | (p(seg + 1) & 0xff)
          case 0xda => // SOS
            if (comps == null || len < 3) return None
            val ns = p(seg) & 0xff
            if (len < 6 + 2 * ns || ns < 1) return None
            if (!progressive) { // baseline: single interleaved scan, done
              if (ns != comps.length) return None
              var k = 0
              while (k < ns) {
                val cid = p(seg + 1 + 2 * k) & 0xff
                val tabs = p(seg + 2 + 2 * k) & 0xff
                val c = comps.find(_.id == cid).getOrElse(return None)
                c.dcTab = tabs >> 4; c.acTab = tabs & 0x0f
                k += 1
              }
              return decodeScan(p, seg + len - 2, w, h, comps, qt, dcHuff, acHuff, restartInterval)
            }
            // progressive: one of many scans; decode it and continue the
            // marker walk at the next marker after its entropy data
            if (ns > comps.length) return None
            val scanComps = new Array[Comp](ns)
            var k = 0
            while (k < ns) {
              val cid = p(seg + 1 + 2 * k) & 0xff
              val tabs = p(seg + 2 + 2 * k) & 0xff
              val c = comps.find(_.id == cid).getOrElse(return None)
              c.dcTab = tabs >> 4; c.acTab = tabs & 0x0f
              scanComps(k) = c
              k += 1
            }
            val ss = p(seg + 1 + 2 * ns) & 0xff
            val se = p(seg + 2 + 2 * ns) & 0xff
            val ahal = p(seg + 3 + 2 * ns) & 0xff
            val next = decodeProgScan(p, seg + len - 2, scanComps, mcusX, mcusY,
              ss, se, ahal >> 4, ahal & 0x0f, restartInterval, dcHuff, acHuff)
            if (next < 0) return None
            anyScan = true
            i = next; advanced = true
          case _ => () // APPn/COM/DNL/etc: skip
        }
        if (!advanced) i = seg + len - 2
      }
    }
    None
  }

  /** First marker at/after `from`: 0xFF followed by a real marker byte
    * (not a stuffed 0x00, a 0xFF fill byte, or an RSTn — those live
    * inside entropy data).
    */
  private def nextMarker(p: Array[Byte], from: Int): Int = {
    var j = math.max(from, 0)
    while (j + 1 < p.length) {
      if ((p(j) & 0xff) == 0xff) {
        val n = p(j + 1) & 0xff
        if (n != 0x00 && n != 0xff && !(n >= 0xd0 && n <= 0xd7)) return j
      }
      j += 1
    }
    -1
  }

  private def decodeScan(p: Array[Byte], dataStart: Int, w: Int, h: Int,
      comps: Array[Comp], qt: Array[Array[Int]],
      dcHuff: Array[Huff], acHuff: Array[Huff], restartInterval: Int)
      : Option[(Int, Int, Int, Array[Int])] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    comps.foreach { c =>
      c.wPix = mcusX * c.h * 8
      c.plane = new Array[Int](c.wPix * mcusY * c.v * 8)
      c.dcPred = 0
    }
    val br = new BitReader(p, dataStart)
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        comps.foreach(_.dcPred = 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val dh = dcHuff(c.dcTab); val ah = acHuff(c.acTab)
        if (dh == null || ah == null) return None
        val q = qt(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            val t = br.decodeHuff(dh)
            if (t < 0 || t > 15) return None
            c.dcPred += extend(br.bits(t), t)
            coef(0) = c.dcPred * q(0)
            var k = 1
            while (k < 64) {
              val rs = br.decodeHuff(ah)
              if (rs < 0) return None
              val r = rs >> 4; val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += r
                if (k > 63) return None
                coef(ZigZag(k)) = extend(br.bits(s), s) * q(ZigZag(k))
                k += 1
              }
            }
            idctBlock(coef, blk)
            // place the block into the component plane
            val px0 = (mx * c.h + bx) * 8; val py0 = (my * c.v + by) * 8
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                c.plane((py0 + y) * c.wPix + px0 + x) = blk(8 * y + x)
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    assemble(comps, w, h, maxH, maxV)
  }

  /** Decode one progressive scan's entropy data (T.81 G.2 / the public
    * reference implementation's successive-approximation semantics):
    * DC first/refine (interleaved or single-component), AC first/refine
    * (single-component, spectral band Ss..Se, EOB runs). Coefficients
    * accumulate in each component's zigzag-order `coefZ`. Returns the
    * index of the next marker after the scan, or -1 on a corrupt stream.
    */
  private def decodeProgScan(p: Array[Byte], dataStart: Int, scanComps: Array[Comp],
      mcusX: Int, mcusY: Int, ss: Int, se: Int, ah: Int, al: Int,
      restartInterval: Int, dcHuff: Array[Huff], acHuff: Array[Huff]): Int = {
    if (ss > 63 || se > 63 || se < ss || al > 13) return -1
    if (ss == 0 && se != 0) return -1 // DC and AC never share a scan
    if (ss > 0 && scanComps.length != 1) return -1 // AC scans: one component
    val br = new BitReader(p, dataStart)
    var eobrun = 0
    scanComps.foreach(_.dcPred = 0)
    var unit = 0 // restart-interval counter (MCUs or blocks)
    @inline def restartIfDue(): Boolean =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        val ok = br.restart()
        if (ok) { scanComps.foreach(_.dcPred = 0); eobrun = 0 }
        ok
      } else true
    if (ss == 0) {
      // DC scan. Interleaved: MCU geometry like baseline; single
      // component: its own bwS × bhS block raster.
      val interleaved = scanComps.length > 1
      val nUnits = if (interleaved) mcusX * mcusY else scanComps(0).bwS * scanComps(0).bhS
      while (unit < nUnits) {
        if (!restartIfDue()) return -1
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          val nBx = if (interleaved) c.h else 1
          val nBy = if (interleaved) c.v else 1
          var by = 0
          while (by < nBy) {
            var bx = 0
            while (bx < nBx) {
              val bX = if (interleaved) (unit % mcusX) * c.h + bx else unit % c.bwS
              val bY = if (interleaved) (unit / mcusX) * c.v + by else unit / c.bwS
              val off = (bY * c.bw + bX) * 64
              if (ah == 0) { // DC first: diffs accumulate in the >>Al domain
                val dh = dcHuff(c.dcTab)
                if (dh == null) return -1
                val t = br.decodeHuff(dh)
                if (t < 0 || t > 15) return -1
                c.dcPred += extend(br.bits(t), t)
                c.coefZ(off) = c.dcPred << al
              } else { // DC refine: one correction bit per block
                if (br.bit() == 1) c.coefZ(off) |= 1 << al
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        unit += 1
      }
    } else {
      // AC scan over one component's block raster
      val c = scanComps(0)
      val ach = acHuff(c.acTab)
      if (ach == null) return -1
      val p1 = 1 << al; val m1 = -1 << al
      val nUnits = c.bwS * c.bhS
      while (unit < nUnits) {
        if (!restartIfDue()) return -1
        val off = ((unit / c.bwS) * c.bw + unit % c.bwS) * 64
        if (ah == 0) { // AC first (G.2.2): band values at <<Al, EOB runs
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var done = false
            while (!done && k <= se) {
              val rs = br.decodeHuff(ach)
              if (rs < 0) return -1
              val r = rs >> 4; val s = rs & 0x0f
              if (s != 0) {
                k += r
                if (k > se) return -1
                c.coefZ(off + k) = extend(br.bits(s), s) << al
                k += 1
              } else if (r == 15) k += 16 // ZRL
              else { // EOBn: run of (1<<r)+bits(r) all-done blocks
                eobrun = (1 << r) - 1
                if (r > 0) eobrun += br.bits(r)
                done = true
              }
            }
          }
        } else { // AC refine (G.2.3): correction bits thread through runs
          var k = ss
          if (eobrun == 0) {
            var done = false
            while (!done && k <= se) {
              val rs = br.decodeHuff(ach)
              if (rs < 0) return -1
              var r = rs >> 4; val s = rs & 0x0f
              var newVal = 0
              if (s == 0) {
                if (r < 15) { // EOBn: correct the rest of this band below
                  eobrun = 1 << r
                  if (r > 0) eobrun += br.bits(r)
                  done = true
                }
                // r == 15: ZRL — pass 16 zero-history coefficients
              } else {
                if (s != 1) return -1 // refinement codes only ±1
                newVal = if (br.bit() == 1) p1 else m1
              }
              if (!done) {
                // advance over r zero-history coefs; every nonzero on the
                // way carries a correction bit
                var placed = false
                while (!placed && k <= se) {
                  val v = c.coefZ(off + k)
                  if (v != 0) {
                    if (br.bit() == 1 && (v & p1) == 0)
                      c.coefZ(off + k) = v + (if (v >= 0) p1 else m1)
                  } else if (r == 0) {
                    if (newVal != 0) c.coefZ(off + k) = newVal
                    placed = true
                  } else r -= 1
                  k += 1
                }
                if (!placed && newVal != 0) return -1 // ran off the band
              }
            }
          }
          if (eobrun > 0) { // tail: correction bits for remaining nonzeros
            while (k <= se) {
              val v = c.coefZ(off + k)
              if (v != 0 && br.bit() == 1 && (v & p1) == 0)
                c.coefZ(off + k) = v + (if (v >= 0) p1 else m1)
              k += 1
            }
            eobrun -= 1
          }
        }
        unit += 1
      }
    }
    nextMarker(p, math.max(dataStart, br.pos - 2))
  }

  /** Progressive reconstruction at EOI: dequantize each component's
    * accumulated zigzag coefficients, IDCT every block into the sample
    * plane, then share the baseline assembly (upsample + color convert).
    */
  private def finishProgressive(w: Int, h: Int, comps: Array[Comp],
      qt: Array[Array[Int]], maxH: Int, maxV: Int): Option[(Int, Int, Int, Array[Int])] = {
    if (comps == null || w <= 0 || h <= 0) return None
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)
    comps.foreach { c =>
      if (c.tq > 3) return None
      val q = qt(c.tq)
      c.wPix = c.bw * 8
      c.plane = new Array[Int](c.wPix * c.bh * 8)
      var b = 0
      val nB = c.bw * c.bh
      while (b < nB) {
        val off = b * 64
        var k = 0
        while (k < 64) { coef(ZigZag(k)) = c.coefZ(off + k) * q(ZigZag(k)); k += 1 }
        idctBlock(coef, blk)
        val px0 = (b % c.bw) * 8; val py0 = (b / c.bw) * 8
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { c.plane((py0 + y) * c.wPix + px0 + x) = blk(8 * y + x); x += 1 }
          y += 1
        }
        b += 1
      }
    }
    assemble(comps, w, h, maxH, maxV)
  }

  /** Shared final stage for baseline and progressive: upsample every
    * component plane to full resolution and color-convert.
    */
  private def assemble(comps: Array[Comp], w: Int, h: Int, maxH: Int, maxV: Int)
      : Option[(Int, Int, Int, Array[Int])] = {
    val nc = comps.length
    if (nc == 1) {
      val c = comps(0)
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = c.plane(y * c.wPix + x); x += 1 }
        y += 1
      }
      Some((w, h, 1, out))
    } else {
      val py = upsample(comps(0), w, h, maxH, maxV)
      val pb = upsample(comps(1), w, h, maxH, maxV)
      val pr = upsample(comps(2), w, h, maxH, maxV)
      val out = new Array[Int](w * h * 3)
      @inline def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
      var i = 0
      val n = w * h
      while (i < n) {
        val yy = py(i)
        val b0 = pb(i) - 128
        val r0 = pr(i) - 128
        // jdcolor-style fixed point (SCALEBITS = 16)
        out(3 * i) = clamp(yy + ((91881 * r0 + 32768) >> 16))
        out(3 * i + 1) = clamp(yy + ((-22554 * b0 - 46802 * r0 + 32768) >> 16))
        out(3 * i + 2) = clamp(yy + ((116130 * b0 + 32768) >> 16))
        i += 1
      }
      Some((w, h, 3, out))
    }
  }

  /** Upsample one component plane to full (w, h) resolution. 2:1 factors
    * use the reference implementation's "fancy" triangular filter (3/4 +
    * 1/4 weights horizontally; (3·this + near)/4 column sums combined
    * 3:1 vertically with the alternating +8/+7 bias) — bit-identical to
    * what libjpeg-based decoders (incl. the JDK's) produce for 4:2:2 and
    * 4:2:0; anything rarer falls back to sample replication. Only the
    * VALID downsampled region participates (block padding is ignored;
    * edges replicate).
    */
  private def upsample(c: Comp, w: Int, h: Int, maxH: Int, maxV: Int): Array[Int] = {
    val cw = (w * c.h + maxH - 1) / maxH
    val ch = (h * c.v + maxV - 1) / maxV
    @inline def in(x: Int, y: Int): Int = c.plane(y * c.wPix + x)
    val out = new Array[Int](w * h)
    if (c.h == maxH && c.v == maxV) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = in(x, y); x += 1 }
        y += 1
      }
    } else if (2 * c.h == maxH && c.v == maxV && cw >= 2) {
      // h2v1 fancy: cols double, rows pass through
      val row = new Array[Int](2 * cw)
      var y = 0
      while (y < h) {
        row(0) = in(0, y)
        row(1) = (in(0, y) * 3 + in(1, y) + 2) >> 2
        var k = 1
        while (k < cw - 1) {
          row(2 * k) = (in(k, y) * 3 + in(k - 1, y) + 1) >> 2
          row(2 * k + 1) = (in(k, y) * 3 + in(k + 1, y) + 2) >> 2
          k += 1
        }
        row(2 * cw - 2) = (in(cw - 1, y) * 3 + in(cw - 2, y) + 1) >> 2
        row(2 * cw - 1) = in(cw - 1, y)
        var x = 0
        while (x < w) { out(y * w + x) = row(x); x += 1 }
        y += 1
      }
    } else if (2 * c.h == maxH && 2 * c.v == maxV && cw >= 2) {
      // h2v2 fancy: 16-bit column sums (3·this row + nearer neighbor row),
      // then the same 3:1 horizontal filter at 1/16 scale
      val cs = new Array[Int](cw)
      val row = new Array[Int](2 * cw)
      var oy = 0
      while (oy < h) {
        val r0 = oy >> 1
        val r1 = if ((oy & 1) == 0) math.max(r0 - 1, 0) else math.min(r0 + 1, ch - 1)
        var k = 0
        while (k < cw) { cs(k) = in(k, r0) * 3 + in(k, r1); k += 1 }
        row(0) = (cs(0) * 4 + 8) >> 4
        row(1) = (cs(0) * 3 + cs(1) + 7) >> 4
        k = 1
        while (k < cw - 1) {
          row(2 * k) = (cs(k) * 3 + cs(k - 1) + 8) >> 4
          row(2 * k + 1) = (cs(k) * 3 + cs(k + 1) + 7) >> 4
          k += 1
        }
        row(2 * cw - 2) = (cs(cw - 1) * 3 + cs(cw - 2) + 8) >> 4
        row(2 * cw - 1) = (cs(cw - 1) * 4 + 7) >> 4
        var x = 0
        while (x < w) { out(oy * w + x) = row(x); x += 1 }
        oy += 1
      }
    } else { // 1-wide planes / asymmetric rarities: replicate
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = in(math.min(x * c.h / maxH, cw - 1), math.min(y * c.v / maxV, ch - 1))
          x += 1
        }
        y += 1
      }
    }
    out
  }

  // -- encoder ----------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var cnt = 0
    def put(code: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // stuff
          acc = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { val r = 8 - cnt; put((1 << r) - 1, r) }
  }

  /** Uniform-length canonical Huffman: 12 DC categories at 4 bits (codes
    * 0..11) and the AC symbols at 8 bits — EOB, ZRL, 16 runs × 10 sizes,
    * plus the EOBn symbols (r<<4, r = 1..14) progressive EOB runs need:
    * 176 codes, no all-ones codeword, valid per T.81, fully described by
    * the DHT segment the encoder writes.
    */
  private val dcSyms: Array[Int] = (0 to 11).toArray
  private val acSyms: Array[Int] = {
    val b = Array.newBuilder[Int]
    b += 0x00 // EOB / EOB1
    for (run <- 1 to 14) b += (run << 4) // EOBn (progressive only)
    for (run <- 0 to 15; size <- 1 to 10) b += (run << 4) | size
    b += 0xf0 // ZRL
    b.result().sorted
  }
  private val acCode: Map[Int, Int] = acSyms.zipWithIndex.toMap

  private def bitSize(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** FDCT + quantization for every 8×8 block of every component
    * (4:4:4 / grayscale, edge replication): per component, blocks in
    * raster order, 64 quantized coefficients each in ZIGZAG order.
    * Double-precision FDCT — exact DC for constant blocks. RGB converts
    * to YCbCr with jccolor-style fixed point (exact Y = v, Cb = Cr = 128
    * when R=G=B).
    */
  private def quantBlocks(w: Int, h: Int, channels: Int, px: (Int, Int, Int) => Int,
      qtable: Array[Int]): Array[Array[Int]] = {
    def sample(x0: Int, y0: Int, comp: Int): Int = {
      val x = math.min(math.max(x0, 0), w - 1)
      val y = math.min(math.max(y0, 0), h - 1)
      if (channels == 1) px(x, y, 0)
      else {
        val r = px(x, y, 0); val g = px(x, y, 1); val b = px(x, y, 2)
        comp match {
          case 0 => (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
          case 1 => ((-11059 * r - 21709 * g + 32768 * b + (128 << 16) + 32767) >> 16)
          case _ => ((32768 * r - 27439 * g - 5329 * b + (128 << 16) + 32767) >> 16)
        }
      }
    }
    val cos = Array.tabulate(8, 8)((k, n) => math.cos((2 * n + 1) * k * math.Pi / 16))
    val blocksY = (h + 7) / 8; val blocksX = (w + 7) / 8
    val out = Array.fill(channels)(new Array[Int](blocksX * blocksY * 64))
    val f = new Array[Double](64)
    var byi = 0
    while (byi < blocksY) {
      var bxi = 0
      while (bxi < blocksX) {
        var comp = 0
        while (comp < channels) {
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var s = 0.0
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  s += (sample(bxi * 8 + x, byi * 8 + y, comp) - 128) * cos(u)(x) * cos(v)(y)
                  x += 1
                }
                y += 1
              }
              val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
              val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
              f(8 * v + u) = 0.25 * cu * cv * s
              v += 1
            }
            u += 1
          }
          val off = (byi * blocksX + bxi) * 64
          var k = 0
          while (k < 64) {
            val nat = ZigZag(k)
            out(comp)(off + k) = math.round(f(nat) / qtable(nat)).toInt
            k += 1
          }
          comp += 1
        }
        bxi += 1
      }
      byi += 1
    }
    out
  }

  /** SOI through DHT — everything before the first SOS, shared by the
    * baseline (SOF0) and progressive (SOF2) encoders.
    */
  private def writeHeaders(out: java.io.ByteArrayOutputStream, w: Int, h: Int,
      channels: Int, qtable: Array[Int], sofMarker: Int): Unit = {
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(m); u16(payload.length + 2); out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    // DQT (table 0, zig-zag order on the wire)
    marker(0xdb, (Array(0x00) ++ ZigZag.map(qtable(_))).map(_.toByte))
    val sof = Array.newBuilder[Byte]
    sof += 8; sof += (h >> 8).toByte; sof += h.toByte; sof += (w >> 8).toByte; sof += w.toByte
    sof += channels.toByte
    for (c <- 1 to channels) { sof += c.toByte; sof += 0x11.toByte; sof += 0 }
    marker(sofMarker, sof.result())
    // DHT: DC table 0 (12 syms at 4 bits), AC table 0 (176 syms at 8 bits)
    val dcBits = new Array[Byte](16); dcBits(3) = 12
    val acBits = new Array[Byte](16); acBits(7) = acSyms.length.toByte
    marker(0xc4,
      Array(0x00.toByte) ++ dcBits ++ dcSyms.map(_.toByte) ++
      Array(0x10.toByte) ++ acBits ++ acSyms.map(_.toByte))
  }

  private def writeSos(out: java.io.ByteArrayOutputStream, compIds: Seq[Int],
      ss: Int, se: Int, ahal: Int): Unit = {
    val sos = Array.newBuilder[Byte]
    sos += compIds.length.toByte
    for (c <- compIds) { sos += c.toByte; sos += 0x00.toByte }
    sos += ss.toByte; sos += se.toByte; sos += ahal.toByte
    val payload = sos.result()
    out.write(0xff); out.write(0xda)
    out.write(((payload.length + 2) >> 8) & 0xff); out.write((payload.length + 2) & 0xff)
    out.write(payload, 0, payload.length)
  }

  /** Encode as baseline JFIF. `channels` 1 (grayscale) or 3 (RGB →
    * 4:4:4 YCbCr); `px(x, y, c)` supplies samples 0..255; `qtable` is
    * applied to every component (natural order) — [[qUnit]] makes
    * constant-block images roundtrip exactly, [[qStandard]] is the
    * general-content default.
    */
  def encode(w: Int, h: Int, channels: Int, px: (Int, Int, Int) => Int,
      qtable: Array[Int] = qStandard): Array[Byte] = {
    require(channels == 1 || channels == 3, "baseline encoder: 1 or 3 channels")
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, channels, qtable, sofMarker = 0xc0)
    writeSos(out, 1 to channels, 0, 63, 0)
    val qz = quantBlocks(w, h, channels, px, qtable)
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](channels)
    val blocksY = (h + 7) / 8; val blocksX = (w + 7) / 8
    var b = 0
    val nB = blocksX * blocksY
    while (b < nB) {
      var comp = 0
      while (comp < channels) {
        val off = b * 64
        val cz = qz(comp)
        val diff = cz(off) - dcPred(comp); dcPred(comp) = cz(off)
        val t = bitSize(diff)
        bw.put(t, 4) // DC: category t at code t (uniform 4-bit table)
        if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        var kk = 1
        while (kk < 64) {
          var run = 0
          while (kk < 64 && cz(off + kk) == 0) { run += 1; kk += 1 }
          if (kk == 64) bw.put(acCode(0x00), 8) // EOB
          else {
            while (run > 15) { bw.put(acCode(0xf0), 8); run -= 16 }
            val v = cz(off + kk); val s = bitSize(v)
            // baseline AC SSSS caps at 10 (T.81 Table K.5): |coef| <= 1023.
            // Fail loudly, not with an opaque Map lookup error — hit only
            // when a small quantizer meets very high-contrast content
            require(s <= 10,
              s"quantized AC coefficient $v exceeds baseline JPEG's 10-bit cap " +
              "(|coef| <= 1023); use a larger quantization table")
            bw.put(acCode((run << 4) | s), 8)
            bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
            kk += 1
          }
        }
        comp += 1
      }
      b += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode as PROGRESSIVE JFIF (SOF2) with a 4-stage spectral-selection
    * + DC-successive-approximation scan script:
    *   1. DC first, all components interleaved, Al = 1
    *   2. DC refine, Ah = 1 → Al = 0
    *   3. per component: AC band 1..5, Al = 0 (with EOB runs)
    *   4. per component: AC band 6..63, Al = 0 (with EOB runs)
    * Coefficients are the SAME quantized values the baseline encoder
    * writes — progressive only changes their transmission order — so a
    * correct decoder reconstructs pixels identical to the baseline
    * encoding's (pinned by ProgressiveJpegSpec), and [[qUnit]]
    * constant-block images stay exactly oracle-able.
    *
    * `restartInterval > 0` emits a DRI segment and RSTn markers every
    * that-many MCUs in EVERY scan (byte-aligned, DC predictors and EOB
    * runs reset across each — an EOB run never spans a restart), which
    * exercises the decoder's progressive restart path.
    */
  def encodeProgressive(w: Int, h: Int, channels: Int, px: (Int, Int, Int) => Int,
      qtable: Array[Int] = qStandard, restartInterval: Int = 0): Array[Byte] = {
    require(channels == 1 || channels == 3, "progressive encoder: 1 or 3 channels")
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, channels, qtable, sofMarker = 0xc2)
    if (restartInterval > 0) { // DRI
      out.write(0xff); out.write(0xdd); out.write(0x00); out.write(0x04)
      out.write((restartInterval >> 8) & 0xff); out.write(restartInterval & 0xff)
    }
    val qz = quantBlocks(w, h, channels, px, qtable)
    val blocksY = (h + 7) / 8; val blocksX = (w + 7) / 8
    val nB = blocksX * blocksY
    var rstIdx = 0
    def restartMark(bw: BitWriter, unit: Int): Boolean =
      if (restartInterval > 0 && unit + 1 < nB && (unit + 1) % restartInterval == 0) {
        bw.flush()
        out.write(0xff); out.write(0xd0 + rstIdx % 8)
        rstIdx += 1
        true
      } else false

    // scan 1: DC first (Al = 1) — diffs in the >>1 domain, MCU-interleaved
    writeSos(out, 1 to channels, 0, 0, 0x01)
    locally {
      rstIdx = 0
      val bw = new BitWriter(out)
      val dcPred = new Array[Int](channels)
      var b = 0
      while (b < nB) {
        var comp = 0
        while (comp < channels) {
          val dc = qz(comp)(b * 64) >> 1
          val diff = dc - dcPred(comp); dcPred(comp) = dc
          val t = bitSize(diff)
          bw.put(t, 4)
          if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
          comp += 1
        }
        if (restartMark(bw, b)) java.util.Arrays.fill(dcPred, 0)
        b += 1
      }
      bw.flush()
    }

    // scan 2: DC refine (Ah = 1, Al = 0) — one raw bit per block
    writeSos(out, 1 to channels, 0, 0, 0x10)
    locally {
      rstIdx = 0
      val bw = new BitWriter(out)
      var b = 0
      while (b < nB) {
        var comp = 0
        while (comp < channels) {
          bw.put(qz(comp)(b * 64) & 1, 1)
          comp += 1
        }
        restartMark(bw, b)
        b += 1
      }
      bw.flush()
    }

    // scans 3..: per component, AC spectral bands with EOB-run coding
    for (comp <- 0 until channels; (ss, se) <- Seq((1, 5), (6, 63))) {
      writeSos(out, Seq(comp + 1), ss, se, 0x00)
      rstIdx = 0
      val bw = new BitWriter(out)
      val cz = qz(comp)
      var eobrun = 0
      def flushEob(): Unit = while (eobrun > 0) {
        val n = math.min(eobrun, 32767)
        val r = 31 - Integer.numberOfLeadingZeros(n)
        bw.put(acCode(r << 4), 8)
        if (r > 0) bw.put(n - (1 << r), r)
        eobrun -= n
      }
      var b = 0
      while (b < nB) {
        val off = b * 64
        var lastNZ = -1
        var k = ss
        while (k <= se) { if (cz(off + k) != 0) lastNZ = k; k += 1 }
        if (lastNZ < 0) eobrun += 1
        else {
          flushEob()
          var run = 0
          k = ss
          while (k <= lastNZ) {
            val v = cz(off + k)
            if (v == 0) run += 1
            else {
              while (run > 15) { bw.put(acCode(0xf0), 8); run -= 16 }
              val s = bitSize(v)
              require(s <= 10,
                s"quantized AC coefficient $v exceeds JPEG's 10-bit cap " +
                "(|coef| <= 1023); use a larger quantization table")
              bw.put(acCode((run << 4) | s), 8)
              bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
              run = 0
            }
            k += 1
          }
          if (lastNZ < se) eobrun = 1 // this block's tail starts a new run
        }
        // an EOB run must not span a restart: flush it first
        if (restartInterval > 0 && b + 1 < nB && (b + 1) % restartInterval == 0) flushEob()
        restartMark(bw, b)
        b += 1
      }
      flushEob()
      bw.flush()
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
