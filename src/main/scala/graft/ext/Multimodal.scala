package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension).
  *
  * Images/audio/video are carried as opaque `binary` columns with typed
  * metadata. The Spark-side plumbing — schema, partition-sized batching,
  * feature schema — is real and tested. Decoding is real too, in two
  * layers: [[decodeHeader]] parses PNG/GIF/BMP/JPEG/WAV headers
  * (dimensions, channels) with pure-JVM byte arithmetic (oracled by
  * x_multimodal_decode), and [[decodePixels]] is a FULL pixel decoder
  * for THREE container formats — PNG (JDK `Inflater` for the zlib stream
  * plus byte-exact reconstruction of all five scanline filters), GIF
  * (a from-scratch LZW decompressor with variable-width codes, KwKwK,
  * dictionary reset, and 4-pass de-interlacing; palette → RGB), and
  * baseline JPEG ([[Jpeg]]: huffman entropy decode, dequantization, the
  * reference islow integer IDCT, fancy chroma upsampling, fixed-point
  * YCbCr→RGB — bit-identical to the JDK's libjpeg-based reader) — with
  * [[encodePng]] / [[encodeGif]] / [[Jpeg.encode]] as deterministic
  * write halves (oracled end-to-end by x_multimodal_pixels /
  * x_multimodal_gif / x_multimodal_jpeg / x_multimodal_features: encode
  * a formula image, decode it back, match the formula's exact channel
  * sums in DuckDB; PngCodecSpec/GifCodecSpec/JpegCodecSpec pin all three
  * codecs against the JDK's independent ImageIO implementations in both
  * directions). Only the embedding forward pass remains a clearly marked
  * STUB (no model runtime exists in this container): [[featuresStub]]
  * produces deterministic fake features for opaque payloads so the
  * batched pipeline shape is exercised end-to-end regardless of format.
  *
  * Scale design: decode runs per-partition with local batching (`grouped`),
  * so decoder state (a model, a codec context) is initialized once per
  * batch, not per row, and no shuffle is introduced — the feature extract
  * is a map over the scan.
  */
object Multimodal {

  /** A media row: opaque payload plus typed metadata. */
  final case class MediaRow(id: Long, media: Array[Byte], format: String)

  /** Extracted features: shape metadata + fixed-width feature vector. */
  final case class MediaFeatures(
      id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  val featureDim = 8

  /** Decoded container metadata: format, pixel dimensions, channel count,
    * payload size — what a real ingest pipeline indexes before any pixel
    * decode happens.
    */
  final case class MediaMeta(
      doc_id: Long, format: String, width: Int, height: Int, channels: Int, n_bytes: Long)

  /** REAL pure-JVM image-container header decoder (no native codecs
    * needed for metadata): PNG (8-byte signature + IHDR — width/height
    * big-endian at offsets 16/20, color type at 25 mapping to channel
    * count), GIF87a/89a (logical-screen width/height little-endian uint16
    * at 6/8; palette RGB → 3 channels), and BMP (BITMAPINFOHEADER —
    * width/height little-endian int32 at 18/22, height may be negative
    * for top-down rows, bit count at 28 → channels). Unrecognized bytes
    * return None and fall back to the documented stub path, so opaque
    * payloads still flow.
    */
  def decodeHeader(p: Array[Byte]): Option[(String, Int, Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (p.length >= 26 && u8(0) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') {
      val channels = u8(25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => 0
      }
      Some(("png", be32(16), be32(20), channels))
    } else if (p.length >= 13 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F') {
      Some(("gif", le16(6), le16(8), 3))
    } else if (p.length >= 30 && p(0) == 'B' && p(1) == 'M') {
      Some(("bmp", le32(18), math.abs(le32(22)), u8(28) / 8))
    } else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the frame header (SOF0/1/2) — height
      // BE16 at +5, width at +7, component count at +9 within the segment
      var i = 2
      while (i + 9 < p.length && u8(i) == 0xff) {
        val m = u8(i + 1)
        val len = (u8(i + 2) << 8) | u8(i + 3)
        if (m == 0xc0 || m == 0xc1 || m == 0xc2)
          return Some(("jpeg", (u8(i + 7) << 8) | u8(i + 8), (u8(i + 5) << 8) | u8(i + 6), u8(i + 9)))
        i = if (m >= 0xd0 && m <= 0xd7) i + 2 else i + 2 + len
      }
      None
    } else if (p.length >= 36 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F'
        && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') {
      // WAV (RIFF/WAVE fmt chunk): audio reuses the image meta slots —
      // width = sample rate (LE32 @24), height = bits/sample (LE16 @34),
      // channels = channel count (LE16 @22)
      Some(("wav", le32(24), le16(34), le16(22)))
    } else None
  }

  /** Batched header decode over a media Dataset — the same per-partition
    * `grouped` batch shape as [[extractFeatures]], producing the indexable
    * metadata row per payload (format "unknown", zeros for unrecognized
    * bytes). No shuffle: a map over the scan at any corpus size.
    */
  def decodeMeta(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (fmt, w, h, ch) = decodeHeader(r.media).getOrElse(("unknown", 0, 0, 0))
          MediaMeta(r.id, fmt, w, h, ch, r.media.length.toLong)
        }
      }
    }
  }

  /** Per-image pixel statistics from a REAL decode: dimensions, channel
    * count, pixel count, and exact per-channel value sums (the integers an
    * oracle can recompute from the pixel formula of a constructed image).
    */
  final case class PixelStats(
      id: Long, width: Int, height: Int, channels: Int, n_pixels: Long,
      c0_sum: java.lang.Long, c1_sum: java.lang.Long,
      c2_sum: java.lang.Long, c3_sum: java.lang.Long)

  /** REAL pure-JVM PNG pixel decoder — no native codec needed: the zlib
    * stream inflates with `java.util.zip.Inflater` (in the JDK), and the
    * five PNG scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6)
    * are reconstructed byte-exactly. Supports the common 8-bit
    * non-interlaced color types (gray=0, gray+alpha=4, RGB=2, RGBA=6);
    * palette/16-bit/interlaced payloads return None and fall back to the
    * header-only path. Returns (width, height, channels, pixels) with
    * pixels in row-major x-then-channel order, values 0..255.
    *
    * Scale note: decode is per-row work inside a batched mapPartitions —
    * a map over the scan, no shuffle, so the pixel path costs exactly the
    * codec arithmetic at any corpus size.
    */
  def decodePixels(p: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F') return decodeGifPixels(p)
    if (p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) return Jpeg.decode(p)
    if (p.length < 8 || (p(0) & 0xff) != 0x89 || p(1) != 'P' || p(2) != 'N' || p(3) != 'G')
      return None
    def be32(j: Int): Int =
      ((p(j) & 0xff) << 24) | ((p(j + 1) & 0xff) << 16) | ((p(j + 2) & 0xff) << 8) | (p(j + 3) & 0xff)
    var i = 8
    var w = 0; var h = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && i + 8 <= p.length) {
      val len = be32(i)
      if (len < 0 || i + 8 + len + 4 > p.length) return None
      val typ = new String(p, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(i + 8); h = be32(i + 12)
          val bitDepth = p(i + 16) & 0xff
          colorType = p(i + 17) & 0xff
          val interlace = p(i + 20) & 0xff
          if (bitDepth != 8 || interlace != 0) return None
        case "IDAT" => idat.write(p, i + 8, len)
        case "IEND" => sawEnd = true
        case _ => ()
      }
      i += 8 + len + 4 // data + CRC
    }
    val ch = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => return None }
    if (w <= 0 || h <= 0 || !sawEnd || w.toLong * h * ch > (1 << 26)) return None
    val stride = w * ch
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
      if (off != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None } finally inf.end()
    // filter reconstruction: a = left, b = up, c = upper-left (zeros
    // beyond the image edge, per spec)
    val out = new Array[Int](w * h * ch)
    val prev = new Array[Int](stride)
    val curr = new Array[Int](stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < stride) {
        val f = raw(y * (stride + 1) + 1 + x) & 0xff
        val a = if (x >= ch) curr(x - ch) else 0
        val b = prev(x)
        val c = if (x >= ch) prev(x - ch) else 0
        val v = ft match {
          case 0 => f
          case 1 => (f + a) & 0xff
          case 2 => (f + b) & 0xff
          case 3 => (f + ((a + b) >> 1)) & 0xff
          case _ =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (f + pred) & 0xff
        }
        curr(x) = v
        out(y * stride + x) = v
        x += 1
      }
      System.arraycopy(curr, 0, prev, 0, stride)
      y += 1
    }
    Some((w, h, ch, out))
  }

  /** Deterministic PNG encoder (the write half of the codec): pixels from
    * `px(x, y, c)` (masked to 0..255), one scanline filter per row from
    * `filterFn(y) % 5` — so a round-trip through [[decodePixels]]
    * exercises every filter's reconstruction arithmetic, not just
    * filter-None. Emits signature + IHDR + one IDAT (JDK Deflater, zlib
    * wrapping, level 6) + IEND with real CRC32s — a standards-valid file
    * any PNG reader opens.
    */
  def encodePng(w: Int, h: Int, channels: Int, px: (Int, Int, Int) => Int,
      filterFn: Int => Int = _ % 5): Array[Byte] = {
    require(w > 0 && h > 0, "empty image")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case n => throw new IllegalArgumentException(s"unsupported channel count $n")
    }
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val prev = new Array[Int](stride)
    val curr = new Array[Int](stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < stride) { curr(x) = px(x / channels, y, x % channels) & 0xff; x += 1 }
      val ft = ((filterFn(y) % 5) + 5) % 5
      raw(y * (stride + 1)) = ft.toByte
      x = 0
      while (x < stride) {
        val a = if (x >= channels) curr(x - channels) else 0
        val b = prev(x)
        val c = if (x >= channels) prev(x - channels) else 0
        val f = ft match {
          case 0 => curr(x)
          case 1 => curr(x) - a
          case 2 => curr(x) - b
          case 3 => curr(x) - ((a + b) >> 1)
          case _ =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            curr(x) - pred
        }
        raw(y * (stride + 1) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      System.arraycopy(curr, 0, prev, 0, stride)
      y += 1
    }
    val defl = new java.util.zip.Deflater(6)
    val zOut = new java.io.ByteArrayOutputStream()
    try {
      defl.setInput(raw); defl.finish()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    } finally defl.end()
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] =
      Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb); out.write(data); out.write(be32(crc.getValue.toInt))
    }
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0))
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** REAL pure-JVM GIF pixel decoder: parses the logical screen
    * descriptor + global/local color tables, walks extension blocks, and
    * LZW-decompresses the image data (variable-width codes LSB-first,
    * clear/EOI handling, the KwKwK case, width growth to 12 bits) —
    * exactly the GIF89a algorithm, no codec library. Palette indices map
    * through the color table to RGB, so the result is always 3-channel.
    * Interlaced images and malformed streams return None.
    */
  def decodeGifPixels(p: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (p.length < 13 || p(0) != 'G' || p(1) != 'I' || p(2) != 'F') return None
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    var i = 6
    val packed = u8(i + 4)
    i += 7
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (i + 3 * n > p.length) return None
      gct = Array.tabulate(n)(k => (u8(i + 3 * k) << 16) | (u8(i + 3 * k + 1) << 8) | u8(i + 3 * k + 2))
      i += 3 * n
    }
    while (i < p.length) {
      u8(i) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension block: label then sub-blocks
          i += 2
          while (i < p.length && u8(i) != 0) i += 1 + u8(i)
          i += 1
        case 0x2c =>
          if (i + 10 > p.length) return None
          val iw = le16(i + 5); val ih = le16(i + 7); val ip = u8(i + 9)
          i += 10
          var ct = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            if (i + 3 * n > p.length) return None
            ct = Array.tabulate(n)(k =>
              (u8(i + 3 * k) << 16) | (u8(i + 3 * k + 1) << 8) | u8(i + 3 * k + 2))
            i += 3 * n
          }
          if (ct == null || iw <= 0 || ih <= 0) return None
          if (i >= p.length) return None
          val minCode = u8(i); i += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          while (i < p.length && u8(i) != 0) {
            val n = u8(i)
            if (i + 1 + n > p.length) return None
            data.write(p, i + 1, n); i += 1 + n
          }
          val idx = lzwDecode(data.toByteArray, minCode, iw * ih).getOrElse(return None)
          // interlaced GIFs store rows in four passes (0,8.. / 4,8.. /
          // 2,4.. / 1,2..): map stored-row order back to display order
          val rowOf: Int => Int =
            if ((ip & 0x40) == 0) identity
            else {
              // materialized once as an Array so the per-pixel lookup is
              // O(1) (a List here made decode O(w·h²) on tall images)
              val order = Seq((0, 8), (4, 8), (2, 4), (1, 2))
                .flatMap { case (s0, st) => s0 until ih by st }.toArray
              k => order(k)
            }
          val out = new Array[Int](iw * ih * 3)
          var k = 0
          while (k < iw * ih) {
            if (idx(k) >= ct.length) return None
            val c = ct(idx(k))
            val pos = (rowOf(k / iw) * iw + (k % iw)) * 3
            out(pos) = (c >> 16) & 0xff; out(pos + 1) = (c >> 8) & 0xff; out(pos + 2) = c & 0xff
            k += 1
          }
          return Some((iw, ih, 3, out))
        case _ => return None
      }
    }
    None
  }

  /** GIF-flavor LZW decompression: codes read LSB-first at growing width
    * (min+1 … 12 bits), literal codes < clear, dictionary entries as
    * (prefix, suffix) pairs, clear resets, EOI terminates, and the
    * classic code==next ("KwKwK") special case.
    */
  private def lzwDecode(d: Array[Byte], minCode: Int, nPixels: Int): Option[Array[Int]] = {
    val clear = 1 << minCode
    val end = clear + 1
    var width = minCode + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = end + 1
    val out = new Array[Int](nPixels)
    var outLen = 0
    var bitPos = 0
    def read(): Int = {
      if (bitPos + width > d.length * 8) return -2
      var v = 0
      var b = 0
      while (b < width) {
        v |= (((d((bitPos + b) >> 3) >> ((bitPos + b) & 7)) & 1) << b)
        b += 1
      }
      bitPos += width
      v
    }
    def firstOf(c0: Int): Int = { var c = c0; while (c > end) c = prefix(c); c }
    val stack = new Array[Int](4097)
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == -2) return None
      else if (code == clear) { next = end + 1; width = minCode + 1; prev = -1 }
      else if (code == end) done = true
      else if (prev == -1) {
        if (code >= clear) return None
        if (outLen >= nPixels) return None
        out(outLen) = code; outLen += 1; prev = code
      } else {
        var c = code
        var sp = 0
        if (code >= next) {
          if (code != next) return None
          stack(sp) = firstOf(prev); sp += 1
          c = prev
        }
        while (c > end) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= clear) return None
        val first = c
        stack(sp) = c; sp += 1
        if (outLen + sp > nPixels) return None
        while (sp > 0) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first; next += 1
          // widen as soon as a code of value `next` (the KwKwK case)
          // would no longer fit — the GIF-standard decoder schedule
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    if (outLen == nPixels) Some(out) else None
  }

  /** Deterministic GIF87a encoder (the write half): a 256-entry grayscale
    * global color table (palette[i] = (i,i,i)) and REAL LZW compression —
    * variable-width codes, width growth in lockstep with the decoder,
    * dictionary reset via clear when full. `px(x, y)` gives the 0..255
    * gray level. Standards-valid: any GIF reader opens it.
    */
  def encodeGif(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, "empty image")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    le16(w); le16(h)
    out.write(0x80 | 7) // GCT present, 2^(7+1)=256 entries
    out.write(0); out.write(0)
    var k = 0
    while (k < 256) { out.write(k); out.write(k); out.write(k); k += 1 }
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0) // descriptor
    val minCode = 8
    out.write(minCode)
    // LZW compress the index stream
    val clear = 1 << minCode
    val end = clear + 1
    var width = minCode + 1
    val dict = new java.util.HashMap[Long, Integer]()
    var next = end + 1
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nAcc = 0
    def emit(code: Int): Unit = {
      acc |= (code.toLong << nAcc); nAcc += width
      while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
    }
    emit(clear)
    var cur = px(0, 0) & 0xff
    var n = 1
    while (n < w * h) {
      val b = px(n % w, n / w) & 0xff
      val key = (cur.toLong << 12) | b
      val e = dict.get(key)
      if (e != null) cur = e.intValue()
      else {
        emit(cur)
        if (next < 4096) {
          dict.put(key, Integer.valueOf(next)); next += 1
          // the encoder widens ONE CODE LATER than the decoder: it only
          // needs width for the codes it emits (max next-1), while the
          // decoder must already fit the KwKwK value `next`
          if (next == (1 << width) + 1 && width < 12) width += 1
        } else {
          emit(clear); dict.clear(); next = end + 1; width = minCode + 1
        }
        cur = b
      }
      n += 1
    }
    emit(cur); emit(end)
    if (nAcc > 0) bits.write((acc & 0xff).toInt)
    val z = bits.toByteArray
    var off = 0
    while (off < z.length) {
      val len = math.min(255, z.length - off)
      out.write(len); out.write(z, off, len); off += len
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Nearest-neighbor pixel resize (the real half of [[resizePlan]]):
    * output pixel (x, y) samples source (⌊x·w/ow⌋, ⌊y·h/oh⌋) — integer
    * arithmetic only, so an oracle can re-derive every sampled
    * coordinate. Row-major x-then-channel layout like [[decodePixels]].
    */
  def resizeNearest(w: Int, h: Int, ch: Int, pix: Array[Int], ow: Int, oh: Int): Array[Int] = {
    require(ow > 0 && oh > 0 && pix.length == w * h * ch, "bad resize args")
    val out = new Array[Int](ow * oh * ch)
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        val sx = x * w / ow
        var c = 0
        while (c < ch) { out((y * ow + x) * ch + c) = pix((sy * w + sx) * ch + c); c += 1 }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Batched REAL pixel decode → exact per-channel sums. The oracle-able
    * face of [[decodePixels]]: for a constructed image whose pixel values
    * follow a SQL-expressible formula, these sums match the formula's sums
    * only if inflate AND all five filter reconstructions are byte-correct.
    * Undecodable payloads yield a zero-channel row (id retained) so opaque
    * bytes still flow. Same per-partition `grouped` batch shape as
    * [[extractFeatures]]; no shuffle.
    */
  def pixelStats(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[PixelStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          decodePixels(r.media) match {
            case Some((w, h, ch, pix)) =>
              val sums = new Array[Long](4)
              var i = 0
              while (i < pix.length) { sums(i % ch) += pix(i); i += 1 }
              def s(c: Int): java.lang.Long = if (c < ch) java.lang.Long.valueOf(sums(c)) else null
              PixelStats(r.id, w, h, ch, w.toLong * h, s(0), s(1), s(2), s(3))
            case None =>
              PixelStats(r.id, 0, 0, 0, 0L, null, null, null, null)
          }
        }
      }
    }
  }

  /** STUB decoder — stands in for an image/audio codec. Deterministic in
    * the payload bytes. A real implementation replaces ONLY this function.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 64 + math.abs(h % 1024)        // fake width
    val height = 64 + math.abs((h >> 10) % 1024) // fake height
    val frames = 1 + payload.length / 100       // fake frame count
    (width, height, frames)
  }

  /** STUB feature extractor — stands in for an embedding model forward
    * pass. Deterministic in the payload.
    */
  def featuresStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    var i = 0
    while (i < payload.length) {
      out(i % featureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Wrap a string column as a binary media payload (testdata has no real
    * media; `documents.text` bytes play the payload role).
    */
  def asMedia(docs: DataFrame, idCol: String, payloadCol: String, format: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("media"),
        lit(format).as("format"))
      .as[MediaRow]
  }

  /** Batched decode + feature extraction: mapPartitions with local
    * `grouped(batchSize)` — the batch shape a vectorized decoder (or a
    * Pandas-UDF-style columnar kernel) needs, with no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real model would process `batch` as one vectorized call.
        // Decodable PNGs take the REAL pixel path: features = per-channel
        // means from the decoded pixels (exact sums / pixel count, an
        // oracle-recomputable function of the image content). Other
        // recognized containers get real header dims + the stub features;
        // opaque payloads the full deterministic stub.
        batch.iterator.map { r =>
          decodePixels(r.media) match {
            case Some((w, h, ch, pix)) =>
              val sums = new Array[Long](featureDim)
              var i = 0
              while (i < pix.length) { sums(i % ch) += pix(i); i += 1 }
              val n = w.toDouble * h
              val feats = Array.tabulate(featureDim)(c =>
                if (c < ch) (sums(c) / n).toFloat else 0.0f)
              MediaFeatures(r.id, r.media.length.toLong, w, h, 1, feats)
            case None =>
              val (w, h, f) = decodeHeader(r.media)
                .map { case (_, dw, dh, _) => (dw, dh, 1) }
                .getOrElse(decodeStub(r.media))
              MediaFeatures(r.id, r.media.length.toLong, w, h, f, featuresStub(r.media))
          }
        }
      }
    }
  }

  /** Resize plan: pure column math fitting (width, height) into a bounding
    * box preserving aspect ratio — the metadata half of an image resize;
    * the pixel half belongs to the (stubbed) decoder. Adds out_w, out_h,
    * scale (rounded 4).
    */
  def resizePlan(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width").cast("double"),
      lit(maxH.toDouble) / col("height").cast("double"),
      lit(1.0))
    features
      .withColumn("scale", round(scale, 4))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))
  }

  /** Deterministic frame sampling plan for video payloads: every
    * `stride`-th frame index, as rows. Pure column math (no decode) — the
    * decode of chosen frames happens in [[extractFeatures]].
    */
  def sampleFrames(media: DataFrame, idCol: String, nFramesCol: String, stride: Int): DataFrame =
    media.select(
      col(idCol),
      explode(sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(stride))).as("frame_idx"))
}
