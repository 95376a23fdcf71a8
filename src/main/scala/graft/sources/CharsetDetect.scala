package graft.sources

/** Byte-level charset detection — the decode decision a crawl pipeline
  * makes before any text op touches a payload (headers lie; the bytes
  * don't): pure ASCII → "ascii"; otherwise a full structural UTF-8
  * validation pass → "utf-8" when it holds; any violation falls back to
  * "latin-1", the single-byte superset that decodes anything. Validation
  * is STRICT per Unicode 15 table 3-7, not just shape-of-continuation:
  * the lead byte bounds the FIRST continuation byte (E0→A0-BF kills
  * overlongs, ED→80-9F kills CESU-8 surrogates, F0→90-BF kills 4-byte
  * overlongs, F4→80-8F kills > U+10FFFF), so every sequence this pass
  * accepts is exactly the set a strict decoder (Java REPORT, DuckDB,
  * Python) accepts — the pipeline's label and every downstream tool's
  * decode agree byte-for-byte. The same scan yields the non-ASCII byte
  * count and the decoded CHARACTER length under the detected charset
  * (UTF-8: one char per non-continuation byte; single-byte charsets: one
  * per byte) — all integers an oracle recomputes from the construction
  * formula.
  */
object CharsetDetect {

  final case class Detection(charset: String, nNonAscii: Int, decodedLen: Int)

  def detect(bytes: Array[Byte]): Detection = {
    val n = bytes.length
    val high = countHighBytes(bytes)
    if (high == 0) return Detection("ascii", 0, n)
    // structural UTF-8 validation + character count in one clean pass;
    // the non-ASCII byte count is charset-independent (computed above)
    var utf8Chars = 0
    var valid = true
    var i = 0
    while (valid && i < n) {
      val b = bytes(i) & 0xff
      if (b < 0x80) { utf8Chars += 1; i += 1 }
      else {
        val len =
          if (b >= 0xc2 && b <= 0xdf) 2
          else if (b >= 0xe0 && b <= 0xef) 3
          else if (b >= 0xf0 && b <= 0xf4) 4
          else -1 // continuation byte in lead position, or 0xc0/0xc1 overlong
        if (len < 0 || i + len > n) valid = false
        else {
          // Unicode 15 table 3-7: the lead constrains the FIRST
          // continuation's range (overlong / surrogate / >U+10FFFF
          // exclusion); the rest are plain 80-BF
          val (lo1, hi1) = b match {
            case 0xe0 => (0xa0, 0xbf) // overlong 3-byte
            case 0xed => (0x80, 0x9f) // U+D800-DFFF surrogates
            case 0xf0 => (0x90, 0xbf) // overlong 4-byte
            case 0xf4 => (0x80, 0x8f) // > U+10FFFF
            case _ => (0x80, 0xbf)
          }
          val c1 = bytes(i + 1) & 0xff
          if (c1 < lo1 || c1 > hi1) valid = false
          var j = 2
          while (valid && j < len) {
            if ((bytes(i + j) & 0xc0) != 0x80) valid = false
            j += 1
          }
          if (valid) { utf8Chars += 1; i += len }
        }
      }
    }
    if (valid) Detection("utf-8", high, utf8Chars)
    else Detection("latin-1", high, n)
  }

  private def countHighBytes(bytes: Array[Byte]): Int = {
    var c = 0
    var i = 0
    while (i < bytes.length) { if ((bytes(i) & 0xff) >= 0x80) c += 1; i += 1 }
    c
  }
}
