package graft.sources

/** Byte-level charset detection — the decode decision a crawl pipeline
  * makes before any text op touches a payload (headers lie; the bytes
  * don't): pure ASCII → "ascii"; otherwise a full structural UTF-8
  * validation pass (lead byte determines sequence length 2–4, every
  * continuation must be 10xxxxxx) → "utf-8" when it holds; any violation
  * falls back to "latin-1", the single-byte superset that decodes
  * anything. The same scan yields the non-ASCII byte count and the
  * decoded CHARACTER length under the detected charset (UTF-8: one char
  * per non-continuation byte; single-byte charsets: one per byte) — all
  * integers an oracle recomputes from the construction formula.
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
          var j = 1
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
