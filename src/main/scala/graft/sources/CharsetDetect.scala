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

  /** [[sniff]] result: the winning charset, WHICH precedence level won
    * (`bom` / `http` / `meta` / `structural`), the high-byte count of
    * the post-BOM payload and the decoded length in UTF-16 code units
    * (single-byte charsets: one per byte; UTF-8: one per sequence;
    * UTF-16: one per 2-byte unit).
    */
  final case class Sniffed(charset: String, source: String,
      nNonAscii: Int, decodedLen: Int)

  /** WHATWG-precedence charset sniffing — the published decode decision
    * of real HTML pipelines (WHATWG Encoding §4.2 BOM sniff + HTML
    * §13.2.3.2 prescan): **BOM > HTTP `charset=` parameter > `<meta>`
    * prescan > structural fallback** ([[detect]]). House strictness on
    * top of the published order: a DECLARED label whose bytes fail
    * strict validation (a lying header, an odd-length "UTF-16" body)
    * falls through to the next level instead of mislabeling — headers
    * lie, the bytes don't. Published quirks honored: declared labels
    * normalize per the WHATWG encoding-label table (`latin1`,
    * `iso-8859-1`, `us-ascii` → windows-1252), and a `<meta>`-declared
    * UTF-16 is read as UTF-8 (HTML §13.2.3.3 — a page that really were
    * UTF-16 could not carry an ASCII meta tag to say so).
    *
    * `httpContentType` is the raw Content-Type header value ("" = none);
    * the `charset=` parameter is extracted here.
    */
  def sniff(bytes: Array[Byte], httpContentType: String = ""): Sniffed = {
    val n = bytes.length
    // 1) BOM — authoritative when its declared decode holds
    if (n >= 3 && (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb
        && (bytes(2) & 0xff) == 0xbf) {
      val rest = java.util.Arrays.copyOfRange(bytes, 3, n)
      val d = detect(rest)
      if (d.charset != "latin-1") return Sniffed("utf-8", "bom", d.nNonAscii, d.decodedLen)
    } else if (n >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe) {
      if ((n - 2) % 2 == 0)
        return Sniffed("utf-16le", "bom", countHighBytes(bytes, 2), (n - 2) / 2)
    } else if (n >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff) {
      if ((n - 2) % 2 == 0)
        return Sniffed("utf-16be", "bom", countHighBytes(bytes, 2), (n - 2) / 2)
    }
    // 2) HTTP header charset parameter
    val fromHttp = declared(bytes, charsetParam(httpContentType), "http", metaIsAscii = false)
    if (fromHttp.isDefined) return fromHttp.get
    // 3) <meta charset> / http-equiv prescan over the first 1024 bytes
    val fromMeta = declared(bytes, metaCharset(bytes), "meta", metaIsAscii = true)
    if (fromMeta.isDefined) return fromMeta.get
    // 4) structural fallback
    val d = detect(bytes)
    Sniffed(d.charset, "structural", d.nNonAscii, d.decodedLen)
  }

  /** Resolve a declared label against the actual bytes; None = label
    * absent/unknown or its decode does not hold (fall through).
    */
  private def declared(bytes: Array[Byte], label: String, source: String,
      metaIsAscii: Boolean): Option[Sniffed] = {
    val n = bytes.length
    normalizeLabel(label, metaQuirk = metaIsAscii) match {
      case "" => None
      case "utf-8" =>
        val d = detect(bytes)
        if (d.charset == "latin-1") None // label lies; bytes don't validate
        else Some(Sniffed("utf-8", source, d.nNonAscii, d.decodedLen))
      case enc @ ("utf-16le" | "utf-16be") =>
        if (n % 2 != 0) None
        else Some(Sniffed(enc, source, countHighBytes(bytes, 0), n / 2))
      case "windows-1252" =>
        Some(Sniffed("windows-1252", source, countHighBytes(bytes, 0), n))
      case _ => None
    }
  }

  /** WHATWG encoding-label normalization (the subset a crawl corpus
    * actually carries). `metaQuirk`: HTML §13.2.3.3 — UTF-16 labels
    * from a `<meta>` tag are changed to UTF-8. "" = unknown label.
    */
  private def normalizeLabel(label: String, metaQuirk: Boolean): String = {
    val l = label.trim.toLowerCase(java.util.Locale.ROOT)
    val base = l match {
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" => "utf-8"
      case "utf-16" | "utf-16le" | "unicode" => "utf-16le"
      case "utf-16be" => "utf-16be"
      case "latin1" | "latin-1" | "l1" | "iso-8859-1" | "iso8859-1"
          | "iso_8859-1" | "windows-1252" | "cp1252" | "x-cp1252"
          | "ascii" | "us-ascii" | "iso-ir-100" => "windows-1252"
      case _ => ""
    }
    if (metaQuirk && (base == "utf-16le" || base == "utf-16be")) "utf-8" else base
  }

  /** Extract the `charset=` parameter from a Content-Type value
    * (case-insensitive, optional quotes); "" when absent.
    */
  def charsetParam(contentType: String): String = {
    val lower = contentType.toLowerCase(java.util.Locale.ROOT)
    val i = lower.indexOf("charset=")
    if (i < 0) return ""
    var v = contentType.substring(i + 8).trim
    val semi = v.indexOf(';')
    if (semi >= 0) v = v.substring(0, semi).trim
    if (v.length >= 2 && (v.head == '"' && v.last == '"')) v = v.substring(1, v.length - 1)
    v
  }

  /** HTML §13.2.3.2 prescan (strict subset): scan the first 1024 bytes
    * for a `<meta ...>` tag carrying a `charset=` declaration — either
    * the `charset` attribute or a `charset=` inside an `http-equiv`
    * `content` value; the byte window is read as ASCII (any page
    * declaring its charset must spell the declaration in ASCII). ""
    * when no declaration is found.
    */
  def metaCharset(bytes: Array[Byte]): String = {
    val window = new String(bytes, 0, math.min(1024, bytes.length),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val lower = window.toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (true) {
      val tag = lower.indexOf("<meta", from)
      if (tag < 0) return ""
      val end = lower.indexOf('>', tag)
      val tagEnd = if (end < 0) lower.length else end
      val cs = lower.indexOf("charset", tag)
      if (cs >= 0 && cs < tagEnd) {
        var i = cs + 7
        while (i < tagEnd && (lower.charAt(i) == ' ' || lower.charAt(i) == '\t')) i += 1
        if (i < tagEnd && lower.charAt(i) == '=') {
          i += 1
          while (i < tagEnd && (lower.charAt(i) == ' ' || lower.charAt(i) == '\t')) i += 1
          val quote = if (i < tagEnd && (lower.charAt(i) == '"' || lower.charAt(i) == '\'')) lower.charAt(i) else 0.toChar
          if (quote != 0) {
            val close = lower.indexOf(quote, i + 1)
            if (close > i && close <= tagEnd) return lower.substring(i + 1, close).trim
          } else {
            var j = i
            while (j < tagEnd && !" \t;\"'".contains(lower.charAt(j))) j += 1
            if (j > i) return lower.substring(i, j).trim
          }
        }
      }
      from = tagEnd + 1
      if (from >= lower.length) return ""
    }
    "" // unreachable
  }

  private def countHighBytes(bytes: Array[Byte], from: Int): Int = {
    var c = 0
    var i = from
    while (i < bytes.length) { if ((bytes(i) & 0xff) >= 0x80) c += 1; i += 1 }
    c
  }
}
