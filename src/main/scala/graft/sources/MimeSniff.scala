package graft.sources

/** Content sniffing (the WHATWG MIME Sniffing standard's byte-pattern
  * subset) — what a crawl pipeline trusts INSTEAD of the server's
  * `Content-Type` header: real-web servers mislabel constantly (HTML
  * served as text/plain, PNGs as octet-stream, tarballs as text), and a
  * corpus router that dispatches on the declared type corrupts every
  * downstream extractor. `sniff` inspects leading bytes only, so at
  * 100 TB it is a constant-time header peek per record, never a payload
  * scan.
  *
  * Reference behavior: the reference pipeline trusts file suffixes when
  * routing payloads (data-s3-elastic-transfer.py:171-189); this is the
  * byte-grounded form of that dispatch.
  */
object MimeSniff {

  private def at(p: Array[Byte], i: Int): Int = p(i) & 0xff

  private def startsWith(p: Array[Byte], sig: Array[Int]): Boolean =
    p.length >= sig.length && sig.indices.forall(i => at(p, i) == sig(i))

  private def ascii(s: String): Array[Int] = s.map(_.toInt).toArray

  /** Case-insensitive HTML tag-pattern match at `from` (WHATWG §7.1:
    * the tag name followed by 0x20 or 0x3E).
    */
  private def htmlTagAt(p: Array[Byte], from: Int, tag: String): Boolean = {
    if (from + tag.length >= p.length) return false
    var i = 0
    while (i < tag.length) {
      val c = at(p, from + i)
      val t = tag.charAt(i).toInt
      val lower = if (c >= 'A' && c <= 'Z') c + 32 else c
      if (lower != Character.toLowerCase(t)) return false
      i += 1
    }
    val next = at(p, from + tag.length)
    next == 0x20 || next == 0x3e
  }

  /** WHATWG "binary data byte": 0x00–0x08, 0x0B, 0x0E–0x1A, 0x1C–0x1F. */
  private def isBinaryByte(b: Int): Boolean =
    (b <= 0x08) || b == 0x0b || (b >= 0x0e && b <= 0x1a) || (b >= 0x1c && b <= 0x1f)

  private val HtmlTags =
    Seq("<!DOCTYPE HTML", "<HTML", "<HEAD", "<SCRIPT", "<IFRAME", "<H1", "<DIV",
      "<FONT", "<TABLE", "<A", "<STYLE", "<TITLE", "<B", "<BODY", "<BR", "<P", "<!--")

  /** Sniff the MIME type of `p`'s leading bytes: the WHATWG image /
    * audio-video / archive signatures, PDF/PostScript, UTF BOMs, then
    * the whitespace-tolerant HTML tag patterns, then the binary-byte
    * scan deciding text/plain vs application/octet-stream (first 512
    * bytes, per the standard's resource-header cap).
    */
  def sniff(p: Array[Byte]): String = {
    if (p.isEmpty) return "application/octet-stream"
    // images
    if (startsWith(p, Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))) return "image/png"
    if (startsWith(p, ascii("GIF87a")) || startsWith(p, ascii("GIF89a"))) return "image/gif"
    if (startsWith(p, Array(0xff, 0xd8, 0xff))) return "image/jpeg"
    if (startsWith(p, ascii("BM"))) return "image/bmp"
    if (p.length >= 14 && startsWith(p, ascii("RIFF")) &&
        at(p, 8) == 'W' && at(p, 9) == 'E' && at(p, 10) == 'B' && at(p, 11) == 'P')
      return "image/webp"
    // audio/video
    if (p.length >= 12 && startsWith(p, ascii("RIFF")) &&
        at(p, 8) == 'W' && at(p, 9) == 'A' && at(p, 10) == 'V' && at(p, 11) == 'E')
      return "audio/wave"
    if (startsWith(p, ascii("ID3"))) return "audio/mpeg"
    if (startsWith(p, ascii("OggS"))) return "application/ogg"
    // archives
    if (startsWith(p, Array(0x1f, 0x8b, 0x08))) return "application/x-gzip"
    if (startsWith(p, Array(0x50, 0x4b, 0x03, 0x04))) return "application/zip"
    if (startsWith(p, Array(0x28, 0xb5, 0x2f, 0xfd))) return "application/zstd"
    // documents
    if (startsWith(p, ascii("%PDF-"))) return "application/pdf"
    if (startsWith(p, ascii("%!PS-Adobe-"))) return "application/postscript"
    // UTF BOMs are text
    if (startsWith(p, Array(0xef, 0xbb, 0xbf)) ||
        startsWith(p, Array(0xfe, 0xff)) || startsWith(p, Array(0xff, 0xfe)))
      return "text/plain"
    // HTML tag patterns after leading whitespace
    var i = 0
    while (i < p.length && (at(p, i) == 0x09 || at(p, i) == 0x0a || at(p, i) == 0x0c ||
        at(p, i) == 0x0d || at(p, i) == 0x20)) i += 1
    if (i < p.length && at(p, i) == '<' && HtmlTags.exists(t => htmlTagAt(p, i, t)))
      return "text/html"
    // binary-byte scan over the resource header
    val cap = math.min(p.length, 512)
    var j = 0
    while (j < cap) {
      if (isBinaryByte(at(p, j))) return "application/octet-stream"
      j += 1
    }
    "text/plain"
  }
}
