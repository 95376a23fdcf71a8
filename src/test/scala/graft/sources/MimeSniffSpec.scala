package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class MimeSniffSpec extends AnyFunSuite {

  test("byte signatures: every in-repo codec's output sniffs to its type") {
    assert(MimeSniff.sniff(graft.ext.Multimodal.encodePng(9, 8, 1, (x, y, _) => x + y))
      === "image/png")
    assert(MimeSniff.sniff(graft.ext.Multimodal.encodeGif(3, 3, (x, y) => x % 2))
      === "image/gif")
    assert(MimeSniff.sniff(graft.ext.Jpeg.encode(16, 16, 1, (x, y, _) => (x * y) % 256))
      === "image/jpeg")
    assert(MimeSniff.sniff(graft.ext.Multimodal.encodeWav(8000, 8, 1, 4, (f, _) => f))
      === "audio/wave")
    assert(MimeSniff.sniff(graft.ext.Pdf.encodeDocPdf("x", 10, 3)) === "application/pdf")
    assert(MimeSniff.sniff(new Warc.GzipCodec().gzip("abc".getBytes("US-ASCII")))
      === "application/x-gzip")
    assert(MimeSniff.sniff(new ZstdCodec().zstd("abc".getBytes("US-ASCII")))
      === "application/zstd")
  }

  test("HTML tag patterns: leading whitespace, case-insensitivity, tag-terminating byte") {
    assert(MimeSniff.sniff("<!DOCTYPE html><html></html>".getBytes("US-ASCII")) === "text/html")
    assert(MimeSniff.sniff("\n\t  <HTML lang=\"en\">".getBytes("US-ASCII")) === "text/html")
    assert(MimeSniff.sniff("<p>hi</p>".getBytes("US-ASCII")) === "text/html")
    // the tag must END with 0x20 or 0x3E — '<html' glued to letters is not a match
    assert(MimeSniff.sniff("<htmlish stuff".getBytes("US-ASCII")) === "text/plain")
    // a '<' deep in prose is not an HTML signal
    assert(MimeSniff.sniff("x < y and more".getBytes("US-ASCII")) === "text/plain")
  }

  test("text vs binary: BOMs are text, a control byte flips to octet-stream") {
    assert(MimeSniff.sniff(Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte, 'h'))
      === "text/plain")
    assert(MimeSniff.sniff("plain prose 123".getBytes("US-ASCII")) === "text/plain")
    assert(MimeSniff.sniff(Array[Byte]('a', 0x00, 'b')) === "application/octet-stream")
    // \t \n \r are NOT binary bytes
    assert(MimeSniff.sniff("a\tb\nc\rd".getBytes("US-ASCII")) === "text/plain")
    assert(MimeSniff.sniff(Array.emptyByteArray) === "application/octet-stream")
    // the binary scan caps at 512 bytes: a control byte past it is invisible
    val far = ("x" * 512).getBytes("US-ASCII") ++ Array[Byte](0x00)
    assert(MimeSniff.sniff(far) === "text/plain")
  }

  test("canonicalLink and metaRobots page-level signals") {
    assert(Html.canonicalLink(
      """<link rel="alternate canonical" href="http://c/1">""" +
        """<meta property="og:url" content="http://og/1">""") === Some("http://c/1"))
    assert(Html.canonicalLink("""<meta property="og:url" content="http://og/2">""")
      === Some("http://og/2"))
    assert(Html.canonicalLink("""<link rel="canonicalish" href="http://no/">""") === None)
    assert(Html.canonicalLink("""<link rel="canonical" href="">""" +
      """<meta property="og:url" content="http://og/3">""") === Some("http://og/3"))
    assert(Html.metaRobots(
      """<meta name="robots" content="NoIndex, nofollow">""" +
        """<meta name="googlebot" content="noimageindex">""" +
        """<meta name="ROBOTS" content="noarchive , noindex">""")
      === Set("noindex", "nofollow", "noarchive"))
    assert(Html.metaRobots("<html><body></body></html>") === Set.empty[String])
  }
}
