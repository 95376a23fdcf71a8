package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins the UTF-8 structural validation corners: lead/continuation
  * pairing, 3- and 4-byte sequences, truncation at end of buffer, bare
  * continuation bytes, and the decoded-length arithmetic per charset.
  */
class CharsetDetectSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("pure ASCII") {
    val d = CharsetDetect.detect("hello world".getBytes("US-ASCII"))
    assert(d === CharsetDetect.Detection("ascii", 0, 11))
  }

  test("valid 2-, 3- and 4-byte UTF-8 sequences count one char each") {
    // 'é' (C3 A9), '€' (E2 82 AC), U+1F600 (F0 9F 98 80) after "a"
    val bytes = "a".getBytes("US-ASCII") ++
      b(0xc3, 0xa9) ++ b(0xe2, 0x82, 0xac) ++ b(0xf0, 0x9f, 0x98, 0x80)
    val d = CharsetDetect.detect(bytes)
    assert(d.charset === "utf-8")
    assert(d.nNonAscii === 9)
    assert(d.decodedLen === 4)
    // the JDK agrees on the character count (code points → our chars)
    assert(new String(bytes, "UTF-8").codePointCount(0, new String(bytes, "UTF-8").length) === 4)
  }

  test("bare high bytes, broken continuations and truncated sequences fall back to latin-1") {
    // Latin-1 'é' alone
    assert(CharsetDetect.detect("ab".getBytes("US-ASCII") ++ b(0xe9)) ===
      CharsetDetect.Detection("latin-1", 1, 3))
    // lead byte followed by ASCII (broken continuation)
    assert(CharsetDetect.detect(b(0xc3, 0x41)).charset === "latin-1")
    // sequence truncated at end of buffer
    assert(CharsetDetect.detect(b(0x41, 0xe2, 0x82)).charset === "latin-1")
    // bare continuation byte in lead position
    assert(CharsetDetect.detect(b(0x80, 0x41)).charset === "latin-1")
    // latin-1 decoded length = byte count; every high byte counted once
    assert(CharsetDetect.detect(b(0x41, 0xe9, 0xe9, 0x42)) ===
      CharsetDetect.Detection("latin-1", 2, 4))
  }

  test("strict classes: overlong, CESU-8 surrogate and >U+10FFFF reject like every strict decoder") {
    // overlong NUL (E0 80 80) and overlong 4-byte (F0 80 80 80)
    assert(CharsetDetect.detect(b(0x41, 0xe0, 0x80, 0x80)).charset === "latin-1")
    assert(CharsetDetect.detect(b(0x41, 0xf0, 0x80, 0x80, 0x80)).charset === "latin-1")
    // CESU-8 surrogate half U+D800 (ED A0 80)
    assert(CharsetDetect.detect(b(0x41, 0xed, 0xa0, 0x80)).charset === "latin-1")
    // F4 90 80 80 encodes U+110000 — past the Unicode ceiling
    assert(CharsetDetect.detect(b(0x41, 0xf4, 0x90, 0x80, 0x80)).charset === "latin-1")
    // the tight edges of the same lead bytes remain VALID utf-8
    assert(CharsetDetect.detect(b(0xe0, 0xa0, 0x80)).charset === "utf-8") // U+0800
    assert(CharsetDetect.detect(b(0xed, 0x9f, 0xbf)).charset === "utf-8") // U+D7FF
    assert(CharsetDetect.detect(b(0xf0, 0x90, 0x80, 0x80)).charset === "utf-8") // U+10000
    assert(CharsetDetect.detect(b(0xf4, 0x8f, 0xbf, 0xbf)).charset === "utf-8") // U+10FFFF
    // cross-check every class against the JDK's strict REPORT decoder
    for (bs <- Seq(b(0x41, 0xe0, 0x80, 0x80), b(0x41, 0xed, 0xa0, 0x80),
        b(0x41, 0xf4, 0x90, 0x80, 0x80), b(0xe0, 0xa0, 0x80), b(0xed, 0x9f, 0xbf),
        b(0xf0, 0x90, 0x80, 0x80), b(0xf4, 0x8f, 0xbf, 0xbf))) {
      val strict = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val jdkAccepts =
        try { strict.decode(java.nio.ByteBuffer.wrap(bs)); true }
        catch { case _: java.nio.charset.CharacterCodingException => false }
      assert(jdkAccepts === (CharsetDetect.detect(bs).charset === "utf-8"),
        s"JDK strict decoder disagrees on ${bs.map(x => f"${x & 0xff}%02X").mkString(" ")}")
    }
  }

  private def a(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  test("sniff: BOM wins, and each BOM form decodes") {
    import CharsetDetect.sniff
    val utf8bom = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    // UTF-8 BOM beats a contradicting HTTP header
    val s1 = sniff(utf8bom ++ "abcé".getBytes("UTF-8"), "text/html; charset=ISO-8859-1")
    assert((s1.charset, s1.source, s1.nNonAscii, s1.decodedLen) === (("utf-8", "bom", 2, 4)))
    val s2 = sniff(Array(0xff.toByte, 0xfe.toByte) ++ "hi".getBytes("UTF-16LE"), "")
    assert((s2.charset, s2.source, s2.decodedLen) === (("utf-16le", "bom", 2)))
    val s3 = sniff(Array(0xfe.toByte, 0xff.toByte) ++ "hi".getBytes("UTF-16BE"), "")
    assert((s3.charset, s3.source, s3.decodedLen) === (("utf-16be", "bom", 2)))
    // odd-length body after a UTF-16 BOM cannot be UTF-16 → falls through
    val s4 = sniff(Array(0xff.toByte, 0xfe.toByte, 0x41.toByte), "")
    assert(s4.source === "structural")
    // a UTF-8 BOM over invalid UTF-8 falls through to structural
    val s5 = sniff(utf8bom ++ Array(0xe9.toByte), "")
    assert((s5.charset, s5.source) === (("latin-1", "structural")))
  }

  test("sniff: HTTP charset= honored when true, falls through when it lies") {
    import CharsetDetect.sniff
    val good = sniff("café".getBytes("UTF-8"), "text/html; charset=utf-8")
    assert((good.charset, good.source, good.decodedLen) === (("utf-8", "http", 4)))
    // header says utf-8, bytes are bare Latin-1 → structural latin-1
    val lie = sniff(a("caf") :+ 0xe9.toByte, "text/html; charset=utf-8")
    assert((lie.charset, lie.source) === (("latin-1", "structural")))
    // WHATWG label table: iso-8859-1 / us-ascii / latin1 → windows-1252
    for (label <- Seq("ISO-8859-1", "us-ascii", "latin1", "\"windows-1252\"")) {
      val w = sniff(a("x") :+ 0xe9.toByte, s"text/plain; charset=$label")
      assert((w.charset, w.source, w.decodedLen) === (("windows-1252", "http", 2)), label)
    }
    // unknown label → ignored
    assert(sniff(a("x"), "text/plain; charset=klingon").source === "structural")
    // charsetParam: quotes, extra params, absence
    assert(CharsetDetect.charsetParam("text/html; charset=\"UTF-8\"; q=1") === "UTF-8")
    assert(CharsetDetect.charsetParam("text/html") === "")
  }

  test("sniff: meta prescan, precedence below http, UTF-16 meta quirk") {
    import CharsetDetect.sniff
    val meta1252 = a("<meta charset='windows-1252'><p>caf") :+ 0xe9.toByte
    val m1 = sniff(meta1252, "text/html")
    assert((m1.charset, m1.source) === (("windows-1252", "meta")))
    // http header (when valid) beats meta
    val m2 = sniff(a("<meta charset='windows-1252'><p>cafe"), "text/html; charset=utf-8")
    assert((m2.charset, m2.source) === (("utf-8", "http")))
    // http-equiv content form
    val m3 = sniff(a("<meta http-equiv=\"Content-Type\" content=\"text/html; charset=ISO-8859-1\">x"), "")
    assert((m3.charset, m3.source) === (("windows-1252", "meta")))
    // §13.2.3.3: meta-declared UTF-16 is read as UTF-8
    val m4 = sniff(a("<meta charset=utf-16>plain"), "")
    assert((m4.charset, m4.source) === (("utf-8", "meta")))
    // prescan stops at 1024 bytes: a declaration past it is not seen
    val far = a("<p>" + "x" * 1100 + "</p><meta charset=windows-1252>")
    assert(sniff(far, "").source === "structural")
    // charset token outside a meta tag does not count
    assert(sniff(a("<p>the word charset=utf-16 in prose</p>"), "").source === "structural")
    // metaCharset: unquoted value, single quotes, double quotes
    assert(CharsetDetect.metaCharset(a("<meta charset=utf-8>")) === "utf-8")
    assert(CharsetDetect.metaCharset(a("<META CHARSET='Utf-8'>")) === "utf-8")
    assert(CharsetDetect.metaCharset(a("<p>no decl</p>")) === "")
  }
}
