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
}
