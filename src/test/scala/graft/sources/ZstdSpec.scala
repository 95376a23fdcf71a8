package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** ZstdCodec framing contract: full frame-sequence walk (compressed +
  * skippable frames), strict rejection of truncation/garbage/size lies,
  * and the `.warc.zst` sniff in parseRecords.
  */
class ZstdSpec extends AnyFunSuite {

  private val codec = new ZstdCodec
  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("single-frame round trip; context reuse across payloads") {
    (0 until 50).foreach { i =>
      val payload = b(s"payload $i " + "y" * (i * 7))
      assert(codec.unzstd(codec.zstd(payload)).get.toSeq === payload.toSeq)
    }
  }

  test("frame sequence: concatenated frames and skippable frames all walked") {
    val parts = Seq(b("alpha "), b("beta "), b("gamma"))
    val out = new java.io.ByteArrayOutputStream()
    out.write(codec.skippableFrame(b("leading metadata")))
    parts.zipWithIndex.foreach { case (p, i) =>
      out.write(codec.zstd(p))
      if (i == 0) out.write(codec.skippableFrame(b("mid")))
    }
    assert(codec.unzstd(out.toByteArray).get.toSeq === b("alpha beta gamma").toSeq)
  }

  test("strict rejection: truncation, garbage, skippable past EOF are None, never a throw") {
    val good = codec.zstd(b("hello zstd world, a payload long enough to matter"))
    assert(codec.unzstd(Array[Byte]()) === None)
    assert(codec.unzstd(b("plainly not zstd")) === None)
    // truncation at every split point must never throw
    (1 until good.length).foreach { k =>
      assert(codec.unzstd(java.util.Arrays.copyOf(good, k)) === None)
    }
    // trailing garbage after a valid frame
    assert(codec.unzstd(good ++ Array[Byte](1, 2, 3)) === None)
    // a skippable frame whose declared size runs past EOF
    val skp = codec.skippableFrame(b("abcdefgh"))
    assert(codec.unzstd(java.util.Arrays.copyOf(skp, skp.length - 3)) === None)
    // flipped bytes must never throw (they may reject or survive in data)
    (0 until good.length).foreach { k =>
      val bad = good.clone(); bad(k) = (bad(k) ^ 0x35).toByte
      codec.unzstd(bad)
    }
  }

  test("parseRecords sniffs zstd (incl. a leading skippable frame) and walks all records") {
    val recs = (0 until 3).map(i => Warc.Record("response", s"<urn:uuid:$i>",
      s"http://example.com/$i", b(s"content $i")))
    val out = new java.io.ByteArrayOutputStream()
    out.write(codec.skippableFrame(b("segment header")))
    recs.foreach(r => out.write(codec.zstd(Warc.writeRecords(Seq(r)))))
    val Some(back) = Warc.parseRecords(out.toByteArray, None, Some(codec))
    assert(back.map(_.targetUri) === recs.map(_.targetUri))
    assert(back.map(_.content.toSeq) === recs.map(_.content.toSeq))
    // uncompressed and gzip paths are unaffected
    val plain = Warc.writeRecords(recs)
    assert(Warc.parseRecords(plain).get.length === 3)
    assert(Warc.parseRecords(Warc.gzip(plain)).get.length === 3)
  }
}
