package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins the WARC/1.0 record grammar: multi-record walk, gzip transport
  * sniffing, case-insensitive headers, Content-Length honored
  * byte-exactly, and rejection (None, never a throw) of every malformed
  * form — lying lengths, bad version lines, missing separators,
  * corrupt gzip.
  */
class WarcSpec extends AnyFunSuite {

  private def rec(i: Int): Warc.Record = Warc.Record(
    if (i % 2 == 0) "response" else "metadata",
    s"<urn:uuid:$i>", s"http://example.com/$i",
    (s"payload $i with some bytes " + "x" * i).getBytes("UTF-8"))

  test("writeRecords → parseRecords roundtrips a multi-record stream byte-exactly") {
    val in = (0 until 5).map(rec)
    val Some(out) = Warc.parseRecords(Warc.writeRecords(in))
    assert(out.length === 5)
    for ((a, b) <- in.zip(out)) {
      assert(a.warcType === b.warcType)
      assert(a.recordId === b.recordId)
      assert(a.targetUri === b.targetUri)
      assert(a.content.toSeq === b.content.toSeq)
    }
  }

  test("revisit records: WARC-Refers-To and WARC-Payload-Digest round-trip; absent = empty") {
    val revisit = Warc.Record("revisit", "<urn:uuid:r1>", "http://example.com/again",
      Array.emptyByteArray, refersTo = "<urn:uuid:orig-7>",
      payloadDigest = "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    val Some(out) = Warc.parseRecords(Warc.writeRecords(Seq(revisit, rec(0))))
    assert(out.head.warcType === "revisit")
    assert(out.head.refersTo === "<urn:uuid:orig-7>")
    assert(out.head.payloadDigest === "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    assert(out.head.content.isEmpty)
    // a plain record writes NEITHER header and parses both back empty
    val plain = new String(Warc.writeRecords(Seq(rec(0))),
      java.nio.charset.StandardCharsets.US_ASCII)
    assert(!plain.contains("WARC-Refers-To") && !plain.contains("WARC-Payload-Digest"))
    assert(out(1).refersTo === "" && out(1).payloadDigest === "")
  }

  test("gzip transport is sniffed by magic and decompressed before the walk") {
    val in = Seq(rec(0), rec(1))
    val plain = Warc.writeRecords(in)
    val Some(out) = Warc.parseRecords(Warc.gzip(plain))
    assert(out.map(_.content.toSeq) === in.map(_.content.toSeq))
    // an independent JDK reader opens our gzip member
    val back = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(Warc.gzip(plain))).readAllBytes()
    assert(back.toSeq === plain.toSeq)
  }

  test("GzipCodec reuses one native pair across payloads; JDK readers open its frames") {
    val codec = new Warc.GzipCodec
    for (i <- 0 until 20) {
      val payload = (s"payload $i " + "y" * (i * 7)).getBytes("UTF-8")
      val gz = codec.gzip(payload)
      // our own reusable inflater reads it back
      assert(codec.gunzip(gz).map(_.toSeq) === Some(payload.toSeq))
      // and the independent JDK stream reader agrees byte-for-byte
      val jdk = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz)).readAllBytes()
      assert(jdk.toSeq === payload.toSeq)
    }
    // a JDK-written member (same FLG=0 layout) decodes through the codec
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos); g.write("jdk side".getBytes("UTF-8")); g.close()
    assert(codec.gunzip(bos.toByteArray).map(new String(_, "UTF-8")) === Some("jdk side"))
    // corrupt trailer CRC → None
    val bad = codec.gzip("x".getBytes("UTF-8"))
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x7f).toByte
    assert(codec.gunzip(bad) === None)
    // truncation never throws
    val whole = codec.gzip("some longer payload for truncation".getBytes("UTF-8"))
    for (n <- 0 until whole.length by 3) codec.gunzip(whole.take(n))
  }

  test("unknown headers are skipped; header names match case-insensitively") {
    val raw = ("WARC/1.0\r\n" +
      "warc-type: response\r\n" +
      "WARC-Date: 2026-08-16T00:00:00Z\r\n" + // unknown to the parser
      "CONTENT-LENGTH: 3\r\n" +
      "Warc-Target-Uri: http://x/\r\n" +
      "\r\nabc\r\n\r\n").getBytes("US-ASCII")
    val Some(Seq(r)) = Warc.parseRecords(raw)
    assert(r.warcType === "response")
    assert(r.targetUri === "http://x/")
    assert(r.content.toSeq === "abc".getBytes("US-ASCII").toSeq)
  }

  test("parseHttp splits status line, case-insensitive headers and body at the first blank line") {
    val body = "doc body with \r\n\r\n inside".getBytes("UTF-8")
    val content = ("HTTP/1.1 301 Moved Permanently\r\n" +
      "content-TYPE: text/html; charset=UTF-8\r\n" +
      "X-Extra: v\r\n\r\n").getBytes("US-ASCII") ++ body
    val Some(h) = Warc.parseHttp(content)
    assert(h.status === 301)
    assert(h.contentType === "text/html; charset=UTF-8")
    // the body's own blank line must NOT re-split: bytes are exact
    assert(h.body.toSeq === body.toSeq)
    // not HTTP / bad status / headerless garbage → None, never a throw
    assert(Warc.parseHttp("GOPHER/1.0 200\r\n\r\nx".getBytes("US-ASCII")) === None)
    assert(Warc.parseHttp("HTTP/1.1 abc Reason\r\n\r\nx".getBytes("US-ASCII")) === None)
    assert(Warc.parseHttp("no blank line at all".getBytes("US-ASCII")) === None)
  }

  test("chunked transfer coding: round trip, extensions, trailers; malformed framing → None") {
    val a = java.nio.charset.StandardCharsets.US_ASCII
    val body = ("x" * 100 + "tail").getBytes(a)
    // round trip at several chunk sizes, with and without trailers
    for (cs <- Seq(1, 7, 100, 4096)) {
      assert(Warc.dechunk(Warc.chunked(body, cs)).map(_.toSeq) === Some(body.toSeq))
      assert(Warc.dechunk(Warc.chunked(body, cs, Seq("X-T: 1", "X-U: 2")))
        .map(_.toSeq) === Some(body.toSeq))
    }
    assert(Warc.dechunk(Warc.chunked(Array.emptyByteArray, 8)).map(_.toSeq) === Some(Nil))
    // chunk extensions after ';' are skipped per RFC 9112 §7.1.1
    assert(Warc.dechunk("3;name=val\r\nabc\r\n0\r\n\r\n".getBytes(a)).map(_.toSeq)
      === Some("abc".getBytes(a).toSeq))
    // malformed: non-hex size, missing CRLF after data, size lying long,
    // no last-chunk, garbage after the final CRLF, trailer without ':',
    // unicode-digit size char
    assert(Warc.dechunk("zz\r\nabc\r\n0\r\n\r\n".getBytes(a)) === None)
    assert(Warc.dechunk("3\r\nabcXX0\r\n\r\n".getBytes(a)) === None)
    assert(Warc.dechunk("ff\r\nabc\r\n0\r\n\r\n".getBytes(a)) === None)
    assert(Warc.dechunk("3\r\nabc\r\n".getBytes(a)) === None)
    assert(Warc.dechunk("3\r\nabc\r\n0\r\n\r\nx".getBytes(a)) === None)
    assert(Warc.dechunk("3\r\nabc\r\n0\r\nbad trailer\r\n\r\n".getBytes(a)) === None)
    assert(Warc.dechunk("٠\r\nabc\r\n0\r\n\r\n".getBytes("UTF-8")) === None)
  }

  test("zlib (RFC 1950): round trip; header/FDICT/Adler/trailing-garbage violations → None") {
    val codec = new Warc.GzipCodec
    val body = "deflate me please, deflate me twice".getBytes("UTF-8")
    val z = codec.zlib(body)
    assert(codec.unzlib(z).map(_.toSeq) === Some(body.toSeq))
    assert(codec.unzlib(Array.emptyByteArray) === None)
    assert(codec.unzlib(z.dropRight(1)) === None) // truncated trailer
    assert(codec.unzlib(z :+ 0.toByte) === None) // trailing garbage
    val badAdler = z.clone(); badAdler(badAdler.length - 1) = (badAdler.last ^ 1).toByte
    assert(codec.unzlib(badAdler) === None)
    val badCm = z.clone(); badCm(0) = 0x79.toByte // CM != 8 (and FCHECK breaks)
    assert(codec.unzlib(badCm) === None)
    val fdict = z.clone(); fdict(1) = (fdict(1) | 0x20).toByte
    assert(codec.unzlib(fdict) === None) // FDICT set (FCHECK also invalid)
  }

  test("parseHttp decodes the wire: chunked, gzip, deflate, chunked+gzip; unknown codings → None") {
    val a = java.nio.charset.StandardCharsets.US_ASCII
    val codec = new Warc.GzipCodec
    val body = "the decoded document body".getBytes("UTF-8")
    def resp(hdrs: String, wire: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n$hdrs\r\n").getBytes(a) ++ wire
    val Some(h1) = Warc.parseHttp(resp("Transfer-Encoding: chunked\r\n", Warc.chunked(body, 5)))
    assert(h1.body.toSeq === body.toSeq && h1.transferEncoding === "chunked")
    val Some(h2) = Warc.parseHttp(resp("Content-Encoding: gzip\r\n", codec.gzip(body)), Some(codec))
    assert(h2.body.toSeq === body.toSeq && h2.contentEncoding === "gzip")
    val Some(h3) = Warc.parseHttp(resp("Content-Encoding: deflate\r\n", codec.zlib(body)), Some(codec))
    assert(h3.body.toSeq === body.toSeq)
    val Some(h4) = Warc.parseHttp(resp(
      "Transfer-Encoding: CHUNKED\r\nContent-Encoding: gzip\r\n",
      Warc.chunked(codec.gzip(body), 9)), Some(codec))
    assert(h4.body.toSeq === body.toSeq)
    // violations: unknown codings, mis-framed chunk body, gzip lying
    assert(Warc.parseHttp(resp("Transfer-Encoding: gzip, chunked\r\n", body)) === None)
    assert(Warc.parseHttp(resp("Content-Encoding: br\r\n", body)) === None)
    assert(Warc.parseHttp(resp("Transfer-Encoding: chunked\r\n", body)) === None)
    assert(Warc.parseHttp(resp("Content-Encoding: gzip\r\n", body)) === None)
  }

  test("WARC-Truncated and the full record-type vocabulary round-trip") {
    val codec = new Warc.GzipCodec
    val recs = Seq(
      Warc.Record("request", "<urn:uuid:q>", "http://x/",
        "GET / HTTP/1.1\r\n\r\n".getBytes("US-ASCII")),
      Warc.Record("response", "<urn:uuid:r>", "http://x/",
        "half a docu".getBytes("US-ASCII"), truncated = "length"),
      Warc.Record("metadata", "<urn:uuid:m>", "http://x/",
        "fetchTimeMs: 12".getBytes("US-ASCII")),
      Warc.Record("conversion", "<urn:uuid:c>", "http://x/",
        "plain text".getBytes("US-ASCII"), refersTo = "<urn:uuid:r>"))
    val Some(back) = Warc.parseRecords(Warc.gzipPerRecord(recs, codec), Some(codec))
    assert(back.map(_.warcType) === Seq("request", "response", "metadata", "conversion"))
    assert(back(1).truncated === "length")
    assert(back(0).truncated === "" && back(2).truncated === "")
    assert(back(3).refersTo === "<urn:uuid:r>")
  }

  test("member-per-record gzip (the CommonCrawl layout) reads back complete") {
    val in = (0 until 7).map(rec)
    val codec = new Warc.GzipCodec
    val cc = Warc.gzipPerRecord(in, codec)
    // the codec walks ALL members — every record, both codec paths
    for (c <- Seq(Some(codec), None)) {
      val Some(out) = Warc.parseRecords(cc, c)
      assert(out.length === 7)
      assert(out.map(_.content.toSeq) === in.map(_.content.toSeq))
    }
    // the JDK's own concatenated-member reader agrees byte-for-byte
    val jdk = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(cc)).readAllBytes()
    assert(jdk.toSeq === Warc.writeRecords(in).toSeq)
  }

  test("multi-member edges: trailing garbage, truncated/corrupt second member → None") {
    val codec = new Warc.GzipCodec
    val two = Warc.gzipPerRecord(Seq(rec(0), rec(1)), codec)
    assert(Warc.parseRecords(two, Some(codec)).map(_.length) === Some(2))
    // trailing garbage after the last member's trailer: reject, never
    // silently drop (the contract the round-11 single-member reader broke)
    assert(codec.gunzip(two ++ "garbage".getBytes("US-ASCII")) === None)
    assert(Warc.parseRecords(two ++ Array[Byte](0, 1, 2), Some(codec)) === None)
    // cutting EXACTLY at the first member's trailer is a complete
    // one-member stream — that reads as record 0 alone (a reader cannot
    // know about members that were never appended)...
    val m0len = codec.gzip(Warc.writeRecords(Seq(rec(0)))).length
    assert(Warc.parseRecords(two.take(m0len), Some(codec)).map(_.length) === Some(1))
    // ...but a PARTIAL second member → None, never a throw or a partial
    for (n <- (m0len + 1) until two.length by 3)
      assert(Warc.parseRecords(two.take(n), Some(codec)) === None)
    // corrupt second member's trailer CRC → None (not first-member-only)
    val bad = two.clone(); bad(two.length - 5) = (bad(two.length - 5) ^ 0x7f).toByte
    assert(codec.gunzip(bad) === None)
  }

  test("optional RFC 1952 header fields (FNAME/FEXTRA/FHCRC) decode; reserved FLG bits reject") {
    val codec = new Warc.GzipCodec
    val payload = "record bytes behind an annotated header".getBytes("UTF-8")
    val plain = codec.gzip(payload)
    def withHeader(flg: Int, extra: Array[Byte]): Array[Byte] =
      plain.take(3) ++ Array(flg.toByte) ++ plain.slice(4, 10) ++ extra ++ plain.drop(10)
    // FNAME: zero-terminated file name after the fixed header
    val named = withHeader(8, "segment-00001.warc".getBytes("US-ASCII") :+ 0.toByte)
    assert(codec.gunzip(named).map(_.toSeq) === Some(payload.toSeq))
    // FEXTRA: le16 length + payload
    val fx = Array[Byte](4, 0, 'e', 'x', 't', 'r')
    assert(codec.gunzip(withHeader(4, fx)).map(_.toSeq) === Some(payload.toSeq))
    // FHCRC: two header-CRC bytes (value unchecked, correctly skipped)
    assert(codec.gunzip(withHeader(2, Array[Byte](0x12, 0x34))).map(_.toSeq)
      === Some(payload.toSeq))
    // a named member CONCATENATED with a plain member still reads fully
    assert(codec.gunzip(named ++ plain).map(_.toSeq) === Some((payload ++ payload).toSeq))
    // reserved FLG bits (0xE0) must reject per RFC 1952 §2.3.1
    assert(codec.gunzip(withHeader(0x80, Array.empty)) === None)
  }

  test("malformed streams are rejected as None, never a throw") {
    val good = Warc.writeRecords(Seq(rec(0)))
    // bad version line
    val badVer = good.clone(); badVer(5) = '2'
    assert(Warc.parseRecords(badVer) === None)
    // content-length pointing past the buffer (a lying crawl file)
    val s = new String(good, "ISO-8859-1")
    val lied = s.replaceFirst("Content-Length: ", "Content-Length: 9999")
    assert(Warc.parseRecords(lied.getBytes("ISO-8859-1")) === None)
    // missing record separator
    assert(Warc.parseRecords(good.dropRight(2)) === None)
    // truncation never throws
    for (n <- 0 until good.length by 3) Warc.parseRecords(good.take(n))
    // corrupt gzip member: decode failure surfaces as None (CRC/format
    // IOExceptions are caught), or as junk bytes that then fail the
    // version check — either way no throw
    val gz = Warc.gzip(good)
    val badGz = gz.clone(); badGz(gz.length / 2) = (badGz(gz.length / 2) ^ 0x55).toByte
    Warc.parseRecords(badGz)
    // a gzip stream truncated mid-member never throws either
    for (n <- 2 until gz.length by 7) Warc.parseRecords(gz.take(n))
  }

  test("segmentation (ISO 28500 §5.18-§5.20): split, headers, interleaved reassembly") {
    val body = Array.tabulate(257)(i => (i % 251).toByte)
    val r = Warc.Record("response", "<urn:uuid:r1>", "http://x/", body)
    // fits -> unchanged and UNSEGMENTED
    assert(Warc.segmentRecord(r, 257) === Seq(r))
    val segs = Warc.segmentRecord(r, 100)
    assert(segs.length === 3)
    assert(segs.head.warcType === "response" && segs.head.segment === 1L
      && segs.head.segmentTotalLength === -1L)
    assert(segs.tail.forall(s => s.warcType === "continuation"
      && s.segmentOriginId === "<urn:uuid:r1>"))
    assert(segs.map(_.segment) === Seq(1L, 2L, 3L))
    assert(segs.last.segmentTotalLength === 257L)
    assert(segs.map(_.content.length) === Seq(100, 100, 57))
    // round trip through the wire grammar preserves the segment headers
    val other = Warc.Record("metadata", "<urn:uuid:m>", "http://x/", "k: v".getBytes("US-ASCII"))
    val stream = Seq(segs(0), other, segs(1), segs(2)) // interleaving is legal
    val back = Warc.parseRecords(Warc.gzip(Warc.writeRecords(stream))).get
    assert(back.map(_.segment) === Seq(1L, 0L, 2L, 3L))
    assert(back(3).segmentTotalLength === 257L)
    // reassembly: original bytes back, metadata untouched, file order kept
    val out = Warc.reassemble(back).get
    assert(out.map(_.warcType) === Seq("response", "metadata"))
    assert(out.head.content === body)
    assert(out.head.segment === 0L && out.head.segmentTotalLength === -1L)
  }

  test("reassembly rejects every segment-grammar lie as None, never a throw") {
    val body = Array.tabulate(300)(_.toByte)
    val segs = Warc.segmentRecord(Warc.Record("response", "<urn:uuid:o>", "http://x/", body), 90)
    assert(Warc.reassemble(segs).isDefined)
    // continuation before/without its origin
    assert(Warc.reassemble(segs.tail) === None)
    assert(Warc.reassemble(Seq(segs(1), segs(0), segs(2), segs(3))) === None)
    // gap and duplicate in the chain
    assert(Warc.reassemble(Seq(segs(0), segs(2), segs(3))) === None)
    assert(Warc.reassemble(Seq(segs(0), segs(1), segs(1), segs(2), segs(3))) === None)
    // dangling chain: terminal segment missing
    assert(Warc.reassemble(segs.dropRight(1)) === None)
    // total-length lie
    assert(Warc.reassemble(segs.init :+ segs.last.copy(segmentTotalLength = 299L)) === None)
    // non-final segment declaring a total length
    assert(Warc.reassemble(
      segs.updated(1, segs(1).copy(segmentTotalLength = 300L))) === None)
    // origin whose segment number is not 1
    assert(Warc.reassemble(segs.updated(0, segs(0).copy(segment = 2L))) === None)
    // duplicate origin id
    assert(Warc.reassemble(segs(0) +: segs) === None)
    // parse-side strictness: a zero segment number on the wire rejects
    val zeroSeg = Warc.writeRecords(Seq(segs(0))).clone()
    val txt = new String(zeroSeg, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("WARC-Segment-Number: 1", "WARC-Segment-Number: 0")
    assert(Warc.parseRecords(txt.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) === None)
  }
}
