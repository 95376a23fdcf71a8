package graft.sources

/** WARC/1.0 web-archive records (ISO 28500) — the CommonCrawl ingestion
  * primitive: a crawl delivery is a stream of records, each a version
  * line, CRLF-terminated named headers, a blank line, exactly
  * `Content-Length` bytes of content, and a CRLF CRLF record separator;
  * the whole stream is usually gzip transport-compressed. This is the
  * pure-JVM read/write pair the `x_warc_ingest` query drives: the writer
  * emits standards-shaped records (so any WARC reader opens them) and the
  * reader walks them back out byte-exactly — header grammar, declared
  * content lengths and the gzip layer all honored, malformed input
  * rejected with `None` rather than a throw.
  *
  * Reference behavior surveyed from the public WARC spec only; the
  * reference repo has no web-archive path — this extends the ingest
  * family (s9 binary ingest, k4/k5 text roundtrips) to the format crawl
  * corpora actually arrive in.
  */
object Warc {

  /** `refersTo`/`payloadDigest` carry `WARC-Refers-To` /
    * `WARC-Payload-Digest` — the headers a `WARC-Type: revisit` record
    * stands on (ISO 28500 §6.7: a crawler that re-fetches content whose
    * digest it has already stored writes a bodiless revisit record
    * pointing at the original instead of storing the bytes again).
    * `truncated` carries `WARC-Truncated` (ISO 28500 §5.13: a crawler
    * that cut a capture short — `length`, `time`, `disconnect`,
    * `unspecified` — MUST flag it; a consumer that extracts a truncated
    * payload as if complete corrupts its corpus). `warcType` is the
    * full ISO 28500 §6 vocabulary — `response`, `request`, `metadata`,
    * `revisit`, `conversion`, `warcinfo`, `resource`, `continuation` —
    * the writer and parser are type-agnostic. Empty string = header
    * absent.
    *
    * Record segmentation (ISO 28500 §5.18–§5.20, how oversized captures
    * actually ship — a payload too big for one file splits across
    * records, possibly across FILES): `segment` carries
    * `WARC-Segment-Number` (1-based; 0 = unsegmented), the first
    * segment keeps the logical record's type and id, later segments are
    * `WARC-Type: continuation` records whose `segmentOriginId` names
    * the first segment's record id, and the LAST segment declares
    * `segmentTotalLength` (−1 = absent) — the reassembled byte count
    * the reader must verify.
    */
  final case class Record(warcType: String, recordId: String,
      targetUri: String, content: Array[Byte],
      refersTo: String = "", payloadDigest: String = "",
      truncated: String = "", segment: Long = 0L,
      segmentOriginId: String = "", segmentTotalLength: Long = -1L)

  private val Crlf = "\r\n"

  /** Serialize records into one uncompressed WARC stream: per record a
    * `WARC/1.0` version line, the named headers, `Content-Length` =
    * content BYTES (the spec's uncompressed length), blank line, content,
    * CRLF CRLF separator.
    */
  def writeRecords(records: Seq[Record]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val header = new StringBuilder()
        .append("WARC/1.0").append(Crlf)
        .append("WARC-Type: ").append(r.warcType).append(Crlf)
        .append("WARC-Record-ID: ").append(r.recordId).append(Crlf)
        .append("WARC-Target-URI: ").append(r.targetUri).append(Crlf)
      if (r.refersTo.nonEmpty)
        header.append("WARC-Refers-To: ").append(r.refersTo).append(Crlf)
      if (r.payloadDigest.nonEmpty)
        header.append("WARC-Payload-Digest: ").append(r.payloadDigest).append(Crlf)
      if (r.truncated.nonEmpty)
        header.append("WARC-Truncated: ").append(r.truncated).append(Crlf)
      if (r.segment > 0)
        header.append("WARC-Segment-Number: ").append(r.segment).append(Crlf)
      if (r.segmentOriginId.nonEmpty)
        header.append("WARC-Segment-Origin-ID: ").append(r.segmentOriginId).append(Crlf)
      if (r.segmentTotalLength >= 0)
        header.append("WARC-Segment-Total-Length: ").append(r.segmentTotalLength).append(Crlf)
      header
        .append("Content-Length: ").append(r.content.length).append(Crlf)
        .append(Crlf)
      out.write(header.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      out.write(r.content)
      out.write((Crlf + Crlf).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }
    out.toByteArray
  }

  /** Gzip transport compression (one member over the whole stream — the
    * layout `GZIPInputStream` and every WARC tool read back).
    */
  def gzip(bytes: Array[Byte]): Array[Byte] = new GzipCodec().gzip(bytes)

  /** Member-per-record transport layout — the CommonCrawl convention:
    * each record gzip'd as its OWN RFC 1952 member and the members
    * concatenated. (That layout is what makes per-record HTTP range
    * requests into a `.warc.gz` segment work: a reader can start at any
    * member boundary.) Concatenated members are legal gzip (RFC 1952
    * §2.2 "a gzip file consists of a series of members"), so
    * [[GzipCodec.gunzip]] — which walks ALL members — recovers the exact
    * uncompressed record stream and [[parseRecords]] reads it unchanged.
    */
  def gzipPerRecord(records: Seq[Record], codec: GzipCodec): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r => out.write(codec.gzip(writeRecords(Seq(r)))) }
    out.toByteArray
  }

  /** [[gzipPerRecord]] with a one-shot codec (tests/driver use). */
  def gzipPerRecord(records: Seq[Record]): Array[Byte] =
    gzipPerRecord(records, new GzipCodec)

  /** Reusable gzip codec — ONE native Deflater/Inflater pair reset per
    * payload instead of allocated per payload. `GZIPOutputStream`/
    * `GZIPInputStream` allocate (and finalize) native zlib state per
    * instance; at corpus scale that is millions of native allocations on
    * the ingest hot path and measurably drifts full-board timings under
    * heap pressure. Allocate one codec per PARTITION (`mapPartitions`)
    * — it is not thread-safe. Frames are standard RFC 1952 members
    * (magic, CM=8, FLG=0, OS=0; CRC32 + ISIZE trailer) that any gzip
    * reader opens. [[gunzip]] reads the FULL RFC 1952 grammar back:
    * every optional header field (FEXTRA/FNAME/FCOMMENT/FHCRC), BOTH
    * trailer checks per member, and — the property real `.warc.gz`
    * files stand on — a LOOP over concatenated members, so a
    * member-per-record CommonCrawl segment decompresses to the complete
    * record stream. Anything else (trailing garbage after a trailer, a
    * truncated member, a CRC/ISIZE lie) is `None` for the whole stream,
    * never a silent partial result.
    */
  final class GzipCodec {
    import java.util.zip.{Adler32, CRC32, Deflater, Inflater}
    private val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    private val inflater = new Inflater(true)
    private val crc = new CRC32
    private val adler = new Adler32
    private val buf = new Array[Byte](8192)

    def gzip(bytes: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 32)
      out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
      deflater.reset()
      deflater.setInput(bytes)
      deflater.finish()
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        out.write(buf, 0, n)
      }
      crc.reset(); crc.update(bytes)
      def le32(v: Long): Unit = {
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
      }
      le32(crc.getValue)
      le32(bytes.length.toLong & 0xffffffffL)
      out.toByteArray
    }

    def gunzip(bytes: Array[Byte]): Option[Array[Byte]] = {
      if (bytes.length == 0) return None
      def le32(i: Int): Long =
        ((bytes(i) & 0xffL)) | ((bytes(i + 1) & 0xffL) << 8) |
          ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
      // Clamped: `bytes.length * 3` overflows Int past ~715 MiB and a
      // negative BAOS capacity throws outside the DataFormatException
      // catch — violating the never-throw contract.
      val out = new java.io.ByteArrayOutputStream(
        math.max(64L, math.min(bytes.length.toLong * 3, 1L << 30)).toInt)
      var off = 0
      try {
        // RFC 1952 §2.2: a gzip file is a SERIES of members. Walk them
        // all; any byte run that is not a complete, verified member —
        // including garbage after a valid trailer — rejects the stream.
        while (off < bytes.length) {
          if (bytes.length - off < 18 || (bytes(off) & 0xff) != 0x1f
              || (bytes(off + 1) & 0xff) != 0x8b || bytes(off + 2) != 8) return None
          val flg = bytes(off + 3) & 0xff
          if ((flg & 0xe0) != 0) return None // reserved FLG bits must be 0
          var p = off + 10
          if ((flg & 4) != 0) { // FEXTRA: le16 length + that many bytes
            if (p + 2 > bytes.length) return None
            p += 2 + ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8))
          }
          if ((flg & 8) != 0) { // FNAME: zero-terminated
            while (p < bytes.length && bytes(p) != 0) p += 1
            p += 1
          }
          if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
            while (p < bytes.length && bytes(p) != 0) p += 1
            p += 1
          }
          if ((flg & 2) != 0) p += 2 // FHCRC
          if (p >= bytes.length) return None
          inflater.reset()
          inflater.setInput(bytes, p, bytes.length - p)
          crc.reset()
          var memberLen = 0L
          while (!inflater.finished()) {
            val n = inflater.inflate(buf)
            if (n == 0 && (inflater.needsInput() || inflater.needsDictionary()))
              return None // truncated member
            crc.update(buf, 0, n)
            memberLen += n
            out.write(buf, 0, n)
          }
          val trailer = p + inflater.getBytesRead.toInt
          if (trailer + 8 > bytes.length) return None
          if (le32(trailer) != crc.getValue) return None
          if (le32(trailer + 4) != (memberLen & 0xffffffffL)) return None
          off = trailer + 8
        }
        Some(out.toByteArray)
      } catch { case _: java.util.zip.DataFormatException => None }
    }

    /** RFC 1950 zlib stream of `bytes` — what HTTP
      * `Content-Encoding: deflate` means per RFC 9110 §8.4.1.3 (the
      * zlib WRAPPER, not bare deflate): CMF/FLG header (CM=8,
      * CINFO=7, FCHECK making the pair ≡0 mod 31), raw-deflate data,
      * big-endian Adler-32 trailer. Reuses this codec's raw Deflater.
      */
    def zlib(bytes: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 16)
      out.write(0x78); out.write(0x9c) // CM=8 CINFO=7; FLEVEL=2, FCHECK ok (0x789c % 31 == 0)
      deflater.reset()
      deflater.setInput(bytes)
      deflater.finish()
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        out.write(buf, 0, n)
      }
      adler.reset(); adler.update(bytes)
      val a = adler.getValue
      out.write(((a >> 24) & 0xff).toInt); out.write(((a >> 16) & 0xff).toInt)
      out.write(((a >> 8) & 0xff).toInt); out.write((a & 0xff).toInt)
      out.toByteArray
    }

    /** Strict RFC 1950 read-back of [[zlib]]: CM must be 8, FCHECK
      * must verify, FDICT rejected (HTTP deflate never carries a
      * preset dictionary), Adler-32 trailer verified, no trailing
      * garbage. `None` on any violation, never a throw.
      */
    def unzlib(bytes: Array[Byte]): Option[Array[Byte]] = {
      if (bytes.length < 6) return None
      val cmf = bytes(0) & 0xff
      val flg = bytes(1) & 0xff
      if ((cmf & 0x0f) != 8) return None // CM: deflate only
      if ((cmf * 256 + flg) % 31 != 0) return None // FCHECK
      if ((flg & 0x20) != 0) return None // FDICT: not in HTTP deflate
      val out = new java.io.ByteArrayOutputStream(
        math.max(64L, math.min(bytes.length.toLong * 3, 1L << 30)).toInt)
      try {
        inflater.reset()
        inflater.setInput(bytes, 2, bytes.length - 2)
        adler.reset()
        while (!inflater.finished()) {
          val n = inflater.inflate(buf)
          if (n == 0 && (inflater.needsInput() || inflater.needsDictionary()))
            return None // truncated stream
          adler.update(buf, 0, n)
          out.write(buf, 0, n)
        }
        val trailer = 2 + inflater.getBytesRead.toInt
        if (trailer + 4 != bytes.length) return None // short or trailing garbage
        val want = ((bytes(trailer) & 0xffL) << 24) | ((bytes(trailer + 1) & 0xffL) << 16) |
          ((bytes(trailer + 2) & 0xffL) << 8) | (bytes(trailer + 3) & 0xffL)
        if (want != adler.getValue) return None
        Some(out.toByteArray)
      } catch { case _: java.util.zip.DataFormatException => None }
    }
  }

  /** `body` is the DECODED payload — transfer decoding (chunked) and
    * content decoding (gzip/deflate) already applied; the raw encodings
    * seen on the wire are reported in `transferEncoding` /
    * `contentEncoding` (lowercased, "" = absent).
    */
  final case class HttpResponse(status: Int, contentType: String, body: Array[Byte],
      transferEncoding: String = "", contentEncoding: String = "")

  /** Encode `bytes` as an RFC 9112 §7.1 chunked transfer body: each
    * chunk a lowercase-hex size line + CRLF + data + CRLF, closed by
    * the `0` last-chunk, `trailers` (complete `Name: value` lines, no
    * CRLF), and the final CRLF. `chunkSize` bounds each data chunk.
    */
  def chunked(bytes: Array[Byte], chunkSize: Int, trailers: Seq[String] = Nil): Array[Byte] = {
    require(chunkSize > 0, "chunkSize must be positive")
    val out = new java.io.ByteArrayOutputStream(bytes.length + 64)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    var off = 0
    while (off < bytes.length) {
      val n = math.min(chunkSize, bytes.length - off)
      out.write(java.lang.Integer.toHexString(n).getBytes(ascii))
      out.write('\r'); out.write('\n')
      out.write(bytes, off, n)
      out.write('\r'); out.write('\n')
      off += n
    }
    out.write('0'); out.write('\r'); out.write('\n')
    trailers.foreach { t =>
      out.write(t.getBytes(ascii)); out.write('\r'); out.write('\n')
    }
    out.write('\r'); out.write('\n')
    out.toByteArray
  }

  /** Strict RFC 9112 §7.1 chunked-body decode: hex chunk sizes (ASCII
    * hex only; chunk extensions after `;` skipped), exact CRLF framing
    * around every chunk, a `0` last-chunk, trailer lines that must each
    * carry a `:`, the closing CRLF, and NOTHING after it. `None` on any
    * violation — a body whose framing lies cannot be trusted partially.
    */
  def dechunk(bytes: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length))
    var i = 0
    def lineEnd(from: Int): Int = {
      var j = from
      while (j + 1 < bytes.length && !(bytes(j) == '\r' && bytes(j + 1) == '\n')) j += 1
      if (j + 1 < bytes.length) j else -1
    }
    var last = false
    while (!last) {
      val le = lineEnd(i)
      if (le < 0) return None
      val line = new String(bytes, i, le - i, java.nio.charset.StandardCharsets.US_ASCII)
      val semi = line.indexOf(';')
      val hex = (if (semi >= 0) line.substring(0, semi) else line).trim
      if (hex.isEmpty || hex.length > 8 ||
          !hex.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))
        return None
      val n = java.lang.Integer.parseInt(hex, 16)
      i = le + 2
      if (n == 0) last = true
      else {
        if (i + n + 2 > bytes.length) return None
        out.write(bytes, i, n)
        if (!(bytes(i + n) == '\r' && bytes(i + n + 1) == '\n')) return None
        i += n + 2
      }
    }
    // trailer section: zero or more header lines, then the bare CRLF
    var closed = false
    while (!closed) {
      val le = lineEnd(i)
      if (le < 0) return None
      if (le == i) { i += 2; closed = true }
      else {
        val line = new String(bytes, i, le - i, java.nio.charset.StandardCharsets.US_ASCII)
        if (line.indexOf(':') < 0) return None // trailer must be a header line
        i = le + 2
      }
    }
    if (i != bytes.length) return None // garbage after the terminating CRLF
    Some(out.toByteArray)
  }

  /** Parse the HTTP response block a `WARC-Type: response` record
    * carries (the layer between the WARC envelope and the document
    * bytes in a real crawl): `HTTP/1.x SP status SP reason CRLF`,
    * headers until the blank line (names case-insensitive), then the
    * body with the WIRE GRAMMAR honored — `Transfer-Encoding: chunked`
    * de-framed (RFC 9112 §7.1, strict) and `Content-Encoding:
    * gzip`/`x-gzip`/`deflate`/`identity` decoded (RFC 9110 §8.4) in
    * that order, which is what real CommonCrawl response records store
    * (the raw wire bytes). A transfer coding other than chunked, an
    * unknown content coding, or malformed framing in either layer
    * returns None — never a silently mis-framed body, never a throw.
    */
  def parseHttp(content: Array[Byte]): Option[HttpResponse] = parseHttp(content, None)

  /** [[parseHttp]] decompressing `Content-Encoding` through a
    * caller-owned reusable [[GzipCodec]] — the per-partition form.
    */
  def parseHttp(content: Array[Byte], codec: Option[GzipCodec]): Option[HttpResponse] = {
    var split = -1
    var i = 0
    while (split < 0 && i + 3 < content.length) {
      if (content(i) == '\r' && content(i + 1) == '\n'
          && content(i + 2) == '\r' && content(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return None
    val head = new String(content, 0, split, java.nio.charset.StandardCharsets.US_ASCII)
    val lines = head.split("\r\n", -1)
    val statusParts = lines(0).split(" ", 3)
    if (statusParts.length < 2 || !statusParts(0).startsWith("HTTP/1.")) return None
    val status = try statusParts(1).toInt catch { case _: NumberFormatException => return None }
    var contentType = ""
    var transferEnc = ""
    var contentEnc = ""
    var j = 1
    while (j < lines.length) {
      val sep = lines(j).indexOf(':')
      if (sep < 0) return None
      val name = lines(j).substring(0, sep).trim
      val value = lines(j).substring(sep + 1).trim
      if (name.equalsIgnoreCase("content-type")) contentType = value
      else if (name.equalsIgnoreCase("transfer-encoding"))
        transferEnc = value.toLowerCase(java.util.Locale.ROOT)
      else if (name.equalsIgnoreCase("content-encoding"))
        contentEnc = value.toLowerCase(java.util.Locale.ROOT)
      j += 1
    }
    val raw = java.util.Arrays.copyOfRange(content, split + 4, content.length)
    // Transfer decoding first (RFC 9112 §6.1: chunked is the message
    // framing), then content decoding (the representation coding).
    val deframed = transferEnc match {
      case "" | "identity" => raw
      case "chunked" => dechunk(raw).getOrElse(return None)
      case _ => return None // gzip-then-chunked etc.: not emitted by real servers; reject
    }
    val body = contentEnc match {
      case "" | "identity" => deframed
      case "gzip" | "x-gzip" =>
        codec.getOrElse(new GzipCodec).gunzip(deframed).getOrElse(return None)
      case "deflate" =>
        codec.getOrElse(new GzipCodec).unzlib(deframed).getOrElse(return None)
      case _ => return None // br/zstd/unknown: cannot decode, must not mislabel
    }
    Some(HttpResponse(status, contentType, body, transferEnc, contentEnc))
  }

  /** Parse a (possibly gzip-compressed — sniffed by the 1f 8b magic) WARC
    * stream into its records. Every record must open with `WARC/1.0`,
    * carry a parseable `Content-Length` (bytes of content), and close
    * with CRLF CRLF after exactly that many content bytes; header names
    * match case-insensitively per the spec. Any violation — bad version
    * line, missing/garbled length, truncated content, absent separator —
    * returns `None` for the WHOLE stream: a crawl file that lies about
    * its lengths cannot be trusted record-by-record.
    */
  def parseRecords(payload: Array[Byte]): Option[Seq[Record]] =
    parseRecords(payload, None, None)

  /** [[parseRecords]] decompressing through a caller-owned reusable
    * [[GzipCodec]] — the per-partition form the corpus-scale queries use
    * (zero per-row native allocation).
    */
  def parseRecords(payload: Array[Byte], codec: Option[GzipCodec]): Option[Seq[Record]] =
    parseRecords(payload, codec, None)

  /** True when `payload` opens with a zstd magic — a compressed frame
    * (`28 B5 2F FD`) or a skippable frame (`5? 2A 4D 18`).
    */
  private def isZstd(payload: Array[Byte]): Boolean =
    payload.length >= 4 && {
      val m = ((payload(0) & 0xffL)) | ((payload(1) & 0xffL) << 8) |
        ((payload(2) & 0xffL) << 16) | ((payload(3) & 0xffL) << 24)
      m == 0xFD2FB528L || (m & 0xFFFFFFF0L) == 0x184D2A50L
    }

  /** [[parseRecords]] with BOTH transport codecs caller-owned — gzip
    * and zstd (`.warc.gz` / `.warc.zst`) sniffed by magic.
    */
  def parseRecords(payload: Array[Byte], codec: Option[GzipCodec],
      zstdCodec: Option[ZstdCodec]): Option[Seq[Record]] = {
    val bytes =
      if (payload.length >= 2 && (payload(0) & 0xff) == 0x1f && (payload(1) & 0xff) == 0x8b)
        codec.getOrElse(new GzipCodec).gunzip(payload).getOrElse(return None)
      else if (isZstd(payload))
        zstdCodec match {
          case Some(z) => z.unzstd(payload).getOrElse(return None)
          case None => // one-shot fallback: close the native contexts after use
            val z = new ZstdCodec
            try z.unzstd(payload).getOrElse(return None) finally z.close()
        }
      else payload
    val out = scala.collection.mutable.ArrayBuffer[Record]()
    var i = 0
    def lineEnd(from: Int): Int = {
      var j = from
      while (j + 1 < bytes.length && !(bytes(j) == '\r' && bytes(j + 1) == '\n')) j += 1
      if (j + 1 < bytes.length) j else -1
    }
    while (i < bytes.length) {
      val ve = lineEnd(i)
      if (ve < 0) return None
      val version = new String(bytes, i, ve - i, java.nio.charset.StandardCharsets.US_ASCII)
      if (version != "WARC/1.0") return None
      i = ve + 2
      var warcType = ""; var recordId = ""; var targetUri = ""
      var refersTo = ""; var payloadDigest = ""; var truncated = ""
      var segment = 0L; var segmentOriginId = ""; var segmentTotalLength = -1L
      var contentLength = -1L
      var blank = false
      while (!blank) {
        val he = lineEnd(i)
        if (he < 0) return None
        if (he == i) { blank = true; i += 2 }
        else {
          val line = new String(bytes, i, he - i, java.nio.charset.StandardCharsets.US_ASCII)
          val sep = line.indexOf(':')
          if (sep < 0) return None
          val name = line.substring(0, sep).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(sep + 1).trim
          name match {
            case "warc-type" => warcType = value
            case "warc-record-id" => recordId = value
            case "warc-target-uri" => targetUri = value
            case "warc-refers-to" => refersTo = value
            case "warc-payload-digest" => payloadDigest = value
            case "warc-truncated" => truncated = value
            case "warc-segment-number" =>
              segment = try value.toLong catch { case _: NumberFormatException => return None }
              if (segment <= 0) return None // 1-based per §5.18
            case "warc-segment-origin-id" => segmentOriginId = value
            case "warc-segment-total-length" =>
              segmentTotalLength =
                try value.toLong catch { case _: NumberFormatException => return None }
              if (segmentTotalLength < 0) return None
            case "content-length" =>
              contentLength = try value.toLong catch { case _: NumberFormatException => return None }
            case _ => () // unknown headers are legal; skip
          }
          i = he + 2
        }
      }
      if (contentLength < 0 || i + contentLength + 4 > bytes.length) return None
      val content = java.util.Arrays.copyOfRange(bytes, i, i + contentLength.toInt)
      i += contentLength.toInt
      if (!(bytes(i) == '\r' && bytes(i + 1) == '\n' && bytes(i + 2) == '\r' && bytes(i + 3) == '\n'))
        return None
      i += 4
      out += Record(warcType, recordId, targetUri, content, refersTo, payloadDigest,
        truncated, segment, segmentOriginId, segmentTotalLength)
    }
    Some(out.toSeq)
  }

  /** Split `r` into WARC segments of at most `maxBytes` content each
    * (ISO 28500 §5.18–§5.20): the first segment keeps the record's type
    * and id with `WARC-Segment-Number: 1`, every later one is a
    * `continuation` record (id suffixed `;seg=n`) carrying
    * `WARC-Segment-Origin-ID`, and the last declares
    * `WARC-Segment-Total-Length`. A record that already fits returns
    * unchanged and UNSEGMENTED — the spec forbids one-segment chains.
    */
  def segmentRecord(r: Record, maxBytes: Int): Seq[Record] = {
    require(maxBytes > 0, "segment size must be positive")
    if (r.content.length <= maxBytes) return Seq(r)
    val n = (r.content.length + maxBytes - 1) / maxBytes
    (0 until n).map { k =>
      val piece = java.util.Arrays.copyOfRange(
        r.content, k * maxBytes, math.min((k + 1) * maxBytes, r.content.length))
      if (k == 0) r.copy(content = piece, segment = 1L)
      else Record(
        warcType = "continuation",
        recordId = s"${r.recordId};seg=${k + 1}",
        targetUri = r.targetUri,
        content = piece,
        segment = k + 1L,
        segmentOriginId = r.recordId,
        segmentTotalLength = if (k == n - 1) r.content.length.toLong else -1L)
    }
  }

  /** Reassemble segmented records in a parsed stream back into logical
    * records (file order of their first segments), leaving unsegmented
    * records untouched. Strict per the house contract — `None`, never a
    * guess, when the segment grammar lies: a continuation without its
    * origin (or preceding it), a gap or duplicate in a chain's segment
    * numbers, a chain whose last continuation omits
    * `WARC-Segment-Total-Length` (§5.20 requires it) or declares a
    * length that disagrees with the concatenated bytes, a non-final
    * segment declaring a total length, an origin record whose
    * `WARC-Segment-Number` is not 1, or a chain left dangling without
    * its terminal segment. Reassembly is per-stream; at corpus scale
    * callers group a chain's records together first (continuations name
    * their origin id, so a groupBy on `segmentOriginId`-or-`recordId`
    * co-locates each chain with ONE shuffle).
    */
  def reassemble(records: Seq[Record]): Option[Seq[Record]] = {
    val out = scala.collection.mutable.ArrayBuffer[Record]()
    // open chains by origin id: (index in out, next expected segment, buffer)
    val open = scala.collection.mutable.LinkedHashMap[String,
      (Int, Long, java.io.ByteArrayOutputStream)]()
    records.foreach { r =>
      if (r.warcType == "continuation") {
        if (r.segmentOriginId.isEmpty || r.segment < 2) return None
        val (idx, expected, buf) = open.getOrElse(r.segmentOriginId, return None)
        if (r.segment != expected) return None // gap or duplicate
        buf.write(r.content)
        if (r.segmentTotalLength >= 0) { // terminal segment: seal the chain
          val whole = buf.toByteArray
          if (whole.length.toLong != r.segmentTotalLength) return None
          out(idx) = out(idx).copy(content = whole,
            segment = 0L, segmentOriginId = "", segmentTotalLength = -1L)
          open.remove(r.segmentOriginId)
        } else open(r.segmentOriginId) = (idx, expected + 1, buf)
      } else if (r.segment > 0) {
        if (r.segment != 1L || r.segmentTotalLength >= 0) return None
        if (open.contains(r.recordId)) return None // duplicate origin
        val buf = new java.io.ByteArrayOutputStream()
        buf.write(r.content)
        out += r
        open(r.recordId) = (out.length - 1, 2L, buf)
      } else out += r
    }
    if (open.nonEmpty) return None // dangling chain: terminal segment missing
    Some(out.toSeq)
  }
}
