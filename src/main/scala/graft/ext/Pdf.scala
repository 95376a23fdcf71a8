package graft.ext

/** PDF text extraction over a bounded, deterministic PDF-1.4 subset —
  * after HTML, the most common document format in a web corpus; the
  * extraction step that turns a crawl's `application/pdf` payloads into
  * `documents`-table text. Same design as the other pure-JVM codecs in
  * this package ([[Jpeg]], [[Multimodal]]'s ISO-BMFF/WAV walkers): a
  * WRITER that emits standards-shaped files any PDF reader opens, and a
  * strict READER that walks the published file grammar back out —
  * malformed bytes are `None` for the whole file, never a throw and
  * never a silent partial result. The pair gives the correctness gate a
  * closed form: the oracle re-derives the embedded text without running
  * any PDF code.
  *
  * Reader scope (the PDF subset a text pass needs, per the public
  * spec ISO 32000-1 / the Adobe PDF 1.4 reference):
  *   - header `%PDF-1.x`, classic cross-reference TABLES (`xref` +
  *     `trailer`, `/Prev` chains walked with a cycle guard), AND the
  *     PDF 1.5 forms every modern producer writes: cross-reference
  *     STREAMS (ISO 32000-1 §7.5.8 — /W field widths, /Index
  *     subsections, FlateDecode, PNG-predictor row filters via
  *     /DecodeParms) and OBJECT streams (§7.5.7 — /N /First header,
  *     type-2 entries resolved through the packed stream), plus the
  *     hybrid-reference `/XRefStm` pointer (§7.5.8.4),
  *   - the object grammar: dictionaries, arrays, names (with `#xx`
  *     escapes), numbers, booleans, null, literal strings (nested
  *     parens, all standard escapes, octal, line continuations), hex
  *     strings, indirect references, `obj … endobj`, `stream …
  *     endstream` with direct OR indirect `/Length`,
  *   - filters: none or `/FlateDecode` (RFC 1950 zlib via the JDK
  *     Inflater — the same discipline as `Warc.GzipCodec`),
  *   - the page tree: `/Root → /Pages → /Kids` recursively (cycle- and
  *     depth-guarded), per-page `/Contents` as one stream or an array,
  *   - text operators between `BT`/`ET`: `Tj`, `'`, `"`, `TJ` (a
  *     kerning adjustment ≤ −180 thousandths of an em renders as a
  *     space — the standard extraction heuristic), with `Td`/`TD`/
  *     `T*`/`Tm` as line breaks; all other operators are skipped with
  *     their operands,
  *   - text bytes decoded as WinAnsiEncoding (CP1252 — the encoding
  *     the writer declares).
  *
  * Writer: one Type1 /Helvetica font, WinAnsi encoding, one
  * Flate-compressed content stream per page, a correct xref table —
  * byte-deterministic for a given page layout, so `writer ∘ reader`
  * is exactly the identity on the embedded line text.
  */
object Pdf {

  // ---------------------------------------------------------------- encoding

  /** CP1252 (WinAnsi) code points for bytes 0x80..0x9F; the rest of the
    * byte range is Latin-1.
    */
  private val Cp1252High: Array[Char] = Array(
    '\u20AC', '\u0081', '\u201A', '\u0192', '\u201E', '\u2026', '\u2020', '\u2021',
    '\u02C6', '\u2030', '\u0160', '\u2039', '\u0152', '\u008D', '\u017D', '\u008F',
    '\u0090', '\u2018', '\u2019', '\u201C', '\u201D', '\u2022', '\u2013', '\u2014',
    '\u02DC', '\u2122', '\u0161', '\u203A', '\u0153', '\u009D', '\u017E', '\u0178')

  private def winAnsiChar(b: Int): Char =
    if (b >= 0x80 && b <= 0x9f) Cp1252High(b - 0x80) else b.toChar

  private def winAnsiByte(c: Char): Int =
    if (c < 0x80) c.toInt
    else if (c >= 0xa0 && c <= 0xff) c.toInt
    else {
      val i = Cp1252High.indexOf(c)
      if (i >= 0) 0x80 + i else '?'.toInt
    }

  // ---------------------------------------------------------------- writer

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** PDF literal-string escape of `line` in WinAnsi bytes: `(`, `)`,
    * `\` backslash-escaped; bytes outside 32..126 as `\ooo` octal.
    */
  private def escapeString(line: String): String = {
    val sb = new StringBuilder
    line.foreach { c =>
      val b = winAnsiByte(c)
      if (b == '(' || b == ')' || b == '\\') { sb.append('\\'); sb.append(b.toChar) }
      else if (b < 32 || b > 126) sb.append(f"\\${b}%03o")
      else sb.append(b.toChar)
    }
    sb.toString
  }

  /** Serialize `pages` (each a list of text lines) as a PDF-1.4 file:
    * catalog, pages tree, one page + one Flate content stream per page,
    * a Helvetica/WinAnsi font, a correct xref table. Deterministic.
    */
  def encodePdf(pages: Seq[Seq[String]]): Array[Byte] = {
    require(pages.nonEmpty, "a PDF has at least one page")
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new java.io.ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ascii))
    // object numbers: 1 catalog, 2 pages, 3 font, then (4+2i) page i, (5+2i) contents i
    val nObjs = 3 + 2 * pages.length
    val offsets = new Array[Long](nObjs + 1)
    def beginObj(num: Int): Unit = { offsets(num) = out.size().toLong; w(s"$num 0 obj\n") }
    w("%PDF-1.4\n")
    // a binary-marker comment line, conventional for files carrying streams
    out.write(Array[Byte]('%', 0xe2.toByte, 0xe3.toByte, 0xcf.toByte, 0xd3.toByte, '\n'))
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = pages.indices.map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    beginObj(2); w(s"<< /Type /Pages /Kids [$kids] /Count ${pages.length} >>\nendobj\n")
    beginObj(3)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>\nendobj\n")
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageNum = 4 + 2 * i
      val contNum = 5 + 2 * i
      beginObj(pageNum)
      w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contNum 0 R >>\nendobj\n")
      val content = new StringBuilder("BT\n/F1 12 Tf\n")
      var firstLine = true
      lines.foreach { line =>
        content.append(if (firstLine) "72 720 Td\n" else "0 -14 Td\n")
        firstLine = false
        content.append('(').append(escapeString(line)).append(") Tj\n")
      }
      content.append("ET\n")
      val flated = deflate(content.toString.getBytes(ascii))
      beginObj(contNum)
      w(s"<< /Length ${flated.length} /Filter /FlateDecode >>\nstream\n")
      out.write(flated)
      w("\nendstream\nendobj\n")
    }
    val xrefOff = out.size().toLong
    w(s"xref\n0 ${nObjs + 1}\n")
    w("0000000000 65535 f \n")
    (1 to nObjs).foreach(n => w(f"${offsets(n)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** Serialize `pages` as a PDF-1.5 file the way MODERN producers do
    * (ISO 32000-1 §7.5.7/§7.5.8): all non-stream objects — catalog,
    * pages root, font, every page dict — packed into ONE object stream
    * (type-2 xref entries), content streams as regular objects, and the
    * cross-reference emitted as an XREF STREAM with /W [1 4 2],
    * FlateDecode and the PNG Up row predictor (/DecodeParms
    * /Predictor 12) — the exact shape current PDF writers emit.
    * Same object numbering and page layout as [[encodePdf]], so the
    * extracted text is identical between the two forms. Deterministic.
    */
  def encodePdfXrefStream(pages: Seq[Seq[String]]): Array[Byte] = {
    require(pages.nonEmpty, "a PDF has at least one page")
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new java.io.ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ascii))
    // 1 catalog, 2 pages, 3 font, (4+2i) page i, (5+2i) contents i — then
    // the two 1.5 containers: objstm, xref stream
    val nObjs = 3 + 2 * pages.length
    val objStmNum = nObjs + 1
    val xrefNum = nObjs + 2
    val offsets = new Array[Long](xrefNum + 1)
    w("%PDF-1.5\n")
    out.write(Array[Byte]('%', 0xe2.toByte, 0xe3.toByte, 0xcf.toByte, 0xd3.toByte, '\n'))
    // content streams: regular (type-1) objects — streams cannot live
    // inside an object stream
    val contents = pages.map { lines =>
      val content = new StringBuilder("BT\n/F1 12 Tf\n")
      var firstLine = true
      lines.foreach { line =>
        content.append(if (firstLine) "72 720 Td\n" else "0 -14 Td\n")
        firstLine = false
        content.append('(').append(escapeString(line)).append(") Tj\n")
      }
      content.append("ET\n")
      deflate(content.toString.getBytes(ascii))
    }
    contents.zipWithIndex.foreach { case (flated, i) =>
      val contNum = 5 + 2 * i
      offsets(contNum) = out.size().toLong
      w(s"$contNum 0 obj\n<< /Length ${flated.length} /Filter /FlateDecode >>\nstream\n")
      out.write(flated)
      w("\nendstream\nendobj\n")
    }
    // the object stream: header of (objnum offset) pairs, then the
    // packed direct objects at /First
    val kids = pages.indices.map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    val packed: Seq[(Int, String)] =
      Seq(
        1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [$kids] /Count ${pages.length} >>",
        3 -> ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          "/Encoding /WinAnsiEncoding >>")) ++
        pages.indices.map { i =>
          (4 + 2 * i) -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${5 + 2 * i} 0 R >>")
        }
    val body = new StringBuilder
    val pairHeader = new StringBuilder
    packed.foreach { case (num, objStr) =>
      pairHeader.append(num).append(' ').append(body.length).append(' ')
      body.append(objStr).append('\n')
    }
    val stmPayload = (pairHeader.toString + body.toString).getBytes(ascii)
    val first = pairHeader.length
    val stmFlated = deflate(stmPayload)
    offsets(objStmNum) = out.size().toLong
    w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${packed.length} /First $first " +
      s"/Length ${stmFlated.length} /Filter /FlateDecode >>\nstream\n")
    out.write(stmFlated)
    w("\nendstream\nendobj\n")
    // xref stream: W [1 4 2]; object 0 free, packed objects type 2,
    // content streams + objstm + the xref stream itself type 1
    offsets(xrefNum) = out.size().toLong
    val size = xrefNum + 1
    val rowLen = 1 + 4 + 2
    val rows = new Array[Byte](size * rowLen)
    def putRow(objNum: Int, tpe: Int, f2: Long, f3: Int): Unit = {
      val rs = objNum * rowLen
      rows(rs) = tpe.toByte
      rows(rs + 1) = ((f2 >> 24) & 0xff).toByte
      rows(rs + 2) = ((f2 >> 16) & 0xff).toByte
      rows(rs + 3) = ((f2 >> 8) & 0xff).toByte
      rows(rs + 4) = (f2 & 0xff).toByte
      rows(rs + 5) = ((f3 >> 8) & 0xff).toByte
      rows(rs + 6) = (f3 & 0xff).toByte
    }
    putRow(0, 0, 0L, 0xffff)
    packed.zipWithIndex.foreach { case ((num, _), idx) => putRow(num, 2, objStmNum.toLong, idx) }
    pages.indices.foreach { i => putRow(5 + 2 * i, 1, offsets(5 + 2 * i), 0) }
    putRow(objStmNum, 1, offsets(objStmNum), 0)
    putRow(xrefNum, 1, offsets(xrefNum), 0)
    // PNG Up predictor (filter type 2): encoded = raw - rowAbove
    val filtered = new Array[Byte](size * (rowLen + 1))
    var r = 0
    while (r < size) {
      filtered(r * (rowLen + 1)) = 2
      var i = 0
      while (i < rowLen) {
        val above = if (r > 0) rows((r - 1) * rowLen + i) & 0xff else 0
        filtered(r * (rowLen + 1) + 1 + i) = (((rows(r * rowLen + i) & 0xff) - above) & 0xff).toByte
        i += 1
      }
      r += 1
    }
    val xrefFlated = deflate(filtered)
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /W [1 4 2] /Index [0 $size] " +
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $rowLen >> " +
      s"/Root 1 0 R /Length ${xrefFlated.length} >>\nstream\n")
    out.write(xrefFlated)
    w("\nendstream\nendobj\n")
    w(s"startxref\n${offsets(xrefNum)}\n%%EOF\n")
    out.toByteArray
  }

  /** [[encodePdfXrefStream]] over running text — the modern-writer twin
    * of [[encodeDocPdf]], same split, same closed-form identity.
    */
  def encodeDocPdfXrefStream(text: String, charsPerLine: Int, linesPerPage: Int): Array[Byte] = {
    require(charsPerLine > 0 && linesPerPage > 0)
    val lines = text.grouped(charsPerLine).toSeq
    val pages = if (lines.isEmpty) Seq(Seq.empty[String]) else lines.grouped(linesPerPage).toSeq
    encodePdfXrefStream(pages)
  }

  /** [[encodePdf]] over running text: `text` split into consecutive
    * `charsPerLine`-char chunks, `linesPerPage` chunks per page (last
    * page ragged; empty text = one empty page). Because the split is at
    * exact char positions, `extractText(...).mkString` with newlines
    * removed recovers `text` verbatim — the closed-form oracle the
    * `x_pdf_extract` query stands on.
    */
  def encodeDocPdf(text: String, charsPerLine: Int, linesPerPage: Int): Array[Byte] = {
    require(charsPerLine > 0 && linesPerPage > 0)
    val lines = text.grouped(charsPerLine).toSeq
    val pages = if (lines.isEmpty) Seq(Seq.empty[String]) else lines.grouped(linesPerPage).toSeq
    encodePdf(pages)
  }

  // ---------------------------------------------------------------- object model

  private sealed trait PVal
  private final case class PNum(v: Double) extends PVal
  private final case class PName(v: String) extends PVal
  private final case class PStr(bytes: Array[Byte]) extends PVal
  private final case class PArr(items: Vector[PVal]) extends PVal
  private final case class PDict(m: Map[String, PVal]) extends PVal
  private final case class PRef(num: Int, gen: Int) extends PVal
  private final case class PBool(v: Boolean) extends PVal
  private case object PNull extends PVal

  /** Internal parse-failure signal; callers of the public API only ever
    * see `None`.
    */
  private final class Bad extends RuntimeException(null, null, false, false)
  private def bad(): Nothing = throw new Bad

  // ---------------------------------------------------------------- lexer/parser

  private final class Parser(val bytes: Array[Byte]) {
    var pos = 0
    def n: Int = bytes.length
    def at(i: Int): Int = { if (i < 0 || i >= n) bad(); bytes(i) & 0xff }
    def isWs(c: Int): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    def isDelim(c: Int): Boolean =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
        c == '{' || c == '}' || c == '/' || c == '%'
    def skipWs(): Unit = {
      var go = true
      while (go && pos < n) {
        val c = bytes(pos) & 0xff
        if (isWs(c)) pos += 1
        else if (c == '%') { while (pos < n && at(pos) != '\n' && at(pos) != '\r') pos += 1 }
        else go = false
      }
    }
    /** The regular token (non-delimiter run) at pos; empty on a delimiter. */
    def token(): String = {
      skipWs()
      val start = pos
      while (pos < n && !isWs(bytes(pos) & 0xff) && !isDelim(bytes(pos) & 0xff)) pos += 1
      new String(bytes, start, pos - start, java.nio.charset.StandardCharsets.US_ASCII)
    }
    def expect(kw: String): Unit = if (token() != kw) bad()

    def parseName(): PName = {
      if (at(pos) != '/') bad()
      pos += 1
      val sb = new StringBuilder
      while (pos < n && !isWs(bytes(pos) & 0xff) && !isDelim(bytes(pos) & 0xff)) {
        val c = at(pos)
        if (c == '#') { // two-hex-digit escape in a name
          val h = Integer.parseInt(
            new String(Array(at(pos + 1).toByte, at(pos + 2).toByte),
              java.nio.charset.StandardCharsets.US_ASCII), 16)
          sb.append(h.toChar); pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    def parseLiteralString(): PStr = {
      if (at(pos) != '(') bad()
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        val c = at(pos)
        pos += 1
        if (c == '\\') {
          val e = at(pos); pos += 1
          e match {
            case 'n' => out.write('\n')
            case 'r' => out.write('\r')
            case 't' => out.write('\t')
            case 'b' => out.write('\b')
            case 'f' => out.write('\f')
            case '(' => out.write('(')
            case ')' => out.write(')')
            case '\\' => out.write('\\')
            case '\r' => if (pos < n && at(pos) == '\n') pos += 1 // line continuation
            case '\n' => () // line continuation
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 0
              while (k < 2 && pos < n && at(pos) >= '0' && at(pos) <= '7') {
                v = v * 8 + (at(pos) - '0'); pos += 1; k += 1
              }
              out.write(v & 0xff)
            case other => out.write(other) // spec: unknown escape = the char itself
          }
        } else if (c == '(') { depth += 1; out.write(c) }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(c) }
        else out.write(c)
      }
      PStr(out.toByteArray)
    }

    def parseHexString(): PStr = {
      if (at(pos) != '<') bad()
      pos += 1
      val hex = new StringBuilder
      while (at(pos) != '>') {
        val c = at(pos)
        if (!isWs(c)) {
          if (!(c >= '0' && c <= '9') && !(c >= 'a' && c <= 'f') && !(c >= 'A' && c <= 'F')) bad()
          hex.append(c.toChar)
        }
        pos += 1
      }
      pos += 1
      if (hex.length % 2 == 1) hex.append('0')
      val out = new Array[Byte](hex.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
        i += 1
      }
      PStr(out)
    }

    def parseDict(): PDict = {
      if (!(at(pos) == '<' && at(pos + 1) == '<')) bad()
      pos += 2
      val m = scala.collection.mutable.LinkedHashMap[String, PVal]()
      skipWs()
      while (!(at(pos) == '>' && at(pos + 1) == '>')) {
        val key = parseName().v
        val v = parseValue()
        m(key) = v
        skipWs()
      }
      pos += 2
      PDict(m.toMap)
    }

    def parseArray(): PArr = {
      if (at(pos) != '[') bad()
      pos += 1
      val items = Vector.newBuilder[PVal]
      skipWs()
      while (at(pos) != ']') { items += parseValue(); skipWs() }
      pos += 1
      PArr(items.result())
    }

    private def isNumStart(c: Int): Boolean =
      (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

    /** One object-grammar value, resolving `num gen R` lookahead. */
    def parseValue(): PVal = {
      skipWs()
      val c = at(pos)
      if (c == '/') parseName()
      else if (c == '(') parseLiteralString()
      else if (c == '<' && at(pos + 1) == '<') parseDict()
      else if (c == '<') parseHexString()
      else if (c == '[') parseArray()
      else if (isNumStart(c)) {
        val save = pos
        val t1 = token()
        val v1 = try t1.toDouble catch { case _: NumberFormatException => bad() }
        // `int int R` is an indirect reference — lookahead two tokens
        if (v1 == v1.floor && v1 >= 0 && !t1.contains('.')) {
          val save2 = pos
          val t2 = token()
          if (t2.nonEmpty && t2.forall(_.isDigit)) {
            val save3 = pos
            val t3 = token()
            if (t3 == "R") return PRef(v1.toInt, t2.toInt)
            pos = save3; pos = save2
          } else pos = save2
        }
        pos = save
        val _ = token() // re-consume the number token
        PNum(v1)
      } else {
        val t = token()
        t match {
          case "true" => PBool(true)
          case "false" => PBool(false)
          case "null" => PNull
          case _ => bad()
        }
      }
    }
  }

  // ---------------------------------------------------------------- document reader

  /** zlib (RFC 1950) inflate — PDF FlateDecode. Strict: truncated or
    * corrupt data throws [[Bad]] (caught at the API boundary).
    */
  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) bad()
        out.write(buf, 0, k)
      }
    } catch { case _: java.util.zip.DataFormatException => bad() } finally inf.end()
    out.toByteArray
  }

  /** PNG predictor decode (RFC 2083 §6) over `rowLen`-byte rows with
    * 1 byte per pixel — the /Predictor >= 10 form xref streams carry:
    * each encoded row is a filter-type byte + `rowLen` filtered bytes.
    * Strict: length must divide exactly, filter types 0-4 only.
    */
  private def pngPredictorDecode(data: Array[Byte], rowLen: Int): Array[Byte] = {
    if (rowLen <= 0 || data.length % (rowLen + 1) != 0) bad()
    val rows = data.length / (rowLen + 1)
    val out = new Array[Byte](rows * rowLen)
    var r = 0
    while (r < rows) {
      val f = data(r * (rowLen + 1)) & 0xff
      if (f > 4) bad()
      var i = 0
      while (i < rowLen) {
        val x = data(r * (rowLen + 1) + 1 + i) & 0xff
        val left = if (i > 0) out(r * rowLen + i - 1) & 0xff else 0
        val up = if (r > 0) out((r - 1) * rowLen + i) & 0xff else 0
        val ul = if (r > 0 && i > 0) out((r - 1) * rowLen + i - 1) & 0xff else 0
        val recon = f match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case _ => // Paeth
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        out(r * rowLen + i) = (recon & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  private final class Doc(bytes: Array[Byte]) {
    private val offsets = scala.collection.mutable.HashMap[Int, Long]() // objnum -> byte offset
    // objnum -> (object-stream num, index within) — xref-stream type-2 entries
    private val inObjStm = scala.collection.mutable.HashMap[Int, (Int, Int)]()
    // every object number any xref section has SPOKEN for (incl. free):
    // newest-wins incremental-update semantics — a newer free entry must
    // shadow an older in-use one
    private val known = scala.collection.mutable.HashSet[Int]()
    private val cache = scala.collection.mutable.HashMap[Int, (PVal, Option[Array[Byte]])]()
    var root: PVal = PNull

    /** Walk `startxref` → xref section chain (classic tables AND xref
      * streams, in any /Prev mix, plus hybrid /XRefStm pointers) →
      * trailer. Sections are visited newest-first; the `known` set makes
      * the newest entry for each object number win.
      */
    def readXref(): Unit = {
      val tailStart = math.max(0, bytes.length - 2048)
      val tail = new String(bytes, tailStart, bytes.length - tailStart,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val sx = tail.lastIndexOf("startxref")
      if (sx < 0) bad()
      val p = new Parser(bytes)
      p.pos = tailStart + sx
      p.expect("startxref")
      val off = try p.token().toLong catch { case _: NumberFormatException => bad() }
      val seen = scala.collection.mutable.HashSet[Long]()
      var next = off
      while (next >= 0) {
        if (next >= bytes.length || !seen.add(next)) bad() // OOB or /Prev cycle
        next = readSectionAt(next.toInt, seen)
      }
      if (root == PNull) bad()
    }

    /** One xref section (classic table or xref stream) at `off`;
      * returns the /Prev offset or -1.
      */
    private def readSectionAt(off: Int, seen: scala.collection.mutable.HashSet[Long]): Long = {
      val q = new Parser(bytes)
      q.pos = off
      q.skipWs()
      val save = q.pos
      if (q.token() == "xref") readClassicAt(q, seen)
      else { q.pos = save; readXrefStreamAt(q) }
    }

    private def readClassicAt(q: Parser,
        seen: scala.collection.mutable.HashSet[Long]): Long = {
      q.skipWs()
      // subsections until the `trailer` keyword
      var done = false
      while (!done) {
        val t = q.token()
        if (t == "trailer") done = true
        else {
          val start = try t.toInt catch { case _: NumberFormatException => bad() }
          val count = try q.token().toInt catch { case _: NumberFormatException => bad() }
          if (start < 0 || count < 0 || count > 10 * 1000 * 1000) bad()
          var i = 0
          while (i < count) {
            val o = try q.token().toLong catch { case _: NumberFormatException => bad() }
            val g = q.token(); val kind = q.token()
            if (g.isEmpty || kind.isEmpty) bad()
            // NEWEST xref wins: later sections in the chain are older,
            // so only numbers not yet spoken for are added
            if (kind == "n") { if (known.add(start + i)) offsets(start + i) = o }
            else if (kind == "f") { known.add(start + i); () }
            else bad()
            i += 1
          }
        }
      }
      q.skipWs()
      val trailer = q.parseDict()
      if (root == PNull) root = trailer.m.getOrElse("Root", PNull)
      // hybrid-reference file (§7.5.8.4): the classic section may point
      // at a supplementary xref STREAM holding the packed objects; it is
      // newer than /Prev, so read it before following Prev
      trailer.m.get("XRefStm") match {
        case Some(PNum(v)) =>
          val so = v.toLong
          if (so < 0 || so >= bytes.length || !seen.add(so)) bad()
          val r = new Parser(bytes); r.pos = so.toInt
          val _ = readXrefStreamAt(r) // its own /Prev is ignored per spec
        case None => ()
        case _ => bad()
      }
      trailer.m.get("Prev") match {
        case Some(PNum(v)) => v.toLong
        case None => -1L
        case _ => bad()
      }
    }

    /** An xref STREAM (§7.5.8) at the parser position: `num gen obj`
      * whose value is a /Type /XRef stream. All dict entries must be
      * DIRECT (the spec's own rule — the table is not loaded yet).
      * Returns /Prev or -1.
      */
    private def readXrefStreamAt(q: Parser): Long = {
      val num = try q.token().toInt catch { case _: NumberFormatException => bad() }
      val _gen = q.token()
      q.expect("obj")
      val dict = q.parseValue() match { case d: PDict => d; case _ => bad() }
      if (dict.m.get("Type") != Some(PName("XRef"))) bad()
      q.skipWs()
      q.expect("stream")
      if (q.at(q.pos) == '\r') q.pos += 1
      if (q.at(q.pos) != '\n') bad()
      q.pos += 1
      val len = dict.m.get("Length") match {
        case Some(PNum(l)) => l.toLong // direct per §7.5.8.2
        case _ => bad()
      }
      if (len < 0 || q.pos + len > bytes.length) bad()
      val raw = java.util.Arrays.copyOfRange(q.bytes, q.pos, q.pos + len.toInt)
      q.pos += len.toInt
      q.expect("endstream")
      q.expect("endobj")
      val data = decodeWithParms(dict, raw)
      val size = dict.m.get("Size") match { case Some(PNum(v)) => v.toInt; case _ => bad() }
      val wArr = dict.m.get("W") match {
        case Some(PArr(items)) if items.length >= 3 => items.map {
          case PNum(v) if v >= 0 && v <= 8 && v == v.floor => v.toInt
          case _ => bad()
        }
        case _ => bad()
      }
      val (wa, wb, wc) = (wArr(0), wArr(1), wArr(2))
      val rowLen = wa + wb + wc
      if (rowLen <= 0) bad()
      val index: Seq[(Int, Int)] = dict.m.get("Index") match {
        case None => Seq((0, size))
        case Some(PArr(items)) =>
          if (items.length % 2 != 0 || items.isEmpty) bad()
          items.grouped(2).map {
            case Vector(PNum(s), PNum(c)) if s >= 0 && c >= 0 => (s.toInt, c.toInt)
            case _ => bad()
          }.toSeq
        case _ => bad()
      }
      val totalRows = index.map(_._2.toLong).sum
      if (totalRows * rowLen != data.length) bad() // row count must match exactly
      var row = 0
      def field(rowStart: Int, fieldOff: Int, width: Int, default: Long): Long = {
        if (width == 0) return default
        var v = 0L
        var i = 0
        while (i < width) { v = (v << 8) | (data(rowStart + fieldOff + i) & 0xffL); i += 1 }
        v
      }
      index.foreach { case (start, count) =>
        var i = 0
        while (i < count) {
          val rs = row * rowLen
          val tpe = field(rs, 0, wa, 1L) // width-0 type defaults to 1
          val f2 = field(rs, wa, wb, 0L)
          val f3 = field(rs, wa + wb, wc, 0L)
          val objNum = start + i
          tpe match {
            case 0L => known.add(objNum); () // free
            case 1L => if (known.add(objNum)) offsets(objNum) = f2
            case 2L => if (known.add(objNum)) inObjStm(objNum) = (f2.toInt, f3.toInt)
            case _ => bad()
          }
          row += 1; i += 1
        }
      }
      val _ = num
      if (root == PNull) root = dict.m.getOrElse("Root", PNull)
      dict.m.get("Prev") match {
        case Some(PNum(v)) => v.toLong
        case None => -1L
        case _ => bad()
      }
    }

    private val parsing = scala.collection.mutable.HashSet[Int]()

    /** Parse `num gen obj … endobj` at the xref offset for `num`;
      * memoized. Returns the value and the raw stream bytes if any.
      * Explicit get/put (not getOrElseUpdate) because parsing one object
      * can legally parse another (indirect /Length); the `parsing` set
      * rejects the SELF-referential form (`/Length <own num> 0 R`),
      * which would otherwise recurse unboundedly.
      */
    def obj(num: Int): (PVal, Option[Array[Byte]]) = cache.get(num) match {
      case Some(hit) => hit
      case None =>
        if (!parsing.add(num)) bad()
        val computed =
          try parseObjAt(num)
          finally parsing.remove(num)
        cache(num) = computed
        computed
    }

    private def parseObjAt(num: Int): (PVal, Option[Array[Byte]]) = {
      if (!offsets.contains(num)) {
        // not a direct object: a type-2 entry packed in an object stream
        val (stmNum, idx) = inObjStm.getOrElse(num, bad())
        return (objStmValue(num, stmNum, idx), None)
      }
      val off = offsets(num)
      if (off < 0 || off >= bytes.length) bad()
      val p = new Parser(bytes)
      p.pos = off.toInt
      val declared = try p.token().toInt catch { case _: NumberFormatException => bad() }
      if (declared != num) bad()
      val _gen = p.token()
      p.expect("obj")
      val v = p.parseValue()
      p.skipWs()
      val save = p.pos
      val kw = p.token()
      if (kw == "stream") {
        // spec: `stream` is followed by CRLF or LF (not bare CR)
        if (p.at(p.pos) == '\r') p.pos += 1
        if (p.at(p.pos) != '\n') bad()
        p.pos += 1
        val len = v match {
          case PDict(m) => resolve(m.getOrElse("Length", bad()), 0) match {
            case PNum(l) => l.toLong
            case _ => bad()
          }
          case _ => bad()
        }
        if (len < 0 || p.pos + len > bytes.length) bad()
        val data = java.util.Arrays.copyOfRange(p.bytes, p.pos, p.pos + len.toInt)
        p.pos += len.toInt
        p.expect("endstream")
        p.expect("endobj")
        (v, Some(data))
      } else {
        p.pos = save
        p.expect("endobj")
        (v, None)
      }
    }

    def resolve(v: PVal, depth: Int): PVal = v match {
      case PRef(num, _) =>
        if (depth > 32) bad() // reference cycle
        resolve(obj(num)._1, depth + 1)
      case other => other
    }

    /** Decoded bytes of stream object `num` (no filter or FlateDecode,
      * with /DecodeParms PNG predictors honored).
      */
    def streamData(num: Int): Array[Byte] = {
      val (v, data) = obj(num)
      val dict = v match { case d: PDict => d; case _ => bad() }
      decodeWithParms(dict, data.getOrElse(bad()))
    }

    /** Apply /Filter then /DecodeParms to raw stream bytes. Supported:
      * no filter or FlateDecode; predictor 1 (none) or the PNG
      * predictors 10-15 with Colors=1, BitsPerComponent=8 (the xref-
      * stream form). Anything else is a hard reject.
      */
    private def decodeWithParms(dict: PDict, raw: Array[Byte]): Array[Byte] = {
      val inflated = resolve(dict.m.getOrElse("Filter", PNull), 0) match {
        case PNull => raw
        case PName("FlateDecode") => inflate(raw)
        case PArr(Vector(PName("FlateDecode"))) => inflate(raw)
        case _ => bad() // unsupported filter chain
      }
      val parms = resolve(dict.m.getOrElse("DecodeParms", PNull), 0) match {
        case PNull => return inflated
        case d: PDict => d
        case PArr(Vector(d: PDict)) => d
        case _ => bad()
      }
      def intParm(key: String, default: Int): Int =
        resolve(parms.m.getOrElse(key, PNum(default)), 0) match {
          case PNum(v) if v == v.floor => v.toInt
          case _ => bad()
        }
      val predictor = intParm("Predictor", 1)
      if (predictor == 1) inflated
      else if (predictor >= 10 && predictor <= 15) {
        if (intParm("Colors", 1) != 1 || intParm("BitsPerComponent", 8) != 8) bad()
        pngPredictorDecode(inflated, intParm("Columns", 1))
      } else bad() // TIFF predictor 2 and the rest: out of scope
    }

    // objstm num -> (objnum/offset pairs, decoded bytes, /First)
    private val objStmCache =
      scala.collection.mutable.HashMap[Int, (Vector[(Int, Int)], Array[Byte], Int)]()

    /** Resolve object `num` = entry `idx` of object stream `stmNum`
      * (§7.5.7): decoded payload is N (objnum, offset) integer pairs,
      * then the packed DIRECT objects starting at /First. Strict: the
      * container must really be /Type /ObjStm, the index in bounds, and
      * the pair's object number must MATCH the xref's claim.
      */
    private def objStmValue(num: Int, stmNum: Int, idx: Int): PVal = {
      val (pairs, data, first) = objStmCache.get(stmNum) match {
        case Some(hit) => hit
        case None =>
          val (v, _) = obj(stmNum) // must be a DIRECT (type-1) stream object
          val dict = v match { case d: PDict => d; case _ => bad() }
          if (dict.m.get("Type") != Some(PName("ObjStm"))) bad()
          val nObjs = resolve(dict.m.getOrElse("N", bad()), 0) match {
            case PNum(v2) if v2 >= 0 && v2 == v2.floor => v2.toInt
            case _ => bad()
          }
          val first = resolve(dict.m.getOrElse("First", bad()), 0) match {
            case PNum(v2) if v2 >= 0 && v2 == v2.floor => v2.toInt
            case _ => bad()
          }
          val data = streamData(stmNum)
          if (first > data.length) bad()
          val hp = new Parser(data)
          val pairs = Vector.tabulate(nObjs) { _ =>
            val on = try hp.token().toInt catch { case _: NumberFormatException => bad() }
            val oo = try hp.token().toInt catch { case _: NumberFormatException => bad() }
            if (hp.pos > first) bad() // header ran past /First
            (on, oo)
          }
          val computed = (pairs, data, first)
          objStmCache(stmNum) = computed
          computed
      }
      if (idx < 0 || idx >= pairs.length) bad()
      val (objNum, objOff) = pairs(idx)
      if (objNum != num) bad() // xref and objstm header disagree
      if (first + objOff >= data.length) bad()
      val vp = new Parser(data)
      vp.pos = first + objOff
      vp.parseValue() // packed objects are direct values — no obj/endobj
    }
  }

  // ---------------------------------------------------------------- text operators

  /** Run the BT/ET text operators of one page's content bytes; returns
    * the page text (lines joined with `\n`).
    */
  private def contentText(content: Array[Byte]): String = {
    val p = new Parser(content)
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    def newline(): Unit = if (cur.nonEmpty) { lines += cur.toString; cur.clear() }
    def append(s: PStr): Unit = s.bytes.foreach(b => cur.append(winAnsiChar(b & 0xff)))
    val operands = scala.collection.mutable.ArrayBuffer[PVal]()
    while ({ p.skipWs(); p.pos < p.n }) {
      val c = p.at(p.pos)
      if (c == '/' || c == '(' || c == '<' || c == '[')
        operands += p.parseValue()
      else if ((c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.')
        operands += p.parseValue()
      else {
        // an operator token — or the quote operators, which are delimiters
        // to token(): handle them explicitly
        val op =
          if (c == '\'') { p.pos += 1; "'" }
          else if (c == '"') { p.pos += 1; "\"" }
          else p.token()
        if (op.isEmpty) bad() // unexpected delimiter: malformed content
        op match {
          case "Tj" =>
            operands.lastOption match { case Some(s: PStr) => append(s); case _ => () }
          case "'" =>
            newline()
            operands.lastOption match { case Some(s: PStr) => append(s); case _ => () }
          case "\"" =>
            newline()
            operands.lastOption match { case Some(s: PStr) => append(s); case _ => () }
          case "TJ" =>
            operands.lastOption match {
              case Some(PArr(items)) => items.foreach {
                case s: PStr => append(s)
                // kerning ≤ −180/1000 em renders as an inter-word gap
                case PNum(v) => if (v <= -180) cur.append(' ')
                case _ => ()
              }
              case _ => ()
            }
          case "Td" | "TD" | "T*" | "Tm" | "ET" => newline()
          case _ => () // any other operator: discard its operands
        }
        operands.clear()
      }
    }
    newline()
    lines.mkString("\n")
  }

  // ---------------------------------------------------------------- public API

  /** Extract the text of every page of `pdf`, document order — one
    * string per page, lines joined with `\n`. `None` on ANY grammar
    * violation: bad header, missing/corrupt xref, offsets out of
    * bounds, reference or /Prev or page-tree cycles, stream length
    * lies, unsupported filters, malformed content streams.
    */
  def extractText(pdf: Array[Byte]): Option[Seq[String]] = {
    try {
      if (pdf.length < 8) return None
      val header = new String(pdf, 0, 5, java.nio.charset.StandardCharsets.US_ASCII)
      if (header != "%PDF-") return None
      val doc = new Doc(pdf)
      doc.readXref()
      val rootDict = doc.resolve(doc.root, 0) match { case d: PDict => d; case _ => bad() }
      val pagesRoot = rootDict.m.getOrElse("Pages", bad())
      // walk the page tree; cycle-guard on visited object numbers
      val pageNodes = scala.collection.mutable.ArrayBuffer[PDict]()
      val visited = scala.collection.mutable.HashSet[Int]()
      def walk(v: PVal, depth: Int): Unit = {
        if (depth > 64) bad()
        v match {
          case PRef(num, _) if !visited.add(num) => bad() // page-tree cycle
          case _ => ()
        }
        doc.resolve(v, 0) match {
          case d: PDict =>
            d.m.get("Type") match {
              case Some(PName("Pages")) =>
                doc.resolve(d.m.getOrElse("Kids", bad()), 0) match {
                  case PArr(kids) => kids.foreach(walk(_, depth + 1))
                  case _ => bad()
                }
              case Some(PName("Page")) => pageNodes += d
              case _ => bad()
            }
          case _ => bad()
        }
      }
      walk(pagesRoot, 0)
      val texts = pageNodes.map { page =>
        page.m.get("Contents") match {
          case None => ""
          case Some(contents) =>
            val refs = doc.resolve(contents, 0) match {
              case PArr(items) => items
              case _: PDict => Vector(contents) // a single (possibly direct) stream
              case _ => bad()
            }
            val streams = refs.map {
              case PRef(num, _) => doc.streamData(num)
              case _ => bad()
            }
            // multiple content streams concatenate with whitespace between
            val joined = new java.io.ByteArrayOutputStream()
            streams.zipWithIndex.foreach { case (s, i) =>
              if (i > 0) joined.write('\n')
              joined.write(s)
            }
            contentText(joined.toByteArray)
        }
      }
      Some(texts.toSeq)
    } catch {
      case _: Bad => None
      case _: IndexOutOfBoundsException => None
      case _: NumberFormatException => None
    }
  }

  /** The running text [[encodeDocPdf]] embedded, recovered: all pages'
    * text concatenated with line breaks removed. Identity on the
    * embedded text by construction.
    */
  def extractDocText(pdf: Array[Byte]): Option[String] =
    extractText(pdf).map(_.mkString.replace("\n", ""))
}
