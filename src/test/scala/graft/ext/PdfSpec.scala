package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The PDF-1.4 subset codec: writer→reader round trips, the text
  * operators a real extractor must honor (hand-built files exercise the
  * grammar the writer doesn't emit — TJ kerning, `'`, hex strings,
  * indirect /Length, uncompressed streams), and the malformed-byte
  * rejection battery (every grammar lie is None, never a throw).
  */
class PdfSpec extends AnyFunSuite {

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  /** A minimal one-page PDF with an UNCOMPRESSED content stream built
    * by hand — correct xref offsets computed from the assembled parts.
    */
  private def handPdf(content: String, lengthIndirect: Boolean = false): Array[Byte] = {
    val header = "%PDF-1.4\n"
    val objs = scala.collection.mutable.ArrayBuffer[String]()
    objs += "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    objs += "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    objs += "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    val lenPart = if (lengthIndirect) "5 0 R" else content.length.toString
    objs += s"4 0 obj\n<< /Length $lenPart >>\nstream\n$content\nendstream\nendobj\n"
    if (lengthIndirect) objs += s"5 0 obj\n${content.length}\nendobj\n"
    val offsets = objs.scanLeft(header.length.toLong)((acc, o) => acc + o.length)
    val body = objs.mkString
    val xrefOff = header.length + body.length
    val n = objs.length + 1
    val xref = new StringBuilder(s"xref\n0 $n\n0000000000 65535 f \n")
    offsets.dropRight(1).foreach(o => xref.append(f"$o%010d 00000 n \n"))
    val trailer = s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n"
    ascii(header + body + xref.toString + trailer)
  }

  test("writer->reader round trip: pages, lines, full printable ASCII incl. parens and backslash") {
    val pages = Seq(
      Seq("hello world", "a (nested) \\ backslash", "x" * 80),
      Seq("second page", ""),
      Seq())
    val pdf = Pdf.encodePdf(pages)
    assert(new String(pdf, 0, 5, java.nio.charset.StandardCharsets.US_ASCII) === "%PDF-")
    val got = Pdf.extractText(pdf).get
    assert(got.length === 3)
    assert(got(0) === "hello world\na (nested) \\ backslash\n" + "x" * 80)
    // the empty line is a Td with no text — it produces no output line
    assert(got(1) === "second page")
    assert(got(2) === "")
  }

  test("WinAnsi bytes round trip: Latin-1 range and the CP1252 0x80-0x9F specials") {
    val text = "café über €100 —dash… ‘q’"
    val pdf = Pdf.encodePdf(Seq(Seq(text)))
    assert(Pdf.extractText(pdf).get.head === text)
    // a char with no WinAnsi byte degrades to '?'
    assert(Pdf.extractText(Pdf.encodePdf(Seq(Seq("世")))).get.head === "?")
  }

  test("encodeDocPdf: exact char-split identity, page fan-out, empty text") {
    val text = ("the quick brown fox " * 40).trim
    val pdf = Pdf.encodeDocPdf(text, charsPerLine = 37, linesPerPage = 5)
    assert(Pdf.extractDocText(pdf).get === text)
    val nPages = Pdf.extractText(pdf).get.length
    assert(nPages === math.ceil(math.ceil(text.length / 37.0) / 5.0).toInt)
    assert(Pdf.extractDocText(Pdf.encodeDocPdf("", 10, 10)).get === "")
  }

  test("hand-built content: TJ kerning, quote operator, hex strings, Tm/T* breaks") {
    val content =
      "BT /F1 12 Tf 72 720 Td [(ab) -250 (cd) -10 (ef)] TJ T* (next) Tj " +
        "1 0 0 1 72 650 Tm <4869> Tj (line3') ' ET"
    val got = Pdf.extractText(handPdf(content)).get
    // -250 <= -180 renders a space; -10 does not; T* and Tm break lines; ' breaks then shows
    assert(got === Seq("ab cdef\nnext\nHi\nline3'"))
  }

  test("hand-built: indirect /Length, octal + escape forms in literal strings") {
    val content = "BT (A\\051B\\\\C\\nD) Tj ET" // \051 = ')'
    val got = Pdf.extractText(handPdf(content, lengthIndirect = true)).get
    assert(got === Seq("A)B\\C\nD"))
  }

  test("malformed battery: every grammar lie is None, never a throw") {
    val good = Pdf.encodePdf(Seq(Seq("page one text"), Seq("page two")))
    assert(Pdf.extractText(good).isDefined)
    // no header / wrong header
    assert(Pdf.extractText(Array[Byte]()) === None)
    assert(Pdf.extractText(ascii("not a pdf at all, definitely")) === None)
    // truncations at every 97th byte must never throw
    (1 until good.length by 97).foreach { k =>
      Pdf.extractText(java.util.Arrays.copyOf(good, k)) // must not throw
    }
    // flipped bytes anywhere must never throw (they may still parse)
    (1 until good.length by 53).foreach { k =>
      val bad = good.clone(); bad(k) = (bad(k) ^ 0x5a).toByte
      Pdf.extractText(bad)
    }
    // startxref pointing out of bounds
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sx = s.lastIndexOf("startxref")
    val oob = s.substring(0, sx) + s"startxref\n${good.length + 999}\n%%EOF\n"
    assert(Pdf.extractText(ascii(oob)) === None)
    // stream /Length lying past EOF
    assert(Pdf.extractText(handPdf("BT (x) Tj ET").patch(0, Array[Byte](), 0)
      .pipeReplace("/Length 12", "/Length 9999")) === None)
    // unsupported filter
    assert(Pdf.extractText(
      handPdf("BT (x) Tj ET").pipeReplace("<< /Length", "<< /Filter /LZWDecode /Length")) === None)
    // page-tree cycle: Pages' kid points back at Pages
    assert(Pdf.extractText(
      handPdf("BT (x) Tj ET").pipeReplace("/Kids [3 0 R]", "/Kids [2 0 R]")) === None)
    // something that is neither a classic table nor a /Type /XRef
    // stream where startxref points -> None
    assert(Pdf.extractText(
      handPdf("BT (x) Tj ET").pipeReplace("xref\n0 5\n", "6 0 obj\n<< >>\n")) === None)
    // a stream whose /Length references ITSELF must reject, not recurse
    assert(Pdf.extractText(
      handPdf("BT (x) Tj ET", lengthIndirect = true)
        .pipeReplace("<< /Length 5 0 R >>", "<< /Length 4 0 R >>")) === None)
  }

  test("xref stream + object stream (PDF 1.5): modern writer round trips, equals the classic form") {
    val pages = Seq(
      Seq("first page line one", "line two (with) \\parens\\"),
      Seq("second page", "", "third line"),
      Seq.empty[String])
    val modern = Pdf.encodePdfXrefStream(pages)
    // sanity: the file really is the 1.5 shape — no classic xref table
    val s = new String(modern, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!s.contains("\ntrailer") && s.contains("/Type /XRef")
      && s.contains("/Type /ObjStm") && s.contains("/Predictor 12"))
    val got = Pdf.extractText(modern).get
    assert(got === Pdf.extractText(Pdf.encodePdf(pages)).get)
    assert(got.head === "first page line one\nline two (with) \\parens\\")
    // doc form: exact identity through the char split
    val text = "The quick brown fox #42 jumps (over) the \\lazy\\ dog! " * 7
    assert(Pdf.extractDocText(Pdf.encodeDocPdfXrefStream(text, 23, 4)) === Some(text))
  }

  test("xref-stream malformed battery: every 1.5-grammar lie is None, never a throw") {
    val good = Pdf.encodePdfXrefStream(Seq(Seq("alpha beta"), Seq("gamma")))
    assert(Pdf.extractText(good).isDefined)
    // truncations and byte flips must never throw
    (1 until good.length by 89).foreach { k =>
      Pdf.extractText(java.util.Arrays.copyOf(good, k))
    }
    (1 until good.length by 41).foreach { k =>
      val bad = good.clone(); bad(k) = (bad(k) ^ 0x5a).toByte
      Pdf.extractText(bad)
    }
    // (all same-length replacements: offsets must NOT shift, so the
    // specific grammar check is what fires)
    // W that disagrees with the data length
    assert(Pdf.extractText(good.pipeReplace("/W [1 4 2]", "/W [1 4 4]")) === None)
    // TIFF predictor: out of scope, must reject
    assert(Pdf.extractText(good.pipeReplace("/Predictor 12", "/Predictor 02")) === None)
    // /Index row count lying vs the decoded data (size is 10 here)
    assert(Pdf.extractText(good.pipeReplace("/Index [0 10]", "/Index [0 11]")) === None)
    // xref stream must carry /Type /XRef
    assert(Pdf.extractText(good.pipeReplace("/Type /XRef ", "/Type /Xref ")) === None)
    // ObjStm /N lying (more header pairs than present)
    assert(Pdf.extractText(good.pipeReplace("/Type /ObjStm /N 5", "/Type /ObjStm /N 6")) === None)
  }

  private implicit final class Rep(private val b: Array[Byte]) {
    /** Byte-level string replace for corrupting fixtures (offsets shift;
      * the reader must reject, not read garbage).
      */
    def pipeReplace(from: String, to: String): Array[Byte] =
      ascii(new String(b, java.nio.charset.StandardCharsets.ISO_8859_1).replace(from, to))
  }
}
