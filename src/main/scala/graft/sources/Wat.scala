package graft.sources

/** WAT metadata records — the third of CommonCrawl's derived trio
  * (WARC capture / WAT metadata / WET text; the published
  * ia-web-commons "Web Archive Transformation" layout): alongside each
  * response record, a `WARC-Type: metadata` record whose payload is a
  * JSON envelope describing the capture — the WARC headers it refers
  * to, the HTTP response line and headers, and for HTML pages the head
  * title and outgoing links. Corpus work that only needs the LINK
  * GRAPH or page metadata reads WAT (a few % of the capture bytes)
  * instead of the WARC — at 100 TB that is the difference between a
  * metadata pass and a full-corpus scan.
  *
  * Reference behavior: the reference pipeline ships row metadata as
  * JSON documents next to the payload store
  * (data-s3-elastic-transfer.py:214-236, the `to_json` document build);
  * this is the crawl-archive shape of the same contract.
  */
object Wat {

  /** JSON string escape (RFC 8259 §7): the two mandatory escapes plus
    * control characters as \u00XX — the subset a metadata envelope can
    * contain; everything else passes through (UTF-8 handles itself).
    */
  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** The WAT JSON envelope for a response capture: WARC header
    * metadata, the HTTP response line/headers, and (for HTML) the
    * extracted head title and link list. Key order is fixed so the
    * bytes are deterministic — writer∘reader identity is the oracle.
    */
  def envelopeJson(r: Warc.Record, status: Int, contentType: String,
      title: String, links: Seq[String]): String = {
    val linkArr = links.map(u => s"""{"path": "A@/href", "url": "${esc(u)}"}""")
      .mkString("[", ", ", "]")
    s"""{"Envelope": {"Format": "WARC", """ +
      s""""WARC-Header-Metadata": {"WARC-Type": "${esc(r.warcType)}", """ +
      s""""WARC-Record-ID": "${esc(r.recordId)}", """ +
      s""""WARC-Target-URI": "${esc(r.targetUri)}", """ +
      s""""Content-Length": ${r.content.length}}, """ +
      s""""Payload-Metadata": {"Actual-Content-Type": "application/http; msgtype=response", """ +
      s""""HTTP-Response-Metadata": {"Response-Message": {"Status": $status}, """ +
      s""""Headers": {"Content-Type": "${esc(contentType)}"}, """ +
      s""""HTML-Metadata": {"Head": {"Title": "${esc(title)}"}, """ +
      s""""Links": $linkArr}}}}}"""
  }

  /** Build the WAT metadata record for a WARC `response` record the way
    * the real WAT generator does: parse the HTTP block (honoring
    * transfer/content encodings through the caller's codec), and for
    * HTML payloads extract the head title and outgoing links. None when
    * the record is not a response or its HTTP block doesn't parse — a
    * capture whose wire grammar lies gets no metadata row, it does not
    * get a guessed one.
    */
  def fromResponse(r: Warc.Record, codec: Option[Warc.GzipCodec]): Option[Warc.Record] = {
    if (r.warcType != "response") return None
    val http = Warc.parseHttp(r.content, codec).getOrElse(return None)
    val isHtml = http.contentType.startsWith("text/html")
    val (title, links) =
      if (isHtml) {
        val html = new String(http.body, java.nio.charset.StandardCharsets.UTF_8)
        (Html.extract(html).title, Html.linkHrefs(html))
      } else ("", Nil)
    val json = envelopeJson(r, http.status, http.contentType, title, links)
    Some(Warc.Record(
      warcType = "metadata",
      recordId = s"${r.recordId};wat",
      targetUri = r.targetUri,
      content = json.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      refersTo = r.recordId))
  }

  /** Spark-side read schema for [[envelopeJson]] — what `from_json`
    * needs to take a WAT payload apart column-wise (links as an array
    * of structs, so `size()`/`transform()` work on them natively).
    */
  val envelopeSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "Envelope STRUCT<Format: STRING, " +
        "`WARC-Header-Metadata`: STRUCT<`WARC-Type`: STRING, `WARC-Record-ID`: STRING, " +
        "`WARC-Target-URI`: STRING, `Content-Length`: BIGINT>, " +
        "`Payload-Metadata`: STRUCT<`Actual-Content-Type`: STRING, " +
        "`HTTP-Response-Metadata`: STRUCT<`Response-Message`: STRUCT<Status: BIGINT>, " +
        "Headers: STRUCT<`Content-Type`: STRING>, " +
        "`HTML-Metadata`: STRUCT<Head: STRUCT<Title: STRING>, " +
        "Links: ARRAY<STRUCT<path: STRING, url: STRING>>>>>>")
}
