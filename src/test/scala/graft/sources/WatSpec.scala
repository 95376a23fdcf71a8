package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class WatSpec extends AnyFunSuite {

  private def respond(html: String, ctype: String = "text/html; charset=UTF-8"): Warc.Record = {
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n" + html)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Warc.Record("response", "<urn:uuid:r1>", "http://x.com/p", http)
  }

  test("fromResponse builds the metadata record: refers-to, title, links, JSON validity") {
    val r = respond(
      """<html><head><title> My "Quoted" Page </title></head>""" +
        """<body><a href="http://a.com/1">a</a><a href="/rel">b</a></body></html>""")
    val wat = Wat.fromResponse(r, None).get
    assert(wat.warcType === "metadata")
    assert(wat.recordId === "<urn:uuid:r1>;wat")
    assert(wat.refersTo === "<urn:uuid:r1>")
    val json = new String(wat.content, java.nio.charset.StandardCharsets.UTF_8)
    // the envelope must be REAL JSON: jackson (on Spark's classpath) parses it
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val env = tree.get("Envelope")
    assert(env.get("WARC-Header-Metadata").get("WARC-Target-URI").asText === "http://x.com/p")
    assert(env.get("WARC-Header-Metadata").get("Content-Length").asLong === r.content.length.toLong)
    val pm = env.get("Payload-Metadata").get("HTTP-Response-Metadata")
    assert(pm.get("Response-Message").get("Status").asInt === 200)
    assert(pm.get("HTML-Metadata").get("Head").get("Title").asText === "My \"Quoted\" Page")
    val links = pm.get("HTML-Metadata").get("Links")
    assert(links.size === 2)
    assert(links.get(0).get("url").asText === "http://a.com/1")
    assert(links.get(1).get("url").asText === "/rel")
  }

  test("non-HTML payloads carry empty HTML metadata; non-responses and broken wire → None") {
    val pdf = respond("%PDF-1.4 not html", ctype = "application/pdf")
    val wat = Wat.fromResponse(pdf, None).get
    val tree = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(wat.content, java.nio.charset.StandardCharsets.UTF_8))
    val hm = tree.get("Envelope").get("Payload-Metadata")
      .get("HTTP-Response-Metadata").get("HTML-Metadata")
    assert(hm.get("Head").get("Title").asText === "")
    assert(hm.get("Links").size === 0)
    // wrong record type
    assert(Wat.fromResponse(pdf.copy(warcType = "metadata"), None) === None)
    // HTTP block that doesn't parse
    assert(Wat.fromResponse(
      Warc.Record("response", "<urn:uuid:r2>", "http://x/", "garbage".getBytes("US-ASCII")),
      None) === None)
  }

  test("envelope JSON escapes control characters and backslashes per RFC 8259") {
    val r = respond("<html><head><title>a\\b\tc</title></head><body></body></html>")
    val wat = Wat.fromResponse(r, None).get
    val tree = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(wat.content, java.nio.charset.StandardCharsets.UTF_8))
    val title = tree.get("Envelope").get("Payload-Metadata")
      .get("HTTP-Response-Metadata").get("HTML-Metadata").get("Head").get("Title").asText
    assert(title.contains("a\\b"))
  }
}
