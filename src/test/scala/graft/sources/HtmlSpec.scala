package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins the HTML extraction traps one by one: script/style content must
  * not leak (even when it CONTAINS markup), comments skip, entities
  * decode, whitespace collapses, anchors count, and the title stays out
  * of the body text.
  */
class HtmlSpec extends AnyFunSuite {

  test("script content with embedded fake tags never leaks into visible text") {
    val e = Html.extract(
      "<body><p>before</p><script>var s = \"<p>LEAK</p>\";</script><p>after</p></body>")
    assert(e.text === "before after")
  }

  test("style blocks, comments and tags drop; entities decode; whitespace collapses") {
    val e = Html.extract(
      "<body><!-- <b>LEAK</b> -->  a &amp; b\n\n  <style>p{x:1}</style>&lt;c&gt;&nbsp;d </body>")
    assert(e.text === "a & b <c> d")
  }

  test("title is captured separately and excluded from body text; anchors count") {
    val e = Html.extract(
      "<html><head><title> My   Title &amp; Co </title></head>" +
        "<body><a href=\"/x\">one</a> <a href=\"/y\">two</a></body></html>")
    assert(e.title === "My Title & Co")
    assert(e.text === "one two")
    assert(e.nLinks === 2)
  }

  test("case-insensitive SCRIPT/STYLE close tags; unterminated blocks drop to end") {
    assert(Html.extract("<p>x</p><SCRIPT>a<b>c</SCRIPT><p>y</p>").text === "x y")
    // unterminated script swallows the rest rather than leaking it
    assert(Html.extract("<p>x</p><script>var a = 1;").text === "x")
    // unknown NAMED entities pass through verbatim
    assert(Html.extract("<p>&unknown; &broken</p>").text === "&unknown; &broken")
  }

  test("numeric character references decode: decimal, hex, multibyte, and the reject set") {
    assert(Html.extract("<p>&#65;&#x42;c</p>").text === "ABc")
    // U+2019 right single quote and an astral code point (surrogate pair)
    assert(Html.extract("<p>it&#x2019;s &#128512;</p>").text === "it’s 😀")
    // NUL, surrogate halves and out-of-range stay verbatim (never decoded)
    assert(Html.extract("<p>&#0; &#xD800; &#x110000; &#xZZ;</p>").text
      === "&#0; &#xD800; &#x110000; &#xZZ;")
  }

  test("'>' inside quoted attribute values does not end the tag") {
    val e = Html.extract(
      "<body><a href=\"/x\" title=\"a > b\">one</a> <p data-q='1>0'>two</p></body>")
    assert(e.text === "one two")
    assert(e.nLinks === 1)
  }

  test("scriptBlocks pulls typed script content; decoys and visible text stay out") {
    val html = "<head><script>var fake = '<script type=\"application/ld+json\">';</script>" +
      "<script type=\"application/ld+json\">{\"a\":1}</script>" +
      "<SCRIPT TYPE=\"APPLICATION/LD+JSON\">{\"b\":2}</SCRIPT></head><p>text</p>"
    assert(Html.scriptBlocks(html, "ld+json") === Seq("{\"a\":1}", "{\"b\":2}"))
    // untyped scripts don't match; the blocks never leak into visible text
    assert(Html.scriptBlocks(html, "ld+json").forall(b => !Html.extract(html).text.contains(b)))
    assert(Html.scriptBlocks("<script type='x'>unterminated", "x") === Seq())
    assert(Html.scriptBlocks("<p>no scripts at all</p>", "ld+json") === Seq())
  }

  test("linkHrefs pulls real anchor hrefs only: quoted/bare values, decoys and no-href skipped") {
    val html = "<body><a href=\"/x\">one</a> <A HREF='/y'>two</A> " +
      "<a class=\"btn\" href = /bare >three</a> " +
      "<a name=\"no-href\">four</a> " +
      "<a data-href=\"/not-an-href\">five</a> " +
      "<script>var s = '<a href=\"/decoy\">';</script>" +
      "<!-- <a href=\"/commented\">gone</a> --></body>"
    assert(Html.linkHrefs(html) === Seq("/x", "/y", "/bare"))
    // a quoted '>' inside the href must not end the tag
    assert(Html.linkHrefs("<a href=\"/q?a>b\">x</a>") === Seq("/q?a>b"))
    // unterminated tag yields what was complete, never a throw
    assert(Html.linkHrefs("<a href=\"/ok\">x</a><a href=\"/trunc") === Seq("/ok"))
    // ' href=' INSIDE another attribute's quoted value is not the attribute
    assert(Html.linkHrefs("<a title=\"see href='x'\" href=\"/real\">t</a>") === Seq("/real"))
    assert(Html.linkHrefs("<a title='use href=\"/fake\"'>no real href</a>") === Seq())
  }

  test("bare '<' in prose is literal text, not a tag opener") {
    assert(Html.extract("<p>a < b and x <= y</p>").text === "a < b and x <= y")
    // an unterminated REAL tag still drops the tail (it never closes)…
    assert(Html.extract("<p>x</p><a href=").text === "x")
    // …but a trailing bare '<' survives as text
    assert(Html.extract("<p>a <</p>").text === "a <")
  }

  test("tables: cells, th count, implicit closes, noise under <tr>, nesting, unterminated") {
    val t1 = Html.tables(
      "<table><tr><th> A </th><th>B</th></tr>" +
        "<tr>\n noise <td>1</td><td> 2  x </td></tr><tr><td>3</td><td>4</td></tr></table>")
    assert(t1 === Seq(Html.Table(
      Seq(Seq("A", "B"), Seq("1", "2 x"), Seq("3", "4")), 2)))
    // implicit closes: no </td>/</tr> at all (the real-web sloppy form)
    val t2 = Html.tables("<table><tr><td>a<td>b<tr><td>c<td>d</table>")
    assert(t2 === Seq(Html.Table(Seq(Seq("a", "b"), Seq("c", "d")), 0)))
    // nesting: inner table is its own entry, its text does NOT leak out;
    // order is by the OPENING tag
    val t3 = Html.tables(
      "<table><tr><td>out<table><tr><td>in</td></tr></table></td></tr></table>" +
        "<table><tr><td>second</td></tr></table>")
    assert(t3 === Seq(
      Html.Table(Seq(Seq("out")), 0),
      Html.Table(Seq(Seq("in")), 0),
      Html.Table(Seq(Seq("second")), 0)))
    // an unterminated table never emits; a rowless one emits empty
    assert(Html.tables("<table><tr><td>x</td></tr>") === Seq.empty)
    assert(Html.tables("<table></table>") === Seq(Html.Table(Seq.empty, 0)))
    // entities decode inside cells; a fake table inside a comment is skipped
    assert(Html.tables("<!--<table><tr><td>no</td></tr></table>-->" +
      "<table><tr><td>a &amp; b</td></tr></table>")
      === Seq(Html.Table(Seq(Seq("a & b")), 0)))
  }

  test("columnTypes: integer/date/text/empty, header excluded, ragged rows pad") {
    val t = Html.Table(Seq(
      Seq("h1", "h2", "h3", "h4"),
      Seq("12", "2026-01-02", "word", ""),
      Seq("-5", "2026-11-30", "42")), 4) // ragged last row
    assert(Html.columnTypes(t) === Seq("integer", "date", "text", "empty"))
    // one stray letter demotes integer to text; empty cells are neutral
    assert(Html.columnTypes(Html.Table(Seq(Seq("h"), Seq("12"), Seq("12a")), 1))
      === Seq("text"))
    assert(Html.columnTypes(Html.Table(Seq(Seq("h"), Seq(""), Seq("7")), 1))
      === Seq("integer"))
    // a bare '-' is not an integer; a malformed date is text
    assert(Html.columnTypes(Html.Table(Seq(Seq("h"), Seq("-")), 1)) === Seq("text"))
    assert(Html.columnTypes(Html.Table(Seq(Seq("h"), Seq("2026-1-02")), 1)) === Seq("text"))
    assert(Html.columnTypes(Html.Table(Seq.empty, 0)) === Seq.empty)
  }

  test("publishedDate: precedence classes, comment trap, first-in-class wins") {
    val article = """<meta property="article:published_time" content="2026-01-02">"""
    val named = """<meta name="Date" content="2025-03-04">"""
    val time = """<time datetime="2024-05-06">then</time>"""
    val deco = """<!-- <meta property="article:published_time" content="1999-01-01"> -->"""
    assert(Html.publishedDate(s"<html><head>$deco$article$named</head><body>$time</body></html>")
      === Some("2026-01-02"))
    assert(Html.publishedDate(s"<head>$named</head><body>$time</body>") === Some("2025-03-04"))
    assert(Html.publishedDate(s"<body><time>bare</time>$time</body>") === Some("2024-05-06"))
    assert(Html.publishedDate("<body><p>nothing</p></body>") === None)
    // first in class wins; a later article meta loses
    assert(Html.publishedDate(article +
      """<meta property="article:published_time" content="9999-12-31">""")
      === Some("2026-01-02"))
    // empty content is no candidate
    assert(Html.publishedDate("""<meta name="date" content="">""" + time) === Some("2024-05-06"))
  }
}
