package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins the block segmentation and the content rules one by one: block
  * boundaries, chrome exclusion, the MinWords floor, the 1/3
  * link-density rule (including the exact tie), anchor-word counting
  * across inline tags, and agreement with Html.extract on what text
  * exists at all.
  */
class BoilerplateSpec extends AnyFunSuite {

  test("blocks segment at block tags; chrome (nav/footer/aside/header) marks inChrome") {
    val html = "<body><header><h1>Site</h1><nav><li><a href='/'>home</a></li></nav></header>" +
      "<p>real prose with enough words here</p>" +
      "<footer><p>Copyright year holder all rights reserved</p></footer></body>"
    val bs = Boilerplate.blocks(html)
    assert(bs.map(b => (b.text, b.inChrome)) === Seq(
      ("Site", true), ("home", true),
      ("real prose with enough words here", false),
      ("Copyright year holder all rights reserved", true)))
    // the footer para is long, link-free PROSE — only the chrome rule
    // excludes it
    assert(bs.filter(_.isContent).map(_.text) === Seq("real prose with enough words here"))
  }

  test("MinWords floor and the 1/3 link-density rule, including the exact tie") {
    val html = "<body><p>too short</p>" +
      "<p>See <a href='#'>ref one</a> also <a href='#'>quick list</a> now</p>" + // 4/7 anchors
      "<p><a href='#'>tag x</a> tie case row x</p>" + // 2/6 = exactly 1/3: kept
      "<p>plain paragraph with five words</p></body>"
    val bs = Boilerplate.blocks(html)
    assert(bs.map(b => (b.nWords, b.nAnchorWords)) === Seq((2, 0), (7, 4), (6, 2), (5, 0)))
    assert(bs.map(_.isContent) === Seq(false, false, true, true))
    assert(Boilerplate.mainText(html) === "tag x tie case row x plain paragraph with five words")
  }

  test("anchor depth nests; script/style/comments/entities follow Html.extract exactly") {
    val html = "<body><p><a href='#'>outer <b>inner</b> words</a> tail word</p>" +
      "<script>var x = '<p>leak</p>';</script>" +
      "<p>a &amp; b &#x2019; c plus words</p><!-- <p>gone</p> --></body>"
    val bs = Boilerplate.blocks(html)
    assert(bs(0).nWords === 5 && bs(0).nAnchorWords === 3)
    assert(bs(1).text === "a & b ’ c plus words")
    // the two extractors agree on what text EXISTS
    assert(bs.map(_.text).mkString(" ") === Html.extract(html).text)
  }

  test("title is excluded; empty blocks are skipped; index counts non-empty blocks only") {
    val bs = Boilerplate.blocks(
      "<html><head><title>My Title</title></head><body><div></div><ul></ul>" +
        "<p>only actual words make blocks here</p></body></html>")
    assert(bs.map(_.idx) === Seq(0))
    assert(bs.head.text === "only actual words make blocks here")
  }
}
