package graft.sources

/** Boilerplate removal / main-content extraction — the step between
  * [[Html]]'s raw visible text and the text a training pipeline should
  * actually keep: navigation bars, footers, sidebars and link farms
  * stripped, article prose retained. This is the published
  * link-density heuristic family (Kohlschütter et al.'s boilerpipe and
  * Pomikálek's jusText — both public algorithms) reduced to a
  * DETERMINISTIC rule set an oracle can replay in closed form:
  *
  *   1. The page is segmented into BLOCKS at block-level tag
  *      boundaries (`p div h1..h6 li ul ol td tr table section article
  *      header footer nav aside main blockquote pre br`).
  *   2. Each block carries its word count and its ANCHOR word count
  *      (words written inside an `<a>` element).
  *   3. A block is CONTENT iff it is not inside chrome (`nav`,
  *      `footer`, `aside`, `header` — structural page furniture), has
  *      at least [[MinWords]] words, and its link density is at most
  *      one third (`3 * nAnchorWords <= nWords`) — the boilerpipe
  *      observation that boilerplate is short and link-dense while
  *      prose is long and link-sparse.
  *
  * The scan itself follows [[Html.extract]]'s conventions exactly
  * (script/style content dropped, comments skipped, named + numeric
  * entities decoded, quote-aware tag ends, bare `<` as prose) so the
  * two extractors never disagree about what text EXISTS — only about
  * which blocks to keep. Single pass, no DOM: a per-row kernel a scan
  * map runs at any corpus size.
  */
object Boilerplate {

  /** Minimum words for a block to be considered prose. */
  val MinWords = 4

  /** One segmented block, in document order (`idx` counts only
    * non-empty blocks). `inChrome` = opened inside nav/footer/aside/
    * header at any depth.
    */
  final case class Block(idx: Int, inChrome: Boolean, text: String,
      nWords: Int, nAnchorWords: Int) {
    def isContent: Boolean =
      !inChrome && nWords >= MinWords && 3 * nAnchorWords <= nWords
  }

  private val BlockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "td", "tr", "table", "section", "article", "header", "footer",
    "nav", "aside", "main", "blockquote", "pre", "br")

  private val ChromeTags = Set("nav", "footer", "aside", "header")

  /** Segment `html` into its non-empty text blocks, document order.
    * Drives [[Html.scanTags]] — the one shared tokenizer — so this
    * extractor can never disagree with [[Html.extract]] /
    * [[Html.linkHrefs]] about what text exists.
    */
  def blocks(html: String): Seq[Block] = {
    val out = scala.collection.mutable.ArrayBuffer[Block]()
    val bodyText = new StringBuilder
    val anchorText = new StringBuilder
    var chromeDepth = 0
    var anchorDepth = 0
    var inTitle = false
    def words(sb: StringBuilder): Array[String] =
      sb.toString.split("\\s+").filter(_.nonEmpty)
    def flush(): Unit = {
      val w = words(bodyText)
      if (w.nonEmpty)
        out += Block(out.length, chromeDepth > 0, w.mkString(" "),
          w.length, words(anchorText).length)
      bodyText.clear(); anchorText.clear()
    }
    def onTag(name: String, closing: Boolean): Unit = {
      if (name == "title") inTitle = !closing
      else if (name == "a") {
        if (closing) { if (anchorDepth > 0) anchorDepth -= 1 }
        else anchorDepth += 1
      }
      if (BlockTags.contains(name)) {
        // a block boundary on BOTH open and close: whatever text
        // accumulated belongs to the block that just ended
        flush()
        if (ChromeTags.contains(name)) {
          if (closing) { if (chromeDepth > 0) chromeDepth -= 1 }
          else chromeDepth += 1
        }
      } else if (!inTitle) {
        // inline tags are word separators, same as Html.extract
        bodyText.append(' ')
        if (anchorDepth > 0) anchorText.append(' ')
      }
    }
    Html.scanTags(html, new Html.ScanHandler {
      def text(s: String): Unit = if (!inTitle) {
        bodyText.append(s)
        if (anchorDepth > 0) anchorText.append(s)
      }
      def open(name: String, inner: String): Unit = onTag(name, closing = false)
      def close(name: String): Unit = onTag(name, closing = true)
    })
    flush()
    out.toSeq
  }

  /** The page's main content: text of every CONTENT block (see object
    * doc rule 3), document order, single-space joined.
    */
  def mainText(html: String): String =
    blocks(html).filter(_.isContent).map(_.text).mkString(" ")
}
