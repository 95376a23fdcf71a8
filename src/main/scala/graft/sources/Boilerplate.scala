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

  /** Segment `html` into its non-empty text blocks, document order. */
  def blocks(html: String): Seq[Block] = {
    val out = scala.collection.mutable.ArrayBuffer[Block]()
    val text = new StringBuilder
    val anchorText = new StringBuilder
    var chromeDepth = 0
    var anchorDepth = 0
    var inTitle = false
    val n = html.length
    def words(sb: StringBuilder): Array[String] =
      sb.toString.split("\\s+").filter(_.nonEmpty)
    def flush(): Unit = {
      val w = words(text)
      if (w.nonEmpty)
        out += Block(out.length, chromeDepth > 0, w.mkString(" "),
          w.length, words(anchorText).length)
      text.clear(); anchorText.clear()
    }
    def lowerAt(s: String, from: Int): Boolean =
      from + s.length <= n && html.regionMatches(true, from, s, 0, s.length)
    def tagEndQuoted(from: Int): Int = {
      var j = from + 1
      var quote = ' '
      while (j < n) {
        val cj = html.charAt(j)
        if (quote != ' ') { if (cj == quote) quote = ' ' }
        else if (cj == '"' || cj == '\'') quote = cj
        else if (cj == '>') return j
        j += 1
      }
      -1
    }
    def append(s: String): Unit = if (!inTitle) {
      text.append(s)
      if (anchorDepth > 0) anchorText.append(s)
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      val nc = if (i + 1 < n) html.charAt(i + 1) else ' '
      if (c == '<' && !(nc.isLetter || nc == '/' || nc == '!' || nc == '?')) {
        append(c.toString); i += 1
      } else if (c == '<') {
        if (lowerAt("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (lowerAt("<script", i) || lowerAt("<style", i)) {
          val tag = if (lowerAt("<script", i)) "script" else "style"
          val close = s"</$tag"
          var j = tagEndQuoted(i)
          if (j < 0) { i = n }
          else {
            var k = j + 1
            var end = -1
            while (end < 0 && k < n) {
              if (html.charAt(k) == '<' && lowerAt(close, k)) end = k
              k += 1
            }
            i = if (end < 0) n else math.max(html.indexOf('>', end) + 1, end + close.length)
          }
        } else {
          val tagEnd = tagEndQuoted(i)
          if (tagEnd < 0) { i = n }
          else {
            val inner = html.substring(i + 1, tagEnd)
            val closing = inner.startsWith("/")
            val name = (if (closing) inner.drop(1) else inner)
              .takeWhile(_.isLetterOrDigit).toLowerCase(java.util.Locale.ROOT)
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
              text.append(' ')
              if (anchorDepth > 0) anchorText.append(' ')
            }
            i = tagEnd + 1
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i)
        val decoded =
          if (semi > i && semi - i <= 10) Html.decodeRef(html.substring(i + 1, semi))
          else None
        decoded match {
          case Some(rep) => append(rep); i = semi + 1
          case None => append(c.toString); i += 1
        }
      } else {
        append(c.toString); i += 1
      }
    }
    flush()
    out.toSeq
  }

  /** The page's main content: text of every CONTENT block (see object
    * doc rule 3), document order, single-space joined.
    */
  def mainText(html: String): String =
    blocks(html).filter(_.isContent).map(_.text).mkString(" ")
}
