package graft.sources

/** HTML visible-text extraction — the step between a crawl's HTTP body
  * and the `documents` table a training pipeline actually reads: tags
  * dropped, `<script>`/`<style>` CONTENT dropped (their text is code,
  * not prose — the classic extraction bug is letting it leak), comments
  * skipped, character entities decoded (the five XML names, `&nbsp;`,
  * and numeric references `&#NNN;`/`&#xHH;`), whitespace collapsed.
  * A single-pass scan (no DOM, no regex backtracking) so the extractor
  * is a per-row kernel a scan map runs at any corpus size.
  *
  * Real-markup robustness: `>` inside QUOTED attribute values does not
  * end a tag (the tag scan tracks '"'/'\'' state), and a bare `<` in
  * prose ("a < b") is literal text — only `<` followed by a letter,
  * `/`, `!` or `?` opens a tag, matching the HTML5 tokenizer's
  * less-than-sign rule. Remaining documented simplifications: named
  * entities beyond the six decoded pass through, `&#0;` and surrogate
  * references pass through undecoded, and unquoted attribute values
  * containing `>` (invalid HTML) end the tag early.
  */
object Html {

  final case class Extracted(title: String, text: String, nLinks: Int)

  /** Event sink for [[scanTags]] — the ONE tag/entity scanner all three
    * extractors ([[extract]], [[linkHrefs]], [[Boilerplate.blocks]])
    * drive, so a tokenizer-rule change (comment handling, quoted `>`,
    * entity decoding, bare `<`) can never diverge them.
    */
  private[sources] trait ScanHandler {
    /** Literal text run, a decoded entity, or a bare `<`/`&`. */
    def text(s: String): Unit
    /** A non-closing tag: `name` lowercased, `inner` the raw text
      * between `<` and the quote-aware `>` (name + attributes).
      */
    def open(name: String, inner: String): Unit
    /** A closing tag, `name` lowercased. */
    def close(name: String): Unit
  }

  /** Single-pass HTML tokenizer (no DOM, no regex): comments skipped,
    * `<script>`/`<style>` CONTENT dropped entirely, `>` inside quoted
    * attribute values does not end a tag, a bare `<` in prose is
    * literal text (HTML5 less-than-sign rule), the six named entities
    * and numeric references decoded. Unterminated constructs stop the
    * scan (events emitted so far stand). Emits events to `h`.
    */
  private[sources] def scanTags(html: String, h: ScanHandler): Unit = {
    val n = html.length
    def lowerAt(s: String, from: Int): Boolean =
      from + s.length <= n && html.regionMatches(true, from, s, 0, s.length)
    // position of the '>' ending the tag opened at `from`, honoring
    // quoted attribute values; -1 when the tag never closes
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
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      val nc = if (i + 1 < n) html.charAt(i + 1) else ' '
      if (c == '<' && !(nc.isLetter || nc == '/' || nc == '!' || nc == '?')) {
        // HTML5 tokenizer rule: '<' not opening a tag is literal text
        h.text("<"); i += 1
      } else if (c == '<') {
        if (lowerAt("<!--", i)) { // comment: skip to -->
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (lowerAt("<script", i) || lowerAt("<style", i)) {
          val tag = if (lowerAt("<script", i)) "script" else "style"
          val closeTag = s"</$tag"
          val j = tagEndQuoted(i)
          if (j < 0) { i = n }
          else {
            // find the matching close tag case-insensitively
            var k = j + 1
            var end = -1
            while (end < 0 && k < n) {
              if (html.charAt(k) == '<' && lowerAt(closeTag, k)) end = k
              k += 1
            }
            i = if (end < 0) n
                else math.max(html.indexOf('>', end) + 1, end + closeTag.length)
          }
        } else {
          val tagEnd = tagEndQuoted(i)
          if (tagEnd < 0) { i = n }
          else {
            val inner = html.substring(i + 1, tagEnd)
            if (inner.startsWith("/"))
              h.close(inner.drop(1).takeWhile(_.isLetterOrDigit)
                .toLowerCase(java.util.Locale.ROOT))
            else
              h.open(inner.takeWhile(_.isLetterOrDigit)
                .toLowerCase(java.util.Locale.ROOT), inner)
            i = tagEnd + 1
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i)
        val decoded =
          if (semi > i && semi - i <= 10) decodeRef(html.substring(i + 1, semi)) else None
        decoded match {
          case Some(rep) => h.text(rep); i = semi + 1
          case None => h.text("&"); i += 1
        }
      } else {
        // plain text: emit the whole run to the next special char at once
        var j = i + 1
        while (j < n && html.charAt(j) != '<' && html.charAt(j) != '&') j += 1
        h.text(html.substring(i, j))
        i = j
      }
    }
  }

  private def entity(name: String): Option[String] = name match {
    case "amp" => Some("&")
    case "lt" => Some("<")
    case "gt" => Some(">")
    case "quot" => Some("\"")
    case "apos" => Some("'")
    case "nbsp" => Some(" ")
    case _ => None
  }

  /** Decode `&name;` / `&#NNN;` / `&#xHH;` between `&` and `;`
    * (exclusive); None leaves the raw text untouched. Package-visible:
    * [[Boilerplate]] shares it so the two extractors decode entities
    * identically.
    */
  private[sources] def decodeRef(name: String): Option[String] =
    if (name.startsWith("#")) {
      val cp =
        try {
          if (name.length > 1 && (name.charAt(1) == 'x' || name.charAt(1) == 'X'))
            Some(Integer.parseInt(name.substring(2), 16))
          else Some(Integer.parseInt(name.substring(1)))
        } catch { case _: NumberFormatException => None }
      cp.filter(c => c > 0 && c <= 0x10ffff && !(c >= 0xd800 && c <= 0xdfff))
        .map(c => new String(Character.toChars(c)))
    } else entity(name)

  /** Raw content of every `<script>` block whose OPENING TAG contains
    * `typeContains` (case-insensitive), document order — the
    * structured-data channel: real pages ship machine-readable
    * metadata as `<script type="application/ld+json">{…}</script>`
    * (schema.org JSON-LD), exactly the content [[extract]] must DROP
    * from visible text and a training pipeline wants SEPARATELY. Same
    * quote-aware tag-end scan and case-insensitive close-tag search as
    * the visible-text pass; an unterminated block yields nothing.
    */
  def scriptBlocks(html: String, typeContains: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val n = html.length
    val needle = typeContains.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i < n) {
      if (html.charAt(i) == '<' && html.regionMatches(true, i, "<script", 0, 7)) {
        // quote-aware end of the opening tag
        var j = i + 1
        var quote = ' '
        var tagEnd = -1
        while (tagEnd < 0 && j < n) {
          val cj = html.charAt(j)
          if (quote != ' ') { if (cj == quote) quote = ' ' }
          else if (cj == '"' || cj == '\'') quote = cj
          else if (cj == '>') tagEnd = j
          j += 1
        }
        if (tagEnd < 0) return out.toSeq // unterminated opening tag
        val attrs = html.substring(i + 7, tagEnd).toLowerCase(java.util.Locale.ROOT)
        var k = tagEnd + 1
        var close = -1
        while (close < 0 && k < n) {
          if (html.charAt(k) == '<' && html.regionMatches(true, k, "</script", 0, 8)) close = k
          k += 1
        }
        if (close < 0) return out.toSeq // unterminated block
        if (attrs.contains(needle)) out += html.substring(tagEnd + 1, close)
        i = math.max(html.indexOf('>', close) + 1, close + 8)
      } else i += 1
    }
    out.toSeq
  }

  /** `attr`'s value inside a tag's attribute text, or None: the name,
    * optional whitespace, `=`, optional whitespace, then a quoted or
    * bare value. The attribute name must follow whitespace (so
    * `data-href=` does not match `href`), and the scan is quote-aware:
    * the name appearing INSIDE another attribute's quoted value (e.g.
    * `<a title="see href='x'" href="/real">`) is skipped over, not
    * mistaken for the attribute.
    */
  private def attrIn(inner: String, attr: String): Option[String] = {
    val n = inner.length
    val an = attr.length
    var i = 0
    var quote = ' '
    while (i < n) {
      val c = inner.charAt(i)
      if (quote != ' ') { if (c == quote) quote = ' '; i += 1 }
      else if (c == '"' || c == '\'') { quote = c; i += 1 }
      else if (inner.regionMatches(true, i, attr, 0, an) &&
               i > 0 && inner.charAt(i - 1).isWhitespace) {
        var j = i + an
        while (j < n && inner.charAt(j).isWhitespace) j += 1
        if (j < n && inner.charAt(j) == '=') {
          j += 1
          while (j < n && inner.charAt(j).isWhitespace) j += 1
          if (j < n && (inner.charAt(j) == '"' || inner.charAt(j) == '\'')) {
            val q = inner.charAt(j)
            val end = inner.indexOf(q, j + 1)
            return Some(if (end < 0) inner.substring(j + 1) else inner.substring(j + 1, end))
          } else {
            var end = j
            while (end < n && !inner.charAt(end).isWhitespace) end += 1
            return Some(inner.substring(j, end))
          }
        } else i += an
      } else i += 1
    }
    None
  }

  private def hrefIn(inner: String): Option[String] = attrIn(inner, "href")

  /** Outlink extraction — the WAT-file step of a crawl pipeline: the
    * `href` of every real `<a>` tag, document order. Follows the same
    * scan discipline as [[extract]] (comments skipped, script/style
    * CONTENT skipped — an anchor faked inside a JS string must not
    * count, quote-aware tag ends), so the link set and the visible
    * text always describe the same markup. Anchors without `href` are
    * skipped.
    */
  def linkHrefs(html: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    scanTags(html, new ScanHandler {
      def text(s: String): Unit = ()
      def open(name: String, inner: String): Unit =
        if (name == "a") hrefIn(inner).foreach(out += _)
      def close(name: String): Unit = ()
    })
    out.toSeq
  }

  /** Extract the `<title>` content, the whitespace-normalized visible
    * body text (title excluded — it is head metadata, not prose), and
    * the `<a>` tag count.
    */
  def extract(html: String): Extracted = {
    val body = new StringBuilder
    val title = new StringBuilder
    var nLinks = 0
    var inTitle = false
    scanTags(html, new ScanHandler {
      def text(s: String): Unit = (if (inTitle) title else body).append(s)
      def open(name: String, inner: String): Unit = {
        if (name == "a") nLinks += 1
        if (name == "title") inTitle = true
        // tags are word separators in visible text
        if (!inTitle) body.append(' ')
      }
      def close(name: String): Unit = {
        if (name == "title") inTitle = false
        if (!inTitle) body.append(' ')
      }
    })
    def normalize(sb: StringBuilder): String =
      sb.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
    Extracted(normalize(title), normalize(body), nLinks)
  }

  /** One extracted `<table>`: rows of whitespace-normalized cell texts
    * (a `<tr>` without cells is dropped) and the table's `<th>` count.
    */
  final case class Table(rows: Seq[Seq[String]], headerCells: Int)

  /** Relational table extraction (the WDC web-tables step of a corpus
    * pipeline — structured data mined OUT of pages): every COMPLETED
    * `<table>` in document order of its opening tag. Nested tables are
    * their own entries and their content does NOT leak into the outer
    * cell (a stack of builders, one per open table). Cell semantics:
    * `<td>`/`<th>` opens a cell (implicitly closing an open one),
    * `<tr>` a row (implicitly closing the previous), text binds only to
    * the OPEN CELL (content directly under `<tr>`/`<table>` is markup
    * noise and drops), `<th>` cells count toward `headerCells`, and an
    * unterminated table never emits — same strictness family as the
    * other extractors. Drives [[scanTags]], so comment/script/quote
    * handling can never diverge from [[extract]].
    */
  def tables(html: String): Seq[Table] = {
    final class Builder(val ord: Int) {
      val rows = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var row: scala.collection.mutable.ArrayBuffer[String] = null
      var cell: StringBuilder = null
      var nHeader = 0
      def closeCell(): Unit = if (cell != null) {
        row += cell.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
        cell = null
      }
      def closeRow(): Unit = {
        closeCell()
        if (row != null && row.nonEmpty) rows += row.toSeq
        row = null
      }
    }
    val done = scala.collection.mutable.ArrayBuffer[(Int, Table)]()
    var nextOrd = 0
    val stack = scala.collection.mutable.Stack[Builder]()
    scanTags(html, new ScanHandler {
      def text(s: String): Unit =
        if (stack.nonEmpty && stack.top.cell != null) stack.top.cell.append(s)
      def open(name: String, inner: String): Unit = name match {
        case "table" =>
          stack.push(new Builder(nextOrd)); nextOrd += 1
        case "tr" if stack.nonEmpty =>
          stack.top.closeRow()
          stack.top.row = scala.collection.mutable.ArrayBuffer[String]()
        case "td" | "th" if stack.nonEmpty && stack.top.row != null =>
          stack.top.closeCell()
          stack.top.cell = new StringBuilder
          if (name == "th") stack.top.nHeader += 1
        case _ => ()
      }
      def close(name: String): Unit = name match {
        case "td" | "th" if stack.nonEmpty => stack.top.closeCell()
        case "tr" if stack.nonEmpty => stack.top.closeRow()
        case "table" if stack.nonEmpty =>
          val b = stack.pop()
          b.closeRow()
          done += ((b.ord, Table(b.rows.toSeq, b.nHeader)))
        case _ => ()
      }
    })
    done.sortBy(_._1).map(_._2).toSeq
  }

  /** Column-type inference over an extracted [[Table]] — the
    * web-tables step AFTER extraction (WDC-style table understanding:
    * a relational corpus is only queryable once columns carry types).
    * Per column, header row excluded and ragged rows padded empty:
    * `integer` when every non-empty body cell is an optionally-signed
    * digit run, `date` when every non-empty cell is `YYYY-MM-DD`,
    * `text` otherwise, `empty` when no body cell has content. Column
    * count is the widest row's.
    */
  def columnTypes(t: Table): Seq[String] = {
    val body = t.rows.drop(1)
    val nCols = (0 +: t.rows.map(_.length)).max
    def isInt(s: String): Boolean = {
      val u = if (s.startsWith("-")) s.substring(1) else s
      u.nonEmpty && u.forall(c => c >= '0' && c <= '9')
    }
    def isDate(s: String): Boolean =
      s.length == 10 && s(4) == '-' && s(7) == '-' &&
        Seq(0, 1, 2, 3, 5, 6, 8, 9).forall(i => s(i) >= '0' && s(i) <= '9')
    (0 until nCols).map { j =>
      val cells = body.map(r => if (j < r.length) r(j) else "").filter(_.nonEmpty)
      if (cells.isEmpty) "empty"
      else if (cells.forall(isInt)) "integer"
      else if (cells.forall(isDate)) "date"
      else "text"
    }
  }

  /** Publish-date extraction with the published precedence (the
    * trafilatura/newspaper convention): the OpenGraph/article meta
    * (`<meta property="article:published_time" content=…>`) beats a
    * generic `<meta name="date" content=…>` beats the first
    * `<time datetime=…>` — precedence CLASS wins over document order,
    * first hit within a class. None when no candidate carries a value.
    */
  def publishedDate(html: String): Option[String] = {
    var meta: Option[String] = None
    var named: Option[String] = None
    var time: Option[String] = None
    scanTags(html, new ScanHandler {
      def text(s: String): Unit = ()
      def open(name: String, inner: String): Unit = name match {
        case "meta" =>
          val prop = attrIn(inner, "property").orElse(attrIn(inner, "name"))
            .map(_.toLowerCase(java.util.Locale.ROOT))
          if (prop.contains("article:published_time") && meta.isEmpty)
            meta = attrIn(inner, "content").filter(_.nonEmpty)
          else if (prop.contains("date") && named.isEmpty)
            named = attrIn(inner, "content").filter(_.nonEmpty)
        case "time" =>
          if (time.isEmpty) time = attrIn(inner, "datetime").filter(_.nonEmpty)
        case _ => ()
      }
      def close(name: String): Unit = ()
    })
    meta.orElse(named).orElse(time)
  }

  /** Canonical-URL extraction — the strongest URL-level dedup signal a
    * page can carry: `<link rel="canonical" href=…>` beats the OpenGraph
    * `<meta property="og:url" content=…>` fallback (the published
    * search-engine precedence); first hit within a class wins, empty
    * values are no candidate. The `rel` match is token-aware
    * (`rel="stylesheet canonical"` counts, `rel="canonicalish"` does
    * not) and case-insensitive.
    */
  def canonicalLink(html: String): Option[String] = {
    var link: Option[String] = None
    var og: Option[String] = None
    scanTags(html, new ScanHandler {
      def text(s: String): Unit = ()
      def open(name: String, inner: String): Unit = name match {
        case "link" if link.isEmpty =>
          val isCanon = attrIn(inner, "rel").exists(
            _.toLowerCase(java.util.Locale.ROOT).split("\\s+").contains("canonical"))
          if (isCanon) link = attrIn(inner, "href").filter(_.nonEmpty)
        case "meta" if og.isEmpty =>
          if (attrIn(inner, "property").map(_.toLowerCase(java.util.Locale.ROOT))
              .contains("og:url"))
            og = attrIn(inner, "content").filter(_.nonEmpty)
        case _ => ()
      }
      def close(name: String): Unit = ()
    })
    link.orElse(og)
  }

  /** Robots META directives (the Robots Exclusion Protocol's page-level
    * half — `<meta name="robots" content="noindex, nofollow">`): the
    * lowercased, deduplicated directive set across every robots meta in
    * the page (multiple metas UNION, the published crawler behavior —
    * the most restrictive combination applies). Directives split on
    * commas, whitespace-trimmed; named-bot metas (`name="googlebot"`)
    * do not bind a generic crawler and are skipped.
    */
  def metaRobots(html: String): Set[String] = {
    val out = scala.collection.mutable.LinkedHashSet[String]()
    scanTags(html, new ScanHandler {
      def text(s: String): Unit = ()
      def open(name: String, inner: String): Unit =
        if (name == "meta" &&
            attrIn(inner, "name").map(_.toLowerCase(java.util.Locale.ROOT))
              .contains("robots"))
          attrIn(inner, "content").foreach(_.split(",").foreach { d =>
            val t = d.trim.toLowerCase(java.util.Locale.ROOT)
            if (t.nonEmpty) out += t
          })
      def close(name: String): Unit = ()
    })
    out.toSet
  }
}
