package graft.sources

/** HTML visible-text extraction — the step between a crawl's HTTP body
  * and the `documents` table a training pipeline actually reads: tags
  * dropped, `<script>`/`<style>` CONTENT dropped (their text is code,
  * not prose — the classic extraction bug is letting it leak), comments
  * skipped, the basic character entities decoded, whitespace collapsed.
  * A single-pass scan (no DOM, no regex backtracking) so the extractor
  * is a per-row kernel a scan map runs at any corpus size.
  *
  * Simplifications documented: attribute values are assumed not to
  * contain `>` (true of the overwhelming majority of real markup), and
  * only the five XML entities + `&nbsp;` decode — numeric references
  * pass through.
  */
object Html {

  final case class Extracted(title: String, text: String, nLinks: Int)

  private def entity(name: String): Option[String] = name match {
    case "amp" => Some("&")
    case "lt" => Some("<")
    case "gt" => Some(">")
    case "quot" => Some("\"")
    case "apos" => Some("'")
    case "nbsp" => Some(" ")
    case _ => None
  }

  /** Extract the `<title>` content, the whitespace-normalized visible
    * body text (title excluded — it is head metadata, not prose), and
    * the `<a>` tag count.
    */
  def extract(html: String): Extracted = {
    val text = new StringBuilder
    val title = new StringBuilder
    var nLinks = 0
    var i = 0
    var inTitle = false
    val n = html.length
    def lowerAt(s: String, from: Int): Boolean =
      from + s.length <= n && html.regionMatches(true, from, s, 0, s.length)
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (lowerAt("<!--", i)) { // comment: skip to -->
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (lowerAt("<script", i) || lowerAt("<style", i)) {
          val tag = if (lowerAt("<script", i)) "script" else "style"
          val close = s"</$tag"
          var j = html.indexOf('>', i)
          if (j < 0) { i = n }
          else {
            // find the matching close tag case-insensitively
            var k = j + 1
            var end = -1
            while (end < 0 && k < n) {
              if (html.charAt(k) == '<' && lowerAt(close, k)) end = k
              k += 1
            }
            i = if (end < 0) n else math.max(html.indexOf('>', end) + 1, end + close.length)
          }
        } else {
          // a normal tag: read its name, then skip to '>'
          val tagEnd = html.indexOf('>', i)
          if (tagEnd < 0) { i = n }
          else {
            val inner = html.substring(i + 1, tagEnd)
            val name = inner.takeWhile(ch => ch.isLetterOrDigit).toLowerCase(java.util.Locale.ROOT)
            val closing = inner.startsWith("/")
            val closeName =
              if (closing) inner.drop(1).takeWhile(_.isLetterOrDigit).toLowerCase(java.util.Locale.ROOT)
              else ""
            if (name == "a") nLinks += 1
            if (name == "title") inTitle = true
            if (closing && closeName == "title") inTitle = false
            // tags are word separators in visible text
            if (!inTitle) text.append(' ')
            i = tagEnd + 1
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i)
        val decoded =
          if (semi > i && semi - i <= 7) entity(html.substring(i + 1, semi)) else None
        decoded match {
          case Some(rep) =>
            (if (inTitle) title else text).append(rep)
            i = semi + 1
          case None =>
            (if (inTitle) title else text).append(c)
            i += 1
        }
      } else {
        (if (inTitle) title else text).append(c)
        i += 1
      }
    }
    def normalize(sb: StringBuilder): String =
      sb.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
    Extracted(normalize(title), normalize(text), nLinks)
  }
}
