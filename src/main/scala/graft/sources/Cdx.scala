package graft.sources

/** CDX-J crawl index records — the crawl-scale analog of
  * [[Manifest]]'s min/max file pruning and of the reference's partition
  * predicate pushdown (`data-s3-elastic-transfer.py:301-308`):
  * CommonCrawl ships per-segment indexes mapping a SURT-sorted URL key
  * to the exact `(filename, offset, length)` byte range of that
  * capture's gzip member, so a fetcher answering a URL predicate reads
  * ONLY the matching members of the matching segments — never the other
  * 99.99% of the archive. This is the published CDXJ shape (OpenWayback
  * / CommonCrawl cdx-toolkit): one line per capture,
  *
  *   `<SURT key> <14-digit timestamp> <flat JSON>`
  *
  * with `offset`/`length` carried as JSON STRINGS (the quirk the real
  * index files have). The writer emits that shape; the parser walks it
  * back strictly — a malformed line, non-digit timestamp, bad escape,
  * non-numeric offset/length or trailing garbage rejects the WHOLE
  * index with `None` (an index that lies about byte ranges cannot be
  * trusted line-by-line), mirroring the `Warc.parseRecords` contract.
  */
object Cdx {

  /** One capture: its SURT key, original URL, 14-digit timestamp and
    * the byte range of its gzip member inside the segment file.
    */
  final case class Entry(surt: String, url: String, timestamp: String,
      offset: Long, length: Long)

  private def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Serialize `entries` as CDXJ lines (no trailing newline). The SURT
    * key and timestamp are NOT escapable in the line grammar (they are
    * space-delimited prefix fields), so an entry whose key contains
    * whitespace/control bytes or whose timestamp is not exactly 14
    * ASCII digits would serialize to a line the strict parser rejects
    * wholesale — require them well-formed up front instead.
    */
  def writeCdxj(entries: Seq[Entry]): String =
    entries.map { e =>
      require(e.surt.nonEmpty && !e.surt.exists(_ <= ' '),
        s"SURT key must be non-empty with no space/control chars: '${e.surt}'")
      require(e.timestamp.length == 14 && e.timestamp.forall(isAsciiDigit),
        s"timestamp must be 14 ASCII digits: '${e.timestamp}'")
      s"""${e.surt} ${e.timestamp} {"url": "${escape(e.url)}", """ +
        s""""offset": "${e.offset}", "length": "${e.length}"}"""
    }.mkString("\n")

  /** Parse a flat JSON object with STRING values only — the CDXJ field
    * payload. Returns None on any grammar violation.
    */
  private def parseFlatJson(s: String): Option[Map[String, String]] = {
    var i = 0
    val n = s.length
    def ws(): Unit = while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    def str(): Option[String] = {
      if (i >= n || s.charAt(i) != '"') return None
      i += 1
      val sb = new StringBuilder
      while (i < n && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= n) return None
          s.charAt(i + 1) match {
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '/' => sb.append('/'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'u' =>
              if (i + 6 > n) return None
              val h = s.substring(i + 2, i + 6)
              // ASCII hex ONLY: Char.isDigit / Character.digit accept
              // Unicode digit classes, which the strict grammar must not.
              if (!h.forall(c2 => (c2 >= '0' && c2 <= '9') || (c2 >= 'a' && c2 <= 'f') || (c2 >= 'A' && c2 <= 'F')))
                return None
              sb.append(Integer.parseInt(h, 16).toChar); i += 6
            case _ => return None
          }
        } else { sb.append(c); i += 1 }
      }
      if (i >= n) return None
      i += 1 // closing quote
      Some(sb.toString)
    }
    ws()
    if (i >= n || s.charAt(i) != '{') return None
    i += 1
    val m = scala.collection.mutable.LinkedHashMap[String, String]()
    ws()
    if (i < n && s.charAt(i) == '}') { i += 1 }
    else {
      var more = true
      while (more) {
        ws()
        val k = str().getOrElse(return None)
        ws()
        if (i >= n || s.charAt(i) != ':') return None
        i += 1; ws()
        val v = str().getOrElse(return None)
        m(k) = v
        ws()
        if (i < n && s.charAt(i) == ',') { i += 1 }
        else if (i < n && s.charAt(i) == '}') { i += 1; more = false }
        else return None
      }
    }
    ws()
    if (i != n) return None // trailing garbage
    Some(m.toMap)
  }

  /** Parse CDXJ `text` back into entries, strictly: every line must be
    * `surt SP 14-digit-timestamp SP {json}` with url/offset/length
    * present and numeric ranges non-negative. None on any violation.
    */
  def parseCdxj(text: String): Option[Seq[Entry]] = {
    if (text.isEmpty) return Some(Seq.empty)
    val out = scala.collection.mutable.ArrayBuffer[Entry]()
    text.split("\n", -1).foreach { line =>
      val sp1 = line.indexOf(' ')
      if (sp1 <= 0) return None
      val sp2 = line.indexOf(' ', sp1 + 1)
      if (sp2 < 0) return None
      val surt = line.substring(0, sp1)
      val ts = line.substring(sp1 + 1, sp2)
      if (ts.length != 14 || !ts.forall(isAsciiDigit)) return None
      val json = parseFlatJson(line.substring(sp2 + 1)).getOrElse(return None)
      val url = json.getOrElse("url", return None)
      def num(k: String): Option[Long] = json.get(k)
        .filter(v => v.nonEmpty && v.length <= 18 && v.forall(isAsciiDigit))
        .map(_.toLong)
      val off = num("offset").getOrElse(return None)
      val len = num("length").getOrElse(return None)
      out += Entry(surt, url, ts, off, len)
    }
    Some(out.toSeq)
  }

  /** One `cluster.idx` line of a TWO-LEVEL index: the FIRST (surt,
    * timestamp) of a gzip'd CDXJ block and that block's exact byte
    * range inside its shard. This is the published CommonCrawl index
    * layout (cdx-toolkit / pywb ZipNum): the per-crawl index is ~300 GB
    * of gzip-sharded cdx blocks plus a small plain-text secondary
    * (`cluster.idx`) holding one line per block; a single-URL lookup
    * binary-searches the secondary and gunzips ONE block, never the
    * other 99.999% of the index.
    */
  final case class ClusterEntry(firstSurt: String, firstTs: String,
      offset: Long, length: Long)

  /** Build one shard of a two-level index from `entries` (must already
    * be sorted by (surt, timestamp) — the sort IS the index): every
    * `blockSize` lines become one CDXJ block gzip'd as its OWN RFC 1952
    * member (so a reader can range-request any block independently),
    * members concatenated into the shard bytes; the secondary carries
    * each block's first key and byte range.
    */
  def writeClustered(entries: Seq[Entry], blockSize: Int,
      codec: Warc.GzipCodec): (Array[Byte], Seq[ClusterEntry]) = {
    require(blockSize > 0, "blockSize must be positive")
    require(entries.iterator.sliding(2).withPartial(false).forall { w =>
      val a = w(0); val b = w(1)
      a.surt < b.surt || (a.surt == b.surt && a.timestamp <= b.timestamp)
    }, "entries must be sorted by (surt, timestamp)")
    val shard = new java.io.ByteArrayOutputStream()
    val cluster = scala.collection.mutable.ArrayBuffer[ClusterEntry]()
    entries.grouped(blockSize).foreach { block =>
      val member = codec.gzip((writeCdxj(block) + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      cluster += ClusterEntry(block.head.surt, block.head.timestamp,
        shard.size().toLong, member.length.toLong)
      shard.write(member)
    }
    (shard.toByteArray, cluster.toSeq)
  }

  /** Binary-search the secondary for the blocks that can contain keys
    * in `[fromKey, toKey)`: block i covers `[first_i, first_{i+1})`,
    * so the answer is the HALF-OPEN run starting at the last block
    * whose first key is <= fromKey and ending before the first block
    * whose first key is >= toKey. O(log blocks) compares — the whole
    * point of the secondary; returns (startBlock, endBlock) indices.
    */
  def searchCluster(cluster: IndexedSeq[ClusterEntry],
      fromKey: String, toKey: String): (Int, Int) = {
    if (cluster.isEmpty || fromKey >= toKey) return (0, 0)
    // lower: last index with firstSurt <= fromKey (0 when none)
    var lo = 0; var hi = cluster.length // invariant: answer in [lo-1, hi)
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cluster(mid).firstSurt <= fromKey) lo = mid + 1 else hi = mid
    }
    val start = math.max(0, lo - 1)
    // upper: first index with firstSurt >= toKey
    var lo2 = start; var hi2 = cluster.length
    while (lo2 < hi2) {
      val mid = (lo2 + hi2) >>> 1
      if (cluster(mid).firstSurt < toKey) lo2 = mid + 1 else hi2 = mid
    }
    (start, lo2)
  }

  /** Gunzip + parse ONE block by its secondary entry. None on any
    * transport or grammar violation (same strictness as [[parseCdxj]]).
    */
  def readBlock(shard: Array[Byte], ce: ClusterEntry,
      codec: Warc.GzipCodec): Option[Seq[Entry]] = {
    if (ce.offset < 0 || ce.length <= 0 || ce.offset + ce.length > shard.length) return None
    val member = java.util.Arrays.copyOfRange(
      shard, ce.offset.toInt, (ce.offset + ce.length).toInt)
    codec.gunzip(member).flatMap { bytes =>
      val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      parseCdxj(if (text.endsWith("\n")) text.dropRight(1) else text)
    }
  }

  /** Two-level lookup: binary-search the secondary, gunzip ONLY the
    * selected blocks, filter to the exact key range. None if a selected
    * block is corrupt; blocks outside `(start, end)` are never touched.
    */
  def lookupClustered(shard: Array[Byte], cluster: IndexedSeq[ClusterEntry],
      fromKey: String, toKey: String, codec: Warc.GzipCodec): Option[Seq[Entry]] = {
    val (start, end) = searchCluster(cluster, fromKey, toKey)
    val out = scala.collection.mutable.ArrayBuffer[Entry]()
    var i = start
    while (i < end) {
      out ++= readBlock(shard, cluster(i), codec).getOrElse(return None)
        .filter(e => e.surt >= fromKey && e.surt < toKey)
      i += 1
    }
    Some(out.toSeq)
  }
}
