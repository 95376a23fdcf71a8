package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** CDXJ index format (write→parse strictness) and the pruning contract:
  * a SURT-selected fetch reads ONLY the indexed byte ranges — pinned by
  * corrupting every NON-selected member of a segment and fetching
  * through the index anyway.
  */
class CdxSpec extends AnyFunSuite {
  import Cdx._

  private val entries = Seq(
    Entry("com,example)/a", "http://example.com/a", "20260101000000", 0L, 120L),
    Entry("com,example)/b?q=1", "http://example.com/b?q=1", "20260102030405", 120L, 77L),
    Entry("org,site,www)/x", "http://www.site.org/x", "20261231235959", 197L, 9L))

  test("CDXJ round trip: write then strict parse is identity, incl. escapes") {
    assert(parseCdxj(writeCdxj(entries)) === Some(entries))
    val quoted = Entry("com,e)/q", "http://e.com/\"quote\\back\"", "20260101000000", 5L, 6L)
    assert(parseCdxj(writeCdxj(Seq(quoted))) === Some(Seq(quoted)))
    assert(parseCdxj("") === Some(Seq.empty))
  }

  test("strict rejection: malformed lines, timestamps, json, ranges are None") {
    val good = writeCdxj(entries)
    assert(parseCdxj(good + "\n").isEmpty) // trailing empty line
    assert(parseCdxj("no-spaces-here").isEmpty)
    assert(parseCdxj("surt 2026 {\"url\": \"u\", \"offset\": \"0\", \"length\": \"1\"}").isEmpty) // short ts
    assert(parseCdxj("surt 2026010100000x {\"url\": \"u\", \"offset\": \"0\", \"length\": \"1\"}").isEmpty)
    assert(parseCdxj("surt 20260101000000 {\"url\": \"u\", \"offset\": \"0\"}").isEmpty) // no length
    assert(parseCdxj("surt 20260101000000 {\"url\": \"u\", \"offset\": \"-1\", \"length\": \"1\"}").isEmpty)
    assert(parseCdxj("surt 20260101000000 {\"url\": \"u\", \"offset\": \"0\", \"length\": \"x\"}").isEmpty)
    assert(parseCdxj("surt 20260101000000 {\"url\": \"u\" \"offset\": \"0\", \"length\": \"1\"}").isEmpty)
    assert(parseCdxj("surt 20260101000000 {\"url\": \"u\", \"offset\": \"0\", \"length\": \"1\"} x").isEmpty)
    assert(parseCdxj("surt 20260101000000 {\"url\": \"\\q\", \"offset\": \"0\", \"length\": \"1\"}").isEmpty)
  }

  test("surtKey: host reversal, case, default port, query sort, non-default port") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val got = Seq(
      "HTTP://News.Example.COM:80/World/X?b=2&a=1",
      "https://www.site.org/Path#frag",
      "http://example.com:8080/y",
      "http://example.com").toDF("url")
      .select(graft.functions.UrlFunctions.surtKey(col("url")).as("surt"))
      .as[String].collect().toSeq
    assert(got === Seq(
      "com,example,news)/world/x?a=1&b=2",
      "org,site,www)/path",
      "com,example:8080)/y",
      // root pages key as host)/ — matches published CommonCrawl keys
      "com,example)/"))
  }

  test("pruned fetch reads ONLY indexed ranges: corrupt non-selected members, fetch survives") {
    val codec = new Warc.GzipCodec
    val docs = (0 until 8).map { i =>
      val host = if (i % 2 == 0) "keep.com" else "drop.com"
      Warc.Record("response", s"<urn:uuid:$i>", s"http://$host/doc/$i",
        s"body of document $i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val seg = new java.io.ByteArrayOutputStream()
    val idx = docs.map { r =>
      val member = codec.gzip(Warc.writeRecords(Seq(r)))
      val e = Entry(s"com,${r.targetUri.split('/')(2).split('.').head}...", r.targetUri,
        "20260101000000", seg.size().toLong, member.length.toLong)
      seg.write(member)
      e
    }
    val bytes = seg.toByteArray
    // poison every byte of every NON-keep member
    idx.filter(e => !e.url.contains("keep.com")).foreach { e =>
      var i = e.offset.toInt
      while (i < (e.offset + e.length).toInt) { bytes(i) = 0x5a; i += 1 }
    }
    // the whole segment is now un-parseable front to back…
    assert(Warc.parseRecords(bytes, Some(codec)).isEmpty)
    // …but an index-driven range fetch of the keep members still works
    val kept = idx.filter(_.url.contains("keep.com")).map { e =>
      val member = java.util.Arrays.copyOfRange(bytes, e.offset.toInt, (e.offset + e.length).toInt)
      Warc.parseRecords(member, Some(codec)).get.head.targetUri
    }
    assert(kept === Seq(0, 2, 4, 6).map(i => s"http://keep.com/doc/$i"))
  }

  test("two-level index: binary search touches only the selected blocks (poisoned-block trap)") {
    val codec = new Warc.GzipCodec
    // 40 sorted keys across 10 blocks of 4; the 'kf' prefix spans blocks 5-7
    val sorted = (0 until 40).map { i =>
      val key = f"k${('a' + i / 4).toChar}%s,host)/p$i%02d"
      Entry(key, s"http://host/$i", "20260101000000", i.toLong, 10L)
    }
    val (shard, cluster) = writeClustered(sorted, 4, codec)
    assert(cluster.length === 10)
    val (start, end) = searchCluster(cluster.toIndexedSeq, "kf", "kf" + Char.MaxValue)
    // floor block 4 (first key 'ke...' <= 'kf') through block 5 ('kf...')
    assert(start === 4 && end === 6)
    // poison EVERY byte outside the selected blocks' ranges
    val poisoned = shard.clone()
    val keepLo = cluster(start).offset.toInt
    val keepHi = (cluster(end - 1).offset + cluster(end - 1).length).toInt
    for (i <- poisoned.indices if i < keepLo || i >= keepHi) poisoned(i) = 0x5a
    val got = lookupClustered(poisoned, cluster.toIndexedSeq,
      "kf", "kf" + Char.MaxValue, codec).get
    assert(got.map(_.url) === (20 until 24).map(i => s"http://host/$i"))
    // a corrupt SELECTED block is a hard None, never a partial result
    val poisonedHit = shard.clone()
    poisonedHit(cluster(5).offset.toInt + 3) = 0x5a
    assert(lookupClustered(poisonedHit, cluster.toIndexedSeq,
      "kf", "kf" + Char.MaxValue, codec).isEmpty)
    // search edges: before all keys, after all keys, empty range
    assert(searchCluster(cluster.toIndexedSeq, "a", "b") === ((0, 0)))
    val (s2, e2) = searchCluster(cluster.toIndexedSeq, "z", "z" + Char.MaxValue)
    assert(s2 === 9 && e2 === 10) // floor block only
    assert(searchCluster(cluster.toIndexedSeq, "kf", "kf") === ((0, 0)))
    // unsorted input is rejected up front — the sort IS the index
    intercept[IllegalArgumentException] {
      writeClustered(sorted.reverse, 4, codec)
    }
  }
}
