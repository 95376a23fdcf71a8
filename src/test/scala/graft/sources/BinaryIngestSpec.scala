package graft.sources

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BinaryIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binaryFile roundtrip: id from name, length from status, digest from bytes") {
    val dir = Files.createTempDirectory("graft_binspec").toString
    val d = Seq((7L, "hello"), (8L, ""), (41L, "καλημέρα")).toDF("doc_id", "text")
    BinaryIngest.writeFixture(d, "doc_id", "text", dir)
    val out = BinaryIngest.readDocs(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // zero-byte files yield no splits and silently vanish from the scan —
    // pinned here because a media pipeline must guard for it upstream
    assert(out.keySet === Set(7L, 41L))
    assert(out(7L)._1 === 5L)
    assert(out(41L)._1 === 16L) // 8 two-byte UTF-8 code points
    assert(out(7L)._2 === "5d41402abc4b2a76b9719d911017c592") // md5("hello")
  }

  test("the glob filter prunes non-matching files at listing time") {
    val dir = Files.createTempDirectory("graft_binspec2")
    Files.write(dir.resolve("doc_1.bin"), "x".getBytes)
    Files.write(dir.resolve("junk.txt"), "y".getBytes)
    val out = BinaryIngest.readDocs(spark, dir.toString).collect()
    assert(out.length === 1 && out.head.getLong(0) === 1L)
  }
}
