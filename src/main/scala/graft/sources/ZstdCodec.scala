package graft.sources

/** Zstandard transport codec — the other compression real crawl corpora
  * arrive in: CommonCrawl index files and modern archives ship `.zst`
  * (RFC 8878). Same contract and reuse discipline as
  * [[Warc.GzipCodec]]: ONE native compress/decompress context pair per
  * codec (allocate per PARTITION — not thread-safe; per-payload context
  * allocation is native churn on the ingest hot path), frames any zstd
  * reader opens, and a STRICT reader that walks the full frame grammar
  * back: a `.zst` stream is a SEQUENCE of frames (RFC 8878 §3) —
  * compressed frames and skippable frames (magic `0x184D2A5?`) — and
  * [[unzstd]] walks them ALL, so a frame-per-record archive layout
  * (the zstd analog of member-per-record gzip, what makes range
  * requests work) decompresses to the complete stream. Anything else —
  * truncated frame, garbage between frames, a frame-header content
  * size that lies either way, a skippable frame running past EOF — is
  * `None` for the whole stream, never a silent partial result.
  *
  * Uses the zstd-jni shipped on Spark's own classpath (the engine's
  * parquet codec path) — no new dependency.
  *
  * OWNERSHIP: the two native contexts have NO finalizer/Cleaner in
  * zstd-jni — unlike the JDK Deflater behind [[Warc.GzipCodec]], the
  * native memory is freed only by an explicit [[close]]. Per-partition
  * callers must register `close()` on task completion
  * (`TaskContext.addTaskCompletionListener`); see
  * [[ZstdCodec.forPartition]] which does exactly that.
  */
final class ZstdCodec extends AutoCloseable {
  import com.github.luben.zstd.{Zstd, ZstdCompressCtx, ZstdDecompressCtx}

  private val cctx = new ZstdCompressCtx().setLevel(3)
  private val dctx = new ZstdDecompressCtx()

  /** Release the native compress/decompress contexts. Idempotent. */
  override def close(): Unit = { cctx.close(); dctx.close() }

  /** Hard ceiling on a single frame's declared content size (1 GiB) —
    * a hostile frame header must not be able to command an allocation.
    */
  private val MaxFrameContent: Long = 1L << 30

  /** Compress `bytes` as one zstd frame (content size recorded in the
    * frame header, so [[unzstd]] can allocate exactly).
    */
  def zstd(bytes: Array[Byte]): Array[Byte] = cctx.compress(bytes)

  /** An RFC 8878 §3.1.2 skippable frame carrying `payload` — the
    * side-channel real archives use for per-segment metadata; readers
    * that honor the grammar skip it, readers that don't corrupt.
    */
  def skippableFrame(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 8)
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    le32(0x184D2A50L)
    le32(payload.length.toLong)
    out.write(payload)
    out.toByteArray
  }

  /** Decompress a complete zstd stream: every frame walked, skippable
    * frames skipped, both content-size lies rejected. `None` on any
    * grammar violation.
    */
  def unzstd(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes.length == 0) return None
    def le32(i: Int): Long =
      ((bytes(i) & 0xffL)) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    // Clamp the initial guess: `bytes.length * 3` overflows Int past
    // ~715 MiB, and a negative BAOS capacity throws outside the catch
    // list below — violating the never-throw contract.
    val out = new java.io.ByteArrayOutputStream(
      math.max(64L, math.min(bytes.length.toLong * 3, MaxFrameContent)).toInt)
    var off = 0
    try {
      while (off < bytes.length) {
        if (off + 4 > bytes.length) return None
        val magic = le32(off)
        if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) { // skippable frame
          if (off + 8 > bytes.length) return None
          val sz = le32(off + 4)
          if (off + 8 + sz > bytes.length) return None
          off += 8 + sz.toInt
        } else if (magic == 0xFD2FB528L) { // compressed frame
          val fcs = Zstd.findFrameCompressedSize(bytes, off)
          if (Zstd.isError(fcs) || fcs <= 0 || off + fcs > bytes.length) return None
          val csize = Zstd.getFrameContentSize(bytes, off)
          if (csize >= 0) {
            if (csize > MaxFrameContent) return None
            val dst = new Array[Byte](csize.toInt)
            val k = dctx.decompressByteArray(dst, 0, dst.length, bytes, off, fcs.toInt)
            if (k != csize.toInt) return None // header lied small
            out.write(dst, 0, k)
          } else {
            // unknown content size (streaming writers omit it): decode
            // just this frame's slice through the streaming reader
            val in = new com.github.luben.zstd.ZstdInputStream(
              new java.io.ByteArrayInputStream(bytes, off, fcs.toInt))
            val buf = new Array[Byte](8192)
            var total = 0L
            var n = in.read(buf)
            while (n >= 0) {
              total += n
              if (total > MaxFrameContent) { in.close(); return None }
              out.write(buf, 0, n)
              n = in.read(buf)
            }
            in.close()
          }
          off += fcs.toInt
        } else return None // garbage where a frame magic must be
      }
      Some(out.toByteArray)
    } catch {
      case _: com.github.luben.zstd.ZstdException => None
      case _: java.io.IOException => None
    }
  }
}

object ZstdCodec {
  /** A codec whose native contexts are released when the CURRENT task
    * completes — the one correct way to hold a [[ZstdCodec]] inside
    * `mapPartitions`. Outside a task (driver/tests) the caller owns
    * the close.
    */
  def forPartition(): ZstdCodec = {
    val c = new ZstdCodec
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => c.close())
    c
  }
}
