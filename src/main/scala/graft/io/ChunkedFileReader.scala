package graft.io

import java.nio.{ByteBuffer, CharBuffer}
import java.nio.channels.FileChannel
import java.nio.charset.{CharsetDecoder, CodingErrorAction, StandardCharsets}
import java.nio.file.{Path, StandardOpenOption}

import scala.collection.mutable

/** Windowed random-access character view over a UTF-8 file — the analogue
  * of the reference's `StringFileWrapper` (utils/string_file_wrapper.py:
  * 5-183): fixed-size character chunks decoded on demand, an oldest-evict
  * cache capped at max(2, 2MB/chunkLength) chunks, and per-chunk byte
  * "cookies" so seeking never lands inside a multibyte code point. A
  * surrogate pair straddling a chunk boundary is split across the two
  * chunks (cookie records the carried low surrogate), keeping every chunk
  * exactly `chunkLength` UTF-16 units except the last.
  *
  * Implements CharSequence so the repair parser can consume a file lazily:
  * forward scans touch at most the cache-resident window; only the rare
  * splice repairs (duplicate-key split, escaped-key normalize) materialize
  * — same worst case as the reference, whose `json_str` slicing of the
  * wrapper also builds full strings.
  *
  * `startOffset` is the byte position to begin at — the `load()`-from-
  * `fd.tell()` resume semantics (reference json_repair.py:265-299).
  */
final class ChunkedFileReader(path: Path, chunkLength0: Int = 0, startOffset: Long = 0L,
    maxBuffersOverride: Int = 0)
    extends CharSequence with AutoCloseable {

  val chunkLength: Int = if (chunkLength0 < 2) 1000000 else chunkLength0

  private val ch = FileChannel.open(path, StandardOpenOption.READ)
  /** cookie(i) = (byte position of chunk i, carried low surrogate or -1). */
  private val cookies = mutable.ArrayBuffer[(Long, Int)]((startOffset, -1))
  private val cache = mutable.LinkedHashMap.empty[Int, String]
  private val maxBuffers =
    if (maxBuffersOverride >= 2) maxBuffersOverride
    else math.max(2, 2000000 / chunkLength)
  private var totalLength: Int = -1

  private def newDecoder(): CharsetDecoder =
    StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)

  /** Decode chunk `index`, extending the cookie list as needed. */
  private def loadChunk(index: Int): String = {
    cache.get(index) match {
      case Some(s) =>
        // LRU-ish refresh: keep recently used out of the eviction slot
        cache.remove(index); cache.put(index, s); return s
      case None =>
    }
    // fill cookies up to `index` iteratively (a far-forward random access
    // must not recurse once per missing chunk)
    while (index >= cookies.length && totalLength < 0)
      loadChunk(cookies.length - 1)
    if (index >= cookies.length)
      throw new IndexOutOfBoundsException(s"chunk $index out of range")
    val (bytePos, carry) = cookies(index)
    val out = CharBuffer.allocate(chunkLength)
    if (carry >= 0) out.put(carry.toChar)
    val dec = newDecoder()
    var filePos = bytePos // advanced only by fully-consumed bytes
    var nextCarry = -1
    var done = false
    val bb = ByteBuffer.allocate(8192)
    val pair = CharBuffer.allocate(2)
    while (!done) {
      bb.clear()
      val n = ch.read(bb, filePos)
      // eof must ALSO trigger when this read reaches the end of the file:
      // a file ending in an INCOMPLETE multibyte sequence (valid prefix,
      // missing continuation bytes) makes the decoder return underflow with
      // zero bytes consumed while waiting for more input — with eof keyed
      // only on read() < 0 the loop would re-read the same tail forever
      val eof = n < 0 || filePos + math.max(n, 0) >= ch.size()
      bb.flip()
      val res = dec.decode(bb, out, eof)
      filePos += math.max(n, 0) - bb.remaining()
      if (res.isOverflow) {
        if (!out.hasRemaining) done = true // chunk exactly full
        else {
          // one slot left and the next code point needs two UTF-16 units:
          // decode the pair separately and split it across the boundary
          val before = bb.remaining()
          dec.decode(bb, pair, eof)
          filePos += before - bb.remaining()
          if (pair.position() == 2) {
            pair.flip()
            out.put(pair.get(0))
            nextCarry = pair.get(1)
            done = true
          } else if (pair.position() == 1) {
            // the overflow-triggering sequence REPLACE-decoded to ONE char
            // (malformed 4-byte prefix, mid-file or at eof): keep it, or the
            // chunked view drops a character vs whole-string decoding
            // (round-2 advice); the slot it fills is the chunk's last
            pair.flip()
            out.put(pair.get(0))
            done = true
          } else if (eof) done = true
          // else: bb lacked the full multibyte sequence — loop reads more
        }
      } else if (eof) done = true
      // else underflow mid-file: loop reads the next block
    }
    val s = { out.flip(); out.toString }
    // a full chunk means there may be more: record where the next starts
    if (index + 1 >= cookies.length && s.length == chunkLength)
      cookies += ((filePos, nextCarry))
    if (s.length < chunkLength)
      totalLength = index * chunkLength + s.length
    cache.put(index, s)
    if (cache.size > maxBuffers) {
      val oldest = cache.head._1
      if (oldest != index) cache.remove(oldest)
    }
    s
  }

  override def charAt(i: Int): Char = {
    if (i < 0) throw new IndexOutOfBoundsException(i.toString)
    val c = loadChunk(i / chunkLength)
    c.charAt(i % chunkLength)
  }

  override def length(): Int = {
    if (totalLength < 0) {
      var idx = cookies.length - 1
      while (totalLength < 0) { loadChunk(idx); idx += 1 }
    }
    totalLength
  }

  override def subSequence(start: Int, end: Int): CharSequence = {
    val sb = new java.lang.StringBuilder(math.max(0, end - start))
    var i = start
    var chunkIdx = -1
    var chunk: String = null
    while (i < end) {
      val ci = i / chunkLength
      if (ci != chunkIdx) { chunk = loadChunk(ci); chunkIdx = ci }
      sb.append(chunk.charAt(i % chunkLength))
      i += 1
    }
    sb.toString
  }

  override def toString: String = subSequence(0, length()).toString

  /** Number of chunks currently resident (test hook for the eviction cap). */
  def residentChunks: Int = cache.size

  override def close(): Unit = ch.close()
}
