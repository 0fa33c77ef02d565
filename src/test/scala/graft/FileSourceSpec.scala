package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.ChunkedFileReader
import graft.repair.{JsonRepair, PyJson}

/** Chunked file source (reference S2/S3: utils/string_file_wrapper.py +
  * from_file/load, json_repair.py:265-335): windowed random access with
  * cache eviction, multibyte-safe chunk cookies, and mid-file resume. */
class FileSourceSpec extends AnyFunSuite {

  private def tmp(content: String): java.nio.file.Path = {
    val p = Files.createTempFile("chunked", ".json")
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p
  }

  test("chunked reader reproduces the string char-for-char at any chunk size") {
    val text = "{\"k\": [1, 2, 3], \"s\": \"héllo wörld\", \"t\": true}"
    for (chunk <- Seq(2, 3, 7, 1000)) {
      val r = new ChunkedFileReader(tmp(text), chunk)
      assert(r.length == text.length, s"chunk=$chunk")
      (0 until text.length).foreach(i => assert(r.charAt(i) == text.charAt(i), s"i=$i chunk=$chunk"))
      assert(r.toString == text)
      r.close()
    }
  }

  test("malformed trailing bytes on a chunk's last slot keep their replacement char") {
    // round-2 advice: a truncated 4-byte UTF-8 tail that REPLACE-decodes to
    // ONE char exactly when one output slot remains used to be dropped
    val p = Files.createTempFile("chunked", ".bin")
    Files.write(p, Array[Byte]('a'.toByte, 0xF0.toByte, 0x9F.toByte))
    val whole = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    for (chunk <- Seq(2, 3, 1000)) {
      val r = new ChunkedFileReader(p, chunk)
      assert(r.length == whole.length, s"chunk=$chunk chunked=${r.length} whole=${whole.length}")
      assert(r.toString == whole, s"chunk=$chunk")
      r.close()
    }
  }

  test("cache evicts oldest chunks: bounded residency over a full scan") {
    val text = (0 until 1000).map(i => ('a' + i % 26).toChar).mkString
    val r = new ChunkedFileReader(tmp(text), 2, maxBuffersOverride = 3)
    (0 until text.length).foreach(i => assert(r.charAt(i) == text.charAt(i)))
    assert(r.residentChunks <= 3, s"resident=${r.residentChunks}")
    // backward re-reads after eviction still produce the right chars
    assert(r.charAt(0) == text.charAt(0))
    assert(r.charAt(500) == text.charAt(500))
    r.close()
  }

  test("far-forward first access fills cookies iteratively (no deep recursion)") {
    val text = "y" * 100000
    val r = new ChunkedFileReader(tmp(text), 2) // 50k chunks ahead in one jump
    assert(r.charAt(99999) == 'y')
    assert(r.length == 100000)
    r.close()
  }

  test("surrogate pairs split across chunk boundaries decode losslessly") {
    // U+1D11E (musical G clef) is a surrogate pair in UTF-16
    val text = "a𝄞b𝄞c"
    for (chunk <- Seq(2, 3, 4, 5)) {
      val r = new ChunkedFileReader(tmp(text), chunk)
      assert(r.toString == text, s"chunk=$chunk")
      assert(r.length == text.length)
      r.close()
    }
  }

  test("load from current file position repairs only the suffix (reference test_load_repairs_from_current_file_position)") {
    val prefix = "{\"stale\": true}\n"
    val raw = prefix + "{\"key\": }"
    val p = tmp(raw)
    for (skip <- Seq(false, true)) {
      val v = JsonRepair.loadFrom(p.toString, prefix.getBytes(StandardCharsets.UTF_8).length,
        skipJsonLoads = skip, chunkLength = 2)
      assert(PyJson.dumps(v) == "{\"key\": \"\"}", s"skip=$skip")
    }
  }

  test("fromFile with tiny chunks equals whole-string repair (reference test_repair_json_from_file)") {
    val whole = Files.readString(java.nio.file.Paths.get(
      getClass.getResource("/invalid.json").toURI))
    val expected = JsonRepair.repairToValue(whole)
    val viaFile = JsonRepair.fromFile(
      java.nio.file.Paths.get(getClass.getResource("/invalid.json").toURI).toString,
      chunkLength = 2)
    assert(PyJson.dumps(viaFile) == PyJson.dumps(expected))
  }

  test("chunked file path is differentially equal to the string path on the whole repair corpus") {
    import graft.repair.{JArr, JBool, JObj, JStr}
    val raw = new String(Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/repair_corpus.json").toURI)), StandardCharsets.UTF_8)
    val cases = PyJson.loads(raw) match {
      case Some(JArr(items)) => items.toSeq.collect {
        case JObj(f) => (f("input").asInstanceOf[JStr].value,
          f("skip_json_loads") == JBool(true))
      }
      case _ => fail("cannot parse corpus")
    }
    var n = 0
    cases.foreach { case (input, skip) =>
      val p = tmp(input)
      val viaString =
        try PyJson.dumps(JsonRepair.repairToValue(input, skipJsonLoads = skip))
        catch { case e: Throwable => s"<ex ${e.getClass.getSimpleName}>" }
      // chunk of 3 chars exercises every boundary inside every payload
      val viaFile =
        try PyJson.dumps(JsonRepair.fromFile(p.toString, skipJsonLoads = skip, chunkLength = 3))
        catch { case e: Throwable => s"<ex ${e.getClass.getSimpleName}>" }
      assert(viaFile == viaString, s"divergence on ${input.take(60)}")
      n += 1
      Files.deleteIfExists(p)
    }
    info(s"chunked-vs-string differential: $n/$n cases equal")
  }

  test("load from a multibyte prefix: byte offset cookies stay code-point safe") {
    val prefix = "{\"stalé\": \"ü𝄞ö\"}\n" // multibyte chars BEFORE the offset
    val suffix = "{'kéy': }"
    val p = tmp(prefix + suffix)
    val off = prefix.getBytes(StandardCharsets.UTF_8).length
    val v = JsonRepair.loadFrom(p.toString, off, chunkLength = 2)
    assert(PyJson.dumps(v) == "{\"k\\u00e9y\": \"\"}")
  }

  test("fromFile default chunk length handles valid json via fast path") {
    val p = tmp("""{"a": 1, "b": [true, null]}""")
    val v = JsonRepair.fromFile(p.toString)
    assert(PyJson.dumps(v) == """{"a": 1, "b": [true, null]}""")
  }
}
