package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.repair.{JArr, JBool, JInt, JObj, JStr, JsonRepair, PyJson}

/** Differential corpus for the chunked file API: 1,900 cases whose expected
  * outputs were recorded by EXECUTING the reference's `from_file` /
  * `load` (utils/string_file_wrapper.py windowed reads; json_repair.py:
  * 265-335) over the same temp files — from_file at chunk lengths 2/3/5/7
  * with and without skip_json_loads, plus load() resuming from a mid-file
  * byte offset. 100% agreement required. */
class FileFuzzSpec extends AnyFunSuite {

  private case class FCase(kind: String, input: String, chunk: Int,
      skip: Boolean, offset: Long, expected: Option[String])

  private lazy val corpus: Seq[FCase] = {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/fuzz_file_corpus.json"), "UTF-8").mkString
    PyJson.loads(raw) match {
      case Some(JArr(items)) => items.toSeq.map {
        case JObj(f) =>
          FCase(
            f("kind").asInstanceOf[JStr].value,
            f("input").asInstanceOf[JStr].value,
            f("chunk").asInstanceOf[JInt].value.toInt,
            f("skip_json_loads") == JBool(true),
            f.get("offset_bytes").collect { case JInt(v) => v.toLong }.getOrElse(0L),
            f("expected") match { case JStr(s) => Some(s); case _ => None })
        case other => fail(s"bad corpus entry $other")
      }
      case _ => fail("cannot parse fuzz_file_corpus.json")
    }
  }

  test("file-API differential corpus agrees with the reference 100%") {
    val p = Files.createTempFile("file-fuzz", ".json")
    val failures = corpus.zipWithIndex.flatMap { case (c, i) =>
      Files.write(p, c.input.getBytes(StandardCharsets.UTF_8))
      val got =
        try {
          val v = c.kind match {
            case "from_file" =>
              JsonRepair.fromFile(p.toString, skipJsonLoads = c.skip, chunkLength = c.chunk)
            case "load_offset" =>
              JsonRepair.loadFrom(p.toString, c.offset, chunkLength = c.chunk)
          }
          Some(PyJson.dumps(v))
        } catch { case _: Throwable => None }
      if (got == c.expected) None
      else Some(s"[$i ${c.kind} chunk=${c.chunk}] input=${c.input.take(60)}\n" +
        s"  expected=${c.expected}\n  got     =$got")
    }
    Files.deleteIfExists(p)
    info(s"file corpus: ${corpus.size - failures.size}/${corpus.size}")
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }
}
