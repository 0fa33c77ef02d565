package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.repair._

/** `return_objects=True` golden pairs (expected values serialized with
  * Python json.dumps at extraction time) + the strict-mode violation
  * catalog (reference tests/test_strict_mode.py). */
class RepairObjectsSpec extends AnyFunSuite {

  private def loadJson(resource: String): JsonValue = {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(resource), "UTF-8").mkString
    PyJson.loads(raw).getOrElse(fail(s"cannot parse $resource"))
  }

  test("return_objects corpus: repaired value serializes to the expected dumps") {
    val JArr(items) = loadJson("/repair_objects_corpus.json")
    val failures = items.toSeq.flatMap {
      case JObj(f) =>
        val input = f("input").asInstanceOf[JStr].value
        val expected = f("expected_dumps").asInstanceOf[JStr].value
        val skip = f("skip_json_loads") == JBool(true)
        val got =
          try PyJson.dumps(JsonRepair.repairToValue(input, skipJsonLoads = skip))
          catch { case e: Throwable => s"<exception: ${e.getMessage}>" }
        if (got == expected) None else Some(s"input=$input\n  expected=$expected\n  got=$got")
      case _ => None
    }
    info(s"objects corpus: ${items.size - failures.size}/${items.size}")
    if (failures.nonEmpty) fail(failures.take(20).mkString("\n"))
  }

  test("strict mode rejects every catalogued malformation") {
    val JArr(items) = loadJson("/strict_corpus.json")
    items.foreach {
      case JObj(f) =>
        val input = f("input").asInstanceOf[JStr].value
        val skip = f.get("skip_json_loads").contains(JBool(true))
        if (f("raises") == JBool(true)) {
          assert(JsonRepair.validate(input, skipJsonLoads = skip).isLeft,
            s"expected rejection for: $input")
        }
      case _ =>
    }
  }

  test("strict mode accepts valid JSON") {
    assert(JsonRepair.validate("""{"key": "value", "n": [1, 2.5, null, true]}""").isRight)
  }

  test("ensure_ascii=false keeps non-latin characters (reference test)") {
    val v = JsonRepair.repairToValue("{'test_中国人_ascii':'统一码'}")
    assert(PyJson.dumps(v, ensureAscii = false, indent = None) ==
      "{\"test_中国人_ascii\": \"统一码\"}")
    assert(PyJson.dumps(v) ==
      "{\"test_\\u4e2d\\u56fd\\u4eba_ascii\": \"\\u7edf\\u4e00\\u7801\"}")
  }

  test("repair log matches the reference test_logging golden") {
    // valid input -> fast path, empty log
    assert(JsonRepair.repairWithLog("{}") == (JObj.empty, Seq.empty))
    // missing closing quote -> two exact log records with ±10-char context
    val (v, logRecords) = JsonRepair.repairWithLog("{\"key\": \"value}")
    assert(PyJson.dumps(v) == "{\"key\": \"value\"}")
    assert(logRecords.map(e => (e.text, e.context)) == Seq(
      ("While parsing a string missing the left delimiter in object value " +
        "context, we found a , or } and we couldn't determine that a right " +
        "delimiter was present. Stopping here", "y\": \"value}"),
      ("While parsing a string, we missed the closing quote, ignoring", "y\": \"value}")))
  }

  test("stream_stable mode keeps repairs prefix-stable (reference test_stream_stable)") {
    // default (unstable) behavior
    assert(JsonRepair.repair("{\"key\": \"val\\") == "{\"key\": \"val\\\\\"}")
    assert(JsonRepair.repair("{\"key\": \"val\\n") == "{\"key\": \"val\"}")
    assert(JsonRepair.repair("{\"key\": \"val\\n123,`key2:value2") ==
      "{\"key\": \"val\\n123\", \"key2\": \"value2\"}")
    // stream_stable = true
    assert(JsonRepair.repair("{\"key\": \"val\\", streamStable = true) == "{\"key\": \"val\"}")
    assert(JsonRepair.repair("{\"key\": \"val\\n", streamStable = true) == "{\"key\": \"val\\n\"}")
    assert(JsonRepair.repair("{\"key\": \"val\\n123,`key2:value2", streamStable = true) ==
      "{\"key\": \"val\\n123,`key2:value2\"}")
    assert(JsonRepair.repair("{\"key\": \"val\\n123,`key2:value2`\"}", streamStable = true) ==
      "{\"key\": \"val\\n123,`key2:value2`\"}")
  }
}
