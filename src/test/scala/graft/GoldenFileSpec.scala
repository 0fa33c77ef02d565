package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.repair.{JsonRepair, PyJson}

/** End-to-end golden files (reference tests/valid.json + invalid.json —
  * 7.7 KB, 3-object array; invalid differs by one unquoted value and one
  * missing ']'): repairing the invalid file must yield exactly the
  * canonical serialization of the valid file. */
class GoldenFileSpec extends AnyFunSuite {

  private def res(name: String): String =
    scala.io.Source.fromInputStream(getClass.getResourceAsStream(name), "UTF-8").mkString

  test("valid.json round-trips through the fast path") {
    val valid = res("/valid.json")
    val expected = PyJson.dumps(PyJson.loads(valid).get)
    assert(JsonRepair.repair(valid) == expected)
    // and through the full repair parser too (skip_json_loads)
    assert(JsonRepair.repair(valid, skipJsonLoads = true) == expected)
  }

  test("invalid.json repairs to the valid document") {
    val valid = res("/valid.json")
    val invalid = res("/invalid.json")
    assert(PyJson.loads(invalid).isEmpty, "fixture should not be strictly valid")
    val expected = PyJson.dumps(PyJson.loads(valid).get)
    assert(JsonRepair.repair(invalid) == expected)
  }
}
