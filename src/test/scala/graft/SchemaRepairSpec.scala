package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.repair._

/** Schema-guided repair corpus (reference tests/test_schema_guided_parse.py
  * `loads(s, schema=...)` golden pairs) + targeted unit checks. */
class SchemaRepairSpec extends AnyFunSuite {

  private def loadJson(resource: String): JsonValue = {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(resource), "UTF-8").mkString
    PyJson.loads(raw).getOrElse(fail(s"cannot parse $resource"))
  }

  test("schema corpus matches the reference outcomes") {
    val JArr(items) = loadJson("/schema_corpus.json")
    val failures = items.toSeq.flatMap {
      case JObj(f) =>
        val input = f("input").asInstanceOf[JStr].value
        val schema = f("schema")
        val mode = if (f("mode") == JStr("salvage")) SchemaRepair.Salvage else SchemaRepair.Standard
        val expected = f("expected_dumps").asInstanceOf[JStr].value
        val got =
          try PyJson.dumps(SchemaRepair.loads(input, schema, mode))
          catch { case e: Throwable => s"<exception: ${e.getMessage}>" }
        if (got == expected) None
        else Some(s"input=$input schema=${PyJson.dumps(schema)} mode=$mode\n  expected=$expected\n  got=$got")
      case _ => None
    }
    info(s"schema corpus: ${items.size - failures.size}/${items.size}")
    if (failures.nonEmpty) fail(failures.take(15).mkString("\n"))
  }

  private def obj(pairs: (String, JsonValue)*): JObj =
    JObj(scala.collection.mutable.LinkedHashMap(pairs: _*))
  private def arr(xs: JsonValue*): JArr = JArr(scala.collection.mutable.ArrayBuffer(xs: _*))

  test("scalar coercions follow the reference rules") {
    val intSchema = obj("type" -> JStr("integer"))
    assert(PyJson.dumps(SchemaRepair.loads("\"42\"", intSchema)) == "42")
    // whole floats are already valid "integer" per JSON Schema -> fast path
    assert(PyJson.dumps(SchemaRepair.loads("7.0", intSchema)) == "7.0")
    assert(PyJson.dumps(SchemaRepair.loads("\"7.0\"", intSchema)) == "7")
    val boolSchema = obj("type" -> JStr("boolean"))
    assert(PyJson.dumps(SchemaRepair.loads("\"yes\"", boolSchema)) == "true")
    assert(PyJson.dumps(SchemaRepair.loads("\"off\"", boolSchema)) == "false")
    assert(PyJson.dumps(SchemaRepair.loads("1", boolSchema)) == "true")
    val strSchema = obj("type" -> JStr("string"))
    assert(PyJson.dumps(SchemaRepair.loads("12", strSchema)) == "\"12\"")
  }

  test("defaults fill and required enforcement") {
    val schema = obj(
      "type" -> JStr("object"),
      "properties" -> obj(
        "a" -> obj("type" -> JStr("integer")),
        "b" -> obj("type" -> JStr("string"), "default" -> JStr("x"))),
      "required" -> arr(JStr("a")))
    assert(PyJson.dumps(SchemaRepair.loads("""{"a": "5"}""", schema)) == """{"a": 5, "b": "x"}""")
    intercept[SchemaRepair.RepairError](SchemaRepair.loads("""{"b": "y"}""", schema))
  }

  test("$ref resolution with escaping and cycle detection") {
    val schema = obj(
      "definitions" -> obj("posInt" -> obj("type" -> JStr("integer"))),
      "type" -> JStr("object"),
      "properties" -> obj("n" -> obj("$ref" -> JStr("#/definitions/posInt"))))
    assert(PyJson.dumps(SchemaRepair.loads("""{"n": "9"}""", schema)) == """{"n": 9}""")
    val circular = obj("$ref" -> JStr("#/"))
    intercept[SchemaRepair.SchemaError] {
      new SchemaRepairer(circular, SchemaRepair.Standard).resolveSchema(circular)
    }
  }

  test("salvage: list mapped to object by property order") {
    val schema = obj(
      "type" -> JStr("object"),
      "properties" -> obj(
        "name" -> obj("type" -> JStr("string")),
        "age" -> obj("type" -> JStr("integer"))))
    assert(PyJson.dumps(SchemaRepair.loads("""["bo", 3]""", schema, SchemaRepair.Salvage)) ==
      """{"name": "bo", "age": 3}""")
  }

  test("case-class-derived schema drives repair (pydantic-ingestion analogue)") {
    // Clip's metadata shape: ints coerced, required enforced
    final case class Meta(name: String, count: Long)
    // (local case classes lack TypeTags in some scopes; go via StructType)
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("count", org.apache.spark.sql.types.LongType, nullable = false)))
    val schema = SchemaOf.fromStructType(st)
    assert(PyJson.dumps(schema) ==
      """{"type": "object", "properties": {"name": {"type": "string"}, "count": {"type": "integer"}}, "required": ["name", "count"]}""")
    assert(PyJson.dumps(SchemaRepair.loads("""{name: bo, count: '4'}""", schema)) ==
      """{"name": "bo", "count": 4}""")
    intercept[SchemaRepair.RepairError](SchemaRepair.loads("""{"name": "x"}""", schema))
  }

  test("double-serialized JSON unwrap") {
    val schema = obj("type" -> JStr("object"),
      "properties" -> obj("k" -> obj("type" -> JStr("integer"))))
    assert(PyJson.dumps(SchemaRepair.loads("\"{\\\"k\\\": 1}\"", schema)) == """{"k": 1}""")
  }
}
