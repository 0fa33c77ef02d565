package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.repair._

/** Differential corpora for the orthogonal modes, expected outcomes recorded
  * by executing the reference at generation time: strict mode
  * (accept/reject + output), stream-stable mode (prefix repairs), and
  * schema-guided repair (standard + salvage, accept with output or reject).
  */
class FuzzModesSpec extends AnyFunSuite {

  private def loadArr(resource: String) = {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(resource), "UTF-8").mkString
    PyJson.loads(raw).get.asInstanceOf[JArr].items
  }

  test("strict-mode fuzz corpus agrees (accept/reject + output)") {
    var bad = List.empty[String]
    loadArr("/fuzz_strict.json").foreach {
      case JObj(f) =>
        val input = f("input").asInstanceOf[JStr].value
        val skip = f("skip_json_loads") == JBool(true)
        val raises = f("raises") == JBool(true)
        JsonRepair.validate(input, skipJsonLoads = skip) match {
          case Left(_) if raises =>
          case Right(v) if !raises =>
            val got = v match { case JStr("") => ""; case other => PyJson.dumps(other) }
            val expected = f("expected").asInstanceOf[JStr].value
            if (got != expected) bad ::= s"$input -> got $got expected $expected"
          case Left(msg) => bad ::= s"$input -> unexpectedly rejected: $msg"
          case Right(_) => bad ::= s"$input -> unexpectedly accepted"
        }
      case _ =>
    }
    info(s"strict fuzz: ${loadArr("/fuzz_strict.json").size - bad.size}/${loadArr("/fuzz_strict.json").size}")
    if (bad.nonEmpty) fail(s"${bad.size} mismatches\n" + bad.take(12).mkString("\n"))
  }

  test("stream-stable fuzz corpus agrees on all prefixes") {
    var bad = List.empty[String]
    val items = loadArr("/fuzz_stream.json")
    items.foreach {
      case JObj(f) =>
        val input = f("input").asInstanceOf[JStr].value
        val expected = f("expected").asInstanceOf[JStr].value
        val got =
          try JsonRepair.repair(input, streamStable = true)
          catch { case e: Throwable => s"<exception: ${e.getMessage}>" }
        if (got != expected) bad ::= s"${input.take(80)} -> got $got expected $expected"
      case _ =>
    }
    info(s"stream fuzz: ${items.size - bad.size}/${items.size}")
    if (bad.nonEmpty) fail(s"${bad.size} mismatches\n" + bad.take(12).mkString("\n"))
  }

  test("schema-guided fuzz corpus agrees (repair or reject)") {
    var bad = List.empty[String]
    val items = loadArr("/fuzz_schema.json")
    items.foreach {
      case JObj(f) =>
        val input = f("input").asInstanceOf[JStr].value
        val schema = f("schema")
        val mode = if (f("mode") == JStr("salvage")) SchemaRepair.Salvage else SchemaRepair.Standard
        val refOk = f("ok") == JBool(true)
        val got =
          try Right(PyJson.dumps(SchemaRepair.loads(input, schema, mode)))
          catch {
            case e: SchemaRepair.RepairError => Left(e.getMessage)
            case e: Throwable => Left(s"<${e.getClass.getSimpleName}: ${e.getMessage}>")
          }
        (got, refOk) match {
          case (Right(g), true) =>
            val expected = f("expected_dumps").asInstanceOf[JStr].value
            if (g != expected)
              bad ::= s"$input | ${PyJson.dumps(schema)} | $mode\n  got $g\n  exp $expected"
          case (Left(_), false) =>
          case (Right(g), false) => bad ::= s"$input | ${PyJson.dumps(schema)} | $mode -> accepted ($g), reference rejected"
          case (Left(m), true) => bad ::= s"$input | ${PyJson.dumps(schema)} | $mode -> rejected ($m), reference accepted"
        }
      case _ =>
    }
    info(s"schema fuzz: ${items.size - bad.size}/${items.size}")
    if (bad.nonEmpty) fail(s"${bad.size} mismatches\n" + bad.take(10).mkString("\n"))
  }
}
