package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.repair._

/** Repair-log differential corpus: 1,500 random malformed documents whose
  * expected (value, ordered log records) were produced by executing the
  * reference with logging=True. Every log site must emit the same message
  * text and the same ±10-char context window, in the same order. */
class FuzzLogSpec extends AnyFunSuite {

  test("repair logs agree with the reference record-for-record") {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/fuzz_log.json"), "UTF-8").mkString
    val JArr(items) = PyJson.loads(raw).getOrElse(fail("bad corpus"))
    var bad = List.empty[String]
    var records = 0
    items.foreach {
      case JObj(f) =>
        val input = f("input").asInstanceOf[JStr].value
        val expectedDumps = f("expected_dumps").asInstanceOf[JStr].value
        val expectedLog = f("log").asInstanceOf[JArr].items.map {
          case JObj(e) => (e("text").asInstanceOf[JStr].value, e("context").asInstanceOf[JStr].value)
          case other => fail(s"bad log entry $other")
        }
        records += expectedLog.size
        val (v, gotLog) =
          try JsonRepair.repairWithLog(input)
          catch { case e: Throwable => (JStr(s"<exception ${e.getMessage}>"), Seq.empty[RepairParser.LogEntry]) }
        val gotDumps = PyJson.dumps(v)
        if (gotDumps != expectedDumps)
          bad ::= s"value: ${input.take(60)} -> $gotDumps != $expectedDumps"
        else if (gotLog.map(e => (e.text, e.context)) != expectedLog.toSeq)
          bad ::= s"log: ${input.take(60)}\n  got ${gotLog.map(_.text).mkString(" | ").take(160)}\n  exp ${expectedLog.map(_._1).mkString(" | ").take(160)}"
      case _ =>
    }
    info(s"log fuzz: ${items.size - bad.size}/${items.size} cases, $records log records")
    if (bad.nonEmpty) fail(s"${bad.size} mismatches\n" + bad.take(10).mkString("\n"))
  }
}
