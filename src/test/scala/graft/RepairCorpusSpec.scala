package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.repair.JsonRepair

/** Golden corpus ported from the reference pytest suite: each entry is one
  * `assert repair_json(input) == expected` pair (tests/test_parse_*.py,
  * tests/test_json_repair.py). The corpus file is JSON produced at
  * extraction time; see src/test/resources/repair_corpus.json.
  */
class RepairCorpusSpec extends AnyFunSuite {

  private case class Case(file: String, input: String, expected: String, skip: Boolean)

  private lazy val corpus: Seq[Case] = {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/repair_corpus.json"), "UTF-8").mkString
    // corpus is strict JSON — parse it with our own strict parser
    import graft.repair._
    PyJson.loads(raw) match {
      case Some(JArr(items)) =>
        items.toSeq.map {
          case JObj(f) =>
            Case(
              f("file").asInstanceOf[JStr].value,
              f("input").asInstanceOf[JStr].value,
              f("expected").asInstanceOf[JStr].value,
              f("skip_json_loads") == JBool(true))
          case other => fail(s"bad corpus entry $other")
        }
      case _ => fail("cannot parse corpus")
    }
  }

  test("corpus pass rate is 100%") {
    val failures = corpus.zipWithIndex.flatMap { case (c, i) =>
      val got =
        try JsonRepair.repair(c.input, skipJsonLoads = c.skip)
        catch { case e: Throwable => s"<exception ${e.getClass.getSimpleName}: ${e.getMessage}>" }
      if (got == c.expected) None
      else Some(s"[$i ${c.file}] input=${esc(c.input)}\n  expected=${esc(c.expected)}\n  got     =${esc(got)}")
    }
    val rate = 100.0 * (corpus.size - failures.size) / corpus.size
    info(f"corpus: ${corpus.size - failures.size}/${corpus.size} ($rate%.1f%%)")
    if (failures.nonEmpty) {
      fail(s"${failures.size} corpus failures:\n" + failures.take(30).mkString("\n"))
    }
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
}
