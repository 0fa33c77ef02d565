package graft

import scala.collection.mutable

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.repair._

/** ScalaCheck properties (SURVEY.md §5 plan item 3):
  *   - dumps → loads is the identity on JSON values;
  *   - valid input is a fixed point of repair (the reference documents the
  *     known exception class — inputs whose *repair* differs from stdlib
  *     parse — which cannot arise for canonical dumps output);
  *   - repair is idempotent: repairing repaired output changes nothing.
  */
class PropertySpec extends AnyFunSuite {

  private val genScalar: Gen[JsonValue] = Gen.oneOf(
    Gen.const(JNull),
    Gen.oneOf(true, false).map(JBool(_)),
    Gen.chooseNum(-1000000L, 1000000L).map(n => JInt(BigInt(n))),
    Gen.chooseNum(-1e6, 1e6).map(JFloat(_)),
    Gen.asciiPrintableStr.map(s => JStr(s.take(20))),
    Gen.oneOf("späce", "中文", "a\nb\tc", "\\ \" '").map(JStr(_)))

  private def genValue(depth: Int): Gen[JsonValue] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      3 -> genScalar,
      1 -> Gen.listOfN(3, genValue(depth - 1)).map(xs => JArr(mutable.ArrayBuffer(xs: _*))),
      1 -> Gen.listOfN(3, Gen.zip(Gen.identifier.map(_.take(8)), genValue(depth - 1)))
        .map(ps => JObj(mutable.LinkedHashMap(ps: _*))))

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: $r")
  }

  test("dumps -> loads round-trips") {
    check("roundtrip", Prop.forAll(genValue(3)) { v =>
      PyJson.loads(PyJson.dumps(v)).contains(v) ||
        // NaN never equals itself; compare via dumps for float payloads
        PyJson.loads(PyJson.dumps(v)).exists(w => PyJson.dumps(w) == PyJson.dumps(v))
    })
  }

  test("canonical JSON is a fixed point of repair") {
    check("fixedpoint", Prop.forAll(genValue(3)) { v =>
      val text = PyJson.dumps(v)
      JsonRepair.repair(text) == text || v == JStr("")
    })
  }

  test("repair is idempotent on its own output") {
    // malform generated docs in simple deterministic ways, then repair twice
    val malform: Gen[String => String] = Gen.oneOf(
      (s: String) => s.replace("\"", "'"),
      (s: String) => if (s.nonEmpty) s.dropRight(1) else s,
      (s: String) => "```json\n" + s + "\n```",
      (s: String) => s + ",",
      (s: String) => "// c\n" + s)
    check("idempotent", Prop.forAll(genValue(2), malform) { (v, f) =>
      val once = JsonRepair.repair(f(PyJson.dumps(v)))
      once.isEmpty || JsonRepair.repair(once) == once
    })
  }
}
