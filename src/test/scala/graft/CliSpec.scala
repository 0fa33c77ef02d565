package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** CLI parity: stdout/file/inline outputs and exit codes. */
class CliSpec extends AnyFunSuite {

  private def captureOut(body: => Int): (Int, String) = {
    val buf = new ByteArrayOutputStream()
    val code = Console.withOut(new PrintStream(buf, true, "UTF-8"))(body)
    (code, buf.toString("UTF-8"))
  }

  test("stdin repair with default indent 2") {
    val (code, out) = captureOut(Cli.run(Array.empty, () => "{'a': 1,}"))
    assert(code == 0)
    assert(out == "{\n  \"a\": 1\n}\n")
  }

  test("file -> output file") {
    val in = Files.createTempFile("cli", ".json")
    val outF = Files.createTempFile("cli-out", ".json")
    Files.writeString(in, "[1, 2, 3,")
    val (code, _) = captureOut(Cli.run(Array(in.toString, "-o", outF.toString), () => ""))
    assert(code == 0)
    assert(Files.readString(outF) == "[\n  1,\n  2,\n  3\n]")
  }

  test("inline replaces the file") {
    val in = Files.createTempFile("cli-inline", ".json")
    Files.writeString(in, "{\"k\": 1")
    val (code, _) = captureOut(Cli.run(Array("-i", in.toString), () => ""))
    assert(code == 0)
    assert(Files.readString(in) == "{\n  \"k\": 1\n}")
  }

  test("strict mode rejects with exit 1") {
    val (code, _) = captureOut(Cli.run(Array("--strict"), () => "{\"missing\" \"colon\"}"))
    assert(code == 1)
  }

  test("schema-guided repair via CLI") {
    val schemaF = Files.createTempFile("cli-schema", ".json")
    Files.writeString(schemaF,
      """{"type": "object", "properties": {"n": {"type": "integer"}}}""")
    val (code, out) = captureOut(
      Cli.run(Array("--schema", schemaF.toString, "--indent", "0"), () => """{"n": "7"}"""))
    assert(code == 0)
    assert(out.contains("\"n\": 7"))
  }

  test("flag conflicts error out") {
    assert(captureOut(Cli.run(Array("-i"), () => ""))._1 == 1)
    assert(captureOut(Cli.run(Array("--strict", "--schema", "x.json"), () => ""))._1 == 1)
    assert(captureOut(Cli.run(Array("--schema-repair-mode", "salvage"), () => ""))._1 == 1)
    // reference: --schema and --schema-model are mutually exclusive; strict
    // excludes the model form too (tests/test_repair_json_cli.py:149-176)
    assert(captureOut(
      Cli.run(Array("--schema", "x.json", "--schema-model", "a.B"), () => ""))._1 == 1)
    assert(captureOut(
      Cli.run(Array("--strict", "--schema-model", "a.B"), () => ""))._1 == 1)
  }

  test("schema-model guides repair (reference test_cli_schema_model_guides_repair)") {
    // case-class form: a typed model drives the coercion of "1" -> 1
    val (code, out) = captureOut(Cli.run(
      Array("--indent", "0", "--schema-model", "graft.SchemaModelFixture",
        "--skip-json-loads"),
      () => """{"value": "1"}"""))
    assert(code == 0)
    assert(out == "{\n\"value\": 1\n}\n")
    // DDL form resolves too
    val (code2, out2) = captureOut(Cli.run(
      Array("--indent", "0", "--schema-model", "value INT NOT NULL"),
      () => """{"value": "2"}"""))
    assert(code2 == 0)
    assert(out2 == "{\n\"value\": 2\n}\n")
  }
}

/** Typed schema model for the --schema-model CLI path (pydantic analog). */
final case class SchemaModelFixture(value: Int)
