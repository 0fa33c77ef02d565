package graft

import java.nio.file.{Files, Paths}

import graft.repair._

/** CLI entry mirroring the reference's `cli()` (json_repair.py:338-480):
  * repair a file or stdin, print (indent=2 by default) or write inline /
  * to a target file; strict and schema modes with the same mutual-exclusion
  * rules and 0/1 exit codes.
  */
object Cli {

  final case class Args(
      filename: Option[String] = None,
      inline: Boolean = false,
      output: Option[String] = None,
      ensureAscii: Boolean = false,
      indent: Int = 2,
      skipJsonLoads: Boolean = false,
      schema: Option[String] = None,
      schemaModel: Option[String] = None,
      strict: Boolean = false,
      salvage: Boolean = false)

  def main(argv: Array[String]): Unit = sys.exit(run(argv, () => {
    scala.io.Source.stdin.mkString
  }))

  /** Returns the exit code; side effects = stdout/stderr/file writes. */
  def run(argv: Array[String], readStdin: () => String): Int = {
    var a = Args()
    var i = 0
    try {
      while (i < argv.length) {
        argv(i) match {
          case "-i" | "--inline" => a = a.copy(inline = true)
          case "-o" | "--output" => i += 1; a = a.copy(output = Some(argv(i)))
          case "--ensure_ascii" => a = a.copy(ensureAscii = true)
          case "--indent" => i += 1; a = a.copy(indent = argv(i).toInt)
          case "--skip-json-loads" => a = a.copy(skipJsonLoads = true)
          case "--schema" => i += 1; a = a.copy(schema = Some(argv(i)))
          case "--schema-model" => i += 1; a = a.copy(schemaModel = Some(argv(i)))
          case "--strict" => a = a.copy(strict = true)
          case "--schema-repair-mode" =>
            i += 1
            argv(i) match {
              case "standard" => a = a.copy(salvage = false)
              case "salvage" => a = a.copy(salvage = true)
              case other =>
                System.err.println(s"Error: invalid --schema-repair-mode $other"); return 1
            }
          case other if !other.startsWith("-") && a.filename.isEmpty =>
            a = a.copy(filename = Some(other))
          case other =>
            System.err.println(s"Error: unknown argument $other"); return 1
        }
        i += 1
      }
    } catch {
      case _: ArrayIndexOutOfBoundsException =>
        System.err.println("Error: missing value for argument"); return 1
    }

    if (a.inline && a.filename.isEmpty) {
      System.err.println("Error: Inline mode requires a filename"); return 1
    }
    if (a.inline && a.output.isDefined) {
      System.err.println("Error: You cannot pass both --inline and --output"); return 1
    }
    if (a.schema.isDefined && a.schemaModel.isDefined) {
      System.err.println("Error: You cannot pass both --schema and --schema-model"); return 1
    }
    if (a.strict && (a.schema.isDefined || a.schemaModel.isDefined)) {
      System.err.println("Error: --strict cannot be used with --schema or --schema-model"); return 1
    }
    if (a.salvage && a.schema.isEmpty && a.schemaModel.isEmpty) {
      System.err.println("Error: --schema-repair-mode salvage requires --schema or --schema-model")
      return 1
    }

    var reader: graft.io.ChunkedFileReader = null
    try {
      // files go through the windowed chunked reader (reference cli() routes
      // files through from_file / StringFileWrapper); stdin is a string
      val data: CharSequence = a.filename match {
        case Some(f) =>
          reader = new graft.io.ChunkedFileReader(Paths.get(f))
          reader
        case None => readStdin()
      }
      val schemaValue: Option[JsonValue] = (a.schema, a.schemaModel) match {
        case (Some(schemaFile), _) =>
          val schemaJson = Files.readString(Paths.get(schemaFile))
          Some(PyJson.loads(schemaJson).getOrElse {
            System.err.println("Error: schema file is not valid JSON"); return 1
          })
        case (None, Some(model)) => Some(SchemaOf.forModel(model))
        case _ => None
      }
      val result: JsonValue = schemaValue match {
        case Some(schema) =>
          SchemaRepair.loads(data, schema,
            if (a.salvage) SchemaRepair.Salvage else SchemaRepair.Standard,
            skipJsonLoads = a.skipJsonLoads)
        case None =>
          if (a.strict) JsonRepair.validate(data) match {
            case Right(v) => v
            case Left(msg) => System.err.println(s"Error: $msg"); return 1
          }
          else JsonRepair.repairToValue(data, skipJsonLoads = a.skipJsonLoads)
      }
      val text = PyJson.dumps(result, a.ensureAscii, Some(a.indent))
      // release the input channel BEFORE writing: --inline rewrites the same
      // file (round-2 advice: the channel used to leak per invocation)
      if (reader != null) { reader.close(); reader = null }
      (a.inline, a.output) match {
        case (true, _) => Files.writeString(Paths.get(a.filename.get), text)
        case (_, Some(out)) => Files.writeString(Paths.get(out), text)
        case _ => println(text)
      }
      0
    } catch {
      case e: Throwable =>
        System.err.println(s"Error: ${e.getMessage}")
        1
    } finally {
      if (reader != null) reader.close()
    }
  }
}
