package graft.repair

/** Public repair API mirroring the reference's `repair_json`
  * (json_repair.py:100-230, string-output path):
  *   1. fast path: strict parse (Python `json.loads` grammar) — valid input
  *      is re-serialised without entering the repair machinery;
  *   2. repair path: [[RepairParser]];
  *   3. a bare empty-string result returns "" (not "\"\"") — the
  *      reference's empty-string special case (json_repair.py:224-225).
  */
object JsonRepair {

  /** Repaired JSON text (Python `json.dumps` formatting). `streamStable`
    * keeps repairs prefix-stable for accumulating LLM streams (reference
    * M3, json_parser.py:82-87). */
  def repair(input: CharSequence, skipJsonLoads: Boolean = false,
      streamStable: Boolean = false): String = {
    val value = repairToValue(input, skipJsonLoads, streamStable)
    value match {
      case JStr("") => ""
      case v => PyJson.dumps(v)
    }
  }

  /** Repaired value (the `return_objects=True` path). */
  def repairToValue(input: CharSequence, skipJsonLoads: Boolean = false,
      streamStable: Boolean = false): JsonValue = {
    if (!skipJsonLoads) {
      PyJson.loads(input) match {
        case Some(v) => return v
        case None =>
      }
    }
    RepairParser.repairToValue(input, streamStable = streamStable)
  }

  /** `logging=True` path (reference M1): the repaired value plus the ordered
    * repair log `{text, context}` — the lineage of every mutation applied.
    * Valid inputs take the fast path and return an empty log. */
  def repairWithLog(input: CharSequence, skipJsonLoads: Boolean = false)
      : (JsonValue, Seq[RepairParser.LogEntry]) = {
    if (!skipJsonLoads) {
      PyJson.loads(input) match {
        case Some(v) => return (v, Seq.empty)
        case None =>
      }
    }
    val buf = scala.collection.mutable.ArrayBuffer.empty[RepairParser.LogEntry]
    val v = new RepairParser(input, strict = false, tryValidJsonSuffix = true,
      streamStable = false, logger = Some(buf)).parse()
    (v, buf.toSeq)
  }

  /** Reference `from_file` (json_repair.py:303-335): repair a file's JSON
    * through the windowed [[graft.io.ChunkedFileReader]] — chunked decode
    * with cache eviction, never the whole file resident on the scan path.
    * `chunkLength` in characters (reference default 1MB; <2 -> default). */
  def fromFile(filename: String, skipJsonLoads: Boolean = false,
      chunkLength: Int = 0, strict: Boolean = false,
      schema: Option[JsonValue] = None,
      schemaMode: SchemaRepair.Mode = SchemaRepair.Standard): JsonValue = {
    val reader = new graft.io.ChunkedFileReader(
      java.nio.file.Paths.get(filename), chunkLength)
    try load(reader, skipJsonLoads, strict, schema, schemaMode)
    finally reader.close()
  }

  /** Reference `load` (json_repair.py:265-299): parse from the CURRENT
    * position of an already-open source — the file-position resume. The
    * byte offset plays fd.tell(): prior content is never read. */
  def loadFrom(filename: String, byteOffset: Long, skipJsonLoads: Boolean = false,
      chunkLength: Int = 0, strict: Boolean = false,
      schema: Option[JsonValue] = None,
      schemaMode: SchemaRepair.Mode = SchemaRepair.Standard): JsonValue = {
    val reader = new graft.io.ChunkedFileReader(
      java.nio.file.Paths.get(filename), chunkLength, byteOffset)
    try load(reader, skipJsonLoads, strict, schema, schemaMode)
    finally reader.close()
  }

  /** Shared tail of [[fromFile]]/[[loadFrom]] over any windowed source. */
  def load(source: CharSequence, skipJsonLoads: Boolean = false,
      strict: Boolean = false, schema: Option[JsonValue] = None,
      schemaMode: SchemaRepair.Mode = SchemaRepair.Standard): JsonValue =
    schema match {
      case Some(sc) => SchemaRepair.loads(source, sc, schemaMode, skipJsonLoads)
      case None if strict => validate(source, skipJsonLoads) match {
        case Right(v) => v
        case Left(msg) => throw new RepairParser.StrictError(msg)
      }
      case None => repairToValue(source, skipJsonLoads)
    }

  /** Validator mode (reference strict=True): Right(value) if the input is
    * accepted, Left(violation message) if a repair heuristic would fire.
    * `skipJsonLoads` forces the strict repair parser even for inputs the
    * lenient stdlib grammar accepts (e.g. duplicate keys). */
  def validate(input: CharSequence, skipJsonLoads: Boolean = false): Either[String, JsonValue] = {
    if (!skipJsonLoads) {
      PyJson.loads(input) match {
        case Some(v) => return Right(v)
        case None =>
      }
    }
    try Right(RepairParser.repairToValue(input, strict = true))
    catch { case e: RepairParser.StrictError => Left(e.getMessage) }
  }
}
