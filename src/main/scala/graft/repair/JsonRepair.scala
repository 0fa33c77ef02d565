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
  def repair(input: String, skipJsonLoads: Boolean = false,
      streamStable: Boolean = false): String = {
    val value = repairToValue(input, skipJsonLoads, streamStable)
    value match {
      case JStr("") => ""
      case v => PyJson.dumps(v)
    }
  }

  /** Repaired value (the `return_objects=True` path). */
  def repairToValue(input: String, skipJsonLoads: Boolean = false,
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
  def repairWithLog(input: String, skipJsonLoads: Boolean = false)
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

  /** Validator mode (reference strict=True): Right(value) if the input is
    * accepted, Left(violation message) if a repair heuristic would fire.
    * `skipJsonLoads` forces the strict repair parser even for inputs the
    * lenient stdlib grammar accepts (e.g. duplicate keys). */
  def validate(input: String, skipJsonLoads: Boolean = false): Either[String, JsonValue] = {
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
