package graft.model

import org.apache.spark.sql.types._

/** The engine's primary row type — the audio clip + transcript pair from
  * BASELINE.json `input_hint`:
  * `(clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32, codec:string, transcript:string)`.
  *
  * Mirrors the reference's single dynamic value (`JSONReturnType`,
  * reference src/json_repair/utils/constants.py:14) lifted to a fixed,
  * typed row: one malformed string in the reference == one row here.
  */
final case class Clip(
    clip_id: String,
    bytes: Array[Byte],
    sr_hz: Int,
    dur_ms: Int,
    codec: String,
    transcript: String)

object ClipSchema {
  val schema: StructType = StructType(Seq(
    StructField("clip_id", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("sr_hz", IntegerType, nullable = false),
    StructField("dur_ms", IntegerType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("transcript", StringType, nullable = true)
  ))
}

/** One violation record — the dataset-level analogue of the reference's
  * repair-log entries `{text, context}` (json_parser.py:338-348). */
final case class Violation(
    clip_id: String,
    check_name: String,
    column_name: String,
    detail: String)

/** Per-partition verdict — the dataset-level analogue of strict mode's
  * accept/raise decision (json_parser.py:88-91). */
final case class Verdict(
    bucket: Long,
    n_rows: Long,
    n_bad: Long,
    pass: Boolean)
