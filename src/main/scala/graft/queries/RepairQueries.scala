package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.JsonRepairFunctions

/** JSON repair/validation over the `events.props` column. Malformations are
  * injected deterministically by `event_id % 5` so the DuckDB oracle can
  * construct the identical inputs; every malformation class repairs back to
  * the original canonical `props` text, which gives the repair engine a
  * genuine SQL oracle (repaired == props).
  *
  * Classes (reference anchors): 0 = unterminated object (parse_object loop
  * exit), 1 = single quotes (parse_string delimiter select), 2 = markdown
  * code fence (suffix fast path / LLM block), 3 = trailing comma (array/
  * object separator tolerance), 4 = already valid (json.loads fast path).
  */
object RepairQueries {

  private def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /** The malformed column, shared Spark/DuckDB shape. */
  private def malformed: Column = {
    val m = col("event_id") % 5
    when(m === 0, rtrim(col("props"), "}"))
      .when(m === 1, replace(col("props"), lit("\""), lit("'")))
      .when(m === 2, concat(lit("```json\n"), col("props"), lit("\n```")))
      .when(m === 3, replace(col("props"), lit("}"), lit(",}")))
      .otherwise(col("props"))
  }

  /** Strict-validity verdict per row (the validator fast-path predicate). */
  def valid(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("event_id"),
      JsonRepairFunctions.jsonStrictValid(spark, malformed).as("valid"))

  /** Repaired text per row; every class must round-trip to the original. */
  def repaired(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("event_id"),
      JsonRepairFunctions.jsonRepair(spark, malformed).as("repaired"))

  /** Schema-guided repair (the typed layer): quoted/missing/mixed-quote
    * payloads coerced back to canonical `{"k": <int>}` under a required-int
    * schema; rows that cannot satisfy the schema (missing required) become
    * NULL — the per-row reject verdict. */
  def schemaRepaired(spark: SparkSession, sfDir: String): DataFrame = {
    val m = col("event_id") % 3
    val quotedInt = replace(replace(col("props"), lit(": "), lit(": \"")), lit("}"), lit("\"}"))
    val malformed2 = when(m === 0, quotedInt)
      .when(m === 1, lit("{}"))
      .otherwise(replace(quotedInt, lit("\""), lit("'")))
    val schema = """{"type": "object", "properties": {"k": {"type": "integer"}}, "required": ["k"]}"""
    events(spark, sfDir).select(
      col("event_id"),
      JsonRepairFunctions.jsonRepairSchema(spark, malformed2, schema).as("repaired"))
  }

  /** Repair-lineage counts per row (M1 at dataset level): how many repair
    * actions fired for each malformed payload — a native expression, same
    * plan shape as the sibling jr_* queries. Oracle: props is always the
    * canonical {"k": <int>}, so the count is a fixed function of the
    * injected class. */
  def repairActions(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("event_id"),
      JsonRepairFunctions.jsonRepairActions(spark, malformed).as("n_repair_actions"))

  val oracles: Map[String, String] = Map(
    // props is always the canonical {"k": <int>}, so the repair-log length
    // is a fixed function of the injected malformation class: only the
    // markdown fence logs (2 actions: fence entry + exit); the unterminated
    // object, quote swap and trailing comma are silent heuristics in the
    // reference's logger too (verified against repairWithLog on the
    // injected shapes; the byte-for-byte fuzz_log corpus pins the format).
    "jr_actions" ->
      """SELECT event_id,
        |  CAST(CASE WHEN event_id % 5 = 2 THEN 2 ELSE 0 END AS INTEGER) AS n_repair_actions
        |FROM events""".stripMargin,
    "jr_schema" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 3 = 1 THEN NULL ELSE props END AS repaired
        |FROM events""".stripMargin,
    // DuckDB's json_valid tolerates trailing commas; the reference's strict
    // grammar (CPython json.loads) does not — so the oracle states the
    // expected verdict from the injection rule: only the untouched class is
    // valid, given props is canonical JSON (checked by json_valid there).
    "jr_valid" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 5 = 4 THEN json_valid(props) ELSE false END AS valid
        |FROM events""".stripMargin,
    "jr_repair" ->
      """SELECT event_id, props AS repaired FROM events""".stripMargin
  )
}
