package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.repair.{JsonRepair, PyJson}

/** Static (Java-callable) kernels for the generated code paths below —
  * whole-stage codegen emits a plain static call, so the repair expressions
  * fuse into the surrounding generated stage instead of forcing a
  * CodegenFallback boundary around every row. */
object JsonRepairKernels {
  def repair(s: UTF8String): UTF8String =
    UTF8String.fromString(JsonRepair.repair(s.toString))
  def strictValid(s: UTF8String): Boolean =
    PyJson.loads(s.toString).isDefined
  def repairActions(s: UTF8String): Int =
    JsonRepair.repairWithLog(s.toString)._2.length

  /** Per-JVM compiled-schema registry (the reference's validator cache,
    * schema_repair.py:134/:141-161, lifted to the executor): the schema
    * travels to executors as a plain string reference object in the
    * generated code, and each JVM parses it once on first use — so the
    * schema-guided repair fuses into whole-stage codegen like its three
    * stateless siblings instead of forcing a CodegenFallback boundary. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.repair.JsonValue]()

  private def compiledSchema(schemaJson: String): graft.repair.JsonValue =
    schemaCache.computeIfAbsent(schemaJson, j =>
      PyJson.loads(j).getOrElse(
        throw new IllegalArgumentException("invalid schema json")))

  /** Returns null when the row cannot satisfy the schema (reject verdict). */
  def repairSchema(s: UTF8String, schemaJson: String, salvage: Boolean): UTF8String = {
    val schema = compiledSchema(schemaJson)
    val mode =
      if (salvage) graft.repair.SchemaRepair.Salvage else graft.repair.SchemaRepair.Standard
    try UTF8String.fromString(PyJson.dumps(
      graft.repair.SchemaRepair.loads(s.toString, schema, mode)))
    catch { case _: graft.repair.SchemaRepair.RepairError => null }
  }
}

/** `json_repair(s)` as a native Catalyst expression: per-row repair of
  * malformed JSON (fast strict-parse path first — the reference's
  * json.loads fast path — then the full repair state machine). Null-safe;
  * codegen emits a static kernel call inside the generated stage (no
  * (de)serialization beyond UTF8String <-> String, no fallback boundary). */
case class JsonRepairExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    JsonRepairKernels.repair(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JsonRepairKernels$$.MODULE$$.repair($c)")
  override protected def withNewChildInternal(newChild: Expression): JsonRepairExpr =
    copy(child = newChild)
}

/** `json_strict_valid(s)`: true iff the string parses under the strict
  * (CPython json.loads) grammar — the validator fast-path predicate. */
case class JsonStrictValidExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(JsonRepairKernels.strictValid(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JsonRepairKernels$$.MODULE$$.strictValid($c)")
  override protected def withNewChildInternal(newChild: Expression): JsonStrictValidExpr =
    copy(child = newChild)
}

/** `json_repair_actions(s)`: number of repair actions the logging repair
  * pass records for the row (reference M1 `logging=True` at dataset level). */
case class JsonRepairActionsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(JsonRepairKernels.repairActions(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JsonRepairKernels$$.MODULE$$.repairActions($c)")
  override protected def withNewChildInternal(newChild: Expression): JsonRepairActionsExpr =
    copy(child = newChild)
}

/** `json_repair_schema(s)` — schema-guided repair (the reference's
  * `loads(s, schema=...)` typed layer): parse/repair then coerce + validate
  * against the JSON Schema supplied at plan time. Rows that cannot satisfy
  * the schema yield null (the per-row reject verdict). Codegen emits a
  * static kernel call with the schema shipped as a reference object and
  * compiled once per JVM ([[JsonRepairKernels.repairSchema]]), so the
  * expression fuses into the generated stage like its three siblings —
  * round 2's CodegenFallback boundary is gone. */
case class JsonSchemaRepairExpr(child: Expression, schemaJson: String, salvage: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    JsonRepairKernels.repairSchema(input.asInstanceOf[UTF8String], schemaJson, salvage)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("schemaJson", schemaJson, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JsonRepairKernels$$.MODULE$$.repairSchema($c, $schemaRef, $salvage);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): JsonSchemaRepairExpr =
    copy(child = newChild)
}

object JsonRepairFunctions {
  /** Register the repair functions in the session registry. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_repair", exprs => JsonRepairExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_strict_valid", exprs => JsonStrictValidExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_repair_actions", exprs => JsonRepairActionsExpr(exprs.head), "scala_udf")
  }

  def jsonRepair(spark: SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("json_repair", c)
  }

  def jsonStrictValid(spark: SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("json_strict_valid", c)
  }

  def jsonRepairActions(spark: SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("json_repair_actions", c)
  }

  def jsonRepairSchema(spark: SparkSession, c: Column, schemaJson: String,
      salvage: Boolean = false): Column = {
    val name = s"json_repair_schema_${math.abs(schemaJson.hashCode)}_$salvage"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => JsonSchemaRepairExpr(exprs.head, schemaJson, salvage), "scala_udf")
    org.apache.spark.sql.functions.call_function(name, c)
  }
}
