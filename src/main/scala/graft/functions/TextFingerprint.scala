package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial document fingerprint as a native Catalyst Expression:
  * fp(s) = sum_i s[i] * 31^i  (mod 2^64, signed long wraparound).
  * Deterministic, arithmetic-only (reproducible across engines that
  * implement the same recurrence — the DuckDB oracle replays it as a
  * HUGEINT fold), null-safe, and codegen'd: whole-stage codegen emits a
  * static kernel call so the fingerprint fuses into the generated stage
  * with no fallback boundary. */
case class TextFingerprintExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      TextFingerprint.fingerprintUTF8(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextFingerprint$$.MODULE$$.fingerprintUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): TextFingerprintExpr =
    copy(child = newChild)
}

object TextFingerprint {
  /** Scala-side reference implementation (for tests / typed paths). */
  def fingerprint(s: String): Long = {
    var h = 0L; var pow = 1L; var i = 0
    while (i < s.length) { h += s.charAt(i).toLong * pow; pow *= 31L; i += 1 }
    h
  }

  /** Codegen kernel: same recurrence straight off the UTF8String. */
  def fingerprintUTF8(s: UTF8String): Long = fingerprint(s.toString)

  /** Register `text_fingerprint` in the session's function registry and
    * return a Column invoking it. */
  def apply(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_fingerprint", exprs => TextFingerprintExpr(exprs.head), "scala_udf")
    org.apache.spark.sql.functions.call_function("text_fingerprint", c)
  }
}
