package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial document fingerprint as a native Catalyst Expression:
  * fp(s) = sum_i s[i] * 31^i  (mod 2^64, signed long wraparound).
  * Deterministic, arithmetic-only (reproducible across engines that
  * implement the same recurrence), null-safe, evaluated per-row inside the
  * generated plan — the pattern the string-repair expression will follow.
  */
case class TextFingerprintExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < s.length) {
      h += s.charAt(i).toLong * pow
      pow *= 31L
      i += 1
    }
    java.lang.Long.valueOf(h)
  }
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

  /** Register `text_fingerprint` in the session's function registry and
    * return a Column invoking it. */
  def apply(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_fingerprint", exprs => TextFingerprintExpr(exprs.head), "scala_udf")
    org.apache.spark.sql.functions.call_function("text_fingerprint", c)
  }
}
