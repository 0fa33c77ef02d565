package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.compile.CheckCompiler
import graft.dsl._

/** Unit coverage for the check compiler over an in-memory table, including
  * the Matches and Castable checks not used by the clips suite. */
class CompilerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("Matches and Castable produce exactly the expected violations") {
    import spark.implicits._
    import Check.colResolver
    val df = Seq(
      ("id-001", "42", 0L),
      ("id-0x2", "not-a-number", 0L),
      ("bad", "7", 1L),
      (null.asInstanceOf[String], "8", 1L)
    ).toDF("key", "amount", "bucket")
    val suite = CheckSuite("key", "bucket", Seq(
      NotNull("key"),
      Matches("key", "^id-[0-9x]{3}$"),
      Castable("amount", "bigint")))
    val v = CheckCompiler.violations(df, suite)
      .collect().map(r => (String.valueOf(r.getString(0)), r.getString(1))).toSet
    assert(v == Set(
      ("null", "not_null_key"),
      ("bad", "matches_key"),
      ("id-0x2", "castable_amount_bigint")))

    val verdicts = CheckCompiler.verdicts(df, suite)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(verdicts(0L) == (2L, 1L)) // id-0x2 fails castable
    assert(verdicts(1L) == (2L, 2L)) // bad + null rows fail
  }
}
