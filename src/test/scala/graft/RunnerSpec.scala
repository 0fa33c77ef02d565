package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.clips.ClipsTable
import graft.queries.ClipQueries
import graft.run.Runner

/** Checkpoint/resume semantics: partial run -> resume -> exactly-once. */
class RunnerSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("partial run completes only maxBuckets; resume completes the rest exactly once") {
    val out = Files.createTempDirectory("graft-runner").toString
    val clips = ClipsTable.base(spark, sfDir)
    val suite = ClipQueries.suite(spark, sfDir)

    // first run "crashes" after 10 buckets
    val r1 = Runner.run(spark, clips, suite, out, maxBuckets = 10)
    assert(r1.processed.map(_.bucket).toSet.size == 10)
    assert(Runner.completedBuckets(out).size == 10)

    // resume: completes the remaining 22, skips the done ones
    val r2 = Runner.run(spark, clips, suite, out)
    assert(r2.skipped.size == 10)
    assert(Runner.completedBuckets(out).size == 32)

    // third run is a no-op
    val r3 = Runner.run(spark, clips, suite, out)
    assert(r3.processed.isEmpty && r3.skipped.size == 32)

    // accumulated verdicts equal the single-shot query, no duplicates
    val resumed = Runner.verdicts(spark, out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val oneShot = ClipQueries.verdicts(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(resumed == oneShot)
    assert(Runner.verdicts(spark, out).count() == 32)

    // violations accumulated across batches match the one-shot violation table
    val vResumed = Runner.violations(spark, out)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(3))).sorted
    val vOneShot = ClipQueries.violations(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(3))).sorted
    assert(vResumed.toSeq == vOneShot.toSeq)
  }
}
