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

  test("scoped-input resume: outputs identical, cross-bucket duplicate still caught") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.dsl._
    // synthetic table over 8 buckets with one duplicate clip_id SPANNING
    // buckets 1 and 6 — the case a scoped batch input would silently miss
    // without the cheap full-table globalInput (the Runner guard's reason
    // to exist): batch 1 (buckets 0-3) owns the dup (min bucket 1) but
    // its second row lives in bucket 6, outside the batch's scoped input
    val rows = (0 until 64).map(i => (f"c$i%03d", i.toLong % 8, i.toLong)) ++
      Seq(("dup", 1L, 100L), ("dup", 6L, 101L))
    val df = rows.toDF("clip_id", "bucket", "ord")
    val suite = CheckSuite("clip_id", "bucket", Seq(Unique("clip_id")), Map.empty)

    // one-shot reference (full input, no scoping)
    val outRef = Files.createTempDirectory("graft-runner-ref").toString
    Runner.run(spark, df, suite, outRef, totalBuckets = 8)

    // scoped crash -> resume: the batch input carries ONLY todo buckets
    val out = Files.createTempDirectory("graft-runner-scoped").toString
    def scoped(todo: Seq[Long]) = df.filter(col("bucket").isin(todo: _*))
    val r1 = Runner.run(spark, df, suite, out, totalBuckets = 8, maxBuckets = 4,
      scopedInput = Some(scoped(_)), globalInput = Some(df))
    assert(r1.processed.map(_.bucket) == Seq(0L, 1L, 2L, 3L))
    val r2 = Runner.run(spark, df, suite, out, totalBuckets = 8,
      scopedInput = Some(scoped(_)), globalInput = Some(df))
    assert(r2.skipped.size == 4 && r2.processed.map(_.bucket) == Seq(4L, 5L, 6L, 7L))

    def verd(o: String) = Runner.verdicts(spark, o)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    def viol(o: String) = Runner.violations(spark, o)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(3))).toSeq.sorted
    assert(verd(out) == verd(outRef), s"scoped verdicts diverge: ${verd(out)} vs ${verd(outRef)}")
    assert(viol(out) == viol(outRef))
    // the cross-bucket dup was reported (owner bucket 1, batch 1) and both
    // of its rows flagged in their buckets' verdicts
    assert(viol(out).exists(_._1 == "dup"))
    assert(verd(out).toSeq.collect { case (b, _, bad, _) if b == 1 || b == 6 => bad }.sum == 2)

    // the guard: scoping without the global lineage is refused loudly
    val out3 = Files.createTempDirectory("graft-runner-guard").toString
    intercept[IllegalArgumentException] {
      Runner.run(spark, df, suite, out3, totalBuckets = 8,
        scopedInput = Some(scoped(_)))
    }
  }

  test("verdict snapshots track the manifest, incl. backfill after a trailing crash") {
    val out = Files.createTempDirectory("graft-runner-snap").toString
    val table = Files.createTempDirectory("graft-verdict-table").toString
    val clips = ClipsTable.base(spark, sfDir)
    val suite = ClipQueries.suite(spark, sfDir)

    // batch 1 runs WITHOUT the snapshot binding — simulates a crash after
    // the manifest rename but before the snapshot append
    Runner.run(spark, clips, suite, out, maxBuckets = 10)
    // batch 2 runs with it: syncSnapshot must first backfill batch 1
    Runner.run(spark, clips, suite, out, snapshotTable = Some(table))

    import graft.io.TableFormat
    val snap = TableFormat.read(spark, table)
      .collect().map(r => (r.getAs[Number]("bucket").longValue(),
        r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(snap.length == 32)
    assert(snap.map(_._1).toSet == (0L until 32L).toSet)
    val oneShot = ClipQueries.verdicts(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(snap.map(t => (t._1, t._2, t._3, t._4)).toSet == oneShot)
    // time travel: the backfill snapshot holds only batch-1 buckets
    assert(TableFormat.read(spark, table, Some(1)).count() == 10)
    // re-run is a no-op: no new snapshot
    val vBefore = TableFormat.currentVersion(table)
    Runner.run(spark, clips, suite, out, snapshotTable = Some(table))
    assert(TableFormat.currentVersion(table) == vBefore)
  }

  test("crash before the batch manifest commit -> retry is idempotent (no duplicate rows)") {
    val out = Files.createTempDirectory("graft-runner-crash").toString
    val clips = ClipsTable.base(spark, sfDir)
    val suite = ClipQueries.suite(spark, sfDir)

    // batch 1 completes normally
    Runner.run(spark, clips, suite, out, maxBuckets = 10)
    // batch 2 "crashes" AFTER its parquet writes but BEFORE the manifest
    // rename: simulate by running it fully, then deleting its manifest
    Runner.run(spark, clips, suite, out, maxBuckets = 10)
    val batchFiles = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    Files.list(java.nio.file.Paths.get(out, "_manifest")).forEach { p =>
      if (p.getFileName.toString.startsWith("batch-")) batchFiles += p
    }
    assert(batchFiles.size == 2)
    // delete the newer manifest (the one whose bucket set includes bucket 10)
    val victim = batchFiles.find { p =>
      Files.readString(p).contains("\"bucket\": 10")
    }.get
    Files.delete(victim)
    assert(Runner.completedBuckets(out).size == 10)

    // retry recomputes the SAME todo set into the SAME batch dir, then all
    // remaining buckets; read-back must hold exactly one row per bucket
    Runner.run(spark, clips, suite, out)
    assert(Runner.completedBuckets(out).size == 32)
    val verdicts = Runner.verdicts(spark, out).collect()
    assert(verdicts.length == 32)
    assert(verdicts.map(_.getLong(0)).toSet.size == 32)
    val oneShot = ClipQueries.verdicts(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(verdicts.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet == oneShot)
  }
}
