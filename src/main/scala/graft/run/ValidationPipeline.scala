package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.audio.{AudioQueries, Wav}
import graft.clips.ClipsTable
import graft.compile.CheckCompiler
import graft.dsl.RowExpr
import graft.queries.ClipQueries

/** The full end-to-end validation job — the engine's headline workload and
  * the unit of the "validated clips/sec" metric (BASELINE.json): synthesize/
  * decode audio, evaluate the PCM SNR>=30dB allclose invariant and the
  * byte-length/dur_ms consistency invariant per row, fuse them with the
  * declarative metadata checks (null/empty/range/enum), global clip_id
  * uniqueness and referential integrity, and aggregate per-bucket verdicts.
  */
object ValidationPipeline {

  /** Deterministic input replication for throughput measurement: `k` shifted
    * copies of the derived clips table (ids offset by a multiple of the
    * bucket count so bucketing, duplicate collisions and seed recovery all
    * survive the shift). Same job shape at k times the rows — the regime the
    * 10^12-row target actually runs in, where fixed stage overhead is noise. */
  def replicatedBase(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val base = ClipsTable.base(spark, sfDir)
    if (k <= 1) base
    else (0 until k).map { r =>
      val off = r.toLong * 32000000L
      base
        .withColumn("clip_id",
          concat(lit("clip-"),
            lpad((substring(col("clip_id"), 6, 12).cast("long") + off).cast("string"), 12, "0")))
        .withColumn("ord", col("ord") + off)
    }.reduce(_.unionByName(_))
  }

  /** Per-bucket verdicts of the complete suite (metadata + audio). */
  def verdicts(spark: SparkSession, sfDir: String, replicate: Int = 1): DataFrame = {
    import spark.implicits._
    val meta = replicatedBase(spark, sfDir, replicate)
    val refs = meta.filter(col("ord") % 131 =!= 0).select(col("clip_id")).distinct()
    val flagged = AudioQueries.fullFrom(spark, meta).map { c =>
      val snr = Wav.snrVsClean(c.bytes, AudioQueries.seedOf(c.clip_id))
      val n = Wav.decode(c.bytes).map(_._2.length.toLong).getOrElse(-1L)
      val durBad = n != c.sr_hz.toLong * c.dur_ms / 1000L
      (c.clip_id, c.sr_hz, c.dur_ms, c.codec, c.transcript, c.ord, c.bucket,
        snr.isNaN || snr < AudioQueries.SnrThresholdDb, durBad)
    }.toDF("clip_id", "sr_hz", "dur_ms", "codec", "transcript", "ord", "bucket",
      "snr_bad", "dur_bad")

    val base = ClipQueries.suite(spark, sfDir)
    val suite = base.copy(
      checks = base.checks ++ Seq(
        RowExpr("audio_snr", "bytes", col("snr_bad") === true, lit("snr<30dB")),
        RowExpr("audio_dur_consistency", "bytes", col("dur_bad") === true, lit("len!=dur"))),
      refs = Map("refs" -> refs))
    CheckCompiler.verdicts(flagged, suite)
  }

  /** Runs the pipeline to completion; returns (nClips, nBadRows, seconds). */
  def timed(spark: SparkSession, sfDir: String, replicate: Int = 1): (Long, Long, Double) = {
    val t0 = System.nanoTime()
    val rows = verdicts(spark, sfDir, replicate).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum, sec)
  }
}
