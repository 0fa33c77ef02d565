package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.audio.{AudioQueries, ClipMeta, Wav}
import graft.clips.ClipsTable

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
    // repartition the BASE (1/k of the rows) before the broadcast fan-out:
    // the replicated rows inherit the partitioning, so the synth stage gets
    // its fixed task granularity while the exchange carries only the
    // unreplicated metadata
    val base = ClipsTable.base(spark, sfDir).repartition(SynthPartitions)
    if (k <= 1) base
    else {
      // one scan, fan out via a tiny broadcast range join (not k unions)
      val reps = spark.range(0, k).select((col("id") * 32000000L).as("__off"))
      base.crossJoin(broadcast(reps))
        .withColumn("clip_id",
          concat(lit("clip-"),
            lpad((substring(col("clip_id"), 6, 12).cast("long") + col("__off")).cast("string"), 12, "0")))
        .withColumn("ord", col("ord") + col("__off"))
        .drop("__off")
    }
  }

  /** Per-bucket verdicts of the complete suite (metadata + audio).
    *
    * The referential check is specialized here: refs is by construction a
    * projection of the same table (`ord % 131 != 0` rows), so presence is
    * `max(ord % 131 != 0)` over the clip_id window — the SAME window that
    * computes the duplicate count. One shuffle serves uniqueness AND
    * referential; no refs scan, no distinct, no join. (The generic
    * CheckCompiler path keeps the anti-join for arbitrary ref tables;
    * equivalence is asserted in EngineSpec.) */
  /** Task granularity for the CPU-heavy synth+validate fan-out: fixed (not
    * a multiple of the core count) so both parallelism levels of the
    * scaling bench run the exact same partitioning and per-task work. */
  val SynthPartitions = 512

  def verdicts(spark: SparkSession, sfDir: String, replicate: Int = 1): DataFrame = {
    import spark.implicits._
    val meta = replicatedBase(spark, sfDir, replicate)
    // One fused typed pass per row: synthesize into a task-reused buffer,
    // decode+SNR in a single allocation-free sweep, fold in the metadata
    // checks — so (a) the 30 KB bytes column never round-trips the encoder
    // between stages, (b) per-row garbage is ~zero (GC stalls otherwise eat
    // the 32-thread level's headroom and sink N->4N scaling efficiency),
    // and (c) only four narrow columns enter the clip_id shuffle — at
    // 10^12 rows the exchange carries bits, not audio.
    val flagged = meta // already SynthPartitions-partitioned by replicatedBase
      .as[ClipMeta]
      .mapPartitions { it =>
        var buf = new Array[Byte](64 * 1024)
        it.map { m =>
          val seed = AudioQueries.seedOf(m.clip_id)
          val snrDb = if (m.ord % 149 == 0) Wav.CorruptSnrDb else Wav.CleanSnrDb
          val extra = if (m.ord % 157 == 0) 7 else 0
          val need = Wav.synthLen(m.sr_hz, m.dur_ms, extra)
          if (need > buf.length) buf = new Array[Byte](need)
          val len = Wav.synthInto(buf, seed, m.ord, m.sr_hz, m.dur_ms, snrDb, extra)
          val (snr, n) = Wav.validateVsClean(buf, len, seed)
          val durBad = n != m.sr_hz.toLong * m.dur_ms / 1000L
          val snrBad = snr.isNaN || snr < AudioQueries.SnrThresholdDb
          val rowBad = m.transcript.isEmpty || m.transcript.contains("") ||
            m.sr_hz < ClipsTable.SrMin || m.sr_hz > ClipsTable.SrMax ||
            !ClipsTable.CodecEnum.contains(m.codec) ||
            snrBad || durBad
          (m.clip_id, m.ord, m.bucket, rowBad)
        }
      }.toDF("clip_id", "ord", "bucket", "row_bad")

    val rowBad = col("row_bad")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("clip_id"))
    flagged
      .withColumn("__dup", count(lit(1)).over(w) > 1)
      .withColumn("__present", max(when(col("ord") % 131 =!= 0, 1).otherwise(0)).over(w) === 1)
      .withColumn("__bad", rowBad || col("__dup") || !col("__present"))
      .groupBy(col("bucket").as("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("__bad"), lit(1))).as("n_bad"))
      .withColumn("pass", col("n_bad") === 0)
      .select("bucket", "n_rows", "n_bad", "pass")
  }

  /** Clips augmented with the per-row audio measurements (snr_db,
    * n_samples) from the same fused allocation-free pass — the bridge that
    * lets the DECLARATIVE Check DSL (and therefore the Runner's
    * checkpointed execution) express the audio invariants as ordinary
    * RowExpr checks over narrow numeric columns. */
  def augmented(spark: SparkSession, sfDir: String, replicate: Int = 1): DataFrame = {
    import spark.implicits._
    replicatedBase(spark, sfDir, replicate)
      .as[ClipMeta]
      .mapPartitions { it =>
        var buf = new Array[Byte](64 * 1024)
        it.map { m =>
          val seed = AudioQueries.seedOf(m.clip_id)
          val snrDb = if (m.ord % 149 == 0) Wav.CorruptSnrDb else Wav.CleanSnrDb
          val extra = if (m.ord % 157 == 0) 7 else 0
          val need = Wav.synthLen(m.sr_hz, m.dur_ms, extra)
          if (need > buf.length) buf = new Array[Byte](need)
          val len = Wav.synthInto(buf, seed, m.ord, m.sr_hz, m.dur_ms, snrDb, extra)
          val (snr, n) = Wav.validateVsClean(buf, len, seed)
          (m.clip_id, m.sr_hz, m.dur_ms, m.codec, m.transcript, m.ord, m.bucket, snr, n)
        }
      }
      .toDF("clip_id", "sr_hz", "dur_ms", "codec", "transcript", "ord", "bucket",
        "snr_db", "n_samples")
  }

  /** The complete declarative suite over [[augmented]]: the metadata checks
    * plus the two audio invariants as RowExpr checks. Equivalence with the
    * fused [[verdicts]] plan is asserted in EngineSpec. */
  def fullSuite(spark: SparkSession, sfDir: String): graft.dsl.CheckSuite = {
    import graft.dsl._
    import Check.colResolver
    val base = graft.queries.ClipQueries.suite(spark, sfDir)
    base.copy(checks = base.checks ++ Seq(
      RowExpr("audio_snr_min", "snr_db",
        col("snr_db").isNaN || col("snr_db") < lit(AudioQueries.SnrThresholdDb),
        org.apache.spark.sql.functions.round(col("snr_db"), 1).cast("string")),
      RowExpr("audio_dur_consistency", "n_samples",
        col("n_samples") =!= org.apache.spark.sql.functions
          .expr("CAST(sr_hz AS BIGINT) * dur_ms DIV 1000"),
        col("n_samples").cast("string"))))
  }

  /** Runs the pipeline to completion; returns (nClips, nBadRows, seconds). */
  def timed(spark: SparkSession, sfDir: String, replicate: Int = 1): (Long, Long, Double) = {
    val t0 = System.nanoTime()
    val rows = verdicts(spark, sfDir, replicate).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum, sec)
  }
}
