package graft.audio

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.clips.ClipsTable

/** Clip metadata row (no bytes) — the narrow projection the planner prunes
  * the parquet scan to. */
final case class ClipMeta(
    clip_id: String, sr_hz: Int, dur_ms: Int, codec: String,
    transcript: Option[String], ord: Long, bucket: Long)

/** Full clip row incl. synthesized audio bytes. */
final case class ClipFull(
    clip_id: String, bytes: Array[Byte], sr_hz: Int, dur_ms: Int,
    codec: String, transcript: Option[String], ord: Long, bucket: Long)

/** The binary/multimodal layer: audio bytes are an opaque BinaryType column;
  * decode / SNR / frame-feature extraction run as typed `Dataset.map` (the
  * north star permits typed map; no RDDs). The WAV codec is real (PCM16 is
  * trivially decodable in-sandbox) — nothing is stubbed.
  *
  * Injections (see ClipsTable): ord % 149 == 0 -> corrupted audio (10 dB
  * SNR, must fail the ≥30 dB allclose invariant); ord % 157 == 0 -> byte
  * length implies dur_ms + 7 (consistency violation).
  */
object AudioQueries {

  val SnrThresholdDb = 30.0
  val FrameMs = 20

  /** Numeric seed recoverable from the clip id ("clip-%012d"). */
  def seedOf(clipId: String): Long = clipId.substring(5).toLong

  /** clips + deterministic synthesized bytes (typed map over the metadata).
    * The small test parquet arrives as one input split, which would pin the
    * CPU-heavy synth/decode map to one task — repartition to the session's
    * parallelism first (a production-size table gets this fan-out for free
    * from its file splits; the explicit repartition keeps the plan honest
    * at any input size). */
  def full(spark: SparkSession, sfDir: String): Dataset[ClipFull] =
    fullFrom(spark, ClipsTable.base(spark, sfDir))

  /** Same, over an arbitrary clips-shaped metadata frame. */
  def fullFrom(spark: SparkSession, meta: org.apache.spark.sql.DataFrame): Dataset[ClipFull] = {
    import spark.implicits._
    meta
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .as[ClipMeta].map { m =>
      val snr = if (m.ord % 149 == 0) Wav.CorruptSnrDb else Wav.CleanSnrDb
      val extra = if (m.ord % 157 == 0) 7 else 0
      val bytes = Wav.synth(seedOf(m.clip_id), m.ord, m.sr_hz, m.dur_ms, snr, extra)
      ClipFull(m.clip_id, bytes, m.sr_hz, m.dur_ms, m.codec, m.transcript, m.ord, m.bucket)
    }
  }

  /** Rows violating the decoded-PCM allclose invariant (SNR < 30 dB vs the
    * clean resynth). Oracle: exactly the ord % 149 == 0 rows. */
  def snrViolations(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    full(spark, sfDir)
      .map(c => (c.clip_id, Wav.snrVsClean(c.bytes, seedOf(c.clip_id))))
      .toDF("clip_id", "snr_db")
      .filter(col("snr_db").isNaN || col("snr_db") < SnrThresholdDb)
      .select("clip_id")
  }

  /** Rows whose byte length disagrees with the declared dur_ms; emits the
    * actual decoded sample count. Oracle: the ord % 157 == 0 rows with
    * n_samples = floor(sr_hz * (dur_ms + 7) / 1000). */
  def durMismatch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    full(spark, sfDir)
      .map { c =>
        val n = Wav.decode(c.bytes).map(_._2.length.toLong).getOrElse(-1L)
        val expected = c.sr_hz.toLong * c.dur_ms / 1000L
        (c.clip_id, c.dur_ms, n, expected)
      }
      .toDF("clip_id", "dur_ms", "n_samples", "expected")
      .filter(col("n_samples") =!= col("expected"))
      .select("clip_id", "dur_ms", "n_samples")
  }

  /** Frame count per clip (20 ms non-overlapping frames) — deterministic,
    * oracle-checkable arithmetic over the decoded stream. */
  def frames(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    full(spark, sfDir)
      .map(c => (c.clip_id, Wav.frameRms(c.bytes, FrameMs).length.toLong))
      .toDF("clip_id", "n_frames")
  }

  /** Frame-RMS feature summary per clip (depends on the noise stream, so no
    * SQL oracle; determinism asserted in ScalaTest). */
  def features(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    full(spark, sfDir)
      .map { c =>
        val rms = Wav.frameRms(c.bytes, FrameMs)
        val mean = if (rms.isEmpty) 0.0 else rms.sum / rms.length
        val mx = if (rms.isEmpty) 0.0 else rms.max
        (c.clip_id, rms.length.toLong, mean, mx)
      }
      .toDF("clip_id", "n_frames", "rms_mean", "rms_max")
      .select(col("clip_id"), col("n_frames"),
        round(col("rms_mean"), 4).as("rms_mean"),
        round(col("rms_max"), 4).as("rms_max"))
  }

  private val C = ClipsTable.cte

  val oracles: Map[String, String] = Map(
    "au_snr_violations" ->
      s"""$C
         |SELECT clip_id FROM clips WHERE ord % 149 = 0""".stripMargin,
    "au_dur_mismatch" ->
      s"""$C
         |SELECT clip_id, dur_ms,
         |  cast(floor(sr_hz * (dur_ms + 7) / 1000.0) AS BIGINT) AS n_samples
         |FROM clips WHERE ord % 157 = 0""".stripMargin,
    "au_frames" ->
      s"""$C
         |SELECT clip_id,
         |  cast(floor(
         |    floor(sr_hz * (dur_ms + CASE WHEN ord % 157 = 0 THEN 7 ELSE 0 END) / 1000.0)
         |    / floor(sr_hz * 20 / 1000.0)) AS BIGINT) AS n_frames
         |FROM clips""".stripMargin
  )
}
