package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal plumbing: real audio decode + stubbed image decode through
  * the same batch feature-extraction seam. */
class MultimodalSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("feature extraction handles mixed media deterministically") {
    val feats = Multimodal.extractFeatures(Multimodal.demoTable(spark, sfDir))
      .collect()
    val audio = feats.filter(_.mime == "audio/wav")
    val images = feats.filter(_.mime == "image/png")
    assert(audio.length == 1500 && images.length == 200)
    // audio: real decode — frame counts positive, RMS near sine amplitude/sqrt2
    assert(audio.forall(_.n_frames > 0))
    val rms = audio.map(_.mean_intensity)
    assert(rms.sum / rms.length > 0.3 && rms.sum / rms.length < 0.5)
    // images: stub decode — plausible dims and normalized intensity
    assert(images.forall(f => f.width >= 16 && f.height >= 16))
    assert(images.forall(f => f.mean_intensity >= 0.0 && f.mean_intensity <= 1.0))
    // determinism: rerun equals first run
    val again = Multimodal.extractFeatures(Multimodal.demoTable(spark, sfDir))
      .collect().map(f => f.media_id -> f.mean_intensity).toMap
    assert(feats.forall(f => again(f.media_id) == f.mean_intensity))
  }
}
