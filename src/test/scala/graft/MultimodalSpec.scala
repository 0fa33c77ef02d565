package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Multimodal, MultimodalDemo}

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
    val feats = Multimodal.extractFeatures(MultimodalDemo.demoTable(spark, sfDir))
      .collect()
    val audio = feats.filter(_.mime == "audio/wav")
    val images = feats.filter(_.mime == "image/png")
    val videos = feats.filter(_.mime == "video/mp4")
    assert(audio.length == 1500 && images.length == 200 && videos.length == 50)
    // audio: real decode — frame counts positive, RMS near sine amplitude/sqrt2
    assert(audio.forall(_.n_frames > 0))
    val rms = audio.map(_.mean_intensity)
    assert(rms.sum / rms.length > 0.3 && rms.sum / rms.length < 0.5)
    // images: REAL javax.imageio decode — dims must equal the encoded dims
    images.foreach { f =>
      val i = f.media_id - 1000000
      assert(f.width == 16 + (i % 17).toInt, s"id=${f.media_id}")
      assert(f.height == 16 + (i % 13).toInt, s"id=${f.media_id}")
    }
    assert(images.forall(f => f.mean_intensity > 0.0 && f.mean_intensity < 1.0))
    // videos: stub decode — plausible dims and normalized intensity
    assert(videos.forall(f => f.width >= 16 && f.height >= 16))
    assert(videos.forall(f => f.mean_intensity >= 0.0 && f.mean_intensity <= 1.0))
    // determinism: rerun equals first run
    val again = Multimodal.extractFeatures(MultimodalDemo.demoTable(spark, sfDir))
      .collect().map(f => f.media_id -> f.mean_intensity).toMap
    assert(feats.forall(f => again(f.media_id) == f.mean_intensity))
  }

  test("video frame sampling emits every stride-th frame deterministically") {
    val videos = MultimodalDemo.demoTable(spark, sfDir).filter(_.mime == "video/mp4")
    val frames = Multimodal.sampleFrames(videos, stride = 10).collect()
    assert(frames.nonEmpty)
    // stride honored and per-media frame indices distinct
    assert(frames.forall(_.frame_idx % 10 == 0))
    frames.groupBy(_.media_id).foreach { case (_, fs) =>
      assert(fs.map(_.frame_idx).distinct.length == fs.length)
    }
    assert(frames.forall(f => f.mean_intensity >= 0.0 && f.mean_intensity <= 1.0))
    val again = Multimodal.sampleFrames(videos, stride = 10).collect()
      .map(f => (f.media_id, f.frame_idx) -> f.mean_intensity).toMap
    assert(frames.forall(f => again((f.media_id, f.frame_idx)) == f.mean_intensity))
  }

  test("real PNG round-trip: encode then decode recovers pixels exactly") {
    val w = 20; val h = 11
    val luma = Array.tabulate(w * h)(p => (p * 13) % 256)
    val png = Multimodal.ImageCodec.encodePng(w, h, luma)
    // a genuine PNG signature, not a stub blob
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val Some((dw, dh, decoded)) = Multimodal.ImageCodec.decodeLuma(png)
    assert(dw == w && dh == h)
    assert(decoded.sameElements(luma))
  }
}
