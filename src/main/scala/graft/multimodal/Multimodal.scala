package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.audio.Wav

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata; decode / feature-extract / resize / frame-sample run
  * as batch-shaped `mapPartitions` (the Scala analogue of `mapInPandas` —
  * one decoder instantiation per partition, row batches streamed through).
  *
  * Audio decode is REAL (WAV PCM16, graft.audio.Wav). Image/video decode is
  * STUBBED behind [[FakeImageCodec]] — the sandbox ships no image/audio
  * libraries, so the stub is a clearly-marked deterministic fake; the Spark
  * plumbing (schema, partitioning, batch shape, feature signature) is real
  * and tested, and a real codec drops into the same seam.
  */
object Multimodal {

  final case class MediaFile(media_id: Long, mime: String, bytes: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int,
      mean_intensity: Double)

  /** STUB: deterministic fake image decoder. A real build replaces this
    * object with javax.imageio / ffmpeg bindings; everything downstream is
    * agnostic to the swap. Pixels are derived from a rolling hash of the
    * payload so features are reproducible. */
  object FakeImageCodec {
    def dimensions(bytes: Array[Byte]): (Int, Int) = {
      // fake: dimensions encoded by payload length (as a real header would)
      val w = 16 + (bytes.length % 64)
      val h = 16 + ((bytes.length / 64) % 64)
      (w, h)
    }

    /** Fake decode: hash-derived luma plane, row-major. */
    def decodeLuma(bytes: Array[Byte], w: Int, h: Int): Array[Int] = {
      val out = new Array[Int](w * h)
      var hsh = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { hsh ^= bytes(i); hsh *= 0x100000001b3L; i += 1 }
      var p = 0
      while (p < out.length) {
        hsh = hsh * 6364136223846793005L + 1442695040888963407L
        out(p) = ((hsh >>> 56) & 0xFF).toInt
        p += 1
      }
      out
    }

    /** Nearest-neighbour resize of a luma plane. */
    def resize(px: Array[Int], w: Int, h: Int, ow: Int, oh: Int): Array[Int] = {
      val out = new Array[Int](ow * oh)
      var y = 0
      while (y < oh) {
        var x = 0
        while (x < ow) {
          out(y * ow + x) = px((y * h / oh) * w + (x * w / ow))
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Batch feature extraction over a media table — one pass, partition-
    * parallel, decoder state amortised per partition (the mapInPandas batch
    * shape). Audio (`audio/wav`) is decoded for real; image/video payloads
    * go through the stub codec with a 32x32 resize before the intensity
    * feature. */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup would happen here (stub is stateless)
      rows.map { m =>
        m.mime match {
          case "audio/wav" =>
            val frames = Wav.frameRms(m.bytes, 20)
            val mean = if (frames.isEmpty) 0.0 else frames.sum / frames.length
            MediaFeatures(m.media_id, m.mime, m.bytes.length.toLong,
              0, 0, frames.length, mean)
          case _ => // image/video: STUB decode, real plumbing
            val (w, h) = FakeImageCodec.dimensions(m.bytes)
            val px = FakeImageCodec.decodeLuma(m.bytes, w, h)
            val thumb = FakeImageCodec.resize(px, w, h, 32, 32)
            val mean = thumb.sum.toDouble / thumb.length / 255.0
            MediaFeatures(m.media_id, m.mime, m.bytes.length.toLong,
              w, h, 1, mean)
        }
      }
    }
  }

  /** Demo table: clips' real WAV bytes as `audio/wav` rows plus synthetic
    * binary blobs as fake `image/png` rows. */
  def demoTable(spark: SparkSession, sfDir: String): Dataset[MediaFile] = {
    import spark.implicits._
    val audio = graft.audio.AudioQueries.full(spark, sfDir)
      .map(c => MediaFile(c.ord, "audio/wav", c.bytes))
    val images = spark.range(0, 200).as[Long]
      .map(i => MediaFile(1000000 + i, "image/png",
        Array.tabulate(64 + (i % 1000).toInt)(j => ((i * 31 + j) % 251).toByte)))
    audio.union(images)
  }
}
