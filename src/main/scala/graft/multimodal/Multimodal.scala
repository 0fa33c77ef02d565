package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.audio.Wav

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata; decode / feature-extract / resize / frame-sample run
  * as batch-shaped `mapPartitions` (the Scala analogue of `mapInPandas` —
  * one decoder instantiation per partition, row batches streamed through).
  *
  * Audio decode is REAL (WAV PCM16, graft.audio.Wav). Image decode is REAL
  * (PNG/JPEG via javax.imageio, which ships in the JDK — [[ImageCodec]]),
  * with [[FakeImageCodec]] as the clearly-marked deterministic fallback for
  * payloads javax.imageio cannot read. Video decode remains STUBBED behind
  * [[FakeImageCodec]] — the sandbox ships no video libraries; the Spark
  * plumbing (schema, partitioning, batch shape, feature signature) is real
  * and tested, and a real codec drops into the same seam.
  */
object Multimodal {

  final case class MediaFile(media_id: Long, mime: String, bytes: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int,
      mean_intensity: Double)

  /** REAL image codec: PNG/JPEG decode via the JDK's javax.imageio. */
  object ImageCodec {
    /** (width, height, luma plane 0..255 row-major), or None when the
      * payload is not a decodable image (javax.imageio returns null). */
    def decodeLuma(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            // integer Rec.601 luma
            out(y * w + x) = (r * 299 + g * 587 + b * 114) / 1000
            x += 1
          }
          y += 1
        }
        Some((w, h, out))
      }
    }

    /** Encode a luma plane as a real PNG (test-data generator). RGB with
      * r=g=b so setRGB/getRGB are exact (TYPE_BYTE_GRAY would run a gray<->
      * sRGB colorspace conversion and break the lossless round-trip). */
    def encodePng(w: Int, h: Int, luma: Array[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = luma(y * w + x) & 0xFF
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** STUB: deterministic fake decoder for VIDEO payloads (and the fallback
    * for undecodable image bytes). A real build replaces this object with
    * ffmpeg bindings; everything downstream is agnostic to the swap. Pixels
    * are derived from a rolling hash of the payload so features are
    * reproducible. */
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

  /** Frame sampling for video payloads: decode every `stride`-th frame's
    * luma plane and emit one row per sampled frame — the mapInPandas-shaped
    * exploding transform (decoder amortised per partition, rows streamed).
    * The per-frame decode is the STUB codec (no video libs in-sandbox): a
    * deterministic fake with frame count derived from the payload length,
    * per-frame planes seeded by (payload hash, frame index); the Spark
    * plumbing — schema, batch shape, explode — is real. */
  final case class FrameSample(
      media_id: Long, frame_idx: Int, width: Int, height: Int, mean_intensity: Double)

  def sampleFrames(media: Dataset[MediaFile], stride: Int = 10): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.mime.startsWith("video/")).flatMap { m =>
      val (w, h) = FakeImageCodec.dimensions(m.bytes)
      val nFrames = 1 + (m.bytes.length % 240) // STUB: header-declared length
      (0 until nFrames by stride).map { f =>
        val px = FakeImageCodec.decodeLuma(m.bytes :+ f.toByte, w, h)
        FrameSample(m.media_id, f, w, h, px.sum.toDouble / px.length / 255.0)
      }
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
          case mime if mime.startsWith("image/") =>
            // REAL decode via javax.imageio; hash-stub only if undecodable
            val (w, h, px) = ImageCodec.decodeLuma(m.bytes).getOrElse {
              val (fw, fh) = FakeImageCodec.dimensions(m.bytes)
              (fw, fh, FakeImageCodec.decodeLuma(m.bytes, fw, fh))
            }
            val thumb = FakeImageCodec.resize(px, w, h, 32, 32)
            val mean = thumb.sum.toDouble / thumb.length / 255.0
            MediaFeatures(m.media_id, m.mime, m.bytes.length.toLong,
              w, h, 1, mean)
          case _ => // video: STUB decode, real plumbing
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

  /** Deterministic real-PNG table: gradient luma planes
    * `luma(p) = (i*31 + p*7) % 256` at `(16+i%17) x (16+i%13)`, encoded by
    * the JDK PNG writer. The encode/decode round-trip is lossless (RGB with
    * r=g=b — see [[ImageCodec.encodePng]]), so every downstream feature is
    * a closed-form function of (i, w, h) that a SQL oracle can replay. */
  def imageTable(spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(0, 200).as[Long]
      .map { i =>
        val w = 16 + (i % 17).toInt
        val h = 16 + (i % 13).toInt
        val luma = Array.tabulate(w * h)(p => ((i * 31 + p * 7) % 256).toInt)
        MediaFile(1000000 + i, "image/png", ImageCodec.encodePng(w, h, luma))
      }
  }

  /** Driver-oracled image-feature query (`mm_features`): REAL javax.imageio
    * PNG decode of [[imageTable]] through the batch [[extractFeatures]]
    * plumbing. Because the PNG round-trip is lossless and the resize is
    * deterministic nearest-neighbour, the DuckDB oracle recomputes
    * (width, height, mean_intensity) in closed form from the generator
    * arithmetic — a genuine end-to-end decode oracle, not a stub echo.
    * n_bytes is projected out (PNG-encoder output size is not
    * SQL-expressible). */
  def imageFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    extractFeatures(imageTable(spark))
      .select(col("media_id"), col("width"), col("height"),
        round(col("mean_intensity"), 6).as("mean_intensity"))
  }

  /** Closed-form DuckDB replay of [[imageFeatures]]: regenerate the luma
    * plane arithmetic, apply the same integer nearest-neighbour 32x32
    * resize, and average with the same operation order
    * (sum -> /1024 -> /255). */
  val oracles: Map[String, String] = Map(
    "mm_features" ->
      """WITH imgs AS (
        |  SELECT i, 1000000 + i AS media_id,
        |    CAST(16 + i % 17 AS INTEGER) AS width,
        |    CAST(16 + i % 13 AS INTEGER) AS height
        |  FROM (SELECT unnest(range(200)) AS i)
        |), px AS (
        |  SELECT media_id, i, width, height,
        |    ((y * height) // 32) * width + ((x * width) // 32) AS p
        |  FROM imgs,
        |    (SELECT unnest(range(32)) AS y),
        |    (SELECT unnest(range(32)) AS x)
        |), thumb AS (
        |  SELECT media_id, width, height,
        |    sum((i * 31 + p * 7) % 256) AS s
        |  FROM px
        |  GROUP BY media_id, width, height
        |)
        |SELECT media_id, width, height,
        |  round(CAST(s AS DOUBLE) / 1024 / CAST(255 AS DOUBLE), 6) AS mean_intensity
        |FROM thumb""".stripMargin
  )
}

object MultimodalDemo {
  import Multimodal._

  /** Demo table: clips' real WAV bytes as `audio/wav` rows, the genuine PNG
    * payloads of [[Multimodal.imageTable]] as `image/png` rows, and
    * synthetic blobs as stub-decoded `video/mp4` rows. */
  def demoTable(spark: SparkSession, sfDir: String): Dataset[MediaFile] = {
    import spark.implicits._
    val audio = graft.audio.AudioQueries.full(spark, sfDir)
      .map(c => MediaFile(c.ord, "audio/wav", c.bytes))
    val videos = spark.range(0, 50).as[Long]
      .map(i => MediaFile(2000000 + i, "video/mp4",
        Array.tabulate(64 + (i % 1000).toInt)(j => ((i * 31 + j) % 251).toByte)))
    audio.union(imageTable(spark)).union(videos)
  }
}
