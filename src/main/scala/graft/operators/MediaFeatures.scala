package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.audio.Wav

/** Multimodal feature extraction over opaque `binary` media columns with
  * typed metadata (builder contract: decode / feature-extract / resize /
  * frame-sample as batched per-partition transforms — in Scala Spark the
  * `mapInPandas` role is played by typed `Dataset.mapPartitions`, which
  * gives the same batch shape: one iterator per partition, vectorizable
  * per-row work, no per-row JVM<->interpreter crossings to pay for).
  *
  * The audio path is REAL (RIFF/WAV s16le codec in graft.audio.Wav) and
  * the image path is REAL (JDK `javax.imageio`: PNG/JPEG/BMP/GIF, with a
  * byte-derived fallback for undecodable blobs). The video decode step is
  * a STUB — this container has no video codecs — implemented as a
  * deterministic byte-derived fake so the Spark-side plumbing (schema,
  * partitioning, bounded-fanout explode shape, null handling) is real and
  * testable; swap the frame decode for a codec call in production.
  */
object MediaFeatures {

  // ---------------------------------------------------------------- audio

  /** Per-clip audio features: energy stats + fixed-count frame samples.
    * Schema out: (clip_id, sr_hz, n_samples, energy_db, peak, n_frames,
    * frame_rms: array<double>, frame_zcr: array<double>).
    */
  final case class AudioFeatures(
      clip_id: String,
      sr_hz: Int,
      n_samples: Int,
      energy_db: Double,
      peak: Int,
      n_frames: Int,
      frame_rms: Array[Double],
      frame_zcr: Array[Double]
  )

  /** Decode + frame-sample + feature-extract audio clips. `frameMs` is
    * the analysis frame length; `maxFrames` caps the per-row output size
    * (uniform sampling across the clip), bounding row width no matter the
    * clip duration — the property that keeps this shuffle-safe at scale.
    */
  def audioFeatures(
      clips: DataFrame,
      frameMs: Int = 20,
      maxFrames: Int = 64
  ): Dataset[AudioFeatures] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select(col("clip_id").cast("string"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          if (bytes == null) None
          else {
            val (samples, sr) = Wav.decode(bytes)
            val frameLen = math.max(1, sr * frameMs / 1000)
            val total = math.max(1, samples.length / frameLen)
            val take = math.min(total, maxFrames)
            val rms = new Array[Double](take)
            val zcr = new Array[Double](take)
            var f = 0
            while (f < take) {
              // uniform frame sampling: frame f of `take` maps to
              // position f*total/take of the full frame sequence
              val begin = (f.toLong * total / take).toInt * frameLen
              val end = math.min(begin + frameLen, samples.length)
              var acc = 0.0
              var crossings = 0
              var i = begin
              while (i < end) {
                val v = samples(i).toDouble
                acc += v * v
                if (i > begin && (samples(i) >= 0) != (samples(i - 1) >= 0))
                  crossings += 1
                i += 1
              }
              val n = math.max(1, end - begin)
              rms(f) = math.sqrt(acc / n)
              zcr(f) = crossings.toDouble / n
              f += 1
            }
            var energy = 0.0
            var peak = 0
            var i = 0
            while (i < samples.length) {
              val v = samples(i).toInt
              energy += v.toDouble * v.toDouble
              val a = math.abs(v)
              if (a > peak) peak = a
              i += 1
            }
            val energyDb =
              if (energy == 0.0) -200.0
              else 10.0 * math.log10(energy / math.max(1, samples.length))
            Some(AudioFeatures(id, sr, samples.length, energyDb, peak,
              take, rms, zcr))
          }
        }
      }
  }

  // --------------------------------------------------------------- image

  final case class ImageFeatures(
      image_id: String,
      width: Int,
      height: Int,
      decoded: Boolean,
      mean_luma: Double,
      edge_density: Double,
      phash64: Long
  )

  /** REAL image decode via `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP ship
    * with the JDK — no external codec needed). Returns None for bytes no
    * installed reader understands.
    */
  private[operators] def decodeImage(
      bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Features from decoded pixels: mean luma (Rec.601, normalized to
    * [0,1]), horizontal-gradient edge density (|Δluma| > 16/255 between
    * horizontal neighbors), and a 64-bit average-hash pHash (mean luma of
    * an 8x8 grid; bit = cell above grid mean). Pixel reads are strided so
    * per-row work is bounded (~2^16 samples) no matter the image size —
    * the property that keeps the operator shuffle-safe at scale.
    */
  private[operators] def imageStats(
      img: java.awt.image.BufferedImage): (Double, Double, Long) = {
    val w = img.getWidth
    val h = img.getHeight
    val stepX = math.max(1, w / 256)
    val stepY = math.max(1, h / 256)
    def lumaAt(x: Int, y: Int): Double = {
      val rgb = img.getRGB(x, y)
      val r = (rgb >> 16) & 0xFF
      val g = (rgb >> 8) & 0xFF
      val b = rgb & 0xFF
      (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
    }
    var luma = 0.0
    var edges = 0
    var edgeCells = 0
    var n = 0
    val cell = new Array[Double](64)
    val cellN = new Array[Int](64)
    var y = 0
    while (y < h) {
      var x = 0
      var prev = -1.0
      while (x < w) {
        val l = lumaAt(x, y)
        luma += l
        n += 1
        if (prev >= 0) {
          if (math.abs(l - prev) > 16.0 / 255.0) edges += 1
          edgeCells += 1
        }
        prev = l
        val ci = math.min(7, y * 8 / h) * 8 + math.min(7, x * 8 / w)
        cell(ci) += l
        cellN(ci) += 1
        x += stepX
      }
      y += stepY
    }
    val meanLuma = luma / math.max(1, n)
    val edgeDensity = edges.toDouble / math.max(1, edgeCells)
    var i = 0
    var cellMean = 0.0
    var filled = 0
    while (i < 64) {
      if (cellN(i) > 0) { cell(i) /= cellN(i); cellMean += cell(i); filled += 1 }
      i += 1
    }
    cellMean /= math.max(1, filled)
    var ph = 0L
    i = 0
    while (i < 64) {
      if (cellN(i) > 0 && cell(i) > cellMean) ph |= (1L << i)
      i += 1
    }
    (meanLuma, edgeDensity, ph)
  }

  /** Fallback for undecodable bytes: deterministic byte-derived
    * pseudo-statistics (splitmix64 over <=64 byte strides) so the row
    * keeps flowing with `decoded=false` instead of dying mid-pipeline —
    * at 10^12 rows a single corrupt blob must not fail the stage.
    */
  private def fallbackStats(bytes: Array[Byte]): (Double, Double, Long) = {
    var h = 0x9E3779B97F4A7C15L
    var luma = 0.0
    var edges = 0.0
    var n = 0
    var i = 0
    while (i < bytes.length) {
      h = graft.functions.FastHash.mix64(h ^ bytes(i))
      luma += (h & 0xFF).toDouble
      edges += ((h >>> 8) & 1).toDouble
      n += 1
      i += math.max(1, bytes.length / 64) // <= 64 strided samples
    }
    val m = math.max(1, n)
    (luma / m / 255.0, edges / m, h)
  }

  /** Image feature extraction over (image_id, bytes, width, height):
    * JDK ImageIO decode -> luma/edge/phash features; undecodable rows
    * fall back to byte-derived stats with `decoded=false`. Width/height
    * come from the decoded image when available, else the metadata cols.
    */
  def imageFeatures(images: DataFrame): Dataset[ImageFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("image_id").cast("string"), col("bytes"),
        col("width").cast("int"), col("height").cast("int"))
      .as[(String, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes, w, hgt) =>
          Option(bytes).map { b =>
            decodeImage(b) match {
              case Some(img) =>
                val (luma, edges, ph) = imageStats(img)
                ImageFeatures(id, img.getWidth, img.getHeight,
                  decoded = true, luma, edges, ph)
              case None =>
                val (luma, edges, ph) = fallbackStats(b)
                ImageFeatures(id, w, hgt, decoded = false, luma, edges, ph)
            }
          }
        }
      }
  }

  // --------------------------------------------------------------- video

  final case class VideoFrame(
      video_id: String,
      frame_index: Int,
      ts_ms: Long,
      frame_phash: Long,
      decoded: Boolean
  )

  /** Video frame sampling with REAL decode for the two public container
    * formats parseable with nothing beyond the JDK (graft.video.Video):
    * YUV4MPEG2 (header parse + raw luma planes) and AVI/MJPEG (RIFF walk
    * + `javax.imageio` JPEG per frame). Each sampled frame row carries
    * the 8x8 average-hash of the decoded luma plane. Bytes in any other
    * codec (nothing else ships in this container) take the deterministic
    * byte-derived fallback with `decoded=false` — the same
    * row-keeps-flowing contract as the image path: at 10^12 rows one
    * alien blob must not fail the stage.
    *
    * `maxFrames` uniform sampling bounds the per-row fanout no matter
    * the clip length — the property that keeps the explode shuffle-safe
    * at scale.
    */
  def videoFrameSample(
      videos: DataFrame,
      maxFrames: Int = 16
  ): Dataset[VideoFrame] = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select(col("video_id").cast("string"), col("bytes"),
        col("dur_ms").cast("long"))
      .as[(String, Array[Byte], Long)]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes, durMs) =>
          if (bytes == null || bytes.isEmpty) Iterator.empty
          else {
            import graft.video.Video
            val frames: Vector[Video.LumaFrame] =
              if (Video.Y4m.isY4m(bytes))
                Video.Y4m.decode(bytes).map(_.frames).getOrElse(Vector.empty)
              else if (Video.Avi.isRiffAvi(bytes)) Video.Avi.decodeMjpeg(bytes)
              else Vector.empty
            if (frames.nonEmpty) {
              // uniform sample of <= maxFrames decoded frames
              val n = math.min(maxFrames, frames.length)
              (0 until n).iterator.map { f =>
                val srcIdx = (f.toLong * frames.length / n).toInt
                val ts = durMs * srcIdx / frames.length
                VideoFrame(id, f, ts, Video.lumaPhash(frames(srcIdx)),
                  decoded = true)
              }
            } else {
              val n = math.min(maxFrames.toLong, math.max(1L, durMs / 40)).toInt
              (0 until n).iterator.map { f =>
                val ts = durMs * f / n
                // fallback pseudo-decode: hash of the byte stride standing
                // in for the decoded frame's perceptual hash
                val stride = math.max(1, bytes.length / n)
                var h = 0xC2B2AE3D27D4EB4FL ^ ts
                var i = f * stride
                val end = math.min(bytes.length, i + stride)
                while (i < end) {
                  h = graft.functions.FastHash.mix64(h ^ bytes(i)); i += 1
                }
                VideoFrame(id, f, ts, h, decoded = false)
              }
            }
          }
        }
      }
  }
}
