package graft.operators

import graft.SparkSpecBase
import graft.audio.Wav
import graft.sources.ClipGen

class MediaFeaturesSpec extends SparkSpecBase {
  import spark.implicits._

  test("audio features: decode -> frame-sample -> RMS/ZCR, bounded width") {
    val clips = ClipGen.table(spark, seed = 7L, nClusters = 6)
    val feats = MediaFeatures.audioFeatures(clips, frameMs = 20, maxFrames = 16)
      .collect()
    assert(feats.length == clips.count())
    for (f <- feats) {
      assert(f.n_frames >= 1 && f.n_frames <= 16)
      assert(f.frame_rms.length == f.n_frames)
      assert(f.frame_zcr.length == f.n_frames)
      // sine mixtures at ~0.4 FS: audible energy, nonzero crossings
      assert(f.frame_rms.max > 100.0)
      assert(f.frame_zcr.exists(_ > 0.0))
      assert(f.energy_db > 40.0)
      assert(f.peak > 1000)
      assert(ClipGen.sampleRates.contains(f.sr_hz))
    }
  }

  test("audio features are deterministic across partitionings") {
    val clips = ClipGen.table(spark, seed = 11L, nClusters = 4)
    val a = MediaFeatures.audioFeatures(clips.repartition(1))
      .collect().map(f => f.clip_id -> f.energy_db).toMap
    val b = MediaFeatures.audioFeatures(clips.repartition(7))
      .collect().map(f => f.clip_id -> f.energy_db).toMap
    assert(a == b)
  }

  test("audio features on a known tone: RMS equals amplitude/sqrt(2)") {
    val sr = 16000
    val amp = 10000
    val samples = Array.tabulate(sr)(i =>
      (amp * math.sin(2 * math.Pi * 440 * i / sr)).toShort)
    val df = Seq(("tone", Wav.encode(samples, sr))).toDF("clip_id", "bytes")
    val f = MediaFeatures.audioFeatures(df).collect().head
    val expected = amp / math.sqrt(2)
    assert(math.abs(f.frame_rms.head - expected) / expected < 0.05)
    assert(f.n_samples == sr)
  }

  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image features: real ImageIO decode of generated PNGs") {
    val white = pngBytes(32, 24)((_, _) => 0xFFFFFF)
    val black = pngBytes(32, 24)((_, _) => 0x000000)
    // left half black / right half white: strong vertical edge
    val halves = pngBytes(32, 32)((x, _) => if (x < 16) 0x000000 else 0xFFFFFF)
    val df = Seq(
      ("white", white, 0, 0), ("black", black, 0, 0), ("halves", halves, 0, 0)
    ).toDF("image_id", "bytes", "width", "height")
    val out = MediaFeatures.imageFeatures(df).collect()
      .map(f => f.image_id -> f).toMap
    assert(out.values.forall(_.decoded))
    assert(out("white").width == 32 && out("white").height == 24) // decoded dims
    assert(out("white").mean_luma > 0.99)
    assert(out("black").mean_luma < 0.01)
    assert(math.abs(out("halves").mean_luma - 0.5) < 0.05)
    assert(out("white").edge_density == 0.0)
    assert(out("halves").edge_density > 0.0) // the black->white boundary
    // average-hash: uniform images have no above-mean cells; the split
    // image sets exactly its white half's cells
    assert(out("white").phash64 == 0L)
    assert(java.lang.Long.bitCount(out("halves").phash64) == 32)
  }

  test("image fallback: undecodable bytes keep flowing, deterministic") {
    val img1 = Array.tabulate(4096)(i => (i * 31 % 251).toByte)
    val img2 = Array.tabulate(4096)(i => (i * 17 % 251).toByte)
    val df = Seq(
      ("a", img1, 64, 64), ("b", img2, 64, 64), ("c", img1, 64, 64)
    ).toDF("image_id", "bytes", "width", "height")
    val out = MediaFeatures.imageFeatures(df).collect()
      .map(f => f.image_id -> f).toMap
    assert(out.size == 3)
    assert(out.values.forall(!_.decoded))
    assert(out("a").width == 64) // metadata dims when undecodable
    assert(out("a").phash64 == out("c").phash64) // same bytes, same stats
    assert(out("a").phash64 != out("b").phash64)
    assert(out("a").mean_luma >= 0.0 && out("a").mean_luma <= 1.0)
  }

  test("video fallback: unknown-codec bytes keep flowing, decoded=false") {
    val bytes = Array.tabulate(10000)(i => (i % 127).toByte)
    val df = Seq(
      ("v1", bytes, 2000L), // 2s -> capped at maxFrames
      ("v2", bytes, 80L) // 80ms -> 2 frames at 40ms spacing
    ).toDF("video_id", "bytes", "dur_ms")
    val frames = MediaFeatures.videoFrameSample(df, maxFrames = 8).collect()
    val byId = frames.groupBy(_.video_id)
    assert(frames.forall(!_.decoded))
    assert(byId("v1").length == 8)
    assert(byId("v2").length == 2)
    assert(byId("v1").map(_.ts_ms).toSeq == byId("v1").map(_.ts_ms).toSeq.sorted)
    assert(byId("v1").map(_.frame_phash).distinct.length > 1)
  }

  test("video: REAL y4m decode — sampled frames carry true luma phashes") {
    import graft.video.Video
    // 20 frames, 64x64: even frames bright-right split, odd frames flat
    val lumaFrames = (0 until 20).map { f =>
      if (f % 2 == 0)
        Array.tabulate(64 * 64)(i => (if (i % 64 < 32) 0 else 255).toByte)
      else Array.fill(64 * 64)(100.toByte)
    }
    val y4m = Video.Y4m.encodeMono(64, 64, 10, 1, lumaFrames)
    val df = Seq(("vid", y4m, 2000L)).toDF("video_id", "bytes", "dur_ms")
    val frames = MediaFeatures.videoFrameSample(df, maxFrames = 10).collect()
      .sortBy(_.frame_index)
    assert(frames.length == 10)
    assert(frames.forall(_.decoded))
    // sample of 10 from 20 = every 2nd source frame (0,2,4,..) — all are
    // the split pattern whose average-hash sets exactly 32 bits
    assert(frames.forall(f => java.lang.Long.bitCount(f.frame_phash) == 32))
    // ts math: source frame 2f at 20 frames / 2000ms -> f*200ms
    assert(frames.map(_.ts_ms).toSeq == (0 until 10).map(_ * 200L))
  }

  test("video: REAL avi/mjpeg decode through the JDK JPEG reader") {
    import graft.video.Video
    val split = Video.LumaFrame(64, 64,
      Array.tabulate(64 * 64)(i => (if (i % 64 < 32) 0 else 255).toByte))
    val flat = Video.LumaFrame(64, 64, Array.fill(64 * 64)(100.toByte))
    val avi = Video.Avi.encodeMjpeg(64, 64, 25,
      Seq(split, flat, split).map(Video.Avi.jpegOfLuma))
    val df = Seq(("avi1", avi, 120L)).toDF("video_id", "bytes", "dur_ms")
    val frames = MediaFeatures.videoFrameSample(df, maxFrames = 16).collect()
      .sortBy(_.frame_index)
    assert(frames.length == 3) // fewer real frames than maxFrames -> all
    assert(frames.forall(_.decoded))
    assert(java.lang.Long.bitCount(frames(0).frame_phash) == 32)
    assert(frames(1).frame_phash == 0L) // flat frame: no above-mean cell
    assert(frames(0).frame_phash == frames(2).frame_phash)
  }
}
