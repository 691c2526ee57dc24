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

  test("image stub: real plumbing, deterministic byte-derived features") {
    val img1 = Array.tabulate(4096)(i => (i * 31 % 251).toByte)
    val img2 = Array.tabulate(4096)(i => (i * 17 % 251).toByte)
    val df = Seq(
      ("a", img1, 64, 64), ("b", img2, 64, 64), ("c", img1, 64, 64)
    ).toDF("image_id", "bytes", "width", "height")
    val out = MediaFeatures.imageFeatures(df).collect()
      .map(f => f.image_id -> f).toMap
    assert(out.size == 3)
    assert(out("a").phash64 == out("c").phash64) // same bytes, same stub
    assert(out("a").phash64 != out("b").phash64)
    assert(out("a").mean_luma >= 0.0 && out("a").mean_luma <= 1.0)
  }

  test("video stub: frame-sample explode shape with bounded fanout") {
    val bytes = Array.tabulate(10000)(i => (i % 127).toByte)
    val df = Seq(
      ("v1", bytes, 2000L), // 2s -> capped at maxFrames
      ("v2", bytes, 80L) // 80ms -> 2 frames at 40ms spacing
    ).toDF("video_id", "bytes", "dur_ms")
    val frames = MediaFeatures.videoFrameSample(df, maxFrames = 8).collect()
    val byId = frames.groupBy(_.video_id)
    assert(byId("v1").length == 8)
    assert(byId("v2").length == 2)
    assert(byId("v1").map(_.ts_ms).toSeq == byId("v1").map(_.ts_ms).toSeq.sorted)
    assert(byId("v1").map(_.frame_phash).distinct.length > 1)
  }
}
