package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Random

import graft.audio.Wav

/** Deterministic synthetic clip table conforming to the BASELINE.json
  * input_hint schema: (clip_id string, bytes binary, sr_hz int, dur_ms
  * int, codec string, transcript string).
  *
  * Ground truth by construction: each cluster has one canonical clip
  * (seeded sine+noise mixture + canonical transcript) and 0..maxDups
  * near-duplicates (the SAME waveform with a small perturbation that
  * keeps SNR >= 30 dB vs the original, and a transcript corrupted within
  * DL <= maxEdits). Generation is distributed: the driver plans (seeded)
  * cluster specs; waveform synthesis happens per-partition on executors —
  * no driver-side audio buffers, so the same generator scales with rows.
  */
object ClipGen {

  final case class ClipSpec(
      clipId: String,
      clusterId: Long,
      seed: Long,
      dupIndex: Int, // 0 = canonical
      srHz: Int,
      durMs: Int,
      transcript: String
  )

  final case class Clip(
      clip_id: String,
      bytes: Array[Byte],
      sr_hz: Int,
      dur_ms: Int,
      codec: String,
      transcript: String,
      cluster_id: Long, // ground truth (dropped for the public table)
      is_canonical: Boolean
  )

  val sampleRates: Array[Int] = Array(16000, 22050, 44100)

  /** Plan the clip specs (cheap, driver-side, seeded). */
  def plan(seed: Long, nClusters: Int, maxDups: Int = 3,
      maxEdits: Int = 2): Vector[ClipSpec] = {
    val rng = new Random(seed)
    val out = Vector.newBuilder[ClipSpec]
    var i = 0L
    for (c <- 0 until nClusters) {
      // realistic speech clips: 1-30 s, transcript length proportional to
      // duration (~2 words/second) — transcripts of 5-63 words, like real
      // ASR output, so per-row sketch/verify work is meaningful
      val durMs = 1000 + rng.nextInt(29000)
      val canonical = SyntheticText.phrase(rng, 3 + durMs / 500)
      val sr = sampleRates(rng.nextInt(sampleRates.length))
      val clusterSeed = rng.nextLong()
      out += ClipSpec(f"clip$i%08d", c.toLong, clusterSeed, 0, sr, durMs, canonical)
      i += 1
      val nDups = rng.nextInt(maxDups + 1)
      for (d <- 1 to nDups) {
        val t = SyntheticText.corrupt(rng, canonical, 1 + rng.nextInt(maxEdits))
        out += ClipSpec(f"clip$i%08d", c.toLong, clusterSeed, d, sr, durMs, t)
        i += 1
      }
    }
    out.result()
  }

  /** Synthesize the canonical waveform for a cluster seed: a mixture of
    * three seeded sinusoids plus low-level noise at ~0.5 full scale.
    */
  def waveform(seed: Long, srHz: Int, durMs: Int): Array[Short] = {
    val rng = new Random(seed)
    val n = (srHz.toLong * durMs / 1000).toInt
    val f1 = 80.0 + rng.nextDouble() * 400
    val f2 = 500.0 + rng.nextDouble() * 1500
    val f3 = 2000.0 + rng.nextDouble() * 4000
    val a1 = 0.25 + rng.nextDouble() * 0.15
    val a2 = 0.1 + rng.nextDouble() * 0.1
    val a3 = 0.03 + rng.nextDouble() * 0.05
    val noiseAmp = 0.01
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val t = i.toDouble / srHz
      val v = a1 * math.sin(2 * math.Pi * f1 * t) +
        a2 * math.sin(2 * math.Pi * f2 * t) +
        a3 * math.sin(2 * math.Pi * f3 * t) +
        noiseAmp * (rng.nextDouble() * 2 - 1)
      out(i) = math.max(-32768, math.min(32767, (v * 32767).round)).toShort
      i += 1
    }
    out
  }

  /** Perturb a waveform keeping SNR well above 30 dB: add seeded noise at
    * ~1/60 of full scale (SNR ≈ 36-40 dB against the 0.4-0.5 FS signal).
    */
  def perturb(ref: Array[Short], seed: Long): Array[Short] = {
    val rng = new Random(seed)
    val amp = 150 // ~0.005 FS
    val out = new Array[Short](ref.length)
    var i = 0
    while (i < ref.length) {
      val v = ref(i) + (rng.nextInt(2 * amp + 1) - amp)
      out(i) = math.max(-32768, math.min(32767, v)).toShort
      i += 1
    }
    out
  }

  def synthesize(spec: ClipSpec): Clip = {
    val canonical = waveform(spec.seed, spec.srHz, spec.durMs)
    val samples =
      if (spec.dupIndex == 0) canonical
      else perturb(canonical, spec.seed ^ (spec.dupIndex.toLong * 0x9e3779b9L))
    Clip(spec.clipId, Wav.encode(samples, spec.srHz), spec.srHz, spec.durMs,
      "pcm_s16le", spec.transcript, spec.clusterId, spec.dupIndex == 0)
  }

  /** Distributed clip table: specs parallelized, waveforms synthesized on
    * executors. Includes ground-truth columns (cluster_id, is_canonical);
    * select them away to get the exact input_hint shape.
    */
  def table(spark: SparkSession, seed: Long, nClusters: Int,
      maxDups: Int = 3, maxEdits: Int = 2,
      numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val specs = plan(seed, nClusters, maxDups, maxEdits)
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    spark.sparkContext.parallelize(specs, parts).map(synthesize).toDF()
  }

  /** Clip table WITHOUT waveform synthesis (bytes = null): the transcript
    * columns and ground truth only. The text-dedup pipeline never reads
    * `bytes`, so benchmarks at millions of clips skip gigabytes of PCM
    * synthesis while keeping the exact schema and dup structure.
    */
  def transcriptTable(spark: SparkSession, seed: Long, nClusters: Int,
      maxDups: Int = 3, maxEdits: Int = 2,
      numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val specs = plan(seed, nClusters, maxDups, maxEdits)
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    spark.sparkContext.parallelize(specs, parts)
      .map(s => Clip(s.clipId, null, s.srHz, s.durMs, "pcm_s16le",
        s.transcript, s.clusterId, s.dupIndex == 0))
      .toDF()
  }
}
