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
  * DL <= maxEdits). Generation is FULLY distributed: cluster ids come
  * from `spark.range`, each cluster's specs and waveforms are derived
  * per-partition on executors from a pure (seed, cluster-id) function —
  * nothing ships from the driver, so the generator scales with rows and
  * its output is independent of partitioning.
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

  /** Specs for ONE cluster, from a per-cluster seed — the distributed
    * generation unit: no driver-side spec vector, no 100MB task
    * serialization, and the output is independent of partitioning
    * (each cluster's RNG is derived purely from (seed, cluster id)).
    */
  def clusterSpecs(seed: Long, c: Long, maxDups: Int = 3,
      maxEdits: Int = 2): Seq[ClipSpec] = {
    val rng = new Random(
      graft.functions.FastHash.mix64(seed ^ (c * 0x9E3779B97F4A7C15L)))
    val durMs = 1000 + rng.nextInt(29000)
    val canonical = SyntheticText.phrase(rng, 3 + durMs / 500)
    val sr = sampleRates(rng.nextInt(sampleRates.length))
    val clusterSeed = rng.nextLong()
    val nDups = rng.nextInt(maxDups + 1)
    ClipSpec(f"clip${c}%08d_0", c, clusterSeed, 0, sr, durMs, canonical) +:
      (1 to nDups).map { d =>
        ClipSpec(f"clip${c}%08d_$d", c, clusterSeed, d, sr, durMs,
          SyntheticText.corrupt(rng, canonical, 1 + rng.nextInt(maxEdits)))
      }
  }

  /** Distributed clip table: cluster ids from `spark.range`, specs AND
    * waveforms generated per-partition on executors — nothing but the
    * (seed, nClusters) scalars ships from the driver, so generation
    * scales with cores at any table size. Includes ground-truth columns
    * (cluster_id, is_canonical); select them away for the exact
    * input_hint shape.
    */
  def table(spark: SparkSession, seed: Long, nClusters: Int,
      maxDups: Int = 3, maxEdits: Int = 2,
      numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, nClusters, 1, parts)
      .flatMap(c => clusterSpecs(seed, c, maxDups, maxEdits).map(synthesize))
      .toDF()
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
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, nClusters, 1, parts)
      .flatMap(c => clusterSpecs(seed, c, maxDups, maxEdits)
        .map(s => Clip(s.clipId, null, s.srHz, s.durMs, "pcm_s16le",
          s.transcript, s.clusterId, s.dupIndex == 0)))
      .toDF()
  }
}
