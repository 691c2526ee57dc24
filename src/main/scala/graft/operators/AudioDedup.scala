package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.audio.{Fingerprint, Wav}
import graft.functions.FastHash

/** Configuration of the acoustic near-duplicate pipeline — the AUDIO
  * twin of [[DedupConfig]] (transcripts) and [[EmbDedupConfig]]
  * (embeddings): same candidate/verify split, same hot-bucket
  * discipline, a fingerprint instead of a text/vector sketch.
  *
  * Fingerprint geometry (see [[graft.audio.Fingerprint]]): 33 log-spaced
  * bands over 300 Hz..min(6 kHz, 0.45·sr), ~64 ms frames at hop
  * frameLen/4 → one 32-bit word per ~16 ms of audio; a 30 s clip's
  * print is ~7.5 kB vs ~1 MB of 16 kHz PCM, so everything after the
  * single decode+FFT pass moves 2 orders of magnitude less data.
  *
  * Candidate generation unions TWO key families over the one sketch
  * pass (the same multi-path shape as the text pipeline's LSH + simhash
  * + anagram keys):
  *  - word-minhash: minhash over the clip's DISTINCT fingerprint words
  *    (a shift by whole hops permutes word ORDER but barely changes the
  *    word SET), LSH-banded — at word-set Jaccard 0.5 the default
  *    16 bands × 2 rows fire with p ≈ 0.99. Strong for audio with
  *    temporal structure, where the delta bits are signal-driven.
  *  - profile sign-LSH: integer sign-LSH (EmbDedup's construction) over
  *    the centered mean-log-band-energy profile. Time-averaging makes it
  *    shift-invariant and noise-robust, so it also covers STATIONARY
  *    audio, whose delta bits are noise-driven and word sets diverge
  *    under low-level perturbation.
  * Verification is exact: bit error rate between the two word sequences,
  * minimized over ±maxShiftFrames frame offsets. Haitsma & Kalker accept
  * below 0.35 (their threshold for 3 s granules — the default here);
  * unrelated audio sits at BER ≈ 0.5 with σ ~ 1/√(32·frames), many σ
  * from the threshold for clips over a second.
  *
  * @param frameMs        analysis frame length in ms (rounded up to a
  *                       power-of-two sample count per clip's rate)
  * @param hopDiv         hop = frameLen/hopDiv
  * @param nBands         band energies per frame (nBands−1 sign bits)
  * @param fMinHz         low edge of the banded spectrum
  * @param fMaxHz         high edge (clamped to 0.45·sr)
  * @param minhashK       minhash permutations over distinct words
  * @param bands          LSH bands over the word-minhash signature
  * @param rowsPerBand    signature rows per band
  * @param profileBands   sign-LSH bands over the spectral profile
  * @param profileBits    hyperplanes (sign bits) per profile band
  * @param quantScale     fixed-point scale for the profile quantization
  *                       (integer-exact bucket membership, the
  *                       [[EmbDedupConfig.quantScale]] discipline)
  * @param planeSeed      LCG seed of the deterministic integer planes
  * @param bucketCap      hot-bucket cap (dropped buckets are counted —
  *                       the same documented-lost-recall accounting as
  *                       the text/embedding pipelines)
  * @param maxBer         verification: max bit error rate for an edge
  * @param maxShiftFrames verification: frame-offset search radius
  */
final case class AudioDedupConfig(
    frameMs: Int = 64,
    hopDiv: Int = 4,
    nBands: Int = 33,
    fMinHz: Double = 300.0,
    fMaxHz: Double = 6000.0,
    minhashK: Int = 32,
    bands: Int = 16,
    rowsPerBand: Int = 2,
    profileBands: Int = 8,
    profileBits: Int = 12,
    quantScale: Int = 1000,
    planeSeed: Long = 0x417D10C41B5EEDL,
    bucketCap: Int = 64,
    maxBer: Double = 0.35,
    maxShiftFrames: Int = 8
) {
  require(bands * rowsPerBand <= minhashK,
    "bands * rowsPerBand must not exceed minhashK")
  require(profileBits >= 1 && profileBits <= 63, "profileBits in [1,63]")
}

/** Per-stage counters (same accounting as [[DedupMetrics]] /
  * [[EmbDedupMetrics]]); -1 when metrics were not collected.
  */
final case class AudioDedupMetrics(
    nRows: Long,
    nUndecodable: Long,
    nCandidatePairs: Long,
    nDroppedBuckets: Long,
    nVerifiedEdges: Long,
    nClusters: Long
)

/** Acoustic near-duplicate detection over the input_hint clip table:
  * finds clips whose AUDIO matches even when their transcripts differ
  * (re-transcribed, mis-transcribed or empty rows — the case the
  * transcript pipeline is structurally blind to), the complement of
  * [[DedupPipeline]]'s text path over the same (clip_id, bytes,
  * transcript) rows.
  *
  * Stage layout and shuffle budget (N input rows):
  *   1. fingerprint: narrow map — ONE decode+FFT pass per row produces
  *      both the word sequence (verification) and the LSH band keys
  *      (candidates); materialized once (lineage cut) so no later stage
  *      re-decodes audio.
  *   2. candidates: 1 shuffle (count-agg on the band key) + broadcast
  *      hot-key filter + capped in-row expansion ([[CappedPairs]]) —
  *      never a self-join on the key column.
  *   3. verify: 1 shuffle (SHUFFLE_HASH join of word sequences to pair
  *      ids), bounded BER kernel on candidate pairs only.
  *   4. connected components over verified edges (shared CC kernel).
  *
  * Undecodable or byte-less rows can't produce acoustic evidence: they
  * drop out of candidate generation (counted in metrics) and cluster as
  * singletons in [[run]].
  */
object AudioDedup {

  /** Upper bound on fingerprint rows per verify-join hash build
    * (~150-200 MB of (id, fp: array<int> of ~100-300 frame words)
    * rows): a ShuffledHashJoin build is non-spillable, so this — not
    * the core count — must size the verify partitioning (same
    * discipline as [[DedupPipeline.verifyBuildRows]]). Memory-derived;
    * NOT a parallelism tunable.
    */
  val verifyBuildRows: Long = 125000L

  /** Deterministic integer hyperplanes for the profile sign-LSH —
    * `profileBands·profileBits` planes of `nBands` weights in
    * [-500, 500] from a fixed LCG (the [[EmbDedup.planes]]
    * construction, seeded independently).
    */
  def profilePlanes(cfg: AudioDedupConfig): Array[Array[Long]] = {
    var state = cfg.planeSeed
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 33) % 1001L - 500L
    }
    Array.fill(cfg.profileBands * cfg.profileBits)(
      Array.fill(cfg.nBands)(next()))
  }

  /** Profile sign-LSH band keys: quantize the centered profile to the
    * integer grid (round(x·quantScale) — exact sign decisions on any
    * engine or partitioning), one key per band of `profileBits` plane
    * signs; keys are salted into a namespace distinct from the
    * word-minhash family's.
    */
  private def profileKeys(profile: Array[Double], planes: Array[Array[Long]],
      cfg: AudioDedupConfig): Array[Long] = {
    val q = new Array[Long](cfg.nBands)
    var i = 0
    while (i < cfg.nBands) {
      q(i) = math.round(profile(i) * cfg.quantScale)
      i += 1
    }
    val out = new Array[Long](cfg.profileBands)
    var b = 0
    while (b < cfg.profileBands) {
      var sig = 0L
      var j = 0
      while (j < cfg.profileBits) {
        val p = planes(b * cfg.profileBits + j)
        var dot = 0L
        var d = 0
        while (d < cfg.nBands) { dot += q(d) * p(d); d += 1 }
        if (dot > 0) sig |= (1L << j)
        j += 1
      }
      out(b) = FastHash.mix64(FastHash.mix64(0x5052_4f46L + b) ^ sig)
      b += 1
    }
    out
  }

  /** bytes → struct(fp words, LSH band keys — both families), ONE
    * decode+FFT pass. Returns null for undecodable bytes (counted
    * upstream, not thrown: at web scale a corrupt row is data, not a
    * bug in the job).
    */
  def sketchUdf(cfg: AudioDedupConfig)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val planes = profilePlanes(cfg)
    udf { (bytes: Array[Byte]) =>
      try {
        val (pcm, sr) = Wav.decode(bytes)
        val sk = Fingerprint.sketch(pcm, sr, cfg.frameMs, cfg.hopDiv,
          cfg.nBands, cfg.fMinHz, cfg.fMaxHz)
        // minhash over the DISTINCT word set; words are structured sign
        // patterns, so avalanche them into uniform 64-bit hashes first
        val hs = sk.words.map(x => FastHash.mix64(x.toLong & 0xffffffffL))
          .distinct
        val sig = FastHash.minhash(hs, cfg.minhashK)
        val keys = FastHash.bandKeys(sig, cfg.bands, cfg.rowsPerBand) ++
          profileKeys(sk.profile, planes, cfg)
        Some((sk.words, keys))
      } catch { case _: Exception => None }
    }
  }

  /** Materialized per-clip fingerprints: (id, fp: array<int>,
    * keys: array<long>) as a lineage [[graft.spark.Checkpoints.Cut]] —
    * the caller releases it once downstream consumers are materialized.
    * Rows with null bytes are dropped here (no acoustic evidence);
    * undecodable rows survive with fp = null so they can be counted.
    */
  def fingerprints(df: DataFrame, idCol: String, bytesCol: String,
      cfg: AudioDedupConfig): graft.spark.Checkpoints.Cut = {
    val su = sketchUdf(cfg)
    graft.spark.Checkpoints.cut(
      df.filter(col(bytesCol).isNotNull)
        .select(col(idCol).as("id"), su(col(bytesCol)).as("s"))
        .select(col("id"), col("s._1").as("fp"), col("s._2").as("keys")))
  }

  /** Verified acoustic near-dup pairs: banded candidates → BER ≤ maxBer.
    * Returns (pairs(a, b, ber), metrics). The returned frame is
    * lineage-cut (materialized); [[run]] — or any long-lived caller —
    * releases its blocks via another cut/action of its own once
    * consumed. collectMetrics=false skips every counting job.
    */
  def nearDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
      bytesCol: String, cfg: AudioDedupConfig = AudioDedupConfig(),
      collectMetrics: Boolean = true): (DataFrame, AudioDedupMetrics) = {
    val (cut, m) = nearDupPairsCut(spark, df, idCol, bytesCol, cfg,
      collectMetrics)
    (cut.df, m)
  }

  private[operators] def nearDupPairsCut(spark: SparkSession,
      df: DataFrame, idCol: String, bytesCol: String,
      cfg: AudioDedupConfig, collectMetrics: Boolean)
      : (graft.spark.Checkpoints.Cut, AudioDedupMetrics) = {
    def metric(f: => Long): Long = if (collectMetrics) f else -1L
    val fpsCut = fingerprints(df, idCol, bytesCol, cfg)
    val fps = fpsCut.df
    // unconditional cheap count over the just-materialized checkpoint
    // blocks: sizes the verify-join partitioning below (memory-derived,
    // see vParts). Reused as the nRows metric.
    val nRowsAlways = fps.count()
    val nRows = if (collectMetrics) nRowsAlways else -1L
    val nUndecodable = metric(fps.filter(col("fp").isNull).count())
    val good = fps.filter(col("fp").isNotNull)
    val keyed = good.select(col("id"), explode(col("keys")).as("k"))
    val nDropped = metric(keyed.groupBy("k").agg(count(lit(1)).as("n"))
      .filter(col("n") > cfg.bucketCap).count())
    // memory-derived verify partitioning (see [[verifyBuildRows]] and
    // DedupPipeline.run): each verify-join task holds at most
    // ~verifyBuildRows fingerprint rows in its non-spillable hash
    // build; rounded UP to a multiple of defaultParallelism.
    val dp = spark.sparkContext.defaultParallelism
    val vParts = (dp * math.max(1L,
      (nRowsAlways + verifyBuildRows * dp - 1) /
        (verifyBuildRows * dp))).toInt
    val cand = CappedPairs.fromKeys(keyed, cfg.bucketCap, Some(vParts))
    val nCand = metric(cand.count())
    // word sequences arrive by shuffle-hash join: no sort of the pair
    // stream, no driver-side broadcast of an N-row fingerprint table.
    // Join 1 builds the CAPPED PAIR side and streams the fingerprints;
    // only join 2 builds a fingerprint relation, on the derived
    // partitioning (the DedupPipeline.verifyPairs build-side
    // discipline). Inner equi-joins: build side is physical only.
    val berU = udf { (a: Seq[Int], b: Seq[Int]) =>
      Fingerprint.ber(a.toArray, b.toArray, cfg.maxShiftFrames)
    }
    val fetch = good.select(col("id"), col("fp"))
    val verified = cand.hint("SHUFFLE_HASH")
      .join(fetch.select(col("id").as("a"), col("fp").as("afp")), Seq("a"))
      .repartition(vParts, col("b"))
      .join(fetch.select(col("id").as("b"), col("fp").as("bfp"))
        .hint("SHUFFLE_HASH"), Seq("b"))
      .select(col("a"), col("b"), berU(col("afp"), col("bfp")).as("ber"))
      .filter(col("ber") <= cfg.maxBer)
    val vCut = graft.spark.Checkpoints.cut(verified)
    val nVerified = metric(vCut.df.count())
    // the verified edges are materialized — the decode+FFT blocks can go
    fpsCut.release()
    (vCut,
      AudioDedupMetrics(nRows, nUndecodable, nCand, nDropped, nVerified,
        -1L))
  }

  /** Full acoustic clustering: verified edges → connected components.
    * Returns (assignments(id, cluster), metrics); cluster = min id of
    * the component; rows without acoustic evidence (null/undecodable
    * bytes) and isolated clips map to themselves.
    */
  def run(spark: SparkSession, df: DataFrame, idCol: String,
      bytesCol: String, cfg: AudioDedupConfig = AudioDedupConfig(),
      collectMetrics: Boolean = true): (DataFrame, AudioDedupMetrics) = {
    val (vCut, m) = nearDupPairsCut(spark, df, idCol, bytesCol, cfg,
      collectMetrics)
    val edges = vCut.df.select(col("a").as("src"), col("b").as("dst"))
    val cc = ConnectedComponents.runCut(spark, edges, withAllNodes = false,
      edgesMaterialized = true) // vCut is an eager checkpoint
    val assignments = graft.spark.Checkpoints.cut(
      df.select(col(idCol).as("id")) // SHUFFLE_HASH: sort-free (see DedupPipeline)
        .join(cc.df.withColumnRenamed("node", "id").hint("SHUFFLE_HASH"),
          Seq("id"), "left")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("cluster"))).df
    cc.release()
    vCut.release()
    val nClusters =
      if (collectMetrics) assignments.select("cluster").distinct().count()
      else -1L
    (assignments, m.copy(nClusters = nClusters))
  }
}
