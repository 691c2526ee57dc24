package graft.audio

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ClipGen

/** Fingerprint kernel: FFT sanity, determinism, and the separation the
  * dedup pipeline rests on — near-duplicate clips (ClipGen's SNR ≥ 30 dB
  * perturbations) at a BER far below unrelated clips, whole-hop shifts
  * recovered by the offset search, profiles stable under perturbation.
  */
class FingerprintSpec extends AnyFunSuite {

  test("fft: sine concentrates energy in its bin") {
    val n = 1024
    val bin = 37
    val re = Array.tabulate(n)(i => math.sin(2 * math.Pi * bin * i / n))
    val im = new Array[Double](n)
    Fingerprint.fft(re, im)
    val mags = Array.tabulate(n / 2)(k => math.hypot(re(k), im(k)))
    val peak = mags.indexOf(mags.max)
    assert(peak == bin)
    // everything off-peak is numerically negligible
    val off = mags.zipWithIndex.filter(_._2 != bin).map(_._1).max
    assert(off < mags(bin) * 1e-9)
  }

  test("fft: parseval (energy preserved up to scale n)") {
    val rng = new scala.util.Random(7)
    val n = 256
    val x = Array.fill(n)(rng.nextGaussian())
    val re = x.clone()
    val im = new Array[Double](n)
    Fingerprint.fft(re, im)
    val timeE = x.map(v => v * v).sum
    val freqE = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(timeE - freqE) / timeE < 1e-9)
  }

  test("band edges strictly increasing at all table sample rates") {
    for (sr <- ClipGen.sampleRates) {
      val frameLen = Fingerprint.frameLenFor(sr, 64)
      val e = Fingerprint.bandEdges(sr, frameLen, 33, 300.0, 6000.0)
      assert(e.length == 34)
      assert(e.sliding(2).forall(p => p(1) > p(0)), s"sr=$sr: ${e.toSeq}")
      assert(e.last <= frameLen / 2)
    }
  }

  test("sketch is deterministic and yields >=1 word for tiny clips") {
    val pcm = Array.tabulate(100)(i => (math.sin(i * 0.3) * 5000).toShort)
    val a = Fingerprint.sketch(pcm, 16000)
    val b = Fingerprint.sketch(pcm, 16000)
    assert(a.words.toSeq == b.words.toSeq)
    assert(a.profile.toSeq == b.profile.toSeq)
    assert(a.words.nonEmpty)
    assert(math.abs(a.profile.sum) < 1e-9) // centered
  }

  /** Canonical + ClipGen-style perturbed copy + an unrelated clip, at a
    * fixed sample rate and duration.
    */
  private def trio(seed: Long, srHz: Int, durMs: Int)
      : (Array[Short], Array[Short], Array[Short]) = {
    val canon = ClipGen.waveform(seed, srHz, durMs)
    val dup = ClipGen.perturb(canon, seed ^ 0x9e3779b9L)
    val other = ClipGen.waveform(seed + 1000, srHz, durMs)
    (canon, dup, other)
  }

  test("BER separates SNR>=30dB near-dups from unrelated clips") {
    for ((sr, durMs) <- Seq((16000, 3000), (22050, 5000), (44100, 2000))) {
      val (canon, dup, other) = trio(sr * 31L, sr, durMs)
      val wc = Fingerprint.words(canon, sr)
      val wd = Fingerprint.words(dup, sr)
      val wo = Fingerprint.words(other, sr)
      val berDup = Fingerprint.ber(wc, wd, 8)
      val berOther = Fingerprint.ber(wc, wo, 8)
      assert(berDup < 0.35, s"sr=$sr dup BER $berDup")
      assert(berOther > 0.42, s"sr=$sr unrelated BER $berOther")
      assert(berOther - berDup > 0.1, s"sr=$sr separation")
    }
  }

  test("whole-hop time shift is recovered by the offset search") {
    val sr = 16000
    val canon = ClipGen.waveform(99L, sr, 4000)
    val frameLen = Fingerprint.frameLenFor(sr, 64)
    val hop = frameLen / 4
    // drop exactly 3 hops from the front: frames align at offset 3
    val shifted = canon.drop(3 * hop)
    val a = Fingerprint.words(canon, sr)
    val b = Fingerprint.words(shifted, sr)
    assert(Fingerprint.ber(a, b, 8) < 0.35)
    // without the offset search the same pair reads as unrelated-ish
    assert(Fingerprint.ber(a, b, 0) > Fingerprint.ber(a, b, 8))
  }

  test("profile is stable under perturbation, distinct across clips") {
    val sr = 22050
    val (canon, dup, other) = trio(777L, sr, 3000)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map(p => p._1 * p._2).sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val pc = Fingerprint.sketch(canon, sr).profile
    val pd = Fingerprint.sketch(dup, sr).profile
    val po = Fingerprint.sketch(other, sr).profile
    assert(cos(pc, pd) > 0.98, s"dup profile cos ${cos(pc, pd)}")
    assert(cos(pc, po) < 0.9, s"unrelated profile cos ${cos(pc, po)}")
  }
}
