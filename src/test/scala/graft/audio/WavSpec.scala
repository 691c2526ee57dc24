package graft.audio

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ClipGen

class WavSpec extends AnyFunSuite {

  test("encode/decode round-trips samples and rate") {
    val samples = Array.tabulate(1600)(i =>
      (math.sin(2 * math.Pi * 440 * i / 16000.0) * 20000).toShort)
    val bytes = Wav.encode(samples, 16000)
    val (decoded, sr) = Wav.decode(bytes)
    assert(sr == 16000)
    assert(decoded.toSeq == samples.toSeq)
  }

  test("SNR: identical is infinite, perturbed stays >= 30 dB, noise is low") {
    val ref = ClipGen.waveform(123L, 16000, 500)
    assert(Wav.snrDb(ref, ref).isPosInfinity)
    val pert = ClipGen.perturb(ref, 99L)
    val snr = Wav.snrDb(ref, pert)
    assert(snr >= 30.0, s"snr=$snr")
    val other = ClipGen.waveform(124L, 16000, 500)
    assert(Wav.snrDb(ref, other) < 10.0)
  }

  test("clip generation is deterministic and invariant-compliant") {
    val a = (0L until 10L).flatMap(c => ClipGen.clusterSpecs(42L, c))
    val b = (0L until 10L).flatMap(c => ClipGen.clusterSpecs(42L, c))
    assert(a == b)
    val clips = a.map(ClipGen.synthesize)
    assert(clips.map(_.clip_id).distinct.size == clips.size)
    // every dup decodes and meets the SNR invariant vs its canonical
    for (group <- clips.groupBy(_.cluster_id).values; if group.size > 1) {
      val canon = group.find(_.is_canonical).get
      val (refSamples, _) = Wav.decode(canon.bytes)
      for (dup <- group if !dup.is_canonical) {
        val (s, sr) = Wav.decode(dup.bytes)
        assert(sr == canon.sr_hz)
        assert(Wav.snrDb(refSamples, s) >= 30.0)
      }
    }
  }

  test("decode rejects garbage") {
    intercept[IllegalArgumentException](Wav.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      Wav.decode(Array.fill[Byte](64)(0x41)))
  }
}
