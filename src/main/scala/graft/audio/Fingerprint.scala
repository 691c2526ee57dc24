package graft.audio

/** Spectral audio fingerprint in the style of Haitsma & Kalker, "A
  * Highly Robust Audio Fingerprint System" (ISMIR 2002) — public-domain
  * method, pure-JVM implementation: Hann-windowed frames → power
  * spectrum (iterative radix-2 FFT) → log-spaced band energies → one
  * 32-bit word per frame step whose bit m is the SIGN of the band-energy
  * difference along both the band and time axes:
  *
  *   bit(n, m) = [ (E(n,m) − E(n,m+1)) − (E(n−1,m) − E(n−1,m+1)) > 0 ]
  *
  * The sign of a double difference is robust to level changes, additive
  * low-level noise and lossy re-encoding — two perceptually-equal clips
  * produce word sequences at a small Hamming distance (bit error rate
  * ≪ 0.5), unrelated clips sit at BER ≈ 0.5. The audio twin of the text
  * pipeline's MinHash sketch: a compact per-row signature (4 bytes per
  * frame step vs ~1 MB of PCM for a 30 s clip) that candidate generation
  * and verification both run on, so the expensive decode+FFT pass
  * happens exactly once per row.
  */
object Fingerprint {

  /** Smallest power of two ≥ srHz·frameMs/1000 — FFT-friendly frame
    * length; ~64 ms at the table's sample rates (1024 @ 16 kHz,
    * 2048 @ 22.05 kHz, 4096 @ 44.1 kHz).
    */
  def frameLenFor(srHz: Int, frameMs: Int): Int = {
    val want = math.max(2, srHz.toLong * frameMs / 1000).toInt
    java.lang.Integer.highestOneBit(want - 1) * 2
  }

  /** In-place iterative radix-2 FFT (Cooley-Tukey, textbook form).
    * Lengths must be a power of two.
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blockStart = 0
      while (blockStart < n) {
        var cwr = 1.0
        var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blockStart + k
          val b = a + len / 2
          val tr = re(b) * cwr - im(b) * cwi
          val ti = re(b) * cwi + im(b) * cwr
          re(b) = re(a) - tr
          im(b) = im(a) - ti
          re(a) += tr
          im(a) += ti
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr
          cwr = nwr
          k += 1
        }
        blockStart += len
      }
      len <<= 1
    }
  }

  /** FFT-bin edges of `nBands` log-spaced bands over [fMinHz, fMax]
    * where fMax = min(fMaxHz, 0.45·sr): nBands+1 strictly-increasing bin
    * indices in [1, frameLen/2].
    */
  def bandEdges(srHz: Int, frameLen: Int, nBands: Int, fMinHz: Double,
      fMaxHz: Double): Array[Int] = {
    val fMax = math.min(fMaxHz, 0.45 * srHz)
    val ratio = fMax / fMinHz
    val out = new Array[Int](nBands + 1)
    var m = 0
    while (m <= nBands) {
      val f = fMinHz * math.pow(ratio, m.toDouble / nBands)
      val bin = math.round(f * frameLen / srHz).toInt
      // strictly increasing even when low bands round to the same bin
      out(m) = math.min(frameLen / 2,
        math.max(if (m == 0) 1 else out(m - 1) + 1, bin))
      m += 1
    }
    out
  }

  /** One analysis pass over a clip: fingerprint words (the verification
    * signal) and the clip-level spectral profile (a candidate-generation
    * signal) from the same decode+FFT sweep.
    *
    * @param words   one 32-bit word per frame step — the Haitsma-Kalker
    *                sign-of-double-difference bits (see [[Fingerprint]])
    * @param profile centered mean log band energies (length nBands):
    *                time-averaged, so it is shift-invariant and noise
    *                averages out; centered (mean subtracted), so the
    *                spectral SHAPE every clip shares — wider log-spaced
    *                bands collect more broadband energy — cancels and
    *                unrelated clips decorrelate
    */
  final case class AudioSketch(words: Array[Int], profile: Array[Double])

  /** Fingerprint words only — see [[sketch]]. */
  def words(pcm: Array[Short], srHz: Int, frameMs: Int = 64,
      hopDiv: Int = 4, nBands: Int = 33, fMinHz: Double = 300.0,
      fMaxHz: Double = 6000.0): Array[Int] =
    sketch(pcm, srHz, frameMs, hopDiv, nBands, fMinHz, fMaxHz).words

  /** Fingerprint words + spectral profile of a PCM clip: one 32-bit
    * word per frame step (hop = frameLen/hopDiv), nBands band energies
    * per frame (so nBands−1 ≤ 32 bits are populated; the canonical
    * config uses 33 bands → 32 bits, Haitsma & Kalker's geometry).
    * Clips shorter than one frame are zero-padded to a single frame,
    * whose word falls back to the band-axis-only sign (no previous
    * frame to difference against) — every decodable clip yields ≥ 1
    * word.
    */
  def sketch(pcm: Array[Short], srHz: Int, frameMs: Int = 64,
      hopDiv: Int = 4, nBands: Int = 33, fMinHz: Double = 300.0,
      fMaxHz: Double = 6000.0): AudioSketch = {
    require(nBands >= 2 && nBands <= 33, "nBands in [2, 33]")
    val frameLen = frameLenFor(srHz, frameMs)
    val hop = math.max(1, frameLen / hopDiv)
    val x = if (pcm.length >= frameLen) pcm
      else java.util.Arrays.copyOf(pcm, frameLen)
    val nFrames = 1 + (x.length - frameLen) / hop
    val edges = bandEdges(srHz, frameLen, nBands, fMinHz, fMaxHz)
    val hann = new Array[Double](frameLen)
    var i = 0
    while (i < frameLen) {
      hann(i) = 0.5 - 0.5 * math.cos(2.0 * math.Pi * i / (frameLen - 1))
      i += 1
    }
    val re = new Array[Double](frameLen)
    val im = new Array[Double](frameLen)
    val prev = new Array[Double](nBands)
    val cur = new Array[Double](nBands)
    val profSum = new Array[Double](nBands)
    val out = new Array[Int](math.max(1, nFrames - 1))
    var n = 0
    while (n < nFrames) {
      val off = n * hop
      var k = 0
      while (k < frameLen) {
        re(k) = x(off + k) * hann(k)
        im(k) = 0.0
        k += 1
      }
      fft(re, im)
      var m = 0
      while (m < nBands) {
        var e = 0.0
        var b = edges(m)
        val hi = edges(m + 1)
        while (b < hi) { e += re(b) * re(b) + im(b) * im(b); b += 1 }
        cur(m) = e
        profSum(m) += math.log(1e-9 + e)
        m += 1
      }
      if (n > 0 || nFrames == 1) {
        var w = 0
        var bit = 0
        while (bit < nBands - 1) {
          val dBand = cur(bit) - cur(bit + 1)
          val d = if (nFrames == 1) dBand
            else dBand - (prev(bit) - prev(bit + 1))
          if (d > 0) w |= (1 << bit)
          bit += 1
        }
        out(math.max(0, n - 1)) = w
      }
      System.arraycopy(cur, 0, prev, 0, nBands)
      n += 1
    }
    val profile = new Array[Double](nBands)
    var pm = 0
    var mean = 0.0
    while (pm < nBands) { mean += profSum(pm) / nFrames; pm += 1 }
    mean /= nBands
    pm = 0
    while (pm < nBands) {
      profile(pm) = profSum(pm) / nFrames - mean
      pm += 1
    }
    AudioSketch(out, profile)
  }

  /** Bit error rate between two word sequences: min over frame offsets
    * in [−maxShift, maxShift] of (differing bits / compared bits),
    * requiring ≥ 2/3 of the shorter sequence to overlap (a tiny overlap
    * at a large shift is not evidence). 0 = identical aligned prints,
    * ~0.5 = unrelated audio; returns 1.0 when no offset yields enough
    * overlap. O(maxShift · min(|a|,|b|)) int ops — the bounded verify
    * kernel candidate pairs are scored with.
    */
  def ber(a: Array[Int], b: Array[Int], maxShift: Int): Double = {
    if (a.isEmpty || b.isEmpty) return 1.0
    val minOverlap = math.max(1, math.min(a.length, b.length) * 2 / 3)
    var best = 1.0
    var s = -maxShift
    while (s <= maxShift) {
      val i0 = math.max(0, s)
      val i1 = math.min(a.length, b.length + s)
      val overlap = i1 - i0
      if (overlap >= minOverlap) {
        var diff = 0L
        var i = i0
        while (i < i1) {
          diff += java.lang.Integer.bitCount(a(i) ^ b(i - s))
          i += 1
        }
        val r = diff.toDouble / (32.0 * overlap)
        if (r < best) best = r
      }
      s += 1
    }
    best
  }
}
