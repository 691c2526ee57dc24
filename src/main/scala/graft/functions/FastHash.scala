package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Production hash family for the dedup pipeline: one pass over the text
  * per row computes every shingle hash, the full k-permutation MinHash
  * signature and the SimHash — plain JVM arithmetic (splitmix64 mixing),
  * ~1000x the throughput of the interpreted higher-order md5 construction
  * used by the portable/oracle queries (same pipeline shape, different
  * hash family; LSH recall math is hash-family-agnostic).
  *
  * Everything is deterministic: seeds derive from the permutation index,
  * so the "shingle/signature config" (n, k, seed) pins results across
  * runs and cluster sizes.
  */
object FastHash {

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Rolling hashes of all n-shingles of `s` (over chars). Returns at
    * least one hash (hash of the whole string when |s| < n), mirroring
    * the padded semantics of [[TextFns.charShingles]].
    */
  def shingleHashes(s: String, n: Int): Array[Long] = {
    val len = s.length
    if (len <= n) return Array(mix64(polyHash(s, 0, len)))
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i + n <= len) {
      out(i) = mix64(polyHash(s, i, n))
      i += 1
    }
    out
  }

  @inline private def polyHash(s: String, from: Int, n: Int): Long = {
    var h = 1125899906842597L
    var j = from
    val end = from + n
    while (j < end) { h = h * 31L + s.charAt(j); j += 1 }
    h
  }

  /** MinHash signature: k permutations h_i(x) = mix64(x ^ seed_i), min
    * over the row's shingle hashes. One pass: O(k·|shingles|) long ops.
    */
  def minhash(hashes: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var p = 0
      while (p < k) {
        val v = mix64(h ^ (p * 0xc2b2ae3d27d4eb4fL))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** SimHash-64 over shingle hashes (sign of per-bit votes). */
  def simhash(hashes: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Column: MinHash signature (array<long>) of n-shingles of a string. */
  def minhashSig(c: Column, n: Int, k: Int): Column = {
    val f = udf { (s: String) =>
      Option(s).map(x => minhash(shingleHashes(x, n), k))
    }
    f(c)
  }

  /** Column: SimHash-64 (long) of n-shingles of a string. */
  def simhash64(c: Column, n: Int): Column = {
    val f = udf { (s: String) =>
      Option(s).map(x => simhash(shingleHashes(x, n)))
    }
    f(c)
  }

  /** Column: both at once (struct<sig:array<long>, sim:long>) — one text
    * pass when the pipeline needs both.
    */
  def sketch(c: Column, n: Int, k: Int): Column = {
    val f = udf { (s: String) =>
      Option(s).map { x =>
        val hs = shingleHashes(x, n)
        (minhash(hs, k), simhash(hs))
      }
    }
    f(c)
  }

  /** LSH band keys from a MinHash signature, numerically (band index
    * mixed with the band's rows — no string building): one Long per band.
    */
  def bandKeys(sig: Array[Long], bands: Int, rowsPerBand: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix64(b.toLong * 0x9e3779b97f4a7c15L)
      var r = 0
      while (r < rowsPerBand) { h = mix64(h ^ sig(b * rowsPerBand + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** Hash of the sorted character bag of `s` — the anagram-equality
    * candidate key (two strings collide iff same multiset of chars).
    */
  def anagramKey(s: String): Long = {
    val cs = s.toCharArray
    java.util.Arrays.sort(cs)
    mix64(polyHash(new String(cs), 0, cs.length))
  }

  /** Column: the pipeline's full per-row sketch in ONE text pass:
    * struct<sig, sim, bands, anakey>. Computing the 42 band keys
    * numerically here instead of as per-band Catalyst string expressions
    * removes ~42 string concat+hash ops per row from the explode stage.
    */
  def sketchFull(c: Column, n: Int, k: Int, bands: Int,
      rowsPerBand: Int): Column = {
    val f = udf { (s: String) =>
      Option(s).map { x =>
        val hs = shingleHashes(x, n)
        val sig = minhash(hs, k)
        (sig, simhash(hs), bandKeys(sig, bands, rowsPerBand), anagramKey(x))
      }
    }
    f(c)
  }

  /** Column: minimum shingle hash — the containment-pass anchor key (if
    * A ⊆ B, A's min shingle hash is one of B's shingle hashes).
    */
  def minShingleHash(c: Column, n: Int): Column = {
    val f = udf { (s: String) => Option(s).map(x => shingleHashes(x, n).min) }
    f(c)
  }

  /** Column: distinct shingle hashes (array<long>) — the containment-pass
    * host index; fanout bounded by the string length.
    */
  def shingleHashSet(c: Column, n: Int): Column = {
    val f = udf { (s: String) =>
      Option(s).map(x => shingleHashes(x, n).distinct)
    }
    f(c)
  }
}
