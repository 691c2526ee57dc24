package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Suffix-array kernel: construction order and containment lookups must
  * agree with the naive definitions on arbitrary inputs — the kernel
  * backs the dedup substring pass's per-host multi-probe verification.
  */
class SuffixArraysSpec extends AnyFunSuite {

  private def naiveSa(s: String): Array[Int] =
    s.indices.toArray.sortBy(s.substring(_))

  private val rng = new scala.util.Random(424242)
  private def randStr(maxLen: Int, alpha: String): String = {
    val n = rng.nextInt(maxLen + 1)
    String.valueOf(Array.fill(n)(alpha(rng.nextInt(alpha.length))))
  }

  test("construction matches naive suffix sort on fixed cases") {
    for (s <- Seq("", "a", "banana", "mississippi", "aaaaaaa",
        "abcabcabcabc", "the quick brown fox", "zyxwvu")) {
      assert(SuffixArrays.build(s).toSeq == naiveSa(s).toSeq, s"input: '$s'")
    }
  }

  test("construction matches naive suffix sort on random strings") {
    // low-entropy alphabets stress the rank-tie rounds of prefix doubling
    for (_ <- 0 until 300) {
      val s = randStr(200, "aab")
      assert(SuffixArrays.build(s).toSeq == naiveSa(s).toSeq, s"input: '$s'")
    }
    for (_ <- 0 until 200) {
      val s = randStr(120, "abcdefghijklmnopqrstuvwxyz ")
      assert(SuffixArrays.build(s).toSeq == naiveSa(s).toSeq, s"input: '$s'")
    }
  }

  test("containsSub agrees with String.contains on random (host, probe)") {
    for (_ <- 0 until 500) {
      val host = randStr(80, "abc")
      val sa = SuffixArrays.build(host)
      // mix of real substrings, corrupted tails and alien probes
      val from = if (host.isEmpty) 0 else rng.nextInt(host.length)
      val len = rng.nextInt(21)
      val real = host.substring(from, math.min(from + len, host.length))
      val probe =
        if (rng.nextBoolean()) real
        else real + randStr(4, "xab")
      assert(SuffixArrays.containsSub(host, sa, probe) == host.contains(probe),
        s"host='$host' probe='$probe'")
    }
  }

  test("long repetitive host (prefix-doubling stress) answers correctly") {
    val host = "abracadabra" * 500 // 5500 chars, heavy rank ties
    val sa = SuffixArrays.build(host)
    assert(SuffixArrays.containsSub(host, sa, "cadabraabrac"))
    assert(SuffixArrays.containsSub(host, sa, "abracadabra" * 100))
    assert(!SuffixArrays.containsSub(host, sa, "abracadabrax"))
    assert(!SuffixArrays.containsSub(host, sa, "zz"))
  }
}
