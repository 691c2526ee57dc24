package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Pins the zero-allocation char-based kernels (Distances.dlChars etc.,
  * the dedup verify hot path) to the reference-parity Array[Int]
  * implementations, over seeded random strings and distance caps.
  */
class DistancesPropSpec extends AnyFunSuite {

  private def ints(s: String): Array[Int] = s.toCharArray.map(_.toInt)
  private val rng = new scala.util.Random(12345)
  private def randKey(maxLen: Int): String = {
    val n = rng.nextInt(maxLen + 1)
    String.valueOf(Array.fill(n)((33 + rng.nextInt(58)).toChar))
  }

  test("dlChars == damerauLevenshtein over random strings and caps") {
    for (_ <- 0 until 20000) {
      val a = randKey(24)
      val b = randKey(24)
      val max = rng.nextInt(13)
      assert(Distances.dlChars(a, b, max) ==
        Distances.damerauLevenshtein(ints(a), ints(b), max),
        s"a=$a b=$b max=$max")
    }
  }

  test("dlChars on near pairs (edit-corrupted) matches exactly") {
    for (_ <- 0 until 5000) {
      val a = graft.sources.SyntheticText.phrase(rng, 1 + rng.nextInt(4))
      val b = graft.sources.SyntheticText.corrupt(rng, a, rng.nextInt(4))
      for (max <- Seq(1, 2, 3, 5)) {
        assert(Distances.dlChars(a, b, max) ==
          Distances.damerauLevenshtein(ints(a), ints(b), max),
          s"a=$a b=$b max=$max")
      }
    }
  }

  test("lcs/prefix/suffix char forms match array forms") {
    for (_ <- 0 until 5000) {
      val a = randKey(24)
      val b = randKey(24)
      assert(Distances.lcsChars(a, b) ==
        Distances.longestCommonSubstring(ints(a), ints(b)))
      assert(Distances.prefixChars(a, b) == Distances.commonPrefix(ints(a), ints(b)))
      assert(Distances.suffixChars(a, b) == Distances.commonSuffix(ints(a), ints(b)))
    }
  }

  test("transposition distinguishes DL from plain Levenshtein (03xx)") {
    // reference tests/main.rs:677-685: ab<->ba is 1 edit in DL, 2 in Lev
    assert(Distances.dlChars("ab", "ba", 2) == 1)
    assert(Distances.levenshtein(ints("ab"), ints("ba"), 2) == 2)
  }
}
