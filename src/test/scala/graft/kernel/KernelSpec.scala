package graft.kernel

import java.math.BigInteger
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's own unit tests — these expected values ARE the
  * semantics we must preserve (reference: tests/main.rs, sections
  * 01xx anagram algebra, 02xx iterators, 03xx normalization+distances,
  * 04xx model build/score, 08xx transparent variant expansion).
  */
class KernelSpec extends AnyFunSuite {
  val alphabet = Alphabet.test
  def ana(s: String): BigInteger = alphabet.anahash(s)
  def norm(s: String): Array[Int] = alphabet.normalize(s)
  def big(n: Long): BigInteger = BigInteger.valueOf(n)

  // --- 01xx: anagram hash algebra (tests/main.rs:29-153) ---

  test("0103 hash basic") {
    assert(ana("a") == big(2))
    assert(ana("b") == big(3))
    assert(ana("c") == big(5))
    assert(ana("ab") == big(6))
    assert(ana("ab") == ana("ba"))
    assert(ana("abc") == big(30))
    assert(ana("abcabcabc") == big(30L * 30 * 30))
  }

  test("0103 alphabet equivalence classes") {
    assert(ana("abc") == ana("ABC"))
    assert(ana("abc") == ana("bAc"))
    assert(ana("a.b") == ana("a,b"))
  }

  test("0104 hash beyond 64 bits") {
    val v = ana("xyz" * 24)
    assert(v.compareTo(AnaHash.empty) > 0)
    assert(v.bitLength > 64)
  }

  test("0105 anagram equality") {
    assert(ana("stressed") == ana("desserts"))
    assert(ana("dormitory") == ana("dirtyroom"))
    assert(ana("presents") == ana("serpents"))
  }

  test("0106 insertion") {
    assert(AnaHash.insert(ana("ab"), ana("c")) == ana("abc"))
    assert(AnaHash.insert(ana("c"), ana("ab")) == ana("abc"))
  }

  test("0107 containment") {
    assert(AnaHash.contains(ana("abc"), ana("c")))
    assert(AnaHash.contains(ana("abc"), ana("ab")))
    assert(AnaHash.contains(ana("abc"), ana("abc")))
    assert(!AnaHash.contains(ana("c"), ana("abc")))
    assert(!AnaHash.contains(ana("ab"), ana("c")))
    assert(!AnaHash.contains(ana("ab"), ana("abc")))
  }

  test("0108 deletion") {
    assert(AnaHash.delete(ana("abc"), ana("c")).contains(ana("ab")))
    assert(AnaHash.delete(ana("abc"), ana("b")).contains(ana("ac")))
    assert(AnaHash.delete(ana("c"), ana("abc")).isEmpty)
    assert(AnaHash.delete(ana("abc"), ana("x")).isEmpty)
  }

  test("0108 alphabet upper bound") {
    assert(AnaHash.alphabetUpperBound(ana("abc"), 27) == ((2, 3)))
    assert(AnaHash.alphabetUpperBound(ana("ab"), 27) == ((1, 2)))
    assert(AnaHash.alphabetUpperBound(ana("x"), 27) == ((23, 1)))
  }

  test("char count matches normalized length") {
    for (s <- Seq("a", "house", "stressed", "abcabcabc", "h.u,ys"))
      assert(AnaHash.charCount(ana(s), alphabet.size + 1) == norm(s).length)
  }

  test("UNK characters hash to the reserved prime") {
    // '!' is not in the test alphabet -> hash path uses index 27
    assert(ana("!") == big(AnaHash.PRIMES(27).toLong))
    // normalize path uses index 28 (the reference's off-by-one asymmetry,
    // src/anahash.rs:42-44 vs 74-77)
    assert(norm("!").toSeq == Seq(28))
  }

  // --- 02xx: deletion BFS (tests/main.rs:396-455, unique BFS order) ---

  test("0203 BFS unique deletions of abcd") {
    val got = AnaHash.deletionNeighborhood(ana("abcd"), 27, 10)
    val expected = Vector(
      ("abc", 1), ("abd", 1), ("acd", 1), ("bcd", 1),
      ("ab", 2), ("ac", 2), ("bc", 2), ("ad", 2), ("bd", 2), ("cd", 2),
      ("a", 3), ("b", 3), ("c", 3), ("d", 3)
    ).map { case (s, d) => (ana(s), d) }
    assert(got == expected)
  }

  test("BFS respects max distance and excludes empty") {
    val got = AnaHash.deletionNeighborhood(ana("ab"), 27, 5)
    assert(got == Vector((ana("a"), 1), (ana("b"), 1)))
    val d1 = AnaHash.deletionNeighborhood(ana("abcd"), 27, 1)
    assert(d1.map(_._2).forall(_ == 1) && d1.size == 4)
  }

  // --- 03xx: normalization + distances (tests/main.rs:558-807) ---

  test("0301 normalize") {
    assert(norm("a").toSeq == Seq(0))
    assert(norm("b").toSeq == Seq(1))
    assert(norm("aA.,").toSeq == Seq(0, 0, 26, 26))
  }

  test("0302 levenshtein") {
    def lev(a: String, b: String) = Distances.levenshtein(norm(a), norm(b), 99)
    assert(lev("a", "a") == 0)
    assert(lev("a", "b") == 1)
    assert(lev("ab", "ac") == 1)
    assert(lev("a", "ab") == 1)
    assert(lev("ab", "a") == 1)
    assert(lev("ab", "ba") == 2)
    assert(lev("abc", "xyz") == 3)
  }

  test("0303 damerau levenshtein") {
    def dl(a: String, b: String) =
      Distances.damerauLevenshtein(norm(a), norm(b), 99)
    assert(dl("a", "a") == 0)
    assert(dl("a", "b") == 1)
    assert(dl("ab", "ac") == 1)
    assert(dl("a", "ab") == 1)
    assert(dl("ab", "a") == 1)
    assert(dl("ab", "ba") == 1) // transposition: the DL/lev difference
    assert(dl("abc", "xyz") == 3)
    assert(dl("hipotesis", "hypothesis") == 2)
  }

  test("distance max cutoffs return -1") {
    assert(Distances.damerauLevenshtein(norm("abcdef"), norm("a"), 3) == -1)
    assert(Distances.damerauLevenshtein(norm("abc"), norm("xyz"), 2) == -1)
    assert(Distances.levenshtein(norm("abc"), norm("xyz"), 2) == -1)
  }

  test("0304 lcs / prefix / suffix") {
    def lcs(a: String, b: String) =
      Distances.longestCommonSubstring(norm(a), norm(b))
    def pre(a: String, b: String) = Distances.commonPrefix(norm(a), norm(b))
    def suf(a: String, b: String) = Distances.commonSuffix(norm(a), norm(b))
    assert(lcs("test", "testable") == 4)
    assert(lcs("fasttest", "testable") == 4)
    assert(lcs("abcdefhij", "def") == 3)
    assert(lcs("def", "abcdefhij") == 3)
    assert(pre("test", "testable") == 4)
    assert(pre("testable", "test") == 4)
    assert(pre("fasttest", "testable") == 0)
    assert(suf("test", "testable") == 0)
    assert(suf("fasttest", "test") == 4)
  }

  // --- 04xx: model build + scoring (tests/main.rs:809-911) ---

  def testParams: SearchParameters = SearchParameters(
    maxAnagramDistance = DistanceThreshold.Absolute(2),
    maxEditDistance = DistanceThreshold.Absolute(2),
    maxMatches = 10,
    scoreThreshold = 0.0,
    cutoffThreshold = 0.0,
    maxNgram = 2
  )

  def modelWith(lexicon: Seq[String]): LocalVariantModel = {
    val m = new LocalVariantModel(Alphabet.test)
    lexicon.foreach(m.add(_))
    m.build()
  }

  test("0401/0402 model build and anagram buckets") {
    val m = modelWith(Seq("rites", "tiers", "tires", "tries", "tyres",
      "rides", "brides", "dire"))
    assert(m.get("rites").isDefined)
    assert(m.get("unknown").isEmpty)
    val bucket = m.anagramInstances(ana("rites")).map(m.text)
    assert(bucket == Vector("rites", "tiers", "tires", "tries"))
  }

  test("0403 find variants runs") {
    val m = modelWith(Seq("rites", "tiers", "tires", "tries", "tyres",
      "rides", "brides", "dire"))
    m.findVariants("rite", testParams) // must not throw
  }

  test("0404 huys -> huis before huls, tied scores") {
    val m = modelWith(Seq("huis", "huls"))
    val results = m.findVariants("huys", testParams)
    assert(results.length == 2)
    assert(m.text(results(0).vocabId) == "huis")
    assert(m.text(results(1).vocabId) == "huls")
    assert(results(0).vocabId != results(1).vocabId)
    assert(results(0).distScore == results(1).distScore)
    assert(results(0).freqScore == results(1).freqScore)
    // hand-check of the score formula (lib.rs:1443-1452):
    // len 4, DL 1, lcs 2 ("hu"), prefix 2, suffix 1, samecase
    assert(math.abs(results(0).distScore - 0.65625) < 1e-12)
  }

  // --- 08xx: transparent variant expansion (tests/main.rs:1483-1510) ---

  test("0801 transparent variant bridges larger edit distance") {
    val m = new LocalVariantModel(Alphabet.test)
    m.add("afgescheid")
    m.addVariantEdge("afghescheydt", "afgescheid", 1.0, transparentVariant = true)
    m.build()
    val results = m.findVariants("afgheschaydt", testParams)
    assert(results.length == 1)
    assert(m.text(results(0).vocabId) == "afgescheid")
  }

  // --- frequency handling (reference: src/lib.rs:900-967) ---

  test("frequency merge sum + freq tie-break in ranking") {
    // reference default handling is Max (vocab.rs VocabParams::default)
    val mx = new LocalVariantModel(Alphabet.test)
    mx.add("word", Some(5))
    mx.add("word", Some(7))
    assert(mx.get("word").get.frequency == 7)
    val m = new LocalVariantModel(Alphabet.test, frequencyHandling = "sum")
    m.add("word", Some(5))
    m.add("word", Some(7))
    assert(m.get("word").get.frequency == 12)

    val m2 = new LocalVariantModel(Alphabet.test)
    m2.add("huis", Some(100))
    m2.add("huls", Some(10))
    m2.build()
    val rs = m2.findVariants("huys", testParams)
    // tied dist score -> higher frequency first
    assert(m2.text(rs(0).vocabId) == "huis")
    assert(rs(0).freqScore == 1.0 && rs(1).freqScore == 0.1)
  }

  test("tie-aware truncation keeps whole boundary semantics") {
    // 5 results, scores: 1.0, .9, .9, .9, .5 with maxMatches=2:
    // cropped (idx 2) score .9 == last kept -> early cutoff at first .9
    def vr(id: Long, s: Double) = VariantResult(id, s, 1.0)
    val ranked = Vector(vr(1, 1.0), vr(2, 0.9), vr(3, 0.9), vr(4, 0.9), vr(5, 0.5))
    val out = Scoring.truncateTieAware(ranked, 2, 0.0f)
    // reference semantics (lib.rs:1556-1588): early_cutoff = 1 -> keep 2
    assert(out.map(_.vocabId) == Vector(1L, 2L))
    // plain case: boundary not splitting a tie
    val out2 = Scoring.truncateTieAware(Vector(vr(1, 1.0), vr(2, 0.9),
      vr(3, 0.8)), 2, 0.0f)
    assert(out2.map(_.vocabId) == Vector(1L, 2L))
  }

  test("relative cutoff threshold") {
    def vr(id: Long, s: Double) = VariantResult(id, s, 1.0)
    val ranked = Vector(vr(1, 0.9), vr(2, 0.8), vr(3, 0.4), vr(4, 0.3))
    val out = Scoring.applyCutoff(ranked, 2.0, 0.0f)
    assert(out.map(_.vocabId) == Vector(1L, 2L))
    assert(Scoring.applyCutoff(ranked, 0.0, 0.0f) == ranked) // disabled
  }

  test("anahash byte codec round-trips and orders correctly") {
    val vals = Seq("a", "z", "house", "xyz" * 24, "!").map(ana)
    for (v <- vals)
      assert(AnaHash.fromBytes(AnaHash.toBytes(v)) == v)
    // (length, lexicographic) on canonical bytes == numeric order
    val sortedNum = vals.sortBy(identity)(AnaHash.bigIntegerOrdering)
    val sortedBytes = vals.sortBy { v =>
      val b = AnaHash.toBytes(v)
      (b.length, b.map(x => f"${x & 0xff}%02x").mkString)
    }
    assert(sortedNum == sortedBytes)
  }
}
