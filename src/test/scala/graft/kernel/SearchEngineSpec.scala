package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's search-mode tests (tests/main.rs 06xx/07xx). */
class SearchEngineSpec extends AnyFunSuite {
  import SearchEngine._

  def testParams: SearchParameters = SearchParameters(
    maxAnagramDistance = DistanceThreshold.Absolute(2),
    maxEditDistance = DistanceThreshold.Absolute(2),
    maxMatches = 10, scoreThreshold = 0.0, cutoffThreshold = 0.0,
    maxNgram = 2)

  test("06xx boundaries: runs of non-alphabetic chars + terminal boundary") {
    val b = findBoundaries("I tink you are rihgt")
    assert(b.map(_.text) == Vector(" ", " ", " ", " ", ""))
    assert(b.map(m => (m.offset.begin, m.offset.end)) ==
      Vector((1, 2), (6, 7), (10, 11), (14, 15), (20, 20)))
    val b2 = findBoundaries("to be, or not")
    assert(b2.map(_.text) == Vector(" ", ", ", " ", ""))
    val s2 = classifyBoundaries(b2)
    assert(s2(1) == BoundaryStrength.Hard) // multichar ", "
    assert(s2.last == BoundaryStrength.Hard)
    assert(classifyBoundaries(findBoundaries("e-mail"))(0) == BoundaryStrength.Weak)
  }

  test("06xx ngram spans orders 1..2") {
    val text = "I tink you"
    val b = findBoundaries(text)
    val uni = findMatchNgrams(text, b, 1, 0, None)
    assert(uni.map(_.text) == Vector("I", "tink", "you"))
    val bi = findMatchNgrams(text, b, 2, 0, None)
    assert(bi.map(_.text) == Vector("I tink", "tink you"))
  }

  def baseModel(withFreq: Boolean): LocalVariantModel = {
    val m = new LocalVariantModel(Alphabet.test)
    val f = if (withFreq) Some(2L) else None
    Seq("I", "think", "sink", "you", "are", "right").foreach(m.add(_, f))
    m
  }

  test("0701 unigram-only find_all_matches corrects tink and rihgt") {
    val m = baseModel(withFreq = false)
    m.build()
    val matches = SearchEngine.findAllMatches(m, "I tink you are rihgt",
      testParams.copy(maxNgram = 1))
    assert(matches.nonEmpty)
    assert(matches.map(_.text) == Vector("I", "tink", "you", "are", "rihgt"))
    assert(matchToStr(m, matches(1)) == "think")
    assert(matchToStr(m, matches(4)) == "right")
  }

  test("0702 LM-driven bigram choice: are rihgt -> are right") {
    val m = baseModel(withFreq = true)
    m.add("are right", Some(2))
    m.addLm("<bos> I", 2)
    m.addLm("I think", 2)
    m.addLm("I sink", 1)
    m.addLm("you are", 2)
    m.addLm("right <eos>", 2)
    m.build()
    assert(m.haveLm)
    val matches = SearchEngine.findAllMatches(m, "I tink you are rihgt", testParams)
    assert(matches.nonEmpty)
    assert(matches.map(_.text) ==
      Vector("I", "tink", "you", "are rihgt"))
    assert(matchToStr(m, matches(0)) == "I")
    assert(matches(1).offset == Offset(2, 6))
    assert(matchToStr(m, matches(1)) == "think")
    assert(matchToStr(m, matches(2)) == "you")
    // the system opts for the bigram here
    assert(matchToStr(m, matches(3)) == "are right")
  }

  test("0703 linebreak forms a hard boundary; two batches decode") {
    val m = baseModel(withFreq = true)
    m.add("are right", Some(2))
    m.addLm("<bos> I", 2)
    m.addLm("I think", 2)
    m.addLm("you are", 2)
    m.addLm("right <eos>", 2)
    m.build()
    val matches = SearchEngine.findAllMatches(m, "I tink you\nare rihgt", testParams)
    assert(matches.map(_.text).contains("tink"))
    val corrected = matches.map(matchToStr(m, _))
    assert(corrected.contains("think"))
    assert(corrected.contains("are right") || corrected.contains("right"))
  }

  test("0706 unicodeoffsets: codepoint offsets through find_all_matches") {
    // reference tests/main.rs:1432-1455 — Cyrillic и/т are UNK alphabet
    // classes but the words still match within edit distance; offsets are
    // remapped to codepoints (here BMP, so 2..7 like the reference)
    val m = new LocalVariantModel(Alphabet.test)
    Seq("I", "think", "you", "are", "right").foreach(m.add(_))
    m.build()
    val matches = SearchEngine.findAllMatches(m, "I thиnk you are righт",
      testParams.copy(maxNgram = 1), unicodeOffsets = true)
    assert(matches.map(_.text) ==
      Vector("I", "thиnk", "you", "are", "righт"))
    assert(matches(1).offset == Offset(2, 7))
    assert(matchToStr(m, matches(1)) == "think")
    assert(matchToStr(m, matches(4)) == "right")
    // supplementary-plane codepoint before the word shifts begin by 1
    // codepoint (2 UTF-16 chars): the remap collapses it
    val m2 = SearchEngine.findAllMatches(m, "𝕏 think",
      testParams.copy(maxNgram = 1), unicodeOffsets = true)
    assert(m2.last.text == "think")
    assert(m2.last.offset == Offset(2, 7))
  }

  test("OOV words survive as themselves") {
    val m = baseModel(withFreq = false)
    m.build()
    val matches = SearchEngine.findAllMatches(m, "I tink xyzzyx",
      testParams.copy(maxNgram = 1))
    assert(matches.map(m2 => matchToStr(m, m2)) == Vector("I", "think", "xyzzyx"))
  }
}
