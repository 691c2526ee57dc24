package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's multi-lexicon + context-rule tests
  * (tests/main.rs 0901-0905) plus specs for the S3 variant-list reader
  * (read_variants, lib.rs:772-897), L1 learn mode (lib.rs:1062-1139) and
  * P12 offset remapping (search.rs:527-546).
  */
class ContextRulesSpec extends AnyFunSuite {
  import SearchEngine._

  // get_test_searchparams (reference src/test.rs:48-67) with max_ngram=1
  // and the LM disabled, as used by the 09xx tests
  private def params09: SearchParameters = SearchParameters(
    maxAnagramDistance = DistanceThreshold.Absolute(2),
    maxEditDistance = DistanceThreshold.Absolute(2),
    maxMatches = 10, scoreThreshold = 0.0, cutoffThreshold = 0.0,
    maxNgram = 1)

  private def model09(): LocalVariantModel = {
    val m = new LocalVariantModel(Alphabet.test)
    Seq("I", "think", "sink", "you", "are", "right")
      .foreach(m.add(_, Some(2L)))
    m.build()
    m
  }

  private def run(m: LocalVariantModel, text: String): Vector[TextMatch] =
    SearchEngine.findAllMatches(m, text, params09, lmWeight = 0.0f)

  test("0901 multi-lexicon provenance: lexindex bitmask per source") {
    val m = new LocalVariantModel(Alphabet.test)
    val amphibians = m.addLexiconName("amphibians.tsv")
    Seq("salamander", "toad", "frog", "newt", "caecilian")
      .foreach(m.add(_, lexIndex = amphibians))
    val reptiles = m.addLexiconName("reptiles.tsv")
    Seq("lizard", "snake", "turtle", "crocodile", "gecko")
      .foreach(m.add(_, lexIndex = reptiles))
    m.build()
    assert(m.lexicons.length == 2)
    val matches = SearchEngine.findAllMatches(m,
      "Salamander lizard frog snake toad", params09, lmWeight = 0.0f)
    assert(matches.map(_.text) ==
      Vector("Salamander", "lizard", "frog", "snake", "toad"))
    val corrected = matches.map(matchToStr(m, _))
    assert(corrected == Vector("salamander", "lizard", "frog", "snake", "toad"))
    def vocabOf(i: Int) =
      m.entry(matches(i).variants.get(matches(i).selected.get).vocabId)
    assert(vocabOf(0).inLexicon(amphibians))
    assert(vocabOf(1).inLexicon(reptiles))
    assert(vocabOf(2).inLexicon(amphibians))
    assert(vocabOf(3).inLexicon(reptiles))
    assert(vocabOf(4).inLexicon(amphibians))
    assert(!vocabOf(0).inLexicon(reptiles))
  }

  test("0902 context rule bonus picks think over sink and tags the span") {
    val m = model09()
    assert(m.addContextRule("I; think", 1.1f, Seq("testtag")).isRight)
    val matches = run(m, "I tink you are rihgt")
    assert(matches.nonEmpty)
    assert(matches(0).text == "I")
    assert(matches(0).tags == Vector(0))
    assert(matches(0).seqnrs == Vector(0))
    assert(matchToStr(m, matches(0)) == "I")
    assert(matches(1).text == "tink")
    assert(matches(1).tags == Vector(0))
    assert(matches(1).seqnrs == Vector(1))
    assert(matchToStr(m, matches(1)) == "think")
    assert(matchToStr(m, matches(2)) == "you")
    assert(matchToStr(m, matches(3)) == "are")
    assert(matchToStr(m, matches(4)) == "right")
  }

  test("0903 context rule penalty pushes tink to sink") {
    val m = model09()
    assert(m.addContextRule("I; think", 0.9f).isRight)
    val matches = run(m, "I tink you are rihgt")
    assert(matchToStr(m, matches(0)) == "I")
    assert(matchToStr(m, matches(1)) == "sink")
    assert(matchToStr(m, matches(2)) == "you")
    assert(matchToStr(m, matches(3)) == "are")
    assert(matchToStr(m, matches(4)) == "right")
  }

  test("0904 neutral single-word rules tag without changing selection") {
    val m = model09()
    assert(m.addContextRule("think", 1.0f, Seq("testtag")).isRight)
    assert(m.addContextRule("are", 1.0f, Seq("testtag")).isRight)
    assert(m.addContextRule("right", 1.0f, Seq("testtag")).isRight)
    val matches = run(m, "I tink you are rihgt")
    assert(matches(0).tags.isEmpty)
    assert(matchToStr(m, matches(0)) == "I")
    assert(matches(1).tags == Vector(0))
    assert(matches(1).seqnrs == Vector(0))
    assert(matchToStr(m, matches(1)) == "think")
    assert(matchToStr(m, matches(2)) == "you")
    assert(matches(3).tags == Vector(0))
    assert(matchToStr(m, matches(3)) == "are")
    assert(matches(4).tags == Vector(0))
    assert(matchToStr(m, matches(4)) == "right")
  }

  test("0905 one rule can assign multiple tags with independent seqnrs") {
    val m = model09()
    assert(m.addContextRule("I; think", 1.1f, Seq("testtag", "testtag2")).isRight)
    val matches = run(m, "I tink you are rihgt")
    assert(matches(0).tags == Vector(0, 1))
    assert(matches(0).seqnrs == Vector(0, 0))
    assert(matches(1).tags == Vector(0, 1))
    assert(matches(1).seqnrs == Vector(1, 1))
    assert(matchToStr(m, matches(1)) == "think")
  }

  test("pattern syntax: any / no-lexicon / negation / disjunction / @lexicon") {
    val m = model09()
    m.addLexiconName("main.tsv")
    assert(m.readContextRulesLines(Seq(
      "# comment",
      "",
      "?; think\t1.1\ttag1",
      "you|are\t1.2",
      "!sink\t1.05",
      "@main.tsv\t1.01",
      "^\t0.5"
    )).contains(5))
    assert(m.contextRules.length == 5)
    assert(m.contextRules(0).pattern.head == PatternMatch.Any)
    assert(m.contextRules(1).pattern.head.isInstanceOf[PatternMatch.Disjunction])
    assert(m.contextRules(2).pattern.head.isInstanceOf[PatternMatch.Not])
    assert(m.contextRules(3).pattern.head == PatternMatch.FromLexicon(0))
    assert(m.contextRules(4).pattern.head == PatternMatch.NoLexicon)
    // unknown word and unknown lexicon are load errors, like the reference
    assert(m.addContextRule("nosuchword", 1.0f).isLeft)
    assert(m.addContextRule("@nosuchlexicon", 1.0f).isLeft)
  }

  test("testContextRules: first match wins, mean score over positions") {
    val m = model09()
    assert(m.addContextRule("I; think", 1.5f).isRight)
    assert(m.addContextRule("think", 9.0f).isRight) // blocked by rule 1
    val iId = m.encode("I").get
    val thinkId = m.encode("think").get
    val youId = m.encode("you").get
    val seq = Vector((iId, 1L), (thinkId, 1L), (youId, 1L))
    val (score, results) = m.testContextRules(seq)
    assert(math.abs(score - (1.5 + 1.5 + 1.0) / 3.0) < 1e-9)
    assert(results(0).head.seqnr == 0)
    assert(results(1).head.seqnr == 1)
    assert(results(2).isEmpty)
    // no rule matches -> neutral 1.0
    assert(m.testContextRules(Vector((youId, 1L)))._1 == 1.0)
  }

  test("S3 read_variants: plain ref/variant/score pairs") {
    val m = new LocalVariantModel(Alphabet.test)
    val n = m.readVariantsLines(Seq(
      "huis\thuys\t0.8\thuijs\t0.6",
      "gracht\tgraft\t0.7"
    ))
    assert(n == 3)
    assert(m.lexicons.contains("variants"))
    assert(m.entry(m.encode("huis").get).referenceFor.map(_._2) ==
      Vector(0.8, 0.6))
    assert(m.entry(m.encode("huys").get).variantOf ==
      List((m.encode("huis").get, 0.8)))
    // not marked transparent by default
    assert(!m.entry(m.encode("huys").get).transparent)
  }

  test("S3 read_variants: frequency auto-detect (ref freq + triples)") {
    val m = new LocalVariantModel(Alphabet.test)
    val n = m.readVariantsLines(Seq(
      "huis\t100\thuys\t0.8\t20\thuijs\t0.6\t5"
    ), transparent = true, sourceName = "errors.tsv")
    assert(n == 2)
    assert(m.haveFreq)
    assert(m.entry(m.encode("huis").get).frequency == 100L)
    assert(m.entry(m.encode("huys").get).frequency == 20L)
    assert(m.entry(m.encode("huijs").get).frequency == 5L)
    assert(m.entry(m.encode("huys").get).transparent)
    assert(m.lexicons.contains("errors.tsv"))
  }

  test("S3 freq auto-detect retries after a non-numeric 2nd column") {
    // reference lib.rs:815-830: a first line whose column count FITS the
    // freq layout but whose 2nd column is non-numeric leaves has_freq
    // UNSET (that line alone is freq-less); detection re-attempts on the
    // next line instead of locking to Some(false)
    val m = new LocalVariantModel(Alphabet.test)
    val n = m.readVariantsLines(Seq(
      // 5 cols = freq-shaped count, but col2 is a variant (non-numeric):
      // parsed freq-less, detection stays open
      "huis\thuys\t0.8\thuijs\t0.6",
      "gracht\t50\tgraft\t0.7\t10" // numeric col2 -> detected true here
    ))
    assert(m.haveFreq)
    assert(m.entry(m.encode("huis").get).referenceFor.size == 2)
    assert(m.entry(m.encode("gracht").get).frequency == 50L)
    assert(m.entry(m.encode("graft").get).frequency == 10L)
    assert(n == 3)
  }

  test("S3 transparent variants bridge but drop out of results (0801 shape)") {
    val m = new LocalVariantModel(Alphabet.test)
    m.add("separate")
    m.readVariantsLines(Seq("separate\tseperate\t1.0"), transparent = true)
    m.build()
    val rs = m.findVariants("seperat", SearchParameters(
      maxAnagramDistance = DistanceThreshold.Absolute(2),
      maxEditDistance = DistanceThreshold.Absolute(2),
      maxMatches = 10, scoreThreshold = 0.0, cutoffThreshold = 0.0))
    val texts = rs.map(r => m.text(r.vocabId))
    assert(texts.contains("separate"))
    assert(!texts.contains("seperate")) // transparent intermediates dropped
  }

  test("L1 learn mode records input->reference variants and K3 dumps them") {
    val m = new LocalVariantModel(Alphabet.test)
    Seq("separate", "right").foreach(m.add(_, Some(5L)))
    m.build()
    val learned = m.learnVariants(
      Seq("seperate", "seperate", "rihgt"),
      SearchParameters(
        maxAnagramDistance = DistanceThreshold.Absolute(2),
        maxEditDistance = DistanceThreshold.Absolute(2),
        maxMatches = 3, scoreThreshold = 0.5, cutoffThreshold = 0.0))
    assert(learned >= 2)
    // learned inputs became transparent vocab entries with freq bumps
    val sep = m.entry(m.encode("seperate").get)
    assert(sep.transparent)
    // freq 1 on insert + consecutive-run rule: only first occurrence bumps
    assert(sep.frequency == 1L)
    val tsv = m.weightedVariantsTsv.toVector
    assert(tsv.exists(l => l.startsWith("separate\t") && l.contains("seperate")))
    assert(tsv.exists(l => l.startsWith("right\t") && l.contains("rihgt")))
    // the rebuilt index now resolves the variant exactly
    val rs = m.findVariants("seperate", SearchParameters(
      maxAnagramDistance = DistanceThreshold.Absolute(2),
      maxEditDistance = DistanceThreshold.Absolute(2),
      maxMatches = 3, scoreThreshold = 0.0, cutoffThreshold = 0.0))
    assert(rs.nonEmpty)
    assert(m.text(rs.head.vocabId) == "separate")
  }

  test("P12 offset remap: UTF-16 surrogate pairs collapse to codepoints") {
    val text = "a𝕏 bc" // a, MATHEMATICAL DOUBLE-STRUCK X, space, bc
    val matches = Vector(
      TextMatch("a𝕏", Offset(0, 3), 1),
      TextMatch("bc", Offset(4, 6), 1))
    val remapped = SearchEngine.remapOffsetsToUnicodePoints(text, matches)
    assert(remapped(0).offset == Offset(0, 2))
    assert(remapped(1).offset == Offset(3, 5))
  }
}
