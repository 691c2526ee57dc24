package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's confusable tests (tests/main.rs 05xx). */
class ConfusablesSpec extends AnyFunSuite {
  import EditInstr._

  test("diff produces identity/deletion/insertion runs") {
    assert(EditScript.diff("huys", "huis") ==
      Vector(Ident("hu"), Del("y"), Ins("i"), Ident("s")))
    assert(EditScript.diff("abc", "abc") == Vector(Ident("abc")))
    assert(EditScript.diff("", "ab") == Vector(Ins("ab")))
    assert(EditScript.diff("ab", "") == Vector(Del("ab")))
  }

  test("pattern parsing with options and anchors") {
    val c = Confusable.parse("=[c|k]-[y]+[i]", 1.1)
    assert(c.instrs == Vector(IdentOpts(Vector("c", "k")), Del("y"), Ins("i")))
    assert(!c.strictBegin && !c.strictEnd)
    val a = Confusable.parse("^-[y]+[i]$", 0.9)
    assert(a.strictBegin && a.strictEnd)
    assert(a.instrs == Vector(Del("y"), Ins("i")))
  }

  test("0501 found_in: -[y]+[i] matches huys->huis not huys->huls") {
    val c = Confusable.parse("-[y]+[i]", 1.1)
    assert(c.foundIn(EditScript.diff("huys", "huis")))
    assert(!c.foundIn(EditScript.diff("huys", "huls")))
  }

  test("0502 confusable breaks the huys tie toward huis") {
    val m = new LocalVariantModel(Alphabet.test)
    Seq("huis", "huls").foreach(m.add(_))
    m.addConfusable("-[y]+[i]", 1.1)
    m.build()
    val params = SearchParameters(
      maxAnagramDistance = DistanceThreshold.Absolute(2),
      maxEditDistance = DistanceThreshold.Absolute(2),
      maxMatches = 10, scoreThreshold = 0.0, cutoffThreshold = 0.0)
    val rs = m.findVariants("huys", params)
    assert(m.text(rs(0).vocabId) == "huis")
    assert(m.text(rs(1).vocabId) == "huls")
    assert(rs(0).distScore > rs(1).distScore)
  }

  test("0503 case-different input still instantiates the confusable") {
    val m = new LocalVariantModel(Alphabet.test)
    Seq("huis", "huls").foreach(m.add(_))
    m.addConfusable("-[y]+[i]", 1.1)
    m.build()
    val params = SearchParameters(
      maxAnagramDistance = DistanceThreshold.Absolute(2),
      maxEditDistance = DistanceThreshold.Absolute(2),
      maxMatches = 10, scoreThreshold = 0.0, cutoffThreshold = 0.0)
    val rs = m.findVariants("Huys", params)
    assert(m.text(rs(0).vocabId) == "huis")
    assert(rs(0).distScore > rs(1).distScore)
  }

  test("0504 non-matching confusable leaves the tie") {
    val m = new LocalVariantModel(Alphabet.test)
    Seq("huis", "huls").foreach(m.add(_))
    m.addConfusable("-[y]+[p]", 1.1)
    m.build()
    val params = SearchParameters(
      maxAnagramDistance = DistanceThreshold.Absolute(2),
      maxEditDistance = DistanceThreshold.Absolute(2),
      maxMatches = 10, scoreThreshold = 0.0, cutoffThreshold = 0.0)
    val rs = m.findVariants("Huys", params)
    assert(rs.length == 2)
    assert(rs(0).distScore == rs(1).distScore)
  }

  test("anchored patterns respect begin/end strictness") {
    // ^: pattern must match from the first instruction
    val begin = Confusable.parse("^-[y]+[i]", 1.1)
    // "ay" -> "ai": script = =[a] -[y] +[i]; first instr is Ident -> fail
    assert(!begin.foundIn(EditScript.diff("ay", "ai")))
    // "ya" -> "ia": script = -[y] +[i] =[a]; matches from start
    assert(begin.foundIn(EditScript.diff("ya", "ia")))
    val end = Confusable.parse("-[y]+[i]$", 1.1)
    assert(end.foundIn(EditScript.diff("ay", "ai")))
    assert(!end.foundIn(EditScript.diff("ya", "ia")))
  }
}
