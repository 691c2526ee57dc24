package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel._

/** CLI-surface tests: S8 search-mode stdin batching (reference
  * process_search, bin/analiticcl.rs:561-636) and the K4 anagram-index
  * dump (reference `index` mode, bin/analiticcl.rs:1190-1204).
  */
class CliSpec extends AnyFunSuite {

  private def model(words: String*): LocalVariantModel = {
    val m = new LocalVariantModel(Alphabet.test)
    words.foreach(w => m.add(w, Some(2)))
    m.build()
  }

  test("S8: batches of <=100 lines break at empty lines") {
    val lines = (1 to 250).map(i => s"line$i")
    val it = lines.iterator
    val got = Iterator
      .continually(SearchCli.nextBatch(it, newlineAsSpace = false, perLine = false))
      .takeWhile(_.isDefined).map(_.get).toVector
    assert(got.size == 3)
    assert(got(0).linesIterator.size == 100)
    assert(got(0).startsWith("line1\nline2"))
    assert(got(2).linesIterator.size == 50)

    val it2 = Seq("a", "b", "", "c", "d").iterator
    val got2 = Iterator
      .continually(SearchCli.nextBatch(it2, newlineAsSpace = false, perLine = false))
      .takeWhile(_.isDefined).map(_.get).toVector
    assert(got2 == Vector("a\nb\n", "c\nd")) // empty line breaks batch 1

    val it3 = Seq("a", "b").iterator
    val got3 = Iterator
      .continually(SearchCli.nextBatch(it3, newlineAsSpace = true, perLine = true))
      .takeWhile(_.isDefined).map(_.get).toVector
    assert(got3 == Vector("a", "b")) // per-line mode: one line per batch
  }

  test("S8: two-batch search through the CLI path corrects both batches") {
    // mirror of the reference's find_all_matches e2e (tests/main.rs:1119-
    // 1140) driven through processSearch with an empty-line batch break
    val m = model("I", "think", "sink", "you", "are", "right")
    val params = SearchParameters(maxNgram = 1)
    val out = Vector.newBuilder[String]
    SearchCli.processSearch(m,
      Seq("I tink you are rihgt", "", "you are rihgt").iterator,
      params, newlineAsSpace = true, perLine = false, out += _)
    val lines = out.result()
    // both batches produced corrections; blank line separates them
    val tinks = lines.filter(_.contains("\ttink\tthink\t"))
    val rihgts = lines.filter(_.contains("\trihgt\tright\t"))
    assert(tinks.size == 1, lines.mkString("|"))
    assert(rihgts.size == 2, lines.mkString("|"))
    assert(lines.count(_.isEmpty) == 1)
    // batch 2 offsets restart at 0 (separate find_all_matches call)
    val batch2 = lines.dropWhile(_.nonEmpty).drop(1)
    assert(batch2.head.startsWith("0:"), batch2.mkString("|"))
  }

  test("K4: index dump groups anagrams under one anavalue, sorted") {
    val m = model("listen", "silent", "tea", "eat", "dog")
    val dump = m.indexDump
    // anagram groups collapse: listen+silent and tea+eat share lines
    val byTexts = dump.map(_._2)
    assert(byTexts.contains(Seq("listen", "silent"))) // insertion order
    assert(byTexts.contains(Seq("tea", "eat")))
    assert(byTexts.contains(Seq("dog")))
    assert(dump.size == 3)
    // ascending numeric anavalue order
    val vals = dump.map(_._1)
    assert(vals == vals.sortWith((a, b) => a.compareTo(b) < 0))
    // shorter words have smaller prime products than longer ones here
    assert(vals.head.compareTo(vals.last) < 0)
  }
}
