package graft.tools

import graft.kernel._

/** Local search-mode CLI mirroring the reference's `analiticcl search`
  * (reference: bin/analiticcl.rs:561-636): detect+correct variant spans in
  * running text. Output: tab-separated `begin:end  input  correction  score`
  * per match line, one block per input line.
  *
  * Usage: runMain graft.tools.SearchCli <lexicon.tsv> [--lm <lm.tsv>] <text...>
  */
object SearchCli {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: SearchCli <lexicon.tsv> [--lm <lm.tsv>] <text...>")
      sys.exit(2)
    }
    val model = new LocalVariantModel(Alphabet.simpleLatin)
    val src = scala.io.Source.fromFile(args(0), "UTF-8")
    try src.getLines().foreach { line =>
      val cols = line.split('\t')
      if (cols.nonEmpty && cols(0).nonEmpty)
        model.add(cols(0), cols.lift(1).flatMap(_.toLongOption))
    } finally src.close()

    var rest = args.drop(1).toList
    if (rest.headOption.contains("--lm")) {
      val lmSrc = scala.io.Source.fromFile(rest(1), "UTF-8")
      try lmSrc.getLines().foreach { line =>
        val cols = line.split('\t')
        if (cols.length >= 2 && cols(0).nonEmpty)
          cols(1).toLongOption.foreach(model.addLm(cols(0), _))
      } finally lmSrc.close()
      rest = rest.drop(2)
    }
    model.build()

    val params = SearchParameters()
    for (text <- rest) {
      val matches = SearchEngine.findAllMatches(model, text, params)
      for (m <- matches) {
        val corrected = SearchEngine.matchToStr(model, m)
        val score = m.selected.flatMap(s => m.variants.flatMap(_.lift(s)))
          .map(_.distScore.toString).getOrElse("-")
        println(s"${m.offset.begin}:${m.offset.end}\t${m.text}\t$corrected\t$score")
      }
      println()
    }
  }
}
