package graft.tools

import graft.kernel._

/** Minimal local query CLI mirroring the reference's flagship `query` mode
  * (reference: bin/analiticcl.rs:369-482): build a model from a lexicon,
  * read queries, print ranked variants as TSV
  * `input<TAB>variant<TAB>score...`. Runs the pure-Scala kernel only (no
  * Spark) — the distributed paths live in graft.operators.
  *
  * Usage: runMain graft.tools.QueryCli <lexicon.tsv> [query...]
  *        (no queries -> read one query per line from stdin)
  * The lexicon TSV: text [<TAB> absolute frequency].
  */
object QueryCli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: QueryCli <lexicon.tsv> [query...]")
      sys.exit(2)
    }
    val model = new LocalVariantModel(Alphabet.simpleLatin)
    val src = scala.io.Source.fromFile(args(0), "UTF-8")
    try src.getLines().foreach { line =>
      val cols = line.split('\t')
      if (cols.nonEmpty && cols(0).nonEmpty)
        model.add(cols(0), cols.lift(1).flatMap(_.toLongOption))
    } finally src.close()
    model.build()

    val params = SearchParameters()
    val queries: Iterator[String] =
      if (args.length > 1) args.iterator.drop(1)
      else scala.io.Source.stdin.getLines()
    for (q <- queries if q.nonEmpty) {
      val results = model.findVariants(q, params)
      val cells = results.flatMap(r => Seq(model.text(r.vocabId), r.distScore.toString))
      println((q +: cells).mkString("\t"))
    }
  }
}
