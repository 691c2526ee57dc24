package graft.tools

import graft.kernel._

/** Minimal local query CLI mirroring the reference's flagship `query` mode
  * (reference: bin/analiticcl.rs:369-482): build a model from a lexicon,
  * read queries, print ranked variants as TSV
  * `input<TAB>variant<TAB>score...` or, with `--json`, the reference's
  * richer JSON shape (K2, reference: bin/analiticcl.rs:78-187). Runs the
  * pure-Scala kernel only (no Spark) — the distributed paths live in
  * graft.operators.
  *
  * Usage: runMain graft.tools.QueryCli <lexicon.tsv>
  *          [--json] [--index] [--variants <weighted.tsv>]
  *          [--errors <errors.tsv>] [--rules <contextrules.tsv>]
  *          [--confusables <sesdiff.tsv>] [query...]
  *        (no queries -> read one query per line from stdin)
  * The lexicon TSV: text [<TAB> absolute frequency]. `--variants` loads a
  * weighted variant list (S3); `--errors` loads one transparently.
  */
object QueryCli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: QueryCli <lexicon.tsv> [--json] " +
        "[--variants f] [--errors f] [--rules f] [query...]")
      sys.exit(2)
    }
    val model = new LocalVariantModel(Alphabet.simpleLatin)
    val lexIndex = model.addLexiconName(args(0))
    val src = scala.io.Source.fromFile(args(0), "UTF-8")
    try src.getLines().foreach { line =>
      val cols = line.split('\t')
      if (cols.nonEmpty && cols(0).nonEmpty)
        model.add(cols(0), cols.lift(1).flatMap(_.toLongOption),
          lexIndex = lexIndex)
    } finally src.close()

    var rest = args.drop(1).toList
    var json = false
    var indexMode = false
    var testInput = false
    def loadLines(path: String)(f: Iterator[String] => Unit): Unit = {
      val s = scala.io.Source.fromFile(path, "UTF-8")
      try f(s.getLines()) finally s.close()
    }
    var more = true
    while (more) rest match {
      case "--json" :: t => json = true; rest = t
      case "--index" :: t => indexMode = true; rest = t
      case "--testinput" :: t => testInput = true; rest = t
      case "--variants" :: f :: t =>
        loadLines(f)(ls => model.readVariantsLines(ls.to(Iterable), sourceName = f))
        rest = t
      case "--errors" :: f :: t =>
        loadLines(f)(ls =>
          model.readVariantsLines(ls.to(Iterable), transparent = true, sourceName = f))
        rest = t
      case "--rules" :: f :: t =>
        loadLines(f)(ls => model.readContextRulesLines(ls.to(Iterable)).left.foreach { e =>
          System.err.println(s"context rules: $e"); sys.exit(2)
        })
        rest = t
      case "--confusables" :: f :: t =>
        // S4 reader (reference: read_confusablelist lib.rs:414-441):
        // sesdiff edit script TAB weight per line, # comments skipped
        loadLines(f)(_.foreach { line =>
          if (line.nonEmpty && !line.startsWith("#")) {
            val cols = line.split('\t')
            model.addConfusable(cols(0),
              cols.lift(1).map(_.toDouble).getOrElse(1.0))
          }
        })
        rest = t
      case _ => more = false
    }
    model.build()

    if (testInput) {
      // testinput debug mode (reference bin/analiticcl.rs:1007-1023):
      // per input, anagram value + normalized form; inputs containing a
      // character outside the alphabet (UNK prime divides the anavalue)
      // report UNKNOWN on stderr, fully-encodable ones OK on stdout
      val alphabet = Alphabet.simpleLatin
      val unkPrime = AnaHash.primeFor(alphabet.size)
      val inputs: Iterator[String] =
        if (rest.nonEmpty) rest.iterator else scala.io.Source.stdin.getLines()
      for (input <- inputs) {
        val av = alphabet.anahash(input)
        val norm = alphabet.normalize(input).mkString("[", ", ", "]")
        if (av.mod(unkPrime).signum == 0)
          System.err.println(s"UNKNOWN: $input\t$av\t$norm")
        else println(s"OK: $input\t$av\t$norm")
      }
      return
    }

    if (indexMode) {
      // K4: anagram-index dump (reference `index` subcommand,
      // bin/analiticcl.rs:1190-1204): anavalue TAB instance texts
      model.indexDump.foreach { case (v, texts) =>
        println((v.toString +: texts).mkString("\t"))
      }
      return
    }

    val params = SearchParameters()
    val queries: Iterator[String] =
      if (rest.nonEmpty) rest.iterator
      else scala.io.Source.stdin.getLines()

    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

    if (json) println("[")
    var firstLine = true
    for (q <- queries if q.nonEmpty) {
      val results = model.findVariants(q, params)
      if (json) {
        // K2 JSON sink shape (reference: bin/analiticcl.rs:78-187)
        if (!firstLine) println(",")
        firstLine = false
        val vs = results.map { r =>
          val e = model.entry(r.vocabId)
          val lexs = model.lexicons.zipWithIndex
            .collect { case (n, i) if e.inLexicon(i) => "\"" + esc(n) + "\"" }
            .mkString("[", ",", "]")
          s"""{"text":"${esc(e.text)}","score":${r.score(params.freqWeight)},""" +
            s""""dist_score":${r.distScore},"freq_score":${r.freqScore},""" +
            r.via.map(v => s""""via":"${esc(model.text(v))}",""").getOrElse("") +
            s""""lexicons":$lexs}"""
        }.mkString("[", ",", "]")
        print(s"""{"input":"${esc(q)}","variants":$vs}""")
      } else {
        val cells = results.flatMap(r =>
          Seq(model.text(r.vocabId), r.distScore.toString))
        println((q +: cells).mkString("\t"))
      }
    }
    if (json) println("\n]")
  }
}
