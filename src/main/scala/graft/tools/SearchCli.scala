package graft.tools

import graft.kernel._

/** Local search-mode CLI mirroring the reference's `analiticcl search`
  * (reference: bin/analiticcl.rs:561-636): detect+correct variant spans in
  * running text. Output: tab-separated `begin:end  input  correction  score`
  * per match line, one blank line between batches.
  *
  * Input comes from trailing args, or from STDIN when none are given (or
  * a lone `-`), batched exactly like the reference's process_search:
  * up to [[SearchCli.MaxBatchSize]] lines per batch, broken early at an
  * empty line (a good correction-context boundary) or after every line
  * with `--per-line`; lines within a batch are joined by newline, or by a
  * space with `--newline-as-space`.
  *
  * Usage: runMain graft.tools.SearchCli <lexicon.tsv> [--lm <lm.tsv>]
  *        [--newline-as-space] [--per-line] [text...]
  */
object SearchCli {

  /** Reference MAX_BATCHSIZE_SEARCH (bin/analiticcl.rs:559). */
  val MaxBatchSize = 100

  /** Pull the next batch off the line iterator per the reference's rules
    * (bin/analiticcl.rs:577-596): join ≤MaxBatchSize lines with
    * newline/space, stop early after an empty line or (perLine) any line.
    * Returns None at end of input.
    */
  def nextBatch(lines: Iterator[String], newlineAsSpace: Boolean,
      perLine: Boolean): Option[String] = {
    if (!lines.hasNext) return None
    val sep = if (newlineAsSpace) ' ' else '\n'
    val batch = new StringBuilder
    var i = 0
    var stop = false
    while (!stop && i < MaxBatchSize && lines.hasNext) {
      val line = lines.next()
      if (i > 0) batch.append(sep)
      batch.append(line)
      if (line.isEmpty || perLine) stop = true
      i += 1
    }
    Some(batch.toString)
  }

  /** Process a full input stream in batches; one output line per match,
    * one blank line between non-empty batch outputs (reference:
    * bin/analiticcl.rs:599-602).
    */
  def processSearch(model: LocalVariantModel, lines: Iterator[String],
      params: SearchParameters, newlineAsSpace: Boolean, perLine: Boolean,
      out: String => Unit, lexMatch: Boolean = false): Unit = {
    var first = true
    var batch = nextBatch(lines, newlineAsSpace, perLine)
    while (batch.isDefined) {
      val matches = SearchEngine.findAllMatches(model, batch.get, params)
      if (!first && matches.nonEmpty) out("")
      for (m <- matches) {
        val corrected = SearchEngine.matchToStr(model, m)
        val selectedVariant = m.selected.flatMap(s => m.variants.flatMap(_.lift(s)))
        val score = selectedVariant.map(_.distScore.toString).getOrElse("-")
        // per-match source-lexicon provenance (reference output_lexmatch,
        // bin/analiticcl.rs:61-74: `"lex1;lex2"` appended per result)
        val lexCol =
          if (!lexMatch) ""
          else selectedVariant.map { v =>
            val e = model.entry(v.vocabId)
            "\t\"" + model.lexicons.zipWithIndex
              .collect { case (n, i) if e.inLexicon(i) => n }
              .mkString(";") + "\""
          }.getOrElse("\t\"\"")
        out(s"${m.offset.begin}:${m.offset.end}\t${m.text}\t$corrected\t$score$lexCol")
      }
      if (matches.nonEmpty) first = false
      batch = nextBatch(lines, newlineAsSpace, perLine)
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println(
        "usage: SearchCli <lexicon.tsv> [--lm <lm.tsv>] " +
          "[--newline-as-space] [--per-line] [text...]")
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
    if (rest.headOption.contains("--lm")) {
      val lmSrc = scala.io.Source.fromFile(rest(1), "UTF-8")
      try lmSrc.getLines().foreach { line =>
        val cols = line.split('\t')
        if (cols.length >= 2 && cols(0).nonEmpty)
          cols(1).toLongOption.foreach(model.addLm(cols(0), _))
      } finally lmSrc.close()
      rest = rest.drop(2)
    }
    val newlineAsSpace = rest.contains("--newline-as-space")
    val perLine = rest.contains("--per-line")
    val lexMatch = rest.contains("--lexmatch")
    rest = rest.filterNot(a =>
      a == "--newline-as-space" || a == "--per-line" || a == "--lexmatch")
    model.build()

    val params = SearchParameters()
    if (rest.isEmpty || rest == List("-")) {
      processSearch(model, scala.io.Source.stdin.getLines(), params,
        newlineAsSpace, perLine, println, lexMatch)
    } else {
      // each trailing arg is its own batch (the reference's direct-text
      // convenience path)
      processSearch(model, rest.iterator, params,
        newlineAsSpace, perLine = true, println, lexMatch)
    }
  }
}
