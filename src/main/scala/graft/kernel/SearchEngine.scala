package graft.kernel

/** Search mode ("analiticcl search"): detect and correct variant spans in
  * running text (reference: find_all_matches lib.rs:1790-1957 +
  * most_likely_sequence lib.rs:2088-2495 + search.rs boundaries/ngrams).
  *
  * The reference decodes each batch with a rustfst WFST shortest-path; the
  * graph is a DAG ordered by boundary index, so a K-best dynamic program
  * replaces the FST with identical semantics: arcs = candidate variants
  * with cost n + (1 - score), OOV unigram arcs cost n + 1, failsafe
  * epsilon arcs cost 100; K = max_seq; LM/context blending happens over
  * the enumerated paths exactly like the reference.
  *
  * Everything here is per-batch local — on Spark each document (or
  * hard-boundary batch) decodes independently inside mapPartitions with a
  * broadcast model; there is no cross-row state.
  */
object SearchEngine {

  final case class Offset(begin: Int, end: Int)

  /** A span of input text with its candidate variants
    * (reference: search.rs Match).
    */
  final case class TextMatch(
      text: String,
      offset: Offset,
      n: Int,
      variants: Option[Vector[VariantResult]] = None,
      selected: Option[Int] = None,
      /** context-rule tag ids applied to this match (reference: Match.tag) */
      tags: Vector[Int] = Vector.empty,
      /** per-tag sequence number within its tag span (reference: Match.seqnr) */
      seqnrs: Vector[Int] = Vector.empty
  ) {
    def isEmpty: Boolean = variants.forall(_.isEmpty)
  }

  sealed trait BoundaryStrength
  object BoundaryStrength {
    case object Weak extends BoundaryStrength
    case object Normal extends BoundaryStrength
    case object Hard extends BoundaryStrength
  }

  /** Non-alphabetic runs are boundaries; a terminal (possibly empty)
    * boundary always closes the text (reference: search.rs:190-233).
    */
  def findBoundaries(text: String): Vector[TextMatch] = {
    val out = Vector.newBuilder[TextMatch]
    var begin = -1
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val alpha = Character.isAlphabetic(cp)
      if (begin >= 0 && alpha) {
        out += TextMatch(text.substring(begin, i), Offset(begin, i), 0)
        begin = -1
      } else if (begin < 0 && !alpha) {
        begin = i
      }
      i += Character.charCount(cp)
    }
    if (begin >= 0)
      out += TextMatch(text.substring(begin), Offset(begin, text.length), 0)
    else
      out += TextMatch("", Offset(text.length, text.length), 0)
    out.result()
  }

  /** Weak (' - _), Hard (multichar or final), else Normal
    * (reference: search.rs:238-258).
    */
  def classifyBoundaries(boundaries: Vector[TextMatch]): Vector[BoundaryStrength] =
    boundaries.zipWithIndex.map { case (b, i) =>
      if (i == boundaries.length - 1) BoundaryStrength.Hard
      else if (b.text.length > 1) BoundaryStrength.Hard
      else b.text match {
        case "'" | "-" | "_" => BoundaryStrength.Weak
        case _               => BoundaryStrength.Normal
      }
    }

  /** All order-n token spans between boundaries
    * (reference: search.rs:262-313).
    */
  def findMatchNgrams(
      text: String,
      boundaries: Vector[TextMatch],
      order: Int,
      begin0: Int,
      end0: Option[Int]
  ): Vector[TextMatch] = {
    val out = Vector.newBuilder[TextMatch]
    var begin = begin0
    val end = end0.getOrElse(text.length)
    var i = 0
    var break = false
    while (!break && i + order - 1 < boundaries.length) {
      val boundary = boundaries(i + order - 1)
      if (boundary.offset.begin > end) break = true
      else {
        val matchText = text.substring(begin, boundary.offset.begin)
        if (matchText.nonEmpty && matchText != " ")
          out += TextMatch(matchText, Offset(begin, boundary.offset.begin), order)
        begin = boundaries(i).offset.end
        i += 1
      }
    }
    if (begin < end) {
      val matchText = text.substring(begin, end)
      if (matchText.nonEmpty && matchText != " ") {
        val internal = boundaries.count(b =>
          b.offset.begin > begin && b.offset.end < end)
        if (internal == order)
          out += TextMatch(matchText, Offset(begin, end), order)
      }
    }
    out.result()
  }

  /** A higher-order match is redundant if all covered unigrams already
    * scored a perfect 1.0 (reference: search.rs:317-336).
    */
  def redundantMatch(candidate: TextMatch, matches: Vector[TextMatch]): Boolean = {
    for (ref <- matches) {
      if (ref.n == 1) {
        if (ref.offset.begin >= candidate.offset.begin &&
          ref.offset.end <= candidate.offset.end) {
          ref.variants match {
            case Some(vs) if vs.nonEmpty && vs.head.distScore >= 1.0 => ()
            case _ => return false
          }
        }
      } else return true // unigrams lead the vector; stop at higher orders
    }
    true
  }

  private final case class Arc(
      from: Int, // -1 = start, else boundary index
      to: Int,
      cost: Float,
      matchIndex: Int, // -1 for failsafe epsilon
      variantIndex: Option[Int],
      vocabId: Long // 0 = OOV / epsilon
  )

  private final case class Path(cost: Float, arcs: List[Arc]) // arcs reversed

  /** K-best DAG paths start -> final states, replicating the reference's
    * WFST nshortest (lib.rs:2104-2317).
    */
  private def kBestPaths(
      nBoundaries: Int,
      finals: Set[Int],
      arcs: Vector[Arc],
      k: Int
  ): Vector[Path] = {
    val byFrom = arcs.groupBy(_.from)
    // states in topological order: -1 (start), 0..nBoundaries-1
    val best = scala.collection.mutable.HashMap.empty[Int, Vector[Path]]
    best(-1) = Vector(Path(0.0f, Nil))
    for (state <- -1 until nBoundaries; paths <- best.get(state);
         arc <- byFrom.getOrElse(state, Vector.empty)) {
      val extended = paths.map(p => Path(p.cost + arc.cost, arc :: p.arcs))
      val merged = (best.getOrElse(arc.to, Vector.empty) ++ extended)
        .sortBy(_.cost).take(k)
      best(arc.to) = merged
    }
    finals.toVector.sorted
      .flatMap(f => best.getOrElse(f, Vector.empty))
      .sortBy(_.cost)
      .take(k)
  }

  /** Port of most_likely_sequence (reference: lib.rs:2088-2495), including
    * context-rule scoring and tagging (reference: lib.rs:2345-2367 +
    * writeback lib.rs:2474-2494). Returns the matches of the best sequence
    * with `selected` (and any tags) set.
    */
  def mostLikelySequence(
      model: LocalVariantModel,
      matches: Vector[TextMatch],
      boundaries: Vector[TextMatch],
      beginOffset: Int,
      endOffset: Int,
      params: SearchParameters,
      maxSeq: Int = 250,
      lmWeight: Float = 1.0f,
      variantModelWeight: Float = 3.0f,
      contextRulesWeight: Float = 1.0f
  ): Vector[TextMatch] = {
    val finals = boundaries.zipWithIndex.collect {
      case (b, i) if b.offset.begin == endOffset || b.offset.end == endOffset => i
    }.toSet
    require(finals.nonEmpty, "no final state found")

    val arcs = Vector.newBuilder[Arc]
    var anySymbol = false
    for ((m, matchIndex) <- matches.zipWithIndex) {
      var prevB = -1
      var nextB = -1
      for ((b, i) <- boundaries.zipWithIndex) {
        if (m.offset.begin == b.offset.end) prevB = i
        else if (m.offset.end == b.offset.begin) nextB = i
      }
      val n = if (prevB >= 0) nextB - prevB else nextB + 1
      val from = prevB // -1 == start
      m.variants match {
        case Some(vs) if vs.nonEmpty =>
          for ((v, vi) <- vs.zipWithIndex) {
            anySymbol = true
            arcs += Arc(from, nextB,
              n.toFloat + (1.0f - v.score(params.freqWeight).toFloat),
              matchIndex, Some(vi), v.vocabId)
          }
        case _ if n == 1 => // OOV unigram arc
          anySymbol = true
          arcs += Arc(from, nextB, n.toFloat + 1.0f, matchIndex, None, 0L)
        case _ => ()
      }
    }
    // failsafe epsilon arcs
    for (i <- boundaries.indices)
      arcs += Arc(i - 1, i, 100.0f, -1, None, 0L)

    if (!anySymbol) return matches

    val paths = kBestPaths(boundaries.length, finals, arcs.result(), maxSeq)

    // score sequences: LM + variant cost + context rules
    final case class Seq0(
        path: Path,
        variantCost: Float,
        perplexity: Double,
        contextScore: Double,
        tags: Vector[Vector[(Int, Int)]] // per symbol: (tag, seqnr)
    )
    var bestPerplexity = 999999.0
    var bestVariantCost = (boundaries.length - 1).toFloat * 2.0f
    var bestContextScore = 0.0 // to be maximised (reference: lib.rs:2321)
    val seqs = paths.map { p =>
      val symbols = p.arcs.reverse.filter(_.matchIndex >= 0)
      val perplexity = if (model.haveLm && lmWeight > 0.0f) {
        val tokens = Vector.newBuilder[Option[Long]]
        tokens += Some(LocalVariantModel.BOS)
        for (arc <- symbols) {
          if (arc.vocabId == 0L) tokens += None
          else model.intoNgram(arc.vocabId).foreach(id => tokens += Some(id))
          val nextBoundary = boundaries(arc.to)
          val bt = nextBoundary.text.trim
          if (bt.nonEmpty) {
            model.encode(bt) match {
              case Some(id) =>
                model.intoNgram(id).foreach(x => tokens += Some(x))
              case None => tokens += None
            }
          }
        }
        tokens += Some(LocalVariantModel.EOS)
        model.lmScoreTokens(tokens.result())._2
      } else 0.0
      // Q5: context rules over the output-symbol sequence
      // (reference: lib.rs:2345-2367, test_context_rules lib.rs:2501-2576)
      val (contextScore, symbolTags) =
        if (model.contextRules.nonEmpty) {
          val seq = symbols.map { arc =>
            if (arc.vocabId == 0L) (0L, 0L)
            else (arc.vocabId, model.entry(arc.vocabId).lexindex)
          }.toIndexedSeq
          val (cs, results) = model.testContextRules(seq)
          (cs, results.map(_.collect {
            case pm if pm.tag.isDefined => (pm.tag.get, pm.seqnr)
          }))
        } else (1.0, Vector.empty[Vector[(Int, Int)]])
      if (perplexity < bestPerplexity) bestPerplexity = perplexity
      if (p.cost < bestVariantCost) bestVariantCost = p.cost
      if (contextScore > bestContextScore) bestContextScore = contextScore
      Seq0(p, p.cost, perplexity, contextScore, symbolTags)
    }

    var bestScore = -99999999.0
    var best: Option[Seq0] = None
    for (s <- seqs) {
      val normLm = if (model.haveLm && lmWeight > 0.0f)
        math.log(bestPerplexity / s.perplexity) else 0.0
      val normVariant = math.log(bestVariantCost.toDouble / s.variantCost.toDouble)
      val normContext = math.log(s.contextScore / bestContextScore)
      // blended geometric-mean score (reference: lib.rs:2396-2411); the
      // shortcut applies only when both LM and context rules are inactive
      val score =
        if ((!model.haveLm || lmWeight == 0.0f) &&
          (model.contextRules.isEmpty || contextRulesWeight == 0.0f))
          normVariant
        else
          (lmWeight * normLm + variantModelWeight * normVariant +
            contextRulesWeight * normContext) /
            (lmWeight + variantModelWeight + contextRulesWeight).toDouble
      if (score > bestScore || best.isEmpty) {
        bestScore = score
        best = Some(s)
      }
    }

    val winner = best.get
    winner.path.arcs.reverse.filter(_.matchIndex >= 0).zipWithIndex.map {
      case (arc, i) =>
        val tagged = winner.tags.lift(i).getOrElse(Vector.empty)
        matches(arc.matchIndex).copy(
          selected = arc.variantIndex,
          tags = tagged.map(_._1),
          seqnrs = tagged.map(_._2))
    }.toVector
  }

  /** P12: remap UTF-16 char offsets to unicode codepoint offsets
    * (reference: remap_offsets_to_unicodepoints search.rs:527-546 — there
    * UTF-8 byte offsets; our native offsets are Java char offsets, the
    * remap target is identical).
    */
  def remapOffsetsToUnicodePoints(
      text: String,
      matches: Vector[TextMatch]
  ): Vector[TextMatch] = {
    val map = new Array[Int](text.length + 1)
    var cp = 0
    var i = 0
    while (i < text.length) {
      map(i) = cp
      val n = Character.charCount(text.codePointAt(i))
      if (n == 2 && i + 1 < text.length) map(i + 1) = cp
      cp += 1
      i += n
    }
    map(text.length) = cp
    matches.map(m =>
      m.copy(offset = Offset(map(m.offset.begin), map(m.offset.end))))
  }

  /** Port of find_all_matches (reference: lib.rs:1790-1957). */
  def findAllMatches(
      model: LocalVariantModel,
      text: String,
      params: SearchParameters,
      maxSeq: Int = 250,
      lmWeight: Float = 1.0f,
      variantModelWeight: Float = 3.0f,
      contextRulesWeight: Float = 1.0f,
      unicodeOffsets: Boolean = false
  ): Vector[TextMatch] = {
    if (text.isEmpty) return Vector.empty
    val boundaries = findBoundaries(text)
    val strengths = classifyBoundaries(boundaries)

    val out = Vector.newBuilder[TextMatch]
    var begin = 0
    var beginIndex = 0
    for (((strength, boundary), i) <- strengths.zip(boundaries).zipWithIndex) {
      if (strength == BoundaryStrength.Hard && boundary.offset.begin != begin) {
        val batchBoundaries = boundaries.slice(beginIndex, i + 1)
        var batchMatches = Vector.empty[TextMatch]
        for (order <- 1 to params.maxNgram) {
          val spans = findMatchNgrams(text, batchBoundaries, order, begin,
            Some(boundary.offset.begin))
          val withVariants = spans.map { segment =>
            if (order == 1 || !redundantMatch(segment, batchMatches))
              segment.copy(variants = Some(model.findVariants(segment.text, params)))
            else segment
          }
          batchMatches ++= withVariants
        }
        if (params.maxNgram > 1 || model.haveLm || model.contextRules.nonEmpty)
          out ++= mostLikelySequence(model, batchMatches, batchBoundaries,
            begin, boundary.offset.begin, params, maxSeq, lmWeight,
            variantModelWeight, contextRulesWeight)
        else
          out ++= batchMatches.map(_.copy(selected = Some(0)))
        begin = boundary.offset.end
        beginIndex = i + 1
      }
    }
    val result = out.result()
    if (unicodeOffsets) remapOffsetsToUnicodePoints(text, result) else result
  }

  /** Text of the selected solution, falling back to the input span
    * (reference: match_to_str).
    */
  def matchToStr(model: LocalVariantModel, m: TextMatch): String =
    (for {
      sel <- m.selected
      vs <- m.variants
      v <- vs.lift(sel)
    } yield model.text(v.vocabId)).getOrElse(m.text)
}
