package graft.kernel

import java.math.BigInteger
import scala.collection.mutable

import AnaHash.bigIntegerOrdering

/** A vocabulary entry (reference: src/vocab.rs:8-29, simplified to the
  * fields the matching path reads).
  */
final case class VocabEntry(
    id: Long,
    text: String,
    norm: Array[Int],
    frequency: Long,
    transparent: Boolean,
    /** outgoing VariantOf edges: (targetId, score) (reference: src/types.rs:316-324) */
    variantOf: List[(Long, Double)],
    /** participates in the anagram index (reference: VocabType::INDEXED) */
    indexed: Boolean = true,
    /** participates in the language model (reference: VocabType::LM) */
    lm: Boolean = false
) {
  /** number of space-separated tokens (reference: vocab.rs tokencount) */
  def tokenCount: Int = text.count(_ == ' ') + 1
}

/** In-memory port of the reference's variant-matching engine
  * (reference: src/lib.rs VariantModel — build src/lib.rs:190-245,
  * find_variants src/lib.rs:972-1027). Two jobs:
  *
  *  1. the parity anchor: ScalaTest asserts its outputs against the
  *     reference's own unit-test expected values (tests/main.rs 04xx/08xx);
  *  2. the broadcastable kernel: at reference scale (lexicons ≤ a few 100k
  *     rows) the whole index fits comfortably in executor memory, so the
  *     Spark matcher broadcasts one of these and maps partitions — zero
  *     shuffle in the verify stage, which is what makes the throughput
  *     scale near-linearly with cores. The declarative join-based plan in
  *     graft.operators.VariantMatcher covers the huge-lexicon case and is
  *     tested equal to this one.
  *
  * Instances are immutable after build(); safe to broadcast.
  */
final class LocalVariantModel(
    val alphabet: Alphabet,
    val weights: Weights = Weights(),
    // reference default is Max (vocab.rs VocabParams::default)
    frequencyHandling: String = "max",
    /** apply confusable rescoring before pruning/expansion instead of the
      * default after-truncation point (reference: lib.rs:96-97,1505-1508)
      */
    val confusablesBeforePruning: Boolean = false
) extends Serializable {

  private val confusablesList =
    scala.collection.mutable.ArrayBuffer.empty[Confusable]

  /** Register a confusable pattern (reference: lib.rs add_to_confusables). */
  def addConfusable(script: String, weight: Double): this.type = {
    confusablesList += Confusable.parse(script, weight)
    this
  }

  def confusables: Seq[Confusable] = confusablesList.toSeq

  private val entries = mutable.ArrayBuffer.empty[VocabEntry]
  private val encoder = mutable.HashMap.empty[String, Int]
  // primary anagram index: anavalue -> vocab ids in insertion order
  // (reference: src/index.rs:5-12)
  private var index: Map[BigInteger, Vector[Long]] = Map.empty
  // secondary index: charcount -> numerically ascending anavalues as
  // parallel primitive-friendly arrays (values + presence masks) so the
  // containment scan is a tight loop with a 1-AND prefilter
  // (reference: src/lib.rs:222-245; scan lib.rs:1266-1281)
  private var sortedIndex: Map[Int, (Array[BigInteger], Array[Long])] = Map.empty
  private var anavalues: Map[Long, BigInteger] = Map.empty
  var haveFreq: Boolean = false
  // language model state (reference: lib.rs ngrams/have_lm)
  private var ngramCounts: Map[Vector[Long], Long] = Map.empty
  var haveLm: Boolean = false

  // special tokens pre-seeded like the reference (vocab.rs:145-181)
  entries += VocabEntry(0, "<bos>", Array.empty, 0, transparent = false, Nil,
    indexed = false)
  entries += VocabEntry(1, "<eos>", Array.empty, 0, transparent = false, Nil,
    indexed = false)
  entries += VocabEntry(2, "<unk>", Array.empty, 0, transparent = false, Nil,
    indexed = false)
  encoder("<bos>") = 0; encoder("<eos>") = 1; encoder("<unk>") = 2

  def alphabetSizeWithUnk: Int = alphabet.size + 1

  def vocab: collection.IndexedSeq[VocabEntry] = entries

  def get(text: String): Option[VocabEntry] =
    encoder.get(text).map(entries(_))

  /** Insert or merge a vocabulary item. Frequency merge on duplicates
    * follows the reference's Sum/Max/Min/Replace (src/lib.rs:900-967,
    * src/vocab.rs:100-106); a later non-transparent insert clears the
    * transparent flag (src/lib.rs:935-940).
    */
  def add(
      text: String,
      frequency: Option[Long] = None,
      transparent: Boolean = false,
      indexed: Boolean = true,
      lm: Boolean = false
  ): Long = {
    if (frequency.isDefined) haveFreq = true
    val freq = frequency.getOrElse(1L)
    encoder.get(text) match {
      case Some(i) =>
        val e = entries(i)
        val merged = frequencyHandling match {
          case "sum"     => e.frequency + freq
          case "max"     => math.max(e.frequency, freq)
          case "min"     => math.min(e.frequency, freq)
          case "replace" => freq
          case other => throw new IllegalArgumentException(other)
        }
        entries(i) = e.copy(
          frequency = merged,
          transparent = e.transparent && transparent,
          indexed = e.indexed || indexed,
          lm = e.lm || lm
        )
        e.id
      case None =>
        val id = entries.length.toLong
        entries += VocabEntry(id, text, alphabet.normalize(text), freq,
          transparent, Nil, indexed = indexed, lm = lm)
        encoder(text) = entries.length - 1
        id
    }
  }

  /** Add a language-model n-gram entry (reference: VocabType::LM load,
    * bin/analiticcl.rs:1070-1082). Space-separated tokens, may reference
    * &lt;bos&gt;/&lt;eos&gt;.
    */
  def addLm(text: String, frequency: Long): Long =
    add(text, Some(frequency), indexed = false, lm = true)

  /** Encode a single token (reference: encode_token with use_unk=true). */
  def encodeToken(token: String): Long =
    encoder.get(token).map(entries(_).id).getOrElse(LocalVariantModel.UNK)

  /** Exact encoder lookup (no UNK fallback). */
  def encode(text: String): Option[Long] = encoder.get(text).map(entries(_).id)

  /** Decompose a vocab entry into component unigram ids (reference:
    * into_ngram, lib.rs:2688-2729; unknown parts become UNK).
    */
  def intoNgram(id: Long): Vector[Long] =
    entries(id.toInt).text.split(' ').iterator.map(encodeToken).toVector

  def ngramCount(ngram: Vector[Long]): Option[Long] = ngramCounts.get(ngram)

  /** Add a weighted VariantOf edge variant -> target (reference:
    * src/lib.rs:478-514 add_variant; used by the error-list reader).
    */
  def addVariantEdge(variantText: String, targetText: String, score: Double,
      transparentVariant: Boolean = true): Unit = {
    val targetId = add(targetText)
    val vIdx = encoder.getOrElse(variantText, {
      add(variantText, None, transparent = transparentVariant)
      encoder(variantText)
    })
    val e = entries(vIdx)
    entries(vIdx) = e.copy(variantOf = (targetId, score) :: e.variantOf)
  }

  /** Build the anagram index + charcount-partitioned secondary index
    * (reference: src/lib.rs:190-245).
    */
  def build(): this.type = {
    val idx = mutable.LinkedHashMap.empty[BigInteger, Vector[Long]]
    val avs = mutable.HashMap.empty[Long, BigInteger]
    val masks = mutable.HashMap.empty[BigInteger, Long]
    val counts = mutable.HashMap.empty[BigInteger, Int]
    for (e <- entries if e.indexed) {
      val (av, mask) = alphabet.anahashWithMask(e.text)
      avs(e.id) = av
      idx(av) = idx.getOrElse(av, Vector.empty) :+ e.id
      masks(av) = mask
      // charcount == normalized length for values built from text
      counts.getOrElseUpdate(av, e.norm.length)
    }
    index = idx.toMap
    anavalues = avs.toMap
    sortedIndex = index.keysIterator.toVector
      .map(av => (counts(av), av))
      .groupBy(_._1)
      .map { case (cc, vs) =>
        val sorted = vs.map(_._2).sortBy(identity).toArray
        cc -> (sorted, sorted.map(masks))
      }
    // language model (reference: lib.rs:247-297)
    val lmCounts = mutable.HashMap.empty[Vector[Long], Long]
    for (e <- entries if e.lm) {
      val ngram = intoNgram(e.id)
      if (ngram.nonEmpty)
        lmCounts(ngram) = lmCounts.getOrElse(ngram, 0L) + e.frequency
    }
    ngramCounts = lmCounts.toMap
    haveLm = ngramCounts.nonEmpty
    this
  }

  /** Port of lm_score_tokens (reference: lib.rs:2632-2674): bigram
    * logprob with add-one/fixed smoothing; tokens are Some(id) or None
    * for out-of-vocabulary. Returns (logprob, perplexity).
    */
  def lmScoreTokens(tokens: IndexedSeq[Option[Long]]): (Float, Double) = {
    val smoothing = -13.815510557964274f // search.rs:4
    var logprob = 0.0f
    var n = 0
    var i = 1
    while (i < tokens.length) {
      (tokens(i - 1), tokens(i)) match {
        case (Some(a), Some(b)) =>
          val priorCount = ngramCounts.getOrElse(Vector(a), 1L)
          ngramCounts.get(Vector(a, b)) match {
            case Some(joint) =>
              logprob +=
                (if (priorCount < joint) math.log(joint.toDouble).toFloat
                 else math.log(joint.toDouble / priorCount.toDouble).toFloat)
            case None => logprob += smoothing
          }
          n += 1
        case _ =>
          n += 1
          logprob += smoothing
      }
      i += 1
    }
    val perplexity = -1.0 / n.toDouble * logprob.toDouble
    (logprob, perplexity)
  }


  def anagramInstances(av: BigInteger): Vector[Long] =
    index.getOrElse(av, Vector.empty)

  /** Candidate anagram values near `focus`: exact probe + deletion BFS +
    * containment scan over the charcount-bucketed secondary index
    * (reference: src/lib.rs:1143-1308). Returned ascending (BTreeSet order)
    * so downstream gather order is deterministic.
    */
  def findNearestAnahashes(
      focus: BigInteger,
      maxDistance: Int,
      stopCriterion: StopCriterion = StopCriterion.Exhaustive
  ): Vector[BigInteger] = {
    val nearest = mutable.TreeSet.empty[BigInteger]
    if (index.contains(focus)) {
      nearest += focus
      if (stopCriterion == StopCriterion.StopAtExactMatch &&
        index(focus).nonEmpty) return nearest.toVector
    }
    val focusMask = AnaHash.maskOf(focus, alphabetSizeWithUnk)
    val (focusUpper, focusCharCount) =
      AnaHash.alphabetUpperBound(focus, alphabetSizeWithUnk)
    val focusAlphabetSize = focusUpper + 1

    // (lookup value, mask, target charcount) containment probes
    val lookups = mutable.LinkedHashMap.empty[(BigInteger, Int), Long]
    for (d <- 1 to maxDistance)
      lookups((focus, focusCharCount + d)) = focusMask

    val deletions = AnaHash.deletionNeighborhoodWithMasks(
      focus, focusMask, focusAlphabetSize + 1, maxDistance)
    for ((del, mask, dist) <- deletions) {
      if (index.contains(del)) nearest += del
      val delCharCount = focusCharCount - dist
      for (sd <- 1 to (maxDistance - dist))
        lookups.getOrElseUpdate((del, delCharCount + sd), mask)
    }

    // containment scan: per target charcount, keep index values divisible
    // by any scheduled lookup value (reference: src/lib.rs:1266-1281).
    // Tight loop with a presence-mask prefilter — the vast majority of
    // (candidate, probe) tests die on one AND instead of a BigInteger mod.
    val byCc = lookups.keysIterator.toVector.groupBy(_._2)
    for ((cc, probeKeys) <- byCc; bucket <- sortedIndex.get(cc)) {
      val (candidates, candMasks) = bucket
      val values = probeKeys.map(_._1).toArray
      val probeMasks = probeKeys.map(k => lookups(k)).toArray
      var ci = 0
      while (ci < candidates.length) {
        val cand = candidates(ci)
        val cMask = candMasks(ci)
        var pi = 0
        var found = false
        while (pi < values.length && !found) {
          if ((probeMasks(pi) & ~cMask) == 0 &&
            AnaHash.contains(cand, values(pi))) {
            nearest += cand
            found = true
          }
          pi += 1
        }
        ci += 1
      }
    }
    nearest.toVector
  }

  /** Gather vocab instances under the nearest anagram values and verify
    * with the DL kernel (reference: src/lib.rs:1311-1402). Order =
    * ascending anavalue, then insertion order — this order feeds the
    * stable ranking sort and is part of the reference's deterministic
    * tie-breaking.
    */
  def gatherInstances(
      nearest: Vector[BigInteger],
      queryNorm: Array[Int],
      queryText: String,
      maxEditDistance: Int
  ): Vector[(Long, Distance)] = {
    val out = Vector.newBuilder[(Long, Distance)]
    for (av <- nearest; id <- index.getOrElse(av, Vector.empty)) {
      val e = entries(id.toInt)
      Scoring.distanceFeatures(queryNorm, queryText, e.norm, e.text,
        maxEditDistance, weights).foreach(d => out += ((id, d)))
    }
    out.result()
  }

  /** Score, threshold, expand variants, normalize frequencies, rank,
    * dedup, tie-aware top-k and relative cutoff
    * (reference: src/lib.rs:1405-1653).
    */
  def scoreAndRank(
      instances: Vector[(Long, Distance)],
      inputLength: Int,
      params: SearchParameters
  ): Vector[VariantResult] =
    scoreAndRank(instances, inputLength, params, input = "")

  def scoreAndRank(
      instances: Vector[(Long, Distance)],
      inputLength: Int,
      params: SearchParameters,
      input: String
  ): Vector[VariantResult] = {
    // R5 confusable rescoring (reference: lib.rs:1655-1663)
    def rescoreConfusables(rs: Vector[VariantResult]): Vector[VariantResult] =
      rs.map(r => r.copy(distScore = r.distScore *
        Confusable.weightFor(confusablesList.toSeq, input, entries(r.vocabId.toInt).text)))
    var maxFreq = 0.0
    var hasExpandable = false
    val results = Vector.newBuilder[VariantResult]
    for ((id, dist) <- instances) {
      val e = entries(id.toInt)
      val s = Scoring.score(dist, inputLength, weights)
      val freqScore = if (haveFreq) e.frequency.toDouble else 1.0
      if (freqScore > maxFreq) maxFreq = freqScore
      if (!hasExpandable && e.variantOf.nonEmpty) hasExpandable = true
      if (s >= params.scoreThreshold)
        results += VariantResult(id, s, freqScore)
    }
    var rs = results.result()
    // early confusable rescoring (reference: lib.rs:1505-1508)
    if (confusablesList.nonEmpty && confusablesBeforePruning)
      rs = rescoreConfusables(rs)
    if (hasExpandable) {
      rs = expandVariants(rs)
      for (r <- rs) if (r.freqScore > maxFreq) maxFreq = r.freqScore
    }
    if (maxFreq > 0.0) rs = rs.map(r => r.copy(freqScore = r.freqScore / maxFreq))
    rs = Scoring.rank(rs, params.freqWeight)
    if (hasExpandable) {
      // dedup consecutive duplicates by vocab id, keeping first
      // (reference: Vec::dedup_by_key, src/lib.rs:1530-1533)
      val b = Vector.newBuilder[VariantResult]
      var last = -1L
      for (r <- rs) { if (r.vocabId != last) b += r; last = r.vocabId }
      rs = b.result()
    }
    rs = Scoring.truncateTieAware(rs, params.maxMatches, params.freqWeight)
    // late confusable rescoring + re-rank (default; reference: lib.rs:1591-1595)
    if (confusablesList.nonEmpty && !confusablesBeforePruning) {
      rs = Scoring.rank(rescoreConfusables(rs), params.freqWeight)
    }
    Scoring.applyCutoff(rs, params.cutoffThreshold, params.freqWeight)
  }

  /** Expand VariantOf edges; transparent originals are dropped
    * (reference: src/lib.rs:1677-1727).
    */
  def expandVariants(results: Vector[VariantResult]): Vector[VariantResult] = {
    val out = Vector.newBuilder[VariantResult]
    for (r <- results) {
      val e = entries(r.vocabId.toInt)
      // edges were prepended on insert; reference stores them in file
      // order, so restore insertion order here
      for ((targetId, edgeScore) <- e.variantOf.reverse) {
        val target = entries(targetId.toInt)
        out += VariantResult(
          targetId,
          r.distScore * edgeScore,
          math.min(target.frequency.toDouble, r.freqScore),
          via = Some(r.vocabId)
        )
      }
      if (!e.transparent) out += r
    }
    out.result()
  }

  /** The flagship entry point: ranked variants for one input string
    * (reference: src/lib.rs:972-1027).
    */
  def findVariants(input: String, params: SearchParameters): Vector[VariantResult] = {
    val norm = alphabet.normalize(input)
    if (norm.isEmpty) return Vector.empty
    val focus = alphabet.anahash(input)
    val maxAna = params.maxAnagramDistance
      .resolve(norm.length, DistanceThreshold.MaxAnagramDistance)
    val nearest = findNearestAnahashes(focus, maxAna, params.stopCriterion)
    val maxEdit = params.maxEditDistance
      .resolve(norm.length, DistanceThreshold.MaxEditDistance)
    val instances = gatherInstances(nearest, norm, input, maxEdit)
    scoreAndRank(instances, norm.length, params, input)
  }

  /** Resolve a result id back to its text. */
  def text(id: Long): String = entries(id.toInt).text

  def entry(id: Long): VocabEntry = entries(id.toInt)
}

object LocalVariantModel {
  /** Pre-seeded special token ids (reference: vocab.rs:145-147). */
  val BOS = 0L
  val EOS = 1L
  val UNK = 2L
}
