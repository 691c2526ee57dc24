package graft.kernel

/** Scoring weights for the similarity kernel.
  *
  * Semantics follow the reference's weighted linear combination of
  * normalized distance factors (reference: src/types.rs:40-73,
  * src/lib.rs:1429-1452): Damerau-Levenshtein, longest common substring,
  * common prefix/suffix lengths and a casing-agreement flag, normalized by
  * the weight sum so an exact match scores 1.0.
  */
final case class Weights(
    ld: Double = 0.5,
    lcs: Double = 0.125,
    prefix: Double = 0.125,
    suffix: Double = 0.125,
    caseW: Double = 0.125
) {
  def sum: Double = ld + lcs + prefix + suffix + caseW
}

/** Distance threshold forms (reference: src/types.rs:76-108). */
sealed trait DistanceThreshold {

  /** Resolve to an absolute per-input threshold given the normalized input
    * length (reference: src/lib.rs:982-1012 — note the absolute form is
    * additionally capped at len/2 for very short inputs).
    */
  def resolve(normLen: Int, absoluteMax: Int): Int = this match {
    case DistanceThreshold.Ratio(x) =>
      math.min((normLen.toFloat * x).floor.toInt, absoluteMax)
    case DistanceThreshold.RatioWithLimit(x, limit) =>
      math.min((normLen.toFloat * x).floor.toInt, limit)
    case DistanceThreshold.Absolute(x) =>
      math.min(x, (normLen.toDouble / 2.0).floor.toInt)
  }
}
object DistanceThreshold {
  final case class Ratio(ratio: Float) extends DistanceThreshold
  final case class RatioWithLimit(ratio: Float, limit: Int) extends DistanceThreshold
  final case class Absolute(value: Int) extends DistanceThreshold

  /** Absolute safety caps (reference: src/lib.rs:42-46). */
  val MaxAnagramDistance = 12
  val MaxEditDistance = 12
}

/** Stop criterion for candidate search (reference: src/types.rs:307-313). */
sealed trait StopCriterion
object StopCriterion {
  case object Exhaustive extends StopCriterion
  case object StopAtExactMatch extends StopCriterion
}

/** Query/search configuration (reference: src/types.rs:112-192 with the
  * defaults of src/types.rs:170-192). This doubles as the dedup pipeline's
  * fixed "shingle/signature config": recall parity versus the reference
  * requires holding these constant between the reference-semantics matcher
  * and the LSH pipeline's verification kernel.
  */
final case class SearchParameters(
    maxAnagramDistance: DistanceThreshold = DistanceThreshold.Absolute(3),
    maxEditDistance: DistanceThreshold = DistanceThreshold.Absolute(3),
    maxMatches: Int = 20,
    scoreThreshold: Double = 0.25,
    cutoffThreshold: Double = 2.0,
    stopCriterion: StopCriterion = StopCriterion.Exhaustive,
    maxNgram: Int = 3,
    freqWeight: Float = 0.0f,
    weights: Weights = Weights()
)
