package graft.kernel

/** Context rules: token-sequence patterns over (vocabId, lexindex) pairs
  * that apply a score bonus/penalty (&gt;1.0 / &lt;1.0) and optional tags to
  * decoded sequences (reference: src/search.rs:338-523 ContextRule /
  * PatternMatch / PatternMatchResult; loading src/lib.rs:570-764).
  */
sealed trait PatternMatch {

  /** Does this pattern element match position `index` of `sequence`
    * (reference: search.rs:372-411)? Sequence items are
    * (vocabId, lexindex bitmask); vocabId 0 = out-of-vocabulary.
    */
  def matches(sequence: IndexedSeq[(Long, Long)], index: Int): Boolean =
    this match {
      case PatternMatch.Any => true
      case PatternMatch.NoLexicon =>
        sequence.lift(index).exists { case (v, lex) => lex == 0L || v == 0L }
      case PatternMatch.Vocab(id) =>
        sequence.lift(index).exists(_._1 == id)
      case PatternMatch.FromLexicon(i) =>
        sequence.lift(index).exists { case (_, lex) =>
          (lex & (1L << i)) == (1L << i)
        }
      case PatternMatch.Not(pm) => !pm.matches(sequence, index)
      case PatternMatch.Disjunction(pms) =>
        pms.exists(_.matches(sequence, index))
    }
}

object PatternMatch {
  final case class Vocab(id: Long) extends PatternMatch
  case object Any extends PatternMatch
  case object NoLexicon extends PatternMatch
  final case class FromLexicon(index: Int) extends PatternMatch
  final case class Not(pm: PatternMatch) extends PatternMatch
  final case class Disjunction(pms: Vector[PatternMatch]) extends PatternMatch

  /** Parse one pattern expression (reference: search.rs:413-458).
    * Syntax: `?` any, `^` no-lexicon, `!expr` / `!(a|b)` negation,
    * `a|b` disjunction, `@lexicon` lexicon test, else vocabulary word.
    */
  def parse(
      raw: String,
      lexicons: Seq[String],
      encode: String => Option[Long]
  ): Either[String, PatternMatch] = {
    val s = raw.trim
    if (s == "?") Right(Any)
    else if (s == "^") Right(NoLexicon)
    else if (s.startsWith("!(") && s.endsWith(")"))
      parse(s.substring(2, s.length - 1), lexicons, encode).map(Not(_))
    else if (s.contains("|")) {
      val parts = s.split('|').toVector.map(parse(_, lexicons, encode))
      parts.collectFirst { case Left(e) => e } match {
        case Some(e) => Left(e)
        case None    => Right(Disjunction(parts.map(_.toOption.get)))
      }
    } else if (s.startsWith("!"))
      parse(s.substring(1), lexicons, encode).map(Not(_))
    else if (s.startsWith("@")) {
      val source = s.substring(1)
      val rel = s"/$source"
      lexicons.zipWithIndex
        .collectFirst {
          case (l, i) if l == source || l.endsWith(rel) => FromLexicon(i)
        }
        .toRight(s"context rule references unloaded lexicon '$source'")
    } else
      encode(s).map(Vocab(_))
        .toRight(s"context rule references unknown word '$s'")
  }
}

/** One matched pattern position (reference: search.rs:364-369). */
final case class PatternMatchResult(score: Float, tag: Option[Int], seqnr: Int)

/** A context rule: pattern + score + tags with (begin,length) offsets
  * (reference: search.rs:354-362 + matches search.rs:471-522).
  */
final case class ContextRule(
    pattern: Vector[PatternMatch],
    score: Float,
    tag: Vector[Int],
    tagOffset: Vector[(Int, Int)]
) {
  def length: Int = pattern.length

  /** Try to match at `begin`; on success fill `sequenceResult` for the
    * covered positions (first-match-wins: positions already covered block
    * the rule — reference search.rs:471-522).
    */
  def matches(
      sequence: IndexedSeq[(Long, Long)],
      begin: Int,
      sequenceResult: Array[Vector[PatternMatchResult]]
  ): Boolean = {
    require(sequence.length == sequenceResult.length)
    if (begin + pattern.length > sequence.length) return false
    val found = pattern.zipWithIndex.forall { case (pm, cursor) =>
      sequenceResult(begin + cursor).isEmpty && pm.matches(sequence, begin + cursor)
    }
    if (found) {
      for (cursor <- pattern.indices) {
        sequenceResult(begin + cursor) =
          if (tag.isEmpty)
            Vector(PatternMatchResult(score, None, cursor))
          else
            tag.zip(tagOffset).collect {
              case (t, (tb, tl)) if cursor >= tb && cursor < tb + tl =>
                PatternMatchResult(score, Some(t), cursor - tb)
            }
      }
    }
    found
  }
}
