package graft.sources

import scala.util.Random

/** Deterministic (seeded) synthetic text with known ground-truth duplicate
  * structure: canonical phrases plus corrupted copies within a bounded
  * Damerau-Levenshtein distance (insert/delete/substitute/transpose over
  * a given character inventory). Drives the dedup parity tests and the
  * synthetic clip table (FIXTURES.md §8) — no external data.
  */
object SyntheticText {

  /** Word inventory: 30 natural words plus deterministic pseudo-words to
    * a 1000-word vocabulary. A realistic vocabulary size matters for the
    * BENCHMARK semantics: with only 30 words, a 3-word phrase space has
    * 27k members, so at >10^5 clusters nearly every phrase collides with
    * near-misses of itself and candidate volume grows quadratically —
    * unlike any real transcript corpus. 1000 words gives a 10^9 3-gram
    * space: density (and thus LSH bucket fill) stays realistic as the
    * cluster count scales.
    */
  val defaultWords: Vector[String] = {
    val base = Vector(
      "separate", "operate", "desperate", "right", "think", "house", "huis",
      "table", "window", "stream", "filter", "query", "batch", "vector",
      "merge", "sort", "hash", "value", "column", "spark", "cluster", "data",
      "small", "large", "fast", "slow", "scan", "group", "order", "joint")
    val syllables = Vector(
      "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
      "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
      "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
      "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
      "ta", "te", "ti", "to", "tu", "va", "ve", "vi", "vo", "vu")
    val rng = new Random(0x5EED)
    val pseudo = Iterator.continually(
      Seq.fill(2 + rng.nextInt(3))(syllables(rng.nextInt(syllables.length)))
        .mkString)
      .distinct.filterNot(base.contains).take(970).toVector
    base ++ pseudo
  }

  /** A canonical phrase: `nWords` words drawn (seeded) from the inventory. */
  def phrase(rng: Random, nWords: Int, words: Vector[String] = defaultWords): String =
    Seq.fill(nWords)(words(rng.nextInt(words.length))).mkString(" ")

  /** Apply exactly `k` random single-character edits (25% each of insert /
    * delete / substitute / adjacent-transpose) over [a-z ]. Deterministic
    * under the passed rng.
    */
  def corrupt(rng: Random, s: String, k: Int): String = {
    val chars = "abcdefghijklmnopqrstuvwxyz"
    var cur = s
    for (_ <- 0 until k if cur.nonEmpty) {
      val op = rng.nextInt(4)
      val pos = rng.nextInt(cur.length)
      cur = op match {
        case 0 => // insert
          cur.substring(0, pos) + chars(rng.nextInt(26)) + cur.substring(pos)
        case 1 => // delete
          if (cur.length > 1) cur.substring(0, pos) + cur.substring(pos + 1) else cur
        case 2 => // substitute
          cur.substring(0, pos) + chars(rng.nextInt(26)) + cur.substring(pos + 1)
        case 3 => // transpose adjacent
          if (pos < cur.length - 1)
            cur.substring(0, pos) + cur(pos + 1) + cur(pos) + cur.substring(pos + 2)
          else cur
      }
    }
    cur
  }

  /** Ground-truth corpus row. */
  final case class Doc(id: Long, clusterId: Long, text: String, isCanonical: Boolean)

  /** Build a corpus of `nClusters` canonical phrases, each with 0..maxDups
    * corrupted near-duplicates within edit distance ≤ maxEdits. Cluster
    * membership is the ground truth the dedup pipeline must recover.
    */
  def corpus(
      seed: Long,
      nClusters: Int,
      maxDups: Int = 3,
      maxEdits: Int = 2,
      phraseWords: Int = 3
  ): Vector[Doc] = {
    val rng = new Random(seed)
    val out = Vector.newBuilder[Doc]
    var id = 0L
    for (c <- 0 until nClusters) {
      val canon = phrase(rng, phraseWords)
      out += Doc(id, c.toLong, canon, isCanonical = true)
      id += 1
      val nDups = rng.nextInt(maxDups + 1)
      for (_ <- 0 until nDups) {
        val k = 1 + rng.nextInt(math.max(maxEdits, 1))
        out += Doc(id, c.toLong, corrupt(rng, canon, k), isCanonical = false)
        id += 1
      }
    }
    out.result()
  }
}
