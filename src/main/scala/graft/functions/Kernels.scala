package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import graft.kernel._

/** Spark column functions wrapping the analiticcl-semantics kernel
  * (SURVEY.md §2.2 P1-P10). These are deterministic scalar UDFs closing
  * over a (tiny, immutable) alphabet — Catalyst treats them as
  * deterministic, so they are pushed/pruned normally; they are the only
  * non-codegen expressions in the engine and sit exclusively in the
  * *verify* stage of the dedup pipeline, after candidate pruning, where
  * per-row cost dominates and codegen matters less than algorithmic
  * pruning.
  *
  * Where a pure-builtin equivalent exists (shingles, minhash, exact
  * hashes...) we use builtins instead — see [[TextFns]].
  */
final class Kernels(alphabet: Alphabet) extends Serializable {

  /** P1: normalized form as space-joined class indices (string form keeps
    * the column oracle-comparable; the dedup pipeline's internal hot path
    * passes norm arrays directly between kernel UDFs instead).
    */
  val normStr: Column => Column = {
    val f = udf { (s: String) =>
      Option(s).map(x => alphabet.normalize(x).mkString(" "))
    }
    (c: Column) => f(c)
  }

  /** P2: anagram value as a decimal string (unbounded product of primes;
    * decimal-string form is oracle-comparable, the pipeline's internal
    * form is canonical bytes via [[graft.kernel.AnaHash.toBytes]]).
    */
  val anahashStr: Column => Column = {
    val f = udf { (s: String) =>
      Option(s).map(x => alphabet.anahash(x).toString)
    }
    (c: Column) => f(c)
  }

  /** P1 (internal form): normalized text as a compact string — one char
    * per alphabet-class index (codepoint 33 + idx, collision-free for
    * alphabets up to 168 classes). The dedup pipeline shingles THIS, so
    * shingle identity == normalized-class n-gram identity, exactly the
    * reference's alphabet semantics.
    */
  val normKey: Column => Column = {
    val f = udf { (s: String) =>
      Option(s).map { x =>
        val n = alphabet.normalize(x)
        val sb = new java.lang.StringBuilder(n.length)
        var i = 0
        while (i < n.length) { sb.append((33 + n(i)).toChar); i += 1 }
        sb.toString
      }
    }
    (c: Column) => f(c)
  }

  /** P2 (internal form): anagram value as canonical big-endian bytes. */
  val anahashBytes: Column => Column = {
    val f = udf { (s: String) =>
      Option(s).map(x => AnaHash.toBytes(alphabet.anahash(x)))
    }
    (c: Column) => f(c)
  }

  /** P4: character count of the normalized form. */
  val charCount: Column => Column = {
    val f = udf { (s: String) =>
      Option(s).map(x => alphabet.normalize(x).length)
    }
    (c: Column) => f(c)
  }

  /** P5: plain Levenshtein over normalized forms; -1 = exceeded max. */
  def levenshtein(a: Column, b: Column, maxDistance: Int): Column = {
    val f = udf { (x: String, y: String) =>
      if (x == null || y == null) -1
      else Distances.levenshtein(alphabet.normalize(x), alphabet.normalize(y), maxDistance)
    }
    f(a, b)
  }

  /** P6: full Damerau-Levenshtein over normalized forms; -1 = exceeded
    * max. This is the dedup verification kernel. Computed via the banded
    * zero-allocation [[Distances.dlChars]] over the compact normKey
    * rendering (one char per class index — identical integers to the
    * parity matrix implementation, pinned by DistancesPropSpec's 20k-case
    * equivalence property).
    */
  def damerau(a: Column, b: Column, maxDistance: Int): Column = {
    val f = udf { (x: String, y: String) =>
      if (x == null || y == null) -1
      else Distances.dlChars(Kernels.toNormKey(alphabet.normalize(x)),
        Kernels.toNormKey(alphabet.normalize(y)), maxDistance)
    }
    f(a, b)
  }

  /** P6-P10 fused: the full analiticcl similarity score of candidate `b`
    * against query `a` (weighted DL + LCS + prefix + suffix + case,
    * normalized by the query's normalized length; reference:
    * src/lib.rs:1429-1452). Null when DL exceeds maxEditDistance — i.e.
    * this single column IS the verify-stage filter.
    */
  def pairScore(a: Column, b: Column, maxEditDistance: Int,
      weights: Weights = Weights()): Column = {
    val f = udf { (x: String, y: String) =>
      if (x == null || y == null || x.isEmpty) None
      else {
        val nx = alphabet.normalize(x)
        if (nx.length == 0) None
        else
          Scoring
            .distanceFeatures(nx, x, alphabet.normalize(y), y, maxEditDistance, weights)
            .map(d => Scoring.score(d, nx.length, weights))
      }
    }
    f(a, b)
  }

  /** First-char case class for the precomputed-kernel path:
    * 0 = lowercase, 1 = not lowercase, 2 = empty text (reference case
    * semantics: empty side => sameCase true, lib.rs:1367-1377).
    */
  val caseClass: Column => Column = {
    val f = udf { (s: String) =>
      if (s == null || s.isEmpty) 2.toByte
      else if (Character.isLowerCase(s.codePointAt(0))) 0.toByte
      else 1.toByte
    }
    (c: Column) => f(c)
  }

  /** [[pairScoreMax]] over PRECOMPUTED normKey strings + case classes:
    * zero normalization work and zero per-call allocation in the pair
    * loop (banded DL with thread-local scratch — see Distances.dlChars).
    * This is the dedup verify kernel's production form: norm/case are
    * computed once per row upstream, reused across every candidate pair
    * the row appears in.
    */
  def pairScoreMaxPre(normA: Column, normB: Column, caseA: Column,
      caseB: Column, maxEditDistance: Int,
      weights: Weights = Weights()): Column = {
    val w = weights
    val f = udf { (na: String, nb: String, la: Byte, lb: Byte) =>
      if (na == null || nb == null || na.isEmpty || nb.isEmpty) None
      else {
        val ld = Distances.dlChars(na, nb, maxEditDistance)
        if (ld < 0) None
        else {
          val d = Distance(
            ld = ld,
            lcs = if (w.lcs > 0.0) Distances.lcsChars(na, nb) else 0,
            prefixLen = if (w.prefix > 0.0) Distances.prefixChars(na, nb) else 0,
            suffixLen = if (w.suffix > 0.0) Distances.suffixChars(na, nb) else 0,
            sameCase =
              if (w.caseW > 0.0 && la != 2.toByte && lb != 2.toByte) la == lb
              else true)
          Some(math.max(
            Scoring.score(d, na.length, w),
            Scoring.score(d, nb.length, w)))
        }
      }
    }
    f(normA, normB, caseA, caseB)
  }

  /** [[pairScoreMaxPre]] through the fastest formulation the session
    * offers: the native codegen [[PairScoreMax]] expression when
    * [[graft.spark.GraftExtensions]] is installed (bit-identical — both
    * paths run [[KernelExprs.pairScoreMax]]), else the UDF. Same picker
    * pattern as [[TextFns.cosineIn]].
    */
  def pairScoreMaxPreIn(s: org.apache.spark.sql.SparkSession)(
      normA: Column, normB: Column, caseA: Column, caseB: Column,
      maxEditDistance: Int, weights: Weights = Weights()): Column =
    if (s.catalog.functionExists("pair_score_max"))
      org.apache.spark.sql.functions.call_function("pair_score_max",
        normA, normB, caseA, caseB,
        org.apache.spark.sql.functions.lit(maxEditDistance),
        org.apache.spark.sql.functions.lit(weights.ld),
        org.apache.spark.sql.functions.lit(weights.lcs),
        org.apache.spark.sql.functions.lit(weights.prefix),
        org.apache.spark.sql.functions.lit(weights.suffix),
        org.apache.spark.sql.functions.lit(weights.caseW))
    else pairScoreMaxPre(normA, normB, caseA, caseB, maxEditDistance, weights)

  /** The dedup verify FILTER: exactly
    * `pairScoreMaxPre(...) IS NOT NULL AND pairScoreMaxPre(...) >= threshold`,
    * but through the native decision expression [[PairAccept]] when the
    * session has GraftExtensions — which skips the exact-LCS DP whenever
    * the score bounds already decide against the threshold (most pairs;
    * see [[KernelExprs.pairAccept]]). Sessions without the extension get
    * the exact-score UDF compared to the threshold — identical decisions
    * either way (KernelExprsSpec).
    */
  def pairAcceptPreIn(s: org.apache.spark.sql.SparkSession)(
      normA: Column, normB: Column, caseA: Column, caseB: Column,
      maxEditDistance: Int, threshold: Double,
      weights: Weights = Weights()): Column =
    if (s.catalog.functionExists("pair_accept"))
      org.apache.spark.sql.functions.call_function("pair_accept",
        normA, normB, caseA, caseB,
        org.apache.spark.sql.functions.lit(maxEditDistance),
        org.apache.spark.sql.functions.lit(weights.ld),
        org.apache.spark.sql.functions.lit(weights.lcs),
        org.apache.spark.sql.functions.lit(weights.prefix),
        org.apache.spark.sql.functions.lit(weights.suffix),
        org.apache.spark.sql.functions.lit(weights.caseW),
        org.apache.spark.sql.functions.lit(threshold))
    else {
      val sc = pairScoreMaxPre(normA, normB, caseA, caseB,
        maxEditDistance, weights)
      sc.isNotNull && sc >= org.apache.spark.sql.functions.lit(threshold)
    }

  /** Symmetric verification kernel: the max of pairScore(a,b) and
    * pairScore(b,a), with the distance features (DL, LCS, prefix, suffix,
    * case — all symmetric) computed ONCE; only the length normalization
    * differs per direction. Halves the verify-stage cost vs calling
    * [[pairScore]] twice. A dup pair must be accepted regardless of which
    * member plays the query role, hence max.
    */
  def pairScoreMax(a: Column, b: Column, maxEditDistance: Int,
      weights: Weights = Weights()): Column = {
    val f = udf { (x: String, y: String) =>
      if (x == null || y == null || x.isEmpty || y.isEmpty) None
      else {
        val nx = alphabet.normalize(x)
        val ny = alphabet.normalize(y)
        if (nx.length == 0 || ny.length == 0) None
        else
          Scoring.distanceFeatures(nx, x, ny, y, maxEditDistance, weights)
            .map(d => math.max(
              Scoring.score(d, nx.length, weights),
              Scoring.score(d, ny.length, weights)))
      }
    }
    f(a, b)
  }
}

object Kernels {
  lazy val test = new Kernels(Alphabet.test)
  lazy val simpleLatin = new Kernels(Alphabet.simpleLatin)

  /** Compact one-char-per-class rendering of a normalized form (codepoint
    * 33 + class index; collision-free for alphabets up to 168 classes).
    */
  private[functions] def toNormKey(n: Array[Int]): String = {
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) { sb.append((33 + n(i)).toChar); i += 1 }
    sb.toString
  }
}
