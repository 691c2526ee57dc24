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
    * max. This is the dedup verification kernel.
    */
  def damerau(a: Column, b: Column, maxDistance: Int): Column = {
    val f = udf { (x: String, y: String) =>
      if (x == null || y == null) -1
      else Distances.damerauLevenshtein(alphabet.normalize(x), alphabet.normalize(y), maxDistance)
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
}

object Kernels {
  lazy val test = new Kernels(Alphabet.test)
  lazy val simpleLatin = new Kernels(Alphabet.simpleLatin)
}
