package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** One-permutation MinHash (OPH) kernel: determinism, set semantics,
  * densification coverage, and — the property LSH recall rests on —
  * per-position collision probability tracking Jaccard similarity at
  * classic-minhash accuracy.
  */
class FastHashSpec extends AnyFunSuite {

  private def hashesOf(xs: Seq[Long]): Array[Long] =
    xs.map(FastHash.mix64).toArray

  test("OPH is deterministic and order/multiplicity-independent") {
    val a = hashesOf(1L to 200L)
    val shuffled = new scala.util.Random(5).shuffle(a.toSeq).toArray
    val doubled = a ++ a
    assert(FastHash.minhashOPH(a, 128).toSeq ==
      FastHash.minhashOPH(shuffled, 128).toSeq)
    assert(FastHash.minhashOPH(a, 128).toSeq ==
      FastHash.minhashOPH(doubled, 128).toSeq)
  }

  test("OPH densifies every bin, even from a single element") {
    val sig = FastHash.minhashOPH(hashesOf(Seq(42L)), 128)
    assert(!sig.contains(Long.MaxValue))
    // distance salting keeps borrowed values distinct from each other
    assert(sig.distinct.length > 100)
  }

  test("OPH per-position collisions track Jaccard like classic minhash") {
    val k = 128
    val rng = new scala.util.Random(1)
    for (j <- Seq(0.5, 0.7, 0.9)) {
      // many (setA, setB) draws at exact overlap |A∩B|/|A∪B| = j
      var matchesOph = 0L
      var matchesClassic = 0L
      var total = 0L
      for (trial <- 1 to 60) {
        val union = Array.fill(120)(rng.nextLong())
        val shared = union.take(math.round(120 * j).toInt)
        val restA = union.drop(shared.length)
          .take((120 - shared.length) / 2)
        val restB = union.drop(shared.length + restA.length)
        val a = hashesOf((shared ++ restA).toSeq)
        val b = hashesOf((shared ++ restB).toSeq)
        val trueJ = shared.length.toDouble /
          (shared.length + restA.length + restB.length)
        val so = FastHash.minhashOPH(a, k)
          .zip(FastHash.minhashOPH(b, k)).count(p => p._1 == p._2)
        val sc = FastHash.minhash(a, k)
          .zip(FastHash.minhash(b, k)).count(p => p._1 == p._2)
        matchesOph += so
        matchesClassic += sc
        total += k
        // keep the construction honest: trueJ within 0.1 of target
        assert(math.abs(trueJ - j) < 0.1, s"bad corpus trueJ=$trueJ")
      }
      val estOph = matchesOph.toDouble / total
      val estClassic = matchesClassic.toDouble / total
      assert(math.abs(estOph - estClassic) < 0.05,
        s"j=$j oph=$estOph classic=$estClassic")
      assert(math.abs(estOph - j) < 0.08, s"j=$j oph estimate $estOph")
    }
  }

  test("SWAR simhash is bit-identical to the scalar vote loop") {
    def scalarSimhash(hashes: Array[Long]): Long = {
      val votes = new Array[Int](64)
      for (h <- hashes; b <- 0 until 64)
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      (0 until 64).foldLeft(0L)((out, b) =>
        if (votes(b) > 0) out | (1L << b) else out)
    }
    val rng = new scala.util.Random(11)
    for (n <- Seq(1, 2, 3, 64, 255, 1000, 70000)) {
      val hs = Array.fill(n)(rng.nextLong())
      assert(FastHash.simhash(hs) == scalarSimhash(hs), s"n=$n")
    }
  }

  test("OPH: near-identical sets collide on nearly all positions") {
    val base = (1L to 300L).toSeq
    val a = FastHash.minhashOPH(hashesOf(base), 128)
    val b = FastHash.minhashOPH(hashesOf(base :+ 301L), 128)
    val same = a.zip(b).count(p => p._1 == p._2)
    assert(same >= 115, s"only $same/128 positions survived one insert")
  }
}
