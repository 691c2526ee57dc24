package graft.tools

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.KernelExprs
import graft.kernel.Distances
import graft.sources.SyntheticText

/** Microbenchmark of the verify kernel's per-pair cost split (DL vs LCS
  * vs affixes vs the full expression) on pairs shaped exactly like the
  * pipeline's candidates: corrupted copies of ClipGen-style phrases.
  * Usage: runMain graft.tools.KernelMicroBench [nPairs]
  */
object KernelMicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val rng = new scala.util.Random(99L)
    val pairs = Array.fill(n) {
      // ClipGen's transcript shape: 3 + durMs/500 words, durMs in
      // [1000, 30000] -> 5..63 words (~230 chars avg)
      val a = SyntheticText.phrase(rng, 5 + rng.nextInt(59))
      val b =
        if (rng.nextInt(4) == 0) SyntheticText.phrase(rng, 5 + rng.nextInt(59))
        else SyntheticText.corrupt(rng, a, 1 + rng.nextInt(2))
      (a, b, UTF8String.fromString(a), UTF8String.fromString(b))
    }
    val avgLen = pairs.map(p => p._1.length + p._2.length).sum / (2.0 * n)
    println(f"pairs=$n avgLen=$avgLen%.1f")
    def time(label: String)(body: => Long): Unit = {
      body // warmup
      body
      val t0 = System.nanoTime()
      val sink = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-12s ${dt}%8.3fs  ${dt * 1e9 / n}%8.1f ns/pair  sink=$sink")
    }
    time("dl") {
      var s = 0L; var i = 0
      while (i < n) { s += Distances.dlChars(pairs(i)._1, pairs(i)._2, 3); i += 1 }
      s
    }
    time("lcs") {
      var s = 0L; var i = 0
      while (i < n) { s += Distances.lcsChars(pairs(i)._1, pairs(i)._2); i += 1 }
      s
    }
    time("affixes") {
      var s = 0L; var i = 0
      while (i < n) {
        s += Distances.prefixChars(pairs(i)._1, pairs(i)._2)
        s += Distances.suffixChars(pairs(i)._1, pairs(i)._2)
        i += 1
      }
      s
    }
    time("full") {
      var s = 0L; var i = 0
      while (i < n) {
        val v = KernelExprs.pairScoreMax(pairs(i)._3, pairs(i)._4,
          0.toByte, 0.toByte, 3, 1.0, 1.0, 0.25, 0.25, 0.1)
        if (!java.lang.Double.isNaN(v)) s += 1
        i += 1
      }
      s
    }
    // the production dedup filter shape: default weights, threshold 0.7
    time("score@dflt") {
      var s = 0L; var i = 0
      while (i < n) {
        val v = KernelExprs.pairScoreMax(pairs(i)._3, pairs(i)._4,
          0.toByte, 0.toByte, 3, 0.5, 0.125, 0.125, 0.125, 0.125)
        if (!java.lang.Double.isNaN(v) && v >= 0.7) s += 1
        i += 1
      }
      s
    }
    time("decision") {
      var s = 0L; var i = 0
      while (i < n) {
        if (KernelExprs.pairAccept(pairs(i)._3, pairs(i)._4,
          0.toByte, 0.toByte, 3, 0.5, 0.125, 0.125, 0.125, 0.125, 0.7)) s += 1
        i += 1
      }
      s
    }
  }
}
