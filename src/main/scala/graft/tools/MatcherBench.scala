package graft.tools

import graft.kernel._

/** Single-threaded kernel microbenchmark: variant-query throughput
  * against a large synthetic lexicon — compare with the reference's
  * published single-thread items/sec (BASELINE.md: 538-687 items/s on
  * 120-220k lexicons, i7-4770K).
  *
  * Usage: runMain graft.tools.MatcherBench [lexSize] [nQueries]
  */
object MatcherBench {
  def main(args: Array[String]): Unit = {
    val lexSize = if (args.length > 0) args(0).toInt else 120000
    val nQueries = if (args.length > 1) args(1).toInt else 2000
    val rng = new scala.util.Random(7L)
    val lexicon = (0 until lexSize).map { _ =>
      val len = 4 + rng.nextInt(9)
      String.valueOf(Array.fill(len)(('a' + rng.nextInt(26)).toChar))
    }.distinct
    val model = new LocalVariantModel(Alphabet.simpleLatin)
    lexicon.foreach(model.add(_))
    var t0 = System.nanoTime()
    model.build()
    println(f"[build] ${lexicon.size} entries in ${(System.nanoTime() - t0) / 1e9}%.2fs")

    val queries = (0 until nQueries).map { i =>
      graft.sources.SyntheticText.corrupt(rng,
        lexicon(rng.nextInt(lexicon.size)), 1 + (i % 2))
    }
    val params = SearchParameters()
    // warmup
    queries.take(2000).foreach(model.findVariants(_, params))
    t0 = System.nanoTime()
    var results = 0L
    queries.foreach(q => results += model.findVariants(q, params).length)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[query] $nQueries queries in $sec%.2fs = ${nQueries / sec}%.1f items/s (1 thread), $results results")

    // optional multi-thread sweep (pure JVM, no Spark): the achievable
    // kernel scaling ceiling on this host
    for (threads <- args.lift(2).map(_.toInt)) {
      val chunks = queries.grouped(math.max(1, queries.size / threads)).toVector
      val t1 = System.nanoTime()
      val ts = chunks.map { chunk =>
        val t = new Thread(() => chunk.foreach(model.findVariants(_, params)))
        t.start(); t
      }
      ts.foreach(_.join())
      val psec = (System.nanoTime() - t1) / 1e9
      println(f"[query] $nQueries queries in $psec%.2fs = " +
        f"${nQueries / psec}%.1f items/s ($threads threads), " +
        f"speedup ${sec / psec}%.2fx")
    }
  }
}
