package graft.operators

import graft.SparkSpecBase
import graft.kernel._

/** Distributed learn mode must be indistinguishable from the local
  * kernel's learnVariants fold (ref learn_variants lib.rs:1062-1139):
  * same learned counts per iteration, same frequencies (consecutive-run
  * rule), same vocab ids for new words, same variantOf/referenceFor edge
  * lists in the same order, same K3 dump — even when the corpus is split
  * across partitions mid-run.
  */
class DistributedLearnSpec extends SparkSpecBase {

  private def params = SearchParameters(
    maxAnagramDistance = DistanceThreshold.Absolute(2),
    maxEditDistance = DistanceThreshold.Absolute(2),
    maxMatches = 3, scoreThreshold = 0.5, cutoffThreshold = 0.0)

  private def freshModel(): LocalVariantModel = {
    val m = new LocalVariantModel(Alphabet.test)
    Seq("separate" -> 50L, "operate" -> 20L, "right" -> 30L,
      "house" -> 40L).foreach { case (w, f) => m.add(w, Some(f)) }
    m.build()
    m
  }

  /** Corpus chosen so that: a consecutive run of a repeated misspelling
    * straddles partition boundaries (boundary fixup), the same string
    * recurs NON-consecutively (second run bumps again), one line matches
    * nothing (must not break a run), and one line is an exact lexicon
    * word (no edge, no learn count).
    */
  private val corpus = Seq(
    "seperate", "seperate", "seperate", "rigth", "xqzzkj",
    "seperate", "hause", "right", "opperate", "hause")

  private def assertModelsEqual(a: LocalVariantModel, b: LocalVariantModel,
      words: Seq[String]): Unit = {
    for (w <- words) {
      assert(a.encode(w) == b.encode(w), s"id of $w")
      (a.encode(w), b.encode(w)) match {
        case (Some(ia), Some(ib)) =>
          val (ea, eb) = (a.entry(ia), b.entry(ib))
          assert(ea.frequency == eb.frequency, s"freq of $w")
          assert(ea.transparent == eb.transparent, s"transparent of $w")
          assert(ea.variantOf == eb.variantOf, s"variantOf of $w")
          assert(ea.referenceFor == eb.referenceFor, s"referenceFor of $w")
        case _ => ()
      }
    }
    assert(a.weightedVariantsTsv.toVector == b.weightedVariantsTsv.toVector)
  }

  test("distributed strict learn == local fold (2 iterations, 3 partitions)") {
    import spark.implicits._
    val local = freshModel()
    val dist = freshModel()
    // 3 partitions of sizes 4/3/3: the seperate-run spans nothing here but
    // the rigth/xqzzkj boundary and the second seperate run land apart
    val corpusDs = corpus.zipWithIndex
      .map { case (t, n) => (n.toLong, t) }
      .toDS()
      .repartitionByRange(3, $"_1")
    val words = corpus.distinct ++ Seq("separate", "operate", "right", "house")
    for (it <- 1 to 2) {
      val cLocal = local.learnVariants(corpus, params, strict = true)
      val cDist = DistributedLearn.iterate(spark, dist, corpusDs, params,
        strict = true)
      assert(cDist == cLocal, s"learned count, iteration $it")
      assertModelsEqual(local, dist, words)
    }
  }

  test("boundary fixup: a consecutive run split across partitions bumps once") {
    import spark.implicits._
    // every line identical -> one run -> freq exactly 1 (insert) no matter
    // how many partitions the run is chopped into
    val run = Seq.fill(8)("seperate")
    for (parts <- Seq(1, 4, 8)) {
      val m = freshModel()
      val ds = run.zipWithIndex.map { case (t, n) => (n.toLong, t) }
        .toDS().repartitionByRange(parts, $"_1")
      DistributedLearn.iterate(spark, m, ds, params, strict = true)
      val e = m.entry(m.encode("seperate").get)
      assert(e.frequency == 1L, s"parts=$parts")
      assert(e.transparent)
      val localM = freshModel()
      localM.learnVariants(run, params, strict = true)
      assertModelsEqual(localM, m, Seq("seperate", "separate"))
    }
  }

  test("learn loop halts on zero like the reference CLI") {
    import spark.implicits._
    val m = freshModel()
    // an exact word learns nothing -> loop must stop after iteration 1 of 5
    val ds = Seq((0L, "separate"), (1L, "right")).toDS()
    val counts = DistributedLearn.learn(spark, m, ds, params,
      iterations = 5, strict = true)
    assert(counts == Seq(0))
    // a learnable corpus keeps going, counts mirror the local loop
    val m2 = freshModel()
    val mLocal = freshModel()
    val c2 = corpus.zipWithIndex.map { case (t, n) => (n.toLong, t) }.toDS()
    val counts2 = DistributedLearn.learn(spark, m2, c2, params,
      iterations = 2, strict = true)
    val localCounts = (1 to 2).map { _ =>
      mLocal.learnVariants(corpus, params, strict = true)
    }.takeWhile(_ => true)
    assert(counts2.head == localCounts.head)
    assertModelsEqual(mLocal, m2,
      corpus.distinct ++ Seq("separate", "operate", "right", "house"))
  }

  test("distributed text-mode learn == local fold") {
    import spark.implicits._
    val local = freshModel()
    val dist = freshModel()
    val lines = Seq("seperate the hause", "right seperate", "opperate hause")
    val ds = lines.zipWithIndex.map { case (t, n) => (n.toLong, t) }
      .toDS().repartitionByRange(2, $"_1")
    val cLocal = local.learnVariants(lines, params, strict = false)
    val cDist = DistributedLearn.iterate(spark, dist, ds, params,
      strict = false)
    assert(cDist == cLocal)
    assertModelsEqual(local, dist,
      Seq("seperate", "hause", "opperate", "separate", "house", "operate",
        "right", "the"))
  }
}
