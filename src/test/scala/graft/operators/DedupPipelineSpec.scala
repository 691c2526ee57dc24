package graft.operators

import graft.SparkSpecBase
import graft.kernel._
import graft.sources.SyntheticText

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  // both physical strategies must produce identical assignments: the
  // one-task union-find kernel (small edge sets) and the distributed
  // large/small-star loop (forced via localKernelMaxEdges = 0)
  def bothPaths(edges: org.apache.spark.sql.DataFrame): Seq[Map[Long, Long]] =
    Seq(ConnectedComponents.runCut(spark, edges),
      ConnectedComponents.runCut(spark, edges, localKernelMaxEdges = 0L))
      .map(_.df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)

  test("chains, triangles, singletons and merges resolve to min-id components") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain -> 1
      (10L, 11L), (11L, 10L), (10L, 10L), // dup/self edges -> 10
      (20L, 21L), (22L, 21L), (22L, 20L), // triangle -> 20
      (30L, 31L), (32L, 33L), (31L, 32L) // merged chain -> 30
    ).toDF("src", "dst")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L)
    bothPaths(edges).foreach(got => assert(got == expected))
  }

  test("long path converges (log-round behavior)") {
    val n = 200
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      .toDF("src", "dst")
    bothPaths(edges).foreach { got =>
      assert(got.size == n)
      assert(got.values.forall(_ == 0L))
    }
  }

  test("loop path resumes MID-LOOP from persisted rounds") {
    // driver-restart story: run the loop with a resume key but stop after
    // one round (simulated crash), then run again — the second run must
    // seed from the persisted round instead of recomputing it, and still
    // converge to the right answer
    val dir = java.nio.file.Files.createTempDirectory("graft-ccr").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val edges = (0 until 63).map(i => (i.toLong, (i + 1).toLong))
        .toDF("src", "dst")
      // "crashed" run: only round 1 completes
      ConnectedComponents.runCut(spark, edges, localKernelMaxEdges = 0L,
        maxIterations = 1, resumeKey = Some("t1")).release()
      val round1 = new java.io.File(s"$dir/cc-t1/round-1")
      assert(round1.exists(), "round-1 not persisted")
      val mtime = round1.listFiles().map(_.lastModified()).max
      Thread.sleep(1100)
      // resumed run: completes from round 1
      val got = ConnectedComponents.runCut(spark, edges,
        localKernelMaxEdges = 0L, resumeKey = Some("t1"))
        .df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == 64 && got.values.forall(_ == 0L))
      val mtime2 = round1.listFiles().map(_.lastModified()).max
      assert(mtime2 == mtime, "round-1 was recomputed on resume")
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("loop path resumes from a reliable checkpoint dir") {
    // reliable-checkpoint mode (spark.graft.checkpointDir): each round's
    // edges land on the fault-tolerant FS instead of executor storage, so
    // an executor loss replays from the last committed round. Here we
    // verify the mode end-to-end: files appear under the dir and the
    // assignment is unchanged.
    val dir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val edges = (0 until 63).map(i => (i.toLong, (i + 1).toLong))
        .toDF("src", "dst")
      val got = ConnectedComponents
        .runCut(spark, edges, localKernelMaxEdges = 0L)
        .df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == 64 && got.values.forall(_ == 0L))
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty, "no reliable checkpoint files written")
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
    }
  }
}

/** End-to-end dedup: recover ground-truth clusters from a corrupted
  * corpus, and agree with the reference-semantics matcher's assignment
  * (the north rule's recall >= 0.99 criterion, small scale).
  */
class DedupPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  lazy val corpus: Vector[SyntheticText.Doc] =
    SyntheticText.corpus(seed = 42, nClusters = 120, maxDups = 3, maxEdits = 2)

  lazy val cfg: DedupConfig = DedupConfig()

  lazy val result: (org.apache.spark.sql.DataFrame, DedupMetrics) = {
    val df = corpus.map(d => (d.id, d.text)).toDF("id", "text")
    DedupPipeline.run(spark, df, "id", "text", cfg)
  }

  def truePairs: Set[(Long, Long)] =
    corpus.groupBy(_.clusterId).values.flatMap { docs =>
      for (a <- docs; b <- docs if a.id < b.id) yield (a.id, b.id)
    }.toSet

  def predictedPairs(assign: Map[Long, Long]): Set[(Long, Long)] =
    assign.toSeq.groupBy(_._2).values.flatMap { members =>
      val ids = members.map(_._1).sorted
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet

  test("ground-truth recovery is sane (informational floor)") {
    // The north-rule criterion is agreement with the REFERENCE matcher
    // (next test). Ground truth includes pairs beyond the configured
    // score threshold (2-edit corruptions of short phrases score < 0.7),
    // which the reference itself does not link at this config — so this
    // is a sanity floor, not the parity gate.
    val (assignDf, metrics) = result
    val assign = assignDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign.size == corpus.size)
    val tp = truePairs
    val pp = predictedPairs(assign)
    val recall = (tp & pp).size.toDouble / tp.size
    val precision = if (pp.isEmpty) 1.0 else (tp & pp).size.toDouble / pp.size
    info(s"ground-truth recall=$recall precision=$precision metrics=$metrics")
    assert(recall >= 0.6, s"ground-truth recall $recall < 0.6")
    assert(precision >= 0.85, s"precision $precision < 0.85")
  }

  test("substring pass links containment dups the DL verify rejects") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "quick brown fox jumps over"), // strict substring of 1
      (3L, "an entirely different transcript about ships and harbors"),
      (4L, "short one") // above no probe (too short w/ minLen 12)
    ).toDF("id", "text")
    // off (default): the big length gap defeats the DL kernel -> no link
    val (offAssign, _) = DedupPipeline.run(spark, docs, "id", "text",
      DedupConfig(), collectMetrics = false)
    val off = offAssign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(off(2L) != off(1L))
    // on: min-shingle anchor meets the pair, instr verifies containment
    val (onAssign, _) = DedupPipeline.run(spark, docs, "id", "text",
      DedupConfig(substringMinLen = 12), collectMetrics = false)
    val on = onAssign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(on(2L) == on(1L))
    assert(on(3L) != on(1L))
    assert(on(4L) != on(1L))
  }

  test("suffix-array host verification agrees with a naive instr computation") {
    import org.apache.spark.sql.functions.{col, xxhash64}
    // hosts > 64 chars with >= 4 probes each trigger the suffix-array
    // branch of the per-host verifier; shorter/lighter groups take the
    // direct-scan branch — both must equal the naive per-pair answer
    val hostA = "the quick brown fox jumps over the lazy dog while " +
      "the band plays a slow waltz in the harbor tonight"
    val hostB = "ships and harbors and lighthouses mark the northern " +
      "coastline where fishermen mend their nets at dawn"
    val probesA = Seq("quick brown fox", "lazy dog while", "slow waltz in the",
      "harbor tonight", "band plays")
    val probesB = Seq("lighthouses mark", "northern coastline",
      "mend their nets", "fishermen")
    val decoys = Seq("completely unrelated phrase one",
      "another absent probe text")
    val docs = ((hostA +: probesA) ++ (hostB +: probesB) ++ decoys)
      .zipWithIndex.map { case (t, i) => (i.toLong + 1L, t) }.toDF("id", "text")
    val cfg2 = DedupConfig(substringMinLen = 6)
    val K = new graft.functions.Kernels(Alphabet.test)
    val base = DedupPipeline.sketchBase(
      docs.select(col("id"), col("text"))
        .withColumn("norm", K.normKey(col("text")))
        .withColumn("nh", xxhash64(col("norm")))
        .withColumn("lc", K.caseClass(col("text"))), cfg2, K)
    val got = DedupPipeline.containmentEdges(base, cfg2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive oracle over the normalized texts
    val norms = base.select("id", "norm").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val want = (for {
      (a, na) <- norms; (b, nb) <- norms
      if a != b && na.length >= 6 && na.length < nb.length && nb.contains(na)
    } yield (math.min(a, b), math.max(a, b))).toSet
    assert(want.nonEmpty && want.size >= 9, s"fixture too weak: $want")
    assert(got == want)
  }

  test("agrees with the reference-semantics matcher's cluster assignment") {
    // reference path: match every doc against the canonical lexicon with
    // the LocalVariantModel (pinned to the reference's unit tests);
    // cluster = best-match canonical
    val canon = corpus.filter(_.isCanonical)
    val model = VariantMatcher.buildModel(Alphabet.test,
      canon.map(c => (c.text, None)))
    val params = SearchParameters(
      maxAnagramDistance = DistanceThreshold.Absolute(3),
      maxEditDistance = DistanceThreshold.Absolute(3),
      maxMatches = 1, scoreThreshold = cfg.scoreThreshold,
      cutoffThreshold = 0.0)
    val canonIdByText = canon.map(c => c.text -> c.id).toMap
    val refAssign: Map[Long, Long] = corpus.map { d =>
      val rs = model.findVariants(d.text, params)
      val cluster = rs.headOption
        .map(r => canonIdByText(model.text(r.vocabId)))
        .getOrElse(d.id)
      d.id -> cluster
    }.toMap

    val (assignDf, _) = result
    val ourAssign = assignDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refPairs = predictedPairs(refAssign)
    val ourPairs = predictedPairs(ourAssign)
    val recall = if (refPairs.isEmpty) 1.0
      else (refPairs & ourPairs).size.toDouble / refPairs.size
    info(s"reference-pair recall=$recall (${refPairs.size} ref pairs)")
    assert(recall >= 0.99, s"recall vs reference assignment $recall < 0.99")
  }
}
