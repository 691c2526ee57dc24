package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{FastHash, Kernels}
import graft.kernel.Alphabet
import graft.operators.{DedupConfig, DedupPipeline}
import graft.sources.ClipGen

/** Throwaway measurement probe for optimization experiments (not part of
  * any declared surface; numbers quoted in OPTIMIZATION_r06.md).
  *
  * Current experiment: candidate-key generation — 3-branch union (one
  * scan of base per key family) vs a single fused explode over the
  * concatenated key arrays (one scan total). Both passes over the keyed
  * rows (hot-key count-agg, bucket-pairs) are timed per form, alternating
  * A/B within one JVM so host-window noise hits both arms equally.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "1200000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", graft.spark.GraftExtensions.name)
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = DedupConfig()
    val K = new Kernels(Alphabet.test)
    val clips = ClipGen.transcriptTable(spark, 42L, n)
      .select(xxhash64(col("clip_id")).as("id"), col("transcript"))
    val rows = graft.spark.Checkpoints.cut(
      clips.select(col("id"), col("transcript").as("text"))
        .withColumn("norm", K.normKey(col("text")))
        .withColumn("nh", xxhash64(col("norm")))
        .withColumn("lc", K.caseClass(col("text")))
        .drop("text"))
    val base = graft.spark.Checkpoints.cut(
      DedupPipeline.sketchBase(rows.df, cfg, K))
    System.err.println(s"[scratch] base rows=${base.df.count()}")

    val chunkBits = 64 / cfg.simhashBands
    def simKeys = array((0 until cfg.simhashBands).map { b =>
      xxhash64(lit(b), shiftright(col("sim"), b * chunkBits)
        .bitwiseAND(lit((1L << chunkBits) - 1)))
    }: _*)
    // A: current 3-branch union
    def keyedUnion: DataFrame =
      base.df.select(col("id"), col("len"), explode(col("bands")).as("k"))
        .union(base.df.select(col("id"), col("len"), explode(simKeys).as("k")))
        .union(base.df.select(col("id"), col("len"), col("anakey").as("k")))
    // B: single fused explode
    def keyedFused: DataFrame =
      base.df.select(col("id"), col("len"),
        explode(concat(col("bands"), simKeys, array(col("anakey")))).as("k"))

    def pairsCount(keyed: DataFrame): Long = {
      val hot = keyed.groupBy("k").agg(count(lit(1)).as("n"))
        .filter(col("n").between(2, cfg.bucketCap))
        .select(col("k"))
      keyed.join(broadcast(hot), Seq("k"))
        .groupBy("k")
        .agg(sort_array(collect_list(struct(col("id"), col("len")))).as("ms"))
        .select(explode(col("ms")).as("a"), col("ms"))
        .select(col("a"), explode(col("ms")).as("b"))
        .filter(col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= cfg.maxEditDistance)
        .select(col("a.id").as("a"), col("b.id").as("b"))
        .distinct().count()
    }

    val exps = sys.env.getOrElse("SPARK_GRAFT_EXP", "12")
    if (exps.contains('1'))
      for (rep <- 1 to reps; (name, keyed) <- Seq(
          "union" -> (() => keyedUnion), "fused" -> (() => keyedFused))) {
        val t0 = System.nanoTime()
        val c = pairsCount(keyed())
        System.err.println(
          f"[scratch] rep$rep $name%-6s ${(System.nanoTime() - t0) / 1e9}%6.2fs pairs=$c")
      }
    // ---- experiment 2: share one nh exchange between the exact-dup
    // window and the sketch groupBy (guide §2.4) by hash-partitioning
    // the row universe BEFORE the checkpoint (LogicalRDD preserves
    // outputPartitioning). Timed per arm: rows cut + exact-edge count +
    // sketch-base cut + count.
    def rowsPlan = clips.select(col("id"), col("transcript").as("text"))
      .withColumn("norm", K.normKey(col("text")))
      .withColumn("nh", xxhash64(col("norm")))
      .withColumn("lc", K.caseClass(col("text")))
      .drop("text")
    // ---- experiment 3: candidate distinct keyed by a ONLY, so the
    // dedup exchange and the verify join-on-a exchange collapse into
    // one (hashpartitioning(a) satisfies both the (a,b) clustering and
    // the join distribution). Trade probed: partial aggregation before
    // the (a,b) exchange dedups only same-partition copies, and a
    // pair's copies from different band keys live in different bucket
    // partitions — so how much does the full raw stream cost by a?
    if (exps.contains('3')) {
      val raw = keyedFused // reuse the shipped key shape
      def allPairs = {
        val keyed = raw
        val hot = keyed.groupBy("k").agg(count(lit(1)).as("n"))
          .filter(col("n").between(2, cfg.bucketCap))
          .select(col("k"))
        keyed.join(broadcast(hot), Seq("k"))
          .groupBy("k")
          .agg(sort_array(collect_list(struct(col("id"), col("len")))).as("ms"))
          .select(explode(col("ms")).as("a"), col("ms"))
          .select(col("a"), explode(col("ms")).as("b"))
          .filter(col("a.id") < col("b.id") &&
            abs(col("a.len") - col("b.len")) <= cfg.maxEditDistance)
          .select(col("a.id").as("a"), col("b.id").as("b"))
      }
      System.err.println(s"[scratch] raw pair rows=${allPairs.count()}")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        def exchanges(df: DataFrame): Int =
          df.queryExecution.executedPlan.toString
            .linesIterator.count(_.contains("Exchange"))
        System.err.println("[scratch] verify exchanges: ab=" +
          exchanges(DedupPipeline.verifyPairs(allPairs.distinct(), base.df, cfg, K)) +
          " a=" + exchanges(DedupPipeline.verifyPairs(
            allPairs.repartition(col("a")).dropDuplicates("a", "b"),
            base.df, cfg, K)))
        DedupPipeline.verifyPairs(
            allPairs.repartition(col("a")).dropDuplicates("a", "b"),
            base.df, cfg, K)
          .queryExecution.executedPlan.toString.linesIterator
          .filter(_.contains("ShuffledHashJoin"))
          .foreach(l => System.err.println(
            "[scratch] join: " + l.trim.take(100)))
      }
      for (rep <- 1 to reps; (name, cand) <- Seq(
          "distinct-ab" -> (() => allPairs.distinct()),
          "distinct-a " -> (() =>
            allPairs.repartition(col("a")).dropDuplicates("a", "b")))) {
        val t0 = System.nanoTime()
        val v = DedupPipeline.verifyPairs(cand(), base.df, cfg, K).count()
        System.err.println(
          f"[scratch] rep$rep verify-$name ${(System.nanoTime() - t0) / 1e9}%6.2fs edges=$v")
      }
    }
    rows.release(); base.release()

    // ---- experiment 4: sketch the distinct norms WITHOUT shuffling the
    // norm payload for duplicate rows (guide §2.3 "shuffle fewer bytes",
    // §3.2/§8 Bloom-prefilter shape). Today sketchBase shuffles one
    // (id, norm, lc) struct per (map partition, nh) — with dups spread
    // across partitions, nearly the full 3M norms (~580 MB). Arm B:
    // tiny winners agg (id, lc by nh), Bloom over winner ids, map-side
    // prefilter of rows, then a SHUFFLE_HASH join by id that shuffles
    // only the ~1.2M WINNER norms (~240 MB). Extra cost: one count job,
    // one bloom job, one extra pass over the row checkpoint.
    if (exps.contains('4')) {
      def sketchA(r: DataFrame) = DedupPipeline.sketchBase(r, cfg, K)
      def sketchB(r: DataFrame) = {
        val winners = r.groupBy("nh")
          .agg(min(struct(col("id"), col("lc"))).as("w"))
          .select(col("w.id").as("id"), col("w.lc").as("lc"))
          .persist()
        val k = winners.count()
        val bf = winners.stat.bloomFilter(xxhash64(col("id")), k, 0.01)
        val bfB = spark.sparkContext.broadcast(bf)
        val might = udf((h: Long) => bfB.value.mightContainLong(h))
        val normSrc = r.select(col("id"), col("norm"))
          .filter(might(xxhash64(col("id"))))
        val joined = winners.hint("SHUFFLE_HASH").join(normSrc, Seq("id"))
          .withColumn("sk", FastHash.sketchFull(col("norm"), cfg.shingleN,
            cfg.minhashK, cfg.bands, cfg.rowsPerBand))
          .select(col("id"), col("norm"), col("lc"),
            length(col("norm")).as("len"),
            col("sk._1").as("sim"), col("sk._2").as("bands"),
            col("sk._3").as("anakey"))
        (joined, winners)
      }
      for (rep <- 1 to reps) {
        val r1 = graft.spark.Checkpoints.cut(rowsPlan)
        var t0 = System.nanoTime()
        val bA = graft.spark.Checkpoints.cut(sketchA(r1.df))
        val nA = bA.df.count()
        val tA = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val (planB, winners) = sketchB(r1.df)
        val bB = graft.spark.Checkpoints.cut(planB)
        val nB = bB.df.count()
        val tB = (System.nanoTime() - t0) / 1e9
        winners.unpersist()
        // row identity: same (id, sim, anakey) multiset either way
        val hA = bA.df.select(xxhash64(col("id"), col("sim"), col("anakey"))
          .as("h")).agg(expr("bit_xor(h)")).first().getLong(0)
        val hB = bB.df.select(xxhash64(col("id"), col("sim"), col("anakey"))
          .as("h")).agg(expr("bit_xor(h)")).first().getLong(0)
        System.err.println(
          f"[scratch] rep$rep sketch-agg   $tA%6.2fs base=$nA hash=$hA")
        System.err.println(
          f"[scratch] rep$rep sketch-bloom $tB%6.2fs base=$nB hash=$hB" +
            (if (hA != hB || nA != nB) "  MISMATCH" else ""))
        bA.release(); bB.release(); r1.release()
      }
    }

    // ---- experiment 6: change-16 A/B — the pre-change verify fetch
    // (texts built on BOTH joins, session partitioning) vs the shipped
    // shape (pair side built on join 1, memory-derived partition count).
    // Same candidates input; edges must be bit-identical.
    if (exps.contains('6')) {
      val r6 = graft.spark.Checkpoints.cut(rowsPlan)
      val b6 = graft.spark.Checkpoints.cut(
        DedupPipeline.sketchBase(r6.df, cfg, K))
      val cfgK = (cfg, K)
      def candidatesOf(p: Int) = DedupPipeline.candidatePairs(b6.df, cfg)
        .repartition(p, col("a")).dropDuplicates("a", "b")
      def verifyOld(cand: DataFrame) = {
        val texts = b6.df.select(col("id"), col("norm"), col("lc"))
          .hint("SHUFFLE_HASH")
        cand
          .join(texts.select(col("id").as("a"), col("norm").as("na"),
            col("lc").as("lca")), Seq("a"))
          .join(texts.select(col("id").as("b"), col("norm").as("nb"),
            col("lc").as("lcb")), Seq("b"))
          .filter(K.pairAcceptPreIn(spark)(
            col("na"), col("nb"), col("lca"), col("lcb"),
            cfg.maxEditDistance, cfg.scoreThreshold, cfg.weights))
          .select(col("a").as("src"), col("b").as("dst"))
      }
      val dp = spark.sparkContext.defaultParallelism
      val nR = r6.df.count()
      val p16 = (dp * math.max(1L,
        (nR + DedupPipeline.verifyBuildRows * dp - 1) /
          (DedupPipeline.verifyBuildRows * dp))).toInt
      System.err.println(s"[scratch] exp6 dp=$dp p16=$p16")
      for (rep <- 1 to reps) {
        var t0 = System.nanoTime()
        val eOld = verifyOld(candidatesOf(dp)).count()
        val tOld = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val eNew = DedupPipeline.verifyPairs(candidatesOf(p16), b6.df,
          cfgK._1, cfgK._2, numParts = Some(p16)).count()
        val tNew = (System.nanoTime() - t0) / 1e9
        System.err.println(
          f"[scratch] rep$rep verify-pre16  $tOld%6.2fs edges=$eOld")
        System.err.println(
          f"[scratch] rep$rep verify-c16   $tNew%6.2fs edges=$eNew" +
            (if (eOld != eNew) "  MISMATCH" else ""))
      }
      r6.release(); b6.release()
    }

    // ---- experiment 5: NARROW sketched base (guide §2.3 "project before
    // the exchange", §5 memory). base carries (id, norm, lc, len, sim,
    // bands[42], anakey) ~560B/row; the candidate passes consume ONLY
    // (id, len, sim, bands, anakey) and read the checkpoint blocks
    // TWICE, while verify consumes ONLY (id, norm, lc) — available from
    // the rows checkpoint that is still alive. Arm B checkpoints the
    // base WITHOUT norm/lc (~40% narrower write, narrower double read)
    // and verifies against rows. Timed: base cut + both candidate
    // passes + a-keyed dedup + verify -> edge count (the full segment
    // both arms share).
    if (exps.contains('5')) {
      def segment(narrow: Boolean): (Double, Long, Long) = {
        val r1 = graft.spark.Checkpoints.cut(rowsPlan)
        val t0 = System.nanoTime()
        val basePlan =
          if (narrow) DedupPipeline.sketchBase(r1.df, cfg, K)
            .drop("norm", "lc")
          else DedupPipeline.sketchBase(r1.df, cfg, K)
        val b = graft.spark.Checkpoints.cut(basePlan)
        val texts = if (narrow) r1.df else b.df
        val cand = DedupPipeline.candidatePairs(b.df, cfg)
          .repartition(col("a")).dropDuplicates("a", "b")
        val edges = DedupPipeline.verifyPairs(cand, texts, cfg, K)
        val eCnt = edges.count()
        val t = (System.nanoTime() - t0) / 1e9
        val h = edges.select(xxhash64(col("src"), col("dst")).as("h"))
          .agg(expr("bit_xor(h)")).first().getLong(0)
        b.release(); r1.release()
        (t, eCnt, h)
      }
      for (rep <- 1 to reps) {
        val (tA, eA, hA) = segment(narrow = false)
        System.err.println(
          f"[scratch] rep$rep seg-wide   $tA%6.2fs edges=$eA hash=$hA")
        val (tB, eB, hB) = segment(narrow = true)
        System.err.println(
          f"[scratch] rep$rep seg-narrow $tB%6.2fs edges=$eB hash=$hB" +
            (if (eA != eB || hA != hB) "  MISMATCH" else ""))
      }
    }

    if (exps.contains('2'))
    for (rep <- 1 to reps; (name, plan) <- Seq(
        "plain " -> (() => rowsPlan),
        "parted" -> (() => rowsPlan.repartition(cpus, col("nh"))))) {
      val t0 = System.nanoTime()
      val r = graft.spark.Checkpoints.cut(plan())
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        def exchanges(df: DataFrame): Int =
          df.queryExecution.executedPlan.toString
            .linesIterator.count(_.contains("Exchange"))
        System.err.println(s"[scratch] $name exchanges: " +
          s"window=${exchanges(DedupPipeline.exactStarEdges(r.df))} " +
          s"sketch=${exchanges(DedupPipeline.sketchBase(r.df, cfg, K))}")
      }
      val e = DedupPipeline.exactStarEdges(r.df).count()
      val b = graft.spark.Checkpoints.cut(
        DedupPipeline.sketchBase(r.df, cfg, K))
      val nb = b.df.count()
      System.err.println(
        f"[scratch] rep$rep sketch-$name ${(System.nanoTime() - t0) / 1e9}%6.2fs " +
          s"edges=$e base=$nb")
      r.release(); b.release()
    }
    spark.stop()
  }
}
