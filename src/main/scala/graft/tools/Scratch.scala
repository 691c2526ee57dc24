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
