package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{FastHash, Kernels}
import graft.kernel.Alphabet
import graft.operators.DedupConfig
import graft.sources.ClipGen

/** One-off diagnosis: split candidates+verify into timed sub-stages.
  * Usage: runMain graft.tools.CandVerifyProbe <cpus> <nClusters>
  */
object CandVerifyProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toInt
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
    try {
      for (rep <- 1 to 2) {
        val clips = ClipGen.transcriptTable(spark, 42L, n)
          .select(xxhash64(col("clip_id")).as("id"), col("transcript"))
        var t0 = System.nanoTime()
        def mark(s: String): Unit = {
          System.err.println(f"[probe$rep] $s ${(System.nanoTime() - t0) / 1e9}%.2fs")
          t0 = System.nanoTime()
        }
        val rows = graft.spark.Checkpoints.cut(
          clips.select(col("id"), col("transcript").as("text"))
            .withColumn("norm", K.normKey(col("text")))
            .withColumn("nh", xxhash64(col("norm"))))
        mark("rows")
        val base = graft.spark.Checkpoints.cut(rows.df
          .groupBy("nh")
          .agg(min(struct(col("id"), col("text"), col("norm"))).as("r"))
          .select(col("r.id").as("id"), col("r.text").as("text"), col("r.norm").as("norm"))
          .withColumn("sk", FastHash.sketchFull(col("norm"), cfg.shingleN,
            cfg.minhashK, cfg.bands, cfg.rowsPerBand))
          .select(col("id"), col("norm"), K.caseClass(col("text")).as("lc"),
            length(col("norm")).as("len"),
            col("sk._1").as("sim"), col("sk._2").as("bands"),
            col("sk._3").as("anakey")))
        mark("sketch")
        val chunkBits = 64 / cfg.simhashBands
        val keyedAll = base.df.select(col("id"), col("len"),
            explode(col("bands")).as("k"))
          .union(base.df.select(col("id"), col("len"),
            explode(array((0 until cfg.simhashBands).map { b =>
              xxhash64(lit(b), shiftright(col("sim"), b * chunkBits)
                .bitwiseAND(lit((1L << chunkBits) - 1)))
            }: _*)).as("k")))
          .union(base.df.select(col("id"), col("len"), col("anakey").as("k")))
        val hot = graft.spark.Checkpoints.cut(
          keyedAll.groupBy("k").agg(count(lit(1)).as("n"))
            .filter(col("n").between(2, cfg.bucketCap))
            .select(col("k")))
        mark("hotkeys-countagg")
        val pairs = keyedAll.join(broadcast(hot.df), Seq("k"))
          .groupBy("k")
          .agg(sort_array(collect_list(struct(col("id"), col("len")))).as("ms"))
          .select(explode(col("ms")).as("a"), col("ms"))
          .select(col("a"), explode(col("ms")).as("b"))
          .filter(col("a.id") < col("b.id") &&
            abs(col("a.len") - col("b.len")) <= cfg.maxEditDistance)
          .select(col("a.id").as("a"), col("b.id").as("b"))
        val candidates = graft.spark.Checkpoints.cut(pairs.distinct())
        mark("bucketpairs+distinct")
        val texts = base.df.select(col("id"), col("norm"), col("lc"))
          .hint("SHUFFLE_HASH")
        val verified = graft.spark.Checkpoints.cut(candidates.df
          .join(texts.select(col("id").as("a"), col("norm").as("na"),
            col("lc").as("lca")), Seq("a"))
          .join(texts.select(col("id").as("b"), col("norm").as("nb"),
            col("lc").as("lcb")), Seq("b"))
          .withColumn("score",
            K.pairScoreMaxPre(col("na"), col("nb"), col("lca"), col("lcb"),
              cfg.maxEditDistance, cfg.weights))
          .filter(col("score").isNotNull && col("score") >= cfg.scoreThreshold)
          .select(col("a").as("src"), col("b").as("dst")))
        mark("verify")
        // same joins, trivial scoring — isolates join/shuffle machinery
        // from the kernel cost
        val joinOnly = candidates.df
          .join(texts.select(col("id").as("a"), col("norm").as("na"),
            col("lc").as("lca")), Seq("a"))
          .join(texts.select(col("id").as("b"), col("norm").as("nb"),
            col("lc").as("lcb")), Seq("b"))
          .withColumn("score",
            (length(col("na")) + length(col("nb"))).cast("double"))
          .filter(col("score") >= 0.0)
          .select(col("a").as("src"), col("b").as("dst"))
        System.err.println(s"[probe$rep] joinOnly=${joinOnly.count()}")
        mark("verify-nokernel")
        // the production path: native codegen PairScoreMax expression
        val verifiedNative = candidates.df
          .join(texts.select(col("id").as("a"), col("norm").as("na"),
            col("lc").as("lca")), Seq("a"))
          .join(texts.select(col("id").as("b"), col("norm").as("nb"),
            col("lc").as("lcb")), Seq("b"))
          .withColumn("score",
            K.pairScoreMaxPreIn(spark)(col("na"), col("nb"), col("lca"),
              col("lcb"), cfg.maxEditDistance, cfg.weights))
          .filter(col("score").isNotNull && col("score") >= cfg.scoreThreshold)
          .select(col("a").as("src"), col("b").as("dst"))
        System.err.println(s"[probe$rep] verifiedNative=${verifiedNative.count()}")
        mark("verify-native")
        // the ACTUAL production path: pair_accept decision (native
        // codegen; skips the exact-LCS DP whenever the prefix/suffix
        // lower bound or the minLen upper bound already decides)
        val verifiedAccept = candidates.df
          .join(texts.select(col("id").as("a"), col("norm").as("na"),
            col("lc").as("lca")), Seq("a"))
          .join(texts.select(col("id").as("b"), col("norm").as("nb"),
            col("lc").as("lcb")), Seq("b"))
          .filter(K.pairAcceptPreIn(spark)(col("na"), col("nb"),
            col("lca"), col("lcb"), cfg.maxEditDistance,
            cfg.scoreThreshold, cfg.weights))
          .select(col("a").as("src"), col("b").as("dst"))
        System.err.println(s"[probe$rep] verifiedAccept=${verifiedAccept.count()}")
        mark("verify-accept")
        System.err.println(s"[probe$rep] candidates=${candidates.df.count()} verified=${verified.df.count()}")
        t0 = System.nanoTime()
        Seq(rows, base, hot, candidates, verified).foreach(_.release())
      }
    } finally spark.stop()
  }
}
