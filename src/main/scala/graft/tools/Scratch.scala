package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{FastHash, Kernels}
import graft.kernel.Alphabet
import graft.operators.{DedupConfig, DedupPipeline}
import graft.sources.ClipGen

/** Throwaway measurement probe for optimization experiments (not part of
  * any declared surface; numbers quoted in OPTIMIZATION_r06.md).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "1200000").toInt
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
      .select(xxhash64(col("clip_id")).as("id"), col("transcript")).cache()
    clips.count()
    var t0 = System.nanoTime()
    def mark(s: String): Unit = {
      System.err.println(f"[scratch] $s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
    }
    for (rep <- 1 to 2) {
      val rows = graft.spark.Checkpoints.cut(
        clips.select(col("id"), col("transcript").as("text"))
          .withColumn("norm", K.normKey(col("text")))
          .withColumn("nh", xxhash64(col("norm")))
          .withColumn("lc", K.caseClass(col("text")))
          .drop("text"))
      mark(s"rep$rep rows-cut")
      val base = graft.spark.Checkpoints.cut(
        DedupPipeline.sketchBase(rows.df, cfg, K))
      mark(s"rep$rep base-cut")
      // A: current pipeline shape — window-min star edges
      val winEdges = graft.spark.Checkpoints.cut(
        DedupPipeline.exactStarEdges(rows.df))
      mark(s"rep$rep exact-window-cut")
      System.err.println(s"[scratch] exact edges=${winEdges.df.count()}")
      mark(s"rep$rep exact-count")
      // B: join-on-root alternative (base.id = min id per nh group)
      val joinEdges = graft.spark.Checkpoints.cut(
        rows.df.select(col("id"), col("nh"))
          .join(base.df.select(xxhash64(col("norm")).as("nh"),
            col("id").as("root")).hint("SHUFFLE_HASH"), Seq("nh"))
          .filter(col("id") =!= col("root"))
          .select(col("root").as("src"), col("id").as("dst")))
      mark(s"rep$rep exact-join-cut")
      System.err.println(s"[scratch] join edges=${joinEdges.df.count()}")
      mark(s"rep$rep join-count")
      // C: the finalize shape comparison — rows->root map join
      val asgn = graft.spark.Checkpoints.cut(
        rows.df.select(col("id"), col("nh"))
          .join(base.df.select(xxhash64(col("norm")).as("nh"),
            col("id").as("root")).hint("SHUFFLE_HASH"), Seq("nh"))
          .select(col("id"), col("root")))
      mark(s"rep$rep rows-root-join-cut")
      Seq(rows, base, winEdges, joinEdges, asgn).foreach(_.release())
    }
    spark.stop()
  }
}
