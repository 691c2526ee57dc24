package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{ClipDedup, DedupConfig}
import graft.sources.ClipGen
import graft.spark.Sessions

/** End-to-end clip-dedup driver — the spark-submit entry point of the
  * pipeline (sandbox form; the cluster deployment passes an Iceberg table
  * instead of the synthetic generator).
  *
  * Usage: runMain graft.tools.DedupCli <nClusters> <workDir> [cpus]
  *        [substringMinLen]  (0 = containment pass off, default)
  *
  * Synthesizes the deterministic clip table (schema = BASELINE.json
  * input_hint), runs the resumable checkpointed pipeline, prints stage
  * timings, clips/sec, cluster metrics, ground-truth pair recall and the
  * audio SNR invariant result. Re-running with the same workDir resumes
  * from completed stages.
  */
object DedupCli {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: DedupCli <nClusters> <workDir> [cpus]")
      sys.exit(2)
    }
    val nClusters = args(0).toInt
    val workDir = args(1)
    val cpus = if (args.length > 2) args(2).toInt
      else sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus, "graft-dedup")

    val t0 = System.nanoTime()
    val clipsAll = ClipGen.table(spark, seed = 42L, nClusters = nClusters)
      .cache()
    val clips = clipsAll.select("clip_id", "bytes", "sr_hz", "dur_ms",
      "codec", "transcript") // exact input_hint shape
    val nClips = clips.count()

    val subMinLen = if (args.length > 3) args(3).toInt else 0
    val (assignments, stages) =
      ClipDedup.run(spark, clips, workDir,
        DedupConfig(substringMinLen = subMinLen))
    val wall = (System.nanoTime() - t0) / 1e9

    stages.foreach { s =>
      println(f"[stage] ${s.name}%-12s ${s.seconds}%8.2fs rows=${s.rows}%-9d resumed=${s.resumed}")
    }
    val nOut = assignments.select("cluster_id").distinct().count()
    println(f"[dedup] clips=$nClips clusters=$nOut wall=$wall%.2fs " +
      f"throughput=${nClips / wall}%.1f clips/sec")

    // ground-truth dup-pair recall (generator knows the clusters)
    val truth = clipsAll.select(col("clip_id"), col("cluster_id").as("gt"))
    val joined = assignments.join(truth, "clip_id").cache()
    def pairCount(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.groupBy(col(c)).count()
        .select((sum(col("count") * (col("count") - 1)) / 2).cast("long"))
        .head().getLong(0)
    val tpPairs = joined
      .groupBy("gt", "cluster_id").count()
      .select((sum(col("count") * (col("count") - 1)) / 2).cast("long"))
      .head().getLong(0)
    val gtPairs = pairCount(joined, "gt")
    println(f"[recall] ground-truth dup pairs=$gtPairs matched=$tpPairs " +
      f"recall=${tpPairs.toDouble / math.max(gtPairs, 1)}%.4f")

    val violations = ClipDedup
      .audioInvariantViolations(spark, clips, assignments).count()
    println(s"[invariant] SNR>=30dB violations among same-cluster clips: $violations")
    spark.stop()
  }
}
