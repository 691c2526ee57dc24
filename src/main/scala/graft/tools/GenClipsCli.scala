package graft.tools

import graft.sources.ClipGen
import graft.spark.Sessions

/** Writes the deterministic synthetic clip table (input_hint schema) to
  * parquet — fixture generation for the spark-submit path and external
  * tooling.
  *
  * Usage: runMain graft.tools.GenClipsCli <nClusters> <outPath> [seed] [cpus]
  */
object GenClipsCli {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: GenClipsCli <nClusters> <outPath> [seed] [cpus]")
      sys.exit(2)
    }
    val n = args(0).toInt
    val out = args(1)
    val seed = if (args.length > 2) args(2).toLong else 42L
    val cpus = if (args.length > 3) args(3).toInt
      else sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus, "graft-gen-clips")
    ClipGen.table(spark, seed = seed, nClusters = n)
      .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
      .write.mode("overwrite").parquet(out)
    println(s"[gen] wrote ${spark.read.parquet(out).count()} clips to $out")
    spark.stop()
  }
}
