package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.ClipGen

/** 128-bit id keying (the 10^12-row contract, ClipDedup `wideIds`):
  * the same pipeline over 16-byte binary keys must produce the same
  * clustering of clip_ids as the 64-bit long keys, through every stage
  * including both CC physical strategies.
  */
class WideIdsSpec extends SparkSpecBase {

  private def clusterSets(df: org.apache.spark.sql.DataFrame): Set[Set[String]] = {
    import spark.implicits._
    df.groupBy(col("cluster_id"))
      .agg(collect_list(col("clip_id")).as("members"))
      .select(col("members"))
      .as[Seq[String]].collect().map(_.toSet).toSet
  }

  test("wide (binary) ids produce the identical clustering to long ids") {
    val clips = ClipGen.transcriptTable(spark, seed = 7L, nClusters = 120)
    val dir = java.nio.file.Files.createTempDirectory("wideids").toString
    val (longAsgn, _) = ClipDedup.run(spark, clips, s"$dir/long")
    val (wideAsgn, _) = ClipDedup.run(spark, clips, s"$dir/wide",
      wideIds = true)
    assert(wideAsgn.schema("cluster_id").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(clusterSets(longAsgn) == clusterSets(wideAsgn))
  }

  test("binary-keyed CC: local union-find == distributed star loop") {
    import spark.implicits._
    // chains, a triangle, self-loops, isolated pair — keyed by md5 binaries
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "f"),
      ("g", "g"), ("h", "i"))
      .toDF("s", "d")
      .select(unhex(md5(col("s"))).as("src"), unhex(md5(col("d"))).as("dst"))
    def comps(maxLocal: Long): Set[Set[String]] = {
      val cut = ConnectedComponents.runCut(spark, edges,
        localKernelMaxEdges = maxLocal)
      val r = cut.df.groupBy(col("component"))
        .agg(collect_list(hex(col("node"))).as("ms"))
        .select(col("ms")).as[Seq[String]].collect().map(_.toSet).toSet
      cut.release()
      r
    }
    val local = comps(maxLocal = 1000000L)
    val looped = comps(maxLocal = 0L)
    assert(local == looped)
    // {a,b,c}, {d,e,f}, {h,i}, {g} (self-loop node survives as a singleton)
    assert(local.size == 4)
  }
}
