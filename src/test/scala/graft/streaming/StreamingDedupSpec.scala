package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpecBase
import graft.operators.DedupConfig

class StreamingDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming: exact dups dropped, near dups matched against band state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val clips = mem.toDF().toDF("id", "ts", "text")
    val out = StreamingDedup.run(clips, "id", "ts", "text", DedupConfig())
    val q = out.writeStream.format("memory").queryName("neardups")
      .outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2026-01-01 10:00:00")
      // batch 1: two distinct clips admitted to state
      mem.addData((1L, t, "the quick brown fox jumps over the lazy dog"),
        (2L, t, "an entirely different transcript about ships"))
      q.processAllAvailable()
      assert(spark.table("neardups").count() == 0)

      // batch 2: a 1-edit near-dup of clip 1, an exact dup of clip 1
      // (same normalized text -> dropped by the streaming exact-dedup
      // state, never reaches the near-dup operator), and a fresh clip
      mem.addData((3L, t, "the quick brown fux jumps over the lazy dog"),
        (4L, t, "the quick brown fox jumps over the lazy dog"),
        (5L, t, "yet another unrelated text about mountains"))
      q.processAllAvailable()

      val hits = spark.table("neardups").as[StreamingDedup.NearDup]
        .collect().map(h => (h.id, h.matchId)).distinct
      assert(hits.contains((3L, 1L)), s"missing 3->1 in ${hits.toSeq}")
      assert(!hits.exists(_._1 == 4L), s"exact dup leaked: ${hits.toSeq}")
      assert(!hits.exists(_._1 == 5L))
      assert(!hits.exists(_._1 == 2L))

      // batch 3: near-dup of clip 2 -> matched against batch-1 state
      mem.addData((6L, t, "an entirely different transcript about ship"))
      q.processAllAvailable()
      val hits3 = spark.table("neardups").as[StreamingDedup.NearDup]
        .collect().map(h => (h.id, h.matchId)).distinct
      assert(hits3.contains((6L, 2L)), s"missing 6->2 in ${hits3.toSeq}")
    } finally q.stop()
  }

  test("streaming: bucket state is capped (hot-band discipline)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cfg = DedupConfig(bucketCap = 2)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val keyed = StreamingDedup
      .bandKeyed(mem.toDF().toDF("id", "ts", "text"), "id", "text", cfg,
        graft.kernel.Alphabet.test)
      .as[(Long, Long, String, Byte)]
    val out = StreamingDedup.nearDups(keyed, cfg)
    val q = out.writeStream.format("memory").queryName("capped")
      .outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2026-01-01 10:00:00")
      // 5 members of one near-dup family; cap 2 -> only the first two are
      // admitted to any bucket, so later arrivals match only those
      mem.addData((1L, t, "identical transcript payload alpha one"))
      q.processAllAvailable()
      mem.addData((2L, t, "identical transcript payload alpha two"))
      q.processAllAvailable()
      mem.addData((3L, t, "identical transcript payload alpha six"),
        (4L, t, "identical transcript payload alpha ten"))
      q.processAllAvailable()
      val hits = spark.table("capped").as[StreamingDedup.NearDup].collect()
      // every emitted match points at an admitted (capped) member
      assert(hits.nonEmpty)
      assert(hits.forall(h => h.matchId == 1L || h.matchId == 2L),
        hits.mkString(","))
    } finally q.stop()
  }
}
