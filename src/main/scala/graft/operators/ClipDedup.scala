package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.audio.Wav
import graft.functions.{FastHash, Kernels}
import graft.kernel.Alphabet

/** Resumable, checkpointed clip-dedup job over the input_hint table
  * (clip_id, bytes, sr_hz, dur_ms, codec, transcript).
  *
  * Each stage writes its output to `<workDir>/<stage>` (parquet with
  * _SUCCESS markers — the sandbox stand-in for Iceberg snapshot commits;
  * in production each stage is an Iceberg table and resume reads the last
  * committed snapshot). Resume = rerun the job with the same workDir:
  * completed stages are read back, not recomputed. A per-stage,
  * per-partition lineage row (stage, partition, rows) plus stage wall
  * times land in `<workDir>/metrics`.
  *
  * Node ids: clip_id strings are keyed by xxhash64 for the CC stage
  * (64-bit birthday bound is fine to ~10^9 rows; the 10^12 deployment
  * swaps in the 128-bit hash pair — same plan shape, two key columns).
  */
object ClipDedup {

  final case class StageResult(name: String, seconds: Double, rows: Long,
      resumed: Boolean)

  final class Runner(spark: SparkSession, workDir: String) {
    private val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val stageLog = scala.collection.mutable.ArrayBuffer.empty[StageResult]

    private def path(name: String) = s"$workDir/$name"
    private def done(name: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(s"${path(name)}/_SUCCESS"))

    /** Run-or-resume one stage; always returns the materialized output.
      * A resumed stage is only trusted when its stored schema matches the
      * current plan's columns — a workDir written by an older code/config
      * version is recomputed instead of silently mixing stage semantics.
      */
    def stage(name: String)(f: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      lazy val plan = f // analyzed once; also the recompute source
      var resumed = done(name)
      if (resumed &&
          spark.read.parquet(path(name)).columns.toSeq != plan.columns.toSeq) {
        System.err.println(s"[clipdedup] stage $name: stored schema differs " +
          "from current plan (older code/config version) — recomputing")
        resumed = false
      }
      if (!resumed) plan.write.mode("overwrite").parquet(path(name))
      val out = spark.read.parquet(path(name))
      val rows = out.count()
      stageLog += StageResult(name, (System.nanoTime() - t0) / 1e9, rows, resumed)
      // per-partition lineage row (partition id -> row count) per stage
      out.groupBy(spark_partition_id().as("partition"))
        .agg(count(lit(1)).as("rows"))
        .withColumn("stage", lit(name))
        .write.mode("append").parquet(s"$workDir/metrics")
      out
    }
  }

  /** Full job. Returns (assignments(clip_id, cluster_id), stage log). */
  def run(
      spark: SparkSession,
      clips: DataFrame,
      workDir: String,
      cfg: DedupConfig = DedupConfig(),
      alphabet: Alphabet = Alphabet.test
  ): (DataFrame, Seq[StageResult]) = {
    val K = new Kernels(alphabet)
    val r = new Runner(spark, workDir)

    // ---- stage 1: sketches (narrow map over the input) ----
    val sketches = r.stage("sketches") {
      clips.select(col("clip_id"), col("transcript"))
        .withColumn("id", xxhash64(col("clip_id")))
        .withColumn("norm", K.normKey(col("transcript")))
        .withColumn("sk", FastHash.sketchFull(col("norm"), cfg.shingleN,
          cfg.minhashK, cfg.bands, cfg.rowsPerBand))
        .select(col("clip_id"), col("id"), col("norm"),
          K.caseClass(col("transcript")).as("lc"),
          length(col("norm")).as("len"),
          col("sk._2").as("sim"), col("sk._3").as("bands"),
          col("sk._4").as("anakey"))
    }

    // ---- stage 2: candidate pairs (LSH + simhash + anagram + exact) ----
    val candidates = r.stage("candidates") {
      // hot keys via a codegen'd count agg, broadcast back as a map-side
      // filter; collect_list touches only non-singleton (2..cap) buckets;
      // pairs length-prefiltered (|lenA-lenB| <= maxEditDistance is
      // necessary for the DL verify to pass) — see DedupPipeline.pairsFrom
      def pairsFrom(keyed: DataFrame): DataFrame = {
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

      val lsh = pairsFrom(sketches.select(col("id"), col("len"),
        explode(col("bands")).as("k")))

      val chunkBits = 64 / cfg.simhashBands
      val sim = pairsFrom(sketches.select(col("id"), col("len"),
        explode(array((0 until cfg.simhashBands).map { b =>
          xxhash64(lit(b), shiftright(col("sim"), b * chunkBits)
            .bitwiseAND(lit((1L << chunkBits) - 1)).cast("string"))
        }: _*)).as("k")))

      val ana = pairsFrom(sketches.select(col("id"), col("len"),
        col("anakey").as("k")))

      lsh.union(sim).union(ana).distinct()
    }

    // ---- stage 3: verified edges (kernel score on candidates + exact) ----
    val edges = r.stage("edges") {
      val texts = sketches.select(col("id"), col("norm"), col("lc"))
        .hint("SHUFFLE_HASH")
      val verified = candidates
        .join(texts.select(col("id").as("a"), col("norm").as("na"),
          col("lc").as("lca")), Seq("a"))
        .join(texts.select(col("id").as("b"), col("norm").as("nb"),
          col("lc").as("lcb")), Seq("b"))
        .withColumn("score",
          K.pairScoreMaxPre(col("na"), col("nb"), col("lca"), col("lcb"),
            cfg.maxEditDistance, cfg.weights))
        .filter(col("score").isNotNull && col("score") >= cfg.scoreThreshold)
        .select(col("a").as("src"), col("b").as("dst"))
      val wh = org.apache.spark.sql.expressions.Window.partitionBy("h")
      val exact = sketches
        .select(col("id"), xxhash64(col("norm")).as("h"))
        .withColumn("root", min("id").over(wh))
        .filter(col("id") =!= col("root"))
        .select(col("root").as("src"), col("id").as("dst"))
      verified.union(exact).distinct()
    }

    // ---- stage 4: clusters ----
    val clusters = r.stage("clusters") {
      val cc = ConnectedComponents.run(spark, edges)
      sketches.select(col("clip_id"), col("id"))
        .join(cc.withColumnRenamed("node", "id"), Seq("id"), "left")
        .select(col("clip_id"),
          coalesce(col("component"), col("id")).as("cluster_id"))
    }

    (clusters, r.stageLog.toSeq)
  }

  /** Per-row audio invariant (input_hint): decoded PCM of a clip claimed
    * duplicate must be allclose to its cluster canonical — SNR >= 30 dB.
    * Distributed check over exact-duplicate groups; returns violations.
    */
  def audioInvariantViolations(
      spark: SparkSession,
      clips: DataFrame,
      assignments: DataFrame,
      sampleFraction: Double = 1.0
  ): DataFrame = {
    val snrOk = udf { (refBytes: Array[Byte], testBytes: Array[Byte]) =>
      val (ref, srA) = Wav.decode(refBytes)
      val (test, srB) = Wav.decode(testBytes)
      srA == srB && ref.length == test.length && Wav.snrDb(ref, test) >= 30.0
    }
    val withCluster = clips.join(assignments, Seq("clip_id"))
    val sampled = if (sampleFraction >= 1.0) withCluster
      else withCluster.sample(withReplacement = false, sampleFraction, 42L)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
      .orderBy("clip_id")
    val canon = withCluster
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("cluster_id"), col("bytes").as("canon_bytes"),
        col("sr_hz").as("canon_sr"), col("dur_ms").as("canon_dur"))
    sampled.join(canon, Seq("cluster_id"))
      .filter(col("sr_hz") === col("canon_sr") && col("dur_ms") === col("canon_dur"))
      .filter(!snrOk(col("canon_bytes"), col("bytes")))
      .select(col("clip_id"), col("cluster_id"))
  }
}
