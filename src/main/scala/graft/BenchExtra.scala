package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): replicates the
  * FROZEN Bench part-5 sweep methodology exactly — same session conf,
  * same warmup list, noop sink, min over reps — without touching
  * Bench.scala. Extra abilities for the optimization loop:
  *  - time a SUBSET of queries (args after the first are query names);
  *  - dump explain("formatted") per query (SPARK_GRAFT_EXPLAIN_DIR);
  *  - configurable rep count (SPARK_GRAFT_EXTRA_REPS, default 3).
  *
  * Usage: runMain graft.BenchExtra [time|explain] [queryName...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("time")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", graft.spark.GraftExtensions.name)
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (mode == "explain") {
      val dir = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_DIR", "plans/r06")
      new java.io.File(dir).mkdirs()
      val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "before")
      for (name <- names; fn <- SparkEntry.queries.get(name)) {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$dir/${name}_$suffix.txt")
        try w.println(plan) finally w.close()
        System.err.println(s"[explain] $name -> $dir/${name}_$suffix.txt")
      }
      spark.stop()
      return
    }

    // identical warmup to Bench part 5: compile the shared codegen/JIT
    // paths untimed so the timed mins measure plans, not first touch
    // (skippable for cold-vs-warm attribution experiments)
    for (w <- (if (sys.env.contains("SPARK_GRAFT_EXTRA_NOWARM")) Seq()
        else Seq("p01_normalize", "q1_agg", "text_fingerprint",
          "p05_levenshtein_pairs", "dedup_jaccard", "variant_matcher"));
        fn <- SparkEntry.queries.get(w))
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }

    def timeQuery(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case t: Throwable =>
        System.err.println(s"[bench-extra] query failed: $t") }
      (System.nanoTime() - t0) / 1e9
    }
    val results = names.flatMap(n =>
      SparkEntry.queries.get(n).map { fn =>
        spark.sparkContext.setJobDescription(s"bench-extra: $n")
        val times = (1 to reps).map(_ => timeQuery(fn))
        System.err.println(f"[bench-extra] $n%-24s min=${times.min}%7.3f " +
          s"reps=${times.map(t => f"$t%.3f").mkString(",")}")
        n -> times
      })
    val total = results.map(_._2.min).sum
    println(
      f"""{"metric":"queries_total","value":$total%.3f,"unit":"sec","queries":{""" +
        results.map { case (n, t) => "\"" + n + f"\":${t.min}%.3f" }
          .mkString(",") +
        s"""},"sf":"$sfDir"}""")
    spark.stop()
  }
}
