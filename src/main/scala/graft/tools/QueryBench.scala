package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query timing probe: runs named SparkEntry queries end-to-end
  * (noop sink) twice each — first-run (codegen/JIT included) vs repeat —
  * so a slow query can be attributed to plan cost vs compile cost.
  *
  * Usage: runMain graft.tools.QueryBench <sfDir> [queryName...]
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", graft.spark.GraftExtensions.name)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; fn <- graft.SparkEntry.queries.get(name)) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s first=${times(0)}%8.2fs repeat=${times(1)}%8.2fs")
    }
    spark.stop()
  }
}
