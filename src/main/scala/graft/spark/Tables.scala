package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-provided testdata layout
  * (TESTDATA.md): one parquet per table under the sf dir. In production
  * these reads are `spark.read.format("iceberg").load(table)` /
  * `spark.table(...)` — parquet-by-path is the sandbox stand-in; all
  * downstream code sees only DataFrames.
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    read(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    read(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    read(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame =
    read(spark, sfDir, "customer")
  def events(spark: SparkSession, sfDir: String): DataFrame =
    read(spark, sfDir, "events")
}

/** Session factory with the scale-oriented defaults used everywhere:
  * AQE on (runtime re-planning + skew-join splitting), shuffle
  * partitions sized to cores in local mode (the 100TB deployment sets
  * this to ~2-3x total cores via spark-submit conf instead).
  */
object Sessions {
  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", GraftExtensions.name)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
