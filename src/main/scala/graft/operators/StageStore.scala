package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage seam for checkpointed stage outputs (the explicit swap point
  * the north rule's Iceberg requirement lands on): the production
  * implementation backs each stage with an Iceberg table — `write` is a
  * snapshot commit, `exists`/`read` resolve the last committed snapshot,
  * and executor loss mid-stage costs only that stage because committed
  * snapshots are durable cluster-wide. This sandbox has no Iceberg jars
  * (`/opt/spark/jars` checked), so [[ParquetStageStore]] stands in with
  * parquet + `_SUCCESS` markers — the same commit-visibility contract
  * (output is only `exists` after a complete atomic write), so swapping
  * implementations changes no pipeline code.
  */
trait StageStore {
  /** True iff `name` holds a complete committed write. */
  def exists(name: String): Boolean
  def read(name: String): DataFrame
  /** Atomic commit: `exists(name)` must not turn true on partial output. */
  def write(name: String, df: DataFrame): Unit
  /** Append rows to the job's metrics/lineage table. */
  def appendMetrics(df: DataFrame): Unit
}

/** Parquet + `_SUCCESS` implementation (sandbox stand-in for Iceberg;
  * Spark's parquet committer writes `_SUCCESS` only after all task
  * commits succeed, giving the same all-or-nothing visibility).
  */
final class ParquetStageStore(spark: SparkSession, workDir: String)
    extends StageStore {
  private val fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)
  private def path(name: String) = s"$workDir/$name"

  def exists(name: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(s"${path(name)}/_SUCCESS"))
  def read(name: String): DataFrame = spark.read.parquet(path(name))
  def write(name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(path(name))
  def appendMetrics(df: DataFrame): Unit =
    df.write.mode("append").parquet(s"$workDir/metrics")
  def readMetrics(): DataFrame = spark.read.parquet(s"$workDir/metrics")
}
