package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scalable global-rank minting.
  *
  * `Window.orderBy(key)` with no partition moves the whole table through a
  * single partition (Spark's own WindowExec warning) — a driver-era
  * bottleneck at 100-TB scale. The scalable shape is the classic two-phase
  * rank:
  *
  *   1. range-partition by the key (each partition holds a contiguous key
  *      range, sorted between partitions by construction);
  *   2. rank locally within each partition (parallel);
  *   3. collect the P partition row-counts (P rows — driver-trivial at any
  *      data scale) and add each partition's prefix-sum offset.
  *
  * The persist pins one materialization so the count job and the downstream
  * consumer see identical partition assignments (range boundaries come from
  * a sample; two independent materializations could disagree).
  */
object Ranks {

  /** Adds `idCol` = 0-based dense global rank of `key` (which must be
    * unique per row — ties would make row_number nondeterministic).
    */
  def globalSortId(df: DataFrame, key: Column, idCol: String,
      partitions: Int = 0): DataFrame = {
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(p, key)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = ranged.groupBy(col("__pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // prefix-sum offset per pid, looked up via a tiny literal map
    val offMap = counts.map(_._1)
      .zip(counts.scanLeft(0L) { case (acc, (_, n)) => acc + n }.init)
    val offExpr = map(offMap.toSeq.flatMap { case (pid, off) =>
      Seq(lit(pid), lit(off))
    }: _*)
    val w = Window.partitionBy(col("__pid")).orderBy(key)
    ranged
      .withColumn(idCol,
        row_number().over(w).cast("long") - 1L +
          element_at(offExpr, col("__pid")))
      .drop("__pid")
  }
}
