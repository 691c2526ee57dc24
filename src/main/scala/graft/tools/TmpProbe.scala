package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") === 0)
    val twin = df.select(col("vec_id"),
      transform(col("embedding"), (x, i) =>
        x.cast("double") +
          ((col("vec_id") * 31 + i * 7) % 11 - 5).cast("double") *
            lit(0.004)).as("emb"),
      transform(col("embedding"), (x, i) =>
        ((col("vec_id") * 31 + i * 7) % 11 - 5)).as("k"))
    twin.collect().foreach { r =>
      println("K=" + r.getSeq[Any](2).mkString(","))
      println("E=" + r.getSeq[Double](1).take(8).mkString(","))
    }
    spark.stop()
  }
}
