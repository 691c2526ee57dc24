package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Trained-IVF recall quantification (the one number the embedding path
  * was missing): on clustered synthetic embeddings, k-means-trained
  * centroids + top-2-cell probing must recover ≥0.9 of the brute-force
  * cosine top-3 neighbor sets.
  */
class AnnIvfSpec extends SparkSpecBase {

  /** Deterministic clustered embeddings: `nClusters` unit-ish centers in
    * `dim` dims from a seeded LCG, `perCluster` points each = center +
    * small perturbation. No Math.random — reruns are bit-identical.
    */
  private def clusteredVectors(nClusters: Int, perCluster: Int, dim: Int) = {
    var state = 0x9e3779b97f4a7c15L
    def nextDouble(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    val centers = Array.fill(nClusters)(Array.fill(dim)(nextDouble()))
    (0 until nClusters * perCluster).map { i =>
      val c = centers(i % nClusters)
      val emb = c.map(v => v + 0.08 * nextDouble())
      (i.toLong, emb.toSeq)
    }
  }

  test("trained IVF recall@3 >= 0.9 vs brute force on clustered embeddings") {
    import spark.implicits._
    val data = clusteredVectors(nClusters = 10, perCluster = 60, dim = 16)
    val vectors = data.toDF("id", "emb")
    val queries = vectors.filter(col("id") % 7 === 0) // ~86 queries
    val cents = AnnIvf.trainCentroids(spark, vectors, k = 10,
      iterations = 3, seed = 42L)
    assert(cents.count() == 10)
    val ivf = AnnIvf.queryTopK(spark, vectors, queries, cents,
      topK = 3, nprobe = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val brute = AnnIvf.bruteTopK(spark, vectors, queries, topK = 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    info(f"recall@3 = $recall%.3f (${ivf.intersect(brute).size}/${brute.size})")
    assert(recall >= 0.9, f"recall@3 $recall%.3f below 0.9")
    cents.unpersist()
  }

  test("training is deterministic: same seed, same centroids") {
    import spark.implicits._
    val data = clusteredVectors(nClusters = 4, perCluster = 20, dim = 8)
    val vectors = data.toDF("id", "emb")
    def centroidRows() = {
      val c = AnnIvf.trainCentroids(spark, vectors, k = 4, iterations = 2,
        seed = 7L)
      val rows = c.orderBy("c_id").as[(Long, Seq[Double])].collect().toSeq
      c.unpersist()
      rows
    }
    assert(centroidRows() == centroidRows())
  }

  test("sampled training still clusters (sampleN < n)") {
    import spark.implicits._
    val data = clusteredVectors(nClusters = 5, perCluster = 40, dim = 8)
    val vectors = data.toDF("id", "emb")
    val queries = vectors.filter(col("id") % 11 === 0)
    val cents = AnnIvf.trainCentroids(spark, vectors, k = 5,
      iterations = 2, seed = 42L, sampleN = 100)
    val ivf = AnnIvf.queryTopK(spark, vectors, queries, cents,
      topK = 3, nprobe = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val brute = AnnIvf.bruteTopK(spark, vectors, queries, topK = 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    info(f"sampled recall@3 = $recall%.3f")
    assert(recall >= 0.8, f"sampled recall@3 $recall%.3f below 0.8")
    cents.unpersist()
  }
}
