package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.functions.{TextFns => T}

/** Pins the portable (md5-based, oracle-stated) hash kernels: the JVM
  * fast paths must be bit-identical to the interpreted HOF forms whose
  * SQL the DuckDB oracle runs.
  */
class TextFnsSpec extends SparkSpecBase {

  private def sampleDf = {
    import spark.implicits._
    Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "completely different text with no overlap at all",
      "ab", // shorter than one shingle: whole-string pseudo-shingle
      "",   // empty after cleaning
      "aaaaaaaaaaaaaaaa" // single repeated shingle
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("simhashPortableJvm == HOF simhashFromHashes over md5Hash60 shingle hashes") {
    val cleaned = substring(T.cleanText(col("text")), 1, 64)
    val hof = T.simhashFromHashes(
      transform(T.charShingles(cleaned, 3), s => T.md5Hash60(s)), 32)
    val rows = sampleDf
      .select(col("id"), T.simhashPortableJvm(cleaned, 3, 32).as("jvm"), hof.as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"row ${r.getLong(0)}")
    }
  }

  test("simhash of identical texts is identical; near texts are Hamming-close") {
    val cleaned = substring(T.cleanText(col("text")), 1, 64)
    val sim = sampleDf
      .select(col("id"), T.simhashPortableJvm(cleaned, 3, 32).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-word-substituted texts (0 vs 1) must be closer than unrelated (0 vs 2)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sim(0L), sim(1L)) < ham(sim(0L), sim(2L)))
  }

  test("minhashPortableJvm == interpreted minhashPortable (already pinned; sanity)") {
    val cleaned = substring(T.cleanText(col("text")), 1, 64)
    val rows = sampleDf
      .select(
        T.minhashPortableJvm(cleaned, 3, 12).as("jvm"),
        T.minhashPortable(T.charShingles(cleaned, 3), 12).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }
}
