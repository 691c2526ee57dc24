package graft.operators

import graft.SparkSpecBase
import graft.kernel._
import graft.sources.SyntheticText

/** Parity: the two distributed strategies must agree with each other and
  * with the LocalVariantModel (itself pinned to the reference's unit-test
  * vectors in KernelSpec).
  */
class VariantMatcherSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  val params: SearchParameters = SearchParameters(
    maxAnagramDistance = DistanceThreshold.Absolute(3),
    maxEditDistance = DistanceThreshold.Absolute(3),
    maxMatches = 10,
    scoreThreshold = 0.25,
    cutoffThreshold = 2.0
  )

  lazy val lexiconWords: Seq[String] = SyntheticText.defaultWords
  lazy val queries: Seq[String] = {
    val rng = new scala.util.Random(7)
    lexiconWords.flatMap(w =>
      Seq(w, SyntheticText.corrupt(rng, w, 1), SyntheticText.corrupt(rng, w, 2)))
  }.distinct

  lazy val model: LocalVariantModel =
    VariantMatcher.buildModel(Alphabet.test, lexiconWords.map(w => (w, None)))

  test("broadcast strategy == local model, per query and rank") {
    import spark.implicits._
    val qdf = queries.toDF("query")
    val got = VariantMatcher
      .matchBroadcast(spark, model, qdf, params)
      .collect()
      .groupBy(_.query)
      .view.mapValues(_.sortBy(_.rank).map(m => (m.matchText, m.distScore)).toSeq)
      .toMap
    for (q <- queries) {
      val expected = model.findVariants(q, params)
        .map(r => (model.text(r.vocabId), r.distScore))
      assert(got.getOrElse(q, Seq.empty) == expected, s"query=$q")
    }
  }

  test("join strategy == local model, per query and rank") {
    import spark.implicits._
    val lexDf = lexiconWords.zipWithIndex
      .map { case (w, i) => (w, i.toLong) }
      .toDF("text", "id")
    val qdf = queries.toDF("query")
    val got = VariantMatcher
      .matchJoin(spark, Alphabet.test, lexDf, qdf, params)
      .select(col("query"), col("rank"), col("match_text"), col("dist_score"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(r => (r.getString(2), r.getDouble(3))).toSeq)
      .toMap
    for (q <- queries) {
      val expected = model.findVariants(q, params)
        .map(r => (model.text(r.vocabId), r.distScore))
      assert(got.getOrElse(q, Seq.empty) == expected, s"query=$q")
    }
  }

  test("huys parity through the distributed path") {
    import spark.implicits._
    val m = VariantMatcher.buildModel(Alphabet.test,
      Seq(("huis", None), ("huls", None)))
    val p = params.copy(maxAnagramDistance = DistanceThreshold.Absolute(2),
      maxEditDistance = DistanceThreshold.Absolute(2), scoreThreshold = 0.0,
      cutoffThreshold = 0.0)
    val rs = VariantMatcher
      .matchBroadcast(spark, m, Seq("huys").toDF("query"), p)
      .collect().sortBy(_.rank)
    assert(rs.map(_.matchText).toSeq == Seq("huis", "huls"))
    assert(rs(0).distScore == 0.65625 && rs(1).distScore == 0.65625)
  }
}
