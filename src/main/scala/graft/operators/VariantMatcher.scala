package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.kernel._

/** Result row of the variant matcher (one per (query, match)). */
final case class VariantMatch(
    query: String,
    rank: Int,
    matchText: String,
    score: Double,
    distScore: Double,
    freqScore: Double
)

/** The reference's flagship operator — `query` mode: for each input
  * string, the ranked lexicon variants within anagram+edit distance
  * (reference: src/lib.rs:972-1027 via bin/analiticcl.rs:369-482) —
  * recast for Spark with two physical strategies:
  *
  *  1. [[matchBroadcast]] — the lexicon index is built once on the driver
  *     and broadcast; each task runs the full find_variants kernel on its
  *     partition. Zero shuffle, embarrassingly parallel: the Spark
  *     analogue of the reference's rayon batch loop, and the strategy of
  *     choice at reference scale (lexicons ≤ a few 100k entries; the
  *     broadcast index for a 220k-entry lexicon is tens of MB). This is
  *     what keeps verify-stage scaling efficiency near 1.0 — there is no
  *     shuffle to contend on.
  *
  *  2. [[matchJoin]] — fully declarative plan for lexicons too large to
  *     broadcast: probes generated per query (exact + deletion BFS +
  *     containment schedules) joined against a distributed index
  *     DataFrame on (charcount, anavalue-divisibility), then DL-verified
  *     and ranked with window functions. Equivalent results (tested);
  *     shuffles on charcount buckets + input_id windows.
  *
  * Both preserve the reference's deterministic tie order: ascending
  * anagram value, then vocab insertion id (see SURVEY.md §2.5 R3/R4).
  */
object VariantMatcher {

  /** Build the local model (driver-side) from (text, freq) pairs. */
  def buildModel(
      alphabet: Alphabet,
      lexicon: Seq[(String, Option[Long])],
      weights: Weights = Weights()
  ): LocalVariantModel = {
    val m = new LocalVariantModel(alphabet, weights)
    lexicon.foreach { case (t, f) => m.add(t, f) }
    m.build()
  }

  /** Strategy 1 handle: the model is broadcast ONCE at construction;
    * every subsequent query batch reuses it — the steady-state shape (at
    * production scale one broadcast serves billions of queries).
    */
  final class BroadcastMatcher(
      bc: org.apache.spark.broadcast.Broadcast[LocalVariantModel]
  ) extends Serializable {
    def apply(
        queries: DataFrame,
        params: SearchParameters,
        queryCol: String = "query"
    ): Dataset[VariantMatch] = {
      val spark = queries.sparkSession
      import spark.implicits._
      queries
        .select(col(queryCol).cast("string"))
        .as[String]
        .mapPartitions { it =>
          val m = bc.value
          it.flatMap { q =>
            m.findVariants(q, params).iterator.zipWithIndex.map {
              case (r, i) =>
                VariantMatch(q, i + 1, m.text(r.vocabId),
                  r.score(params.freqWeight), r.distScore, r.freqScore)
            }
          }
        }
    }
  }

  def broadcastMatcher(
      spark: SparkSession,
      model: LocalVariantModel
  ): BroadcastMatcher =
    new BroadcastMatcher(spark.sparkContext.broadcast(model))

  /** Strategy 1: broadcast index + mapPartitions kernel (one-shot form). */
  def matchBroadcast(
      spark: SparkSession,
      model: LocalVariantModel,
      queries: DataFrame, // one string column
      params: SearchParameters,
      queryCol: String = "query"
  ): Dataset[VariantMatch] =
    broadcastMatcher(spark, model)(queries, params, queryCol)

  /** Strategy 2: declarative join plan. Same logical result as
    * [[matchBroadcast]]; used when the lexicon cannot be broadcast.
    *
    * Plan sketch (SURVEY.md §2.4):
    *   lexicon -> index(anavalue BINARY, cc INT, id, text, norm, freq)
    *   queries -> explode(equality probes: exact + BFS deletions)
    *           -> equi-join index on anavalue          (J1/exact)
    *   queries -> explode(containment probes (value, target_cc))
    *           -> join index on cc == target_cc && index.ana % value == 0  (J2)
    *   union -> distinct -> DL verify (J4) -> score (R1) -> freq-norm (R2)
    *   -> rank windows (R3) -> top-k (R4, tie-aware) -> cutoff (R6)
    */
  def matchJoin(
      spark: SparkSession,
      alphabet: Alphabet,
      lexicon: DataFrame, // columns: text, freq (nullable)
      queries: DataFrame, // one string column
      params: SearchParameters,
      queryCol: String = "query"
  ): DataFrame = {
    import spark.implicits._
    val weights = params.weights

    // --- index build (A1-A3): id = insertion order = file order ---
    val normUdf = udf((s: String) => alphabet.normalize(s).map(_.toByte))
    val anaUdf = udf((s: String) => AnaHash.toBytes(alphabet.anahash(s)))
    val ccUdf = udf((s: String) => alphabet.normalize(s).length)
    // insertion id: the reference's vocab id (file order) — pass an
    // explicit `id` column for exact tie parity; monotonically_increasing_id
    // preserves per-partition file order otherwise (adequate for dedup use)
    val lexWithId =
      if (lexicon.columns.contains("id")) lexicon
      else lexicon.withColumn("id", monotonically_increasing_id())
    val lex = lexWithId
      .withColumn("anavalue", anaUdf(col("text")))
      .withColumn("cc", ccUdf(col("text")))
      .withColumn("norm", normUdf(col("text")))
      .withColumn("freq",
        if (lexicon.columns.contains("freq")) coalesce(col("freq"), lit(1L))
        else lit(1L))

    // --- probe generation (J1): per query, equality probes (exact +
    //     deletions present in index checked via join) and containment
    //     probes (value, target charcount) ---
    val alphaWithUnk = alphabet.size + 1
    val eqProbesUdf = udf { (q: String) =>
      val focus = alphabet.anahash(q)
      val norm = alphabet.normalize(q)
      val maxAna = params.maxAnagramDistance
        .resolve(norm.length, DistanceThreshold.MaxAnagramDistance)
      val (upper, _) = AnaHash.alphabetUpperBound(focus, alphaWithUnk)
      val dels = AnaHash.deletionNeighborhood(focus, upper + 2, maxAna)
      (AnaHash.toBytes(focus) +: dels.map(d => AnaHash.toBytes(d._1))).distinct
    }
    val containProbesUdf = udf { (q: String) =>
      val focus = alphabet.anahash(q)
      val norm = alphabet.normalize(q)
      val cc = norm.length
      val maxAna = params.maxAnagramDistance
        .resolve(cc, DistanceThreshold.MaxAnagramDistance)
      val (upper, _) = AnaHash.alphabetUpperBound(focus, alphaWithUnk)
      val dels = AnaHash.deletionNeighborhood(focus, upper + 2, maxAna)
      val probes = scala.collection.mutable.LinkedHashSet.empty[(Array[Byte], Int)]
      for (d <- 1 to maxAna) probes += ((AnaHash.toBytes(focus), cc + d))
      for ((del, dist) <- dels; sd <- 1 to (maxAna - dist))
        probes += ((AnaHash.toBytes(del), cc - dist + sd))
      probes.toSeq.map { case (v, t) => (v, t) }
    }
    val q0 = queries.select(col(queryCol).cast("string").as("query")).distinct()
      .withColumn("qnorm", normUdf(col("query")))
      .filter(length(col("qnorm")) > 0) // qnorm is BinaryType

    val eqCands = q0
      .select(col("query"), col("qnorm"), explode(eqProbesUdf(col("query"))).as("anavalue"))
      .join(lex, Seq("anavalue"))

    val modZeroUdf = udf { (candidate: Array[Byte], probe: Array[Byte]) =>
      AnaHash.fromBytes(candidate).mod(AnaHash.fromBytes(probe)).signum == 0
    }
    val containCands = q0
      .select(col("query"), col("qnorm"),
        explode(containProbesUdf(col("query"))).as("p"))
      .select(col("query"), col("qnorm"),
        col("p._1").as("probe"), col("p._2").as("cc"))
      .join(lex, Seq("cc"))
      .filter(modZeroUdf(col("anavalue"), col("probe")))

    val cands = eqCands
      .select(col("query"), col("qnorm"), col("id"), col("text"), col("norm"),
        col("freq"), col("anavalue"))
      .union(containCands.select(col("query"), col("qnorm"), col("id"),
        col("text"), col("norm"), col("freq"), col("anavalue")))
      .dropDuplicates("query", "id")

    // --- verify + score (J4/R1) ---
    val scoreUdf = udf {
      (qnorm: Array[Byte], q: String, cnorm: Array[Byte], ctext: String) =>
        val qn = qnorm.map(b => (b & 0xff))
        val cn = cnorm.map(b => (b & 0xff))
        val maxEdit = params.maxEditDistance
          .resolve(qn.length, DistanceThreshold.MaxEditDistance)
        Scoring
          .distanceFeatures(qn, q, cn, ctext, maxEdit, weights)
          .map(dist => Scoring.score(dist, qn.length, weights))
    }
    val scored = cands
      .withColumn("dist_score",
        scoreUdf(col("qnorm"), col("query"), col("norm"), col("text")))
      .filter(col("dist_score").isNotNull &&
        col("dist_score") >= params.scoreThreshold)
      // freq was coalesced to 1 in the index build, so an all-null (or
      // absent) freq column yields freq_score = 1/max(1) = 1 for every
      // row — identical to the old driver-side "haveFreq" probe, which
      // cost a hidden Spark job during plan construction.
      .withColumn("freq_raw", col("freq").cast("double"))

    // --- R2 freq normalization per query + R3 ranking + R4/R6 crops ---
    import org.apache.spark.sql.expressions.Window
    val wq = Window.partitionBy("query")
    val ordered = Window.partitionBy("query")
      .orderBy(col("dist_score").desc, col("freq_score").desc,
        length(col("anavalue")), col("anavalue"), col("id"))
    val ranked = scored
      .withColumn("freq_score", col("freq_raw") / max("freq_raw").over(wq))
      .withColumn("rank", row_number().over(ordered))

    // tie-aware top-k (R4): replicate lib.rs:1536-1589 with window stats.
    // NOTE: compares on dist_score, exact for freqWeight == 0 (our fixed
    // pipeline config); the broadcast strategy handles freqWeight > 0.
    val maxM = params.maxMatches
    val cropped = if (maxM > 0) {
      val lastScore = max(when(col("rank") === maxM, col("dist_score"))).over(wq)
      val croppedScore = max(when(col("rank") === maxM + 1, col("dist_score"))).over(wq)
      val withB = ranked
        .withColumn("last_s", lastScore)
        .withColumn("crop_s", croppedScore)
      val earlyCut = min(when(col("dist_score") === col("crop_s"),
        col("rank"))).over(wq)
      val lateCut = min(when(col("dist_score") < col("crop_s"),
        col("rank"))).over(wq)
      withB
        .withColumn("early", earlyCut)
        .withColumn("late", lateCut)
        .filter(
          col("crop_s").isNull || // <= maxM results: keep all
            (when(col("crop_s") < col("last_s"), col("rank") <= maxM)
              .otherwise( // boundary splits a tie group
                when(col("early") > 1, col("rank") <= col("early"))
                  .otherwise(when(col("late") > 1, col("rank") <= col("late"))
                    .otherwise(lit(true))))))
        .drop("last_s", "crop_s", "early", "late")
    } else ranked

    // R6 relative cutoff
    val withBest = cropped.withColumn("best_s",
      max(when(col("rank") === 1, col("dist_score"))).over(wq))
    val cut =
      if (params.cutoffThreshold >= 1.0) {
        val cutRank = min(when(col("rank") > 1 &&
          col("dist_score") <= col("best_s") / params.cutoffThreshold,
          col("rank"))).over(wq)
        withBest.withColumn("cut_rank", cutRank)
          .filter(col("cut_rank").isNull || col("rank") < col("cut_rank"))
          .drop("cut_rank")
      } else withBest

    cut.select(col("query"), col("rank").cast("int").as("rank"),
      col("text").as("match_text"),
      col("dist_score").as("dist_score"),
      col("freq_score").as("freq_score"))
      .orderBy(col("query"), col("rank"))
  }
}
