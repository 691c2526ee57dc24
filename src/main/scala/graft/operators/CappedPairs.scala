package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared capped bucket→pair expansion — the candidate-generation shape
  * every LSH family in this engine funnels through (embedding sign-LSH,
  * audio fingerprint minhash; the text pipeline's variant adds an
  * edit-distance length prefilter, [[DedupPipeline.pairsFromKeys]]).
  *
  * Scale shape (the reasons are measured, see DedupPipeline):
  *  1. count-agg first — almost every key is a singleton, and a codegen'd
  *     count with map-side partials kills them without a collect_list
  *     over the full key volume;
  *  2. the surviving hot-key set (2..cap members) is small — broadcast it
  *     and filter map-side, so the count agg is the only full shuffle;
  *  3. pairs expand in-row from the capped bucket's sorted member list —
  *     never a self-join on the key column. Buckets above `cap` are
  *     dropped entirely (hot keys are degenerate evidence — silence,
  *     boilerplate, zero vectors); callers count them as documented lost
  *     recall.
  */
object CappedPairs {

  /** keyed(id, k) → distinct candidate pairs (a, b) with a < b.
    *
    * @param numParts partition count for the trailing a-keyed dedup
    *                 exchange (which the caller's verify join on a
    *                 reuses). Callers that know their payload-table row
    *                 count pass a memory-derived value (see
    *                 [[DedupPipeline.verifyBuildRows]]: a SHUFFLE_HASH
    *                 build is non-spillable, so the count must bound
    *                 build rows per task, not follow the session
    *                 default); None keeps the session partitioning.
    */
  def fromKeys(keyed: DataFrame, cap: Int,
      numParts: Option[Int] = None): DataFrame = {
    val hot = keyed.groupBy("k").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, cap))
      .select(col("k"))
    keyed.join(broadcast(hot), Seq("k"))
      .groupBy("k")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      // dedup keyed by a ONLY: hashpartitioning(a) satisfies the (a, b)
      // clustering AND the consumer's verify join on a (every caller
      // fetches the a-side payload first), so the dedup exchange and
      // that join's exchange collapse into one — see
      // DedupPipeline.run's candidates for the measured trade.
      .transform(d => numParts.fold(d.repartition(col("a")))(p =>
        d.repartition(p, col("a"))))
      .dropDuplicates("a", "b")
  }
}
