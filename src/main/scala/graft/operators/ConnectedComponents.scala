package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge DataFrame — the
  * clustering stage of the dedup pipeline (SURVEY.md §7.2 step 8).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14), expressed
  * purely as DataFrame joins/aggregations — no RDDs, no driver-side
  * graph. Converges in O(log n) rounds on real graphs; each round is two
  * self-aggregations shuffling on node id.
  *
  *  - large-star: for each node u, connect every strictly-larger neighbor
  *    to min(neighborhood ∪ {u});
  *  - small-star: for each node u, connect every not-larger neighbor
  *    (and u) to the minimum of those.
  *
  * Scale notes: per-iteration `persist` + `localCheckpoint` cuts the
  * lineage (otherwise the plan doubles each round — the classic iterative
  * join blowup); convergence test is an aggregate on the edge delta, not
  * a collect. At 10^12 rows the same loop runs with edges written to an
  * Iceberg table per iteration (resume = read last snapshot); here the
  * in-memory checkpoint stands in.
  */
object ConnectedComponents {

  /** @param edges two long columns (src, dst); self-loops/duplicates ok.
    * @return (node, component) with component = min node id reachable.
    */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIterations: Int = 50
  ): DataFrame = {
    import spark.implicits._

    def canon(df: DataFrame): DataFrame =
      df.select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()

    // u -> current best-known root (start: min neighbor or self)
    var e = canon(edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // convergence: edge-set checksum unchanged (memoized — one aggregate
    // per round, not two; far cheaper than except/except at scale).
    // bit_xor is safe: edges are distinct by construction and xor cannot
    // overflow under ANSI.
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(src, dst))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prevChecksum = checksum(e)

    // right-size the loop's shuffle parallelism to the edge count: each
    // round is ~6 shuffles, and on small-to-medium edge sets the wall
    // clock is pure task-scheduling overhead — 32-way shuffles of a few
    // MB make the loop SLOWER on more cores. ~200k edges per reduce
    // partition keeps tasks meaningful; huge edge sets keep the session
    // setting unchanged.
    val prevShufflePartitions = spark.conf.get("spark.sql.shuffle.partitions")
    val target = math.max(2L,
      math.min(prevShufflePartitions.toLong, prevChecksum._1 / 200000L + 2L))
    spark.conf.set("spark.sql.shuffle.partitions", target.toString)

    // one large-star + small-star round (Kiveris et al. alternation)
    def round(cur: DataFrame): DataFrame = {
      val nbrs = cur.select(col("src").as("u"), col("dst").as("v"))
        .union(cur.select(col("dst").as("u"), col("src").as("v")))
      val mins = nbrs.groupBy("u")
        .agg(least(min("v"), first("u")).as("m"))
      val large = nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
      val afterLarge = canon(large.union(cur))

      val nbrs2 = afterLarge.select(col("dst").as("u"), col("src").as("v"))
      val mins2 = nbrs2.groupBy("u")
        .agg(least(min("v"), first("u")).as("m"))
      val small = nbrs2.join(mins2, "u")
        .select(col("v").as("src"), col("m").as("dst"))
        .union(mins2.select(col("u").as("src"), col("m").as("dst")))
      canon(small)
    }

    val timing = sys.env.contains("SPARK_GRAFT_STAGE_TIMING")
    var iteration = 0
    var converged = false
    try while (!converged && iteration < maxIterations) {
      val tRound = System.nanoTime()
      // one materialized round per convergence check: `round` reads its
      // input several times (nbrs both directions, the large-star union),
      // so composing rounds without a checkpoint re-executes the inner
      // subtree multiple times — measured 5-10x slower than checkpointing
      // every round
      val next = round(e).localCheckpoint(true)
      val nextChecksum = checksum(next)
      converged = nextChecksum == prevChecksum
      prevChecksum = nextChecksum
      e.unpersist()
      e = next
      iteration += 1
      if (timing) System.err.println(
        f"[cc-round] $iteration edges=${nextChecksum._1} " +
          f"${(System.nanoTime() - tRound) / 1e9}%.2fs")
    } finally spark.conf.set("spark.sql.shuffle.partitions",
      prevShufflePartitions)

    // components: every node points at its root (min of its final star);
    // roots point at themselves
    val nodes = edges.select(col(srcCol).cast("long").as("node"))
      .union(edges.select(col(dstCol).cast("long").as("node"))).distinct()
    val assign = e.select(col("dst").as("node"), col("src").as("component"))
      .groupBy("node").agg(min("component").as("component"))
    nodes.join(assign, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component"))
  }
}
