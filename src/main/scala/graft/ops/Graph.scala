package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation. PageRank over a domain /
  * document link graph is a classic training-data quality signal (rank
  * web domains, filter the tail), and group resolution already lives
  * here ([[Dedup.connectedComponents]]); this is the scoring side.
  *
  * Determinism doctrine (what makes [[pageRank]] oracle-gateable where
  * a textbook implementation is not): the per-iteration mass sum is
  * the ONE aggregation whose floating-point order varies with
  * partitioning, so each edge's contribution is quantized to
  * `DECIMAL(28,14)` and summed EXACTLY (the dim-stats recipe — the
  * sum is order-free, the quantization loss is a deterministic
  * per-term rounding both engines share); everything else (the
  * rank/out-degree division, the damping blend) is scalar IEEE double
  * arithmetic, identical everywhere. The result is bit-stable across
  * partitionings and across engines.
  */
object Graph {

  /** PageRank over a directed edge list, `iters` synchronous rounds
    * from a uniform start:
    * `r'(v) = (1−d)/N + d · Σ_{u→v} quantize(r(u)/outdeg(u))`.
    *
    * Scale shape per round: one broadcast-or-shuffle join of the edge
    * list with the rank vector (both keyed by node — a pre-partitioned
    * edge table makes it exchange-free), one exact decimal hash
    * aggregate on the destination, one left join back to the node set.
    * Nothing node- or edge-mass ever collects; `iters` is a small
    * constant (rank order stabilizes long before convergence — the
    * curation use reads the ORDER).
    *
    * Simplified form: DANGLING mass is dropped, not redistributed — a
    * node with no out-edges absorbs rank. Ranks then sum to < 1 on
    * graphs with sinks; feed both edge directions (or add self-loops)
    * when mass conservation matters, as the undirected curation graphs
    * here do. Self-edges and duplicate edges are deduplicated; NULL
    * endpoints are dropped. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1): $damping")
    val e = OpCaches.registered(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .distinct())
    val nodes = OpCaches.registered(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    require(n > 0, "pageRank over an empty graph")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // driver-side scalar doubles: the same IEEE ops the oracle runs
    val base = (1.0 - damping) / n.toDouble
    var ranks = nodes.withColumn("rank", lit(1.0 / n.toDouble))
    var i = 0
    while (i < iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          (col("rank") / col("deg")).cast("decimal(28,14)").as("q"))
      val sums = contrib.groupBy("node").agg(sum(col("q")).as("mass"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) *
            coalesce(col("mass").cast("double"), lit(0.0))).as("rank"))
      i += 1
    }
    ranks
  }
}
