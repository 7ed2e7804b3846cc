package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * endpoints are dropped.
    *
    * `edgesDistinct = true` is the caller's PROMISE that the edge list
    * already carries no duplicates, skipping the build-time dedup — one
    * edge-mass exchange + aggregate removed (§2.1), the second-largest
    * shuffle of the whole walk after the repartition. Contribution sums
    * double-count duplicate edges, so only set it when distinctness is
    * structural ([[LinkGraph.termEdges]]'s incidence is); bit-identical
    * to the dedup path for any already-distinct input (spec-pinned). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.85,
               edgesDistinct: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1): $damping")
    // cached PRE-PARTITIONED on src: every round's contribution join and
    // the out-degree aggregate are src-keyed, so hash-clustering the edge
    // list once at cache time lets each of them reuse the cached
    // partitioning instead of re-exchanging edge mass per round (§2.4 —
    // two operations keyed the same way share one exchange; only the
    // node-mass rank vector still shuffles each round). One extra
    // edge-mass exchange at build, iters × edge-mass exchanges removed.
    val clean = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val e = OpCaches.registered(
      (if (edgesDistinct) clean else clean.distinct())
        .repartition(col("src")))
    val nodes = OpCaches.registered(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    require(n > 0, "pageRank over an empty graph")
    // consumed once per unrolled iteration: without the cache the final
    // plan re-computes the degree aggregation per round (plan-branch
    // recompute — Spark shares no uncached subplans across join
    // branches); the checkpointed variant already caches it
    val outdeg = OpCaches.registered(
      e.groupBy("src").agg(count(lit(1)).as("deg")))
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

  /** [[pageRank]] for MANY rounds — the production shape. The unrolled
    * form nests one join-aggregate-join layer per round into a single
    * plan: fine at 3 rounds (the gate), untenable at 20+ (plan
    * analysis/codegen grow superlinearly with depth and the lineage
    * recomputes on any retry). This variant cuts the lineage every
    * round with a parquet round-trip into `scratchDir/round=N`: each
    * round's plan is one join-agg-join over a FLAT scan, so cost per
    * round is constant in the round count (measured —
    * `PageRankBench` / SCALE.md), retries of round N re-read round
    * N−1's bytes instead of recomputing N−1 rounds, and a crashed job
    * RESUMES from the highest committed round (the `_SUCCESS` marker;
    * a half-written round is overwritten). Only the last committed
    * round is kept on disk — bounded scratch, O(nodes) per round.
    *
    * Bit-identity with the unrolled form (spec-pinned): ranks are IEEE
    * doubles, which parquet round-trips exactly, and the one
    * order-sensitive aggregation is already quantized to exact decimal
    * (the [[pageRank]] doctrine) — so N checkpointed rounds produce
    * the bit-identical vector to N unrolled rounds, resumed or not.
    * Resume contract: the caller must re-invoke with the same edge
    * CONTENT (round files carry no edge fingerprint — a changed graph
    * resumed mid-walk answers neither graph's PageRank; use a fresh
    * scratchDir per graph version).
    *
    * `roundsPerWrite` trades resume GRANULARITY for per-round fixed
    * cost: k rounds nest into one plan between parquet round-trips
    * (each round-trip is a write job + commit + footer read — measured
    * ~0.4–0.6 s of pure fixed cost per round at gate scale, r20), so a
    * crash re-computes at most k−1 rounds from the last committed one.
    * Committed round numbers are always TRUE round counts (the write
    * lands at `round=i+k`), so any mix of k values across resumes of
    * one walk composes — the vector is bit-identical for every k
    * (doubles never leave memory between nested rounds, and the
    * round arithmetic is the same scalar IEEE ops; spec-pinned for
    * k>1 against the unrolled form, resume included). Keep k modest
    * (the unrolled form's plan-depth economics): the default 1 is the
    * flattest plan; [[LinkGraph.docRank]] uses 4. */
  def pageRankCheckpointed(edges: DataFrame, srcCol: String, dstCol: String,
                           iters: Int, scratchDir: String,
                           damping: Double = 0.85,
                           roundsPerWrite: Int = 1,
                           edgesDistinct: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1): $damping")
    require(roundsPerWrite >= 1,
      s"roundsPerWrite must be >= 1: $roundsPerWrite")
    val spark = edges.sparkSession
    // cached PRE-PARTITIONED on src: every round's contribution join and
    // the out-degree aggregate are src-keyed, so hash-clustering the edge
    // list once at cache time lets each of them reuse the cached
    // partitioning instead of re-exchanging edge mass per round (§2.4 —
    // two operations keyed the same way share one exchange; only the
    // node-mass rank vector still shuffles each round). One extra
    // edge-mass exchange at build, iters × edge-mass exchanges removed.
    val clean = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val e = OpCaches.registered(
      (if (edgesDistinct) clean else clean.distinct())
        .repartition(col("src")))
    val nodes = OpCaches.registered(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    require(n > 0, "pageRank over an empty graph")
    // consumed once per round: cache across the loop, not per round
    val outdeg = OpCaches.registered(
      e.groupBy("src").agg(count(lit(1)).as("deg")))
    val base = (1.0 - damping) / n.toDouble
    val (fs, _) = VersionedState.fsPath(spark, scratchDir)
    val roundRe = "round=(\\d+)".r
    val committed = {
      val p = new org.apache.hadoop.fs.Path(scratchDir)
      if (!fs.exists(p)) Seq.empty[Long]
      else fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
        case s @ roundRe(r) if fs.exists(new org.apache.hadoop.fs.Path(
          s"$scratchDir/$s/_SUCCESS")) => r.toLong
      }
    }
    // a committed round ABOVE the requested count means the scratch
    // belongs to a longer walk: refusing beats silently answering from
    // (or re-walking past) someone else's rounds
    require(committed.forall(_ <= iters),
      s"pageRankCheckpointed at $scratchDir: committed round(s) " +
        s"${committed.filter(_ > iters).sorted.mkString(", ")} exceed the " +
        s"requested $iters — this scratch holds a longer walk; use a " +
        "fresh scratchDir (or request at least as many rounds)")
    var i = committed.maxOption.getOrElse(0L)
    // sweep rounds below the committed max HERE, not only inside the
    // loop: a prior run that crashed between committing its final round
    // and deleting the previous one, re-invoked with the same iters,
    // resumes at i == iters and never enters the loop — the
    // only-the-last-round bounded-scratch promise must hold on that
    // path too (the answer was already correct; the debris was not)
    def sweepBelow(keep: Long): Unit =
      fs.listStatus(new org.apache.hadoop.fs.Path(scratchDir)).toSeq
        .map(_.getPath.getName).collect {
          case s @ roundRe(r) if r.toLong < keep => s
        }.foreach(s => fs.delete(
          new org.apache.hadoop.fs.Path(s"$scratchDir/$s"), true))
    if (i > 0L) sweepBelow(i)
    var ranks =
      if (i == 0L) nodes.withColumn("rank", lit(1.0 / n.toDouble))
      else spark.read.parquet(s"$scratchDir/round=$i")
    // one in-memory round: the same join-agg-join every form here runs
    def round(r: DataFrame): DataFrame = {
      val contrib = e
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          (col("rank") / col("deg")).cast("decimal(28,14)").as("q"))
      val sums = contrib.groupBy("node").agg(sum(col("q")).as("mass"))
      nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) *
            coalesce(col("mass").cast("double"), lit(0.0))).as("rank"))
    }
    while (i < iters) {
      // nest up to roundsPerWrite rounds into this trip's plan; the
      // committed round number stays the TRUE round count
      val upTo = math.min(i + roundsPerWrite, iters.toLong)
      var stepped = ranks
      var j = i
      while (j < upTo) { stepped = round(stepped); j += 1 }
      stepped.write.mode("overwrite").parquet(s"$scratchDir/round=$upTo")
      ranks = spark.read.parquet(s"$scratchDir/round=$upTo")
      // keep only the newest committed round: delete everything below
      // AFTER the new round committed (a crash between the write and
      // the deletes leaves extra rounds, and resume takes the max)
      sweepBelow(upTo)
      i = upTo
    }
    ranks
  }
}
