package graft

import org.apache.spark.sql.functions._

/** Plan-shape and partition-invariance assertions — the properties that
  * make the operators survive a 1000-executor cluster, pinned so a
  * refactor cannot silently regress them:
  *
  *  - results must not depend on the shuffle partitioning (the decimal
  *    partial-sum design claims order-independence — prove it);
  *  - star joins must broadcast their dimension sides;
  *  - narrow projections must prune the parquet scan to the columns
  *    they read.
  */
class PlanQualitySpec extends SparkSpec {

  test("decimal-partial aggregates are bit-identical at 7 vs 32 shuffle partitions") {
    val probes = Seq("q_dealer_perf", "q_embedding_stats", "q_events_daily")
    // restore the FIXTURE's value, not a constant — the session is
    // shared across suites and a leaked setting changes later plans
    val fixtureParts = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(parts: Int): Map[String, Seq[String]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try probes.map { q =>
        q -> SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
          .collect().map(_.toString).toSeq
      }.toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", fixtureParts)
    }
    val at7 = runAll(7)
    val at32 = runAll(32)
    probes.foreach { q =>
      assert(at7(q) === at32(q), s"$q result depends on shuffle partitioning")
    }
  }

  test("star-contract join broadcasts all three dimension sides") {
    val plan = SparkEntry.qStarContract(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 3, s"expected 3 broadcast dim joins, found $broadcasts in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "a star dim fell back to sort-merge — the fact side would shuffle at scale")
  }

  test("narrow projections prune the parquet scan") {
    // dealer-perf touches 4 orders columns; the scan must not read the
    // wide comment/clerk columns (ReadSchema is what ships at 100 TB)
    val plan = SparkEntry.qDealerPerf(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("o_comment") && !plan.contains("o_clerk"),
      s"unpruned orders scan:\n$plan")
    // corpus-filter needs only doc_id/lang/source/text
    val plan2 = SparkEntry.qCorpusFilter(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("n_chars"), s"unpruned documents scan:\n$plan2")
  }

  test("null-filter predicates reach the parquet scan as pushed filters") {
    val plan = SparkEntry.qNullFilter(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull"),
      s"no pushed filters on the scan:\n$plan")
  }

  test("binned range join is a hash join on the bin key, never a nested loop") {
    val plan = SparkEntry.qRangeJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a quadratic scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"no equi-join on the bin key found:\n$plan")
  }

  test("cdc apply never shuffles the base side for the anti-join") {
    import graft.pipeline.Cdc
    val base = t3("orders").select(col("o_orderkey"), col("o_totalprice"))
    val changes = base.limit(100).select(col("o_orderkey"), col("o_totalprice"),
      lit("U").as("op"), lit(1L).as("seq"))
    val plan = Cdc.applyChanges(base, changes, Seq("o_orderkey"), "seq", "op")
      .queryExecution.executedPlan.toString
    // the anti-join's streamed (base) side must not sit under an
    // Exchange: broadcast of the latest-change key set is the 100 TB
    // shape (a shuffled base would move the whole snapshot per batch)
    assert("BroadcastHashJoin .*LeftAnti, BuildRight".r.findFirstIn(plan).isDefined,
      s"base side not streamed through a broadcast anti-join:\n$plan")
  }

  test("near-dup candidate plans are equi-join only — no quadratic fallback") {
    // the three dup-mass-grouped operators: every join must stay an
    // equi-join on bucket/band/group keys; a resolution change that
    // degenerates one to a nested-loop/cartesian would scale O(n²)
    // simhash is asserted on the OPERATOR composition, not the
    // q_dedup_simhash gate query: the gate deliberately embeds the
    // exact all-pairs hamming reference (a BroadcastNestedLoopJoin by
    // construction — it plays the oracle's role), while the operator
    // itself must stay equi-join only
    val simhashOp = graft.ops.Dedup.simhashNearDups(
      graft.ops.Dedup.simhash(t3("documents"), "doc_id", "text"))
    for ((label, df) <- Seq(
      "minhash" -> SparkEntry.qDedupMinhash(spark, "/root/testdata/sf0.001"),
      "simhash" -> simhashOp,
      "cosine" -> SparkEntry.qCosineNearDups(spark, "/root/testdata/sf0.001"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$label near-dup plan degenerated to a quadratic join:\n$plan")
    }
    spark.catalog.clearCache()
  }

  private def t3(name: String) =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")
}
