package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: ALGEBRAIC aggregate state that
  * merges batch-by-batch to exactly the full-recompute answer — the
  * pattern that replaces the nightly full rollup at 100 TB (re-reading
  * a year of facts to refresh a daily mart is the single most
  * expensive habit a warehouse carries; merging yesterday's state with
  * today's partition reads one day).
  *
  * Exactness is the design point, not an aspiration: state is
  * `(count, DECIMAL sums, per-metric non-null counts)` per group —
  * count merge is integer
  * addition, decimal addition is associative and commutative, so ANY
  * batch split (and any partitioning within a batch) merges to
  * bit-identical state, and the finalized metrics (sums as double,
  * averages as one IEEE divide) are bit-identical to the
  * single-pass aggregate. A double-sum state would NOT give this —
  * fp addition is order-sensitive — which is exactly why the engine's
  * money aggregates run through decimal partials everywhere
  * (`SCALE.md`). The gating query proves the property: state over two
  * disjoint event slices, merged and finalized, hash-matches the
  * oracle's plain full-table aggregate.
  *
  * Scale shape: each batch's state is one hash aggregate over that
  * batch alone; merge is a group-keyed aggregate over state rows
  * (mart-sized, not fact-sized). State tables persist like any other
  * table (`Runner` materialization), keyed and partitioned by the
  * group columns. */
object Incremental {

  /** Aggregate state for one batch: per group, `_n` (row count) and,
    * for each metric, `_sum_<name>` plus `_cnt_<name>` (the NON-NULL
    * count — `sum` skips NULLs, so the average's denominator must skip
    * them identically or a NULL-carrying metric diverges from the
    * single-pass AVG the contract pins). Metric columns must already
    * carry an exact type (DECIMAL-cast by the caller — the sums must be
    * order-invariant or the merge guarantee is void). */
  def aggState(df: DataFrame, groupCols: Seq[String],
               metrics: Seq[(String, Column)]): DataFrame = {
    require(groupCols.nonEmpty && metrics.nonEmpty,
      "aggState needs group columns and at least one metric")
    val aggs = count(lit(1)).as("_n") +:
      metrics.flatMap { case (n, c) =>
        Seq(sum(c).as(s"_sum_$n"), count(c).as(s"_cnt_$n")) }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** State-format guard: every `_sum_<name>` must carry its
    * `_cnt_<name>` twin. The per-metric non-null counts were ADDED to
    * the format (earlier state tables persisted sums only), and a
    * legacy table would otherwise fail deep inside `unionByName` /
    * `finalizeState` with a generic unresolved-column error — this
    * module exists to persist state across versions, so the format
    * break must name itself and the rebuild step. Backfilling
    * `_cnt_ = _n` is NOT offered: it silently diverges from SQL AVG
    * for any metric that ever carried a NULL, which is exactly the
    * case the counts were added for. */
  private def requireCurrentFormat(df: DataFrame, where: String): Unit = {
    val cols = df.columns.toSet
    val missing = df.columns.filter(_.startsWith("_sum_"))
      .map(_.stripPrefix("_sum_"))
      .filterNot(n => cols.contains(s"_cnt_$n"))
    require(missing.isEmpty,
      s"$where: state table is in the legacy sums-only format (missing " +
        s"${missing.map(n => s"_cnt_$n").mkString(", ")}). The state format " +
        "gained per-metric non-null counts (SQL AVG semantics for " +
        "NULL-carrying metrics); legacy state cannot be migrated in place — " +
        "rebuild it by re-running aggState over the source batches")
  }

  /** Merge any number of state tables (associative, commutative —
    * batch order and batch boundaries cannot change the result). */
  def merge(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state table")
    states.foreach(requireCurrentFormat(_, "Incremental.merge"))
    val u = states.reduce(_.unionByName(_))
    val stateCols = u.columns.filter(c =>
      c.startsWith("_sum_") || c.startsWith("_cnt_"))
    val aggs = sum(col("_n")).as("_n") +:
      stateCols.map(c => sum(col(c)).as(c)).toSeq
    u.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Finalize state into the served metrics: per metric, the total (as
    * double) and the mean (one IEEE divide over the metric's NON-NULL
    * count — SQL AVG semantics; an all-NULL group averages NULL rather
    * than dividing by zero, which under ANSI would abort); plus the
    * group row count. */
  def finalizeState(state: DataFrame, groupCols: Seq[String]): DataFrame = {
    requireCurrentFormat(state, "Incremental.finalizeState")
    val sumCols = state.columns.filter(_.startsWith("_sum_"))
    val outputs = col("_n").as("n") +: sumCols.flatMap { c =>
      val name = c.stripPrefix("_sum_")
      val cnt = col(s"_cnt_$name")
      Seq(col(c).cast("double").as(s"sum_$name"),
        when(cnt > 0, col(c).cast("double") / cnt)
          .as(s"avg_$name"))
    }.toSeq
    state.select(groupCols.map(col) ++ outputs: _*)
  }
}
