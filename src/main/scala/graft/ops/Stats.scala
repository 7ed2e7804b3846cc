package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution summaries over grouped data. */
object Stats {

  /** Exact type-1 (discrete) quantiles per group: for each probability
    * p, the smallest value whose cumulative count reaches ⌈p·n⌉. Always
    * an element of the data — no interpolation, so results are integers
    * /exact values and identical in any engine (interpolating quantiles
    * differ across engines in the last ulp of the lerp arithmetic).
    *
    * Scale shape: one hash aggregate to (group, value) counts, then a
    * window ordered by value WITHIN each group — state is bounded by the
    * group's distinct-VALUE cardinality, not its row count (for metrics
    * like lengths/scores that is small). The all-rows global-sort
    * quantile and the t-digest/approx_percentile sketch are the
    * alternatives when value cardinality itself explodes. */
  def quantilesDisc(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    probs: Seq[(String, Double)]): DataFrame = {
    require(probs.nonEmpty && probs.forall { case (_, p) => p > 0 && p <= 1 },
      s"probabilities must be in (0,1]: $probs")
    // NULL values are excluded HERE, not at call sites: NULLs sort first
    // under the value window, so left in they inflate _n and every _cum,
    // silently shifting all quantiles low — the SQL QUANTILE_DISC /
    // percentile family likewise ignores NULLs
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
    val wOrd = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val cum = counts
      .withColumn("_cum", sum(col("_c")).over(wOrd))
      .withColumn("_n", sum(col("_c")).over(wAll))
    val aggs = probs.map { case (name, p) =>
      // p·n in IEEE doubles can land a hair ABOVE the exact integer
      // product (0.07 × 100 = 7.000000000000001 → ceil 8, one rank too
      // high); rounding to 6 decimals first recovers the exact-decimal
      // arithmetic a SQL engine applies to a decimal literal like 0.07
      min(when(col("_cum") >= ceil(round(lit(p) * col("_n"), 6)), col(valueCol))).as(name)
    }
    cum.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Robust outlier QA scan: per group, the exact (type-1) median, the
    * exact MAD (median absolute deviation), and the count of values
    * beyond `k` MADs — the outlier detector that survives the heavy
    * tails and corrupt spikes that wreck mean/stddev z-scores (one
    * corrupt 1e308 row drags a mean arbitrarily; the median ignores
    * it).
    *
    * Everything is exact and engine-portable: medians are DATA
    * ELEMENTS (type-1 quantiles via [[quantilesDisc]] — no
    * interpolation arithmetic), `|x − med|` is one IEEE subtraction,
    * and the k·MAD threshold is one IEEE multiply — all bit-identical
    * across engines, so the whole scan hash-matches a SQL oracle.
    *
    * Scale shape: two passes over the input (median pass, deviation
    * pass) — each a (group, value)-count aggregate + in-group window,
    * so state is bounded by per-group distinct-VALUE cardinality, not
    * row count; the group-sized median/MAD tables broadcast back. The
    * deliberate second scan is the heavyHitters trade: a scan is
    * bandwidth, a corpus-wide sort or cache is memory. */
  def robustOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     k: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // NULL metric rows are EXCLUDED up front: quantilesDisc's
    // cumulative rank would otherwise count them (NULLs sort first in
    // the value window), silently shifting the median toward the low
    // end — a group [NULL, NULL, 1, 2, 3] would read med=1 instead of 2
    val nn = df.where(col(valueCol).isNotNull)
    val med = quantilesDisc(nn, groupCols, valueCol, Seq("med" -> 0.5))
    // cached: the deviation frame feeds the MAD quantile AND the final
    // aggregate — uncached, the input would scan a third time
    val dev = OpCaches.registered(nn.join(broadcast(med), groupCols)
      .withColumn("_absdev", abs(col(valueCol) - col("med"))))
    val mad = quantilesDisc(dev, groupCols, "_absdev", Seq("mad" -> 0.5))
    dev.join(broadcast(mad), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        max(col("med")).as("med"), // constant within the group
        max(col("mad")).as("mad"),
        sum(when(col("_absdev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }
}
