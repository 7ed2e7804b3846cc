package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the two inputs behind `Tables.cpuHeavySpread`'s row floors
  * and derives the floors from them — the runnable form of the tuning
  * recipe documented on that map. The floor model (same as the
  * docstring's): a spread scan costs `fixed + rows·perRow/P` against the
  * single-task scan's `rows·perRow`, so the break-even row count is
  *
  *   rows* = fixed / (perRow · (1 − 1/P))
  *
  * where `perRow` is the single-core cost of the heaviest scan-stage
  * kernel that table feeds (measured: one coalesce(1) pass through the
  * kernel to the noop sink) and `fixed` is the spread's constant
  * overhead — the full-row hash exchange plus a `P`-task stage launch
  * (measured: the same kernel behind the actual spread shape,
  * `repartition(P, key)` + the pushdown barrier, minus the ideal
  * `single/P` share). Below `rows*` the spread loses a bounded
  * constant; above it the single-task scan loses linearly — which is
  * why `Tables` errs toward floors at or under break-even.
  *
  * Usage: `runMain graft.model.SpreadCalibrate [dir]` (default
  * `SPARK_GRAFT_SF_DIR`, else the 10× corpus — calibrate ABOVE the
  * candidate floor so both forms do enough work to time; at sf0.1 the
  * corpus tables sit below break-even and the fixed-cost reading
  * drowns in task-launch jitter). Prints one JSON line per table:
  * measured per-row/fixed costs, the derived floor, and the constant
  * currently pinned in `Tables.cpuHeavySpread` for comparison.
  *
  * The kernels are the ones whose measured regressions originally set
  * the floors: the hashed-shingle pipeline for `documents` (the
  * minhash/jaccard scan stage) and the LSH plane-projection banding for
  * `embeddings` (the ann_lsh/cosine_topk scan stage).
  */
object SpreadCalibrate {

  private def timeNoop(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** Median of `reps` timed runs after one untimed warm-up (JIT +
    * codegen land on the warm-up, as in Bench's rep mode). */
  private def measure(df: DataFrame, reps: Int = 3): Double = {
    timeNoop(df)
    val ts = (1 to reps).map(_ => timeNoop(df)).sorted
    ts(ts.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val (spark, dir) = BenchHarness.session(args, "/tmp/graft-10x")
    val p = spark.sparkContext.defaultParallelism

    // scan kernel per table; key and pinned floor come from
    // Tables.cpuHeavySpread — the source of truth this tool validates,
    // so a retuned pin can't silently drift from the printed comparison
    val kernels: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("documents", df =>
        graft.ops.Dedup.shingleHashed(df, "doc_id", "text", 5)
          .select(col("id"), array_distinct(col("shh")).as("shh"))),
      ("embeddings", df =>
        graft.ops.Similarity.lshBandedComposed(
          df.select(col("vec_id"),
            transform(col("embedding"), _.cast("double")).as("v")),
          "vec_id", "v", dim = 64, numPlanes = 4, numTables = 12,
          seedBase = 42)))

    // The CALIBRATION PIN: each Tables floor must sit within this band
    // of its freshly measured single-stage break-even. The lower edge
    // (1×) is the model's own verdict — a floor under break-even turns
    // the spread on where it measurably regresses; the upper edge (8×)
    // bounds the multi-stage margin the Tables docstring claims (pins
    // recorded at 1.2×/2.7×) plus run-to-run fixed-cost scatter
    // (machine load moves the measured fixed cost, not perRow, so the
    // band is wide on purpose — a drifted pin or a re-shaped kernel
    // lands OUTSIDE it, ordinary scatter inside). Out-of-band fails the
    // run by name: recalibrate or re-pin, never both silently.
    val BandLo = 1.0
    val BandHi = 8.0
    var outOfBand = List.empty[String]
    kernels.foreach { case (name, kernel) =>
      val (key, pinned) = Tables.cpuHeavySpread(name)
      val raw = Tables.loadRaw(spark, dir, name)
      val rows = raw.count()
      val single = measure(kernel(raw.coalesce(1)))
      // the exact spread shape Tables.spreadScan emits: keyed exchange
      // plus the pushdown barrier, then the kernel
      val spreadDf = kernel(
        raw.repartition(p, col(key)).where(spark_partition_id() >= 0))
      val spread = measure(spreadDf)
      val perRow = single / rows
      val fixed = math.max(0.0, spread - single / p)
      val breakEven =
        if (perRow > 0) (fixed / (perRow * (1.0 - 1.0 / p))).toLong else -1L
      // a non-positive break-even is UNMEASURABLE this run, not a
      // drifted pin: an idle page-cached box can measure spread ≤
      // single/p (fixed cost 0 → spreading pays at any size — the
      // healthiest possible reading). Only a positive break-even
      // constrains the pins; the unmeasurable case satisfies the band
      // trivially and is reported distinctly instead of riding the -1
      // sentinel into a false "recalibrate" failure.
      val measurable = breakEven > 0
      val ratio = if (measurable) pinned.toDouble / breakEven else -1.0
      val ok = !measurable || (ratio >= BandLo && ratio <= BandHi)
      if (!ok) outOfBand ::= name
      println(
        s"""{"table":"$name","dir":"$dir","rows":$rows,"parallelism":$p,""" +
        s""""single_task_sec":$single,"spread_sec":$spread,""" +
        s""""per_row_usec":${perRow * 1e6},"fixed_cost_sec":$fixed,""" +
        s""""break_even_rows":$breakEven,"break_even_measurable":$measurable,""" +
        s""""pinned_floor":$pinned,""" +
        s""""pin_over_break_even":$ratio,"pin_in_band":$ok}""")
    }
    spark.stop()
    require(outOfBand.isEmpty,
      s"calibration pin failed: floor(s) for ${outOfBand.mkString(", ")} sit " +
        s"outside [$BandLo, $BandHi]× their measured break-even — the pinned " +
        "Tables.cpuHeavySpread constants no longer match this machine/corpus; " +
        "re-derive the floors (and re-bracket) per the Tables docstring")
  }
}
