package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan pruning: Z-order (Morton curve)
  * interleaving, the OPTIMIZE ZORDER BY of Delta/Iceberg re-expressed
  * as plain DataFrame transforms.
  *
  * Why it matters at 100 TB: parquet scans skip row groups whose
  * min/max stats exclude the predicate. A table range-partitioned and
  * sorted on ONE column prunes perfectly on that column and not at all
  * on any other; interleaving the bits of TWO (or more) normalized
  * columns into one sort key gives every interleaved column locality —
  * a predicate on either column touches ~√files instead of all of
  * them. The curve is the standard multi-dimensional-locality trade:
  * neither column prunes perfectly, both prune well.
  *
  * Determinism contract (what makes `q_zorder` hash-checkable in
  * DuckDB): buckets come from EXACT per-column min/max linear scaling
  * — `⌊(x − min) / (max − min) · (2^bits − 1)⌋` in IEEE doubles, the
  * [[Similarity.quantizeEmbeddings]] int8 recipe — not from sampled
  * range boundaries (production optimizers sample for speed; sampling
  * is a nondeterministic oracle-hostile shortcut the exact min/max
  * aggregate replaces at one extra tiny aggregate). Interleaving is
  * pure integer bit arithmetic, generated from the same constants in
  * both engines.
  *
  * Scale shape: one 2-row aggregate (min/max per column, broadcast
  * back as a cross join — the corpus never shuffles for stats), one
  * narrow projection for the z-value, then ONE range repartition +
  * in-partition sort to lay the data out. `zOrdered` keeps the
  * exchange explicit so writers control file count; per-partition
  * z-ranges are disjoint by construction (range partitioning), which
  * is exactly the property file-level min/max skipping needs —
  * spec-pinned along with the locality win. */
object Layout {

  /** Morton z-value of `cols` (2–3 numeric columns), each normalized to
    * `bits` bits by exact min/max scaling. A collapsed column
    * (max == min) buckets to 0 everywhere and drops out of the curve;
    * NULL — and any non-finite double (NaN / ±Infinity) — in any
    * column yields NULL (sorts first, clustering all incomplete rows
    * together — the layout analogue of a null partition). The
    * non-finite rule is load-bearing, not cosmetic: `max` ranks NaN
    * above every double, so ONE NaN row left in would make `mx` NaN,
    * every scaled value NaN, and the non-ANSI NaN→long cast 0 — the
    * whole dimension silently collapsing to bucket 0 and the z-order
    * degenerating to single-column order with no error anywhere. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    require(cols.size >= 2 && cols.size <= 3, s"z-order wants 2-3 columns: $cols")
    require(bits >= 1 && cols.size * bits <= 62,
      s"bad bit budget: ${cols.size} x $bits")
    def finite(c: Column): Column = {
      val x = c.cast("double")
      when(isnan(x) || x === Double.PositiveInfinity ||
        x === Double.NegativeInfinity, lit(null).cast("double"))
        .otherwise(x)
    }
    val statAggs = cols.flatMap(c => Seq(
      min(finite(col(c))).as(s"_mn_$c"),
      max(finite(col(c))).as(s"_mx_$c")))
    val stats = df.agg(statAggs.head, statAggs.tail: _*)
    val maxBucket = (1L << bits) - 1
    val bucketed = df.crossJoin(broadcast(stats))
      .select(df.columns.map(col) ++ cols.map { c =>
        val x = finite(col(c))
        val mn = col(s"_mn_$c")
        val mx = col(s"_mx_$c")
        val scaled = floor((x - mn) / (mx - mn) * maxBucket).cast("long")
        // null guard FIRST: a constant-but-nullable column must still
        // yield NULL z-values for its null rows (documented contract);
        // the mx===mn branch alone would bucket them to 0
        when(x.isNull, lit(null).cast("long"))
          .when(mx === mn, lit(0L)).otherwise(scaled).as(s"bk_$c")
      }: _*)
    // interleave: bit i of column k lands at position i*ncols + k —
    // column 0 owns the LOW bit of each group, so it is the
    // finest-grained dimension
    val n = cols.size
    val z = (0 until bits).flatMap { i =>
      (0 until n).map { k =>
        shiftleft(shiftright(col(s"bk_${cols(k)}"), i).bitwiseAND(lit(1L)),
          i * n + k)
      }
    }.reduce(_ + _)
    bucketed.withColumn("zvalue", z)
  }

  /** The full layout operator: z-value, range repartition on it, sort
    * within partitions — ready for a parquet write whose files carry
    * disjoint z-ranges. */
  def zOrdered(df: DataFrame, cols: Seq[String], bits: Int = 16,
               numPartitions: Int = 0): DataFrame = {
    val withZ = zValue(df, cols, bits)
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    withZ.repartitionByRange(parts, col("zvalue"))
      .sortWithinPartitions("zvalue")
  }
}
