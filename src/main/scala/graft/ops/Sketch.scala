package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-screened exact aggregation: frequency sketches whose
  * one-sided error turns them into sound PRUNING devices in front of an
  * exact pass, so the result is bit-exact while the shuffle mass scales
  * with the ANSWER size instead of the key cardinality.
  *
  * The flagship member is [[heavyHitters]] — "every key occurring in at
  * least a `1/supportDenom` fraction of rows, with its exact count".
  * The naive plan (`groupBy(key).count().having(...)`) shuffles one
  * record per DISTINCT key; over a 100 TB token / URL / n-gram column
  * that distinct mass is billions of groups of which a few hundred
  * survive the support filter — almost all of the shuffle is spent
  * materializing counts the filter throws away. Here a count-min sketch
  * (Cormode & Muthukrishnan 2005) of FIXED size (depth × width longs,
  * ~320 KB at the defaults) is built in one declarative aggregation,
  * then its estimates screen the second pass: CMS never underestimates,
  * so every truly-heavy key's rows pass the screen (completeness is
  * structural, not probabilistic) and the exact `groupBy` runs only
  * over candidate rows — mass bounded by the heavy keys' own rows plus
  * the ε·N overcount band, not by key cardinality. False positives cost
  * shuffle, never correctness: the final `HAVING` re-checks the EXACT
  * count.
  *
  * Scale shape: two scans of the input (sketch build, screen+count) —
  * the classic trade of a scan for a shuffle, which at 100 TB is the
  * right side of the trade whenever distinct(key) ≫ answer (columnar
  * scans are bandwidth-bound and embarrassingly parallel; a
  * billion-group shuffle is not). The sketch build's map-side combine
  * caps the shuffle at `partitions × depth × width` rows, and the
  * driver holds exactly depth × width longs — the same legitimate
  * model-state class as IVF's centroid table. The probe is the native
  * [[graft.functions.CmsProbe]] kernel (cells as model state, one
  * tight loop), so the screen rides the scan as a narrow codegen'd
  * filter.
  */
object Sketch {

  /** Count-min cell counts for `key`, as `depth` rows of `width`
    * buckets (flattened row-major), plus the total non-null row count.
    * Row `i` buckets by `xxhash64(key, i) mod width` — pairwise
    * independent enough in practice (xxhash64 avalanche), and exactly
    * the expression the probe in [[heavyHitters]] recomputes. Each
    * sketch row sums to N, which the build exploits to return the total
    * without a second aggregate. */
  private[graft] def cmsCells(keyed: DataFrame, depth: Int, width: Int): (Array[Long], Long) = {
    val rows = keyed
      .select(explode(array((0 until depth).map(i =>
        (pmod(xxhash64(col("k"), lit(i)), lit(width.toLong)) + lit(i.toLong * width))
          .cast("long")): _*)).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .collect()
    val cells = new Array[Long](depth * width)
    rows.foreach(r => cells(r.getLong(0).toInt) = r.getLong(1))
    val total = cells.view.slice(0, width).sum // row 0 sums to N
    (cells, total)
  }

  /** Exact heavy hitters by sketch screen + exact verify: all keys with
    * exact count ≥ ⌈N / supportDenom⌉, N = non-null rows. Output
    * `(key, n)` with the EXACT count — the sketch affects intermediate
    * volume only, never the result (estimate ≥ truth ⇒ the screen keeps
    * every qualifying key; the final filter re-checks exactly). The
    * support threshold is integer arithmetic (`n · supportDenom ≥ N`),
    * so any engine computing exact counts agrees bit-for-bit — no
    * double rounding at the boundary.
    *
    * Sizing: overcount ≤ (e/width)·N with probability 1 − e^(−depth)
    * per key; width ≫ supportDenom keeps the false-candidate band — the
    * only cost of undersizing — small. */
  def heavyHitters(df: DataFrame, keyCol: Column, supportDenom: Long,
                   depth: Int = 5, width: Int = 8192): DataFrame = {
    require(supportDenom >= 1, s"supportDenom must be >= 1: $supportDenom")
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    val keyed = df.select(keyCol.as("k")).where(col("k").isNotNull)
    val (cells, total) = cmsCells(keyed, depth, width)
    // probe = min over rows of this key's bucket count, via the native
    // CmsProbe kernel: the cells ride as model state on the expression
    // (bit-parity with the composed literal form is spec-pinned; the
    // literal form prints the full cell array into every plan string)
    val est = graft.functions.CmsProbe.probe(col("k"), cells, depth, width)
    keyed
      .where(est * lit(supportDenom) >= lit(total)) // sound screen: est >= exact
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") * lit(supportDenom) >= lit(total)) // exact verify
  }

  /** Composed-builtin probe (plan-literal cell array), kept as the
    * parity reference for the CmsProbe kernel spec — semantically
    * identical, but prints depth × width longs into the plan text.
    * NULL key ⇒ NULL estimate, the kernel's contract: bare `xxhash64`
    * SKIPS null children (it would hash only the row-seed literal and
    * return a real but meaningless bucket count), so the null must be
    * caught before the hash — a null key has no count to estimate. */
  private[graft] def probeComposed(key: Column, cells: Array[Long],
                                   depth: Int, width: Int): Column = {
    val lut = typedlit(cells.toSeq)
    val rowEsts = (0 until depth).map(i =>
      element_at(lut,
        (pmod(xxhash64(key, lit(i)), lit(width.toLong)) + lit(i.toLong * width + 1))
          .cast("int")))
    when(key.isNull, lit(null).cast("long"))
      .otherwise(if (depth == 1) rowEsts.head else least(rowEsts: _*))
  }
}
