package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table reconciliation: key-aligned diff of two table versions — the
  * validation primitive behind migration sign-off ("does the new
  * pipeline produce the old table?"), CDC audit, and backfill review.
  * Row-level status per key (`added` / `removed` / `changed` / `same`)
  * and a one-row summary with per-column change counts.
  *
  * Scale shape: ONE full-outer shuffle join on the key columns — both
  * sides co-partition, nothing collects, and the comparison predicate
  * is a narrow projection over the joined row. The summary is a
  * global aggregate of that frame (output-sized). At 100 TB this is
  * the honest minimum: a diff must read both sides once; bucketed or
  * pre-partitioned-by-key tables make the join exchange-free.
  *
  * Comparison is null-safe (`<=>`): a NULL→value or value→NULL flip
  * counts as a change, NULL→NULL does not. Key columns must be unique
  * per side (the usual reconciliation contract); duplicate keys fan
  * out the join exactly like any keyed merge would. */
object Diff {

  /** Row-level diff: key columns + `status`, plus each side's payload
    * columns (left as-is, right suffixed `_r`). */
  def diff(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val payload = left.columns.filterNot(keys.contains)
    require(payload.sameElements(right.columns.filterNot(keys.contains)),
      s"schemas disagree: ${left.columns.toSeq} vs ${right.columns.toSeq}")
    // the diff manufactures status/_l/_r and a _r-suffixed twin of every
    // payload column — an input already carrying one of those names
    // would silently corrupt statuses or fail ambiguously downstream
    val generated = Set("status", "_l", "_r") ++ payload.map(c => s"${c}_r")
    val clash = left.columns.toSet.intersect(generated)
    require(clash.isEmpty,
      s"input columns collide with diff-generated names: $clash")
    val l = left.withColumn("_l", lit(1))
    val r = payload.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"${c}_r"))
      .withColumn("_r", lit(1))
    val anyChanged = payload.map(c => !(col(c) <=> col(s"${c}_r")))
      .reduceOption(_ || _).getOrElse(lit(false))
    l.join(r, keys, "full_outer")
      .withColumn("status",
        when(col("_l").isNull, "added")
          .when(col("_r").isNull, "removed")
          .when(anyChanged, "changed")
          .otherwise("same"))
      .drop("_l", "_r")
  }

  /** One-row reconciliation summary: per-status row counts plus, for
    * every payload column, the number of keys present on both sides
    * whose value changed. */
  def diffSummary(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val payload = left.columns.filterNot(keys.contains)
    val d = diff(left, right, keys)
    val statusCounts = Seq("added", "removed", "changed", "same").map(s =>
      sum(when(col("status") === s, 1L).otherwise(0L)).as(s"n_$s"))
    val colCounts = payload.map(c =>
      sum(when(col("status").isin("changed", "same") && !(col(c) <=> col(s"${c}_r")),
        1L).otherwise(0L)).as(s"changed_$c"))
    d.agg((statusCounts ++ colCounts).head, (statusCounts ++ colCounts).tail: _*)
  }

  /** Order/partition/layout-independent content fingerprint per group
    * — the ZERO-co-location reconciliation primitive. [[diff]] needs
    * one full-outer shuffle join with both tables on the same cluster;
    * a checksum compares tables that live on DIFFERENT clusters (or
    * different engines — the migration sign-off case) by exchanging
    * one tiny row per group. Each row canonicalizes to a string (every
    * hashed column cast to string; NULL → a `\u0000` sentinel no cast
    * produces; `\u0001`-joined), hashes through md5, and the group
    * fingerprint is the exact integer SUM of the rows' leading-60-bit
    * hash values. Summation is commutative, so partitioning, file
    * layout and row order are invisible; any single-row difference
    * shifts the sum, and making two DIFFERENT row multisets collide
    * needs engineered md5 preimages, not bad luck (~2⁻³⁰ per compared
    * group pair by birthday bound at a billion rows).
    *
    * The checksum is emitted as a decimal STRING: the sum is exact
    * decimal internally and a double would round away the low bits —
    * exactly the bits a one-row difference moves.
    *
    * Canonicalization contract (what makes the fingerprint
    * engine-portable, hash-verified cross-engine by
    * `q_table_checksum`): integers, decimals, dates, timestamps and
    * strings cast to identical strings in Spark and DuckDB; FLOATING
    * POINT does not (engines disagree on shortest-roundtrip
    * rendering) — cast doubles to an explicit decimal scale first and
    * the fingerprint inherits decimal's exactness. Scale shape: one
    * narrow projection + one hash aggregate keyed on the group
    * columns; nothing but the group rows moves. */
  def contentChecksum(df: DataFrame, groupCols: Seq[String],
                      hashCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(hashCols.nonEmpty, "checksum needs at least one hashed column")
    val canon = hashCols.map(c => coalesce(c.cast("string"), lit("\u0000")))
    val rowHash = conv(substring(md5(concat_ws("\u0001", canon: _*)), 1, 15), 16, 10)
      .cast("decimal(20,0)")
    val aggs = Seq(count(lit(1)).as("n_rows"),
      sum(rowHash).cast("string").as("checksum"))
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
