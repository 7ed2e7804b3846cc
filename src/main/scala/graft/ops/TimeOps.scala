package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}

/** Event-time operators over keyed streams-as-tables: gap-based
  * sessionization and as-of joins.
  *
  * Both are composed from windows — no custom SparkPlan needed: the
  * shuffle is one hash-exchange on the key, the per-key work is a local
  * sort. Sessionization is the batch mirror of
  * streaming.EventStream.sessionize.
  */
object TimeOps {

  /** Microsecond-exact epoch integer for gap arithmetic, tolerant of
    * both timestamp flavors: parquet written without a timezone
    * annotation (arrow/duckdb writers, some lakehouse tables) reads as
    * TIMESTAMP_NTZ, which `unix_micros` rejects outright. The NTZ
    * branch reinterprets the wall-clock in the session timezone; gap
    * decisions compare DIFFERENCES, so the reinterpretation offset
    * cancels (exactly under a fixed-offset session timezone — the
    * engine pins UTC; only a DST-transition inside a gap under a
    * DST session zone could shift a boundary by the DST delta). */
  private def tsMicros(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case _                => unix_micros(col(tsCol))
    }

  /** Gap-based sessionization: a new session starts when the gap from
    * the previous event of the same key exceeds `gapSeconds`. Session
    * ids are dense per key (1..N) via a cumulative sum of
    * session-boundary flags — the standard two-window composition.
    * Gaps are measured on MICROSECOND-exact integer timestamps
    * (unix_micros): second-truncated stamps would merge a 1800.9 s gap
    * into an 1800 s threshold (and the SQL mirror is epoch_us, equally
    * exact — no floating point anywhere in the boundary decision). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Long, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), tieBreak)
    val m = tsMicros(df, tsCol)
    val gap = m - lag(m, 1).over(w)
    val isNew = when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Binned interval-containment join (range join): left rows matched to
    * right intervals with `start ≤ ts ≤ end`. Spark has no native range
    * join — a naive formulation is a broadcast nested loop (quadratic
    * scans). The bin trick makes it an EQUI-join: left rows key by
    * `floor(ts / binSeconds)`, intervals explode one row per covered
    * bin, the join is hash on bin id, and the exact containment filter
    * runs on the (bin-bounded) matches. Each (row, interval) match
    * lands in exactly one bin — the row's own — so no post-join dedup
    * is needed.
    *
    * Scale: interval replication is len/binSeconds rows, so pick
    * binSeconds near the median interval length; fan-out is bounded and
    * the shuffle carries bin ids, not cross products. Hot bins (many
    * rows and intervals in one time slice) are ordinary join skew — AQE
    * skew-join splits them. Timestamp truncation to seconds for binning
    * is monotone, so bin(ts) always lies within [bin(start), bin(end)];
    * the exact filter uses full-precision timestamps. Intervals with
    * `end < start` are dropped (Spark's `sequence` would count DOWN and
    * fabricate bins). Column names must be disjoint between the two
    * frames (equi-join on the synthesized bin only). */
  def binnedRangeJoin(left: DataFrame, leftTs: String,
                      right: DataFrame, startCol: String, endCol: String,
                      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    require(!left.columns.contains("_bin") && !right.columns.contains("_bin"),
      "inputs must not carry a _bin column (it would be silently clobbered)")
    val lb = left.withColumn("_bin",
      floor(unix_timestamp(col(leftTs)) / binSeconds).cast("long"))
    val rb = right
      .where(col(endCol) >= col(startCol))
      .withColumn("_bin", explode(sequence(
        floor(unix_timestamp(col(startCol)) / binSeconds).cast("long"),
        floor(unix_timestamp(col(endCol)) / binSeconds).cast("long"))))
    lb.join(rb, Seq("_bin"))
      .where(col(leftTs) >= col(startCol) && col(leftTs) <= col(endCol))
      .drop("_bin")
  }

  /** Per-session rollup on top of [[sessionize]]. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   gapSeconds: Long, tieBreak: Column): DataFrame =
    sessionize(df, keyCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).cast("date").as("session_date"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("session_seconds"))

  /** As-of join (backward): for each left row, attach the latest right
    * payload with `rightTs` ≤ left ts within the same key — the operator
    * Spark lacks natively (DuckDB: ASOF JOIN; no match → null payload).
    *
    * Composition: tag and union both sides, then one window per key
    * ordered by (ts, side) carries the last-seen right payload forward
    * (`last(_, ignoreNulls)` over preceding rows); keep left rows. One
    * shuffle on the key, a local sort per partition — no range-join
    * explosion, no custom SparkPlan. Right rows sort before left rows at
    * equal ts, so an exact-tie right row IS visible (ASOF `<=`).
    *
    * Returns the left frame plus an `_asof` struct of `rightPayload`
    * columns (null when no prior right row exists). */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keyCol: String,
                       leftTs: String, rightTs: String,
                       rightPayload: Seq[String],
                       rightTieBreak: Option[Column] = None): DataFrame = {
    // same loud-clobber guard as binnedRangeJoin's _bin: a left _asof
    // would be silently overwritten by the result column; _ts/_side/
    // _tie/_payload would collide inside the tagged union
    val reserved = Seq("_asof", "_ts", "_side", "_tie", "_payload")
    val clash = left.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"left frame must not carry reserved column(s) ${clash.mkString(", ")} " +
        "(synthesized by the as-of union); rename them first")
    val payloadType = StructType(right.select(rightPayload.map(col): _*).schema.fields)
    val otherCols = left.columns.filterNot(c => c == keyCol || c == leftTs).toSeq
    // rightTieBreak makes the winner among right rows sharing (key, ts)
    // deterministic (last in tie order wins); left rows sort after all
    // right rows at equal ts regardless, so it never affects visibility
    val l = left.select(
      Seq(col(keyCol), col(leftTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast("bigint").as("_tie"),
        lit(null).cast(payloadType).as("_payload")) ++ otherCols.map(col): _*)
    val r = right.select(
      Seq(col(keyCol), col(rightTs).as("_ts"), lit(0).as("_side"),
        rightTieBreak.getOrElse(lit(0L)).cast("bigint").as("_tie"),
        struct(rightPayload.map(col): _*).as("_payload")) ++
        otherCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keyCol).orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .drop("_side", "_tie", "_payload")
      .withColumnRenamed("_ts", leftTs)
  }
}
