package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 merge — the dimension-history
  * operator a full-refresh warehouse (the reference rebuilds every model
  * per run, `dbt run` semantics) grows into once history must be kept.
  *
  * Batch merge semantics (deterministic, no MERGE statement needed):
  * given the current dimension state (each row carrying
  * `valid_from`/`valid_to`/`is_current`) and a batch of updates
  * effective at `effectiveDate`:
  *  - a changed row (any tracked attribute differs) closes the current
  *    version (`valid_to` = effectiveDate, `is_current` = false) and
  *    appends a new current version;
  *  - an unchanged row passes through untouched;
  *  - a brand-new key appends its first version;
  *  - historical (already-closed) rows pass through untouched.
  *
  * Scale shape: one equi-join of current-state rows to updates on the
  * natural key (hash shuffle on the key, or broadcast when the update
  * batch is dimension-sized) + a union — no window over history, so
  * cost is O(current + updates), independent of how much history has
  * accumulated. The attribute comparison is null-safe (`<=>`).
  */
object Scd2 {

  val OpenEnd = "9999-12-31"

  /** Initialize a dimension's SCD2 state from its first snapshot. */
  def init(snapshot: DataFrame, effectiveDate: String): DataFrame =
    snapshot
      .withColumn("valid_from", lit(effectiveDate).cast("date"))
      .withColumn("valid_to", lit(OpenEnd).cast("date"))
      .withColumn("is_current", lit(true))

  /** Apply one update batch. `tracked` are the change-detected attribute
    * columns; `updates` must carry the natural key + tracked columns and
    * ONE row per NON-NULL key — a multi-row key (e.g. a CDC batch
    * spanning two change events) would fan the current row out into
    * duplicate closed copies and open multiple current versions, and a
    * NULL key would never equi-join, appending one more open version per
    * merge. Both preconditions are checked with one aggregate on the
    * update batch (dimension-sized by definition); pass
    * `assumeUniqueKeys = true` to skip the action when the caller has
    * already deduplicated and null-filtered (e.g. via
    * [[graft.ops.Dedup.firstPerKey]] on event time after a null guard). */
  def merge(state: DataFrame, updates: DataFrame, naturalKey: String,
            tracked: Seq[String], effectiveDate: String,
            assumeUniqueKeys: Boolean = false): DataFrame = {
    require(tracked.nonEmpty,
      "tracked must name at least one change-detected column " +
        "(an empty list would crash the change predicate)")
    if (!assumeUniqueKeys) {
      // null keys corrupt silently, not loudly: equi-joins never match
      // null, so a null-key row is never closed AND always re-admitted
      // as 'brand new' — each merge would append one more open version
      val bad = updates.groupBy(col(naturalKey)).count()
        .where(col("count") > 1 || col(naturalKey).isNull).limit(1).collect()
      require(bad.isEmpty,
        if (bad.nonEmpty && bad.head.isNullAt(0))
          s"update batch has a null $naturalKey — SCD2 equi-joins never " +
            "match null, so each merge would append another open version; " +
            "filter or repair null keys upstream"
        else
          s"update batch has multiple rows for $naturalKey=${bad.headOption.map(_.get(0)).orNull}")
    }
    // the state schema is exactly key + tracked + SCD bookkeeping;
    // surrogate keys and derived attributes belong downstream of the
    // merge (they would be unassignable for fresh versions here)
    require(state.columns.toSet ==
      (Set(naturalKey, "valid_from", "valid_to", "is_current") ++ tracked),
      s"state schema ${state.columns.mkString(",")} != key+tracked+scd columns")
    val hist = state.where(!col("is_current"))
    val cur = state.where(col("is_current"))
    // friendly validation BEFORE the select — after it, the select
    // itself would already have thrown a generic UNRESOLVED_COLUMN,
    // making a post-select require dead code
    (naturalKey +: tracked).foreach(t =>
      require(updates.columns.contains(t), s"updates missing $t"))
    val upd = updates.select(col(naturalKey) +: tracked.map(col): _*)
      .withColumnRenamed(naturalKey, "_uk")
    val renamedUpd = tracked.foldLeft(upd)((d, t) => d.withColumnRenamed(t, s"_u_$t"))
    val joined = cur.join(renamedUpd, col(naturalKey) === col("_uk"), "left")
    val changed = tracked.map(t => !(col(t) <=> col(s"_u_$t"))).reduce(_ || _)
    // current rows: close the changed ones, keep the rest verbatim
    val stateCols = state.columns.toSeq
    val kept = joined.select(stateCols.map {
      case "valid_to" =>
        when(col("_uk").isNotNull && changed, lit(effectiveDate).cast("date"))
          .otherwise(col("valid_to")).as("valid_to")
      case "is_current" =>
        when(col("_uk").isNotNull && changed, lit(false))
          .otherwise(col("is_current")).as("is_current")
      case c => col(c)
    }: _*)
    // new versions: changed keys + brand-new keys
    val curKeyed = cur.select(col(naturalKey).as("_ck") +: tracked.map(t => col(t).as(s"_c_$t")): _*)
    val newVersions = upd.join(curKeyed, col("_uk") === col("_ck"), "left")
      .where(col("_ck").isNull ||
        tracked.map(t => !(col(t) <=> col(s"_c_$t"))).reduce(_ || _))
      .select(col("_uk").as(naturalKey) +: tracked.map(col): _*)
    val opened = init(newVersions, effectiveDate)
      .select(stateCols.map(col): _*)
    hist.unionByName(kept).unionByName(opened)
  }

  /** Point-in-time lookup: the version of each key valid on `asOf`. */
  def asOf(state: DataFrame, asOfDate: String): DataFrame =
    state.where(col("valid_from") <= lit(asOfDate).cast("date") &&
      col("valid_to") > lit(asOfDate).cast("date"))
}
