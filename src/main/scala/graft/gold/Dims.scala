package graft.gold

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Projections

/** Dimension builders (SURVEY.md §2 — S7/S8, A6, W2, P5-P8, D3-D7, U1).
  *
  * Gold-layer analogues of the reference's dimension models
  * (`/root/reference/dbt/models/marts/core/dim_*.sql`), re-expressed as
  * reusable DataFrame transforms.
  */
object Dims {

  /** S8 + D3–D7 + P8 — generated date dimension (date spine).
    * Ref: `dim_date.sql:3-17` — `unnest(generate_date_array(start, end))`
    * plus calendar attribute columns. Spark `sequence` over dates is
    * end-inclusive, matching BigQuery's generate_date_array.
    *
    * Scale note: the spine is tiny (5,844 rows for 2015–2030) — it is
    * generated on one task and always broadcast into joins. Week-of-year
    * is carried in BOTH calendars: `week_of_year` is ISO-8601
    * (`weekofyear`, Monday-start), `week_of_year_sunday` is BigQuery's
    * `EXTRACT(WEEK ...)` Sunday-start 0–53 ([[Projections.bqWeek]]),
    * matching the reference `dim_date.sql:14` exactly (SURVEY.md D6). */
  def dateSpine(spark: SparkSession, start: String, end: String): DataFrame = {
    val days = spark.range(1).select(
      explode(sequence(
        to_date(lit(start)), to_date(lit(end)))).as("calendar_date"))
    days.select(
      Projections.dateKey(col("calendar_date")).as("date_key"),
      col("calendar_date"),
      year(col("calendar_date")).as("year"),
      quarter(col("calendar_date")).as("quarter"),
      month(col("calendar_date")).as("month"),
      weekofyear(col("calendar_date")).as("week_of_year"),
      Projections.bqWeek(col("calendar_date")).as("week_of_year_sunday"),
      dayofweek(col("calendar_date")).as("day_of_week"),
      Projections.isWeekend(col("calendar_date")).as("is_weekend"))
  }

  /** A6 + W2 + P5 — distinct-values dimension with a dense surrogate key
    * 1..N. Ref: `dim_product.sql:4-17`, `dim_dealer.sql:4-18`.
    *
    * `keepNull = true` admits a NULL natural key as a dimension row
    * (keyed first — Spark sorts nulls first ascending): the reference's
    * dim_product has NO null filter (`dim_product.sql:4-7`, a bare
    * SELECT DISTINCT) while dim_dealer filters explicitly
    * (`dim_dealer.sql:7`) — the flag mirrors that asymmetry instead of
    * silently null-filtering both.
    *
    * Scale note: the unpartitioned `row_number` forces all distinct keys
    * through one task — correct for dimension-sized outputs (≤ millions).
    * For dimensions that would not fit one task, use
    * [[surrogateDimScalable]] instead.
    *
    * `extras` expressions may reference ONLY the natural key (plus
    * literals/functions over it): they evaluate on the distinct-key
    * frame, which carries no other source column — an extra reading a
    * second `src` column fails with UNRESOLVED_COLUMN at plan time.
    * Attributes that genuinely come from other columns belong in a join
    * against the keyed output, where the one-value-per-key question is
    * explicit. */
  def surrogateDim(src: DataFrame, naturalKey: String, keyName: String,
                   extras: Seq[(String, Column)] = Nil,
                   keepNull: Boolean = false): DataFrame = {
    val distinctAll = src.select(naturalKey).distinct()
    val distinctKeys =
      if (keepNull) distinctAll else distinctAll.where(col(naturalKey).isNotNull)
    val keyed = distinctKeys.withColumn(
      keyName, row_number().over(Window.orderBy(col(naturalKey))).cast("long"))
    val cols = col(keyName) +: col(naturalKey) +: extras.map { case (a, e) => e.as(a) }
    keyed.select(cols: _*)
  }

  /** Dense 1..N keys for EVERY ROW without a global sort — the
    * fact-scale keying primitive shared by [[surrogateDimScalable]] and
    * fact builders (e.g. BankMarts.fDefaultEvent): partition-local
    * row_number plus cumulative per-partition offsets (two narrow passes
    * and a broadcast of the tiny offset table — no single-task
    * bottleneck). Keys are dense and unique; their assignment follows
    * the partition layout, not a global order — the surrogate-key
    * contract is uniqueness, not ordering. `localOrder` pins the
    * within-partition order for determinism under a fixed layout. */
  def denseRowKeys(df: DataFrame, keyName: String,
                   localOrder: Seq[Column]): DataFrame = {
    val reserved = Seq("_pid", "_local", "_offset")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"input must not carry reserved column(s) ${clash.mkString(", ")}")
    // cached: the offset build and the probe join BOTH read this frame,
    // and spark_partition_id makes the branches layout-sensitive — an
    // uncached double evaluation over a nondeterministic upstream
    // (sample/limit/shuffle re-plan) could observe two different
    // partitionings, and offsets computed on one layout joined onto the
    // other silently collide keys. One materialization = one layout.
    val withPart = graft.ops.OpCaches.registered(df
      .withColumn("_pid", spark_partition_id())
      .withColumn("_local", row_number().over(
        Window.partitionBy(col("_pid")).orderBy(localOrder: _*))))
    val offsets = withPart.groupBy("_pid")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset",
        coalesce(sum(col("_cnt")).over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    withPart.join(broadcast(offsets.select("_pid", "_offset")), Seq("_pid"))
      .withColumn(keyName, (col("_local") + col("_offset")).cast("long"))
      .drop("_pid", "_local", "_offset")
  }

  /** W2 at 100 TB — surrogate keys without a global sort
    * ([[denseRowKeys]] over the distinct key set). */
  def surrogateDimScalable(src: DataFrame, naturalKey: String, keyName: String): DataFrame = {
    val distinctKeys = src.select(naturalKey).where(col(naturalKey).isNotNull).distinct()
    denseRowKeys(distinctKeys, keyName, Seq(col(naturalKey)))
      .select(col(keyName), col(naturalKey))
  }

  /** S7 + U1 + W2 + P7 — constant inline status dimension via literal rows
    * UNION ALL, with a performing/non-performing recode and surrogate key.
    * Ref: `dim_contract_status.sql:1-16`. */
  def contractStatusDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq("ACTIVE", "CLOSED", "DEFAULTED", "WRITTEN_OFF")
    // Literal single-row frames unioned — mirrors the reference's
    // SELECT ... UNION ALL shape (not a fused Seq.toDF).
    val unioned = rows.map(s => Seq(s).toDF("status_code")).reduce(_.union(_))
    unioned.select(
      row_number().over(Window.orderBy(col("status_code"))).cast("long").as("status_key"),
      col("status_code"),
      Projections.recodeIn(col("status_code"), Seq("ACTIVE", "CLOSED"),
        "PERFORMING", "NON_PERFORMING").as("performance_class"))
  }
}
