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
    * Scale note: the unpartitioned `row_number` forces all distinct keys
    * through one task — correct for dimension-sized outputs (≤ millions).
    * For dimensions that would not fit one task, use
    * [[surrogateDimScalable]] instead. */
  def surrogateDim(src: DataFrame, naturalKey: String, keyName: String,
                   extras: Seq[(String, Column)] = Nil): DataFrame = {
    val distinctKeys = src.select(naturalKey).where(col(naturalKey).isNotNull).distinct()
    val keyed = distinctKeys.withColumn(
      keyName, row_number().over(Window.orderBy(col(naturalKey))).cast("long"))
    val cols = col(keyName) +: col(naturalKey) +: extras.map { case (a, e) => e.as(a) }
    keyed.select(cols: _*)
  }

  /** W2 at 100 TB — surrogate keys without a global sort: partition-local
    * `monotonically_increasing_id` densified to 1..N by adding per-partition
    * offsets (two narrow passes, no single-task bottleneck). Keys are dense
    * and unique but their assignment order follows the hash-partitioning of
    * the distinct, not a global sort — acceptable for surrogate keys, whose
    * only contract is uniqueness. */
  def surrogateDimScalable(src: DataFrame, naturalKey: String, keyName: String): DataFrame = {
    val distinctKeys = src.select(naturalKey).where(col(naturalKey).isNotNull).distinct()
    val withPart = distinctKeys
      .withColumn("_pid", spark_partition_id())
      .withColumn("_local", row_number().over(
        Window.partitionBy(col("_pid")).orderBy(col(naturalKey))))
    val offsets = withPart.groupBy("_pid")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset",
        coalesce(sum(col("_cnt")).over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    withPart.join(broadcast(offsets.select("_pid", "_offset")), Seq("_pid"))
      .select((col("_local") + col("_offset")).cast("long").as(keyName), col(naturalKey))
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
