package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / casting / scalar-expression operators (SURVEY.md §2.2, §2.9).
  *
  * These reproduce the reference's staging patterns
  * (`/root/reference/dbt/models/staging/stg_corebank_loans.sql:7-68`,
  * `/root/reference/dbt/macros/stg_generic.sql:1-13`,
  * `/root/reference/include/load_raw_to_bq.py:10-30`) as reusable
  * Column-level building blocks. Everything here is composed Spark
  * built-ins — codegen'd, null-safe, and pushdown-friendly; no UDFs.
  */
object Projections {

  /** BigQuery NUMERIC equivalence for bank-model money/ratio columns —
    * the single source of truth (Staging and BankMarts both cast
    * through it; two local copies could drift silently). */
  val BqNumeric = "decimal(38,9)"

  /** S2 — header sanitize: `.` → `_` in column names (schema-level rename,
    * zero data movement). Ref: `load_raw_to_bq.py:10-30`,
    * `scripts/clean_vehicle_loans.py:16-22`. */
  def sanitizeHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.replace(".", "_")): _*)

  /** M6 — generic staging macro: alias→expression map → SELECT.
    * Ref: `dbt/macros/stg_generic.sql:1-13`. Ordered Seq (not Map) so the
    * output column order is deterministic. */
  def stgGeneric(src: DataFrame, columns: Seq[(String, Column)]): DataFrame =
    src.select(columns.map { case (alias, expr) => expr.as(alias) }: _*)

  /** P2 — SAFE.PARSE_DATE('%d-%m-%y', x) with BigQuery two-digit-year
    * semantics. BQ `%y` pivots 69–99 → 19xx, 00–68 → 20xx; Java/Spark `yy`
    * maps everything to 20xx. Parse with `yy` (null on malformed input —
    * Spark's non-ANSI `to_date` matches SAFE), then shift any year > pivot
    * back a century. Ref: `stg_corebank_loans.sql:15-16`,
    * `auto_data_adapter.py:123,134`. */
  def safeParseDate2(c: Column, fmt: String = "dd-MM-yy", pivot: Int = 2068): Column = {
    val d = try_to_date(c, fmt) // try_: Spark 4 ANSI to_date throws on malformed
    when(year(d) > pivot, add_months(d, -1200)).otherwise(d)
  }

  /** D4 — smart date key: `format_date('%Y%m%d', d)` cast to int64.
    * Ref: `dim_date.sql:9`, `f_payment_transaction.sql:6`. */
  def dateKey(c: Column): Column = date_format(c, "yyyyMMdd").cast("long")

  /** P6 — banded bucketing (age bands). BigQuery `DATE_DIFF(a, b, YEAR)`
    * counts year *boundaries* (= year(a) - year(b)), not full years — this
    * helper reproduces exactly that. Ref: `dim_customer.sql:21-26`. */
  def yearDiff(a: Column, b: Column): Column = year(a) - year(b)

  /** P6 — CASE banding over a numeric column with a null bucket.
    * `bounds` are inclusive-exclusive upper bounds paired with labels;
    * values ≥ last bound get `lastLabel`. */
  def band(c: Column, bounds: Seq[(Double, String)], lastLabel: String,
           nullLabel: String = "unknown"): Column = {
    val base: Column = when(c.isNull, nullLabel)
    val withBounds = bounds.foldLeft(base) { case (acc, (ub, label)) =>
      acc.when(c < ub, label)
    }
    withBounds.otherwise(lastLabel)
  }

  /** P7 — set-membership recode: IN-list → label, else other label.
    * Ref: `dim_contract_status.sql:6-9`. */
  def recodeIn(c: Column, members: Seq[String], hit: String, miss: String): Column =
    when(c.isin(members: _*), hit).otherwise(miss)

  /** P8 — weekend flag; both Spark and BQ use 1=Sunday..7=Saturday.
    * Ref: `dim_date.sql:16`. */
  def isWeekend(d: Column): Column = dayofweek(d).isin(1, 7)

  /** D6 — BigQuery `EXTRACT(WEEK FROM d)`: Sunday-start week-of-year in
    * [0, 53], where week 1 begins on the year's first Sunday and dates
    * before it are week 0 (C strftime `%U` semantics — the independent
    * DuckDB oracle). Spark's `weekofyear` is ISO-8601 (Monday-start,
    * 1–53, week 1 owns Jan 4) — a different partition of the calendar,
    * so the reference's `dim_date.sql:14` needs this composed form.
    *
    * Implemented identity:
    *   week(d) = floor((dayofyear(d) + (dayofweek(Jan 1) + 5) % 7) / 7)
    * With dayofweek in 1=Sun..7=Sat, the offset (dow + 5) % 7 equals
    * 7 − dayofyear(first Sunday of the year): 6 when Jan 1 is itself a
    * Sunday, 0 when it is a Monday (first Sunday = Jan 7), … 5 when a
    * Saturday. So equivalently
    *   week(d) = floor((dayofyear(d) + 7 − dayofyearOfFirstSunday) / 7),
    * which counts 0 for days before the first Sunday and increments on
    * each Sunday after it. Anchors: Jan-1-on-Sunday → floor((1+6)/7)=1
    * (week 1 starts Jan 1, %U convention); Jan-1-on-Monday →
    * floor((1+0)/7)=0 through Jan 6, then Jan 7 (the first Sunday) →
    * floor(7/7)=1. Exhaustively pinned against strftime %U for every
    * Jan-1 weekday and the full 16-year spine (`OpsSpec` "bqWeek").
    * All-integer arithmetic on values ≤ 372 — exact, codegen'd, no UDF. */
  def bqWeek(d: Column): Column =
    floor((dayofyear(d) + (dayofweek(trunc(d, "year")) + lit(5)) % 7) / 7)
      .cast("int")
}
