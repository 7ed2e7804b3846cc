package graft.adapt

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Projections

/** M1–M3 — schema-adaptive ingestion: detect which dataset family a frame
  * belongs to from its columns, map columns to the canonical loan schema
  * via synonym lists, and produce the staging transform.
  *
  * Re-expressed from `/root/reference/include/auto_data_adapter.py`:
  * detection `:55-68`, synonym mapping `:16-47,70-82`, staging codegen
  * `:84-172`. Where the reference generates SQL text, this produces a
  * `DataFrame => DataFrame` directly (the Spark-native form of codegen:
  * a Column plan, not a string) — [[stagingSql]] still renders SQL text
  * for inspection parity.
  *
  * Everything here is driver-side metadata work on `df.columns` — no data
  * is read beyond what the caller already has, so it costs nothing at
  * 100 TB.
  */
object DatasetAdapter {

  sealed trait DatasetType { def name: String }
  case object HomeCredit extends DatasetType { val name = "home_credit" }
  case object VehicleLoan extends DatasetType { val name = "vehicle_loan" }
  case object Generic extends DatasetType { val name = "generic" }

  /** M1 — detection by marker columns (`auto_data_adapter.py:55-68`). */
  def detect(columns: Seq[String]): DatasetType = {
    val lower = columns.map(_.toLowerCase).toSet
    if (lower.contains("sk_id_curr")) HomeCredit
    else if (lower.contains("uniqueid") && lower.contains("disbursaldate")) VehicleLoan
    else Generic
  }

  /** Canonical column → synonyms, first match wins — the full
    * `COLUMN_MAPPINGS` table (`auto_data_adapter.py:16-47`). Synonyms are
    * matched case-insensitively against sanitized headers. */
  val synonyms: Seq[(String, Seq[String])] = Seq(
    "loan_id"          -> Seq("uniqueid", "sk_id_curr", "loan_id", "application_id", "contract_id"),
    "customer_id"      -> Seq("uniqueid", "sk_id_curr", "customer_id", "client_id"),
    "loan_amount"      -> Seq("disbursed_amount", "amt_credit", "loan_amount", "credit_amount"),
    "asset_cost"       -> Seq("asset_cost", "amt_goods_price", "goods_price"),
    "application_date" -> Seq("disbursaldate", "days_decision", "application_date", "disbursal_date"),
    "date_of_birth"    -> Seq("date_of_birth", "days_birth"),
    "loan_default"     -> Seq("loan_default", "target", "default_flag"),
    "employment_type"  -> Seq("employment_type", "name_income_type", "occupation_type"),
    "gender"           -> Seq("code_gender", "gender"),
    "state_id"         -> Seq("state_id", "region_rating_client"),
    "branch_id"        -> Seq("branch_id", "dealer_id"),
    "pincode_id"       -> Seq("current_pincode_id", "region_population_relative"),
    "product_id"       -> Seq("manufacturer_id", "product_id", "name_contract_type"),
    "credit_score"     -> Seq("perform_cns_score", "ext_source_1", "ext_source_2", "ext_source_3"),
    "ltv_ratio"        -> Seq("ltv", "amt_credit_sum_debt"))

  /** M2 — resolve canonical → actual column name (first synonym present).
    * Returns the mapping for columns that resolved. */
  def mapColumns(columns: Seq[String]): Map[String, String] = {
    val byLower = columns.map(col => col.toLowerCase -> col).toMap
    synonyms.flatMap { case (canonical, syns) =>
      syns.collectFirst { case s if byLower.contains(s) => canonical -> byLower(s) }
    }.toMap
  }

  /** Type class for a canonical column (drives the cast the staging
    * transform applies — `auto_data_adapter.py:98-164`: ids and
    * attributes as string, money/ratios as numeric, target and credit
    * score as int64). */
  private val typeClass: Map[String, String] = Map(
    "loan_id" -> "string", "customer_id" -> "string", "branch_id" -> "string",
    "pincode_id" -> "string", "product_id" -> "string", "state_id" -> "string",
    "employment_type" -> "string", "gender" -> "string",
    "loan_amount" -> "decimal(38,9)", "asset_cost" -> "decimal(38,9)",
    "ltv_ratio" -> "decimal(38,9)",
    "loan_default" -> "long", "credit_score" -> "long")

  /** The reference's date-decode heuristic (`auto_data_adapter.py:113-135`):
    * a date sourced from a column whose NAME contains "days" is a signed
    * day offset (Home Credit DAYS_BIRTH / DAYS_DECISION) decoded against
    * an anchor date; anything else is a 'dd-MM-yy' formatted string.
    * The anchor replaces the reference's current_date() for determinism. */
  private def isDayOffset(actual: String): Boolean =
    actual.toLowerCase.contains("days")

  /** Synonym resolution with [[analyze]]'s header-sanitize parity:
    * matching happens on sanitized names (so a raw dotted header like
    * `loan.id` maps exactly as analyze reports), but the returned
    * actuals are the ORIGINAL names so the staging transform references
    * columns that exist in the frame. Fails fast when nothing maps —
    * a zero-column staging projection has no SQL rendering, and the
    * Column path silently emitting an empty frame while [[stagingSql]]
    * throws would break the two surfaces' semantic identity. */
  private def resolveMapping(columns: Seq[String]): Map[String, String] = {
    val sanitizedToOriginal = columns.map(c => c.replace(".", "_") -> c).toMap
    val mapping = mapColumns(columns.map(_.replace(".", "_"))).map {
      case (canon, sanitized) => canon -> sanitizedToOriginal(sanitized)
    }
    require(mapping.nonEmpty,
      s"no canonical columns resolved from headers ${columns.mkString(", ")} — " +
        "nothing to stage (check the synonym table)")
    mapping
  }

  /** M3 — build the staging transform for a detected dataset: canonical
    * casts plus the day-offset/string date decode chosen per source
    * column. */
  def stagingTransform(columns: Seq[String],
                       anchor: String = "2026-01-01"): DataFrame => DataFrame = {
    val mapping = resolveMapping(columns)
    val exprs: Seq[(String, Column)] = mapping.toSeq.sortBy(_._1).map {
      case (canon @ ("date_of_birth" | "application_date"), actual) if isDayOffset(actual) =>
        canon -> date_add(to_date(lit(anchor)), colOf(actual).cast("int"))
      case (canon @ ("date_of_birth" | "application_date"), actual) =>
        canon -> Projections.safeParseDate2(colOf(actual).cast("string"))
      case (canonical, actual) =>
        canonical -> colOf(actual).cast(typeClass.getOrElse(canonical, "string"))
    }
    df => Projections.stgGeneric(df, exprs)
  }

  /** Column reference for a RAW header: a dotted name (`loan.id`) must
    * be backtick-quoted or `col` parses the dot as struct-field access;
    * same quoting in the SQL rendering. */
  private def colOf(actual: String): Column =
    if (actual.contains(".")) col(s"`$actual`") else col(actual)
  private def sqlRef(actual: String): String =
    if (actual.matches("[A-Za-z_][A-Za-z0-9_]*")) actual else s"`$actual`"

  /** M3 (text form) — render the staging transform as Spark SQL for
    * inspection or execution, mirroring the reference's SQL codegen
    * output. Must stay semantically identical to [[stagingTransform]] —
    * including the pinned anchor for day-offset decoding (current_date()
    * would break determinism and diverge from the Column path). */
  def stagingSql(columns: Seq[String], table: String,
                 anchor: String = "2026-01-01"): String = {
    val mapping = resolveMapping(columns)
    val selects = mapping.toSeq.sortBy(_._1).map {
      case (canon @ ("date_of_birth" | "application_date"), actual) if isDayOffset(actual) =>
        s"date_add(to_date('$anchor'), cast(${sqlRef(actual)} as int)) as $canon"
      case (canon @ ("date_of_birth" | "application_date"), actual) =>
        // same %y pivot the Column path applies (Projections.safeParseDate2)
        val parse = s"try_to_date(cast(${sqlRef(actual)} as string), 'dd-MM-yy')"
        s"case when year($parse) > 2068 then add_months($parse, -1200) else $parse end as $canon"
      case (canonical, actual) =>
        s"cast(${sqlRef(actual)} as ${typeClass.getOrElse(canonical, "string")}) as $canonical"
    }
    s"select\n  ${selects.mkString(",\n  ")}\nfrom $table"
  }

  /** M5 — default quality checks auto-registered for every integrated
    * dataset (`integrate_new_dataset.py:221-235`: not_null on loan_id and
    * customer_id). */
  def defaultChecks: Seq[graft.quality.QualityCheck] =
    Seq(graft.quality.NotNull("loan_id"), graft.quality.NotNull("customer_id"))

  /** M1+M2 analysis report (`auto_data_adapter.py:187-203`). */
  final case class Report(datasetType: String, mapped: Map[String, String],
                          unmapped: Seq[String])
  def analyze(columns: Seq[String]): Report = {
    val sanitized = columns.map(_.replace(".", "_"))
    val mapping = mapColumns(sanitized)
    Report(detect(sanitized).name, mapping,
      sanitized.filterNot(mapping.values.toSet))
  }
}
