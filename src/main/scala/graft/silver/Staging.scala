package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Projections}

/** Silver layer — the bank model's staging transforms, re-expressed from
  * the reference's dbt staging SQL against the Kaggle vehicle-loans
  * schema (FIXTURES.md §B.2).
  *
  * All three are pure `DataFrame => DataFrame` rename-cast projections
  * (narrow, codegen'd, no shuffle) except the customer dedup, which
  * shuffles once on customer_id.
  */
object Staging {

  /** BigQuery NUMERIC equivalent for bank-model money/ratio columns. */
  private val Numeric = "decimal(38,9)"

  private def c(name: String): Column = col(name)

  /** stg_corebank_loans — ~40 rename-casts + SAFE date parses.
    * Ref: `/root/reference/dbt/models/staging/stg_corebank_loans.sql:7-68`.
    * UniqueID feeds both loan_id and customer_id (the reference's own
    * column duplication, `stg_corebank_loans.sql:9-10`). */
  def stgCorebankLoans(raw: DataFrame): DataFrame =
    Projections.stgGeneric(raw, Seq(
      "loan_id"          -> c("UniqueID").cast("string"),
      "customer_id"      -> c("UniqueID").cast("string"),
      "branch_id"        -> c("branch_id").cast("string"),
      "dealer_id"        -> c("supplier_id").cast("string"),
      "product_id"       -> c("manufacturer_id").cast("string"),
      "application_date" -> Projections.safeParseDate2(c("DisbursalDate").cast("string")),
      "date_of_birth"    -> Projections.safeParseDate2(c("Date_of_Birth").cast("string")),
      "loan_amount"      -> c("disbursed_amount").cast(Numeric),
      "asset_cost"       -> c("asset_cost").cast(Numeric),
      "ltv_ratio"        -> c("ltv").cast(Numeric),
      "employment_type"  -> c("Employment_Type").cast("string"),
      "state_id"         -> c("State_ID").cast("string"),
      "pincode_id"       -> c("Current_pincode_ID").cast("string"),
      "mobile_flag"      -> c("MobileNo_Avl_Flag").cast("long"),
      "aadhar_flag"      -> c("Aadhar_flag").cast("long"),
      "pan_flag"         -> c("PAN_flag").cast("long"),
      "credit_score"     -> c("PERFORM_CNS_SCORE").cast("long"),
      "credit_score_desc" -> c("PERFORM_CNS_SCORE_DESCRIPTION").cast("string"),
      "pri_no_of_accts"  -> c("PRI_NO_OF_ACCTS").cast("long"),
      "pri_active_accts" -> c("PRI_ACTIVE_ACCTS").cast("long"),
      "pri_overdue_accts" -> c("PRI_OVERDUE_ACCTS").cast("long"),
      "pri_current_balance"   -> c("PRI_CURRENT_BALANCE").cast(Numeric),
      "pri_sanctioned_amount" -> c("PRI_SANCTIONED_AMOUNT").cast(Numeric),
      "pri_disbursed_amount"  -> c("PRI_DISBURSED_AMOUNT").cast(Numeric),
      "new_accts_6m"     -> c("NEW_ACCTS_IN_LAST_SIX_MONTHS").cast("long"),
      "delinq_accts_6m"  -> c("DELINQUENT_ACCTS_IN_LAST_SIX_MONTHS").cast("long"),
      "no_of_inquiries"  -> c("NO_OF_INQUIRIES").cast("long"),
      "loan_default"     -> c("loan_default").cast("long")))

  /** stg_corebank_customers — dedup to one row per customer (W1) with a
    * null-guard filter (F1) and literal stubs (P5).
    * Ref: `stg_corebank_customers.sql:7-30`. */
  def stgCorebankCustomers(raw: DataFrame): DataFrame = {
    val base = raw.where(c("UniqueID").isNotNull)
    Dedup.firstPerKey(base, Seq("UniqueID"), Seq(c("UniqueID")))
      .select(
        c("UniqueID").cast("string").as("customer_id"),
        Projections.safeParseDate2(c("Date_of_Birth").cast("string")).as("date_of_birth"),
        c("Employment_Type").cast("string").as("employment_type"),
        c("State_ID").cast("string").as("state_id"),
        lit("RETAIL").as("customer_type"))
  }

  /** stg_payments — rename-cast projection over the payments feed.
    * Ref: `stg_payments.sql:3-11`. */
  def stgPayments(raw: DataFrame): DataFrame =
    Projections.stgGeneric(raw, Seq(
      "loan_id"             -> c("loan_id").cast("string"),
      "payment_date"        -> c("payment_date").cast("date"),
      "amount"              -> c("amount").cast(Numeric),
      "principal_component" -> c("amount").cast(Numeric), // ref dup: f_payment_transaction.sql:8-9
      "principal_amt"       -> c("principal_amt").cast(Numeric),
      "interest_amt"        -> c("interest_amt").cast(Numeric),
      "fee_amt"             -> c("fee_amt").cast(Numeric),
      "late_fee_amt"        -> c("late_fee_amt").cast(Numeric),
      "channel_id"          -> c("channel_id").cast("long")))
}
