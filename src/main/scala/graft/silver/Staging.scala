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

  /** BigQuery NUMERIC equivalent for bank-model money/ratio columns
    * (shared constant — see [[Projections.BqNumeric]]). */
  private val Numeric = Projections.BqNumeric

  private def c(name: String): Column = col(name)

  /** stg_corebank_loans — the full ~40-column rename-cast projection +
    * SAFE date parses.
    * Ref: `/root/reference/dbt/models/staging/stg_corebank_loans.sql:7-70`.
    * UniqueID feeds both loan_id and customer_id (the reference's own
    * column duplication, `:9-10`); dealer_id is staged from branch_id and
    * product_id from manufacturer_id (`:11-12`); the tenure strings
    * ('Xyrs Ymon') pass through raw, as in the reference (`:63-64`). */
  def stgCorebankLoans(raw: DataFrame): DataFrame =
    Projections.stgGeneric(raw, Seq(
      // IDs (:9-12)
      "loan_id"           -> c("UniqueID").cast("string"),
      "customer_id"       -> c("UniqueID").cast("string"),
      "product_id"        -> c("manufacturer_id").cast("string"),
      "dealer_id"         -> c("branch_id").cast("string"),
      // Dates (:15-16)
      "application_date"  -> Projections.safeParseDate2(c("DisbursalDate").cast("string")),
      "date_of_birth_raw" -> Projections.safeParseDate2(c("Date_of_Birth").cast("string")),
      // Amounts / ratios (:19-21)
      "loan_amount"       -> c("disbursed_amount").cast(Numeric),
      "asset_cost"        -> c("asset_cost").cast(Numeric),
      "ltv_ratio"         -> c("ltv").cast(Numeric),
      // Basic customer attributes (:24-26)
      "employment_type"   -> c("Employment_Type").cast("string"),
      "current_pincode_id" -> c("Current_pincode_ID").cast("string"),
      "state_id"          -> c("State_ID").cast("string"),
      // KYC / document flags (:29-34)
      "mobileno_avl_flag" -> c("MobileNo_Avl_Flag").cast("long"),
      "aadhar_flag"       -> c("Aadhar_flag").cast("long"),
      "pan_flag"          -> c("PAN_flag").cast("long"),
      "voterid_flag"      -> c("VoterID_flag").cast("long"),
      "driving_flag"      -> c("Driving_flag").cast("long"),
      "passport_flag"     -> c("Passport_flag").cast("long"),
      // Bureau score (:37-38)
      "perform_cns_score" -> c("PERFORM_CNS_SCORE").cast("long"),
      "perform_cns_score_description" -> c("PERFORM_CNS_SCORE_DESCRIPTION").cast("string"),
      // Primary bureau aggregates (:41-46)
      "pri_no_of_accts"   -> c("PRI_NO_OF_ACCTS").cast("long"),
      "pri_active_accts"  -> c("PRI_ACTIVE_ACCTS").cast("long"),
      "pri_overdue_accts" -> c("PRI_OVERDUE_ACCTS").cast("long"),
      "pri_current_balance"   -> c("PRI_CURRENT_BALANCE").cast(Numeric),
      "pri_sanctioned_amount" -> c("PRI_SANCTIONED_AMOUNT").cast(Numeric),
      "pri_disbursed_amount"  -> c("PRI_DISBURSED_AMOUNT").cast(Numeric),
      // Secondary bureau aggregates (:49-54)
      "sec_no_of_accts"   -> c("SEC_NO_OF_ACCTS").cast("long"),
      "sec_active_accts"  -> c("SEC_ACTIVE_ACCTS").cast("long"),
      "sec_overdue_accts" -> c("SEC_OVERDUE_ACCTS").cast("long"),
      "sec_current_balance"   -> c("SEC_CURRENT_BALANCE").cast(Numeric),
      "sec_sanctioned_amount" -> c("SEC_SANCTIONED_AMOUNT").cast(Numeric),
      "sec_disbursed_amount"  -> c("SEC_DISBURSED_AMOUNT").cast(Numeric),
      // Instalments (:57-58)
      "primary_instal_amt" -> c("PRIMARY_INSTAL_AMT").cast(Numeric),
      "sec_instal_amt"     -> c("SEC_INSTAL_AMT").cast(Numeric),
      // History / inquiries (:61-65)
      "new_accts_last_6m"  -> c("NEW_ACCTS_IN_LAST_SIX_MONTHS").cast("long"),
      "delinquent_accts_last_6m" -> c("DELINQUENT_ACCTS_IN_LAST_SIX_MONTHS").cast("long"),
      "average_acct_age_raw"      -> c("AVERAGE_ACCT_AGE").cast("string"),
      "credit_history_length_raw" -> c("CREDIT_HISTORY_LENGTH").cast("string"),
      "no_of_inquiries"    -> c("NO_OF_INQUIRIES").cast("long"),
      // Target (:68)
      "loan_default"       -> c("loan_default").cast("long")))

  /** stg_corebank_customers — dedup to one row per customer (W1) with a
    * null-guard filter (F1) and literal stubs (P5).
    * Ref: `stg_corebank_customers.sql:7-30`. The reference orders its
    * row_number by the PARTITION KEY (`:16` — a constant within the
    * partition, so its survivor among conflicting duplicates is
    * engine-chosen); here the tie order is the staged attributes, a
    * total order over everything the output carries, so the survivor is
    * run- and partitioning-independent (deterministic strengthening of
    * the reference's underspecified pick — identical duplicate rows,
    * the normal case, are unaffected). */
  def stgCorebankCustomers(raw: DataFrame): DataFrame = {
    val base = raw.where(c("UniqueID").isNotNull)
    Dedup.firstPerKey(base, Seq("UniqueID"),
      Seq(c("Date_of_Birth").cast("string"), c("branch_id").cast("string"),
        c("Employment_Type").cast("string"), c("State_ID").cast("string"),
        c("Current_pincode_ID").cast("string")))
      .select(
        c("UniqueID").cast("string").as("customer_id"),
        Projections.safeParseDate2(c("Date_of_Birth").cast("string")).as("date_of_birth"),
        c("branch_id").cast("string").as("branch_id"),
        c("Employment_Type").cast("string").as("employment_type"),
        c("State_ID").cast("string").as("state_id"),
        c("Current_pincode_ID").cast("string").as("current_pincode_id"),
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
