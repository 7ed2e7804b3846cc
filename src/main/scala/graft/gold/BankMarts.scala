package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Projections

/** Gold layer — the bank model's dimension and fact marts
  * (`/root/reference/dbt/models/marts/core/` dim_ and f_ models),
  * re-expressed as
  * DataFrame transforms over the silver staging frames.
  *
  * Join strategy: every dim is distinct-compacted and orders of magnitude
  * smaller than the loan fact, so all star joins broadcast the dims (at
  * 100 TB the fact side streams through map tasks with zero shuffle).
  * Surrogate keys use unpartitioned row_number — correct for dim-sized
  * data; swap in Dims.surrogateDimScalable when a dimension outgrows one
  * task.
  */
object BankMarts {

  // single source of truth for the BigQuery-NUMERIC equivalence
  private val Numeric = Projections.BqNumeric
  private def c(name: String): Column = col(name)

  /** dim_customer — age bands from a pinned anchor (BQ DATE_DIFF year-
    * boundary semantics), dense surrogate keys, literal stubs.
    * Ref: `dim_customer.sql:21-40`. `anchor` replaces current_date() so
    * results are deterministic (SURVEY.md §5). */
  def dimCustomer(stgCustomers: DataFrame, anchor: String = "2026-01-01"): DataFrame = {
    val age = Projections.yearDiff(to_date(lit(anchor)), c("date_of_birth"))
    stgCustomers.select(
      row_number().over(Window.orderBy(c("customer_id"))).cast("long").as("customer_key"),
      c("customer_id"),
      // the reference's with_keys block overrides the staged customer_type
      // with the 'individual' literal (dim_customer.sql:32)
      lit("individual").as("customer_type"),
      lit(null).cast("string").as("kyc_segment"),
      when(c("date_of_birth").isNull, "unknown")
        .when(age < 30, "18-29").when(age < 40, "30-39").when(age < 50, "40-49")
        .otherwise("50+").as("age_band"),
      lit(null).cast("string").as("region"),
      lit("IN").as("country"),
      lit(null).cast("string").as("language"),
      lit(null).cast("string").as("income_band"),
      c("employment_type").as("occupation"))
  }

  /** dim_product — distinct product ids + surrogate key + stubs.
    * Ref: `dim_product.sql:4-17`. keepNull mirrors the reference's bare
    * SELECT DISTINCT (no null filter, unlike dim_dealer): a null
    * product_id becomes a real dim row keyed first, so surrogate keys
    * line up with the reference on data carrying null products. */
  def dimProduct(stgLoans: DataFrame): DataFrame =
    Dims.surrogateDim(stgLoans, "product_id", "product_key",
      Seq("product_name" -> c("product_id"),
          "product_category" -> lit("VEHICLE_LOAN"),
          "currency_code" -> lit("INR")),
      keepNull = true)

  /** dim_dealer — null-filtered distinct dealers, name = id duplication,
    * India/offline literal stubs. Ref: `dim_dealer.sql:4-20`. */
  def dimDealer(stgLoans: DataFrame): DataFrame =
    Dims.surrogateDim(stgLoans, "dealer_id", "dealer_key",
      Seq("dealer_name" -> c("dealer_id"),
          "country" -> lit("IN"),
          "region" -> lit(null).cast("string"),
          "dealer_segment" -> lit(null).cast("string"),
          "channel" -> lit("offline")))

  /** f_loan_contract — the 4-way star join: loans onto customer, product,
    * dealer, date dims; measures + bank-schema stub columns.
    * Ref: `f_loan_contract.sql:5-44`. */
  def fLoanContract(stgLoans: DataFrame, dimCustomer: DataFrame,
                    dimProduct: DataFrame, dimDealer: DataFrame,
                    dimDate: DataFrame): DataFrame =
    stgLoans
      .join(broadcast(dimCustomer.select("customer_key", "customer_id")), Seq("customer_id"), "left")
      .join(broadcast(dimProduct.select("product_key", "product_id")), Seq("product_id"), "left")
      .join(broadcast(dimDealer.select("dealer_key", "dealer_id")), Seq("dealer_id"), "left")
      .join(broadcast(dimDate.select(c("date_key"), c("calendar_date"))),
        stgLoans("application_date") === c("calendar_date"), "left")
      .select(
        c("loan_id"), c("customer_key"), c("product_key"), c("dealer_key"),
        c("date_key").as("origination_date_key"),
        // Measures (f_loan_contract.sql:20-24)
        c("loan_amount").as("amount_financed"),
        c("ltv_ratio"), c("asset_cost"),
        c("primary_instal_amt"), c("sec_instal_amt"),
        c("loan_default"),
        // Stub fields for the bank-like schema (:30-36)
        lit(null).cast(Numeric).as("interest_rate"),
        lit(null).cast("long").as("term_months"),
        lit(null).cast(Numeric).as("down_payment"),
        lit(null).cast(Numeric).as("commission_amount"),
        lit("INR").as("currency_code"),
        lit("IN").as("country_code"))

  /** f_default_event — defaulted loans only, date-joined, surrogate event
    * key, amount duplicated under two aliases.
    * Ref: `f_default_event.sql:10-33`. The event key uses
    * [[Dims.denseRowKeys]] (partition-local + offsets), NOT the
    * reference's global `row_number() over (order by loan_id)`: the
    * defaulted subset is a constant fraction of the FACT (~20%+ of
    * loans), and a global sort funnels it through one task at 100 TB.
    * The surrogate-key contract (dense, unique) is preserved; only the
    * assignment order differs. */
  def fDefaultEvent(stgLoans: DataFrame, dimDate: DataFrame): DataFrame =
    Dims.denseRowKeys(
      stgLoans.where(c("loan_default") === 1)
        .join(broadcast(dimDate.select(c("date_key"), c("calendar_date"))),
          c("application_date") === c("calendar_date"), "left"),
      "default_event_key", Seq(c("loan_id")))
      .select(
        c("default_event_key"),
        c("loan_id"),
        c("date_key").as("event_date_key"),
        c("loan_amount").as("default_balance"),
        c("loan_amount").as("writeoff_amount"),
        lit("DEFAULT").as("event_type"))

  /** f_dealer_performance_daily — per dealer/day: applications, approvals
    * (non-defaults), financed amount, avg LTV.
    * Ref: `f_dealer_performance_daily.sql:14-30`. */
  def fDealerPerformanceDaily(stgLoans: DataFrame, dimDealer: DataFrame,
                              dimDate: DataFrame): DataFrame =
    stgLoans
      .join(broadcast(dimDealer.select("dealer_key", "dealer_id")), Seq("dealer_id"), "left")
      .join(broadcast(dimDate.select(c("date_key"), c("calendar_date"))),
        c("application_date") === c("calendar_date"), "left")
      .groupBy(c("dealer_key"), c("date_key"))
      .agg(
        count(lit(1)).as("num_applications"),
        sum(when(c("loan_default") === 0, 1).otherwise(0)).as("num_approved"),
        sum(c("loan_amount")).as("total_financed"),
        avg(c("ltv_ratio")).as("avg_ltv"))

  /** f_payment_transaction — payments with smart date key + stubs.
    * Ref: `f_payment_transaction.sql:5-11`. */
  def fPaymentTransaction(stgPayments: DataFrame): DataFrame =
    stgPayments.select(
      c("loan_id"),
      Projections.dateKey(c("payment_date")).as("payment_date_key"),
      c("amount"),
      c("principal_component"),
      c("interest_amt").as("interest_component"),
      // null-safe: + null-propagates, so a real fee with a null late fee
      // (absent for on-time payments in many feeds) would null out —
      // sum() then silently understates fee revenue downstream
      (coalesce(c("fee_amt"), lit(0).cast(Numeric)) +
        coalesce(c("late_fee_amt"), lit(0).cast(Numeric))).as("fee_component"),
      c("channel_id").as("channel_key"),
      lit("INR").as("currency_code"))

  /** f_loan_balance_monthly — stub balance snapshot (the reference model
    * is all literal/stub columns over loans).
    * Ref: `f_loan_balance_monthly.sql:5-12`. */
  def fLoanBalanceMonthly(stgLoans: DataFrame, asOfMonth: String = "2026-01"): DataFrame =
    stgLoans.select(
      c("loan_id"),
      lit(asOfMonth).as("snapshot_month"),
      c("loan_amount").as("opening_balance"),
      c("loan_amount").as("closing_balance"),
      lit(null).cast(Numeric).as("principal_paid"),
      lit(null).cast(Numeric).as("interest_paid"))
}
