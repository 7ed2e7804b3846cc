package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.gold.{BankMarts, Dims}
import graft.pipeline.Runner.{Model, RunResult, Table, View}
import graft.quality.{NotNull, Unique}
import graft.silver.Staging

/** The complete bank data warehouse as one assembly — a user of the
  * reference (`dbt run --full-refresh && dbt test`,
  * `/root/reference/dags/bank_etl_dag.py:58-72`) switches by calling
  * [[run]] with their raw frames.
  *
  * All 13 reference relations are declared: 3 staging views
  * (`dbt/models/staging/`), 5 dimensions and 5 facts
  * (`dbt/models/marts/core/`), with the reference's dbt schema tests
  * (`staging.yml:12-28`, `marts_core.yml:3-16`) attached to their
  * models. Staging stays lazy (dbt view materialization); marts persist
  * (dbt table materialization) EXCEPT `f_payment_transaction` and
  * `f_loan_balance_monthly`, which the reference itself declares as
  * views (`f_payment_transaction.sql:1`, `f_loan_balance_monthly
  * .sql:1`) — the per-model materializations below mirror the
  * reference's config exactly.
  */
object BankDwh {

  val DateSpineStart = "2015-01-01"
  val DateSpineEnd = "2030-12-31"

  /** The 13-model DAG. `anchor` pins current_date()-dependent columns
    * (age bands) for deterministic output. */
  def models(spark: SparkSession, anchor: String = "2026-01-01",
             spineStart: String = DateSpineStart,
             spineEnd: String = DateSpineEnd): Seq[Model] = Seq(
    // Silver — views with staging.yml tests
    Model("stg_corebank_loans", Seq("raw_loans"),
      r => Staging.stgCorebankLoans(r("raw_loans")), View,
      Seq(NotNull("loan_id"), Unique("loan_id"), NotNull("customer_id"))),
    Model("stg_corebank_customers", Seq("raw_loans"),
      r => Staging.stgCorebankCustomers(r("raw_loans")), View,
      Seq(NotNull("customer_id"), Unique("customer_id"))),
    Model("stg_payments", Seq("raw_payments"),
      r => Staging.stgPayments(r("raw_payments")), View,
      Seq(NotNull("loan_id"), NotNull("payment_date"))),
    // Gold dims — tables with marts_core.yml tests
    Model("dim_customer", Seq("stg_corebank_customers"),
      r => BankMarts.dimCustomer(r("stg_corebank_customers"), anchor), Table,
      Seq(NotNull("customer_key"), Unique("customer_key"))),
    Model("dim_product", Seq("stg_corebank_loans"),
      r => BankMarts.dimProduct(r("stg_corebank_loans")), Table,
      Seq(NotNull("product_key"), Unique("product_key"))),
    Model("dim_dealer", Seq("stg_corebank_loans"),
      r => BankMarts.dimDealer(r("stg_corebank_loans")), Table),
    Model("dim_date", Nil,
      _ => Dims.dateSpine(spark, spineStart, spineEnd), Table,
      Seq(NotNull("date_key"), Unique("date_key"))),
    Model("dim_contract_status", Nil,
      _ => Dims.contractStatusDim(spark), Table,
      Seq(NotNull("status_key"), Unique("status_key"))),
    // Gold facts
    Model("f_loan_contract",
      Seq("stg_corebank_loans", "dim_customer", "dim_product", "dim_dealer", "dim_date"),
      r => BankMarts.fLoanContract(r("stg_corebank_loans"), r("dim_customer"),
        r("dim_product"), r("dim_dealer"), r("dim_date")), Table,
      Seq(NotNull("loan_id"), Unique("loan_id"))),
    Model("f_default_event", Seq("stg_corebank_loans", "dim_date"),
      r => BankMarts.fDefaultEvent(r("stg_corebank_loans"), r("dim_date")), Table,
      Seq(NotNull("default_event_key"), Unique("default_event_key"))),
    Model("f_dealer_performance_daily",
      Seq("stg_corebank_loans", "dim_dealer", "dim_date"),
      r => BankMarts.fDealerPerformanceDaily(r("stg_corebank_loans"),
        r("dim_dealer"), r("dim_date")), Table),
    Model("f_payment_transaction", Seq("stg_payments"),
      r => BankMarts.fPaymentTransaction(r("stg_payments")), View),
    Model("f_loan_balance_monthly", Seq("stg_corebank_loans"),
      r => BankMarts.fLoanBalanceMonthly(r("stg_corebank_loans")), View))

  /** Full refresh + test — the engine's `dbt run && dbt test`. */
  def run(spark: SparkSession, rawLoans: DataFrame, rawPayments: DataFrame,
          warehouseDir: String, anchor: String = "2026-01-01"): RunResult =
    Runner.run(spark,
      Map("raw_loans" -> rawLoans, "raw_payments" -> rawPayments),
      models(spark, anchor), warehouseDir)
}
