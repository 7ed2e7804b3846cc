package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.silver.Staging
import graft.gold.{BankMarts, Dims}
import graft.pipeline.Runner
import graft.pipeline.Runner.{Model, Table, View}
import graft.quality.{NotNull, Unique}

/** End-to-end bank model over inline Kaggle-schema fixtures: staging →
  * dims → facts → quality checks, through the pipeline runner. */
class BankPipelineSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal Kaggle vehicle-loans raw frame (FIXTURES.md §B.2), incl. a
    * 2-digit-year date that exercises the %y pivot (84 → 1984).
    * (Row + DDL schema: fixtures exceed Scala's Tuple22 limit.) */
  private def rawLoans: DataFrame = {
    val schema =
      """UniqueID string, disbursed_amount double, asset_cost double, ltv double,
        |branch_id string, supplier_id string, manufacturer_id string,
        |Current_pincode_ID string, Date_of_Birth string, Employment_Type string,
        |DisbursalDate string, State_ID string, MobileNo_Avl_Flag int,
        |Aadhar_flag int, PAN_flag int, PERFORM_CNS_SCORE int,
        |PERFORM_CNS_SCORE_DESCRIPTION string, PRI_NO_OF_ACCTS int,
        |PRI_ACTIVE_ACCTS int, PRI_OVERDUE_ACCTS int, PRI_CURRENT_BALANCE double,
        |PRI_SANCTIONED_AMOUNT double, PRI_DISBURSED_AMOUNT double,
        |VoterID_flag int, Driving_flag int, Passport_flag int,
        |SEC_NO_OF_ACCTS int, SEC_ACTIVE_ACCTS int, SEC_OVERDUE_ACCTS int,
        |SEC_CURRENT_BALANCE double, SEC_SANCTIONED_AMOUNT double,
        |SEC_DISBURSED_AMOUNT double, PRIMARY_INSTAL_AMT double,
        |SEC_INSTAL_AMT double, AVERAGE_ACCT_AGE string, CREDIT_HISTORY_LENGTH string,
        |NEW_ACCTS_IN_LAST_SIX_MONTHS int, DELINQUENT_ACCTS_IN_LAST_SIX_MONTHS int,
        |NO_OF_INQUIRIES int, loan_default int""".stripMargin.replace("\n", " ")
    val rows = Seq(
      Row("L1", 50000.0, 70000.0, 71.4, "B1", "S1", "M1", "P1", "01-01-84", "Salaried", "15-10-18", "ST1", 1, 1, 0, 650, "A-Very Low Risk", 3, 2, 0, 10000.0, 60000.0, 55000.0, 1, 0, 1, 1, 0, 0, 2000.0, 8000.0, 7500.0, 1450.5, 0.0, "1yrs 10mon", "5yrs 2mon", 1, 0, 2, 0),
      Row("L2", 30000.0, 45000.0, 66.7, "B1", "S2", "M1", "P2", "15-06-92", "Self employed", "20-10-18", "ST1", 1, 0, 1, 700, "B-Low Risk", 1, 1, 1, 5000.0, 30000.0, 28000.0, 0, 0, 0, 0, 0, 0, 0.0, 0.0, 0.0, 900.0, 0.0, "0yrs 6mon", "2yrs 0mon", 0, 1, 1, 1),
      Row("L3", 80000.0, 90000.0, 88.9, "B2", "S1", "M2", "P3", "31-12-99", "Salaried", "20-10-18", "ST2", 1, 1, 1, 720, "A-Very Low Risk", 5, 3, 0, 25000.0, 95000.0, 90000.0, 1, 1, 2, 1, 0, 0, 12000.0, 15000.0, 14000.0, 2100.0, 350.0, "3yrs 2mon", "8yrs 4mon", 2, 0, 0, 0),
      Row("L4", 20000.0, 30000.0, 66.7, "B2", "S3", "M2", "P4", "29-02-00", "Student", "21-10-18", "ST2", 0, 1, 0, 0, "No Bureau History Available", 0, 0, 0, 0.0, 0.0, 0.0, 0, 0, 0, 0, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0, "0yrs 0mon", "0yrs 0mon", 0, 0, 5, 1))
    spark.createDataFrame(spark.sparkContext.parallelize(rows),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  private def rawPayments: DataFrame = Seq(
    ("L1", "2018-12-18", 2002.77, 1988.83, 13.94, 1.0, 0.0, 2),
    ("L1", "2019-01-18", 2002.77, 1990.00, 12.77, 1.0, 0.0, 2),
    ("L2", "2018-11-20", 1500.00, 1480.00, 20.00, 0.0, 5.0, 1)
  ).toDF("loan_id", "payment_date", "amount", "principal_amt", "interest_amt",
    "fee_amt", "late_fee_amt", "channel_id")
    .withColumn("payment_date", to_date(col("payment_date")))

  test("staging: loans rename-cast with %y pivot dates") {
    val stg = Staging.stgCorebankLoans(rawLoans)
    val rows = stg.orderBy("loan_id").collect()
    assert(rows.length === 4)
    val l1 = rows(0)
    assert(l1.getAs[String]("loan_id") === "L1")
    assert(l1.getAs[java.sql.Date]("date_of_birth_raw").toString === "1984-01-01") // %y pivot: 84 → 1984
    assert(l1.getAs[java.sql.Date]("application_date").toString === "2018-10-15")
    assert(l1.getAs[java.math.BigDecimal]("loan_amount").doubleValue() === 50000.0)
    // dealer_id sources from branch_id (stg_corebank_loans.sql:12)
    assert(l1.getAs[String]("dealer_id") === "B1")
    // secondary bureau / instalment / KYC / tenure columns staged
    assert(l1.getAs[Long]("sec_no_of_accts") === 1L)
    assert(l1.getAs[java.math.BigDecimal]("primary_instal_amt").doubleValue() === 1450.5)
    assert(l1.getAs[Long]("voterid_flag") === 1L)
    assert(l1.getAs[String]("average_acct_age_raw") === "1yrs 10mon")
    // 29-02-00: 2000 was a leap year → valid date
    assert(rows(3).getAs[java.sql.Date]("date_of_birth_raw").toString === "2000-02-29")
  }

  test("staging: customers dedup to one row per id") {
    val doubled = rawLoans.union(rawLoans)
    val stg = Staging.stgCorebankCustomers(doubled)
    assert(stg.count() === 4)
    assert(stg.select("customer_id").distinct().count() === 4)
    // CONFLICTING duplicates: the survivor follows the staged-attribute
    // total order (the reference's own tiebreak is the partition key —
    // engine-chosen), so the pick is run- and partitioning-independent:
    // the original employment strings sort before the planted 'zzz'
    val conflicted = rawLoans.union(
      rawLoans.withColumn("Employment_Type", lit("zzz")))
    val stg2 = Staging.stgCorebankCustomers(conflicted)
    assert(stg2.count() === 4)
    assert(stg2.where(col("employment_type") === "zzz").count() === 0)
  }

  test("gold: dim_customer age bands use year-boundary diff") {
    val dim = BankMarts.dimCustomer(Staging.stgCorebankCustomers(rawLoans), anchor = "2026-01-01")
    val bands = dim.orderBy("customer_id").select("age_band").as[String].collect()
    // DOBs 1984, 1992, 1999, 2000 vs 2026 → boundary diffs 42, 34, 27, 26
    assert(bands === Array("40-49", "30-39", "18-29", "18-29"))
    // surrogate keys dense 1..N
    assert(dim.select("customer_key").as[Long].collect().sorted === Array(1L, 2L, 3L, 4L))
  }

  test("gold: star join resolves all surrogate keys") {
    val stg = Staging.stgCorebankLoans(rawLoans)
    val customers = BankMarts.dimCustomer(Staging.stgCorebankCustomers(rawLoans))
    val products = BankMarts.dimProduct(stg)
    val dealers = BankMarts.dimDealer(stg)
    val dates = Dims.dateSpine(spark, "2018-01-01", "2019-12-31")
    val fact = BankMarts.fLoanContract(stg, customers, products, dealers, dates)
    assert(fact.count() === 4)
    assert(fact.where(col("customer_key").isNull || col("product_key").isNull ||
      col("dealer_key").isNull || col("origination_date_key").isNull).count() === 0)
    assert(fact.where(col("loan_id") === "L1").select("origination_date_key")
      .as[Long].head() === 20181015L)
    // measures + stub surface from f_loan_contract.sql:20-36
    assert(fact.where(col("loan_id") === "L1")
      .select(col("amount_financed").cast("double")).as[Double].head() === 50000.0)
    assert(fact.where(col("loan_id") === "L1")
      .select(col("primary_instal_amt").cast("double")).as[Double].head() === 1450.5)
    assert(fact.columns.toSet === Set("loan_id", "customer_key", "product_key",
      "dealer_key", "origination_date_key", "amount_financed", "ltv_ratio",
      "asset_cost", "primary_instal_amt", "sec_instal_amt", "loan_default",
      "interest_rate", "term_months", "down_payment", "commission_amount",
      "currency_code", "country_code"))
  }

  test("gold: default events only for defaulted loans, dense keys") {
    val stg = Staging.stgCorebankLoans(rawLoans)
    val dates = Dims.dateSpine(spark, "2018-01-01", "2019-12-31")
    val events = BankMarts.fDefaultEvent(stg, dates)
    assert(events.select("loan_id").as[String].collect().sorted === Array("L2", "L4"))
    assert(events.select("default_event_key").as[Long].collect().sorted === Array(1L, 2L))
  }

  test("gold: dim_product keeps a null product id as a keyed row (reference parity)") {
    // dim_product.sql has NO null filter (bare SELECT DISTINCT, unlike
    // dim_dealer's explicit one): a null product must become a real dim
    // row, keyed first like Spark's nulls-first ascending sort
    val stg = Staging.stgCorebankLoans(rawLoans)
    val withNull = stg.withColumn("product_id",
      when(col("loan_id") === "L1", lit(null).cast("string")).otherwise(col("product_id")))
    val dim = BankMarts.dimProduct(withNull)
    assert(dim.where(col("product_id").isNull).select("product_key").as[Long].head() === 1L)
    assert(dim.select("product_key").as[Long].collect().sorted === (1L to dim.count()).toArray)
    // and the dealer dim keeps its explicit null filter
    val dealers = BankMarts.dimDealer(
      stg.withColumn("dealer_id", lit(null).cast("string")))
    assert(dealers.count() === 0)
  }

  test("gold: dealer performance aggregates") {
    val stg = Staging.stgCorebankLoans(rawLoans)
    val dealers = BankMarts.dimDealer(stg)
    val dates = Dims.dateSpine(spark, "2018-01-01", "2019-12-31")
    val perf = BankMarts.fDealerPerformanceDaily(stg, dealers, dates)
    // dealer B1 (branch-sourced) has loans L1 (2018-10-15) and L2 (2018-10-20)
    val b1Key = dealers.where(col("dealer_id") === "B1").select("dealer_key").as[Long].head()
    val b1 = perf.where(col("dealer_key") === b1Key)
    assert(b1.count() === 2)
    assert(b1.agg(sum("num_applications")).as[Long].head() === 2L)
    assert(b1.agg(sum("num_approved")).as[Long].head() === 1L) // L2 defaulted
  }

  test("pipeline runner: topological build, table materialization, checks pass") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val models = Seq(
      Model("stg_loans", Seq("raw_loans"), r => Staging.stgCorebankLoans(r("raw_loans")),
        View, Seq(NotNull("loan_id"), Unique("loan_id"), NotNull("customer_id"))),
      Model("stg_customers", Seq("raw_loans"), r => Staging.stgCorebankCustomers(r("raw_loans")),
        View, Seq(NotNull("customer_id"), Unique("customer_id"))),
      Model("dim_customer", Seq("stg_customers"), r => BankMarts.dimCustomer(r("stg_customers")),
        Table, Seq(NotNull("customer_key"), Unique("customer_key"))),
      Model("dim_product", Seq("stg_loans"), r => BankMarts.dimProduct(r("stg_loans")),
        Table, Seq(NotNull("product_key"), Unique("product_key"))),
      Model("dim_dealer", Seq("stg_loans"), r => BankMarts.dimDealer(r("stg_loans")), Table),
      Model("dim_date", Nil, _ => Dims.dateSpine(spark, "2018-01-01", "2019-12-31"), Table),
      Model("f_loan_contract", Seq("stg_loans", "dim_customer", "dim_product", "dim_dealer", "dim_date"),
        r => BankMarts.fLoanContract(r("stg_loans"), r("dim_customer"), r("dim_product"),
          r("dim_dealer"), r("dim_date")),
        Table, Seq(NotNull("loan_id"), Unique("loan_id"))))
    // deliberately shuffled input order — runner must topo-sort
    val result = Runner.run(spark, Map("raw_loans" -> rawLoans), models.reverse, tmp)
    assert(result.built.head === "dim_date" || result.built.indexOf("stg_loans") <
      result.built.indexOf("f_loan_contract"))
    assert(result.checks.nonEmpty && result.passed, result.checks.filterNot(_.passed).toString)
    // table materialization actually wrote parquet
    assert(new java.io.File(s"$tmp/f_loan_contract").exists())
  }

  test("BankDwh: all 13 reference relations build and every dbt-style check passes") {
    import graft.pipeline.BankDwh
    val tmp = java.nio.file.Files.createTempDirectory("graft-dwh").toString
    val result = BankDwh.run(spark, rawLoans, rawPayments, tmp)
    assert(result.built.size === 13)
    assert(result.built.toSet === Set(
      "stg_corebank_loans", "stg_corebank_customers", "stg_payments",
      "dim_customer", "dim_product", "dim_dealer", "dim_date", "dim_contract_status",
      "f_loan_contract", "f_default_event", "f_dealer_performance_daily",
      "f_payment_transaction", "f_loan_balance_monthly"))
    assert(result.passed, result.checks.filterNot(_.passed).toString)
    // spot checks: spine size, fact completeness, status recode
    assert(result("dim_date").count() === 5844)
    assert(result("f_loan_contract").count() === 4)
    assert(result("dim_contract_status").count() === 4)
    assert(result("f_payment_transaction").count() === 3)
  }

  test("quality checks catch violations") {
    val bad = Seq(("a", 1), ("a", 2), (null, 3)).toDF("k", "v")
    assert(NotNull("k").violations(bad) === 1)
    assert(Unique("k").violations(bad) === 1)
    // FK and parent key SHARING a name — the most common dbt
    // relationships shape — must count violations, not crash on an
    // ambiguous column reference
    import graft.quality.RelationshipTo
    val withOrphan = bad.union(Seq(("x", 4)).toDF("k", "v"))
    val parentSameName = Seq(("a", 0)).toDF("k", "extra")
    assert(RelationshipTo("k", () => parentSameName, "k").violations(withOrphan) === 1)
  }

  test("quality report frame: one row per check, counts match, empty input counts 0") {
    import graft.quality.{AcceptedValues, Checks, RelationshipTo}
    val bad = Seq(("a", 1), ("a", 2), (null, 3), ("x", 4)).toDF("k", "v")
    val parent = Seq("a").toDF("pk")
    val empty = Seq.empty[(String, Int)].toDF("k", "v")
    val rep = Checks.reportDf(Seq(
      ("bad", bad, Seq(NotNull("k"), Unique("k"),
        AcceptedValues("k", Seq("a")),
        RelationshipTo("k", () => parent, "pk"))),
      ("empty", empty, Seq(NotNull("k"), Unique("k")))))
      .orderBy("model", "check_name").collect()
    val got = rep.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      ("bad", "accepted_values(k)", 1L, false),
      ("bad", "not_null(k)", 1L, false),
      ("bad", "relationship(k -> pk)", 1L, false),
      ("bad", "unique(k)", 1L, false),
      ("empty", "not_null(k)", 0L, true),
      ("empty", "unique(k)", 0L, true)))
  }

  test("cdc apply: latest wins, delete supersedes, insert, untouched passthrough") {
    import graft.pipeline.Cdc
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "amt")
    val changes = Seq(
      (1L, "a", 11.0, "U", 1L), (1L, "a2", 12.0, "U", 2L), // latest wins
      (2L, "b", 20.0, "U", 1L), (2L, "b", 20.0, "D", 2L),  // delete supersedes
      (9L, "new", 99.0, "I", 1L))                          // insert
      .toDF("k", "name", "amt", "op", "seq")
    val got = Cdc.applyChanges(base, changes, Seq("k"), "seq", "op")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, "a2", 12.0), (3L, "c", 30.0), (9L, "new", 99.0)))
    // guard: changes missing a base column is rejected
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(base, changes.drop("name"), Seq("k"), "seq", "op")
    }
  }

  test("cdc apply guards: null op fails fast, _rn collision rejected") {
    import graft.pipeline.Cdc
    val base = Seq((1L, "a", 10.0)).toDF("k", "name", "amt")
    // a WINNING null op is neither a delete nor an upsert — by the time
    // the filter sees it the key is already anti-joined out of the base,
    // so either guess silently corrupts; it must raise instead
    val nullOp = Seq((1L, "a2", 11.0, null.asInstanceOf[String], 2L))
      .toDF("k", "name", "amt", "op", "seq")
    val e = intercept[Exception](
      Cdc.applyChanges(base, nullOp, Seq("k"), "seq", "op").collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .flatMap(x => Option(x.getMessage)).toSeq
    assert(msgs.exists(_.contains("null op")), s"expected the null-op guard, got: $e")
    // a payload column named _rn would be clobbered by the rank column
    val withRn = Seq((1L, "a", 10.0, "U", 1L, 5))
      .toDF("k", "name", "amt", "op", "seq", "_rn")
    intercept[IllegalArgumentException](
      Cdc.applyChanges(base, withRn, Seq("k"), "seq", "op"))
  }

  test("runner rejects duplicate model names") {
    import graft.pipeline.Runner
    // both copies would run with the resolution map clobbered — the
    // first model's checks would silently validate the second's frame
    val m = Runner.Model("dup", Nil, _ => spark.range(1).toDF())
    val e = intercept[IllegalArgumentException](Runner.topoOrder(Seq(m, m)))
    assert(e.getMessage.contains("dup"))
  }

  test("payments fact: date key and fee composition") {
    val fact = BankMarts.fPaymentTransaction(Staging.stgPayments(rawPayments))
    assert(fact.count() === 3)
    assert(fact.where(col("loan_id") === "L2").select("payment_date_key").as[Long].head() === 20181120L)
    val fee = fact.where(col("loan_id") === "L2")
      .select(col("fee_component").cast("double")).as[Double].head()
    assert(fee === 5.0)
    // a null late fee must not null out a real fee (+ null-propagates;
    // sum() would then silently understate fee revenue)
    val nullFee = Seq(("L9", "2018-12-01", 100.0, 90.0, 5.0, Some(5.0), Option.empty[Double], 1))
      .toDF("loan_id", "payment_date", "amount", "principal_amt",
        "interest_amt", "fee_amt", "late_fee_amt", "channel_id")
      .withColumn("payment_date", to_date(col("payment_date")))
    val nf = BankMarts.fPaymentTransaction(Staging.stgPayments(nullFee))
    assert(nf.select(col("fee_component").cast("double")).as[Double].head() === 5.0)
  }
}
