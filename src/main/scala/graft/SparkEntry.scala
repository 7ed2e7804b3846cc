package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.Projections

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is an operator family from SURVEY.md §2
  * realized Spark-first over the driver testdata; `oracleSql` holds the
  * DuckDB-equivalent ANSI SQL for the hash-match gate.
  *
  * Determinism rules (SURVEY.md §5): money aggregates go through exact
  * DECIMAL(18,2) sums (order-independent, unlike double sums) and are cast
  * back to double so both engines emit identical bits; every result has a
  * total ORDER BY on a unique key; no current_date().
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Exact order-independent money sum: decimal(18,2) partial sums, double out. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 4-way star join (J1–J4 analogue): orders fact onto customer,
    * nation, region dims + a derived date key. */
  def entry(spark: SparkSession): DataFrame =
    qStarContract(spark, "/root/testdata/sf0.001")

  // ===========================================================================
  // Parity queries — one per operator family from SURVEY.md §2
  // ===========================================================================

  /** J6/J7 + A1–A5 + P9 + D4 — the f_dealer_performance_daily analogue:
    * fact ⟕ broadcast dim, 2-key hash aggregate with count / conditional
    * sum / sum / avg. Ref: `f_dealer_performance_daily.sql:14-30`. */
  def qDealerPerf(spark: SparkSession, dir: String): DataFrame = {
    val orders   = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"), "left")
      .groupBy(
        customer("c_nationkey").as("nation_key"),
        Projections.dateKey(orders("o_orderdate")).as("date_key"))
      .agg(
        count(lit(1)).as("num_orders"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("num_filled"),
        dsum(col("o_totalprice")).as("total_price"),
        (dsum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
      .orderBy("nation_key", "date_key")
  }

  /** J1–J4 + P5 + P10 — f_loan_contract analogue: 4-way chained left join
    * of the orders fact onto customer → nation → region dims plus a date
    * key; literal stub columns and column duplication under two aliases.
    * Dims are broadcast (classic star-schema pattern — at 100 TB the fact
    * side streams, dims ship to every executor).
    * Ref: `f_loan_contract.sql:12-44`. */
  def qStarContract(spark: SparkSession, dir: String): DataFrame = {
    val orders   = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val nation   = t(spark, dir, "nation")
    val region   = t(spark, dir, "region")
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"), "left")
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"), "left")
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"), "left")
      .select(
        orders("o_orderkey").as("contract_id"),
        orders("o_orderkey").cast("string").as("contract_ref"), // P10: dup under 2nd alias
        customer("c_custkey").as("customer_key"),
        customer("c_name").as("customer_name"),
        nation("n_name").as("nation_name"),
        region("r_name").as("region_name"),
        Projections.dateKey(orders("o_orderdate")).as("date_key"),
        orders("o_totalprice").cast("decimal(18,2)").cast("double").as("contract_amount"),
        lit("INR").as("currency_code"),                          // P5: literal stub
        lit(null).cast("double").as("interest_rate"))            // P5: typed null stub
      .orderBy("contract_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dealer_perf"   -> qDealerPerf,
    "q_star_contract" -> qStarContract,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_dealer_perf" ->
      """SELECT c.c_nationkey AS nation_key,
        |       CAST(strftime(o.o_orderdate, '%Y%m%d') AS BIGINT) AS date_key,
        |       COUNT(*) AS num_orders,
        |       CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS num_filled,
        |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_star_contract" ->
      """SELECT o.o_orderkey AS contract_id,
        |       CAST(o.o_orderkey AS VARCHAR) AS contract_ref,
        |       c.c_custkey AS customer_key,
        |       c.c_name AS customer_name,
        |       n.n_name AS nation_name,
        |       r.r_name AS region_name,
        |       CAST(strftime(o.o_orderdate, '%Y%m%d') AS BIGINT) AS date_key,
        |       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS contract_amount,
        |       'INR' AS currency_code,
        |       CAST(NULL AS DOUBLE) AS interest_rate
        |FROM orders o
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY contract_id""".stripMargin,
  )
}
