package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's testdata tables (TESTDATA.md / FIXTURES.md §A).
  *
  * One parquet file per table. At 100 TB these would be partitioned
  * directories (e.g. orders partitioned by month of o_orderdate); the
  * loader API stays the same — `spark.read.parquet` on a directory prunes
  * partitions from pushed-down filters automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet INT64 TIMESTAMP(NANOS) — Spark 4 reads it only
    // as a long (spark.sql.legacy.parquet.nanosAsLong=true, set by
    // Verify/Bench/tests). The data's real precision is microseconds, so
    // the ns→us integer division below is exact.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view named after itself (lets
    * `spark.sql` text and the DuckDB oracle share identical table names). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
