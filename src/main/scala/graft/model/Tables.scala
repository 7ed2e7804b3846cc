package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view named after itself (lets
    * `spark.sql` text and the DuckDB oracle share identical table names). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
