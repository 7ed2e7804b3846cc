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

  /** Corpus tables whose downstream per-row CPU (shingle hashing, token
    * counting, vector math) dwarfs their compressed on-disk bytes by
    * orders of magnitude. Compressed columnar text under-splits: a
    * sub-`maxPartitionBytes` file plans as ONE scan task, so every
    * scan-stage text/vector expression runs on one core while the rest
    * idle — measured 3-6x over linear on a 10x single-file corpus. */
  private val cpuHeavyKey = Map("documents" -> "doc_id", "embeddings" -> "vec_id")

  /** Spread an under-split scan across the cluster before expensive
    * per-row work: when the planned file splits are below half the
    * default parallelism, hash-repartition on the table key (unique →
    * skew-free; a column partitioning, so no round-robin stabilization
    * sort, and AQE honors the explicit partition count). On a real
    * multi-file table splits exceed cores and this is a no-op — the
    * shuffle is only paid exactly when the layout starves the scan. */
  private def spreadScan(spark: SparkSession, df: DataFrame, key: String): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target)
      df.repartition(target, org.apache.spark.sql.functions.col(key))
    else df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet INT64 TIMESTAMP(NANOS) — Spark 4 reads it only
    // as a long (spark.sql.legacy.parquet.nanosAsLong=true, set by
    // Verify/Bench/tests). The data's real precision is microseconds, so
    // the ns→us integer division below is exact.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else cpuHeavyKey.get(name).map(spreadScan(spark, df, _)).getOrElse(df)
  }

  /** Register every table as a temp view named after itself (lets
    * `spark.sql` text and the DuckDB oracle share identical table names). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
