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
    * orders of magnitude, with the unique key to spread on and the row
    * count above which a single-task scan measurably starves that CPU.
    * Compressed columnar text under-splits: a sub-`maxPartitionBytes`
    * file plans as ONE scan task, so every scan-stage text/vector
    * expression runs on one core while the rest idle — measured 3-6x
    * over linear on a 10x single-file corpus (50k docs: contamination
    * 20.5s → 1.9s spread). Below the row floor the spread inverts into a
    * regression: at sf0.1 (5k docs / 2k vectors) the extra exchange +
    * 32-task stages cost more than the single-task scan saves
    * (q_cosine_topk 0.7s → 3.2s, q_ann_lsh 3.8s → 10.7s measured), so
    * the floors sit between the two measured scales, margin both ways. */
  private val cpuHeavySpread = Map(
    "documents" -> ("doc_id", 20000L),
    "embeddings" -> ("vec_id", 10000L))

  /** Per-path parquet row counts for the spread gate — read once from
    * the parquet FOOTER metadata, driver-side (no Spark job: `load`
    * stays lazy-construction like every other loader path), and cached;
    * table files are immutable for a run. Only consulted for paths
    * already under-split by bytes, which bounds the footers read to a
    * few `maxPartitionBytes` of file — never a large-table walk. The
    * zero-column count() fallback covers exotic layouts the footer
    * reader can't open. */
  private val rowCountCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  private def parquetRowCount(spark: SparkSession, path: String): Long =
    try {
      import org.apache.hadoop.fs.{Path => HPath}
      val conf = spark.sessionState.newHadoopConf()
      val root = new HPath(path)
      val fs = root.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).filter(f => f.isFile &&
            f.getPath.getName.endsWith(".parquet")).map(_.getPath)
        else Array(root)
      files.map { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try reader.getRecordCount finally reader.close()
      }.sum
    } catch { case _: Exception => spark.read.parquet(path).count() }

  /** Spread an under-split scan across the cluster before expensive
    * per-row work: when the file layout plans fewer splits than half the
    * default parallelism AND the table has enough rows (floor above) for
    * single-task scanning to dominate, hash-repartition on the table key
    * (unique → skew-free; a column partitioning, so no round-robin
    * stabilization sort, and AQE honors the explicit partition count).
    * The split estimate comes from plan statistics (file bytes /
    * `maxPartitionBytes`) — plan-only, no job, no RDD materialization.
    * On a real multi-file table splits exceed cores and this is a no-op:
    * the shuffle is only paid exactly when the layout starves the scan. */
  private def spreadScan(spark: SparkSession, df: DataFrame, path: String,
                         key: String, minRows: Long): DataFrame = {
    val target = spark.sparkContext.defaultParallelism.toLong
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxSplit = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    val plannedSplits = ((bytes + maxSplit - 1) / maxSplit).max(1)
    val underSplit = plannedSplits * 2 <= target
    if (underSplit &&
        rowCountCache.getOrElseUpdate(path, parquetRowCount(spark, path)) >= minRows)
      // The trailing always-true nondeterministic predicate is a
      // pushdown barrier: Catalyst pushes deterministic filters through
      // RepartitionByExpression, which would run expensive per-row
      // text/vector predicates on the PRE-spread single-task scan — the
      // exact starvation the spread exists to fix (measured:
      // q_corpus_filter 11.4 s pushed vs 2.5 s held above, 100×).
      // spark_partition_id marks the partition boundary at one integer
      // compare per row; rand(seed) would read nicer but Spark 4 folds
      // bounded rand comparisons away and the barrier vanishes.
      df.repartition(target.toInt, org.apache.spark.sql.functions.col(key))
        .where(org.apache.spark.sql.functions.spark_partition_id() >= 0)
    else df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    // events.ts is parquet INT64 TIMESTAMP(NANOS) — Spark 4 reads it only
    // as a long (spark.sql.legacy.parquet.nanosAsLong=true, set by
    // Verify/Bench/tests). The data's real precision is microseconds, so
    // the ns→us integer division below is exact.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else cpuHeavySpread.get(name)
      .map { case (key, minRows) => spreadScan(spark, df, path, key, minRows) }
      .getOrElse(df)
  }

  /** Register every table as a temp view named after itself (lets
    * `spark.sql` text and the DuckDB oracle share identical table names). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
