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
    * the floors sit between the two measured scales, margin both ways.
    *
    * The floors are DERIVED, not guessed — `runMain
    * graft.model.SpreadCalibrate <dir>` measures both model inputs
    * (single-core per-row cost of the table's heaviest scan kernel;
    * the spread shape's fixed exchange + stage-launch cost) and prints
    * the break-even row count `fixed / (perRow · (1 − 1/P))`. On the
    * 10× corpus at local[32]: documents 14.3 µs/row, fixed 0.24 s →
    * break-even ≈ 17.1k; embeddings 76.1 µs/row, fixed 0.27 s →
    * break-even ≈ 3.6k. The pins sit ABOVE their break-evens
    * deliberately: the calibration times one kernel stage, but in a
    * real multi-stage plan the spread's constant cost is paid per
    * downstream shuffle stage and its barrier blocks pushdown, so the
    * in-situ break-even is higher (measured: ann_lsh 3.8 → 10.7 s at
    * 2k vectors — far beyond one 0.27 s exchange). The pins are the
    * bracketing sweeps' verdict (regress at sf0.1, win at 10×) kept at
    * 1.2×/2.7× the single-stage break-even as multi-stage margin.
    * Recalibrate (and re-bracket) when a new corpus table or a very
    * different executor shape joins. */
  private[model] val cpuHeavySpread = Map(
    "documents" -> ("doc_id", 20000L),
    "embeddings" -> ("vec_id", 10000L))

  /** Per-path parquet file lists and row counts for the spread gate —
    * listed/read once driver-side (no Spark job: `load` stays
    * lazy-construction like every other loader path), and cached; table
    * files are immutable for a run. The listing RECURSES so a
    * partitioned/nested layout (key=value subdirectories) is seen — a
    * non-recursive list would find zero files and silently disable the
    * spread for exactly the layouts it can't see. Footer row counts are
    * only read for paths already under-split by bytes AND file count,
    * which bounds the footers read to fewer than `defaultParallelism/2`
    * files — never a large-table walk. The zero-column count() fallback
    * covers layouts with no visible .parquet files or footers the
    * reader can't open. */
  private val fileListCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[org.apache.hadoop.fs.Path]]
  private val rowCountCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  private def parquetFiles(spark: SparkSession, path: String): Seq[org.apache.hadoop.fs.Path] =
    try {
      import org.apache.hadoop.fs.{Path => HPath}
      val conf = spark.sessionState.newHadoopConf()
      val root = new HPath(path)
      val fs = root.getFileSystem(conf)
      if (fs.getFileStatus(root).isDirectory) {
        val out = Seq.newBuilder[HPath]
        // skip what Spark's own file index skips (path components
        // starting with `_` or `.`: _temporary from a killed write,
        // _SUCCESS markers, hidden files) — counting files Spark will
        // never scan would inflate the split estimate (wrongly
        // suppressing the spread) and the row floor alike
        def walk(d: HPath): Unit = fs.listStatus(d).foreach { st =>
          val n = st.getPath.getName
          if (!n.startsWith("_") && !n.startsWith(".")) {
            if (st.isDirectory) walk(st.getPath)
            else if (n.endsWith(".parquet")) out += st.getPath
          }
        }
        walk(root)
        out.result()
      } else Seq(root)
    } catch { case _: Exception => Seq.empty }

  private def parquetRowCount(spark: SparkSession, path: String): Long = {
    val files = fileListCache.getOrElseUpdate(path, parquetFiles(spark, path))
    if (files.isEmpty) spark.read.parquet(path).count()
    else try {
      val conf = spark.sessionState.newHadoopConf()
      files.map { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try reader.getRecordCount finally reader.close()
      }.sum
    } catch { case _: Exception => spark.read.parquet(path).count() }
  }

  /** Spread an under-split scan across the cluster before expensive
    * per-row work: when the file layout plans fewer splits than half the
    * default parallelism AND the table has enough rows (floor above) for
    * single-task scanning to dominate, hash-repartition on the table key
    * (unique → skew-free; a column partitioning, so no round-robin
    * stabilization sort, and AQE honors the explicit partition count).
    * The split estimate is max(file count, file bytes /
    * `maxPartitionBytes`): Spark plans at least one split per file, so a
    * many-small-file table whose total bytes sit under one split is NOT
    * under-split — byte math alone would misdiagnose it and pay a
    * needless full-table shuffle (plus lose pushdown to the barrier).
    * Both inputs are plan/driver-side only — no job, no RDD
    * materialization. Deliberately NOT Spark's openCost/bytesPerCore
    * bin-packing formula: that predicts PLANNED partitions, but the
    * starvation this gate fixes is bounded by row-group parallelism —
    * Spark "plans" 32 splits of a 300 MB file whose row groups are
    * ~128 MB, yet only ~3 tasks receive a row group; bytes over
    * `maxPartitionBytes` (≈ the row-group ceiling) approximates the
    * EFFECTIVE parallelism those layouts actually get, which is why the
    * measured 10×/100× single-file corpora needed the spread despite a
    * generous planned-split count. On a real multi-file table splits exceed cores and
    * this is a no-op: the shuffle is only paid exactly when the layout
    * starves the scan. */
  private def spreadScan(spark: SparkSession, df: DataFrame, path: String,
                         key: String, minRows: Long): DataFrame = {
    val target = spark.sparkContext.defaultParallelism.toLong
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxSplit = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    val fileCount = fileListCache.getOrElseUpdate(path, parquetFiles(spark, path)).size
    val plannedSplits = ((bytes + maxSplit - 1) / maxSplit).max(1).max(fileCount)
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
      // Documented tradeoff: the barrier also keeps CHEAP selective
      // predicates (doc_id = literal) from reaching the scan for
      // row-group skipping — consumers doing point lookups or highly
      // selective filters should use `loadRaw`, which skips the spread
      // and keeps full pushdown.
      df.repartition(target.toInt, org.apache.spark.sql.functions.col(key))
        .where(org.apache.spark.sql.functions.spark_partition_id() >= 0)
    else df
  }

  /** Raw load: the table as the file layout plans it — no spread, no
    * pushdown barrier, so every predicate reaches the parquet scan for
    * row-group skipping. Use for point lookups and selective filters on
    * the corpus tables; `load` trades that pushdown for scan-stage
    * parallelism, which only pays off when downstream per-row CPU
    * dominates (the pipeline case). */
  def loadRaw(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet INT64 TIMESTAMP(NANOS) — Spark 4 reads it only
    // as a long (spark.sql.legacy.parquet.nanosAsLong=true, set by
    // Verify/Bench/tests). The data's real precision is microseconds, so
    // the ns→us integer division below is exact.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = loadRaw(spark, dir, name)
    cpuHeavySpread.get(name)
      .map { case (key, minRows) =>
        spreadScan(spark, df, s"$dir/$name.parquet", key, minRows) }
      .getOrElse(df)
  }

  /** Register every table as a temp view named after itself (lets
    * `spark.sql` text and the DuckDB oracle share identical table names). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
