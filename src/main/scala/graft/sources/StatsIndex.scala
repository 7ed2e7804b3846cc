package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping: a min/max/null-count stats index over a
  * parquet directory plus a pruning reader — the scan-side complement
  * of [[graft.ops.Layout.zOrdered]] (which WRITES files with disjoint
  * clustered ranges; this is what turns that layout into skipped I/O).
  * The same idea as Delta/Iceberg data skipping, re-expressed as plain
  * DataFrame transforms over an ordinary parquet directory.
  *
  * Why it matters at 100 TB: parquet row-group stats only prune AFTER
  * the scheduler has listed, opened and footer-read every file; a
  * file-level index held OUTSIDE the data (one tiny parquet of one row
  * per file) prunes the FILE LIST before the scan is planned, so a
  * selective query on a z-ordered table schedules ~√files tasks
  * instead of all of them. The index is file-count-sized — thousands
  * of rows for a 100 TB table — so building the keep-list on the
  * driver is legitimate (it feeds `spark.read.parquet(files:_*)`,
  * exactly like a partition-pruned listing).
  *
  * Soundness contract (what a pruning index must never do is drop a
  * file that holds a matching row):
  *  - `mayContain*` helpers evaluate file stats CONSERVATIVELY: a file
  *    is kept unless its [min,max] provably excludes every predicate
  *    value. NULL mn/mx means the column is all-NULL in that file
  *    (min/max of an all-null group), which no equality/range
  *    predicate matches — skipped; `mayHaveNull` is the explicit
  *    IS NULL path.
  *  - pruning is FILE-granular: a kept file still holds non-matching
  *    rows, so [[prunedRead]] re-applies the exact row predicate
  *    behind the pruned listing (belt and braces; the row filter also
  *    reaches the parquet reader as a pushed filter for row-group
  *    skipping INSIDE kept files).
  *  - a stale index is the classic silent-wrong-answer hazard (files
  *    rewritten after the index was built), so [[prunedRead]] checks
  *    the indexed file SET against the directory's current listing by
  *    default and fails by name on any drift — an O(files) driver
  *    listing, the cost already paid by any read of the directory.
  *
  * Layout contract: FLAT directories (the layout [[graft.ops.Layout
  * .zOrdered]] writes and the ingest sinks' batch dirs use). A
  * hive-partitioned tree already prunes by partition key through the
  * scan itself; pointing this index at one fails LOUDLY at
  * [[prunedRead]] (the freshness listing is non-recursive, so the
  * indexed set can never match) rather than pruning unsoundly —
  * index each leaf directory, or rely on partition pruning for the
  * partition columns and this index inside the leaves.
  *
  * Build paths:
  *  - [[build]]: one pass over the data (exact, any column type Spark
  *    can min/max) — the path for an index built as part of the write
  *    job that produced the files.
  *  - [[buildFromFooters]]: O(footers), no data pages read — the path
  *    for indexing a table someone else already wrote. Footer stats
  *    for strings may be writer-truncated BOUNDS (sound for pruning,
  *    not necessarily witnessed values); a file missing stats for an
  *    indexed column fails the build by name rather than producing an
  *    index that would silently prune unsoundly.
  */
object StatsIndex {

  val FileCol = "file"

  /** Exact stats by full scan: one row per file — `file`, `n_rows`,
    * and per indexed column `mn_<c>` / `mx_<c>` (column's own type) /
    * `nulls_<c>`. One hash aggregate keyed on file name (file-count
    * groups); the corpus never shuffles by row. */
  def build(spark: SparkSession, dataDir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to index")
    val df = spark.read.parquet(dataDir)
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"indexed columns absent from $dataDir: $missing")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
      Seq(min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    }
    df.groupBy(input_file_name().as(FileCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Persist / reload the index (one tiny parquet next to — or
    * anywhere relative to — the data it describes). */
  def write(stats: DataFrame, statsDir: String): Unit =
    stats.coalesce(1).write.mode("overwrite").parquet(statsDir)

  def load(spark: SparkSession, statsDir: String): DataFrame =
    spark.read.parquet(statsDir)

  /** File may contain a row with `c` in [lo, hi]: its value interval
    * overlaps the predicate interval. NULL interval (all-null file)
    * → false (no range predicate matches NULL). */
  def mayContainBetween(c: String, lo: Any, hi: Any): Column =
    coalesce(col(s"mx_$c") >= lit(lo) && col(s"mn_$c") <= lit(hi), lit(false))

  def mayContainEq(c: String, v: Any): Column = mayContainBetween(c, v, v)

  def mayContainIn(c: String, vs: Seq[Any]): Column = {
    require(vs.nonEmpty, s"empty IN-list for $c")
    vs.map(mayContainEq(c, _)).reduce(_ || _)
  }

  /** File may contain a NULL in `c` (the IS NULL pruning path). */
  def mayHaveNull(c: String): Column = col(s"nulls_$c") > 0

  /** The keep-list: files whose stats cannot exclude the predicate.
    * File-count-sized driver collect by design. */
  def candidateFiles(stats: DataFrame, keep: Column): Seq[String] =
    stats.where(keep).select(FileCol).collect().map(_.getString(0)).toSeq

  final case class PrunedScan(df: DataFrame, keptFiles: Int, totalFiles: Int)

  /** Read `dataDir` through the index: prune the file list with `keep`
    * (a predicate over the stats schema — compose the `mayContain*`
    * helpers), then apply the EXACT `rowFilter` to the surviving
    * files. `verifyFresh` (default on) fails by name if the indexed
    * file set is not exactly the directory's current file set. */
  def prunedRead(spark: SparkSession, dataDir: String, stats: DataFrame,
                 keep: Column, rowFilter: Column,
                 verifyFresh: Boolean = true): PrunedScan = {
    val indexed = stats.select(FileCol).collect().map(_.getString(0)).toIndexedSeq
    if (verifyFresh) {
      val live = listDataFiles(spark, dataDir).map(normPath)
      val idx = indexed.map(normPath)
      val (missing, stale) = (live.toSet -- idx, idx.toSet -- live)
      require(missing.isEmpty && stale.isEmpty,
        s"[stats-index] index at odds with $dataDir: " +
          s"${missing.size} unindexed file(s) ${missing.take(3).toSeq.sorted}, " +
          s"${stale.size} indexed-but-gone ${stale.take(3).toSeq.sorted} — " +
          "rebuild the index (a stale index prunes unsoundly)")
    }
    val kept = candidateFiles(stats, keep)
    val df =
      if (kept.isEmpty) spark.read.parquet(dataDir).where(lit(false))
      else spark.read.parquet(kept: _*).where(rowFilter)
    PrunedScan(df, kept.size, indexed.size)
  }

  /** Per-file BLOOM sketches of a long id column — the point-lookup
    * complement of min/max skipping. A clustered layout makes RANGE
    * stats sharp on the clustered columns and useless on every
    * uncorrelated one (each file's [min,max] of a scattered id spans
    * the whole domain, so nothing prunes); a per-file Bloom prunes a
    * point lookup to the files that might hold the id regardless of
    * layout, at ~`bitsPerItem` bits per row on disk (one-sided error:
    * a kept file may be a false positive — rate ~1% at 10 bits — but
    * a skipped file NEVER holds the id, the soundness direction).
    * Output: `file`, `n_rows`, `bloom_<c>` (binary). Build is one
    * file-keyed aggregate; each partition fills a partial sketch and
    * partials OR-merge ([[graft.functions.BloomFunctions]]). */
  def buildBloom(spark: SparkSession, dataDir: String, idCol: String,
                 expectedPerFile: Long, bitsPerItem: Int = 10): DataFrame = {
    require(expectedPerFile > 0 && bitsPerItem > 0,
      s"bad bloom sizing: items=$expectedPerFile bits/item=$bitsPerItem")
    val df = spark.read.parquet(dataDir)
    require(df.columns.contains(idCol), s"$idCol absent from $dataDir")
    df.groupBy(input_file_name().as(FileCol))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.BloomFunctions.bloom_filter_agg(
          col(idCol).cast("long"), expectedPerFile,
          expectedPerFile * bitsPerItem).as(s"bloom_$idCol"))
  }

  /** File may contain one of `ids` in column `c`, by its Bloom sketch.
    * Evaluated distributedly over the stats frame (the sketch bytes
    * never collect); deserialization cost is per stats ROW — file
    * count, not data size. An all-null sketch (file with only null
    * ids) is NULL → false, matching the min/max helpers' rule. */
  def mayContainId(c: String, ids: Seq[Long]): Column = {
    require(ids.nonEmpty, s"empty id probe for $c")
    val probe = udf { (bytes: Array[Byte]) =>
      if (bytes == null) false
      else {
        val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bytes))
        ids.exists(bf.mightContainLong)
      }
    }
    probe(col(s"bloom_$c"))
  }

  /** Index maintenance for APPEND-ONLY directories (the shape the
    * streaming ingest loops write): stats for the files the standing
    * index has not seen, computed from their footers only and unioned
    * on — O(new files), the index never re-reads indexed data. An
    * indexed file missing from the directory fails by name: files were
    * rewritten or compacted, and an append would silently resurrect a
    * stale index — that case is a rebuild. */
  def appendFromFooters(spark: SparkSession, dataDir: String,
                        stats: DataFrame, cols: Seq[String]): DataFrame = {
    val live = listDataFiles(spark, dataDir)
    val indexed = stats.select(FileCol).collect().map(_.getString(0)).toIndexedSeq
    val liveSet = live.map(normPath).toSet
    val gone = indexed.map(normPath).filterNot(liveSet)
    require(gone.isEmpty,
      s"[stats-index] ${gone.size} indexed file(s) no longer in $dataDir " +
        s"(${gone.take(3).sorted}) — the directory was rewritten, not " +
        "appended; rebuild the index")
    val indexedSet = indexed.map(normPath).toSet
    val fresh = live.filterNot(f => indexedSet(normPath(f)))
    if (fresh.isEmpty) return stats
    stats.unionByName(footerStats(spark, fresh, cols, dataDir))
  }

  /** Non-hidden data files of a parquet directory (what a scan would
    * list): skips `_`/`.`-prefixed entries (_SUCCESS, metadata). */
  private[sources] def listDataFiles(spark: SparkSession, dataDir: String): Seq[String] = {
    val p = new Path(dataDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toIndexedSeq
      .filter(s => s.isFile && {
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .map(_.getPath.toUri.toString)
  }

  /** Scheme-independent path identity: `file:///x`, `file:/x` and `/x`
    * all name the same local file; stats built by scan (Spark's
    * `input_file_name`) and by footer listing (Hadoop `Path`) differ
    * only in this prefix. */
  private[sources] def normPath(s: String): String = new Path(s).toUri.getPath

  // ------------------------------------------------------------------
  // Footer-based build: O(footers), no data pages read
  // ------------------------------------------------------------------

  /** What a footer min/max means, per indexed column — decides whether
    * the parity-with-scan contract is exactness or enclosure. Parquet
    * writers may TRUNCATE binary (string) stats to bounded-length
    * bounds: min is truncated DOWN, max UP, so the interval still
    * encloses every value (sound for pruning) but need not be a
    * witnessed value. All other supported types are stored exactly. */
  def footerStatsAreExact(sparkType: org.apache.spark.sql.types.DataType): Boolean =
    sparkType != org.apache.spark.sql.types.StringType

  /** Same output schema and semantics as [[build]], computed from
    * parquet FOOTERS only: the file list is distributed over the
    * cluster and each task reads metadata, never data pages — the
    * index over a 100 TB table someone else wrote costs one metadata
    * round, not a full scan. Every row group of every file must carry
    * statistics (incl. a set null count) for every indexed column;
    * a chunk without them fails the build by name — an index that
    * guessed would prune unsoundly. */
  def buildFromFooters(spark: SparkSession, dataDir: String, cols: Seq[String]): DataFrame = {
    val files = listDataFiles(spark, dataDir)
    require(files.nonEmpty, s"no data files under $dataDir")
    footerStats(spark, files, cols, dataDir)
  }

  /** Footer stats for an explicit file list ([[buildFromFooters]] /
    * [[appendFromFooters]] share it; `dataDir` supplies the Spark-side
    * schema and names the error messages). */
  private def footerStats(spark: SparkSession, files: Seq[String],
                          cols: Seq[String], dataDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    require(cols.nonEmpty, "no columns to index")
    val dataSchema = spark.read.parquet(dataDir).schema
    val missing = cols.filterNot(c => dataSchema.fieldNames.contains(c))
    require(missing.isEmpty, s"indexed columns absent from $dataDir: $missing")
    val colTypes: Seq[(String, DataType)] =
      cols.map(c => c -> dataSchema(c).dataType)
    colTypes.foreach { case (c, t) =>
      require(FooterStats.supported(t), s"footer stats unsupported for $c: $t") }
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val kinds = colTypes.map { case (c, t) => (c, t.catalogString) }
    val rows = spark.sparkContext
      .parallelize(files, math.min(files.size, spark.sparkContext.defaultParallelism))
      .map(f => FooterStats.fileRow(f, kinds, hconf.value))
      .collect()
      .toIndexedSeq
    val schema = StructType(
      StructField(FileCol, StringType, nullable = false) +:
      StructField("n_rows", LongType, nullable = false) +:
      colTypes.flatMap { case (c, t) => Seq(
        StructField(s"mn_$c", t), StructField(s"mx_$c", t),
        StructField(s"nulls_$c", LongType, nullable = false))
      })
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}

/** Executor-side footer decoding for [[StatsIndex.buildFromFooters]].
  * Kept free of Spark classes beyond Row so the closure stays small. */
private[sources] object FooterStats extends Serializable {
  import org.apache.parquet.hadoop.ParquetFileReader
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.io.api.Binary
  import org.apache.parquet.schema.LogicalTypeAnnotation
  import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  def supported(t: DataType): Boolean = t match {
    case IntegerType | LongType | FloatType | DoubleType | BooleanType |
         StringType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** One stats row for one file, schema `(file, n_rows, [mn, mx,
    * nulls]*)` — field order matches [[StatsIndex.buildFromFooters]]'s
    * StructType. `kinds` carries (column, spark catalogString). */
  def fileRow(file: String, kinds: Seq[(String, String)],
              conf: org.apache.hadoop.conf.Configuration): Row = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks
      import scala.jdk.CollectionConverters._
      val nRows = blocks.asScala.map(_.getRowCount).sum
      val perCol = kinds.flatMap { case (c, kind) =>
        var mn: Any = null
        var mx: Any = null
        var nulls = 0L
        blocks.asScala.foreach { b =>
          val chunk = b.getColumns.asScala.find(_.getPath.toDotString == c)
            .getOrElse(sys.error(s"[stats-index] $file: no chunk for column $c"))
          val st = chunk.getStatistics
          if (st == null || !st.isNumNullsSet)
            sys.error(s"[stats-index] $file: column $c has no usable footer " +
              "statistics — footer build would prune unsoundly; use the " +
              "scan build instead")
          nulls += st.getNumNulls
          if (st.hasNonNullValue) {
            val prim = chunk.getPrimitiveType
            val cmp = prim.comparator[AnyRef]()
            val bMin = st.genericGetMin.asInstanceOf[AnyRef]
            val bMax = st.genericGetMax.asInstanceOf[AnyRef]
            if (mn == null || cmp.compare(bMin, mn.asInstanceOf[AnyRef]) < 0) mn = bMin
            if (mx == null || cmp.compare(bMax, mx.asInstanceOf[AnyRef]) > 0) mx = bMax
          }
        }
        val prim = blocks.asScala.headOption
          .flatMap(_.getColumns.asScala.find(_.getPath.toDotString == c))
          .map(_.getPrimitiveType)
          .getOrElse(sys.error(s"[stats-index] $file: empty file, no schema for $c"))
        Seq(decode(mn, prim, kind, file, c), decode(mx, prim, kind, file, c),
          nulls)
      }
      Row.fromSeq(file +: nRows +: perCol)
    } finally reader.close()
  }

  /** Footer raw value → the external Spark value the scan build would
    * have produced for the same column. Fails by name on a physical /
    * logical combination outside the supported set — never guesses. */
  private def decode(raw: Any, prim: org.apache.parquet.schema.PrimitiveType,
                     kind: String, file: String, c: String): Any = {
    if (raw == null) return null
    val ann = prim.getLogicalTypeAnnotation
    def bad(): Nothing =
      sys.error(s"[stats-index] $file: column $c is ${prim.getPrimitiveTypeName}/" +
        s"$ann in the footer but $kind to Spark — unsupported combination")
    (prim.getPrimitiveTypeName, kind) match {
      case (INT32, "date") => ann match {
        case _: DateLogicalTypeAnnotation =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
            raw.asInstanceOf[Integer].longValue()))
        case _ => bad()
      }
      case (INT32, "int") => raw.asInstanceOf[Integer].intValue()
      case (INT64, "bigint") => raw.asInstanceOf[java.lang.Long].longValue()
      case (INT64, "timestamp") | (INT64, "timestamp_ntz") => ann match {
        case ts: TimestampLogicalTypeAnnotation =>
          val micros = ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MICROS =>
              raw.asInstanceOf[java.lang.Long].longValue()
            case LogicalTypeAnnotation.TimeUnit.MILLIS =>
              math.multiplyExact(raw.asInstanceOf[java.lang.Long].longValue(), 1000L)
            case _ => bad() // NANOS surfaces as bigint under nanosAsLong
          }
          if (kind == "timestamp")
            org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(micros)
          else
            java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(micros, 1000000L),
              (Math.floorMod(micros, 1000000L) * 1000L).toInt,
              java.time.ZoneOffset.UTC)
        case _ => bad()
      }
      case (FLOAT, "float") => raw.asInstanceOf[java.lang.Float].floatValue()
      case (DOUBLE, "double") => raw.asInstanceOf[java.lang.Double].doubleValue()
      case (BOOLEAN, "boolean") => raw.asInstanceOf[java.lang.Boolean].booleanValue()
      case (BINARY, "string") => ann match {
        case _: StringLogicalTypeAnnotation =>
          raw.asInstanceOf[Binary].toStringUsingUTF8
        case _ => bad()
      }
      case _ => bad()
    }
  }
}
