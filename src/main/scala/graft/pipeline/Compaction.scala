package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** OPTIMIZE-style small-file compaction — the maintenance pass every
  * long-lived 100 TB table needs: streaming/incremental writers leave
  * thousands of KB-sized files per partition, and each one costs a scan
  * task, a footer read, and a namenode entry. Compaction rewrites a
  * parquet directory into ~`targetRowsPerFile`-sized files.
  *
  * Shape: one count (metadata-cheap for parquet), one `repartition` to
  * the computed file count (a round-robin shuffle — the only way to get
  * evenly-sized output files regardless of input skew), one write to a
  * sibling temp directory, then a directory swap. The swap is
  * delete-then-rename, not atomic: a crash between the two leaves the
  * temp directory intact for manual recovery but the table briefly
  * missing — on an object store, run compaction through the table
  * format's own transaction (this is the path-based analogue).
  * Readers opened before the swap keep their snapshot only until their
  * file handles are exhausted; serialize compaction with writers.
  *
  * All path manipulation goes through the HADOOP filesystem of the
  * path itself (the [[graft.streaming.CdcStream]] rule: "Hadoop-FS
  * listing, not java.io") — the table lives on whatever filesystem the
  * session writes to (HDFS / S3A / local alike), and a `java.nio` walk
  * of an `hdfs://` URI would throw on the driver's LOCAL filesystem
  * even though every Spark read of the same path succeeds.
  */
object Compaction {

  final case class CompactionStats(filesBefore: Int, filesAfter: Int, rows: Long)

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, HPath) = {
    val path = new HPath(dir)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  private def parquetFiles(fs: FileSystem, dir: HPath): Seq[HPath] = {
    val out = Seq.newBuilder[HPath]
    val it = fs.listFiles(dir, true) // recursive
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) out += st.getPath
    }
    out.result()
  }

  /** Compact `path` (a non-partitioned parquet directory) to
    * ⌈rows / targetRowsPerFile⌉ files. Returns before/after counts. */
  def compact(spark: SparkSession, path: String,
              targetRowsPerFile: Long): CompactionStats = {
    require(targetRowsPerFile > 0, s"target must be positive: $targetRowsPerFile")
    val (fs, dir) = fsOf(spark, path)
    val files = parquetFiles(fs, dir)
    // a hive-partitioned layout (key=value subdirs) would be silently
    // FLATTENED by a whole-directory rewrite — partition columns become
    // ordinary columns and every pruned reader full-scans. Compact each
    // leaf partition directory instead.
    val qualifiedDir = fs.makeQualified(dir)
    val partitioned = files.filter { f =>
      var p = f.getParent
      var hit = false
      while (p != null && p != qualifiedDir && !hit) {
        hit = p.getName.contains("=")
        p = p.getParent
      }
      hit
    }
    require(partitioned.isEmpty,
      s"$path is hive-partitioned (e.g. ${partitioned.headOption.getOrElse("")}); " +
        "compact its leaf partition directories individually")
    val df = spark.read.parquet(path)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val tmp = new HPath(path + ".compact-tmp")
    // repartition (round-robin), not coalesce: coalesce only merges
    // co-located input splits, so one straggler input file still yields
    // one straggler output file
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dir, true)
    fs.rename(tmp, dir)
    CompactionStats(files.size, parquetFiles(fs, dir).size, rows)
  }
}
