package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

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
  * delete-then-move, not atomic: a crash between the two leaves the
  * temp directory intact for manual recovery but the table briefly
  * missing — on an object store or HDFS, run compaction through the
  * table format's own transaction (this is the path-based analogue).
  * Readers opened before the swap keep their snapshot only until their
  * file handles are exhausted; serialize compaction with writers.
  */
object Compaction {

  final case class CompactionStats(filesBefore: Int, filesAfter: Int, rows: Long)

  private def parquetFiles(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p => p.toString.endsWith(".parquet")).toSeq
    } finally s.close()
  }

  /** Compact `path` (a non-partitioned parquet directory) to
    * ⌈rows / targetRowsPerFile⌉ files. Returns before/after counts. */
  def compact(spark: SparkSession, path: String,
              targetRowsPerFile: Long): CompactionStats = {
    require(targetRowsPerFile > 0, s"target must be positive: $targetRowsPerFile")
    val dir = Paths.get(path)
    val files = parquetFiles(dir)
    // a hive-partitioned layout (key=value subdirs) would be silently
    // FLATTENED by a whole-directory rewrite — partition columns become
    // ordinary columns and every pruned reader full-scans. Compact each
    // leaf partition directory instead.
    val partitioned = files.filter(f =>
      dir.relativize(f).toString.split('/').init.exists(_.contains("=")))
    require(partitioned.isEmpty,
      s"$path is hive-partitioned (e.g. ${partitioned.headOption.getOrElse("")}); " +
        "compact its leaf partition directories individually")
    val df = spark.read.parquet(path)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val tmp = Paths.get(path + ".compact-tmp")
    // repartition (round-robin), not coalesce: coalesce only merges
    // co-located input splits, so one straggler input file still yields
    // one straggler output file
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    deleteRecursively(dir)
    Files.move(tmp, dir)
    CompactionStats(files.size, parquetFiles(dir).size, rows)
  }

  private def deleteRecursively(dir: Path): Unit = {
    val s = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.sorted(Comparator.reverseOrder[Path]()).iterator().asScala
        .foreach(Files.deleteIfExists(_))
    } finally s.close()
  }
}
