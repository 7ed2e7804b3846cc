package graft.model

import org.apache.spark.sql.functions.{col, floor, lit}

import graft.sources.StatsIndex
import graft.streaming.AcceptedSink

/** Measures the accepted-corpus skipping economics
  * ([[graft.streaming.AcceptedSink]] round-17 surfaces):
  *
  *  1. what the per-version stats index costs to MAINTAIN — the same
  *     fold run with and without `statsCols` (the claim: O(new files)
  *     footer reads of just-written files, a small constant on the
  *     fold, never a second data pass);
  *  2. what it buys a selective READ — `prunedReadAccepted` vs the
  *     plain `readAccepted + filter` on a batch-range and an id-range
  *     predicate, with kept/total file counts (the scheduled-I/O
  *     metric that carries to 100 TB, where local wall on NVMe is
  *     planning-dominated — the SkipScanBench doctrine).
  *
  * Layout: the documents table cut into 8 RANGE-contiguous batch
  * directories (monotone ids per batch — the realistic ingest shape
  * where id ranges correlate with arrival and min/max stats are
  * sharp), batches 0–5 folded into the archive, 6–7 left live so the
  * read measurements cross both tiers. Single pass per verb (the fold
  * is stateful); loadavg printed for adjudication (SCALE.md bench
  * doctrine).
  *
  * Usage: `runMain graft.model.AcceptedSkipBench [sfDir]`. One JSON
  * line. */
object AcceptedSkipBench {
  import BenchHarness.time

  private def r3(v: Double): String =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  private def loadavg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val (spark, dir) = BenchHarness.session(args, "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    val maxId = docs.agg(org.apache.spark.sql.functions.max("doc_id"))
      .head().getLong(0)
    val step = maxId / 8 + 1
    val root = java.nio.file.Files
      .createTempDirectory("accepted-skip-bench").toString
    try {
      // identical batch layouts for the plain and the indexed fold
      Seq("plain", "stats").foreach { variant =>
        (0L to 7L).foreach { b =>
          docs.where(floor(col("doc_id") / step) === b)
            .coalesce(2).write.parquet(s"$root/$variant/batch=$b")
        }
      }
      val (tPlain, _) = time(
        AcceptedSink.fold(spark, s"$root/plain", belowBatch = 6L))
      val (tStats, _) = time(
        AcceptedSink.fold(spark, s"$root/stats", belowBatch = 6L,
          statsCols = Seq("doc_id", "batch")))
      val acc = s"$root/stats"
      // batch-range read: archive only (as-of shape)
      val (tAsofPruned, asofScan) = time {
        val s = AcceptedSink.prunedReadAccepted(spark, acc,
          Seq("doc_id", "batch"),
          StatsIndex.mayContainBetween("batch", 0L, 2L), col("batch") <= 2L)
        (s.df.count(), s.keptFiles, s.totalFiles)
      }
      val (tAsofPlain, asofRows) = time(
        AcceptedSink.readAccepted(spark, acc).where(col("batch") <= 2L)
          .count())
      // id-range read: one batch's id span, crossing the pruning of
      // both the archived files and the live directories
      val (lo, hi) = (6L * step, 6L * step + step / 4)
      val (tIdPruned, idScan) = time {
        val s = AcceptedSink.prunedReadAccepted(spark, acc,
          Seq("doc_id", "batch"),
          StatsIndex.mayContainBetween("doc_id", lo, hi),
          col("doc_id").between(lo, hi))
        (s.df.count(), s.keptFiles, s.totalFiles)
      }
      val (tIdPlain, idRows) = time(
        AcceptedSink.readAccepted(spark, acc)
          .where(col("doc_id").between(lo, hi)).count())
      require(asofScan._1 == asofRows && idScan._1 == idRows,
        "pruned and plain reads disagree — soundness bug, reading invalid")
      println(s"""{"bench":"accepted_skip","sf":"$dir",""" +
        s""""fold_plain_s":${r3(tPlain)},"fold_stats_s":${r3(tStats)},""" +
        s""""asof":{"pruned_s":${r3(tAsofPruned)},"plain_s":${r3(tAsofPlain)},""" +
        s""""rows":$asofRows,"kept_files":${asofScan._2},"total_files":${asofScan._3}},""" +
        s""""id_range":{"pruned_s":${r3(tIdPruned)},"plain_s":${r3(tIdPlain)},""" +
        s""""rows":$idRows,"kept_files":${idScan._2},"total_files":${idScan._3}},""" +
        s""""loadavg":${r3(loadavg())}}""")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(root)).deleteRecursively()
      spark.stop()
    }
  }
}
