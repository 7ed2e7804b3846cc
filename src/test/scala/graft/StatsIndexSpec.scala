package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.StatsIndex

/** File-level data skipping: stats build (scan and footer paths),
  * conservative pruning, freshness guard. */
class StatsIndexSpec extends SparkSpec {

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag).toString
    new java.io.File(d).deleteOnExit()
    d
  }

  private def rm(dir: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively(): Unit
  }

  /** Z-ordered events layout in `nFiles` files — the write side the
    * index is designed for. */
  private def writeZordered(dir: String, nFiles: Int): DataFrame = {
    val events = graft.model.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "value", "event_type")
    graft.ops.Layout.zOrdered(events, Seq("user_id", "value"), bits = 16,
      numPartitions = nFiles)
      .drop("bk_user_id", "bk_value", "zvalue")
      .write.mode("overwrite").parquet(dir)
    events
  }

  test("pruned read over a z-ordered layout: exact answer, fewer files") {
    val dir = tmp("statsidx-z")
    try {
      val events = writeZordered(dir, 16)
      val stats = StatsIndex.build(spark, dir, Seq("user_id", "value"))
      val rowPred = col("user_id").between(3, 6) && col("value").between(20.0, 80.0)
      val keep = StatsIndex.mayContainBetween("user_id", 3L, 6L) &&
        StatsIndex.mayContainBetween("value", 20.0, 80.0)
      val scan = StatsIndex.prunedRead(spark, dir, stats, keep, rowPred)
      assert(scan.totalFiles == 16)
      assert(scan.keptFiles < scan.totalFiles,
        s"z-ordered box predicate should prune: kept ${scan.keptFiles}/16")
      val got = scan.df.select("event_id").collect().map(_.getLong(0)).toSet
      val want = events.where(rowPred).select("event_id")
        .collect().map(_.getLong(0)).toSet
      assert(want.nonEmpty && got == want)
      // the plan pin: the pruned frame's SCAN sees only the kept files
      // — pruning happened at the listing, not as a post-read filter
      assert(scan.df.inputFiles.length == scan.keptFiles)
    } finally rm(dir)
  }

  test("conservative semantics: all-null file skipped by ranges, kept by mayHaveNull") {
    val dir = tmp("statsidx-null")
    try {
      import spark.implicits._
      // two range partitions on grp: grp=0 rows carry NULL x
      val df = (0 until 100).map(i => (i.toLong, i % 2, if (i % 2 == 0) None else Some(i * 1.0)))
        .toDF("id", "grp", "x")
      df.repartitionByRange(2, col("grp")).sortWithinPartitions("grp")
        .write.mode("overwrite").parquet(dir)
      val stats = StatsIndex.build(spark, dir, Seq("x")).cache()
      try {
        assert(stats.count() == 2)
        // one file is all-null in x: its mn/mx are NULL, nulls == its rows
        val allNull = stats.where(col("mn_x").isNull)
        assert(allNull.count() == 1)
        assert(allNull.select(col("nulls_x") === col("n_rows")).head().getBoolean(0))
        // a value predicate prunes it; the IS NULL helper keeps it
        assert(StatsIndex.candidateFiles(stats,
          StatsIndex.mayContainBetween("x", 1.0, 1e9)).size == 1)
        val nullScan = StatsIndex.prunedRead(spark, dir, stats,
          StatsIndex.mayHaveNull("x"), col("x").isNull)
        assert(nullScan.keptFiles == 1 && nullScan.df.count() == 50)
        // eq and in-list helpers agree with brute force
        val inKeep = StatsIndex.candidateFiles(stats,
          StatsIndex.mayContainIn("x", Seq(3.0, 5.0)))
        assert(inKeep.size == 1)
      } finally { stats.unpersist(); () }
    } finally rm(dir)
  }

  test("stale index fails by name; empty keep-list reads empty with schema") {
    val dir = tmp("statsidx-stale")
    try {
      import spark.implicits._
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val stats = StatsIndex.build(spark, dir, Seq("x")).cache()
      try {
        stats.count()
        // empty keep-list: schema intact, zero rows, zero files
        val none = StatsIndex.prunedRead(spark, dir, stats,
          StatsIndex.mayContainBetween("x", 1e6, 2e6), col("x") > 1e6)
        assert(none.keptFiles == 0 && none.df.columns.toSeq == Seq("id", "x")
          && none.df.count() == 0)
        // rewrite under the index: same content, different files
        Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x")
          .repartition(2).write.mode("overwrite").parquet(dir)
        val ex = intercept[IllegalArgumentException] {
          StatsIndex.prunedRead(spark, dir, stats,
            StatsIndex.mayContainBetween("x", 0.0, 100.0), col("x") >= 0.0)
        }
        assert(ex.getMessage.contains("stats-index") &&
          ex.getMessage.contains("rebuild"))
      } finally { stats.unpersist(); () }
    } finally rm(dir)
  }

  test("footer build == scan build (events: long/double/string/nanos-ts)") {
    val dir = tmp("statsidx-footer")
    try {
      graft.model.Tables.load(spark, "/root/testdata/sf0.001", "events")
        .repartition(4)
        .write.mode("overwrite").parquet(dir)
      val cols = Seq("event_id", "value", "event_type", "ts", "user_id")
      val byScan = StatsIndex.build(spark, dir, cols)
        .withColumn("f", expr("regexp_replace(file, '^[a-z0-9]+:/+', '/')"))
        .drop("file").orderBy("f").collect()
      val byFooter = StatsIndex.buildFromFooters(spark, dir, cols)
        .withColumn("f", expr("regexp_replace(file, '^[a-z0-9]+:/+', '/')"))
        .drop("file").orderBy("f").collect()
      assert(byScan.length == 4 && byFooter.length == 4)
      // exact parity for every column: numerics and the nanos
      // timestamp (read as bigint) are stored exactly; the event_type
      // strings are short enough that the writer did not truncate
      assert(byScan.toSeq == byFooter.toSeq)
    } finally rm(dir)
  }

  test("bloom skipping prunes point lookups the clustered layout cannot") {
    val dir = tmp("statsidx-bloom")
    try {
      writeZordered(dir, 16) // clustered on (user_id, value): event_id scatters
      val ids = Seq(17L, 423L, 777L)
      // range stats on the scattered id are useless: every file's
      // [min,max] spans most of the domain, nothing prunes
      val mm = StatsIndex.build(spark, dir, Seq("event_id"))
      val rangeKept = StatsIndex.candidateFiles(mm,
        ids.map(i => StatsIndex.mayContainBetween("event_id", i, i))
          .reduce(_ || _)).size
      assert(rangeKept > 8, s"scattered ids should defeat min/max: $rangeKept/16")
      // the per-file Bloom prunes to the true holders (+ rare FPs)
      val bl = StatsIndex.buildBloom(spark, dir, "event_id",
        expectedPerFile = 100)
      val scan = StatsIndex.prunedRead(spark, dir, bl,
        StatsIndex.mayContainId("event_id", ids),
        col("event_id").isin(ids: _*))
      assert(scan.totalFiles == 16 && scan.keptFiles <= 6,
        s"bloom should prune a 3-id probe: kept ${scan.keptFiles}/16")
      val got = scan.df.select("event_id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == ids.sorted)
    } finally rm(dir)
  }

  test("appendFromFooters: incremental == full rebuild; rewrite fails by name") {
    val dir = tmp("statsidx-append")
    try {
      import spark.implicits._
      val normed = (df: DataFrame) => df
        .withColumn("f", expr("regexp_replace(file, '^[a-z0-9]+:/+', '/')"))
        .drop("file").orderBy("f").collect().toSeq
      (0 until 60).map(i => (i.toLong, i * 1.5)).toDF("id", "x")
        .repartition(3).write.mode("overwrite").parquet(dir)
      val v0 = StatsIndex.buildFromFooters(spark, dir, Seq("id", "x"))
      // no new files: append is the identity
      assert(normed(StatsIndex.appendFromFooters(spark, dir, v0, Seq("id", "x"))) ==
        normed(v0))
      // two appended files: O(new) append == full rebuild
      (60 until 100).map(i => (i.toLong, i * 1.5)).toDF("id", "x")
        .repartition(2).write.mode("append").parquet(dir)
      val inc = StatsIndex.appendFromFooters(spark, dir, v0, Seq("id", "x"))
      assert(normed(inc) == normed(StatsIndex.buildFromFooters(spark, dir, Seq("id", "x"))))
      assert(inc.count() == 5)
      // rewritten directory (indexed files gone): refuse, name the cure
      (0 until 10).map(i => (i.toLong, i * 1.5)).toDF("id", "x")
        .repartition(2).write.mode("overwrite").parquet(dir)
      val ex = intercept[IllegalArgumentException] {
        StatsIndex.appendFromFooters(spark, dir, inc, Seq("id", "x"))
      }
      assert(ex.getMessage.contains("rebuild"))
    } finally rm(dir)
  }

  test("footer build decodes DATE columns (orders table)") {
    val dir = tmp("statsidx-date")
    try {
      graft.model.Tables.load(spark, "/root/testdata/sf0.001", "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .repartition(3)
        .write.mode("overwrite").parquet(dir)
      val cols = Seq("o_orderdate", "o_totalprice")
      val norm = (df: DataFrame) => df
        .withColumn("f", expr("regexp_replace(file, '^[a-z0-9]+:/+', '/')"))
        .drop("file").orderBy("f").collect().toSeq
      val a = norm(StatsIndex.build(spark, dir, cols))
      val b = norm(StatsIndex.buildFromFooters(spark, dir, cols))
      assert(a.nonEmpty && a == b)
      // and the index round-trips through its persisted form
      val statsDir = tmp("statsidx-date-stats")
      try {
        StatsIndex.write(StatsIndex.buildFromFooters(spark, dir, cols), statsDir)
        val reloaded = StatsIndex.load(spark, statsDir)
        val hi = java.sql.Date.valueOf("1996-01-01")
        val scan = StatsIndex.prunedRead(spark, dir, reloaded,
          StatsIndex.mayContainBetween("o_orderdate", java.sql.Date.valueOf("1992-01-01"), hi),
          col("o_orderdate") <= hi)
        val want = spark.read.parquet(dir).where(col("o_orderdate") <= hi).count()
        assert(scan.df.count() == want)
      } finally rm(statsDir)
    } finally rm(dir)
  }
}
